"""Adversarial fine-tuning benchmark: steady-state WGAN-GP generator
updates/sec/chip at 128³ (BASELINE.json config #5).

Times the steady-state 10:1 D:G cycle of fine_tuning_with_adversary.py
(reference :444-466): per generator update, ten discriminator updates — each
running the full on-device synthetic generation, a generator U-Net forward
for the fake volume, three critic forwards + the gradient-penalty backward —
then one generator update (generation + differentiable fast U-Net
forward/backward + critic forward).  Tutorial-scale config: 24-feature
5-level generator, 32-filter 4-level critic, 128³ volumes, batch 1.

Baseline: the reference publishes no numbers (BASELINE.md).  vs_baseline is
computed against an estimated TF-2.0-on-A100 rate of 0.068 generator
updates/s: each of the 11 train_on_batch calls in a cycle runs at least the
supervised step's estimated 0.75 steps/s cost (the full lab2im generation
graph plus a 24-feature U-Net forward dominates; the D updates add three
critic forwards + the GP backward) → ~1/(11·1.33 s) ≈ 0.068 G-updates/s.
"""

import json
import time

import numpy as np

TF_A100_BASELINE_GEN_UPDATES_PER_SEC = 0.068
TRAINING_RATIO = 10


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from synthsr_tpu.io.labels import get_list_labels
    from synthsr_tpu.models.discriminator import Discriminator3D
    from synthsr_tpu.models.unet import UNet3D
    from synthsr_tpu.synth.brain_generator import BrainGenerator
    from synthsr_tpu.synth.labels_to_image import build_generator
    from synthsr_tpu.synth.model_inputs import build_model_inputs
    from synthsr_tpu.synth.sampling import make_gmm_sampler
    from synthsr_tpu.train.adversarial import make_adversarial_steps
    from synthsr_tpu.train.metrics import doubled_residual_indices
    from synthsr_tpu.train.training import make_optimizer

    data = "/root/reference/data"
    labels_dir, priors = f"{data}/labels", f"{data}/labels_classes_priors"
    pm = np.load(f"{priors}/prior_means_t1_hr.npy")
    ps = np.load(f"{priors}/prior_stds_t1_hr.npy")
    generation_labels, n_neutral = get_list_labels(
        label_list=f"{priors}/generation_labels.npy", labels_dir=labels_dir,
        FS_sort=True)

    bg = BrainGenerator(
        labels_dir=labels_dir, generation_labels=generation_labels,
        n_neutral_labels=n_neutral, batchsize=1,
        input_channels=[True], output_channel=[0],
        output_shape=128, output_div_by_n=32,
        generation_classes=f"{priors}/generation_classes.npy",
        prior_means=pm, prior_stds=ps, prior_distributions="normal",
        flipping=True, scaling_bounds=0.2, rotation_bounds=20,
        shearing_bounds=0.03, translation_bounds=5, nonlin_std=5.0,
        bias_field_std=0.4, randomise_res=True, downsample=True,
        build_reliability_maps=False, seed=0)
    generate_fn = build_generator(bg.cfg)
    gen_model = UNet3D(nb_features=24, nb_levels=5, conv_size=3, nb_labels=1,
                       feat_mult=2, nb_conv_per_level=2, activation="elu",
                       final_pred_activation="linear",
                       compute_dtype=jnp.bfloat16)
    gen_vars = dict(jax.jit(gen_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, *bg.model_output_shape, 1))))
    disc_model = Discriminator3D(compute_dtype=jnp.bfloat16)
    disc_params = dict(jax.jit(disc_model.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, *bg.model_output_shape, 1))))["params"]

    gen_opt, disc_opt = make_optimizer(1e-4), make_optimizer(1e-4)
    gmm_sampler = make_gmm_sampler(
        n_labels=len(generation_labels), prior_means=bg.prior_means,
        prior_stds=bg.prior_stds, prior_distributions="normal",
        n_channels=bg.n_channels,
        generation_classes=bg.generation_classes)
    disc_step, gen_step, disc_steps, cycle_step = make_adversarial_steps(
        gen_model, disc_model, generate_fn, gen_opt, disc_opt,
        gmm_sampler=gmm_sampler,
        residual_indices=doubled_residual_indices(None, False),
        loss_cropping=96, fast_forward="auto", compute_dtype=jnp.bfloat16,
        with_scan=True)

    gen = build_model_inputs(path_label_maps=bg.labels_paths,
                             n_labels=len(generation_labels),
                             prior_means=bg.prior_means,
                             prior_stds=bg.prior_stds, batchsize=1,
                             include_gmm_params=False)
    batches = [tuple(jnp.asarray(a) for a in next(gen)) for _ in range(5)]
    jax.block_until_ready(batches)
    # the production loop's feed: each cycle's 10 critic iterations arrive
    # as one K-stacked batch and run as ONE executable (train/adversarial.py
    # scan_inner) — a fresh label-map pick per iteration, like the host
    # stream; 5 distinct stacks so the data rotates like `batches` did
    stacks = [tuple(jnp.stack([batches[(i + j) % len(batches)][c]
                               for j in range(TRAINING_RATIO)])
                    for c in range(len(batches[0])))
              for i in range(len(batches))]
    jax.block_until_ready(stacks)

    gp, gb = gen_vars["params"], gen_vars["batch_stats"]
    dp = disc_params
    g_opt_state, d_opt_state = gen_opt.init(gp), disc_opt.init(dp)
    key = jax.random.PRNGKey(0)

    def cycle(gp, gb, dp, g_opt_state, d_opt_state, key, i):
        """One steady-state step: 10 critic updates + 1 generator update as
        ONE executable (reference :452-466 semantics, train/adversarial.py
        cycle_step — the production steady-state step)."""
        gp, gb, dp, g_opt_state, d_opt_state, key, d_losses, g_loss = \
            cycle_step(gp, gb, dp, g_opt_state, d_opt_state, key,
                       stacks[i % len(stacks)], batches[i % len(batches)])
        return gp, gb, dp, g_opt_state, d_opt_state, key, (d_losses[-1], g_loss)

    # warm-up (first Pallas compile can take minutes on this platform)
    out = cycle(gp, gb, dp, g_opt_state, d_opt_state, key, 0)
    gp, gb, dp, g_opt_state, d_opt_state, key, losses = out
    _ = (float(losses[0]), float(losses[1]))

    # steady state with a one-cycle sync lag (the tunnel adds ~33 ms per
    # synced round trip; each cycle is ~11 dispatches so the lag hides it)
    n, lag = 8, 1
    pending = []
    t0 = time.time()
    for i in range(n):
        gp, gb, dp, g_opt_state, d_opt_state, key, losses = cycle(
            gp, gb, dp, g_opt_state, d_opt_state, key, i)
        pending.append(losses)
        if len(pending) > lag:
            d_l, g_l = pending.pop(0)
            _ = (float(d_l), float(g_l))
    for d_l, g_l in pending:
        _ = (float(d_l), float(g_l))
    dt = time.time() - t0
    gen_updates_per_sec = n / dt

    print(json.dumps({
        "metric": "adversarial_128cube_gen_updates_per_sec_per_chip",
        "value": round(gen_updates_per_sec, 4),
        "unit": "generator updates/s (10:1 D:G cycles/s)",
        "vs_baseline": round(
            gen_updates_per_sec / TF_A100_BASELINE_GEN_UPDATES_PER_SEC, 2),
        "baseline_note": "estimated 0.068 G-updates/s TF-2.0-on-A100 "
                         "(reference publishes no numbers; see module "
                         "docstring)",
    }))


if __name__ == "__main__":
    main()
