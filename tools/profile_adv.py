"""Profile the adversarial fine-tuning steps on hardware (VERDICT round-3
item 3): separate steady-state timings for the discriminator update (the
step that runs 10× per generator update) and the generator update, plus the
discriminator's bare forward — the basis for deciding whether the critic's
strided channels-last XLA convs need a kernel-family member.

Writes a trace to /tmp/adv_trace when --trace is passed (view offline).
One-shot experiment tool; numbers go to STATUS.md.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(f, n=20, lag=2):
    """Value-readback timing: float() of a scalar derived from one output
    leaf is a TRUE sync (block_until_ready can return at dispatch-accept on
    the tunneled platform).  The jitted step is one executable, so reading
    any one of its outputs forces the whole step to finish."""
    def chk(out):
        leaf = jax.tree.leaves(out)[0]
        return jnp.sum(jnp.asarray(leaf, jnp.float32))

    _ = float(chk(f()))
    pending = []
    t0 = time.perf_counter()
    for _ in range(n):
        pending.append(chk(f()))
        if len(pending) > lag:
            _ = float(pending.pop(0))
    for c in pending:
        _ = float(c)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
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
    generation_labels, n_neutral = get_list_labels(
        label_list=f"{priors}/generation_labels.npy", labels_dir=labels_dir,
        FS_sort=True)
    bg = BrainGenerator(
        labels_dir=labels_dir, generation_labels=generation_labels,
        n_neutral_labels=n_neutral, batchsize=1,
        input_channels=[True], output_channel=[0],
        output_shape=128, output_div_by_n=32,
        generation_classes=f"{priors}/generation_classes.npy",
        prior_means=np.load(f"{priors}/prior_means_t1_hr.npy"),
        prior_stds=np.load(f"{priors}/prior_stds_t1_hr.npy"),
        prior_distributions="normal", flipping=True, randomise_res=True,
        downsample=True, build_reliability_maps=False, seed=0)
    generate_fn = build_generator(bg.cfg)
    gen_model = UNet3D(nb_features=24, nb_levels=5, conv_size=3, nb_labels=1,
                       feat_mult=2, nb_conv_per_level=2, activation="elu",
                       final_pred_activation="linear",
                       compute_dtype=jnp.bfloat16)
    gen_vars = dict(jax.jit(gen_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, *bg.model_output_shape, 1))))
    disc_model = Discriminator3D(compute_dtype=jnp.bfloat16)
    disc_params = dict(jax.jit(disc_model.init)(
        jax.random.PRNGKey(1),
        jnp.zeros((1, *bg.model_output_shape, 1))))["params"]
    gen_opt, disc_opt = make_optimizer(1e-4), make_optimizer(1e-4)
    gmm_sampler = make_gmm_sampler(
        n_labels=len(generation_labels), prior_means=bg.prior_means,
        prior_stds=bg.prior_stds, prior_distributions="normal",
        n_channels=bg.n_channels, generation_classes=bg.generation_classes)
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
    batch = tuple(jnp.asarray(a) for a in next(gen))
    jax.block_until_ready(batch)

    gp, gb = gen_vars["params"], gen_vars["batch_stats"]
    dp = disc_params
    g_opt_state, d_opt_state = gen_opt.init(gp), disc_opt.init(dp)
    key = jax.random.PRNGKey(0)

    # pieces: bare critic forward, critic forward+backward (like one GP term)
    x = jnp.zeros((1, *bg.model_output_shape, 1), jnp.float32)

    @jax.jit
    def d_fwd(dp, x):
        return disc_model.apply({"params": dp}, x)

    @jax.jit
    def d_fwd_bwd(dp, x):
        def f(xx):
            return jnp.sum(disc_model.apply({"params": dp}, xx))
        return jax.grad(f)(x)

    print(f"D forward          : {timeit(lambda: d_fwd(dp, x)):8.2f} ms",
          flush=True)
    print(f"D forward+input-bwd: {timeit(lambda: d_fwd_bwd(dp, x)):8.2f} ms",
          flush=True)

    k1, k2 = jax.random.split(key)
    print(f"disc_step (full)   : "
          f"{timeit(lambda: disc_step(gp, gb, dp, d_opt_state, k1, batch)):8.2f} ms",
          flush=True)
    print(f"gen_step  (full)   : "
          f"{timeit(lambda: gen_step(gp, gb, dp, g_opt_state, k2, batch)):8.2f} ms",
          flush=True)

    stacked = tuple(jnp.stack([a] * 10) for a in batch)
    jax.block_until_ready(stacked)
    print(f"disc_steps scan K=10: "
          f"{timeit(lambda: disc_steps(gp, gb, dp, d_opt_state, k1, stacked), n=5):8.2f} ms",
          flush=True)

    # decomposition: generation alone and the G fake forward alone (same
    # shapes/dtypes as inside disc_step) — the basis for the
    # discriminator-kernel decision
    from synthsr_tpu.models.unet_cf import fast_unet_forward
    from synthsr_tpu.train.training import vmap_examples

    @jax.jit
    def gen_alone(key, batch):
        bs = batch[0].shape[0]
        key, k_gmm = jax.random.split(key)
        means, stds = jax.vmap(gmm_sampler)(jax.random.split(k_gmm, bs))
        b = (batch[0], means, stds) + tuple(batch[1:])
        return vmap_examples(generate_fn)(jax.random.split(key, bs), *b)

    print(f"generation alone   : "
          f"{timeit(lambda: gen_alone(key, batch)):8.2f} ms", flush=True)

    # batched generation: the critic inner loop's K=10 draws as ONE vmapped
    # program (the generator is FROZEN during the critic iterations and the
    # key chain is precomputable, so the per-iteration generations could be
    # hoisted and batched — phase-A restructuring candidate)
    batch5 = tuple(jnp.concatenate([a] * 5) for a in batch)
    jax.block_until_ready(batch5)
    print(f"generation x5 vmap : "
          f"{timeit(lambda: gen_alone(key, batch5), n=5):8.2f} ms",
          flush=True)

    img = gen_alone(key, batch)[0]

    @jax.jit
    def g_fwd(img):
        return fast_unet_forward(gen_model, {"params": gp, "batch_stats": gb},
                                 img, dtype=jnp.bfloat16)

    print(f"G fake fwd (fast)  : {timeit(lambda: g_fwd(img)):8.2f} ms",
          flush=True)

    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/adv_trace"):
            for _ in range(3):
                out = disc_step(gp, gb, dp, d_opt_state, k1, batch)
            jax.block_until_ready(out)
        print("trace written to /tmp/adv_trace", flush=True)


if __name__ == "__main__":
    main()
