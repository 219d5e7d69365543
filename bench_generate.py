"""On-device synthetic generator benchmark: label→image pairs/sec/chip at
128³ (BASELINE.json config #3).

Times the full jitted generative pipeline (synth/labels_to_image.py: spatial
deformation with SVF integration, random crop/flip, per-label GMM sampling,
bias field, intensity augmentation, PSF blur, acquisition simulation with
reliability maps — the graph of reference SynthSR/labels_to_image_model.py
driven by brain_generator.py:314) including the on-device GMM prior draws,
steady-state on device-resident label maps.

Baseline: the reference publishes no numbers (BASELINE.md).  vs_baseline is
computed against an estimated 1.25 pairs/s for the TF-2.0-on-A100 Keras
generator graph (the same dozens of whole-volume ops; the reference runs it
via model.predict with host round-trips per batch, tutorials print ~1 s per
sample on GPU at tutorial shapes).
"""

import json
import time

import numpy as np

TF_A100_BASELINE_PAIRS_PER_SEC = 1.25


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from synthsr_tpu.io.labels import get_list_labels
    from synthsr_tpu.synth.brain_generator import BrainGenerator
    from synthsr_tpu.synth.labels_to_image import build_generator
    from synthsr_tpu.synth.model_inputs import build_model_inputs
    from synthsr_tpu.synth.sampling import make_gmm_sampler

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
    gmm_sampler = make_gmm_sampler(
        n_labels=len(generation_labels), prior_means=bg.prior_means,
        prior_stds=bg.prior_stds, prior_distributions="normal",
        n_channels=bg.n_channels, generation_classes=bg.generation_classes)

    @jax.jit
    def generate(key, labels):
        new_key, key = jax.random.split(key)
        key, k_gmm = jax.random.split(key)
        means, stds = jax.vmap(gmm_sampler)(
            jax.random.split(k_gmm, labels.shape[0]))
        keys = jax.random.split(key, labels.shape[0])
        image, target = jax.vmap(generate_fn)(keys, labels, means, stds)
        # checksum depends on every output value: float(checksum) below is a
        # TRUE device sync — on this tunneled platform block_until_ready can
        # return at dispatch-accept, which made the first version of this
        # bench report a physically impossible 2180 pairs/s
        checksum = jnp.mean(image) + jnp.mean(target)
        return new_key, image, target, checksum

    gen = build_model_inputs(path_label_maps=bg.labels_paths,
                             n_labels=len(generation_labels),
                             prior_means=bg.prior_means,
                             prior_stds=bg.prior_stds, batchsize=1,
                             include_gmm_params=False)
    batches = [jnp.asarray(next(gen)[0]) for _ in range(5)]
    jax.block_until_ready(batches)

    key = jax.random.PRNGKey(0)
    key, image, target, checksum = generate(key, batches[0])
    _ = float(checksum)

    n, lag = 50, 2
    pending = []
    t0 = time.time()
    for i in range(n):
        key, image, target, checksum = generate(key, batches[i % len(batches)])
        pending.append(checksum)
        if len(pending) > lag:
            _ = float(pending.pop(0))
    for c in pending:
        _ = float(c)
    dt = time.time() - t0
    pairs_per_sec = n / dt

    print(json.dumps({
        "metric": "generate_128cube_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / TF_A100_BASELINE_PAIRS_PER_SEC, 2),
        "baseline_note": "estimated 1.25 pairs/s TF-2.0-on-A100 (reference "
                         "publishes no numbers; see module docstring)",
    }))


if __name__ == "__main__":
    main()
