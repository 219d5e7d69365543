"""WGAN-GP adversarial fine-tuning tests (small config, real-image targets)."""

import os

import numpy as np
import pytest

from synthsr_tpu.io.volume import save_volume


@pytest.fixture(scope="module")
def adv_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("advdata")
    lab_dir = root / "labels"
    img_dir = root / "images"
    lab_dir.mkdir()
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        lab = np.zeros((24, 24, 24), np.int32)
        lab[4:20, 4:20, 4:20] = rng.integers(0, 3, (16, 16, 16)) * 2
        save_volume(lab, np.eye(4), None, str(lab_dir / f"m{i}.nii.gz"))
        img = (lab > 0) * 100.0 + rng.normal(0, 5, lab.shape)
        save_volume(img.astype(np.float32), np.eye(4), None,
                    str(img_dir / f"m{i}.nii.gz"))
    np.save(str(root / "gen_labels.npy"), np.array([0, 2, 4], np.int32))
    return str(lab_dir), str(img_dir), str(root / "gen_labels.npy")


def test_gradient_penalty_at_unit_norm():
    """For a linear critic D(x)=sum(x)/k with ‖∇D‖=1, the penalty must be 0."""
    import jax.numpy as jnp

    from synthsr_tpu.train.adversarial import gradient_penalty

    nvox = 4 * 4 * 4

    def disc_apply(p, x, mask=None):
        return jnp.sum(x, axis=(1, 2, 3, 4), keepdims=False)[:, None] / np.sqrt(nvox)

    x = jnp.ones((2, 4, 4, 4, 1))
    gp = float(gradient_penalty(disc_apply, None, x, weight=10.0))
    assert gp < 1e-8
    # and nonzero for a zero critic (norm 0 -> penalty = weight)
    gp0 = float(gradient_penalty(lambda p, x, m=None: jnp.zeros((x.shape[0], 1)),
                                 None, x, weight=10.0))
    assert abs(gp0 - 10.0) < 1e-3  # sqrt(eps) guard shifts it by ~2e-5


def test_discriminator_shapes():
    import jax
    import jax.numpy as jnp

    from synthsr_tpu.models.discriminator import Discriminator3D

    d = Discriminator3D(n_filters=4, n_levels=2)
    x = jnp.zeros((2, 16, 16, 16, 1))
    params = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(params, x)
    assert out.shape == (2, 1)
    # masked input changes the score
    mask = jnp.zeros_like(x)
    out_masked = d.apply(params, x + 1.0, mask)
    out_unmasked = d.apply(params, x + 1.0)
    assert not np.allclose(np.asarray(out_masked), np.asarray(out_unmasked))


def test_s2d_stride2_conv_matches_strided():
    """The critic's space-to-depth stride-2 conv equals the plain strided
    conv (forward AND input gradient) — exact regrouping of the 27 taps."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from synthsr_tpu.models.discriminator import _Conv3x3Stride2

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 8, 10, 3)), jnp.float32)
    m = _Conv3x3Stride2(5)
    params = m.init(jax.random.PRNGKey(0), x)
    kernel = params["params"]["kernel"]
    bias = params["params"]["bias"]

    def ref_fn(x):
        y = lax.conv_general_dilated(
            x, kernel, (2, 2, 2), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + bias

    out = m.apply(params, x)
    ref = ref_fn(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # input gradient parity (the WGAN-GP path differentiates through it)
    g_s2d = jax.grad(lambda x: jnp.sum(m.apply(params, x) ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(ref_fn(x) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)
    # odd-dim fallback hits the strided path
    x_odd = jnp.asarray(rng.standard_normal((1, 9, 8, 10, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(m.apply(params, x_odd)),
                               np.asarray(ref_fn(x_odd)),
                               rtol=1e-5, atol=1e-5)


def test_adversarial_short_run(adv_dataset, tmp_path):
    from synthsr_tpu.train.adversarial import training

    lab_dir, img_dir, labels_npy = adv_dataset
    model_dir = str(tmp_path / "adv_models")
    logs = []
    out = training(
        labels_dir=lab_dir, images_dir=img_dir, model_dir=model_dir,
        prior_means=None, prior_stds=None, path_generation_labels=labels_npy,
        prior_distributions="uniform", input_channels=True,
        output_channel=None, output_shape=16, randomise_res=True,
        n_levels=2, unet_feat_count=2, nb_conv_per_level=1, nonlin_std=0,
        simulate_registration_error=False, loss_cropping=12,
        epochs=1, steps_per_epoch=2, first_training_ratio=2, training_ratio=1,
        lr_generator=1e-3, lr_discriminator=1e-3, seed=0, batchsize=2,
        n_devices=2, compute_dtype="float32",
        # scan_inner=True (the TPU default) with first_training_ratio=2 and
        # training_ratio=1 drives BOTH inner-loop paths: step 0 takes the
        # chunked disc_steps path (ratio 2 = two K=1 chunks), step 1 the
        # fused cycle_step path (ratio == scan_k)
        scan_inner=True,
        log_fn=lambda s: logs.append(s))
    assert np.isfinite(out["d_curve"][0]) and np.isfinite(out["g_curve"][0])
    assert os.path.isfile(os.path.join(model_dir, "generator_1.h5"))
    assert os.path.isfile(os.path.join(model_dir, "discriminator_1.h5"))
    assert os.path.isfile(os.path.join(model_dir, "logs", "generator_loss.npy"))


def test_adversarial_fast_forward_matches_off(adv_dataset, tmp_path):
    """fast_forward='interpret' (channels-first Pallas generator forwards in
    both the G step and the D step's fake volumes) must reproduce the 'off'
    run: same seeded D/G loss curves."""
    from synthsr_tpu.train.adversarial import training

    lab_dir, img_dir, labels_npy = adv_dataset
    curves = {}
    for mode in ("off", "interpret"):
        out = training(
            labels_dir=lab_dir, images_dir=img_dir,
            model_dir=str(tmp_path / f"adv_{mode}"),
            prior_means=None, prior_stds=None,
            path_generation_labels=labels_npy,
            prior_distributions="uniform", batchsize=1, output_channel=None,
            output_shape=16, randomise_res=True, n_levels=2,
            unet_feat_count=2, nb_conv_per_level=1, nonlin_std=0,
            simulate_registration_error=False, loss_cropping=12,
            epochs=1, steps_per_epoch=2, first_training_ratio=1,
            training_ratio=1, seed=0, fast_forward=mode,
            compute_dtype="float32", log_fn=lambda s: None)
        curves[mode] = (out["d_curve"], out["g_curve"])
    np.testing.assert_allclose(curves["interpret"][0], curves["off"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(curves["interpret"][1], curves["off"][1],
                               rtol=1e-5)


@pytest.fixture(scope="module")
def dp_setup():
    """Shared tiny-config setup for the DP-vs-single-jit equality tests."""
    import jax
    import jax.numpy as jnp

    from synthsr_tpu.models.discriminator import Discriminator3D
    from synthsr_tpu.models.unet import UNet3D
    from synthsr_tpu.synth.labels_to_image import (GenerationConfig,
                                                   build_generator)
    from synthsr_tpu.synth.sampling import make_gmm_sampler

    # nonlin_std=0: the SVF-integration subgraph is the single biggest
    # compile cost and is orthogonal to the DP wiring under test
    cfg = GenerationConfig(
        labels_shape=[16, 16, 16], input_channels=[True], output_channel=[0],
        generation_labels=np.array([0, 2, 4], np.int32), n_neutral_labels=3,
        atlas_res=[1.0, 1.0, 1.0], output_shape=16, output_div_by_n=4,
        flipping=True, aff=np.eye(4), randomise_res=False, nonlin_std=0.0,
        data_res=np.array([[1.0, 1.0, 2.0]]), downsample=True,
        build_reliability_maps=True, simulate_registration_error=False)
    generate_fn = build_generator(cfg)
    gen_model = UNet3D(nb_features=2, nb_levels=2, nb_conv_per_level=1,
                       nb_labels=1, compute_dtype=jnp.float32)
    gen_vars = dict(jax.jit(gen_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 16, 2))))
    disc_model = Discriminator3D(n_filters=2, n_levels=2)
    disc_params = dict(jax.jit(disc_model.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 16, 1))))["params"]
    gmm_sampler = make_gmm_sampler(n_labels=3, prior_means=None,
                                   prior_stds=None,
                                   prior_distributions="uniform")
    rng = np.random.default_rng(7)
    batch = (rng.integers(0, 2, (4, 16, 16, 16, 1)).astype(np.int32) * 2,)
    return (generate_fn, gen_model, gen_vars, disc_model, disc_params,
            gmm_sampler, batch)


def _run_dp_vs_single(dp_setup, gen_opt, disc_opt):
    """One disc_step + one gen_step under (a) single-jit and (b) a 4-device
    shard_map DP mesh, fast path on; returns both results."""
    import jax
    import jax.numpy as jnp

    from synthsr_tpu.parallel.mesh import make_data_mesh, replicate, shard_batch
    from synthsr_tpu.train.adversarial import make_adversarial_steps
    from synthsr_tpu.train.metrics import doubled_residual_indices

    (generate_fn, gen_model, gen_vars, disc_model, disc_params,
     gmm_sampler, batch) = dp_setup
    key = jax.random.PRNGKey(13)
    mesh = make_data_mesh(4)
    results = {}
    for name, data_mesh in (("single", None), ("dp", mesh)):
        disc_step, gen_step = make_adversarial_steps(
            gen_model, disc_model, generate_fn, gen_opt, disc_opt,
            gmm_sampler=gmm_sampler,
            residual_indices=doubled_residual_indices([0], True),
            loss_cropping=12, fast_forward="interpret", data_mesh=data_mesh)
        gp = jax.tree.map(jnp.copy, gen_vars["params"])
        gb = jax.tree.map(jnp.copy, gen_vars["batch_stats"])
        dp = jax.tree.map(jnp.copy, disc_params)
        g_opt_state, d_opt_state = gen_opt.init(gp), disc_opt.init(dp)
        dev_batch = batch
        if data_mesh is not None:
            dev_batch = shard_batch(mesh, batch)
            gp, gb, dp, g_opt_state, d_opt_state = (
                replicate(mesh, t)
                for t in (gp, gb, dp, g_opt_state, d_opt_state))
        dp, d_opt_state, d_loss = disc_step(gp, gb, dp, d_opt_state, key,
                                            dev_batch)
        gp, gb, g_opt_state, g_loss = gen_step(gp, gb, dp, g_opt_state, key,
                                               dev_batch)
        results[name] = (jax.device_get(gp), jax.device_get(dp),
                         float(d_loss), float(g_loss))
    return results


def test_adversarial_dp_fast_matches_single_jit(dp_setup):
    """make_adversarial_steps with data_mesh over 4 devices (batch 4, fast
    path) must equal the meshless single-jit fast steps: same D and G losses,
    same updated parameters — keys and interpolation weights are split for
    the GLOBAL batch and sliced per device, BN stats/grads/losses pmean-ed
    over 'data'."""
    import jax

    # SGD, not Adam, for the TIGHT parameter-equality check: updates stay
    # LINEAR in the gradients, so the ~1e-8 f32 reduction-order residues
    # between the per-shard and joint-batch critic backward (real/fake
    # cancellation inside one batched conv wgrad) stay ~1e-8 in the params.
    # The shipped Adam path is covered by the tolerance-banded test below.
    import optax

    results = _run_dp_vs_single(dp_setup, optax.sgd(1e-3), optax.sgd(1e-3))
    # per-shard mean + pmean reduces in a different f32 order than the joint
    # batch mean: agreement is ~1e-6 relative, not bit-exact
    np.testing.assert_allclose(results["dp"][2], results["single"][2],
                               rtol=1e-5)
    np.testing.assert_allclose(results["dp"][3], results["single"][3],
                               rtol=1e-5)
    for a, b in ((results["dp"][0], results["single"][0]),
                 (results["dp"][1], results["single"][1])):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5, rtol=1e-5)


def test_adversarial_dp_fast_adam_tolerance_band(dp_setup):
    """The SHIPPED optimizer (Adam, fine_tuning_with_adversary.py:444-466)
    through the DP fast path, with a derived tolerance band.

    Why a band: the batched real+fake critic backward reduces both examples'
    contributions inside ONE conv wgrad, whose f32 summation order differs
    with shard count — a ~1e-8 gradient residue.  A first-step Adam update is
    lr·g/(|g|·√(1-β₂)/(1-β₁)... ≈ lr·sign(g)-scaled: on elements whose true
    gradient is ~0 the residue can flip the sign, moving the two paths'
    params apart by up to ~2·lr·(1-β₁)/√(1-β₂)·... bounded by 2·lr.  So:
    losses must agree tightly (they are pure functions of the pre-update
    state, rtol 1e-5 — this is what catches key-stream/pmean wiring bugs),
    params must agree within 2·lr absolute, and the overwhelming majority of
    elements (true gradient far from 0) must agree to 1e-5."""
    import jax
    import optax

    lr = 1e-3
    results = _run_dp_vs_single(dp_setup, optax.adam(lr), optax.adam(lr))
    np.testing.assert_allclose(results["dp"][2], results["single"][2],
                               rtol=1e-5)
    np.testing.assert_allclose(results["dp"][3], results["single"][3],
                               rtol=1e-5)
    for a, b in ((results["dp"][0], results["single"][0]),
                 (results["dp"][1], results["single"][1])):
        leaves_a = jax.tree.leaves(a)
        leaves_b = jax.tree.leaves(b)
        diffs = np.concatenate([
            np.abs(np.asarray(x) - np.asarray(y)).ravel()
            for x, y in zip(leaves_a, leaves_b)])
        assert diffs.max() <= 2.0 * lr, \
            f"params diverged past the Adam sign-flip bound: {diffs.max()}"
        frac_tight = (diffs <= 1e-5).mean()
        assert frac_tight >= 0.95, \
            f"only {frac_tight:.1%} of elements within 1e-5 — gradient " \
            "mismatch beyond reduction-order residues"


def test_disc_steps_scan_matches_sequential(dp_setup):
    """The scanned critic inner loop (one executable for K iterations) must
    be BIT-IDENTICAL to K sequential disc_step calls: same key-stream
    (key, sub = split(key) per iteration), same per-iteration batches, same
    params/opt-state/losses — single-jit and 4-device DP fast path."""
    import jax
    import jax.numpy as jnp
    import optax

    from synthsr_tpu.parallel.mesh import make_data_mesh, replicate
    from synthsr_tpu.train.adversarial import make_adversarial_steps
    from synthsr_tpu.train.metrics import doubled_residual_indices

    (generate_fn, gen_model, gen_vars, disc_model, disc_params,
     gmm_sampler, batch) = dp_setup
    rng2 = np.random.default_rng(11)
    batch2 = (rng2.integers(0, 2, (4, 16, 16, 16, 1)).astype(np.int32) * 2,)
    stacked = (np.stack([batch[0], batch2[0]]),)
    mesh = make_data_mesh(4)
    # DP mode only: scan-vs-sequential equality within the shard_map path
    # also covers the meshless composition (the scan wraps the same body;
    # dp-vs-single equality itself is pinned by the tests above) at half
    # the interpret-mode compile+run cost
    for name in ("dp",):
        gen_opt, disc_opt = optax.sgd(1e-3), optax.sgd(1e-3)
        disc_step, _, disc_steps, _cycle = make_adversarial_steps(
            gen_model, disc_model, generate_fn, gen_opt, disc_opt,
            gmm_sampler=gmm_sampler,
            residual_indices=doubled_residual_indices(None, False),
            loss_cropping=None, fast_forward="interpret",
            compute_dtype=jnp.float32, with_scan=True,
            data_mesh=mesh if name == "dp" else None)
        d_opt_state = disc_opt.init(disc_params)
        gp, gb = gen_vars["params"], gen_vars["batch_stats"]
        key0 = jax.random.PRNGKey(29)

        # sequential: the host loop's exact key handling
        dp_seq, dos_seq, key, losses = disc_params, d_opt_state, key0, []
        for b in (batch, batch2):
            key, sub = jax.random.split(key)
            dp_seq, dos_seq, loss = disc_step(gp, gb, dp_seq, dos_seq, sub,
                                              tuple(jnp.asarray(x) for x in b))
            losses.append(float(loss))

        dp_scan, dos_scan, key_scan, losses_scan = disc_steps(
            gp, gb, disc_params, d_opt_state, key0,
            tuple(jnp.asarray(x) for x in stacked))
        np.testing.assert_array_equal(np.asarray(key), np.asarray(key_scan))
        np.testing.assert_allclose(np.asarray(losses_scan), losses, rtol=1e-6)
        for a, b in zip(jax.tree.leaves(dp_seq), jax.tree.leaves(dp_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-6)

        # cycle_step (scan + generator update fused, the production
        # steady-state step) must equal the sequential host loop: scan
        # outputs as above, then gen_step with the NEXT key split
        g_opt_state = gen_opt.init(gp)
        key2, sub = jax.random.split(key)
        _, gstep, _, cstep = make_adversarial_steps(
            gen_model, disc_model, generate_fn, gen_opt, disc_opt,
            gmm_sampler=gmm_sampler,
            residual_indices=doubled_residual_indices(None, False),
            loss_cropping=None, fast_forward="interpret",
            compute_dtype=jnp.float32, with_scan=True,
            data_mesh=mesh if name == "dp" else None)
        gp_ref, _, gos_ref, g_loss_ref = gstep(
            gp, gb, dp_seq, g_opt_state, sub,
            tuple(jnp.asarray(x) for x in batch))
        (gp_c, _, dp_c, gos_c, dos_c, key_c, dl_c, gl_c) = cstep(
            gp, gb, disc_params, g_opt_state, d_opt_state, key0,
            tuple(jnp.asarray(x) for x in stacked),
            tuple(jnp.asarray(x) for x in batch))
        np.testing.assert_array_equal(np.asarray(key2), np.asarray(key_c))
        np.testing.assert_allclose(float(gl_c), float(g_loss_ref), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(gp_c), jax.tree.leaves(gp_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-6)
        # separately-jitted executables (the cycle inlines the scan into a
        # larger program): XLA may fuse reductions differently, so tight
        # allclose rather than bit-equality
        for a, b in zip(jax.tree.leaves(dp_c), jax.tree.leaves(dp_scan)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7, rtol=1e-6)


def test_adversarial_with_mask(adv_dataset, tmp_path):
    from synthsr_tpu.train.adversarial import training

    lab_dir, img_dir, labels_npy = adv_dataset
    out = training(
        labels_dir=lab_dir, images_dir=img_dir,
        model_dir=str(tmp_path / "adv_mask"),
        prior_means=None, prior_stds=None, path_generation_labels=labels_npy,
        prior_distributions="uniform", batchsize=1, output_channel=None,
        output_shape=16, randomise_res=True, n_levels=2, unet_feat_count=2,
        nb_conv_per_level=1, nonlin_std=0, simulate_registration_error=False,
        epochs=1, steps_per_epoch=1, first_training_ratio=1, training_ratio=1,
        labels_to_mask=np.array([0, 1, 1]), seed=0,
        compute_dtype="float32", log_fn=lambda s: None)
    assert np.isfinite(out["d_curve"][0])
