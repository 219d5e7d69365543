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
        n_levels=2, unet_feat_count=2, nb_conv_per_level=1,
        simulate_registration_error=False, loss_cropping=12,
        epochs=1, steps_per_epoch=2, first_training_ratio=2, training_ratio=1,
        lr_generator=1e-3, lr_discriminator=1e-3, seed=0, batchsize=2,
        n_devices=2, log_fn=lambda s: logs.append(s))
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
            unet_feat_count=2, nb_conv_per_level=1,
            simulate_registration_error=False, loss_cropping=12,
            epochs=1, steps_per_epoch=2, first_training_ratio=1,
            training_ratio=1, seed=0, fast_forward=mode, log_fn=lambda s: None)
        curves[mode] = (out["d_curve"], out["g_curve"])
    np.testing.assert_allclose(curves["interpret"][0], curves["off"][0],
                               rtol=1e-5)
    np.testing.assert_allclose(curves["interpret"][1], curves["off"][1],
                               rtol=1e-5)


def test_adversarial_with_mask(adv_dataset, tmp_path):
    from synthsr_tpu.train.adversarial import training

    lab_dir, img_dir, labels_npy = adv_dataset
    out = training(
        labels_dir=lab_dir, images_dir=img_dir,
        model_dir=str(tmp_path / "adv_mask"),
        prior_means=None, prior_stds=None, path_generation_labels=labels_npy,
        prior_distributions="uniform", batchsize=1, output_channel=None,
        output_shape=16, randomise_res=True, n_levels=2, unet_feat_count=2,
        nb_conv_per_level=1, simulate_registration_error=False,
        epochs=1, steps_per_epoch=1, first_training_ratio=1, training_ratio=1,
        labels_to_mask=np.array([0, 1, 1]), seed=0, log_fn=lambda s: None)
    assert np.isfinite(out["d_curve"][0])
