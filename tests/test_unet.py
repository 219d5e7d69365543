"""U-Net architecture tests: shapes, parameter inventory, Keras .h5 round-trip,
and a torch-based numerical oracle for conv/pool/upsample/batch-norm semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthsr_tpu.models.h5_import import (export_keras_unet_weights,
                                          load_keras_unet_weights)
from synthsr_tpu.models.unet import UNet3D, synthsr_unet, upsample_nearest


def _init(model, in_ch=1, size=32):
    x = jnp.zeros((1, size, size, size, in_ch))
    variables = model.init(jax.random.PRNGKey(0), x)
    return dict(variables), x


def test_unet_output_shape():
    model = synthsr_unet()
    variables, x = _init(model)
    y = model.apply(variables, x)
    assert y.shape == (1, 32, 32, 32, 1)


def test_unet_layer_inventory():
    """The flagship config must expose exactly the reference layer names
    (needed for by-name .h5 import), incl. the batch_norm=-1 layers every
    SynthSR build uses (predict_command_line.py:76, training.py:339)."""
    model = synthsr_unet()
    variables, _ = _init(model)
    params = variables["params"]
    names = set(params.keys())
    expected = {f"conv_downarm_{l}_{c}" for l in range(5) for c in range(2)}
    expected |= {f"conv_uparm_{5 + l}_{c}" for l in range(4) for c in range(2)}
    expected |= {f"bn_down_{l}" for l in range(5)}
    expected |= {f"bn_up_{l}" for l in range(4)}
    expected.add("likelihood")
    assert names == expected
    assert set(variables["batch_stats"].keys()) == (
        {f"bn_down_{l}" for l in range(5)} | {f"bn_up_{l}" for l in range(4)})
    # feature counts double per level: 24, 48, 96, 192, 384
    assert params["conv_downarm_0_0"]["kernel"].shape == (3, 3, 3, 1, 24)
    assert params["conv_downarm_4_1"]["kernel"].shape == (3, 3, 3, 384, 384)
    # first decoder conv sees skip(192) + upsampled(384)
    assert params["conv_uparm_5_0"]["kernel"].shape == (3, 3, 3, 576, 192)
    assert params["likelihood"]["kernel"].shape == (1, 1, 1, 24, 1)


def test_unet_param_count_matches_keras_formula():
    model = synthsr_unet()
    variables, _ = _init(model)
    n = sum(int(np.prod(p.shape)) for coll in variables.values()
            for lt in coll.values() for p in lt.values())
    # independently computed from the Keras summary formula for this config
    def conv_p(i, o, k=3):
        return k ** 3 * i * o + o
    expected = 0
    feats = [24, 48, 96, 192, 384]
    cin = 1
    for f in feats:
        expected += conv_p(cin, f) + conv_p(f, f) + 4 * f  # +BN gamma/beta/mean/var
        cin = f
    for level in range(4):
        f = feats[3 - level]
        up_in = feats[4 - level] + f
        expected += conv_p(up_in, f) + conv_p(f, f) + 4 * f
    expected += 1 * 24 + 1  # likelihood 1x1x1
    assert n == expected


def test_upsample_nearest():
    x = jnp.arange(8.0).reshape(1, 2, 2, 2, 1)
    y = upsample_nearest(x, 2)
    assert y.shape == (1, 4, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(y[0, :2, :2, :2, 0]), np.asarray(x[0, 0, 0, 0, 0]))


def _randomize(variables, rng):
    def rnd(p):
        return jnp.asarray(rng.normal(size=p.shape, scale=0.2).astype(np.float32))
    v = {"params": jax.tree.map(rnd, variables["params"])}
    if "batch_stats" in variables:
        bs = {}
        for l, t in variables["batch_stats"].items():
            bs[l] = {"mean": rnd(t["mean"]),
                     "var": jnp.abs(rnd(t["var"])) + 0.5}
        v["batch_stats"] = bs
    return v


def test_h5_roundtrip(tmp_path):
    model = UNet3D(nb_features=4, nb_levels=2, nb_labels=1)
    variables, x = _init(model, size=8)
    variables = _randomize(variables, np.random.default_rng(3))
    p = str(tmp_path / "w.h5")
    export_keras_unet_weights(p, variables)
    zero = jax.tree.map(jnp.zeros_like, variables)
    restored = load_keras_unet_weights(p, zero)
    y0 = model.apply(variables, x)
    y1 = model.apply(restored, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_h5_skip_likelihood_head(tmp_path):
    model = UNet3D(nb_features=4, nb_levels=2)
    variables, _ = _init(model, size=8)
    variables = _randomize(variables, np.random.default_rng(4))
    p = str(tmp_path / "w.h5")
    export_keras_unet_weights(p, variables)
    template = jax.tree.map(jnp.zeros_like, variables)
    restored = load_keras_unet_weights(p, template, skip_layers=("likelihood",))
    assert np.all(np.asarray(restored["params"]["likelihood"]["kernel"]) == 0)
    assert np.any(np.asarray(restored["params"]["conv_downarm_0_0"]["kernel"]) != 0)


def test_unet_against_torch_oracle():
    """Same weights in torch (channels-first conv3d) must produce the same
    output — validates SAME padding, elu, maxpool, nearest upsample, concat
    order, batch-norm placement (pre-BN skips!), and the .h5 kernel layout."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    model = UNet3D(nb_features=3, nb_levels=3, nb_conv_per_level=2,
                   nb_labels=2, feat_mult=2, final_pred_activation="linear")
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32)
    variables, _ = _init(model, size=8)
    variables = _randomize(variables, rng)
    y_jax = np.asarray(model.apply(variables, jnp.asarray(x_np)))
    params, stats = variables["params"], variables["batch_stats"]

    def conv(name, t):
        k = torch.tensor(np.transpose(np.asarray(params[name]["kernel"]), (4, 3, 0, 1, 2)))
        b = torch.tensor(np.asarray(params[name]["bias"]))
        return F.conv3d(t, k, b, padding="same")

    def bn(name, t):
        return F.batch_norm(
            t, torch.tensor(np.asarray(stats[name]["mean"])),
            torch.tensor(np.asarray(stats[name]["var"])),
            torch.tensor(np.asarray(params[name]["scale"])),
            torch.tensor(np.asarray(params[name]["bias"])),
            training=False, eps=1e-3)

    t = torch.tensor(np.transpose(x_np, (0, 4, 1, 2, 3)))
    skips = {}
    for level in range(3):
        for c in range(2):
            t = F.elu(conv(f"conv_downarm_{level}_{c}", t))
        skips[level] = t  # skip taps pre-BN conv output
        t = bn(f"bn_down_{level}", t)
        if level < 2:
            t = F.max_pool3d(t, 2, 2)
    for level in range(2):
        src = 1 - level
        t = F.interpolate(t, scale_factor=2, mode="nearest")
        t = torch.cat([skips[src], t], dim=1)
        for c in range(2):
            t = F.elu(conv(f"conv_uparm_{3 + level}_{c}", t))
        t = bn(f"bn_up_{level}", t)
    k = torch.tensor(np.transpose(np.asarray(params["likelihood"]["kernel"]), (4, 3, 0, 1, 2)))
    b = torch.tensor(np.asarray(params["likelihood"]["bias"]))
    t = F.conv3d(t, k, b)
    y_torch = np.transpose(t.detach().numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(y_jax, y_torch, atol=2e-4)


def test_fast_cf_forward_matches_flax_two_channels():
    """The hyperfine configuration: 2 input channels through the fast path
    (the cin<=2 output-stationary first conv) equals the flax forward in f32
    (VERDICT round-2 item #4)."""
    from synthsr_tpu.models.unet_cf import make_fast_predictor

    model = synthsr_unet(compute_dtype=jnp.float32)
    variables, _ = _init(model, in_ch=2)
    rng = np.random.default_rng(7)
    variables["params"] = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, scale=0.05)
                              .astype(np.float32)), variables["params"])
    variables["batch_stats"] = {
        l: {"mean": jnp.asarray(rng.normal(size=t["mean"].shape, scale=0.05)
                                .astype(np.float32)),
            "var": jnp.asarray(rng.uniform(0.5, 1.5, size=t["var"].shape)
                               .astype(np.float32))}
        for l, t in variables["batch_stats"].items()}
    # the property under test — the cin<=2 output-stationary FIRST conv —
    # lives at level 0, which stays planes-dispatched at this 1/2-size shape
    # (H=16: the 5-level pooling minimum)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 128, 2)).astype(np.float32))
    a = np.asarray(model.apply(variables, x))
    run = make_fast_predictor(model, variables, x.shape, interpret=True)
    b = np.asarray(run(x))
    np.testing.assert_allclose(a, b, rtol=2e-3, atol=3e-4)


def test_residual_dilated_unet_against_torch_oracle():
    """use_residuals (models.py:325-347) + dilation_rate_mult (models.py:307):
    last conv of each level has NO activation, the level input joins through
    an expand conv when feature counts differ (both > 1), activation follows
    the add, skips tap the raw last-conv output, and every conv at level l
    dilates by dilation_rate_mult**l (decoder: source level)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    model = UNet3D(nb_features=3, nb_levels=3, nb_conv_per_level=2,
                   nb_labels=2, feat_mult=2, final_pred_activation="linear",
                   use_residuals=True, dilation_rate_mult=2)
    rng = np.random.default_rng(1)
    x_np = rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32)
    variables, _ = _init(model, size=8)
    variables = _randomize(variables, rng)
    y_jax = np.asarray(model.apply(variables, jnp.asarray(x_np)))
    params, stats = variables["params"], variables["batch_stats"]
    # the expand convs exist exactly where feature counts differ and both > 1
    assert "expand_down_merge_1" in params and "expand_down_merge_2" in params
    assert "expand_down_merge_0" not in params  # level-0 input has 1 channel
    assert "expand_up_merge_0" in params and "expand_up_merge_1" in params

    def conv(name, t, dilation=1):
        k = torch.tensor(np.transpose(np.asarray(params[name]["kernel"]), (4, 3, 0, 1, 2)))
        b = torch.tensor(np.asarray(params[name]["bias"]))
        return F.conv3d(t, k, b, padding="same", dilation=dilation)

    def bn(name, t):
        return F.batch_norm(
            t, torch.tensor(np.asarray(stats[name]["mean"])),
            torch.tensor(np.asarray(stats[name]["var"])),
            torch.tensor(np.asarray(params[name]["scale"])),
            torch.tensor(np.asarray(params[name]["bias"])),
            training=False, eps=1e-3)

    t = torch.tensor(np.transpose(x_np, (0, 4, 1, 2, 3)))
    skips = {}
    for level in range(3):
        dil = 2 ** level
        lvl_first = t
        for c in range(2):
            t = conv(f"conv_downarm_{level}_{c}", t, dil)
            if c < 1:
                t = F.elu(t)
        skips[level] = t  # pre-activation, pre-add tap
        add = lvl_first
        if lvl_first.shape[1] > 1 and t.shape[1] > 1 and \
                lvl_first.shape[1] != t.shape[1]:
            add = F.elu(conv(f"expand_down_merge_{level}", lvl_first, dil))
        t = F.elu(t + add)
        t = bn(f"bn_down_{level}", t)
        if level < 2:
            t = F.max_pool3d(t, 2, 2)
    for level in range(2):
        src = 1 - level
        dil = 2 ** src
        t = F.interpolate(t, scale_factor=2, mode="nearest")
        up = t
        t = torch.cat([skips[src], t], dim=1)
        for c in range(2):
            t = conv(f"conv_uparm_{3 + level}_{c}", t, dil)
            if c < 1:
                t = F.elu(t)
        add = up
        if up.shape[1] > 1 and t.shape[1] > 1 and up.shape[1] != t.shape[1]:
            add = F.elu(conv(f"expand_up_merge_{level}", up, dil))
        t = F.elu(t + add)
        t = bn(f"bn_up_{level}", t)
    k = torch.tensor(np.transpose(np.asarray(params["likelihood"]["kernel"]), (4, 3, 0, 1, 2)))
    b = torch.tensor(np.asarray(params["likelihood"]["bias"]))
    t = F.conv3d(t, k, b)
    y_torch = np.transpose(t.detach().numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(y_jax, y_torch, atol=2e-4)


def test_conv_dropout_feature_space():
    """conv_dropout (models.py:319-324): identity at inference, stochastic
    per-(batch, channel) masks broadcast over space in train mode, inverted
    1/(1-rate) scaling."""
    model = UNet3D(nb_features=4, nb_levels=2, nb_conv_per_level=1,
                   nb_labels=1, conv_dropout=0.5)
    base = UNet3D(nb_features=4, nb_levels=2, nb_conv_per_level=1, nb_labels=1)
    variables, x = _init(model, size=8)
    rng = np.random.default_rng(6)
    variables = _randomize(variables, rng)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 1)).astype(np.float32))

    # inference: dropout is identity -> equals the dropout-free net
    y_inf = model.apply(variables, x)
    y_base = base.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_inf), np.asarray(y_base), atol=1e-6)

    # train mode: needs the dropout rng; different keys -> different outputs,
    # same key -> deterministic
    def run(seed):
        y, _ = model.apply(variables, x, train=True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(seed)})
        return np.asarray(y)

    a, b, a2 = run(0), run(1), run(0)
    assert np.abs(a - b).max() > 1e-6
    np.testing.assert_array_equal(a, a2)

    # feature-space structure: drop the FIRST conv's output directly — each
    # channel is either zeroed everywhere or scaled by 2 everywhere
    import flax.linen as nn

    drop = nn.Dropout(rate=0.5, broadcast_dims=(1, 2, 3), deterministic=False)
    h = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))
    out = np.asarray(drop.apply({}, h, rngs={"dropout": jax.random.PRNGKey(3)}))
    ratio = out / np.asarray(h)
    for n in range(2):
        for c in range(8):
            r = ratio[n, ..., c]
            assert np.allclose(r, 0.0) or np.allclose(r, 2.0)


def test_autoencoder_and_local_bias():
    """AE/VAE extras (models/autoencoder.py) forward + VAE sampling."""
    from synthsr_tpu.models.autoencoder import AutoEncoder3D, LocalBias

    x = jnp.zeros((1, 16, 16, 16, 1))
    ae = AutoEncoder3D(nb_features=2, nb_levels=2, enc_size=(4,),
                       final_pred_activation="linear")
    v = ae.init(jax.random.PRNGKey(0), x)
    y = ae.apply(v, x)
    assert y.shape == (1, 16, 16, 16, 1)
    # VAE: stochastic with different rngs
    vae = AutoEncoder3D(nb_features=2, nb_levels=2, enc_size=(4,), do_vae=True,
                        final_pred_activation="linear")
    xr = jnp.ones((1, 16, 16, 16, 1))
    v = vae.init({"params": jax.random.PRNGKey(0), "vae": jax.random.PRNGKey(1)}, xr)
    y1 = vae.apply(v, xr, rngs={"vae": jax.random.PRNGKey(2)})
    y2 = vae.apply(v, xr, rngs={"vae": jax.random.PRNGKey(3)})
    assert np.abs(np.asarray(y1) - np.asarray(y2)).max() > 1e-7

    lb = LocalBias(biasmult=2.0)
    vb = lb.init(jax.random.PRNGKey(0), xr)
    yb = lb.apply(vb, xr)
    expected = 1.0 + 2.0 * np.asarray(vb["params"]["kernel"])
    np.testing.assert_allclose(np.asarray(yb)[0], expected, atol=1e-6)


def test_write_model_summary(tmp_path):
    from synthsr_tpu.utils.misc import write_model_summary

    model = UNet3D(nb_features=2, nb_levels=2, nb_conv_per_level=1)
    v = dict(jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 8, 1))))
    p = str(tmp_path / "summary.txt")
    total = write_model_summary(jax.device_get(v), p)
    assert total > 0
    text = open(p).read()
    assert "Total parameters" in text and "conv_downarm_0_0" in text


def test_fast_cf_forward_matches_flax():
    """Channels-first fast inference path (models/unet_cf.py) equals the flax
    forward exactly in f32, including the two-executable split."""
    from synthsr_tpu.models.unet_cf import fast_unet_forward

    model = synthsr_unet(compute_dtype=jnp.float32)
    variables, _ = _init(model)
    rng = np.random.default_rng(5)
    variables["params"] = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, scale=0.05)
                              .astype(np.float32)), variables["params"])
    variables["batch_stats"] = {
        l: {"mean": jnp.asarray(rng.normal(size=t["mean"].shape, scale=0.05)
                                .astype(np.float32)),
            "var": jnp.asarray(rng.uniform(0.5, 1.5, size=t["var"].shape)
                               .astype(np.float32))}
        for l, t in variables["batch_stats"].items()}
    # (16, 32, 128) keeps the same kernel-dispatch coverage as 32³×128 at
    # half the interpret-mode cost: planes at level 0, flat at level 1
    # ((8, 16, 64): H·W = 1024), XLA fallback below
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 128, 1)).astype(np.float32))
    a = np.asarray(model.apply(variables, x))
    b = np.asarray(fast_unet_forward(model, variables, x, interpret=True,
                                     dtype=jnp.float32))
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-4)
    # split + TTA below check WIRING (executable split, flip alignment) —
    # shape-independent given a == b pins the kernels — so they run at 1/4
    # the voxels (level 0 flat-dispatched: H·W = 1024; D=H=16 keeps all 5
    # levels poolable, the model's minimum)
    x2 = jnp.asarray(rng.normal(size=(1, 16, 16, 64, 1)).astype(np.float32))
    a2 = np.asarray(model.apply(variables, x2))
    st = fast_unet_forward(model, variables, x2, interpret=True,
                           dtype=jnp.float32, stop_before_level=3)
    c = np.asarray(fast_unet_forward(model, variables, None, interpret=True,
                                     dtype=jnp.float32, resume_state=st))
    np.testing.assert_allclose(a2, c, rtol=2e-4, atol=1e-4)

    # flip-TTA weight trick (net_fd(x) == flip(net(flip(x))) with every conv
    # kernel flipped along D): checked below against the FLAX forward —
    # fast == flax is established by a == b above, so an interpret-mode
    # flipped-input pass would re-prove the same identity at 2x the cost
    from synthsr_tpu.models.unet_cf import flip_d_variables

    # TTA alignment regression (round-2 advisor HIGH finding): the fast TTA
    # pass net_fd(x) must equal the aligned slow pass flip(net(flip(x)))
    # DIRECTLY — i.e. with NO extra output flip, so averaging y0 + net_fd(x)
    # combines spatially aligned volumes.
    from synthsr_tpu.models.unet_cf import make_fast_predictor

    run = make_fast_predictor(model, variables, x2.shape, interpret=True)
    aligned_slow = np.flip(np.asarray(
        model.apply(variables, jnp.flip(x2, axis=1))), axis=1)
    fast_tta = np.asarray(run(x2, flip_d_variables(variables)))
    # f32 rounding between the XLA and pallas-interpret conv paths reaches
    # ~2e-4 on a handful of voxels; the bug this guards against errs at ~1.4
    np.testing.assert_allclose(aligned_slow, fast_tta, rtol=2e-3, atol=3e-4)
