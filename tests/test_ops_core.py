"""Oracle tests: core JAX ops vs scipy/numpy references (SURVEY.md §4 item 1)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter, map_coordinates

from synthsr_tpu.ops import interp, linops
from synthsr_tpu.ops.blur import blurring_sigma_for_downsampling, blurring_sigma_np


def test_interpn_exact_on_grid(rng):
    vol = rng.normal(size=(5, 6, 7)).astype(np.float32)
    mesh = np.stack(np.meshgrid(*[np.arange(s) for s in vol.shape], indexing="ij"),
                    axis=-1).astype(np.float32)
    out = interp.interpn(jnp.asarray(vol), jnp.asarray(mesh), "linear")
    np.testing.assert_allclose(np.asarray(out), vol, atol=1e-5)


def test_interpn_matches_map_coordinates(rng):
    vol = rng.normal(size=(9, 10, 11)).astype(np.float32)
    coords = rng.uniform(0, 8, size=(200, 3)).astype(np.float32)
    ours = np.asarray(interp.interpn(jnp.asarray(vol), jnp.asarray(coords), "linear"))
    oracle = map_coordinates(vol, coords.T, order=1, mode="nearest")
    np.testing.assert_allclose(ours, oracle, atol=1e-4)


def test_interpn_nearest_matches(rng):
    vol = rng.integers(0, 30, size=(8, 8, 8)).astype(np.int32)
    coords = rng.uniform(-1, 8.5, size=(100, 3)).astype(np.float32)
    ours = np.asarray(interp.interpn(jnp.asarray(vol), jnp.asarray(coords), "nearest"))
    clipped = np.clip(np.round(coords), 0, 7).astype(int)
    oracle = vol[clipped[:, 0], clipped[:, 1], clipped[:, 2]]
    np.testing.assert_array_equal(ours, oracle)


def test_interpn_out_of_bounds_edge_replication(rng):
    vol = rng.normal(size=(4, 4, 4)).astype(np.float32)
    coords = np.array([[-2.0, 1.0, 1.0], [5.0, 1.0, 1.0]], np.float32)
    out = np.asarray(interp.interpn(jnp.asarray(vol), jnp.asarray(coords), "linear"))
    np.testing.assert_allclose(out[0], vol[0, 1, 1], atol=1e-5)
    np.testing.assert_allclose(out[1], vol[3, 1, 1], atol=1e-5)


def test_interpn_multichannel(rng):
    vol = rng.normal(size=(6, 6, 6, 3)).astype(np.float32)
    coords = rng.uniform(0, 5, size=(50, 3)).astype(np.float32)
    out = np.asarray(interp.interpn(jnp.asarray(vol), jnp.asarray(coords), "linear"))
    for c in range(3):
        oracle = map_coordinates(vol[..., c], coords.T, order=1, mode="nearest")
        np.testing.assert_allclose(out[:, c], oracle, atol=1e-4)


def test_interpn_packed_matches_interpn(rng):
    """The packed-corner single-gather trilinear path must reproduce
    interpn's linear path (incl. out-of-bounds edge replication and
    multi-channel), up to 1-ulp weight rounding."""
    vol = rng.normal(size=(9, 10, 11, 3)).astype(np.float32)
    coords = rng.uniform(-1.5, 11.5, size=(7, 13, 3)).astype(np.float32)
    ref = np.asarray(interp.interpn(jnp.asarray(vol), jnp.asarray(coords),
                                    "linear"))
    got = np.asarray(interp.interpn_packed(jnp.asarray(vol),
                                           jnp.asarray(coords)))
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=1e-6)
    # channel-less volume keeps the squeezed output shape
    ref1 = np.asarray(interp.interpn(jnp.asarray(vol[..., 0]),
                                     jnp.asarray(coords), "linear"))
    got1 = np.asarray(interp.interpn_packed(jnp.asarray(vol[..., 0]),
                                            jnp.asarray(coords)))
    assert got1.shape == ref1.shape
    np.testing.assert_allclose(got1, ref1, atol=1e-6, rtol=1e-6)


def test_transform_zero_shift_is_identity(rng):
    vol = rng.normal(size=(5, 6, 7)).astype(np.float32)
    shift = np.zeros((5, 6, 7, 3), np.float32)
    out = np.asarray(interp.transform(jnp.asarray(vol), jnp.asarray(shift)))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def test_transform_integer_translation(rng):
    vol = rng.normal(size=(6, 6, 6)).astype(np.float32)
    shift = np.ones((6, 6, 6, 3), np.float32)  # sample at x+1
    out = np.asarray(interp.transform(jnp.asarray(vol), jnp.asarray(shift)))
    np.testing.assert_allclose(out[:5, :5, :5], vol[1:, 1:, 1:], atol=1e-5)


def test_affine_to_shift_identity():
    aff = jnp.eye(4)
    shift = interp.affine_to_shift(aff, (4, 5, 6))
    np.testing.assert_allclose(np.asarray(shift), 0.0, atol=1e-5)


def test_affine_to_shift_rotation_about_center(rng):
    # 90° rotation in the xy plane about the volume centre
    aff = np.eye(4)
    aff[:2, :2] = [[0, -1], [1, 0]]
    shape = (7, 7, 7)
    shift = np.asarray(interp.affine_to_shift(jnp.asarray(aff), shape))
    # centre voxel must not move
    np.testing.assert_allclose(shift[3, 3, 3], 0.0, atol=1e-5)
    # voxel (4,3,3): centered coords (1,0,0) -> rotated (0,1,0) -> loc (3,4,3)
    np.testing.assert_allclose(shift[4, 3, 3], [-1.0, 1.0, 0.0], atol=1e-5)


def test_integrate_vec_zero_field():
    vec = jnp.zeros((5, 5, 5, 3))
    out = np.asarray(interp.integrate_vec(vec, nb_steps=4))
    np.testing.assert_allclose(out, 0.0)


def test_integrate_vec_constant_field_stays_constant_inside():
    # constant field integrates to (approximately) itself away from edges
    vec = jnp.ones((12, 12, 12, 3)) * 0.8
    out = np.asarray(interp.integrate_vec(vec, nb_steps=5))
    np.testing.assert_allclose(out[3:7, 3:7, 3:7], 0.8, atol=1e-3)


def test_resize_doubles(rng):
    vol = rng.normal(size=(6, 6, 6)).astype(np.float32)
    out = np.asarray(interp.resize(jnp.asarray(vol), (12, 12, 12), zoom_factor=2.0))
    assert out.shape == (12, 12, 12)
    # even output indices hit input exactly
    np.testing.assert_allclose(out[::2, ::2, ::2], vol, atol=1e-5)


# ---------------------------------------------------------------------------
# linops: matrix-form blur / resize
# ---------------------------------------------------------------------------

def test_blur_matrix_matches_scipy(rng):
    vol = rng.normal(size=(24, 24, 24)).astype(np.float32)
    sigma = 1.3
    out = np.asarray(linops.blur3d(jnp.asarray(vol), [sigma] * 3))
    win = linops.gaussian_window_size(sigma)
    truncate = ((win - 1) // 2) / sigma
    oracle = gaussian_filter(vol, sigma, mode="constant", truncate=truncate)
    # interior matches tightly (edges differ: scipy normalizes, TF-SAME does not)
    h = (win - 1) // 2
    np.testing.assert_allclose(out[h:-h, h:-h, h:-h], oracle[h:-h, h:-h, h:-h],
                               atol=2e-4)


def test_blur_matrix_sigma_zero_identity(rng):
    vol = rng.normal(size=(10, 11, 12)).astype(np.float32)
    out = np.asarray(linops.blur3d(jnp.asarray(vol), [0.0, 0.0, 0.0], [3.0, 3.0, 3.0]))
    np.testing.assert_allclose(out, vol, atol=1e-6)


def test_blur_matrix_traced_sigma_equals_static(rng):
    import jax

    vol = jnp.asarray(rng.normal(size=(16, 16, 16)).astype(np.float32))

    def f(s):
        return linops.blur3d(vol, [s, s, s], [4.0, 4.0, 4.0])

    out_traced = np.asarray(jax.jit(f)(jnp.float32(2.0)))
    out_static = np.asarray(linops.blur3d(vol, [2.0] * 3, [4.0] * 3))
    np.testing.assert_allclose(out_traced, out_static, atol=1e-5)


def test_resize_matrix_matches_interp_resize(rng):
    vol = rng.normal(size=(9, 9, 9)).astype(np.float32)
    target = (14, 7, 9)
    via_interp = np.asarray(interp.resize(jnp.asarray(vol), target))
    mats = [linops.resize_matrix(target[d], 9) for d in range(3)]
    via_mat = np.asarray(linops.apply_axis_ops(jnp.asarray(vol), mats))
    np.testing.assert_allclose(via_mat, via_interp, atol=1e-4)


def test_nn_downsample_matrix_masks_dead_rows():
    m = np.asarray(linops.nn_downsample_matrix(8, 8, zoom=0.5, lr_count=4))
    assert m[:4].sum() == 4  # 4 live one-hot rows
    assert m[4:].sum() == 0  # dead rows masked


def test_blurring_sigma_rules():
    s = blurring_sigma_np([1, 1, 1], [1, 3, 0])
    np.testing.assert_allclose(s, [0.5, 2.25, 0.0])
    s2 = blurring_sigma_np([1, 1, 1], [2, 2, 2], mult_coef=0.42)
    np.testing.assert_allclose(s2, [0.84, 0.84, 0.84])
    s3 = blurring_sigma_np([1, 1, 1], [4, 4, 4], thickness=[2, 4, 4])
    np.testing.assert_allclose(s3, [1.5, 3.0, 3.0])
    # traced twin agrees
    st = np.asarray(blurring_sigma_for_downsampling(
        jnp.asarray([1.0, 1, 1]), jnp.asarray([1.0, 3, 0])))
    np.testing.assert_allclose(st, [0.5, 2.25, 0.0])


def test_pallas_conv3d_matches_xla(rng):
    """Interpret-mode oracle for the experimental channels-on-sublanes conv
    kernel (ops/conv_pallas.py)."""
    import jax
    import jax.lax as lax

    from synthsr_tpu.ops.conv_pallas import conv3d_cf

    x = rng.normal(size=(8, 8, 16, 24)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 8, 16)).astype(np.float32) * 0.1
    ours = np.asarray(conv3d_cf(jnp.asarray(x), jnp.asarray(w), interpret=True))
    xl = jnp.transpose(jnp.asarray(x), (1, 2, 3, 0))[None]
    oracle = np.transpose(np.asarray(lax.conv_general_dilated(
        xl, jnp.asarray(w), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0]), (3, 0, 1, 2))
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


@pytest.mark.parametrize("activation,width", [("elu", 24), ("relu", 24),
                                              (None, 24), ("elu", 128)])
def test_pallas_conv3d_fused_bias_activation(rng, activation, width):
    """The fused bias + activation epilogue (bias as an extra ones-row MXU
    column, activation in the f32 epilogue) equals conv + bias + act; the
    128-wide case exercises the wide-dot path."""
    import jax
    import jax.lax as lax

    from synthsr_tpu.ops.conv_pallas import conv3d_cf

    x = rng.normal(size=(8, 8, 16, width)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 8, 16)).astype(np.float32) * 0.1
    b = rng.normal(size=(16,)).astype(np.float32)
    ours = np.asarray(conv3d_cf(jnp.asarray(x), jnp.asarray(w),
                                bias=jnp.asarray(b), activation=activation,
                                interpret=True))
    xl = jnp.transpose(jnp.asarray(x), (1, 2, 3, 0))[None]
    oracle = lax.conv_general_dilated(
        xl, jnp.asarray(w), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] + b
    if activation == "elu":
        oracle = jax.nn.elu(oracle)
    elif activation == "relu":
        oracle = jax.nn.relu(oracle)
    oracle = np.transpose(np.asarray(oracle), (3, 0, 1, 2))
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


@pytest.mark.parametrize("cin,cout,d,activation",
                         [(8, 16, 8, "elu"), (3, 8, 4, None),
                          (1, 8, 8, "relu"), (2, 4, 4, "elu"),
                          (1, 8, 12, "elu")])
def test_pallas_conv3d_planes_matches_xla(rng, cin, cout, d, activation):
    """Interpret-mode oracle for the plane-streaming kernel (v6): unpadded
    input, zero-bordered slots, 4-plane grid unroll, rolling 4-slot f32
    accumulators, incl. the d=4 single-grid-step edge case and cin=1 (the
    network's first conv)."""
    import jax
    import jax.lax as lax

    from synthsr_tpu.ops.conv_pallas import conv3d_cf_planes

    x = rng.normal(size=(cin, d, 16, 128)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.1
    b = rng.normal(size=(cout,)).astype(np.float32)
    post = rng.normal(size=(2, cout)).astype(np.float32)
    ours = np.asarray(conv3d_cf_planes(
        jnp.asarray(x), jnp.asarray(w), bias=jnp.asarray(b),
        activation=activation, post=jnp.asarray(post), interpret=True))
    xl = jnp.transpose(jnp.asarray(x), (1, 2, 3, 0))[None]
    oracle = lax.conv_general_dilated(
        xl, jnp.asarray(w), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] + b
    if activation == "elu":
        oracle = jax.nn.elu(oracle)
    elif activation == "relu":
        oracle = jax.nn.relu(oracle)
    oracle = oracle * post[0] + post[1]  # post-activation affine (folded BN)
    oracle = np.transpose(np.asarray(oracle), (3, 0, 1, 2))
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_pallas_conv3d_planes_rolled_and_multisource(rng):
    """The rolled-chunk fori_loop body (monolithic big-cin compile path) and
    the multi-source channel-offset DMA (concat-free decoder) both equal the
    conv of the concatenation."""
    import jax
    import jax.lax as lax

    from synthsr_tpu.ops.conv_pallas import conv3d_cf_planes

    x = rng.normal(size=(12, 8, 32, 128)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 12, 8)).astype(np.float32) * 0.1
    b = rng.normal(size=(8,)).astype(np.float32)
    post = rng.normal(size=(2, 8)).astype(np.float32)
    xl = jnp.transpose(jnp.asarray(x), (1, 2, 3, 0))[None]
    oracle = jax.nn.elu(lax.conv_general_dilated(
        xl, jnp.asarray(w), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] + b)
    oracle = oracle * post[0] + post[1]
    oracle = np.transpose(np.asarray(oracle), (3, 0, 1, 2))

    rolled = np.asarray(conv3d_cf_planes(
        jnp.asarray(x), jnp.asarray(w), bias=jnp.asarray(b),
        activation="elu", post=jnp.asarray(post), rolled=True,
        interpret=True))
    np.testing.assert_allclose(rolled, oracle, atol=1e-5)

    multi = np.asarray(conv3d_cf_planes(
        [jnp.asarray(x[:4]), jnp.asarray(x[4:])], jnp.asarray(w),
        bias=jnp.asarray(b), activation="elu", post=jnp.asarray(post),
        rolled=True, interpret=True))
    np.testing.assert_allclose(multi, oracle, atol=1e-5)


def test_pallas_conv3d_grouped_matches_xla(rng):
    """Channel-grouped partial-conv sum (conv linearity; the 72ch decoder
    concat conv past the plane kernel's compile cap) equals the full conv."""
    import jax
    import jax.lax as lax

    from synthsr_tpu.ops.conv_pallas import conv3d_cf_grouped

    x = rng.normal(size=(24, 8, 16, 128)).astype(np.float32)
    w = rng.normal(size=(3, 3, 3, 24, 8)).astype(np.float32) * 0.1
    b = rng.normal(size=(8,)).astype(np.float32)
    ours = np.asarray(conv3d_cf_grouped(
        jnp.asarray(x), jnp.asarray(w), bias=jnp.asarray(b),
        activation="elu", group=8, interpret=True))
    xl = jnp.transpose(jnp.asarray(x), (1, 2, 3, 0))[None]
    oracle = jax.nn.elu(lax.conv_general_dilated(
        xl, jnp.asarray(w), (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))[0] + b)
    oracle = np.transpose(np.asarray(oracle), (3, 0, 1, 2))
    np.testing.assert_allclose(ours, oracle, atol=1e-5)

    # multi-source form (decoder concat-free path): [skip, up] fed directly
    # must equal the conv of their concatenation
    ours2 = np.asarray(conv3d_cf_grouped(
        [jnp.asarray(x[:8]), jnp.asarray(x[8:])], jnp.asarray(w),
        bias=jnp.asarray(b), activation="elu", interpret=True))
    np.testing.assert_allclose(ours2, oracle, atol=1e-5)

    # folded likelihood head: channel reduction + scalar bias after the
    # activation, in the LAST group's epilogue (f32 single-channel output)
    ha = rng.normal(size=(8,)).astype(np.float32)
    hb = np.float32(rng.normal())
    ours3 = np.asarray(conv3d_cf_grouped(
        jnp.asarray(x), jnp.asarray(w), bias=jnp.asarray(b),
        activation="elu", group=8, head=(jnp.asarray(ha), jnp.asarray(hb)),
        interpret=True))
    head_oracle = (oracle * ha.reshape(-1, 1, 1, 1)).sum(axis=0,
                                                         keepdims=True) + hb
    assert ours3.shape == (1,) + oracle.shape[1:]
    np.testing.assert_allclose(ours3, head_oracle, rtol=2e-4, atol=1e-4)


def test_stencil_warp_equals_gather_warp(rng):
    """For |shift| <= radius the stencil warp must equal transform() exactly,
    including at volume edges (clip == edge-padding equivalence)."""
    vol = jnp.asarray(rng.normal(size=(12, 13, 14, 2)).astype(np.float32))
    for radius in (1, 2):
        shift = jnp.asarray(rng.uniform(-radius, radius,
                                        size=(12, 13, 14, 3)).astype(np.float32))
        a = np.asarray(interp.transform(vol, shift, "linear"))
        b = np.asarray(interp.stencil_warp(vol, shift, radius))
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_integrate_vec_stencil_matches_gather(rng):
    """Bounded-field integration via the stencil schedule is identical to the
    all-gather reference path."""
    vec = jnp.asarray(np.clip(rng.normal(0, 2.0, size=(16, 16, 16, 3)), -8, 8)
                      .astype(np.float32))
    a = np.asarray(interp.integrate_vec(vec, nb_steps=7))
    b = np.asarray(interp.integrate_vec(vec, nb_steps=7, max_displacement=8.0))
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_flat_plane_conv_matches_xla(rng):
    """conv3d_cf_flat (folded narrow-width planes, the 64/32-cubed training
    levels) vs lax.conv — single and multi-source, bias+elu fused."""
    import jax

    from synthsr_tpu.ops.conv_pallas import _flat_layout, conv3d_cf_flat

    # the last two rows pin the arbitrary-width generalization: W = 96
    # (chunk rows NOT W-aligned: full-plane wrap masks) and W = 160 (tap
    # offsets beyond one 128-lane row: rb = 2 border rows) — the pad-to-32
    # clinical sizes the 128-multiple kernels can't take
    # d = 4 is the smallest flat-eligible depth (d % 4 == 0) — depth only
    # lengthens the plane stream, so interpret runs use it; multi-source
    # channel mix shrunk likewise (chaining has its own test below)
    for cins, co, d, h, w in (((24,), 48, 4, 64, 64),
                              ((24, 48), 48, 4, 32, 32),
                              ((5,), 7, 4, 16, 64),
                              ((24,), 16, 4, 32, 96),
                              ((8,), 8, 4, 32, 160)):
        ci = sum(cins)
        assert _flat_layout(ci, co, d, h, w) is not None
        srcs = [jnp.asarray(rng.normal(size=(c, d, h, w)).astype(np.float32))
                for c in cins]
        wk = jnp.asarray(
            rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32)) * 0.2
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
        got = conv3d_cf_flat(srcs if len(srcs) > 1 else srcs[0], wk, bias=b,
                             activation="elu", interpret=True)
        x = jnp.concatenate(srcs, 0)
        ref = jax.lax.conv_general_dilated(
            x[None], wk, (1, 1, 1), "SAME",
            dimension_numbers=("NCDHW", "DHWIO", "NCDHW"))[0] \
            + b.reshape(-1, 1, 1, 1)
        ref = jax.nn.elu(ref)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-4, rtol=1e-5)


def test_flat_conv_accum_chaining(rng):
    """conv3d_cf_flat's ``accum`` input (the channel-group chaining used by
    conv3d_cf_flat_grouped for big-cin decoder convs at non-128-multiple
    widths): two half-cin partial convs chained in-kernel == the full conv,
    with bias + elu fused only into the last group's epilogue."""
    import jax

    from synthsr_tpu.ops.conv_pallas import conv3d_cf_flat

    ci, co, d, h, w = 12, 8, 8, 32, 96
    x = jnp.asarray(rng.normal(size=(ci, d, h, w)).astype(np.float32))
    wk = jnp.asarray(
        rng.normal(size=(3, 3, 3, ci, co)).astype(np.float32)) * 0.2
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))

    y1 = conv3d_cf_flat(x[:6], wk[:, :, :, :6, :], interpret=True)
    got = conv3d_cf_flat(x[6:], wk[:, :, :, 6:, :], bias=b,
                         activation="elu", accum=y1, interpret=True)

    ref = jax.lax.conv_general_dilated(
        x[None], wk, (1, 1, 1), "SAME",
        dimension_numbers=("NCDHW", "DHWIO", "NCDHW"))[0] \
        + b.reshape(-1, 1, 1, 1)
    ref = jax.nn.elu(ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


def test_wgrad_flat_kernel_arbitrary_width(rng):
    """The folded-plane wgrad at the arbitrary widths (W = 96: unaligned
    wrap masks; W = 160: rb = 2 border rows) vs jax.grad of lax.conv."""
    import jax

    from synthsr_tpu.ops.conv_pallas import (_wgrad_flat_layout,
                                             _wgrad_layout, conv3d_cf_wgrad)

    for ci, co, d, h, w in ((6, 4, 8, 32, 96), (4, 4, 8, 32, 160)):
        assert _wgrad_layout(ci, co, d, h, w) is None
        assert _wgrad_flat_layout(ci, co, d, h, w) is not None
        x = jnp.asarray(rng.normal(size=(ci, d, h, w)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(co, d, h, w)).astype(np.float32))
        got = conv3d_cf_wgrad(x, g, interpret=True)

        def loss(wk):
            y = jax.lax.conv_general_dilated(
                x[None], wk, (1, 1, 1), "SAME",
                dimension_numbers=("NCDHW", "DHWIO", "NCDHW"))[0]
            return jnp.sum(y * g)

        ref = jax.grad(loss)(jnp.zeros((3, 3, 3, ci, co), jnp.float32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-3)


def test_wgrad_kernel_matches_autodiff(rng):
    """conv3d_cf_wgrad (plane-streaming weight gradient) vs jax.grad of
    lax.conv."""
    import jax

    from synthsr_tpu.ops.conv_pallas import _wgrad_layout, conv3d_cf_wgrad

    for ci, co, d, h, w in ((4, 8, 8, 16, 128), (24, 8, 8, 16, 128)):
        assert _wgrad_layout(ci, co, d, h, w) is not None
        x = jnp.asarray(rng.normal(size=(ci, d, h, w)).astype(np.float32))
        g = jnp.asarray(rng.normal(size=(co, d, h, w)).astype(np.float32))
        got = conv3d_cf_wgrad(x, g, interpret=True)

        def loss(wk):
            y = jax.lax.conv_general_dilated(
                x[None], wk, (1, 1, 1), "SAME",
                dimension_numbers=("NCDHW", "DHWIO", "NCDHW"))[0]
            return jnp.sum(y * g)

        ref = jax.grad(loss)(jnp.zeros((3, 3, 3, ci, co), jnp.float32))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=1e-3)
