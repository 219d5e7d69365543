"""The synthesis/augmentation op library as pure JAX functions.

TPU-first re-implementation of the reference's 18 Keras layers
(``ext/lab2im/layers.py``) as explicit-key pure functions over single samples
(X, Y, Z, C); batching is ``jax.vmap`` at the pipeline level.  Per-op
reference citations are in each docstring; randomized-resolution resampling
uses per-axis operator matrices (ops/linops) so every shape stays static under
jit — the same trick the reference itself uses for MimicAcquisition's static
down-grid (lab2im/layers.py:920-951), generalized.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import interp, linops
from ..ops.blur import blurring_sigma_for_downsampling
from .sampling import bernoulli, draw_traced

# ---------------------------------------------------------------------------
# affine sampling (reference utils.py:675-817)
# ---------------------------------------------------------------------------

def _rotation_matrix_3d(key, rotation_bounds, enable_90_rotations):
    angles = draw_traced(key, rotation_bounds, size=3, default_range=15.0)
    if angles is None:
        angles = jnp.zeros(3)
    if enable_90_rotations:
        k90, _ = jax.random.split(jax.random.fold_in(key, 90))
        angles = angles + 90.0 * jax.random.randint(k90, (3,), 0, 4).astype(jnp.float32)
    a = angles * (math.pi / 180.0)
    cx, sx = jnp.cos(a[0]), jnp.sin(a[0])
    cy, sy = jnp.cos(a[1]), jnp.sin(a[1])
    cz, sz = jnp.cos(a[2]), jnp.sin(a[2])
    rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return rx @ ry @ rz


def sample_affine_matrix(key, rotation_bounds=False, scaling_bounds=False,
                         shearing_bounds=False, translation_bounds=False,
                         enable_90_rotations=False):
    """Random (4, 4) affine: T = Scale @ Shear @ (Rx@Ry@Rz) with a translation
    column (reference utils.sample_affine_transform:675-752)."""
    k_rot, k_shear, k_scale, k_trans = jax.random.split(key, 4)

    if (rotation_bounds is not False) or enable_90_rotations:
        t_rot = _rotation_matrix_3d(k_rot, rotation_bounds, enable_90_rotations)
    else:
        t_rot = jnp.eye(3)

    if shearing_bounds is not False:
        sh = draw_traced(k_shear, shearing_bounds, size=6, default_range=0.01)
        t_shear = jnp.array([[1.0, sh[0], sh[1]],
                             [sh[2], 1.0, sh[3]],
                             [sh[4], sh[5], 1.0]])
    else:
        t_shear = jnp.eye(3)

    if scaling_bounds is not False:
        sc = draw_traced(k_scale, scaling_bounds, size=3, centre=1.0, default_range=0.15)
        t_scale = jnp.diag(sc)
    else:
        t_scale = jnp.eye(3)

    lin = t_scale @ t_shear @ t_rot
    if translation_bounds is not False:
        trans = draw_traced(k_trans, translation_bounds, size=3, default_range=5.0)
    else:
        trans = jnp.zeros(3)
    top = jnp.concatenate([lin, trans[:, None]], axis=1)
    return jnp.concatenate([top, jnp.array([[0.0, 0.0, 0.0, 1.0]])], axis=0)


# ---------------------------------------------------------------------------
# RandomSpatialDeformation (reference lab2im/layers.py:54-211)
# ---------------------------------------------------------------------------

def small_shape_for(shape, scale):
    """ceil(shape * scale) (reference utils.get_resample_shape:577-588)."""
    return tuple(int(math.ceil(s * scale)) for s in shape)


def random_spatial_deformation(key, vols, methods, scaling_bounds=0.15,
                               rotation_bounds=15, shearing_bounds=0.012,
                               translation_bounds=False, enable_90_rotations=False,
                               nonlin_std=3.0, nonlin_scale=0.0625, prob_deform=1.0,
                               clip_svf_sigmas=4.0):
    """Jointly deform tensors with a random affine + integrated SVF.

    vols: list of (X, Y, Z, C); methods: per-tensor 'linear'/'nearest'.
    SVF: shape ceil(spatial·nonlin_scale), std ~ U(0, nonlin_std) (one scalar),
    resized to max(spatial//2, small), integrated 7 steps, resized to full
    (reference :178-197).

    Deviation (documented, TPU perf): the sampled SVF is clipped to
    ±clip_svf_sigmas·nonlin_std (P(|N|>4σ) ≈ 6e-5 per value), which gives a
    static displacement bound so most squaring steps run as exact stencil
    warps (ops/interp.integrate_vec) — ~5× faster than all-gather
    integration. Set clip_svf_sigmas=None for reference-exact tails.
    """
    spatial = vols[0].shape[:3]
    k_aff, k_std, k_svf, k_prob = jax.random.split(key, 4)

    apply_affine = (scaling_bounds is not False) or (rotation_bounds is not False) \
        or (shearing_bounds is not False) or (translation_bounds is not False) \
        or enable_90_rotations
    apply_elastic = nonlin_std > 0
    if not (apply_affine or apply_elastic):
        return list(vols)

    if apply_elastic:
        small = small_shape_for(spatial, nonlin_scale)
        std = jax.random.uniform(k_std, (1, 1), maxval=nonlin_std)
        svf = jax.random.normal(k_svf, (*small, 3)) * std[0, 0]
        bound = None
        if clip_svf_sigmas is not None:
            bound = float(clip_svf_sigmas) * float(nonlin_std)
            svf = jnp.clip(svf, -bound, bound)
        half = tuple(max(int(spatial[i] / 2), small[i]) for i in range(3))
        svf = interp.resize(svf, half, method="linear")
        svf = interp.integrate_vec(svf, nb_steps=7, max_displacement=bound)
        svf = interp.resize(svf, spatial, method="linear")

    if apply_affine:
        affine = sample_affine_matrix(k_aff, rotation_bounds, scaling_bounds,
                                      shearing_bounds, translation_bounds,
                                      enable_90_rotations)
        if apply_elastic:
            shift = interp.combine_nonlinear_and_affine_shift(svf, affine)
        else:
            shift = interp.affine_to_shift(affine, spatial)
    else:
        shift = svf

    outs = []
    for v, m in zip(vols, methods):
        # linear warps (real images) ride the packed-corner single gather:
        # 3.7x the 8-gather form at full-volume tables (tools/probe_warp.py)
        warped = interp.transform(v.astype(jnp.float32), shift, method=m,
                                  packed=True)
        if prob_deform < 1.0:
            gate = bernoulli(k_prob, prob_deform)
            warped = jnp.where(gate, warped, v.astype(jnp.float32))
        outs.append(warped.astype(v.dtype))
    return outs


def random_spatial_deformation_cropped(key, key_crop, vols, methods,
                                       crop_shape, scaling_bounds=0.15,
                                       rotation_bounds=15,
                                       shearing_bounds=0.012,
                                       translation_bounds=False,
                                       enable_90_rotations=False,
                                       nonlin_std=3.0, nonlin_scale=0.0625,
                                       prob_deform=1.0, clip_svf_sigmas=4.0):
    """``random_spatial_deformation`` followed by ``random_crop``, FUSED:
    the crop of a warp is the warp restricted to the window, so the shift
    field (windowed SVF resize + affine at absolute window coordinates) and
    the output gather are computed on the crop window only — identical
    values (same keys, same draws, same sample positions) at a fraction of
    the full-shape gather/resize cost.  Reference behaviour composition:
    lab2im/layers.py:54-211 then :214-274."""
    spatial = vols[0].shape[:3]
    k_aff, k_std, k_svf, k_prob = jax.random.split(key, 4)
    # crop offset drawn exactly as random_crop does
    max_val = jnp.array([spatial[d] - crop_shape[d] for d in range(3)],
                        jnp.float32)
    idx = jnp.floor(jax.random.uniform(key_crop, (3,)) * max_val) \
        .astype(jnp.int32)

    def plain_crop(v):
        return jax.lax.dynamic_slice(v, (idx[0], idx[1], idx[2], 0),
                                     (*crop_shape, v.shape[-1]))

    apply_affine = (scaling_bounds is not False) \
        or (rotation_bounds is not False) or (shearing_bounds is not False) \
        or (translation_bounds is not False) or enable_90_rotations
    apply_elastic = nonlin_std > 0
    if not (apply_affine or apply_elastic):
        return [plain_crop(v) for v in vols]

    # absolute window coordinates (traced offset + static iota)
    mesh_w = [idx[d].astype(jnp.float32)
              + jax.lax.broadcasted_iota(jnp.float32, tuple(crop_shape), d)
              for d in range(3)]

    svf_w = None
    if apply_elastic:
        from .sampling import draw_traced  # noqa: F401  (parity of imports)
        from ..ops.linops import apply_axis_ops, sample_matrix

        small = small_shape_for(spatial, nonlin_scale)
        std = jax.random.uniform(k_std, (1, 1), maxval=nonlin_std)
        svf = jax.random.normal(k_svf, (*small, 3)) * std[0, 0]
        bound = None
        if clip_svf_sigmas is not None:
            bound = float(clip_svf_sigmas) * float(nonlin_std)
            svf = jnp.clip(svf, -bound, bound)
        half = tuple(max(int(spatial[i] / 2), small[i]) for i in range(3))
        svf = interp.resize(svf, half, method="linear")
        svf = interp.integrate_vec(svf, nb_steps=7, max_displacement=bound)
        # windowed final resize: the full-shape resize samples input at
        # g / zoom for output index g; restrict g to the crop window
        mats = []
        for d in range(3):
            zoom = spatial[d] / half[d]
            coords = (idx[d].astype(jnp.float32)
                      + jnp.arange(crop_shape[d], dtype=jnp.float32)) / zoom
            mats.append(sample_matrix(coords, half[d], method="linear"))
        svf_w = apply_axis_ops(svf, mats)

    if apply_affine:
        affine = sample_affine_matrix(k_aff, rotation_bounds, scaling_bounds,
                                      shearing_bounds, translation_bounds,
                                      enable_90_rotations)[:3].astype(jnp.float32)
        centre = [(spatial[d] - 1) / 2.0 for d in range(3)]
        moved = [mesh_w[d] - centre[d] for d in range(3)]
        if svf_w is not None:
            moved = [moved[d] + svf_w[..., d] for d in range(3)]
        flat = jnp.stack([m.reshape(-1) for m in moved]
                         + [jnp.ones(moved[0].size)], axis=0)
        loc = (affine @ flat).T.reshape(*crop_shape, 3) \
            + jnp.asarray(centre, jnp.float32)
    else:
        loc = jnp.stack(mesh_w, -1) + svf_w

    outs = []
    for v, m in zip(vols, methods):
        # linear warps (real images) ride the packed-corner single gather:
        # 142 -> 38 ms at (160,217,160) -> 128^3 (tools/probe_warp.py)
        if m == "linear":
            warped = interp.interpn_packed(v.astype(jnp.float32), loc)
        else:
            warped = interp.interpn(v.astype(jnp.float32), loc, method=m)
        if prob_deform < 1.0:
            gate = bernoulli(k_prob, prob_deform)
            warped = jnp.where(gate, warped, plain_crop(v.astype(jnp.float32)))
        outs.append(warped.astype(v.dtype))
    return outs


# ---------------------------------------------------------------------------
# RandomCrop (reference lab2im/layers.py:214-274)
# ---------------------------------------------------------------------------

def random_crop(key, vols, crop_shape):
    """Crop all tensors at the same random offset (uniform in [0, dim-crop])."""
    spatial = vols[0].shape[:3]
    max_val = jnp.array([spatial[d] - crop_shape[d] for d in range(3)], jnp.float32)
    idx = jnp.floor(jax.random.uniform(key, (3,)) * max_val).astype(jnp.int32)
    outs = []
    for v in vols:
        outs.append(jax.lax.dynamic_slice(
            v, (idx[0], idx[1], idx[2], 0), (*crop_shape, v.shape[-1])))
    return outs


# ---------------------------------------------------------------------------
# RandomFlip (reference lab2im/layers.py:277-427)
# ---------------------------------------------------------------------------

def build_swap_lut(label_list, n_neutral_labels):
    """LUT that exchanges left/right label values (reference :375-386).
    Returns None if one side is absent (n_neutral == n_labels)."""
    from ..utils.misc import get_mapping_lut

    label_list = np.asarray(label_list)
    n_labels = len(label_list)
    if n_neutral_labels == n_labels:
        return None
    mid = n_neutral_labels + int((n_labels - n_neutral_labels) / 2)
    parts = np.split(label_list, [n_neutral_labels, mid])
    swapped = np.concatenate([parts[0], parts[2], parts[1]])
    return get_mapping_lut(label_list, swapped)


def random_flip(key, vols, axes, swap_flags, swap_lut=None, prob=0.5):
    """Flip all tensors along ``axes`` with prob each; swap R/L label values on
    inputs flagged in ``swap_flags`` when the number of flips is odd."""
    k_flip = key
    flips = jax.random.uniform(k_flip, (len(axes),)) < prob
    odd = (jnp.sum(flips.astype(jnp.int32)) % 2) != 0
    outs = []
    for v, swap in zip(vols, swap_flags):
        out = v
        if swap and swap_lut is not None:
            # LUT semantics (get_mapping_lut: listed values -> mapped, the
            # rest of [0, len) -> 0, indices clipped) as a select-sum over
            # the LUT's nonzero entries: TPU gathers lower to per-element
            # dynamic-slices (~16 ms per 128-cubed LUT lookup measured);
            # ~n_labels fused compare-selects are ~1-2 ms.
            lut = np.asarray(swap_lut)
            xi = jnp.clip(out.astype(jnp.int32), 0, len(lut) - 1)
            swapped = jnp.zeros_like(xi)
            for src in np.nonzero(lut)[0].tolist():
                swapped = swapped + jnp.where(xi == int(src),
                                              jnp.int32(int(lut[src])), 0)
            out = jnp.where(odd, swapped.astype(v.dtype), out)
        for i, ax in enumerate(axes):
            out = jnp.where(flips[i], jnp.flip(out, axis=ax), out)
        outs.append(out)
    return outs


# ---------------------------------------------------------------------------
# SampleConditionalGMM (reference lab2im/layers.py:430-501)
# ---------------------------------------------------------------------------

def sample_conditional_gmm(key, labels, means, stds, generation_labels):
    """image[x, c] = stds[idx(labels[x]), c]·N(0,1) + means[idx(labels[x]), c].

    labels: (X, Y, Z) or (X, Y, Z, 1) int; means/stds: (n_labels, n_channels).
    """
    labels = labels.astype(jnp.int32)
    if labels.ndim == 4:
        labels = labels[..., 0]
    gen = np.asarray(generation_labels, np.int64)
    # per-label select-sum instead of LUT + per-voxel gathers: TPU gathers
    # lower to per-element dynamic-slices (the three gathers here measured
    # ~34 ms per 128-cubed draw); n_labels fused compare-selects are ~1 ms
    # and XLA keeps them elementwise.  Labels outside generation_labels
    # fall back to row 0, matching the reference zeros-initialized LUT.
    means = means.astype(jnp.float32)
    stds = stds.astype(jnp.float32)
    lab4 = labels[..., None]
    means_map = jnp.zeros((*labels.shape, means.shape[1]), jnp.float32)
    stds_map = jnp.zeros_like(means_map)
    hit = jnp.zeros((*labels.shape, 1), jnp.float32)
    # duplicate label values: the reference LUT keeps the LAST occurrence
    last = {int(lv): li for li, lv in enumerate(gen.tolist())}
    for lv, li in last.items():
        mask = (lab4 == lv).astype(jnp.float32)
        means_map = means_map + mask * means[li]
        stds_map = stds_map + mask * stds[li]
        hit = hit + mask
    means_map = means_map + (1.0 - hit) * means[0]
    stds_map = stds_map + (1.0 - hit) * stds[0]
    noise = jax.random.normal(key, means_map.shape)
    return stds_map * noise + means_map  # (X,Y,Z,n_channels)


# ---------------------------------------------------------------------------
# SampleResolution (reference lab2im/layers.py:504-652)
# ---------------------------------------------------------------------------

def sample_resolution(key, min_resolution, max_res_iso=None, max_res_aniso=None,
                      prob_iso=0.1, prob_min=0.05, return_thickness=True):
    """Random acquisition resolution (3,) and optional slice thickness (3,).

    Mirrors the reference code exactly (including the per-axis-independent
    draws of the 'isotropic' branch — the layer samples U(min, max_iso) for
    each axis, lab2im/layers.py:625)."""
    min_res = jnp.asarray(min_resolution, jnp.float32)
    k_dim, k_iso, k_aniso, k_piso, k_pmin, k_thick = jax.random.split(key, 6)

    max_iso = None if max_res_iso is None else np.asarray(max_res_iso, np.float32)
    max_aniso = None if max_res_aniso is None else np.asarray(max_res_aniso, np.float32)
    if max_iso is not None and np.array_equal(np.asarray(min_resolution, np.float32), max_iso):
        max_iso = None
    if max_aniso is not None and np.array_equal(np.asarray(min_resolution, np.float32), max_aniso):
        max_aniso = None

    dim = jax.random.randint(k_dim, (), 0, 3)
    mask = jnp.arange(3) == dim

    if max_iso is None and max_aniso is None:
        res = min_res
    elif max_iso is not None and max_aniso is None:
        iso = jax.random.uniform(k_iso, (3,), minval=min_res, maxval=jnp.asarray(max_iso))
        res = jnp.where(bernoulli(k_pmin, prob_min), min_res, iso)
    elif max_iso is None:
        aniso = jax.random.uniform(k_aniso, (3,), minval=min_res, maxval=jnp.asarray(max_aniso))
        res = jnp.where(bernoulli(k_pmin, prob_min), min_res,
                        jnp.where(mask, aniso, min_res))
    else:
        iso = jax.random.uniform(k_iso, (3,), minval=min_res, maxval=jnp.asarray(max_iso))
        aniso = jax.random.uniform(k_aniso, (3,), minval=min_res, maxval=jnp.asarray(max_aniso))
        res = jnp.where(bernoulli(k_piso, prob_iso), iso, jnp.where(mask, aniso, min_res))
        res = jnp.where(bernoulli(k_pmin, prob_min), min_res, res)

    if return_thickness:
        thick = jax.random.uniform(k_thick, (3,), minval=min_res, maxval=res)
        return res, thick
    return res


# ---------------------------------------------------------------------------
# GaussianBlur / DynamicGaussianBlur (reference lab2im/layers.py:655-832)
# ---------------------------------------------------------------------------

def gaussian_blur(x, sigma, key=None, blur_range=None, max_sigma=None):
    """Separable blur with optional per-call sigma randomization
    σ' = σ·U(1/blur_range, blur_range) (reference :725-728).

    sigma may be static (list of floats) or traced (3,); max_sigma must be the
    static bound when sigma is traced."""
    sig = jnp.asarray(sigma, jnp.float32)
    if max_sigma is None:
        max_sigma = np.asarray(sigma, np.float32)
    max_sigma = np.asarray(max_sigma, np.float32)
    if blur_range is not None and blur_range != 1:
        assert key is not None, "key needed for blur_range randomization"
        factors = jax.random.uniform(key, (3,), minval=1.0 / blur_range,
                                     maxval=blur_range)
        sig = sig * factors
        max_sigma = max_sigma * blur_range
    return linops.blur3d(x, [sig[0], sig[1], sig[2]], list(max_sigma))


# ---------------------------------------------------------------------------
# MimicAcquisition (reference lab2im/layers.py:835-999)
# ---------------------------------------------------------------------------

def mimic_acquisition(x, resolution, volume_res, resample_shape,
                      build_dist_map=False, min_subsample_res=None,
                      noise_std=0.0, prob_noise=0.95, key=None):
    """Simulate LR acquisition: NN-downsample to the (traced) acquisition grid
    then linear re-upsample to ``resample_shape``.

    Static-shape formulation: the down grid is materialized at its static
    maximum (inshape·volume_res/min_subsample_res — the reference does the
    same, :920-927) and both resamplings become per-axis matrices composed on
    the MXU.  ``resolution``: traced (3,) in mm.

    Edge semantics (verified reference-exact by the literal-transcription
    sweep in tests/test_augment.py): the reference's up-interpn reads the
    STATIC-size down tensor, whose rows beyond the traced ``down_d`` hold
    edge-replicated x[in_d-1] (nearest clip, :946-951), with coords clipped
    to static-1 — NOT to down_d-1 (neuron utils.py:70-80).  Our up-clip to
    ``down_static-1`` reproduces exactly that.

    ``noise_std`` > 0 (requires ``key``) adds Gaussian noise on the
    acquisition grid before re-upsampling, with per-channel std ~
    U(0, noise_std), applied with probability ``prob_noise`` (reference
    :876,953-961); unused by the SynthSR model itself but part of the layer
    surface.
    """
    spatial = x.shape[:3]
    volume_res = np.asarray(volume_res, np.float32)
    if min_subsample_res is None:
        min_subsample_res = volume_res
    down_static = [int(spatial[d] * volume_res[d] / np.asarray(min_subsample_res)[d])
                   for d in range(3)]
    resolution = jnp.asarray(resolution, jnp.float32)

    mats = []
    dmats, umats = [], []
    dist_axes = []
    for d in range(3):
        in_d = spatial[d]
        # down_shape = int(inshape*vol_res/res); int cast truncates (ref :942)
        down_d = jnp.floor(in_d * volume_res[d] / resolution[d]).astype(jnp.float32)
        down_zoom = down_d / in_d
        up_zoom = resample_shape[d] / down_d
        # D: nearest at g/down_zoom on the static down grid (ref :946-951)
        g = jnp.arange(down_static[d], dtype=jnp.float32)
        dn_coords = jnp.clip(g / down_zoom, 0.0, in_d - 1.0)
        dmat = linops.sample_matrix(dn_coords, in_d, method="nearest")
        # U: linear at u/up_zoom over the static down grid (ref :963-966)
        u = jnp.arange(resample_shape[d], dtype=jnp.float32)
        up_coords = jnp.clip(u / up_zoom, 0.0, down_static[d] - 1.0)
        umat = linops.sample_matrix(up_coords, down_static[d], method="linear")
        dmats.append(dmat)
        umats.append(umat)
        mats.append(jnp.einsum("ud,di->ui", umat, dmat,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST))
        if build_dist_map:
            floor = jnp.floor(up_coords)
            ceil = jnp.ceil(up_coords)
            dist_axes.append(jnp.minimum(up_coords - floor, ceil - up_coords)
                             * resolution[d])

    if noise_std > 0:
        assert key is not None, "noise_std > 0 requires a key"
        # noise lives on the acquisition grid (ref :953-961), so the down
        # tensor must materialize; per-channel std ~ U(0, noise_std)
        k_std, k_noise, k_coin = jax.random.split(key, 3)
        down = linops.apply_axis_ops(x, dmats)
        std = jax.random.uniform(k_std, (1, 1, 1, x.shape[-1]),
                                 maxval=noise_std)
        noise = std * jax.random.normal(k_noise, down.shape)
        take = (jax.random.uniform(k_coin, ()) < prob_noise) \
            if prob_noise < 1 else True
        down = jnp.where(take, down + noise, down)
        out = linops.apply_axis_ops(down, umats)
    else:
        out = linops.apply_axis_ops(x, mats)
    if not build_dist_map:
        return out
    dist = jnp.sqrt(dist_axes[0][:, None, None] ** 2
                    + dist_axes[1][None, :, None] ** 2
                    + dist_axes[2][None, None, :] ** 2)
    return out, dist[..., None] * jnp.ones((1, 1, 1, x.shape[-1]), jnp.float32)


# ---------------------------------------------------------------------------
# resample_tensor (+reliability map) (reference edit_tensors.py:257-338)
# ---------------------------------------------------------------------------

def resample_tensor(x, resample_shape, interp_method="linear", subsample_res=None,
                    volume_res=None, build_reliability_map=False):
    """Static-resolution twin of mimic_acquisition: optional NN downsample to
    ``subsample_res`` then resize to ``resample_shape``; closed-form separable
    reliability map (1 = acquired slice, 0 = interpolated)."""
    spatial = x.shape[:3]
    downsample_shape = list(spatial)
    out = x
    if subsample_res is not None:
        assert volume_res is not None, "volume_res required with subsample_res"
        sub = list(np.asarray(subsample_res, np.float64))
        vol = list(np.asarray(volume_res, np.float64))
        if sub != vol:
            downsample_shape = [int(spatial[d] * vol[d] / sub[d]) for d in range(3)]
            out = interp.resize(out, downsample_shape, method="nearest")
    if list(resample_shape) != downsample_shape:
        out = interp.resize(out, list(resample_shape), method=interp_method)

    if not build_reliability_map:
        return out

    if downsample_shape != list(spatial):
        rel = np.ones(1, np.float32)
        factors = np.array(resample_shape, np.float64) / np.array(downsample_shape)
        rel_maps = []
        for d in range(3):
            loc_float = np.arange(0, resample_shape[d], factors[d])
            loc_floor = np.int32(np.floor(loc_float))
            loc_ceil = np.int32(np.clip(loc_floor + 1, 0, resample_shape[d] - 1))
            tmp = np.zeros(resample_shape[d], np.float32)
            tmp[loc_floor] = 1 - (loc_float - loc_floor)
            tmp[loc_ceil] = tmp[loc_ceil] + (loc_float - loc_floor)
            rel_maps.append(tmp)
        rel = (rel_maps[0][:, None, None] * rel_maps[1][None, :, None]
               * rel_maps[2][None, None, :])
        mask = jnp.asarray(rel)[..., None] * jnp.ones((1, 1, 1, x.shape[-1]))
    else:
        mask = jnp.ones_like(out)
    return out, mask


# ---------------------------------------------------------------------------
# BiasFieldCorruption (reference lab2im/layers.py:1002-1097)
# ---------------------------------------------------------------------------

def bias_field_corruption(key, x, bias_field_std=0.3, bias_scale=0.025,
                          same_bias_for_all_channels=False, prob=0.95):
    """Multiply by exp(linear-resize(N(0, U(0, std)) small field))."""
    if bias_field_std <= 0:
        return x
    spatial = x.shape[:3]
    nc = 1 if same_bias_for_all_channels else x.shape[-1]
    small = small_shape_for(spatial, bias_scale)
    k_std, k_field, k_prob = jax.random.split(key, 3)
    std = jax.random.uniform(k_std, (1, 1, 1, nc), maxval=bias_field_std)
    field = jax.random.normal(k_field, (*small, nc)) * std
    field = interp.resize(field, spatial, method="linear")
    bias = jnp.exp(field)
    out = bias * x
    if prob < 1.0:
        out = jnp.where(bernoulli(k_prob, prob), out, x)
    return out


# ---------------------------------------------------------------------------
# IntensityAugmentation (reference lab2im/layers.py:1100-1261)
# ---------------------------------------------------------------------------

def intensity_augmentation(key, x, noise_std=0, clip=0, normalise=True,
                           norm_perc=0, gamma_std=0, contrast_inversion=False,
                           separate_channels=True, prob_noise=0.95, prob_gamma=1):
    """Noise -> clip -> (robust) min-max normalise -> gamma -> inversion."""
    nc = x.shape[-1]
    k_nstd, k_noise, k_pn, k_gamma, k_pg, k_inv = jax.random.split(key, 6)
    sample_shape = (1, 1, 1, nc) if separate_channels else (1, 1, 1, 1)

    if noise_std > 0:
        std = jax.random.uniform(k_nstd, sample_shape, maxval=noise_std)
        if separate_channels:
            noise = jax.random.normal(k_noise, x.shape) * std
        else:
            noise = jax.random.normal(k_noise, (*x.shape[:3], 1)) * std
            noise = jnp.broadcast_to(noise, x.shape)
        noisy = x + noise
        x = noisy if prob_noise == 1 else jnp.where(bernoulli(k_pn, prob_noise), noisy, x)

    if clip:
        cv = clip if isinstance(clip, (list, tuple)) else [0, clip]
        x = jnp.clip(x, cv[0], cv[1])

    if normalise:
        axes = (0, 1, 2) if separate_channels else (0, 1, 2, 3)
        if norm_perc:
            perc = norm_perc if isinstance(norm_perc, (list, tuple)) \
                else [norm_perc, 1 - norm_perc]
            flat = x.reshape(-1, nc) if separate_channels else x.reshape(-1, 1)
            n = flat.shape[0]
            srt = jnp.sort(flat, axis=0)
            m = srt[max(int(perc[0] * n), 0)]
            big = srt[min(int(perc[1] * n), n - 1)]
        else:
            m = jnp.min(x, axis=axes)
            big = jnp.max(x, axis=axes)
        m = m.reshape(sample_shape if separate_channels else (1, 1, 1, 1))
        big = big.reshape(sample_shape if separate_channels else (1, 1, 1, 1))
        x = jnp.clip(x, m, big)
        x = (x - m) / (big - m + 1e-7)  # K.epsilon()

    if gamma_std > 0:
        gamma = jax.random.normal(k_gamma, sample_shape) * gamma_std
        powed = jnp.power(jnp.maximum(x, 0.0), jnp.exp(gamma))
        x = powed if prob_gamma == 1 else jnp.where(bernoulli(k_pg, prob_gamma), powed, x)

    if contrast_inversion:
        invert = jax.random.uniform(k_inv, sample_shape) < 0.5
        x = jnp.where(invert, 1.0 - x, x)

    return x
