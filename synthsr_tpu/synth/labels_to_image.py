"""The SynthSR generative model: label map -> (input image(s), regression target).

TPU-native re-design of ``SynthSR/labels_to_image_model.py:32-266``: instead of
a Keras graph of stateful layers, the pipeline is ONE pure jitted function
``generate(key, labels, means, stds[, real_image])`` composed from the op
library in synth/augment.py.  All randomness hangs off the single input key in
a fixed split order (golden-test stable); all shapes are static; per-channel
random acquisition runs as traced-value matrix ops.

Shape algebra (crop/output/padding) mirrors ``get_shapes``
(labels_to_image_model.py:269-335) exactly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..io.volume import get_ras_axes
from ..ops import interp as _interp
from ..ops.blur import blurring_sigma_for_downsampling, blurring_sigma_np
from ..utils.misc import (find_closest_number_divisible_by_m, reformat_to_list,
                          reformat_to_n_channels_array)
from . import augment


# ---------------------------------------------------------------------------
# shape algebra (reference get_shapes, labels_to_image_model.py:269-335)
# ---------------------------------------------------------------------------

def get_shapes(labels_shape, output_shape, atlas_res, target_res, padding_margin,
               output_div_by_n):
    atlas_res = reformat_to_list(atlas_res)
    n_dims = len(atlas_res)
    target_res = reformat_to_list(target_res)

    if padding_margin is not None:
        padding_margin = reformat_to_list(padding_margin, length=n_dims, dtype="int")
        labels_shape = [labels_shape[i] + 2 * padding_margin[i] for i in range(n_dims)]

    if atlas_res != target_res:
        resample_factor = [atlas_res[i] / float(target_res[i]) for i in range(n_dims)]
    else:
        resample_factor = None

    if output_shape is not None:
        output_shape = reformat_to_list(output_shape, length=n_dims, dtype="int")
        if resample_factor is not None:
            output_shape = [min(int(labels_shape[i] * resample_factor[i]),
                                output_shape[i]) for i in range(n_dims)]
        else:
            output_shape = [min(labels_shape[i], output_shape[i]) for i in range(n_dims)]
        if output_div_by_n is not None:
            tmp = [find_closest_number_divisible_by_m(s, output_div_by_n)
                   for s in output_shape]
            if output_shape != tmp:
                print(f"output shape {output_shape} not divisible by "
                      f"{output_div_by_n}, changed to {tmp}")
                output_shape = tmp
            if any(s == 0 for s in output_shape):
                # the reference's 'lower' rounding silently yields 0 here and
                # crashes deep in the graph; fail with guidance instead
                raise ValueError(
                    f"output_shape rounds down to {output_shape}: each dim "
                    f"must be at least output_div_by_n={output_div_by_n} "
                    f"(2^(n_levels-1) of the U-Net)")
        if resample_factor is not None:
            cropping_shape = [int(np.around(output_shape[i] / resample_factor[i], 0))
                              for i in range(n_dims)]
        else:
            cropping_shape = output_shape
    else:
        if output_div_by_n is not None:
            if resample_factor is not None:
                output_shape = [int(labels_shape[i] * resample_factor[i])
                                for i in range(n_dims)]
                output_shape = [find_closest_number_divisible_by_m(s, output_div_by_n)
                                for s in output_shape]
                cropping_shape = [int(np.around(output_shape[i] / resample_factor[i], 0))
                                  for i in range(n_dims)]
            else:
                cropping_shape = [find_closest_number_divisible_by_m(s, output_div_by_n)
                                  for s in labels_shape]
                output_shape = cropping_shape
        else:
            cropping_shape = list(labels_shape)
            if resample_factor is not None:
                output_shape = [int(cropping_shape[i] * resample_factor[i])
                                for i in range(n_dims)]
            else:
                output_shape = cropping_shape

    return cropping_shape, output_shape, padding_margin


# ---------------------------------------------------------------------------
# configuration (parameter surface of labels_to_image_model.py:32-58)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class GenerationConfig:
    labels_shape: Sequence[int]
    input_channels: Sequence[bool]
    output_channel: Optional[Sequence[int]]
    generation_labels: np.ndarray
    n_neutral_labels: int
    atlas_res: Any
    target_res: Any = None
    output_shape: Optional[Sequence[int]] = None
    output_div_by_n: Optional[int] = None
    padding_margin: Any = None
    flipping: bool = True
    aff: Optional[np.ndarray] = None
    scaling_bounds: Any = 0.15
    rotation_bounds: Any = 15
    shearing_bounds: Any = 0.012
    translation_bounds: Any = False
    nonlin_std: float = 3.0
    nonlin_shape_factor: float = 0.0625
    simulate_registration_error: Any = True
    randomise_res: Any = False
    max_res_iso: float = 9.0
    data_res: Any = None
    thickness: Any = None
    downsample: Any = False
    build_reliability_maps: bool = False
    blur_range: float = 1.15
    bias_field_std: float = 0.3
    bias_shape_factor: float = 0.025
    # registration-error warps: gather-free shear factorization by default
    # (ops/shear_warp.py — TPU has no hardware gather and the three 8-corner
    # trilinear warps dominated the synth-train step at ~410 of ~950 ms);
    # exact_warp=True restores reference-exact joint trilinear interpolation
    exact_warp: bool = False

    # --- resolved (filled by resolve()) ---
    n_channels: int = dataclasses.field(default=0, init=False)
    use_real_image: bool = dataclasses.field(default=False, init=False)
    idx_first_input_channel: int = dataclasses.field(default=0, init=False)
    crop_shape: List[int] = dataclasses.field(default_factory=list, init=False)
    out_shape: List[int] = dataclasses.field(default_factory=list, init=False)
    pad_margin: Any = dataclasses.field(default=None, init=False)
    atlas_res3: np.ndarray = dataclasses.field(default=None, init=False)
    target_res3: np.ndarray = dataclasses.field(default=None, init=False)
    data_res_rc: np.ndarray = dataclasses.field(default=None, init=False)
    thickness_rc: np.ndarray = dataclasses.field(default=None, init=False)
    downsample_rc: List[bool] = dataclasses.field(default_factory=list, init=False)
    randomise_rc: List[bool] = dataclasses.field(default_factory=list, init=False)
    simulate_reg_rc: List[bool] = dataclasses.field(default_factory=list, init=False)
    flip_axis: int = dataclasses.field(default=0, init=False)
    swap_lut: Any = dataclasses.field(default=None, init=False)
    reg_disp_fwd: int = dataclasses.field(default=0, init=False)
    reg_disp_inv: int = dataclasses.field(default=0, init=False)

    def resolve(self) -> "GenerationConfig":
        """Derive all static quantities (reference :70-103)."""
        n_channels = len(self.input_channels)
        self.n_channels = n_channels
        self.use_real_image = self.output_channel is None
        self.idx_first_input_channel = int(np.argmax(self.input_channels))
        self.simulate_reg_rc = reformat_to_list(self.simulate_registration_error,
                                                length=n_channels)

        labels_shape = reformat_to_list(self.labels_shape)
        n_dims = len(labels_shape)
        atlas = reformat_to_n_channels_array(self.atlas_res, n_dims, n_channels)

        data_res = self.data_res
        thickness = self.thickness
        if self.output_channel is not None and data_res is not None:
            for idx in reformat_to_list(self.output_channel):
                if not self.input_channels[idx]:
                    data_res = np.insert(np.asarray(data_res, float), idx, 1, axis=0)
                    if thickness is not None:
                        thickness = np.insert(np.asarray(thickness, float), idx, 1, axis=0)
        data_res = atlas if data_res is None \
            else reformat_to_n_channels_array(data_res, n_dims, n_channels)
        thickness = data_res if thickness is None \
            else reformat_to_n_channels_array(thickness, n_dims, n_channels)
        if self.downsample:
            downsample = reformat_to_list(self.downsample, n_channels)
        else:
            downsample = list(np.min(np.asarray(thickness) - np.asarray(data_res), 1) < 0)
        self.data_res_rc = np.asarray(data_res, np.float32)
        self.thickness_rc = np.asarray(thickness, np.float32)
        self.downsample_rc = [bool(d) for d in downsample]
        self.atlas_res3 = np.asarray(atlas[0], np.float32)
        self.target_res3 = self.atlas_res3 if self.target_res is None else \
            np.asarray(reformat_to_n_channels_array(self.target_res, n_dims)[0], np.float32)
        if isinstance(self.randomise_res, bool):
            self.randomise_rc = [self.randomise_res] * n_channels
        else:
            self.randomise_rc = list(self.randomise_res)

        crop, out, pad = get_shapes(labels_shape, self.output_shape,
                                    list(self.atlas_res3), list(self.target_res3),
                                    self.padding_margin, self.output_div_by_n)
        self.crop_shape, self.out_shape, self.pad_margin = crop, out, pad

        if not self.exact_warp and any(self.simulate_reg_rc):
            # static shift bounds for the gather-free registration-error
            # warps (reference draws: fwd 5 deg / 5 vox, err 0.5 / 0.5;
            # the inverse-with-error composition stays within 6 / 6)
            from ..ops.shear_warp import static_max_disp

            self.reg_disp_fwd = static_max_disp(
                self.crop_shape, rotation_bounds=5, translation_bounds=5)
            self.reg_disp_inv = static_max_disp(
                self.out_shape, rotation_bounds=6, translation_bounds=6)

        if self.flipping:
            assert self.aff is not None, "aff must be provided when flipping is on"
            self.flip_axis = int(get_ras_axes(self.aff, n_dims)[0])
            self.swap_lut = augment.build_swap_lut(self.generation_labels,
                                                   self.n_neutral_labels)
        return self


# ---------------------------------------------------------------------------
# the generator
# ---------------------------------------------------------------------------

def pad_around_centre(x, margin):
    """Symmetric zero padding (reference PadAroundCentre, lab2im/layers.py:1692)."""
    m = reformat_to_list(margin, length=3, dtype="int")
    return jnp.pad(x, [(m[0], m[0]), (m[1], m[1]), (m[2], m[2]), (0, 0)])


def build_generator(cfg: GenerationConfig, return_labels: bool = False):
    """Return generate(key, labels, means, stds[, real_image]) -> (image, target)
    for ONE sample; labels (X,Y,Z) or (X,Y,Z,1) int32, means/stds
    (n_labels, n_channels).  vmap/jit at the call site.

    ``return_labels`` additionally returns the deformed label map (the
    reference's 'segmentation_target' tensor, labels_to_image_model.py:169),
    needed by the frozen-segmenter Dice regularizer."""
    cfg = cfg.resolve()

    def generate(key, labels, means, stds, real_image=None):
        keys = jax.random.split(key, 8 + 8 * cfg.n_channels)
        ki = iter(range(len(keys)))

        if labels.ndim == 3:
            labels = labels[..., None]
        labels = labels.astype(jnp.int32)
        vols = [labels]
        methods = ["nearest"]
        swap_flags = [True]
        if cfg.use_real_image:
            assert real_image is not None, "real_image required when output_channel is None"
            if real_image.ndim == 3:
                real_image = real_image[..., None]
            vols.append(real_image.astype(jnp.float32))
            methods.append("linear")
            swap_flags.append(False)

        # pad (reference :115-122)
        if cfg.pad_margin is not None:
            vols = [pad_around_centre(v, cfg.pad_margin) for v in vols]

        # deform (reference :125-142) + crop (reference :145-151) — fused
        # when a crop follows: the shift field and gather run on the crop
        # window only (augment.random_spatial_deformation_cropped), with
        # identical keys/draws/values to the deform-then-crop composition
        if list(cfg.crop_shape) != list(vols[0].shape[:3]):
            k_deform, k_crop = keys[next(ki)], keys[next(ki)]
            vols = augment.random_spatial_deformation_cropped(
                k_deform, k_crop, vols, methods, cfg.crop_shape,
                scaling_bounds=cfg.scaling_bounds,
                rotation_bounds=cfg.rotation_bounds,
                shearing_bounds=cfg.shearing_bounds,
                translation_bounds=cfg.translation_bounds,
                nonlin_std=cfg.nonlin_std,
                nonlin_scale=cfg.nonlin_shape_factor)
        else:
            vols = augment.random_spatial_deformation(
                keys[next(ki)], vols, methods,
                scaling_bounds=cfg.scaling_bounds,
                rotation_bounds=cfg.rotation_bounds,
                shearing_bounds=cfg.shearing_bounds,
                translation_bounds=cfg.translation_bounds,
                nonlin_std=cfg.nonlin_std, nonlin_scale=cfg.nonlin_shape_factor)
            next(ki)

        # flip (reference :154-162)
        if cfg.flipping:
            vols = augment.random_flip(keys[next(ki)], vols, axes=[cfg.flip_axis],
                                       swap_flags=swap_flags, swap_lut=cfg.swap_lut)
        else:
            next(ki)

        labels = vols[0]
        real = vols[1] if cfg.use_real_image else None

        # GMM synthesis (reference :165-166)
        image = augment.sample_conditional_gmm(keys[next(ki)], labels, means, stds,
                                               cfg.generation_labels)

        channels = []
        targets = []
        t_err_key = keys[next(ki)]
        for i in range(cfg.n_channels):
            kc = jax.random.split(keys[next(ki)], 8)
            channel = image[..., i:i + 1]

            # bias field (reference :178-180)
            if cfg.input_channels[i]:
                channel = augment.bias_field_corruption(
                    kc[0], channel, cfg.bias_field_std, cfg.bias_shape_factor,
                    same_bias_for_all_channels=False)

            # intensity augmentation + base blur (reference :183-186)
            channel = augment.intensity_augmentation(kc[1], channel, clip=300,
                                                     normalise=True, gamma_std=0.5)
            channel = augment.gaussian_blur(channel, [0.5] * 3, key=kc[2])

            # synthetic regression target (reference :189-196). The reference
            # REASSIGNS `channel` to the blurred+resampled tensor, so when
            # crop_shape != out_shape the acquisition simulation below runs on
            # the target-res tensor — preserved verbatim.
            if not cfg.use_real_image and any(c == i for c in cfg.output_channel):
                if list(cfg.crop_shape) != list(cfg.out_shape):
                    sigma = blurring_sigma_np(cfg.atlas_res3, cfg.target_res3)
                    channel = augment.gaussian_blur(channel, list(sigma))
                    channel = augment.resample_tensor(channel, cfg.out_shape)
                targets.append(channel)

            if not cfg.input_channels[i]:
                continue

            # registration-error simulation, forward part (reference :201-209)
            sim_err = cfg.simulate_reg_rc[i] and (i != cfg.idx_first_input_channel)
            if sim_err:
                kt = jax.random.fold_in(t_err_key, i)
                kt_fwd, kt_err = jax.random.split(kt)
                t_fwd = augment.sample_affine_matrix(kt_fwd, rotation_bounds=5,
                                                     translation_bounds=5)
                if cfg.exact_warp:
                    shift = _interp.affine_to_shift(t_fwd, channel.shape[:3])
                    channel = _interp.transform(channel, shift, method="linear")
                else:
                    from ..ops.shear_warp import shear_warp_affine

                    channel = shear_warp_affine(channel, t_fwd,
                                                cfg.reg_disp_fwd)

            # acquisition simulation (reference :214-228)
            if cfg.randomise_rc[i]:
                max_res = np.array([cfg.max_res_iso] * 3, np.float32)
                resolution, blur_res = augment.sample_resolution(
                    kc[3], list(cfg.atlas_res3), max_res_iso=max_res,
                    max_res_aniso=max_res)
                sigma = blurring_sigma_for_downsampling(cfg.atlas_res3, resolution,
                                                        mult_coef=0.42,
                                                        thickness=blur_res)
                max_sigma = 0.75 * max_res / cfg.atlas_res3
                channel = augment.gaussian_blur(channel, [sigma[0], sigma[1], sigma[2]],
                                                key=kc[4], blur_range=cfg.blur_range,
                                                max_sigma=max_sigma)
                channel, rel_map = augment.mimic_acquisition(
                    channel, resolution, cfg.atlas_res3, cfg.out_shape,
                    build_dist_map=True, min_subsample_res=cfg.atlas_res3)
            else:
                sigma = blurring_sigma_np(cfg.atlas_res3, cfg.data_res_rc[i], 0.42,
                                          cfg.thickness_rc[i])
                channel = augment.gaussian_blur(channel, list(sigma), key=kc[5],
                                                blur_range=cfg.blur_range)
                if cfg.downsample_rc[i]:
                    channel, rel_map = augment.resample_tensor(
                        channel, cfg.out_shape, "linear", list(cfg.data_res_rc[i]),
                        list(cfg.atlas_res3), build_reliability_map=True)
                else:
                    channel, rel_map = augment.resample_tensor(
                        channel, cfg.out_shape, build_reliability_map=True)

            # registration-error simulation, inverse-with-error (reference :231-238)
            if sim_err:
                t_err = augment.sample_affine_matrix(kt_err, rotation_bounds=0.5,
                                                     translation_bounds=0.5)
                t_inv_err = t_err @ jnp.linalg.inv(t_fwd)
                if cfg.exact_warp:
                    shift = _interp.affine_to_shift(t_inv_err, channel.shape[:3])
                    channel = _interp.transform(channel, shift, method="linear")
                    rel_map = _interp.transform(rel_map, shift, method="linear")
                else:
                    from ..ops.shear_warp import shear_warp_affine

                    # channel + reliability map share the transform: one
                    # 2-channel pass set instead of two warps
                    both = shear_warp_affine(
                        jnp.concatenate([channel, rel_map], axis=-1),
                        t_inv_err, cfg.reg_disp_inv)
                    channel, rel_map = both[..., :1], both[..., 1:]

            channels.append(channel)
            if cfg.build_reliability_maps:
                channels.append(rel_map)

        image_out = jnp.concatenate(channels, axis=-1) if len(channels) > 1 \
            else channels[0]

        # target (reference :245-258)
        if cfg.use_real_image:
            target = augment.intensity_augmentation(keys[next(ki)], real,
                                                    normalise=True, gamma_std=0)
            if list(cfg.crop_shape) != list(cfg.out_shape):
                sigma = blurring_sigma_np(cfg.atlas_res3, cfg.target_res3)
                target = augment.gaussian_blur(target, list(sigma))
                target = augment.resample_tensor(target, cfg.out_shape)
        else:
            target = jnp.concatenate(targets, axis=-1) if len(targets) > 1 \
                else targets[0]
        if return_labels:
            return (image_out.astype(jnp.float32), target.astype(jnp.float32),
                    labels)
        return image_out.astype(jnp.float32), target.astype(jnp.float32)

    return generate


def build_batched_generator(cfg: GenerationConfig, batchsize: int = 1, jit: bool = True):
    """vmapped + (optionally) jitted generator over a leading batch axis."""
    gen = build_generator(cfg)
    use_real = cfg.output_channel is None

    if use_real:
        def batched(key, labels, means, stds, real_image):
            keys = jax.random.split(key, batchsize)
            return jax.vmap(gen)(keys, labels, means, stds, real_image)
    else:
        def batched(key, labels, means, stds):
            keys = jax.random.split(key, batchsize)
            return jax.vmap(gen)(keys, labels, means, stds)

    return jax.jit(batched) if jit else batched
