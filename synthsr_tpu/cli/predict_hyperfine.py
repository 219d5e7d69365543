"""Hyperfine multispectral predict CLI: T1 + T2 low-field pairs -> 1 mm MP-RAGE.

TPU-native rebuild of ``scripts/predict_command_line_hyperfine.py``: 2-channel
U-Net predicting a RESIDUAL; T1 resampled to 1 mm + RAS-aligned (:110-112), T2
resliced into the T1 grid via resample_volume_like (:113-114); the training-
quirk normalizations are preserved exactly — T1 divided by max/3, T2 scaled to
[0, 2] (:116-121, "don't ask, it's something I messed up at training"); final
prediction = minimum + spread·(residual + t1), clipped at 0 (:128-131).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def build_arg_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path_t1_images", help="T1 image or folder of T1 images")
    p.add_argument("path_t2_images", help="T2 image or folder (same order as T1)")
    p.add_argument("path_predictions", help="output path (file or folder)")
    p.add_argument("--cpu", action="store_true", help="run on CPU")
    p.add_argument("--threads", type=int, default=1, help="CPU threads")
    p.add_argument("--model", default=None,
                   help="alternative model weights (.h5 or .msgpack)")
    p.add_argument("--fast_inference", choices=["auto", "on", "off"],
                   default="auto",
                   help="channels-first Pallas conv forward (the 2-channel "
                        "first conv qualifies for the output-stationary "
                        "kernel). auto = on for TPU bf16 runs")
    return p


DEFAULT_MODEL = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "models", "SynthSR_v10_210712_hyperfine.h5")


def _prepare_paths(t1, t2, preds):
    from ..utils.misc import list_images_in_folder

    t1, t2, preds = map(os.path.abspath, (t1, t2, preds))
    exts = (".nii.gz", ".nii", ".mgz", ".npz")
    if not any(os.path.basename(t1).endswith(e) for e in exts):
        if os.path.isfile(t1):
            raise ValueError(f"extension not supported for {t1}")
        t1s = list_images_in_folder(t1)
        t2s = list_images_in_folder(t2)
        assert len(t1s) == len(t2s), "different numbers of T1 and T2 images"
        os.makedirs(preds, exist_ok=True)
        outs = []
        for im in t1s:
            name = os.path.basename(im)
            for e in exts:
                if name.endswith(e):
                    name = name[: -len(e)] + "_SynthSR" + e
                    break
            outs.append(os.path.join(preds, name))
        return t1s, t2s, outs
    assert os.path.isfile(t1), f"file does not exist: {t1}"
    assert os.path.isfile(t2), f"file does not exist: {t2}"
    return [t1], [t2], [preds]


class HyperfinePredictor:
    """T1+T2 residual predictor (compiles once per padded shape)."""

    def __init__(self, model_path=None, compute_dtype="bfloat16",
                 fast_inference="auto"):
        import jax
        import jax.numpy as jnp

        from ..models.unet import synthsr_unet
        from .predict import load_unet_variables

        dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(compute_dtype)]
        self.model = synthsr_unet(compute_dtype=dt)
        self.variables = load_unet_variables(
            self.model, model_path if model_path is not None else DEFAULT_MODEL,
            example_channels=2)
        if fast_inference == "auto":
            fast_inference = ("on" if jax.default_backend() == "tpu"
                              and dt == jnp.bfloat16 else "off")
        self.use_fast = fast_inference == "on"
        self._jitted = {}

    def _fwd(self, shape):
        import jax

        if shape not in self._jitted:
            model = self.model
            if self.use_fast:
                from ..models.unet_cf import make_fast_predictor

                fast = make_fast_predictor(model, self.variables,
                                           (1, *shape, 2))
                self._jitted[shape] = lambda v, s: fast(s, v)
            else:
                self._jitted[shape] = jax.jit(lambda v, s: model.apply(v, s))
        return self._jitted[shape]

    def predict_pair(self, im1, aff1, im2, aff2):
        import jax.numpy as jnp

        from ..io.volume import align_volume_to_ref, resample_volume_like
        from ..ops.host_matrices import (resample_volume_matrices,
                                         reslice_like_matrices)
        from ..ops.linops import apply_axis_ops

        im1 = np.asarray(im1, np.float32)
        im2 = np.asarray(im2, np.float32)

        # T1 -> 1mm RAS (device matrices, reference math)
        mats, new_shape, aff1 = resample_volume_matrices(im1.shape, aff1, [1.0] * 3)
        im1 = np.asarray(apply_axis_ops(jnp.asarray(im1),
                                        [jnp.asarray(m) for m in mats]))
        im1, aff1_mod = align_volume_to_ref(im1, aff1, aff_ref=np.eye(4),
                                            return_aff=True, n_dims=3)
        # T2 resliced into the T1 grid
        mats2 = reslice_like_matrices(im1.shape, aff1_mod, im2.shape, aff2)
        if mats2 is not None:
            im2 = np.asarray(apply_axis_ops(jnp.asarray(im2),
                                            [jnp.asarray(m) for m in mats2]))
        else:  # oblique transform: host fallback
            im2 = resample_volume_like(im1, aff1_mod, im2, aff2)

        # training-quirk normalizations (reference :116-121)
        minimum = float(np.min(im1))
        im1 = im1 - minimum
        spread = float(np.max(im1)) / 3.0
        if spread > 0:
            im1 = im1 / spread
        im2 = im2 - np.min(im2)
        mx2 = np.max(im2)
        if mx2 > 0:
            im2 = im2 / mx2 * 2.0

        stacked = np.stack([im1, im2], axis=-1)[None]
        shape = np.array(stacked.shape[1:-1])
        padded = (np.ceil(shape / 32.0) * 32).astype(int)
        lo = np.floor((padded - shape) / 2).astype(int)
        s = np.zeros((1, *padded, 2), np.float32)
        s[0, lo[0]:lo[0] + shape[0], lo[1]:lo[1] + shape[1],
          lo[2]:lo[2] + shape[2], :] = stacked

        out = np.asarray(self._fwd(tuple(padded))(self.variables, jnp.asarray(s)))
        residual = out[0, lo[0]:lo[0] + shape[0], lo[1]:lo[1] + shape[1],
                       lo[2]:lo[2] + shape[2], 0]
        pred = minimum + spread * (residual + im1)
        pred[pred < 0] = 0
        return pred, aff1_mod

    def predict_files(self, p1, p2, pout):
        from ..io.volume import load_volume, save_volume

        im1, aff1, _ = load_volume(p1, im_only=False, dtype="float")
        im2, aff2, _ = load_volume(p2, im_only=False, dtype="float")
        pred, aff = self.predict_pair(im1, aff1, im2, aff2)
        save_volume(pred, aff, None, pout)


def run_batch(predictor: HyperfinePredictor, t1s, t2s, outs,
              prefetch: int = 2, verbose: bool = False):
    """Directory batch mode on the shared three-stage pipeline
    (cli/_pipeline.py; the reference loop predict_command_line_hyperfine
    .py:95-135 is fully serial).  Outputs identical to the serial loop."""
    from ..io.volume import load_volume
    from ._pipeline import run_pipelined

    def loads():
        for p1, p2 in zip(t1s, t2s):
            yield (load_volume(p1, im_only=False, dtype="float"),
                   load_volume(p2, im_only=False, dtype="float"))

    def predict(item):
        (im1, aff1, _), (im2, aff2, _) = item
        return predictor.predict_pair(im1, aff1, im2, aff2)

    run_pipelined(loads(), predict, outs, prefetch=prefetch, verbose=verbose,
                  describe=lambda idx: t1s[idx] + ", " + t2s[idx])


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    if args.cpu:
        print("using CPU backend")
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..utils.misc import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    t1s, t2s, outs = _prepare_paths(args.path_t1_images, args.path_t2_images,
                                    args.path_predictions)
    print(f"Found {len(t1s)} images")
    predictor = HyperfinePredictor(model_path=args.model,
                                   fast_inference=args.fast_inference)
    run_batch(predictor, t1s, t2s, outs, verbose=True)
    print("\nAll done!\n")


if __name__ == "__main__":
    sys.exit(main())
