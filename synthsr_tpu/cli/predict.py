"""All-purpose SynthSR predict CLI: arbitrary MRI/CT -> synthetic 1 mm MP-RAGE.

TPU-native rebuild of ``scripts/predict_command_line.py``: same flag surface
(--cpu/--threads/--ct/--model/--disable_flipping), same file/dir batch
semantics and ``_SynthSR`` output naming (:91-105), same math — CT clip to
[0, 80] HU (:114-116), resample to 1 mm (:117), RAS alignment (:119), min-max
normalization (:120-121), centre zero-pad to a multiple of 32 (:123-126),
flip-averaged TTA (:131), output 255·pred clipped to [0, 128] (:134-136).

Deviations (documented, SURVEY.md §7): the reference's ``args.model`` /
``args.disable_flipping`` attribute-access-on-dict bug (:78,128) is fixed, and
the host scipy resample runs on the accelerator as per-axis matrix ops.
"""

from __future__ import annotations

import argparse
import os
import sys
from functools import partial

import numpy as np


def build_arg_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("path_images",
                   help="image or folder of images to super-resolve / synthesize")
    p.add_argument("path_predictions",
                   help="output path; same type as path_images (file or folder)")
    p.add_argument("--cpu", action="store_true",
                   help="run on CPU instead of the accelerator")
    p.add_argument("--threads", type=int, default=1,
                   help="CPU threads when running with --cpu")
    p.add_argument("--ct", action="store_true", help="input is a CT scan")
    p.add_argument("--model", default=None,
                   help="alternative model weights (.h5 Keras or .msgpack flax)")
    p.add_argument("--disable_flipping", action="store_true",
                   help="disable flip test-time augmentation")
    p.add_argument("--fast_inference", choices=["auto", "on", "off"],
                   default="auto",
                   help="channels-first Pallas conv forward (~1.3x the XLA "
                        "path on TPU; bf16-level output differences). "
                        "auto = on for single-channel TPU runs")
    # note: no --lowfield flag — the reference CLI has none and ships no
    # low-field model (models/models.txt lists only the all-purpose and
    # hyperfine weights); a silently-ignored flag would be a footgun
    return p


def _prepare_paths(path_images: str, path_predictions: str):
    """File-or-directory batch semantics with _SynthSR suffix naming
    (reference :91-105)."""
    from ..utils.misc import list_images_in_folder

    path_images = os.path.abspath(path_images)
    basename = os.path.basename(path_images)
    path_predictions = os.path.abspath(path_predictions)
    exts = (".nii.gz", ".nii", ".mgz", ".npz")
    if not any(basename.endswith(e) for e in exts):
        if os.path.isfile(path_images):
            raise ValueError(f"extension not supported for {path_images}, "
                             "only use: nii.gz, .nii, .mgz, or .npz")
        images = list_images_in_folder(path_images)
        os.makedirs(path_predictions, exist_ok=True)
        outs = []
        for im in images:
            name = os.path.basename(im)
            for e in (".nii.gz", ".nii", ".mgz", ".npz"):
                if name.endswith(e):
                    name = name[: -len(e)] + "_SynthSR" + e
                    break
            outs.append(os.path.join(path_predictions, name))
        return images, outs
    if not os.path.isfile(path_images):
        raise FileNotFoundError(f"file does not exist: {path_images}")
    return [path_images], [path_predictions]


DEFAULT_MODEL = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "models", "SynthSR_v10_210712.h5")


def load_unet_variables(model, model_path: str | None, example_channels: int = 1):
    """Init the flax U-Net and fill it from .h5 (Keras) or .msgpack (flax)."""
    import jax
    import jax.numpy as jnp

    from ..models.h5_import import load_keras_unet_weights

    x = jnp.zeros((1, 32, 32, 32, example_channels), jnp.float32)
    # jit the init: eager init dispatches hundreds of tiny ops, which is very
    # slow over a tunneled device
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), x))
    if model_path is None:
        model_path = DEFAULT_MODEL
        if not os.path.isfile(model_path):
            raise FileNotFoundError(
                f"default weights not found at {model_path}; pass --model. "
                "(The reference ships SynthSR_v10_210712.h5 via git-LFS.)")
    if model_path.endswith(".h5"):
        return load_keras_unet_weights(model_path, variables)
    if model_path.endswith(".msgpack"):
        import flax.serialization as ser

        with open(model_path, "rb") as f:
            return ser.from_bytes(variables, f.read())
    raise ValueError(f"unsupported weights format: {model_path}")


class Predictor:
    """Reusable jitted predict pipeline (compiles once per padded shape)."""

    def __init__(self, model_path=None, disable_flipping=False, ct=False,
                 compute_dtype="bfloat16", n_channels=1, fast_inference="auto"):
        import jax
        import jax.numpy as jnp

        from ..models.unet import synthsr_unet

        dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(compute_dtype)]
        self.model = synthsr_unet(compute_dtype=dt)
        self.variables = load_unet_variables(self.model, model_path, n_channels)
        self.disable_flipping = disable_flipping
        self.ct = ct
        if fast_inference == "auto":
            # cin <= 2 qualifies for the output-stationary first-conv kernel
            # (ops/conv_pallas.py); every deeper conv is channel-count-agnostic
            fast_inference = ("on" if jax.default_backend() == "tpu"
                              and n_channels <= 2 and dt == jnp.bfloat16
                              else "off")
        self.use_fast = fast_inference == "on"
        self._jitted = {}

    def _net_fn(self, shape):
        import jax
        import jax.numpy as jnp

        if shape not in self._jitted:
            model = self.model
            flip = not self.disable_flipping

            combine = jax.jit(
                lambda y0, y1: jnp.clip(255.0 * (0.5 * y0 + 0.5 * y1), 0.0, 128.0))
            post = jax.jit(lambda y: jnp.clip(255.0 * y, 0.0, 128.0))

            if self.use_fast:
                from ..models.unet_cf import (flip_d_variables,
                                              make_fast_predictor)

                variables = self.variables
                fast = make_fast_predictor(model, variables,
                                           (1, *shape, 1))
                # flip-TTA pass: same executables, D-flipped conv kernels.
                # By the equivariance identity net(flip(x)) == flip(net_fd(x)),
                # net_fd(s) == flip(net(flip(s))) — i.e. fast(s, v_flip) IS the
                # flipped-back TTA prediction already; no input-flip volume
                # pass and NO output flip (an extra flip here would average
                # spatially misaligned volumes).
                v_flip = flip_d_variables(variables) if flip else None

                def run(_, s):
                    y0 = fast(s)
                    if flip:
                        y1 = fast(s, v_flip)
                        return combine(y0, y1)
                    return post(y0)
            else:
                # TTA as SEPARATE executables: a 256³ single forward peaks at
                # ~13.6G temp HBM on a 16G chip, so the two flip passes must
                # not share one XLA program (interleaved scheduling OOMs).
                fwd = jax.jit(lambda v, s: model.apply(v, s))
                fwd_flipped = jax.jit(
                    lambda v, s: jnp.flip(model.apply(v, jnp.flip(s, axis=1)),
                                          axis=1))

                def run(variables, s):
                    y0 = fwd(variables, s)
                    if flip:
                        y1 = fwd_flipped(variables, s)
                        return combine(y0, y1)
                    return post(y0)

            self._jitted[shape] = run
        return self._jitted[shape]

    def predict_volume(self, im: np.ndarray, aff: np.ndarray):
        """Run the full reference pipeline on one volume; returns (pred, aff)."""
        import jax.numpy as jnp

        from ..io.volume import align_volume_to_ref
        from ..ops.host_matrices import resample_volume_matrices
        from ..ops.linops import apply_axis_ops

        im = np.asarray(im, np.float32)
        if self.ct:
            im = np.clip(im, 0.0, 80.0)

        # resample to 1mm on device (reference edit_volumes.resample_volume math)
        mats, new_shape, aff = resample_volume_matrices(im.shape, aff, [1.0, 1.0, 1.0])
        dev = apply_axis_ops(jnp.asarray(im), [jnp.asarray(m) for m in mats])
        im = np.asarray(dev).reshape(new_shape)

        im, aff2 = align_volume_to_ref(im, aff, aff_ref=np.eye(4), return_aff=True,
                                       n_dims=3)
        im = im - np.min(im)
        mx = np.max(im)
        if mx > 0:
            im = im / mx

        shape = np.array(im.shape)
        padded = (np.ceil(shape / 32.0) * 32).astype(int)
        lo = np.floor((padded - shape) / 2).astype(int)
        s = np.zeros((1, *padded, 1), np.float32)
        s[0, lo[0]:lo[0] + shape[0], lo[1]:lo[1] + shape[1],
          lo[2]:lo[2] + shape[2], 0] = im

        run = self._net_fn(tuple(padded))
        pred = np.asarray(run(self.variables, jnp.asarray(s)))[0, ..., 0]
        pred = pred[lo[0]:lo[0] + shape[0], lo[1]:lo[1] + shape[1],
                    lo[2]:lo[2] + shape[2]]
        return pred, aff2

    def predict_file(self, path_in: str, path_out: str):
        from ..io.volume import load_volume, save_volume

        im, aff, _ = load_volume(path_in, im_only=False, dtype="float")
        pred, aff2 = self.predict_volume(im, aff)
        save_volume(pred, aff2, None, path_out)


def run_batch(predictor: Predictor, images, outs, prefetch: int = 2,
              verbose: bool = False):
    """Directory batch mode on the shared three-stage pipeline
    (cli/_pipeline.py — loader thread decoding ahead, writer thread
    compressing behind; reference loop predict_command_line.py:109-138 is
    fully serial).  Output files and values are identical to the serial
    loop."""
    from ..io.volume import load_volume
    from ._pipeline import run_pipelined

    def loads():
        for pin in images:
            yield load_volume(pin, im_only=False, dtype="float")

    run_pipelined(loads(), lambda item: predictor.predict_volume(item[0], item[1]),
                  outs, prefetch=prefetch, verbose=verbose,
                  describe=lambda idx: images[idx])


def main(argv=None):
    args = build_arg_parser().parse_args(argv)
    if args.cpu:
        print("using CPU backend")
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.environ.setdefault("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] += f" --xla_cpu_multi_thread_eigen={args.threads > 1}"

    from ..utils.misc import enable_persistent_compile_cache

    enable_persistent_compile_cache()
    images, outs = _prepare_paths(args.path_images, args.path_predictions)
    print(f"Found {len(images)} images")
    predictor = Predictor(model_path=args.model,
                          disable_flipping=args.disable_flipping, ct=args.ct,
                          fast_inference=args.fast_inference)
    run_batch(predictor, images, outs, verbose=True)
    print("\nAll done!\n")


if __name__ == "__main__":
    sys.exit(main())
