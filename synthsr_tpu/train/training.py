"""Supervised SR/synthesis training: on-device generation + U-Net + loss in
one jitted, data-parallel step.

Re-design of ``SynthSR/training.py:38-453``: same parameter surface and
semantics (channel validation :251-271, padding margin from loss_cropping
:282-285, generator with output_div_by_n=2**n_levels :288-318, U-Net grafted
on the generator :330-341, metrics in-graph :348-351, optional frozen-
segmenter Dice regularization :372-409, Adam(lr, decay), per-epoch
checkpoints with filename-encoded epoch and resume :415-453) — but instead of
a Keras graph fed by a python generator, the synthetic-pair generation runs
INSIDE the jitted train step on device, the batch is sharded over a
``jax.sharding`` data mesh, and checkpoints are orbax trees (plus a Keras
.h5 export per epoch for interchange).
"""

from __future__ import annotations

import json
import os
import re
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..io.labels import get_list_labels
from ..models.h5_import import export_keras_unet_weights, load_keras_unet_weights
from ..models.unet import UNet3D
from ..ops.losses import dice_loss
from ..parallel.mesh import (host_local_batch_to_global, make_data_mesh,
                             replicate, shard_batch)
from ..synth.brain_generator import BrainGenerator
from ..utils.finite_guard import FiniteGuard, guard_updates
from ..utils.misc import get_padding_margin, reformat_to_list
from .metrics import doubled_residual_indices, regression_loss


def keras_decay_schedule(lr: float, decay: float):
    """Keras legacy Adam decay: lr_t = lr / (1 + decay·iteration)."""
    if not decay:
        return lr

    def schedule(step):
        return lr / (1.0 + decay * step)

    return schedule


def make_optimizer(lr, lr_decay=0.0):
    return optax.adam(learning_rate=keras_decay_schedule(lr, lr_decay))


def vmap_examples(fn):
    """``jax.vmap`` over the leading example axis — except at batch 1, where
    the single example is traced directly and the leading axis re-added.
    Identical math and key stream (vmap at batch 1 applies ``fn`` to exactly
    ``args[i][0]``), but data-dependent ``lax.cond`` branches inside ``fn``
    survive as TRUE branches: vmap of a cond on a batched predicate lowers to
    run-both-and-select, which would erase the win of integrate_vec's
    runtime-bounded stencil dispatch.  The flagship batch-1 configs and every
    per-device shard of the DP-fast step (local batch 1) take the direct
    path."""
    vfn = jax.vmap(fn)

    def call(*args):
        if args[0].shape[0] == 1:
            out = fn(*(a[0] for a in args))
            return jax.tree.map(lambda x: x[None], out)
        return vfn(*args)

    return call


# ---------------------------------------------------------------------------
# segmentation regularizer (reference metrics_model.add_seg_loss_to_model:136-215)
# ---------------------------------------------------------------------------

def build_seg_loss_fn(seg_model, seg_variables, generation_labels,
                      segmentation_label_equivalency, loss_cropping,
                      m=None, M=None, fs_header=False):
    """Returns seg_dice(prediction, labels_target) using a FROZEN segmenter."""
    from .metrics import center_crop

    generation_labels = np.asarray(generation_labels)
    eq = np.asarray(segmentation_label_equivalency)
    pairs = []  # (generation index i, seg-output indices)
    for i in range(len(generation_labels)):
        idx = np.where(eq == generation_labels[i])[0]
        if len(idx) > 0:
            if len(idx) > 3:
                raise ValueError("merging more than 3 labels is not supported")
            pairs.append((i, idx))

    def seg_dice(prediction, segm_target):
        x = prediction
        if m is not None:
            x = (jnp.clip(x, m, M) - m) / (M - m)
        if fs_header:
            x = jnp.flip(jnp.swapaxes(x, 2, 3), axis=2)
        pred_seg = seg_model.apply(seg_variables, x)
        if fs_header:
            pred_seg = jnp.swapaxes(jnp.flip(pred_seg, axis=2), 2, 3)
        segm_target_c = center_crop(segm_target, loss_cropping)
        pred_seg = center_crop(pred_seg, loss_cropping)
        gts, preds = [], []
        for i, idx in pairs:
            # one-hot against the label VALUE (the reference compares against
            # the index i, metrics_model.py:196 — only correct when values
            # coincide with indices; documented fix)
            gts.append((segm_target_c[..., -1] == int(generation_labels[i]))
                       .astype(jnp.float32))
            preds.append(sum(pred_seg[..., j] for j in idx))
        gt = jnp.stack(gts, -1)
        pr = jnp.stack(preds, -1)
        return dice_loss(gt, pr, enable_checks=False)

    return seg_dice


# ---------------------------------------------------------------------------
# the train step factory
# ---------------------------------------------------------------------------

def make_train_step(model, generate_fn, optimizer, metrics="l1", loss_cropping=16,
                    residual_indices=None, use_real_image=False, seg_loss_fn=None,
                    seg_rel_weight=0.25, return_labels_to_loss=False,
                    remat=False, gmm_sampler=None, fast_forward="auto",
                    advance_key=False, data_mesh=None):
    """Build the jitted train step: (state, key, batch) -> (state, loss).

    state = (params, batch_stats, opt_state). batch = (labels, means, stds
    [, real]) with leading batch axis; generation runs inside the step.
    With ``gmm_sampler`` set (a per-sample ``key -> (means, stds)`` fn, see
    synth/sampling.draw_gmm_params), the batch carries only (labels[, real])
    and the GMM prior draws happen ON DEVICE inside the step — the host
    pipeline then only streams label maps (SURVEY.md §7).

    ``remat``: rematerialization of the U-Net in the backward pass.
    False = keep all activations; True = whole-net jax.checkpoint;
    "levels" = per-level checkpointing (save only the skip / decoder-level
    boundary tensors tagged in models/unet.py and recompute one level's
    convs at a time) — the mode that fits batch ≥ 2 at 128³ on a 16G chip.

    ``fast_forward``: "auto" | "on" | "off" | "interpret" — run the U-Net
    through the differentiable channels-first Pallas conv family
    (models/unet_cf_train.py: Pallas forward AND input-gradient convs,
    custom_vjp) wherever the model's options qualify.  "auto" enables it on
    TPU bf16 runs; "interpret" forces the kernels in interpret mode (CPU
    tests).  Falls back to ``model.apply`` whenever ``can_fast_train`` says
    the options are out of scope (dropout, residuals, dilation, ...).

    ``advance_key``: when True the per-step ``key, sub = jax.random.split``
    moves INSIDE the jitted step (identical key stream) and the step returns
    ``(params, batch_stats, opt_state, new_key, loss)`` — the production
    loop then never dispatches a separate split executable per step (a
    measurable per-step host round-trip on remote-tunneled devices).

    ``data_mesh``: the data-parallel mesh (axis name "data").  Without the
    fast path the step relies on jit auto-sharding (batch arrives sharded,
    XLA partitions and inserts the gradient psum).  WITH the fast path on a
    >1-device mesh, the whole step body runs under ``shard_map`` instead:
    each device executes the per-example Pallas kernels on its local batch
    shard, BatchNorm stats are pmean-ed inside the net (global batch stats),
    and gradients/loss are pmean-ed across "data" — same math as the
    auto-sharded step, same per-example key stream (keys are split for the
    GLOBAL batch and sliced by device index).
    """

    returns_labels = seg_loss_fn is not None
    has_dropout = getattr(model, "conv_dropout", 0.0) > 0

    from ..models.unet_cf_train import can_fast_train, make_fast_train_apply

    use_fast = fast_forward in ("on", "interpret") or (
        fast_forward == "auto" and jax.default_backend() == "tpu"
        and model.compute_dtype == jnp.bfloat16)
    use_fast = use_fast and can_fast_train(model)

    n_dp = 1
    if data_mesh is not None and "data" in data_mesh.axis_names:
        n_dp = int(data_mesh.shape["data"])
    use_dp_fast = use_fast and n_dp > 1

    if use_fast:
        fast_apply = make_fast_train_apply(
            model, interpret=fast_forward == "interpret",
            bn_axis="data" if use_dp_fast else None)

        def apply_net(p, bs_, image, drop_key):
            return fast_apply({"params": p, "batch_stats": bs_}, image)
    else:
        def apply_net(p, bs_, image, drop_key):
            rngs = {"dropout": drop_key} if has_dropout else None
            return model.apply({"params": p, "batch_stats": bs_}, image,
                               train=True, mutable=["batch_stats"], rngs=rngs)

    if remat == "levels":
        names = [f"unet_skip_{l}" for l in range(model.nb_levels)]
        names += [f"unet_dec_{l}" for l in range(model.nb_levels - 1)]
        apply_net = jax.checkpoint(
            apply_net, policy=jax.checkpoint_policies.save_only_these_names(*names))
    elif remat:
        apply_net = jax.checkpoint(apply_net)

    def batch_keys(key, n_local):
        """Per-example keys with the same stream as the single-jit step:
        split for the GLOBAL batch; under the shard_map fast path slice this
        device's contiguous shard (shard_batch lays global example
        d·n_local+j on device d)."""
        keys = jax.random.split(key, n_local * n_dp if use_dp_fast
                                else n_local)
        if use_dp_fast:
            idx = jax.lax.axis_index("data")
            keys = jax.lax.dynamic_slice_in_dim(keys, idx * n_local, n_local)
        return keys

    def step(params, batch_stats, opt_state, key, batch):
        bs = batch[0].shape[0]
        new_key = None
        if advance_key:
            new_key, key = jax.random.split(key)
        # split for dropout only when the net has it: the key stream (and so
        # every seeded run) is unchanged for the shipped dropout=0 configs
        drop_key = None
        if has_dropout:
            key, drop_key = jax.random.split(key)
        if gmm_sampler is not None:
            key, key_gmm = jax.random.split(key)
            means, stds = jax.vmap(gmm_sampler)(batch_keys(key_gmm, bs))
            batch = (batch[0], means, stds) + tuple(batch[1:])
        keys = batch_keys(key, bs)
        args = (keys,) + tuple(batch[:4 if use_real_image else 3])
        gen_out = vmap_examples(generate_fn)(*args)
        if returns_labels:
            image, target, seg_target = gen_out
        else:
            image, target = gen_out
            seg_target = None

        def loss_fn(p):
            out, updates = apply_net(p, batch_stats, image, drop_key)
            loss = regression_loss(out, image, target, metrics=metrics,
                                   loss_cropping=loss_cropping,
                                   work_with_residual_channel=residual_indices)
            if seg_loss_fn is not None:
                from .metrics import assemble_prediction

                pred, _ = assemble_prediction(out, image, metrics, residual_indices)
                loss = loss + seg_rel_weight * seg_loss_fn(pred, seg_target)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if use_dp_fast:
            # equal shards: pmean of per-shard means == global batch mean;
            # the new batch_stats are already replicated (BN stats pmean-ed
            # inside the net)
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
        upd, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, upd)
        # on-device non-finite write gate (reference check_numerics analogue,
        # metrics_model.py:228): a NaN/Inf loss never reaches the parameters,
        # so the host-side FiniteGuard abort always finds them salvageable
        finite = jnp.isfinite(loss)
        new_params = guard_updates(finite, new_params, params)
        new_bs = guard_updates(finite, updates["batch_stats"], batch_stats)
        new_opt_state = guard_updates(finite, new_opt_state, opt_state)
        if advance_key:
            return new_params, new_bs, new_opt_state, new_key, loss
        return new_params, new_bs, new_opt_state, loss

    if use_dp_fast:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        n_out = 5 if advance_key else 4
        step = shard_map(step, mesh=data_mesh,
                         in_specs=(P(), P(), P(), P(), P("data")),
                         out_specs=(P(),) * n_out, check_vma=False)
    return jax.jit(step, donate_argnums=(0, 1, 2, 3) if advance_key
                   else (0, 1, 2))


# ---------------------------------------------------------------------------
# checkpointing (orbax + Keras .h5 export)
# ---------------------------------------------------------------------------

def save_checkpoint(model_dir, epoch, params, batch_stats, opt_state, key):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(model_dir, f"{epoch:03d}"))
    ckpt = {"params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
            "opt_state": jax.device_get(opt_state),
            "key": jax.device_get(key),
            "epoch": epoch}
    with ocp.StandardCheckpointer() as saver:
        saver.save(path, ckpt, force=True)
    # Keras-interchange snapshot (reference saves full .h5 per epoch)
    export_keras_unet_weights(os.path.join(model_dir, f"{epoch:03d}.h5"),
                              {"params": jax.device_get(params),
                               "batch_stats": jax.device_get(batch_stats)})


def latest_checkpoint(model_dir):
    if not os.path.isdir(model_dir):
        return None
    epochs = [int(m.group(1)) for f in os.listdir(model_dir)
              if (m := re.fullmatch(r"(\d{3})", f))]
    return max(epochs) if epochs else None


def restore_checkpoint(model_dir, epoch, template):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(model_dir, f"{epoch:03d}"))
    with ocp.StandardCheckpointer() as saver:
        return saver.restore(path, template)


# ---------------------------------------------------------------------------
# the training orchestration (reference training():38-453 surface)
# ---------------------------------------------------------------------------

def training(labels_dir,
             model_dir,
             prior_means,
             prior_stds,
             path_generation_labels,
             segmentation_label_list=None,
             segmentation_label_equivalency=None,
             segmentation_model_file=None,
             fs_header_segnet=False,
             relative_weight_segmentation=0.25,
             prior_distributions="normal",
             images_dir=None,
             path_generation_classes=None,
             FS_sort=True,
             batchsize=1,
             input_channels=True,
             output_channel=0,
             target_res=None,
             output_shape=None,
             flipping=True,
             padding_margin=None,
             scaling_bounds=0.15,
             rotation_bounds=15,
             shearing_bounds=0.02,
             translation_bounds=5,
             nonlin_std=4.0,
             nonlin_shape_factor=0.03125,
             simulate_registration_error=True,
             data_res=None,
             thickness=None,
             randomise_res=None,
             downsample=True,
             blur_range=1.15,
             build_reliability_maps=True,
             bias_field_std=0.3,
             bias_shape_factor=0.03125,
             n_levels=5,
             nb_conv_per_level=2,
             conv_size=3,
             unet_feat_count=24,
             feat_multiplier=2,
             dropout=0,
             activation="elu",
             lr=1e-4,
             lr_decay=0,
             epochs=100,
             steps_per_epoch=1000,
             regression_metric="l1",
             work_with_residual_channel=None,
             loss_cropping=None,
             checkpoint=None,
             model_file_has_different_lhood_layer=False,
             n_devices=None,
             seed=None,
             compute_dtype="bfloat16",
             remat=None,
             fast_forward="auto",
             log_fn=print):
    """Train the SR/synthesis U-Net on on-device synthetic pairs."""

    # ----- channel validation (reference :245-271) -----
    input_channels_l = [bool(c) for c in reformat_to_list(input_channels)]
    n_channels = len(input_channels_l)
    if output_channel is not None:
        output_channel = list(reformat_to_list(output_channel))
        n_output_channels = len(output_channel)
    else:
        n_output_channels = 1
    if (images_dir is None) and (output_channel is None):
        raise ValueError("please provide a value for output_channel or images_dir")
    if (images_dir is not None) and (output_channel is not None):
        raise ValueError("provide either output_channel or images_dir, not both")
    if output_channel is not None and any(x >= n_channels for x in output_channel):
        raise ValueError("indices in output_channel exceed the number of channels")
    if work_with_residual_channel is not None:
        work_with_residual_channel = reformat_to_list(work_with_residual_channel)
        if output_channel is not None and \
                len(work_with_residual_channel) != len(output_channel):
            raise ValueError("number of residual and output channels must match")
        if any(x >= n_channels for x in work_with_residual_channel):
            raise ValueError("indices in work_with_residual_channel exceed channels")
    residual_indices = doubled_residual_indices(work_with_residual_channel,
                                                build_reliability_maps,
                                                input_channels=input_channels_l)

    # ----- labels + shapes (reference :273-285) -----
    generation_labels, n_neutral_labels = get_list_labels(
        label_list=path_generation_labels, labels_dir=labels_dir, FS_sort=FS_sort)
    os.makedirs(model_dir, exist_ok=True)
    if loss_cropping == 0:
        padding_margin = None
        loss_cropping = None
    elif padding_margin is None:
        padding_margin = get_padding_margin(output_shape, loss_cropping)

    # ----- generator (reference :288-318) -----
    brain_generator = BrainGenerator(
        labels_dir=labels_dir,
        images_dir=images_dir,
        generation_labels=generation_labels,
        n_neutral_labels=n_neutral_labels,
        padding_margin=padding_margin,
        batchsize=batchsize,
        input_channels=input_channels_l,
        output_channel=output_channel,
        target_res=target_res,
        output_shape=output_shape,
        output_div_by_n=2 ** n_levels,
        generation_classes=path_generation_classes,
        prior_means=prior_means,
        prior_stds=prior_stds,
        prior_distributions=prior_distributions,
        flipping=flipping,
        scaling_bounds=scaling_bounds,
        rotation_bounds=rotation_bounds,
        shearing_bounds=shearing_bounds,
        translation_bounds=translation_bounds,
        nonlin_std=nonlin_std,
        nonlin_shape_factor=nonlin_shape_factor,
        simulate_registration_error=simulate_registration_error,
        randomise_res=bool(randomise_res) if randomise_res is not None else False,
        data_res=data_res,
        thickness=thickness,
        downsample=downsample,
        blur_range=blur_range,
        build_reliability_maps=build_reliability_maps,
        bias_field_std=bias_field_std,
        bias_shape_factor=bias_shape_factor,
        seed=seed)

    from ..synth.labels_to_image import build_generator

    generate_fn = build_generator(brain_generator.cfg,
                                  return_labels=segmentation_model_file is not None)
    use_real = output_channel is None

    # ----- network (reference :321-345) -----
    nb_labels = 2 * n_output_channels if regression_metric == "laplace" \
        else n_output_channels
    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(compute_dtype)]
    model = UNet3D(nb_features=unet_feat_count, nb_levels=n_levels,
                   conv_size=conv_size, nb_labels=nb_labels,
                   feat_mult=feat_multiplier, nb_conv_per_level=nb_conv_per_level,
                   activation=activation, final_pred_activation="linear",
                   conv_dropout=float(dropout), compute_dtype=dt)
    n_in = sum(1 for c in input_channels_l if c) * (2 if build_reliability_maps else 1)
    example = jnp.zeros((1, *brain_generator.model_output_shape, n_in))
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0), example))
    params, batch_stats = variables["params"], variables["batch_stats"]

    # warm start (reference :353-369)
    if checkpoint is not None and checkpoint.endswith(".h5"):
        skip = ("likelihood",) if model_file_has_different_lhood_layer else ()
        loaded = load_keras_unet_weights(checkpoint,
                                         {"params": params, "batch_stats": batch_stats},
                                         skip_layers=skip)
        params, batch_stats = loaded["params"], loaded["batch_stats"]

    # frozen segmenter (reference :372-409)
    seg_loss_fn = None
    if segmentation_model_file is not None:
        seg_labels = np.asarray(reformat_to_list(segmentation_label_list,
                                                 load_as_numpy=True))
        seg_model = UNet3D(nb_features=unet_feat_count, nb_levels=n_levels,
                           conv_size=conv_size, nb_labels=len(seg_labels),
                           feat_mult=feat_multiplier,
                           nb_conv_per_level=nb_conv_per_level,
                           activation=activation, final_pred_activation="softmax",
                           compute_dtype=dt)
        seg_example = jnp.zeros((1, *brain_generator.model_output_shape, 1))
        seg_vars = dict(jax.jit(seg_model.init)(jax.random.PRNGKey(1), seg_example))
        seg_vars = load_keras_unet_weights(segmentation_model_file, seg_vars)
        # clip/normalization bounds for what the frozen segmenter sees: 2nd
        # and 98th percentiles of the FIRST real image (reference :393-399);
        # None (no normalization) when training is fully synthetic, as in the
        # reference's images_dir=None path
        seg_m = seg_M = None
        if images_dir is not None:
            from ..io.volume import load_volume
            from ..utils.misc import list_images_in_folder

            im0 = load_volume(list_images_in_folder(images_dir)[0]).flatten()
            seg_m = float(np.percentile(im0, 2))
            seg_M = float(np.percentile(im0, 98))
        seg_loss_fn = build_seg_loss_fn(seg_model, seg_vars, generation_labels,
                                        segmentation_label_equivalency,
                                        loss_cropping, m=seg_m, M=seg_M,
                                        fs_header=fs_header_segnet)

    # ----- optimizer, mesh, step (reference :415-453) -----
    optimizer = make_optimizer(lr, lr_decay)
    opt_state = optimizer.init(params)
    if n_devices is None:
        # never build a mesh wider than the batch (batch shards over 'data')
        n_devices = max(1, min(len(jax.devices()), batchsize))
    mesh = make_data_mesh(n_devices)
    params = replicate(mesh, params)
    batch_stats = replicate(mesh, batch_stats)
    opt_state = replicate(mesh, opt_state)

    if remat is None:
        # per-level remat is what lets batch ≥ 2 per chip fit at 128³ on 16G;
        # at batch 1 everything fits without recompute
        remat = "levels" if batchsize // n_devices >= 2 else False

    # GMM prior draws run ON DEVICE inside the step (SURVEY.md §7); the host
    # pipeline streams only label maps (+ real images)
    from ..synth.sampling import make_gmm_sampler

    gmm_sampler = make_gmm_sampler(
        n_labels=len(generation_labels),
        prior_means=brain_generator.prior_means,
        prior_stds=brain_generator.prior_stds,
        prior_distributions=prior_distributions,
        n_channels=brain_generator.n_channels,
        generation_classes=brain_generator.generation_classes)

    # the channels-first Pallas training forward runs per-example kernels;
    # on a >1-device mesh make_train_step runs the whole step under
    # shard_map (per-device kernels on the local batch shard, pmean-ed BN
    # stats/grads/loss) so the fast path survives data parallelism
    train_step = make_train_step(model, generate_fn, optimizer,
                                 metrics=regression_metric,
                                 loss_cropping=loss_cropping,
                                 residual_indices=residual_indices,
                                 use_real_image=use_real,
                                 seg_loss_fn=seg_loss_fn,
                                 seg_rel_weight=relative_weight_segmentation,
                                 remat=remat, gmm_sampler=gmm_sampler,
                                 fast_forward=fast_forward,
                                 advance_key=True, data_mesh=mesh)

    # resume (reference :434-439: epoch parsed from checkpoint filename)
    init_epoch = 0
    key = jax.random.PRNGKey(seed if seed is not None else 0)
    last = latest_checkpoint(model_dir)
    if checkpoint is not None and not checkpoint.endswith(".h5"):
        m = re.search(r"(\d{3})$", checkpoint.rstrip("/"))
        if m is None:
            raise ValueError(
                f"checkpoint '{checkpoint}' is neither a .h5 file nor an "
                "epoch-numbered orbax directory (expected a name ending in "
                "three digits, e.g. '<model_dir>/checkpoints/042')")
        template = {"params": jax.device_get(params),
                    "batch_stats": jax.device_get(batch_stats),
                    "opt_state": jax.device_get(opt_state),
                    "key": jax.device_get(key), "epoch": 0}
        ck = restore_checkpoint(os.path.dirname(checkpoint), int(m.group(1)), template)
        params = replicate(mesh, ck["params"])
        batch_stats = replicate(mesh, ck["batch_stats"])
        opt_state = replicate(mesh, ck["opt_state"])
        key, init_epoch = jnp.asarray(ck["key"]), int(ck["epoch"])
    elif last is not None:
        template = {"params": jax.device_get(params),
                    "batch_stats": jax.device_get(batch_stats),
                    "opt_state": jax.device_get(opt_state),
                    "key": jax.device_get(key), "epoch": 0}
        ck = restore_checkpoint(model_dir, last, template)
        params = replicate(mesh, ck["params"])
        batch_stats = replicate(mesh, ck["batch_stats"])
        opt_state = replicate(mesh, ck["opt_state"])
        key, init_epoch = jnp.asarray(ck["key"]), int(ck["epoch"])
        log_fn(f"resuming from epoch {init_epoch}")

    # ----- loop -----
    from ..synth.model_inputs import build_model_inputs
    from ..utils.prefetch import PrefetchIterator

    # labels-only host stream (GMM params are drawn on device); on a
    # multi-HOST mesh each process loads only its contiguous slice of the
    # global batch (SURVEY.md §5 per-host sharded input pipeline) and the
    # feed below assembles the global sharded array over ICI
    n_procs = jax.process_count()
    labels_only_gen = build_model_inputs(
        path_label_maps=brain_generator.labels_paths,
        n_labels=len(generation_labels),
        prior_means=brain_generator.prior_means,
        prior_stds=brain_generator.prior_stds,
        path_images=brain_generator.images_paths,
        batchsize=batchsize,
        rng=brain_generator._rng if seed is not None else None,
        include_gmm_params=False,
        local_slice=(jax.process_index(), n_procs) if n_procs > 1 else None)
    inputs_gen = PrefetchIterator(labels_only_gen, buffer_size=4)
    log_path = os.path.join(model_dir, "logs")
    os.makedirs(log_path, exist_ok=True)
    loss_curve = []
    # per-step non-finite abort, lagged 2 dispatches so the device pipeline
    # never stalls; the step itself gates its writes on isfinite(loss)
    guard = FiniteGuard(lag=2)
    for epoch in range(init_epoch, epochs):
        t0 = time.time()
        epoch_losses = []
        for step_i in range(steps_per_epoch):
            batch = [np.asarray(x) for x in next(inputs_gen)]
            batch = host_local_batch_to_global(mesh, tuple(batch))
            # the split runs inside the step (advance_key=True, identical
            # key stream to a host-side key, sub = jax.random.split(key))
            params, batch_stats, opt_state, key, loss = train_step(
                params, batch_stats, opt_state, key, batch)
            guard.push(f"epoch {epoch + 1} step {step_i + 1}", loss)
            epoch_losses.append(loss)
        guard.flush()
        mean_loss = float(np.mean([np.asarray(l) for l in epoch_losses]))
        loss_curve.append(mean_loss)
        dt_s = time.time() - t0
        log_fn(f"epoch {epoch + 1}/{epochs}  loss {mean_loss:.5f}  "
               f"({dt_s:.1f}s, {steps_per_epoch / dt_s:.2f} steps/s)")
        with open(os.path.join(log_path, "training_log.jsonl"), "a") as f:
            f.write(json.dumps({"epoch": epoch + 1, "loss": mean_loss,
                                "seconds": dt_s}) + "\n")
        np.save(os.path.join(log_path, "loss_curve.npy"), np.array(loss_curve))
        save_checkpoint(model_dir, epoch + 1, params, batch_stats, opt_state, key)

    return {"params": params, "batch_stats": batch_stats, "opt_state": opt_state,
            "model": model, "loss_curve": loss_curve}
