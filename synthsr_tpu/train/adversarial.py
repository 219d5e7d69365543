"""WGAN-GP adversarial fine-tuning of the SR generator.

Re-design of ``SynthSR/fine_tuning_with_adversary.py:37-479``: same parameter
surface and semantics — generator = U-Net on the synthetic graph (optionally
warm-started), critic per models/discriminator.py, generator loss
(1-wD[-wDice])·L1 + wD·(-D(fake)) [+ wDice·Dice via a frozen segmenter]
(:539-576), critic loss -D(real)+D(fake)+λ·(‖∇D(x̂)‖-1)² on random-weighted
interpolates (:579-595,604-625), alternating loop with 100 critic iterations
on the very first step then ``training_ratio``:1 (:444-466), per-epoch saves
+ loss curves as .npy (:469-479).

TPU-native differences: the two updates are separate jitted steps (explicit
parameter partitioning replaces Keras trainable-flag flips); the gradient
penalty uses jax.grad through the critic w.r.t. the interpolated inputs;
generation runs on device inside both steps.

Deviation (documented): ``work_with_residual_channel`` is validated but never
applied in the reference (:256-261, unused afterwards); here it is applied to
the generator output like in supervised training.

Performance record (round 5, BASELINE config #5, 128³ bf16 batch 1 on one
v5e chip; every number from tools/profile_adv.py / tools/probe_disc_fast.py
with true value-readback syncs, end-to-end from bench_adversarial.py):

  bench: 0.438 (r4) → 0.497 G-updates/s via (a) pallas_levels=0.5 critic
  (WGAN d/dp 60.7 → 51.1 ms), (b) the K=10 scanned critic inner loop + the
  fused cycle_step (per-dispatch overhead 11 launches → 1).
  disc_step 162.6 ms = generation 47.6 + fast G fake fwd 27 + critic ~88;
  gen_step 151.2; scan K=10 = 1640.8 (1.6 ms/iter scan overhead).

Why the remaining gap to a 10× vs-baseline (0.68 = 1471 ms/cycle) is
structural, each alternative bounded by a recorded probe:

1. Per-cycle MANDATORY work at measured floors: 10·(generation 47.6 +
   G fake forward 27) + gen_step 151 ≈ 897 ms with a ZERO-cost critic —
   the 10:1 ratio times the synthesis pipeline is 61% of the budget.  The
   generation block carries two rounds of dedicated optimization
   (interpn_packed, runtime-bounded stencil dispatch, r4); the G forward
   runs the Pallas family at its measured rate (the 11.8× predict path).
2. The critic budget left at 10× is (1471-897)/10 ≈ 57 ms for THREE
   critic applications + the GP input gradient + the full parameter
   backward.  The best measured WGAN d/dp is 51.1 ms (pallas_levels=0.5)
   and the best GP d/dp 41.9 ms (unrolled CF program) — each the winner
   of an A/B family: WGAN 51.1 (pl=0.5) / 60.3 (all-XLA-CL) / 66.1
   (pl=1.5) / 67.3 (full-CF Pallas trunk) / 80.2 (pl=1); GP 41.9 (CF
   unrolled) / 52.7 (CL-interior unrolled) / 57.9 (XLA s2d double
   autodiff).  Every formulation sits at ~10 TF/s — the bound is XLA's
   3-D conv-gradient lowering at the critic's 32-256ch interior shapes,
   which none of the kernel-family layouts cover (their win is the
   large-spatial/small-channel regime).
3. Hoisting the 10 generations into one vmapped phase-A program (the
   generator is frozen during critic iterations, the key chain is
   precomputable) is refuted twice (profile_adv.py probes): K=10 OOMs
   (15.78 of 15.75 G HBM), and K=5 measures 486 ms vs 5·47.6 = 238 ms
   sequential — 2× SLOWER batched (the runtime-bounded SVF dispatch
   reverts to the static policy under vmap and the batched gathers
   don't amortize).
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..io.labels import get_list_labels
from ..models.discriminator import Discriminator3D
from ..models.h5_import import export_keras_unet_weights, load_keras_unet_weights
from ..models.unet import UNet3D
from ..ops.losses import dice_loss, l1_loss
from ..synth.brain_generator import BrainGenerator
from ..utils.finite_guard import FiniteGuard, guard_updates
from ..utils.misc import get_mapping_lut, load_array_if_path, reformat_to_list
from .metrics import assemble_prediction, center_crop, doubled_residual_indices
from .training import keras_decay_schedule, vmap_examples


def random_weighted_average(key, real, fake, n_dp=1, axis_name=None):
    """x̂ = w·real + (1-w)·fake with one uniform weight per batch element
    (reference RandomWeightedAverage:604-625).

    Under a ``shard_map``-ed data-parallel step (``n_dp`` devices on mesh
    axis ``axis_name``) the weights are drawn for the GLOBAL batch and this
    device's contiguous shard is sliced out — the same weight stream as the
    single-jit step."""
    n_local = real.shape[0]
    w = jax.random.uniform(key, (n_local * n_dp,) + (1,) * (real.ndim - 1))
    if axis_name is not None and n_dp > 1:
        idx = jax.lax.axis_index(axis_name)
        w = jax.lax.dynamic_slice_in_dim(w, idx * n_local, n_local)
    return w * real + (1.0 - w) * fake


def gradient_penalty_from_grads(grads, weight=10.0):
    """λ·mean((‖g‖₂ - 1)²) over precomputed input gradients g = ∇_x̂ D(x̂),
    norm over spatial axes (reference :585-595)."""
    sq = jnp.sum(jnp.square(grads), axis=tuple(range(1, 4)))  # spatial axes only
    norm = jnp.sqrt(jnp.maximum(sq, 1e-12))
    return weight * jnp.mean(jnp.square(1.0 - norm))


def gradient_penalty(disc_apply, disc_params, x_hat, mask=None, weight=10.0):
    """λ·mean((‖∇_x̂ D(x̂)‖₂ - 1)²), norm over spatial axes (reference :585-595)."""

    def d_sum(xh):
        return jnp.sum(disc_apply(disc_params, xh, mask))

    return gradient_penalty_from_grads(jax.grad(d_sum)(x_hat), weight)


def make_adversarial_steps(gen_model, disc_model, generate_fn, gen_opt,
                           disc_opt, *, gmm_sampler, residual_indices=None,
                           loss_cropping=None,
                           relative_weight_discriminator=0.01,
                           relative_weight_segmentation=0.25,
                           gradient_penalty_weight=10.0,
                           mask_lut=None, need_labels=False,
                           seg_apply=None, seg_vars=None, seg_eq=None,
                           generation_labels=None, norm_m=None, norm_M=None,
                           fast_forward="auto", compute_dtype=jnp.float32,
                           data_mesh=None, with_scan=False):
    """Build the two jitted WGAN-GP updates (reference
    fine_tuning_with_adversary.py:365-436):

      disc_step(gen_params, gen_bs, disc_params, disc_opt_state, key, batch)
          -> (disc_params, disc_opt_state, d_loss)
      gen_step(gen_params, gen_bs, disc_params, gen_opt_state, key, batch)
          -> (gen_params, gen_bs, gen_opt_state, g_loss)

    ``with_scan=True`` additionally returns a third and fourth jitted
    update: the whole 10:1 critic inner loop as ONE executable (lax.scan
    over a stacked batch axis K), eliminating the per-dispatch tunnel/host
    overhead of K separate disc_step launches (~20 ms each measured), and
    the full cycle (scan + generator update) as one executable:

      disc_steps(gen_params, gen_bs, disc_params, disc_opt_state, key,
                 batches)  # leaves stacked (K, B, ...)
          -> (disc_params, disc_opt_state, key, d_losses[K])
      cycle_step(gen_params, gen_bs, disc_params, gen_opt_state,
                 disc_opt_state, key, batches, gen_batch)
          -> (gen_params, gen_bs, disc_params, gen_opt_state,
              disc_opt_state, key, d_losses[K], g_loss)

    Key-stream parity with the host loop is exact: the scan body performs
    the same ``key, sub = jax.random.split(key)`` per iteration and returns
    the advanced key, so K scanned iterations produce bit-identical params
    to K sequential disc_step calls fed the same per-iteration batches.

    ``batch`` = (labels[, real]) with a leading batch axis; generation and
    the GMM prior draws run on device inside both steps.

    ``fast_forward``: same gating as the supervised make_train_step — the
    generator runs the channels-first Pallas conv family wherever shapes
    qualify (the differentiable train apply in gen_step, the inference
    forward for the fake volumes in each discriminator iteration).

    ``data_mesh``: the data-parallel mesh (axis "data").  Without the fast
    path the steps rely on jit auto-sharding; WITH the fast path on a
    >1-device mesh both step bodies run under ``shard_map`` — per-device
    Pallas kernels on the local batch shard, BatchNorm stats pmean-ed inside
    the net, grads/losses pmean-ed over "data", keys and interpolation
    weights split for the GLOBAL batch and sliced per device (exact
    single-jit stream parity, like the supervised DP-fast step)."""
    from ..models.unet_cf import fast_unet_forward
    from ..models.unet_cf_train import can_fast_train, make_fast_train_apply

    dt = compute_dtype
    has_dropout = getattr(gen_model, "conv_dropout", 0.0) > 0
    mask_input = mask_lut is not None

    use_fast = fast_forward in ("on", "interpret") or (
        fast_forward == "auto" and jax.default_backend() == "tpu"
        and dt == jnp.bfloat16)
    use_fast = use_fast and can_fast_train(gen_model)

    n_dp = 1
    if data_mesh is not None and "data" in data_mesh.axis_names:
        n_dp = int(data_mesh.shape["data"])
    use_dp_fast = use_fast and n_dp > 1
    if not use_dp_fast:
        # no shard_map: the step sees the full global batch (jit
        # auto-sharding), so keys/weights split for exactly that batch
        n_dp = 1

    fast_train_apply = None
    if use_fast:
        fast_train_apply = make_fast_train_apply(
            gen_model, interpret=fast_forward == "interpret",
            bn_axis="data" if use_dp_fast else None)

    def batch_keys(key, n_local):
        """Per-example keys with the single-jit stream: split for the GLOBAL
        batch; under the shard_map fast path slice this device's contiguous
        shard (shard_batch lays global example d·n_local+j on device d)."""
        keys = jax.random.split(key, n_local * n_dp if use_dp_fast
                                else n_local)
        if use_dp_fast:
            idx = jax.lax.axis_index("data")
            keys = jax.lax.dynamic_slice_in_dim(keys, idx * n_local, n_local)
        return keys

    # Fast critic (models/discriminator_cf.py): stride-1 3³ convs on the
    # Pallas channels-first family — a first-order apply for the WGAN terms
    # and the unrolled input-gradient program for the gradient penalty
    # (whose d/dp is a second derivative, unreachable through the Pallas
    # custom_vjp by autodiff).  Same gating as the generator's fast path;
    # per-shape qualification (even dims through every level) is checked at
    # trace time since shapes are static under jit.
    from ..models.discriminator_cf import (can_fast_disc, make_fast_disc_apply,
                                           make_fast_disc_input_grad)

    fast_disc_d = fast_disc_g = fast_disc_ig = None
    if use_fast and isinstance(disc_model, Discriminator3D):
        # pallas_levels=0.5: ONLY the cin=1 first conv runs the Pallas CF
        # kernel (XLA's weakest conv shape, the kernel family's best); the
        # rest runs batched channels-LAST XLA.  Measured A/B on the WGAN
        # d/dp at 128³ bf16 (tools/probe_disc_fast.py): 51.1 ms (pl=0.5)
        # vs 60.3 (all-XLA-CL) vs 67.3 (full-CF trunk — the flat Pallas
        # stride-1 kernels + per-example loop + CF-XLA stride-2 convs net
        # SLOWER than batched CL XLA: recorded negative) vs 80.2 (pl=1).
        # Two builds of the same forward: the critic UPDATE differentiates
        # w.r.t. params only (its input is the generated constant), so its
        # first conv skips the dead input-gradient conv; the generator
        # update needs d(D(fake))/d(fake) and keeps it.
        fast_disc_d = make_fast_disc_apply(
            disc_model, interpret=fast_forward == "interpret",
            input_grad_needed=False, pallas_levels=0.5)
        fast_disc_g = make_fast_disc_apply(
            disc_model, interpret=fast_forward == "interpret",
            pallas_levels=0.5)
        fast_disc_ig = make_fast_disc_input_grad(
            disc_model, interpret=fast_forward == "interpret")

    def disc_apply(p, x, mask=None, *, input_grad_needed=True):
        fast = fast_disc_d if not input_grad_needed else fast_disc_g
        if fast is not None and can_fast_disc(disc_model, x.shape[1:4]):
            return fast(p, x, mask)
        return disc_model.apply({"params": p}, x, mask)

    # Fallback GP path (fast critic unavailable): same params, s2d stride-2
    # decomposition — measurably faster on the second-order gradient-penalty
    # path only (57.9 vs 69.6 ms at 128³ bf16; the strided impl stays
    # fastest for forward/first-order — see models/discriminator.py
    # docstring for the full A/B table).  Custom critic modules without a
    # ``stride2_impl`` field just reuse their own apply.
    if hasattr(disc_model, "stride2_impl"):
        disc_gp_model = disc_model.clone(stride2_impl="s2d")
    else:
        disc_gp_model = disc_model

    def disc_apply_gp(p, x, mask=None):
        return disc_gp_model.apply({"params": p}, x, mask)

    def gp_term(dp, x_hat, mask):
        if fast_disc_ig is not None and \
                can_fast_disc(disc_model, x_hat.shape[1:4]):
            grads = fast_disc_ig(dp, x_hat, mask)
            return gradient_penalty_from_grads(grads, gradient_penalty_weight)
        return gradient_penalty(disc_apply_gp, dp, x_hat, mask,
                                gradient_penalty_weight)

    def _generate(key, batch):
        bs = batch[0].shape[0]
        key, k_gmm = jax.random.split(key)
        means, stds = jax.vmap(gmm_sampler)(batch_keys(k_gmm, bs))
        batch = (batch[0], means, stds) + tuple(batch[1:])
        keys = batch_keys(key, bs)
        out = vmap_examples(generate_fn)(keys, *batch)
        if need_labels:
            image, target, seg_t = out
        else:
            (image, target), seg_t = out, None
        mask = None
        if mask_input:
            mask = mask_lut[seg_t[..., 0].astype(jnp.int32)][..., None] \
                .astype(jnp.float32)
        return image, target, seg_t, mask

    def _fake(p, bs, image, train, drop_key=None):
        v = {"params": p, "batch_stats": bs}
        if train:
            if use_fast:
                out, updates = fast_train_apply(v, image)
            else:
                rngs = {"dropout": drop_key} if has_dropout else None
                out, updates = gen_model.apply(v, image, train=True,
                                               mutable=["batch_stats"],
                                               rngs=rngs)
        elif use_fast:
            # eval mode: batch-1 inference kernels per example
            out = jnp.concatenate([
                fast_unet_forward(gen_model, v, image[i:i + 1],
                                  interpret=fast_forward == "interpret",
                                  dtype=dt)
                for i in range(image.shape[0])])
            updates = None
        else:
            out, updates = gen_model.apply(v, image), None
        pred, _ = assemble_prediction(out, image,
                                      work_with_residual_channel=residual_indices)
        return pred, updates

    def disc_step(gen_params, gen_bs, disc_params, disc_opt_state, key, batch):
        k_gen, k_avg = jax.random.split(key)
        image, target, _, mask = _generate(k_gen, batch)
        fake, _ = _fake(gen_params, gen_bs, image, train=False)

        def loss_fn(dp):
            x_hat = random_weighted_average(
                k_avg, target, fake, n_dp=n_dp,
                axis_name="data" if use_dp_fast else None)
            # d_real and d_fake as ONE batch-2B critic application (no
            # cross-batch ops in the critic, so bit-identical per example;
            # measured 73.7 -> 60.7 ms on the WGAN d/dp at 128³ bf16)
            b = target.shape[0]
            d = disc_apply(dp, jnp.concatenate([target, fake]),
                           None if mask is None
                           else jnp.concatenate([mask, mask]),
                           input_grad_needed=False)
            gp = gp_term(dp, x_hat, mask)
            return jnp.mean(-d[:b]) + jnp.mean(d[b:]) + gp

        loss, grads = jax.value_and_grad(loss_fn)(disc_params)
        if use_dp_fast:
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
        upd, new_state = disc_opt.update(grads, disc_opt_state, disc_params)
        finite = jnp.isfinite(loss)
        return (guard_updates(finite, optax.apply_updates(disc_params, upd),
                              disc_params),
                guard_updates(finite, new_state, disc_opt_state), loss)

    _disc_body = disc_step  # pre-shard_map body; disc_step is rebound below

    def disc_steps(gen_params, gen_bs, disc_params, disc_opt_state, key,
                   batches):
        """K critic iterations in one executable (see factory docstring)."""

        def body(carry, batch):
            dp, dos, key = carry
            key, sub = jax.random.split(key)
            dp, dos, loss = _disc_body(gen_params, gen_bs, dp, dos, sub,
                                       batch)
            return (dp, dos, key), loss

        (dp, dos, key), losses = jax.lax.scan(
            body, (disc_params, disc_opt_state, key), batches)
        return dp, dos, key, losses

    def gen_step(gen_params, gen_bs, disc_params, gen_opt_state, key, batch):
        # extra split only when the net has dropout: the key stream (and so
        # every seeded run) is unchanged for the shipped dropout=0 configs
        drop_key = None
        if has_dropout:
            key, drop_key = jax.random.split(key)
        image, target, seg_t, mask = _generate(key, batch)

        def loss_fn(p):
            fake, updates = _fake(p, gen_bs, image, train=True,
                                  drop_key=drop_key)
            t_c = center_crop(target, loss_cropping)
            f_c = center_crop(fake, loss_cropping)
            l1 = l1_loss(f_c, t_c)
            w = jnp.mean(-disc_apply(disc_params, fake, mask))
            l1_weight = 1.0 - relative_weight_discriminator
            loss = relative_weight_discriminator * w
            if seg_apply is not None:
                l1_weight -= relative_weight_segmentation
                x = (jnp.clip(fake, norm_m, norm_M) - norm_m) / (norm_M - norm_m)
                pred_seg = seg_apply(seg_vars, x)
                seg_c = center_crop(seg_t, loss_cropping)
                ps_c = center_crop(pred_seg, loss_cropping)
                gts, preds = [], []
                for li, lv in enumerate(np.asarray(generation_labels)):
                    idx = np.where(seg_eq == lv)[0]
                    if len(idx) > 0:
                        gts.append((seg_c[..., -1] == int(lv)).astype(jnp.float32))
                        preds.append(sum(ps_c[..., j] for j in idx))
                dice = dice_loss(jnp.stack(gts, -1), jnp.stack(preds, -1),
                                 enable_checks=False)
                loss = loss + relative_weight_segmentation * dice
            loss = loss + l1_weight * l1
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(gen_params)
        if use_dp_fast:
            # BN stats in `updates` are already pmean-ed inside the net
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
        upd, new_state = gen_opt.update(grads, gen_opt_state, gen_params)
        # on-device non-finite write gate (see utils/finite_guard.py)
        finite = jnp.isfinite(loss)
        return (guard_updates(finite, optax.apply_updates(gen_params, upd),
                              gen_params),
                guard_updates(finite, updates["batch_stats"], gen_bs),
                guard_updates(finite, new_state, gen_opt_state), loss)

    _gen_body = gen_step  # pre-shard_map body (like _disc_body)
    _disc_scan = disc_steps

    def cycle_step(gen_params, gen_bs, disc_params, gen_opt_state,
                   disc_opt_state, key, stacked, gen_batch):
        """One full training-ratio cycle as ONE executable: the scanned K
        critic updates then the generator update — host-loop key-stream
        parity (per-iteration splits inside the scan, then one split for
        the generator update).  One dispatch + one readback per cycle
        instead of two of each (the tunneled dispatch/readback latency is
        the residual between the summed step times and the end-to-end
        cycle)."""
        dp, dos, key, d_losses = _disc_scan(
            gen_params, gen_bs, disc_params, disc_opt_state, key, stacked)
        key, sub = jax.random.split(key)
        gp2, gb2, gos, g_loss = _gen_body(gen_params, gen_bs, dp,
                                          gen_opt_state, sub, gen_batch)
        return gp2, gb2, dp, gos, dos, key, d_losses, g_loss

    if use_dp_fast:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        disc_step = shard_map(
            disc_step, mesh=data_mesh,
            in_specs=(P(), P(), P(), P(), P(), P("data")),
            out_specs=(P(), P(), P()), check_vma=False)
        gen_step = shard_map(
            gen_step, mesh=data_mesh,
            in_specs=(P(), P(), P(), P(), P(), P("data")),
            out_specs=(P(), P(), P(), P()), check_vma=False)
        # the scan wraps the per-device body: batches keep the stacked K
        # axis unsharded, the batch axis (axis 1) sharded over "data"
        disc_steps = shard_map(
            disc_steps, mesh=data_mesh,
            in_specs=(P(), P(), P(), P(), P(), P(None, "data")),
            out_specs=(P(), P(), P(), P()), check_vma=False)
        cycle_step = shard_map(
            cycle_step, mesh=data_mesh,
            in_specs=(P(), P(), P(), P(), P(), P(), P(None, "data"),
                      P("data")),
            out_specs=(P(), P(), P(), P(), P(), P(), P(), P()),
            check_vma=False)
    if with_scan:
        return (jax.jit(disc_step), jax.jit(gen_step), jax.jit(disc_steps),
                jax.jit(cycle_step))
    return jax.jit(disc_step), jax.jit(gen_step)


def training(labels_dir,
             images_dir,
             model_dir,
             prior_means,
             prior_stds,
             path_generation_labels,
             path_segmentation_equivalency=None,
             segmentation_model_file=None,
             prior_distributions="normal",
             path_generation_classes=None,
             FS_sort=True,
             batchsize=1,
             input_channels=True,
             output_channel=None,
             target_res=None,
             output_shape=None,
             flipping=True,
             padding_margin=None,
             scaling_bounds=0.2,
             rotation_bounds=20,
             shearing_bounds=0.03,
             translation_bounds=5,
             nonlin_std=5.0,
             nonlin_shape_factor=0.04,
             simulate_registration_error=False,
             data_res=None,
             thickness=None,
             randomise_res=True,
             downsample=True,
             blur_range=1.03,
             build_reliability_maps=False,
             bias_field_std=0.4,
             bias_shape_factor=0.04,
             n_levels=5,
             nb_conv_per_level=2,
             conv_size=3,
             unet_feat_count=24,
             feat_multiplier=2,
             dropout=0,
             activation="elu",
             lr_decay=0,
             epochs=100,
             steps_per_epoch=1000,
             work_with_residual_channel=None,
             loss_cropping=None,
             lr_generator=1e-4,
             lr_discriminator=1e-4,
             relative_weight_segmentation=0.25,
             relative_weight_discriminator=0.01,
             checkpoint_generator=None,
             gradient_penalty_weight=10,
             first_training_ratio=100,
             training_ratio=10,
             labels_to_mask=None,
             seed=None,
             compute_dtype="bfloat16",
             n_devices=None,
             fast_forward="auto",
             scan_inner="auto",
             log_fn=print):

    # ----- channel plumbing (reference :240-261) -----
    input_channels_l = [bool(c) for c in reformat_to_list(input_channels)]
    if output_channel is not None:
        output_channel = list(reformat_to_list(output_channel))
        n_output_channels = len(output_channel)
    else:
        n_output_channels = 1
    if work_with_residual_channel is not None:
        work_with_residual_channel = reformat_to_list(work_with_residual_channel)
        if output_channel is not None and \
                len(work_with_residual_channel) != len(output_channel):
            raise ValueError("number of residual and output channels must match")
    residual_indices = doubled_residual_indices(work_with_residual_channel,
                                                build_reliability_maps,
                                                input_channels=input_channels_l)

    generation_labels, n_neutral_labels = get_list_labels(
        label_list=path_generation_labels, labels_dir=labels_dir, FS_sort=FS_sort)
    os.makedirs(model_dir, exist_ok=True)

    brain_generator = BrainGenerator(
        labels_dir=labels_dir, images_dir=images_dir,
        generation_labels=generation_labels, n_neutral_labels=n_neutral_labels,
        padding_margin=padding_margin, batchsize=batchsize,
        input_channels=input_channels_l, output_channel=output_channel,
        target_res=target_res, output_shape=output_shape,
        output_div_by_n=2 ** n_levels, generation_classes=path_generation_classes,
        prior_means=prior_means, prior_stds=prior_stds,
        prior_distributions=prior_distributions, flipping=flipping,
        scaling_bounds=scaling_bounds, rotation_bounds=rotation_bounds,
        shearing_bounds=shearing_bounds, translation_bounds=translation_bounds,
        nonlin_std=nonlin_std, nonlin_shape_factor=nonlin_shape_factor,
        simulate_registration_error=simulate_registration_error,
        randomise_res=randomise_res, data_res=data_res, thickness=thickness,
        downsample=downsample, blur_range=blur_range,
        build_reliability_maps=build_reliability_maps,
        bias_field_std=bias_field_std, bias_shape_factor=bias_shape_factor,
        seed=seed)

    from ..synth.labels_to_image import build_generator

    mask_input = labels_to_mask is not None
    need_labels = mask_input or (segmentation_model_file is not None)
    generate_fn = build_generator(brain_generator.cfg, return_labels=need_labels)
    use_real = output_channel is None

    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[str(compute_dtype)]
    gen_model = UNet3D(nb_features=unet_feat_count, nb_levels=n_levels,
                       conv_size=conv_size, nb_labels=n_output_channels,
                       feat_mult=feat_multiplier,
                       nb_conv_per_level=nb_conv_per_level, activation=activation,
                       final_pred_activation="linear",
                       conv_dropout=float(dropout), compute_dtype=dt)
    has_dropout = float(dropout) > 0
    n_in = sum(1 for c in input_channels_l if c) * (2 if build_reliability_maps else 1)
    out_shape = brain_generator.model_output_shape
    gen_vars = dict(jax.jit(gen_model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, *out_shape, n_in))))
    if checkpoint_generator is not None:
        log_fn(f"loading {checkpoint_generator}")
        gen_vars = load_keras_unet_weights(checkpoint_generator, gen_vars)
    gen_params, gen_bs = gen_vars["params"], gen_vars["batch_stats"]

    disc_model = Discriminator3D(compute_dtype=dt)
    disc_params = dict(jax.jit(disc_model.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, *out_shape, n_output_channels))))["params"]

    # frozen segmenter
    seg_apply = seg_eq = seg_vars = None
    norm_m = norm_M = None
    if segmentation_model_file is not None:
        seg_eq = np.load(path_segmentation_equivalency)
        seg_model = UNet3D(nb_features=unet_feat_count, nb_levels=n_levels,
                           conv_size=conv_size, nb_labels=len(seg_eq),
                           feat_mult=feat_multiplier,
                           nb_conv_per_level=nb_conv_per_level,
                           activation=activation, final_pred_activation="softmax",
                           compute_dtype=dt)
        seg_vars = dict(jax.jit(seg_model.init)(
            jax.random.PRNGKey(2), jnp.zeros((1, *out_shape, 1))))
        seg_vars = load_keras_unet_weights(segmentation_model_file, seg_vars)
        seg_apply = seg_model.apply
        # normalization percentiles from the first real image (reference :381-384)
        from ..io.volume import load_volume
        from ..utils.misc import list_images_in_folder

        im0 = load_volume(list_images_in_folder(images_dir)[0])
        norm_m, norm_M = float(np.percentile(im0, 2)), float(np.percentile(im0, 98))

    mask_lut = None
    if mask_input:
        labels_to_mask_arr = load_array_if_path(labels_to_mask)
        mask_lut = jnp.asarray(get_mapping_lut(generation_labels, labels_to_mask_arr))

    gen_opt = optax.adam(keras_decay_schedule(lr_generator, lr_decay))
    disc_opt = optax.adam(keras_decay_schedule(lr_discriminator, lr_decay))
    gen_opt_state = gen_opt.init(gen_params)
    disc_opt_state = disc_opt.init(disc_params)

    # data-parallel mesh: batches shard over 'data', parameters replicate
    # (gradient psums ride ICI, reference has no distributed analogue)
    from ..parallel.mesh import (host_local_batch_to_global,
                                 host_local_stacked_to_global, make_data_mesh,
                                 replicate)

    if n_devices is None:
        # never build a mesh wider than the batch (batch shards over 'data')
        n_devices = max(1, min(len(jax.devices()), batchsize))
    mesh = make_data_mesh(n_devices)
    gen_params = replicate(mesh, gen_params)
    gen_bs = replicate(mesh, gen_bs)
    disc_params = replicate(mesh, disc_params)
    gen_opt_state = replicate(mesh, gen_opt_state)
    disc_opt_state = replicate(mesh, disc_opt_state)

    # GMM prior draws run on device inside both steps (as in supervised
    # training); the host pipeline streams only label maps + real images
    from ..synth.sampling import make_gmm_sampler

    gmm_sampler = make_gmm_sampler(
        n_labels=len(generation_labels),
        prior_means=brain_generator.prior_means,
        prior_stds=brain_generator.prior_stds,
        prior_distributions=prior_distributions,
        n_channels=brain_generator.n_channels,
        generation_classes=brain_generator.generation_classes)

    # the two jitted WGAN-GP updates; the generator runs the fast
    # channels-first Pallas conv family where shapes qualify (the
    # differentiable train apply in gen_step, the inference forward for the
    # fake volumes inside each of the 10-per-G discriminator iterations —
    # the largest single compute in a D iteration), incl. under data
    # parallelism (shard_map, same wiring as the supervised DP-fast step)
    disc_step, gen_step, disc_steps, cycle_step = make_adversarial_steps(
        gen_model, disc_model, generate_fn, gen_opt, disc_opt,
        gmm_sampler=gmm_sampler, residual_indices=residual_indices,
        loss_cropping=loss_cropping,
        relative_weight_discriminator=relative_weight_discriminator,
        relative_weight_segmentation=relative_weight_segmentation,
        gradient_penalty_weight=gradient_penalty_weight,
        mask_lut=mask_lut, need_labels=need_labels,
        seg_apply=seg_apply, seg_vars=seg_vars, seg_eq=seg_eq,
        generation_labels=generation_labels, norm_m=norm_m, norm_M=norm_M,
        fast_forward=fast_forward, compute_dtype=dt, data_mesh=mesh,
        with_scan=True)

    # scanned critic inner loop: chunks of ``training_ratio`` iterations run
    # as ONE executable (kills the ~20 ms per-dispatch tunnel/host overhead
    # of the 10 separate disc_step launches per cycle); bit-identical
    # key-stream/params to the sequential path (tested).  "auto": on for
    # the TPU backend, off on CPU where the extra executable's compile time
    # dominates any dispatch saving.
    scan_k = None
    if scan_inner is True or (scan_inner == "auto"
                              and jax.default_backend() == "tpu"):
        scan_k = max(int(training_ratio), 1)

    # ----- training loop (reference :444-479) -----
    from ..synth.model_inputs import build_model_inputs
    from ..utils.prefetch import PrefetchIterator

    # per-host sharded feed on multi-HOST meshes (SURVEY.md §5): each
    # process loads only its contiguous slice of the global batch
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
    log_dir = os.path.join(model_dir, "logs")
    os.makedirs(log_dir, exist_ok=True)
    key = jax.random.PRNGKey(seed if seed is not None else 0)
    d_curve, g_curve = [], []
    le = len(str(epochs))

    # resume: a killed fine-tune restarts at its epoch with optimizer state
    # (the reference restarts only from per-epoch .h5 weight saves, :471-479)
    init_epoch = 0
    last = latest_adv_checkpoint(model_dir)
    if last is not None:
        template = {
            "gen_params": jax.device_get(gen_params),
            "gen_batch_stats": jax.device_get(gen_bs),
            "gen_opt_state": jax.device_get(gen_opt_state),
            "disc_params": jax.device_get(disc_params),
            "disc_opt_state": jax.device_get(disc_opt_state),
            "key": jax.device_get(key), "epoch": 0}
        ck = restore_adv_checkpoint(model_dir, last, template)
        gen_params = replicate(mesh, ck["gen_params"])
        gen_bs = replicate(mesh, ck["gen_batch_stats"])
        gen_opt_state = replicate(mesh, ck["gen_opt_state"])
        disc_params = replicate(mesh, ck["disc_params"])
        disc_opt_state = replicate(mesh, ck["disc_opt_state"])
        key, init_epoch = jnp.asarray(ck["key"]), int(ck["epoch"])
        for name, curve in (("discriminator_loss.npy", d_curve),
                            ("generator_loss.npy", g_curve)):
            path = os.path.join(log_dir, name)
            if os.path.isfile(path):
                curve.extend(np.load(path)[:init_epoch].tolist())
        log_fn(f"resuming from epoch {init_epoch}")

    # per-step non-finite abort (lagged so the device pipeline never stalls;
    # the steps gate their writes on isfinite(loss), see utils/finite_guard.py)
    guard_d = FiniteGuard(lag=2, what="discriminator loss")
    guard_g = FiniteGuard(lag=2, what="generator loss")
    for epoch in range(init_epoch, epochs):
        t0 = time.time()
        # losses accumulate ON DEVICE (a float() per critic iteration would
        # force training_ratio host syncs per step); the FiniteGuard syncs
        # only values already materialized two dispatches back
        avg_d = jnp.zeros(())
        avg_g = jnp.zeros(())
        n_d = 0
        for step_i in range(int(steps_per_epoch)):
            ratio = first_training_ratio if (epoch == 0 and step_i == 0) \
                else training_ratio
            tag = f"epoch {epoch + 1} step {step_i + 1}"

            def stack_chunk():
                locals_ = [tuple(np.asarray(x) for x in next(inputs_gen))
                           for _ in range(scan_k)]
                return host_local_stacked_to_global(
                    mesh, tuple(np.stack(parts) for parts in zip(*locals_)))

            if scan_k and ratio == scan_k:
                # the steady-state step: the whole cycle (K critic updates
                # + generator update) is ONE dispatch
                gen_batch = host_local_batch_to_global(
                    mesh, tuple(np.asarray(x) for x in next(inputs_gen)))
                (gen_params, gen_bs, disc_params, gen_opt_state,
                 disc_opt_state, key, d_losses, g_loss) = cycle_step(
                    gen_params, gen_bs, disc_params, gen_opt_state,
                    disc_opt_state, key, stack_chunk(), gen_batch)
                # a non-finite loss anywhere in the chunk propagates
                # through the sum; per-iteration writes are gated on device
                d_sum = jnp.sum(d_losses)
                guard_d.push(tag, d_sum)
                avg_d += d_sum
                n_d += scan_k
                guard_g.push(tag, g_loss)
                avg_g += g_loss
                continue

            n_chunks, n_rem = divmod(ratio, scan_k) if scan_k else (0, ratio)
            for _ in range(n_chunks):
                disc_params, disc_opt_state, key, d_losses = disc_steps(
                    gen_params, gen_bs, disc_params, disc_opt_state, key,
                    stack_chunk())
                d_sum = jnp.sum(d_losses)
                guard_d.push(tag, d_sum)
                avg_d += d_sum
                n_d += scan_k
            for _ in range(n_rem):
                batch = host_local_batch_to_global(
                    mesh, tuple(np.asarray(x) for x in next(inputs_gen)))
                key, sub = jax.random.split(key)
                disc_params, disc_opt_state, d_loss = disc_step(
                    gen_params, gen_bs, disc_params, disc_opt_state, sub, batch)
                guard_d.push(tag, d_loss)
                avg_d += d_loss
                n_d += 1
            batch = host_local_batch_to_global(
                mesh, tuple(np.asarray(x) for x in next(inputs_gen)))
            key, sub = jax.random.split(key)
            gen_params, gen_bs, gen_opt_state, g_loss = gen_step(
                gen_params, gen_bs, disc_params, gen_opt_state, sub, batch)
            guard_g.push(tag, g_loss)
            avg_g += g_loss
        guard_d.flush()
        guard_g.flush()
        avg_d = float(avg_d) / max(n_d, 1)
        avg_g = float(avg_g) / steps_per_epoch
        d_curve.append(avg_d)
        g_curve.append(avg_g)
        log_fn(f"Epoch {epoch + 1:0{le}d}/{epochs}  D {avg_d:.5f}  G {avg_g:.5f}  "
               f"({time.time() - t0:.1f}s)")
        np.save(os.path.join(log_dir, "discriminator_loss.npy"), np.array(d_curve))
        np.save(os.path.join(log_dir, "generator_loss.npy"), np.array(g_curve))
        export_keras_unet_weights(
            os.path.join(model_dir, f"generator_{epoch + 1:0{le}d}.h5"),
            {"params": jax.device_get(gen_params),
             "batch_stats": jax.device_get(gen_bs)})
        export_keras_unet_weights(
            os.path.join(model_dir, f"discriminator_{epoch + 1:0{le}d}.h5"),
            {"params": jax.device_get(disc_params)}, prefix="discriminator_")
        save_adv_checkpoint(model_dir, epoch + 1, {
            "gen_params": jax.device_get(gen_params),
            "gen_batch_stats": jax.device_get(gen_bs),
            "gen_opt_state": jax.device_get(gen_opt_state),
            "disc_params": jax.device_get(disc_params),
            "disc_opt_state": jax.device_get(disc_opt_state),
            "key": jax.device_get(key), "epoch": epoch + 1})

    return {"gen_params": gen_params, "gen_batch_stats": gen_bs,
            "disc_params": disc_params, "d_curve": d_curve, "g_curve": g_curve}


# ---------------------------------------------------------------------------
# checkpointing (orbax, mirrors the supervised loop's save/restore)
# ---------------------------------------------------------------------------

def save_adv_checkpoint(model_dir, epoch, ckpt):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(model_dir, f"adv_{epoch:03d}"))
    with ocp.StandardCheckpointer() as saver:
        saver.save(path, ckpt, force=True)


def latest_adv_checkpoint(model_dir):
    import re

    if not os.path.isdir(model_dir):
        return None
    epochs = [int(m.group(1)) for f in os.listdir(model_dir)
              if (m := re.fullmatch(r"adv_(\d{3})", f))]
    return max(epochs) if epochs else None


def restore_adv_checkpoint(model_dir, epoch, template):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(model_dir, f"adv_{epoch:03d}"))
    with ocp.StandardCheckpointer() as saver:
        return saver.restore(path, template)
