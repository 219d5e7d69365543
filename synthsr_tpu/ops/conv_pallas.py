"""Pallas 3-D convolution kernel for small channel counts.

XLA's conv on TPU places output channels on the 128-lane axis, so the
24-feature U-Net runs at ≤24/128 of MXU throughput (measured ~10 TFLOPs at
24ch vs ~130 TFLOPs at 128ch).  This kernel transposes the problem: channels
live on the 8-sublane axis (24 = 3·8, no padding) and SPATIAL positions on
the lane axis — out^T (C_out, S) = W^T (C_out, 9·C_in) @ patches (9·C_in, S),
accumulated over the 3 z-taps — recovering MXU utilization for small C.

Layout: channels-first (C, D, H, W); SAME zero padding; stride 1; 3³ kernels.
Grid is (D/block_d, H/block_h); each step processes a (C_out, block_d,
block_h, W) output block:

- the input slab (C, block_d+2, block_h+8, Wp) is DOUBLE-BUFFERED: step i
  prefetches step i+1's slab while computing, hiding the DMA latency of the
  many small strided chunks (serial per-step DMA measured ~5x slower than
  the MXU dots it feeds);
- multi-plane blocks (block_d > 1) amortize the z-halo: 3 planes loaded per
  output plane at block_d=1 vs 1.5 at block_d=4;
- INPUT-STATIONARY z accumulation: each slab plane's 9-tap patch matrix is
  built ONCE (aligned loads + static register shifts) and hit with ONE wide
  MXU dot against the z-stacked weights (M = 3·C_out rows instead of 3
  separate M = C_out dots — 24-row dots left 5/6 of the MXU's 128 PE rows
  idle; this tripled measured throughput), then the three (C_out, N) slices
  scatter-accumulate into 3 rolling f32 plane accumulators; edge planes use
  partial weight stacks so no FLOPs are wasted on the z-halo;
- the 9-tap patch matrix keeps scratch 3x smaller than a 27-tap one — the
  full-tap version overflowed the 16M scoped-VMEM default at C_in = 72 (the
  decoder concat conv), which was the round-1 "256³ blockade".

Two kernels share the channels-on-sublanes formulation:

- ``conv3d_cf`` (blocked, v5): grid over (D, H) blocks, double-buffered
  halo-slab DMA.  Works for any W; pays (td+2)/td x (th+8)/th halo re-reads
  and a 512-byte strided-chunk DMA pattern that caps effective bandwidth.
- ``conv3d_cf_planes`` (plane-streaming, v6): grid over D planes in groups
  of 4; each plane is DMA'd ONCE as contiguous (H, W) chunks into an aligned
  offset of a zero-bordered VMEM slot (no host pad pass, no halo re-reads,
  HBM traffic = the theoretical 2x volume bytes), with input-stationary
  accumulation into 4 rolling full-plane f32 accumulators (4 so the ring
  indices stay static under the unroll).  Requires W % 128 == 0, D % 4 == 0.
  Measured (256^3, v5e, true device time): 24ch 22.7 -> 20.8 ms,
  1ch -> 11.9 ms; the kernel is VPU-bound on patch building + acc traffic.
- ``conv3d_cf_grouped``: big-cin convs split over equal channel groups
  (conv linearity) that share ONE compiled executable, because Mosaic
  compile time blows up superlinearly in the unrolled vector-op count
  (~ cin*h*w / vreg): cin=24 at 256^2-lane planes lowers in ~5 min, cin=72
  never finished (>20 min, multi-GB MLIR).  _plane_layout enforces the cap.

Third recorded negative result (round 3): sublane-aligned staging.  The
patch build's dy reads start at rows 7/8/9 — two of three sublane-
misaligned.  A perf-only probe forcing all dy reads to the aligned row 8
(wrong numerics, identical op structure) measured 17.51 -> 15.80 ms for the
24ch 256^3 conv: ~10% is the UPPER BOUND on what 3-DMA-landing staging
could recover, before paying its own 3x input DMA and 3x slab VMEM (which
at 256^3 would force a smaller ring or chunking).  The patch-build bound is
the 9x copy traffic itself, not the misalignment penalty — staging
rejected.  (Fourth: the v5 blocked kernel at 64-cubed training shapes loses
to XLA's channels-last conv, 3.04 vs 2.18 ms at 24->48 — half-empty lanes
plus the strided-chunk DMA; 64-cubed levels stay channels-last XLA.)

Roofline (round 4): the wide dot is (M=3·C_out, K=9·C_in, N=H·W).  At the
24-feature levels M=72 of the MXU's 128 PE rows — a 56% structural ceiling
(~110 of ~197 TF/s v5e bf16 peak) inherent to the formulation; M=3·C_out is
its maximum (the 27-tap alternative gives M=C_out=24, strictly worse).
Measured 24ch 256³: 20.8 ms = 522 GFLOP -> 25 TF/s = 23% of that ceiling;
the gap is patch-build VPU copies + halo DMA + f32 acc traffic, each bounded
by one of the five recorded negative probes (this docstring + the
PREFER_FLAT note below).  XLA's channels-last conv at the same shape:
~10 TF/s.

Mosaic constraints baked in (each cost a compile attempt): values can't be
dynamically sliced (slice refs via pl.ds), dynamic sublane starts must be
8-aligned (hence the +8 H padding and static dy shifts in v5; v6 lands
planes at row 8 / lane 128 so every DMA offset is aligned), flattens need
128-aligned lane dims (hence the W % 128 gate on the wide-dot path), DMA
memref slices need 128-aligned minor dims, and jnp.expm1 has no lowering
(elu uses exp - 1, which differs only below bf16 resolution for x < 0).

Used by models/unet_cf.py for the fast channels-first inference forward; the
predict bench runs through it.  Correctness: interpret-mode oracle vs
jax.lax.conv (tests/test_ops_core.py) + TPU-vs-XLA check (bf16 tolerance:
the MXU's default f32 matmul runs bf16 passes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Dispatch preference between the plane-streaming (v6) and folded-plane
# ("flat") kernels at shapes where BOTH qualify (128-multiple widths).
# Fifth recorded negative result (round 4): micro-probes at 128-cubed
# >=24ch shapes showed flat 1.03-1.19x faster than planes, but the
# END-TO-END A/B (tools/ab_flat.sh, the arbiter — per-kernel timings
# through the tunneled chip under-measure) refuted the flip: 256^3 predict
# 175.7 (planes) vs 156.8 (flat) vol/min, 128^3 synth-train 7.81 vs 7.74
# steps/s.  Planes stays preferred wherever it qualifies; flat keeps the
# non-128-multiple widths where planes can't run.
# SYNTHSR_PREFER_FLAT=0/1 overrides for A/B runs; read once at import.
PREFER_FLAT = os.environ.get("SYNTHSR_PREFER_FLAT", "0") == "1"


def pick_blocks(cin, cout, d, h, w, budget=12 * 2 ** 20):
    """(block_d, block_h) whose kernel scratch (double-buffered slab +
    patches + rolling f32 acc + double-buffered out) fits in scoped VMEM."""
    wp = ((w + 2 + 127) // 128) * 128
    for td, th in ((4, 32), (4, 16), (2, 32), (2, 16), (4, 8), (2, 8),
                   (1, 16), (1, 8)):
        if d % td or h % th:
            continue
        need = (2 * cin * (td + 2) * (th + 8) * wp * 2    # slab x2
                + 9 * cin * th * w * 2                    # patches
                + 3 * cout * th * w * 4                   # rolling f32 acc
                + 2 * cout * td * th * w * 2)             # out block x2
        if need <= budget:
            return td, th
    return 1, 8


def _kernel(x_hbm, w_ref, out_hbm, slab, patches, acc, obuf, isem,
            osem, *, cin, cout, wp, td, th, w_out, n_db, n_hb, has_bias,
            activation, n_streams):
    # The grid is over PAIRS of output blocks so both double-buffer slots are
    # indexed STATICALLY (a traced slot index turns every slab access into a
    # whole-buffer dynamic-slice copy — measured 10x slower).
    i = pl.program_id(0)
    nsteps = n_db * n_hb

    def indices(flat):
        return flat // n_hb, jax.lax.rem(flat, n_hb)

    # each logical copy is split over the channel axis into n_streams
    # parallel DMAs with separate semaphores: one async_copy maxes out a
    # single DMA stream (~175 GB/s measured on the halo-slab pattern), while
    # the chip's aggregate HBM bandwidth needs several engines engaged
    class _group:
        def __init__(self, copies):
            self.copies = copies

        def start(self):
            for c in self.copies:
                c.start()

        def wait(self):
            for c in self.copies:
                c.wait()

    def _split(n):
        q, r = divmod(n, n_streams)
        sizes = [q + (1 if i < r else 0) for i in range(n_streams)]
        starts = [sum(sizes[:i]) for i in range(n_streams)]
        return [(st, sz) for st, sz in zip(starts, sizes) if sz]

    def in_dma(slot, flat):
        db, hb = indices(flat)
        h0 = pl.multiple_of(hb * th, 8)
        return _group([pltpu.make_async_copy(
            x_hbm.at[pl.ds(st, sz), pl.ds(db * td, td + 2), pl.ds(h0, th + 8)],
            slab.at[slot, pl.ds(st, sz)], isem.at[slot, k])
            for k, (st, sz) in enumerate(_split(cin))])

    def out_dma(slot, flat):
        db, hb = indices(flat)
        h0 = pl.multiple_of(hb * th, 8)
        return _group([pltpu.make_async_copy(
            obuf.at[slot, pl.ds(st, sz)],
            out_hbm.at[pl.ds(st, sz), pl.ds(db * td, td), pl.ds(h0, th)],
            osem.at[slot, k])
            for k, (st, sz) in enumerate(_split(cout))])

    @pl.when(i == 0)
    def _():
        in_dma(0, 0).start()
        if nsteps > 1:
            in_dma(1, 1).start()
        if has_bias:
            # constant ones row: with the bias/3 column appended to each
            # z-weight slab, the dot adds bias exactly once per output plane
            # (every plane receives all 3 dz contributions)
            patches[9 * cin, :, :] = jnp.ones((th, w_out), patches.dtype)

    def process(slot, flat):
        in_dma(slot, flat).wait()
        # this slot's staging buffer is free once the out-copy issued two
        # blocks ago (same slot, previous pair) has drained
        @pl.when(flat >= 2)
        def _():
            out_dma(slot, flat - 2).wait()

        # Input-stationary: each slab plane p contributes W[dz] @ patches(p)
        # to output plane z = p - dz.  One dot per plane with the z-stacked
        # weights (M = up to 3·cout rows — 3x the MXU row occupancy of
        # per-dz dots), sliced to the dz range whose z is in-block, so the
        # halo planes cost no extra FLOPs.
        for p in range(td + 2):
            for dy in range(3):
                for dx in range(3):
                    u = slab[slot, :, p, :, dx:dx + w_out]
                    patches[(dy * 3 + dx) * cin:(dy * 3 + dx + 1) * cin,
                            :, :] = u[:, dy:dy + th, :]
            lo_dz = max(0, p - (td - 1))
            hi_dz = min(2, p)
            krows = 9 * cin + (1 if has_bias else 0)
            wrows = w_ref[lo_dz * cout:(hi_dz + 1) * cout]
            if w_out % 128 == 0:
                # one wide MXU dot per slab plane: N = th·W
                p2 = patches[:].reshape(krows, th * w_out)
                c = jax.lax.dot_general(
                    wrows, p2,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(-1, th, w_out)
            else:
                rows = [jax.lax.dot_general(
                    wrows, patches[:, r, :],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                    for r in range(th)]
                c = jnp.stack(rows, axis=1)
            for dz in range(lo_dz, hi_dz + 1):
                z = p - dz
                contrib = c[(dz - lo_dz) * cout:(dz - lo_dz + 1) * cout]
                if dz == 0:  # plane p = z: first contribution to out[z]
                    acc[z % 3, :, :, :] = contrib
                else:
                    acc[z % 3, :, :, :] = acc[z % 3, :, :, :] + contrib
                if dz == 2:  # plane p = z + 2: out[z] complete
                    val = acc[z % 3, :, :, :]
                    if activation == "elu":
                        # Mosaic has no expm1 lowering; exp−1 in f32 differs
                        # only below bf16 resolution for the x<0 branch
                        val = jnp.where(val > 0, val, jnp.exp(val) - 1.0)
                    elif activation == "relu":
                        val = jnp.maximum(val, 0.0)
                    elif activation == "leaky":
                        # LeakyReLU(0.2) — the WGAN critic's activation
                        val = jnp.where(val >= 0, val, 0.2 * val)
                    obuf[slot, :, z, :, 0:w_out] = val.astype(obuf.dtype)

        out_dma(slot, flat).start()
        # prefetch this slot's next input (two blocks ahead)
        @pl.when(flat + 2 < nsteps)
        def _():
            in_dma(slot, flat + 2).start()

    flat0 = 2 * i
    process(0, flat0)
    if nsteps > 1:
        @pl.when(flat0 + 1 < nsteps)
        def _():
            process(1, flat0 + 1)

    # drain the final out-copies before the kernel ends
    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_dma(0, flat0).wait()
        if nsteps > 1:
            @pl.when(flat0 + 1 < nsteps)
            def _():
                out_dma(1, flat0 + 1).wait()


def _plane_kernel(*refs, cin, cout, d, hdim, w_out, hp, wp, th, ns,
                  has_bias, activation, n_streams, n_steps, has_accum,
                  has_post, src_cins, rolled, has_head=False):
    """Plane-streaming variant (v6): grid over D in groups of 4 planes.

    Each INPUT plane is DMA'd from HBM exactly once as large contiguous
    (H, W) chunks — the blocked kernel's (td+2)/td x (th+8)/th halo re-reads
    and its 512-byte strided-chunk pattern (which capped effective DMA
    bandwidth near 115 GB/s) both disappear.  The plane lands at an ALIGNED
    offset (row 8, lane 128) inside a zero-bordered VMEM slot, so the +-1
    halos in H and W come from static in-VMEM slices and the input needs NO
    host-side padding pass at all; total HBM traffic is the theoretical
    2 x volume bytes.

    Input-stationary over planes: plane p's 9-tap patch matrix is hit with
    one 3-z-stacked dot; the three (C_out, N) slices accumulate into 4
    rolling full-plane f32 accumulators (4, not 3, so slot indices p+-1 mod 4
    stay STATIC under the 4-plane grid unroll).  Output plane z = p-1
    completes with plane p's dz=2 contribution (z = D-1 with plane D-1's
    dz=1) and leaves through a double-buffered full-plane store.

    Optional extensions (both save whole-volume XLA passes):
    - ``has_accum``: a previous partial-conv output (channel-group chaining,
      see conv3d_cf_grouped) streams in plane-by-plane through its own
      4-slot ring and seeds the dz=0 accumulator write — the partial sums
      never meet an XLA add.
    - ``has_post``: a per-channel affine applied AFTER the activation
      (inference BatchNorm folded into the conv epilogue).
    """
    it = iter(refs)
    x_srcs = [next(it) for _ in src_cins]
    w_ref = next(it)
    acc_hbm = next(it) if has_accum else None
    post_s = next(it) if has_post else None
    post_b = next(it) if has_post else None
    head_a = next(it) if has_head else None
    head_b = next(it) if has_head else None
    out_hbm = next(it)
    slab, patches, acc, obuf = next(it), next(it), next(it), next(it)
    abuf = next(it) if has_accum else None
    isem, osem = next(it), next(it)
    asem = next(it) if has_accum else None
    cq = 1 if has_head else cout  # stored output channels
    i = pl.program_id(0)

    class _group:
        def __init__(self, copies):
            self.copies = copies

        def start(self):
            for c in self.copies:
                c.start()

        def wait(self):
            for c in self.copies:
                c.wait()

    def _split(n):
        q, r = divmod(n, n_streams)
        sizes = [q + (1 if j < r else 0) for j in range(n_streams)]
        starts = [sum(sizes[:j]) for j in range(n_streams)]
        return [(st, sz) for st, sz in zip(starts, sizes) if sz]

    def in_dma(slot, p):
        # one copy group per (source, stream): source tensors (the decoder's
        # [skip, upsampled]) land at their channel offsets inside the SAME
        # slab slot, so the concatenated tensor never exists in HBM
        copies = []
        j = 0
        off = 0
        for src, cin_s in zip(x_srcs, src_cins):
            for st, sz in _split(cin_s):
                copies.append(pltpu.make_async_copy(
                    src.at[pl.ds(st, sz), p],
                    slab.at[slot, pl.ds(off + st, sz), pl.ds(8, hdim),
                            pl.ds(128, w_out)],
                    isem.at[slot, j]))
                j += 1
            off += cin_s
        return _group(copies)

    def out_dma(oslot, z):
        return _group([pltpu.make_async_copy(
            obuf.at[oslot, pl.ds(st, sz)],
            out_hbm.at[pl.ds(st, sz), z],
            osem.at[oslot, j]) for j, (st, sz) in enumerate(_split(cq))])

    def adma(slot, z):
        return pltpu.make_async_copy(acc_hbm.at[:, z], abuf.at[slot],
                                     asem.at[slot])

    def act(val):
        if activation == "elu":
            # Mosaic has no expm1 lowering; exp-1 in f32 differs only below
            # bf16 resolution for the x<0 branch
            val = jnp.where(val > 0, val, jnp.exp(val) - 1.0)
        elif activation == "relu":
            val = jnp.maximum(val, 0.0)
        elif activation == "leaky":
            val = jnp.where(val >= 0, val, 0.2 * val)
        if has_post:
            # inference BatchNorm folded in: per-channel affine AFTER the
            # activation.  scale/bias arrive pre-shaped (cout, 1, 1) so the
            # read needs no layout cast (Mosaic cannot move a lane vector
            # onto the outer axis).
            val = val * post_s[:] + post_b[:]
        if has_head:
            # final 1x1x1 likelihood conv folded in: per-channel weighted
            # reduction over the outer axis + scalar bias — the penultimate
            # C_out-channel tensor never reaches HBM
            val = jnp.sum(val * head_a[:], axis=0, keepdims=True) \
                + head_b[:]
        return val

    @pl.when(i == 0)
    def _():
        # zero-border the slots ONCE: every DMA writes only the interior
        # (rows 8..8+H-1, lanes 128..128+W-1), so the borders stay zero and
        # supply the SAME-conv halo for free
        for s in range(ns):
            slab[s] = jnp.zeros((cin, hp, wp), slab.dtype)
        # K is padded to a multiple of 8: rows beyond the taps (+ones) stay
        # zero forever (chunk writes only touch rows < 9*cin), matching the
        # zero columns appended to the weight matrix
        patches[9 * cin:, :, :] = jnp.zeros(
            (patches.shape[0] - 9 * cin, th, w_out), patches.dtype)
        if has_bias:
            patches[9 * cin, :, :] = jnp.ones((th, w_out), patches.dtype)
        for s in range(min(ns, d)):
            in_dma(s, s).start()
        if has_accum:
            # accum plane z lives in ring slot z % 4; substep p consumes
            # z = p+1 (dz=0 seed), plus z = 0 once at p = 0 (dz=1 seed)
            for z in range(min(4, d)):
                adma(z, z).start()

    n_chunks = hdim // th
    krows = patches.shape[0]

    for k in range(4):
        s = k % ns
        p = 4 * i + k
        z_prev = p - 1  # completes this substep via dz=2

        def substep(k=k, s=s, p=p, z_prev=z_prev):
            in_dma(s, p).wait()
            if has_accum:
                # accum plane z = p+1 (seeds dz=0); z = p+1 == d never had a
                # DMA started, so skip that wait (the dz=0 write it would
                # seed is the dead out[d] garbage write)
                def wait_acc():
                    adma((k + 1) % 4, 0).wait()
                if k == 3:
                    pl.when(i < n_steps - 1)(wait_acc)
                else:
                    wait_acc()
                if k == 0:
                    @pl.when(i == 0)
                    def _():
                        adma(0, 0).wait()  # z = 0, seeds out[0] at dz=1
            # obuf slot for z_prev: previous occupant (z_prev - 2) must have
            # drained before this substep overwrites it
            o_prev = (k - 1) % 2

            def wait_prev():
                out_dma(o_prev, z_prev - 2).wait()
            if k >= 3:
                wait_prev()
            else:
                pl.when(z_prev >= 2)(wait_prev)
            if k == 3:
                # out[d-1] also completes here (its dz=2 source, plane d,
                # does not exist); its obuf slot is k % 2
                @pl.when(i == n_steps - 1)
                def _():
                    out_dma(k % 2, d - 3).wait()

            def chunk(h0):
                # h0 may be a TRACED multiple of th (rolled fori_loop) or a
                # python int (unrolled); all ref indexing goes through pl.ds
                if rolled:
                    # dy offsets 7..9 are sublane-misaligned, so load once
                    # from the 8-aligned dynamic base and take the dy/dx
                    # windows as STATIC sub-slices of the loaded value
                    # (hp == h+16 makes the th+16 row read always in-bounds)
                    v = slab[s, :, pl.ds(h0, th + 16), :]
                    for dy in range(3):
                        for dx in range(3):
                            patches[(dy * 3 + dx) * cin:
                                    (dy * 3 + dx + 1) * cin, :, :] = \
                                v[:, 7 + dy:7 + dy + th,
                                  127 + dx:127 + dx + w_out]
                else:
                    for dy in range(3):
                        for dx in range(3):
                            u = slab[s, :, 7 + h0 + dy:7 + h0 + dy + th,
                                     127 + dx:127 + dx + w_out]
                            patches[(dy * 3 + dx) * cin:
                                    (dy * 3 + dx + 1) * cin, :, :] = u
                if w_out % 128 == 0:
                    p2 = patches[:].reshape(krows, th * w_out)
                    c = jax.lax.dot_general(
                        w_ref[:], p2,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(3 * cout, th, w_out)
                else:
                    rows = [jax.lax.dot_general(
                        w_ref[:], patches[:, r, :],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                        for r in range(th)]
                    c = jnp.stack(rows, axis=1)

                hs = pl.ds(h0, th)
                # dz=0 -> out[p+1]: always an overwrite (first contribution),
                # seeded by the chained partial when present; a p+1 == d
                # garbage write is dead — every slot use begins with its own
                # dz=0 overwrite
                seed0 = c[0:cout]
                if has_accum:
                    seed0 = seed0 + abuf[(k + 1) % 4, :, hs, :] \
                        .astype(jnp.float32)
                acc[(k + 1) % 4, :, hs, :] = seed0

                # dz=1 -> out[p]: add; out[0] has no dz=0 source, so its
                # first contribution is an overwrite (+ its partial seed)
                upd1 = c[cout:2 * cout]
                if k == 0:
                    @pl.when(i == 0)
                    def _():
                        seed1 = upd1
                        if has_accum:
                            seed1 = seed1 + abuf[0, :, hs, :] \
                                .astype(jnp.float32)
                        acc[0, :, hs, :] = seed1

                    @pl.when(i > 0)
                    def _():
                        acc[0, :, hs, :] = acc[0, :, hs, :] + upd1
                else:
                    acc[k, :, hs, :] = acc[k, :, hs, :] + upd1

                # dz=2 -> out[p-1] complete: epilogue straight to obuf
                def emit():
                    val = acc[(k - 1) % 4, :, hs, :] + c[2 * cout:3 * cout]
                    obuf[o_prev, :, hs, :] = act(val).astype(obuf.dtype)
                if k == 0:
                    pl.when(i > 0)(emit)
                else:
                    emit()

                if k == 3:
                    # out[d-1] completes with this plane's dz=1
                    @pl.when(i == n_steps - 1)
                    def _():
                        val = acc[3, :, hs, :]
                        obuf[1, :, hs, :] = act(val).astype(obuf.dtype)

            if rolled:
                def body(ci, carry):
                    chunk(ci * th)
                    return carry
                jax.lax.fori_loop(0, n_chunks, body, 0)
            else:
                for c_idx in range(n_chunks):
                    chunk(c_idx * th)

            def start_out():
                out_dma(o_prev, z_prev).start()
            if k == 0:
                pl.when(i > 0)(start_out)
            else:
                start_out()
            if k == 3:
                @pl.when(i == n_steps - 1)
                def _():
                    out_dma(1, d - 1).start()

            @pl.when(p + ns < d)
            def _():
                in_dma(s, p + ns).start()
            if has_accum:
                @pl.when(p + 5 <= d - 1)
                def _():
                    adma((k + 1) % 4, p + 5).start()
                if k == 0 and d > 4:
                    @pl.when(i == 0)
                    def _():
                        adma(0, 4).start()

        substep()

    @pl.when(i == n_steps - 1)
    def _():
        out_dma(0, d - 2).wait()
        out_dma(1, d - 1).wait()


def _first_kernel(*refs, cin, cout, d, hdim, w_out, hp, wp, th, has_bias,
                  activation, n_streams, n_steps, has_post):
    """OUTPUT-stationary variant for tiny cin (the network's 1-channel first
    conv): each substep emits one output plane from a 27-tap patch matrix
    built over THREE resident input planes — no rolling f32 accumulator ring
    at all, whose traffic (independent of cin) dominated the input-stationary
    kernel at cin=1 (11.9 ms of which ~2 were real work).

    Input planes live in a 4-slot ring (slot p%4); slot (z-1)%4 at z=0 holds
    its initial zeros (plane 3's DMA is deferred to substep 0's epilogue),
    and the missing-plane taps at z=0 / z=d-1 are zeroed in the patch matrix
    under a predicate.  Bias is one ones-row with the FULL bias column —
    every output plane gets exactly one dot.
    """
    it = iter(refs)
    x_hbm = next(it)
    w_ref = next(it)
    post_s = next(it) if has_post else None
    post_b = next(it) if has_post else None
    out_hbm = next(it)
    slab, patches, obuf = next(it), next(it), next(it)
    isem, osem = next(it), next(it)
    i = pl.program_id(0)

    class _group:
        def __init__(self, copies):
            self.copies = copies

        def start(self):
            for c in self.copies:
                c.start()

        def wait(self):
            for c in self.copies:
                c.wait()

    def _split(n):
        q, r = divmod(n, n_streams)
        sizes = [q + (1 if j < r else 0) for j in range(n_streams)]
        starts = [sum(sizes[:j]) for j in range(n_streams)]
        return [(st, sz) for st, sz in zip(starts, sizes) if sz]

    def in_dma(slot, p):
        return _group([pltpu.make_async_copy(
            x_hbm.at[pl.ds(st, sz), p],
            slab.at[slot, pl.ds(st, sz), pl.ds(8, hdim), pl.ds(128, w_out)],
            isem.at[slot, j]) for j, (st, sz) in enumerate(_split(cin))])

    def out_dma(oslot, z):
        return _group([pltpu.make_async_copy(
            obuf.at[oslot, pl.ds(st, sz)],
            out_hbm.at[pl.ds(st, sz), z],
            osem.at[oslot, j]) for j, (st, sz) in enumerate(_split(cout))])

    def act(val):
        if activation == "elu":
            val = jnp.where(val > 0, val, jnp.exp(val) - 1.0)
        elif activation == "relu":
            val = jnp.maximum(val, 0.0)
        elif activation == "leaky":
            val = jnp.where(val >= 0, val, 0.2 * val)
        if has_post:
            val = val * post_s[:] + post_b[:]
        return val

    @pl.when(i == 0)
    def _():
        for s in range(4):
            slab[s] = jnp.zeros((cin, hp, wp), slab.dtype)
        patches[27 * cin:, :, :] = jnp.zeros(
            (patches.shape[0] - 27 * cin, th, w_out), patches.dtype)
        if has_bias:
            patches[27 * cin, :, :] = jnp.ones((th, w_out), patches.dtype)
        for p in range(min(3, d)):
            in_dma(p, p).start()

    n_chunks = hdim // th
    krows = patches.shape[0]

    for k in range(4):
        z = 4 * i + k
        oslot = k % 2

        def substep(k=k, z=z, oslot=oslot):
            # plane z+1 arrives; z-1, z already resident (or zeros / edge)
            if k == 3:
                @pl.when(i < n_steps - 1)
                def _():
                    in_dma(0, 0).wait()  # reconstructed: slot (z+1)%4 == 0
            else:
                in_dma((k + 1) % 4, 0).wait()
            if k == 0:
                @pl.when(i == 0)
                def _():
                    in_dma(0, 0).wait()  # plane 0 itself

            def wait_out():
                out_dma(oslot, z - 2).wait()
            if k >= 2:
                wait_out()
            else:
                pl.when(z >= 2)(wait_out)

            for c_idx in range(n_chunks):
                h0 = c_idx * th
                for dz in range(3):
                    s_dz = (k + dz - 1) % 4
                    for dy in range(3):
                        for dx in range(3):
                            u = slab[s_dz, :,
                                     7 + h0 + dy:7 + h0 + dy + th,
                                     127 + dx:127 + dx + w_out]
                            r0 = ((dz * 3 + dy) * 3 + dx) * cin
                            patches[r0:r0 + cin, :, :] = u
                # zero the taps of missing edge planes (slot holds zeros at
                # z=0 only by construction; at z=d-1 it holds stale data)
                if k == 3:
                    @pl.when(z == d - 1)
                    def _():
                        patches[18 * cin:27 * cin, :, :] = jnp.zeros(
                            (9 * cin, th, w_out), patches.dtype)
                p2 = patches[:].reshape(krows, th * w_out)
                c = jax.lax.dot_general(
                    w_ref[:], p2,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(cout, th, w_out)
                obuf[oslot, :, h0:h0 + th, :] = act(c).astype(obuf.dtype)

            out_dma(oslot, z).start()
            @pl.when(z + 3 <= d - 1)
            def _():
                in_dma((k + 3) % 4, z + 3).start()

        substep()

    @pl.when(i == n_steps - 1)
    def _():
        out_dma(0, d - 2).wait()
        out_dma(1, d - 1).wait()


def _pad8(n):
    return ((n + 7) // 8) * 8


def _plane_layout(cin, cout, d, h, w, dtype_bytes=2, with_accum=False):
    """(th, ns, hp, wp, vmem_bytes, rolled) for the plane-streaming kernel,
    or None if the shape does not qualify."""
    if w % 128 != 0 or d % 4 != 0:
        return None
    # Mosaic compile time scales with the unrolled vector-op count
    # (~ cin*h*w / vreg): cin=24 at 256^2 planes lowers in ~5 min, cin=72
    # NEVER finished (>20 min, multi-GB MLIR).  Shapes over the cap must be
    # channel-split by the caller (conv linearity) onto compiled-once groups.
    # A rolled fori_loop chunk body (opt-in via conv3d_cf_planes(rolled=True))
    # did NOT fix it: the chunk's (cin, th+16, wp) value load keeps ~900
    # vregs live and register allocation explodes instead (72ch monolith
    # still >18 min).
    if cin * h * w > 24 * 256 * 256:
        return None
    rolled = False
    hp = ((h + 9 + 7) // 8) * 8
    wp = w + 256
    # th=32 measured fastest at 256^3 (th=64's bigger patch matrix was ~9ms
    # slower; compile time is ~invariant in th since the unrolled vector-op
    # count ~ cin*h*w / vreg doesn't depend on the chunking)
    for th in (32, 64, 16, 8):
        if h % th:
            continue
        for ns in (4, 2):
            krows = _pad8(9 * cin + 1)
            need = (ns * cin * hp * wp * dtype_bytes          # plane slots
                    + krows * th * w * dtype_bytes            # patches
                    + 4 * cout * h * w * 4                    # f32 acc ring
                    + 2 * cout * h * w * dtype_bytes)         # out planes x2
            if with_accum:
                need += 4 * cout * h * w * dtype_bytes        # partial ring
            if rolled:
                need += cin * (th + 16) * wp * dtype_bytes    # chunk v-load
            if need <= 90 * 2 ** 20:
                return th, ns, hp, wp, need, rolled
    return None


@functools.partial(jax.jit,
                   static_argnames=("interpret", "activation", "n_streams", "rolled"))
def conv3d_cf_planes(x, w, bias=None, activation: str | None = None,
                     interpret: bool = False, n_streams: int = 2,
                     accum=None, post=None, rolled=None, head=None):
    """SAME 3-cubed conv, channels-first, plane-streaming (see _plane_kernel).

    Same contract as conv3d_cf; requires W % 128 == 0 and D % 4 == 0 (use
    conv3d_cf otherwise).  The input is consumed UNPADDED — no host pad pass.
    ``x`` may be a LIST of (C_i, D, H, W) sources conceptually concatenated
    along C: each is DMA'd to its channel offset of the slab slots, so the
    concatenation never materializes in HBM.

    ``accum``: optional (C_out, D, H, W) partial-conv output added in-kernel
    (channel-group chaining — no XLA sum pass).  ``post``: optional (2, C_out)
    per-channel (scale, bias) affine applied AFTER the activation (folded
    inference BatchNorm).  ``head``: optional (a, b) with a (C_out,) and b
    scalar — the final 1x1x1 likelihood conv folded in as a channel
    reduction after act/post; the output becomes (1, D, H, W) float32 and
    the C_out-channel tensor never reaches HBM.
    """
    sources = list(x) if isinstance(x, (list, tuple)) else [x]
    src_cins = tuple(s.shape[0] for s in sources)
    cin = sum(src_cins)
    d, h, wdim = sources[0].shape[1:]
    x = sources[0]
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, 3) and w.shape[3] == cin
    layout = _plane_layout(cin, cout, d, h, wdim,
                           with_accum=accum is not None)
    assert layout is not None, \
        f"shape ({cin},{d},{h},{wdim})->{cout} does not fit the " \
        f"plane-streaming kernel"
    th, ns, hp, wp, _, rolled_auto = layout
    rolled = rolled_auto if rolled is None else rolled

    wt = jnp.transpose(w.reshape(3, 9 * cin, cout), (0, 2, 1)) \
        .reshape(3 * cout, 9 * cin)
    nst = max(1, min(n_streams, cin, cout))
    has_bias = bias is not None
    if has_bias:
        # bias rides the dz=1 (center-tap) rows ONLY: unlike the blocked
        # kernel, edge output planes here receive just 2 of 3 dz dots, but
        # every out[z]'s center source x[z] always exists, so a center-tap
        # bias is added exactly once everywhere
        b = jnp.asarray(bias).reshape(-1, 1)
        bcol = jnp.concatenate([jnp.zeros_like(b), b, jnp.zeros_like(b)])
        wt = jnp.concatenate([wt, bcol.astype(wt.dtype)], axis=1)
    krows = _pad8(9 * cin + 1)
    wt = jnp.pad(wt, ((0, 0), (0, krows - wt.shape[1])))

    has_accum = accum is not None
    has_post = post is not None
    n_steps = d // 4

    if cin <= 2 and not has_accum and len(sources) == 1:
        # output-stationary small-cin variant: 27-tap dot per output plane,
        # no f32 accumulator ring (whose cin-independent traffic dominated
        # here: measured 11.9 -> ~4 ms for the 1-channel first conv)
        assert head is None, \
            "the cin<=2 output-stationary variant does not implement the " \
            "folded likelihood head; pass head=None and apply it separately"
        wt27 = jnp.transpose(w.reshape(27 * cin, cout), (1, 0))
        if has_bias:
            wt27 = jnp.concatenate(
                [wt27, jnp.asarray(bias).reshape(-1, 1).astype(wt27.dtype)],
                axis=1)
        krows27 = _pad8(27 * cin + 1)
        wt27 = jnp.pad(wt27, ((0, 0), (0, krows27 - wt27.shape[1])))
        in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                    pl.BlockSpec(memory_space=pltpu.VMEM)]
        operands = [x, wt27.astype(x.dtype)]
        if has_post:
            postf = jnp.asarray(post, jnp.float32)
            in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            operands += [postf[0].reshape(cout, 1, 1),
                         postf[1].reshape(cout, 1, 1)]
        return pl.pallas_call(
            functools.partial(_first_kernel, cin=cin, cout=cout, d=d,
                              hdim=h, w_out=wdim, hp=hp, wp=wp, th=th,
                              has_bias=has_bias, activation=activation,
                              n_streams=max(1, min(n_streams, cout)),
                              n_steps=n_steps, has_post=has_post),
            grid=(n_steps,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=jax.ShapeDtypeStruct((cout, d, h, wdim), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((4, cin, hp, wp), x.dtype),
                pltpu.VMEM((krows27, th, wdim), x.dtype),
                pltpu.VMEM((2, cout, h, wdim), x.dtype),
                pltpu.SemaphoreType.DMA((4, max(1, min(n_streams, cin)))),
                pltpu.SemaphoreType.DMA(
                    (2, max(1, min(n_streams, cout)))),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
            interpret=interpret,
        )(*operands)

    in_specs = [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
                for _ in sources] + [pl.BlockSpec(memory_space=pltpu.VMEM)]
    operands = list(sources) + [wt.astype(x.dtype)]
    n_in_copies = sum(min(nst, c) for c in src_cins)
    if has_accum:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
        operands.append(accum)
    if has_post:
        post = jnp.asarray(post, jnp.float32)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(post[0].reshape(cout, 1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(post[1].reshape(cout, 1, 1))
    has_head = head is not None
    if has_head:
        ha, hb = head
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(ha, jnp.float32).reshape(cout, 1, 1))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(hb, jnp.float32).reshape(1, 1, 1))
    cq = 1 if has_head else cout
    out_dtype = jnp.float32 if has_head else x.dtype
    scratch = [
        pltpu.VMEM((ns, cin, hp, wp), x.dtype),
        pltpu.VMEM((krows, th, wdim), x.dtype),
        pltpu.VMEM((4, cout, h, wdim), jnp.float32),
        pltpu.VMEM((2, cq, h, wdim), out_dtype),
    ]
    if has_accum:
        scratch.append(pltpu.VMEM((4, cout, h, wdim), x.dtype))
    scratch.append(pltpu.SemaphoreType.DMA((ns, n_in_copies)))
    scratch.append(pltpu.SemaphoreType.DMA((2, max(1, min(nst, cq)))))
    if has_accum:
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
    out = pl.pallas_call(
        functools.partial(_plane_kernel, cin=cin, cout=cout, d=d, hdim=h,
                          w_out=wdim, hp=hp, wp=wp, th=th, ns=ns,
                          has_bias=has_bias, activation=activation,
                          n_streams=nst, n_steps=n_steps,
                          has_accum=has_accum, has_post=has_post,
                          src_cins=src_cins, rolled=rolled,
                          has_head=has_head),
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((cq, d, h, wdim), out_dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return out


def split_group_for(cin, cout, d, h, w):
    """Largest even channel-group size whose plane-kernel layout qualifies
    (None if none does).  Preference order favours sizes likely shared with
    other convs in the network so executables are reused.  Sized with the
    accum ring included, since grouped chaining uses it from group 2 on."""
    for g in (48, 40, 32, 24, 16, 8):
        if cin % g == 0 and _plane_layout(g, cout, d, h, w,
                                          with_accum=True) is not None:
            return g
    return None


def conv3d_cf_grouped(x, w, bias=None, activation: str | None = None,
                      group: int | None = None, interpret: bool = False,
                      post=None, head=None):
    """Big-cin SAME 3-cubed conv as a sum of channel-group partial convs.

    Convolution is linear in the input channels, so a conv whose cin is past
    the plane kernel's compile-cost cap splits into equal groups that all
    share compiled-once executables; the running partial sum CHAINS through
    each kernel's ``accum`` input (its planes stream through a dedicated
    ring and seed the dz=0 accumulator), so the partials never meet an XLA
    add, and bias + activation (+ optional post affine) run fused in the
    LAST group's epilogue.

    ``x``: one (C, D, H, W) tensor, or a LIST of them stacked conceptually
    along C — the decoder concat convs pass [skip, upsampled] directly so the
    concatenated tensor is never materialized in HBM.  ``group`` (single-x
    only) must divide cin; auto-picked per source when None.

    Precision note (round-2 advisor): intermediate partials chain through HBM
    in ``x.dtype`` — on TPU each non-final group's running sum takes one bf16
    round-to-nearest quantization (half-ULP = 2^-9 relative) that the
    monolithic f32-accumulated kernel does not have.  For the worst shipped
    case (144-ch decoder concat in 24-ch groups = 5 roundtrips) the bound is
    5·2^-9 ≈ 1% worst-case / ~0.25% RMS of the running partial — the same
    order as the bf16 MXU compute noise already present in every dot, and
    covered by the hardware fast-vs-XLA tolerance check.  An f32 intermediate
    was considered and rejected: it doubles the accum ring VMEM + DMA traffic
    and breaks the dtype_bytes=2 ``_plane_layout`` sizing that keeps the
    group executables shared.
    """
    sources = list(x) if isinstance(x, (list, tuple)) else [x]
    d, h, wdim = sources[0].shape[1:]
    cout = w.shape[-1]
    total = sum(s.shape[0] for s in sources)
    if group is None and _plane_layout(total, cout, d, h, wdim) is not None:
        # fits as ONE (possibly rolled-chunk) monolithic kernel reading the
        # sources at channel offsets — no chaining, no concat
        return conv3d_cf_planes(sources if len(sources) > 1 else sources[0],
                                w, bias=bias, activation=activation,
                                post=post, head=head, interpret=interpret)
    pieces = []  # (src_slice, w_slice)
    off = 0
    for src in sources:
        cin = src.shape[0]
        g = group if (group is not None and len(sources) == 1) else \
            (cin if _plane_layout(cin, cout, d, h, wdim,
                                  with_accum=True) is not None
             else split_group_for(cin, cout, d, h, wdim))
        assert g is not None and cin % g == 0, \
            f"no qualifying group size for cin={cin} at {src.shape}"
        for st in range(0, cin, g):
            pieces.append((src[st:st + g] if (st, g) != (0, cin) else src,
                           w[:, :, :, off + st:off + st + g, :]))
        off += cin
    assert off == w.shape[3]
    y = None
    for idx, (xs, ws) in enumerate(pieces):
        last = idx == len(pieces) - 1
        y = conv3d_cf_planes(xs, ws.astype(xs.dtype),
                             bias=bias if last else None,
                             activation=activation if last else None,
                             post=post if last else None,
                             head=head if last else None,
                             accum=y, interpret=interpret)
    return y


@functools.partial(jax.jit,
                   static_argnames=("block_d", "block_h", "interpret",
                                    "activation", "n_streams"))
def conv3d_cf(x, w, bias=None, activation: str | None = None,
              block_d: int | None = None, block_h: int | None = None,
              interpret: bool = False, n_streams: int = 2):
    """SAME 3³ conv, channels-first, with optional fused bias + activation.

    x: (C_in, D, H, W); w: (3, 3, 3, C_in, C_out) (DHWIO, as flax);
    bias: optional (C_out,) — folded into the MXU dot (ones row in the patch
    matrix, bias/3 column per z-weight-slab); activation: None|'elu'|'relu',
    applied in the f32 epilogue before the bf16 store — fusing both saves a
    full HBM round trip per conv versus a separate XLA elementwise pass.
    Returns (C_out, D, H, W) in x.dtype.  Block sizes are auto-picked for
    VMEM unless given.
    """
    cin, d, h, wdim = x.shape
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, 3)
    auto_td, auto_th = pick_blocks(cin, cout, d, h, wdim)
    td = block_d if block_d is not None else auto_td
    th = block_h if block_h is not None else auto_th
    assert d % td == 0, f"D={d} must be divisible by block_d={td}"
    assert h % th == 0, f"H={h} must be divisible by block_h={th}"
    assert th % 8 == 0, "block_h must be a multiple of 8"
    # W is padded to a 128 multiple for the +2 halo (DMA memref slices need
    # 128-aligned minor dims); an un-padded variant staging dy-rows through a
    # zero-bordered VMEM buffer measured NO faster at 24ch (the bottleneck is
    # the strided-chunk DMA pattern, not bytes) and blew Mosaic compile time
    # past 14 min at the 72ch decoder conv — rejected.
    wp = ((wdim + 2 + 127) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (1, wp - wdim - 1)))
    # (3*cout, 9*cin [+1]): z-stacked weight slabs, row dz*cout + co,
    # column (dy*3+dx)*cin + ci; optional last column = bias/3
    wt = jnp.transpose(w.reshape(3, 9 * cin, cout), (0, 2, 1)) \
        .reshape(3 * cout, 9 * cin)
    ns = max(1, min(n_streams, cin, cout))
    has_bias = bias is not None
    if has_bias:
        bcol = jnp.tile(jnp.asarray(bias).reshape(-1, 1) / 3.0, (3, 1))
        wt = jnp.concatenate([wt, bcol.astype(wt.dtype)], axis=1)
    krows = 9 * cin + (1 if has_bias else 0)

    n_db, n_hb = d // td, h // th
    # the OUTPUT is 128-aligned in W too: DMA memref slices need 128-aligned
    # minor dims, so a W=192 obuf slice fails Mosaic (found on hardware —
    # every 128-multiple shape had masked this); the kernel stores only the
    # real columns, the DMA moves the full aligned rows, and the padding is
    # sliced off afterwards
    wq = ((wdim + 127) // 128) * 128
    out = pl.pallas_call(
        functools.partial(_kernel, cin=cin, cout=cout, wp=wp, td=td, th=th,
                          w_out=wdim, n_db=n_db, n_hb=n_hb,
                          has_bias=has_bias, activation=activation,
                          n_streams=ns),
        grid=((n_db * n_hb + 1) // 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z-stacked weights
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((cout, d, h, wq), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, cin, td + 2, th + 8, wp), x.dtype),
            pltpu.VMEM((krows, th, wdim), x.dtype),
            pltpu.VMEM((3, cout, th, wdim), jnp.float32),
            pltpu.VMEM((2, cout, td, th, wq), x.dtype),
            pltpu.SemaphoreType.DMA((2, ns)),
            pltpu.SemaphoreType.DMA((2, ns)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wt.astype(x.dtype))
    return out if wq == wdim else out[..., :wdim]


# ---------------------------------------------------------------------------
# weight-gradient kernel (training backward)
# ---------------------------------------------------------------------------

def _wgrad_layout(cin, cout, d, h, w, dtype_bytes=2):
    """(th, hp, wp, vmem_bytes) for the wgrad kernel, or None."""
    if w % 128 != 0 or d % 4 != 0:
        return None
    if cin * h * w > 24 * 256 * 256:   # Mosaic compile cap (see _plane_layout)
        return None
    hp = ((h + 9 + 7) // 8) * 8
    wp = w + 256
    krows = _pad8(9 * cin)
    for th in (32, 16, 8):
        if h % th:
            continue
        need = (2 * cin * hp * wp * dtype_bytes        # x plane slots x2
                + 4 * cout * h * w * dtype_bytes       # cotangent ring x4
                + krows * th * w * dtype_bytes         # patches
                + 3 * cout * th * w * dtype_bytes      # z-stacked rhs buffer
                + krows * max(3 * cout, 128) * 4)      # out accumulator
        if need <= 90 * 2 ** 20:
            return th, hp, wp, need
    return None


def _wgrad_kernel(x_hbm, g_hbm, out, slab, gring, patches, dbuf, isem, gsem,
                  *, cin, cout, d, hdim, w_out, hp, wp, th, krows, n_streams,
                  n_steps):
    """See conv3d_cf_wgrad.  Grid over D in groups of 4 planes (static
    double/ring buffer slots, like the forward kernels).  Per input plane p:
    build the 9-tap (dy, dx) patch matrix of x plane p ONCE (same zero-
    bordered aligned-landing scheme as the v6 forward), z-stack the three
    resident cotangent planes (gp[p+2], gp[p+1], gp[p] — the host pads the
    cotangent with one zero plane each side, so tap dz of dw pairs x plane p
    with padded plane p+2-dz unconditionally, no edge predication), and hit
    the patches with ONE (krows, th·W) x (3·cout, th·W)ᵀ dot per chunk —
    N = 3·cout MXU columns instead of three N = cout dots — accumulating
    straight into the (krows, 3·cout) f32 output block that stays
    VMEM-resident across the whole grid.  No patch matrix, shifted view, or
    layout copy ever reaches HBM — the XLA one-dot formulation spent
    ~30 ms/step on exactly those (pad_slice + concatenate + relayout copies,
    trace-verified)."""
    i = pl.program_id(0)

    class _group:
        def __init__(self, copies):
            self.copies = copies

        def start(self):
            for c in self.copies:
                c.start()

        def wait(self):
            for c in self.copies:
                c.wait()

    def _split(n, ns):
        q, r = divmod(n, ns)
        sizes = [q + (1 if j < r else 0) for j in range(ns)]
        starts = [sum(sizes[:j]) for j in range(ns)]
        return [(st, sz) for st, sz in zip(starts, sizes) if sz]

    nsx = max(1, min(n_streams, cin))
    nsg = max(1, min(n_streams, cout))

    def x_dma(slot, p):
        return _group([pltpu.make_async_copy(
            x_hbm.at[pl.ds(st, sz), p],
            slab.at[slot, pl.ds(st, sz), pl.ds(8, hdim), pl.ds(128, w_out)],
            isem.at[slot, j]) for j, (st, sz) in enumerate(_split(cin, nsx))])

    def g_dma(slot, q):
        # q indexes the HOST-PADDED cotangent gp (d + 2 planes)
        return _group([pltpu.make_async_copy(
            g_hbm.at[pl.ds(st, sz), q],
            gring.at[slot, pl.ds(st, sz)],
            gsem.at[slot, j]) for j, (st, sz) in enumerate(_split(cout, nsg))])

    @pl.when(i == 0)
    def _():
        for s in range(2):
            slab[s] = jnp.zeros((cin, hp, wp), slab.dtype)
        if krows > 9 * cin:
            patches[9 * cin:, :, :] = jnp.zeros(
                (krows - 9 * cin, th, w_out), patches.dtype)
        out[...] = jnp.zeros(out.shape, out.dtype)
        x_dma(0, 0).start()
        x_dma(1, 1).start()
        for q in range(3):
            g_dma(q % 4, q).start()

    n_chunks = hdim // th

    for k in range(4):
        s = k % 2

        def substep(k=k, s=s):
            p = 4 * i + k
            x_dma(s, 0).wait()           # x plane p (reconstructed)
            # gp plane p+2 arrives this substep (gp[q] is waited at substep
            # q-2; gp[0] and gp[1] specially at substep 0)
            g_dma((k + 2) % 4, 0).wait()
            if k == 0:
                @pl.when(i == 0)
                def _():
                    g_dma(0, 0).wait()
                    g_dma(1, 0).wait()

            for c_idx in range(n_chunks):
                h0 = c_idx * th
                for dy in range(3):
                    for dx in range(3):
                        u = slab[s, :, 7 + h0 + dy:7 + h0 + dy + th,
                                 127 + dx:127 + dx + w_out]
                        patches[(dy * 3 + dx) * cin:
                                (dy * 3 + dx + 1) * cin, :, :] = u
                # z-stacked cotangent rows: dz = 0 / 1 / 2 pair x plane p
                # with gp planes p+2 / p+1 / p
                dbuf[0:cout, :, :] = gring[(k + 2) % 4, :, h0:h0 + th, :]
                dbuf[cout:2 * cout, :, :] = gring[(k + 1) % 4, :,
                                                  h0:h0 + th, :]
                dbuf[2 * cout:, :, :] = gring[k % 4, :, h0:h0 + th, :]
                c = jax.lax.dot_general(
                    patches[:].reshape(krows, th * w_out),
                    dbuf[:].reshape(3 * cout, th * w_out),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out[:, 0:3 * cout] = out[:, 0:3 * cout] + c

            @pl.when(p + 2 <= d - 1)
            def _():
                x_dma(s, p + 2).start()

            @pl.when(p + 3 <= d + 1)
            def _():
                g_dma((k + 3) % 4, p + 3).start()

        substep()


@functools.partial(jax.jit, static_argnames=("interpret", "n_streams"))
def conv3d_cf_wgrad(x, g, interpret: bool = False, n_streams: int = 3):
    """(3, 3, 3, ci, co) f32 weight gradient of a SAME stride-1 3-cubed conv,
    channels-first: dw[dz,dy,dx] = sum_p x[ci, p+dz-1, h+dy-1, w+dx-1] ·
    g[co, p, h, w] (zero padding), computed by the plane-streaming Pallas
    kernel _wgrad_kernel.  Requires W % 128 == 0, D % 4 == 0 (use
    _wgrad_layout to gate).  ``x``: (ci, D, H, W); ``g``: (co, D, H, W)
    cotangent of the PRE-activation output."""
    ci, d, h, w = x.shape
    co = g.shape[0]
    layout = _wgrad_layout(ci, co, d, h, w)
    if PREFER_FLAT and layout is not None:
        flat = _wgrad_flat_layout(ci, co, d, h, w)
        if flat is not None:
            layout = None
    if layout is None:
        flat = _wgrad_flat_layout(ci, co, d, h, w)
        assert flat is not None, \
            f"wgrad shape ({ci},{d},{h},{w})x{co} does not fit the kernels"
        return _wgrad_flat_call(x, g, flat, interpret, n_streams)
    th, hp, wp, _ = layout
    krows = _pad8(9 * ci)
    coq = max(3 * co, 128)
    nsx = max(1, min(n_streams, ci))
    nsg = max(1, min(n_streams, co))
    gp = jnp.pad(g.astype(x.dtype), ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_wgrad_kernel, cin=ci, cout=co, d=d, hdim=h,
                          w_out=w, hp=hp, wp=wp, th=th, krows=krows,
                          n_streams=n_streams, n_steps=d // 4),
        grid=(d // 4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((krows, coq), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ci, hp, wp), x.dtype),
            pltpu.VMEM((4, co, h, w), x.dtype),
            pltpu.VMEM((krows, th, w), x.dtype),
            pltpu.VMEM((3 * co, th, w), x.dtype),
            pltpu.SemaphoreType.DMA((2, nsx)),
            pltpu.SemaphoreType.DMA((4, nsg)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, gp)
    # rows are (dy·3 + dx)·ci + c; columns are dz·co + co_idx
    dw = out[:9 * ci, :3 * co].reshape(3, 3, ci, 3, co)
    return jnp.transpose(dw, (3, 0, 1, 2, 4))


# ---------------------------------------------------------------------------
# flat-plane kernel: folded (H, W) planes for narrow widths (64/32-cubed)
# ---------------------------------------------------------------------------

def _flat_layout(cin, cout, d, h, w, dtype_bytes=2, with_accum=False):
    """(hq, bh, vmem_bytes) for the flat-plane kernel, or None.

    Folds each (H, W) plane into (hq = H·W/128, 128) rows — a pure row-major
    reinterpretation — so the 128-lane constraint moves from W to H·W.  The
    9 (dy, dx) taps become static slices at flat offsets (dy−1)·W + (dx−1)
    of a row band with rb = ceil((W+1)/128) zero-borderable rows each side,
    plus two full-plane (hq, 128) masks — statically sliced per chunk — that
    zero the W-boundary wrap of the dx = 0/2 taps.  This is what makes both
    the 64/32-cubed U-Net levels AND every pad-to-32 clinical volume size
    (96, 160, 192, 224, ... — whose W disqualifies the v6 kernel and whose
    channels leave XLA's channels-last conv at 7-13 TFLOP/s)
    kernel-eligible."""
    el = h * w
    # w <= 1023: the slab's 8 zero-border rows bound rb = ceil((w+1)/128);
    # el % 1024: plane DMAs land hq rows per copy and Mosaic requires
    # DMA slice rows in multiples of 8 (hq = el/128 must be 8-aligned)
    if el % 1024 != 0 or el < 1024 or d % 4 != 0 or not (8 <= w <= 1023):
        return None
    if cin * el > 24 * 256 * 256:      # Mosaic compile cap (see _plane_layout)
        return None
    hq = el // 128
    bh = 8
    krows = _pad8(9 * cin + 1)
    need = (4 * cin * (hq + 16) * 128 * dtype_bytes   # slab slots
            + krows * bh * 128 * dtype_bytes          # patches
            + 4 * cout * hq * 128 * 4                 # f32 acc ring
            + 2 * cout * hq * 128 * dtype_bytes       # out planes x2
            + 2 * hq * 128 * dtype_bytes)             # wrap masks
    if with_accum:
        need += 4 * cout * hq * 128 * dtype_bytes     # chained-partial ring
    if need > 90 * 2 ** 20:
        return None
    return hq, bh, need


def _flat_kernel(*refs, cin, cout, d, hq, bh, w, has_bias, activation,
                 n_streams, n_steps, src_cins, has_post=False,
                 has_accum=False):
    """Input-stationary plane streaming on FLAT folded planes (see
    _flat_layout).  Structure mirrors _plane_kernel: 4 planes per grid step
    with static ring slots, each plane's 9-tap patch matrix built once and
    hit with one 3-z-stacked dot, 4 rolling f32 plane accumulators, output
    plane z = p−1 completing with plane p's dz=2 contribution.  The taps are
    misaligned flat-lane slices of a (cin, (bh+2·rb)·128) row-band value
    whose W-boundary wraps are zeroed by precomputed lane masks.
    ``has_accum``: chained partial-conv input (channel grouping) streaming
    through a 4-slot ring, seeding the dz=0 accumulator writes — exactly the
    _plane_kernel scheme."""
    it = iter(refs)
    x_srcs = [next(it) for _ in src_cins]
    w_ref = next(it)
    acc_hbm = next(it) if has_accum else None
    post_s = next(it) if has_post else None
    post_b = next(it) if has_post else None
    out_hbm = next(it)
    slab, patches, acc, obuf, masks = (next(it) for _ in range(5))
    abuf = next(it) if has_accum else None
    isem, osem = next(it), next(it)
    asem = next(it) if has_accum else None
    i = pl.program_id(0)
    el = hq * 128
    bl = bh * 128
    rb = (w + 1 + 127) // 128  # border rows a ±(w+1) tap offset can reach

    class _group:
        def __init__(self, copies):
            self.copies = copies

        def start(self):
            for c in self.copies:
                c.start()

        def wait(self):
            for c in self.copies:
                c.wait()

    def _split(n):
        q, r = divmod(n, n_streams)
        sizes = [q + (1 if j < r else 0) for j in range(n_streams)]
        starts = [sum(sizes[:j]) for j in range(n_streams)]
        return [(st, sz) for st, sz in zip(starts, sizes) if sz]

    def in_dma(slot, p):
        copies = []
        j = 0
        off = 0
        for src, cin_s in zip(x_srcs, src_cins):
            for st, sz in _split(cin_s):
                copies.append(pltpu.make_async_copy(
                    src.at[pl.ds(st, sz), p],
                    slab.at[slot, pl.ds(off + st, sz), pl.ds(8, hq)],
                    isem.at[slot, j]))
                j += 1
            off += cin_s
        return _group(copies)

    def out_dma(oslot, z):
        return _group([pltpu.make_async_copy(
            obuf.at[oslot, pl.ds(st, sz)],
            out_hbm.at[pl.ds(st, sz), z],
            osem.at[oslot, j]) for j, (st, sz) in enumerate(_split(cout))])

    def adma(slot, z):
        return pltpu.make_async_copy(acc_hbm.at[:, z], abuf.at[slot],
                                     asem.at[slot])

    def act(val):
        if activation == "elu":
            val = jnp.where(val > 0, val, jnp.exp(val) - 1.0)
        elif activation == "relu":
            val = jnp.maximum(val, 0.0)
        elif activation == "leaky":
            val = jnp.where(val >= 0, val, 0.2 * val)
        if has_post:
            # inference BatchNorm folded in: per-channel affine AFTER the
            # activation (scale/bias arrive pre-shaped (cout, 1, 1))
            val = val * post_s[:] + post_b[:]
        return val

    @pl.when(i == 0)
    def _():
        for s in range(4):
            slab[s] = jnp.zeros(slab.shape[1:], slab.dtype)
        patches[9 * cin:, :] = jnp.zeros(
            (patches.shape[0] - 9 * cin, bl), patches.dtype)
        if has_bias:
            patches[9 * cin, :] = jnp.ones((bl,), patches.dtype)
        # W-boundary wrap masks: flat position p is output (h, w) =
        # divmod(p, W); the dx = 0 tap is invalid at w = 0, the dx = 2 tap
        # at w = W-1 (the flat shift would pull the neighbouring row's value
        # there).  Full-plane (hq, 128) masks, statically sliced per chunk —
        # no alignment assumption between the 128-lane rows and W.
        row = jax.lax.broadcasted_iota(jnp.int32, (hq, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (hq, 128), 1)
        wpos = jax.lax.rem(row * 128 + lane, w)
        masks[0] = (wpos != 0).astype(masks.dtype)
        masks[1] = (wpos != (w - 1)).astype(masks.dtype)
        for s in range(min(4, d)):
            in_dma(s, s).start()
        if has_accum:
            # accum plane z lives in ring slot z % 4; substep p consumes
            # z = p+1 (dz=0 seed), plus z = 0 once at p = 0 (dz=1 seed)
            for z in range(min(4, d)):
                adma(z, z).start()

    krows = patches.shape[0]
    n_chunks = hq // bh

    for k in range(4):
        p = 4 * i + k
        z_prev = p - 1  # completes this substep via dz=2

        def substep(k=k, p=p, z_prev=z_prev):
            in_dma(k, p).wait()
            if has_accum:
                # accum plane z = p+1 (seeds dz=0); z = p+1 == d never had a
                # DMA started, so skip that wait
                def wait_acc():
                    adma((k + 1) % 4, 0).wait()
                if k == 3:
                    pl.when(i < n_steps - 1)(wait_acc)
                else:
                    wait_acc()
                if k == 0:
                    @pl.when(i == 0)
                    def _():
                        adma(0, 0).wait()  # z = 0, seeds out[0] at dz=1
            o_prev = (k - 1) % 2

            def wait_prev():
                out_dma(o_prev, z_prev - 2).wait()
            if k >= 3:
                wait_prev()
            else:
                pl.when(z_prev >= 2)(wait_prev)
            if k == 3:
                @pl.when(i == n_steps - 1)
                def _():
                    out_dma(k % 2, d - 3).wait()

            def chunk(c_idx):
                r0 = c_idx * bh
                # row band r0-rb .. r0+bh+rb (plane rows start at slab row
                # 8): its flat view puts output-chunk flat position c0 =
                # r0·128 at local offset rb·128, with valid data rb·128
                # lanes either side — enough for any |delta| <= w+1
                v = slab[k, :, 8 - rb + r0:8 + r0 + bh + rb, :] \
                    .reshape(cin, (bh + 2 * rb) * 128)
                m0 = masks[0, pl.ds(r0, bh), :].reshape(1, bl)
                m1 = masks[1, pl.ds(r0, bh), :].reshape(1, bl)
                for dy in range(3):
                    for dx in range(3):
                        delta = (dy - 1) * w + (dx - 1)
                        u = v[:, rb * 128 + delta:rb * 128 + delta + bl]
                        if dx == 0:
                            u = u * m0
                        elif dx == 2:
                            u = u * m1
                        patches[(dy * 3 + dx) * cin:
                                (dy * 3 + dx + 1) * cin, :] = u
                c = jax.lax.dot_general(
                    w_ref[:], patches[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)    # (3*cout, bl)
                rs = pl.ds(r0, bh)

                # dz=0 -> out[p+1]: overwrite (first contribution; p+1 == d
                # is a dead garbage write into a slot about to be reused),
                # seeded by the chained partial when present
                seed0 = c[0:cout].reshape(cout, bh, 128)
                if has_accum:
                    seed0 = seed0 + abuf[(k + 1) % 4, :, rs, :] \
                        .astype(jnp.float32)
                acc[(k + 1) % 4, :, rs, :] = seed0

                # dz=1 -> out[p]: add; out[0]'s first contribution is this
                # (+ its partial seed)
                upd1 = c[cout:2 * cout].reshape(cout, bh, 128)
                if k == 0:
                    @pl.when(i == 0)
                    def _():
                        seed1 = upd1
                        if has_accum:
                            seed1 = seed1 + abuf[0, :, rs, :] \
                                .astype(jnp.float32)
                        acc[0, :, rs, :] = seed1

                    @pl.when(i > 0)
                    def _():
                        acc[0, :, rs, :] = acc[0, :, rs, :] + upd1
                else:
                    acc[k, :, rs, :] = acc[k, :, rs, :] + upd1

                # dz=2 -> out[p-1] complete: epilogue straight to obuf
                def emit():
                    val = acc[(k - 1) % 4, :, rs, :] \
                        + c[2 * cout:3 * cout].reshape(cout, bh, 128)
                    obuf[o_prev, :, rs, :] = act(val).astype(obuf.dtype)
                if k == 0:
                    pl.when(i > 0)(emit)
                else:
                    emit()
                if k == 3:
                    # out[d-1] completes with this plane's dz=1
                    @pl.when(i == n_steps - 1)
                    def _():
                        val = acc[3, :, rs, :]
                        obuf[1, :, rs, :] = act(val).astype(obuf.dtype)

            for c_idx in range(n_chunks):
                chunk(c_idx)

            def start_out():
                out_dma(o_prev, z_prev).start()
            if k == 0:
                pl.when(i > 0)(start_out)
            else:
                start_out()
            if k == 3:
                @pl.when(i == n_steps - 1)
                def _():
                    out_dma(1, d - 1).start()

            @pl.when(p + 4 <= d - 1)
            def _():
                in_dma(k, p + 4).start()
            if has_accum:
                @pl.when(p + 5 <= d - 1)
                def _():
                    adma((k + 1) % 4, p + 5).start()
                if k == 0 and d > 4:
                    @pl.when(i == 0)
                    def _():
                        adma(0, 4).start()

        substep()

    @pl.when(i == n_steps - 1)
    def _():
        out_dma(0, d - 2).wait()
        out_dma(1, d - 1).wait()


@functools.partial(jax.jit,
                   static_argnames=("interpret", "activation", "n_streams"))
def conv3d_cf_flat(x, w, bias=None, activation: str | None = None,
                   interpret: bool = False, n_streams: int = 2, post=None,
                   accum=None):
    """SAME 3-cubed conv, channels-first, on FLAT folded planes — the
    arbitrary-width sibling of conv3d_cf_planes (64/32-cubed U-Net levels
    AND the pad-to-32 clinical sizes 96/160/192/224...).  Same contract;
    requires (H·W) % 1024 == 0, 8 <= W <= 1023, and D % 4 == 0
    (_flat_layout gates).  ``x`` may be a list of (C_i, D, H, W) sources
    conceptually concatenated along C (multi-source DMA at channel offsets,
    the concat never in HBM).  ``accum``: optional (C_out, D, H, W)
    partial-conv output added in-kernel (channel-group chaining, see
    conv3d_cf_flat_grouped)."""
    sources = list(x) if isinstance(x, (list, tuple)) else [x]
    src_cins = tuple(s.shape[0] for s in sources)
    cin = sum(src_cins)
    d, h, wdim = sources[0].shape[1:]
    cout = w.shape[-1]
    assert w.shape[:3] == (3, 3, 3) and w.shape[3] == cin
    has_accum = accum is not None
    layout = _flat_layout(cin, cout, d, h, wdim, with_accum=has_accum)
    assert layout is not None, \
        f"shape ({cin},{d},{h},{wdim})->{cout} does not fit the flat kernel"
    hq, bh, _ = layout

    wt = jnp.transpose(w.reshape(3, 9 * cin, cout), (0, 2, 1)) \
        .reshape(3 * cout, 9 * cin)
    nst = max(1, min(n_streams, cin, cout))
    has_bias = bias is not None
    if has_bias:
        # center-tap bias (see conv3d_cf_planes: every out[z]'s dz=1 source
        # exists, so the dz=1 ones-row adds bias exactly once everywhere)
        b = jnp.asarray(bias).reshape(-1, 1)
        bcol = jnp.concatenate([jnp.zeros_like(b), b, jnp.zeros_like(b)])
        wt = jnp.concatenate([wt, bcol.astype(wt.dtype)], axis=1)
    krows = _pad8(9 * cin + 1)
    wt = jnp.pad(wt, ((0, 0), (0, krows - wt.shape[1])))

    dt = sources[0].dtype
    flat_srcs = [s.reshape(s.shape[0], d, hq, 128) for s in sources]
    n_in_copies = sum(min(nst, c) for c in src_cins)
    has_post = post is not None
    extra_ops, extra_specs = [], []
    if has_accum:
        extra_ops.append(accum.reshape(cout, d, hq, 128))
        extra_specs.append(pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM))
    if has_post:
        postf = jnp.asarray(post, jnp.float32)
        extra_ops += [postf[0].reshape(cout, 1, 1),
                      postf[1].reshape(cout, 1, 1)]
        extra_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
    scratch = [
        pltpu.VMEM((4, cin, hq + 16, 128), dt),
        pltpu.VMEM((krows, bh * 128), dt),
        pltpu.VMEM((4, cout, hq, 128), jnp.float32),
        pltpu.VMEM((2, cout, hq, 128), dt),
        pltpu.VMEM((2, hq, 128), dt),
    ]
    if has_accum:
        scratch.append(pltpu.VMEM((4, cout, hq, 128), dt))
    scratch.append(pltpu.SemaphoreType.DMA((4, n_in_copies)))
    scratch.append(pltpu.SemaphoreType.DMA((2, max(1, min(nst, cout)))))
    if has_accum:
        scratch.append(pltpu.SemaphoreType.DMA((4,)))
    out = pl.pallas_call(
        functools.partial(_flat_kernel, cin=cin, cout=cout, d=d, hq=hq,
                          bh=bh, w=wdim, has_bias=has_bias,
                          activation=activation, n_streams=nst,
                          n_steps=d // 4, src_cins=src_cins,
                          has_post=has_post, has_accum=has_accum),
        grid=(d // 4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
                  for _ in sources] + [pl.BlockSpec(memory_space=pltpu.VMEM)]
                 + extra_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((cout, d, hq, 128), dt),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*(flat_srcs + [wt.astype(dt)] + extra_ops))
    return out.reshape(cout, d, h, wdim)


def split_flat_group_for(cin, cout, d, h, w):
    """Largest even channel-group size whose FLAT-kernel layout qualifies
    (None if none does) — the folded-plane twin of split_group_for, for the
    big-cin decoder convs at non-128-multiple widths (160/192/224-cubed)."""
    for g in (48, 40, 32, 24, 16, 8):
        if cin % g == 0 and _flat_layout(g, cout, d, h, w,
                                         with_accum=True) is not None:
            return g
    return None


def conv3d_cf_flat_grouped(x, w, bias=None, activation: str | None = None,
                           interpret: bool = False, post=None):
    """Big-cin SAME 3-cubed conv on folded planes as chained channel-group
    partial convs — the flat-kernel twin of conv3d_cf_grouped: conv
    linearity splits cin into equal groups sharing compiled-once
    executables, the running partial sum chains through each kernel's
    ``accum`` ring (never an XLA add), bias/activation/post fuse into the
    LAST group's epilogue.  Same bf16 partial-roundtrip precision bound as
    conv3d_cf_grouped (documented there)."""
    sources = list(x) if isinstance(x, (list, tuple)) else [x]
    d, h, wdim = sources[0].shape[1:]
    cout = w.shape[-1]
    total = sum(s.shape[0] for s in sources)
    if _flat_layout(total, cout, d, h, wdim) is not None:
        return conv3d_cf_flat(sources if len(sources) > 1 else sources[0],
                              w, bias=bias, activation=activation,
                              post=post, interpret=interpret)
    pieces = []  # (src_slice, w_slice)
    off = 0
    for src in sources:
        cin = src.shape[0]
        g = cin if _flat_layout(cin, cout, d, h, wdim,
                                with_accum=True) is not None \
            else split_flat_group_for(cin, cout, d, h, wdim)
        assert g is not None and cin % g == 0, \
            f"no qualifying flat group size for cin={cin} at {src.shape}"
        for st in range(0, cin, g):
            pieces.append((src[st:st + g] if (st, g) != (0, cin) else src,
                           w[:, :, :, off + st:off + st + g, :]))
        off += cin
    assert off == w.shape[3]
    y = None
    for idx, (xs, ws) in enumerate(pieces):
        last = idx == len(pieces) - 1
        y = conv3d_cf_flat(xs, ws.astype(xs.dtype),
                           bias=bias if last else None,
                           activation=activation if last else None,
                           post=post if last else None,
                           accum=y, interpret=interpret)
    return y


def _wgrad_flat_layout(cin, cout, d, h, w, dtype_bytes=2):
    """(hq, bh, vmem_bytes) for the folded-plane wgrad kernel, or None."""
    el = h * w
    # el % 1024: DMA slice rows must be 8-aligned (see _flat_layout)
    if el % 1024 != 0 or el < 1024 or d % 4 != 0 or not (8 <= w <= 1023):
        return None
    if cin * el > 24 * 256 * 256:
        return None
    hq = el // 128
    bh = 8
    krows = _pad8(9 * cin)
    need = (2 * cin * (hq + 16) * 128 * dtype_bytes   # x slab slots
            + 4 * cout * hq * 128 * dtype_bytes       # cotangent ring
            + krows * bh * 128 * dtype_bytes          # patches
            + 3 * cout * bh * 128 * dtype_bytes       # z-stacked rhs
            + 2 * hq * 128 * dtype_bytes              # wrap masks
            + krows * max(3 * cout, 128) * 4)         # out accumulator
    if need > 90 * 2 ** 20:
        return None
    return hq, bh, need


def _wgrad_flat_kernel(x_hbm, g_hbm, out, slab, gring, patches, dbuf, masks,
                       isem, gsem, *, cin, cout, d, hq, bh, w, krows,
                       n_streams, n_steps):
    """Folded-plane twin of _wgrad_kernel (see conv3d_cf_wgrad): the 9-tap
    patch matrix is built from masked flat-lane slices of a row-band value
    (the _flat_kernel tap scheme), the cotangent arrives host-padded and
    z-stacks into a (3·cout, bh·128) rhs, and one dot per chunk accumulates
    into the VMEM-resident (krows, 3·cout) f32 output block."""
    i = pl.program_id(0)
    bl = bh * 128
    rb = (w + 1 + 127) // 128  # border rows a ±(w+1) tap offset can reach

    class _group:
        def __init__(self, copies):
            self.copies = copies

        def start(self):
            for c in self.copies:
                c.start()

        def wait(self):
            for c in self.copies:
                c.wait()

    def _split(n, ns):
        q, r = divmod(n, ns)
        sizes = [q + (1 if j < r else 0) for j in range(ns)]
        starts = [sum(sizes[:j]) for j in range(ns)]
        return [(st, sz) for st, sz in zip(starts, sizes) if sz]

    nsx = max(1, min(n_streams, cin))
    nsg = max(1, min(n_streams, cout))

    def x_dma(slot, p):
        return _group([pltpu.make_async_copy(
            x_hbm.at[pl.ds(st, sz), p],
            slab.at[slot, pl.ds(st, sz), pl.ds(8, hq)],
            isem.at[slot, j]) for j, (st, sz) in enumerate(_split(cin, nsx))])

    def g_dma(slot, q):
        return _group([pltpu.make_async_copy(
            g_hbm.at[pl.ds(st, sz), q],
            gring.at[slot, pl.ds(st, sz)],
            gsem.at[slot, j]) for j, (st, sz) in enumerate(_split(cout, nsg))])

    @pl.when(i == 0)
    def _():
        for s in range(2):
            slab[s] = jnp.zeros(slab.shape[1:], slab.dtype)
        if krows > 9 * cin:
            patches[9 * cin:, :] = jnp.zeros(
                (krows - 9 * cin, bl), patches.dtype)
        out[...] = jnp.zeros(out.shape, out.dtype)
        row = jax.lax.broadcasted_iota(jnp.int32, (hq, 128), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (hq, 128), 1)
        wpos = jax.lax.rem(row * 128 + lane, w)
        masks[0] = (wpos != 0).astype(masks.dtype)
        masks[1] = (wpos != (w - 1)).astype(masks.dtype)
        x_dma(0, 0).start()
        x_dma(1, 1).start()
        for q in range(3):
            g_dma(q % 4, q).start()

    n_chunks = hq // bh

    for k in range(4):
        s = k % 2

        def substep(k=k, s=s):
            p = 4 * i + k
            x_dma(s, 0).wait()           # x plane p (reconstructed)
            g_dma((k + 2) % 4, 0).wait()  # gp plane p+2
            if k == 0:
                @pl.when(i == 0)
                def _():
                    g_dma(0, 0).wait()
                    g_dma(1, 0).wait()

            for c_idx in range(n_chunks):
                r0 = c_idx * bh
                v = slab[s, :, 8 - rb + r0:8 + r0 + bh + rb, :] \
                    .reshape(cin, (bh + 2 * rb) * 128)
                m0 = masks[0, pl.ds(r0, bh), :].reshape(1, bl)
                m1 = masks[1, pl.ds(r0, bh), :].reshape(1, bl)
                for dy in range(3):
                    for dx in range(3):
                        delta = (dy - 1) * w + (dx - 1)
                        u = v[:, rb * 128 + delta:rb * 128 + delta + bl]
                        if dx == 0:
                            u = u * m0
                        elif dx == 2:
                            u = u * m1
                        patches[(dy * 3 + dx) * cin:
                                (dy * 3 + dx + 1) * cin, :] = u
                rs = pl.ds(r0, bh)
                dbuf[0:cout, :] = gring[(k + 2) % 4, :, rs, :] \
                    .reshape(cout, bl)
                dbuf[cout:2 * cout, :] = gring[(k + 1) % 4, :, rs, :] \
                    .reshape(cout, bl)
                dbuf[2 * cout:, :] = gring[k % 4, :, rs, :] \
                    .reshape(cout, bl)
                c = jax.lax.dot_general(
                    patches[:], dbuf[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out[:, 0:3 * cout] = out[:, 0:3 * cout] + c

            @pl.when(p + 2 <= d - 1)
            def _():
                x_dma(s, p + 2).start()

            @pl.when(p + 3 <= d + 1)
            def _():
                g_dma((k + 3) % 4, p + 3).start()

        substep()


def _wgrad_flat_call(x, g, layout, interpret, n_streams):
    """Dispatch helper for conv3d_cf_wgrad's folded-plane variant."""
    ci, d, h, w = x.shape
    co = g.shape[0]
    hq, bh, _ = layout
    krows = _pad8(9 * ci)
    coq = max(3 * co, 128)
    nsx = max(1, min(n_streams, ci))
    nsg = max(1, min(n_streams, co))
    gp = jnp.pad(g.astype(x.dtype), ((0, 0), (1, 1), (0, 0), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_wgrad_flat_kernel, cin=ci, cout=co, d=d, hq=hq,
                          bh=bh, w=w, krows=krows, n_streams=n_streams,
                          n_steps=d // 4),
        grid=(d // 4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                  pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((krows, coq), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ci, hq + 16, 128), x.dtype),
            pltpu.VMEM((4, co, hq, 128), x.dtype),
            pltpu.VMEM((krows, bh * 128), x.dtype),
            pltpu.VMEM((3 * co, bh * 128), x.dtype),
            pltpu.VMEM((2, hq, 128), x.dtype),
            pltpu.SemaphoreType.DMA((2, nsx)),
            pltpu.SemaphoreType.DMA((4, nsg)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(ci, d, hq, 128), gp.reshape(co, d + 2, hq, 128))
    dw = out[:9 * ci, :3 * co].reshape(3, 3, ci, 3, co)
    return jnp.transpose(dw, (3, 0, 1, 2, 4))
