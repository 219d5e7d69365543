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

Mosaic constraints baked in (each cost a compile attempt): values can't be
dynamically sliced (slice refs via pl.ds), dynamic sublane starts must be
8-aligned (hence the +8 H padding and static dy shifts), flattens/implicit
reshapes need 128-aligned lane dims (hence the W % 128 gate on the wide-dot
path), DMA memref slices need 128-aligned minor dims (hence W padded to a
128 multiple).

Used by models/unet_cf.py for the fast channels-first inference forward; the
predict bench runs through it.  Correctness: interpret-mode oracle vs
jax.lax.conv (tests/test_ops_core.py) + TPU-vs-XLA bf16 check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


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


def _kernel(x_hbm, w_ref, out_hbm, slab, patches, acc, obuf, isem, osem, *,
            cin, cout, wp, td, th, w_out, n_db, n_hb, has_bias, activation):
    # The grid is over PAIRS of output blocks so both double-buffer slots are
    # indexed STATICALLY (a traced slot index turns every slab access into a
    # whole-buffer dynamic-slice copy — measured 10x slower).
    i = pl.program_id(0)
    nsteps = n_db * n_hb

    def indices(flat):
        return flat // n_hb, jax.lax.rem(flat, n_hb)

    def in_dma(slot, flat):
        db, hb = indices(flat)
        h0 = pl.multiple_of(hb * th, 8)
        return pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(db * td, td + 2), pl.ds(h0, th + 8)],
            slab.at[slot], isem.at[slot])

    def out_dma(slot, flat):
        db, hb = indices(flat)
        h0 = pl.multiple_of(hb * th, 8)
        return pltpu.make_async_copy(
            obuf.at[slot],
            out_hbm.at[:, pl.ds(db * td, td), pl.ds(h0, th)], osem.at[slot])

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
            for tap in range(9):
                dy, dx = divmod(tap, 3)
                u = slab[slot, :, p, :, dx:dx + w_out]
                patches[tap * cin:(tap + 1) * cin, :, :] = \
                    u[:, dy:dy + th, :]
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
                        val = jnp.where(val > 0, val, jnp.expm1(val))
                    elif activation == "relu":
                        val = jnp.maximum(val, 0.0)
                    obuf[slot, :, z, :, :] = val.astype(obuf.dtype)

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


@functools.partial(jax.jit,
                   static_argnames=("block_d", "block_h", "interpret",
                                    "activation"))
def conv3d_cf(x, w, bias=None, activation: str | None = None,
              block_d: int | None = None, block_h: int | None = None,
              interpret: bool = False):
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
    wp = ((wdim + 2 + 127) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 7), (1, wp - wdim - 1)))
    # (3*cout, 9*cin [+1]): z-stacked weight slabs, row dz*cout + co,
    # column (dy*3+dx)*cin + ci; optional last column = bias/3
    wt = jnp.transpose(w.reshape(3, 9 * cin, cout), (0, 2, 1)) \
        .reshape(3 * cout, 9 * cin)
    has_bias = bias is not None
    if has_bias:
        bcol = jnp.tile(jnp.asarray(bias).reshape(-1, 1) / 3.0, (3, 1))
        wt = jnp.concatenate([wt, bcol.astype(wt.dtype)], axis=1)
    krows = 9 * cin + (1 if has_bias else 0)

    n_db, n_hb = d // td, h // th
    out = pl.pallas_call(
        functools.partial(_kernel, cin=cin, cout=cout, wp=wp, td=td, th=th,
                          w_out=wdim, n_db=n_db, n_hb=n_hb,
                          has_bias=has_bias, activation=activation),
        grid=((n_db * n_hb + 1) // 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # stay in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # z-stacked weights
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        out_shape=jax.ShapeDtypeStruct((cout, d, h, wdim), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, cin, td + 2, th + 8, wp), x.dtype),
            pltpu.VMEM((krows, th, wdim), x.dtype),
            pltpu.VMEM((3, cout, th, wdim), jnp.float32),
            pltpu.VMEM((2, cout, td, th, wdim), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wt.astype(x.dtype))
    return out
