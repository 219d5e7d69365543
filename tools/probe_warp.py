"""Probe: the generation block's warp/gather costs (VERDICT round-3 item 4).

Measures, at the real tutorial-7 train-step shapes, the candidates for the
two biggest generation items (STATUS trace: NN deform gather ~15 ms, SVF
integration ~20 ms incl. the radius-4 last squaring step):

  1. last squaring step  v + warp(v, v)  at the half-res SVF shape:
     a. 8-corner gather (current over-cap fallback)
     b. packed-corner single gather (ops/interp.interpn_packed)
     c. exact stencil at radius 1/2/3/4 (current in-cap path)
  2. the fused-crop output warp (full label volume -> 128-cubed window):
     a. linear 8-corner gather vs packed-corner gather (image channels)
     b. nearest gather (labels; no packing applies — cost reference)

One-shot experiment tool; numbers go to STATUS.md + the integrate_vec /
labels_to_image dispatch decision.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from synthsr_tpu.ops import interp  # noqa: E402


def timeit(f, *args, n=30):
    """Value-readback timing: float(sum) is a TRUE sync — block_until_ready
    can return at dispatch-accept on the tunneled axon platform (it reported
    a physically impossible 2180 pairs/s in bench_generate.py's first
    version), so every probe sync must read a value back."""
    def chk(y):
        return jax.tree.reduce(lambda a, b: a + jnp.sum(b), y, 0.0)

    _ = float(chk(f(*args)))
    t0 = time.perf_counter()
    pending = []
    for _ in range(n):
        pending.append(chk(f(*args)))
        if len(pending) > 2:
            _ = float(pending.pop(0))
    for c in pending:
        _ = float(c)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    rng = np.random.default_rng(0)

    # --- 1. last squaring step at the half-res SVF shape -------------------
    half = (80, 108, 80)
    v = jnp.asarray(rng.normal(0, 0.8, (*half, 3)).astype(np.float32))
    print(f"--- squaring step at {half} (values ~N(0,0.8), radius-4 bound)",
          flush=True)

    gather = jax.jit(lambda v: v + interp.transform(v, v, "linear"))
    print(f"gather:        {timeit(gather, v):7.2f} ms", flush=True)

    def packed(v):
        mesh = interp.ndgrid(half)
        loc = jnp.stack([mesh[d] + v[..., d] for d in range(3)], -1)
        return v + interp.interpn_packed(v, loc)

    packed_j = jax.jit(packed)
    print(f"packed:        {timeit(packed_j, v):7.2f} ms", flush=True)
    err = np.max(np.abs(np.asarray(gather(v)) - np.asarray(packed_j(v))))
    print(f"max |gather-packed| = {err:.3e}", flush=True)

    for r in (1, 2, 3, 4):
        st = jax.jit(lambda v, r=r: v + interp.stencil_warp(v, v, r))
        print(f"stencil r={r}:   {timeit(st, v):7.2f} ms", flush=True)

    # --- 2. fused-crop output warp: full volume -> 128-cubed window --------
    full = (160, 217, 160)
    out_sp = (128, 128, 128)
    vol = jnp.asarray(rng.normal(size=(*full, 1)).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(0, 150, size=(*out_sp, 3)).astype(np.float32))
    print(f"--- crop warp {full} -> {out_sp}", flush=True)

    lin = jax.jit(lambda vol, loc: interp.interpn(vol, loc, "linear"))
    print(f"linear gather: {timeit(lin, vol, loc):7.2f} ms", flush=True)
    pk = jax.jit(interp.interpn_packed)
    print(f"linear packed: {timeit(pk, vol, loc):7.2f} ms", flush=True)
    err = np.max(np.abs(np.asarray(lin(vol, loc)) - np.asarray(pk(vol, loc))))
    print(f"max |gather-packed| = {err:.3e}", flush=True)

    voli = jnp.asarray(
        rng.integers(0, 30, size=(*full, 1)).astype(np.float32))
    nn = jax.jit(lambda vol, loc: interp.interpn(vol, loc, "nearest"))
    print(f"nearest gather:{timeit(nn, voli, loc):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
