"""Probe: folded-plane (flat) kernel vs plane-streaming (v6) kernel at the
128-multiple widths where the dispatch currently prefers v6 (unet_cf._conv_cf
tries _plane_layout first).  Flat beat v6/XLA at every measured narrow width
(STATUS round 3); this measures the head-to-head at the 256-cubed predict
shapes (the 128-cubed train shapes were measured in the round-3 probe run:
flat 1.03-1.19x planes at >=24ch).  One-shot experiment tool.
NOTE (round 4): tunnel micro-timings under-measure (see memory note); the
SYNTHSR_PREFER_FLAT end-to-end A/B on bench.py / bench_train.py is the
arbiter (tools/ab_flat.sh).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from synthsr_tpu.ops.conv_pallas import (  # noqa: E402
    _flat_layout, conv3d_cf_flat, conv3d_cf_planes)


def timeit(f, *args, n=20):
    # bounded pending queue (a 256-cubed output is ~0.8 GB — 30 live ones
    # OOM the chip); 2-deep lag still overlaps dispatch with compute
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    pending = []
    for _ in range(n):
        pending.append(f(*args))
        if len(pending) > 2:
            jax.block_until_ready(pending.pop(0))
    jax.block_until_ready(pending)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    rng = np.random.default_rng(0)
    shapes = [
        # predict 256-cubed level-0/decoder shapes (slow compile, ~5 min each)
        (24, 24, 256),
        (1, 24, 256),
    ]
    for cin, cout, s in shapes:
        x = jnp.asarray(rng.standard_normal((cin, s, s, s)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                        jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        fl = _flat_layout(cin, cout, s, s, s)
        print(f"--- ({cin}->{cout}) @ {s}^3  flat_layout={fl}", flush=True)
        planes = jax.jit(lambda x, w, b: conv3d_cf_planes(
            x, w, bias=b, activation="elu"))
        t_p = timeit(planes, x, w, b)
        print(f"planes: {t_p:8.2f} ms", flush=True)
        if fl is not None:
            flat = jax.jit(lambda x, w, b: conv3d_cf_flat(
                x, w, bias=b, activation="elu"))
            t_f = timeit(flat, x, w, b)
            print(f"flat:   {t_f:8.2f} ms   ({t_p / t_f:.2f}x)", flush=True)
            # exactness spot check at bf16 tolerance
            yp = np.asarray(planes(x, w, b), np.float32)
            yf = np.asarray(flat(x, w, b), np.float32)
            err = np.max(np.abs(yp - yf))
            print(f"max |planes-flat| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
