"""Probe: flat wgrad kernel vs plane-streaming wgrad kernel at 128-multiple
widths (the dispatch prefers the plane kernel there; flat was only ever used
where planes is ineligible).  Companion to probe_flat_128_256.py."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from synthsr_tpu.ops import conv_pallas as cp  # noqa: E402


def timeit(f, *args, n=30):
    y = f(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    ys = [f(*args) for _ in range(n)]
    jax.block_until_ready(ys)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    rng = np.random.default_rng(0)
    for cin, cout, s in [(24, 24, 128), (24, 48, 128), (4, 24, 128),
                         (48, 48, 128)]:
        x = jnp.asarray(rng.standard_normal((cin, s, s, s)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((cout, s, s, s)), jnp.bfloat16)
        print(f"--- wgrad ({cin},{s}^3) x {cout}", flush=True)
        planes = jax.jit(lambda x, g: cp.conv3d_cf_wgrad(x, g))
        t_p = timeit(planes, x, g)
        print(f"planes: {t_p:8.2f} ms", flush=True)
        fl = cp._wgrad_flat_layout(cin, cout, s, s, s)
        if fl is None:
            print("flat:   ineligible", flush=True)
            continue
        flat = jax.jit(lambda x, g: cp._wgrad_flat_call(x, g, fl, False, 3))
        t_f = timeit(flat, x, g)
        print(f"flat:   {t_f:8.2f} ms   ({t_p / t_f:.2f}x)", flush=True)
        err = np.max(np.abs(np.asarray(planes(x, g)) - np.asarray(flat(x, g))))
        print(f"max |planes-flat| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
