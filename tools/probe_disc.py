"""Standalone D-side decomposition for the adversarial disc_step.

disc_step at 128-cubed batch 1 measures ~215 ms (bf16, fast G path) of which
generation is ~48 ms and the fast G fake forward ~37 ms — leaving ~130 ms on
the critic side: three Discriminator3D forwards, the gradient-penalty input
gradient, and the outer parameter gradient THROUGH that input gradient
(second-order).  This probe times each piece as its own jitted executable to
locate the cost before deciding whether the critic needs a Pallas
channels-first kernel-family member (reference critic:
fine_tuning_with_adversary.py:482-508; GP :585-595).

Run: python tools/probe_disc.py [--f32]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from synthsr_tpu.models.discriminator import Discriminator3D
from synthsr_tpu.train.adversarial import gradient_penalty


def timeit(f, n=20, lag=2):
    """Value-readback timing (block_until_ready can return at dispatch-accept
    on the tunneled platform; float() of an output-derived scalar is a true
    sync)."""
    def chk(out):
        leaf = jax.tree.leaves(out)[0]
        return jnp.sum(jnp.asarray(leaf, jnp.float32))

    _ = float(chk(f()))
    pending = []
    t0 = time.perf_counter()
    for _ in range(n):
        pending.append(chk(f()))
        if len(pending) > lag:
            _ = float(pending.pop(0))
    for c in pending:
        _ = float(c)
    return (time.perf_counter() - t0) / n * 1000.0


def main():
    dt = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    shape = (1, 128, 128, 128, 1)
    disc = Discriminator3D(compute_dtype=dt)
    key = jax.random.PRNGKey(0)
    dp = dict(jax.jit(disc.init)(key, jnp.zeros(shape)))["params"]
    k1, k2, k3 = jax.random.split(key, 3)
    target = jax.random.normal(k1, shape, jnp.float32)
    fake = jax.random.normal(k2, shape, jnp.float32)

    def disc_apply(p, x, mask=None):
        return disc.apply({"params": p}, x, mask)

    @jax.jit
    def fwd(dp, x):
        return disc_apply(dp, x)

    @jax.jit
    def wgan_grad(dp, target, fake):
        def loss_fn(p):
            return jnp.mean(-disc_apply(p, target)) + \
                jnp.mean(disc_apply(p, fake))
        return jax.value_and_grad(loss_fn)(dp)

    @jax.jit
    def gp_input_grad(dp, x_hat):
        def d_sum(xh):
            return jnp.sum(disc_apply(dp, xh))
        return jax.grad(d_sum)(x_hat)

    @jax.jit
    def gp_grad(dp, x_hat):
        def loss_fn(p):
            return gradient_penalty(disc_apply, p, x_hat)
        return jax.value_and_grad(loss_fn)(dp)

    @jax.jit
    def full_grad(dp, k, target, fake):
        def loss_fn(p):
            w = jax.random.uniform(k, (1, 1, 1, 1, 1))
            x_hat = w * target + (1.0 - w) * fake
            return (jnp.mean(-disc_apply(p, target))
                    + jnp.mean(disc_apply(p, fake))
                    + gradient_penalty(disc_apply, p, x_hat))
        return jax.value_and_grad(loss_fn)(dp)

    x_hat = 0.5 * target + 0.5 * fake
    print(f"dtype={dt.__name__} shape={shape}", flush=True)
    print(f"D forward           : {timeit(lambda: fwd(dp, target)):8.2f} ms",
          flush=True)
    print(f"WGAN d(loss)/d(p)   : "
          f"{timeit(lambda: wgan_grad(dp, target, fake)):8.2f} ms", flush=True)
    print(f"GP input grad only  : "
          f"{timeit(lambda: gp_input_grad(dp, x_hat)):8.2f} ms", flush=True)
    print(f"GP d(loss)/d(p)     : "
          f"{timeit(lambda: gp_grad(dp, x_hat)):8.2f} ms", flush=True)
    print(f"full d(loss)/d(p)   : "
          f"{timeit(lambda: full_grad(dp, k3, target, fake)):8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
