"""Decomposition of the FAST critic paths (round 5): what disc_step's
critic side actually runs after models/discriminator_cf.py — Pallas
channels-first stride-1 convs with fused LeakyReLU for the WGAN terms, and
the unrolled first-order gradient-penalty program.

Profiled context (tools/profile_adv.py, 128³ bf16 batch 1): disc_step
179.6 ms = generation 47.8 + fast G fake fwd 26.6 + critic side ~105.  This
probe splits the ~105 ms into: fast forward, WGAN batched d/dp, the unrolled
GP input-gradient program, its outer d/dp, and the combined critic term —
next to the r4 XLA/s2d numbers in tools/probe_disc.py.

Run: PYTHONPATH=/root/repo python tools/probe_disc_fast.py [--f32]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from synthsr_tpu.models.discriminator import Discriminator3D
from synthsr_tpu.models.discriminator_cf import (make_fast_disc_apply,
                                                 make_fast_disc_input_grad)
from synthsr_tpu.train.adversarial import gradient_penalty_from_grads


def timeit_injit(body, ops, n=8, reps=3):
    """In-jit fori_loop timing (see tools/probe_disc.py: host-loop probes
    through the tunnel carry a +33 ms readback floor per iteration)."""

    @jax.jit
    def run(acc0, ops):
        def it(_, acc):
            return acc + body(acc * 1e-30, ops)
        return jax.lax.fori_loop(0, n, it, acc0)

    _ = float(run(jnp.float32(0.0), ops))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(jnp.float32(0.0), ops))
        best = min(best, (time.perf_counter() - t0 - 0.033) / n * 1000.0)
    return best


def main():
    dt = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    shape = (1, 128, 128, 128, 1)
    disc = Discriminator3D(compute_dtype=dt)
    key = jax.random.PRNGKey(0)
    dp = dict(jax.jit(disc.init)(key, jnp.zeros(shape)))["params"]
    k1, k2, k3 = jax.random.split(key, 3)
    target = jax.random.normal(k1, shape, jnp.float32)
    fake = jax.random.normal(k2, shape, jnp.float32)
    x_hat = 0.5 * target + 0.5 * fake
    ops = (dp, target, fake, x_hat)

    fast_apply = make_fast_disc_apply(disc)
    fast_ig = make_fast_disc_input_grad(disc)

    def tree_sum(t):
        return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                   for l in jax.tree.leaves(t))

    def fwd1_body(eps, ops):
        dp, target, fake, x_hat = ops
        return jnp.sum(fast_apply(dp, target + eps))

    def fwd2_body(eps, ops):
        dp, target, fake, x_hat = ops
        return jnp.sum(fast_apply(dp, jnp.concatenate([target, fake]) + eps))

    def wgan_body(eps, ops):
        dp, target, fake, x_hat = ops
        b = target.shape[0]

        def loss_fn(p):
            d = fast_apply(p, jnp.concatenate([target, fake]) + eps)
            return jnp.mean(-d[:b]) + jnp.mean(d[b:])
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    def ig_body(eps, ops):
        dp, target, fake, x_hat = ops
        return jnp.sum(fast_ig(dp, x_hat + eps))

    def gp_body(eps, ops):
        dp, target, fake, x_hat = ops

        def loss_fn(p):
            return gradient_penalty_from_grads(fast_ig(p, x_hat + eps))
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    def full_body(eps, ops):
        """The exact critic-side term of disc_step's loss_fn."""
        dp, target, fake, x_hat = ops
        b = target.shape[0]

        def loss_fn(p):
            w = jax.random.uniform(k3, (1, 1, 1, 1, 1))
            xh = w * target + (1.0 - w) * fake
            d = fast_apply(p, jnp.concatenate([target, fake]) + eps)
            return (jnp.mean(-d[:b]) + jnp.mean(d[b:])
                    + gradient_penalty_from_grads(fast_ig(p, xh + eps)))
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    print(f"dtype={dt.__name__} FAST paths shape={shape} "
          f"(in-jit loop, per-rep ms)", flush=True)
    base = [("fast fwd (batch 1)", fwd1_body),
            ("fast fwd (batch 2)", fwd2_body),
            ("fast WGAN d/d(p)", wgan_body),
            ("fast GP input grad", ig_body),
            ("fast GP d/d(p)", gp_body),
            ("fast full critic", full_body)]
    if "--hybrids-only" not in sys.argv:
        for label, body in base:
            print(f"{label:20s}: {timeit_injit(body, ops):8.2f} ms",
                  flush=True)

    # same-harness XLA channels-last strided baseline for the WGAN term
    def xla_wgan_body(eps, ops):
        dp, target, fake, x_hat = ops
        b = target.shape[0]

        def loss_fn(p):
            d = disc.apply({"params": p},
                           jnp.concatenate([target, fake]) + eps)
            return jnp.mean(-d[:b]) + jnp.mean(d[b:])
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    print(f"XLA-CL WGAN d/dp    : {timeit_injit(xla_wgan_body, ops):8.2f} ms",
          flush=True)

    # CL-interior unrolled GP program (pallas_levels=0.5 input grad)
    ig_cl = make_fast_disc_input_grad(disc, pallas_levels=0.5)

    def gp_cl_body(eps, ops):
        dp, target, fake, x_hat = ops

        def loss_fn(p):
            return gradient_penalty_from_grads(ig_cl(p, x_hat + eps))
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    print(f"GP(pl=0.5) d/d(p)   : {timeit_injit(gp_cl_body, ops):8.2f} ms",
          flush=True)

    # hybrid A/B: Pallas CF for the leading level(s), batched
    # channels-last XLA for the deep levels
    for pl in (0.5, 1.5):
        hyb = make_fast_disc_apply(disc, input_grad_needed=False,
                                   pallas_levels=pl)

        def hyb_wgan_body(eps, ops, hyb=hyb):
            dp, target, fake, x_hat = ops
            b = target.shape[0]

            def loss_fn(p):
                d = hyb(p, jnp.concatenate([target, fake]) + eps)
                return jnp.mean(-d[:b]) + jnp.mean(d[b:])
            l, g = jax.value_and_grad(loss_fn)(dp)
            return l + tree_sum(g) * 1e-12

        print(f"hyb(pl={pl}) WGAN d/dp: "
              f"{timeit_injit(hyb_wgan_body, ops):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
