"""Standalone D-side decomposition for the adversarial disc_step.

disc_step at 128-cubed batch 1 measures ~215 ms (bf16, fast G path) of which
generation is ~48 ms and the fast G fake forward ~37 ms — leaving ~130 ms on
the critic side: three Discriminator3D forwards, the gradient-penalty input
gradient, and the outer parameter gradient THROUGH that input gradient
(second-order).  This probe times each piece as its own jitted executable to
locate the cost, and A/Bs the space-to-depth stride-2 decomposition against
the plain strided conv (reference critic:
fine_tuning_with_adversary.py:482-508; GP :585-595).

Run: python tools/probe_disc.py [--f32] [--strided]
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from synthsr_tpu.models.discriminator import Discriminator3D
from synthsr_tpu.train.adversarial import gradient_penalty


def timeit_injit(body, ops, n=8, reps=3):
    """Device time per rep via an IN-JIT fori_loop: per-host-iteration
    readbacks pay the ~33 ms tunnel round trip no matter how deep the
    dispatch pipeline, so host-loop timings have a +33 ms floor.  Here the
    whole K-rep loop is ONE executable and ONE readback.

    ``body(eps, ops) -> scalar`` must run the computation under test with
    every input perturbed by the traced f32 scalar ``eps`` (prevents XLA
    hoisting the loop-invariant computation out of the while loop) and
    reduce its outputs into the returned scalar (prevents DCE).  ``eps`` is
    0 at runtime times a carry-derived factor, so values are unchanged.
    ``ops`` is passed as a jit ARGUMENT — closing over the arrays would
    bake them into the serialized HLO as constants and blow the tunnel's
    request-size limit (HTTP 413)."""

    @jax.jit
    def run(acc0, ops):
        def it(_, acc):
            # eps = acc * 1e-30: a real data dependency XLA can neither
            # constant-fold (unknown acc) nor hoist; numerically below f32
            # ulp of the inputs it perturbs
            return acc + body(acc * 1e-30, ops)
        return jax.lax.fori_loop(0, n, it, acc0)

    _ = float(run(jnp.float32(0.0), ops))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(jnp.float32(0.0), ops))
        best = min(best, (time.perf_counter() - t0 - 0.033) / n * 1000.0)
    return best


def main():
    dt = jnp.float32 if "--f32" in sys.argv else jnp.bfloat16
    impl = "strided" if "--strided" in sys.argv else "s2d"
    shape = (1, 128, 128, 128, 1)
    disc = Discriminator3D(compute_dtype=dt, stride2_impl=impl)
    key = jax.random.PRNGKey(0)
    dp = dict(jax.jit(disc.init)(key, jnp.zeros(shape)))["params"]
    k1, k2, k3 = jax.random.split(key, 3)
    target = jax.random.normal(k1, shape, jnp.float32)
    fake = jax.random.normal(k2, shape, jnp.float32)
    x_hat = 0.5 * target + 0.5 * fake
    ops = (dp, target, fake, x_hat)

    def disc_apply(p, x, mask=None):
        return disc.apply({"params": p}, x, mask)

    def tree_sum(t):
        return sum(jnp.sum(jnp.asarray(l, jnp.float32))
                   for l in jax.tree.leaves(t))

    def fwd_body(eps, ops):
        dp, target, fake, x_hat = ops
        return jnp.sum(disc_apply(dp, target + eps))

    def wgan_body(eps, ops):
        dp, target, fake, x_hat = ops

        def loss_fn(p):
            return jnp.mean(-disc_apply(p, target + eps)) + \
                jnp.mean(disc_apply(p, fake + eps))
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    def gp_input_body(eps, ops):
        dp, target, fake, x_hat = ops

        def d_sum(xh):
            return jnp.sum(disc_apply(dp, xh))
        return jnp.sum(jax.grad(d_sum)(x_hat + eps))

    def gp_body(eps, ops):
        dp, target, fake, x_hat = ops

        def loss_fn(p):
            return gradient_penalty(disc_apply, p, x_hat + eps)
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    def full_body(eps, ops):
        dp, target, fake, x_hat = ops

        def loss_fn(p):
            w = jax.random.uniform(k3, (1, 1, 1, 1, 1))
            xh = w * target + (1.0 - w) * fake
            return (jnp.mean(-disc_apply(p, target + eps))
                    + jnp.mean(disc_apply(p, fake + eps))
                    + gradient_penalty(disc_apply, p, xh + eps))
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    # the production configuration (train/adversarial.py): strided critic
    # for the first-order WGAN terms + an s2d clone (same params) for the
    # second-order gradient-penalty term
    disc_gp = disc.clone(stride2_impl="s2d")

    def disc_apply_gp(p, x, mask=None):
        return disc_gp.apply({"params": p}, x, mask)

    def full_hybrid_body(eps, ops):
        dp, target, fake, x_hat = ops

        def loss_fn(p):
            w = jax.random.uniform(k3, (1, 1, 1, 1, 1))
            xh = w * target + (1.0 - w) * fake
            return (jnp.mean(-disc_apply(p, target + eps))
                    + jnp.mean(disc_apply(p, fake + eps))
                    + gradient_penalty(disc_apply_gp, p, xh + eps))
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    def wgan_batched_body(eps, ops):
        """d_real and d_fake as ONE batch-2 critic application."""
        dp, target, fake, x_hat = ops
        b = target.shape[0]

        def loss_fn(p):
            d = disc_apply(p, jnp.concatenate([target, fake]) + eps)
            return jnp.mean(-d[:b]) + jnp.mean(d[b:])
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    def full_hybrid_batched_body(eps, ops):
        dp, target, fake, x_hat = ops
        b = target.shape[0]

        def loss_fn(p):
            w = jax.random.uniform(k3, (1, 1, 1, 1, 1))
            xh = w * target + (1.0 - w) * fake
            d = disc_apply(p, jnp.concatenate([target, fake]) + eps)
            return (jnp.mean(-d[:b]) + jnp.mean(d[b:])
                    + gradient_penalty(disc_apply_gp, p, xh + eps))
        l, g = jax.value_and_grad(loss_fn)(dp)
        return l + tree_sum(g) * 1e-12

    print(f"dtype={dt.__name__} impl={impl} shape={shape} "
          f"(in-jit loop, per-rep ms)", flush=True)
    for label, body in [("D forward", fwd_body), ("WGAN d(loss)/d(p)", wgan_body),
                        ("GP input grad only", gp_input_body),
                        ("GP d(loss)/d(p)", gp_body),
                        ("full d(loss)/d(p)", full_body),
                        ("full hybrid (GP=s2d)", full_hybrid_body),
                        ("WGAN batched d/d(p)", wgan_batched_body),
                        ("full hyb+batched", full_hybrid_batched_body)]:
        print(f"{label:20s}: {timeit_injit(body, ops):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
