"""Hyperfine (T1+T2 residual SR) predict benchmark: volumes/min/chip at 256³.

BASELINE.json config #2: the Hyperfine dual-channel model
(scripts/predict_command_line_hyperfine.py:124-131) runs ONE 2-channel
24-feature 5-level U-Net forward (no TTA) plus the residual reconstruction
``minimum + spread * (residual + t1)`` and the non-negativity clamp.  This
times that device pipeline steady-state at 256³ through the channels-first
Pallas fast path (the 2-channel first conv qualifies for the
output-stationary kernel, ops/conv_pallas.py).

Baseline: estimated 30 volumes/min TF-2.0-on-A100 — the single-forward
Hyperfine pipeline is ~2x the all-purpose model's throughput (which runs
two TTA forwards; see bench.py's 15 vol/min estimate for that config).
"""

import json
import time

import numpy as np

TF_A100_BASELINE_VOL_PER_MIN = 30.0


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from synthsr_tpu.models.unet import synthsr_unet
    from synthsr_tpu.models.unet_cf import make_fast_predictor

    model = synthsr_unet(compute_dtype=jnp.bfloat16)
    variables = dict(jax.jit(model.init)(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 32, 32, 32, 2))))
    run = make_fast_predictor(model, variables, (1, 256, 256, 256, 2))

    # residual reconstruction (cli/predict_hyperfine.py:148-152 semantics,
    # on device)
    combine = jax.jit(lambda res, t1, minimum, spread: jnp.maximum(
        minimum + spread * (res[..., 0] + t1), 0.0))

    def predict(x, minimum, spread):
        res = run(x)
        return combine(res, x[..., 0], minimum, spread)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 2, (1, 256, 256, 256, 2)).astype(np.float32))
    minimum, spread = jnp.float32(3.0), jnp.float32(40.0)

    out = predict(x, minimum, spread)
    _ = float(jnp.sum(out))

    n, lag = 16, 2
    pending = []
    t0 = time.time()
    for _ in range(n):
        pending.append(predict(x, minimum, spread))
        if len(pending) > lag:
            _ = float(jnp.sum(pending.pop(0)))
    for out in pending:
        _ = float(jnp.sum(out))
    dt = time.time() - t0
    vol_per_min = 60.0 * n / dt

    print(json.dumps({
        "metric": "hyperfine_256cube_volumes_per_min_per_chip",
        "value": round(vol_per_min, 2),
        "unit": "volumes/min",
        "vs_baseline": round(vol_per_min / TF_A100_BASELINE_VOL_PER_MIN, 2),
        "baseline_note": "estimated 30 vol/min TF-2.0-on-A100 (reference "
                         "publishes no numbers; see module docstring)",
    }))


if __name__ == "__main__":
    main()
