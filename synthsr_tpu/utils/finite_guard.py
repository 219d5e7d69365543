"""Per-step non-finite loss detection for the training loops.

Analogue of the reference's per-batch ``K.check_numerics`` wrapping
(``SynthSR/metrics_model.py:228``): a NaN/Inf loss must kill the run at (or
within a couple of steps of) the step that produced it — an epoch-mean check
finds it 999 steps too late, after the optimizer has long since written the
damage into the parameters.

Two cooperating pieces:

- ``guard_updates`` (used inside the jitted step): gates the param /
  batch-stats / optimizer-state writes on ``isfinite(loss)`` ON DEVICE, so a
  non-finite step never corrupts the state — whatever the host abort latency,
  the last-finite parameters stay salvageable.
- ``FiniteGuard`` (host side): checks each step's loss ``lag`` steps behind
  dispatch.  Syncing the CURRENT step's loss would serialize host dispatch
  with device compute; a loss from ``lag`` steps ago is already materialized,
  so the check is free and the abort lands within ``lag`` steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def guard_updates(finite, new_tree, old_tree):
    """Return new_tree where ``finite`` (a traced scalar bool), else old_tree,
    leaf-wise — the on-device write gate of the non-finite protection."""
    return jax.tree.map(lambda n, o: jnp.where(finite, n, o.astype(n.dtype)),
                        new_tree, old_tree)


class FiniteGuard:
    """Lagged per-step host check: ``push`` every step's (label, device loss);
    the value from ``lag`` pushes ago is synced and verified.  ``flush()`` at
    epoch end drains the tail.  Raises ``FloatingPointError`` naming the step
    that produced the first non-finite value."""

    def __init__(self, lag: int = 2, what: str = "loss"):
        self.lag = max(0, int(lag))
        self.what = what
        self._pending: list[tuple[object, object]] = []

    def _check(self, label, value) -> float:
        v = float(value)
        if not np.isfinite(v):
            raise FloatingPointError(
                f"Non-finite {self.what} at {label}: {v} "
                "(parameters were not updated by this step)")
        return v

    def push(self, label, value) -> None:
        self._pending.append((label, value))
        if len(self._pending) > self.lag:
            self._check(*self._pending.pop(0))

    def flush(self) -> None:
        pending, self._pending = self._pending, []
        for label, value in pending:
            self._check(label, value)
