"""In-graph (traced) hyperparameter sampling — the device twin of
``utils.draw_value_from_distribution`` (reference utils.py:961-1049).

All functions take explicit ``jax.random`` keys and return traced arrays, so
the whole generative pipeline is a deterministic function of one key (this is
what makes golden-value tests possible, SURVEY.md §4)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.misc import load_array_if_path

_NUMERIC = (int, float, np.integer, np.floating)


def normalize_hyperparameter(hyperparameter, size=1, centre=0.0, default_range=10.0):
    """Resolve the polymorphic hyperparameter spec to a (2n, m) numpy array or
    None (when the spec is False). Mirrors reference utils.py:1003-1020."""
    if hyperparameter is False:
        return None
    hyperparameter = load_array_if_path(hyperparameter, load_as_numpy=True)
    if isinstance(hyperparameter, np.ndarray):
        assert hyperparameter.shape[0] % 2 == 0, \
            "hyperparameter rows must be divisible by 2"
        return np.asarray(hyperparameter, np.float32)
    if hyperparameter is None:
        return np.array([[centre - default_range] * size,
                         [centre + default_range] * size], np.float32)
    if isinstance(hyperparameter, _NUMERIC):
        return np.array([[centre - hyperparameter] * size,
                         [centre + hyperparameter] * size], np.float32)
    if isinstance(hyperparameter, (list, tuple)):
        assert len(hyperparameter) == 2, "if list, hyperparameter must have length 2"
        return np.tile(np.asarray(hyperparameter, np.float32)[:, None], (1, size))
    raise ValueError("hyperparameter should be False/None/number/sequence/array")


def draw_traced(key, hyperparameter, size=1, distribution="uniform", centre=0.0,
                default_range=10.0, positive_only=False):
    """Traced draw following the reference semantics; returns (m,) array or
    None. When the spec has 2n rows, a random 2-row modality block is picked."""
    hp = normalize_hyperparameter(hyperparameter, size, centre, default_range)
    if hp is None:
        return None
    k_block, k_draw = jax.random.split(key)
    n_mod = hp.shape[0] // 2
    if n_mod > 1:
        idx = jax.random.randint(k_block, (), 0, n_mod)
        blocks = jnp.asarray(hp).reshape(n_mod, 2, hp.shape[1])
        block = blocks[idx]
    else:
        block = jnp.asarray(hp)
    if distribution == "uniform":
        value = jax.random.uniform(k_draw, (hp.shape[1],), minval=block[0],
                                   maxval=block[1])
    elif distribution == "normal":
        value = block[0] + block[1] * jax.random.normal(k_draw, (hp.shape[1],))
    else:
        raise ValueError("distribution should be 'uniform' or 'normal'")
    if positive_only:
        value = jnp.maximum(value, 0.0)
    return value


def bernoulli(key, prob):
    """Scalar coin with the reference's tf.less(uniform, prob) convention."""
    return jax.random.uniform(key, ()) < prob
