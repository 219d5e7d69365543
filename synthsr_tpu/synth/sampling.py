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


def make_gmm_sampler(n_labels, prior_means, prior_stds,
                     prior_distributions="normal", n_channels=1,
                     generation_classes=None,
                     use_specific_stats_for_channel=None):
    """Traced twin of the host GMM prior draws in synth/model_inputs.py:53-77
    (reference SynthSR/model_inputs.py:103-125): returns a per-sample
    ``key -> (means, stds)`` fn, each (n_labels, n_channels) float32, for use
    inside the jitted train step (on-device generation, SURVEY.md §7).

    Semantics mirror build_model_inputs: per-channel 2-row prior blocks when
    ``use_specific_stats_for_channel`` is None/True (SynthSR requires one
    block per channel), random modality block otherwise; class draws expanded
    to labels via ``generation_classes``; positive-clipped; hyperprior
    defaults mean 125±100 / std 15±10."""
    prior_means = load_array_if_path(prior_means, load_as_numpy=True)
    prior_stds = load_array_if_path(prior_stds, load_as_numpy=True)
    if generation_classes is None:
        generation_classes = np.arange(n_labels)
    generation_classes = np.asarray(
        load_array_if_path(generation_classes, load_as_numpy=True), np.int32)
    n_classes = len(np.unique(generation_classes))
    per_channel = use_specific_stats_for_channel in (None, True)
    if per_channel:
        for arr in (prior_means, prior_stds):
            if isinstance(arr, np.ndarray) and arr.shape[0] / 2 != n_channels:
                raise ValueError("the number of blocks in the prior array "
                                 "does not match n_channels")

    def channel_block(arr, channel):
        if isinstance(arr, np.ndarray) and per_channel:
            return arr[2 * channel: 2 * channel + 2, :]
        return arr

    def sample(key):
        means, stds = [], []
        for channel in range(n_channels):
            key, km, ks = jax.random.split(key, 3)
            cls_means = draw_traced(
                km, channel_block(prior_means, channel), n_classes,
                prior_distributions, 125.0, 100.0, positive_only=True)
            cls_stds = draw_traced(
                ks, channel_block(prior_stds, channel), n_classes,
                prior_distributions, 15.0, 10.0, positive_only=True)
            means.append(cls_means[generation_classes])
            stds.append(cls_stds[generation_classes])
        return (jnp.stack(means, axis=-1).astype(jnp.float32),
                jnp.stack(stds, axis=-1).astype(jnp.float32))

    return sample
