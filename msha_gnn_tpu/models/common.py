"""Shared model utilities: reference-matching initialisers and norms.

The reference initialises every attention/projection parameter with
``nn.init.xavier_uniform_(gain=1.414)`` (e.g. ``train.py:54-62``) and builds
learnable node features as ``torch.rand`` uniform [0, 1) with the last column
replaced by the scalar GDP feature (``train.py:156-158``).  These helpers
reproduce those *distributions* (values are PRNG-dependent, parity tests
inject fixed parameters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array

XAVIER_GAIN = 1.414  # reference gain (train.py:54)


def xavier_uniform(gain: float = XAVIER_GAIN):
    """torch ``xavier_uniform_`` semantics: bound = gain * sqrt(6/(fan_in+fan_out))
    with torch's fan convention for 2-D tensors (fan_in = dim 1 size... for a
    raw (rows, cols) tensor torch uses fan_in = cols, fan_out = rows... see
    torch._calculate_fan_in_and_fan_out: fan_in = size(1), fan_out = size(0)).
    """

    def init(key, shape, dtype=jnp.float32):
        fan_out, fan_in = shape[0], shape[1] if len(shape) > 1 else 1
        bound = gain * (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_stacked(gain: float = XAVIER_GAIN):
    """Per-head xavier for head-stacked parameters [H, rows, cols]: the
    bound uses each head's 2-D fan (identical distribution to H separate
    :func:`xavier_uniform` draws), so fusing the heads into one parameter
    does not change the reference init (train.py:54-62)."""

    def init(key, shape, dtype=jnp.float32):
        fan_out, fan_in = shape[-2], shape[-1]
        bound = gain * (6.0 / (fan_in + fan_out)) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def features_with_gdp(key, n: int, dim: int, gdp: Array) -> Array:
    """``cat([rand(N, d)[:, :-1], gdp_col], dim=1)`` (``train.py:156-157``)."""
    feats = jax.random.uniform(key, (n, dim))
    return jnp.concatenate([feats[:, : dim - 1], gdp[:, None]], axis=1)


def gdp_feature_init(gdp: Array, dim: int):
    def init(key, shape, dtype=jnp.float32):
        assert shape == (gdp.shape[0], dim)
        return features_with_gdp(key, shape[0], dim, gdp).astype(dtype)

    return init


class BatchNorm(nn.Module):
    """torch ``BatchNorm1d`` semantics: batch stats in training (biased
    variance), running stats in eval; momentum 0.1 (flax momentum = 0.9);
    eps 1e-5; learnable affine."""

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
        )(x)


def leaky_relu(x: Array, negative_slope: float = 0.2) -> Array:
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


def elu(x: Array) -> Array:
    return jax.nn.elu(x)
