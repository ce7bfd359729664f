"""MLP student encoder and link predictors (the LLP / KD pipeline models).

Reference: ``LLP.py:36-115`` (MLP, LinkPredictor) and the exact duplicate
``Teacher_LinkPredictor`` (``LLP.py:170-198``) — one class here serves both
roles.

Repaired-intent note: the reference's 'mlp' predictor comments out its final
linear (``LLP.py:111``), so it returns ``sigmoid`` of the *hidden* layer —
a (B, hidden) matrix rather than a (B,) score.  ``final_linear=True``
(default) restores the intended scalar edge score; ``final_linear=False``
reproduces the shipped behaviour for parity runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

Array = jax.Array


class MLP(nn.Module):
    """Configurable-depth MLP with optional batch/layer norm
    (``LLP.py:36-84``)."""

    num_layers: int
    hidden_dim: int
    output_dim: int
    dropout_ratio: float = 0.5
    norm_type: str = "none"  # none | batch | layer

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        h = x
        for l in range(self.num_layers):
            is_last = l == self.num_layers - 1
            dim = self.output_dim if is_last else self.hidden_dim
            h = nn.Dense(dim, name=f"layers_{l}")(h)
            if not is_last:
                if self.norm_type == "batch":
                    h = nn.BatchNorm(
                        use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=f"norms_{l}",
                    )(h)
                elif self.norm_type == "layer":
                    h = nn.LayerNorm(name=f"norms_{l}")(h)
                h = jax.nn.relu(h)
                h = nn.Dropout(self.dropout_ratio, deterministic=not train)(h)
        return h


class LinkPredictor(nn.Module):
    """Edge scorer on node-embedding pairs (``LLP.py:86-115``).

    Hadamard ``x_i * x_j`` then either an MLP tower ('mlp') or an inner
    product ('inner'), then sigmoid.
    """

    predictor: str  # 'mlp' | 'inner'
    hidden_channels: int
    num_layers: int = 2
    dropout: float = 0.5
    final_linear: bool = True

    @nn.compact
    def __call__(self, x_i: Array, x_j: Array, *, train: bool) -> Array:
        x = x_i * x_j
        if self.predictor == "mlp":
            n_hidden = self.num_layers - 1
            for l in range(n_hidden):
                x = nn.Dense(self.hidden_channels, name=f"lins_{l}")(x)
                x = jax.nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            if self.final_linear:
                x = nn.Dense(1, name=f"lins_{n_hidden}")(x)[..., 0]
        elif self.predictor == "inner":
            x = jnp.sum(x, axis=-1)
        else:
            raise ValueError(f"unknown predictor {self.predictor!r}")
        return jax.nn.sigmoid(x)
