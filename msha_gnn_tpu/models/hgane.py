"""HGANE — the batch-sliced hierarchical attention variant.

Reference: ``HGANE.py:11-76``.  Unlike :class:`~msha_gnn_tpu.models.msha.MSHA`
this layer slices everything down to the minibatch before computing
attention: the intra adjacency becomes the (B, B) block
``adj_intra[batch[:, None], batch]`` and the inter adjacency the (B, M) rows
``adj_inter[batch]`` (``HGANE.py:38-39``).  Its intra logits are *proper*
pairwise ``[h_i || h_j]`` (``HGANE.py:49-51`` transposes the second copy —
the one place the reference does real pairwise attention), so the (B, B)
block is materialised — fine, B is the batch size.

Softmax structure (``HGANE.py:61-69``): the intra channel's denominator sums
exp over *both* intra and inter masked logits (joint), while the inter
channel is normalised by its own sum only.  Aggregation re-projects the raw
embeddings through W1/W2 (``HGANE.py:71-73``), not the projected h.

Quirk notes: the reference builds a GDP-seeded ``features`` parameter that
its forward never touches (``HGANE.py:19``) — omitted here; ``W1``/``W2``
are ``nn.Linear(bias=False)`` with plain (gain-1) xavier init
(``HGANE.py:32-35``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..graph import Grouping
from ..ops import MASK_VALUE
from .common import elu, leaky_relu, xavier_uniform

Array = jax.Array


class HGANELayer(nn.Module):
    in_features: int
    out_features: int
    n_src: int
    n_dst: int
    dropout: float = 0.5

    @nn.compact
    def __call__(
        self,
        inter_mask_rows: Array,  # [B, M] bool — inter_mask[batch]
        intra: Grouping,
        batch: Array,            # [B]
        *,
        train: bool,
    ) -> Array:
        d_in, d = self.in_features, self.out_features
        s_emb = self.param(
            "source_embedding", nn.initializers.uniform(1.0), (self.n_src, d_in)
        )
        r_emb = self.param(
            "recipient_embedding", nn.initializers.uniform(1.0), (self.n_dst, d_in)
        )
        w1 = self.param("W1", xavier_uniform(1.0), (d_in, d))
        w2 = self.param("W2", xavier_uniform(1.0), (d_in, d))
        a12 = self.param("a12", xavier_uniform(1.0), (2 * d, 1))
        a3 = self.param("a3", xavier_uniform(1.0), (2 * d, 1))

        s_b = s_emb[batch]          # [B, d_in]
        h1 = r_emb @ w1             # [M, d']
        h2 = s_b @ w2               # [B, d']

        av = a12.reshape(2 * d)
        e12 = leaky_relu((h1 @ av[:d])[None, :] + (h2 @ av[d:])[:, None])  # [B, M]
        a3v = a3.reshape(2 * d)
        e3 = leaky_relu((h2 @ a3v[:d])[:, None] + (h2 @ a3v[d:])[None, :])  # [B, B]

        gid_b = intra.group_id[batch]
        intra_mask = gid_b[:, None] == gid_b[None, :]  # [B, B]

        att_inter = jnp.where(inter_mask_rows, e12, MASK_VALUE)
        att_intra = jnp.where(intra_mask, e3, MASK_VALUE)

        # HGANE.py:61-69 — raw-exp sums (no max subtraction; preserved).
        sum_county = jnp.sum(jnp.exp(att_intra), axis=1, keepdims=True) + jnp.sum(
            jnp.exp(att_inter), axis=1, keepdims=True
        )
        att_intra = jnp.exp(att_intra) / sum_county
        att_intra = nn.Dropout(self.dropout, deterministic=not train)(att_intra)

        sum_school = jnp.sum(jnp.exp(att_inter), axis=1, keepdims=True)
        att_inter = jnp.exp(att_inter) / sum_school
        att_inter = nn.Dropout(self.dropout, deterministic=not train)(att_inter)

        u = leaky_relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(
                (att_inter @ r_emb) @ w1 + (att_intra @ s_b) @ w2
            )
        )  # [B, d']
        v = leaky_relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")((att_inter.T @ s_b) @ w1)
        )  # [M, d']
        return elu(u @ v.T)  # [B, M]
