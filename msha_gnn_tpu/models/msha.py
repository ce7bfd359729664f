"""MSHA — multi-semantic hierarchical attention (the paper's core model).

One parametrised implementation replaces the reference's five copies
(``train.py:44-177``, ``Ours.py:29-167``, ``Ablation.py:10-301``):

==================  =========================================to==============
reference class      this module's configuration
==================  ================================================
``Ours``             ``MSHA(use_intra=True, joint_softmax=True)``
``ablation1``        ``MSHA(n_heads=1, use_out_att=False)``
``ablation2``        ``MSHA(joint_softmax=False)`` (independent intra softmax)
``ablation3``        ``MSHA(use_intra=False)`` (inter channel only — the
                     model actually trained by the main driver, train.py:206)
==================  ================================================

TPU-first structure (exact math, different layout):

* The inter channel keeps a dense (N, M) attention matrix — M = 32
  recipients, so this is a thin MXU-friendly matrix, not the bottleneck.
  Logits use the rank-1 split of the reference's concat
  (``ops.dense.bipartite_rank1_logits``) — no (N, M, 2d') tensor.
* The intra city/province channels never materialise (B, N): the reference's
  self-concat logits are constant per row, so masking + joint softmax +
  ``attention.T @ h`` reduce exactly to per-sample scalars and group-keyed
  segment ops (``ops.grouped``) — O(B + N) per channel.
* The joint softmax (``train.py:98-104``) — the distinguishing
  "multi-semantic hierarchical" mechanism — shares one denominator across
  the city clique, the province clique, and (quirk preserved) the
  *exponentials of the already-softmaxed* inter attention row.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..graph import Grouping
from ..ops import (
    bipartite_rank1_logits,
    clique_row_scalar_logits,
    clique_weighted_scatter,
    masked_row_softmax,
)
from .common import elu, gdp_feature_init, leaky_relu, xavier_uniform
from .gat import MaskedGATLayer

Array = jax.Array


class MSHALayer(nn.Module):
    """One attention head (``train.py:44-118`` / ``Ablation.py:10-83``)."""

    in_features: int
    out_features: int
    dropout: float = 0.5
    use_intra: bool = True        # False -> OursLayer3 / ablation3
    joint_softmax: bool = True    # False -> OursLayer2 / ablation2

    @nn.compact
    def __call__(
        self,
        s_input: Array,            # [N, d] source features
        r_input: Array,            # [M, d] recipient features
        inter_mask: Array,         # [N, M] bool
        city: Grouping,
        province: Grouping,
        batch: Array,              # [B] int32 source indices of the minibatch
        *,
        train: bool,
        record: bool = False,
    ):
        d = self.out_features
        w1 = self.param("W1", xavier_uniform(), (self.in_features, d))
        w2 = self.param("W2", xavier_uniform(), (self.in_features, d))
        a = self.param("a", xavier_uniform(), (2 * d, 1))

        h1 = r_input @ w1  # [M, d']
        h2 = s_input @ w2  # [N, d']

        # ---- inter (bipartite) channel: train.py:78-83 ----
        e12 = bipartite_rank1_logits(h2, h1, a)
        att_inter = masked_row_softmax(e12, inter_mask)  # [N, M]
        att_inter = nn.Dropout(self.dropout, deterministic=not train)(att_inter)

        aux = {}
        if self.use_intra:
            a3 = self.param("a3", xavier_uniform(), (2 * d, 1))
            a4 = self.param("a4", xavier_uniform(), (2 * d, 1))
            h2_b = h2[batch]  # [B, d']
            c3 = clique_row_scalar_logits(h2_b, a3)  # [B]
            c4 = clique_row_scalar_logits(h2_b, a4)  # [B]
            if self.joint_softmax:
                # train.py:98-104 — one denominator across all three
                # channels.  Masked clique entries contribute exp(-9e15)=0;
                # the |clique| unmasked entries each contribute exp(c).
                # Quirk preserved: the inter term sums exp() of the
                # *post-softmax (and post-dropout) probabilities*.
                cnt_city = city.member_sizes()[batch].astype(h2.dtype)
                cnt_prov = province.member_sizes()[batch].astype(h2.dtype)
                inter_term = jnp.sum(jnp.exp(att_inter[batch]), axis=1)
                denom = (
                    cnt_city * jnp.exp(c3) + cnt_prov * jnp.exp(c4) + inter_term
                )
                w3 = jnp.exp(c3) / denom
                w4 = jnp.exp(c4) / denom
            else:
                # ablation2 (Ablation.py:194-197): independent per-channel
                # softmax.  A constant-row masked softmax is uniform over
                # the clique -> weight 1/|clique|.
                w3 = 1.0 / city.member_sizes()[batch].astype(h2.dtype)
                w4 = 1.0 / province.member_sizes()[batch].astype(h2.dtype)
            # Dropout on the factored per-sample weights (the dense path
            # drops individual (b, n) entries; factored form drops whole
            # rows — documented divergence, identical in expectation).
            w3 = nn.Dropout(self.dropout, deterministic=not train)(w3)
            w4 = nn.Dropout(self.dropout, deterministic=not train)(w4)
            # IntraNC = att3.T @ h2_b + att4.T @ h2_b (train.py:113)
            intra_nc = clique_weighted_scatter(
                w3, h2_b, city, batch
            ) + clique_weighted_scatter(w4, h2_b, province, batch)
            if record:
                aux.update(intra_city_weight=w3, intra_province_weight=w4)
        else:
            intra_nc = 0.0

        # ---- aggregation + bilinear scoring: train.py:112-118 ----
        inter_rc = att_inter @ h1  # [N, d']
        v = leaky_relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(att_inter.T @ h2)
        )  # [M, d']
        u = leaky_relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(inter_rc + intra_nc)
        )  # [N, d']
        h_prime = elu(u @ v.T)  # [N, M]
        if record:
            aux["att_inter"] = att_inter
            return h_prime, aux
        return h_prime


class MSHA(nn.Module):
    """Multi-head wrapper (``train.py:153-177`` / ``Ablation.py:279-301``).

    Learnable source features carry the GDP scalar in the last column
    (``train.py:156-158``); recipient features are fully learnable.  Heads
    concat to (N, M * heads); optionally an output
    :class:`~msha_gnn_tpu.models.gat.MaskedGATLayer` masked by the inter
    adjacency maps back to (N, M); log-softmax scores.
    """

    in_features: int
    out_features: int
    n_classes: int
    n_heads: int = 2
    dropout: float = 0.5
    use_intra: bool = True
    joint_softmax: bool = True
    use_out_att: bool = True
    gdp: Optional[Array] = None  # [N]

    @nn.compact
    def __call__(
        self,
        inter_mask: Array,
        city: Grouping,
        province: Grouping,
        batch: Array,
        *,
        train: bool,
        record: bool = False,
    ):
        n = self.gdp.shape[0]
        m = self.n_classes
        s_feat = self.param(
            "Sfeatures", gdp_feature_init(self.gdp, self.in_features),
            (n, self.in_features),
        )
        r_feat = self.param(
            "Rfeatures", nn.initializers.uniform(scale=1.0), (m, self.in_features)
        )
        s_in = nn.Dropout(self.dropout, deterministic=not train)(s_feat)
        r_in = nn.Dropout(self.dropout, deterministic=not train)(r_feat)

        outs = []
        auxes = []
        for i in range(self.n_heads):
            layer = MSHALayer(
                self.in_features, self.out_features, self.dropout,
                use_intra=self.use_intra, joint_softmax=self.joint_softmax,
                name=f"attention_{i}",
            )
            out = layer(s_in, r_in, inter_mask, city, province, batch,
                        train=train, record=record)
            if record:
                out, aux = out
                auxes.append(aux)
            outs.append(out)
        x = jnp.concatenate(outs, axis=1)  # [N, M * heads]
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if self.use_out_att:
            x = elu(
                MaskedGATLayer(
                    m * self.n_heads, m, self.dropout, name="out_att"
                )(x, inter_mask, train=train)
            )
        else:
            x = elu(x)  # ablation1 (Ablation.py:130-136)
        logp = jax.nn.log_softmax(x, axis=1)
        if record:
            return logp, auxes
        return logp
