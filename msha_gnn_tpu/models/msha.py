"""MSHA — multi-semantic hierarchical attention (the paper's core model).

One parametrised implementation replaces the reference's five copies
(``train.py:44-177``, ``Ours.py:29-167``, ``Ablation.py:10-301``):

==================  ================================================
reference class      this module's configuration
==================  ================================================
``Ours``             ``MSHA(use_intra=True, joint_softmax=True)``
``ablation1``        ``MSHA(n_heads=1, use_out_att=False)``
``ablation2``        ``MSHA(joint_softmax=False)`` (independent intra softmax)
``ablation3``        ``MSHA(use_intra=False)`` (inter channel only — the
                     model actually trained by the main driver, train.py:206)
==================  ================================================

TPU-first structure (exact math, different layout):

* The inter channel keeps a dense (N, M) attention matrix per head — M = 32
  recipients, so this is a thin MXU-friendly matrix, not the bottleneck.
  Logits use the rank-1 split of the reference's concat — no (N, M, 2d')
  tensor.
* The intra city/province channels never materialise (B, N): the reference's
  self-concat logits are constant per row, so masking + joint softmax +
  ``attention.T @ h`` reduce exactly to per-sample scalars and group-keyed
  segment ops (``ops.grouped``) — O(B + N) per channel.  The city and
  province broadcasts fuse into ONE N-row gather through the
  :class:`~msha_gnn_tpu.graph.PairGrouping` table.
* The joint softmax (``train.py:98-104``) — the distinguishing
  "multi-semantic hierarchical" mechanism — shares one denominator across
  the city clique, the province clique, and (quirk preserved) the
  *exponentials of the already-softmaxed* inter attention row.
* **All heads run vectorised in one module** (head-stacked parameters,
  concat-on-features [N, H*d'] layout).  Every big tensor stays 2-D: the
  per-head M-side contractions run as single matmuls through block-diagonal
  forms (at H=2 the H-times FLOP overcount is far cheaper than the layout
  copies per-head dispatch or batched dots force), and the minibatch row
  gathers happen once for all heads.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..graph import Grouping
from ..ops import group_scatter, pair_scatter, take_rows
from ..ops.dense import MASK_VALUE
from .common import (
    elu,
    gdp_feature_init,
    leaky_relu,
    xavier_uniform_stacked,
)
from .gat import MaskedGATLayer

Array = jax.Array


class MSHALayer(nn.Module):
    """All heads of one MSHA attention layer, vectorised
    (``train.py:44-118`` / ``Ablation.py:10-83``; the reference's per-head
    ``OursLayer`` instances map to slices ``[i]`` of the head-stacked
    parameters).  Output is the heads' feature-axis concat ``[R, H * M]``
    (head-major), exactly ``concatenate([head_0, ..., head_{H-1}], axis=1)``.
    """

    in_features: int
    out_features: int
    dropout: float = 0.5
    use_intra: bool = True        # False -> OursLayer3 / ablation3
    joint_softmax: bool = True    # False -> OursLayer2 / ablation2
    n_heads: int = 1

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
        rows: Optional[Array] = None,  # emit scores for these rows only
        pair=None,  # PairGrouping(city, province): fuses the intra gathers
    ):
        d, nh = self.out_features, self.n_heads
        n, m = inter_mask.shape
        w1 = self.param("W1", xavier_uniform_stacked(),
                        (nh, self.in_features, d))
        w2 = self.param("W2", xavier_uniform_stacked(),
                        (nh, self.in_features, d))
        a = self.param("a", xavier_uniform_stacked(), (nh, 2 * d, 1))[..., 0]

        # concat-on-features layout: [rows, H*d'] keeps every big tensor 2-D
        w1c = w1.transpose(1, 0, 2).reshape(self.in_features, nh * d)
        w2c = w2.transpose(1, 0, 2).reshape(self.in_features, nh * d)
        h1c = r_input @ w1c  # [M, Hd']
        h2c = s_input @ w2c  # [N, Hd']

        # ---- inter (bipartite) channel: train.py:78-83 ----
        # rank-1 split of the concat logits: [h1_j || h2_i] . a_h ==
        # h1_j . a_h[:d] + h2_i . a_h[d:]  (recipient projection first)
        s_dst = jnp.einsum("mhd,hd->mh", h1c.reshape(m, nh, d), a[:, :d])
        s_src = jnp.einsum("nhd,hd->nh", h2c.reshape(n, nh, d), a[:, d:])
        e12 = leaky_relu(s_src[:, :, None] + s_dst.T[None, :, :])  # [N,H,M]
        e12 = jnp.where(inter_mask[:, None, :], e12, MASK_VALUE)
        att = jax.nn.softmax(e12, axis=-1)
        att = nn.Dropout(self.dropout, deterministic=not train)(att)
        attc = att.reshape(n, nh * m)  # materialised head-major

        aux_heads = [{} for _ in range(nh)]
        if self.use_intra:
            a3 = self.param("a3", xavier_uniform_stacked(),
                            (nh, 2 * d, 1))[..., 0]
            a4 = self.param("a4", xavier_uniform_stacked(),
                            (nh, 2 * d, 1))[..., 0]
            h2_b = take_rows(h2c, batch)       # [B, Hd'] — one gather
            h2_bh = h2_b.reshape(-1, nh, d)
            # self-concat logits are constant per row: [h_b || h_b] . a3 ==
            # h_b . (a3_lo + a3_hi)  (train.py:88-92)
            c3 = leaky_relu(
                jnp.einsum("bhd,hd->bh", h2_bh, a3[:, :d] + a3[:, d:])
            )
            c4 = leaky_relu(
                jnp.einsum("bhd,hd->bh", h2_bh, a4[:, :d] + a4[:, d:])
            )
            cnt_city = city.member_sizes()[batch].astype(h2c.dtype)
            cnt_prov = province.member_sizes()[batch].astype(h2c.dtype)
            if self.joint_softmax:
                # train.py:98-104 — one denominator across all three
                # channels.  Masked clique entries contribute exp(-9e15)=0;
                # the |clique| unmasked entries each contribute exp(c).
                # Quirk preserved: the inter term sums exp() of the
                # *post-softmax (and post-dropout) probabilities*.
                att_b = take_rows(attc, batch).reshape(-1, nh, m)
                inter_term = jnp.sum(jnp.exp(att_b), axis=-1)  # [B, H]
                denom = (
                    cnt_city[:, None] * jnp.exp(c3)
                    + cnt_prov[:, None] * jnp.exp(c4)
                    + inter_term
                )
                w3 = jnp.exp(c3) / denom
                w4 = jnp.exp(c4) / denom
            else:
                # ablation2 (Ablation.py:194-197): independent per-channel
                # softmax.  A constant-row masked softmax is uniform over
                # the clique -> weight 1/|clique|.
                w3 = jnp.broadcast_to((1.0 / cnt_city)[:, None], c3.shape)
                w4 = jnp.broadcast_to((1.0 / cnt_prov)[:, None], c4.shape)
            # Dropout on the factored per-sample weights (the dense path
            # drops individual (b, n) entries; factored form drops whole
            # rows — documented divergence, identical in expectation).
            w3 = nn.Dropout(self.dropout, deterministic=not train)(w3)
            w4 = nn.Dropout(self.dropout, deterministic=not train)(w4)
            # IntraNC = att3.T @ h2_b + att4.T @ h2_b (train.py:113); the
            # city+province broadcasts fuse into one gather via `pair`.
            contrib3 = (w3[:, :, None] * h2_bh).reshape(-1, nh * d)
            contrib4 = (w4[:, :, None] * h2_bh).reshape(-1, nh * d)
            if pair is not None:
                intra_nc = pair_scatter(
                    contrib3, contrib4, city, province, pair, batch
                )
            else:
                intra_nc = group_scatter(contrib3, city, batch) + \
                    group_scatter(contrib4, province, batch)
            if record:
                for i in range(nh):
                    aux_heads[i].update(intra_city_weight=w3[:, i],
                                        intra_province_weight=w4[:, i])
        else:
            intra_nc = 0.0

        # ---- aggregation + bilinear scoring: train.py:112-118 ----
        # Per-head contractions against the M side run as single 2-D
        # matmuls through block-diagonal forms: the H-times FLOP overcount
        # (tiny at M=32) avoids the layout copies batched dots would force.
        eye = jnp.eye(nh, dtype=h1c.dtype)
        h1h = h1c.reshape(m, nh, d)
        bd_h1 = jnp.einsum("mhd,hk->hmkd", h1h, eye).reshape(nh * m, nh * d)
        inter_rc = attc @ bd_h1                  # [N, Hd'] (att_inter @ h1)
        vfull = attc.T @ h2c                     # [HM, Hd']
        v = vfull.reshape(nh, m, nh, d)[jnp.arange(nh), :, jnp.arange(nh), :]
        v = jnp.moveaxis(v, 0, 1).reshape(m, nh * d)  # att_inter.T @ h2
        v = leaky_relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(v)
        )  # [M, Hd']  (per-feature BN == the reference's per-head bn1)
        u = leaky_relu(
            nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(inter_rc + intra_nc)
        )  # [N, Hd']
        # Everything downstream of the BatchNorms is row-local, so when the
        # caller only consumes a subset of rows (the minibatch loss reads B
        # of N=39k rows, train.py:229) the bilinear scoring + output layers
        # run on those rows only.  Exact: u is computed (and BN statistics
        # taken) over all N rows first, so gradients still flow into every
        # row through the batch statistics, as in the dense formulation.
        if rows is not None:
            u = take_rows(u, rows)
        vh = v.reshape(m, nh, d)
        bd_v = jnp.einsum("mhd,hk->hdkm", vh, eye).reshape(nh * d, nh * m)
        h_prime = elu(u @ bd_v)  # [R, H*M] == concat of per-head u_h @ v_h.T
        if record:
            for i in range(nh):
                aux_heads[i]["att_inter"] = att[:, i]
            return h_prime, aux_heads
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
        rows: Optional[Array] = None,  # restrict output scores to these rows
        pair=None,  # PairGrouping(city, province) for the fused intra gather
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

        layer = MSHALayer(
            self.in_features, self.out_features, self.dropout,
            use_intra=self.use_intra, joint_softmax=self.joint_softmax,
            n_heads=self.n_heads, name="attention",
        )
        out = layer(s_in, r_in, inter_mask, city, province, batch,
                    train=train, record=record, rows=rows, pair=pair)
        if record:
            x, auxes = out
        else:
            x = out
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        out_mask = inter_mask if rows is None else inter_mask[rows]
        if self.use_out_att:
            x = elu(
                MaskedGATLayer(
                    m * self.n_heads, m, self.dropout, name="out_att"
                )(x, out_mask, train=train)
            )
        else:
            x = elu(x)  # ablation1 (Ablation.py:130-136)
        logp = jax.nn.log_softmax(x, axis=1)
        if record:
            return logp, auxes
        return logp
