"""Multi-year joint MSHA training (BASELINE config #3: "4-year joint
training + ablation variants").

The reference trains one year at a time (module global ``year``,
``dataset.py:11``) and could not train jointly across years even with the
data present: node ids are re-anonymised every year, so the only shared
structure is the recipient provinces and the model weights.  This module
makes exactly those shared:

* **Shared across years** — every MSHA head's projections/attention vectors
  (W1, W2, a, a3, a4), the output attention layer, and the recipient
  embeddings (aligned by *province name* across the per-year
  ``recipient_index`` maps — ids may differ per year, names do not).
* **Per-year** — source feature tables (``Sfeatures_{year}``, GDP-seeded as
  in ``train.py:156-158``) and the city/province groupings.

Years whose Flow CSV is missing (2016-2018 ship graphs + GDP but zero flow
records, ``.MISSING_LARGE_BLOBS``) are skipped with a log line, so the
pipeline degrades to single-year on the shipped data and runs at full
breadth when the missing CSVs exist.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np
import optax

from ..graph import FlowGraph, Grouping, PairGrouping
from ..models.common import elu, gdp_feature_init
from ..models.gat import MaskedGATLayer
from ..models.msha import MSHALayer
from .optim import adam_l2

Array = jax.Array


def canonical_recipients(recipient_maps: Dict[str, Dict[str, int]]):
    """Align per-year ``{province name: local idx}`` maps to one canonical
    recipient ordering (sorted union of names).

    Returns ``(names, to_canon)`` where ``to_canon[year][local_idx] =
    canonical_idx``.  Years may have recipient subsets; the canonical space
    is the union.
    """
    names = sorted(set().union(*[set(m) for m in recipient_maps.values()]))
    canon = {n: i for i, n in enumerate(names)}
    to_canon = {}
    for y, m in recipient_maps.items():
        perm = np.zeros(len(m), np.int32)
        for name, local in m.items():
            perm[int(local)] = canon[name]
        to_canon[y] = perm
    return names, to_canon


def _canonicalize_mask(inter_mask: np.ndarray, perm: np.ndarray,
                       m_canon: int) -> np.ndarray:
    """Permute/embed a year's [N, M_y] mask columns into canonical order."""
    out = np.zeros((inter_mask.shape[0], m_canon), bool)
    out[:, perm] = np.asarray(inter_mask)
    return out


class TemporalMSHA(nn.Module):
    """MSHA with per-year source features and year-shared everything else.

    The head stack mirrors :class:`~msha_gnn_tpu.models.msha.MSHA`
    (``train.py:153-177``); heads are name-keyed flax submodules, so calling
    with different ``year`` values reuses the same head parameters while
    selecting that year's ``Sfeatures_{year}`` table.  ``year`` must be a
    static Python string (each year's N differs, so jit specialises per
    year anyway).
    """

    years: Tuple[str, ...]
    gdp_by_year: Dict[str, Array]
    in_features: int
    out_features: int
    n_classes: int              # canonical recipient count
    n_heads: int = 2
    dropout: float = 0.5
    use_intra: bool = True
    joint_softmax: bool = True
    use_out_att: bool = True

    @nn.compact
    def __call__(
        self,
        year: str,
        inter_mask: Array,      # [N_year, M_canon] bool, canonical columns
        city: Grouping,
        province: Grouping,
        batch: Array,
        *,
        train: bool,
        rows: Optional[Array] = None,  # restrict output scores to these rows
        pair=None,  # PairGrouping(city, province) fused intra gather
    ):
        m = self.n_classes
        # Create EVERY year's feature table each call so the param tree is
        # identical regardless of which year runs (optax state stays stable).
        s_feats = {
            y: self.param(
                f"Sfeatures_{y}",
                gdp_feature_init(self.gdp_by_year[y], self.in_features),
                (self.gdp_by_year[y].shape[0], self.in_features),
            )
            for y in self.years
        }
        r_feat = self.param(
            "Rfeatures", nn.initializers.uniform(scale=1.0),
            (m, self.in_features),
        )
        s_in = nn.Dropout(self.dropout, deterministic=not train)(
            s_feats[year]
        )
        r_in = nn.Dropout(self.dropout, deterministic=not train)(r_feat)

        layer = MSHALayer(
            self.in_features, self.out_features, self.dropout,
            use_intra=self.use_intra, joint_softmax=self.joint_softmax,
            n_heads=self.n_heads, name="attention",
        )
        x = layer(s_in, r_in, inter_mask, city, province, batch, train=train,
                  rows=rows, pair=pair)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        out_mask = inter_mask if rows is None else inter_mask[rows]
        if self.use_out_att:
            x = elu(
                MaskedGATLayer(
                    m * self.n_heads, m, self.dropout, name="out_att"
                )(x, out_mask, train=train)
            )
        else:
            x = elu(x)
        return jax.nn.log_softmax(x, axis=1)


def train_temporal_msha(
    fgs: Dict[str, FlowGraph],
    recipient_maps: Dict[str, Dict[str, int]],
    *,
    in_features: int = 128,
    out_features: int = 64,
    n_heads: int = 2,
    dropout: float = 0.5,
    use_intra: bool = True,
    joint_softmax: bool = True,
    use_out_att: bool = True,
    epochs: int = 5,
    batch_size: int = 64,
    lr: float = 1e-3,
    weight_decay: float = 5e-4,
    train_fraction: float = 0.9,
    seed: int = 42,
    log=None,
):
    """Joint epoch loop over every year with flow records.

    Returns ``(params, batch_stats, history)`` where ``history`` is a list
    of per-epoch ``{year: {"train_loss", "accuracy", "auc", ...}}`` dicts.
    """
    from ..data.flow import train_test_split_records
    from .metrics import classification_report

    log = log or (lambda r: None)
    years = tuple(sorted(fgs))
    names, to_canon = canonical_recipients(recipient_maps)
    m_canon = len(names)

    model = TemporalMSHA(
        years=years,
        gdp_by_year={y: fgs[y].gdp for y in years},
        in_features=in_features, out_features=out_features,
        n_classes=m_canon, n_heads=n_heads, dropout=dropout,
        use_intra=use_intra, joint_softmax=joint_softmax,
        use_out_att=use_out_att,
    )

    masks = {}
    active = []
    for y in years:
        if fgs[y].num_records == 0:
            log({"event": "temporal_skip_year", "year": y,
                 "reason": "no flow records"})
            continue
        active.append(y)
        masks[y] = jnp.asarray(_canonicalize_mask(
            np.asarray(fgs[y].inter.to_dense() > 0), to_canon[y], m_canon
        ))
    if not active:
        raise ValueError("no year has flow records")

    pairs = {y: PairGrouping.build(fgs[y].city, fgs[y].province)
             for y in active}
    y0 = active[0]
    variables = model.init(
        jax.random.key(seed), y0, masks[y0], fgs[y0].city, fgs[y0].province,
        jnp.zeros((1,), jnp.int32), train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = adam_l2(lr, weight_decay)
    opt_state = tx.init(params)

    @partial(jax.jit, static_argnames=("year",))
    def step(params, batch_stats, opt_state, batch, labels, rng, *, year):
        fg = fgs[year]

        def loss_fn(p):
            logp, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                year, masks[year], fg.city, fg.province, batch,
                train=True, rngs={"dropout": rng},
                mutable=["batch_stats"], rows=batch, pair=pairs[year],
            )
            per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return per.mean(), mutated

        (loss, mutated), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        # Freeze the OTHER years' feature tables this step: their grads are
        # zero, but the L2 term of the torch-equivalent Adam chain would
        # still decay them on every step of every year — multiplying their
        # effective weight decay by the number of active years vs the
        # reference's single-year semantics.
        updates = dict(updates)
        for y2 in years:
            if y2 != year:
                k = f"Sfeatures_{y2}"
                updates[k] = jax.tree_util.tree_map(jnp.zeros_like,
                                                    updates[k])
        params = optax.apply_updates(params, updates)
        return params, mutated["batch_stats"], opt_state, loss

    @partial(jax.jit, static_argnames=("year",))
    def full_scores(params, batch_stats, *, year):
        fg = fgs[year]
        return model.apply(
            {"params": params, "batch_stats": batch_stats},
            year, masks[year], fg.city, fg.province,
            jnp.zeros((1,), jnp.int32), train=False,
        )

    src = {y: np.asarray(fgs[y].edge_src) for y in active}
    dst = {
        y: to_canon[y][np.asarray(fgs[y].edge_dst)] for y in active
    }  # canonical labels
    splits = {
        y: train_test_split_records(len(src[y]), train_fraction, seed)
        for y in active
    }
    rng_np = np.random.default_rng(seed)
    key = jax.random.key(seed)
    history = []
    for epoch in range(epochs):
        t0 = time.time()
        perms = {y: rng_np.permutation(splits[y][0]) for y in active}
        offsets = dict.fromkeys(active, 0)
        totals = dict.fromkeys(active, 0.0)
        counts = dict.fromkeys(active, 0)
        live = list(active)
        while live:
            for y in list(live):
                o = offsets[y]
                if o + batch_size > len(perms[y]):
                    live.remove(y)
                    continue
                ids = perms[y][o : o + batch_size]
                offsets[y] = o + batch_size
                key, sub = jax.random.split(key)
                params, batch_stats, opt_state, loss = step(
                    params, batch_stats, opt_state,
                    jnp.asarray(src[y][ids], jnp.int32),
                    jnp.asarray(dst[y][ids], jnp.int32), sub, year=y,
                )
                totals[y] += float(loss)
                counts[y] += 1
        report = {}
        for y in active:
            test_ids = splits[y][1]
            scores = np.asarray(full_scores(params, batch_stats, year=y))
            b = src[y][test_ids]
            metrics = {
                k: float(v) for k, v in classification_report(
                    jnp.asarray(scores[b]), jnp.asarray(dst[y][test_ids])
                ).items()
            }
            report[y] = {
                "train_loss": totals[y] / max(counts[y], 1), **metrics,
            }
        history.append(report)
        log({"event": "temporal_epoch", "epoch": epoch, "report": report,
             "seconds": time.time() - t0})
    return params, batch_stats, history


def run_temporal_train(
    years=("2015", "2016", "2017", "2018"),
    data_dir: Optional[str] = None,
    log=None,
    **kwargs,
):
    """Load per-year graphs + recipient maps and run the joint loop."""
    import os

    from ..data.flow import DEFAULT_DATA_DIR, load_flow_graph, load_index_match

    data_dir = data_dir or DEFAULT_DATA_DIR
    fgs, maps = {}, {}
    for y in years:
        fgs[y] = load_flow_graph(y, data_dir)
        _, _, maps[y] = load_index_match(
            os.path.join(data_dir, f"Adjacent{y}.json")
        )
    return train_temporal_msha(fgs, maps, log=log, **kwargs)
