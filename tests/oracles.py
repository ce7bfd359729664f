"""Dense numpy oracles re-deriving the reference models' *intended* math
(SURVEY §2.1-2.2) for parity testing.

These are written in the reference's dense formulation — full (N, M) / (B, N)
masked matrices, concat-based logits — so that agreement with the framework's
factored/sparse implementations is meaningful evidence.  Eval-mode only
(dropout off, batch norm on fresh running stats: x / sqrt(1 + eps)).
"""

import numpy as np

MASK = -9e15
BN_EPS = 1e-5


def leaky(x, slope=0.2):
    return np.where(x > 0, x, slope * x)


def elu(x):
    return np.where(x > 0, x, np.expm1(x))


def softmax_rows(e):
    e = e - e.max(axis=1, keepdims=True)
    ex = np.exp(e)
    return ex / ex.sum(axis=1, keepdims=True)


def bn_eval(x, scale=1.0, bias=0.0):
    return x / np.sqrt(1.0 + BN_EPS) * scale + bias


def concat_logits(h_first, h_second, a):
    """Reference concat logits: e[i, j] = leaky([h_first[j] || h_second[i]] . a)
    built the dense way (train.py:78-79)."""
    n, m, d = h_second.shape[0], h_first.shape[0], h_first.shape[1]
    concat = np.concatenate(
        [
            np.broadcast_to(h_first[None, :, :], (n, m, d)),
            np.broadcast_to(h_second[:, None, :], (n, m, d)),
        ],
        axis=2,
    )
    return leaky(concat @ a[:, 0])


def masked_gat_layer(x, w, a, adj_mask):
    """GAT.py:20-35 eval mode."""
    h = x @ w
    n, m = h.shape
    concat = np.concatenate([h, h], axis=1)  # [h_i || h_i]
    row = leaky(concat @ a[:, 0])            # [N]
    e = np.broadcast_to(row[:, None], (n, m))
    att = softmax_rows(np.where(adj_mask, e, MASK))
    return elu(att * h)


def gat_model(x, params, adj_mask, n_heads):
    """GAT.py:38-58 eval mode; params: dict with attention_i/{W,a}, out_att."""
    heads = [
        masked_gat_layer(x, params[f"attention_{i}"]["W"], params[f"attention_{i}"]["a"], adj_mask)
        for i in range(n_heads)
    ]
    h = np.concatenate(heads, axis=1)
    out = elu(masked_gat_layer(h, params["out_att"]["W"], params["out_att"]["a"], adj_mask))
    lse = np.log(np.exp(out - out.max(1, keepdims=True)).sum(1, keepdims=True)) + out.max(1, keepdims=True)
    return out - lse


def msha_layer(S, R, inter_mask, city_adj, prov_adj, batch, p,
               use_intra=True, joint=True):
    """train.py:69-118 (OursLayer) eval mode, dense formulation.

    p: dict with W1, W2, a, a3, a4 (a3/a4 only when use_intra).
    city_adj/prov_adj: dense (N, N) 0/1 clique matrices.
    """
    h1 = R @ p["W1"]  # (M, d')
    h2 = S @ p["W2"]  # (N, d')
    n, m = inter_mask.shape

    e12 = concat_logits(h1, h2, p["a"])  # (N, M)
    att_inter = softmax_rows(np.where(inter_mask, e12, MASK))

    if use_intra:
        h2_b = h2[batch]  # (B, d')
        b = len(batch)
        # city/province logits: [h_b || h_b] . a -> constant per row
        c3 = leaky(np.concatenate([h2_b, h2_b], 1) @ p["a3"][:, 0])  # (B,)
        c4 = leaky(np.concatenate([h2_b, h2_b], 1) @ p["a4"][:, 0])  # (B,)
        e3 = np.broadcast_to(c3[:, None], (b, n))
        e4 = np.broadcast_to(c4[:, None], (b, n))
        att3 = np.where(city_adj[batch] > 0, e3, MASK)
        att4 = np.where(prov_adj[batch] > 0, e4, MASK)
        if joint:
            # train.py:98-104 — shared raw-exp denominator; the inter term
            # exponentiates the already-softmaxed attention row.
            denom = (
                np.exp(att3).sum(1, keepdims=True)
                + np.exp(att4).sum(1, keepdims=True)
                + np.exp(att_inter[batch]).sum(1, keepdims=True)
            )
            att3 = np.exp(att3) / denom
            att4 = np.exp(att4) / denom
        else:
            att3 = softmax_rows(att3)
            att4 = softmax_rows(att4)
        intra_nc = att3.T @ h2_b + att4.T @ h2_b  # (N, d')
    else:
        intra_nc = 0.0

    inter_rc = att_inter @ h1  # (N, d')
    v = leaky(bn_eval(att_inter.T @ h2))  # (M, d')
    u = leaky(bn_eval(inter_rc + intra_nc))  # (N, d')
    return elu(u @ v.T)  # (N, M)


def log_softmax_rows(x):
    mx = x.max(1, keepdims=True)
    return x - mx - np.log(np.exp(x - mx).sum(1, keepdims=True))


def msha_model(S, R, inter_mask, city_adj, prov_adj, batch, params, n_heads,
               use_intra=True, joint=True, use_out_att=True):
    """Ours / ablation1-3 forward, eval mode (train.py:169-176)."""
    outs = [
        msha_layer(S, R, inter_mask, city_adj, prov_adj, batch,
                   params[f"attention_{i}"], use_intra, joint)
        for i in range(n_heads)
    ]
    x = np.concatenate(outs, axis=1)
    if use_out_att:
        x = elu(masked_gat_layer(x, params["out_att"]["W"], params["out_att"]["a"], inter_mask))
    else:
        x = elu(x)
    return log_softmax_rows(x)


def hgane_layer(s_emb, r_emb, inter_mask_rows, intra_mask, batch, p):
    """HGANE.py:37-76 eval mode."""
    s_b = s_emb[batch]
    h1 = r_emb @ p["W1"]
    h2 = s_b @ p["W2"]
    b, m = inter_mask_rows.shape
    d = h1.shape[1]

    e12 = concat_logits(h1, h2, p["a12"])  # (B, M)
    # intra: [h2_i || h2_j] proper pairwise
    a3 = p["a3"][:, 0]
    e3 = leaky((h2 @ a3[:d])[:, None] + (h2 @ a3[d:])[None, :])  # (B, B)

    att_inter = np.where(inter_mask_rows, e12, MASK)
    att_intra = np.where(intra_mask, e3, MASK)

    sum_county = np.exp(att_intra).sum(1, keepdims=True) + np.exp(att_inter).sum(1, keepdims=True)
    att_intra = np.exp(att_intra) / sum_county
    sum_school = np.exp(att_inter).sum(1, keepdims=True)
    att_inter = np.exp(att_inter) / sum_school

    u = leaky(bn_eval((att_inter @ r_emb) @ p["W1"] + (att_intra @ s_b) @ p["W2"]))
    v = leaky(bn_eval((att_inter.T @ s_b) @ p["W1"]))
    return elu(u @ v.T)


def gcn_model(features, dense_adj, p):
    """model.py:58-64 eval mode: relu(gc1) -> relu(gc2 with adj.T) -> logsoftmax."""
    x = np.maximum(dense_adj.T @ (features @ p["gc1"]["weight"]) + p["gc1"]["bias"], 0)
    x = np.maximum(dense_adj @ (x @ p["gc2"]["weight"]) + p["gc2"]["bias"], 0)
    return log_softmax_rows(x)


def sage_model(batch, s_feat, dense_adj_norm, p):
    """SGAE.py:50-56 eval mode."""
    x = s_feat[batch]
    x = np.maximum(x @ p["linear1"]["kernel"] + p["linear1"]["bias"], 0)
    x = dense_adj_norm[batch] * x
    x = np.maximum(x @ p["linear2"]["kernel"] + p["linear2"]["bias"], 0)
    return log_softmax_rows(x)
