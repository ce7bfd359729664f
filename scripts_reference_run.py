"""Repaired-reference quality baseline (VERDICT round-1 item #1).

Runs the *reference's* PyTorch semantics (Sienna12321/MSHA--GNN) on the real
2015 flow data, CPU, with exactly the SURVEY §2.2 repairs applied, and records
final-epoch AUC/acc/P/R/F1 per model family into REFERENCE_RUNS.json.  This
anchors every quality-parity claim of the TPU framework: GOLDEN.md numbers are
compared against these.

Repairs applied (SURVEY §2.2; everything else is literal reference semantics):
  #1 dataset.py:274 intra adjacency reads values[2] of 2-element lists; the
     shipped Adjacent JSON values are [city, province] -> indices [0]/[1].
  #2/#7 hard-coded absolute data paths -> /root/reference/anonymous_data;
     the side-effect JSON dump (dataset.py:290-294) is dropped.
  #8 --seed parsed but never applied (train.py:25-26) -> torch.manual_seed(42)
     before the split/model build, mirroring the reference's RNG order
     (random_split at train.py:187 precedes model init at train.py:206).

Exact-math reorganizations (identical values AND gradients; needed because the
reference's dense N x N intra matrices are ~6 GB each and
normalize_adjacency_matrix (model.py:95-100) would build another dense N x N
diag + two O(N^3) matmuls -- infeasible on this host):
  * city/province adjacency is only ever consumed as the boolean row mask
    `adj[source_index] > 0` (train.py:95-96); column normalization keeps
    positive entries positive (every clique column has degree >= 1), so the
    mask equals group-id equality: city[b] == city[n].  We store the (N,)
    group-id vectors and build the (B, N) masks per batch.
  * inter logits e12 (train.py:78-79): cat([h1 || h2]) @ a decomposes as
    e12[i, j] = leaky_relu(a_lo . h1[j] + a_hi . h2[i]) -- a rank-1 broadcast
    instead of the (N, M, 2d') cat tensor.  Same for the per-row-constant GAT
    logits (GAT.py:24-27: cat([h || h]) @ a = h @ (a_lo + a_hi) broadcast) and
    the intra logits e3/e4 (train.py:88-92, constant along the neighbor axis).
  All dropout calls keep the reference's tensor shapes so behavior under
  training matches in distribution.

Usage:  python scripts_reference_run.py [--models ablation3,gat,gcn,sage,
        msha,hgane,llp]
"""
import argparse
import csv
import json
import os
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from sklearn.metrics import (accuracy_score, precision_score, recall_score,
                             roc_auc_score)
from sklearn.preprocessing import label_binarize
from torch.utils.data import DataLoader, Dataset, random_split

DATA = "/root/reference/anonymous_data"
YEAR = "2015"

torch.set_num_threads(os.cpu_count() or 2)


# --------------------------------------------------------------------------
# data (dataset.py:208-296, repaired)
# --------------------------------------------------------------------------
class FlowRecords(Dataset):
    """Per-record (source, recipient) pairs (dataset.py:241-244)."""

    def __init__(self):
        with open(f"{DATA}/GDP{YEAR}.json", "r", encoding="gbk") as f:
            self.gdp = json.load(f)["GDP_embedding"]
        with open(f"{DATA}/Adjacent{YEAR}.json", "r", encoding="gbk") as f:
            idx = json.load(f)
        src_map = idx["source_index"]
        self.N = len(src_map)
        self.M = len(idx["recipient_index"])
        # repair #1: shipped values are [city, province]
        city = np.zeros(self.N, dtype=np.int64)
        prov = np.zeros(self.N, dtype=np.int64)
        for k, v in src_map.items():
            city[int(k)] = int(v[0])
            prov[int(k)] = int(v[1])
        self.city_id = torch.from_numpy(city)
        self.prov_id = torch.from_numpy(prov)

        src, dst = [], []
        with open(f"{DATA}/Flow{YEAR}.csv", "r", encoding="gb18030") as f:
            reader = csv.reader(f)
            next(reader)
            for row in reader:
                src.append(int(row[0]))
                dst.append(int(row[1]))
        self.src = torch.tensor(src, dtype=torch.long)
        self.dst = torch.tensor(dst, dtype=torch.long)

        inter = torch.zeros(self.N, self.M)
        inter.index_put_((self.src, self.dst), torch.ones(len(src)),
                         accumulate=True)  # dataset.py:286-288 edge counts
        self.inter_adj = inter

    def __len__(self):
        return self.src.numel()

    def __getitem__(self, i):
        return self.src[i], self.dst[i]


def normalize_adjacency(adj):
    """model.py:95-100: A @ D^-1/2 @ D^-1/2 with column-sum degrees."""
    deg = adj.sum(dim=0)
    return adj * deg.pow(-1.0).unsqueeze(0)


# --------------------------------------------------------------------------
# layers (reference semantics, exact-math reorganized)
# --------------------------------------------------------------------------
def xavier(*shape):
    p = nn.Parameter(torch.zeros(*shape))
    nn.init.xavier_uniform_(p.data, gain=1.414)
    return p


def inter_attention(h1, h2, a, inter_mask, dropout, training):
    """Masked row softmax of the bipartite logits (train.py:78-83)."""
    e12 = F.leaky_relu(h2 @ a[h1.shape[1]:] + (h1 @ a[:h1.shape[1]]).T,
                       negative_slope=0.2)  # (N, M), rank-1 decomposition
    att = torch.where(inter_mask, e12, torch.full_like(e12, -9e15))
    att = F.softmax(att, dim=1)
    return F.dropout(att, dropout, training=training)


class RefMshaLayer(nn.Module):
    """OursLayer (train.py:44-118): joint softmax across city/province/inter."""

    def __init__(self, d_in, d_out, dropout, use_intra=True):
        super().__init__()
        self.d_out, self.p, self.use_intra = d_out, dropout, use_intra
        self.W1, self.W2 = xavier(d_in, d_out), xavier(d_in, d_out)
        self.a = xavier(2 * d_out, 1)
        self.a3, self.a4 = xavier(2 * d_out, 1), xavier(2 * d_out, 1)
        self.act = nn.LeakyReLU(0.2)
        self.bn1, self.bn2 = nn.BatchNorm1d(d_out), nn.BatchNorm1d(d_out)

    def forward(self, S, R, inter_mask, city_id, prov_id, batch):
        h1, h2 = R @ self.W1, S @ self.W2
        att_inter = inter_attention(h1, h2, self.a, inter_mask, self.p,
                                    self.training)
        if self.use_intra:  # train.py:85-113
            h2_b = h2[batch]
            # self-concat logits are neighbor-independent (train.py:88-92)
            e3 = F.leaky_relu(h2_b @ (self.a3[:self.d_out] +
                                      self.a3[self.d_out:]), 0.2)  # (B, 1)
            e4 = F.leaky_relu(h2_b @ (self.a4[:self.d_out] +
                                      self.a4[self.d_out:]), 0.2)
            city_m = city_id[batch, None] == city_id[None, :]  # (B, N)
            prov_m = prov_id[batch, None] == prov_id[None, :]
            exp3 = torch.where(city_m, torch.exp(e3).expand(-1, S.shape[0]),
                               torch.zeros(()))
            exp4 = torch.where(prov_m, torch.exp(e4).expand(-1, S.shape[0]),
                               torch.zeros(()))
            # joint denominator spans both intra channels + the batch rows of
            # the *post-softmax* inter probabilities (train.py:98-100 quirk)
            denom = (exp3.sum(1, keepdim=True) + exp4.sum(1, keepdim=True)
                     + torch.exp(att_inter[batch]).sum(1, keepdim=True))
            att3 = F.dropout(exp3 / denom, self.p, training=self.training)
            att4 = F.dropout(exp4 / denom, self.p, training=self.training)
            intra = att3.T @ h2_b + att4.T @ h2_b  # train.py:113
            u_in = att_inter @ h1 + intra
        else:  # OursLayer3 (Ablation.py:260-277): inter channel only
            u_in = att_inter @ h1
        v = self.act(self.bn1(att_inter.T @ h2))  # train.py:114
        u = self.act(self.bn2(u_in))
        return F.elu(u @ v.T)  # (N, M), train.py:117-118


class RefGatLayer(nn.Module):
    """GraphAttentionLayer (GAT.py:6-35): self-concat logits, mask, elementwise."""

    def __init__(self, d_in, d_out, dropout):
        super().__init__()
        self.p = dropout
        self.W = xavier(d_in, d_out)
        self.a = xavier(2 * d_out, 1)

    def forward(self, x, mask):
        h = x @ self.W  # (N, M)
        # cat([h || h]) @ a == h @ (a_lo + a_hi): constant along columns
        e = F.leaky_relu(h @ (self.a[:h.shape[1]] + self.a[h.shape[1]:]), 0.2)
        att = torch.where(mask, e.expand_as(h), torch.full_like(h, -9e15))
        att = F.softmax(att, dim=1)
        att = F.dropout(att, self.p, training=self.training)
        return F.elu(att * h)  # GAT.py:34


def gdp_features(gdp, n, d):
    vals = torch.tensor(list(gdp.values())).view(-1, 1)
    return nn.Parameter(torch.cat((torch.rand([n, d])[:, :-1], vals), dim=1))


class RefMsha(nn.Module):
    """Ours / ablation3 (train.py:153-177, Ablation.py:279-301)."""

    def __init__(self, d_in, d_out, M, heads, dropout, gdp, N, use_intra):
        super().__init__()
        self.p = dropout
        self.S = gdp_features(gdp, N, d_in)
        self.R = nn.Parameter(torch.rand([M, d_in]))
        self.heads = nn.ModuleList(
            RefMshaLayer(d_in, d_out, dropout, use_intra)
            for _ in range(heads))
        self.out_att = RefGatLayer(M * heads, M, dropout)

    def forward(self, inter_mask, city_id, prov_id, batch):
        s = F.dropout(self.S, self.p, training=self.training)
        r = F.dropout(self.R, self.p, training=self.training)
        x = torch.cat([h(s, r, inter_mask, city_id, prov_id, batch)
                       for h in self.heads], dim=1)
        x = F.dropout(x, self.p, training=self.training)
        x = F.elu(self.out_att(x, inter_mask))
        return F.log_softmax(x, dim=1)


class RefGat(nn.Module):
    """GAT (GAT.py:38-58): learnable features, 2 heads + output layer."""

    def __init__(self, d, M, heads, dropout, gdp, N):
        super().__init__()
        self.p = dropout
        self.features = gdp_features(gdp, N, d)
        self.heads = nn.ModuleList(RefGatLayer(d, M, dropout)
                                   for _ in range(heads))
        self.out_att = RefGatLayer(d * heads, M, dropout)

    def forward(self, inter_mask, city_id, prov_id, batch):
        x = F.dropout(self.features, self.p, training=self.training)
        x = torch.cat([h(x, inter_mask) for h in self.heads], dim=1)
        x = F.dropout(x, self.p, training=self.training)
        x = F.elu(self.out_att(x, inter_mask))
        return F.log_softmax(x, dim=1)


class RefGcn(nn.Module):
    """GCN (model.py:11-64): gc3 dead, output is (N, nhid) log-softmax."""

    def __init__(self, nfeat, nhid, M, dropout, gdp, N):
        super().__init__()
        self.p = dropout
        gdp_vals = torch.tensor(list(gdp.values())).view(-1, 1)
        # model.py:52 keeps all nfeat columns and appends GDP (nfeat+1 wide)
        self.features = nn.Parameter(
            torch.cat((torch.rand([N, nfeat]), gdp_vals), dim=1))
        self.w1, self.b1 = self._gc(nfeat + 1, nhid)
        self.w2, self.b2 = self._gc(nhid, nhid)

    @staticmethod
    def _gc(d_in, d_out):
        # GraphConvolution: rand weight re-drawn uniform, *scalar* bias
        # (model.py:21-32 -- reference-literal, including the 0-dim bias)
        w = nn.Parameter(torch.rand([d_in, d_out]))
        b = nn.Parameter(torch.tensor(float(d_out)))
        stdv = 1.0 / (d_out ** 0.5)
        w.data.uniform_(-stdv, stdv)
        b.data.uniform_(-stdv, stdv)
        return w, b

    def forward(self, adj_norm, city_id, prov_id, batch):
        x = F.relu(adj_norm.T @ (self.features @ self.w1) + self.b1)  # (M,·)
        x = F.dropout(x, self.p, training=self.training)
        x = F.relu(adj_norm @ (x @ self.w2) + self.b2)  # (N, nhid)
        return F.log_softmax(x, dim=1)


class RefHgane(nn.Module):
    """HGANE batch-sliced layer as a standalone model (``HGANE.py:11-76``;
    the reference constructs it only in the commented ``train.py:202``).

    Exact-math reorganizations as elsewhere in this file: the (N,M,2d')
    inter concat and the (B,B,2d') intra concat decompose rank-1
    (``e12[i,j] = a.[h1_j || h2_i]``, ``e3[i,j] = a3.[h2_i || h2_j]``);
    the intra adjacency block ``adj_intra[batch[:,None], batch] > 0``
    equals city-group equality on the batch rows.  Driver = the same nll
    loop over the batch-sliced (B, M) scores with a log_softmax (matching
    every model the reference actually trains).  Dims follow the
    framework's hgane preset (in=128, out=64; the commented reference call
    says 64/64) so GOLDEN.md compares like for like."""

    def __init__(self, d_in, d_out, M, dropout, gdp, N):
        super().__init__()
        self.p, self.d_out = dropout, d_out
        gdp_vals = torch.tensor(list(gdp.values())).view(-1, 1)
        # HGANE.py:19 — built but never read in forward (kept: it consumes
        # RNG exactly as in the reference)
        self.features = nn.Parameter(
            torch.cat((torch.rand([N, d_in])[:, :-1], gdp_vals), dim=1))
        self.s_emb = nn.Parameter(torch.rand([N, d_in]))   # HGANE.py:20
        self.r_emb = nn.Parameter(torch.rand([M, d_in]))   # HGANE.py:21
        self.W1 = nn.Linear(d_in, d_out, bias=False)
        self.W2 = nn.Linear(d_in, d_out, bias=False)
        self.a12 = nn.Linear(2 * d_out, 1, bias=False)
        self.a3 = nn.Linear(2 * d_out, 1, bias=False)
        self.bn1 = nn.BatchNorm1d(d_out)
        self.bn2 = nn.BatchNorm1d(d_out)
        for lin in (self.W1, self.W2, self.a12, self.a3):
            nn.init.xavier_uniform_(lin.weight)            # HGANE.py:32-35

    def forward(self, inter_mask, city_id, prov_id, batch):
        d = self.d_out
        m_inter = inter_mask[batch]                                 # (B, M)
        m_intra = city_id[batch][:, None] == city_id[batch][None, :]
        h1 = self.W1(self.r_emb)                                    # (M, d')
        h2 = self.W2(self.s_emb[batch])                             # (B, d')
        a = self.a12.weight.view(-1)
        # inter_input[i,j] = [h1_j || h2_i]  (HGANE.py:45-46)
        e12 = F.leaky_relu((h1 @ a[:d])[None, :] + (h2 @ a[d:])[:, None],
                           0.2)
        a3 = self.a3.weight.view(-1)
        # intra_input[i,j] = [h2_i || h2_j]  (HGANE.py:50-51 — the one
        # place the reference does true pairwise attention)
        e3 = F.leaky_relu((h2 @ a3[:d])[:, None] + (h2 @ a3[d:])[None, :],
                          0.2)
        att_inter = torch.where(m_inter, e12, torch.full_like(e12, -9e15))
        att_intra = torch.where(m_intra, e3, torch.full_like(e3, -9e15))
        # joint denominator for intra only; inter normalised by its own sum
        # (HGANE.py:61-69)
        sum_county = (torch.exp(att_intra).sum(1, keepdim=True)
                      + torch.exp(att_inter).sum(1, keepdim=True))
        att_intra = F.dropout(torch.exp(att_intra) / sum_county, self.p,
                              training=self.training)
        att_inter = torch.exp(att_inter) / torch.exp(att_inter).sum(
            1, keepdim=True)
        att_inter = F.dropout(att_inter, self.p, training=self.training)
        # aggregation re-projects the RAW embeddings (HGANE.py:71-73)
        u = F.leaky_relu(self.bn1(
            self.W1(att_inter @ self.r_emb)
            + self.W2(att_intra @ self.s_emb[batch])), 0.2)
        v = F.leaky_relu(self.bn2(
            self.W1(att_inter.t() @ self.s_emb[batch])), 0.2)
        # log_softmax for the nll driver — what every model the reference
        # actually trains feeds F.nll_loss (matches training/tasks.py
        # hgane_task)
        return F.log_softmax(F.elu(u @ v.t()), dim=1)               # (B, M)


class RefSage(nn.Module):
    """GraphSAGE (SGAE.py:41-56): 2 linears, degree gate via adj rows."""

    def __init__(self, d_in, d_hid, M, gdp, N):
        super().__init__()
        self.S = gdp_features(gdp, N, d_in)
        self.l1 = nn.Linear(d_in, d_hid)
        self.l2 = nn.Linear(d_hid, M)

    def forward(self, adj_norm, batch):
        x = F.relu(self.l1(self.S[batch]))
        x = adj_norm[batch] * x  # SGAE.py:54 (needs d_hid == M)
        x = F.relu(self.l2(x))
        return F.log_softmax(x, dim=1)


# --------------------------------------------------------------------------
# LLP (LLP.py:200-304 with the SURVEY §2.2 #2/#3/#4 repairs)
# --------------------------------------------------------------------------
class RefMlp(nn.Module):
    """Student MLP (``LLP.py:36-84``, norm_type='none' as configured)."""

    def __init__(self, d, dropout, num_layers=2):
        super().__init__()
        self.p = dropout
        self.layers = nn.ModuleList(
            nn.Linear(d, d) for _ in range(num_layers))

    def forward(self, x):
        for i, layer in enumerate(self.layers):
            x = layer(x)
            if i != len(self.layers) - 1:
                x = F.dropout(F.relu(x), self.p, training=self.training)
        return x


class RefLinkPredictor(nn.Module):
    """Edge scorer (``LLP.py:86-115``): Hadamard, MLP tower, sigmoid.

    ``final_linear=True`` applies the commented-out output linear
    (``LLP.py:111``) so scores are per-edge scalars — the repair the
    framework defaults to (utils/config.py LLPConfig.final_linear)."""

    def __init__(self, d, dropout, num_layers=2, final_linear=True):
        super().__init__()
        self.p, self.final_linear = dropout, final_linear
        self.lins = nn.ModuleList(
            [nn.Linear(d, d) for _ in range(num_layers - 1)]
            + [nn.Linear(d, 1)])

    def forward(self, x_i, x_j):
        x = x_i * x_j
        for lin in self.lins[:-1]:
            x = F.dropout(F.relu(lin(x)), self.p, training=self.training)
        if self.final_linear:
            x = self.lins[-1](x)
        return torch.sigmoid(x)


class RefLlpTeacher(nn.Module):
    """Teacher GAT with external features (``LLP.py:148-168``)."""

    def __init__(self, d, M, heads, dropout):
        super().__init__()
        self.p = dropout
        self.heads = nn.ModuleList(RefGatLayer(d, M, dropout)
                                   for _ in range(heads))
        self.out_att = RefGatLayer(M * heads, M, dropout)

    def forward(self, x, mask):
        x = F.dropout(x, self.p, training=self.training)
        x = torch.cat([h(x, mask) for h in self.heads], dim=1)
        x = F.dropout(x, self.p, training=self.training)
        x = F.elu(self.out_att(x, mask))
        return F.log_softmax(x, dim=1)


def _binary_auc(pos, neg):
    scores = np.concatenate([pos, neg])
    labels = np.concatenate([np.ones_like(pos), np.zeros_like(neg)])
    return float(roc_auc_score(labels, scores))


def _hits_at_k(pos, neg, k):
    if len(neg) < k:
        return 1.0
    kth = np.sort(neg)[::-1][k - 1]
    return float(np.mean(pos > kth))


def run_llp(ds, epochs=10, batch_size=4096):
    """Repaired LLP recipe (``LLP.py:217-304``): frozen random teacher,
    BCE label loss on positive vs recipient-corrupted negative edges
    (repair #3 — BCELoss is imported and unused in the reference), the
    10/0.1/100 KD mix, Adam lr 5e-3, reference defaults (LLP.py:8-32).

    Documented divergences, matching the framework's repaired protocol
    (training/kd.py): features are drawn once per run instead of
    re-randomised every batch (the reference never optimises them and its
    own test() reuses the last batch's draw); the frozen teacher's
    embedding is computed once in eval mode.  Eval = binary AUC +
    Hits@20/50 of held-out positives vs fresh in-distribution recipient
    negatives (the declared metric surface, LLP.py:20)."""
    torch.manual_seed(42)
    train_ds, test_ds = random_split(
        ds, [int(0.9 * len(ds)), len(ds) - int(0.9 * len(ds))])
    train_loader = DataLoader(train_ds, batch_size=batch_size, shuffle=True)
    test_loader = DataLoader(test_ds, batch_size=batch_size, shuffle=False)
    inter_mask = ds.inter_adj > 0
    N, M, d = ds.N, ds.M, 32

    gdp_vals = torch.tensor(list(ds.gdp.values())).view(-1, 1)
    features = torch.cat((torch.rand([N, d])[:, :-1], gdp_vals), dim=1)
    student = RefMlp(d, 0.5)
    predictor = RefLinkPredictor(d, 0.5)
    teacher = RefLlpTeacher(d, M, 2, 0.5)
    teacher_pred = RefLinkPredictor(d, 0.5)
    teacher.eval()
    teacher_pred.eval()
    with torch.no_grad():  # frozen: params never in the optimiser
        t_h = teacher(features, inter_mask)
    opt = torch.optim.Adam(
        list(student.parameters()) + list(predictor.parameters()), lr=5e-3)
    neg_rng = np.random.default_rng(42)
    eval_rng = np.random.default_rng(7)

    history = []
    for epoch in range(epochs):
        t0 = time.time()
        student.train()
        predictor.train()
        tot = parts = None
        tot, nb = 0.0, 0
        parts = np.zeros(3)
        for src, dst in train_loader:
            neg = torch.from_numpy(
                neg_rng.integers(0, M, len(src)).astype(np.int64))
            opt.zero_grad()
            h = student(features)
            pos_s = predictor(h[src], h[dst]).squeeze(-1)
            neg_s = predictor(h[src], h[neg]).squeeze(-1)
            eps = 1e-7
            label = 0.5 * (
                -(pos_s.clamp(eps, 1 - eps)).log().mean()
                - (1 - neg_s.clamp(eps, 1 - eps)).log().mean())
            cos = 1 - F.cosine_similarity(h[src], t_h[src], dim=-1).mean()
            with torch.no_grad():
                t_pos = teacher_pred(t_h[src], t_h[dst]).squeeze(-1)
            mse = F.mse_loss(pos_s, t_pos)
            loss = 10.0 * label + 0.1 * cos + 100.0 * mse  # LLP.py:237-238
            loss.backward()
            opt.step()
            tot += loss.item()
            parts += [label.item(), cos.item(), mse.item()]
            nb += 1

        student.eval()
        predictor.eval()
        pos_all, srcs = [], []
        with torch.no_grad():
            h = student(features)
            for src, dst in test_loader:
                pos_all.append(
                    predictor(h[src], h[dst]).squeeze(-1).numpy())
                srcs.append(src.numpy())
            pos_all = np.concatenate(pos_all)
            srcs = np.concatenate(srcs)
            neg_dst = torch.from_numpy(
                eval_rng.integers(0, M, len(srcs)).astype(np.int64))
            neg_all = predictor(
                h[torch.from_numpy(srcs)], h[neg_dst]
            ).squeeze(-1).numpy()
        m = {
            "auc": _binary_auc(pos_all, neg_all),
            "hits@20": _hits_at_k(pos_all, neg_all, 20),
            "hits@50": _hits_at_k(pos_all, neg_all, 50),
            "label_loss": parts[0] / nb, "kd_cosine": parts[1] / nb,
            "kd_mse": parts[2] / nb,
        }
        m.update(epoch=epoch + 1, train_loss=tot / nb,
                 wall=round(time.time() - t0, 1))
        history.append(m)
        print(f"[llp] epoch {epoch+1}: loss={m['train_loss']:.4f} "
              f"auc={m['auc']:.4f} hits@20={m['hits@20']:.4f} "
              f"({m['wall']}s)", flush=True)
    return history


# --------------------------------------------------------------------------
# metrics (model.py:66-92 verbatim semantics)
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# ddi: torch-side anchor for the link-prediction quality config
# (VERDICT r4 #1).  GAT encoder + LinkPredictor (LLP.py:148-168 family +
# LLP.py:86-115) trained DIRECTLY (no KD) on the identical synthetic-ddi
# graph/split/negatives as GOLDEN's SparseGAT+LinkPredictor row — the
# split is imported from msha_gnn_tpu.data.ogb so the arrays are
# bit-identical, and Hits@20/50 uses the same fixed 100k uniform negatives.
#
# Semantics notes (each divergence documented, as elsewhere in this file):
#   * The literal reference GAT couples its embedding width to the mask's
#     second dim (attention = where(adj > 0, e, -9e15) with e = (N, M);
#     GAT.py:29-30), which on a homogeneous N-node graph forces
#     embedding_dim = N = 4,267 and an out-layer matmul of (N, 2N) @
#     (2N, N) ≈ 311 GFLOP per step — days on this 2-core host.  The
#     framework's documented repair of this family (models/gat.py:
#     SparseGATLayer) uses proper pairwise GAT logits over the edge list
#     at hidden = 64; this anchor implements THAT repaired architecture
#     in torch so the two sides are apples-to-apples.  (The literal
#     self-concat layer semantics are separately pinned by the flow-graph
#     `gat` family above and the framework's parity tests.)
#   * LinkPredictor: final linear repaired IN (LLP.py:111 comments it
#     out, leaving a (B, hidden) "score"); framework default
#     final_linear=True — matched here.
#   * Loss: BCE on pos=1/neg=0 uniform-negative pairs (repair of the
#     nll-on-sigmoid misuse, LLP.py:235; SURVEY §2.2 #3), Adam lr 5e-3
#     wd 0 (LLP.py:299), dropout 0.5, seed 42.
# --------------------------------------------------------------------------
class TorchSparseGATLayer(nn.Module):
    """Torch mirror of msha_gnn_tpu.models.gat.SparseGATLayer (f32)."""

    def __init__(self, in_f, out_f, dropout):
        super().__init__()
        self.W = nn.Parameter(torch.zeros(in_f, out_f))
        nn.init.xavier_uniform_(self.W.data, gain=1.414)
        self.a = nn.Parameter(torch.zeros(2 * out_f, 1))
        nn.init.xavier_uniform_(self.a.data, gain=1.414)
        self.dropout = dropout
        self.out_f = out_f

    def forward(self, x, snd, rcv, n):
        h = x @ self.W
        av = self.a.view(-1)
        s_src = h @ av[: self.out_f]
        s_dst = h @ av[self.out_f:]
        logits = F.leaky_relu(s_src[snd] + s_dst[rcv], negative_slope=0.2)
        # segment softmax over each sender row
        row_max = torch.full((n,), -1e30).scatter_reduce(
            0, snd, logits, reduce="amax", include_self=True)
        p = torch.exp(logits - row_max[snd])
        denom = torch.zeros(n).scatter_add(0, snd, p)
        att = p / denom.clamp_min(1e-30)[snd]
        att = F.dropout(att, self.dropout, training=self.training)
        out = torch.zeros(n, self.out_f).index_add(
            0, snd, att.unsqueeze(1) * h[rcv])
        return F.elu(out)


class TorchSparseGAT(nn.Module):
    def __init__(self, hidden, n_heads, dropout):
        super().__init__()
        self.heads = nn.ModuleList([
            TorchSparseGATLayer(hidden, hidden, dropout)
            for _ in range(n_heads)])
        self.out_att = TorchSparseGATLayer(hidden * n_heads, hidden, dropout)
        self.dropout = dropout

    def forward(self, x, snd, rcv, n):
        x = F.dropout(x, self.dropout, training=self.training)
        x = torch.cat([h(x, snd, rcv, n) for h in self.heads], dim=1)
        x = F.dropout(x, self.dropout, training=self.training)
        return self.out_att(x, snd, rcv, n)


class TorchLinkPredictor(nn.Module):
    """LLP.py:86-115 with the final linear repaired in (framework
    default final_linear=True)."""

    def __init__(self, hidden, num_layers, dropout):
        super().__init__()
        self.lins = nn.ModuleList()
        for _ in range(num_layers - 1):
            self.lins.append(nn.Linear(hidden, hidden))
        self.final = nn.Linear(hidden, 1)
        self.dropout = dropout

    def forward(self, x_i, x_j):
        x = x_i * x_j
        for lin in self.lins:
            x = F.dropout(F.relu(lin(x)), self.dropout,
                          training=self.training)
        return torch.sigmoid(self.final(x).squeeze(-1))


def _hits_at_k(pos, neg, k):
    if len(neg) < k:
        return 1.0
    thresh = np.sort(neg)[-k]
    return float((pos > thresh).mean())


def run_ddi(epochs=20, batch_size=16384, hidden=64, n_heads=2,
            num_layers=2, dropout=0.5, lr=5e-3, seed=42):
    # identical arrays to the framework run: same module, same seeds as
    # `cli linkpred --seed 42` (load_ddi(seed=42) + split_edges(seed=42))
    from msha_gnn_tpu.data.ogb import split_edges, synthetic_ddi

    split = split_edges(synthetic_ddi(seed=seed), seed=seed)  # 100k negs
    n = split["n"]
    g = split["graph"]
    e = g.num_edges
    snd = torch.from_numpy(np.asarray(g.senders)[:e].astype(np.int64))
    rcv = torch.from_numpy(np.asarray(g.receivers)[:e].astype(np.int64))

    torch.manual_seed(seed)
    model = TorchSparseGAT(hidden, n_heads, dropout)
    predictor = TorchLinkPredictor(hidden, num_layers, dropout)
    features = nn.Parameter(0.1 * torch.randn(n, hidden))
    opt = torch.optim.Adam(
        list(model.parameters()) + list(predictor.parameters())
        + [features], lr=lr)

    train_s, train_r = split["train_pos"]
    rng = np.random.default_rng(seed)
    history = []
    for epoch in range(epochs):
        t0 = time.time()
        model.train(), predictor.train()
        perm = rng.permutation(len(train_s))
        steps = len(perm) // batch_size
        tot = 0.0
        for s in range(steps):
            ids = perm[s * batch_size:(s + 1) * batch_size]
            ps = torch.from_numpy(train_s[ids].astype(np.int64))
            pr = torch.from_numpy(train_r[ids].astype(np.int64))
            ns = torch.from_numpy(rng.integers(0, n, batch_size))
            nr = torch.from_numpy(rng.integers(0, n, batch_size))
            opt.zero_grad()
            h = model(features, snd, rcv, n)
            pos = predictor(h[ps], h[pr])
            neg = predictor(h[ns], h[nr])
            loss = 0.5 * (F.binary_cross_entropy(
                pos.clamp(1e-7, 1 - 1e-7), torch.ones_like(pos))
                + F.binary_cross_entropy(
                    neg.clamp(1e-7, 1 - 1e-7), torch.zeros_like(neg)))
            loss.backward()
            opt.step()
            tot += loss.item()
        history.append({"epoch": epoch + 1, "loss": tot / max(steps, 1),
                        "wall": round(time.time() - t0, 1)})
        print(f"[ddi] epoch {epoch+1}: loss={history[-1]['loss']:.4f} "
              f"({history[-1]['wall']}s)", flush=True)

    model.eval(), predictor.eval()
    with torch.no_grad():
        h = model(features, snd, rcv, n)

        def scores(a, b):
            out = []
            for i in range(0, len(a), 65536):
                out.append(predictor(
                    h[torch.from_numpy(a[i:i+65536].astype(np.int64))],
                    h[torch.from_numpy(b[i:i+65536].astype(np.int64))],
                ).numpy())
            return np.concatenate(out)

        pos = scores(*split["test_pos"])
        neg = scores(*split["neg"])
    labels = np.concatenate([np.ones_like(pos), np.zeros_like(neg)])
    final = {
        "auc": float(roc_auc_score(labels, np.concatenate([pos, neg]))),
        "hits@20": _hits_at_k(pos, neg, 20),
        "hits@50": _hits_at_k(pos, neg, 50),
        "epochs": epochs, "batch_size": batch_size, "hidden": hidden,
        "dataset": split["name"],
    }
    print(f"[ddi] final: {final}", flush=True)
    history.append(final)
    return history


def ref_metrics(scores, labels, preds):
    y_bin = label_binarize(labels, classes=np.unique(labels))
    aucs = [roc_auc_score(y_bin[:, i], scores[:, i])
            for i in range(y_bin.shape[1])]
    acc = accuracy_score(labels, preds)
    out = {"auc": float(np.mean(aucs)), "accuracy": float(acc)}
    for avg in ("macro", "micro"):
        p = precision_score(labels, preds, average=avg, zero_division=1)
        r = recall_score(labels, preds, average=avg, zero_division=1)
        out[f"precision_{avg}"] = float(p)
        out[f"recall_{avg}"] = float(r)
        out[f"f1_{avg}"] = float(2 * p * r / (p + r))
    return out


# --------------------------------------------------------------------------
# drivers (train.py:217-282 / SGAE.py:88-147 semantics)
# --------------------------------------------------------------------------
def run_model(name, ds, epochs, batch_size):
    torch.manual_seed(42)  # repair #8
    train_ds, test_ds = random_split(
        ds, [int(0.9 * len(ds)), len(ds) - int(0.9 * len(ds))])
    train_loader = DataLoader(train_ds, batch_size=batch_size, shuffle=True)
    test_loader = DataLoader(test_ds, batch_size=batch_size, shuffle=False)

    inter_norm = normalize_adjacency(ds.inter_adj)
    inter_mask = ds.inter_adj > 0
    N, M = ds.N, ds.M

    if name == "ablation3":
        model = RefMsha(128, 64, M, 2, 0.5, ds.gdp, N, use_intra=False)
    elif name == "msha":
        model = RefMsha(128, 64, M, 2, 0.5, ds.gdp, N, use_intra=True)
    elif name == "gat":
        model = RefGat(32, M, 2, 0.5, ds.gdp, N)  # train.py:201
    elif name == "gcn":
        model = RefGcn(64, 128, M, 0.5, ds.gdp, N)  # train.py:200
    elif name == "sage":
        model = RefSage(32, 32, M, ds.gdp, N)  # SGAE.py:77
    elif name == "hgane":
        model = RefHgane(128, 64, M, 0.5, ds.gdp, N)
    else:
        raise ValueError(name)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=5e-4)

    def forward(batch):
        if name == "sage":
            return model(inter_norm, batch)
        if name == "gcn":
            return model(inter_norm, ds.city_id, ds.prov_id, batch)
        return model(inter_mask, ds.city_id, ds.prov_id, batch)

    history = []
    for epoch in range(epochs):
        t0 = time.time()
        model.train()
        tot = 0.0
        for src, dst in train_loader:
            opt.zero_grad()
            out = forward(src)
            # sage and hgane already emit batch-sliced rows
            rows_direct = name in ("sage", "hgane")
            loss = F.nll_loss(out if rows_direct else out[src], dst)
            tot += loss.item()
            loss.backward()
            opt.step()

        model.eval()
        scores, labels, test_loss = [], [], 0.0
        with torch.no_grad():
            for src, dst in test_loader:
                out = forward(src)
                rows = out if name in ("sage", "hgane") else out[src]
                test_loss += F.nll_loss(rows, dst).item()
                scores.append(rows.numpy())
                labels.append(dst.numpy())
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        m = ref_metrics(scores, labels, scores.argmax(1))
        m.update(epoch=epoch + 1, train_loss=tot / len(train_loader),
                 test_loss=test_loss / len(test_loader),
                 wall=round(time.time() - t0, 1))
        history.append(m)
        print(f"[{name}] epoch {epoch+1}: loss={m['train_loss']:.4f} "
              f"auc={m['auc']:.4f} acc={m['accuracy']:.4f} "
              f"({m['wall']}s)", flush=True)
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="gat,sage,gcn,ablation3,msha")
    ap.add_argument("--out", default="REFERENCE_RUNS.json")
    args = ap.parse_args()

    ds = FlowRecords()
    print(f"loaded 2015: N={ds.N} M={ds.M} records={len(ds)}", flush=True)

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    for name in args.models.split(","):
        t0 = time.time()
        if name == "llp":
            epochs, bs = 10, 4096  # LLP.py:16,30
            hist = run_llp(ds, epochs, bs)
        elif name == "ddi":
            epochs, bs = 20, 16384
            hist = run_ddi(epochs, bs)
        else:
            epochs, bs = (10, 512) if name == "sage" else (5, 64)
            hist = run_model(name, ds, epochs, bs)
        results[name] = {"epochs": epochs, "batch_size": bs,
                         "history": hist, "final": hist[-1],
                         "wall_total": round(time.time() - t0, 1)}
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(f"[{name}] done in {results[name]['wall_total']}s", flush=True)


if __name__ == "__main__":
    main()
