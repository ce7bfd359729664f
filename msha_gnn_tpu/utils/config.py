"""Unified config tree replacing the reference's three duplicated argparse
blocks (``train.py:20-41``, ``LLP.py:8-32``, ``SGAE.py:19-39`` — SURVEY
§2.1 #18).  Presets carry the reference defaults verbatim so golden runs are
reproducible; unlike the reference, ``seed`` is actually applied.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    model: str = "msha"          # msha | ablation1 | ablation2 | ablation3 |
                                 # gat | gcn | sage | hgane
    year: str = "2015"
    data_dir: str = "/root/reference/anonymous_data"
    epochs: int = 5
    lr: float = 1e-3
    weight_decay: float = 5e-4
    batch_size: int = 64
    in_features: int = 128
    out_features: int = 64       # hidden per head
    n_heads: int = 2
    dropout: float = 0.5
    seed: int = 42
    train_fraction: float = 0.9
    years: str = ""              # comma list -> joint multi-year training
    top_k: int = 100             # explainer K (train.py:39-40)
    log_path: Optional[str] = None
    checkpoint_dir: Optional[str] = None
    profile_dir: Optional[str] = None  # jax.profiler trace output (§5.1)

    def model_flags(self):
        """Map a model preset name to MSHA-family flags."""
        return {
            "msha": dict(use_intra=True, joint_softmax=True, use_out_att=True),
            "ours": dict(use_intra=True, joint_softmax=True, use_out_att=True),
            "ablation1": dict(use_intra=True, joint_softmax=True,
                              use_out_att=False, n_heads=1),
            "ablation2": dict(use_intra=True, joint_softmax=False,
                              use_out_att=True),
            "ablation3": dict(use_intra=False, joint_softmax=True,
                              use_out_att=True),
        }[self.model]


@dataclasses.dataclass
class LLPConfig:
    """KD link-prediction pipeline (``LLP.py:8-32`` defaults)."""

    year: str = "2015"
    data_dir: str = "/root/reference/anonymous_data"
    num_layers: int = 2
    hidden_channels: int = 32
    dropout: float = 0.5
    lr: float = 5e-3
    epochs: int = 10
    eval_steps: int = 5          # evaluate every k epochs (LLP.py:18)
    predictor: str = "mlp"       # mlp | inner
    patience: int = 100          # early-stop after k evals w/o improvement
    metric: str = "hits@20"      # auc | hits@20 | hits@50 (LLP.py:20)
    val_fraction: float = 0.0    # carve a val split out of the train records
    use_valedges_as_input: bool = False  # val edges join the teacher's graph
                                 # (LLP.py:21; only meaningful with a val split
                                 # — the teacher graph then uses train edges
                                 # only, +val when this flag is set)
    kd_rank: float = 0.0         # weight of the margin-rank KD term
                                 # (reference declares --margin, LLP.py:25,
                                 # but never implements the loss)
    final_linear: bool = True    # False reproduces the shipped predictor
                                 # (final linear commented out, LLP.py:111)
    eval_mode: str = "link"      # link (OGB AUC/Hits@K vs sampled recipient
                                 # negatives) | multiclass (the reference's
                                 # literal test(): the predictor's (B, 32)
                                 # output scored as recipient classes,
                                 # LLP.py:250-286; needs final_linear=False
                                 # and hidden_channels == n_dst)
    true_label: float = 10.0
    kd_f: float = 0.1
    kd_p: float = 100.0
    margin: float = 0.1
    rw_step: int = 3             # nearby-node sampling repetitions
    ns_rate: int = 1             # negatives per positive
    hops: int = 2                # random-walk length
    ps_method: str = "nb"        # positive sampling: rw | nb
    ps_samples: int = 0          # anchors per epoch for sampled KD-only
                                 # positive pairs (LLP.py declares the
                                 # rw/nb samplers but no count; 0 = off,
                                 # i.e. train on observed records only)
    batch_size: int = 4096
    seed: int = 42
    teacher_heads: int = 2
    log_path: Optional[str] = None


@dataclasses.dataclass
class SGAEConfig:
    """GraphSAGE driver (``SGAE.py:19-39`` defaults) + autoencoder pretrain."""

    year: str = "2015"
    data_dir: str = "/root/reference/anonymous_data"
    epochs: int = 10
    lr: float = 1e-3
    weight_decay: float = 5e-4
    batch_size: int = 512
    in_features: int = 32
    dropout: float = 0.5
    seed: int = 42
    pretrain_epochs: int = 0     # SGAE embedding pretrain (config #2)
    years: str = ""              # comma list -> temporal multi-year pretrain
    log_path: Optional[str] = None
