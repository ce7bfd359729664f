from .losses import bce_loss, kd_cosine, kd_loss, margin_rank_loss, mse_loss, nll_loss
from .metrics import (
    accuracy,
    classification_report,
    f1,
    hits_at_k,
    multiclass_auc,
    precision_recall,
)
from .optim import adam_l2, sgd_momentum
from .temporal import (TemporalMSHA, canonical_recipients,
                       run_temporal_train, train_temporal_msha)
from .tasks import (flow_inputs, gat_task, gcn_task, hgane_task,
                    msha_task, sage_task)
from .trainer import (
    Task,
    Trainer,
    TrainState,
    make_eval_multi_step,
    make_eval_step,
    make_train_multi_step,
    make_train_step,
)

__all__ = [
    "nll_loss",
    "bce_loss",
    "kd_cosine",
    "kd_loss",
    "mse_loss",
    "margin_rank_loss",
    "accuracy",
    "multiclass_auc",
    "precision_recall",
    "f1",
    "hits_at_k",
    "classification_report",
    "adam_l2",
    "sgd_momentum",
    "Task",
    "TrainState",
    "Trainer",
    "make_train_step",
    "make_train_multi_step",
    "make_eval_multi_step",
    "make_eval_step",
    "flow_inputs",
    "msha_task",
    "gat_task",
    "gcn_task",
    "sage_task",
    "hgane_task",
    "TemporalMSHA",
    "canonical_recipients",
    "run_temporal_train",
    "train_temporal_msha",
]
