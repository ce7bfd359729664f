"""Command-line entry points: ``python -m msha_gnn_tpu.cli <cmd>``.

Replaces the reference's script-per-experiment layout (``python train.py`` /
``LLP.py`` / ``SGAE.py``) with one CLI: ``train`` (flow classification for
every model preset), ``eval`` (checkpoint evaluation), ``llp`` (KD link
prediction), ``sgae``, ``linkpred``, ``explain`` (attention top-K
extraction), ``bench`` (kernel/step microbenchmarks).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def _add_dataclass_args(parser, cls):
    for f in dataclasses.fields(cls):
        if f.type in ("int", int):
            parser.add_argument(f"--{f.name}", type=int, default=f.default)
        elif f.type in ("float", float):
            parser.add_argument(f"--{f.name}", type=float, default=f.default)
        elif f.type in ("str", str):
            parser.add_argument(f"--{f.name}", type=str, default=f.default)
        elif f.type in ("Optional[str]",):
            parser.add_argument(f"--{f.name}", type=str, default=f.default)
        elif f.type in ("bool", bool):
            # BooleanOptionalAction also generates --no-<name>, so a field
            # defaulting to True stays switchable from the CLI
            parser.add_argument(f"--{f.name}",
                                action=argparse.BooleanOptionalAction,
                                default=f.default)


def _config_from_args(cls, args):
    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in vars(args).items() if k in names})


def _build_task(cfg, fg):
    """Model-preset dispatch shared by ``train`` and ``eval``."""
    from .training import (gat_task, gcn_task, hgane_task, msha_task,
                           sage_task)

    if cfg.model in ("msha", "ours", "ablation1", "ablation2", "ablation3"):
        flags = cfg.model_flags()
        n_heads = flags.pop("n_heads", cfg.n_heads)
        task, variables, _ = msha_task(
            fg, in_features=cfg.in_features, out_features=cfg.out_features,
            n_heads=n_heads, dropout=cfg.dropout, lr=cfg.lr,
            weight_decay=cfg.weight_decay, seed=cfg.seed, **flags,
        )
    elif cfg.model == "gat":
        task, variables, _ = gat_task(
            fg, n_heads=cfg.n_heads, dropout=cfg.dropout, lr=cfg.lr,
            weight_decay=cfg.weight_decay, seed=cfg.seed,
        )
    elif cfg.model == "gcn":
        task, variables, _ = gcn_task(
            fg, nfeat=cfg.in_features, dropout=cfg.dropout, lr=cfg.lr,
            weight_decay=cfg.weight_decay, seed=cfg.seed,
        )
    elif cfg.model == "hgane":
        task, variables, _ = hgane_task(
            fg, in_features=cfg.in_features, out_features=cfg.out_features,
            dropout=cfg.dropout, lr=cfg.lr,
            weight_decay=cfg.weight_decay, seed=cfg.seed,
        )
    elif cfg.model == "sage":
        task, variables, _ = sage_task(
            fg, in_features=cfg.in_features, dropout=cfg.dropout, lr=cfg.lr,
            weight_decay=cfg.weight_decay, seed=cfg.seed,
        )
    else:
        return None
    return task, variables


def cmd_train(args) -> int:
    import jax

    from .data import load_flow_graph, train_test_split_records
    from .training import (
        Trainer,
        TrainState,
        gat_task,
        gcn_task,
        msha_task,
        sage_task,
    )
    from .utils import JsonlLogger, TrainConfig

    cfg = _config_from_args(TrainConfig, args)
    log = JsonlLogger(cfg.log_path)
    years = [y for y in (cfg.years or "").split(",") if y]
    if years:
        # multi-year joint MSHA training (BASELINE config #3)
        if cfg.model not in ("msha", "ours", "ablation1", "ablation2",
                             "ablation3"):
            print("--years joint training supports the MSHA family only",
                  file=sys.stderr)
            return 2
        from .training import run_temporal_train

        flags = cfg.model_flags()
        n_heads = flags.pop("n_heads", cfg.n_heads)
        _, _, history = run_temporal_train(
            years=tuple(years), data_dir=cfg.data_dir, log=log,
            in_features=cfg.in_features, out_features=cfg.out_features,
            n_heads=n_heads, dropout=cfg.dropout, epochs=cfg.epochs,
            batch_size=cfg.batch_size, lr=cfg.lr,
            weight_decay=cfg.weight_decay,
            train_fraction=cfg.train_fraction, seed=cfg.seed, **flags,
        )
        print(json.dumps(history[-1]))
        return 0
    fg = load_flow_graph(cfg.year, cfg.data_dir)
    log({"event": "data", "n": fg.n_src, "m": fg.n_dst,
         "records": fg.num_records, "edges": fg.inter.num_edges})
    if fg.num_records == 0:
        print(
            f"year {cfg.year} has no Flow records in {cfg.data_dir} "
            "(Flow2016-2018.csv are absent upstream — see "
            ".MISSING_LARGE_BLOBS); only 2015 is trainable as shipped",
            file=sys.stderr,
        )
        return 2

    built = _build_task(cfg, fg)
    if built is None:
        print(f"unknown model {cfg.model!r}", file=sys.stderr)
        return 2
    task, variables = built

    src = np.asarray(fg.edge_src)
    dst = np.asarray(fg.edge_dst)
    train_ids, test_ids = train_test_split_records(
        fg.num_records, cfg.train_fraction, cfg.seed
    )
    state = TrainState.create(variables, task.tx)
    trainer = Trainer(task=task, src=src, labels=dst,
                      batch_size=cfg.batch_size, seed=cfg.seed, log=log)
    state, history = trainer.fit(state, train_ids, test_ids, cfg.epochs,
                                 rng_key=jax.random.key(cfg.seed),
                                 profile_dir=cfg.profile_dir)
    if cfg.checkpoint_dir:
        from .training.checkpoint import save_checkpoint

        save_checkpoint(cfg.checkpoint_dir, state, step=int(state.step))
    print(json.dumps(history[-1]))
    return 0


def cmd_eval(args) -> int:
    """Evaluate a checkpointed model on the held-out split (no training).

    The reference interleaves ``test()`` into every epoch (train.py:297-299)
    and has no way to evaluate a saved model; this is the standalone
    counterpart: restore from ``--checkpoint_dir``, run the eval pass,
    print the metric dict.
    """
    from .data import load_flow_graph, train_test_split_records
    from .training import Trainer, TrainState
    from .training.checkpoint import latest_step, restore_checkpoint
    from .utils import TrainConfig

    cfg = _config_from_args(TrainConfig, args)
    if not cfg.checkpoint_dir:
        print("eval requires --checkpoint_dir", file=sys.stderr)
        return 2
    fg = load_flow_graph(cfg.year, cfg.data_dir)
    built = _build_task(cfg, fg)
    if built is None:
        print(f"unknown model {cfg.model!r}", file=sys.stderr)
        return 2
    task, variables = built
    template = TrainState.create(variables, task.tx)
    step = latest_step(cfg.checkpoint_dir)
    if step is None:
        print(f"no checkpoint under {cfg.checkpoint_dir}", file=sys.stderr)
        return 2
    state, _, step = restore_checkpoint(cfg.checkpoint_dir, template)
    src = np.asarray(fg.edge_src)
    dst = np.asarray(fg.edge_dst)
    _, test_ids = train_test_split_records(
        fg.num_records, cfg.train_fraction, cfg.seed
    )
    trainer = Trainer(task=task, src=src, labels=dst,
                      batch_size=cfg.batch_size, seed=cfg.seed)
    metrics = trainer.evaluate(state, test_ids)
    metrics["checkpoint_step"] = int(step)
    print(json.dumps(metrics))
    return 0


def cmd_llp(args) -> int:
    from .training.kd import run_llp
    from .utils import JsonlLogger, LLPConfig

    cfg = _config_from_args(LLPConfig, args)
    result = run_llp(cfg, log=JsonlLogger(cfg.log_path))
    print(json.dumps(result))
    return 0


def cmd_sgae(args) -> int:
    from .training.sgae import run_sgae
    from .utils import JsonlLogger, SGAEConfig

    cfg = _config_from_args(SGAEConfig, args)
    result = run_sgae(cfg, log=JsonlLogger(cfg.log_path))
    print(json.dumps(result))
    return 0


def cmd_linkpred(args) -> int:
    from .data.ogb import load_ddi, split_edges
    from .training.link_prediction import LinkPredConfig, run_link_prediction
    from .utils import JsonlLogger

    data = load_ddi(root=args.ogb_root, seed=args.seed)
    split = split_edges(data, seed=args.seed)
    cfg = LinkPredConfig(
        hidden=args.hidden, n_heads=args.n_heads, dropout=args.dropout,
        lr=args.lr, epochs=args.epochs, batch_size=args.batch_size,
        neighbor_fanout=args.neighbor_fanout, use_kd=bool(args.use_kd),
        seed=args.seed, impl=args.impl,
    )
    result = run_link_prediction(split, cfg, log=JsonlLogger(args.log_path))
    print(json.dumps(result))
    return 0


def cmd_predict(args) -> int:
    """Batch inference from a checkpoint (serving surface; the reference
    has no inference path — predictions only exist inside its epoch-loop
    ``test()``, train.py:239-282)."""
    from .serving import run_predict
    from .utils import TrainConfig

    cfg = _config_from_args(TrainConfig, args)
    if not cfg.checkpoint_dir:
        print("predict requires --checkpoint_dir", file=sys.stderr)
        return 2
    summary = run_predict(cfg, nodes=args.nodes, top_k=args.top_k,
                          output=args.output or None,
                          batch_size=args.predict_batch)
    print(json.dumps(summary))
    return 0


def cmd_export(args) -> int:
    """Serialize a checkpoint's scoring function as a self-contained
    StableHLO artifact (``export.py``) for python-free serving infra."""
    from .export import run_export
    from .utils import TrainConfig

    cfg = _config_from_args(TrainConfig, args)
    if not cfg.checkpoint_dir:
        print("export requires --checkpoint_dir", file=sys.stderr)
        return 2
    summary = run_export(cfg, output=args.output, kind=args.kind,
                         batch_size=args.predict_batch,
                         portable=bool(args.portable))
    print(json.dumps(summary))
    return 0


def cmd_serve(args) -> int:
    """HTTP model server from a checkpoint (the deployment counterpart to
    ``predict``; see ``server.py``)."""
    from .server import run_serve
    from .utils import TrainConfig

    cfg = _config_from_args(TrainConfig, args)
    if not cfg.checkpoint_dir:
        print("serve requires --checkpoint_dir", file=sys.stderr)
        return 2
    run_serve(cfg, host=args.host, port=args.port,
              batch_size=args.predict_batch)
    return 0


def cmd_explain(args) -> int:
    from .explain import run_explain

    out = run_explain(
        year=args.year, data_dir=args.data_dir, model=args.model,
        epochs=args.epochs, top_k=args.top_k, output=args.output,
        npz_path=args.npz_path,
    )
    print(json.dumps({"written": out}))
    return 0


def cmd_bench(args) -> int:
    from .bench import run_bench

    print(json.dumps(run_bench(which=args.which)))
    return 0


def main(argv=None) -> int:
    from .utils.cache import enable_compilation_cache
    from .utils.debug import nan_guard_from_env

    enable_compilation_cache()
    nan_guard_from_env()
    parser = argparse.ArgumentParser(prog="msha_gnn_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    from .utils import LLPConfig, TrainConfig

    p_train = sub.add_parser("train", help="flow-classification training")
    _add_dataclass_args(p_train, TrainConfig)
    p_train.set_defaults(fn=cmd_train)

    p_eval = sub.add_parser(
        "eval", help="evaluate a checkpointed model on the test split"
    )
    _add_dataclass_args(p_eval, TrainConfig)
    p_eval.set_defaults(fn=cmd_eval)

    p_llp = sub.add_parser("llp", help="KD link prediction")
    _add_dataclass_args(p_llp, LLPConfig)
    p_llp.set_defaults(fn=cmd_llp)

    from .utils import SGAEConfig

    p_sgae = sub.add_parser("sgae", help="autoencoder pretrain + fine-tune")
    _add_dataclass_args(p_sgae, SGAEConfig)
    p_sgae.set_defaults(fn=cmd_sgae)

    p_lp = sub.add_parser("linkpred",
                          help="OGBL-DDI-style link prediction at scale")
    p_lp.add_argument("--ogb_root", default=None)
    p_lp.add_argument("--hidden", type=int, default=64)
    p_lp.add_argument("--n_heads", type=int, default=2)
    p_lp.add_argument("--dropout", type=float, default=0.5)
    p_lp.add_argument("--lr", type=float, default=5e-3)
    p_lp.add_argument("--epochs", type=int, default=10)
    p_lp.add_argument("--batch_size", type=int, default=4096)
    p_lp.add_argument("--neighbor_fanout", type=int, default=0)
    p_lp.add_argument("--use_kd", type=int, default=0)
    p_lp.add_argument("--seed", type=int, default=42)
    p_lp.add_argument("--impl", default="auto")
    p_lp.add_argument("--log_path", default=None)
    p_lp.set_defaults(fn=cmd_linkpred)

    p_pred = sub.add_parser(
        "predict", help="batch inference from a checkpoint"
    )
    _add_dataclass_args(p_pred, TrainConfig)
    p_pred.add_argument("--nodes", default="all",
                        help="'all', comma list, or @file of indices")
    p_pred.add_argument("--output", default=None,
                        help="JSONL path (default stdout)")
    p_pred.add_argument("--predict_batch", type=int, default=1024)
    p_pred.set_defaults(fn=cmd_predict)

    p_xp = sub.add_parser(
        "export", help="AOT StableHLO scorer artifact from a checkpoint"
    )
    _add_dataclass_args(p_xp, TrainConfig)
    p_xp.add_argument("--output", default="scorer.mshax")
    p_xp.add_argument("--kind", default="auto",
                      choices=["auto", "table", "batch"])
    p_xp.add_argument("--predict_batch", type=int, default=1024)
    p_xp.add_argument("--portable", type=int, default=0,
                      help="1: lower for both cpu and tpu")
    p_xp.set_defaults(fn=cmd_export)

    p_srv = sub.add_parser(
        "serve", help="HTTP model server from a checkpoint"
    )
    _add_dataclass_args(p_srv, TrainConfig)
    p_srv.add_argument("--host", default="127.0.0.1")
    p_srv.add_argument("--port", type=int, default=8000)
    p_srv.add_argument("--predict_batch", type=int, default=1024)
    p_srv.set_defaults(fn=cmd_serve)

    p_exp = sub.add_parser("explain", help="attention top-K extraction")
    p_exp.add_argument("--year", default="2015")
    p_exp.add_argument("--data_dir", default="/root/reference/anonymous_data")
    p_exp.add_argument("--model", default="msha")
    p_exp.add_argument("--epochs", type=int, default=1)
    p_exp.add_argument("--top_k", type=int, default=100)
    p_exp.add_argument("--output", default="explain.json")
    p_exp.add_argument("--npz_path", default=None)
    p_exp.set_defaults(fn=cmd_explain)

    p_bench = sub.add_parser("bench", help="microbenchmarks")
    p_bench.add_argument("--which", default="all")
    p_bench.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
