"""Golden end-to-end runs on the real 2015 data (reference default configs).

Run on the TPU chip; writes GOLDEN.md with achieved metrics so future
rounds can check for regressions (SURVEY §4 golden-run requirement).
"""
import json, time, sys
import jax
jax.config.update('jax_default_prng_impl', 'rbg')
import numpy as np

from msha_gnn_tpu.data import load_flow_graph, train_test_split_records
from msha_gnn_tpu.training import (Trainer, TrainState, msha_task, gat_task,
                                   gcn_task, hgane_task, sage_task)

fg = load_flow_graph('2015')
src = np.asarray(fg.edge_src); dst = np.asarray(fg.edge_dst)
train_ids, test_ids = train_test_split_records(fg.num_records, 0.9, 42)

rows = []
def run(name, builder, epochs, batch, **kw):
    t0 = time.time()
    task, variables, _ = builder(fg, seed=42, **kw)
    state = TrainState.create(variables, task.tx)
    tr = Trainer(task=task, src=src, labels=dst, batch_size=batch, seed=42)
    state, hist = tr.fit(state, train_ids, test_ids, epochs)
    h = hist[-1]
    rows.append((name, epochs, h, time.time()-t0))
    print(name, json.dumps(h), f"{time.time()-t0:.0f}s", flush=True)

# reference-default configs (train.py:206 & argparse defaults; SGAE.py:19-39)
run('ablation3 (reference flagship)', msha_task, 5, 64,
    in_features=128, out_features=64, use_intra=False)
run('msha (full joint softmax)', msha_task, 5, 64,
    in_features=128, out_features=64, use_intra=True)
run('gat', gat_task, 5, 64)
run('gcn', gcn_task, 5, 64, nfeat=64)
run('sage', sage_task, 10, 512, in_features=32)
run('hgane', hgane_task, 5, 64, in_features=128, out_features=64)

# preserve the manually-maintained sections below the classification table
tail = ""
try:
    old = open('GOLDEN.md').read()
    idx = old.find("## Link-prediction pipelines")
    if idx >= 0:
        tail = old[idx:]
except FileNotFoundError:
    pass

with open('GOLDEN.md', 'w') as f:
    f.write("# GOLDEN — end-to-end quality runs (real 2015 flow graph)\n\n")
    f.write("Fixed seed 42, reference-default configs, TPU v5e, rbg PRNG.\n")
    f.write("Regenerate with `python scripts_golden.py`.\n\n")
    f.write("| model | epochs | AUC | acc | f1_macro | f1_micro | test loss | wall |\n")
    f.write("|---|---|---|---|---|---|---|---|\n")
    for name, ep, h, w in rows:
        f.write(f"| {name} | {ep} | {h['auc']:.4f} | {h['accuracy']:.4f} | "
                f"{h['f1_macro']:.4f} | {h['f1_micro']:.4f} | {h['loss']:.4f} | {w:.0f}s |\n")
    if tail:
        f.write("\n" + tail)
print("written GOLDEN.md")
