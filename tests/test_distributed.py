"""Multi-host startup + per-host data sharding (parallel/distributed.py).

Single-process semantics are unit-tested directly; the real thing is
exercised by spawning a 2-process CPU cluster (``jax.distributed`` local
gloo backend, 4 virtual devices per process = 8 global) that forms a global
dp mesh, builds global arrays from per-host batch slices, and runs one
MLM train step — the pod-slice launch path of the reference's
``torch.distributed.launch`` stages (``Oscar/oscar/fewshot/
refcoco_cpt.py:516-522``, ``maskrcnn_benchmark/utils/comm.py:49-143``).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from cpt_tpu.parallel import distributed as D

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_host_shard_single_process():
    # identity when there is one process
    assert D.host_shard(list(range(5))) == [0, 1, 2, 3, 4]


def test_host_shard_strided_and_contiguous():
    items = list(range(10))
    # DistributedSampler-style rank::world interleave
    assert D.host_shard(items, index=1, count=3) == [1, 4, 7]
    # reference TOTAL_STEP/CUR_STEP contiguous split (last takes remainder)
    assert D.host_shard(items, index=0, count=3, strided=False) == [0, 1, 2]
    assert D.host_shard(items, index=2, count=3, strided=False) == [6, 7, 8, 9]


def test_initialize_noop_and_identities():
    # no env vars -> no-op single process
    assert D.initialize_from_env() is False
    assert D.process_count() == 1 and D.process_index() == 0
    assert D.is_main_process()
    assert D.allreduce_sum(3.0, 4.0) == (3.0, 4.0)
    D.sync("noop")


WORKER = r'''
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
from cpt_tpu.parallel import distributed as D
from cpt_tpu.parallel import mesh as meshlib

pid = int(os.environ["CPT_PROCESS_ID"])
assert D.initialize_from_env()
assert jax.process_count() == 2 and jax.device_count() == 8

mesh = meshlib.make_mesh(dp=8)
local = np.arange(4, dtype=np.float32) + pid * 4
g = D.global_batch(local, mesh)
total = float(jax.jit(lambda x: x.sum())(g))

# one real multi-host MLM train step: global batch 8, 4 examples per host
from cpt_tpu.config.bert import tiny_bert_config
from cpt_tpu.engine import train as train_lib
from cpt_tpu.models.bert.heads import REC_MLM_CPT

cfg = tiny_bert_config(vocab_size=512, hidden_size=64,
                       num_attention_heads=4, intermediate_size=128,
                       num_hidden_layers=2, img_feature_dim=20)
model = REC_MLM_CPT(cfg, dtype=jnp.float32)
rng = np.random.RandomState(0)          # same data on both hosts...
ids = rng.randint(0, 512, (8, 12)).astype(np.int32); ids[:, 3] = 103
feats = rng.randn(8, 6, 20).astype(np.float32)
lo = slice(pid * 4, pid * 4 + 4)        # ...each host feeds its slice
local_batch = (ids[lo], np.zeros((4, 12), np.int32),
               np.ones((4, 18), np.int32), feats[lo],
               np.full((4,), 3, np.int32), np.full((4,), 7, np.int32))
params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(ids),
                             jnp.zeros((8, 12), jnp.int32),
                             jnp.ones((8, 18), jnp.int32),
                             jnp.asarray(feats))
ocfg = train_lib.OptimConfig(learning_rate=1e-3, warmup_steps=1,
                             num_train_steps=4)
tx = train_lib.build_optimizer(params, ocfg)
state = train_lib.create_train_state(params, tx)
with mesh:
    rep = meshlib.replicated(mesh)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
    batch = D.global_batch(local_batch, mesh)
    step_fn = train_lib.make_mlm_train_step(model, tx)
    state, loss = step_fn(state, batch,
                          jax.device_put(jax.random.PRNGKey(1), rep))
    loss = float(loss)
D.sync("done")
print(json.dumps({{"pid": pid, "total": total, "loss": loss,
                  "shard": D.host_shard(list(range(10))),
                  "is_main": D.is_main_process()}}), flush=True)
'''


EXTRACT_WORKER = r'''
import json, os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from cpt_tpu.parallel import distributed as D
from cpt_tpu.tools.extract_features import main as extract_main

pid = int(os.environ["CPT_PROCESS_ID"])
assert D.initialize_from_env()
assert jax.process_count() == 2

# the reference's heaviest multi-process path: per-rank extraction of a
# contiguous task shard + gather (inference_ref.py:71-92, comm.py:49-143)
extract_main(["--tiny", "--synthetic", "4", "--dtype", "float32",
              "--shard_by_process", "--output", "pred.tsv"])
D.sync("extracted")
if D.is_main_process():
    from cpt_tpu.tools.merge_shards import main as merge_main
    merge_main(["--shards", "pred.shard*.tsv", "--output", "merged.tsv"])
    # single-process reference extraction of the same 4 tasks
    extract_main(["--tiny", "--synthetic", "4", "--dtype", "float32",
                  "--output", "single.tsv"])
    a = open("merged.tsv").read()
    b = open("single.tsv").read()
    print(json.dumps({{"pid": pid, "identical": a == b,
                      "rows": a.count(chr(10))}}), flush=True)
else:
    print(json.dumps({{"pid": pid, "identical": None, "rows": None}}),
          flush=True)
D.sync("done")
'''


@pytest.mark.slow
def test_two_process_host_sharded_extraction(tmp_path):
    """2-process cluster: each host extracts its --shard_by_process slice;
    the merged TSV is byte-identical to a single-process extraction
    (VERDICT r2 ask #7)."""
    worker = tmp_path / "worker.py"
    worker.write_text(EXTRACT_WORKER.format(repo=REPO))
    port = 21000 + os.getpid() % 9000
    procs = []
    for i in range(2):
        env = dict(os.environ,
                   CPT_COORDINATOR=f"localhost:{port}",
                   CPT_NUM_PROCESSES="2", CPT_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        # Gloo teardown can interleave its own stdout lines after ours —
        # parse the last JSON line, not the last line
        json_lines = [l for l in out.strip().splitlines()
                      if l.startswith("{")]
        outs.append(json.loads(json_lines[-1]))
    outs.sort(key=lambda o: o["pid"])
    assert outs[0]["identical"] is True
    assert outs[0]["rows"] == 4
    assert (tmp_path / "pred.shard0.tsv").exists()
    assert (tmp_path / "pred.shard1.tsv").exists()


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(repo=REPO))
    port = 20000 + os.getpid() % 10000
    procs = []
    for i in range(2):
        env = dict(os.environ,
                   CPT_COORDINATOR=f"localhost:{port}",
                   CPT_NUM_PROCESSES="2", CPT_PROCESS_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        # Gloo teardown can interleave its own stdout lines after ours —
        # parse the last JSON line, not the last line
        json_lines = [l for l in out.strip().splitlines()
                      if l.startswith("{")]
        outs.append(json.loads(json_lines[-1]))
    outs.sort(key=lambda o: o["pid"])
    # global reduction saw both hosts' data: sum(0..7) = 28
    assert outs[0]["total"] == outs[1]["total"] == 28.0
    # SPMD: both hosts computed the identical global loss
    assert np.isfinite(outs[0]["loss"])
    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], rel=1e-6)
    assert outs[0]["shard"] == [0, 2, 4, 6, 8]
    assert outs[1]["shard"] == [1, 3, 5, 7, 9]
    assert outs[0]["is_main"] and not outs[1]["is_main"]
