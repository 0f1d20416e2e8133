"""True process_count>1 tests (2 CPU processes, gloo collectives).

VERDICT round 1 #3 done-criterion: with the batch sharded across hosts, the
epoch metrics every host computes must equal the single-host run on the same
data — EpochCollector all-gathers the per-sample arrays at epoch end, so the
best-checkpoint gate sees the true global balanced accuracy (exact-metrics
semantics of reference metrics.py:7-70).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nkbx.metrics import compute_metrics
from nkbx.train.engine import EpochCollector


assert jax.process_count() == 2 and jax.device_count() == 4
mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))

def dist(host_rows):  # process-local rows -> global sharded array
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), host_rows)

col = EpochCollector("single")
r = np.random.default_rng(0)
for b in range(3):  # 3 steps x global batch 8 (4 rows per host)
    conf = r.random((8, 3)).astype(np.float32)
    conf /= conf.sum(1, keepdims=True)
    gt = r.integers(0, 3, 8).astype(np.int64)
    pred = conf.argmax(1).astype(np.int64)
    mask = np.ones(8, bool)
    if b == 2:
        mask[5:] = False  # padded rows in the final global batch
    lo, hi = pid * 4, pid * 4 + 4
    col.log_iter({
        "confidences": dist(conf[lo:hi]),
        "predictions": dist(pred[lo:hi]),
        "ground_truth": dist(gt[lo:hi]),
        "mask": dist(mask[lo:hi]),
        "loss": jax.device_put(np.float32(0.25 * (b + 1)),
                               NamedSharding(mesh, P())),  # global replicated scalar
    })
res = col.get_epoch_results()
metrics = compute_metrics({"task": "single"}, res)
payload = {
    "ground_truth": res["ground_truth"],
    "predictions": res["predictions"],
    "confidences": np.asarray(res["confidences"]).round(6).tolist(),
    "running_loss": [float(x) for x in res["running_loss"]],
    "epoch_acc": metrics["epoch_acc"],
}
with open(os.path.join(out_dir, f"proc{pid}.json"), "w") as f:
    json.dump(payload, f)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_process_results(tmp_path_factory):
    out = tmp_path_factory.mktemp("mh")
    script = out / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port), str(out)],
                         env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in (0, 1)
    ]
    for p in procs:
        try:
            stdout, stderr = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"STDOUT:{stdout[-2000:]}\nSTDERR:{stderr[-3000:]}"
    return [json.loads((out / f"proc{i}.json").read_text()) for i in (0, 1)]


def _single_host_expected():
    """The same data evaluated on one host (the reference-exact path)."""
    from sklearn.metrics import balanced_accuracy_score

    r = np.random.default_rng(0)
    gts, preds = [], []
    for b in range(3):
        conf = r.random((8, 3)).astype(np.float32)
        conf /= conf.sum(1, keepdims=True)
        gt = r.integers(0, 3, 8).astype(np.int64)
        pred = conf.argmax(1).astype(np.int64)
        n_valid = 5 if b == 2 else 8
        gts.extend(gt[:n_valid].tolist())
        preds.extend(pred[:n_valid].tolist())
    return gts, preds, balanced_accuracy_score(gts, preds)


class TestGlobalMetricsAcrossProcesses:
    def test_hosts_agree(self, two_process_results):
        a, b = two_process_results
        assert a == b

    def test_equal_to_single_host_run(self, two_process_results):
        gts, preds, acc = _single_host_expected()
        res = two_process_results[0]
        assert res["ground_truth"] == gts
        assert res["predictions"] == preds
        assert len(res["confidences"]) == len(gts)
        np.testing.assert_allclose(res["epoch_acc"], acc, rtol=1e-12)
        np.testing.assert_allclose(res["running_loss"], [0.25, 0.5, 0.75], rtol=1e-6)


# ---------------------------------------------------------------------------
# Full-training lockstep: 2-process sharded training == single-process run
# ---------------------------------------------------------------------------

TRAIN_WORKER = """
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]; data_root = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import jax.numpy as jnp
import numpy as np

import nkbx.transforms as T
from nkbx.data import get_dataset
from nkbx.metrics import compute_metrics
from nkbx.models import get_model
from nkbx.parallel import make_mesh, replicated_sharding
from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer
from nkbx.train.engine import EpochCollector, train_epoch

pipe = T.Compose([T.Resize(24, 24), T.Normalize()])
loader = get_dataset({"root": data_root, "batch_size": 4, "shuffle": True,
                      "num_workers": 0, "size": (24, 24), "seed": 0,
                      "drop_last": False}, pipe)
model = get_model({"task": "single", "model": "resnet_tiny_test", "pretrained": False},
                  loader.dataset.classes, input_size=(24, 24), seed=0,
                  dtype=jnp.float32)
criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.01})
# scan_steps=2 also exercises the stacked (K, B, ...) multi-host batch
# sharding (P(None, 'data') + make_array_from_process_local_data)
step = build_train_step(model, criterion, bundle, augment_fn=pipe.device_apply,
                        masked_bn=True, scan_steps=2)
state = TrainState.create(model.params, model.batch_stats, bundle.tx)
mesh = make_mesh(n_data=4)
state = jax.device_put(state, replicated_sharding(mesh))

state, results = train_epoch(state, loader, step, 0, jax.random.PRNGKey(0),
                             1.0, 1.0, epoch_logger=EpochCollector("single"),
                             mesh=mesh, progress=False)
metrics = compute_metrics({"task": "single"}, results)

# multi-host checkpoint: orbax save with cross-process barriers, then a
# restore that must reproduce the trained params exactly
from nkbx.train.checkpoint import restore_train_state, save_checkpoint

ckpt_dir = os.path.join(out_dir, "ckpt")
save_checkpoint(ckpt_dir, state, epoch=0, best_val_acc=0.5)
template = TrainState.create(model.params, model.batch_stats, bundle.tx)
template = jax.device_put(template, replicated_sharding(mesh))
restored, r_epoch, r_best = restore_train_state(ckpt_dir, template)
assert r_epoch == 0 and abs(r_best - 0.5) < 1e-9
for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                jax.tree_util.tree_leaves(state.params)):
    import numpy as _np
    _np.testing.assert_array_equal(_np.asarray(a.addressable_data(0)),
                                   _np.asarray(b.addressable_data(0)))

from jax.experimental import multihost_utils
params = multihost_utils.process_allgather(state.params, tiled=True)
flat = {jax.tree_util.keystr(p): np.asarray(v).ravel()[:5].round(6).tolist()
        for p, v in jax.tree_util.tree_leaves_with_path(params)}
checksum = float(sum(np.abs(np.asarray(v)).sum()
                     for v in jax.tree_util.tree_leaves(params)))
with open(os.path.join(out_dir, f"train{pid}.json"), "w") as f:
    json.dump({"params_head": flat, "checksum": round(checksum, 4),
               "running_loss": [round(float(x), 5) for x in results["running_loss"]],
               "epoch_acc": metrics["epoch_acc"],
               "checkpoint_ok": os.path.isdir(ckpt_dir),
               "ground_truth": results["ground_truth"]}, f)
"""


@pytest.fixture(scope="module")
def lockstep_dataset(tmp_path_factory):
    """22 images (NOT divisible by batch or process count -> sentinel padding
    + a partial masked-BN batch on every path)."""
    import cv2

    root = tmp_path_factory.mktemp("mhdata")
    r = np.random.default_rng(9)
    count = 0
    for ci, cls in enumerate(("a", "b")):
        d = root / cls
        d.mkdir()
        for i in range(11):
            img = r.integers(0, 255, (24, 24, 3), dtype=np.uint8)
            img = np.clip(img.astype(np.int32) + (60 if ci else -60), 0, 255).astype(np.uint8)
            cv2.imwrite(str(d / f"{i}.png"), img[:, :, ::-1])
            count += 1
    assert count == 22
    return root


@pytest.fixture(scope="module")
def lockstep_runs(lockstep_dataset, tmp_path_factory):
    out = tmp_path_factory.mktemp("mhtrain")
    script = out / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port),
                          str(out), str(lockstep_dataset)],
                         env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in (0, 1)
    ]
    for p in procs:
        stdout, stderr = p.communicate(timeout=560)
        assert p.returncode == 0, f"STDOUT:{stdout[-2000:]}\nSTDERR:{stderr[-3000:]}"
    return [json.loads((out / f"train{i}.json").read_text()) for i in (0, 1)]


def _single_process_run(lockstep_dataset):
    """Same data, one process, global batch 8 (= 2 hosts x 4): the strided
    split means every step sees the identical sample SET."""
    import jax
    import jax.numpy as jnp

    import nkbx.transforms as T
    from nkbx.data import get_dataset
    from nkbx.metrics import compute_metrics
    from nkbx.models import get_model
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer
    from nkbx.train.engine import EpochCollector, train_epoch

    pipe = T.Compose([T.Resize(24, 24), T.Normalize()])
    loader = get_dataset({"root": str(lockstep_dataset), "batch_size": 8,
                          "shuffle": True, "num_workers": 0, "size": (24, 24),
                          "seed": 0, "drop_last": False}, pipe)
    model = get_model({"task": "single", "model": "resnet_tiny_test",
                       "pretrained": False}, loader.dataset.classes,
                      input_size=(24, 24), seed=0, dtype=jnp.float32)
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.01})
    step = build_train_step(model, criterion, bundle, augment_fn=pipe.device_apply,
                            masked_bn=True)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)
    state, results = train_epoch(state, loader, step, 0, jax.random.PRNGKey(0),
                                 1.0, 1.0, epoch_logger=EpochCollector("single"),
                                 progress=False)
    metrics = compute_metrics({"task": "single"}, results)
    checksum = float(sum(np.abs(np.asarray(v)).sum()
                         for v in jax.tree_util.tree_leaves(state.params)))
    return results, metrics, checksum


class TestFullTrainingLockstep:
    def test_hosts_agree(self, lockstep_runs):
        a, b = lockstep_runs
        assert a["params_head"] == b["params_head"]
        assert a["running_loss"] == b["running_loss"]
        assert a["epoch_acc"] == b["epoch_acc"]

    def test_multi_host_checkpoint_roundtrip(self, lockstep_runs):
        # the worker saved an orbax checkpoint across both processes and
        # restored it to bit-equal params (barriers + atomic swap exercised)
        assert all(r["checkpoint_ok"] for r in lockstep_runs)

    def test_matches_single_process(self, lockstep_dataset, lockstep_runs):
        results, metrics, checksum = _single_process_run(lockstep_dataset)
        mh = lockstep_runs[0]
        # identical sample sets per step -> same loss trajectory and metrics
        # (augment rng differs only if keyed per-row; flips are per-POSITION in
        # the batch, so compare losses loosely and the no-augment-sensitive
        # quantities tightly)
        assert sorted(mh["ground_truth"]) == sorted(results["ground_truth"])
        assert len(mh["running_loss"]) == len(results["running_loss"])
        np.testing.assert_allclose(mh["checksum"], checksum, rtol=2e-3)
        np.testing.assert_allclose(mh["epoch_acc"], metrics["epoch_acc"], atol=0.35)


# ---------------------------------------------------------------------------
# Fused Pallas attention across processes: the shard_map lowering must hold
# when the mesh's data axis spans hosts (per-shard kernel + cross-host summed
# bias gradient) — 2-process run == single-process run, exactly.
# ---------------------------------------------------------------------------

SWIN_WORKER = """
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
sys.path.insert(0, os.environ["NKBX_TEST_HELPER_DIR"])
from swin_lockstep_common import run_training

losses, checksum = run_training(mesh_devices=4, local_slice=(pid * 4, pid * 4 + 4))
with open(os.path.join(out_dir, f"swin{pid}.json"), "w") as f:
    json.dump({"running_loss": [round(float(x), 6) for x in losses],
               "checksum": round(checksum, 5)}, f)
"""

SWIN_COMMON = '''
"""Shared trainer for the fused-swin multi-host lockstep test: deterministic
synthetic batches; each process feeds its local slice of the global batch 8."""
import jax
import jax.numpy as jnp
import numpy as np


def run_training(mesh_devices, local_slice):
    from nkbx.models.classifier import ClassificationModel, SingletaskClassifier
    from nkbx.models.swin import SwinTransformer
    from nkbx.parallel import make_mesh, replicated_sharding
    from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer
    from nkbx.train.engine import EpochCollector, train_epoch

    bb = SwinTransformer(embed_dim=8, depths=(2,), n_heads=(2,), patch_size=4,
                         window=2, fused_attention=True, dtype=jnp.float32)
    module = SingletaskClassifier(backbone=bb, n_classes=3)
    variables = dict(module.init({"params": jax.random.PRNGKey(0)},
                                 jnp.zeros((1, 16, 16, 3)), train=False))
    model = ClassificationModel(module, variables, ["a", "b", "c"], "single", 8)
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
    step = build_train_step(model, criterion, bundle)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)
    mesh = make_mesh(n_data=mesh_devices)
    state = jax.device_put(state, replicated_sharding(mesh))

    r = np.random.default_rng(3)
    X = np.stack([np.full((16, 16, 3), (i % 3) * 0.3, np.float32)
                  + r.normal(0, .05, (16, 16, 3)) for i in range(24)]
                 ).astype(np.float32)
    Y = (np.arange(24) % 3).astype(np.int64)
    lo, hi = local_slice

    class Loader:
        def epoch(self, e):
            for b in range(3):
                g = slice(b * 8, (b + 1) * 8)
                img, lab = X[g], Y[g]
                yield {"image": img[lo:hi], "label": lab[lo:hi],
                       "mask": np.ones(hi - lo, bool)}

        def __len__(self):
            return 3

    state, results = train_epoch(state, Loader(), step, 0,
                                 jax.random.PRNGKey(0), 1.0, 1.0,
                                 epoch_logger=EpochCollector("single"),
                                 mesh=mesh, progress=False)
    from jax.experimental import multihost_utils

    params = (multihost_utils.process_allgather(state.params, tiled=True)
              if jax.process_count() > 1 else state.params)
    checksum = float(sum(np.abs(np.asarray(v)).sum()
                         for v in jax.tree_util.tree_leaves(params)))
    return [float(x) for x in results["running_loss"]], checksum
'''


@pytest.fixture(scope="module")
def swin_lockstep_runs(tmp_path_factory):
    out = tmp_path_factory.mktemp("mhswin")
    (out / "swin_lockstep_common.py").write_text(SWIN_COMMON)
    script = out / "swin_worker.py"
    script.write_text(SWIN_WORKER)
    port = _free_port()
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env["NKBX_TEST_HELPER_DIR"] = str(out)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port), str(out)],
                         env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for pid in (0, 1)
    ]
    for p in procs:
        stdout, stderr = p.communicate(timeout=560)
        assert p.returncode == 0, f"STDOUT:{stdout[-2000:]}\nSTDERR:{stderr[-3000:]}"
    runs = [json.loads((out / f"swin{i}.json").read_text()) for i in (0, 1)]
    return runs, out


PREEMPT_WORKER = """
import json, os, sys
pid = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
from nkbx.train import preempt

preempt.reset()
# neither host flagged: both must agree False (the collective still runs on
# both hosts — identical branch structure is the whole point)
clear = preempt.agreed()
# only host 1 receives the "signal": both must agree True (OR-reduction)
if pid == 1:
    preempt._handler(None, None)
flagged = preempt.agreed()
with open(os.path.join(out_dir, f"pre{pid}.json"), "w") as f:
    json.dump({"clear": clear, "flagged": flagged}, f)
"""


PREEMPT_MIDEPOCH_WORKER = """
import json, os, sys, types
pid = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]; data_root = sys.argv[4]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
import jax.numpy as jnp
import numpy as np

import nkbx.transforms as T
from nkbx.data import get_dataset
from nkbx.models import get_model
from nkbx.parallel import make_mesh, replicated_sharding
from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer, preempt
from nkbx.train.checkpoint import load_cursor, restore_train_state, save_checkpoint
from nkbx.train.engine import EpochCollector, train_epoch

pipe = T.Compose([T.Resize(24, 24), T.Normalize()])

def make():
    loader = get_dataset({"root": data_root, "batch_size": 4, "shuffle": True,
                          "num_workers": 0, "size": (24, 24), "seed": 0,
                          "drop_last": False}, pipe)
    model = get_model({"task": "single", "model": "resnet_tiny_test",
                       "pretrained": False}, loader.dataset.classes,
                      input_size=(24, 24), seed=0, dtype=jnp.float32)
    criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
    bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.01})
    step = build_train_step(model, criterion, bundle,
                            augment_fn=pipe.device_apply, masked_bn=True)
    state = TrainState.create(model.params, model.batch_stats, bundle.tx)
    mesh = make_mesh(n_data=4)  # 2 procs x 2 forced host devices
    return loader, step, jax.device_put(state, replicated_sharding(mesh)), mesh

cfg = types.SimpleNamespace(task="single", preempt_sync_every=1)
key = jax.random.PRNGKey(0)

def checksum(params):
    from jax.experimental import multihost_utils
    p = multihost_utils.process_allgather(params, tiled=True)
    return float(sum(np.abs(np.asarray(v)).sum()
                     for v in jax.tree_util.tree_leaves(p)))

# phase A: uninterrupted epoch (22 imgs / 2 hosts -> 3 batches per host)
preempt.reset()
loader, step, state, mesh = make()
state, res = train_epoch(state, loader, step, 0, key, 1.0, 1.0,
                         epoch_logger=EpochCollector("single"), mesh=mesh,
                         progress=False, cfg=cfg)
full_checksum = checksum(state.params)
full_batches = res["consumed_batches"]

# phase B: ONLY host 1 gets the signal while yielding batch index 1 -> both
# hosts must agree-break at the SAME index via the cadence collective
loader, step, state, mesh = make()

class FlagAt:
    def __init__(self, inner, after):
        self.inner, self.after = inner, after
    def epoch(self, e, start_batch=0):
        it = self.inner.epoch(e, start_batch) if start_batch else self.inner.epoch(e)
        for i, b in enumerate(it):
            if pid == 1 and i == self.after:
                preempt._handler(None, None)
            yield b
    def __len__(self):
        return len(self.inner)

state, res = train_epoch(state, FlagAt(loader, 1), step, 0, key, 1.0, 1.0,
                         epoch_logger=EpochCollector("single"), mesh=mesh,
                         progress=False, cfg=cfg)
assert res["preempted"], "both hosts must take the preempt branch"
consumed = res["consumed_batches"]
preempt.reset()
ckpt = os.path.join(out_dir, "ckpt")
save_checkpoint(ckpt, state, -1, 0.0,
                cursor={"epoch": 0, "batch": consumed,
                        "step": int(jax.device_get(state.step)),
                        "batch_size": 4, "process_count": 2})

# resume: fresh build, restore, continue from the cursor
loader2, step2, template, mesh = make()
restored, _, _ = restore_train_state(ckpt, template)
cur = load_cursor(ckpt)
state2, res2 = train_epoch(restored, loader2, step2, 0, key, 1.0, 1.0,
                           epoch_logger=EpochCollector("single"), mesh=mesh,
                           progress=False, cfg=cfg, start_batch=cur["batch"])
with open(os.path.join(out_dir, f"mid{pid}.json"), "w") as f:
    json.dump({"consumed_at_break": int(consumed),
               "resumed_total": int(res2["consumed_batches"]),
               "full_batches": int(full_batches),
               "full_checksum": round(full_checksum, 6),
               "resumed_checksum": round(checksum(state2.params), 6)}, f)
"""


class TestMidEpochPreemptAcrossProcesses:
    def test_agreed_break_and_resume_matches_uninterrupted(
            self, lockstep_dataset, tmp_path):
        """Round-5: multi-host SIGTERM is honored MID-epoch — a one-sided
        signal makes every host break at the same agreed batch index
        (preempt_sync_every cadence), the cursor checkpoint saves across
        hosts, and the resumed 2-process run reproduces the uninterrupted
        2-process epoch exactly."""
        script = tmp_path / "mid_worker.py"
        script.write_text(PREEMPT_MIDEPOCH_WORKER)
        port = _free_port()
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
        procs = [
            subprocess.Popen([sys.executable, str(script), str(pid), str(port),
                              str(tmp_path), str(lockstep_dataset)],
                             env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE, text=True)
            for pid in (0, 1)
        ]
        for p in procs:
            stdout, stderr = p.communicate(timeout=560)
            assert p.returncode == 0, f"STDOUT:{stdout[-2000:]}\nSTDERR:{stderr[-3000:]}"
        runs = [json.loads((tmp_path / f"mid{i}.json").read_text()) for i in (0, 1)]
        assert runs[0] == runs[1]
        r = runs[0]
        # the one-sided flag (host 1, batch idx 1) broke BOTH hosts at the
        # same point, before the epoch end
        assert 0 < r["consumed_at_break"] < r["full_batches"]
        assert r["resumed_total"] == r["full_batches"]
        assert r["resumed_checksum"] == r["full_checksum"]


class TestPreemptAgreedAcrossProcesses:
    def test_one_sided_sigterm_is_agreed_by_all(self, tmp_path):
        """VERDICT r4 / ADVICE medium: a SIGTERM delivered to ONE host must
        make EVERY host take the stop branch (otherwise the flagged host
        breaks out while the others hang on the next epoch's collective)."""
        script = tmp_path / "pre_worker.py"
        script.write_text(PREEMPT_WORKER)
        port = _free_port()
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
        procs = [
            subprocess.Popen([sys.executable, str(script), str(pid), str(port),
                              str(tmp_path)],
                             env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.PIPE, text=True)
            for pid in (0, 1)
        ]
        for p in procs:
            stdout, stderr = p.communicate(timeout=560)
            assert p.returncode == 0, f"STDOUT:{stdout[-2000:]}\nSTDERR:{stderr[-3000:]}"
        runs = [json.loads((tmp_path / f"pre{i}.json").read_text()) for i in (0, 1)]
        assert runs[0] == runs[1] == {"clear": False, "flagged": True}


class TestFusedAttentionAcrossProcesses:
    def test_hosts_agree(self, swin_lockstep_runs):
        (a, b), _ = swin_lockstep_runs
        assert a == b

    def test_matches_single_process(self, swin_lockstep_runs):
        (mh, _), out = swin_lockstep_runs
        sys.path.insert(0, str(out))
        try:
            from swin_lockstep_common import run_training
            from nkbx.ops.attention import set_attention_mesh

            try:
                losses, checksum = run_training(mesh_devices=4,
                                                local_slice=(0, 8))
            finally:
                set_attention_mesh(None)
        finally:
            sys.path.remove(str(out))
        np.testing.assert_allclose(mh["running_loss"],
                                   [round(x, 6) for x in losses], atol=2e-6)
        np.testing.assert_allclose(mh["checksum"], checksum, rtol=1e-6)
