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
