"""Preemption-safe checkpointing (nkbx/train/preempt.py, SURVEY.md §5.3).

A SIGTERM mid-training (preemptible/spot TPU semantics) must save the full
train state and exit cleanly, and --resume must continue the run.
"""

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # spawns full CLI training runs

REPO = Path(__file__).resolve().parent.parent


class TestPreemptModule:
    def test_install_request_reset(self):
        from nkbx.train import preempt

        preempt.reset()
        assert not preempt.requested()
        assert preempt.install()
        os.kill(os.getpid(), signal.SIGTERM)
        # the signal is delivered synchronously on return to the interpreter
        time.sleep(0.01)
        assert preempt.requested()
        preempt.reset()
        assert not preempt.requested()
        signal.signal(signal.SIGTERM, signal.SIG_DFL)

    def test_agreed_single_process(self):
        """Single-process agreed() is the local flag with no collective; the
        multi-host OR-reduction is exercised in tests/test_multiprocess.py."""
        from nkbx.train import preempt

        preempt.reset()
        assert not preempt.agreed()
        preempt._handler(signal.SIGTERM, None)
        assert preempt.agreed()
        preempt.reset()


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    return env


@pytest.fixture()
def workspace(tmp_path, image_folder_dataset):
    (tmp_path / "cfg.py").write_text(f"""
import nkbx.transforms as T
enable_mixed_precision = False
task = "single"
n_epochs = 500
seed = 0
experiment = {{"comet": None, "local": {{"path": r"{tmp_path}/runs/pre"}}}}
train_data = {{"type": "ImageFolder", "root": r"{image_folder_dataset}/train",
              "batch_size": 8, "shuffle": True, "num_workers": 2, "drop_last": True}}
val_data = {{"type": "ImageFolder", "root": r"{image_folder_dataset}/val",
            "batch_size": 8, "shuffle": False, "num_workers": 2, "drop_last": False}}
img_size = 32
train_pipeline = T.Compose([T.LongestMaxSize(img_size), T.PadIfNeeded(img_size, img_size),
                            T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))])
val_pipeline = T.Compose([T.LongestMaxSize(img_size), T.PadIfNeeded(img_size, img_size),
                          T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))])
model = {{"task": task, "model": "resnet_tiny_test", "pretrained": False}}
optimizer = {{"type": "adam", "lr": 1e-3}}
lr_policy = {{}}
backbone_state_policy = {{}}
criterion = {{"task": task, "type": "CrossEntropyLoss"}}
""")
    return tmp_path


def test_sigterm_saves_state_and_resume_continues(workspace):
    run_dir = workspace / "runs" / "pre"
    p = subprocess.Popen([sys.executable, "train.py", "-cfg",
                          str(workspace / "cfg.py")],
                         cwd=REPO, env=_env(), text=True,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        # wait until at least one epoch's artifacts exist (training underway)
        deadline = time.time() + 480
        while time.time() < deadline and not (run_dir / "metrics.csv").exists():
            if p.poll() is not None:
                raise AssertionError(f"train exited early:\n{p.stdout.read()[-3000:]}")
            time.sleep(0.5)
        assert (run_dir / "metrics.csv").exists(), "training never reached epoch 1"
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=180)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 0, out[-3000:]
    assert "preemption signal received" in out, out[-3000:]
    assert (run_dir / "weights" / "last").is_dir()
    assert (run_dir / "weights" / "last.msgpack").exists()

    # resume from the preempt checkpoint; n_epochs = completed + 2 so the
    # resumed run executes the interrupted epoch (+1 more) and finishes
    completed = sum(1 for _ in open(run_dir / "metrics.csv")) - 1  # header
    cfg2 = (workspace / "cfg.py").read_text().replace(
        "n_epochs = 500", f"n_epochs = {completed + 2}").replace(
        "runs/pre", "runs/pre2")
    (workspace / "cfg2.py").write_text(cfg2)
    # seed runs/pre2 with the preempted run's weights via --resume
    r = subprocess.run([sys.executable, "train.py", "-cfg",
                        str(workspace / "cfg2.py"), "--resume",
                        str(run_dir / "weights" / "last")],
                       cwd=REPO, env=_env(), text=True, capture_output=True,
                       timeout=560)
    assert r.returncode == 0, f"STDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-3000:]}"
    assert (workspace / "runs" / "pre2" / "weights" / "last").is_dir()
