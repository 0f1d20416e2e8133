"""CLI surface end-to-end via subprocess: train.py -> eval.py -> inference.py
on CPU with a tiny config (the reference's canonical workflows, train.py /
eval.py / inference.py)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'

REPO = Path(__file__).resolve().parent.parent


def _run(args, cwd=REPO, timeout=560):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip axon registration in sitecustomize
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=timeout)
    assert r.returncode == 0, f"{args}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-3000:]}"
    return r


@pytest.fixture(scope="module")
def workspace(tmp_path_factory, image_folder_dataset):
    ws = tmp_path_factory.mktemp("cli_ws")
    (ws / "unknown").mkdir()
    import cv2

    r = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(ws / "unknown" / f"{i}.jpg"),
                    r.integers(0, 255, (40, 40, 3), dtype=np.uint8))

    (ws / "train_config.py").write_text(f"""
import nkbx.transforms as T

enable_mixed_precision = False
task = "single"
n_epochs = 1
seed = 0
experiment = {{"comet": None, "local": {{"path": r"{ws}/runs/cli_run"}}}}
train_data = {{"type": "ImageFolder", "root": r"{image_folder_dataset}/train",
              "batch_size": 8, "shuffle": True, "num_workers": 2, "drop_last": True}}
val_data = {{"type": "ImageFolder", "root": r"{image_folder_dataset}/val",
            "batch_size": 8, "shuffle": False, "num_workers": 2, "drop_last": False}}
img_size = 32
train_pipeline = T.Compose([T.LongestMaxSize(img_size), T.PadIfNeeded(img_size, img_size),
                            T.HorizontalFlip(p=0.5),
                            T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))])
val_pipeline = T.Compose([T.LongestMaxSize(img_size), T.PadIfNeeded(img_size, img_size),
                          T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))])
model = {{"task": task, "model": "resnet_tiny_test", "pretrained": False}}
optimizer = {{"type": "adam", "lr": 1e-3}}
lr_policy = {{}}
backbone_state_policy = {{}}
criterion = {{"task": task, "type": "CrossEntropyLoss"}}
""")
    (ws / "eval_config.py").write_text(f"""
import nkbx.transforms as T
enable_mixed_precision = False
task = "single"
save_path = r"{ws}/eval_out"
val_data = {{"type": "ImageFolder", "root": r"{image_folder_dataset}/val",
            "batch_size": 8, "shuffle": False, "num_workers": 2, "drop_last": False}}
img_size = 32
val_pipeline = T.Compose([T.LongestMaxSize(img_size), T.PadIfNeeded(img_size, img_size),
                          T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))])
model = {{"task": task, "model": "resnet_tiny_test", "pretrained": False,
         "checkpoint": r"{ws}/runs/cli_run/weights/last"}}
criterion = {{"task": task, "type": "CrossEntropyLoss"}}
""")
    (ws / "infer_config.py").write_text(f"""
import nkbx.transforms as T
enable_mixed_precision = False
task = "single"
target_column = "label"
save_path = r"{ws}/infer_out"
classes = r"{ws}/runs/cli_run/classes.json"
inference_data = {{"folder_path": r"{ws}/unknown", "batch_size": 4, "num_workers": 2}}
img_size = 32
inference_pipeline = T.Compose([T.LongestMaxSize(img_size), T.PadIfNeeded(img_size, img_size),
                                T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))])
model = {{"task": task, "model": "resnet_tiny_test", "pretrained": False,
         "checkpoint": r"{ws}/runs/cli_run/weights/last"}}
""")
    return ws


class TestCLIWorkflow:
    def test_train_cli(self, workspace):
        _run(["train.py", "-cfg", str(workspace / "train_config.py")])
        run_dir = workspace / "runs" / "cli_run"
        assert (run_dir / "classes.json").exists()
        assert (run_dir / "metrics.csv").exists()
        assert (run_dir / "weights" / "last").is_dir()

    def test_eval_cli(self, workspace):
        _run(["eval.py", "-cfg", str(workspace / "eval_config.py")])
        metrics = json.loads((workspace / "eval_out" / "metrics.json").read_text())
        assert "epoch_acc" in metrics and 0.0 <= metrics["epoch_acc"] <= 1.0

    def test_inference_cli(self, workspace):
        _run(["inference.py", "-cfg", str(workspace / "infer_config.py")])
        import pandas as pd

        df = pd.read_csv(workspace / "infer_out" / "inference_annotations.csv")
        assert list(df.columns) == ["label", "path"]
        assert len(df) == 3
        assert set(df["label"]) <= {"cat", "dog"}

    def test_eval_and_inference_cli_with_mesh(self, workspace):
        """The OPT-IN `mesh` config key shards eval/inference over the data
        axis (batch must divide by the axis size — 8 here); results match the
        single-device runs (test_eval_cli / test_inference_cli)."""
        import pandas as pd

        cfg = (workspace / "eval_config.py").read_text()
        (workspace / "eval_mesh_config.py").write_text(
            cfg.replace(f'save_path = r"{workspace}/eval_out"',
                        f'save_path = r"{workspace}/eval_mesh_out"')
            + '\nmesh = {"data": 8}\n')
        _run(["eval.py", "-cfg", str(workspace / "eval_mesh_config.py")])
        got = json.loads((workspace / "eval_mesh_out" / "metrics.json").read_text())
        want = json.loads((workspace / "eval_out" / "metrics.json").read_text())
        np.testing.assert_allclose(got["epoch_acc"], want["epoch_acc"], rtol=1e-6)
        np.testing.assert_allclose(got["epoch_loss"], want["epoch_loss"], rtol=1e-5)

        cfg = (workspace / "infer_config.py").read_text()
        (workspace / "infer_mesh_config.py").write_text(
            cfg.replace(f'save_path = r"{workspace}/infer_out"',
                        f'save_path = r"{workspace}/infer_mesh_out"')
            .replace('"batch_size": 4', '"batch_size": 8')
            + '\nmesh = {"data": 8}\n')
        _run(["inference.py", "-cfg", str(workspace / "infer_mesh_config.py")])
        got = pd.read_csv(workspace / "infer_mesh_out" / "inference_annotations.csv")
        want = pd.read_csv(workspace / "infer_out" / "inference_annotations.csv")
        pd.testing.assert_frame_equal(got, want)

    def test_save_augs_cli(self, workspace, tmp_path):
        _run(["save_augs.py", "-cfg", str(workspace / "train_config.py"),
              "-n", "4", "-o", str(tmp_path / "augs")])
        pngs = list((tmp_path / "augs").glob("aug_*.png"))
        assert len(pngs) == 4

    def test_export_cli(self, workspace):
        """export.py --to serving end-to-end on the trained checkpoint
        (reference export.py surface): the bundle loads and serves, and
        --fused-attention stamps its metadata flag (TPU-only artifact;
        traced on CPU the auto mode skips the kernel, so the bundle stays
        runnable here)."""
        out = workspace / "export_out"
        _run(["export.py", "-cfg", str(workspace / "train_config.py"),
              "--to", "serving", "-w", str(workspace / "runs" / "cli_run" / "weights" / "last"),
              "--dynamic", "none", "--input-shape", "4", "32", "32", "3",
              "--fused-attention", "--save_path", str(out)])
        from nkbx.export.serving import TPUServingModule

        mod = TPUServingModule(str(out / "last.nkbx"), warm_up_on_load=False)
        assert mod.metadata["fused_attention"] is True
        assert mod.metadata["classes"] == ["cat", "dog"]
        probs = np.asarray(mod(np.random.default_rng(0).random((4, 32, 32, 3), dtype=np.float32)))
        assert probs.shape == (4, 2)

    def test_export_cli_torchscript_and_onnx(self, workspace):
        """--to torchscript / --to onnx through the torch replica path: real
        .pt / .onnx artifacts from the trained checkpoint (tf2onnx absent in
        this environment exercises the fallback branch)."""
        out = workspace / "export_torch"
        w = str(workspace / "runs" / "cli_run" / "weights" / "last")
        _run(["export.py", "-cfg", str(workspace / "train_config.py"),
              "--to", "torchscript", "-w", w,
              "--input-shape", "1", "32", "32", "3", "--save_path", str(out)])
        import torch

        extra = {"config.txt": ""}
        m = torch.jit.load(str(out / "last.pt"), _extra_files=extra)
        with torch.no_grad():
            y = m(torch.randn(2, 3, 32, 32))
        assert tuple(y.shape) == (2, 2) and extra["config.txt"]

        r = _run(["export.py", "-cfg", str(workspace / "train_config.py"),
                  "--to", "onnx", "-w", w,
                  "--input-shape", "1", "32", "32", "3", "--save_path", str(out)])
        onnx_path = out / "last.onnx"
        assert onnx_path.exists() and onnx_path.stat().st_size > 100_000
        assert (out / "last.onnx.json").exists()
        assert "onnx export success" in r.stdout

    def test_export_cli_fused_requires_static(self, workspace):
        """--fused-attention with symbolic shapes is refused up front."""
        r = subprocess.run(
            [sys.executable, "export.py", "-cfg", str(workspace / "train_config.py"),
             "--to", "serving", "-w", str(workspace / "runs" / "cli_run" / "weights" / "last"),
             "--dynamic", "batch", "--fused-attention"],
            cwd=REPO, env={**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""},
            capture_output=True, text=True, timeout=120)
        assert r.returncode != 0
        assert "requires --dynamic none" in r.stderr

    def test_resume_cli(self, workspace):
        """--resume continues from the saved epoch without error."""
        # bump n_epochs to 2 so resume has something to do
        cfg = (workspace / "train_config.py").read_text().replace("n_epochs = 1", "n_epochs = 2")
        p = workspace / "train_config_resume.py"
        p.write_text(cfg.replace("cli_run", "cli_run_resumed"))
        _run(["train.py", "-cfg", str(p),
              "--resume", str(workspace / "runs" / "cli_run" / "weights" / "last")])
        assert (workspace / "runs" / "cli_run_resumed" / "weights" / "last").is_dir()
