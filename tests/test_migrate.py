"""Config migrator (nkbx/utils/migrate.py): a reference-style
torch/albumentations config rewrites to an nkbx config that LOADS and TRAINS
(reference configs/singletask_config.py surface)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from nkbx.utils.migrate import migrate_text

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'

REPO = Path(__file__).resolve().parent.parent

REFERENCE_STYLE = '''\
import albumentations as A
import cv2
from albumentations.pytorch import ToTensorV2


device = "cuda:0"
enable_mixed_presicion = True
enable_gradient_scaler = True
compile = False

experiment_name = "migr_run"
experiment = {"comet": None, "local": {"path": "RUNS_DIR"}}
log_gradients = False
task = "single"

train_data = {"type": "ImageFolder", "root": "DATA_ROOT/train",
              "weighted_sampling": True, "shuffle": True, "batch_size": 8,
              "num_workers": 0, "drop_last": True}
val_data = {"type": "ImageFolder", "root": "DATA_ROOT/val", "shuffle": False,
            "batch_size": 8, "num_workers": 0, "drop_last": False}

img_size = 32
train_pipeline = A.Compose([
    A.LongestMaxSize(img_size, always_apply=True),
    A.PadIfNeeded(img_size, img_size, always_apply=True,
                  border_mode=cv2.BORDER_CONSTANT, value=0),
    A.HorizontalFlip(p=0.5),
    A.RandomBrightnessContrast(brightness_limit=(-0.2, 0.2),
                               contrast_limit=(0.1, -0.5), p=0.5),
    A.HueSaturationValue(hue_shift_limit=0, sat_shift_limit=10,
                         val_shift_limit=50, p=0.5),
    A.CoarseDropout(max_holes=4, min_holes=1, max_height=0.2, min_height=0.05,
                    max_width=0.2, min_width=0.05, fill_value=[0, 0.5, 1], p=0.5),
    A.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    ToTensorV2(),
])
val_pipeline = A.Compose([
    A.LongestMaxSize(img_size, always_apply=True),
    A.PadIfNeeded(img_size, img_size, always_apply=True,
                  border_mode=cv2.BORDER_CONSTANT, value=0),
    A.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
    ToTensorV2(),
])

model = {"task": task, "model": "resnet_tiny_test", "pretrained": False,
         "backbone_dropout": 0.1, "classifier_dropout": 0.1,
         "classifier_initialization": "kaiming_normal_"}
optimizer = {"type": "nadam", "lr": 1e-3, "backbone_lr": 1e-3,
             "classifier_lr": 1e-2, "weight_decay": 0.2,
             "backbone_weight_decay": 0.01, "classifier_weight_decay": 0.2}
n_epochs = 1
lr_policy = {"type": "cosine", "n_epochs": n_epochs}
backbone_state_policy = {}
criterion = {"task": task, "type": "CrossEntropyLoss"}
'''


class TestMigrateText:
    def test_rewrites(self):
        out, warnings = migrate_text(REFERENCE_STYLE)
        assert "import nkbx.transforms as T" in out
        assert "import albumentations" not in out.replace(
            "was: import albumentations", "")
        assert "T.Compose([" in out and "T.LongestMaxSize" in out
        assert "T.ToTensorV2()," in out
        # torch-only knobs are commented with reasons, not deleted
        assert '# [nkbx-migrate]' in out
        assert 'device = "cuda:0"' in out  # kept inside the comment
        assert not any(line.strip().startswith("device =")
                       for line in out.splitlines())
        assert not any(line.strip().startswith("enable_gradient_scaler")
                       for line in out.splitlines())
        # the typo'd precision key is accepted by nkbx, stays untouched
        assert "enable_mixed_presicion = True" in out
        assert warnings == []

    def test_warns_on_torch_checkpoint_and_unknown_op(self):
        src = ('import albumentations as A\n'
               'model = {"checkpoint": "w/last.pth"}\n'
               'train_pipeline = A.Compose([A.FancyPCA(p=1.0)])\n')
        out, warnings = migrate_text(src)
        assert any("nkbx.models.convert" in w for w in warnings)
        assert any("T.FancyPCA is not a nkbx transform" in w for w in warnings)

    def test_unaliased_import(self):
        src = ('import albumentations\n'
               'p = albumentations.Compose([albumentations.HorizontalFlip()])\n')
        out, _ = migrate_text(src)
        assert "p = T.Compose([T.HorizontalFlip()])" in out


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("migrdata")
    r = np.random.default_rng(0)
    for fold in ("train", "val"):
        for ci, cls in enumerate(("cat", "dog")):
            d = root / fold / cls
            d.mkdir(parents=True)
            for i in range(8):
                img = np.clip(r.integers(0, 255, (32, 32, 3)).astype(np.int32)
                              + (80 if ci else -80), 0, 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{i}.png"), img)
    return root


def test_migrated_config_trains(dataset, tmp_path):
    """CLI end-to-end: migrate -> --check -> train.py on the migrated file."""
    src = (REFERENCE_STYLE
           .replace("DATA_ROOT", str(dataset))
           .replace("RUNS_DIR", str(tmp_path / "runs" / "migr_run")))
    old = tmp_path / "old_config.py"
    old.write_text(src)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    r = subprocess.run(
        [sys.executable, "-m", "nkbx.utils.migrate", str(old), "--check"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    migrated = tmp_path / "old_config_nkbx.py"
    assert migrated.exists()
    assert "check ok" in r.stdout

    r = subprocess.run([sys.executable, "train.py", "-cfg", str(migrated)],
                       cwd=REPO, env=env, capture_output=True, text=True,
                       timeout=560)
    assert r.returncode == 0, f"STDOUT:{r.stdout[-1500:]}\nSTDERR:{r.stderr[-2500:]}"
    run_dir = tmp_path / "runs" / "migr_run"
    assert (run_dir / "classes.json").exists()
    assert (run_dir / "weights" / "last").is_dir()
    assert json.loads((run_dir / "classes.json").read_text()) == ["cat", "dog"]


class TestLegacyConfigs:
    """Pre-dict-era reference configs (configs/archive/old there): torch
    imports and nn.CrossEntropyLoss() criteria rewrite to the dict surface."""

    def test_nn_criterion_rewritten(self):
        src = ("import torch\nimport torch.nn as nn\n"
               "criterion = nn.CrossEntropyLoss()\n")
        out, warnings = migrate_text(src)
        assert 'criterion = {"task": "single", "type": "CrossEntropyLoss"}' in out
        assert not any(line.strip().startswith("import torch")
                       for line in out.splitlines())
        assert warnings == []

    def test_other_nn_criterion_warns(self):
        out, warnings = migrate_text("criterion = nn.BCEWithLogitsLoss(pos_weight=w)\n")
        assert any("rewrite" in w and "BCEWithLogitsLoss" in w for w in warnings)

    def test_check_rejects_non_dict_criterion(self, tmp_path):
        from nkbx.utils.migrate import check_config

        cfg = tmp_path / "c.py"
        cfg.write_text("criterion = 5\n")
        problems = check_config(cfg)
        assert any("criterion" in p for p in problems)


class TestFromImports:
    def test_from_albumentations_import(self):
        src = ("from albumentations import Compose, HorizontalFlip\n"
               "p = Compose([HorizontalFlip(p=0.5)])\n")
        out, warnings = migrate_text(src)
        assert "import nkbx.transforms as T" in out
        assert "p = T.Compose([T.HorizontalFlip(p=0.5)])" in out
        assert warnings == []

    def test_star_import_warns(self):
        out, warnings = migrate_text("from albumentations import *\n")
        assert any("cannot be migrated" in w for w in warnings)
