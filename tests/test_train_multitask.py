"""End-to-end multi-task + YOLO-crop training (BASELINE configs #3 and #5 shapes),
plus GroupsDataset reader coverage."""

import numpy as np
import pytest

import nkbx.transforms as T
from nkbx.utils.config import Config

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'


PIPE = T.Compose([
    T.LongestMaxSize(32), T.PadIfNeeded(32, 32),
    T.HorizontalFlip(p=0.5),
    T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
])
VAL_PIPE = T.Compose([
    T.LongestMaxSize(32), T.PadIfNeeded(32, 32),
    T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
])


class TestMultitaskTraining:
    def test_two_epochs_reduce_loss_and_write_artifacts(self, csv_dataset, tmp_path):
        import jax.numpy as jnp
        import pandas as pd

        from nkbx.data import get_dataset
        from nkbx.logging import get_local_experiment
        from nkbx.models import get_model
        from nkbx.train import get_loss, train

        cfg = Config({
            "task": "multi",
            "target_names": ["color", "size"],
            "n_epochs": 2,
            "enable_mixed_precision": False,
            "show_full_current_loss_in_terminal": True,
            "train_data": {
                "type": "AnnotatedMultitaskDataset",
                "annotations_file": csv_dataset["annotations_file"],
                "image_base_dir": csv_dataset["image_base_dir"],
                "target_names": ["color", "size"],
                "fold": "train", "batch_size": 8, "shuffle": True,
                "num_workers": 2, "drop_last": True,
            },
            "val_data": {
                "type": "AnnotatedMultitaskDataset",
                "annotations_file": csv_dataset["annotations_file"],
                "image_base_dir": csv_dataset["image_base_dir"],
                "target_names": ["color", "size"],
                "fold": "val", "batch_size": 8, "shuffle": False,
                "num_workers": 2, "drop_last": False,
            },
            "train_pipeline": PIPE,
            "val_pipeline": VAL_PIPE,
            "model": {"task": "multi", "model": "resnet_tiny_test", "pretrained": False},
            "optimizer": {"type": "nadam", "lr": 1e-3, "classifier_lr": 1e-2, "weight_decay": 0.01},
            "lr_policy": {"type": "step", "step_size": 1, "gamma": 0.9},
            "backbone_state_policy": {0: "unfreeze"},
            "criterion": {"task": "multi", "type": "CrossEntropyLoss"},
            "experiment": {"comet": None, "local": {"path": str(tmp_path / "run")}},
        })
        train_loader = get_dataset(cfg.train_data, cfg.train_pipeline)
        val_loader = get_dataset(cfg.val_data, cfg.val_pipeline)
        model = get_model(cfg.model, train_loader.dataset.classes, input_size=(32, 32),
                          dtype=jnp.float32)
        criterion = get_loss(cfg.criterion)
        local_exp = get_local_experiment(cfg.experiment["local"])
        train(model, train_loader, val_loader, criterion, None, local_exp, cfg)

        df = pd.read_csv(local_exp.path / "metrics.csv", sep="\t")
        # per-target metric columns exist (reference log_metrics naming)
        assert any("color" in c and "balanced accuracy" in c for c in df.columns)
        assert any("size" in c and "balanced accuracy" in c for c in df.columns)
        losses = df["train loss"].values
        assert losses[-1] < losses[0]
        import json

        classes = json.load(open(local_exp.path / "classes.json"))
        assert set(classes) == {"color", "size"}


class TestYOLOTraining:
    def test_yolo_crop_train_runs(self, tmp_path):
        import cv2
        import jax.numpy as jnp
        import yaml

        from nkbx.data import get_dataset
        from nkbx.models import get_model
        from nkbx.train import (EpochCollector, TrainState, build_train_step,
                                get_loss, get_optimizer, train_epoch)

        root = tmp_path / "yolo"
        r = np.random.default_rng(3)
        for split in ("train",):
            (root / split / "images").mkdir(parents=True)
            (root / split / "labels").mkdir(parents=True)
            for i in range(8):
                img = r.integers(0, 255, (64, 64, 3), dtype=np.uint8)
                cv2.imwrite(str(root / split / "images" / f"{i}.jpg"), img)
                with open(root / split / "labels" / f"{i}.txt", "w") as f:
                    f.write(f"{i % 2} 0.5 0.5 0.6 0.6\n")
        ypath = root / "data.yaml"
        yaml.safe_dump({"path": str(root), "train": "train/images", "val": "train/images",
                        "names": ["a", "b"]}, open(ypath, "w"))

        loader = get_dataset({
            "type": "AnnotatedYOLODataset", "annotations_file": str(ypath),
            "fold": "train", "generate_backgrounds": True,
            "background_generating_prob": 1.0, "background_crop_sizes": (0.1, 0.2),
            "weighted_sampling": True, "shuffle": True,
            "batch_size": 4, "num_workers": 2, "drop_last": True,
        }, PIPE)
        classes = loader.dataset.classes
        assert classes[-1] == "<GENERATED>_background"

        model = get_model({"task": "single", "model": "resnet_tiny_test", "pretrained": False},
                          classes, input_size=(32, 32), dtype=jnp.float32)
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "adam", "lr": 1e-3})
        step = build_train_step(model, criterion, bundle, augment_fn=PIPE.device_apply)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx)
        import jax

        state, results = train_epoch(state, loader, step, 0, jax.random.PRNGKey(0),
                                     1.0, 1.0, epoch_logger=EpochCollector("single"),
                                     progress=False)
        assert np.isfinite(results["running_loss"]).all()
        assert len(results["ground_truth"]) > 0


class TestGroupsDataset:
    def test_fine_to_coarse_relabel(self, tmp_path):
        import pickle

        import cv2

        from nkbx.data import GroupsDataset

        root = tmp_path / "groups"
        for breed in ("husky", "poodle", "beagle"):
            (root / "images_lr" / breed).mkdir(parents=True)
            img = np.random.default_rng(1).integers(0, 255, (20, 20, 3), dtype=np.uint8)
            cv2.imwrite(str(root / "images_lr" / breed / "x.jpg"), img)
        files = [f"any/{b}/x.jpg" for b in ("husky", "poodle", "beagle")]
        with open(root / "ann.pkl", "wb") as f:
            pickle.dump(files, f)
        groups = {"big": ["husky"], "small": ["poodle", "beagle"]}
        with open(root / "groups.pkl", "wb") as f:
            pickle.dump(groups, f)

        ds = GroupsDataset(root=str(root), ann_file="ann.pkl", dict_path=str(root / "groups.pkl"))
        assert ds.classes == ["big", "small"]
        assert len(ds) == 3
        img, label = ds.read(0)
        assert label == ds.class_to_idx["big"]  # husky -> big
        _, label2 = ds.read(1)
        assert label2 == ds.class_to_idx["small"]  # poodle -> small
        assert list(ds.get_labels()) == [0, 1, 1]
