"""End-to-end integration: 2-epoch CPU-JAX training must reduce loss and write
the reference artifact set (weights/best+last, classes.json, metrics.csv) —
SURVEY.md §4 integration tier.
"""

import json
import textwrap

import numpy as np
import pytest

import nkbx.transforms as T
from nkbx.utils.config import Config

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'


PIPE = T.Compose([
    T.LongestMaxSize(32),
    T.PadIfNeeded(32, 32),
    T.HorizontalFlip(p=0.5),
    T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
])
VAL_PIPE = T.Compose([
    T.LongestMaxSize(32),
    T.PadIfNeeded(32, 32),
    T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225)),
])


def _cfg(image_folder_dataset, tmp_path, n_epochs=2):
    return Config({
        "task": "single",
        "n_epochs": n_epochs,
        "seed": 0,
        "log_gradients": False,
        "enable_mixed_precision": False,  # fp32 on CPU tests
        "train_data": {
            "type": "ImageFolder", "root": str(image_folder_dataset / "train"),
            "batch_size": 8, "shuffle": True, "num_workers": 2, "drop_last": True,
        },
        "val_data": {
            "type": "ImageFolder", "root": str(image_folder_dataset / "val"),
            "batch_size": 8, "shuffle": False, "num_workers": 2, "drop_last": False,
        },
        "train_pipeline": PIPE,
        "val_pipeline": VAL_PIPE,
        "model": {
            "task": "single", "model": "resnet_tiny_test", "pretrained": False,
            "backbone_dropout": 0.0, "classifier_dropout": 0.0,
            "classifier_initialization": "kaiming_normal_",
        },
        "optimizer": {"type": "adam", "lr": 1e-3, "weight_decay": 0.0},
        "lr_policy": {"type": "cosine", "n_epochs": n_epochs},
        "backbone_state_policy": {},
        "criterion": {"task": "single", "type": "CrossEntropyLoss"},
        "experiment": {"comet": None, "local": {"path": str(tmp_path / "run")}},
    })


@pytest.fixture(scope="module")
def trained(image_folder_dataset, tmp_path_factory):
    import jax.numpy as jnp

    from nkbx.data import get_dataset
    from nkbx.logging import get_local_experiment
    from nkbx.models import get_model
    from nkbx.train import get_loss, train

    tmp_path = tmp_path_factory.mktemp("train_run")
    cfg = _cfg(image_folder_dataset, tmp_path, n_epochs=3)
    train_loader = get_dataset(cfg.train_data, cfg.train_pipeline)
    cfg.val_data = {**cfg.val_data, "classes": train_loader.dataset.classes}
    val_loader = get_dataset(cfg.val_data, cfg.val_pipeline)
    model = get_model(cfg.model, train_loader.dataset.classes, input_size=(32, 32),
                      dtype=jnp.float32)
    criterion = get_loss(cfg.criterion)
    local_exp = get_local_experiment(cfg.experiment["local"])
    state = train(model, train_loader, val_loader, criterion, None, local_exp, cfg)
    return cfg, local_exp, state, model


class TestTrainEndToEnd:
    def test_loss_decreases(self, trained):
        cfg, local_exp, state, model = trained
        import pandas as pd

        metrics = pd.read_csv(local_exp.path / "metrics.csv", sep="\t")
        losses = metrics["Average epoch train loss"].values
        assert losses[-1] < losses[0], f"loss did not decrease: {losses}"

    def test_artifact_set(self, trained):
        cfg, local_exp, state, model = trained
        assert (local_exp.path / "classes.json").exists()
        assert (local_exp.path / "metrics.csv").exists()
        assert (local_exp.path / "weights" / "last").is_dir()
        assert (local_exp.path / "weights" / "best").is_dir()
        assert (local_exp.path / "weights" / "last.msgpack").exists()
        with open(local_exp.path / "classes.json") as f:
            assert json.load(f) == ["cat", "dog"]
        # startup image grids (reference log_images_at_start)
        assert (local_exp.path / "train_batch_1.png").exists()

    def test_metrics_csv_shape(self, trained):
        cfg, local_exp, state, model = trained
        import pandas as pd

        df = pd.read_csv(local_exp.path / "metrics.csv", sep="\t")
        assert df.columns[0] == "Epoch"
        assert list(df.columns[1:]) == sorted(df.columns[1:])  # alphabetized
        assert len(df) == 3
        assert "Val balanced accuracy" in " ".join(df.columns) or any("balanced accuracy" in c for c in df.columns)

    def test_checkpoint_warm_start(self, trained):
        """Reference model.py:170-172: 'checkpoint' key loads weights."""
        cfg, local_exp, state, model = trained
        import jax.numpy as jnp
        import numpy as np

        from nkbx.models import get_model

        m2 = get_model(
            {**cfg.model, "checkpoint": str(local_exp.path / "weights" / "last")},
            ["cat", "dog"], input_size=(32, 32), dtype=jnp.float32,
        )
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(m2(x)),
            np.asarray(model.module.apply(
                {"params": state.params, "batch_stats": state.batch_stats}, x, train=False)),
            rtol=1e-5,
        )

    def test_full_resume(self, trained):
        """Full train-state resume restores step/epoch/opt state."""
        cfg, local_exp, state, model = trained
        from nkbx.train import TrainState, get_optimizer, restore_train_state

        bundle = get_optimizer(model.params, cfg.optimizer)
        template = TrainState.create(model.params, model.batch_stats, bundle.tx)
        restored, epoch, best = restore_train_state(local_exp.path / "weights" / "last", template)
        assert epoch == 2  # 3 epochs -> last saved at epoch index 2
        assert int(restored.step) == int(state.step)
        assert 0.0 <= best <= 1.0


class TestExportServingFlag:
    def test_training_exports_bundles(self, image_folder_dataset, tmp_path):
        import jax.numpy as jnp

        from nkbx.data import get_dataset
        from nkbx.export import TPUServingModule
        from nkbx.logging import get_local_experiment
        from nkbx.models import get_model
        from nkbx.train import get_loss, train

        cfg = _cfg(image_folder_dataset, tmp_path, n_epochs=1)
        cfg.export_serving = True
        train_loader = get_dataset(cfg.train_data, cfg.train_pipeline)
        cfg.val_data = {**cfg.val_data, "classes": train_loader.dataset.classes}
        val_loader = get_dataset(cfg.val_data, cfg.val_pipeline)
        model = get_model(cfg.model, train_loader.dataset.classes, input_size=(32, 32),
                          dtype=jnp.float32)
        local_exp = get_local_experiment(cfg.experiment["local"])
        train(model, train_loader, val_loader, get_loss(cfg.criterion), None, local_exp, cfg)
        assert (local_exp.path / "weights" / "last.nkbx").exists()
        assert (local_exp.path / "weights" / "best.nkbx").exists()
        serving = TPUServingModule(local_exp.path / "weights" / "last.nkbx")
        out = serving(np.zeros((2, 32, 32, 3), np.float32))
        assert np.asarray(out).shape == (2, 2)
