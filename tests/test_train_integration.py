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


class TestBf16MasterWeightsTrainer:
    def test_trainer_level_bf16_masters(self, image_folder_dataset, tmp_path):
        """Drive the FULL trainer (not just TrainState) with
        bf16_master_weights=True — regression for an r5 name-shadowing bug
        where the cfg key crashed train() before the first epoch."""
        import jax.numpy as jnp

        from nkbx.data import get_dataset
        from nkbx.logging import get_local_experiment
        from nkbx.models import get_model
        from nkbx.train import get_loss, train

        cfg = _cfg(image_folder_dataset, tmp_path, n_epochs=1)
        cfg.bf16_master_weights = True
        train_loader = get_dataset(cfg.train_data, cfg.train_pipeline)
        cfg.val_data = {**cfg.val_data, "classes": train_loader.dataset.classes}
        val_loader = get_dataset(cfg.val_data, cfg.val_pipeline)
        model = get_model(cfg.model, train_loader.dataset.classes,
                          input_size=(32, 32), dtype=jnp.float32)
        criterion = get_loss(cfg.criterion)
        local_exp = get_local_experiment(cfg.experiment["local"])
        state = train(model, train_loader, val_loader, criterion, None,
                      local_exp, cfg)
        assert state.params["head"]["kernel"].dtype == jnp.bfloat16
        assert (local_exp.path / "metrics.csv").exists()


class TestMidEpochResume:
    """VERDICT r4 #4: a SIGTERM at batch k + --resume must continue the epoch
    exactly — remaining sample sequence AND final weights equal an
    uninterrupted run (samplers are pure in (seed, epoch); the step PRNG folds
    the restored global step)."""

    def _make(self, image_folder_dataset):
        import jax.numpy as jnp

        from nkbx.data import get_dataset
        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        loader = get_dataset(
            {"type": "ImageFolder", "root": str(image_folder_dataset / "train"),
             "batch_size": 8, "shuffle": True, "num_workers": 2,
             "drop_last": False, "seed": 0}, PIPE)
        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            loader.dataset.classes, input_size=(32, 32), seed=0,
            dtype=jnp.float32)
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "adam", "lr": 1e-3})
        step = build_train_step(model, criterion, bundle,
                                augment_fn=PIPE.device_apply, masked_bn=True)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx)
        return loader, model, step, bundle, state

    def test_resume_bitwise_equals_uninterrupted(self, image_folder_dataset, tmp_path):
        import jax

        from nkbx.train import preempt, restore_train_state
        from nkbx.train.checkpoint import load_cursor, save_checkpoint
        from nkbx.train.engine import train_epoch

        key = jax.random.PRNGKey(0)
        preempt.reset()

        # run A: two uninterrupted epochs
        loader, model, step, bundle, state = self._make(image_folder_dataset)
        for e in range(2):
            state, _ = train_epoch(state, loader, step, e, key, 1.0, 1.0,
                                   progress=False)
        params_a = jax.device_get(state.params)
        stats_a = jax.device_get(state.batch_stats)

        # run B: epoch 0 full, epoch 1 preempted after 1 of 3 batches
        loader, model, step, bundle, state = self._make(image_folder_dataset)
        state, _ = train_epoch(state, loader, step, 0, key, 1.0, 1.0,
                               progress=False)

        class PreemptingLoader:
            """Raises the preemption flag while yielding batch `after` — the
            engine sees it at the loop top and breaks WITHOUT consuming it."""
            def __init__(self, inner, after):
                self.inner, self.after = inner, after

            def epoch(self, e, start_batch=0):
                it = (self.inner.epoch(e, start_batch) if start_batch
                      else self.inner.epoch(e))
                for i, b in enumerate(it):
                    if i == self.after:
                        preempt._handler(None, None)
                    yield b

            def __len__(self):
                return len(self.inner)

        state, res = train_epoch(state, PreemptingLoader(loader, after=1), step,
                                 1, key, 1.0, 1.0, progress=False)
        assert res["preempted"] and res["consumed_batches"] == 1
        preempt.reset()
        ckpt = tmp_path / "last"
        save_checkpoint(ckpt, state, 0, 0.0,
                        cursor={"epoch": 1, "batch": res["consumed_batches"],
                                "step": int(jax.device_get(state.step)),
                                "batch_size": loader.batch_size,
                                "process_count": 1})

        # fresh process-equivalent: rebuild everything, restore, continue
        loader2, model2, step2, bundle2, template = self._make(image_folder_dataset)
        restored, last_epoch, _ = restore_train_state(ckpt, template)
        assert last_epoch == 0
        cur = load_cursor(ckpt)
        assert cur["epoch"] == 1 and cur["batch"] == 1
        state2, res2 = train_epoch(restored, loader2, step2, 1, key, 1.0, 1.0,
                                   progress=False, start_batch=cur["batch"])
        assert res2["consumed_batches"] == 3  # 24 samples / bs 8

        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(params_a),
                jax.tree_util.tree_leaves_with_path(jax.device_get(state2.params))):
            np.testing.assert_array_equal(a, b, err_msg=str(ka))
        for (ka, a), (kb, b) in zip(
                jax.tree_util.tree_leaves_with_path(stats_a),
                jax.tree_util.tree_leaves_with_path(jax.device_get(state2.batch_stats))):
            np.testing.assert_array_equal(a, b, err_msg=str(ka))

    def test_resume_with_scan_steps(self, image_folder_dataset, tmp_path):
        """scan_steps>1: the cursor counts only DISPATCHED batches (a partial
        scan buffer at preemption is re-read on resume), and the resumed run
        still bitwise-matches an uninterrupted one."""
        import jax
        import jax.numpy as jnp

        from nkbx.data import get_dataset
        from nkbx.models import get_model
        from nkbx.train import (TrainState, build_train_step, get_loss,
                                get_optimizer, preempt, restore_train_state)
        from nkbx.train.checkpoint import load_cursor, save_checkpoint
        from nkbx.train.engine import train_epoch

        def make():
            loader = get_dataset(
                {"type": "ImageFolder",
                 "root": str(image_folder_dataset / "train"),
                 "batch_size": 4, "shuffle": True, "num_workers": 2,
                 "drop_last": True, "seed": 0}, PIPE)  # 24 samples -> 6 batches
            model = get_model(
                {"task": "single", "model": "resnet_tiny_test",
                 "pretrained": False}, loader.dataset.classes,
                input_size=(32, 32), seed=0, dtype=jnp.float32)
            criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
            bundle = get_optimizer(model.params, {"type": "sgd", "lr": 1e-2})
            step = build_train_step(model, criterion, bundle,
                                    augment_fn=PIPE.device_apply,
                                    scan_steps=2)
            state = TrainState.create(model.params, model.batch_stats, bundle.tx)
            return loader, step, state

        key = jax.random.PRNGKey(0)
        preempt.reset()
        loader, step, state = make()
        state, _ = train_epoch(state, loader, step, 0, key, 1.0, 1.0,
                               progress=False)
        params_a = jax.device_get(state.params)

        loader, step, state = make()

        class PreemptAt:
            def __init__(self, inner, after):
                self.inner, self.after = inner, after

            def epoch(self, e, start_batch=0):
                it = (self.inner.epoch(e, start_batch) if start_batch
                      else self.inner.epoch(e))
                for i, b in enumerate(it):
                    if i == self.after:
                        preempt._handler(None, None)
                    yield b

            def __len__(self):
                return len(self.inner)

        # flag raised while yielding batch 3: batches 0-1 dispatched as one
        # scan chunk; batch 2 sits in the partial buffer and is NOT counted
        state, res = train_epoch(state, PreemptAt(loader, after=3), step, 0,
                                 key, 1.0, 1.0, progress=False)
        assert res["preempted"] and res["consumed_batches"] == 2
        preempt.reset()
        ckpt = tmp_path / "last"
        save_checkpoint(ckpt, state, -1, 0.0,
                        cursor={"epoch": 0, "batch": 2,
                                "step": int(jax.device_get(state.step)),
                                "batch_size": 4, "process_count": 1})

        loader2, step2, template = make()
        restored, _, _ = restore_train_state(ckpt, template)
        cur = load_cursor(ckpt)
        state2, res2 = train_epoch(restored, loader2, step2, 0, key, 1.0, 1.0,
                                   progress=False, start_batch=cur["batch"])
        assert res2["consumed_batches"] == 6
        for (ka, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(params_a),
                jax.tree_util.tree_leaves_with_path(jax.device_get(state2.params))):
            np.testing.assert_array_equal(a, b, err_msg=str(ka))

    def test_stale_cursor_is_ignored_by_trainer(self, image_folder_dataset, tmp_path):
        """A cursor whose pinned step/geometry mismatches the checkpoint must
        fall back to epoch-start replay (warn, not crash)."""
        import jax

        from nkbx.train.checkpoint import load_cursor, save_checkpoint

        loader, model, step, bundle, state = self._make(image_folder_dataset)
        ckpt = tmp_path / "last"
        save_checkpoint(ckpt, state, 0, 0.0,
                        cursor={"epoch": 1, "batch": 2, "step": 999,
                                "batch_size": 8, "process_count": 1})
        cur = load_cursor(ckpt)
        assert cur is not None and cur["step"] == 999
        assert cur["step"] != int(jax.device_get(state.step))  # trainer's check
        # an end-of-epoch save (no cursor) clears the sidecar
        save_checkpoint(ckpt, state, 1, 0.0)
        assert load_cursor(ckpt) is None


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
