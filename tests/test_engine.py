"""EpochCollector semantics: mask filtering, multi-task aggregation, grad logs
(the BaseLogger.get_epoch_results contract, reference logging.py:218-294)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nkbx.train.engine import EpochCollector, _iter_metrics

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'



def _single_batch(bsz=4, c=3, seed=0, n_valid=None):
    r = np.random.default_rng(seed)
    preds = jnp.asarray(r.normal(size=(bsz, c)).astype(np.float32))
    labels = jnp.asarray(r.integers(0, c, bsz).astype(np.int64))
    mask = np.zeros(bsz, bool)
    mask[: (n_valid if n_valid is not None else bsz)] = True
    return _iter_metrics(preds, labels, jnp.asarray(mask), jnp.asarray(0.5)), labels, mask


class TestEpochCollector:
    def test_single_task_accumulation(self):
        col = EpochCollector("single")
        m1, l1, _ = _single_batch(seed=1)
        m2, l2, _ = _single_batch(seed=2)
        col.log_iter(m1)
        col.log_iter(m2)
        res = col.get_epoch_results()
        assert res["running_loss"] == [0.5, 0.5]
        assert len(res["ground_truth"]) == 8
        assert res["ground_truth"][:4] == list(np.asarray(l1))
        assert np.asarray(res["confidences"]).shape == (8, 3)
        # confidences are softmax rows
        np.testing.assert_allclose(np.asarray(res["confidences"]).sum(1), 1.0, rtol=1e-5)

    def test_mask_filters_padded_rows(self):
        col = EpochCollector("single")
        m, labels, mask = _single_batch(bsz=6, n_valid=4)
        col.log_iter(m)
        res = col.get_epoch_results()
        assert len(res["ground_truth"]) == 4
        assert res["ground_truth"] == list(np.asarray(labels)[:4])

    def test_multi_task_structure(self):
        col = EpochCollector("multi")
        r = np.random.default_rng(0)
        preds = {"a": jnp.asarray(r.normal(size=(4, 3)).astype(np.float32)),
                 "b": jnp.asarray(r.normal(size=(4, 2)).astype(np.float32))}
        labels = {"a": jnp.asarray(r.integers(0, 3, 4).astype(np.int64)),
                  "b": jnp.asarray(r.integers(0, 2, 4).astype(np.int64))}
        loss_out = {"a": jnp.asarray(0.2), "b": jnp.asarray(0.3), "loss": jnp.asarray(0.5)}
        m = _iter_metrics(preds, labels, jnp.ones(4, bool), loss_out)
        col.log_iter(m)
        res = col.get_epoch_results()
        assert res["running_loss"]["a"] == [np.float32(0.2)]
        assert res["running_loss"]["loss"] == [np.float32(0.5)]
        assert len(res["ground_truth"]["b"]) == 4
        assert np.asarray(res["confidences"]["a"]).shape == (4, 3)

    def test_grad_norms_aggregated(self):
        col = EpochCollector("single")
        for i in range(2):
            m, _, _ = _single_batch(seed=i)
            m["grad_norms"] = {"backbone/k": jnp.asarray(1.0 + i), "head/k": jnp.asarray(0.5)}
            col.log_iter(m)
        res = col.get_epoch_results()
        gl = res["metrics_grad_log"]
        assert gl["Gradients/backbone/k"] == [1.0, 2.0]
        assert gl["Gradients/Total"] == [1.5, 2.5]

    def test_images_kept_once(self):
        col = EpochCollector("single")
        col.log_images_if_needed(np.zeros((2, 4, 4, 3), np.uint8))
        col.log_images_if_needed(np.ones((2, 4, 4, 3), np.uint8))
        res_imgs = col.epoch_images_example
        assert (res_imgs == 0).all()  # first batch wins (logging.py:283-285)


class TestMaskedBN:
    """masked_bn=True: padded rows must not contaminate BatchNorm batch stats.

    Done-criterion (VERDICT round 1 #5): training on a padded batch with the
    mask produces batch_stats (and the same param update) identical to running
    the same step on only the valid rows.
    """

    def _setup(self, masked_bn, bsz):
        import jax

        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            classes=["a", "b", "c"], input_size=(32, 32), seed=0,
            dtype=jnp.float32,
        )
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.1})
        step = build_train_step(model, criterion, bundle, masked_bn=masked_bn)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx)
        return step, state, jax.random.PRNGKey(0)

    def test_padded_batch_matches_valid_only_run(self):
        import jax

        r = np.random.default_rng(0)
        n_valid, bsz = 5, 8
        img_valid = r.integers(0, 255, (n_valid, 32, 32, 3)).astype(np.uint8)
        lab_valid = r.integers(0, 3, (n_valid,)).astype(np.int64)
        img_pad = np.zeros((bsz, 32, 32, 3), np.uint8)
        img_pad[:n_valid] = img_valid
        lab_pad = np.zeros((bsz,), np.int64)
        lab_pad[:n_valid] = lab_valid
        mask = np.zeros((bsz,), bool)
        mask[:n_valid] = True
        one = jnp.asarray(1.0)

        step_m, state_m, key = self._setup(masked_bn=True, bsz=bsz)
        state_m, metrics_m = step_m(
            state_m, jnp.asarray(img_pad), jnp.asarray(lab_pad), jnp.asarray(mask),
            key, one, one,
        )

        step_v, state_v, key = self._setup(masked_bn=False, bsz=n_valid)
        state_v, metrics_v = step_v(
            state_v, jnp.asarray(img_valid), jnp.asarray(lab_valid),
            jnp.ones((n_valid,), bool), key, one, one,
        )

        np.testing.assert_allclose(
            float(metrics_m["loss"]), float(metrics_v["loss"]), rtol=1e-5
        )
        def flat(tree):
            return {jax.tree_util.keystr(p): v
                    for p, v in jax.tree_util.tree_leaves_with_path(tree)}

        for tree_m, tree_v, rtol, atol in (
            (state_m.batch_stats, state_v.batch_stats, 2e-4, 1e-5),
            (state_m.params, state_v.params, 2e-3, 2e-5),
        ):
            fm, fv = flat(tree_m), flat(tree_v)
            assert fm.keys() == fv.keys()
            for k in fm:
                np.testing.assert_allclose(np.asarray(fm[k]), np.asarray(fv[k]),
                                           rtol=rtol, atol=atol, err_msg=k)

    def test_unmasked_padded_batch_differs(self):
        # sanity: without masked_bn the zero rows DO move the stats
        r = np.random.default_rng(0)
        img = r.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
        lab = r.integers(0, 3, (8,)).astype(np.int64)
        mask = np.zeros((8,), bool)
        mask[:5] = True
        one = jnp.asarray(1.0)
        import jax

        outs = []
        for masked in (True, False):
            step, state, key = self._setup(masked_bn=masked, bsz=8)
            state, _ = step(state, jnp.asarray(img), jnp.asarray(lab),
                            jnp.asarray(mask), key, one, one)
            outs.append(jax.tree_util.tree_leaves(state.batch_stats))
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(*outs)]
        assert max(diffs) > 1e-3


class TestMaskedBNUnicom:
    """The unicom feature head carries BatchNorm1d (2-D activations): the
    sample mask must weight padded rows out of those stats too."""

    def test_padded_matches_valid_only(self):
        import jax

        from nkbx.models.classifier import SingletaskClassifier
        from nkbx.models.vit import UnicomViT
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        def build():
            backbone = UnicomViT(patch_size=8, dim=32, depth=1, n_heads=2,
                                 embedding_size=16, input_size=16, dtype=jnp.float32)
            module = SingletaskClassifier(backbone=backbone, n_classes=3)
            dummy = jnp.zeros((1, 16, 16, 3), jnp.float32)
            variables = module.init({"params": jax.random.PRNGKey(0)}, dummy, train=False)

            class M:
                pass

            m = M()
            m.module = module
            m.params = variables["params"]
            m.batch_stats = variables.get("batch_stats", {})
            return m

        r = np.random.default_rng(0)
        n_valid, bsz = 5, 8
        img = r.normal(size=(bsz, 16, 16, 3)).astype(np.float32)
        img[n_valid:] = 0.0
        lab = np.zeros(bsz, np.int64)
        lab[:n_valid] = r.integers(0, 3, n_valid)
        mask = np.zeros(bsz, bool)
        mask[:n_valid] = True
        one = jnp.asarray(1.0)
        key = jax.random.PRNGKey(0)

        outs = []
        for masked, (im, lb, mk) in (
            (True, (img, lab, mask)),
            (False, (img[:n_valid], lab[:n_valid], np.ones(n_valid, bool))),
        ):
            model = build()
            criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
            bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.1})
            step = build_train_step(model, criterion, bundle, masked_bn=masked)
            state = TrainState.create(model.params, model.batch_stats, bundle.tx)
            state, metrics = step(state, jnp.asarray(im), jnp.asarray(lb),
                                  jnp.asarray(mk), key, one, one)
            outs.append((float(metrics["loss"]), state.batch_stats))

        np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-5)
        a = {jax.tree_util.keystr(p): np.asarray(v)
             for p, v in jax.tree_util.tree_leaves_with_path(outs[0][1])}
        b = {jax.tree_util.keystr(p): np.asarray(v)
             for p, v in jax.tree_util.tree_leaves_with_path(outs[1][1])}
        assert a.keys() == b.keys() and any("feature_bn" in k for k in a)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=2e-4, atol=1e-5, err_msg=k)


class TestScanSteps:
    """steps_per_dispatch: lax.scan of K train steps in one dispatch must be
    step-for-step identical to K sequential single-step dispatches."""

    def _setup(self, scan_steps):
        import jax

        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            classes=["a", "b", "c"], input_size=(16, 16), seed=0, dtype=jnp.float32,
        )
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        step = build_train_step(model, criterion, bundle, masked_bn=True,
                                scan_steps=scan_steps)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx)
        return step, state

    def _data(self, k=4, bsz=4):
        r = np.random.default_rng(0)
        imgs = r.integers(0, 255, (k, bsz, 16, 16, 3)).astype(np.uint8)
        labs = r.integers(0, 3, (k, bsz)).astype(np.int64)
        masks = np.ones((k, bsz), bool)
        masks[-1, -1] = False  # a padded row inside the chunk
        return imgs, labs, masks

    def test_matches_sequential(self):
        import jax

        imgs, labs, masks = self._data()
        key = jax.random.PRNGKey(0)
        one = jnp.asarray(1.0)

        step1, state1 = self._setup(1)
        losses_seq = []
        for i in range(len(imgs)):
            state1, m = step1(state1, jnp.asarray(imgs[i]), jnp.asarray(labs[i]),
                              jnp.asarray(masks[i]), key, one, one)
            losses_seq.append(float(m["loss"]))

        stepK, stateK = self._setup(4)
        stateK, mK = stepK(stateK, jnp.asarray(imgs), jnp.asarray(labs),
                           jnp.asarray(masks), key, one, one)

        np.testing.assert_allclose(np.asarray(mK["loss"]), losses_seq, rtol=1e-6)
        a = {jax.tree_util.keystr(p): np.asarray(v)
             for p, v in jax.tree_util.tree_leaves_with_path(state1.params)}
        b = {jax.tree_util.keystr(p): np.asarray(v)
             for p, v in jax.tree_util.tree_leaves_with_path(stateK.params)}
        for k_ in a:
            np.testing.assert_allclose(a[k_], b[k_], rtol=1e-5, atol=1e-6, err_msg=k_)
        # stacked metrics flatten identically through the collector
        col = EpochCollector("single")
        col.log_iter(mK)
        res = col.get_epoch_results()
        assert len(res["ground_truth"]) == int(masks.sum())
        np.testing.assert_allclose(res["running_loss"], losses_seq, rtol=1e-6)

    def test_train_epoch_chunks_with_remainder(self):
        import jax

        from nkbx.train.engine import train_epoch

        class FakeLoader:
            def __init__(self, n):
                imgs, labs, masks = TestScanSteps()._data(k=n)
                self.batches = [{"image": imgs[i], "label": labs[i], "mask": masks[i]}
                                for i in range(n)]

            def epoch(self, e):
                return iter(self.batches)

            def __len__(self):
                return len(self.batches)

        # 5 batches, spd=2 -> chunks of 2,2,1 (remainder retrace)
        stepK, stateK = self._setup(2)
        loader = FakeLoader(5)
        stateK, results = train_epoch(stateK, loader, stepK, 0, jax.random.PRNGKey(0),
                                      1.0, 1.0, progress=False)

        step1, state1 = self._setup(1)
        loader1 = FakeLoader(5)
        state1, results1 = train_epoch(state1, loader1, step1, 0, jax.random.PRNGKey(0),
                                       1.0, 1.0, progress=False)

        np.testing.assert_allclose(results["running_loss"], results1["running_loss"],
                                   rtol=1e-6)
        assert results["ground_truth"] == results1["ground_truth"]
        a = jax.tree_util.tree_leaves(stateK.params)
        b = jax.tree_util.tree_leaves(state1.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-6)

    def test_sharded_scan_matches_single_device(self):
        import jax

        from nkbx.parallel import make_mesh, replicated_sharding
        from nkbx.train.engine import _put_batch, _stack_batches

        imgs, labs, masks = self._data(k=2, bsz=8)
        batches = [{"image": imgs[i], "label": labs[i], "mask": masks[i]} for i in range(2)]
        key = jax.random.PRNGKey(0)
        one = jnp.asarray(1.0)

        stepK, state = self._setup(2)
        state, m_single = stepK(state, jnp.asarray(imgs), jnp.asarray(labs),
                                jnp.asarray(masks), key, one, one)

        mesh = make_mesh(n_data=8)
        stepK8, state8 = self._setup(2)
        state8 = jax.device_put(state8, replicated_sharding(mesh))
        dev = _put_batch(_stack_batches(batches), mesh, stacked=True)
        state8, m8 = stepK8(state8, dev["image"], dev["label"], dev["mask"], key, one, one)

        np.testing.assert_allclose(np.asarray(m8["loss"]), np.asarray(m_single["loss"]),
                                   rtol=1e-5)
        for x, y in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state8.params)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)


class TestGradAccum:
    """grad_accum_steps: A sequential microbatches + ONE update must equal the
    full-batch update exactly for BN-free models (valid-count weighting), and
    run with documented ghost-BN semantics for BN models."""

    def _setup(self, grad_accum, with_bn=False):
        import types

        import jax
        from flax import linen as nn

        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        if with_bn:
            model = get_model(
                {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
                classes=["a", "b", "c"], input_size=(16, 16), seed=0, dtype=jnp.float32,
            )
        else:
            class NoBN(nn.Module):
                @nn.compact
                def __call__(self, x, train=False, mask=None):
                    x = nn.Conv(8, (3, 3), strides=(2, 2))(x.astype(jnp.float32))
                    x = nn.relu(x)
                    x = jnp.mean(x, axis=(1, 2))
                    return nn.Dense(3)(x)

            module = NoBN()
            variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
            model = types.SimpleNamespace(module=module, params=variables["params"],
                                          batch_stats={})
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        step = build_train_step(model, criterion, bundle, masked_bn=with_bn,
                                grad_accum_steps=grad_accum)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx)
        return step, state

    def test_matches_full_batch_no_bn(self):
        import jax

        r = np.random.default_rng(1)
        img = r.integers(0, 255, (8, 16, 16, 3)).astype(np.uint8)
        lab = r.integers(0, 3, (8,)).astype(np.int64)
        mask = np.ones(8, bool)
        mask[5] = False  # a padded row: exercises valid-count weighting
        key = jax.random.PRNGKey(0)
        one = jnp.asarray(1.0)

        step1, state1 = self._setup(1)
        new1, m1 = step1(state1, jnp.asarray(img), jnp.asarray(lab),
                         jnp.asarray(mask), key, one, one)

        step4, state4 = self._setup(4)
        new4, m4 = step4(state4, jnp.asarray(img), jnp.asarray(lab),
                         jnp.asarray(mask), key, one, one)

        for a, b in zip(jax.tree_util.tree_leaves(new1.params),
                        jax.tree_util.tree_leaves(new4.params)):
            # accumulation changes the float reduction order: ~1e-6 noise
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        # weighted mean of the (A,) microbatch losses == full-batch loss
        n_valid = np.asarray([2, 2, 1, 2], np.float32)  # row 5 -> microbatch 2
        weighted = float((np.asarray(m4["loss"]) * n_valid).sum() / n_valid.sum())
        np.testing.assert_allclose(weighted, float(m1["loss"]), rtol=1e-5)

    def test_runs_with_bn_and_updates_stats(self):
        import jax

        r = np.random.default_rng(2)
        img = r.integers(0, 255, (8, 16, 16, 3)).astype(np.uint8)
        lab = r.integers(0, 3, (8,)).astype(np.int64)
        mask = np.ones(8, bool)
        key = jax.random.PRNGKey(0)
        one = jnp.asarray(1.0)

        step, state = self._setup(2, with_bn=True)
        before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
        new, m = step(state, jnp.asarray(img), jnp.asarray(lab),
                      jnp.asarray(mask), key, one, one)
        assert np.asarray(m["loss"]).shape == (2,)
        assert np.isfinite(np.asarray(m["loss"])).all()
        after = jax.tree_util.tree_leaves(new.batch_stats)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))

    def test_mutually_exclusive_with_scan(self):
        import pytest

        with pytest.raises(ValueError, match="mutually"):
            self._setup_both()

    def _setup_both(self):
        from nkbx.models import get_model
        from nkbx.train import build_train_step, get_loss, get_optimizer

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            classes=["a", "b"], input_size=(16, 16), dtype=jnp.float32,
        )
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        build_train_step(model, criterion, bundle, scan_steps=2, grad_accum_steps=2)


class TestModelEMA:
    def test_ema_recursion(self):
        import jax

        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            classes=["a", "b"], input_size=(16, 16), seed=0, dtype=jnp.float32,
        )
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        d = 0.9
        step = build_train_step(model, criterion, bundle, ema_decay=d)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx, ema=True)
        p0 = jax.tree_util.tree_map(np.asarray, state.params)

        r = np.random.default_rng(3)
        img = jnp.asarray(r.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8))
        lab = jnp.asarray(r.integers(0, 2, (4,)).astype(np.int64))
        mask = jnp.ones(4, bool)
        key = jax.random.PRNGKey(0)
        one = jnp.asarray(1.0)

        s1, _ = step(state, img, lab, mask, key, one, one)
        p1 = jax.tree_util.tree_map(np.asarray, s1.params)
        e1 = jax.tree_util.tree_map(np.asarray, s1.ema_params)
        s2, _ = step(s1, img, lab, mask, key, one, one)
        p2 = jax.tree_util.tree_map(np.asarray, s2.params)
        e2 = jax.tree_util.tree_map(np.asarray, s2.ema_params)

        for a, b, c, e in zip(jax.tree_util.tree_leaves(p0),
                              jax.tree_util.tree_leaves(p1),
                              jax.tree_util.tree_leaves(p2),
                              jax.tree_util.tree_leaves(e2)):
            want = d * (d * a + (1 - d) * b) + (1 - d) * c
            np.testing.assert_allclose(e, want, rtol=1e-5, atol=1e-7)
        # EMA lags: after one step, ema != params (unless no update happened)
        diffs = [np.abs(x - y).max() for x, y in
                 zip(jax.tree_util.tree_leaves(e1), jax.tree_util.tree_leaves(p1))]
        assert max(diffs) > 0

    def test_ema_off_is_none(self):
        from nkbx.models import get_model
        from nkbx.train import TrainState, get_optimizer

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            classes=["a", "b"], input_size=(16, 16), dtype=jnp.float32,
        )
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        state = TrainState.create(model.params, model.batch_stats, bundle.tx)
        assert state.ema_params is None


class TestGradAccumWeightedCE:
    def test_matches_full_batch_with_class_weights(self):
        """Class-weighted CE normalizes by the weight MASS, not the count:
        microbatch gradients must be weighted by criterion.batch_mass for the
        accumulated update to equal the full-batch update."""
        import types

        import jax
        from flax import linen as nn

        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer

        class NoBN(nn.Module):
            @nn.compact
            def __call__(self, x, train=False, mask=None):
                x = nn.Conv(8, (3, 3), strides=(2, 2))(x.astype(jnp.float32))
                x = nn.relu(x)
                x = jnp.mean(x, axis=(1, 2))
                return nn.Dense(3)(x)

        module = NoBN()
        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        model = types.SimpleNamespace(module=module, params=variables["params"],
                                      batch_stats={})
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss",
                              "weight": [1.0, 5.0, 0.25]})
        r = np.random.default_rng(4)
        img = jnp.asarray(r.integers(0, 255, (8, 16, 16, 3)).astype(np.uint8))
        # classes deliberately unevenly split across the 4 microbatches
        lab = jnp.asarray(np.array([1, 1, 0, 0, 2, 2, 0, 1], np.int64))
        mask = jnp.ones(8, bool)
        key = jax.random.PRNGKey(0)
        one = jnp.asarray(1.0)

        outs = []
        for a in (1, 4):
            bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
            step = build_train_step(model, criterion, bundle, grad_accum_steps=a)
            st = TrainState.create(model.params, model.batch_stats, bundle.tx)
            new, _ = step(st, img, lab, mask, key, one, one)
            outs.append(new.params)
        for x, y in zip(jax.tree_util.tree_leaves(outs[0]),
                        jax.tree_util.tree_leaves(outs[1])):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-5)


class TestEMACheckpointRoundtrip:
    def test_ema_survives_save_restore(self, tmp_path):
        import jax

        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer
        from nkbx.train.checkpoint import restore_train_state, save_checkpoint

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            classes=["a", "b"], input_size=(16, 16), seed=0, dtype=jnp.float32,
        )
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        step = build_train_step(model, criterion, bundle, ema_decay=0.9)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx, ema=True)
        r = np.random.default_rng(5)
        img = jnp.asarray(r.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8))
        lab = jnp.asarray(r.integers(0, 2, (4,)).astype(np.int64))
        state, _ = step(state, img, lab, jnp.ones(4, bool),
                        jax.random.PRNGKey(0), jnp.asarray(1.0), jnp.asarray(1.0))

        save_checkpoint(tmp_path / "ck", state, epoch=0, best_val_acc=0.5)
        template = TrainState.create(model.params, model.batch_stats, bundle.tx, ema=True)
        restored, epoch, acc = restore_train_state(tmp_path / "ck", template)
        for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                        jax.tree_util.tree_leaves(restored.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.ema_batch_stats),
                        jax.tree_util.tree_leaves(restored.ema_batch_stats)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_pre_ema_checkpoint_into_ema_run(self, tmp_path):
        import jax

        from nkbx.models import get_model
        from nkbx.train import TrainState, get_optimizer
        from nkbx.train.checkpoint import restore_train_state, save_checkpoint

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            classes=["a", "b"], input_size=(16, 16), seed=0, dtype=jnp.float32,
        )
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        old = TrainState.create(model.params, model.batch_stats, bundle.tx)  # no EMA
        save_checkpoint(tmp_path / "ck", old, epoch=2, best_val_acc=0.7)
        template = TrainState.create(model.params, model.batch_stats, bundle.tx, ema=True)
        restored, epoch, acc = restore_train_state(tmp_path / "ck", template)
        assert epoch == 2 and abs(acc - 0.7) < 1e-9
        # EMA shadow restarts from the RESTORED params
        for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestEMAResumeNonEMA:
    def test_ema_checkpoint_into_non_ema_run(self, tmp_path):
        import jax

        from nkbx.models import get_model
        from nkbx.train import TrainState, build_train_step, get_loss, get_optimizer
        from nkbx.train.checkpoint import restore_train_state, save_checkpoint

        model = get_model(
            {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
            classes=["a", "b"], input_size=(16, 16), seed=0, dtype=jnp.float32,
        )
        criterion = get_loss({"task": "single", "type": "CrossEntropyLoss"})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        step = build_train_step(model, criterion, bundle, ema_decay=0.9)
        state = TrainState.create(model.params, model.batch_stats, bundle.tx, ema=True)
        r = np.random.default_rng(7)
        state, _ = step(state, jnp.asarray(r.integers(0, 255, (4, 16, 16, 3)).astype(np.uint8)),
                        jnp.asarray(r.integers(0, 2, (4,)).astype(np.int64)),
                        jnp.ones(4, bool), jax.random.PRNGKey(0),
                        jnp.asarray(1.0), jnp.asarray(1.0))
        save_checkpoint(tmp_path / "ck", state, epoch=1, best_val_acc=0.4)

        # resume WITHOUT EMA: the extra EMA entries are discarded gracefully
        template = TrainState.create(model.params, model.batch_stats, bundle.tx)
        restored, epoch, acc = restore_train_state(tmp_path / "ck", template)
        assert epoch == 1 and restored.ema_params is None
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestGradAccumMultiWeighted:
    def test_multitask_weighted_raises(self):
        import types

        import pytest
        from flax import linen as nn

        from nkbx.train import build_train_step, get_loss, get_optimizer

        class Multi(nn.Module):
            @nn.compact
            def __call__(self, x, train=False, mask=None):
                emb = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
                return {"a": nn.Dense(2)(emb), "b": nn.Dense(3)(emb)}

        module = Multi()
        import jax

        variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)))
        model = types.SimpleNamespace(module=module, params=variables["params"],
                                      batch_stats={})
        criterion = get_loss({"task": "multi", "type": "CrossEntropyLoss",
                              "weight": [1.0, 2.0]})
        bundle = get_optimizer(model.params, {"type": "sgd", "lr": 0.05})
        with pytest.raises(ValueError, match="multi-task grad_accum"):
            build_train_step(model, criterion, bundle, grad_accum_steps=2)
