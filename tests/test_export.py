"""Export round-trip: StableHLO bundle must reproduce training-model logits
(SURVEY.md §4: 'export, reload, compare logits at tolerance ~0')."""

from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration tier: excluded by -m 'not slow'



@pytest.fixture(scope="module")
def tiny_model():
    import jax.numpy as jnp

    from nkbx.models import get_model

    return get_model(
        {"task": "single", "model": "resnet_tiny_test", "pretrained": False},
        ["a", "b", "c"], input_size=(32, 32), dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def bundle(tiny_model, tmp_path_factory):
    from nkbx.export import export_model

    out = tmp_path_factory.mktemp("export") / "model.nkbx"
    path, meta = export_model(tiny_model, (8, 32, 32, 3), out, dynamic_batch=True)
    return path, meta


class TestExportRoundTrip:
    def test_metadata(self, bundle):
        from nkbx.export import load_exported

        meta, exported = load_exported(bundle[0])
        assert meta["classes"] == ["a", "b", "c"]
        assert meta["imgsz"] == [32, 32]
        assert meta["layout"] == "NHWC"

    def test_logits_match_training_model(self, tiny_model, bundle):
        import jax.numpy as jnp

        from nkbx.export import TPUServingModule

        serving = TPUServingModule(bundle[0])
        x = np.random.default_rng(0).normal(size=(4, 32, 32, 3)).astype(np.float32)
        served = np.asarray(serving(x))
        direct = np.asarray(tiny_model(jnp.asarray(x)))
        np.testing.assert_allclose(served, direct, atol=1e-5)

    def test_bucket_padding_consistent(self, bundle):
        from nkbx.export import TPUServingModule

        serving = TPUServingModule(bundle[0], buckets=[4, 8])
        x = np.random.default_rng(1).normal(size=(3, 32, 32, 3)).astype(np.float32)
        out3 = np.asarray(serving(x))  # padded to bucket 4
        assert out3.shape == (3, 3)
        out_full = np.asarray(serving(np.concatenate([x, x[:1]])))[:3]
        np.testing.assert_allclose(out3, out_full, atol=1e-5)

    def test_oversize_batch_chunks(self, bundle):
        from nkbx.export import TPUServingModule

        serving = TPUServingModule(bundle[0], buckets=[4])
        x = np.random.default_rng(2).normal(size=(10, 32, 32, 3)).astype(np.float32)
        out = np.asarray(serving(x))
        assert out.shape == (10, 3)

    def test_scripted_config_load(self, bundle):
        """model: {'scripted': True, 'checkpoint': bundle} (reference eval_config.py:87-90)."""
        from nkbx.models import get_model

        m = get_model({"scripted": True, "checkpoint": str(bundle[0])}, classes=None)
        x = np.random.default_rng(3).normal(size=(2, 32, 32, 3)).astype(np.float32)
        out = np.asarray(m(x))
        assert out.shape == (2, 3)
        assert m.classes == ["a", "b", "c"]

    def test_benchmark_runs(self, bundle):
        from nkbx.export import TPUServingModule

        serving = TPUServingModule(bundle[0], buckets=[4])
        stats = serving.benchmark(batch_size=4, iters=5)
        assert stats["p50_ms"] > 0 and stats["images_per_sec"] > 0
        assert stats["pipelined_images_per_sec"] > 0
        assert stats["compute_p99_ms"] >= stats["compute_p50_ms"]

    def test_benchmark_sweep_curve(self, bundle):
        """VERDICT r4 #6: the sweep reports one row per bucket plus the
        bucket-miss (pad) cost between adjacent buckets."""
        from nkbx.export import TPUServingModule

        serving = TPUServingModule(bundle[0], buckets=[2, 4])
        rows = serving.benchmark_sweep(iters=5)
        assert [r["batch_size"] for r in rows] == [2, 4]
        assert "pad_miss_vs_prev_ms" not in rows[0]
        assert isinstance(rows[1]["pad_miss_vs_prev_ms"], float)


class TestFixedBatchExport:
    def test_dynamic_none_bundle_serves_any_batch(self, tiny_model, tmp_path):
        """--dynamic none exports a fixed-batch program; serving must pad/chunk
        to that exact size instead of using power-of-2 buckets."""
        from nkbx.export import TPUServingModule, export_model

        out = tmp_path / "fixed.nkbx"
        export_model(tiny_model, (4, 32, 32, 3), out, dynamic_batch=False)
        serving = TPUServingModule(out)
        assert serving.buckets == [4]
        x = np.random.default_rng(0).normal(size=(3, 32, 32, 3)).astype(np.float32)
        assert np.asarray(serving(x)).shape == (3, 3)  # padded to 4
        x10 = np.random.default_rng(1).normal(size=(10, 32, 32, 3)).astype(np.float32)
        assert np.asarray(serving(x10)).shape == (10, 3)  # chunked
        serving.warm_up()  # must not crash on bucket sizes the program rejects


class TestDynamicAll:
    """--dynamic all analog (reference export.py:80-88,257-269): symbolic H/W
    constrained to multiples of the backbone stride."""

    @pytest.fixture(scope="class")
    def all_bundle(self, tiny_model, tmp_path_factory):
        from nkbx.export import export_model

        out = tmp_path_factory.mktemp("export_all") / "model_all.nkbx"
        path, meta = export_model(tiny_model, (8, 32, 32, 3), out, dynamic="all",
                                  spatial_multiple=8)
        return path, meta

    def test_serves_multiple_spatial_sizes(self, tiny_model, all_bundle):
        import jax.numpy as jnp

        from nkbx.export import TPUServingModule

        mod = TPUServingModule(all_bundle[0], warm_up_on_load=False)
        r = np.random.default_rng(0)
        for hw in (32, 48):
            x = r.random((4, hw, hw, 3)).astype(np.float32)
            got = np.asarray(mod.forward(x))
            want = np.asarray(tiny_model.module.apply(
                tiny_model.variables, jnp.asarray(x), train=False))
            np.testing.assert_allclose(got, want, atol=1e-5)

    def test_batch_still_dynamic(self, all_bundle):
        from nkbx.export import TPUServingModule

        mod = TPUServingModule(all_bundle[0], warm_up_on_load=False)
        x = np.zeros((3, 32, 32, 3), np.float32)
        assert np.asarray(mod.forward(x)).shape == (3, 3)


class TestWarmUpOnLoad:
    def test_default_warms_all_buckets(self, bundle, monkeypatch):
        from nkbx.export import TPUServingModule
        from nkbx.export import serving as serving_mod

        warmed = []
        monkeypatch.setattr(TPUServingModule, "warm_up",
                            lambda self, batches=None: warmed.append(batches))
        TPUServingModule(bundle[0])
        assert warmed == [None]  # None -> every bucket

    def test_opt_out(self, bundle, monkeypatch):
        from nkbx.export import TPUServingModule

        warmed = []
        monkeypatch.setattr(TPUServingModule, "warm_up",
                            lambda self, batches=None: warmed.append(batches))
        TPUServingModule(bundle[0], warm_up_on_load=False)
        assert warmed == []


class TestSavedModelExport:
    def test_roundtrip_logits_match(self, tiny_model, tmp_path):
        tf = pytest.importorskip("tensorflow")

        from nkbx.export import export_savedmodel

        out, meta = export_savedmodel(tiny_model, (4, 32, 32, 3), tmp_path / "sm")
        assert (out / "metadata.json").exists() and (out / "classes.json").exists()

        loaded = tf.saved_model.load(str(out))
        x = np.random.default_rng(0).random((3, 32, 32, 3)).astype(np.float32)
        got = np.asarray(loaded.f(tf.constant(x)))

        import jax.numpy as jnp

        want = np.asarray(tiny_model.module.apply(
            tiny_model.variables, jnp.asarray(x), train=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)


class TestTFLiteExport:
    def test_roundtrip_logits_match(self, tiny_model, tmp_path):
        tf = pytest.importorskip("tensorflow")

        from nkbx.export import export_tflite

        out, meta = export_tflite(tiny_model, (2, 32, 32, 3), tmp_path / "m.tflite")
        assert out.exists() and out.with_suffix(".tflite.json").exists()
        assert meta["task"] == tiny_model.task

        interp = tf.lite.Interpreter(model_path=str(out))
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        x = np.random.default_rng(1).random((2, 32, 32, 3)).astype(np.float32)
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        got = interp.get_tensor(interp.get_output_details()[0]["index"])

        import jax.numpy as jnp

        want = np.asarray(tiny_model.module.apply(
            tiny_model.variables, jnp.asarray(x), train=False))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_dynamic_range_quantization(self, tiny_model, tmp_path):
        tf = pytest.importorskip("tensorflow")

        from nkbx.export import export_tflite

        full, _ = export_tflite(tiny_model, (2, 32, 32, 3), tmp_path / "f.tflite")
        quant, _ = export_tflite(tiny_model, (2, 32, 32, 3), tmp_path / "q.tflite",
                                 quantize="dynamic")
        assert quant.stat().st_size < full.stat().st_size  # int8 weights shrink it

        interp = tf.lite.Interpreter(model_path=str(quant))
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        x = np.random.default_rng(2).random((2, 32, 32, 3)).astype(np.float32)
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        got = interp.get_tensor(interp.get_output_details()[0]["index"])

        import jax.numpy as jnp

        want = np.asarray(tiny_model.module.apply(
            tiny_model.variables, jnp.asarray(x), train=False))
        # int8 weight quantization: same argmax, coarse logits
        assert (got.argmax(-1) == want.argmax(-1)).all()

    def test_unknown_quantize_mode_raises(self, tiny_model, tmp_path):
        pytest.importorskip("tensorflow")

        from nkbx.export import export_tflite

        with pytest.raises(ValueError, match="quantize"):
            export_tflite(tiny_model, (2, 32, 32, 3), tmp_path / "x.tflite",
                          quantize="int4")


class TestOnnxExport:
    def test_graceful_without_tf2onnx_writes_savedmodel(self, tiny_model, tmp_path):
        """tf2onnx is an optional dep: absent, export_onnx must still write
        the SavedModel and raise with the exact finish-elsewhere recipe."""
        pytest.importorskip("tensorflow")
        try:
            import tf2onnx  # noqa: F401

            pytest.skip("tf2onnx installed; graceful path not reachable")
        except ImportError:
            pass
        from nkbx.export import export_onnx

        out = tmp_path / "model.onnx"
        with pytest.raises(RuntimeError, match="tf2onnx.convert --saved-model"):
            export_onnx(tiny_model, (2, 32, 32, 3), out)
        sm = tmp_path / "model_savedmodel"
        assert (sm / "saved_model.pb").exists()
        assert (sm / "metadata.json").exists()

    def test_opset_plumbs_into_recipe(self, tiny_model, tmp_path):
        """``opset`` (export.py --opset, reference export.py --opset) must
        reach the tf2onnx command — here visible in the finish-elsewhere
        recipe since tf2onnx is absent."""
        pytest.importorskip("tensorflow")
        try:
            import tf2onnx  # noqa: F401

            pytest.skip("tf2onnx installed; graceful path not reachable")
        except ImportError:
            pass
        from nkbx.export import export_onnx

        with pytest.raises(RuntimeError, match="--opset 13"):
            export_onnx(tiny_model, (2, 32, 32, 3), tmp_path / "m.onnx", opset=13)

    def test_formats_table_lists_all(self):
        from nkbx.utils.misc import export_formats

        args = set(export_formats()["Argument"])
        assert {"stablehlo", "serving", "savedmodel", "tflite", "onnx"} <= args


class TestExportCLIArgs:
    """The export CLI must accept the reference's full argument surface
    (reference export.py:25-85) so migrated shell scripts run unchanged:
    --sim / --device / -v are accepted everywhere (--device is ignored with
    a note; --sim only acts on --to onnx)."""

    def _parse(self, monkeypatch, extra):
        import importlib
        import sys

        spec = importlib.util.spec_from_file_location(
            "export_cli", str(Path(__file__).parent.parent / "export.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(sys, "argv",
                            ["export.py", "-cfg", "c.py", "--to", "stablehlo",
                             "-w", "weights/best"] + extra)
        return mod.parse_args()

    def test_reference_flags_accepted(self, monkeypatch):
        args = self._parse(monkeypatch,
                           ["--sim", "--device", "cuda:0", "-v", "--opset", "13"])
        assert args.sim and args.device == "cuda:0" and args.verbose
        assert args.opset == 13

    def test_defaults(self, monkeypatch):
        args = self._parse(monkeypatch, [])
        assert not args.sim and args.device is None and not args.verbose


class TestTorchOnnxFallback:
    """ONNX through the torch replica path (nkbx/export/torch_onnx.py):
    reverse-converted weights + runnable replica, forward-parity-verified
    (tight atol) before writing; works without tf2onnx/onnx installed."""

    def _model(self, task, classes):
        import jax.numpy as jnp

        from nkbx.models import get_model

        return get_model({"task": task, "model": "resnet_tiny_test",
                          "pretrained": False}, classes,
                         input_size=(32, 32), dtype=jnp.float32)

    def test_single_task_emits_model_and_sidecar(self, tmp_path):
        import json

        from nkbx.export.torch_onnx import export_onnx_via_torch

        model = self._model("single", ["a", "b", "c"])
        out, meta = export_onnx_via_torch(
            model, "resnet_tiny_test", tmp_path / "m.onnx", (1, 32, 32, 3),
            verify_atol=1e-4)  # the parity gate runs tight before writing
        data = out.read_bytes()
        assert len(data) > 100_000 and data[:1] == b"\x08"  # ModelProto ir_version
        side = json.loads((tmp_path / "m.onnx.json").read_text())
        assert side["output_names"] == ["output"]
        assert side["layout"] == "NCHW"

    def test_multi_task_output_names_are_targets(self, tmp_path):
        from nkbx.export.torch_onnx import export_onnx_via_torch

        model = self._model("multi", {"color": ["r", "g"], "size": ["s", "l"]})
        out, meta = export_onnx_via_torch(
            model, "resnet_tiny_test", tmp_path / "m.onnx", (1, 32, 32, 3),
            verify_atol=1e-4)
        # the reference's export crashes on single-task here (export.py:149,
        # list(classes.keys()) on a list); multi keeps target names
        assert meta["output_names"] == ["color", "size"]
        assert out.exists()


    def test_torchscript_artifact_roundtrips(self, tmp_path):
        """--to torchscript: the reference's own .pt artifact — traced from
        the weight-equivalent replica, reloads with plain torch.jit.load
        (reference model.py:163-164), embedded config.txt metadata, and is
        batch-polymorphic for CNN backbones."""
        import json

        import torch

        from nkbx.export.torch_onnx import export_torchscript_via_torch

        model = self._model("single", ["a", "b", "c"])
        out, _ = export_torchscript_via_torch(
            model, "resnet_tiny_test", tmp_path / "m.pt", (1, 32, 32, 3),
            metadata={"stride": 32}, verify_atol=1e-4)
        extra = {"config.txt": ""}
        loaded = torch.jit.load(str(out), _extra_files=extra)
        meta = json.loads(extra["config.txt"])
        assert meta["backbone"] == "resnet_tiny_test" and meta["stride"] == 32
        import numpy as np

        import jax.numpy as jnp

        x = np.random.default_rng(1).normal(size=(3, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            y = loaded(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
        ours = np.asarray(model.apply(model.variables, jnp.asarray(x), train=False))
        np.testing.assert_allclose(y, ours, atol=1e-4, rtol=1e-3)


    @pytest.mark.parametrize("name,size", [
        ("vit_tiny_patch16_224", 224),
        ("swin_tiny_patch4_window7_224", 224),
    ])
    def test_transformer_torchscript_dynamic_batch(self, tmp_path, name, size):
        """VERDICT r4 #3: transformer replica traces are batch-polymorphic —
        the exported .pt (traced at bs=2) serves bs {1, 4, 16} with logits
        matching the nkbx model (reference export.py:169-176 dynamic-batch
        surface)."""
        import jax.numpy as jnp
        import numpy as np
        import torch

        from nkbx.export.torch_onnx import export_torchscript_via_torch
        from nkbx.models import get_model

        model = get_model({"task": "single", "model": name,
                           "pretrained": False}, ["a", "b"],
                          input_size=(size, size), dtype=jnp.float32)
        out, _ = export_torchscript_via_torch(
            model, name, tmp_path / "m.pt", (2, size, size, 3),
            verify_atol=1e-4)
        m = torch.jit.load(str(out))
        rng = np.random.default_rng(0)
        for bs in (1, 4, 16):
            x = rng.normal(size=(bs, size, size, 3)).astype(np.float32)
            with torch.no_grad():
                y = m(torch.tensor(np.transpose(x, (0, 3, 1, 2)))).numpy()
            assert y.shape == (bs, 2)
            ours = np.asarray(model.apply(model.variables, jnp.asarray(x),
                                          train=False))
            np.testing.assert_allclose(y, ours, atol=5e-4, rtol=1e-3)

    def test_transformer_onnx_declares_dynamic_batch(self, tmp_path):
        """The torch-replica ONNX export of a transformer now declares the
        dynamic batch axis (no static-batch downgrade)."""
        import jax.numpy as jnp

        from nkbx.export.torch_onnx import export_onnx_via_torch
        from nkbx.models import get_model

        model = get_model({"task": "single", "model": "vit_tiny_patch16_224",
                           "pretrained": False}, ["a", "b"],
                          input_size=(224, 224), dtype=jnp.float32)
        out, meta = export_onnx_via_torch(
            model, "vit_tiny_patch16_224", tmp_path / "vit.onnx",
            (2, 224, 224, 3), dynamic_batch=True, verify_atol=1e-4)
        data = out.read_bytes()
        # the declared dim_param symbol appears in the serialized ModelProto
        # graph input/output types iff dynamic axes survived the export
        assert b"batch" in data
        # and no fixed batch of 2 in the (tiny) value_info region? cheap
        # structural check: a static export of the same model has no symbol
        out2, _ = export_onnx_via_torch(
            model, "vit_tiny_patch16_224", tmp_path / "vit_static.onnx",
            (2, 224, 224, 3), dynamic_batch=False, verify=False)
        assert b"batch" not in out2.read_bytes()
