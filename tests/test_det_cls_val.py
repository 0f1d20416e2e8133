"""det_cls_val: box_iou, matching, PR sweep, AP — pure math, CPU-testable."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "metrics"))

from det_cls_val import Evaluator, box_iou, generate_color, img2label_path


class TestBoxIoU:
    def test_identity(self):
        a = np.array([[0, 0, 10, 10]], dtype=float)
        assert box_iou(a, a)[0, 0] == pytest.approx(1.0)

    def test_disjoint(self):
        a = np.array([[0, 0, 10, 10]], dtype=float)
        b = np.array([[20, 20, 30, 30]], dtype=float)
        assert box_iou(a, b)[0, 0] == 0.0

    def test_half_overlap(self):
        a = np.array([[0, 0, 10, 10]], dtype=float)
        b = np.array([[5, 0, 15, 10]], dtype=float)
        assert box_iou(a, b)[0, 0] == pytest.approx(50 / 150)

    def test_pairwise_shape_and_symmetry(self):
        r = np.random.default_rng(0)
        a = r.random((8, 4)) * 100
        a[:, 2:] += a[:, :2]
        b = r.random((5, 4)) * 100
        b[:, 2:] += b[:, :2]
        ours = box_iou(a, b)
        assert ours.shape == (8, 5)
        np.testing.assert_allclose(ours, box_iou(b, a).T, atol=1e-12)
        assert (ours >= 0).all() and (ours <= 1).all()

    def test_empty(self):
        assert box_iou(np.empty((0, 4)), np.empty((3, 4))).shape == (0, 3)


class TestHelpers:
    def test_img2label_path(self):
        p = img2label_path(Path("/data/val/images/pic.jpg"))
        assert str(p) == "/data/val/labels/pic.txt"

    def test_generate_color_deterministic(self):
        assert generate_color("dog") == generate_color("dog")
        assert generate_color("dog") != generate_color("cat")
        assert generate_color("dog").startswith("#") and len(generate_color("dog")) == 7


class TestEvalMath:
    @pytest.fixture(scope="class")
    def fixture_dir(self, tmp_path_factory):
        """2-image YOLO val set + detections CSV with one perfect match, one
        miss, and one false positive."""
        import cv2
        import yaml

        root = tmp_path_factory.mktemp("dv")
        (root / "val" / "images").mkdir(parents=True)
        (root / "val" / "labels").mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(str(root / "val" / "images" / f"{i}.jpg"),
                        np.zeros((100, 100, 3), np.uint8))
            with open(root / "val" / "labels" / f"{i}.txt", "w") as f:
                f.write("0 0.5 0.5 0.4 0.4\n")
        rows = ["image_path,xmin,ymin,xmax,ymax,conf,detection_label"]
        img0 = str(root / "val" / "images" / "0.jpg")
        img1 = str(root / "val" / "images" / "1.jpg")
        rows.append(f"{img0},0.3,0.3,0.7,0.7,0.9,0")   # perfect match
        rows.append(f"{img0},0.0,0.0,0.1,0.1,0.8,0")   # false positive
        # image 1: no detection -> missed GT
        det = root / "det.csv"
        det.write_text("\n".join(rows) + "\n")
        cfg = {"path": str(root), "val": "val/images", "nc": 1, "names": ["obj"]}
        return cfg, str(det), root

    def test_matching_and_pr(self, fixture_dir, tmp_path):
        cfg, det_csv, root = fixture_dir
        ev = Evaluator(dataset_cfg=cfg, detections_csv=det_csv,
                       min_det_conf_threshold=0.1, match_iou=0.5)
        out = tmp_path / "out"
        out.mkdir()
        res = ev.eval(out)
        m = res["metrics"]
        # at every threshold <= 0.8: 1 TP, 1 FP, 2 GT -> P=0.5, R=0.5
        row0 = m.iloc[0]
        assert row0["det_pr"] == pytest.approx(0.5, abs=1e-3)
        assert row0["det_recall"] == pytest.approx(0.5, abs=1e-3)
        # at 0.8 < threshold < 0.9: FP (conf 0.8) filtered, TP (0.9) kept -> P=1, R=0.5
        mid = m[(m["threshold"] > 0.8) & (m["threshold"] < 0.9)].iloc[0]
        assert mid["det_pr"] == pytest.approx(1.0, abs=1e-3)
        assert mid["det_recall"] == pytest.approx(0.5, abs=1e-3)
        # at threshold > 0.9: everything filtered -> P=R=0
        last = m.iloc[-1]
        assert last["det_pr"] == pytest.approx(0.0, abs=1e-3)
        assert (out / "PR_curves.png").exists()
        assert (out / "predictions.csv").exists()
        assert (out / "gt.csv").exists()
        assert (out / "metrics.csv").exists()


class TestTorchScriptClassifier:
    def test_det_cls_with_pt_classifier(self, tmp_path):
        """--weights_classifier accepts the reference's own artifact type:
        a TorchScript .pt (export.py --to torchscript). det+cls metrics are
        produced end-to-end with the torch classifier on the crops."""
        import cv2
        import jax.numpy as jnp

        from nkbx.export.torch_onnx import export_torchscript_via_torch
        from nkbx.models import get_model

        root = tmp_path / "dv"
        (root / "val" / "images").mkdir(parents=True)
        (root / "val" / "labels").mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(2):
            cv2.imwrite(str(root / "val" / "images" / f"{i}.jpg"),
                        rng.integers(0, 255, (100, 100, 3), dtype=np.uint8))
            (root / "val" / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
        img0 = str(root / "val" / "images" / "0.jpg")
        det = root / "det.csv"
        det.write_text("image_path,xmin,ymin,xmax,ymax,conf,detection_label\n"
                       f"{img0},0.3,0.3,0.7,0.7,0.9,0\n")
        cfg = {"path": str(root), "val": "val/images", "nc": 1, "names": ["obj"]}

        model = get_model({"task": "single", "model": "resnet_tiny_test",
                           "pretrained": False}, ["obj"],
                          input_size=(32, 32), dtype=jnp.float32)
        pt, _ = export_torchscript_via_torch(
            model, "resnet_tiny_test", tmp_path / "cls.pt", (1, 32, 32, 3),
            verify_atol=1e-4)

        ev = Evaluator(dataset_cfg=cfg, detections_csv=str(det),
                       classification_model_path=str(pt), cls_inf_size=32,
                       min_det_conf_threshold=0.1, match_iou=0.5)
        out = tmp_path / "out"
        out.mkdir()
        res = ev.eval(out)
        m = res["metrics"]
        assert "det_cls_pr" in m.columns
        # the single-class classifier labels the one matched crop class 0 ->
        # det+cls TP; 2 GT with 1 detection -> recall 0.5 (a wrong class
        # would drop it to 0)
        assert m.iloc[0]["det_cls_recall"] == pytest.approx(0.5, abs=1e-3)
        assert (out / "metrics.csv").exists()

    def test_static_batch_pt_classifier_chunks(self, tmp_path):
        """A STATIC-batch trace (transformer replicas: reshapes constant-fold
        to the traced batch) must not crash on a crop batch of a different
        size — the evaluator probes flexibility at load and pads/chunks."""
        import torch

        class StaticNet(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.fc = torch.nn.Linear(3 * 32 * 32, 2)

            def forward(self, x):
                # python-int reshape: constant-folds the batch dim in a trace
                return self.fc(x.reshape(4, -1))

        net = StaticNet().eval()
        traced = torch.jit.trace(net, torch.zeros(4, 3, 32, 32))
        pt = tmp_path / "static.pt"
        torch.jit.save(traced, str(pt))
        # sanity: the artifact really is static-batch
        with pytest.raises(RuntimeError):
            traced(torch.zeros(1, 3, 32, 32))

        cfg = {"path": str(tmp_path), "val": "val/images", "nc": 2,
               "names": ["a", "b"]}
        import cv2

        (tmp_path / "val" / "images").mkdir(parents=True)
        (tmp_path / "val" / "labels").mkdir(parents=True)
        cv2.imwrite(str(tmp_path / "val" / "images" / "0.jpg"),
                    np.zeros((64, 64, 3), dtype=np.uint8))
        (tmp_path / "val" / "labels" / "0.txt").write_text("0 0.5 0.5 0.5 0.5\n")
        det = tmp_path / "det.csv"
        img0 = str(tmp_path / "val" / "images" / "0.jpg")
        # 3 detections (!= traced batch 4) exercises the pad path; 5 would
        # exercise chunking — cover both via two images
        cv2.imwrite(str(tmp_path / "val" / "images" / "1.jpg"),
                    np.zeros((64, 64, 3), dtype=np.uint8))
        (tmp_path / "val" / "labels" / "1.txt").write_text("0 0.5 0.5 0.5 0.5\n")
        img1 = str(tmp_path / "val" / "images" / "1.jpg")
        rows = ["image_path,xmin,ymin,xmax,ymax,conf,detection_label"]
        for k in range(3):
            rows.append(f"{img0},0.{2+k},0.2,0.{6+k//2},0.6,0.9,0")
        for k in range(5):
            rows.append(f"{img1},0.1,0.{1+k},0.5,0.{5+k//2},0.9,0")
        det.write_text("\n".join(rows) + "\n")

        ev = Evaluator(dataset_cfg=cfg, detections_csv=str(det),
                       classification_model_path=str(pt), cls_inf_size=32,
                       min_det_conf_threshold=0.1, match_iou=0.5)
        assert ev._torch_trace_batch == 4
        # direct check: 3-crop and 5-crop batches both classify, and the
        # chunk/pad result equals running the rows through the trace at bs=4
        for n in (3, 5):
            batch = np.random.default_rng(n).normal(size=(n, 32, 32, 3))
            got = ev._classify_torch(batch)
            x = torch.tensor(np.transpose(batch, (0, 3, 1, 2)),
                             dtype=torch.float32)
            pad = torch.cat([x, x.new_zeros((-len(x)) % 4, 3, 32, 32)])
            with torch.no_grad():
                want = torch.cat([traced(pad[i:i + 4]) for i in
                                  range(0, len(pad), 4)])[:n].numpy()
            np.testing.assert_allclose(got, want, rtol=1e-6)
        out = tmp_path / "out"
        out.mkdir()
        res = ev.eval(out)  # end-to-end: no crash on variable crop counts
        assert "det_cls_pr" in res["metrics"].columns
