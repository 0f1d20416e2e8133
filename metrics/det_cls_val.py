"""Compound detector + classifier system evaluation (TPU-native).

Reference: metrics/det_cls_val.py (614 LoC) — YOLO detector + TorchScript
classifier over a YOLO val set, greedy IoU matching, 40-threshold PR sweep,
per-class AP, three matplotlib figures, predictions/gt/metrics CSVs.

nkbx keeps the identical matching/sweep/AP math and artifact set, with the
model plumbing TPU-native:

- the classifier is an exported ``.nkbx`` serving bundle run through
  ``TPUServingModule`` (batched crops, bucketed compilation) — replacing
  ``torch.jit.load``;
- the detector is either (a) an ultralytics YOLO checkpoint when the
  ``ultralytics`` package is importable (optional dependency), or (b) a
  **precomputed detections CSV** (``--detections``) in exactly the
  ``predictions.csv`` schema this tool itself writes (image_path,
  xmin..ymax normalized, conf, detection_label) — so any detector runtime
  can feed the evaluation.

Usage:
    python metrics/det_cls_val.py --config data.yaml \
        --detections runs/det/predictions.csv \
        --weights_classifier runs/train/weights/best.nkbx \
        --output_folder runs/det_cls_val -pad
"""

from __future__ import annotations

import argparse
import colorsys
import hashlib
import logging
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

# allow running as `python metrics/det_cls_val.py` from anywhere
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s")


def img2label_path(img_path: Path):
    """YOLO convention: dir/images/x.jpg -> dir/labels/x.txt."""
    img_path = Path(img_path)
    return img_path.parent.parent / "labels" / img_path.with_suffix(".txt").name


def generate_color(parameter_name):
    """Deterministic per-label plot color from an md5 hash (reference :45-58)."""
    hash_int = int(hashlib.md5(parameter_name.encode()).hexdigest(), 16)
    hue = (hash_int % 360) / 360.0
    rgb = colorsys.hls_to_rgb(hue, 0.5, 0.9)
    return "#{:02x}{:02x}{:02x}".format(int(rgb[0] * 255), int(rgb[1] * 255), int(rgb[2] * 255))


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of (N,4) x (M,4) xyxy boxes (torchvision.ops.box_iou analog)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / np.maximum(union, 1e-12)


class Evaluator:
    def __init__(
        self,
        dataset_cfg: dict,
        classification_model_path=None,
        detection_model_path=None,
        detections_csv=None,
        is_detector_single_class=False,
        min_det_conf_threshold=0.1,
        nms_iou=0.2,
        match_iou=0.5,
        cls_inf_size=192,
        pad=False,
        cls_batch=64,
    ):
        self.dataset_cfg = dataset_cfg
        self.is_detector_single_class = is_detector_single_class
        self.min_det_conf_threshold = min_det_conf_threshold
        self.nms_iou = nms_iou
        self.match_iou = match_iou
        self.cls_batch = cls_batch

        self.detector = None
        self.detections_csv = detections_csv
        if detection_model_path is not None:
            try:
                from ultralytics import YOLO  # optional dependency

                self.detector = YOLO(detection_model_path)
            except ImportError as e:
                raise RuntimeError(
                    "ultralytics is not installed; pass --detections with a "
                    "precomputed detections CSV instead"
                ) from e

        self.classifier = None
        if classification_model_path is not None:
            if str(classification_model_path).endswith(".pt"):
                # TorchScript classifier — the artifact type the REFERENCE's
                # det_cls_val consumes (its :86-109 torch.jit.load), which
                # export.py --to torchscript now emits: evaluate the exact
                # file you deploy on a torch stack. NCHW, CPU. (nkbx exports
                # are batch-generic for every family; the probe below still
                # handles third-party static-batch traces.)
                import torch

                self._torch_classifier = torch.jit.load(
                    str(classification_model_path), map_location="cpu")
                self._torch_classifier.eval()
                # Probe batch flexibility once at load: transformer replica
                # traces are STATIC-batch (their reshapes constant-fold), so a
                # variable-size crop batch would crash mid-evaluation. Tiny
                # forwards at bs=1 and bs=2 decide: both pass -> batch-generic
                # (CNNs); one fails -> scan for the traced batch size (shape
                # metadata does not survive jit.save) and pad/chunk every
                # classify call to it.
                def _probe(bs):
                    try:
                        with torch.no_grad():
                            out = self._torch_classifier(torch.zeros(
                                bs, 3, cls_inf_size, cls_inf_size))
                        if isinstance(out, (tuple, list)):
                            out = out[0]
                        return out.shape[0] == bs
                    except RuntimeError:
                        return False

                self._torch_trace_batch = None
                if not (_probe(1) and _probe(2)):
                    trace_b = next((b for b in range(1, 1025) if _probe(b)), None)
                    if trace_b is None:
                        raise RuntimeError(
                            f"TorchScript classifier {classification_model_path} "
                            f"rejects every batch size 1..1024 at spatial size "
                            f"{cls_inf_size} — was it traced at a different "
                            f"input size? Re-export with --to torchscript "
                            f"--input-shape B {cls_inf_size} {cls_inf_size} 3 "
                            f"(spatial size must match --cls_inf_size)")
                    self._torch_trace_batch = trace_b
                self.classifier = self._classify_torch
            else:
                from nkbx.export import TPUServingModule

                self.classifier = TPUServingModule(classification_model_path)

            import nkbx.transforms as T

            resizing = (
                [T.LongestMaxSize(cls_inf_size), T.PadIfNeeded(cls_inf_size, cls_inf_size, border_mode=0, value=0)]
                if pad
                else [T.Resize(cls_inf_size, cls_inf_size)]
            )
            self.classifier_preprocess = T.Compose(
                resizing + [T.Normalize(mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225))]
            )

        self.all_images, self.all_labels = self.process_yolo_dataset_cfg()

    # ------------------------------------------------------------------ data

    def process_yolo_dataset_cfg(self):
        """Enumerate val images + label files from an ultralytics data YAML
        (reference :132-176 semantics: txt list / images dir / parent dir)."""
        self.base_path = Path(self.dataset_cfg["path"])
        val_paths = self.dataset_cfg["val"]
        if not isinstance(val_paths, list):
            val_paths = [val_paths]
        self.nc = self.dataset_cfg["nc"]
        names = self.dataset_cfg["names"]
        self.names = {i: nm for i, nm in enumerate(names)} if isinstance(names, list) else dict(names)
        all_images, all_labels = [], []
        for val_path in val_paths:
            p = self.base_path / val_path
            if p.is_file() and p.suffix == ".txt":
                with open(p, "r") as f:
                    image_paths = [Path(line.strip()) for line in f if line.strip()]
            elif p.is_dir() and p.name == "images":
                image_paths = sorted(p.iterdir())
            elif p.is_dir() and (p / "images").exists():
                image_paths = sorted((p / "images").iterdir())
            else:
                raise ValueError(f"Unsupported yolo dataset path: {p}")
            all_images.extend(image_paths)
            all_labels.extend(img2label_path(i) for i in image_paths)
        return all_images, all_labels

    # ------------------------------------------------------------- inference

    def _detect(self, image_path):
        """(N, 6) array [x1n, y1n, x2n, y2n, conf, label] for one image."""
        res = self.detector(
            str(image_path), verbose=False, conf=self.min_det_conf_threshold, iou=self.nms_iou
        )
        data = res[0].boxes.data.cpu().numpy()
        data[:, :4] = res[0].boxes.xyxyn.cpu().numpy()
        return data

    def _load_detections_csv(self):
        import pandas as pd

        df = pd.read_csv(self.detections_csv)
        by_img = {}
        for img, g in df.groupby("image_path"):
            by_img[str(Path(img))] = g[["xmin", "ymin", "xmax", "ymax", "conf", "detection_label"]].values
        return by_img

    def _classify_torch(self, batch_nhwc):
        import torch

        x = torch.tensor(np.transpose(
            np.asarray(batch_nhwc, dtype=np.float32), (0, 3, 1, 2)))
        trace_b = self._torch_trace_batch
        with torch.no_grad():
            if trace_b is None:  # batch-generic trace (CNN backbones)
                out = self._torch_classifier(x)
                if isinstance(out, (tuple, list)):  # multi-task traces
                    out = out[0]
                return out.numpy()
            # static-batch trace (transformer replicas): pad/chunk the crop
            # batch to the traced size, slice the real rows back out
            outs = []
            for i in range(0, x.shape[0], trace_b):
                chunk = x[i:i + trace_b]
                k = chunk.shape[0]
                if k < trace_b:
                    chunk = torch.cat(
                        [chunk, chunk.new_zeros((trace_b - k, *chunk.shape[1:]))])
                out = self._torch_classifier(chunk)
                if isinstance(out, (tuple, list)):
                    out = out[0]
                outs.append(out[:k])
        return torch.cat(outs).numpy()

    def classify_crops(self, image_path, boxes_n):
        """Batch-classify normalized-coords crops through the serving bundle
        (reference :228-244, but batched — one TPU dispatch per image)."""
        from nkbx.data.datasets import imread_rgb

        img = imread_rgb(image_path)
        img_h, img_w = img.shape[:2]
        boxes = boxes_n.copy()
        boxes[:, [0, 2]] *= img_w
        boxes[:, [1, 3]] *= img_h
        crops = []
        for x1, y1, x2, y2 in boxes.astype(int):
            x1, y1 = max(0, x1), max(0, y1)
            x2, y2 = min(img_w, max(x2, x1 + 1)), min(img_h, max(y2, y1 + 1))
            crop = img[y1:y2, x1:x2]
            crops.append(self.classifier_preprocess.host_apply(crop))
        if not crops:
            return np.empty(0, dtype=int)
        batch = np.stack(crops)
        import jax

        aug = self.classifier_preprocess.device_apply(batch, jax.random.PRNGKey(0), False)
        logits = self.classifier(np.asarray(aug))
        return np.asarray(logits).argmax(axis=1)

    def process_image(self, image_path, label_path, det_by_img=None):
        results = {}
        try:
            if self.detector is not None:
                detector_preds = self._detect(image_path)
            else:
                detector_preds = det_by_img.get(str(Path(image_path)), np.empty((0, 6)))
                detector_preds = detector_preds[detector_preds[:, 4] >= self.min_det_conf_threshold]
            gt_boxes = []
            with open(label_path, "r") as lf:
                for line in lf:
                    class_label, xc, yc, w, h = map(float, line.split())
                    gt_boxes.append([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2, class_label])
            gt_boxes = np.stack(gt_boxes) if gt_boxes else np.empty((0, 5))
        except Exception as e:
            logging.error(f"Error processing {label_path}: {e}")
            return results
        classifier_preds = (
            self.classify_crops(image_path, detector_preds[:, :4]) if self.classifier is not None else None
        )
        return {"detector_preds": detector_preds, "classifier_preds": classifier_preds, "gt_boxes": gt_boxes}

    # ------------------------------------------------------------------ eval

    def eval(self, output_folder):
        import pandas as pd
        from sklearn.metrics import auc
        from tqdm import tqdm

        output_folder = Path(output_folder)
        det_by_img = self._load_detections_csv() if self.detections_csv else None

        predictions_df = defaultdict(list)
        gt_df = defaultdict(list)
        for img_path, lb_path in tqdm(list(zip(self.all_images, self.all_labels)), desc="Inference"):
            results = self.process_image(img_path, lb_path, det_by_img)
            if not results:
                continue
            for det_pred in results["detector_preds"]:
                predictions_df["image_path"].append(str(img_path))
                predictions_df["xmin"].append(det_pred[0])
                predictions_df["ymin"].append(det_pred[1])
                predictions_df["xmax"].append(det_pred[2])
                predictions_df["ymax"].append(det_pred[3])
                predictions_df["conf"].append(det_pred[-2])
                predictions_df["detection_label"].append(int(det_pred[-1]))
            if self.classifier is not None:
                predictions_df["classifier_label"].extend(results["classifier_preds"].astype(int).tolist())
            for gt_item in results["gt_boxes"]:
                gt_df["image_path"].append(str(img_path))
                gt_df["xmin"].append(gt_item[0])
                gt_df["ymin"].append(gt_item[1])
                gt_df["xmax"].append(gt_item[2])
                gt_df["ymax"].append(gt_item[3])
                gt_df["label"].append(int(gt_item[4]))
        predictions_df = pd.DataFrame(predictions_df)
        gt_df = pd.DataFrame(gt_df)
        predictions_df.to_csv(output_folder / "predictions.csv", index=False)
        gt_df.to_csv(output_folder / "gt.csv", index=False)
        logging.info(f"Saved predictions to {output_folder}")

        # -- greedy IoU matching (reference :282-306): each prediction matches
        #    its argmax-IoU GT if above match_iou
        matched_dets, unmatched_dets, unmatched_gts, matched_gts = [], [], [], []
        n_pred_cols = 7 if self.classifier is not None else 6
        for img_path in gt_df["image_path"].unique():
            gt_img = gt_df[gt_df["image_path"] == img_path]
            pred_img = predictions_df[predictions_df["image_path"] == img_path] if len(predictions_df) else predictions_df
            gt_info = gt_img[["xmin", "ymin", "xmax", "ymax", "label"]].values
            cols = ["xmin", "ymin", "xmax", "ymax", "conf", "detection_label"]
            if self.classifier is not None:
                cols.append("classifier_label")
            pred_info = pred_img[cols].values if len(pred_img) else np.empty((0, n_pred_cols))
            iou = box_iou(pred_info[:, :4], gt_info[:, :4])
            gt_idxs = []
            for i in range(len(pred_info)):
                if iou.shape[1] == 0:
                    unmatched_dets.append(pred_info[i])
                    continue
                gt_idx = int(np.argmax(iou[i]))
                if iou[i, gt_idx] > self.match_iou:
                    matched_dets.append(np.concatenate([pred_info[i], gt_info[gt_idx]]))
                    matched_gts.append(gt_info[gt_idx])
                    gt_idxs.append(gt_idx)
                else:
                    unmatched_dets.append(pred_info[i])
            for j, gt_box in enumerate(gt_info):
                if j not in gt_idxs:
                    unmatched_gts.append(gt_box)

        matched_dets = np.stack(matched_dets) if matched_dets else np.empty((0, n_pred_cols + 5))
        unmatched_dets = np.stack(unmatched_dets) if unmatched_dets else np.empty((0, n_pred_cols))
        unmatched_gts = np.stack(unmatched_gts) if unmatched_gts else np.empty((0, 5))
        matched_gts = np.stack(matched_gts) if matched_gts else np.empty((0, 5))

        # -- 40-threshold confidence sweep (reference :311-376)
        thresholds = np.linspace(self.min_det_conf_threshold, 0.95, num=40, endpoint=True)
        metrics = defaultdict(list)
        skip_labels = []
        fp_label = self.nc  # classifier background class index
        gt_lb_idx = n_pred_cols + 4  # gt label column in matched rows
        cls_idx = 6
        for thr in thresholds:
            m_thr = matched_dets[matched_dets[:, 4] > thr]
            u_thr = unmatched_dets[unmatched_dets[:, 4] > thr]
            metrics["det_pr"].append(len(m_thr) / (len(m_thr) + len(u_thr) + 1e-6))
            metrics["det_recall"].append(len(m_thr) / (len(matched_gts) + len(unmatched_gts) + 1e-6))
            metrics["threshold"].append(thr)
            if self.classifier is not None:
                # drop predictions the classifier calls background (false-positive filter)
                u_cls = u_thr[u_thr[:, cls_idx] != fp_label]
                m_cls = m_thr[m_thr[:, cls_idx] != fp_label]
                metrics["det_cls_pr"].append(len(m_cls) / (len(u_cls) + len(m_cls) + 1e-6))
                metrics["det_cls_recall"].append(len(m_cls) / (len(matched_gts) + len(unmatched_gts) + 1e-6))
                lb_cls_m = m_cls[m_cls[:, cls_idx] == m_cls[:, gt_lb_idx]]
                lb_cls_u = m_cls[m_cls[:, cls_idx] != m_cls[:, gt_lb_idx]]
            if not self.is_detector_single_class:
                lb_det_m = m_thr[m_thr[:, 5] == m_thr[:, gt_lb_idx]]
                lb_det_u = m_thr[m_thr[:, 5] != m_thr[:, gt_lb_idx]]
            for i, label in self.names.items():
                if len(gt_df[gt_df["label"] == i]) == 0:
                    skip_labels.append(label)
                    continue
                n_gt_i = (matched_gts[:, 4] == i).sum() + (unmatched_gts[:, 4] == i).sum()
                if not self.is_detector_single_class:
                    tp_det = (lb_det_m[:, 5] == i).sum()
                    fp_det = (lb_det_u[:, 5] == i).sum() + (u_thr[:, 5] == i).sum()
                    metrics[f"{label}_det_pr"].append(tp_det / (tp_det + fp_det + 1e-6))
                    metrics[f"{label}_det_recall"].append(tp_det / (n_gt_i + 1e-6))
                if self.classifier is not None:
                    tp_cls = (lb_cls_m[:, cls_idx] == i).sum()
                    fp_cls = (lb_cls_u[:, cls_idx] == i).sum() + (u_cls[:, cls_idx] == i).sum()
                    metrics[f"{label}_det_cls_pr"].append(tp_cls / (tp_cls + fp_cls + 1e-6))
                    metrics[f"{label}_det_cls_recall"].append(tp_cls / (n_gt_i + 1e-6))

        metrics = pd.DataFrame(metrics)
        metrics.to_csv(output_folder / "metrics.csv")

        det_ap = auc(metrics["det_recall"], metrics["det_pr"])
        det_lb_aps, det_cls_lb_aps = {}, {}
        det_cls_ap = None
        if self.classifier is not None:
            det_cls_ap = auc(metrics["det_cls_recall"], metrics["det_cls_pr"])
        for _, label in self.names.items():
            if label in skip_labels:
                continue
            if not self.is_detector_single_class:
                det_lb_aps[label] = auc(metrics[f"{label}_det_recall"], metrics[f"{label}_det_pr"])
            if self.classifier is not None:
                det_cls_lb_aps[label] = auc(metrics[f"{label}_det_cls_recall"], metrics[f"{label}_det_cls_pr"])

        self._plot(output_folder, metrics, skip_labels, det_ap, det_cls_ap, det_lb_aps, det_cls_lb_aps)

        if self.classifier is not None:
            print(f"Single class metrics AP: detection {det_ap:.3f}, detection + classification {det_cls_ap:.3f}")
        else:
            print(f"Single class metrics AP: detection {det_ap:.3f}")
        for _, label in self.names.items():
            if label in skip_labels:
                continue
            parts = []
            if not self.is_detector_single_class:
                parts.append(f"detection {det_lb_aps[label]:.3f}")
            if self.classifier is not None:
                parts.append(f"detection + classification {det_cls_lb_aps[label]:.3f}")
            if parts:
                print(f"Class {label} metrics AP: " + ", ".join(parts))
        return {"det_ap": det_ap, "det_cls_ap": det_cls_ap,
                "det_lb_aps": det_lb_aps, "det_cls_lb_aps": det_cls_lb_aps,
                "metrics": metrics}

    # ------------------------------------------------------------------ plots

    def _plot(self, out, metrics, skip_labels, det_ap, det_cls_ap, det_lb_aps, det_cls_lb_aps):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        def curves(x_key_fmt, y_key_fmt, xlabel, ylabel, title, fname, ap_fmt=None):
            fig, ax = plt.subplots(figsize=(8, 8))
            lbl = f"Single class detection"
            if ap_fmt:
                lbl += f" AP@{self.match_iou:.2f}={det_ap:.3f}"
            ax.plot(metrics[x_key_fmt.format("det")], metrics[y_key_fmt.format("det")],
                    marker="o", linestyle="-", label=lbl, color=generate_color("Single_class"))
            if self.classifier is not None:
                lbl = "Single class detection + classification"
                if ap_fmt:
                    lbl += f" AP@{self.match_iou:.2f}={det_cls_ap:.3f}"
                ax.plot(metrics[x_key_fmt.format("det_cls")], metrics[y_key_fmt.format("det_cls")],
                        marker="x", linestyle="-", label=lbl, color=generate_color("Single class"))
            for _, label in self.names.items():
                if label in skip_labels:
                    continue
                if not self.is_detector_single_class:
                    lbl = f"{label} Detection"
                    if ap_fmt:
                        lbl += f" AP@{self.match_iou:.2f}={det_lb_aps[label]:.3f}"
                    ax.plot(metrics[x_key_fmt.format(f"{label}_det")], metrics[y_key_fmt.format(f"{label}_det")],
                            marker="o", linestyle="-", label=lbl, color=generate_color(label))
                if self.classifier is not None:
                    lbl = f"{label} Detection + classification"
                    if ap_fmt:
                        lbl += f" AP@{self.match_iou:.2f}={det_cls_lb_aps[label]:.3f}"
                    ax.plot(metrics[x_key_fmt.format(f"{label}_det_cls")],
                            metrics[y_key_fmt.format(f"{label}_det_cls")],
                            marker="x", linestyle="-", label=lbl, color=generate_color(label))
            ax.set_title(title)
            ax.set_xlabel(xlabel)
            ax.set_ylabel(ylabel)
            ax.legend()
            ax.set_xlim([0.0, 1.0])
            ax.set_ylim([0.0, 1.0])
            ax.grid(True)
            fig.savefig(Path(out) / fname)
            plt.close(fig)

        map_txt = f"mAP@{self.match_iou:.2f}"
        if det_lb_aps:
            map_txt += f": det {np.mean(list(det_lb_aps.values())):.3f}"
        if det_cls_lb_aps:
            map_txt += f" det+cls {np.mean(list(det_cls_lb_aps.values())):.3f}"
        curves("{}_recall", "{}_pr", "Recall", "Precision",
               f"Precision-Recall Curve, {map_txt}", "PR_curves.png", ap_fmt=True)

        # recall / precision vs threshold
        def thr_curves(y_fmt, ylabel, title, fname):
            fig, ax = plt.subplots(figsize=(8, 8))
            ax.plot(metrics["threshold"], metrics[y_fmt.format("det")], marker="o", linestyle="-",
                    label="Single class detection", color=generate_color("Single_class"))
            if self.classifier is not None:
                ax.plot(metrics["threshold"], metrics[y_fmt.format("det_cls")], marker="x", linestyle="-",
                        label="Single class detection + classification", color=generate_color("Single_class"))
            for _, label in self.names.items():
                if label in skip_labels:
                    continue
                if not self.is_detector_single_class:
                    ax.plot(metrics["threshold"], metrics[y_fmt.format(f"{label}_det")], marker="o",
                            linestyle="-", label=f"{label} Detection", color=generate_color(label))
                if self.classifier is not None:
                    ax.plot(metrics["threshold"], metrics[y_fmt.format(f"{label}_det_cls")], marker="x",
                            linestyle="-", label=f"{label} Detection + classification",
                            color=generate_color(label))
            ax.set_title(title)
            ax.set_xlabel("threshold")
            ax.set_ylabel(ylabel)
            ax.legend()
            ax.set_xlim([0.0, 1.0])
            ax.set_ylim([0.0, 1.0])
            ax.grid(True)
            fig.savefig(Path(out) / fname)
            plt.close(fig)

        thr_curves("{}_recall", "Recall", "Recall Curve", "recall_curves.png")
        thr_curves("{}_pr", "Precision", "Precision Curve", "precision_curves.png")


def main():
    import yaml

    parser = argparse.ArgumentParser(
        description="Validation of detection and detection+classification results."
    )
    parser.add_argument("--config", type=str, required=True, help="ultralytics data YAML")
    parser.add_argument("--weights_detector", type=str, default=None,
                        help="YOLO detector weights (requires ultralytics)")
    parser.add_argument("--detections", type=str, default=None,
                        help="precomputed detections CSV (image_path, xmin..ymax normalized, conf, detection_label)")
    parser.add_argument("--detector_single_class", action="store_true")
    parser.add_argument("--weights_classifier", type=str, default=None,
                        help="classifier artifact: an nkbx .nkbx serving "
                             "bundle, or a .pt TorchScript file (what the "
                             "reference consumes; export.py --to torchscript)")
    parser.add_argument("--iou_threshold", type=float, default=0.5, help="match IoU")
    parser.add_argument("--img_size", type=int, default=192)
    parser.add_argument("--nms_iou_threshold", type=float, default=0.2)
    parser.add_argument("--conf_threshold", type=float, default=0.1)
    parser.add_argument("--output_folder", type=str, default="runs/predict")
    parser.add_argument("-pad", action="store_true", help="LongestMaxSize+Pad instead of Resize for crops")
    args = parser.parse_args()
    assert args.weights_detector or args.detections, "need --weights_detector or --detections"

    with open(args.config, "r") as f:
        dataset_config = yaml.safe_load(f)
    output_folder = Path(args.output_folder)
    output_folder.mkdir(exist_ok=True, parents=True)

    evaluator = Evaluator(
        dataset_cfg=dataset_config,
        classification_model_path=args.weights_classifier,
        detection_model_path=args.weights_detector,
        detections_csv=args.detections,
        is_detector_single_class=args.detector_single_class,
        min_det_conf_threshold=args.conf_threshold,
        nms_iou=args.nms_iou_threshold,
        match_iou=args.iou_threshold,
        cls_inf_size=args.img_size,
        pad=args.pad,
    )
    evaluator.eval(output_folder)


if __name__ == "__main__":
    main()
