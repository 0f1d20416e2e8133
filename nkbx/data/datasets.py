"""Dataset readers: CSV single/multi-task, ImageFolder, YOLO-bbox-crops, Groups, folder inference.

Host-side readers with the same config surface and scan semantics as reference
``nkb_classification/dataset.py`` (items 4-10 of SURVEY.md §2.1), but emitting
**uint8 HWC numpy + integer labels** for the nkbx loader: all augmentation beyond
deterministic geometry happens batched on device (nkbx.transforms).

A reader implements:
    __len__()
    read(idx, rng=None) -> (np.uint8 HWC image, label)   # label: int or {target: int}
    get_labels() -> labels for weighted sampling
    .classes / .class_to_idx / .idx_to_class
"""

from __future__ import annotations

import glob
import io
import os
import pickle as pkl
import zipfile
from pathlib import Path
import numpy as np

from nkbx.utils import get_classes_configs, load_classes

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def imread_rgb(path) -> np.ndarray:
    """Decode an image file to uint8 RGB HWC (cv2 fast path, PIL fallback)."""
    try:
        import cv2

        img = cv2.imread(str(path))
        if img is None:
            raise IOError(f"cv2 failed to read {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except ImportError:  # pragma: no cover
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"))


def image_size(path):
    """(height, width) without full decode (PIL header probe)."""
    from PIL import Image

    with Image.open(path) as im:
        w, h = im.size
    return h, w


class AnnotatedSingletaskDataset:
    """CSV-table single-target dataset (reference dataset.py:183-234 semantics).

    CSV columns: ``path``, ``fold``, and ``target_column``. Rows are filtered by
    ``fold``; classes are given or inferred as ``np.sort(np.unique(...))``;
    ``image_base_dir`` prefixes relative paths.
    """

    def __init__(self, annotations_file, target_column, fold="test",
                 image_base_dir=None, classes=None, **kwargs):
        import pandas as pd

        self.table = pd.read_csv(annotations_file)
        self.table = self.table[self.table["fold"] == fold].reset_index(drop=True)
        self.target_column = target_column
        if classes is not None:
            self.classes = load_classes(classes)
        else:
            self.classes = np.sort(np.unique(self.table[target_column].values)).tolist()
        self.class_to_idx, self.idx_to_class = get_classes_configs(self.classes)
        if image_base_dir is not None:
            base = Path(image_base_dir)
            self.paths = [str(base / p) for p in self.table["path"]]
        else:
            self.paths = [str(p) for p in self.table["path"]]
        self.labels = np.asarray(
            [self.class_to_idx[v] for v in self.table[target_column]], dtype=np.int64
        )

    def __len__(self):
        return len(self.table)

    def read(self, idx, rng=None):
        return imread_rgb(self.paths[idx]), int(self.labels[idx])

    def get_labels(self):
        return self.table[self.target_column].values

    def flat_index(self):
        """(paths, crops) for the native decode fast path (nkbx.native)."""
        return self.paths, None

    def label_at(self, idx):
        return int(self.labels[idx])


class AnnotatedMultitaskDataset:
    """CSV-table multi-target dataset (reference dataset.py:482-538 semantics).

    ``target_names`` are sorted; classes per target are given or inferred;
    labels are returned as ``{target: int}``.
    """

    def __init__(self, annotations_file, target_names, fold="test",
                 image_base_dir=None, classes=None, **kwargs):
        import pandas as pd

        self.table = pd.read_csv(annotations_file)
        self.table = self.table[self.table["fold"] == fold].reset_index(drop=True)
        self.target_names = [*sorted(target_names)]
        if classes is not None:
            self.classes = load_classes(classes)
        else:
            self.classes = {
                t: np.sort(np.unique(self.table[t].values)).tolist() for t in self.target_names
            }
        self.class_to_idx, self.idx_to_class = get_classes_configs(self.classes)
        if image_base_dir is not None:
            base = Path(image_base_dir)
            self.paths = [str(base / p) for p in self.table["path"]]
        else:
            self.paths = [str(p) for p in self.table["path"]]
        self.labels = {
            t: np.asarray([self.class_to_idx[t][v] for v in self.table[t]], dtype=np.int64)
            for t in self.target_names
        }

    def __len__(self):
        return len(self.table)

    def read(self, idx, rng=None):
        return imread_rgb(self.paths[idx]), {t: int(self.labels[t][idx]) for t in self.target_names}

    def get_labels(self):
        return self.table[self.target_names].values

    def flat_index(self):
        return self.paths, None

    def label_at(self, idx):
        return {t: int(self.labels[t][idx]) for t in self.target_names}


class ImageFolderDataset:
    """torchvision-ImageFolder-compatible reader: root/<class>/<img> (reference
    dataset.py:580 default branch)."""

    def __init__(self, root, **kwargs):
        self.root = Path(root)
        self.classes = sorted(d.name for d in self.root.iterdir() if d.is_dir())
        if not self.classes:
            raise FileNotFoundError(f"No class directories under {root}")
        self.class_to_idx, self.idx_to_class = get_classes_configs(self.classes)
        self.samples = []
        for cls in self.classes:
            for p in sorted((self.root / cls).rglob("*")):
                if p.suffix.lower() in IMG_EXTENSIONS:
                    self.samples.append((str(p), self.class_to_idx[cls]))
        self.imgs = self.samples  # torchvision-compat alias

    def __len__(self):
        return len(self.samples)

    def read(self, idx, rng=None):
        path, label = self.samples[idx]
        return imread_rgb(path), label

    def get_labels(self):
        return np.asarray([lb for _, lb in self.samples])

    def flat_index(self):
        return [p for p, _ in self.samples], None

    def label_at(self, idx):
        return self.samples[idx][1]


class AnnotatedYOLODataset:
    """YOLO detection dataset -> bbox-crop classification samples.

    Reference semantics (dataset.py:237-479): ultralytics YAML config with
    ``path``/``train``/``val``/``test``/``names`` (+ optional ``download`` URL),
    ``images/`` <-> ``labels/`` directory convention, xywhn->xyxy with clipping,
    ``min_box_size`` filter, and optional synthetic ``<GENERATED>_background``
    crops with IoU-overlap rejection (up to 1000 placement attempts per image,
    probability defaulting to 1/n_classes).
    """

    ATTEMPTS = 1000

    def __init__(self, annotations_file, fold="train", image_base_dir=None,
                 min_box_size=5, generate_backgrounds=False,
                 background_generating_prob=None, background_crop_sizes=(0.1, 0.3),
                 seed=0, **kwargs):
        import yaml

        assert fold in ("train", "val", "test"), f"Got fold equals {fold}"
        self.fold = fold
        self.min_box_size = min_box_size

        if not os.path.exists(annotations_file):
            raise FileNotFoundError(f"Annotations file {annotations_file} does not exist.")
        with open(annotations_file, "r") as f:
            self.yaml_data = yaml.safe_load(f)

        names = self.yaml_data["names"]
        self.idx_to_class = {i: lb for i, lb in enumerate(names)} if isinstance(names, list) else dict(names)
        assert set(self.idx_to_class.keys()) == set(range(len(self.idx_to_class))), (
            "Class indices should form range(0, num_classes) without skips"
        )
        self.classes = [self.idx_to_class[i] for i in range(len(self.idx_to_class))]
        self.class_to_idx = {lb: i for i, lb in self.idx_to_class.items()}

        if generate_backgrounds:
            bg_lb = "<GENERATED>_background"
            self.class_to_idx[bg_lb] = len(self.classes)
            self.idx_to_class[len(self.classes)] = bg_lb
            self.classes.append(bg_lb)
        if background_generating_prob is None:
            background_generating_prob = 1 / len(self.classes)

        folds = self.yaml_data[fold]
        if not isinstance(folds, list):
            folds = [folds]
        base = Path(image_base_dir) if image_base_dir is not None else Path("/")
        image_dirs = [base / self.yaml_data["path"] / p for p in folds]

        if len(image_dirs) == 1 and "download" in self.yaml_data and not image_dirs[0].is_dir():
            # extract under the SAME base-prefixed root the scan uses (the
            # reference extracts to the bare yaml 'path' and then scans a
            # different dir when image_base_dir is set)
            self._download(self.yaml_data["download"], base / self.yaml_data["path"])

        img_paths = self.scan_img_files(image_dirs)

        rng = np.random.default_rng(seed)
        self.list_bbox = []
        for image_filename in sorted(img_paths):
            image_filename = Path(image_filename)
            if image_filename.suffix.lower() not in IMG_EXTENSIONS:
                continue
            labels_dir = image_filename.parent.parent / "labels"
            if not labels_dir.is_dir():
                raise FileNotFoundError(f"Directory {labels_dir} does not exist")
            txt_file = labels_dir / (image_filename.stem + ".txt")
            if not txt_file.is_file():
                continue
            with open(txt_file, "r") as fp:
                lines = [ln for ln in fp.read().splitlines() if ln.strip()]

            img_h, img_w = image_size(image_filename)
            boxes = []
            for line in lines:
                parts = line.split()
                label = int(parts[0])
                xywhn = tuple(map(float, parts[1:5]))
                box = self.bbox_xywhn2xyxy(*xywhn, (img_h, img_w))
                boxes.append(box)
                if self._box_ok(*box):
                    self.list_bbox.append((str(image_filename), box, label))

            if generate_backgrounds and rng.random() <= background_generating_prob:
                bg = self._place_background(rng, img_h, img_w, boxes, background_crop_sizes)
                if bg is not None:
                    self.list_bbox.append((str(image_filename), bg, self.class_to_idx["<GENERATED>_background"]))

    # -- scan / geometry helpers -------------------------------------------

    @staticmethod
    def _download(url, dest, retries: int = 3):
        """Dataset auto-download (reference dataset.py:316-321) with retry —
        the reference has none (SURVEY.md §5.3)."""
        import time

        import requests

        last_err = None
        for attempt in range(retries):
            try:
                r = requests.get(url, timeout=120)
                r.raise_for_status()
                z = zipfile.ZipFile(io.BytesIO(r.content))
                z.extractall(dest)
                return
            except Exception as e:  # pragma: no cover - network
                last_err = e
                time.sleep(2**attempt)
        raise RuntimeError(f"Failed to download {url} after {retries} attempts") from last_err

    def scan_img_files(self, img_dirs):
        """YOLO image scan: directories recursed, .txt lists expanded
        (ultralytics convention, reference dataset.py:436-479)."""
        files = []
        for p in img_dirs if isinstance(img_dirs, list) else [img_dirs]:
            p = Path(p)
            if p.is_dir():
                files += glob.glob(str(p / "**" / "*.*"), recursive=True)
            elif p.is_file():
                with open(p) as t:
                    parent = str(p.parent) + os.sep
                    for x in t.read().strip().splitlines():
                        files.append(x.replace("./", parent) if x.startswith("./") else x)
            else:
                raise FileNotFoundError(f"{p} does not exist")
        imgs = sorted(x for x in files if x.lower().endswith(IMG_EXTENSIONS))
        if not imgs:
            raise FileNotFoundError(f"No images found in {img_dirs}")
        return imgs

    @staticmethod
    def bbox_xywhn2xyxy(x_center, y_center, width, height, image_size):
        ih, iw = image_size
        x_min = int(np.clip(int((x_center - width / 2) * iw), 0, iw))
        y_min = int(np.clip(int((y_center - height / 2) * ih), 0, ih))
        x_max = int(np.clip(int((x_center + width / 2) * iw), 0, iw))
        y_max = int(np.clip(int((y_center + height / 2) * ih), 0, ih))
        return (x_min, y_min, x_max, y_max)

    @staticmethod
    def bbox_intersect(b1, b2):
        if b1[2] < b2[0] or b2[2] < b1[0]:
            return False
        if b1[3] < b2[1] or b2[3] < b1[1]:
            return False
        return True

    def _box_ok(self, x_min, y_min, x_max, y_max):
        return (x_max - x_min) >= self.min_box_size and (y_max - y_min) >= self.min_box_size

    def _place_background(self, rng, img_h, img_w, true_boxes, crop_sizes):
        """Try to place a background crop that misses every true box."""
        for _ in range(self.ATTEMPTS):
            size = rng.uniform(*crop_sizes)
            max_x = int(img_w * (1 - size))
            max_y = int(img_h * (1 - size))
            if max_x <= 0 or max_y <= 0:
                continue
            x1 = int(rng.integers(0, max_x))
            y1 = int(rng.integers(0, max_y))
            box = (x1, y1, x1 + int(img_w * size), y1 + int(img_h * size))
            if not self._box_ok(*box):
                continue
            if any(self.bbox_intersect(box, tb) for tb in true_boxes):
                continue
            return box
        return None

    # -- reader API ----------------------------------------------------------

    _DECODE_CACHE_SIZE = 32

    def __len__(self):
        return len(self.list_bbox)

    def read(self, idx, rng=None):
        path, (x_min, y_min, x_max, y_max), label = self.list_bbox[idx]
        img = self._cached_decode(path)
        return img[y_min:y_max, x_min:x_max], int(label)

    def _cached_decode(self, path):
        """Decode with a small LRU keyed by path: ``list_bbox`` is sorted by
        filename, so an image with K boxes is decoded ONCE per sequential
        epoch instead of K times (the reference re-decodes per crop,
        dataset.py:356-359 there). Thread-safe for the loader's worker pool;
        crops are slices of the cached array, so callers must not mutate."""
        import threading

        if not hasattr(self, "_decode_lock"):
            # lazy init keeps old pickled/constructed instances working; the
            # cache dict is assigned BEFORE the lock so a racing thread that
            # sees the lock also sees the cache (assignment order + the GIL)
            self._decode_cache = {}
            self._decode_lock = threading.Lock()
        with self._decode_lock:
            img = self._decode_cache.pop(path, None)
            if img is not None:
                self._decode_cache[path] = img  # re-insert: LRU order
                return img
        img = imread_rgb(path)
        with self._decode_lock:
            self._decode_cache[path] = img
            while len(self._decode_cache) > self._DECODE_CACHE_SIZE:
                self._decode_cache.pop(next(iter(self._decode_cache)))
        return img

    def get_labels(self):
        return np.asarray([label for _, _, label in self.list_bbox])

    def flat_index(self):
        """(paths, crops) for the native decode fast path: per-sample image
        path + xyxy crop box consumed by NativeDecodePool.decode_batch
        (nkbx/native/decode.cpp crops before resize, so only the box region
        is resized — the loader's C++ branch activates for YOLO datasets)."""
        paths = [p for p, _, _ in self.list_bbox]
        crops = np.asarray([box for _, box, _ in self.list_bbox], dtype=np.int32)
        return paths, crops

    def label_at(self, idx):
        return int(self.list_bbox[idx][2])


class GroupsDataset:
    """Legacy fine->coarse relabeling dataset (reference dataset.py:133-180):
    pickled file list + pickled {group: [fine labels]} dict; images under
    ``root/images_lr/<orig_label>/``."""

    def __init__(self, root, ann_file, dict_path, **kwargs):
        self.data_prefix = root
        with open(Path(root, ann_file), "rb") as f:
            data = pkl.load(f)
        with open(Path(dict_path), "rb") as f:
            group_dict = pkl.load(f)
        inv_group = {}
        for k, v in group_dict.items():
            for v_i in v:
                inv_group[v_i] = k
        self.class_to_idx = {k: i for i, k in enumerate(group_dict.keys())}
        self.idx_to_class = {i: k for k, i in self.class_to_idx.items()}
        self.classes = list(self.class_to_idx.keys())
        self.samples = []
        for sample in data:
            sample = Path(sample)
            orig_label = sample.parent.name
            img_path = Path(root, "images_lr", orig_label, sample.name)
            if not img_path.is_file():
                raise FileNotFoundError(f"File {img_path} does not exist.")
            self.samples.append((str(img_path), self.class_to_idx[inv_group[orig_label]]))

    def __len__(self):
        return len(self.samples)

    def read(self, idx, rng=None):
        path, label = self.samples[idx]
        return imread_rgb(path), label

    def get_labels(self):
        return np.asarray([lb for _, lb in self.samples])

    def flat_index(self):
        return [p for p, _ in self.samples], None

    def label_at(self, idx):
        return self.samples[idx][1]


class InferDataset:
    """Flat-folder scan for inference (reference dataset.py:105-130):
    ``read`` returns (image, path)."""

    def __init__(self, folder_path, **kwargs):
        self.folder = Path(folder_path)
        self.imgs = sorted(
            str(p) for p in self.folder.iterdir() if p.suffix.lower() in IMG_EXTENSIONS
        )

    def __len__(self):
        return len(self.imgs)

    def read(self, idx, rng=None):
        return imread_rgb(self.imgs[idx]), self.imgs[idx]

    def get_labels(self):  # pragma: no cover
        raise NotImplementedError("InferDataset has no labels")

    def flat_index(self):
        return self.imgs, None

    def label_at(self, idx):
        return self.imgs[idx]
