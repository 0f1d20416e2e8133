"""Test config: run JAX on CPU with a virtual 8-device mesh.

The standard JAX trick for distributed-without-hardware testing (SURVEY.md §4):
``xla_force_host_platform_device_count=8`` fakes 8 devices on one CPU so sharding
and collectives compile and execute exactly as on an 8-chip TPU slice.
Must be set before jax initializes — conftest imports run first.
"""

import os

# FORCE cpu: this environment presets JAX_PLATFORMS=axon (remote TPU tunnel)
# and a sitecustomize registers the axon backend at interpreter startup,
# overriding the env var via jax.config — so we must override jax.config too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# this box has ONE cpu core: persist compiled executables across test runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def image_folder_dataset(tmp_path_factory):
    """Tiny synthetic ImageFolder: 2 classes x 12 images, varied sizes."""
    import cv2

    root = tmp_path_factory.mktemp("imagefolder")
    r = np.random.default_rng(42)
    for split in ("train", "val"):
        for cls_idx, cls in enumerate(("cat", "dog")):
            d = root / split / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(12 if split == "train" else 6):
                h, w = int(r.integers(40, 90)), int(r.integers(40, 90))
                img = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
                # class-dependent mean shift so training can learn something
                img = np.clip(img.astype(np.int32) + (80 if cls_idx else -80), 0, 255).astype(np.uint8)
                cv2.imwrite(str(d / f"{i}.jpg"), img[:, :, ::-1])
    return root


@pytest.fixture(scope="session")
def csv_dataset(tmp_path_factory):
    """Tiny synthetic CSV-table dataset with single + multi-task columns and folds."""
    import cv2
    import pandas as pd

    root = tmp_path_factory.mktemp("csvdata")
    img_dir = root / "images"
    img_dir.mkdir()
    r = np.random.default_rng(7)
    rows = []
    colors = ["red", "green", "blue"]
    sizes = ["small", "big"]
    for i in range(36):
        color = colors[i % 3]
        size = sizes[i % 2]
        fold = "train" if i < 24 else "val"
        h, w = int(r.integers(32, 80)), int(r.integers(32, 80))
        img = r.integers(0, 255, (h, w, 3), dtype=np.uint8)
        shift = {"red": (60, -60, -60), "green": (-60, 60, -60), "blue": (-60, -60, 60)}[color]
        img = np.clip(img.astype(np.int32) + np.array(shift), 0, 255).astype(np.uint8)
        name = f"img_{i}.jpg"
        cv2.imwrite(str(img_dir / name), img[:, :, ::-1])
        rows.append({"path": name, "label": color, "color": color, "size": size, "fold": fold})
    ann = root / "annotations.csv"
    pd.DataFrame(rows).to_csv(ann, index=False)
    return {"annotations_file": str(ann), "image_base_dir": str(img_dir)}
