"""Data layer: readers, sampler distribution, loader batching/padding/sharding."""

import numpy as np
import pytest

import nkbx.transforms as T
from nkbx.data import (
    AnnotatedMultitaskDataset,
    AnnotatedSingletaskDataset,
    DataLoader,
    ImageFolderDataset,
    ImbalancedDatasetSampler,
    get_dataset,
)

PIPE = T.Compose([T.LongestMaxSize(32), T.PadIfNeeded(32, 32), T.Normalize()])


class TestReaders:
    def test_image_folder(self, image_folder_dataset):
        ds = ImageFolderDataset(root=image_folder_dataset / "train")
        assert ds.classes == ["cat", "dog"]
        assert len(ds) == 24
        img, label = ds.read(0)
        assert img.dtype == np.uint8 and img.ndim == 3
        assert label in (0, 1)

    def test_csv_singletask(self, csv_dataset):
        ds = AnnotatedSingletaskDataset(
            annotations_file=csv_dataset["annotations_file"],
            image_base_dir=csv_dataset["image_base_dir"],
            target_column="label", fold="train",
        )
        assert ds.classes == ["blue", "green", "red"]  # np.sort(unique) order
        assert len(ds) == 24
        img, label = ds.read(3)
        assert 0 <= label < 3

    def test_csv_singletask_val_fold(self, csv_dataset):
        ds = AnnotatedSingletaskDataset(
            annotations_file=csv_dataset["annotations_file"],
            image_base_dir=csv_dataset["image_base_dir"],
            target_column="label", fold="val",
        )
        assert len(ds) == 12

    def test_csv_explicit_classes(self, csv_dataset):
        ds = AnnotatedSingletaskDataset(
            annotations_file=csv_dataset["annotations_file"],
            image_base_dir=csv_dataset["image_base_dir"],
            target_column="label", fold="train",
            classes=["red", "green", "blue"],  # custom order preserved
        )
        assert ds.classes == ["red", "green", "blue"]
        assert ds.class_to_idx["red"] == 0

    def test_csv_multitask(self, csv_dataset):
        ds = AnnotatedMultitaskDataset(
            annotations_file=csv_dataset["annotations_file"],
            image_base_dir=csv_dataset["image_base_dir"],
            target_names=["size", "color"], fold="train",
        )
        assert ds.target_names == ["color", "size"]  # sorted
        img, labels = ds.read(0)
        assert set(labels) == {"color", "size"}


class TestSampler:
    def test_inverse_frequency_weights(self):
        labels = np.array([0] * 90 + [1] * 10)
        s = ImbalancedDatasetSampler(labels=labels, seed=0)
        idx = np.concatenate([s.indices(e) for e in range(30)])
        frac_minority = np.mean(labels[idx] == 1)
        assert 0.42 < frac_minority < 0.58  # balanced in expectation

    def test_deterministic_per_epoch(self):
        labels = np.array([0, 0, 0, 1, 1, 2])
        s = ImbalancedDatasetSampler(labels=labels, seed=3)
        assert np.array_equal(s.indices(5), s.indices(5))
        assert not np.array_equal(s.indices(5), s.indices(6))

    def test_multitask_joint_labels(self):
        labels = np.array([[0, 0]] * 50 + [[1, 1]] * 5)
        s = ImbalancedDatasetSampler(labels=labels, seed=0)
        idx = np.concatenate([s.indices(e) for e in range(20)])
        assert 0.35 < np.mean(idx >= 50) < 0.65


class TestLoader:
    def test_batches_and_final_padding(self, image_folder_dataset):
        ds = ImageFolderDataset(root=image_folder_dataset / "train")  # 24 samples
        loader = DataLoader(ds, pipeline=PIPE, batch_size=10, num_workers=2)
        batches = list(loader.epoch(0))
        assert len(batches) == 3
        assert all(b["image"].shape == (10, 32, 32, 3) for b in batches)
        assert batches[-1]["mask"].sum() == 4  # 24 = 10+10+4, padded to 10
        assert batches[0]["mask"].all()

    def test_drop_last(self, image_folder_dataset):
        ds = ImageFolderDataset(root=image_folder_dataset / "train")
        loader = DataLoader(ds, pipeline=PIPE, batch_size=10, drop_last=True, num_workers=2)
        batches = list(loader.epoch(0))
        assert len(batches) == 2 and all(b["mask"].all() for b in batches)

    def test_shuffle_reshuffles_each_epoch(self, image_folder_dataset):
        ds = ImageFolderDataset(root=image_folder_dataset / "train")
        loader = DataLoader(ds, pipeline=PIPE, batch_size=24, shuffle=True, num_workers=2)
        l0 = next(iter(loader.epoch(0)))["label"]
        l1 = next(iter(loader.epoch(1)))["label"]
        assert not np.array_equal(l0, l1)
        assert np.array_equal(l0, next(iter(loader.epoch(0)))["label"])  # reproducible

    def test_start_batch_resumes_mid_epoch(self, image_folder_dataset):
        """epoch(e, start_batch=k) yields exactly the suffix of the full
        iteration — the preemption-cursor contract (nkbx/train/preempt.py)."""
        ds = ImageFolderDataset(root=image_folder_dataset / "train")  # 24 samples
        loader = DataLoader(ds, pipeline=PIPE, batch_size=7, shuffle=True,
                            num_workers=2)
        full = list(loader.epoch(3))
        assert len(full) == 4  # 24 = 7+7+7+3(padded)
        for k in (1, 3, 4):
            resumed = list(loader.epoch(3, start_batch=k))
            assert len(resumed) == len(full) - k
            for a, b in zip(resumed, full[k:]):
                np.testing.assert_array_equal(a["image"], b["image"])
                np.testing.assert_array_equal(a["label"], b["label"])
                np.testing.assert_array_equal(a["mask"], b["mask"])

    def test_multihost_sharding_disjoint(self, image_folder_dataset):
        ds = ImageFolderDataset(root=image_folder_dataset / "train")
        seen = []
        for pi in range(2):
            loader = DataLoader(ds, pipeline=PIPE, batch_size=12, num_workers=2,
                                process_index=pi, process_count=2)
            for b in loader.epoch(0):
                seen.append((pi, tuple(b["label"][b["mask"]])))
        n0 = sum(len(lbls) for pi, lbls in seen if pi == 0)
        n1 = sum(len(lbls) for pi, lbls in seen if pi == 1)
        assert n0 + n1 == 24 and n0 == n1

    def test_get_dataset_factory(self, csv_dataset):
        loader = get_dataset(
            {
                "type": "AnnotatedSingletaskDataset",
                "annotations_file": csv_dataset["annotations_file"],
                "image_base_dir": csv_dataset["image_base_dir"],
                "target_column": "label",
                "fold": "train",
                "weighted_sampling": True,
                "shuffle": True,
                "batch_size": 8,
                "num_workers": 2,
                "drop_last": True,
            },
            PIPE,
        )
        batches = list(loader.epoch(0))
        assert len(batches) == 3
        b = batches[0]
        assert b["image"].dtype == np.uint8 and b["label"].dtype == np.int64

    def test_multitask_collate(self, csv_dataset):
        loader = get_dataset(
            {
                "type": "AnnotatedMultitaskDataset",
                "annotations_file": csv_dataset["annotations_file"],
                "image_base_dir": csv_dataset["image_base_dir"],
                "target_names": ["color", "size"],
                "fold": "train",
                "shuffle": False,
                "batch_size": 6,
                "num_workers": 2,
            },
            PIPE,
        )
        b = next(iter(loader.epoch(0)))
        assert set(b["label"]) == {"color", "size"}
        assert b["label"]["color"].shape == (6,)


class TestYOLO:
    @pytest.fixture(scope="class")
    def yolo_dataset(self, tmp_path_factory):
        import cv2
        import yaml

        root = tmp_path_factory.mktemp("yolo")
        r = np.random.default_rng(5)
        for split in ("train", "val"):
            (root / split / "images").mkdir(parents=True)
            (root / split / "labels").mkdir(parents=True)
            for i in range(6):
                img = r.integers(0, 255, (80, 100, 3), dtype=np.uint8)
                cv2.imwrite(str(root / split / "images" / f"{i}.jpg"), img)
                # one big box per image, class i%2, centered
                with open(root / split / "labels" / f"{i}.txt", "w") as f:
                    f.write(f"{i % 2} 0.5 0.5 0.4 0.4\n")
        cfg = {"path": str(root), "train": "train/images", "val": "val/images",
               "names": ["obj_a", "obj_b"]}
        ypath = root / "data.yaml"
        with open(ypath, "w") as f:
            yaml.safe_dump(cfg, f)
        return ypath

    def test_crops_and_classes(self, yolo_dataset):
        from nkbx.data import AnnotatedYOLODataset

        ds = AnnotatedYOLODataset(annotations_file=str(yolo_dataset), fold="train")
        assert ds.classes == ["obj_a", "obj_b"]
        assert len(ds) == 6
        img, label = ds.read(0)
        assert img.shape == (32, 40, 3)  # 0.4*80 x 0.4*100 crop

    def test_background_generation(self, yolo_dataset):
        from nkbx.data import AnnotatedYOLODataset

        ds = AnnotatedYOLODataset(
            annotations_file=str(yolo_dataset), fold="train",
            generate_backgrounds=True, background_generating_prob=1.0,
            background_crop_sizes=(0.1, 0.2), seed=1,
        )
        assert ds.classes[-1] == "<GENERATED>_background"
        bg_label = ds.class_to_idx["<GENERATED>_background"]
        bg = [(p, b) for p, b, lb in ds.list_bbox if lb == bg_label]
        assert len(bg) >= 1
        # background crops must not intersect the true box
        for path, box in bg:
            true_box = ds.bbox_xywhn2xyxy(0.5, 0.5, 0.4, 0.4, (80, 100))
            assert not ds.bbox_intersect(box, true_box)

    def test_min_box_size_filter(self, yolo_dataset):
        from nkbx.data import AnnotatedYOLODataset

        ds = AnnotatedYOLODataset(annotations_file=str(yolo_dataset), fold="train", min_box_size=50)
        assert len(ds) == 0  # 32x40 crops all filtered


class TestMultiHostSentinels:
    def test_equal_batch_counts_and_no_duplicates(self, image_folder_dataset):
        """Hosts get equal step counts via -1 sentinels, never duplicate samples."""
        ds = ImageFolderDataset(root=image_folder_dataset / "train")  # 24 samples
        all_valid = []
        counts = []
        for pi in range(5):  # 24 % 5 != 0 -> sentinel padding kicks in
            loader = DataLoader(ds, pipeline=PIPE, batch_size=4, num_workers=1,
                                process_index=pi, process_count=5)
            batches = list(loader.epoch(0))
            counts.append(len(batches))
            assert len(batches) == len(loader)  # arithmetic __len__ agrees
            for b in batches:
                all_valid.extend(np.asarray(b["label"])[b["mask"]].tolist())
        assert len(set(counts)) == 1  # lockstep
        assert len(all_valid) == 24  # every sample exactly once, no duplicates

    def test_all_sentinel_chunk_emits_masked_batch(self, image_folder_dataset):
        ds = ImageFolderDataset(root=image_folder_dataset / "train")
        loader = DataLoader(ds, pipeline=PIPE, batch_size=5, num_workers=1,
                            process_index=4, process_count=5)
        batches = list(loader.epoch(0))
        total_valid = sum(int(b["mask"].sum()) for b in batches)
        assert total_valid == 4  # 24 samples over 5 hosts: last host gets 4
        assert all(b["image"].shape == (5, 32, 32, 3) for b in batches)


class TestCheckpointCrashSafety:
    def test_previous_checkpoint_survives_tmp_write(self, tmp_path):
        import jax.numpy as jnp

        from nkbx.train import TrainState, get_optimizer, restore_train_state, save_checkpoint

        params = {"backbone": {"k": jnp.ones((4, 4))}, "head": {"k": jnp.zeros(4)}}
        bundle = get_optimizer(params, {"type": "sgd", "lr": 0.1})
        state = TrainState.create(params, {}, bundle.tx)
        path = tmp_path / "last"
        save_checkpoint(path, state, epoch=0, best_val_acc=0.5)
        assert path.is_dir() and not (tmp_path / "last.tmp").exists()
        # overwrite with a new epoch: old dir must be swapped, not pre-deleted
        save_checkpoint(path, state.replace(step=state.step + 1), epoch=1, best_val_acc=0.7)
        restored, epoch, best = restore_train_state(path, state)
        assert epoch == 1 and best == 0.7 and int(restored.step) == 1
        assert not (tmp_path / "last.tmp").exists()

    def test_nadam_state_checkpoint_roundtrip(self, tmp_path):
        """The torch-exact NAdam state (count/mu_product/mu/nu NamedTuple)
        must orbax-roundtrip exactly — its layout is new in r5."""
        import jax.numpy as jnp
        import numpy as np
        import optax

        from nkbx.train import TrainState, get_optimizer, restore_train_state, save_checkpoint
        from nkbx.train.optim import scale_updates

        params = {"backbone": {"k": jnp.ones((4, 4))}, "head": {"k": jnp.zeros(4)}}
        bundle = get_optimizer(params, {"type": "nadam", "lr": 1e-2,
                                        "weight_decay": 0.01})
        state = TrainState.create(params, {}, bundle.tx)
        for _ in range(2):
            g = {"backbone": {"k": jnp.full((4, 4), 0.3)},
                 "head": {"k": jnp.full(4, -0.2)}}
            upd, opt_state = bundle.tx.update(g, state.opt_state, state.params)
            upd = scale_updates(upd, state.params, bundle.lrs,
                                jnp.asarray(1.0), jnp.asarray(1.0))
            state = state.replace(params=optax.apply_updates(state.params, upd),
                                  opt_state=opt_state, step=state.step + 1)
        save_checkpoint(tmp_path / "ck", state, 1, 0.5)
        template = TrainState.create(params, {}, bundle.tx)
        restored, ep, best = restore_train_state(tmp_path / "ck", template)
        a = state.opt_state.inner_states["backbone"].inner_state[0]
        b = restored.opt_state.inner_states["backbone"].inner_state[0]
        assert int(b.count) == 2
        np.testing.assert_array_equal(np.asarray(a.mu_product),
                                      np.asarray(b.mu_product))
        np.testing.assert_array_equal(np.asarray(a.mu["backbone"]["k"]),
                                      np.asarray(b.mu["backbone"]["k"]))
        np.testing.assert_array_equal(np.asarray(a.nu["backbone"]["k"]),
                                      np.asarray(b.nu["backbone"]["k"]))

    def test_incompatible_opt_state_falls_back_to_weights(self, tmp_path):
        """A checkpoint whose optimizer-state LAYOUT mismatches the current
        optimizer (e.g. pre-r5 nadam vs the torch-exact NAdam state) must
        restore weights/step/meta with a loud warning and fresh moments —
        not crash the resume."""
        import warnings

        import jax
        import jax.numpy as jnp
        import numpy as np

        from nkbx.train import TrainState, get_optimizer, restore_train_state, save_checkpoint

        params = {"backbone": {"k": jnp.full((4, 4), 3.0)}, "head": {"k": jnp.ones(4)}}
        adam = get_optimizer(params, {"type": "adam", "lr": 0.1})
        state = TrainState.create(params, {}, adam.tx)
        state = state.replace(step=state.step + 7)
        path = tmp_path / "last"
        save_checkpoint(path, state, epoch=3, best_val_acc=0.6)

        nadam = get_optimizer(params, {"type": "nadam", "lr": 0.1})
        template = TrainState.create(params, {}, nadam.tx)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            restored, epoch, best = restore_train_state(path, template)
        assert any("optimizer state incompatible" in str(x.message) for x in w)
        assert epoch == 3 and best == 0.6 and int(restored.step) == 7
        np.testing.assert_array_equal(
            np.asarray(restored.params["backbone"]["k"]), np.full((4, 4), 3.0))
        # moments are the template's fresh init (zeros)
        inner = restored.opt_state.inner_states["backbone"].inner_state
        mu_leaves = jax.tree_util.tree_leaves(inner[0].mu if isinstance(inner, tuple) else inner.mu)
        assert all(float(np.abs(np.asarray(m)).max()) == 0.0 for m in mu_leaves)
