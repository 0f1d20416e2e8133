"""nkbx DataLoader: threaded decode + host geometry, double-buffered prefetch.

Replaces the reference's torch DataLoader worker processes (dataset.py:612-628).
Design differences, TPU-first:

- **threads, not processes**: cv2 decode/resize release the GIL, so a thread pool
  fills a preallocated uint8 batch buffer in place with zero IPC/pickling cost;
- **static shapes**: the pipeline's host stage must produce a fixed (H, W); the
  final partial batch is zero-padded and carries a validity mask so every jitted
  step sees one shape (no recompiles, and padded rows are masked out of loss and
  metrics);
- **prefetch**: a background thread assembles the next batch while the device
  computes (the H2D copy + on-device augmentation overlap the model step);
- **multi-host sharding**: each host reads a strided slice of one global
  per-epoch permutation (``process_index``/``process_count``), so no sample is
  read twice across a ``jax.distributed`` job.

Batches are dicts: ``image`` uint8 (B,H,W,3), ``label`` int64 (B,) or
``{target: (B,)}`` (or ``path`` list for inference), ``mask`` bool (B,).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from nkbx.data.sampler import ImbalancedDatasetSampler, SequentialSampler, ShuffleSampler
from nkbx.transforms.adapter import Transforms
from nkbx.transforms.spec import Compose


class DataLoader:
    def __init__(
        self,
        dataset,
        pipeline: Optional[Compose] = None,
        batch_size: int = 32,
        shuffle: bool = False,
        sampler=None,
        num_workers: int = 8,
        drop_last: bool = False,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
        image_size: Optional[tuple] = None,
    ):
        if isinstance(pipeline, Transforms):
            pipeline = pipeline.transforms
        self.dataset = dataset
        self.pipeline = pipeline
        self.batch_size = int(batch_size)
        self.drop_last = drop_last
        self.num_workers = max(1, int(num_workers))
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self._epoch = 0

        if sampler is not None:
            self.sampler = sampler
        elif shuffle:
            self.sampler = ShuffleSampler(len(dataset), seed=seed)
        else:
            self.sampler = SequentialSampler(len(dataset), seed=seed)

        if image_size is not None:
            self._out_hw = tuple(image_size)
        elif pipeline is not None:
            self._out_hw = pipeline.output_size()
            if self._out_hw is None:
                raise ValueError(
                    "Pipeline host stage does not produce a static (H, W); add "
                    "Resize/CenterCrop/LongestMaxSize+PadIfNeeded or pass image_size="
                )
        else:
            self._out_hw = None  # raw variable-size reads, batch_size must be 1

        self._pool = ThreadPoolExecutor(max_workers=self.num_workers, thread_name_prefix="nkbx-data")
        self._native = self._init_native()

    def _init_native(self):
        """Enable the C++ decode pool when the host stage is expressible natively:
        [LongestMaxSize(s) + PadIfNeeded(s,s,value=0)] or [Resize(h,w)], and the
        dataset exposes a flat (paths, crops) index."""
        from nkbx.transforms import spec as S

        if self.pipeline is None or not hasattr(self.dataset, "flat_index"):
            return None
        ht = self.pipeline.host_transforms
        mode = None
        if (
            len(ht) == 2
            and isinstance(ht[0], S.LongestMaxSize)
            and isinstance(ht[1], S.PadIfNeeded)
            and ht[1].min_height == ht[1].min_width == ht[0].max_size
            and (np.isscalar(ht[1].value) and ht[1].value == 0)
            and ht[0].interpolation == 1
        ):
            mode = 0
        elif len(ht) == 1 and isinstance(ht[0], S.Resize) and ht[0].interpolation == 1:
            mode = 1
        if mode is None:
            return None
        try:
            from nkbx.native import NativeDecodePool

            pool = NativeDecodePool(self.num_workers)
        except Exception:
            return None
        paths, crops = self.dataset.flat_index()
        return {"pool": pool, "mode": mode, "paths": paths, "crops": crops}

    # -- epoch geometry --------------------------------------------------------

    def _local_indices(self, epoch: int) -> np.ndarray:
        idx = self.sampler.indices(epoch)
        if self.process_count > 1:
            # every host must run the SAME number of jitted (collective) steps:
            # pad the global permutation to a multiple of process_count with -1
            # sentinels (masked out in _assemble — NOT duplicate samples, which
            # would be double-counted in loss/metrics)
            rem = len(idx) % self.process_count
            if rem:
                pad = np.full(self.process_count - rem, -1, dtype=idx.dtype)
                idx = np.concatenate([idx, pad])
        return idx[self.process_index::self.process_count]

    def _n_local(self) -> int:
        n = len(self.sampler)
        if self.process_count > 1:
            n = -(-n // self.process_count)  # ceil: sentinel-padded split
        return n

    def __len__(self):
        # arithmetic, NOT a sampler draw (weighted sampling over millions of
        # rows would re-run the multinomial on every len() call)
        n = self._n_local()
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    # -- batch assembly --------------------------------------------------------

    def _assemble(self, indices: np.ndarray, epoch: int):
        bs = self.batch_size
        # -1 indices are multi-host sentinel padding (masked, not decoded);
        # they only ever appear as a suffix of the final chunk
        indices = np.asarray(indices)
        indices = indices[indices >= 0]
        n_valid = len(indices)
        h, w = self._out_hw if self._out_hw else (None, None)
        images = np.zeros((bs, h, w, 3), dtype=np.uint8) if h else [None] * bs
        labels_slot = [None] * bs

        def work(slot, ds_idx):
            # per-sample rng for host-random transforms (RandomCrop): stable in
            # (seed, epoch, sample) so runs are reproducible
            rng = np.random.default_rng((self.sampler.seed, epoch, int(ds_idx)))
            img, label = self.dataset.read(int(ds_idx), rng=rng)
            if self.pipeline is not None:
                img = self.pipeline.host_apply(img, rng=rng)
            images[slot] = img
            labels_slot[slot] = label

        if self._native is not None:
            nat = self._native
            batch_paths = [nat["paths"][int(i)] for i in indices]
            crops = nat["crops"][indices] if nat["crops"] is not None else None
            _, status = nat["pool"].decode_batch(
                batch_paths, h, w, crops=crops, mode=nat["mode"], out=images[:n_valid]
            )
            for slot, ds_idx in enumerate(indices):
                labels_slot[slot] = self.dataset.label_at(int(ds_idx))
                if status[slot] != 0:  # native failure -> python fallback
                    work(slot, ds_idx)
        else:
            list(self._pool.map(lambda args: work(*args), list(enumerate(indices))))

        mask = np.zeros(bs, dtype=bool)
        mask[:n_valid] = True
        if n_valid == 0:
            # all-sentinel chunk (multi-host tail): emit a fully masked batch so
            # every host still dispatches the same number of collective steps
            if hasattr(self.dataset, "target_names"):  # multi-task label struct
                labels_slot[0] = {t: 0 for t in self.dataset.target_names}
            else:
                labels_slot[0] = 0
        first = labels_slot[0]
        if isinstance(first, dict):
            targets = sorted(first.keys())
            labels = {
                t: np.asarray(
                    [labels_slot[i][t] if i < n_valid else 0 for i in range(bs)], dtype=np.int64
                )
                for t in targets
            }
        elif isinstance(first, str):  # inference: label is the file path
            labels = [labels_slot[i] if i < n_valid else "" for i in range(bs)]
        else:
            labels = np.asarray(
                [labels_slot[i] if i < n_valid else 0 for i in range(bs)], dtype=np.int64
            )
        if not isinstance(images, np.ndarray):
            images = np.stack([im for im in images if im is not None])
        key = "path" if isinstance(first, str) else "label"
        return {"image": images, key: labels, "mask": mask}

    def epoch(self, epoch: int, start_batch: int = 0):
        """Iterate one epoch's batches with background prefetch.

        ``start_batch > 0`` resumes the epoch mid-way (preemption cursor,
        nkbx/train/preempt.py): the first ``start_batch`` chunks of the
        epoch's deterministic permutation are skipped without being decoded —
        every sampler is a pure function of (seed, epoch), so the remaining
        batch sequence is bit-identical to an uninterrupted run's suffix.
        """
        indices = self._local_indices(epoch)
        bs = self.batch_size
        n_full = len(indices) // bs
        chunks = [indices[i * bs:(i + 1) * bs] for i in range(n_full)]
        rem = indices[n_full * bs:]
        if len(rem) and not self.drop_last:
            chunks.append(rem)
        if start_batch:
            chunks = chunks[start_batch:]
        if not chunks:
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for ch in chunks:
                    if stop.is_set():
                        return
                    q.put(self._assemble(ch, epoch))
            except BaseException as e:  # surfaced by consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def __iter__(self):
        e = self._epoch
        self._epoch += 1
        return self.epoch(e)


def get_dataset(data: dict, pipeline) -> DataLoader:
    """Dataset-type registry + loader construction (reference dataset.py:541-629).

    Same config keys: ``type`` (GroupsDataset / AnnotatedMultitaskDataset /
    AnnotatedSingletaskDataset / AnnotatedYOLODataset / default ImageFolder),
    ``batch_size``, ``shuffle``, ``num_workers``, ``drop_last``,
    ``weighted_sampling``.
    """
    from nkbx.data import datasets as D

    kind = data.get("type", "ImageFolder")
    ctor = {
        "GroupsDataset": D.GroupsDataset,
        "AnnotatedMultitaskDataset": D.AnnotatedMultitaskDataset,
        "AnnotatedSingletaskDataset": D.AnnotatedSingletaskDataset,
        "AnnotatedYOLODataset": D.AnnotatedYOLODataset,
    }.get(kind, D.ImageFolderDataset)
    dataset = ctor(**{k: v for k, v in data.items() if k != "type"})

    sampler = None
    if data.get("weighted_sampling", False):
        sampler = ImbalancedDatasetSampler(dataset, seed=data.get("seed", 0))

    try:
        import jax

        pi, pc = jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover
        pi, pc = 0, 1

    return DataLoader(
        dataset,
        pipeline=pipeline,
        batch_size=data.get("batch_size", 32),
        shuffle=data.get("shuffle", False),
        sampler=sampler,
        num_workers=data.get("num_workers", 8),
        drop_last=data.get("drop_last", False),
        seed=data.get("seed", 0),
        process_index=pi,
        process_count=pc,
    )


def get_inference_dataset(data: dict, pipeline) -> DataLoader:
    """Folder-scan inference loader (reference dataset.py:632-644)."""
    from nkbx.data.datasets import InferDataset

    dataset = InferDataset(folder_path=data["folder_path"])
    return DataLoader(
        dataset,
        pipeline=pipeline,
        batch_size=data.get("batch_size", 32),
        num_workers=data.get("num_workers", 8),
    )
