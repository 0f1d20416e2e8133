"""Loader thread-pool concurrency with a fake (controlled-latency) decoder
(VERDICT r4 Weak #5 / task #7).

The 1-core CI host can't measure real decode scaling, but the loader's
CONCURRENCY LOGIC is testable independent of cores: sleeping decoders release
the GIL exactly like cv2's decode does, so worker overlap, batch ordering,
slot placement, prefetch behavior, deadlock-freedom, and error propagation
at num_workers in {2, 8, 16} are all asserted here (reference
dataset.py:612-628 num_workers semantics).
"""

import threading
import time

import numpy as np
import pytest

from nkbx.data.loader import DataLoader


class FakeDecodeDataset:
    """Each read sleeps `latency` (GIL released — like cv2), then returns an
    image stamped with its index so slot placement is verifiable."""

    def __init__(self, n, latency=0.0, fail_at=None):
        self.n = n
        self.latency = latency
        self.fail_at = fail_at
        self.classes = ["x"]
        self.concurrent = 0
        self.max_concurrent = 0
        self._lock = threading.Lock()

    def __len__(self):
        return self.n

    def read(self, idx, rng=None):
        if self.fail_at is not None and idx == self.fail_at:
            raise OSError(f"decode failure injected at sample {idx}")
        with self._lock:
            self.concurrent += 1
            self.max_concurrent = max(self.max_concurrent, self.concurrent)
        try:
            if self.latency:
                time.sleep(self.latency)
            img = np.full((8, 8, 3), idx % 251, dtype=np.uint8)
            img[0, 0, 0] = idx // 251  # full index recoverable
            return img, int(idx)
        finally:
            with self._lock:
                self.concurrent -= 1


def _collect(loader, epoch=0):
    return list(loader.epoch(epoch))


class TestWorkerCounts:
    @pytest.mark.parametrize("workers", [2, 8, 16])
    def test_order_slots_and_mask(self, workers):
        """Batch order and per-slot sample placement are deterministic at any
        worker count; the final partial batch is padded + masked."""
        ds = FakeDecodeDataset(n=22, latency=0.002)
        loader = DataLoader(ds, batch_size=8, num_workers=workers,
                            image_size=(8, 8))
        batches = _collect(loader)
        assert len(batches) == 3
        seen = []
        for b in batches:
            assert b["image"].shape == (8, 8, 8, 3)
            valid = int(b["mask"].sum())
            # slot i holds the sample the label says it holds
            for i in range(valid):
                idx = int(b["image"][i, 0, 0, 1]) % 251 + 251 * int(b["image"][i, 0, 0, 0])
                assert idx == int(b["label"][i])
            seen.extend(b["label"][:valid].tolist())
        # sequential sampler: exact order preserved across workers
        assert seen == list(range(22))
        assert batches[-1]["mask"].sum() == 6  # 22 = 8 + 8 + 6
        assert not batches[-1]["mask"][6:].any()

    @pytest.mark.parametrize("workers", [2, 16])
    def test_workers_actually_overlap(self, workers):
        """With GIL-releasing decode latency, >1 decode runs at once."""
        ds = FakeDecodeDataset(n=32, latency=0.02)
        loader = DataLoader(ds, batch_size=16, num_workers=workers,
                            image_size=(8, 8))
        _collect(loader)
        assert ds.max_concurrent >= min(workers, 4)

    def test_parallel_speedup_over_single_worker(self):
        """8 sleeping workers assemble ~8x faster than 1 (generous 2x gate —
        wall-clock asserts stay loose on a loaded host)."""
        def timed(workers):
            ds = FakeDecodeDataset(n=48, latency=0.01)
            loader = DataLoader(ds, batch_size=16, num_workers=workers,
                                image_size=(8, 8))
            t0 = time.perf_counter()
            _collect(loader)
            return time.perf_counter() - t0

        t1, t8 = timed(1), timed(8)
        assert t8 < t1 / 2, (t1, t8)


class TestPrefetch:
    def test_producer_runs_ahead_of_consumer(self):
        """While the consumer holds batch k, the producer assembles ahead
        (bounded by prefetch): consuming slowly must not serialize decode."""
        ds = FakeDecodeDataset(n=32, latency=0.005)
        loader = DataLoader(ds, batch_size=8, num_workers=8, prefetch=2,
                            image_size=(8, 8))
        gaps = []
        last = time.perf_counter()
        for b in loader.epoch(0):
            now = time.perf_counter()
            gaps.append(now - last)
            time.sleep(0.02)  # slow consumer: producer fills the queue
            last = time.perf_counter()
        # after the first batch, batches are already waiting in the queue
        assert len(gaps) == 4
        assert max(gaps[1:]) < 0.015, gaps

    def test_early_break_does_not_deadlock(self):
        """Abandoning the iterator mid-epoch stops the producer thread (no
        thread leak, no hang on a full queue)."""
        ds = FakeDecodeDataset(n=64, latency=0.002)
        loader = DataLoader(ds, batch_size=8, num_workers=4, prefetch=1,
                            image_size=(8, 8))
        before = threading.active_count()
        for i, b in enumerate(loader.epoch(0)):
            if i == 1:
                break
        # generator finalization set the stop event; producer drains and exits
        deadline = time.time() + 5
        while threading.active_count() > before + 4 and time.time() < deadline:
            time.sleep(0.01)
        # a fresh epoch still works after the abandoned one
        assert len(_collect(loader, epoch=1)) == 8

    def test_back_to_back_epochs(self):
        ds = FakeDecodeDataset(n=24, latency=0.001)
        loader = DataLoader(ds, batch_size=8, num_workers=8, image_size=(8, 8))
        for e in range(3):
            assert len(_collect(loader, e)) == 3


class TestErrorPropagation:
    def test_decode_failure_surfaces_to_consumer(self):
        """A decoder exception inside a worker reaches the consuming thread
        as that exception (not a hang, not a silent skip)."""
        ds = FakeDecodeDataset(n=16, latency=0.0, fail_at=11)
        loader = DataLoader(ds, batch_size=8, num_workers=4, image_size=(8, 8))
        with pytest.raises(OSError, match="sample 11"):
            _collect(loader)

    def test_failure_does_not_poison_next_epoch(self):
        ds = FakeDecodeDataset(n=16, latency=0.0, fail_at=3)
        loader = DataLoader(ds, batch_size=8, num_workers=4, image_size=(8, 8))
        with pytest.raises(OSError):
            _collect(loader)
        ds.fail_at = None
        assert len(_collect(loader, epoch=1)) == 2
