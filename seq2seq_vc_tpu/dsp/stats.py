"""Feature statistics and normalization.

``RunningStats`` reproduces sklearn ``StandardScaler.partial_fit`` semantics
(population variance, ddof=0) used by reference
``bin/compute_statistics.py:129-151`` via a Chan/Welford parallel merge, so
stats can be accumulated per shard and merged — which is how per-host
preprocessing shards combine on TPU instead of a single sklearn pass.
"""

from __future__ import annotations

import numpy as np


class RunningStats:
    """Accumulate per-dimension mean/scale over arrays of shape (T, D)."""

    def __init__(self, dim: int | None = None):
        self.count = 0.0
        self.mean = None if dim is None else np.zeros(dim, dtype=np.float64)
        self.m2 = None if dim is None else np.zeros(dim, dtype=np.float64)

    def update(self, x: np.ndarray) -> "RunningStats":
        x = np.asarray(x, dtype=np.float64)
        if x.ndim == 1:
            x = x[:, None]
        n_b = x.shape[0]
        if n_b == 0:
            return self
        mean_b = x.mean(axis=0)
        m2_b = ((x - mean_b) ** 2).sum(axis=0)
        if self.mean is None:
            self.mean = np.zeros(x.shape[1])
            self.m2 = np.zeros(x.shape[1])
        delta = mean_b - self.mean
        tot = self.count + n_b
        self.mean = self.mean + delta * (n_b / tot)
        self.m2 = self.m2 + m2_b + delta ** 2 * (self.count * n_b / tot)
        self.count = tot
        return self

    def merge(self, other: "RunningStats") -> "RunningStats":
        """Merge another accumulator (for sharded preprocessing)."""
        if other.mean is None or other.count == 0:
            return self
        if self.mean is None or self.count == 0:
            self.count, self.mean, self.m2 = other.count, other.mean.copy(), other.m2.copy()
            return self
        delta = other.mean - self.mean
        tot = self.count + other.count
        self.mean = self.mean + delta * (other.count / tot)
        self.m2 = self.m2 + other.m2 + delta ** 2 * (self.count * other.count / tot)
        self.count = tot
        return self

    @property
    def scale(self) -> np.ndarray:
        """Population standard deviation (sklearn ``scale_``)."""
        var = self.m2 / self.count
        # sklearn maps zero variance to scale 1.0 to avoid div-by-zero
        std = np.sqrt(var)
        std[std == 0.0] = 1.0
        return std


def normalize(x, mean, scale):
    """z-normalize features (reference ``bin/normalize.py:186-221``)."""
    return (np.asarray(x) - np.asarray(mean)) / np.asarray(scale)


def denormalize(x, mean, scale):
    """Invert z-normalization (used before vocoding)."""
    return np.asarray(x) * np.asarray(scale) + np.asarray(mean)
