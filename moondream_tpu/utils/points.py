"""Point-set utilities.

`remove_outlier_points` matches the reference's kNN-median filter
(/root/reference/moondream/torch/utils.py:4-41), used by multi-sample gaze
averaging; implemented with a vectorized pairwise-distance matrix.
"""

from __future__ import annotations

import numpy as np


def remove_outlier_points(points_tuples, k_nearest: int = 2, threshold: float = 2.0):
    points = np.asarray(points_tuples, dtype=np.float64)
    n = len(points)
    if n == 0:
        return []

    diff = points[:, None, :] - points[None, :, :]
    dist = np.sqrt(np.sum(diff * diff, axis=-1))

    k = min(k_nearest, n - 1)
    if k <= 0:
        return list(points_tuples)
    neighbor = np.partition(dist, k, axis=1)[:, :k]
    avg = neighbor.mean(axis=1)
    mask = avg <= threshold * np.median(avg)
    return [t for t, m in zip(points_tuples, mask) if m]
