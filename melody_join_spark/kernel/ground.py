"""Ground-distance matrices between histogram bin locations.

Reference semantics: ``DistanceUtil.getGroundDist`` supports L1/L2/L3 and an
arbitrary user cost matrix (/root/reference/src/com/iojin/melody/utils/
DistanceUtil.java:440-474).  Bins are ``B`` points in ``d``-dimensional
space, flattened row-major (README.md:21).

Everything here is pure numpy, no Spark.
"""

from __future__ import annotations

import numpy as np

__all__ = ["bins_matrix", "ground_distance_matrix", "GROUND_NORMS"]

GROUND_NORMS = ("l1", "l2", "l3")


def bins_matrix(bins: np.ndarray, dimension: int) -> np.ndarray:
    """Reshape a flattened bin-location array (len B*d) to a (B, d) matrix."""
    bins = np.asarray(bins, dtype=np.float64).ravel()
    if bins.size % dimension != 0:
        raise ValueError(f"bins length {bins.size} not divisible by dimension {dimension}")
    return bins.reshape(-1, dimension)


def ground_distance_matrix(
    bins: np.ndarray,
    dimension: int = 1,
    ground: str | np.ndarray = "l2",
) -> np.ndarray:
    """(B, B) pairwise ground-distance matrix between bin locations.

    ``ground`` is one of ``'l1' | 'l2' | 'l3'`` (Minkowski norms, matching the
    reference's DistanceType enum) or an explicit (B, B) cost matrix
    (``ARBITRARY`` in DistanceUtil.java:468-472).
    """
    if isinstance(ground, np.ndarray):
        cost = np.asarray(ground, dtype=np.float64)
        if cost.ndim != 2 or cost.shape[0] != cost.shape[1]:
            raise ValueError("explicit cost matrix must be square")
        return cost
    pts = bins_matrix(bins, dimension)
    diff = np.abs(pts[:, None, :] - pts[None, :, :])
    if ground == "l1":
        return diff.sum(axis=2)
    if ground == "l2":
        return np.sqrt((diff * diff).sum(axis=2))
    if ground == "l3":
        return ((diff**3).sum(axis=2)) ** (1.0 / 3.0)
    raise ValueError(f"unknown ground distance {ground!r}")
