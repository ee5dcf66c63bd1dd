"""Keypoints structure (array-first).

Capability equivalent of the reference detectron2/structures/keypoints.py:
per-instance (K, 3) arrays of (x, y, visibility) with the heatmap
conversions used by the keypoint head (the device-side heatmap math lives in
models/heads/keypoint.py; this wraps it with the structure API).
"""

from __future__ import annotations

import numpy as np


class Keypoints:
    """(N, K, 3) keypoints: x, y, visibility (0 = not labeled, 1 = labeled
    not visible, 2 = visible)."""

    def __init__(self, keypoints: np.ndarray):
        k = np.asarray(keypoints, np.float32)
        assert k.ndim == 3 and k.shape[2] == 3, k.shape
        self.tensor = k

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "Keypoints":
        if isinstance(item, int):
            return Keypoints(self.tensor[item:item + 1])
        return Keypoints(self.tensor[item])

    def to_heatmap(self, boxes: np.ndarray, heatmap_size: int):
        """Per-roi integer heatmap targets + validity (reference
        keypoints_to_heatmap, structures/keypoints.py:144-196). Returns
        (targets (N, K) int spatial index, valid (N, K) bool)."""
        import jax.numpy as jnp

        from ..models.heads.keypoint import keypoints_to_heatmap_targets

        t, v = keypoints_to_heatmap_targets(
            jnp.asarray(self.tensor), jnp.asarray(boxes, np.float32),
            heatmap_size)
        return np.asarray(t), np.asarray(v)
