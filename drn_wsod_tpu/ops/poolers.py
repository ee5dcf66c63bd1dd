"""Multi-level RoI pooler.

Re-implementation of the reference ROIPooler
(detectron2/modeling/poolers.py:23-246): boxes are assigned to pyramid levels
by the FPN rule level = floor(canonical + log2(sqrt(area)/224)), pooled
against their level's map, and reassembled. Static-shape strategy: pool every
RoI against EVERY level and select by the per-RoI assignment mask — wasted
work is bounded (FPN channels are 8x smaller than DC5) and there is no
dynamic partitioning.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp

from .roi_align import roi_align, roi_pool
from ..structures.boxes import area


def assign_boxes_to_levels(boxes: jnp.ndarray, min_level: int,
                           max_level: int, canonical_size: int = 224,
                           canonical_level: int = 4) -> jnp.ndarray:
    """(P, 4) -> (P,) int32 level ids (reference poolers.py:23-57)."""
    sizes = jnp.sqrt(jnp.maximum(area(boxes), 1e-8))
    lvl = jnp.floor(canonical_level
                    + jnp.log2(sizes / canonical_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)


def multilevel_roi_pool(features: Dict[str, jnp.ndarray],
                        strides: Dict[str, int],
                        boxes: jnp.ndarray,
                        level_names: Sequence[str],
                        resolution: int = 7,
                        pooler_type: str = "ROIAlignV2",
                        sampling_ratio: int = 2) -> jnp.ndarray:
    """Pool (P, 4) boxes of ONE image from a feature pyramid.

    features: {"p2": (H2, W2, C), ...}. Returns (P, r, r, C).
    """
    import math

    levels = sorted(level_names, key=lambda n: strides[n])
    # static python math: jnp on python ints becomes a tracer under jit
    min_level = int(math.log2(strides[levels[0]]))
    max_level = int(math.log2(strides[levels[-1]]))
    assignment = assign_boxes_to_levels(boxes, min_level, max_level)

    out = None
    for li, name in enumerate(levels):
        scale = 1.0 / strides[name]
        if pooler_type == "ROIPool":
            pooled = roi_pool(features[name], boxes, scale,
                              resolution=resolution)
        else:
            pooled = roi_align(features[name], boxes, scale,
                               resolution=resolution,
                               sampling_ratio=sampling_ratio,
                               aligned=pooler_type == "ROIAlignV2")
        m = (assignment == (min_level + li))[:, None, None, None]
        out = jnp.where(m, pooled, 0.0) if out is None else \
            jnp.where(m, pooled, out)
    return out
