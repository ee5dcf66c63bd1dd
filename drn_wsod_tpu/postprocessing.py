"""Detection postprocessing.

Equivalent of the reference ``detector_postprocess``
(projects/WSL/wsl/modeling/postprocessing.py:10-80): rescale detections from
the resized/padded frame back to the original image resolution and clip.
Operates on fixed-shape (B, D, 4) arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


def rescale_boxes(boxes: jnp.ndarray, image_hw: jnp.ndarray,
                  orig_hw: jnp.ndarray) -> jnp.ndarray:
    """boxes: (..., D, 4) XYXY in the resized frame; image_hw/orig_hw:
    (..., 2) int (h, w). Returns boxes in original-image coordinates,
    clipped."""
    scale_x = (orig_hw[..., 1] / jnp.maximum(image_hw[..., 1], 1))[..., None]
    scale_y = (orig_hw[..., 0] / jnp.maximum(image_hw[..., 0], 1))[..., None]
    x1 = boxes[..., 0] * scale_x
    y1 = boxes[..., 1] * scale_y
    x2 = boxes[..., 2] * scale_x
    y2 = boxes[..., 3] * scale_y
    w = orig_hw[..., 1][..., None]
    h = orig_hw[..., 0][..., None]
    out = jnp.stack([jnp.clip(x1, 0, w), jnp.clip(y1, 0, h),
                     jnp.clip(x2, 0, w), jnp.clip(y2, 0, h)], axis=-1)
    return out
