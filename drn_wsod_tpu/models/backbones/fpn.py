"""Feature Pyramid Network backbone.

Re-implementation of the reference FPN
(detectron2/modeling/backbone/fpn.py:17-245): lateral 1x1 convs + top-down
nearest upsampling + 3x3 output convs per level, with a LastLevelMaxPool P6.
Wraps any bottom-up backbone that returns {"res2".."res5"}.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FPN(nn.Module):
    bottom_up: nn.Module
    in_features: Sequence[str] = ("res2", "res3", "res4", "res5")
    out_channels: int = 256
    top_block_levels: int = 1           # 1 => add p6 via stride-2 maxpool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Dict[str, jnp.ndarray]:
        bottom = self.bottom_up(x)
        feats = [bottom[f] for f in self.in_features]

        # lateral projections, top-down pathway (coarsest first)
        laterals = []
        for i, f in enumerate(feats):
            laterals.append(nn.Conv(self.out_channels, (1, 1),
                                    dtype=self.dtype,
                                    name=f"fpn_lateral_{self.in_features[i]}")(f))
        outputs = [None] * len(laterals)
        prev = laterals[-1]
        outputs[-1] = prev
        for i in range(len(laterals) - 2, -1, -1):
            th, tw = laterals[i].shape[1:3]
            up = jax.image.resize(prev, (prev.shape[0], th, tw,
                                         prev.shape[-1]), "nearest")
            prev = laterals[i] + up
            outputs[i] = prev

        result = {}
        for i, f in enumerate(self.in_features):
            p = f.replace("res", "p")
            result[p] = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                                name=f"fpn_output_{f}")(outputs[i])
        if self.top_block_levels >= 1:
            last = result[self.in_features[-1].replace("res", "p")]
            result["p6"] = nn.max_pool(last, (1, 1), strides=(2, 2),
                                       padding="VALID")
        return result


def build_resnet_fpn_backbone(cfg) -> Tuple[FPN, Dict[str, int],
                                            Dict[str, int]]:
    """FPN over WS-ResNet (reference build_resnet_fpn_backbone,
    detectron2/modeling/backbone/fpn.py:201-245)."""
    from .resnet_ws import ResNetWS

    r = cfg.MODEL.RESNETS
    dtype = jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32
    bottom_up = ResNetWS(
        depth=r.DEPTH,
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        res5_dilation=1,
        out_features=("res2", "res3", "res4", "res5"),
        pyramid=True,                  # FPN needs a 4/8/16/32 pyramid
        dtype=dtype,
    )
    out_channels = cfg.MODEL.FPN.OUT_CHANNELS
    model = FPN(bottom_up=bottom_up,
                in_features=tuple(cfg.MODEL.FPN.IN_FEATURES),
                out_channels=out_channels, dtype=dtype)
    bu_strides = bottom_up.feature_strides
    strides = {f.replace("res", "p"): bu_strides[f]
               for f in model.in_features}
    strides["p6"] = strides[model.in_features[-1].replace("res", "p")] * 2
    channels = {k: out_channels for k in strides}
    return model, strides, channels
