"""VGG16 backbone (flax.linen, NHWC).

Re-implementation of the reference's WSOD VGG16
(projects/WSL/wsl/modeling/backbone/vgg.py:100-244): five "plain" conv stages
with trailing 2x2 max-pools; plain4's pool has stride 1 and plain5 is dilated
when CONV5_DILATION == 2 (final stride 8); plain5 has no pool. Convs carry
biases (ImageNet-style VGG), no norm layers.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# (out_channels, num_conv) per stage for VGG-16.
_VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class PlainBlock(nn.Module):
    """num_conv 3x3 convs (+ReLU), optional trailing 2x2 max-pool."""

    out_channels: int
    num_conv: int
    dilation: int = 1
    has_pool: bool = False
    pool_stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(1, self.num_conv + 1):
            x = nn.Conv(
                self.out_channels, (3, 3),
                padding=[(self.dilation,) * 2] * 2,
                kernel_dilation=(self.dilation, self.dilation),
                use_bias=True, dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
        if self.has_pool:
            x = nn.max_pool(x, (2, 2), strides=(self.pool_stride,) * 2,
                            padding="VALID")
        return x


class VGG16(nn.Module):
    conv5_dilation: int = 2
    out_features: Sequence[str] = ("plain5",)
    dtype: jnp.dtype = jnp.float32

    @property
    def feature_strides(self) -> Dict[str, int]:
        s4 = 8 if self.conv5_dilation == 2 else 16
        return {"plain1": 2, "plain2": 4, "plain3": 8, "plain4": s4, "plain5": s4}

    @property
    def feature_channels(self) -> Dict[str, int]:
        return {f"plain{i + 1}": c for i, (c, _) in enumerate(_VGG16_STAGES)}

    @nn.compact
    def __call__(self, x):
        outputs = {}
        for i, (channels, num_conv) in enumerate(_VGG16_STAGES, start=1):
            name = f"plain{i}"
            if i <= 3:
                block = PlainBlock(channels, num_conv, has_pool=True,
                                   pool_stride=2, dtype=self.dtype, name=name)
            elif i == 4:
                stride = 1 if self.conv5_dilation == 2 else 2
                block = PlainBlock(channels, num_conv, has_pool=True,
                                   pool_stride=stride, dtype=self.dtype, name=name)
            else:
                block = PlainBlock(channels, num_conv,
                                   dilation=self.conv5_dilation,
                                   has_pool=False, dtype=self.dtype, name=name)
            x = block(x)
            if name in self.out_features:
                outputs[name] = x
        return outputs


def build_vgg_backbone(cfg) -> Tuple[VGG16, Dict[str, int], Dict[str, int]]:
    assert cfg.MODEL.VGG.DEPTH == 16, "only VGG-16 is defined (as in reference)"
    model = VGG16(
        conv5_dilation=cfg.MODEL.VGG.CONV5_DILATION,
        out_features=tuple(cfg.MODEL.VGG.OUT_FEATURES),
        dtype=jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32,
    )
    return model, model.feature_strides, model.feature_channels
