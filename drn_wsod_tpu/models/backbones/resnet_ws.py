"""WS-ResNet backbone (flax.linen, NHWC).

TPU-native re-implementation of the reference WS-ResNet
(projects/WSL/wsl/modeling/backbone/resnet_ws.py), the backbone family of
DRN-WSOD: residual blocks keep stride 1 and downsampling happens in trailing
2x2 max-pools instead ("plain downsampling" of the paper). Structure mirrored
from the reference builder (resnet_ws.py:616-703):

  * 3-conv stem: 3x3/s2 -> 3x3 -> 3x3, then 2x2/s2 max-pool  (stride 4)
  * res2: last block carries a 2x2/s2 trailing pool           (stride 8)
  * res3: trailing pool, stride 2 iff RES5_DILATION == 1
  * res4, res5: stride 1; dilation = RES5_DILATION on both
  * depths 18/34 use BasicBlock, 50/101/152 use BottleneckBlock

Total output stride: 8 when RES5_DILATION=2 (DC5), else 16. Layout is NHWC
(TPU-native; the reference is NCHW) and all norms are frozen batch-norm
applied as an explicit affine, matching detection-time behaviour
(detectron2/layers/batch_norm.py:14-125).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

NUM_BLOCKS_PER_STAGE = {
    18: [2, 2, 2, 2],
    34: [3, 4, 6, 3],
    50: [3, 4, 6, 3],
    101: [3, 4, 23, 3],
    152: [3, 8, 36, 3],
}


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine, stored torch-style
    (weight/bias/running_mean/running_var) for checkpoint-import parity."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("running_mean", nn.initializers.zeros, (self.features,))
        var = self.param("running_var", nn.initializers.ones, (self.features,))
        scale = weight / jnp.sqrt(var + self.eps)
        shift = bias - mean * scale
        # Fold into a single scale/shift so XLA fuses it into the conv
        # epilogue; keep the activation dtype (don't promote bf16 -> f32).
        return x * scale.astype(x.dtype) + shift.astype(x.dtype)


def _norm_layer(norm: str, features: int, name: str):
    """FrozenBN (detection default) or trainable BN (ImageNet pretraining;
    reference get_norm, detectron2/layers/batch_norm.py:127). Under a jit
    global-batch step, plain BN statistics are already cross-replica exact
    (GSPMD computes the global-batch mean), so "SyncBN"/"NaiveSyncBatchNorm"
    (batch_norm.py:153-230) needs no separate implementation."""
    if norm in ("BN", "SyncBN", "naiveSyncBN"):
        return nn.BatchNorm(momentum=0.9, epsilon=1e-5, name=name)
    return FrozenBatchNorm(features, name=name)


def _apply_norm(layer, x, train: bool):
    if isinstance(layer, nn.BatchNorm):
        return layer(x, use_running_average=not train)
    return layer(x)


def _conv(x, features, kernel, stride=1, dilation=1, name=None, dtype=jnp.float32):
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(dilation * (kernel // 2),) * 2] * 2,
        kernel_dilation=(dilation, dilation),
        use_bias=False,
        dtype=dtype,
        name=name,
    )(x)


def _maxpool2(x, stride):
    return nn.max_pool(x, window_shape=(2, 2), strides=(stride, stride),
                       padding="VALID")


class BasicBlock(nn.Module):
    """Two 3x3 convs; optional trailing max-pool (resnet_ws.py:32-112).
    ``stride`` > 1 is the PLAIN-ResNet downsampling path (stride on conv1 +
    shortcut, detectron2/modeling/backbone/resnet.py); the WS variant keeps
    stride 1 and pools instead."""

    out_channels: int
    dilation: int = 1
    stride: int = 1
    has_pool: bool = False
    pool_stride: int = 1
    norm: str = "FrozenBN"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        out = _conv(x, self.out_channels, 3, stride=self.stride,
                    dilation=self.dilation,
                    name="conv1", dtype=self.dtype)
        out = _apply_norm(_norm_layer(self.norm, self.out_channels,
                                      "conv1_norm"), out, train)
        out = nn.relu(out)
        out = _conv(out, self.out_channels, 3, dilation=self.dilation,
                    name="conv2", dtype=self.dtype)
        out = _apply_norm(_norm_layer(self.norm, self.out_channels,
                                      "conv2_norm"), out, train)

        if in_channels != self.out_channels or self.stride > 1:
            sc = _conv(x, self.out_channels, 1, stride=self.stride,
                       name="shortcut", dtype=self.dtype)
            sc = _apply_norm(_norm_layer(self.norm, self.out_channels,
                                         "shortcut_norm"), sc, train)
        else:
            sc = x

        out = nn.relu(out + sc)
        if self.has_pool:
            out = _maxpool2(out, self.pool_stride)
        return out


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3(dilated, grouped) -> 1x1 bottleneck, stride-free, optional
    trailing max-pool (resnet_ws.py:113-240)."""

    out_channels: int
    bottleneck_channels: int
    dilation: int = 1
    stride: int = 1
    stride_in_1x1: bool = True     # Caffe2-era placement (d2 default)
    num_groups: int = 1
    has_pool: bool = False
    pool_stride: int = 1
    norm: str = "FrozenBN"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        s1 = self.stride if self.stride_in_1x1 else 1
        s3 = 1 if self.stride_in_1x1 else self.stride
        out = _conv(x, self.bottleneck_channels, 1, stride=s1,
                    name="conv1", dtype=self.dtype)
        out = _apply_norm(_norm_layer(self.norm, self.bottleneck_channels,
                                      "conv1_norm"), out, train)
        out = nn.relu(out)

        out = nn.Conv(
            features=self.bottleneck_channels,
            kernel_size=(3, 3),
            strides=(s3, s3),
            padding=[(self.dilation,) * 2] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.num_groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = _apply_norm(_norm_layer(self.norm, self.bottleneck_channels,
                                      "conv2_norm"), out, train)
        out = nn.relu(out)

        out = _conv(out, self.out_channels, 1, name="conv3", dtype=self.dtype)
        out = _apply_norm(_norm_layer(self.norm, self.out_channels,
                                      "conv3_norm"), out, train)

        if in_channels != self.out_channels or self.stride > 1:
            sc = _conv(x, self.out_channels, 1, stride=self.stride,
                       name="shortcut", dtype=self.dtype)
            sc = _apply_norm(_norm_layer(self.norm, self.out_channels,
                                         "shortcut_norm"), sc, train)
        else:
            sc = x

        out = nn.relu(out + sc)
        if self.has_pool:
            out = _maxpool2(out, self.pool_stride)
        return out


class DeformBottleneckBlock(nn.Module):
    """Bottleneck whose 3x3 conv is deformable (v1) or modulated-deformable
    (v2), mirroring the reference DeformBottleneckBlock
    (projects/WSL/wsl/modeling/backbone/resnet_ws.py:240-354): offsets (and
    v2 modulation masks) come from a zero-initialized ``conv2_offset`` so
    the block starts out exactly equal to a plain bottleneck.

    The deformable conv itself is the TPU-native gather+einsum op
    (ops/deform_conv.py) replacing the reference CUDA kernels
    (detectron2/layers/csrc/deformable/).
    """

    out_channels: int
    bottleneck_channels: int
    dilation: int = 1
    num_groups: int = 1
    deform_modulated: bool = False
    has_pool: bool = False
    pool_stride: int = 1
    norm: str = "FrozenBN"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ...ops.deform_conv import deform_conv2d

        assert self.num_groups == 1, \
            "deformable bottleneck supports NUM_GROUPS=1 (no grouped einsum)"
        in_channels = x.shape[-1]
        bc = self.bottleneck_channels
        out = _conv(x, bc, 1, name="conv1", dtype=self.dtype)
        out = _apply_norm(_norm_layer(self.norm, bc, "conv1_norm"), out, train)
        out = nn.relu(out)

        K = 3
        d = self.dilation
        offset_ch = (27 if self.deform_modulated else 18)
        # zero init: the block starts as a plain bottleneck (reference
        # resnet_ws.py:327-328)
        off = nn.Conv(
            offset_ch, (K, K), padding=[(d, d)] * 2, kernel_dilation=(d, d),
            use_bias=True, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="conv2_offset",
        )(out).astype(jnp.float32)

        weight = self.param(
            "conv2_deform_weight",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (K, K, bc, bc)).astype(self.dtype)

        if self.deform_modulated:
            # reference layout: chunk(offset_mask, 3) = x-offsets, y-offsets,
            # mask; our op wants per-tap (dy, dx) interleaved
            off_x, off_y, mask = jnp.split(off, 3, axis=-1)
            offsets = jnp.stack([off_y, off_x], axis=-1).reshape(
                *off.shape[:-1], 2 * K * K)
            modulation = jax.nn.sigmoid(mask)
            out = jax.vmap(
                lambda o, f, m: deform_conv2d(
                    o, f, weight, m, kernel_size=K, dilation=d)
            )(out, offsets, modulation)
        else:
            out = jax.vmap(
                lambda o, f: deform_conv2d(
                    o, f, weight, kernel_size=K, dilation=d)
            )(out, off)
        out = _apply_norm(_norm_layer(self.norm, bc, "conv2_norm"), out, train)
        out = nn.relu(out)

        out = _conv(out, self.out_channels, 1, name="conv3", dtype=self.dtype)
        out = _apply_norm(_norm_layer(self.norm, self.out_channels,
                                      "conv3_norm"), out, train)

        if in_channels != self.out_channels:
            sc = _conv(x, self.out_channels, 1, name="shortcut", dtype=self.dtype)
            sc = _apply_norm(_norm_layer(self.norm, self.out_channels,
                                         "shortcut_norm"), sc, train)
        else:
            sc = x

        out = nn.relu(out + sc)
        if self.has_pool:
            out = _maxpool2(out, self.pool_stride)
        return out


class BasicStem(nn.Module):
    """3-conv stem + 2x2/s2 pool (resnet_ws.py:357-415). Output stride 4."""

    out_channels: int = 64
    norm: str = "FrozenBN"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, stride in enumerate((2, 1, 1), start=1):
            x = _conv(x, self.out_channels, 3, stride=stride,
                      name=f"conv{i}", dtype=self.dtype)
            x = _apply_norm(_norm_layer(self.norm, self.out_channels,
                                        f"conv{i}_norm"), x, train)
            x = nn.relu(x)
        return _maxpool2(x, 2)


class ResNetWS(nn.Module):
    """The WS-ResNet tower.

    Returns a dict of requested stage outputs ({"res5": (B, H/8, W/8, C)} for
    the DC5 WSOD configs).
    """

    depth: int = 50
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    res5_dilation: int = 2
    out_features: Sequence[str] = ("res5",)
    pyramid: bool = False
    norm: str = "FrozenBN"
    # deformable bottlenecks per stage (reference MODEL.RESNETS.DEFORM_*,
    # resnet_ws.py:240-354); bottleneck depths only
    deform_on_per_stage: Sequence[bool] = (False, False, False, False)
    deform_modulated: bool = False
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def stage_specs(depth: int, res5_dilation: int,
                    res2_out_channels: int, bottleneck_channels: int,
                    max_stage: int = 5, pyramid: bool = False) -> List[dict]:
        """Per-stage structural parameters, mirroring resnet_ws.py:671-678.

        ``pyramid=True`` is this framework's FPN variant: the WS design keeps
        all downsampling in trailing max-pools, so a strided pyramid
        (4/8/16/32) is built by pooling after res3/res4/res5 instead of
        res2/res3 only (the reference has no WS+FPN combination)."""
        num_blocks = NUM_BLOCKS_PER_STAGE[depth]
        specs = []
        out_channels = res2_out_channels
        bc = bottleneck_channels
        for idx, stage_idx in enumerate(range(2, max_stage + 1)):
            if pyramid:
                dilation = 1
                first_stride = 2
                has_pool = stage_idx >= 3
            else:
                dilation = res5_dilation if stage_idx in (4, 5) else 1
                first_stride = 2 if idx == 0 or (stage_idx == 3 and res5_dilation == 1) else 1
                has_pool = stage_idx in (2, 3)
            specs.append(dict(
                stage=f"res{stage_idx}",
                num_blocks=num_blocks[idx],
                dilation=dilation,
                pool_stride=first_stride,
                has_pool=has_pool,
                out_channels=out_channels,
                bottleneck_channels=bc,
            ))
            out_channels *= 2
            bc *= 2
        return specs

    @property
    def feature_strides(self) -> Dict[str, int]:
        stride = 4
        strides = {}
        for spec in self.stage_specs(self.depth, self.res5_dilation,
                                     self.res2_out_channels,
                                     self.num_groups * self.width_per_group,
                                     pyramid=self.pyramid):
            if spec["has_pool"]:
                stride *= spec["pool_stride"]
            strides[spec["stage"]] = stride
        return strides

    @property
    def feature_channels(self) -> Dict[str, int]:
        chans = {}
        for spec in self.stage_specs(self.depth, self.res5_dilation,
                                     self.res2_out_channels,
                                     self.num_groups * self.width_per_group,
                                     pyramid=self.pyramid):
            chans[spec["stage"]] = spec["out_channels"]
        return chans

    @nn.compact
    def __call__(self, x, train: bool = False):
        basic = self.depth in (18, 34)
        if basic:
            assert self.res2_out_channels == 64, "R18/R34 need RES2_OUT_CHANNELS=64"

        x = BasicStem(self.stem_out_channels, norm=self.norm,
                      dtype=self.dtype, name="stem")(x, train=train)

        outputs = {}
        max_stage = max(int(f[-1]) for f in self.out_features)
        specs = self.stage_specs(self.depth, self.res5_dilation,
                                 self.res2_out_channels,
                                 self.num_groups * self.width_per_group,
                                 max_stage=max_stage, pyramid=self.pyramid)
        for stage_idx, spec in enumerate(specs):
            deform = (not basic and stage_idx < len(self.deform_on_per_stage)
                      and self.deform_on_per_stage[stage_idx])
            for b in range(spec["num_blocks"]):
                last = b == spec["num_blocks"] - 1
                kwargs = dict(
                    out_channels=spec["out_channels"],
                    dilation=spec["dilation"],
                    has_pool=spec["has_pool"] and last,
                    pool_stride=spec["pool_stride"],
                    norm=self.norm,
                    dtype=self.dtype,
                    name=f"{spec['stage']}_{b}",
                )
                if basic:
                    x = BasicBlock(**kwargs)(x, train=train)
                elif deform:
                    x = DeformBottleneckBlock(
                        bottleneck_channels=spec["bottleneck_channels"],
                        num_groups=self.num_groups,
                        deform_modulated=self.deform_modulated,
                        **kwargs,
                    )(x, train=train)
                else:
                    x = BottleneckBlock(
                        bottleneck_channels=spec["bottleneck_channels"],
                        num_groups=self.num_groups,
                        **kwargs,
                    )(x, train=train)
            if spec["stage"] in self.out_features:
                outputs[spec["stage"]] = x
        return outputs


def build_ws_resnet_backbone(cfg) -> Tuple[ResNetWS, Dict[str, int], Dict[str, int]]:
    """Config-driven builder (parity with resnet_ws.py:616).

    Returns (module, feature_strides, feature_channels)."""
    r = cfg.MODEL.RESNETS
    model = ResNetWS(
        depth=r.DEPTH,
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        res5_dilation=r.RES5_DILATION,
        out_features=tuple(r.OUT_FEATURES),
        norm=r.NORM,
        deform_on_per_stage=tuple(r.DEFORM_ON_PER_STAGE),
        deform_modulated=r.DEFORM_MODULATED,
        dtype=jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32,
    )
    return model, model.feature_strides, model.feature_channels


class PlainStem(nn.Module):
    """Standard ResNet stem: 7x7/s2 conv + 3x3/s2 max-pool (reference
    detectron2/modeling/backbone/resnet.py BasicStem). Output stride 4."""

    out_channels: int = 64
    norm: str = "FrozenBN"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (7, 7), strides=(2, 2),
                    padding=[(3, 3)] * 2, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        x = _apply_norm(_norm_layer(self.norm, self.out_channels,
                                    "conv1_norm"), x, train)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2),
                           padding=[(1, 1)] * 2)


class ResNetPlain(nn.Module):
    """Standard strided ResNet (the reference wsddn_R_* configs use plain
    detectron2 ResNets, resnet.py:643; contrast with the WS variant above
    whose blocks are stride-free + trailing max-pools). DC5: res5 stride 1
    with dilation 2."""

    depth: int = 50
    num_groups: int = 1
    width_per_group: int = 64
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    res5_dilation: int = 2
    stride_in_1x1: bool = True
    out_features: Sequence[str] = ("res5",)
    norm: str = "FrozenBN"
    dtype: jnp.dtype = jnp.float32

    @property
    def feature_strides(self) -> Dict[str, int]:
        strides, s = {}, 4
        for i, stage in enumerate(("res2", "res3", "res4", "res5")):
            if i > 0 and not (stage == "res5" and self.res5_dilation == 2):
                s *= 2
            strides[stage] = s
        return strides

    @property
    def feature_channels(self) -> Dict[str, int]:
        basic = self.depth in (18, 34)
        out = self.res2_out_channels
        chans = {}
        for stage in ("res2", "res3", "res4", "res5"):
            chans[stage] = out
            out *= 2
        return chans

    @nn.compact
    def __call__(self, x, train: bool = False):
        basic = self.depth in (18, 34)
        if basic:
            assert self.res2_out_channels == 64, "R18/R34 need RES2_OUT_CHANNELS=64"
        num_blocks = NUM_BLOCKS_PER_STAGE[self.depth]
        bc = self.num_groups * self.width_per_group

        x = PlainStem(self.stem_out_channels, norm=self.norm,
                      dtype=self.dtype, name="stem")(x, train=train)
        outputs = {}
        out_channels = self.res2_out_channels
        max_stage = max(int(f[-1]) for f in self.out_features)
        for idx, stage_idx in enumerate(range(2, max_stage + 1)):
            stage = f"res{stage_idx}"
            dilation = (self.res5_dilation
                        if stage_idx == 5 else 1)
            first_stride = (1 if idx == 0 or
                            (stage_idx == 5 and dilation == 2) else 2)
            for b in range(num_blocks[idx]):
                stride = first_stride if b == 0 else 1
                kwargs = dict(out_channels=out_channels, dilation=dilation,
                              stride=stride, norm=self.norm,
                              dtype=self.dtype, name=f"{stage}_{b}")
                if basic:
                    x = BasicBlock(**kwargs)(x, train=train)
                else:
                    x = BottleneckBlock(
                        bottleneck_channels=bc,
                        stride_in_1x1=self.stride_in_1x1,
                        num_groups=self.num_groups,
                        **kwargs)(x, train=train)
            if stage in self.out_features:
                outputs[stage] = x
            out_channels *= 2
            bc *= 2
        return outputs


def build_resnet_backbone(cfg) -> Tuple[ResNetPlain, Dict[str, int], Dict[str, int]]:
    """Plain (strided) ResNet builder — the reference's
    detectron2/modeling/backbone/resnet.py:643 ``build_resnet_backbone``."""
    r = cfg.MODEL.RESNETS
    model = ResNetPlain(
        depth=r.DEPTH,
        num_groups=r.NUM_GROUPS,
        width_per_group=r.WIDTH_PER_GROUP,
        stem_out_channels=r.STEM_OUT_CHANNELS,
        res2_out_channels=r.RES2_OUT_CHANNELS,
        res5_dilation=r.RES5_DILATION,
        stride_in_1x1=r.STRIDE_IN_1X1,
        out_features=tuple(r.OUT_FEATURES),
        norm=r.NORM,
        dtype=jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32,
    )
    return model, model.feature_strides, model.feature_channels
