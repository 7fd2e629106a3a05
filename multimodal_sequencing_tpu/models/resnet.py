"""Torchvision-style ResNet backbones in Flax.

The reference's generic vision towers (`--vision_model resnet18/50/101`,
`/root/reference/trainers/multimodal_utils.py:181-229`): standard ResNet
with the final FC removed (global-average-pooled features). Used by the
naive multimodal model and as a pluggable backbone; pretrained torchvision
weights can be converted with `convert_torchvision_resnet`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    EXPANSION = 1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bn = lambda name: nn.BatchNorm(use_running_average=deterministic,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    # Caffe/detectron2-style blocks stride the 1x1 conv1; torchvision
    # strides the 3x3 conv2. The detectron2 zoo FPN checkpoints are all
    # stride_in_1x1, so weight interop needs this switch.
    stride_in_1x1: bool = False
    EXPANSION = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        bn = lambda name: nn.BatchNorm(use_running_average=deterministic,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=self.dtype, name=name)
        width = self.planes
        out_ch = width * self.EXPANSION
        s1, s2 = ((self.stride, 1) if self.stride_in_1x1
                  else (1, self.stride))
        identity = x
        out = nn.relu(bn("bn1")(nn.Conv(
            width, (1, 1), strides=s1, use_bias=False, dtype=self.dtype,
            name="conv1")(x)))
        out = nn.relu(bn("bn2")(nn.Conv(
            width, (3, 3), strides=s2, padding=1, use_bias=False,
            dtype=self.dtype, name="conv2")(out)))
        out = bn("bn3")(nn.Conv(out_ch, (1, 1), use_bias=False,
                                dtype=self.dtype, name="conv3")(out))
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


_SPECS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2), 512),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 512),
    "resnet50": (BottleneckBlock, (3, 4, 6, 3), 2048),
    "resnet101": (BottleneckBlock, (3, 4, 23, 3), 2048),
}


def resnet_feature_dim(name: str) -> int:
    return _SPECS[name][2]


class ResNetBackbone(nn.Module):
    """Returns pooled (B, C) features (fc removed, like the use sites).

    `return_stages=True` instead returns the {"c2".."c5"} per-stage NHWC
    feature dict (strides 4/8/16/32) that the FPN tower (`models/fpn.py`)
    builds on — the JAX analogue of detectron2's `bottom_up` outputs."""
    name_: str = "resnet50"
    dtype: jnp.dtype = jnp.float32
    stride_in_1x1: bool = False    # detectron2/Caffe bottleneck stride

    @nn.compact
    def __call__(self, x, deterministic: bool = True, pool: bool = True,
                 return_stages: bool = False):
        block_cls, layers, _ = _SPECS[self.name_]
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.relu(nn.BatchNorm(use_running_average=deterministic,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype, name="bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        stages = {}
        for stage, (blocks, planes, stride) in enumerate(zip(
                layers, (64, 128, 256, 512), (1, 2, 2, 2))):
            for b in range(blocks):
                kw = ({"stride_in_1x1": self.stride_in_1x1}
                      if block_cls is BottleneckBlock else {})
                x = block_cls(planes, stride=stride if b == 0 else 1,
                              dtype=self.dtype,
                              name=f"layer{stage+1}_{b}", **kw)(
                    x, deterministic)
            stages[f"c{stage+2}"] = x
        if return_stages:
            return stages
        if pool:
            return x.mean(axis=(1, 2))
        return x


def convert_torchvision_resnet(state_dict, name: str = "resnet50"):
    """torchvision ResNet state dict -> (params, batch_stats)."""
    def _np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    sd = {k: _np(v) for k, v in state_dict.items()}
    block_cls, layers, _ = _SPECS[name]

    def conv(prefix):
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}

    def bn(prefix):
        return ({"scale": sd[f"{prefix}.weight"],
                 "bias": sd[f"{prefix}.bias"]},
                {"mean": sd[f"{prefix}.running_mean"],
                 "var": sd[f"{prefix}.running_var"]})

    params = {"conv1": conv("conv1")}
    stats = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    n_convs = 2 if block_cls is BasicBlock else 3
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src, dst = f"layer{stage+1}.{b}", f"layer{stage+1}_{b}"
            bp, bs = {}, {}
            for c in range(1, n_convs + 1):
                bp[f"conv{c}"] = conv(f"{src}.conv{c}")
                bp[f"bn{c}"], bs[f"bn{c}"] = bn(f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = conv(f"{src}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = bn(
                    f"{src}.downsample.1")
            params[dst] = bp
            stats[dst] = bs
    return params, stats


def export_torchvision_resnet(params, batch_stats, name: str = "resnet50"):
    """Inverse of `convert_torchvision_resnet`: flax (params, batch_stats)
    -> a torchvision-layout state dict of numpy arrays (conv kernels back
    to OIHW, BN scale/bias/running stats under torchvision names).

    Use cases: round-trip testing of the converter, and producing a
    `--vision_model_checkpoint` file from a tower trained in-framework
    (the quality gate warm-starts its pixels tower this way — no zoo
    download exists in this environment)."""
    p = {k: np.asarray(v) for k, v in _flatten(params).items()}
    s = {k: np.asarray(v) for k, v in _flatten(batch_stats).items()}
    block_cls, layers, _ = _SPECS[name]
    sd = {}

    def put_conv(dst, src):
        sd[f"{dst}.weight"] = p[f"{src}/kernel"].transpose(3, 2, 0, 1)

    def put_bn(dst, src):
        sd[f"{dst}.weight"] = p[f"{src}/scale"]
        sd[f"{dst}.bias"] = p[f"{src}/bias"]
        sd[f"{dst}.running_mean"] = s[f"{src}/mean"]
        sd[f"{dst}.running_var"] = s[f"{src}/var"]

    put_conv("conv1", "conv1")
    put_bn("bn1", "bn1")
    n_convs = 2 if block_cls is BasicBlock else 3
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            dst, src = f"layer{stage+1}.{b}", f"layer{stage+1}_{b}"
            for c in range(1, n_convs + 1):
                put_conv(f"{dst}.conv{c}", f"{src}/conv{c}")
                put_bn(f"{dst}.bn{c}", f"{src}/bn{c}")
            if f"{src}/downsample_conv/kernel" in p:
                put_conv(f"{dst}.downsample.0", f"{src}/downsample_conv")
                put_bn(f"{dst}.downsample.1", f"{src}/downsample_bn")
    return sd


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out
