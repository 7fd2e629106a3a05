"""Detectron2-style ResNet-FPN vision tower + ROI features, TPU-native.

Rebuilds the reference's `--vision_model detectron2_*` surface
(`/root/reference/trainers/multimodal_utils.py:30-167`, Detectron2Wrapper):

* backbone-only mode (``include_num_img_regional_features is None``): FPN
  "p6" map flattened to (B, -1), 2x avg-pooled first when
  ``include_full_img_features`` (ref ``:158-167``).
* regional mode: proposals -> ROI features -> top-K (B, K, D) regional
  features plus a full-image feature from pooled p6; short proposal lists
  are padded with the full-image feature (ref ``:139-145``).

TPU-first redesign, not a translation: detectron2's RPN + per-image NMS is
a dynamic-shape, host-driven program. Here proposal generation is a
class-agnostic objectness head over the FPN levels whose top-K peaks (one
static ``lax.top_k`` across all levels) become fixed-aspect anchor boxes —
no NMS, no dynamic shapes — so backbone, proposals, ROI-align, and the box
head compile into ONE jit program. Detectron2 model-zoo checkpoints load
via `models/convert.py::convert_detectron2_fpn` (backbone + FPN +
RPN-objectness + box head; stage-parity-tested vs a torch
re-implementation) through `--vision_model_checkpoint`; the sidecar format
written by `tools/extract_roi_features.py` is identical to the reference's
`{img}_maskrcnn.npy` contract (`data/images.load_maskrcnn_sidecar`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import ResNetBackbone

# FPN levels used for proposals/ROI pooling, with their strides wrt the
# input image (detectron2 default ResNet-FPN: p2..p5 for ROI, p6 for the
# coarse full-image path).
_LEVEL_STRIDES = (("p2", 4), ("p3", 8), ("p4", 16), ("p5", 32))


class FPN(nn.Module):
    """Lateral 1x1 + top-down pathway + 3x3 output convs -> p2..p6."""
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, stages):
        conv = lambda k, name: nn.Conv(self.out_channels, (k, k),
                                       padding=k // 2, dtype=self.dtype,
                                       name=name)
        names = ["c2", "c3", "c4", "c5"]
        laterals = [conv(1, f"lateral_{n}")(stages[n]) for n in names]
        # top-down: upsample coarser level, add
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in (2, 1, 0):
            up = jax.image.resize(merged[i + 1], laterals[i].shape,
                                  method="nearest")
            merged[i] = laterals[i] + up
        outs = {f"p{i+2}": conv(3, f"output_p{i+2}")(merged[i])
                for i in range(4)}
        outs["p6"] = nn.max_pool(outs["p5"], (1, 1), strides=(2, 2))
        return outs


def roi_align(feat, boxes, output_size: int = 7):
    """Bilinear ROI-align of NHWC `feat` at normalized [0,1] boxes.

    feat: (H, W, C) single image; boxes: (K, 4) as (y0, x0, y1, x1).
    Returns (K, output_size, output_size, C). Static shapes throughout
    (K and output_size fixed), so it fuses into the surrounding jit.
    """
    h, w = feat.shape[:2]
    s = output_size

    def one(box):
        # coordinates and interpolation weights stay f32 even for a bf16
        # feature map — bf16 resolution near a 56-px p2 axis is 0.25 cells,
        # which would skew sample centers; only the gathered values carry
        # the compute dtype
        y0, x0, y1, x1 = box
        ys = y0 + (jnp.arange(s, dtype=jnp.float32) + 0.5) / s * (y1 - y0)
        xs = x0 + (jnp.arange(s, dtype=jnp.float32) + 0.5) / s * (x1 - x0)
        ys = jnp.clip(ys * h - 0.5, 0.0, h - 1.0)
        xs = jnp.clip(xs * w - 0.5, 0.0, w - 1.0)
        y_lo = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 2)
        x_lo = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 2)
        wy = (ys - y_lo.astype(jnp.float32))[:, None, None].astype(feat.dtype)
        wx = (xs - x_lo.astype(jnp.float32))[None, :, None].astype(feat.dtype)
        g = lambda dy, dx: feat[y_lo + dy][:, x_lo + dx]  # (s, s, C)
        return ((1 - wy) * (1 - wx) * g(0, 0) + (1 - wy) * wx * g(0, 1)
                + wy * (1 - wx) * g(1, 0) + wy * wx * g(1, 1))

    return jax.vmap(one)(boxes.astype(jnp.float32))


class FPNVisionTower(nn.Module):
    """ResNet-FPN backbone with Detectron2Wrapper-compatible outputs.

    Dispatch mirrors the reference (`multimodal_utils.py:44-47`): with
    ``num_regional_features=None`` (backbone-only mode) __call__ returns
    flattened (optionally avg-pooled) p6; with K set it returns
    (full_image_features (B, Df), regional (B, K, D), scores, boxes).
    """
    backbone_name: str = "resnet50"
    fpn_channels: int = 256
    feature_dim: int = 2048        # box-head output = ref visual_feat_dim
    num_regional_features: Optional[int] = None
    roi_size: int = 7
    pool_full_img: bool = True     # ref include_full_img_features avg-pool
    # detectron2-zoo backbones are Caffe-style (stride on the bottleneck's
    # 1x1 conv1); required for numeric parity with converted zoo weights.
    # NOTE: this default changed from False (torchvision-style) when the
    # detectron2 converter landed — it changes forward semantics without
    # changing parameter shapes, so a tower checkpoint trained under the
    # old default must be reloaded with stride_in_1x1=False explicitly
    # (extract_roi_features does this for torchvision weights via
    # `not resnet_torch_weights`).
    stride_in_1x1: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, deterministic: bool = True):
        stages = ResNetBackbone(self.backbone_name, dtype=self.dtype,
                                stride_in_1x1=self.stride_in_1x1,
                                name="bottom_up")(
            images, deterministic=deterministic, return_stages=True)
        feats = FPN(self.fpn_channels, dtype=self.dtype,
                    name="fpn")(stages)
        if self.num_regional_features is None:
            return self._full_img(feats["p6"])
        b = images.shape[0]
        img_h, img_w = images.shape[1:3]
        k = self.num_regional_features

        # class-agnostic objectness: shared 3x3 -> 1x1 head per level
        head3 = nn.Conv(self.fpn_channels, (3, 3), padding=1,
                        dtype=self.dtype, name="obj_conv")
        head1 = nn.Conv(1, (1, 1), dtype=self.dtype, name="obj_logit")
        scores, centers, sides = [], [], []
        for name, stride in _LEVEL_STRIDES:
            f = feats[name]
            logit = head1(nn.relu(head3(f)))[..., 0]       # (B, Hl, Wl)
            hl, wl = logit.shape[1:]
            logit = logit.reshape(b, hl * wl)
            yy, xx = jnp.meshgrid(jnp.arange(hl), jnp.arange(wl),
                                  indexing="ij")
            # anchor: 8*stride square centered on the cell (normalized)
            cy = ((yy.reshape(-1) + 0.5) * stride / img_h)
            cx = ((xx.reshape(-1) + 0.5) * stride / img_w)
            side_y = jnp.full_like(cy, 4.0 * stride / img_h)
            side_x = jnp.full_like(cx, 4.0 * stride / img_w)
            scores.append(logit.astype(jnp.float32))
            centers.append(jnp.stack([cy, cx], -1))
            sides.append(jnp.stack([side_y, side_x], -1))
        all_scores = jnp.concatenate(scores, axis=1)        # (B, A)
        all_centers = jnp.concatenate(centers, axis=0)      # (A, 2)
        all_sides = jnp.concatenate(sides, axis=0)          # (A, 2)
        top_scores, top_idx = jax.lax.top_k(all_scores, k)  # (B, K)
        c = all_centers[top_idx]                            # (B, K, 2)
        sd = all_sides[top_idx]
        boxes = jnp.clip(jnp.concatenate(
            [c - sd, c + sd], axis=-1), 0.0, 1.0)           # (B, K, 4) yxyx

        # ROI-align on p2 (finest level; single-level keeps the gather
        # pattern uniform — the box head sees scale via the box extent)
        rois = jax.vmap(lambda f, bx: roi_align(f, bx, self.roi_size))(
            feats["p2"], boxes)                              # (B,K,s,s,C)
        x = rois.reshape(b, k, -1)
        x = nn.relu(nn.Dense(self.feature_dim, dtype=self.dtype,
                             name="box_fc1")(x))
        regional = nn.relu(nn.Dense(self.feature_dim, dtype=self.dtype,
                                    name="box_fc2")(x))      # (B, K, D)

        full_img = self._full_img(feats["p6"])
        return full_img, regional, top_scores, boxes

    def _full_img(self, p6):
        # ref avg-pools p6 2x when include_full_img_features; tiny test
        # inputs can leave p6 at 1x1 where a stride-2 pool would return
        # an empty map — skip the pool there
        if self.pool_full_img and min(p6.shape[1:3]) >= 2:
            p6 = nn.avg_pool(p6, (2, 2), strides=(2, 2))
        return p6.reshape(p6.shape[0], -1)


def backbone_from_name(vision_model: str) -> str:
    """Pick the FPN bottom-up ResNet from the detectron2-style config
    name (the reference selects by config name too,
    multimodal_utils.py:35-38): 'detectron2_...R_101...' -> resnet101."""
    for tag, name in (("101", "resnet101"), ("50", "resnet50"),
                      ("34", "resnet34"), ("18", "resnet18")):
        if tag in vision_model:
            return name
    return "resnet50"


def build_pooled_vision_tower(vision_model: str, dtype):
    """Dispatch `--vision_model` to a pooled-feature tower module.

    resnet18/50/101 -> global-average ResNet (ref multimodal_utils.py:208-
    218); detectron2_* -> FPN p6 flattened (ref :158-167)."""
    if vision_model.startswith("detectron2"):
        return FPNVisionTower(backbone_name=backbone_from_name(vision_model),
                              name="vision_model", dtype=dtype)
    return ResNetBackbone(vision_model, dtype=dtype, name="vision_model")
