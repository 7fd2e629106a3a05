"""CLIP visual towers with multi-image ("img_len") folding, in Flax.

TPU-native rebuild of the reference's modified OpenAI CLIP vision models
(`/root/reference/models/CLIP/clip/model.py`):

  * ModifiedResNet (RN50): 3-conv stem + anti-aliased strided bottlenecks +
    attention pooling (`model.py:10-187`).
  * VisualTransformer (ViT-B/32): conv patch embed + pre-LN transformer
    with QuickGELU (`model.py:242-305`).
  * The sequencing-specific modification: a story of N step images is FOLDED
    into ONE token stream — patch tokens of all N images are concatenated
    after a single class token, with the positional embedding repeated per
    image (`model.py:267-277` for ViT, `model.py:72-125` AttentionPool for
    RN50).
  * `skip_last_layer` returns the ln_post'd patch grid instead of the
    projected CLS (`model.py:301-305`).
  * RN50 attention-pool output is duplicated channel-wise to reach
    visual_feat_dim=2048 (`model.py:104-106`).

Convs run in the compute dtype on the MXU; BatchNorm uses a `batch_stats`
collection (running averages frozen when `deterministic`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass
class CLIPVisionConfig:
    model_name: str = "RN50"
    image_resolution: int = 224
    # RN50
    layers: Tuple[int, int, int, int] = (3, 4, 6, 3)
    width: int = 64
    heads: int = 32
    output_dim: int = 1024
    # ViT
    vit_layers: int = 12
    vit_width: int = 768
    vit_heads: int = 12
    patch_size: int = 32
    dtype: str = "float32"
    # The reference folds N step images into the RN50 attnpool stream with
    # `x.reshape(B, C, HW*L)` on an NCHW tensor (`model.py:76-77`) — a raw
    # byte reinterpretation that interleaves channels and images rather
    # than concatenating per-image patch tokens. Default False = clean
    # semantic fold (token (l, hw) keeps channel axis intact — the layout
    # OpenAI's pretrained attnpool was trained on); True replays the
    # reference's byte order exactly, for importing reference-FINETUNED
    # checkpoints whose downstream weights learned through the quirk.
    ref_fold_quirk: bool = False

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def embed_dim(self):
        return self.width * 32  # RN50 feature dim (2048)

    @property
    def grid(self):
        if self.model_name.startswith("RN"):
            return self.image_resolution // 32
        return self.image_resolution // self.patch_size

    @classmethod
    def rn50(cls, **kw):
        return cls(model_name="RN50", **kw)

    @classmethod
    def vit_b32(cls, **kw):
        return cls(model_name="ViT-B/32", output_dim=512, **kw)

    @classmethod
    def tiny_rn(cls, **kw):
        base = dict(model_name="RN50", image_resolution=32, width=8, heads=4,
                    layers=(1, 1, 1, 1), output_dim=32)
        base.update(kw)
        return cls(**base)

    @classmethod
    def tiny_vit(cls, **kw):
        base = dict(model_name="ViT-B/32", image_resolution=32, patch_size=8,
                    vit_layers=2, vit_width=32, vit_heads=4, output_dim=32)
        base.update(kw)
        return cls(**base)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class Bottleneck(nn.Module):
    """CLIP anti-aliased bottleneck (`model.py:10-53`): all convs stride 1,
    avgpool after conv2 when stride > 1."""
    planes: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    EXPANSION = 4

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), padding=[(k // 2, k // 2)] * 2, use_bias=False,
            dtype=self.dtype, name=name)
        bn = lambda name: nn.BatchNorm(
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        identity = x
        out = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        out = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(out)))
        if self.stride > 1:
            out = nn.avg_pool(out, (self.stride,) * 2, (self.stride,) * 2)
        out = bn("bn3")(conv(self.planes * self.EXPANSION, 1, "conv3")(out))
        if self.stride > 1 or x.shape[-1] != self.planes * self.EXPANSION:
            identity = nn.avg_pool(x, (self.stride,) * 2, (self.stride,) * 2) \
                if self.stride > 1 else x
            identity = bn("downsample_bn")(
                conv(self.planes * self.EXPANSION, 1, "downsample_conv")(
                    identity))
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """QKV attention pooling with multi-image positional folding
    (`model.py:56-125`). Input (B*img_len, H, W, C); output: with
    img_len > 1, the full token stream (B, HW*img_len + 1, 2*output_dim)
    (channel-duplicated, `model.py:104-106`); else the pooled (B, output_dim)."""
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x, img_len: int = 1):
        cfg = self.cfg
        bn, h, w, c = x.shape
        b = bn // img_len
        spacial = cfg.grid
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(c ** -0.5), (spacial * spacial + 1, c))
        if self.cfg.ref_fold_quirk and img_len > 1:
            # replay the reference's byte order (`model.py:76-77`):
            # (B*L, C, HW) memory viewed as (B, C, HW*L), tokens = last axis
            xc = x.transpose(0, 3, 1, 2).reshape(b, img_len * c * h * w)
            tokens = xc.reshape(b, c, h * w * img_len).transpose(0, 2, 1)
        else:
            # clean semantic fold: (B*L, H, W, C) -> (B, L*HW, C)
            tokens = x.reshape(b, img_len * h * w, c)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)
        patch_len = h * w
        if img_len > 1:
            pe = jnp.concatenate(
                [pos_emb] + [pos_emb[:patch_len]] * (img_len - 1), axis=0)
        else:
            pe = pos_emb
        tokens = tokens + pe[None].astype(tokens.dtype)

        heads = cfg.heads
        q = nn.Dense(c, dtype=cfg.compute_dtype, name="q_proj")(tokens)
        k = nn.Dense(c, dtype=cfg.compute_dtype, name="k_proj")(tokens)
        v = nn.Dense(c, dtype=cfg.compute_dtype, name="v_proj")(tokens)
        L = tokens.shape[1]
        d = c // heads
        split = lambda t: t.reshape(b, L, heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhsd,bhtd->bhst", split(q), split(k),
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(d)), axis=-1)
        ctx = jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), split(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, L, c)
        out = nn.Dense(cfg.output_dim, dtype=cfg.compute_dtype,
                       name="c_proj")(ctx)
        if img_len > 1:
            return jnp.concatenate([out, out], axis=-1)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    """CLIP RN50 trunk (`model.py:128-187`)."""
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x, skip_last_layer: bool = False, img_len: int = 1,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        x = x.astype(dt)
        bn = lambda name: nn.BatchNorm(use_running_average=deterministic,
                                       momentum=0.9, epsilon=1e-5, dtype=dt,
                                       name=name)
        # 3-conv stem
        x = nn.relu(bn("bn1")(nn.Conv(
            cfg.width // 2, (3, 3), strides=2, padding=1, use_bias=False,
            dtype=dt, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(
            cfg.width // 2, (3, 3), padding=1, use_bias=False, dtype=dt,
            name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(
            cfg.width, (3, 3), padding=1, use_bias=False, dtype=dt,
            name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), (2, 2))
        for stage, (blocks, mult, stride) in enumerate([
                (cfg.layers[0], 1, 1), (cfg.layers[1], 2, 2),
                (cfg.layers[2], 4, 2), (cfg.layers[3], 8, 2)]):
            for blk in range(blocks):
                x = Bottleneck(cfg.width * mult,
                               stride=stride if blk == 0 else 1, dtype=dt,
                               name=f"layer{stage+1}_{blk}")(
                                   x, deterministic)
        # attnpool params registered unconditionally (see ViT note)
        pooled = AttentionPool2d(cfg, name="attnpool")(x, img_len=img_len)
        if skip_last_layer:
            return x  # (B*L, grid, grid, embed_dim)
        return pooled


class ViTBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask_bias=None):
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        b, L, c = h.shape
        d = c // self.heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(b, L, self.heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhsd,bhtd->bhst", split(q), split(k),
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(d))
        if mask_bias is not None:
            logits = logits + mask_bias
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhst,bhtd->bhsd", probs.astype(v.dtype), split(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, L, c)
        x = x + nn.Dense(c, dtype=self.dtype, name="attn_out")(ctx)
        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        h = nn.Dense(4 * c, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(c, dtype=self.dtype, name="c_proj")(h)
        return x


class VisualTransformer(nn.Module):
    """CLIP ViT with multi-image folding (`model.py:242-305`). Also supports
    the ViLT-style joint mode: text embeddings prepended to the patch stream
    and run through the visual transformer (`model.py:282-295`)."""
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x, skip_last_layer: bool = False, img_len: int = 1,
                 text_embedding=None, text_mask=None,
                 deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        width = cfg.vit_width
        p = cfg.patch_size
        x = nn.Conv(width, (p, p), strides=p, use_bias=False, dtype=dt,
                    padding="VALID", name="conv1")(x.astype(dt))
        bn_, gh, gw, c = x.shape
        patch_len = gh * gw
        b = bn_ // img_len
        x = x.reshape(b, img_len * patch_len, c)
        cls_emb = self.param("class_embedding",
                             nn.initializers.normal(width ** -0.5), (width,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_emb.astype(dt), (b, 1, c)), x], axis=1)
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(width ** -0.5),
            (patch_len + 1, width))
        if img_len > 1:
            pe = jnp.concatenate(
                [pos_emb] + [pos_emb[:patch_len]] * (img_len - 1), axis=0)
        else:
            pe = pos_emb
        x = x + pe[None].astype(dt)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)

        mask_bias = None
        if text_embedding is not None:
            # ViLT joint mode: [text; patches] through the visual stack.
            x = jnp.concatenate([text_embedding.astype(dt), x], axis=1)
            if text_mask is not None:
                L = x.shape[1]
                full = jnp.concatenate(
                    [text_mask.astype(jnp.float32),
                     jnp.ones((b, L - text_mask.shape[1]), jnp.float32)],
                    axis=1)
                mask_bias = ((1.0 - full) * -1e9)[:, None, None, :]

        for i in range(cfg.vit_layers):
            x = ViTBlock(width, cfg.vit_heads, dtype=dt,
                         name=f"resblock_{i}")(x, mask_bias)

        # register both output paths' params unconditionally (torch-style;
        # the unused branch is DCE'd by XLA)
        x_ln = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        proj = self.param("proj", nn.initializers.normal(width ** -0.5),
                          (width, cfg.output_dim))
        if text_embedding is not None:
            return x
        if skip_last_layer:
            return x_ln
        return x @ proj.astype(dt)


class CLIPVisualTower(nn.Module):
    """Dispatch RN50 / ViT by config; the `visual_model` of the multimodal
    encoder (`models/CLIP/src/lxrt/modeling.py:822-826`)."""
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images, skip_last_layer: bool = False,
                 img_len: int = 1, deterministic: bool = True):
        if self.cfg.model_name.startswith("RN"):
            return ModifiedResNet(self.cfg, name="resnet")(
                images, skip_last_layer, img_len, deterministic)
        return VisualTransformer(self.cfg, name="vit")(
            images, skip_last_layer=skip_last_layer, img_len=img_len,
            deterministic=deterministic)

    @property
    def feat_dim(self):
        if self.cfg.model_name.startswith("RN"):
            return 2 * self.cfg.output_dim  # channel-duplicated attnpool out
        return self.cfg.vit_width
