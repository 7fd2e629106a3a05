"""VisualBERT-style encoder: one visual token per step image.

TPU-native rebuild of the reference's mmf-based VisualBERT
(`/root/reference/models/visualbert/visual_bert_mmf.py:40-1061`): per-step
images run a ResNet backbone to pooled features (optionally + ROI regional
features, `:223-236`), projected into the hidden space by
visio-linguistic embeddings (projection + per-step visual token type +
position + LN, mmf `BertVisioLinguisticEmbeddings`), appended after the
text token embeddings, and run through the shared transformer. Unlike the
CLIP path there is no patch folding — each step contributes 1 (+R regional)
visual tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import MultimodalConfig
from .encoder import Embeddings, TransformerLayer
from .fpn import FPNVisionTower
from .resnet import ResNetBackbone


class VisioLinguisticVisualEmbeddings(nn.Module):
    """Projection + visual token-type + position embeddings + LN
    (mmf BertVisioLinguisticEmbeddings, visual side)."""
    hidden_size: int
    max_story_length: int
    max_positions: int = 256
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, visual_feats, type_ids, deterministic: bool = True):
        x = nn.Dense(self.hidden_size, dtype=self.dtype,
                     name="projection")(visual_feats)
        x = x + nn.Embed(self.max_story_length, self.hidden_size,
                         dtype=self.dtype,
                         name="token_type_embeddings")(type_ids)
        pos = self.param("position_embeddings",
                         nn.initializers.normal(0.02),
                         (self.max_positions, self.hidden_size))
        L = x.shape[1]
        x = x + pos[:L][None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-12, name="ln")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class VisualBERTEncoder(nn.Module):
    """Text tokens + per-step pooled visual tokens -> shared transformer.
    Returns (lang_out, visn_out, pooled) like MultimodalEncoder."""
    cfg: MultimodalConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 images=None, img_regional_features=None,
                 deterministic: bool = True):
        cfg = self.cfg
        ecfg = cfg.encoder
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if cfg.multimodal_img_part:
            input_ids = input_ids[:, :1]
            attention_mask = attention_mask[:, :1]
            token_type_ids = (token_type_ids[:, :1]
                              if token_type_ids is not None else None)
        lang = Embeddings(ecfg, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)
        lang_len = lang.shape[1]

        visn = None
        if images is not None and not cfg.multimodal_text_part:
            from ..ops.preprocess import images_to_nhwc
            b, n = images.shape[:2]
            d2 = cfg.vision_model.startswith("detectron2")
            # detectron2 towers consume the Caffe-style tail (0-255 BGR
            # minus PIXEL_MEAN; data/images.py ships BGR bytes for them)
            nhwc = images_to_nhwc(images,
                                  mode="detectron2_bgr" if d2
                                  else "imagenet")
            if d2:
                # detectron2-style tower (ref multimodal_utils.py:30-167):
                # FPN p6 per-step features; with K regional features and
                # no precomputed sidecars, ROI features come from the
                # tower inline like the reference's wrapper forward
                inline_roi = bool(cfg.num_img_regional_features
                                  and img_regional_features is None)
                k = cfg.num_img_regional_features
                if inline_roi and not cfg.include_full_img_features:
                    k = k + 1  # top ROI doubles as the image feature
                from .fpn import backbone_from_name
                tower_kw = {}
                if cfg.vision_stride_in_1x1 is not None:
                    tower_kw["stride_in_1x1"] = cfg.vision_stride_in_1x1
                tower = FPNVisionTower(
                    backbone_name=backbone_from_name(cfg.vision_model),
                    num_regional_features=(k if inline_roi else None),
                    pool_full_img=cfg.include_full_img_features,
                    feature_dim=cfg.vision_feature_dim or 2048,
                    dtype=ecfg.compute_dtype, name="vision_model",
                    **tower_kw)
                if inline_roi:
                    feats, reg, _, _ = tower(nhwc,
                                             deterministic=deterministic)
                    if not cfg.include_full_img_features:
                        # ref :146-152: without the full-image feature the
                        # top ROI becomes the per-step image feature and
                        # the next K follow as regional tokens (the tower
                        # produces K+1 proposals to keep K regional)
                        feats, reg = reg[:, 0], reg[:, 1:]
                    img_regional_features = reg.reshape(
                        b, n, -1, reg.shape[-1])
                    if cfg.freeze_vision_model:
                        img_regional_features = jax.lax.stop_gradient(
                            img_regional_features)
                else:
                    feats = tower(nhwc, deterministic=deterministic)
            else:
                feats = ResNetBackbone(cfg.vision_model,
                                       dtype=ecfg.compute_dtype,
                                       name="vision_model")(
                    nhwc, deterministic=deterministic)
            if cfg.freeze_vision_model:
                feats = jax.lax.stop_gradient(feats)
            feats = feats.reshape(b, n, -1)  # (B, N, C)
            type_ids = jnp.broadcast_to(jnp.arange(n)[None], (b, n))
            if (cfg.num_img_regional_features
                    and img_regional_features is not None
                    and img_regional_features.ndim == 4):
                # (B, N, R, Cr) regional ROI features appended per step
                r = img_regional_features.shape[2]
                reg = nn.Dense(feats.shape[-1], dtype=ecfg.compute_dtype,
                               name="regional_proj")(img_regional_features)
                feats = jnp.concatenate(
                    [feats[:, :, None], reg], axis=2).reshape(
                        b, n * (1 + r), -1)
                type_ids = jnp.repeat(type_ids, 1 + r, axis=1)
            visn = VisioLinguisticVisualEmbeddings(
                ecfg.hidden_size, cfg.max_story_length,
                dropout=ecfg.hidden_dropout_prob,
                dtype=ecfg.compute_dtype,
                name="visual_embeddings")(
                feats, type_ids, deterministic)

        if visn is not None and not cfg.bypass_transformer:
            joint = jnp.concatenate([lang, visn], axis=1)
            mask = jnp.concatenate(
                [attention_mask,
                 jnp.ones(visn.shape[:2], attention_mask.dtype)], axis=1)
        else:
            joint, mask = lang, attention_mask

        for i in range(ecfg.num_hidden_layers):
            joint = TransformerLayer(ecfg, name=f"layer_{i}")(
                joint, mask, deterministic)
        if visn is not None and cfg.bypass_transformer:
            # mmf bypass (visual_bert_mmf.py:114-140): the stack above saw
            # text only; fuse the visual tokens through ONE extra layer
            joint = jnp.concatenate([joint, visn], axis=1)
            mask = jnp.concatenate(
                [attention_mask,
                 jnp.ones(visn.shape[:2], attention_mask.dtype)], axis=1)
            joint = TransformerLayer(ecfg, name="additional_layer")(
                joint, mask, deterministic)
        lang_out = joint[:, :lang_len]
        visn_out = joint[:, lang_len:] if visn is not None else None
        pooled = nn.tanh(nn.Dense(ecfg.hidden_size, dtype=ecfg.compute_dtype,
                                  name="pooler")(lang_out[:, 0]))
        return lang_out, visn_out, pooled
