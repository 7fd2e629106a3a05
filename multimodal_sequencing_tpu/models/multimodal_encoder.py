"""Single-stream multimodal encoder (visualbert-style LXRT).

TPU-native rebuild of the reference's primary model — the "clip" model type
(`/root/reference/models/CLIP/src/lxrt/modeling.py:737-1120,1456-1598`):

  text token embeddings  ─┐
                          ├── concat -> num_hidden_layers joint transformer
  CLIP tower -> VisualFeatEncoder (2048->hidden) with 2-D positional +
  per-step token-type embeddings ─┘

Modes mirrored from the reference:
  * multimodal_text_part — no visual stream at all
  * multimodal_img_part  — language shrunk to its CLS token
    (`modeling.py:1526-1530`)
  * full joint           — `[lang; visn]` through shared layers, split back
    (`modeling.py:1076-1107`)

The visual token stream is the *folded* multi-image stream: all N step
images' patches behind one class token (see clip_visual.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import MultimodalConfig
from .clip_visual import CLIPVisionConfig, CLIPVisualTower
from .encoder import Embeddings, TransformerLayer


class VisualFeatEncoder(nn.Module):
    """Linear + LN projection of visual features into the text hidden space
    (`modeling.py:569-602`); optional box-position branch for regional
    features."""
    hidden_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, boxes=None, deterministic: bool = True):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="visn_fc")(
            feats)
        x = nn.LayerNorm(epsilon=1e-12, name="visn_ln")(x)
        if boxes is not None:
            y = nn.Dense(self.hidden_size, dtype=self.dtype,
                         name="box_fc")(boxes)
            y = nn.LayerNorm(epsilon=1e-12, name="box_ln")(y)
            x = (x + y) / 2
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class LinearPositionEmbedding(nn.Module):
    """Separate learned x/y grid position embeddings added to the folded
    visual stream (`modeling.py:621-660`): (1, grid^2, D) tiled per image
    with the first row prepended for the class token."""
    feat_dim: int
    grid: int

    @nn.compact
    def __call__(self, visn_feats, img_len: int):
        x_emb = nn.Embed(self.grid, self.feat_dim,
                         name="x_position_embedding")(jnp.arange(self.grid))
        y_emb = nn.Embed(self.grid, self.feat_dim,
                         name="y_position_embedding")(jnp.arange(self.grid))
        pe = (x_emb[:, None, :] + y_emb[None, :, :]).reshape(
            1, self.grid * self.grid, self.feat_dim)
        if img_len > 1:
            pe = jnp.concatenate([pe] * img_len, axis=1)
            pe = jnp.concatenate([pe[:, :1], pe], axis=1)
        return visn_feats + pe.astype(visn_feats.dtype)


class VisualTokenTypeEmbedding(nn.Module):
    """Per-step token-type embedding over the folded stream
    (`modeling.py:663-705`, skip_last_layer=False branch): token 0 typed 0,
    then each image's block typed by its step index."""
    feat_dim: int
    max_story_length: int

    @nn.compact
    def __call__(self, visn_feats, img_len: int):
        L = visn_feats.shape[1]
        emb = nn.Embed(self.max_story_length, self.feat_dim,
                       name="token_type_embedding")
        single = (L - 1) // max(img_len, 1)
        block = jnp.repeat(jnp.arange(img_len), single)
        type_ids = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             block.astype(jnp.int32),
             jnp.zeros((L - 1 - img_len * single,), jnp.int32)])
        return visn_feats + emb(type_ids)[None].astype(visn_feats.dtype)


class MultimodalEncoder(nn.Module):
    """Joint text+vision encoder; returns (lang_feats, visn_feats, pooled)."""
    cfg: MultimodalConfig
    vision_cfg: Optional[CLIPVisionConfig] = None

    def setup(self):
        cfg = self.cfg
        ecfg = cfg.encoder
        vcfg = self.vision_cfg or (
            CLIPVisionConfig.rn50(dtype=ecfg.dtype)
            if cfg.clip_model_name.startswith("RN")
            else CLIPVisionConfig.vit_b32(dtype=ecfg.dtype))
        self.vcfg = vcfg
        self.embeddings = Embeddings(ecfg, name="embeddings")
        if not cfg.multimodal_text_part:
            self.visual_model = CLIPVisualTower(vcfg, name="visual_model")
            feat_dim = (2 * vcfg.output_dim
                        if vcfg.model_name.startswith("RN")
                        else vcfg.vit_width)
            self.feat_dim = feat_dim
            self.visn_fc = VisualFeatEncoder(
                ecfg.hidden_size, ecfg.hidden_dropout_prob,
                ecfg.compute_dtype, name="visn_fc")
            if cfg.use_positional_embedding:
                self.visual_pos = LinearPositionEmbedding(
                    feat_dim, vcfg.grid, name="visual_pos")
            if cfg.use_token_type_embedding:
                self.visual_token_type = VisualTokenTypeEmbedding(
                    feat_dim, cfg.max_story_length, name="visual_token_type")
        self.layers = [
            TransformerLayer(ecfg, name=f"layer_{i}")
            for i in range(ecfg.num_hidden_layers)]
        self.pooler_dense = nn.Dense(ecfg.hidden_size,
                                     dtype=ecfg.compute_dtype, name="pooler")

    def encode_visual(self, images, deterministic: bool = True):
        """images: (B, N, 3, H, W) CHW float, or (B, N, H, W, 3) uint8 (the
        low-bandwidth loader layout: normalize runs fused on device) ->
        projected visual token stream (B, N*grid^2 + 1, hidden)."""
        cfg = self.cfg
        from ..ops.preprocess import images_to_nhwc
        b, n = images.shape[:2]
        nhwc = images_to_nhwc(images)
        feats = self.visual_model(nhwc, skip_last_layer=False, img_len=n,
                                  deterministic=deterministic)
        if cfg.freeze_vision_model:
            feats = jax.lax.stop_gradient(feats)
        if cfg.use_positional_embedding:
            feats = self.visual_pos(feats, img_len=n)
        if cfg.use_token_type_embedding:
            feats = self.visual_token_type(feats, img_len=n)
        return self.visn_fc(feats, deterministic=deterministic)

    def joint_encode(self, lang, visn, attention_mask,
                     deterministic: bool = True):
        """Run the shared layers over [lang; visn] and split back
        (`modeling.py:1076-1107`). `visn` may be None (text-only)."""
        ecfg = self.cfg.encoder
        lang_len = lang.shape[1]
        if visn is not None:
            joint = jnp.concatenate([lang, visn.astype(lang.dtype)], axis=1)
            vis_mask = jnp.ones(visn.shape[:2], attention_mask.dtype)
            mask = jnp.concatenate([attention_mask, vis_mask], axis=1)
        else:
            joint = lang
            mask = attention_mask
        for layer in self.layers:
            joint = layer(joint, mask, deterministic)
        lang_out = joint[:, :lang_len]
        visn_out = joint[:, lang_len:] if visn is not None else None
        pooled = nn.tanh(self.pooler_dense(lang_out[:, 0]))
        return lang_out, visn_out, pooled

    def embed_language(self, input_ids, attention_mask=None,
                       token_type_ids=None, deterministic: bool = True):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if cfg.multimodal_img_part:
            # language shrinks to CLS (`modeling.py:1526-1530`)
            input_ids = input_ids[:, :1]
            attention_mask = attention_mask[:, :1]
            token_type_ids = (token_type_ids[:, :1]
                              if token_type_ids is not None else None)
        lang = self.embeddings(input_ids, token_type_ids,
                               deterministic=deterministic)
        return lang, attention_mask

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 images=None, deterministic: bool = True):
        cfg = self.cfg
        lang, attention_mask = self.embed_language(
            input_ids, attention_mask, token_type_ids, deterministic)
        visn = None
        if images is not None and not cfg.multimodal_text_part:
            visn = self.encode_visual(images, deterministic)
        return self.joint_encode(lang, visn, attention_mask, deterministic)
