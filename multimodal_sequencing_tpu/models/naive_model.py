"""Naive multimodal model: image features appended as extra tokens.

TPU-native rebuild of `NaiveMultimodalModel`
(`/root/reference/models/naive_model.py:27-115`): per-step images run
through a ResNet backbone (fc removed), project to hidden size with
Linear+ReLU, and are concatenated AFTER the text token embeddings as extra
input embeddings; the attention mask is extended with ones. The combined
stream runs through the standard text encoder.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import MultimodalConfig
from .encoder import Embeddings, TransformerLayer
from .fpn import build_pooled_vision_tower
from .heads import ClassificationHead


def naive_encode_parts(cfg, encoder, ids, attn, types, images,
                       deterministic):
    """Run the naive model and split (lang, visn, pooled) honoring the
    text_part/img_part ablations — the model itself has no text_part
    guard, and under img_part it truncates text to ONE token, so the
    split uses the post-shrink length. Shared by SequencingModel and
    SequencingPretrainer (BERSON needs the full text span and keeps its
    own pair handling)."""
    imgs = None if cfg.multimodal_text_part else images
    out = encoder(ids, attn, types, images=imgs,
                  deterministic=deterministic)
    seq = out["sequence_output"]
    L = 1 if cfg.multimodal_img_part else ids.shape[1]
    visn = seq[:, L:] if imgs is not None else None
    return seq[:, :L], visn, out["pooled_output"]


class NaiveMultimodalModel(nn.Module):
    cfg: MultimodalConfig
    vision_name: str = "resnet50"

    @nn.compact
    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 images=None, deterministic: bool = True):
        cfg = self.cfg
        ecfg = cfg.encoder
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids)
        if cfg.multimodal_img_part:
            input_ids = jnp.zeros_like(input_ids[:, :1])
            attention_mask = jnp.zeros_like(attention_mask[:, :1])
            token_type_ids = None

        embeds = Embeddings(ecfg, name="embeddings")(
            input_ids, token_type_ids, deterministic=deterministic)

        if images is not None:
            from ..ops.preprocess import images_to_nhwc
            b, n = images.shape[:2]
            nhwc = images_to_nhwc(
                images, mode=("detectron2_bgr"
                              if self.vision_name.startswith("detectron2")
                              else "imagenet"))
            feats = build_pooled_vision_tower(
                self.vision_name, dtype=ecfg.compute_dtype)(
                nhwc, deterministic=deterministic)
            if cfg.freeze_vision_model:
                feats = jax.lax.stop_gradient(feats)
            proj = nn.Dense(ecfg.hidden_size, dtype=ecfg.compute_dtype,
                            name="img_project")(feats)
            proj = nn.relu(proj).reshape(b, n, ecfg.hidden_size)
            embeds = jnp.concatenate([embeds, proj], axis=1)
            attention_mask = jnp.concatenate(
                [attention_mask,
                 jnp.ones((b, n), attention_mask.dtype)], axis=1)

        x = embeds
        for i in range(ecfg.num_hidden_layers):
            x = TransformerLayer(ecfg, name=f"layer_{i}")(
                x, attention_mask, deterministic)
        pooled = nn.tanh(nn.Dense(ecfg.hidden_size, dtype=ecfg.compute_dtype,
                                  name="pooler")(x[:, 0]))
        logits = ClassificationHead(
            num_labels=cfg.num_labels, hidden_size=ecfg.hidden_size,
            dropout=ecfg.hidden_dropout_prob, dtype=ecfg.compute_dtype,
            name="cls_head")(pooled, deterministic)
        return {"sequence_output": x, "pooled_output": pooled,
                "logits": logits.astype(jnp.float32)}
