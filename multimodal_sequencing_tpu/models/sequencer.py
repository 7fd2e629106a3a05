"""SequencingModel: encoder + ordering head, the framework's core model.

Composes the text or multimodal encoder with the head selected by
`hierarchical_version` — the TPU-native analogue of the reference's model
construction dispatch (`/root/reference/trainers/train.py:1544-1940`):

  v0            pooled CLS -> ClassificationHead (pairwise / head /
                pure_class logits)
  v1 | v2 | v3  per-step CLS -> HeatmapHead (N x N precedence map)
  p0 | p1       per-step CLS -> PointerHead (position-pointer logits)

With `cfg.multimodal` the encoder is the single-stream joint encoder
(CLIP tower + folded visual tokens + shared transformer); otherwise the
text-only TextEncoder. All paths are shape-static and jit-safe; the same
module serves train and the batched all-pairs decode path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import MultimodalConfig
from .encoder import TextEncoder
from .multimodal_encoder import MultimodalEncoder
from .clip_visual import CLIPVisionConfig
from .heads import (
    ClassificationHead, HeatmapHead, PointerHead, AuxObjectiveHeads,
    gather_step_cls)


class SequencingModel(nn.Module):
    cfg: MultimodalConfig
    vision_cfg: Optional[CLIPVisionConfig] = None

    def setup(self):
        cfg = self.cfg
        if cfg.multimodal:
            if cfg.multimodal_model_type == "visualbert":
                from .visualbert import VisualBERTEncoder
                self.encoder = VisualBERTEncoder(cfg, name="encoder")
            elif cfg.multimodal_model_type in ("naive", "naive_model"):
                # the reference's finetune trainer ships this construction
                # commented out and falls back to a text-only AutoModel
                # (train.py:1554-1573); the pretrainer builds it live
                # (run_pretraining.py:1227-1234). Like the BERSON inner
                # dispatch, this implements the evident intent.
                from .naive_model import NaiveMultimodalModel
                self.encoder = NaiveMultimodalModel(
                    cfg, vision_name=cfg.vision_model, name="encoder")
            else:  # "clip" (primary); vilbert/uniter are unreachable in the
                # reference too (missing dirs, SURVEY §0)
                self.encoder = MultimodalEncoder(cfg, self.vision_cfg,
                                                 name="encoder")
        else:
            self.encoder = TextEncoder(cfg.encoder, name="encoder")
        v = cfg.hierarchical_version
        if v == "v0":
            self.head = ClassificationHead(
                num_labels=cfg.num_labels,
                hidden_size=cfg.encoder.hidden_size,
                dropout=cfg.encoder.hidden_dropout_prob,
                dtype=cfg.encoder.compute_dtype, name="cls_head")
        elif v in ("v1", "v2", "v3"):
            self.head = HeatmapHead(cfg, name="heatmap_head")
        elif v in ("p0", "p1"):
            self.head = PointerHead(cfg, name="pointer_head")
        else:
            raise ValueError(f"unknown hierarchical_version {v}")
        aux_objs = set(cfg.hl_include_objectives or [])
        self.aux_heads = (
            AuxObjectiveHeads(cfg, name="aux_heads")
            if aux_objs & {"head", "binary", "pairwise", "itm"} else None)
        if "mlm" in aux_objs:
            from .pretrainer import MLMHead
            self.aux_mlm_head = MLMHead(
                cfg.encoder.hidden_size, cfg.encoder.vocab_size,
                cfg.encoder.compute_dtype, name="aux_mlm_head")

    def encode(self, input_ids, attention_mask=None, token_type_ids=None,
               images=None, img_regional_features=None,
               deterministic: bool = True):
        """Returns (lang_seq, visn_seq_or_None, pooled).

        `img_regional_features` (precomputed ROI sidecars, (B, N, R, C))
        feed the VisualBERT encoder's regional-token path; the clip/LXRT
        encoder ignores them (in the reference too, only the mmf
        VisualBERT path consumes the maskrcnn sidecars,
        `visual_bert_mmf.py:920-934`)."""
        cfg = self.cfg
        if cfg.multimodal:
            if cfg.multimodal_model_type in ("naive", "naive_model"):
                from .naive_model import naive_encode_parts
                return naive_encode_parts(
                    cfg, self.encoder, input_ids, attention_mask,
                    token_type_ids, images, deterministic)
            kwargs = dict(images=images, deterministic=deterministic)
            if cfg.multimodal_model_type == "visualbert":
                kwargs["img_regional_features"] = img_regional_features
            return self.encoder(input_ids, attention_mask, token_type_ids,
                                **kwargs)
        seq, pooled = self.encoder(input_ids, attention_mask, token_type_ids,
                                   deterministic=deterministic)
        return seq, None, pooled

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 images=None, order_labels: Optional[jax.Array] = None,
                 img_regional_features=None, deterministic: bool = True):
        cfg = self.cfg
        seq, visn, pooled = self.encode(
            input_ids, attention_mask, token_type_ids, images,
            img_regional_features, deterministic)
        out = {"sequence_output": seq, "visual_output": visn,
               "pooled_output": pooled}
        v = cfg.hierarchical_version
        if v == "v0":
            out["logits"] = self.head(pooled, deterministic).astype(
                jnp.float32)
        else:
            reprs, present = gather_step_cls(
                seq, input_ids, cfg.cls_id, cfg.max_story_length)
            out["step_reprs"], out["present"] = reprs, present
            if v in ("v1", "v2", "v3"):
                out["heatmap"] = self.head(reprs, present, deterministic)
            else:
                out["pointer_logits"] = self.head(
                    reprs, present, order_labels, deterministic).astype(
                        jnp.float32)
            if self.aux_heads is not None:
                out.update(self.aux_heads(reprs, present, pooled,
                                          deterministic))
            if "mlm" in (cfg.hl_include_objectives or []):
                word_emb = self.get_variable(
                    "params", "encoder")["embeddings"]["word_embeddings"][
                        "embedding"]
                out["mlm_logits"] = self.aux_mlm_head(seq, word_emb)
        return out


def render_heatmap_targets(order_labels: jax.Array, n: int,
                           soft_value: float = 0.1) -> jax.Array:
    """Jittable batched `render_order_heatmap` (soft mode): immediate
    successor -> 1.0, later descendants -> soft_value
    (`trainers/train_utils.py:69-109`).

    `order_labels` is the dataset label (argsort of the scramble), which the
    reference passes to the renderer AS the chain sequence itself
    (`trainers/train.py:101`): node order_labels[t] precedes
    order_labels[t+1]. Decoded orders therefore compare to the label
    directly."""
    # pos[i] = chain time of node i  (inverse permutation of the label)
    pos = jnp.argsort(order_labels, axis=1)
    pi = pos[:, :, None]
    pj = pos[:, None, :]
    target = jnp.where(pj == pi + 1, 1.0,
                       jnp.where(pj > pi, soft_value, 0.0))
    eye = jnp.eye(n, dtype=bool)
    return jnp.where(eye[None], 0.0, target).astype(jnp.float32)
