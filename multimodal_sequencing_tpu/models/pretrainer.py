"""Sequencing pretrainer: MLM + sequentiality objective heads.

TPU-native rebuild of `LXRTPretraining`
(`/root/reference/models/CLIP/src/lxrt/modeling.py:1601-2470`). One
objective runs per batch (chosen on host, see `train/objectives.py`); each
objective is a separate static jit specialization. Losses mirrored:
  * MLM over language positions (tied output embedding), CE with
    ignore_index (`modeling.py:2426-2436`)
  * binary classification heads on the pooled output for
    image_swapping / image_sequence_predictions /
    whole_image_sequence_swapping / patch_based_image_swapping /
    multimodal_swapping / *_nsp (`modeling.py:1917-1960, 2320`)
  * margin ranking on a scalar head between (i,j) and (i,k) subsequences
    (`modeling.py:2354-2366`)
  * triplet time-contrastive over step CLS outputs (`modeling.py:2368-2414`)
  * patch-MRM: masked patch outputs matched to shuffled pre-mask features
    via a bilinear MLP, CE over candidates, scaled 0.2
    (`modeling.py:2320-2352`)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import MultimodalConfig
from .clip_visual import CLIPVisionConfig
from .encoder import TextEncoder
from .multimodal_encoder import MultimodalEncoder

BINARY_OBJECTIVES = (
    "image_swapping", "image_sequence_predictions",
    "whole_image_sequence_swapping", "patch_based_image_swapping",
    "patch_based_image_sequence_predictions",
    "multimodal_swapping", "swapping_based_nsp", "sequence_based_nsp",
)


class MLMHead(nn.Module):
    """Transform + tied-embedding decoder (BertLMPredictionHead)."""
    hidden_size: int
    vocab_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, word_embedding: jax.Array):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="transform")(
            hidden)
        x = nn.gelu(x, approximate=False)
        x = nn.LayerNorm(epsilon=1e-12, name="ln")(x)
        logits = jnp.einsum("blh,vh->blv", x,
                            word_embedding.astype(x.dtype))
        bias = self.param("bias", nn.initializers.zeros, (self.vocab_size,))
        return (logits + bias).astype(jnp.float32)


class SequencingPretrainer(nn.Module):
    cfg: MultimodalConfig
    vision_cfg: Optional[CLIPVisionConfig] = None

    def setup(self):
        cfg = self.cfg
        h = cfg.encoder.hidden_size
        if cfg.multimodal:
            # encoder dispatch per multimodal_model_type: the reference
            # builds pretraining models for naive/visualbert/clip
            # (`run_pretraining.py:1258,1359,1448`;
            # `VisualBERTForPretraining`, visual_bert_mmf.py:190)
            mt = cfg.multimodal_model_type
            if mt == "visualbert":
                from .visualbert import VisualBERTEncoder
                self.encoder = VisualBERTEncoder(cfg, name="encoder")
            elif mt == "naive":
                from .naive_model import NaiveMultimodalModel
                self.encoder = NaiveMultimodalModel(
                    cfg, vision_name=cfg.vision_model, name="encoder")
            else:
                self.encoder = MultimodalEncoder(cfg, self.vision_cfg,
                                                 name="encoder")
        else:
            self.encoder = TextEncoder(cfg.encoder, name="encoder")
        self.mlm_head = MLMHead(h, cfg.encoder.vocab_size,
                                cfg.encoder.compute_dtype, name="mlm_head")
        # no ITM head: the reference's `task_matched` loss
        # (`lxrt/modeling.py:2434-2441`) is inactive in its sequencing
        # pretraining path (no `matched_label` is ever fed), so a head
        # would be a dead parameter that only perturbs checkpoint shapes
        self.objective_mlps = {
            name: nn.Dense(2, name=f"{name}_mlp")
            for name in BINARY_OBJECTIVES}
        self.margin_loss_mlp = nn.Dense(1, name="margin_loss_mlp")
        self.time_contrastive_mlp = nn.Dense(h, name="time_contrastive_mlp")
        self.mrm_head = nn.Sequential([
            nn.Dense(h, name="mrm_dense"), nn.gelu,
            nn.LayerNorm(epsilon=1e-12, name="mrm_ln"),
            nn.Dense(1, name="mrm_out")])

    def _word_embedding(self):
        # tied decoder weights: encoder/embeddings/word_embeddings/embedding
        return self.get_variable(
            "params", "encoder")["embeddings"]["word_embeddings"][
                "embedding"]

    def _encode(self, batch, deterministic, patch_perm=None, mask_idx=None,
                patch_src=None):
        """Encode with optional folded-stream patch surgery. Returns
        (lang_out, visn_out, pooled, mrm_gt). `patch_perm` permutes the
        folded visual stream within a sample; with `patch_src` (a (B, S)
        sample-index map) the gather is cross-sample:
        out[b, t] = visn[patch_src[b, t], patch_perm[b, t]]."""
        cfg = self.cfg
        ids = batch["input_ids"]
        attn = batch.get("attention_mask")
        types = batch.get("token_type_ids")
        images = batch.get("images")
        wants_surgery = patch_perm is not None or mask_idx is not None
        if wants_surgery and (not cfg.multimodal
                              or cfg.multimodal_text_part
                              or images is None):
            # patch objectives corrupt the folded visual stream; with no
            # visual stream the planner's 'corrupted' labels would train
            # the head on noise — fail loudly, never silently skip
            raise ValueError(
                "patch-based pretraining objectives need the folded CLIP "
                "visual stream (multimodal clip config with images; "
                "multimodal_text_part off)")
        if not cfg.multimodal:
            seq, pooled = self.encoder(ids, attn, types,
                                       deterministic=deterministic)
            return seq, None, pooled, None

        mt = cfg.multimodal_model_type
        if mt in ("visualbert", "naive"):
            # per-step visual tokens, no folded patch stream: patch-based
            # surgery cannot apply (the reference's patch objectives are
            # clip-only by shape; run_pretraining validates this upfront)
            if patch_perm is not None or mask_idx is not None:
                raise ValueError(
                    f"patch-based pretraining objectives need the folded "
                    f"CLIP visual stream; model type {mt} has per-step "
                    "visual tokens")
            if mt == "visualbert":
                lang_out, visn_out, pooled = self.encoder(
                    ids, attn, types, images=images,
                    deterministic=deterministic)
                return lang_out, visn_out, pooled, None
            from .naive_model import naive_encode_parts
            lang, visn, pooled = naive_encode_parts(
                cfg, self.encoder, ids, attn, types, images,
                deterministic)
            return lang, visn, pooled, None

        lang, attn2 = self.encoder.embed_language(ids, attn, types,
                                                  deterministic)
        visn = None
        mrm_gt = None
        if images is not None and not cfg.multimodal_text_part:
            visn = self.encoder.encode_visual(images, deterministic)
            if patch_perm is not None:
                if patch_src is not None:
                    visn = visn[patch_src.astype(jnp.int32),
                                patch_perm.astype(jnp.int32)]
                else:
                    visn = jnp.take_along_axis(
                        visn, patch_perm[:, :, None].astype(jnp.int32),
                        axis=1)
            if mask_idx is not None:
                b = visn.shape[0]
                bidx = jnp.arange(b)[:, None]
                mrm_gt = visn[bidx, mask_idx]  # (B, T, H) pre-mask features
                visn = visn.at[bidx, mask_idx].set(0.0)
        lang_out, visn_out, pooled = self.encoder.joint_encode(
            lang, visn, attn2, deterministic)
        return lang_out, visn_out, pooled, mrm_gt

    def __call__(self, batch: Dict, objective: Optional[str] = None,
                 aux: Optional[Dict] = None, deterministic: bool = True,
                 use_mlm: bool = True):
        cfg = self.cfg
        aux = aux or {}
        losses: Dict[str, jax.Array] = {}

        lang_out, visn_out, pooled, mrm_gt = self._encode(
            batch, deterministic,
            patch_perm=aux.get("patch_perm"),
            mask_idx=aux.get("mask_idx"),
            patch_src=aux.get("patch_src"))

        total = 0.0
        # --- objective losses ------------------------------------------------
        if objective in BINARY_OBJECTIVES:
            logits = self.objective_mlps[objective](pooled)
            labels = aux["objective_labels"].astype(jnp.int32)
            ce = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, -1), labels[:, None], 1)[:, 0]
            losses[objective] = ce.mean()
            total = total + losses[objective]

        elif objective in ("margin_loss", "multimodal_margin_loss"):
            logit = self.margin_loss_mlp(pooled)[:, 0]
            half = logit.shape[0] // 2
            x1, x2 = logit[:half], logit[half:]
            target = aux["margin_target"].astype(jnp.float32)
            # MarginRankingLoss(margin=1): max(0, -y (x1 - x2) + 1)
            losses[objective] = jnp.maximum(
                0.0, -target * (x1 - x2) + 1.0).mean()
            total = total + losses[objective]

        elif objective == "time_contrastive":
            # gather each step's CLS output
            ids = batch["input_ids"]
            is_cls = ids == cfg.cls_id
            rank = jnp.cumsum(is_cls, 1) * is_cls
            n = cfg.max_story_length
            onehot = rank[:, :, None] == jnp.arange(1, n + 1)[None, None]
            pos = jnp.argmax(onehot, axis=1)  # (B, N)
            b = ids.shape[0]
            bidx = jnp.arange(b)
            step_cls = lang_out[bidx[:, None], pos]  # (B, N, H)
            a = step_cls[bidx, aux["anchor_idx"]]
            p = step_cls[bidx, aux["positive_idx"]]
            g = step_cls[bidx, aux["negative_idx"]]
            d_ap = jnp.linalg.norm(a - p, axis=-1)
            d_an = jnp.linalg.norm(a - g, axis=-1)
            losses[objective] = jnp.maximum(0.0, d_ap - d_an + 1.0).mean()
            total = total + losses[objective]

        elif objective == "patch_based_mrm_classification":
            assert mrm_gt is not None and visn_out is not None
            mask_idx = aux["mask_idx"]
            perm = aux["shuffle_perm"].astype(jnp.int32)  # (B, T)
            b, T = mask_idx.shape
            bidx = jnp.arange(b)[:, None]
            outs = visn_out[bidx, mask_idx]       # (B, T, H) masked outputs
            gt = jnp.take_along_axis(mrm_gt, perm[:, :, None], axis=1)
            # scores[b, j, k] = head([outs_j ; gt_k])
            oj = jnp.repeat(outs[:, :, None, :], T, axis=2)
            gk = jnp.repeat(gt[:, None, :, :], T, axis=1)
            scores = self.mrm_head(
                jnp.concatenate([oj, gk], axis=-1))[..., 0]  # (B, T, T)
            labels = jnp.argsort(perm, axis=1)  # position of j in shuffle
            ce = -jnp.take_along_axis(
                jax.nn.log_softmax(scores, -1), labels[:, :, None],
                2)[..., 0]
            losses[objective] = 0.2 * ce.mean()
            total = total + losses[objective]

        # --- MLM -------------------------------------------------------------
        if use_mlm and "mlm_labels" in batch and not cfg.multimodal_img_part:
            word_emb = self._word_embedding()
            logits = self.mlm_head(lang_out, word_emb)
            labels = batch["mlm_labels"].astype(jnp.int32)
            valid = labels != cfg.mlm_ignore_index
            safe = jnp.where(valid, labels, 0)
            ce = -jnp.take_along_axis(
                jax.nn.log_softmax(logits, -1), safe[:, :, None], 2)[..., 0]
            ce = jnp.where(valid, ce, 0.0)
            losses["mlm"] = ce.sum() / jnp.maximum(valid.sum(), 1)
            total = total + losses["mlm"]

        losses["loss"] = total
        return losses
