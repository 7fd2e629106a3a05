"""Model configuration dataclasses.

One config family replaces the reference's per-model HF-config mutation
(~20 args copied onto the config object per model type,
`/root/reference/trainers/train.py:1587-1620,1700-1791`).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp


@dataclass
class EncoderConfig:
    """BERT/RoBERTa-compatible text encoder config (defaults: roberta-large,
    the reference's primary config per `scripts/*.sh`)."""
    vocab_size: int = 50265
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    pad_token_id: int = 1
    # RoBERTa position ids start at pad_token_id + 1 (HF convention).
    position_offset: int = 2
    initializer_range: float = 0.02
    # TPU-first knobs
    dtype: str = "bfloat16"          # activation/compute dtype
    remat: bool = False               # jax.checkpoint each layer
    use_pallas_attention: bool = True
    # tanh-approximate GELU (cheaper on the VPU than erf; HF parity needs
    # erf, so conversion-loaded models should keep False)
    gelu_approximate: bool = False
    # MLP activation implementation (ops/gelu.py): "logit_erf" (default)
    # = erf GELU through its logistic form, ONE exp, bf16 outputs
    # exhaustively 0-or-1-ulp equal to "erf" (~4.5x faster on the VPU);
    # "erf" = XLA's erf
    # lowering (bit-reference), "fast_erf" = A&S rational+exp erf with a
    # shared-exp custom backward (bf16 outputs exhaustively verified vs
    # "erf"; see ops/gelu.py docstring), "tanh" = HF gelu_new
    # approximation. gelu_approximate=True overrides to "tanh" for
    # backward compatibility.
    gelu_impl: str = "logit_erf"
    # Megatron-style sequence parallelism: between the TP matmul pairs,
    # shard layer-boundary activations (B, S, H) over the mesh model axis
    # along S (parallel/mesh.seq_shard). Only meaningful with
    # model_parallel_size > 1; a no-op otherwise.
    sequence_parallel: bool = False
    # "probs": dropout on the softmax attention probabilities — exact HF
    # semantics (reference BertSelfAttention), the default so finetuning
    # from converted checkpoints matches the reference's regularization.
    # "folded": skip prob dropout and rely on the output-projection
    # dropout — keeps attention fused (no S x S mask materialization);
    # measured ~12% faster train step on v5e at the flagship shape
    # (160.8 vs 143.7 stories/s/chip).
    attention_dropout_mode: str = "probs"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_attention_heads

    @property
    def resolved_gelu_impl(self) -> str:
        return "tanh" if self.gelu_approximate else self.gelu_impl

    @classmethod
    def tiny(cls, **kw):
        """Small config for tests."""
        base = dict(vocab_size=1000, hidden_size=64, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=128,
                    max_position_embeddings=160, dtype="float32")
        base.update(kw)
        return cls(**base)

    @classmethod
    def roberta_large(cls, **kw):
        return cls(**kw)

    @classmethod
    def roberta_base(cls, **kw):
        base = dict(hidden_size=768, num_hidden_layers=12,
                    num_attention_heads=12, intermediate_size=3072)
        base.update(kw)
        return cls(**base)

    @classmethod
    def bert_base(cls, **kw):
        base = dict(vocab_size=30522, hidden_size=768, num_hidden_layers=12,
                    num_attention_heads=12, intermediate_size=3072,
                    max_position_embeddings=512, type_vocab_size=2,
                    layer_norm_eps=1e-12, pad_token_id=0, position_offset=0)
        base.update(kw)
        return cls(**base)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str):
        return cls(**json.loads(s))


@dataclass
class MultimodalConfig:
    """Sequencing task + multimodal fusion config. Mirrors the semantic
    surface of the reference's VISUAL_CONFIG + args-on-config copies
    (`models/CLIP/src/param.py:243-279`, `trainers/train.py:1587-1620`)."""
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    max_story_length: int = 5
    min_story_length: int = 5
    max_seq_length: int = 300
    per_seq_max_length: int = 60
    cls_id: int = 0
    pad_id: int = 1
    mask_id: int = 50264
    mlm_ignore_index: int = -100

    # multimodal
    multimodal: bool = False
    multimodal_model_type: str = "clip"   # naive | visualbert | clip
    # VisualBERT mmf bypass mode (visual_bert_mmf.py:64,114-140): run the
    # full stack over text only, then one additional joint layer over
    # [text_out; visual tokens]. Config-only in the reference too (no CLI
    # flag sets it).
    bypass_transformer: bool = False
    vision_model: str = "resnet50"
    # box-head width of the FPN tower (reference --vision_feature_dim /
    # vision_feature_dim, multimodal_utils.py:81); None = tower default
    # (2048); detectron2-zoo checkpoints use 1024
    vision_feature_dim: Optional[int] = None
    # FPN bottleneck stride placement: None = tower default (True,
    # detectron2/Caffe-style stride on the 1x1 conv1 — required for zoo
    # weight parity). Set False to reload tower checkpoints trained under
    # the old torchvision-style default (stride on the 3x3 conv2): the
    # flip changes forward semantics without changing parameter shapes.
    vision_stride_in_1x1: Optional[bool] = None
    clip_model_name: str = "RN50"         # RN50 | ViT-B/32
    visual_feat_dim: int = 2048           # RN50 grid channels
    visual_pos_dim: int = 4
    use_positional_embedding: bool = True
    use_token_type_embedding: bool = True
    freeze_vision_model: bool = False
    multimodal_text_part: bool = False
    multimodal_img_part: bool = False
    multimodal_fusion_method: str = "sum"  # sum | mul | text_only | img_only
    include_full_img_features: bool = True
    num_img_regional_features: Optional[int] = None
    image_size: Tuple[int, int] = (224, 224)
    patch_grid: int = 7                    # RN50 224/32 grid
    # Caffe-style pixel means (BGR order) the detectron2_* pipeline
    # subtracts (reference Detectron2ImageTransform / cfg.MODEL.
    # PIXEL_MEAN). Recorded here so checkpoint config sidecars carry the
    # preprocessing contract of converted zoo weights; the device uint8
    # tail bakes the zoo default, so non-default means require the host
    # float pipeline (--host_image_preprocess).
    detectron2_pixel_mean: Tuple[float, float, float] = (
        103.530, 116.280, 123.675)

    # heads / objectives
    hierarchical_version: str = "v0"      # v0 | v1 | v2 | v3 | p0 | p1
    hl_include_objectives: List[str] = field(default_factory=list)
    heatmap_decode_method: str = "naive_v2_sum"
    heatmap_decode_beam_size: int = 2
    # batched on-device decode in SortEvaluator (`ops/order_decode`): exact
    # n! argmax for the naive family, vectorized Kahn for topological; the
    # host decoders remain the parity oracle
    device_decode: bool = False
    num_labels: int = 2
    wrapper_model_type: Optional[str] = None   # None | "berson"
    wrapper_model_with_heatmap: bool = False

    # pretraining
    multimodal_pretrain_objectives: List[str] = field(default_factory=list)
    mlm_probability: float = 0.15

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, s: str):
        d = json.loads(s)
        d["encoder"] = EncoderConfig(**d["encoder"])
        d["image_size"] = tuple(d["image_size"])
        return cls(**d)
