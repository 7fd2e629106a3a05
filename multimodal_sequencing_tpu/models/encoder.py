"""BERT/RoBERTa-compatible text encoder in Flax.

TPU-native replacement for the reference's HF `AutoModel` text towers
(`/root/reference/trainers/train.py:1970-1996`): same computation graph
(learned word/position/type embeddings -> post-LN transformer blocks ->
tanh pooler), bfloat16 activations, fused Pallas attention on TPU, optional
per-layer rematerialization. `token_type_ids` carry the *step index* (the
packing convention, SURVEY §2.6), so `type_vocab_size` is sized to
`max_story_length` — the analogue of `--replace_token_type_embeddings`
(`train.py:1976-1996`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import EncoderConfig
from ..ops.attention import multihead_attention, NEG_INF


import functools
import math as _math


def _xla_probs_dropout_attention(q, k, v, mask, key, dropout_p):
    """Reference semantics: softmax -> dropout(probs) -> @ v (HF
    BertSelfAttention), under PLAIN autodiff.

    Every cleverer backward was measured a full-model LOSS at the
    flagship shape (B=8 H=16 S=320, v5e, scripts/bench_variants.py):
      plain AD            62.0 ms/step   <- this path
      jax.checkpoint      64.0           (recomputed QK^T costs more
                                          than the residual traffic)
      custom VJP saving bf16 probs + regenerating the rbg keep mask
                          70.3           (bwd mask regen + casts lose
                                          to XLA's own residual plan)
    XLA fuses the softmax/dropout pipeline into the surrounding
    projections better than any hand-written schedule here; synthetic
    24-layer attention-chain microbenches that favored remat do NOT
    transfer to the real model. The 1/keep rescale is deferred onto the
    (S, D) context instead of the (S, S) probs (same value, S x smaller
    tensor)."""
    d = q.shape[-1]
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32
                        ) * (1.0 / _math.sqrt(d))
    logits = logits + jnp.where(mask[:, None, None, :].astype(bool),
                                0.0, NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    keep = jax.random.bernoulli(key, 1.0 - dropout_p, probs.shape)
    ctx = jnp.einsum("bhst,bhtd->bhsd",
                     jnp.where(keep, probs, jnp.zeros((), q.dtype)), v,
                     preferred_element_type=jnp.float32)
    return (ctx / (1.0 - dropout_p)).astype(q.dtype)


# Above this sequence length the plain-AD S x S f32 residuals are a
# memory hazard (24 layers x B*H*S^2 f32), so the unaligned-length
# fallback switches to rematerialization; the flash kernel takes
# 128-multiples >= 512 before this matters on the product shapes.
_PROBS_REMAT_MIN_SEQ = 1024
_xla_probs_dropout_attention_remat = jax.checkpoint(
    _xla_probs_dropout_attention, static_argnums=(5,))


class SelfAttention(nn.Module):
    """Multi-head self attention.

    Two training-time dropout modes (cfg.attention_dropout_mode):
    "probs" (default) applies dropout to the softmax attention
    probabilities exactly like the reference's BertSelfAttention —
    faithful semantics for finetuning converted HF checkpoints; "folded"
    skips prob dropout (regularization comes from the output-projection
    dropout alone), keeping attention fused with no S x S mask
    materialization — a documented perf option. Eval/deterministic paths
    are identical in both modes."""
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, mask, deterministic: bool = True):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        dense = lambda name: nn.Dense(cfg.hidden_size, dtype=dtype,
                                      name=name)
        q = dense("query")(hidden)
        k = dense("key")(hidden)
        v = dense("value")(hidden)
        b, s, _ = q.shape
        h, d = cfg.num_attention_heads, cfg.head_dim
        split = lambda x: x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        prob_dropout = (not deterministic
                        and cfg.attention_dropout_mode == "probs"
                        and cfg.attention_probs_dropout_prob > 0.0)
        if prob_dropout:
            from ..ops.attention import flash_eligible
            if cfg.use_pallas_attention and flash_eligible(s, training=True):
                # 128-multiples >= 512: probs dropout fused INTO the
                # flash kernel (hw-PRNG keep bits, regenerated in the
                # Pallas backward) — same semantics, no S x S buffer.
                # Unaligned lengths (the S=320 text flagship, the
                # 566-token multimodal joint stream) stay on the XLA
                # path below: the whole-row unpadded kernel was
                # measured a full-model LOSS at both shapes
                # (flash_eligible docstring, scripts/bench_variants.py).
                ctx = multihead_attention(
                    split(q), split(k), split(v), mask=mask,
                    dropout_p=cfg.attention_probs_dropout_prob,
                    dropout_rng=self.make_rng("dropout"))
            else:
                # short/unaligned sequences: XLA probs dropout, plain AD
                # (measured fastest — see _xla_probs_dropout_attention);
                # remat above _PROBS_REMAT_MIN_SEQ to bound the S x S
                # residual memory
                attn_fn = (_xla_probs_dropout_attention
                           if s < _PROBS_REMAT_MIN_SEQ
                           else _xla_probs_dropout_attention_remat)
                ctx = attn_fn(
                    split(q), split(k), split(v), mask,
                    self.make_rng("dropout"),
                    cfg.attention_probs_dropout_prob)
        else:
            ctx = multihead_attention(
                split(q), split(k), split(v), mask=mask,
                force_reference=not cfg.use_pallas_attention)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        out = nn.Dense(cfg.hidden_size, dtype=dtype, name="out")(ctx)
        out = nn.Dropout(cfg.hidden_dropout_prob)(
            out, deterministic=deterministic)
        return out


class TransformerLayer(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, hidden, mask, deterministic: bool = True):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        seq_par = cfg.sequence_parallel
        if seq_par:
            from ..parallel.mesh import seq_shard
        attn = SelfAttention(cfg, name="attention")(
            hidden, mask, deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                              name="attention_ln")(hidden + attn)
        if seq_par:
            # LN/residual region computes on S/model_size tokens per device
            hidden = seq_shard(hidden)
        mlp = nn.Dense(cfg.intermediate_size, dtype=dtype,
                       name="intermediate")(hidden)
        from ..ops.gelu import gelu as gelu_op
        mlp = gelu_op(mlp, impl=cfg.resolved_gelu_impl)
        mlp = nn.Dense(cfg.hidden_size, dtype=dtype, name="output")(mlp)
        mlp = nn.Dropout(cfg.hidden_dropout_prob)(
            mlp, deterministic=deterministic)
        hidden = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                              name="output_ln")(hidden + mlp)
        if seq_par:
            hidden = seq_shard(hidden)
        return hidden


class Embeddings(nn.Module):
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids, token_type_ids=None, position_ids=None,
                 inputs_embeds=None, deterministic: bool = True):
        cfg = self.cfg
        dtype = cfg.compute_dtype
        if inputs_embeds is None:
            inputs_embeds = nn.Embed(
                cfg.vocab_size, cfg.hidden_size, dtype=dtype,
                name="word_embeddings")(input_ids)
        s = inputs_embeds.shape[1]
        if position_ids is None:
            # RoBERTa-style: positions offset past the pad id.
            position_ids = jnp.arange(s)[None, :] + cfg.position_offset
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       dtype=dtype, name="position_embeddings")(position_ids)
        x = inputs_embeds + pos
        if cfg.type_vocab_size > 0:
            if token_type_ids is None:
                token_type_ids = jnp.zeros(
                    inputs_embeds.shape[:2], jnp.int32)
            token_type_ids = jnp.minimum(token_type_ids,
                                         cfg.type_vocab_size - 1)
            x = x + nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                             dtype=dtype, name="token_type_embeddings")(
                                 token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                         name="ln")(x)
        return nn.Dropout(cfg.hidden_dropout_prob)(
            x, deterministic=deterministic)


def attention_bias_from_mask(attention_mask: jax.Array,
                             dtype=jnp.float32) -> jax.Array:
    """(B, S) {0,1} mask -> (B, 1, 1->S, S) additive bias."""
    bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32))
    return (bias * NEG_INF).astype(dtype)


class TextEncoder(nn.Module):
    """Embeddings + N post-LN layers + pooler; returns
    (sequence_output, pooled_output)."""
    cfg: EncoderConfig

    @nn.compact
    def __call__(self, input_ids=None, attention_mask=None,
                 token_type_ids=None, position_ids=None, inputs_embeds=None,
                 deterministic: bool = True, with_pool: bool = True):
        cfg = self.cfg
        x = Embeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, position_ids, inputs_embeds,
            deterministic)
        if attention_mask is None:
            ref = input_ids if input_ids is not None else x[..., 0]
            attention_mask = jnp.ones(ref.shape[:2], jnp.int32)

        layer_cls = TransformerLayer
        if cfg.remat:
            layer_cls = nn.remat(TransformerLayer, static_argnums=(3,))
        for i in range(cfg.num_hidden_layers):
            x = layer_cls(cfg, name=f"layer_{i}")(x, attention_mask,
                                                  deterministic)

        pooled = None
        if with_pool:
            pooled = nn.tanh(nn.Dense(cfg.hidden_size,
                                      dtype=cfg.compute_dtype,
                                      name="pooler")(x[:, 0]))
        return x, pooled
