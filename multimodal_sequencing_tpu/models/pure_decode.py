"""pure_decode: encoder-decoder over index tokens with beam-5 generate.

The reference builds an HF `EncoderDecoderModel` for this task: the full
text encoder plus a 1-layer BERT decoder whose vocabulary is the story
index tokens, `max_story_length + 2` ids, with hidden size / head count
copied from the encoder (`/root/reference/trainers/train.py:1955-1968`).
Eval beam-generates an order with `generate(max_length=len(seqs),
num_beams=5, no_repeat_ngram_size=2, decoder_start_token_id=pad)`
(`/root/reference/trainers/eval.py:947-1014`).

This is that model as one jit-able tensor program: the beam is a
(B x W) batch axis, the bigram no-repeat ban is a static mask update, and
the whole decode runs on device (vs the reference's per-story host loop).

Documented deviations from the reference:
 * Teacher forcing is SHIFTED (decoder input = [START] + labels[:-1]).
   The reference feeds `decoder_input_ids=labels` with an unshifted MLM
   loss (`train.py:537-543`), which lets the causal decoder copy its own
   input token and makes generate degenerate; the shifted convention is
   the one `generate` assumes.
 * START is the dedicated id N. The reference starts from the decoder
   pad id 0, which collides with index token 0.
 * `generate` returns the N real index tokens; the reference's
   `max_length=N` budget counts the start token, so it emits only N-1
   real tokens and returns the start id as the first "prediction".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .config import MultimodalConfig
from .encoder import TextEncoder

NEG_INF = -1e9


class EncoderIndexDecoder(nn.Module):
    """Text encoder + 1-layer causal index-token decoder with
    cross-attention over the encoder sequence output."""
    cfg: MultimodalConfig

    @property
    def index_vocab(self) -> int:
        # N index tokens + START + PAD (reference: vocab_size = N + 2,
        # `train.py:1963`)
        return self.cfg.max_story_length + 2

    @property
    def start_id(self) -> int:
        return self.cfg.max_story_length

    def setup(self):
        ecfg = self.cfg.encoder
        h = ecfg.hidden_size
        n = self.cfg.max_story_length
        self.encoder = TextEncoder(ecfg, name="encoder")
        self.tok_emb = nn.Embed(self.index_vocab, h,
                                dtype=ecfg.compute_dtype, name="tok_emb")
        self.pos_emb = self.param(
            "pos_emb", nn.initializers.normal(0.02), (n + 1, h))
        heads = ecfg.num_attention_heads
        # single-arg MultiHeadDotProductAttention == self-attention (the
        # flax SelfAttention alias is deprecated; params are identical)
        self.self_attn = nn.MultiHeadDotProductAttention(
            num_heads=heads, dtype=ecfg.compute_dtype, name="self_attn")
        self.ln1 = nn.LayerNorm(name="ln1")
        self.cross_attn = nn.MultiHeadDotProductAttention(
            num_heads=heads, dtype=ecfg.compute_dtype, name="cross_attn")
        self.ln2 = nn.LayerNorm(name="ln2")
        self.ffn_in = nn.Dense(4 * h, dtype=ecfg.compute_dtype,
                               name="ffn_in")
        self.ffn_out = nn.Dense(h, dtype=ecfg.compute_dtype, name="ffn_out")
        self.ln3 = nn.LayerNorm(name="ln3")
        self.lm_head = nn.Dense(self.index_vocab, name="lm_head")

    def _decoder_logits(self, dec_tokens: jax.Array, enc_seq: jax.Array,
                        enc_mask: jax.Array) -> jax.Array:
        """dec_tokens (B, T) -> (B, T, V) float32 logits."""
        b, t = dec_tokens.shape
        x = self.tok_emb(dec_tokens) + self.pos_emb[None, :t].astype(
            self.cfg.encoder.compute_dtype)
        causal = jnp.broadcast_to(jnp.tril(jnp.ones((t, t), bool)),
                                  (b, 1, t, t))
        x = self.ln1(x + self.self_attn(x, mask=causal))
        xmask = jnp.broadcast_to(enc_mask.astype(bool)[:, None, None, :],
                                 (b, 1, t, enc_seq.shape[1]))
        x = self.ln2(x + self.cross_attn(x, enc_seq, mask=xmask))
        x = self.ln3(x + self.ffn_out(nn.gelu(self.ffn_in(x))))
        return self.lm_head(x).astype(jnp.float32)

    def __call__(self, input_ids, attention_mask=None, token_type_ids=None,
                 images=None, order_labels: Optional[jax.Array] = None,
                 deterministic: bool = True):
        if images is not None:
            # the reference raises too (`eval.py:949-950`)
            raise NotImplementedError(
                "pure_decode is text-only (multimodal not implemented in "
                "the reference either)")
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.int32)
        enc_seq, pooled = self.encoder(input_ids, attention_mask,
                                       token_type_ids,
                                       deterministic=deterministic)
        out = {"sequence_output": enc_seq, "pooled_output": pooled}
        n = self.cfg.max_story_length
        b = input_ids.shape[0]
        if order_labels is not None:
            labels = order_labels.astype(jnp.int32)
            dec_in = jnp.concatenate(
                [jnp.full((b, 1), self.start_id, jnp.int32),
                 labels[:, : n - 1]], axis=1)
        else:  # init / shape-probe path: params must still be created
            dec_in = jnp.full((b, n), self.start_id, jnp.int32)
        out["dec_logits"] = self._decoder_logits(dec_in, enc_seq,
                                                 attention_mask)
        return out

    def prefix_logits(self, input_ids, attention_mask, token_type_ids,
                      dec_tokens):
        """Last-position decoder logits for an explicit decoder prefix —
        the per-candidate scoring primitive (exposed so tests can drive an
        independent reference beam over the same network)."""
        enc_seq, _ = self.encoder(input_ids, attention_mask, token_type_ids,
                                  deterministic=True)
        return self._decoder_logits(dec_tokens, enc_seq,
                                    attention_mask)[:, -1]

    def generate(self, input_ids, attention_mask=None, token_type_ids=None,
                 num_beams: int = 5, no_repeat_ngram_size: int = 2):
        """HF-generate-equivalent beam search (beam 5, bigram no-repeat,
        no EOS so all beams run the full N steps; with equal lengths the
        default length penalty never reorders). Returns (B, N) int32
        generated index tokens (see module docstring for the start-token
        accounting deviation)."""
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.int32)
        enc_seq, _ = self.encoder(input_ids, attention_mask, token_type_ids,
                                  deterministic=True)
        b, s = input_ids.shape
        n, v, w = self.cfg.max_story_length, self.index_vocab, num_beams

        # beam axis folded into batch for the decoder forwards
        enc_rep = jnp.repeat(enc_seq, w, axis=0)        # (B*W, S, H)
        mask_rep = jnp.repeat(attention_mask, w, axis=0)
        tokens = jnp.full((b, w, n + 1), self.start_id, jnp.int32)
        scores = jnp.tile(
            jnp.concatenate([jnp.zeros((1,)),
                             jnp.full((w - 1,), NEG_INF)])[None], (b, 1))

        for t in range(n):  # N <= 5: static unroll keeps the program flat
            prefix = tokens[:, :, : t + 1].reshape(b * w, t + 1)
            logits = self._decoder_logits(prefix, enc_rep,
                                          mask_rep)[:, -1]   # (B*W, V)
            logp = jax.nn.log_softmax(logits, axis=-1)
            if no_repeat_ngram_size == 2 and t >= 1:
                # ban x where (prefix[t], x) already occurred as a bigram
                last = prefix[:, t]
                for j in range(t):
                    hit = (prefix[:, j] == last)[:, None]
                    ban = jax.nn.one_hot(prefix[:, j + 1], v, dtype=bool)
                    logp = jnp.where(hit & ban, NEG_INF, logp)
            total = scores.reshape(b * w, 1) + logp
            top, idx = jax.lax.top_k(total.reshape(b, w * v), w)
            parent, tok = idx // v, idx % v
            tokens = jnp.take_along_axis(tokens, parent[:, :, None], axis=1)
            tokens = tokens.at[:, :, t + 1].set(tok)
            scores = top
        return tokens[:, 0, 1:]  # best beam, drop START
