"""Ordering heads: classification (v0), heatmap (v1-v3), pointer (p0/p1).

TPU-native re-designs of the reference's head zoo:
  * ClassificationHead — RobertaClassificationHead pattern (dense -> tanh ->
    dropout -> out_proj), used for pairwise v0 / head / pure_class
    (`/root/reference/models/visualbert/visual_bert_mmf.py:486-494`).
  * gather_step_cls — per-step CLS gather via `input_ids == cls_id`
    (`models/pointer_module.py:160-200`), vectorized to fixed story length.
  * HeatmapHead — reconstruction of the repo-missing `HeatMapOutput`
    (interface per SURVEY §2.7 / call sites `visual_bert_mmf.py:575-591`,
    `berson/modeling_bert.py:1227-1235`): N x N parent->child precedence
    logits trained against `render_order_heatmap` targets with BCE; v1/v2
    sigmoid outputs, v3 tanh (signed).
  * PointerHead — p0/p1 pointer decoders over step CLS representations
    (`models/pointer_module.py:32-373`): p1 = LSTM pointer net (lax.scan),
    p0 = single-layer causal decoder with cross-attention + index classifier.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .config import MultimodalConfig
from ..ops.attention import NEG_INF


def gather_step_cls(sequence_output: jax.Array, input_ids: jax.Array,
                    cls_id: int, n_steps: int) -> Tuple[jax.Array, jax.Array]:
    """Gather the hidden state at each step's CLS token.

    Steps are packed with their own CLS; position of step k's CLS is the
    k-th occurrence of cls_id (`pointer_module.py:160-200`). Returns
    (reprs (B, n_steps, H), present (B, n_steps) bool for stories shorter
    than n_steps)."""
    b, s = input_ids.shape
    is_cls = (input_ids == cls_id)
    # rank of each position among CLS tokens (1-based), 0 if not cls
    rank = jnp.cumsum(is_cls, axis=1) * is_cls
    # pos[k] = index of (k+1)-th CLS, default 0
    onehot = (rank[:, :, None] == jnp.arange(1, n_steps + 1)[None, None, :])
    pos = jnp.argmax(onehot, axis=1)  # (B, n_steps)
    present = jnp.any(onehot, axis=1)
    reprs = jnp.take_along_axis(
        sequence_output, pos[:, :, None], axis=1)
    return reprs, present


class ClassificationHead(nn.Module):
    """dense -> tanh -> dropout -> out_proj (RobertaClassificationHead)."""
    num_labels: int
    hidden_size: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features, deterministic: bool = True):
        x = nn.Dropout(self.dropout)(features, deterministic=deterministic)
        x = nn.tanh(nn.Dense(self.hidden_size, dtype=self.dtype,
                             name="dense")(x))
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.num_labels, dtype=self.dtype,
                        name="out_proj")(x)


PairwiseHead = ClassificationHead


class SimpleClassifier(nn.Module):
    """Dense -> gelu -> dropout -> Dense (`models/pointer_module.py:579`)."""
    hidden_size: int
    out_size: int
    dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return nn.Dense(self.out_size, dtype=self.dtype, name="fc2")(x)


class AuxObjectiveHeads(nn.Module):
    """Registry of `hl_include_objectives` auxiliary heads
    (`models/pointer_module.py:69-134,381-527`):
      head      per-step scalar scores -> CE vs true-first step (label[:,0])
      binary    per (i<j) pair, stacked scalar scores of the two step CLS
                reprs -> 2-way CE on which precedes
      itm       2-way classifier on pooled output vs swap targets (x0.1)
      mlm       masked-LM loss over language outputs (x0.05)
    mlm_wo_loss is a no-op; binary_cross_modal / cross_modal_dependence
    raise NotImplementedError in the reference and are likewise out of
    scope."""
    cfg: MultimodalConfig

    @nn.compact
    def __call__(self, step_reprs, present, pooled, deterministic=True):
        cfg = self.cfg
        objs = cfg.hl_include_objectives or []
        h = step_reprs.shape[-1]
        out = {}
        if "head" in objs:
            scores = SimpleClassifier(h, 1, dtype=step_reprs.dtype,
                                      name="hl_head_pred_layer")(
                step_reprs, deterministic)[..., 0]
            out["head_logits"] = jnp.where(present, scores, NEG_INF).astype(
                jnp.float32)
        if "binary" in objs or "pairwise" in objs:
            n = step_reprs.shape[1]
            iu, ju = np.triu_indices(n, k=1)  # static; loss derives the same
            scorer = SimpleClassifier(h, 1, dtype=step_reprs.dtype,
                                      name="hl_bin_pred_layer")
            s = scorer(step_reprs, deterministic)[..., 0]  # (B, N)
            # logits per pair = (score_j, score_i): class 1 <=> i precedes j
            out["bin_logits"] = jnp.stack(
                [s[:, ju], s[:, iu]], axis=-1).astype(jnp.float32)
        if "itm" in objs:
            out["itm_logits"] = nn.Dense(
                2, name="seq_relationship")(pooled).astype(jnp.float32)
        return out


class HeatmapHead(nn.Module):
    """N x N precedence heatmap over step CLS representations.

    Scores parent->child with a low-rank bilinear form over projected step
    vectors plus a pairwise MLP term; squashed to [0,1] (sigmoid) for
    v1/v2 or [-1,1] (tanh) for v3 — matching the decode-side range
    assertions (`trainers/train_utils.py:116-117,216-218`)."""
    cfg: MultimodalConfig

    @nn.compact
    def __call__(self, step_reprs: jax.Array, present: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        h = step_reprs.shape[-1]
        dtype = step_reprs.dtype
        parent = nn.Dense(h, dtype=dtype, name="parent_proj")(step_reprs)
        child = nn.Dense(h, dtype=dtype, name="child_proj")(step_reprs)
        parent = nn.tanh(parent)
        child = nn.tanh(child)
        logits = jnp.einsum("bih,bjh->bij", parent, child,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(h))
        # pairwise interaction term
        n = step_reprs.shape[1]
        pi = jnp.repeat(step_reprs, n, axis=1)           # (B, n*n, H)
        pj = jnp.tile(step_reprs, (1, n, 1))             # (B, n*n, H)
        inter = nn.Dense(h // 2, dtype=dtype, name="pair_mlp")(
            jnp.concatenate([pi, pj], axis=-1))
        inter = nn.gelu(inter)
        inter = nn.Dense(1, dtype=dtype, name="pair_out")(inter)
        logits = logits + inter.reshape(logits.shape).astype(jnp.float32)

        pair_valid = (present[:, :, None] & present[:, None, :])
        if cfg.hierarchical_version == "v3":
            out = jnp.tanh(logits)
        else:
            out = jax.nn.sigmoid(logits)
        return jnp.where(pair_valid, out, 0.0)

    @staticmethod
    def loss(heatmap: jax.Array, target: jax.Array,
             present: jax.Array) -> jax.Array:
        """BCE against render_order_heatmap targets (soft values allowed),
        masked to valid step pairs."""
        eps = 1e-6
        p = jnp.clip(jnp.abs(heatmap), eps, 1 - eps)
        bce = -(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
        pair_valid = (present[:, :, None] & present[:, None, :])
        bce = jnp.where(pair_valid, bce, 0.0)
        denom = jnp.maximum(pair_valid.sum(), 1)
        return bce.sum() / denom

    @staticmethod
    def pairwise_ranking_loss(heatmap: jax.Array, order_labels: jax.Array,
                              present: jax.Array,
                              margin: float = 0.1) -> jax.Array:
        """heatmap_pairwise_ranking aux: for true order pi, enforce
        hm[pi_t, pi_{t+1}] > hm[pi_{t+1}, pi_t] + margin (MarginRankingLoss
        pattern, `models/pointer_module.py:411-439`)."""
        b, n = order_labels.shape
        # The label IS the chain sequence (see render_heatmap_targets):
        # node order_labels[t] precedes order_labels[t+1].
        seq = order_labels
        src, dst = seq[:, :-1], seq[:, 1:]
        bidx = jnp.arange(b)[:, None]
        pos = heatmap[bidx, src, dst]
        neg = heatmap[bidx, dst, src]
        valid = (jnp.take_along_axis(present, src, 1)
                 & jnp.take_along_axis(present, dst, 1))
        loss = jnp.maximum(0.0, margin - (pos - neg))
        loss = jnp.where(valid, loss, 0.0)
        return loss.sum() / jnp.maximum(valid.sum(), 1)


class LSTMPointerDecoder(nn.Module):
    """p1: LSTM pointer network over step representations
    (`models/pointer_module.py:651-749`), unrolled with lax.scan and
    teacher forcing."""
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, step_reprs: jax.Array, present: jax.Array,
                 order_labels: Optional[jax.Array] = None):
        """Returns (B, T, N) pointer logits, teacher-forced when labels are
        given else greedy."""
        b, n, h = step_reprs.shape
        cell = nn.OptimizedLSTMCell(self.hidden_size, name="cell")
        w_q = nn.Dense(h, dtype=self.dtype, name="query_proj")
        mean_repr = jnp.where(present[..., None], step_reprs, 0.0).sum(1) / (
            jnp.maximum(present.sum(1, keepdims=True), 1))
        carry = cell.initialize_carry(jax.random.PRNGKey(0), (b, h))
        carry = jax.tree.map(lambda x: x.astype(self.dtype), carry)

        # The dataset label read as a sequence gives the node to point at
        # for each true time step (chain convention; see
        # render_heatmap_targets).
        true_seq = order_labels

        def step(state, t):
            carry, inp, pointed = state
            carry, out = cell(carry, inp)
            q = w_q(out)  # (B, h)
            logit = jnp.einsum("bh,bnh->bn", q, step_reprs) / jnp.sqrt(
                jnp.float32(h))
            logit = jnp.where(present & ~pointed, logit, NEG_INF)
            if true_seq is not None:
                nxt = true_seq[:, t]
            else:
                nxt = jnp.argmax(logit, axis=-1)
            pointed = pointed.at[jnp.arange(b), nxt].set(True)
            nxt_repr = step_reprs[jnp.arange(b), nxt]
            return (carry, nxt_repr, pointed), logit

        # n <= max_story_length is tiny and static: a python unroll keeps the
        # traced program flat (no scan-carry layout churn).
        pointed0 = jnp.zeros((b, n), bool)
        logits_list = []
        state = (carry, mean_repr, pointed0)
        for t in range(n):
            state, logit = step(state, t)
            logits_list.append(logit)
        return jnp.stack(logits_list, axis=1)  # (B, N, N)


class PointerHead(nn.Module):
    """p0/p1 pointer ordering head over gathered step CLS reprs
    (`models/pointer_module.py:32-373`). Produces (B, T, N) logits where
    row t scores which step sits at true position t; NLL loss vs labels."""
    cfg: MultimodalConfig

    @nn.compact
    def __call__(self, step_reprs, present, order_labels=None,
                 deterministic: bool = True):
        cfg = self.cfg
        h = step_reprs.shape[-1]
        if cfg.hierarchical_version == "p1":
            logits = LSTMPointerDecoder(h, dtype=step_reprs.dtype,
                                        name="lstm_pointer")(
                step_reprs, present, order_labels)
        else:  # p0: causal self-attn decoder + cross-attention + classifier
            b, n, _ = step_reprs.shape
            pos_emb = self.param(
                "pos_emb", nn.initializers.normal(0.02), (n, h))
            x = jnp.broadcast_to(pos_emb[None], (b, n, h)).astype(
                step_reprs.dtype)
            causal = jnp.tril(jnp.ones((n, n), bool))
            x = nn.MultiHeadDotProductAttention(
                num_heads=4, dtype=step_reprs.dtype, name="self_attn")(
                x, mask=jnp.broadcast_to(causal, (b, 1, n, n)))
            x = nn.LayerNorm(name="ln1")(x)
            # cross attention over step reprs
            q = nn.Dense(h, name="xq")(x)
            kk = nn.Dense(h, name="xk")(step_reprs)
            vv = nn.Dense(h, name="xv")(step_reprs)
            w = jnp.einsum("bth,bnh->btn", q, kk) / jnp.sqrt(jnp.float32(h))
            w = jnp.where(present[:, None, :], w, NEG_INF)
            x = x + jnp.einsum("btn,bnh->bth", jax.nn.softmax(w, -1), vv)
            x = nn.LayerNorm(name="ln2")(x)
            # index classifier: score each step for each position
            q2 = nn.Dense(h, name="index_q")(x)
            logits = jnp.einsum("bth,bnh->btn", q2, step_reprs) / jnp.sqrt(
                jnp.float32(h))
            logits = jnp.where(present[:, None, :], logits, NEG_INF)
        return logits

    @staticmethod
    def loss(logits: jax.Array, order_labels: jax.Array,
             present: jax.Array) -> jax.Array:
        """Pointer NLL: time t must select node order_labels[t] (the label
        is the chain sequence; see render_heatmap_targets)."""
        seq = order_labels
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, seq[:, :, None], axis=2)[..., 0]
        valid = jnp.take_along_axis(present, seq, axis=1)
        nll = jnp.where(valid, nll, 0.0)
        return nll.sum() / jnp.maximum(valid.sum(), 1)

    @staticmethod
    def decode(logits: jax.Array, present: jax.Array) -> jax.Array:
        """Greedy sequential decode with a no-repeat mask. Returns the chain
        sequence (seq[t] = node pointed at time t), directly comparable to
        the dataset order label."""
        b, n, _ = logits.shape
        pointed = jnp.zeros((b, n), bool)
        seq = jnp.zeros((b, n), jnp.int32)
        for t in range(n):
            # -1e12 strictly below any train-time NEG_INF mask so an
            # already-pointed step can never win an all-masked tie.
            row = jnp.where(present & ~pointed, logits[:, t], -1e12)
            pick = jnp.argmax(row, -1)
            pointed = pointed.at[jnp.arange(b), pick].set(True)
            seq = seq.at[:, t].set(pick)
        return seq
