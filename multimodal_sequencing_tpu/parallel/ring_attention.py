"""Ring attention: exact attention over a sequence sharded across chips.

Context parallelism for sequences that outgrow one chip's HBM (the
reference tops out at 300-token stories; this is pure growth path, like
`parallel/pipeline.py`). The sequence axis of Q/K/V shards over a mesh
axis; each device keeps its Q shard resident and the K/V shards rotate
around the ring with one nearest-neighbor `lax.ppermute` per step while
an online-softmax accumulator (running max / normalizer / context —
exactly the flash-attention recurrence, at shard granularity) merges the
partial attention of the local Q block against every K/V block. After
`ring_size` rotations every Q row has attended to the full sequence and
no device ever materialized more than (S_local x S_local) logits.

Per-rotation compute is a dense (S_local x S_local) block attention that
XLA fuses onto the MXU; at long S_local the Pallas flash kernel can
replace it (`ops/attention.py`), making the two compose: flash within a
shard, ring across shards. Backward falls out of autodiff through the
`fori_loop` + `ppermute` (reverse ppermute per step) — no hand-written
backward.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import MODEL_AXIS

NEG_INF = -1e9


def _ring_body(axis_name, ring_size, scale, q):
    """fori_loop body factory: one block-attention + K/V rotation."""
    perm = [(i, (i + 1) % ring_size) for i in range(ring_size)]

    def body(r, carry):
        k_r, v_r, mask_r, m, l, acc = carry
        s = jax.lax.dot_general(
            q, k_r, (((3,), (3,)), ((0, 1), (0, 1))),
            preferred_element_type=jnp.float32) * scale
        # mask_r: (B, S_block) keep-mask travelling WITH its K/V block
        s = jnp.where(mask_r[:, None, None, :] != 0, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_r.astype(jnp.float32),
            (((3,), (2,)), ((0, 1), (0, 1))))
        k_r = jax.lax.ppermute(k_r, axis_name, perm)
        v_r = jax.lax.ppermute(v_r, axis_name, perm)
        mask_r = jax.lax.ppermute(mask_r, axis_name, perm)
        return k_r, v_r, mask_r, m_new, l_new, acc_new

    return body


def ring_attention(q, k, v, mask=None, *, mesh, axis_name=MODEL_AXIS):
    """Exact multi-head attention with the sequence sharded over
    `axis_name`. q, k, v: (B, H, S, D) global-view arrays; mask: (B, S)
    key keep-mask. Returns (B, H, S, D) with the same output sharding.
    S must divide by the ring size."""
    from jax import shard_map

    ring_size = mesh.shape[axis_name]
    b, h, s, d = q.shape
    if s % ring_size:
        raise ValueError(f"seq {s} not divisible by ring size {ring_size}")
    if mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    scale = 1.0 / math.sqrt(d)

    def local(q_l, k_l, v_l, mask_l):
        # q_l etc: (B, H, S/ring, D); mask_l: (B, S/ring)
        qf = q_l.astype(jnp.float32)
        m0 = jnp.full(qf.shape[:3] + (1,), -jnp.inf, jnp.float32)
        l0 = jnp.zeros_like(m0)
        acc0 = jnp.zeros_like(qf)
        body = _ring_body(axis_name, ring_size, scale, qf)
        carry = (k_l, v_l, mask_l, m0, l0, acc0)
        _, _, _, m, l, acc = jax.lax.fori_loop(0, ring_size, body, carry)
        return (acc / jnp.maximum(l, 1e-30)).astype(q_l.dtype)

    seq = P(None, None, axis_name, None)
    return shard_map(
        local, mesh=mesh,
        in_specs=(seq, seq, seq, P(None, axis_name)),
        out_specs=seq, check_vma=False)(q, k, v, mask)
