"""Fused multi-head attention for TPU.

The encoder hot op. Two paths with identical semantics:
  * `attention_reference` — XLA's fused attention from an einsum/softmax
    formulation; fastest at the product's short sequences (chained fwd
    measurements on v5e, B=2 H=16 D=64: S=2048 XLA 3.12ms vs Pallas
    3.28ms).
  * `flash_attention` — Pallas online-softmax kernel taking the raw (B, S)
    key mask (NOT an S x S bias: streaming a materialized bias costs S^2
    HBM traffic, which is what makes naive flash kernels lose). Wins past
    the ~4k crossover (S=4096: Pallas 8.15ms vs XLA 8.68ms; bf16 max
    deviation vs reference 2e-3) and is the building block for future
    context-parallel sharding.

Dispatch: XLA below PALLAS_MIN_SEQ, Pallas above (block-aligned shapes).
Replaces the reference's torch softmax attention
(`/root/reference/models/CLIP/src/lxrt/modeling.py` BertAttention et al.).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU-capable builds; guard for CPU wheels
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

NEG_INF = -1e9  # matches the reference's -10000-style additive masks


def attention_reference(q, k, v, mask: Optional[jax.Array] = None,
                        bias: Optional[jax.Array] = None):
    """XLA path. `mask`: (B, S) keep-mask over keys; `bias`: additive,
    broadcastable to (B, 1, S, S) (legacy callers)."""
    dtype = q.dtype
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = logits + jnp.where(
            mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(dtype), v)


def _flash_kernel(mask_ref, q_ref, k_ref, v_ref, o_ref,
                  *, block_k: int, seq_len: int, scale: float):
    """One (batch, head, q-block) program: online softmax over K/V blocks.
    mask_ref is the (1, S) key keep-mask for this batch row."""
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape
    num_kb = seq_len // block_k

    def body(kb, carry):
        acc, m_i, l_i = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (block_q, block_k)
        keep = mask_ref[0, 0, pl.ds(kb * block_k, block_k)] != 0
        s = jnp.where(keep[None, :], s, NEG_INF)
        m_new = jnp.maximum(m_i, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_i - m_new)
        l_new = alpha * l_i + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, _, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l_i, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(q, k, v, mask=None, block_q: int = 512,
                    block_k: int = 512):
    """Pallas flash attention. q,k,v: (B, H, S, D); mask: (B, S) key
    keep-mask ({0,1}). S must divide by the block sizes (caller pads;
    padded keys must be masked off)."""
    b, h, s, d = q.shape
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    assert s % block_q == 0 and s % block_k == 0, (
        f"seq {s} must be a multiple of block sizes")
    if mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    # (B, 1, S): satisfies the TPU block-shape sublane constraint
    mask = mask.astype(jnp.int32).reshape(b, 1, s)

    bh = b * h
    qf = q.reshape(bh, s, d)
    kf = k.reshape(bh, s, d)
    vf = v.reshape(bh, s, d)
    scale = 1.0 / math.sqrt(d)

    grid = (bh, s // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, seq_len=s,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, s), lambda i, j: (i // h, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
    )(mask, qf, kf, vf)
    return out.reshape(b, h, s, d)


@jax.custom_vjp
def _flash_attention_ad(q, k, v, mask):
    return flash_attention(q, k, v, mask)


def _flash_fwd(q, k, v, mask):
    return flash_attention(q, k, v, mask), (q, k, v, mask)


def _flash_bwd(res, g):
    # Backward via the reference formulation (XLA-fused softmax attention):
    # exact gradients; a dedicated Pallas backward kernel can replace this
    # without touching callers.
    q, k, v, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference(q_, k_, v_, mask=mask),
        q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_ad.defvjp(_flash_fwd, _flash_bwd)


def _use_pallas() -> bool:
    return pltpu is not None and jax.default_backend() == "tpu"


# Below this sequence length XLA's fused attention wins on v5e (see module
# docstring measurements); the flash kernel wins past the crossover.
PALLAS_MIN_SEQ = 4096


def multihead_attention(q, k, v, mask=None, bias=None,
                        force_reference: bool = False):
    """Dispatch: Pallas flash kernel on TPU for long block-aligned
    sequences with a plain key mask, XLA fused attention otherwise."""
    s = q.shape[2]
    if (not force_reference and _use_pallas() and bias is None
            and s % 512 == 0 and s >= PALLAS_MIN_SEQ
            and q.shape == k.shape == v.shape):
        if mask is None:
            mask = jnp.ones((q.shape[0], s), jnp.int32)
        return _flash_attention_ad(q, k, v, mask)
    return attention_reference(q, k, v, mask=mask, bias=bias)
