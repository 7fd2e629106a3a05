"""Fused multi-head attention for TPU.

The encoder hot op. On TPU this runs a Pallas flash-attention kernel
(online-softmax, K/V streamed through VMEM in blocks, fp32 accumulation on
the MXU); elsewhere (CPU tests, interpret mode) a jnp reference path with
identical semantics. Replaces the reference's
`torch.nn.functional.softmax(QK^T)V` BertSelfAttention
(`/root/reference/models/CLIP/src/lxrt/modeling.py` BertAttention et al.)
with a bandwidth-optimal fused kernel.

Shapes: q, k, v are (B, H, S, D); `bias` is an additive mask broadcastable to
(B, 1, S, S) (0 for keep, large-negative for masked). S is padded by the
caller to a multiple of the block size on the TPU path.
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


def attention_reference(q, k, v, bias: Optional[jax.Array] = None):
    """jnp reference path (and CPU fallback)."""
    dtype = q.dtype
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                  *, block_k: int, seq_len: int, scale: float):
    """One (batch*head, q-block) program: online-softmax accumulation over
    K/V blocks. All refs are VMEM blocks; accumulation in fp32."""
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
        s = s + bias_ref[0, :, pl.ds(kb * block_k, block_k)].astype(
            jnp.float32)
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
def flash_attention(q, k, v, bias=None, block_q: int = 128,
                    block_k: int = 128):
    """Pallas flash attention. q,k,v: (B, H, S, D); bias broadcastable to
    (B, 1, S, S) additive. S must divide by the block sizes (caller pads)."""
    b, h, s, d = q.shape
    assert s % block_q == 0 and s % block_k == 0, (
        f"seq {s} must be a multiple of block sizes")
    if bias is None:
        bias = jnp.zeros((b, 1, s, s), q.dtype)
    bias = jnp.broadcast_to(bias, (b, 1, s, s))

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
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            # bias is (B, 1, S, S): pick the batch row for this (b*h) program
            pl.BlockSpec((1, block_q, s), lambda i, j: (i // h, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
    )(qf, kf, vf, bias.reshape(b, s, s))
    return out.reshape(b, h, s, d)


@jax.custom_vjp
def _flash_attention_ad(q, k, v, bias):
    return flash_attention(q, k, v, bias)


def _flash_fwd(q, k, v, bias):
    return flash_attention(q, k, v, bias), (q, k, v, bias)


def _flash_bwd(res, g):
    # Backward via the reference formulation (XLA-fused softmax attention):
    # exact gradients; a dedicated Pallas backward kernel can replace this
    # without touching callers.
    q, k, v, bias = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, bias),
                     q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_attention_ad.defvjp(_flash_fwd, _flash_bwd)


def _use_pallas() -> bool:
    return pltpu is not None and jax.default_backend() == "tpu"


# Below this sequence length XLA's fused attention wins: the flash kernel's
# per-program tiles are too small to feed the MXU (measured on v5e at
# S=384/D=64: XLA 53.5ms vs Pallas 61.5ms full-encoder fwd+bwd). The flash
# kernel pays off once the S x S score matrix stops fitting comfortably.
PALLAS_MIN_SEQ = 1024


def multihead_attention(q, k, v, bias=None, force_reference: bool = False):
    """Dispatch: Pallas flash kernel on TPU for long block-aligned
    sequences, XLA fused attention otherwise."""
    s = q.shape[2]
    if (not force_reference and _use_pallas() and s % 128 == 0
            and s >= PALLAS_MIN_SEQ and q.shape == k.shape == v.shape):
        if bias is None:
            bias = jnp.zeros((q.shape[0], 1, s, s), q.dtype)
        return _flash_attention_ad(q, k, v, bias)
    return attention_reference(q, k, v, bias)
