"""Fused multi-head attention for TPU.

The encoder hot op. Two paths with identical semantics:
  * `attention_reference` — XLA's fused attention from an einsum/softmax
    formulation; fastest at the product's short sequences.
  * `flash_attention` — Pallas online-softmax kernel taking the raw (B, S)
    key mask (NOT an S x S bias: streaming a materialized bias costs S^2
    HBM traffic, which is what makes naive flash kernels lose), and the
    building block for future context-parallel sharding.

The differentiable entry (`_flash_attention_ad`) carries a full Pallas
backward: the forward saves the per-row logsumexp, the backward runs two
kernels (dq over q-blocks; dk/dv over kv-blocks) with the standard
delta = rowsum(dO * O) trick — no S x S materialization anywhere.

Measured on v5e (B=2 H=16 D=64, bf16; chained-dispatch timing):
  S=512   fwd XLA 1.81ms / flash 5.10ms   fwd+bwd XLA 2.19ms / 3.40ms
  S=1024  fwd XLA 2.86ms / flash 2.09ms   fwd+bwd XLA 2.60ms / 4.13ms
  S=2048  fwd XLA 3.69ms / flash 3.35ms   fwd+bwd XLA 7.36ms / 6.31ms
  S=4096  fwd XLA 8.19ms / flash 8.36ms   fwd+bwd XLA 24.6ms / 19.5ms
  S=8192  XLA fails to compile (S^2 buffers exceed HBM); flash runs
          (fwd 29.5ms, fwd+bwd 72.7ms)
=> dispatch crossover PALLAS_MIN_SEQ = 2048 (was 4096 with the XLA
fallback backward). bf16 deviation vs reference: fwd 2e-3, grads 8e-3
(one bf16 ulp at unit scale).

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


# ----- in-kernel dropout bits -------------------------------------------------
# Keep-mask generation for attention-probability dropout inside the flash
# kernels (HF-faithful "probs" mode), two implementations:
#   * bits_hw=True — the TPU hardware PRNG (`pltpu.prng_random_bits`),
#     re-seeded per (batch*head, q-block, k-block) TILE so the dq and
#     dk/dv kernels regenerate the forward's exact bits by re-deriving
#     the same tile seed. Requires identical block decomposition in
#     forward and backward (the custom-VJP path guarantees it via
#     `_block_for`). Not available in the Pallas interpreter.
#   * bits_hw=False — a murmur3 finalizer over the (row, col) counter:
#     per-ELEMENT, so any block decomposition regenerates the same bits,
#     and it runs under the CPU interpreter (the test oracle replicates
#     it in numpy). int32-multiply hashing is slow on the VPU, so this
#     is the fallback, not the TPU default.


def _mix32(x):
    """murmur3 fmix32 on int32 lanes (logical shifts, wrapping mults)."""
    x = x ^ jax.lax.shift_right_logical(x, 16)
    x = x * jnp.int32(-2048144789)      # 0x85EBCA6B
    x = x ^ jax.lax.shift_right_logical(x, 13)
    x = x * jnp.int32(-1028477387)      # 0xC2B2AE35
    x = x ^ jax.lax.shift_right_logical(x, 16)
    return x


def _keep_bits(seed_bh, rows, cols, seq_len, keep_threshold):
    """(len(rows), len(cols)) bool keep-mask; deterministic in
    (seed_bh, absolute row, absolute col)."""
    idx = (rows[:, None] * seq_len + cols[None, :]).astype(jnp.int32)
    x = _mix32(idx * jnp.int32(-1640531527) + seed_bh)  # 0x9E3779B9
    u = jnp.bitwise_and(x, jnp.int32(0x7FFFFFFF))
    return u < jnp.int32(keep_threshold)


def _seed_for_bh(seed, bh_index):
    """Decorrelate batch*head rows so the (row*S+col) counter (int32) never
    collides across rows of large batches."""
    return _mix32(seed + (bh_index + 1) * jnp.int32(668265263))


def _hw_tile_bits(seed_bh, qb, kb, num_kb, block_q, block_k, keep_prob):
    """(block_q, block_k) bool keep-mask from the TPU hardware PRNG.
    Deterministic in (seed_bh, qb, kb): the per-core generator is
    re-seeded for every tile, so forward and backward kernels that visit
    the same absolute tile recover the same bits regardless of grid/loop
    order."""
    tile_id = qb * jnp.int32(num_kb) + kb
    pltpu.prng_seed(_mix32(seed_bh + (tile_id + 1) * jnp.int32(40503)))
    raw = pltpu.bitcast(pltpu.prng_random_bits((block_q, block_k)),
                        jnp.uint32)
    # clamp: keep_prob that rounds to 1.0 would overflow the uint32
    # threshold to 0 and drop EVERYTHING (advisor r4)
    thresh = min(int(keep_prob * 4294967296.0), 4294967295)
    return raw < jnp.uint32(thresh)


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


# ----- forward kernel ---------------------------------------------------------


def _flash_fwd_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, o_ref,
                      lse_ref, *, block_k: int, seq_len: int, scale: float,
                      dropout_p: float, bits_hw: bool = False):
    """One (batch*head, q-block) program: online softmax over K/V blocks.
    mask_ref is the (1, 1, S) key keep-mask for this batch row; lse_ref
    receives the per-q-row logsumexp (saved for the backward). With
    dropout_p > 0 the HF "probs" dropout is fused in: the normalizer l
    accumulates UNDROPPED probabilities (softmax semantics), the context
    accumulates dropped/rescaled ones — out = (softmax(s)*M/keep) @ V."""
    q = q_ref[0].astype(jnp.float32) * scale  # (block_q, d)
    block_q, d = q.shape
    num_kb = seq_len // block_k
    if dropout_p > 0.0:
        keep_prob = 1.0 - dropout_p
        thresh = int(keep_prob * 2147483647)
        seed_bh = _seed_for_bh(seed_ref[0, 0], pl.program_id(0))
        rows = (pl.program_id(1) * block_q
                + jax.lax.iota(jnp.int32, block_q))

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
        p_ctx = p
        if dropout_p > 0.0:
            if bits_hw:
                bits = _hw_tile_bits(seed_bh, pl.program_id(1), kb,
                                     num_kb, block_q, block_k, keep_prob)
            else:
                cols = kb * block_k + jax.lax.iota(jnp.int32, block_k)
                bits = _keep_bits(seed_bh, rows, cols, seq_len, thresh)
            p_ctx = jnp.where(bits, p / (1.0 - dropout_p), 0.0)
        acc_new = acc * alpha + jax.lax.dot_general(
            p_ctx, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m_i, l_i = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    l_safe = jnp.maximum(l_i, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0, 0] = (m_i + jnp.log(l_safe))[:, 0]


def _fwd_pallas(q, k, v, mask, block_q, block_k, interpret,
                dropout_p=0.0, seed=None, bits_hw=False):
    b, h, s, d = q.shape
    bh = b * h
    mask3 = mask.astype(jnp.int32).reshape(b, 1, s)
    qf, kf, vf = (x.reshape(bh, s, d) for x in (q, k, v))
    scale = 1.0 / math.sqrt(d)
    grid = (bh, s // block_q)
    seed_arr = jnp.reshape(
        jnp.int32(0) if seed is None else seed.astype(jnp.int32), (1, 1))
    o, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, block_k=block_k, seq_len=s,
                          scale=scale, dropout_p=dropout_p,
                          bits_hw=bits_hw),
        out_shape=(jax.ShapeDtypeStruct((bh, s, d), q.dtype),
                   jax.ShapeDtypeStruct((bh, 1, s), jnp.float32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, s), lambda i, j: (i // h, 0, 0)),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j))),
        interpret=interpret,
    )(seed_arr, mask3, qf, kf, vf)
    return o.reshape(b, h, s, d), lse


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q, k, v, mask=None, block_q: int = 512,
                    block_k: int = 512, interpret: bool = False):
    """Pallas flash attention (forward only). q,k,v: (B, H, S, D); mask:
    (B, S) key keep-mask ({0,1}). S must divide by the block sizes (caller
    pads; padded keys must be masked off). `interpret=True` runs the
    kernel in the Pallas interpreter (CPU test path)."""
    b, h, s, d = q.shape
    block_q = min(block_q, s)
    block_k = min(block_k, s)
    assert s % block_q == 0 and s % block_k == 0, (
        f"seq {s} must be a multiple of block sizes")
    if mask is None:
        mask = jnp.ones((b, s), jnp.int32)
    o, _ = _fwd_pallas(q, k, v, mask, block_q, block_k, interpret)
    return o


# ----- backward kernels -------------------------------------------------------


def _flash_bwd_dq_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, do_ref,
                         lse_ref, delta_ref, dq_ref,
                         *, block_k: int, seq_len: int, scale: float,
                         dropout_p: float, bits_hw: bool = False):
    """One (batch*head, q-block) program: dq = scale * ds @ K with
    ds = p * (dp - delta). With dropout, dp = (dO @ V^T) * M/keep — and
    delta = rowsum(dO*O) still equals rowsum(dp*p) because the dropped
    context O absorbed the M/keep factor (see test_attention.py)."""
    q = q_ref[0].astype(jnp.float32)       # (block_q, d)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0][:, None]           # (block_q, 1)
    delta = delta_ref[0, 0][:, None]
    block_q, d = q.shape
    num_kb = seq_len // block_k
    if dropout_p > 0.0:
        thresh = int((1.0 - dropout_p) * 2147483647)
        seed_bh = _seed_for_bh(seed_ref[0, 0], pl.program_id(0))
        rows = (pl.program_id(1) * block_q
                + jax.lax.iota(jnp.int32, block_q))

    def body(kb, acc):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = scale * jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        keep = mask_ref[0, 0, pl.ds(kb * block_k, block_k)] != 0
        p = jnp.where(keep[None, :], jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        if dropout_p > 0.0:
            if bits_hw:
                bits = _hw_tile_bits(seed_bh, pl.program_id(1), kb,
                                     num_kb, block_q, block_k,
                                     1.0 - dropout_p)
            else:
                cols = kb * block_k + jax.lax.iota(jnp.int32, block_k)
                bits = _keep_bits(seed_bh, rows, cols, seq_len, thresh)
            dp = jnp.where(bits, dp / (1.0 - dropout_p), 0.0)
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, num_kb, body,
                            jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(seed_ref, mask_ref, q_ref, k_ref, v_ref, do_ref,
                          lse_ref, delta_ref, dk_ref, dv_ref,
                          *, block_q: int, seq_len: int, scale: float,
                          dropout_p: float, bits_hw: bool = False):
    """One (batch*head, kv-block) program: dv = D^T @ dO (D = dropped
    probs) and dk = scale * ds^T @ Q accumulated over q-blocks."""
    k = k_ref[0].astype(jnp.float32)       # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    keep = (mask_ref[0, 0, :] != 0)[None, :]   # (1, block_k)
    block_k, d = k.shape
    num_qb = seq_len // block_q
    if dropout_p > 0.0:
        thresh = int((1.0 - dropout_p) * 2147483647)
        seed_bh = _seed_for_bh(seed_ref[0, 0], pl.program_id(0))
        cols = (pl.program_id(1) * block_k
                + jax.lax.iota(jnp.int32, block_k))

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q_blk = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do_blk = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(
            jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        s = scale * jax.lax.dot_general(
            q_blk, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (block_q, block_k)
        p = jnp.where(keep, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do_blk, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        p_ctx = p
        if dropout_p > 0.0:
            if bits_hw:
                bits = _hw_tile_bits(seed_bh, qb, pl.program_id(1),
                                     seq_len // block_k, block_q, block_k,
                                     1.0 - dropout_p)
            else:
                rows = qb * block_q + jax.lax.iota(jnp.int32, block_q)
                bits = _keep_bits(seed_bh, rows, cols, seq_len, thresh)
            p_ctx = jnp.where(bits, p / (1.0 - dropout_p), 0.0)
            dp = jnp.where(bits, dp / (1.0 - dropout_p), 0.0)
        dv_new = dv_acc + jax.lax.dot_general(
            p_ctx, do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_new = dk_acc + jax.lax.dot_general(
            ds, q_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk, dv = jax.lax.fori_loop(
        0, num_qb, body, (jnp.zeros((block_k, d), jnp.float32),
                          jnp.zeros((block_k, d), jnp.float32)))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret",
                                    "dropout_p", "bits_hw"))
def flash_attention_bwd(q, k, v, mask, o, lse, g, block_q: int = None,
                        block_k: int = None, interpret: bool = False,
                        dropout_p: float = 0.0, seed=None,
                        bits_hw: bool = False):
    """Pallas flash backward: (dq, dk, dv) from the saved forward output
    `o` and per-row logsumexp `lse`. With dropout_p > 0 the forward's
    keep-mask regenerates from the same (seed, row, col) counters —
    per-element hash bits by default; bits_hw=True regenerates hardware
    PRNG tiles instead and then REQUIRES the forward's exact block
    decomposition (the custom-VJP path passes `_block_for(s)` to both).
    block_q/block_k default to `_block_for(s)` (whole-row for short
    rows); explicit values are honored (tests force multi-block)."""
    b, h, s, d = q.shape
    if block_q is None or block_k is None:
        block_q = block_k = _block_for(s) or s
    else:
        block_q, block_k = min(block_q, s), min(block_k, s)
        if bits_hw and dropout_p > 0.0:
            canonical = _block_for(s) or s
            if block_q != canonical or block_k != canonical:
                # hw-PRNG tile seeds are keyed on the block decomposition;
                # a mismatch vs the forward regenerates DIFFERENT bits and
                # silently corrupts gradients (advisor r4)
                raise ValueError(
                    f"bits_hw backward requires the forward's block "
                    f"decomposition _block_for({s})={canonical}, got "
                    f"block_q={block_q} block_k={block_k}")
    bh = b * h
    mask3 = mask.astype(jnp.int32).reshape(b, 1, s)
    qf, kf, vf, of, gf = (x.reshape(bh, s, d) for x in (q, k, v, o, g))
    scale = 1.0 / math.sqrt(d)
    seed_arr = jnp.reshape(
        jnp.int32(0) if seed is None else seed.astype(jnp.int32), (1, 1))
    # delta_i = sum_d dO_i * O_i — one fused elementwise+reduce in XLA
    delta = jnp.sum(gf.astype(jnp.float32) * of.astype(jnp.float32),
                    -1).reshape(bh, 1, s)

    row_specs = [
        pl.BlockSpec((1, 1), lambda i, j: (0, 0)),              # seed
        pl.BlockSpec((1, 1, s), lambda i, j: (i // h, 0, 0)),   # mask
        pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),        # q
        pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),        # k
        pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),        # v
        pl.BlockSpec((1, s, d), lambda i, j: (i, 0, 0)),        # do
        pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)),        # lse
        pl.BlockSpec((1, 1, s), lambda i, j: (i, 0, 0)),        # delta
    ]

    dq_specs = list(row_specs)
    dq_specs[2] = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0))
    dq_specs[5] = pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0))
    dq_specs[6] = pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j))
    dq_specs[7] = pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j))
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, seq_len=s,
                          scale=scale, dropout_p=dropout_p,
                          bits_hw=bits_hw),
        out_shape=jax.ShapeDtypeStruct((bh, s, d), q.dtype),
        grid=(bh, s // block_q),
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(seed_arr, mask3, qf, kf, vf, gf, lse, delta)

    dkv_specs = list(row_specs)
    dkv_specs[1] = pl.BlockSpec((1, 1, block_k), lambda i, j: (i // h, 0, j))
    dkv_specs[3] = pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0))
    dkv_specs[4] = pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0))
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q,
                          seq_len=s, scale=scale, dropout_p=dropout_p,
                          bits_hw=bits_hw),
        out_shape=(jax.ShapeDtypeStruct((bh, s, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, s, d), v.dtype)),
        grid=(bh, s // block_k),
        in_specs=dkv_specs,
        out_specs=(pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0))),
        interpret=interpret,
    )(seed_arr, mask3, qf, kf, vf, gf, lse, delta)

    shape = (b, h, s, d)
    return dq.reshape(shape), dk.reshape(shape), dv.reshape(shape)


# ----- differentiable entry ---------------------------------------------------


def _block_for(s: int):
    """Block size for sequence length s. Short rows run as ONE whole-row
    program per (batch, head) — splitting e.g. S=640 into five 128-blocks
    multiplies grid overhead and starves the MXU (measured 10x slower on
    the multimodal joint stream) — and whole-row dispatch accepts ANY
    length <= 896 (Mosaic pads the lane axis internally; measured a WIN
    over the XLA probs path at the product's unaligned S=566 joint
    stream: 23.0 vs 31.7ms for the 24-layer chain). Longer rows need a
    128-multiple block decomposition (None -> caller pads via
    `_pad_to_block`); largest <=512 divisor. 896 caps the whole-row
    s-matrix + backward live set comfortably inside VMEM."""
    if s <= 896:
        return s
    if s % 128 != 0:
        return None
    for blk in (512, 384, 256, 128):
        if s % blk == 0:
            return blk
    return None


def _pad_to_block(s: int) -> int:
    """Next sequence length >= s that the kernels accept."""
    return ((s + 127) // 128) * 128


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_attention_ad(q, k, v, mask, seed, dropout_p=0.0,
                        interpret=False, bits_hw=False):
    """Differentiable flash attention; dropout_p > 0 fuses HF-style
    attention-probability dropout (seed: int32 scalar array). bits_hw
    selects the hardware-PRNG keep bits (TPU only; ~10% cheaper
    END-TO-END on the chained fwd+bwd step than the murmur hash bits —
    the bits-generation cost ALONE drops ~30%, but it is a minority of
    the kernel) — forward and backward both derive their blocks from
    `_block_for(s)`, so the per-tile re-seeding lines up by
    construction."""
    b, h, s, d = q.shape
    blk = _block_for(s) or s
    o, _ = _fwd_pallas(q, k, v, mask, blk, blk, interpret,
                       dropout_p=dropout_p, seed=seed, bits_hw=bits_hw)
    return o


def _flash_fwd(q, k, v, mask, seed, dropout_p, interpret, bits_hw):
    b, h, s, d = q.shape
    blk = _block_for(s) or s
    o, lse = _fwd_pallas(q, k, v, mask, blk, blk, interpret,
                         dropout_p=dropout_p, seed=seed, bits_hw=bits_hw)
    return o, (q, k, v, mask, seed, o, lse)


def _flash_bwd(dropout_p, interpret, bits_hw, res, g):
    q, k, v, mask, seed, o, lse = res
    dq, dk, dv = flash_attention_bwd(q, k, v, mask, o, lse, g,
                                     interpret=interpret,
                                     dropout_p=dropout_p, seed=seed,
                                     bits_hw=bits_hw)
    return dq, dk, dv, None, None


_flash_attention_ad.defvjp(_flash_fwd, _flash_bwd)


def _use_pallas() -> bool:
    return pltpu is not None and jax.default_backend() == "tpu"


_HW_BITS_OK = None  # memoized result of hw_dropout_bits_ok()


def _bits_dump(order: str, bh: int, s: int, blk: int, keep_prob: float):
    """Dump the keep-bits `_hw_tile_bits` generates in the given kernel's
    visit order ("fwd": per q-block row, loop over k; "dkv": per k-block
    column, loop over q). Both must be bit-identical for the fused
    dropout gradients to be correct."""
    def fwd_kernel(o_ref):
        num_kb = s // blk
        seed_bh = _seed_for_bh(jnp.int32(1234), pl.program_id(0))
        for kb in range(num_kb):
            bits = _hw_tile_bits(seed_bh, pl.program_id(1), kb, num_kb,
                                 blk, blk, keep_prob)
            o_ref[0, :, kb * blk:(kb + 1) * blk] = bits.astype(jnp.int32)

    def dkv_kernel(o_ref):
        num_kb = s // blk
        seed_bh = _seed_for_bh(jnp.int32(1234), pl.program_id(0))
        for qb in range(s // blk):
            bits = _hw_tile_bits(seed_bh, qb, pl.program_id(1), num_kb,
                                 blk, blk, keep_prob)
            o_ref[0, qb * blk:(qb + 1) * blk, :] = bits.astype(jnp.int32)

    if order == "fwd":
        kern, spec = fwd_kernel, pl.BlockSpec((1, blk, s),
                                              lambda i, j: (i, j, 0))
    else:
        kern, spec = dkv_kernel, pl.BlockSpec((1, s, blk),
                                              lambda i, j: (i, 0, j))
    return pl.pallas_call(
        kern, out_shape=jax.ShapeDtypeStruct((bh, s, s), jnp.int32),
        grid=(bh, s // blk), out_specs=spec)()


def hw_dropout_bits_ok() -> bool:
    """One-time self-check that the TPU hardware-PRNG dropout bits are
    consistent between the forward and backward kernels' tile-visit
    orders (advisor r4: gradient correctness of bits_hw rests on
    `pltpu.prng_random_bits` reproducing identical bits for the same
    tile seed across separately-lowered kernels; a JAX/libtpu upgrade
    could silently break that). Runs two tiny bit-dump kernels (2x2
    tile grid) and compares; on mismatch or any error the fused-dropout
    path falls back to the per-element hash bits. Memoized."""
    global _HW_BITS_OK
    if _HW_BITS_OK is None:
        if not _use_pallas():
            _HW_BITS_OK = False
        else:
            try:
                a = _bits_dump("fwd", bh=2, s=512, blk=256, keep_prob=0.9)
                b = _bits_dump("dkv", bh=2, s=512, blk=256, keep_prob=0.9)
                _HW_BITS_OK = bool((a == b).all()) and bool(
                    0.85 < float(a.mean()) < 0.95)
            except Exception:  # noqa: BLE001 — fall back, don't die
                _HW_BITS_OK = False
    return _HW_BITS_OK


# Crossovers measured on v5e (scripts/microbench_flash_dropout.py,
# B=2 H=16 D=64 bf16, dropout_p=0.1): forward-only XLA wins until ~2048
# (S=1024: xla 2.03ms vs flash 3.22); fwd+bwd the flash kernel (Pallas
# backward, dropout bits regenerated instead of an S x S mask round-trip)
# wins from S=512 already (1.54 vs 1.93ms; 2.85 vs 4.37 at 1024; 2x at
# 2048). The flash path is also the only one that runs at S>=8192.
# Hardware-PRNG bits (scripts/verify_hw_dropout_bits.py, chained 8-deep
# fwd+bwd, same shape) shave a further ~10% off the fused-dropout kernel
# vs the murmur hash bits and widen the win over XLA probs:
#   S=512  hash 4.29 / hw 3.70 / xla 3.76 ms
#   S=1024 hash 13.19 / hw 11.92 / xla 18.82
#   S=2048 hash 45.74 / hw 40.68 / xla 77.34
# At the product's NON-128-multiple streams the padded kernel still
# loses even with hw bits (text S=320->384: hw 24.0 vs xla 15.0;
# multimodal S=566->640: hw 13.9 vs xla 11.5), so the native-multiple
# gate below stands.
PALLAS_MIN_SEQ = 2048        # forward-only (eval) crossover
PALLAS_MIN_SEQ_TRAIN = 512   # fwd+bwd (training) crossover
def flash_eligible(s: int, training: bool = False) -> bool:
    """True when the flash kernel would take this sequence length (used
    by the encoder to route faithful probs-dropout training through the
    fused kernel instead of materializing the S x S probs). `training`
    selects the fwd+bwd crossover, which sits lower than forward-only.

    Round-5 re-measurement (scripts/bench_variants.py, FULL bench steps
    on v5e, not synthetic chains): the whole-row unpadded kernel LOSES
    end-to-end at both product shapes it was enabled for —
      text S=320 B=8:        pallas 72.3ms/step vs XLA probs 62.0
      multimodal S=566 B=4:  pallas 86.4ms/step vs XLA probs 84.1
    The 24-layer synthetic-chain numbers that motivated the unaligned
    [512, 896] acceptance (e.g. S=566: pallas 23.0 vs xla 31.7 for the
    chain) do not survive inside the real model, where XLA fuses the
    probs pipeline with the surrounding projections. So: training
    dispatch keeps the fused-dropout kernel only for 128-multiples at
    >= PALLAS_MIN_SEQ_TRAIN (chain-measured wins at 512/1024/2048 and
    the only path that runs at S >= 8192); everything unaligned stays
    on the XLA probs path (custom-VJP, models/encoder.py)."""
    floor = PALLAS_MIN_SEQ_TRAIN if training else PALLAS_MIN_SEQ
    if not _use_pallas() or s < floor:
        return False
    return s % 128 == 0


def multihead_attention(q, k, v, mask=None, bias=None,
                        force_reference: bool = False,
                        dropout_p: float = 0.0, dropout_rng=None):
    """Dispatch: Pallas flash kernel on TPU for long block-aligned
    sequences with a plain key mask, XLA fused attention otherwise.
    dropout_p > 0 (training, HF 'probs' mode) fuses probability dropout
    into the flash kernel; the XLA fallback materializes the probs and
    applies jax.random dropout (caller's responsibility there)."""
    s = q.shape[2]
    if (not force_reference
            and flash_eligible(s, training=dropout_p > 0.0)
            and bias is None and q.shape == k.shape == v.shape):
        if mask is None:
            mask = jnp.ones((q.shape[0], s), jnp.int32)
        # whole-row range runs UNPADDED at the raw length (see
        # flash_eligible); only block-decomposed lengths need padding
        sp = s if s <= 896 else _pad_to_block(s)
        if sp != s:  # pad keys masked off; pad query rows sliced away
            pad = ((0, 0), (0, 0), (0, sp - s), (0, 0))
            q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
            mask = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, sp - s)))
        if dropout_p > 0.0:
            if dropout_rng is None:
                raise ValueError("dropout_p > 0 needs dropout_rng")
            seed = jax.random.randint(
                dropout_rng, (), -2**31, 2**31 - 1, dtype=jnp.int32)
            # this branch only dispatches on real TPU (flash_eligible
            # gates on _use_pallas); the hardware-PRNG bits apply after
            # the one-time fwd/bwd consistency self-check (hash-bits
            # fallback on mismatch — advisor r4)
            out = _flash_attention_ad(q, k, v, mask, seed,
                                      dropout_p=dropout_p,
                                      bits_hw=hw_dropout_bits_ok())
        else:
            out = _flash_attention_ad(q, k, v, mask, jnp.int32(0))
        return out[:, :, :s, :] if sp != s else out
    if dropout_p > 0.0:
        raise ValueError(
            "multihead_attention only fuses dropout on the flash path; "
            "apply probs dropout in the caller for the XLA path")
    return attention_reference(q, k, v, mask=mask, bias=bias)

