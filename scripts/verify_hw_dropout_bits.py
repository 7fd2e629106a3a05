"""TPU-only verification + microbench for hardware-PRNG dropout bits.

Part 1 (correctness): dumps the exact keep-bits the flash kernels
generate via `_hw_tile_bits` (same per-tile seeding, same generation
order) with a dedicated Pallas kernel, builds the HF probs-dropout
reference with those explicit bits, and asserts the fused forward AND
all three grads match — proving the fwd/dq/dkv kernels regenerate one
consistent mask from the tile seeds.

Part 2 (speed): chained fwd+bwd timing of hash bits vs hardware bits vs
the XLA probs+jax.random fallback at the product's real shapes:
  * text flagship   B=8 H=16 S=320  D=64 (below the old crossover)
  * multimodal pad  B=4 H=16 S=640  D=64 (566 padded; old measured loss)
  * table shapes    B=2 H=16 S∈{512,1024,2048}

Run on the real chip: `python scripts/verify_hw_dropout_bits.py`.
"""

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_sequencing_tpu.ops.attention import (
    _block_for, _flash_attention_ad, _hw_tile_bits, _seed_for_bh)

DROPOUT_P = 0.1


def _bits_dump_kernel(seed_ref, o_ref, *, block_k, seq_len, keep_prob):
    """Grid (bh, num_qb); writes the (block_q, S) keep-bits row-block the
    flash forward generates for this program, by issuing the identical
    `_hw_tile_bits` calls in the identical order."""
    block_q = o_ref.shape[1]
    num_kb = seq_len // block_k
    seed_bh = _seed_for_bh(seed_ref[0, 0], pl.program_id(0))
    for kb in range(num_kb):  # static unroll: same calls as the fori_loop
        bits = _hw_tile_bits(seed_bh, pl.program_id(1), kb, num_kb,
                             block_q, block_k, keep_prob)
        o_ref[0, :, kb * block_k:(kb + 1) * block_k] = bits.astype(jnp.int32)


def _bits_dump_kernel_dkv(seed_ref, o_ref, *, block_q, seq_len, keep_prob):
    """Grid (bh, num_kb); regenerates the same bits in the dk/dv kernel's
    visit order (fixed k-block, loop over q-blocks) — must be bit-equal
    to the forward order's dump."""
    block_k = o_ref.shape[2]
    num_kb = seq_len // block_k
    seed_bh = _seed_for_bh(seed_ref[0, 0], pl.program_id(0))
    for qb in range(seq_len // block_q):
        bits = _hw_tile_bits(seed_bh, qb, pl.program_id(1), num_kb,
                             block_q, block_k, keep_prob)
        o_ref[0, qb * block_q:(qb + 1) * block_q, :] = bits.astype(jnp.int32)


def dump_bits(seed, b, h, s, order="fwd"):
    blk = _block_for(s) or s
    if order == "fwd":
        kern = functools.partial(_bits_dump_kernel, block_k=blk, seq_len=s,
                                 keep_prob=1.0 - DROPOUT_P)
        out_spec = pl.BlockSpec((1, blk, s), lambda i, j: (i, j, 0))
    else:  # dkv visit order
        kern = functools.partial(_bits_dump_kernel_dkv, block_q=blk,
                                 seq_len=s, keep_prob=1.0 - DROPOUT_P)
        out_spec = pl.BlockSpec((1, s, blk), lambda i, j: (i, 0, j))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b * h, s, s), jnp.int32),
        grid=(b * h, s // blk),
        in_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0))],
        out_specs=out_spec,
    )(jnp.reshape(jnp.int32(seed), (1, 1)))
    return np.asarray(out).reshape(b, h, s, s).astype(bool)


def verify(b=2, h=3, s=256, d=64, seed=4242):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.float32) for kk in ks)
    mask = jnp.ones((b, s), jnp.int32).at[:, s - 17:].set(0)
    bits = jnp.asarray(dump_bits(seed, b, h, s))

    def flash_loss(q, k, v):
        o = _flash_attention_ad(q, k, v, mask, jnp.int32(seed),
                                DROPOUT_P, False, True)
        return jnp.sum(jnp.sin(o)), o

    (_, got_o), got_g = jax.value_and_grad(
        flash_loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)

    def ref_loss(q, k, v):
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k) / math.sqrt(d)
        logits = jnp.where(mask[:, None, None, :] != 0, logits, -1e9)
        probs = jax.nn.softmax(logits, -1)
        dropped = jnp.where(bits, probs / (1.0 - DROPOUT_P), 0.0)
        o = jnp.einsum("bhst,bhtd->bhsd", dropped, v)
        return jnp.sum(jnp.sin(o)), o

    (_, want_o), want_g = jax.value_and_grad(
        ref_loss, argnums=(0, 1, 2), has_aux=True)(q, k, v)

    def no_bits_loss(q, k, v):
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k) / math.sqrt(d)
        logits = jnp.where(mask[:, None, None, :] != 0, logits, -1e9)
        o = jnp.einsum("bhst,bhtd->bhsd", jax.nn.softmax(logits, -1), v)
        return jnp.sum(jnp.sin(o)), o

    (_, nodrop_o), _ = jax.value_and_grad(
        no_bits_loss, argnums=(0,), has_aux=True)(q, k, v)

    # Exact check: the dk/dv kernel's visit order regenerates the SAME
    # bits as the forward/dq order (tile re-seeding is order-invariant).
    bits_dkv = dump_bits(seed, b, h, s, order="dkv")
    assert (np.asarray(bits) == bits_dkv).all(), "fwd/dkv bits differ!"

    # Numeric check at bf16-MXU tolerance (default-precision einsums on
    # TPU round through bf16, so exact f32 equality is unavailable), plus
    # a discriminative margin: the dumped-bits oracle must explain the
    # fused output ~10x better than the no-dropout one does.
    err_bits = float(np.abs(np.asarray(got_o) - np.asarray(want_o)).max())
    err_nobits = float(np.abs(np.asarray(got_o) - np.asarray(nodrop_o)
                              ).max())
    assert err_bits < 5e-3, f"fwd err vs bits-oracle {err_bits}"
    assert err_bits * 10 < err_nobits, (err_bits, err_nobits)
    for g, w, name in zip(got_g, want_g, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=6e-3, rtol=5e-2,
                                   err_msg=f"d{name}")
    keep = float(np.asarray(bits).mean())
    assert abs(keep - (1.0 - DROPOUT_P)) < 0.005, keep
    # multi-block decomposition consistency (S > 896 -> 512 blocks)
    s2 = 1024
    bits2f = dump_bits(seed, 1, 1, s2, order="fwd")
    bits2d = dump_bits(seed, 1, 1, s2, order="dkv")
    assert (bits2f == bits2d).all(), "multi-block fwd/dkv bits differ!"
    assert abs(bits2f.mean() - (1.0 - DROPOUT_P)) < 0.01
    return {"fwd_bwd_oracle": "ok", "keep_rate": round(keep, 4),
            "bits_order_invariant": True,
            "fwd_err_vs_bits": err_bits, "fwd_err_vs_nobits": err_nobits}


def time_fn(f, *args, iters=20, warmup=5):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def xla_probs_dropout(q, k, v, mask, rng):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + jnp.where(mask[:, None, None, :].astype(bool), 0.0,
                                -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    keep = jax.random.bernoulli(rng, 1.0 - DROPOUT_P, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - DROPOUT_P), 0.0)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(q.dtype), v)


def bench():
    results = {}
    # text S=320 and multimodal S=566 are the PRODUCT's real (non-128-
    # multiple) stream lengths: flash rows run padded (384 / 640) with
    # masked keys + sliced rows, XLA rows run at the native length —
    # exactly the dispatch decision multihead_attention faces.
    for label, b, h, s, chain in (("text_S320", 8, 16, 320, 24),
                                  ("mm_S566", 4, 16, 566, 12),
                                  ("S512", 2, 16, 512, 8),
                                  ("S1024", 2, 16, 1024, 8),
                                  ("S2048", 2, 16, 2048, 8)):
        d = 64
        ks = jax.random.split(jax.random.PRNGKey(1), 3)
        q, k, v = (jax.random.normal(kk, (b, h, s, d), jnp.bfloat16)
                   for kk in ks)
        mask = jnp.ones((b, s), jnp.int32)
        rng = jax.random.PRNGKey(2)
        sp = ((s + 127) // 128) * 128

        def chained(single):
            def f(q, k, v):
                def body(i, x):
                    o = single(x[0], k, v)
                    return (o.astype(jnp.bfloat16), x[1])
                out = jax.lax.fori_loop(0, chain, body, (q, jnp.int32(0)))
                return jnp.sum(out[0].astype(jnp.float32))
            return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

        def pad(x):
            return (jnp.pad(x, ((0, 0), (0, 0), (0, sp - s), (0, 0)))
                    if sp != s else x)

        maskp = (jnp.pad(mask, ((0, 0), (0, sp - s)))
                 if sp != s else mask)

        def flash_hash(qq, kk, vv):
            o = _flash_attention_ad(pad(qq), pad(kk), pad(vv), maskp,
                                    jnp.int32(7), DROPOUT_P, False, False)
            return o[:, :, :s, :]

        def flash_hw(qq, kk, vv):
            o = _flash_attention_ad(pad(qq), pad(kk), pad(vv), maskp,
                                    jnp.int32(7), DROPOUT_P, False, True)
            return o[:, :, :s, :]

        def xla(qq, kk, vv):
            return xla_probs_dropout(qq, kk, vv, mask, rng)

        row = {}
        for name, single in (("hash", flash_hash), ("hw", flash_hw),
                             ("xla", xla)):
            try:
                row[name] = round(time_fn(chained(single), q, k, v) * 1e3, 2)
            except Exception as e:  # noqa: BLE001
                row[name] = type(e).__name__
        results[label] = row
        print(f"{label}: {row}", file=sys.stderr, flush=True)
    return results


def main():
    out = {"verify": verify(), "fwdbwd_chain_ms": bench(),
           "dropout_p": DROPOUT_P}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
