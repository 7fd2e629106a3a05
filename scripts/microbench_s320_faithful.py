"""Microbench: HF-faithful probs-dropout attention variants at the text
flagship shape (B=8 H=16 S=320 D=64, 24 chained layers, bf16) + GELU
implementations at the flagship MLP shape.

Round-5 perf work: the faithful-semantics bench number (BENCH_r04: 124.1
stories/s/chip, 4.12x anchor) pays (a) the XLA erf lowering in the MLP
(~9ms/step) and (b) S x S probs materialization for attention dropout
(~6ms/step). Candidates measured here:

  attention:
    xla_probs       current encoder fallback (softmax -> bernoulli ->
                    matmul, default autodiff: saves probs + mask)
    xla_remat       same computation under jax.checkpoint: bwd
                    regenerates probs/mask instead of round-tripping
                    them through HBM (keys regenerate deterministically)
    pallas_row      whole-row fused-dropout flash kernel (hw bits); at
                    S=320 `_block_for` falls back to one whole-row
                    program per (b, h)
    xla_folded      no probs dropout — the lower bound (fast mode)

  gelu (on (8, 320, 4096)):
    erf / fast_erf / tanh from ops/gelu.py, fwd+bwd chained x24.

Run on the real chip: `python scripts/microbench_s320_faithful.py`.
"""

import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_sequencing_tpu.utils.platform import apply_platform_env
apply_platform_env()

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")

from multimodal_sequencing_tpu.ops.attention import _flash_attention_ad
from multimodal_sequencing_tpu.ops.gelu import gelu

DROPOUT_P = 0.1
LAYERS = 24


def _probs_attn(q, k, v, mask, key):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + jnp.where(mask[:, None, None, :].astype(bool),
                                0.0, -1e9)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    keep = jax.random.bernoulli(key, 1.0 - DROPOUT_P, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - DROPOUT_P),
                      jnp.zeros((), q.dtype))
    return jnp.einsum("bhst,bhtd->bhsd", probs, v)


def _folded_attn(q, k, v, mask, key):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + jnp.where(mask[:, None, None, :].astype(bool),
                                0.0, -1e9)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhst,bhtd->bhsd", probs, v)


def _pallas_attn(q, k, v, mask, seed):
    return _flash_attention_ad(q, k, v, mask, seed, dropout_p=DROPOUT_P,
                               bits_hw=True)


def _chain(attn, q, k, v, mask, keys):
    x = q
    for i in range(LAYERS):
        x = attn(x, k, v, mask, keys[i])
    return jnp.sum(x.astype(jnp.float32))


def time_fn(f, *args, iters=20, warmup=5):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_attention(b=8, h=16, s=320, d=64):
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (b, h, s, d),
                                 jnp.bfloat16) for i in range(3))
    mask = jnp.ones((b, s), jnp.int32)
    keys = jax.random.split(jax.random.PRNGKey(9), LAYERS)
    seeds = jnp.arange(LAYERS, dtype=jnp.int32) + 11

    variants = {
        "xla_probs": lambda q, k, v: _chain(_probs_attn, q, k, v, mask,
                                            keys),
        "xla_remat": lambda q, k, v: _chain(jax.checkpoint(_probs_attn),
                                            q, k, v, mask, keys),
        "pallas_row": lambda q, k, v: _chain(_pallas_attn, q, k, v, mask,
                                             seeds),
        "xla_folded": lambda q, k, v: _chain(_folded_attn, q, k, v, mask,
                                             keys),
    }
    row = {}
    for name, f in variants.items():
        try:
            g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))
            row[name] = round(time_fn(g, q, k, v), 2)
        except Exception as e:  # noqa: BLE001 — report, don't die
            row[name] = f"{type(e).__name__}: {e}"[:120]
        print(f"  attn[{name}] S={s}: {row[name]}", file=sys.stderr,
              flush=True)
    return row


def bench_gelu(b=8, s=320, f=4096):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, f), jnp.bfloat16)

    def chain(impl):
        def run(x):
            y = x
            for _ in range(LAYERS):
                y = gelu(y, impl=impl) * 0.9  # stop constant folding
            return jnp.sum(y.astype(jnp.float32))
        return run

    row = {}
    for impl in ("erf", "fast_erf", "tanh"):
        g = jax.jit(jax.grad(chain(impl)))
        row[impl] = round(time_fn(g, x), 2)
        print(f"  gelu[{impl}]: {row[impl]}", file=sys.stderr, flush=True)
    return row


def main():
    out = {"attn_s320": bench_attention(s=320),
           "attn_s566": bench_attention(b=4, s=566),
           "attn_s640": bench_attention(b=4, s=640),
           "gelu": bench_gelu()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
