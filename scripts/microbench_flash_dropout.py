"""Micro-benchmark: fused-dropout flash attention vs XLA probs-dropout.

Hardware-verifies the claim behind `ops/attention.py`'s PALLAS_MIN_SEQ
dispatch for the HF-faithful training semantics (attention-PROBABILITY
dropout, `/root/reference/models/CLIP/src/lxrt/modeling.py` BertSelfAttention):
at long sequences the Pallas kernel with in-kernel counter dropout should
beat XLA's materialized (B, H, S, S) probs + jax.random dropout.

Protocol matches the module-docstring table in ops/attention.py: bf16,
B=2 H=16 D=64, chained-dispatch timing (enqueue the loop, one final D2H).
Run on the real chip: `python scripts/microbench_flash_dropout.py`.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from multimodal_sequencing_tpu.ops.attention import (
    _flash_attention_ad, attention_reference)

DROPOUT_P = 0.1


def xla_probs_dropout_attention(q, k, v, mask, rng):
    """The XLA fallback the encoder uses below the crossover: materialize
    softmax probs, drop them with jax.random, matmul with V."""
    import math
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32) * scale
    logits = logits + jnp.where(mask[:, None, None, :].astype(bool), 0.0,
                                -1e9)
    probs = jax.nn.softmax(logits, axis=-1)
    keep = jax.random.bernoulli(rng, 1.0 - DROPOUT_P, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - DROPOUT_P), 0.0)
    return jnp.einsum("bhst,bhtd->bhsd", probs.astype(q.dtype), v)


def time_fn(f, *args, iters=20, warmup=5):
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    b, h, d = 2, 16, 64
    results = {}
    for s in (512, 1024, 2048, 4096):
        key = jax.random.PRNGKey(0)
        q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (b, h, s, d),
                                     jnp.bfloat16) for i in range(3))
        mask = jnp.ones((b, s), jnp.int32)
        seed = jnp.int32(7)

        @jax.jit
        def flash_loss(q, k, v, s=s):
            o = _flash_attention_ad(q, k, v, mask, seed,
                                    dropout_p=DROPOUT_P)
            return jnp.sum(o.astype(jnp.float32))

        @jax.jit
        def xla_loss(q, k, v):
            o = xla_probs_dropout_attention(q, k, v, mask, key)
            return jnp.sum(o.astype(jnp.float32))

        flash_g = jax.jit(jax.grad(flash_loss, argnums=(0, 1, 2)))
        xla_g = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2)))

        row = {}
        for name, f in (("flash_fwd", flash_loss), ("xla_fwd", xla_loss),
                        ("flash_fwdbwd", flash_g), ("xla_fwdbwd", xla_g)):
            try:
                row[name] = round(time_fn(f, q, k, v) * 1e3, 2)
            except Exception as e:  # noqa: BLE001 — report, don't die
                row[name] = f"{type(e).__name__}"
        results[f"S={s}"] = row
        print(f"S={s}: {row}", file=sys.stderr, flush=True)
    print(json.dumps({"dropout_p": DROPOUT_P, "shape": [b, h, "S", d],
                      "dtype": "bfloat16", "ms": results}))


if __name__ == "__main__":
    main()
