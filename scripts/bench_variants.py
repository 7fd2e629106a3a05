"""Full-model variant timings on the real chip.

Round-5 diagnostic: the ceb40a6 microbench wins (logit_erf GELU,
remat'd XLA probs dropout, whole-row unaligned flash) did NOT move the
full bench (text 64.5ms/step unchanged; multimodal 87.8 -> 98.4ms
REGRESSED). Synthetic 24-layer chains mislead because XLA fuses
differently inside the real model. This script times the REAL
bench_text / bench_multimodal steps under each variant so dispatch
decisions rest on end-to-end numbers.

Usage: python scripts/bench_variants.py [text|multimodal|all]
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

import bench
from multimodal_sequencing_tpu.models import encoder as enc_mod
from multimodal_sequencing_tpu.ops import attention as attn_mod


def _plain_probs_attention(q, k, v, mask, key, dropout_p):
    """The pre-remat XLA probs path (no jax.checkpoint)."""
    import math
    import jax.numpy as jnp
    d = q.shape[-1]
    logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                        preferred_element_type=jnp.float32
                        ) * (1.0 / math.sqrt(d))
    logits = logits + jnp.where(mask[:, None, None, :].astype(bool),
                                0.0, attn_mod.NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    keep = jax.random.bernoulli(key, 1.0 - dropout_p, probs.shape)
    probs = jnp.where(keep, probs / (1.0 - dropout_p),
                      jnp.zeros((), q.dtype))
    return jnp.einsum("bhst,bhtd->bhsd", probs, v)


class _patch:
    def __init__(self, obj, name, value):
        self.obj, self.name, self.value = obj, name, value

    def __enter__(self):
        self.old = getattr(self.obj, self.name)
        setattr(self.obj, self.name, self.value)

    def __exit__(self, *a):
        setattr(self.obj, self.name, self.old)


def _gelu_override(impl):
    """Patch EncoderConfig.resolved_gelu_impl for the run."""
    from multimodal_sequencing_tpu.models.config import EncoderConfig
    return _patch(EncoderConfig, "resolved_gelu_impl",
                  property(lambda self: impl))


def _flash_gate(fn):
    return _patch(attn_mod, "flash_eligible", fn)


def run(name, mode_fn, ctxs):
    import contextlib
    with contextlib.ExitStack() as st:
        for c in ctxs:
            st.enter_context(c)
        out = mode_fn(1)
    print(json.dumps({"variant": name, **out}), flush=True)
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    if which in ("text", "all"):
        # round 3: plain-AD probs dropout is the default XLA path
        # (custom VJP and remat both measured slower); sweep batch
        run("text_default_plain_ad", bench.bench_text, [])
        for bpc in ("12", "16"):
            os.environ["BENCH_BATCH_PER_CHIP"] = bpc
            run(f"text_bpc{bpc}", bench.bench_text, [])
            del os.environ["BENCH_BATCH_PER_CHIP"]

    if which in ("multimodal", "all"):
        run("mm_default_plain_ad", bench.bench_multimodal, [])
        for bpc in ("6", "8"):
            os.environ["BENCH_MM_BATCH_PER_CHIP"] = bpc
            run(f"mm_bpc{bpc}", bench.bench_multimodal, [])
            del os.environ["BENCH_MM_BATCH_PER_CHIP"]


if __name__ == "__main__":
    main()
