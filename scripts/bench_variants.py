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


def _plain_probs_attention(q, k, v, mask, dropout_p, key):
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
    no_flash = lambda s, training=False: False
    orig_flash = attn_mod.flash_eligible
    aligned_only = (lambda s, training=False:
                    orig_flash(s, training) and s % 128 == 0)

    if which in ("text", "all"):
        # S=320: flash ineligible either way, so variants are gelu x remat
        run("text_default_logit_erf_remat", bench.bench_text, [])
        run("text_erf_gelu", bench.bench_text, [_gelu_override("erf")])
        run("text_tanh_gelu", bench.bench_text, [_gelu_override("tanh")])
        run("text_noremat_probs", bench.bench_text,
            [_patch(enc_mod, "_xla_probs_dropout_attention",
                    _plain_probs_attention)])
        run("text_pallas_row_s320", bench.bench_text,
            [_flash_gate(lambda s, training=False:
                         attn_mod._use_pallas() and training)])

    if which in ("multimodal", "all"):
        run("mm_default_pallas_row566", bench.bench_multimodal, [])
        run("mm_xla_remat_probs", bench.bench_multimodal,
            [_flash_gate(aligned_only)])
        run("mm_xla_plain_probs", bench.bench_multimodal,
            [_flash_gate(aligned_only),
             _patch(enc_mod, "_xla_probs_dropout_attention",
                    _plain_probs_attention)])
        run("mm_erf_gelu", bench.bench_multimodal, [_gelu_override("erf")])


if __name__ == "__main__":
    main()
