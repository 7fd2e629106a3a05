"""Flash-attention kernel numerics (Pallas interpret mode on CPU):
forward and the full Pallas backward (dq/dk/dv via saved logsumexp +
delta trick) against the XLA reference formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sequencing_tpu.ops.attention import (
    attention_reference, flash_attention, _flash_attention_ad)


def _inputs(b=2, h=2, s=256, d=16, seed=0, masked=True):
    rng = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
               for _ in range(3))
    if masked:
        mask = np.ones((b, s), np.int32)
        mask[:, int(0.75 * s):] = 0  # padded key tail
        mask[-1, int(0.5 * s):] = 0
    else:
        mask = np.ones((b, s), np.int32)
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_forward_matches_reference(masked):
    q, k, v, mask = _inputs(masked=masked)
    want = attention_reference(q, k, v, mask=mask)
    got = flash_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("masked", [False, True])
def test_flash_backward_matches_reference(masked):
    q, k, v, mask = _inputs(masked=masked)

    def ref_loss(q, k, v):
        out = attention_reference(q, k, v, mask=mask)
        return jnp.sum(jnp.sin(out))  # non-trivial cotangents

    def flash_loss(q, k, v):
        out = _flash_attention_ad(q, k, v, mask, True)
        return jnp.sum(jnp.sin(out))

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name} mismatch")


def test_flash_backward_multiblock():
    # several q/kv blocks per row: exercises both fori_loop accumulations
    q, k, v, mask = _inputs(b=1, h=1, s=512, d=8, seed=3)

    def flash_loss(q, k, v):
        out = _flash_attention_ad(
            q, k, v, mask, True)
        return jnp.sum(out * out)

    def ref_loss(q, k, v):
        out = attention_reference(q, k, v, mask=mask)
        return jnp.sum(out * out)

    # block sizes come from min(512, s): force multi-block via s=512 with
    # block 512 -> single block; re-run through the public kernels with
    # explicit small blocks instead
    from multimodal_sequencing_tpu.ops.attention import (
        _fwd_pallas, flash_attention_bwd)
    o, lse = _fwd_pallas(q, k, v, mask, 128, 64, True)
    want_o = attention_reference(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(o), np.asarray(want_o),
                               atol=2e-5, rtol=2e-5)
    g = jnp.cos(o)
    dq, dk, dv = flash_attention_bwd(q, k, v, mask, o, lse, g,
                                     block_q=128, block_k=64,
                                     interpret=True)
    def ref_sum(q, k, v):
        return jnp.sum(attention_reference(q, k, v, mask=mask) * jnp.cos(o))
    want = jax.grad(ref_sum, argnums=(0, 1, 2))(q, k, v)
    for got_g, w, name in zip((dq, dk, dv), want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(got_g), np.asarray(w), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name} mismatch")


def test_attention_dropout_modes():
    # "probs" (HF-faithful) vs "folded" (fused perf): identical in eval,
    # different dropout streams in train mode
    from multimodal_sequencing_tpu.models.config import EncoderConfig
    from multimodal_sequencing_tpu.models.encoder import TextEncoder

    ids = np.asarray(np.random.RandomState(0).randint(5, 900, (2, 32)),
                     np.int32)
    outs = {}
    for mode in ("probs", "folded"):
        cfg = EncoderConfig.tiny(attention_dropout_mode=mode)
        model = TextEncoder(cfg)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids))
        eval_seq, _ = model.apply(variables, jnp.asarray(ids),
                                  deterministic=True)
        train_seq, _ = model.apply(
            variables, jnp.asarray(ids), deterministic=False,
            rngs={"dropout": jax.random.PRNGKey(7)})
        outs[mode] = (np.asarray(eval_seq), np.asarray(train_seq))
    np.testing.assert_allclose(outs["probs"][0], outs["folded"][0],
                               atol=1e-6)  # eval identical
    assert not np.allclose(outs["probs"][1], outs["folded"][1])
