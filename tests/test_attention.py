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
        out = _flash_attention_ad(q, k, v, mask, jnp.int32(0), 0.0, True)
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
            q, k, v, mask, jnp.int32(0), 0.0, True)
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


def _host_keep_bits(seed, bh, s, dropout_p):
    """numpy replica of the kernel's counter-based keep mask
    (_mix32/_keep_bits/_seed_for_bh) for oracle comparisons."""
    def mix32(x):
        # uint32 wraparound is the point here (matches int32 lanes)
        with np.errstate(over="ignore"):
            x = np.asarray(x, np.uint32)
            x ^= x >> np.uint32(16)
            x = (x * np.uint32(0x85EBCA6B)) & np.uint32(0xFFFFFFFF)
            x ^= x >> np.uint32(13)
            x = (x * np.uint32(0xC2B2AE35)) & np.uint32(0xFFFFFFFF)
            x ^= x >> np.uint32(16)
        return x
    with np.errstate(over="ignore"):
        seed_bh = mix32(np.uint32(seed) + np.uint32(bh + 1)
                        * np.uint32(668265263))
    with np.errstate(over="ignore"):
        rows = np.arange(s, dtype=np.uint32)
        idx = rows[:, None] * np.uint32(s) + rows[None, :]
        x = mix32((idx * np.uint32(0x9E3779B9) + seed_bh)
                  & np.uint32(0xFFFFFFFF))
    u = x & np.uint32(0x7FFFFFFF)
    thresh = np.uint32(int((1.0 - dropout_p) * 2147483647))
    return u < thresh  # (s, s) keep mask


def _dropped_reference(q, k, v, mask, seed, dropout_p):
    """HF probs-dropout attention with the kernel's exact keep bits."""
    b, h, s, d = q.shape
    logits = np.einsum("bhsd,bhtd->bhst", np.asarray(q, np.float64),
                       np.asarray(k, np.float64)) / np.sqrt(d)
    logits = np.where(np.asarray(mask)[:, None, None, :] != 0, logits,
                      -1e9)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    out = np.zeros((b, h, s, d))
    for bi in range(b):
        for hi in range(h):
            bits = _host_keep_bits(seed, bi * h + hi, s, dropout_p)
            dropped = probs[bi, hi] * bits / (1.0 - dropout_p)
            out[bi, hi] = dropped @ np.asarray(v, np.float64)[bi, hi]
    return out


def test_flash_dropout_forward_matches_oracle():
    q, k, v, mask = _inputs(b=2, h=2, s=128, d=16, seed=5)
    seed, p = 12345, 0.25
    got = _flash_attention_ad(q, k, v, mask, jnp.int32(seed), p, True)
    want = _dropped_reference(q, k, v, mask, seed, p)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-5)
    # and the keep rate is near 1-p
    bits = _host_keep_bits(seed, 0, 512, p)
    assert abs(bits.mean() - 0.75) < 0.01


def test_flash_dropout_backward_matches_oracle():
    q, k, v, mask = _inputs(b=1, h=2, s=128, d=16, seed=6)
    seed, p = 777, 0.2

    def flash_loss(q, k, v):
        out = _flash_attention_ad(q, k, v, mask, jnp.int32(seed), p, True)
        return jnp.sum(jnp.sin(out))

    got = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)

    bits = np.stack([_host_keep_bits(seed, bh, 128, p) for bh in range(2)]
                    )[None]  # (1, 2, s, s)

    def ref_loss(q, k, v):
        d = q.shape[-1]
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k) / np.sqrt(d)
        logits = jnp.where(mask[:, None, None, :] != 0, logits, -1e9)
        probs = jax.nn.softmax(logits, -1)
        dropped = probs * bits / (1.0 - p)
        out = jnp.einsum("bhst,bhtd->bhsd", dropped, v)
        return jnp.sum(jnp.sin(out))

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-5, rtol=5e-4,
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



def test_block_for_and_pad():
    from multimodal_sequencing_tpu.ops.attention import (
        _block_for, _pad_to_block)
    assert _block_for(512) == 512 and _block_for(1024) == 512
    assert _block_for(640) == 640 and _block_for(768) == 768  # whole row
    # whole-row dispatch accepts ANY length <= 896 (unaligned lengths run
    # unpadded; Mosaic pads the lane axis internally)
    assert _block_for(200) == 200 and _block_for(566) == 566
    assert _block_for(1152) == 384 and _block_for(1000) is None
    assert _pad_to_block(566) == 640 and _pad_to_block(512) == 512


def test_flash_unaligned_whole_row():
    """UNALIGNED lengths <= 896 run as one whole-row program at the raw
    length (no padding) — the dispatch the 566-token multimodal joint
    stream takes on TPU (flash_eligible). fwd + grads + fused dropout
    against the references at a non-8-multiple length."""
    s = 84  # not a multiple of 8 (sublane) or 128 (lane)
    q, k, v, mask = _inputs(b=1, h=2, s=s, d=16, seed=21)

    want = attention_reference(q, k, v, mask=mask)
    got = _flash_attention_ad(q, k, v, mask, jnp.int32(0), 0.0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def flash_loss(q, k, v):
        out = _flash_attention_ad(q, k, v, mask, jnp.int32(0), 0.0, True)
        return jnp.sum(jnp.sin(out))

    def ref_loss(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(q, k, v, mask=mask)))

    got_g = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    want_g = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got_g, want_g, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name} mismatch")

    # fused probs dropout at the unaligned length vs the host oracle
    seed, p = 3141, 0.25
    got_d = _flash_attention_ad(q, k, v, mask, jnp.int32(seed), p, True)
    want_d = _dropped_reference(q, k, v, mask, seed, p)
    np.testing.assert_allclose(np.asarray(got_d), want_d,
                               atol=3e-5, rtol=3e-5)


def test_flash_padded_odd_length():
    """Odd sequence lengths run through the kernels by padding to the next
    128 multiple (dispatch in multihead_attention): padded keys are masked
    off, padded query rows sliced away, and gradients to the padding are
    exactly zero — so fwd+grads on the first `s` rows match the unpadded
    XLA reference (the multimodal joint stream, e.g. S=566, takes this
    path on TPU)."""
    s, sp = 200, 256
    q, k, v, mask = _inputs(b=2, h=2, s=s, d=16, seed=9)
    pad = ((0, 0), (0, 0), (0, sp - s), (0, 0))
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    maskp = jnp.pad(mask, ((0, 0), (0, sp - s)))

    want = attention_reference(q, k, v, mask=mask)
    got = _flash_attention_ad(qp, kp, vp, maskp, jnp.int32(0), 0.0, True)
    np.testing.assert_allclose(np.asarray(got[:, :, :s]), np.asarray(want),
                               atol=2e-5, rtol=2e-5)

    def ref_loss(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(q, k, v, mask=mask)))

    def flash_loss(qp, kp, vp):
        out = _flash_attention_ad(qp, kp, vp, maskp, jnp.int32(0), 0.0,
                                  True)
        return jnp.sum(jnp.sin(out[:, :, :s]))

    want_g = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    got_g = jax.grad(flash_loss, argnums=(0, 1, 2))(qp, kp, vp)
    for g, w, name in zip(got_g, want_g, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g[:, :, :s]), np.asarray(w), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name} mismatch")
        assert np.all(np.asarray(g[:, :, s:]) == 0.0), f"d{name} pad leak"


def test_flash_padded_dropout_matches_oracle():
    """Same padded path with fused probs dropout: sliced fwd rows match the
    host keep-bit oracle computed at the PADDED length (the bits are a
    function of the padded counter grid)."""
    s, sp = 72, 128
    q, k, v, mask = _inputs(b=1, h=2, s=s, d=16, seed=11)
    pad = ((0, 0), (0, 0), (0, sp - s), (0, 0))
    qp, kp, vp = (jnp.pad(x, pad) for x in (q, k, v))
    maskp = jnp.pad(mask, ((0, 0), (0, sp - s)))
    seed, p = 4242, 0.25
    got = _flash_attention_ad(qp, kp, vp, maskp, jnp.int32(seed), p, True)
    want = _dropped_reference(qp, kp, vp, maskp, seed, p)
    np.testing.assert_allclose(np.asarray(got[:, :, :s]), want[:, :, :s],
                               atol=3e-5, rtol=3e-5)


def test_flash_ad_multiblock_default_s1024():
    """The DEFAULT block choice multiblocks at s=1024 (block 512, two
    k/q blocks per row) — covers the fori_loop accumulations through the
    custom-vjp entry, since short rows now run whole-row."""
    q, k, v, mask = _inputs(b=1, h=1, s=1024, d=8, seed=13)

    def flash_loss(q, k, v):
        out = _flash_attention_ad(q, k, v, mask, jnp.int32(0), 0.0, True)
        return jnp.sum(jnp.sin(out))

    def ref_loss(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(q, k, v, mask=mask)))

    np.testing.assert_allclose(
        float(flash_loss(q, k, v)), float(ref_loss(q, k, v)), rtol=1e-5)
    got = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name} mismatch")


def test_xla_probs_dropout_paths_match_reference_semantics():
    """The shipped XLA probs-dropout path (plain AD, 1/keep rescale
    deferred onto the context) and its long-sequence remat variant must
    both match the undeferred HF formulation — values and grads."""
    import math

    import jax
    import jax.numpy as jnp

    from multimodal_sequencing_tpu.models.encoder import (
        _xla_probs_dropout_attention, _xla_probs_dropout_attention_remat)
    from multimodal_sequencing_tpu.ops.attention import NEG_INF

    def reference(q, k, v, mask, key, p):
        d = q.shape[-1]
        logits = jnp.einsum("bhsd,bhtd->bhst", q, k,
                            preferred_element_type=jnp.float32
                            ) * (1.0 / math.sqrt(d))
        logits = logits + jnp.where(mask[:, None, None, :].astype(bool),
                                    0.0, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        keep = jax.random.bernoulli(key, 1.0 - p, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - p), jnp.zeros((), q.dtype))
        return jnp.einsum("bhst,bhtd->bhsd", probs, v)

    rng = jax.random.PRNGKey(0)
    kq, kk, kv, kd = jax.random.split(rng, 4)
    b, h, s, d = 2, 3, 16, 8
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
    mask = jnp.ones((b, s), jnp.int32).at[:, -3:].set(0)
    p = 0.2

    out_r = reference(q, k, v, mask, kd, p)
    for fn in (_xla_probs_dropout_attention,
               _xla_probs_dropout_attention_remat):
        out = fn(q, k, v, mask, kd, p)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_r),
                                   rtol=1e-5, atol=1e-6)
        gc = jax.grad(lambda q, k, v: (fn(q, k, v, mask, kd, p) ** 2)
                      .sum(), argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(lambda q, k, v: (reference(q, k, v, mask, kd, p)
                                       ** 2).sum(),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gc, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=1e-5)
