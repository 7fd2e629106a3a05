"""GELU implementations for the encoder MLP.

The reference's HF encoders use exact erf GELU
(`/root/reference/models/CLIP/src/lxrt/modeling.py` `gelu()` /
transformers' `BertIntermediate`). XLA lowers `erf` on TPU to a long
branchy polynomial that measurably drags the 24-layer flagship step
(~9ms/step vs the tanh approximation at the flagship shape, measured on
v5e), so three implementations are provided:

  erf       jax.nn.gelu(approximate=False) — the XLA erf lowering;
            bit-reference semantics.
  fast_erf  erf via the Abramowitz & Stegun 7.1.26 rational+exp form
            (|erf err| <= 1.5e-7 abs), switching to the asymptotic erfc
            expansion on the deep negative tail (x < -4.8, relative err
            < 4e-4 — below a bf16 half-ulp), with a custom_jvp whose
            backward shares the forward's exp(-x^2/2). bf16 outputs are
            verified EXHAUSTIVELY against the `erf` path over all 65280
            finite bf16 inputs (tests/test_gelu.py): equal except a
            small fraction of one-ulp rounding flips.
  tanh      jax.nn.gelu(approximate=True) — the HF "gelu_new"
            approximation; NOT erf semantics (documented fast mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INV_SQRT_2 = 0.7071067811865476
INV_SQRT_2PI = 0.3989422804014327
INV_SQRT_PI = 0.5641895835477563
# A&S 7.1.26 coefficients
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
# The reference path (jax.nn.gelu exact = 0.5*x*erfc(-x/sqrt(2))) is
# RELATIVELY accurate on the deep negative tail; A&S is only absolutely
# accurate (1.5e-7), so below _TAIL_X the asymptotic erfc expansion
# (relative error ~(105/16)a^-8 < 4e-4 there, i.e. < a bf16 half-ulp)
# takes over. Above +_POS_SAT_X gelu(x) rounds to x in bf16.
_TAIL_X = -4.8
_POS_SAT_X = 5.55


def _fast_erf_parts_f32(xf):
    """Shared fwd/jvp computation: returns (gelu(x), e^{-x^2/2}, cdf)."""
    u = xf * INV_SQRT_2
    a = jnp.abs(u)
    e = jnp.exp(-a * a)
    t = 1.0 / (1.0 + _AS_P * a)
    poly = t * (_AS_A[0] + t * (_AS_A[1] + t * (
        _AS_A[2] + t * (_AS_A[3] + t * _AS_A[4]))))
    erf = jnp.sign(u) * (1.0 - poly * e)
    cdf = 0.5 * (1.0 + erf)
    out = xf * cdf
    # deep negative tail: relative-accuracy erfc via the asymptotic series
    ia = 1.0 / jnp.maximum(a, 1.0)
    ia2 = ia * ia
    erfc_tail = (e * ia * INV_SQRT_PI
                 * (1.0 + ia2 * (-0.5 + ia2 * (0.75 - 1.875 * ia2))))
    tail = xf < _TAIL_X
    out = jnp.where(tail, 0.5 * xf * erfc_tail, out)
    cdf = jnp.where(tail, 0.5 * erfc_tail, cdf)
    # positive saturation: gelu(x) == x at bf16 resolution well below here
    pos = xf >= _POS_SAT_X
    out = jnp.where(pos, xf, out)
    cdf = jnp.where(pos, 1.0, cdf)
    return out, e, cdf


@jax.custom_vjp
def gelu_fast_erf(x):
    out, _, _ = _fast_erf_parts_f32(x.astype(jnp.float32))
    return out.astype(x.dtype)


def _gelu_fast_erf_fwd(x):
    # residual is the INPUT in its own (bf16) dtype — the backward
    # recomputes the ~15 cheap VPU ops instead of saving an f32
    # derivative tensor (the f32 residual was measurably more HBM
    # traffic than the recompute at the flagship MLP shape)
    out, _, _ = _fast_erf_parts_f32(x.astype(jnp.float32))
    return out.astype(x.dtype), x


def _gelu_fast_erf_bwd(x, g):
    xf = x.astype(jnp.float32)
    _, e, cdf = _fast_erf_parts_f32(xf)
    d = cdf + xf * (INV_SQRT_2PI * e)        # gelu'(x) = Phi + x*phi
    return ((d * g.astype(jnp.float32)).astype(g.dtype),)


gelu_fast_erf.defvjp(_gelu_fast_erf_fwd, _gelu_fast_erf_bwd)


def gelu(x, impl: str = "erf"):
    """Dispatch by EncoderConfig.gelu_impl."""
    if impl == "fast_erf":
        return gelu_fast_erf(x)
    if impl == "tanh":
        return jax.nn.gelu(x, approximate=True)
    if impl == "erf":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(f"unknown gelu impl {impl!r}")
