"""Ring attention (parallel/ring_attention.py) on the virtual 8-device
mesh: exact parity with single-device attention, forward and gradients
(backward is autodiff through fori_loop + ppermute)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sequencing_tpu.ops.attention import attention_reference
from multimodal_sequencing_tpu.parallel.mesh import make_mesh
from multimodal_sequencing_tpu.parallel.ring_attention import ring_attention


def _inputs(b=2, h=2, s=64, d=16, seed=0):
    rng = np.random.RandomState(seed)
    q, k, v = (jnp.asarray(rng.randn(b, h, s, d).astype(np.float32) * 0.5)
               for _ in range(3))
    mask = np.ones((b, s), np.int32)
    mask[:, int(0.8 * s):] = 0
    mask[-1, int(0.4 * s):] = 0
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("ring", [2, 4, 8])
def test_ring_forward_matches_reference(ring):
    q, k, v, mask = _inputs()
    mesh = make_mesh(n_data=8 // ring, n_model=ring)
    want = attention_reference(q, k, v, mask=mask)
    got = jax.jit(lambda *a: ring_attention(
        *a, mesh=mesh, axis_name="model"))(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_ring_backward_matches_reference():
    q, k, v, mask = _inputs(s=32, seed=3)
    mesh = make_mesh(n_data=2, n_model=4)

    def ref_loss(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(q, k, v, mask=mask)))

    def ring_loss(q, k, v):
        out = ring_attention(q, k, v, mask, mesh=mesh, axis_name="model")
        return jnp.sum(jnp.sin(out))

    want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    got = jax.jit(jax.grad(ring_loss, argnums=(0, 1, 2)))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), atol=5e-5, rtol=5e-4,
            err_msg=f"d{name} mismatch")


def test_ring_rejects_indivisible_seq():
    q, k, v, mask = _inputs(s=30)
    mesh = make_mesh(n_data=2, n_model=4)
    with pytest.raises(ValueError):
        ring_attention(q, k, v, mask, mesh=mesh, axis_name="model")
