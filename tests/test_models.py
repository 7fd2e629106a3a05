"""Model-layer tests: encoder shapes, head behavior, CLS gather, decode ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sequencing_tpu.models.config import (
    EncoderConfig, MultimodalConfig)
from multimodal_sequencing_tpu.models.encoder import TextEncoder
from multimodal_sequencing_tpu.models.heads import (
    ClassificationHead, HeatmapHead, PointerHead, gather_step_cls)
from multimodal_sequencing_tpu.ops.attention import (
    attention_reference, multihead_attention)
from multimodal_sequencing_tpu.ops.order_decode import (
    pairs_to_heatmap, exhaustive_order_decode, greedy_order_decode,
    topological_decode_batch, all_permutations)
from multimodal_sequencing_tpu.utils.heatmap import render_order_heatmap


CFG = EncoderConfig.tiny()


def _dummy_batch(b=2, s=32, n_cls=3, seed=0):
    rng = np.random.RandomState(seed)
    ids = rng.randint(5, CFG.vocab_size, (b, s)).astype(np.int32)
    # plant CLS tokens at step starts
    starts = [0, 10, 20]
    for st in starts[:n_cls]:
        ids[:, st] = 0  # cls_id
    mask = np.ones((b, s), np.int32)
    mask[:, 28:] = 0
    ids[:, 28:] = 1  # pad
    types = np.zeros((b, s), np.int32)
    return jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types)


def test_text_encoder_shapes():
    ids, mask, types = _dummy_batch()
    model = TextEncoder(CFG)
    params = model.init(jax.random.PRNGKey(0), ids, mask, types)
    seq, pooled = model.apply(params, ids, mask, types)
    assert seq.shape == (2, 32, CFG.hidden_size)
    assert pooled.shape == (2, CFG.hidden_size)
    assert np.isfinite(np.asarray(seq)).all()


def test_attention_reference_masking():
    rng = jax.random.PRNGKey(1)
    q = jax.random.normal(rng, (2, 4, 8, 16))
    k = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 16))
    v = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8, 16))
    mask = jnp.ones((2, 8), jnp.int32).at[:, 4:].set(0)
    out = attention_reference(q, k, v, mask=mask)
    # masked keys don't affect output: perturb masked v positions
    v2 = v.at[:, :, 4:].add(100.0)
    out2 = attention_reference(q, k, v2, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
    # dispatch falls back to reference off-TPU
    out3 = multihead_attention(q, k, v, mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out3), atol=1e-5)
    # bias and mask agree
    bias = jnp.zeros((2, 1, 8, 8)).at[:, :, :, 4:].set(-1e9)
    out4 = attention_reference(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out4), atol=1e-5)


def test_gather_step_cls():
    ids, mask, types = _dummy_batch(n_cls=3)
    seq = jnp.arange(2 * 32, dtype=jnp.float32).reshape(2, 32, 1)
    seq = jnp.broadcast_to(seq, (2, 32, 4))
    reprs, present = gather_step_cls(seq, ids, cls_id=0, n_steps=5)
    assert reprs.shape == (2, 5, 4)
    assert present.tolist() == [[True] * 3 + [False] * 2] * 2
    # gathered values are the hidden states at positions 0, 10, 20
    np.testing.assert_allclose(np.asarray(reprs[0, :3, 0]), [0, 10, 20])


def test_classification_head():
    head = ClassificationHead(num_labels=2, hidden_size=16)
    x = jnp.ones((4, 16))
    params = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(params, x)
    assert logits.shape == (4, 2)


def test_heatmap_head_range_and_loss():
    cfg = MultimodalConfig(encoder=CFG, max_story_length=4)
    head = HeatmapHead(cfg)
    reprs = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    present = jnp.ones((2, 4), bool)
    params = head.init(jax.random.PRNGKey(1), reprs, present)
    hm = head.apply(params, reprs, present)
    assert hm.shape == (2, 4, 4)
    assert (np.asarray(hm) >= 0).all() and (np.asarray(hm) <= 1).all()
    # v3 signed
    cfg3 = MultimodalConfig(encoder=CFG, max_story_length=4,
                            hierarchical_version="v3")
    hm3 = HeatmapHead(cfg3).apply(
        HeatmapHead(cfg3).init(jax.random.PRNGKey(1), reprs, present),
        reprs, present)
    assert (np.asarray(hm3) >= -1).all() and (np.asarray(hm3) <= 1).all()

    target = jnp.asarray(np.stack([
        render_order_heatmap([0, 1, 2, 3]),
        render_order_heatmap([3, 2, 1, 0])]))
    loss = HeatmapHead.loss(hm, target, present)
    assert np.isfinite(float(loss)) and float(loss) > 0
    order_labels = jnp.asarray([[0, 1, 2, 3], [3, 2, 1, 0]])
    rloss = HeatmapHead.pairwise_ranking_loss(hm, order_labels, present)
    assert np.isfinite(float(rloss))


@pytest.mark.parametrize("version", ["p0", "p1"])
def test_pointer_head_learns_shapes(version):
    cfg = MultimodalConfig(encoder=CFG, max_story_length=4,
                           hierarchical_version=version)
    head = PointerHead(cfg)
    reprs = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16))
    present = jnp.ones((2, 4), bool)
    labels = jnp.asarray([[1, 0, 3, 2], [0, 1, 2, 3]])
    params = head.init(jax.random.PRNGKey(1), reprs, present, labels)
    logits = head.apply(params, reprs, present, labels)
    assert logits.shape == (2, 4, 4)
    loss = PointerHead.loss(logits, labels, present)
    assert np.isfinite(float(loss))
    seq = PointerHead.decode(logits, present)
    assert seq.shape == (2, 4)
    assert sorted(np.asarray(seq)[0].tolist()) == [0, 1, 2, 3]


def test_pairs_to_heatmap_and_exhaustive_decode():
    # perfect pairwise scores for order [2,0,1]: p(i before j)
    order = [2, 0, 1]
    n = 3
    pos = {s: t for t, s in enumerate(order)}
    idx = []
    scores = []
    for i in range(n):
        for j in range(n):
            if i != j:
                idx.append((i, j))
                scores.append(0.9 if pos[i] < pos[j] else 0.1)
    hm = pairs_to_heatmap(jnp.asarray([scores]), np.asarray(idx), n)
    assert hm.shape == (1, 3, 3)
    pred = exhaustive_order_decode(hm, n, mode="allpairs")
    assert pred[0].tolist() == order
    pred2 = exhaustive_order_decode(hm, n, mode="chain_logprob")
    assert pred2[0].tolist() == order
    pred3 = greedy_order_decode(hm, n)
    assert pred3[0].tolist() == order
    pred4 = topological_decode_batch(hm, n)
    assert pred4[0].tolist() == order


def test_exhaustive_decode_matches_reference_beam_objective():
    # On a rendered heatmap the chain_logprob argmax equals the true order.
    orders = [[1, 2, 3, 0, 4], [4, 3, 2, 1, 0], [0, 1, 2, 3, 4]]
    hms = np.stack([render_order_heatmap(o, soft=True) for o in orders])
    pred = exhaustive_order_decode(jnp.asarray(hms), 5, mode="chain_logprob")
    for p, o in zip(np.asarray(pred), orders):
        assert p.tolist() == o


def test_all_permutations_lexicographic():
    p = all_permutations(3)
    assert p.shape == (6, 3)
    assert p[0].tolist() == [0, 1, 2] and p[-1].tolist() == [2, 1, 0]


def test_device_decoders_vs_bruteforce():
    """Device decode programs vs brute-force optima on random heatmaps."""
    from itertools import permutations
    rng = np.random.RandomState(11)
    for n in (3, 4):
        hms = rng.rand(6, n, n).astype(np.float32)
        for b in range(6):
            np.fill_diagonal(hms[b], 0.0)
        # exhaustive chain_logprob == brute force argmax
        pred = np.asarray(exhaustive_order_decode(
            jnp.asarray(hms), n, mode="chain_logprob"))
        for b in range(6):
            best, best_s = None, -np.inf
            for perm in permutations(range(n)):
                s = sum(np.log(hms[b, perm[t], perm[t + 1]] + 1e-8)
                        for t in range(n - 1))
                if s > best_s:
                    best, best_s = list(perm), s
            assert pred[b].tolist() == best
        # allpairs mode == brute force over pair sums
        pred2 = np.asarray(exhaustive_order_decode(
            jnp.asarray(hms), n, mode="allpairs"))
        for b in range(6):
            best, best_s = None, -np.inf
            for perm in permutations(range(n)):
                s = sum(np.log(hms[b, perm[i], perm[j]] + 1e-8)
                        for i in range(n) for j in range(i + 1, n))
                if s > best_s:
                    best, best_s = list(perm), s
            assert pred2[b].tolist() == best
        # greedy always emits a permutation
        g = np.asarray(greedy_order_decode(jnp.asarray(hms), n))
        for b in range(6):
            assert sorted(g[b].tolist()) == list(range(n))
        # Kahn decode emits permutations too
        t = np.asarray(topological_decode_batch(jnp.asarray(hms), n))
        for b in range(6):
            assert sorted(t[b].tolist()) == list(range(n))
