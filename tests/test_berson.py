"""BERSON ordering wrapper tests: packing, forward, training, beam search."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sequencing_tpu.data.packing import StoryPacker
from multimodal_sequencing_tpu.data.datasets import BersonDataset, data_loader
from multimodal_sequencing_tpu.data import WikiHowGeneralProcessor
from multimodal_sequencing_tpu.models.berson import (
    BersonOrdering, berson_pairs, _sentence_membership)
from multimodal_sequencing_tpu.models.config import (
    EncoderConfig, MultimodalConfig)
from multimodal_sequencing_tpu.train.state import make_optimizer, TrainState
from multimodal_sequencing_tpu.utils.metrics import partial_match

import optax


def _cfg(n=4, **kw):
    enc = EncoderConfig.tiny(max_position_embeddings=100)
    return MultimodalConfig(encoder=enc, max_story_length=n,
                            max_seq_length=64, per_seq_max_length=12, **kw)


def test_berson_pairs_order():
    pairs = berson_pairs(3)
    assert pairs.tolist() == [[0, 1], [0, 2], [1, 2], [1, 0], [2, 0], [2, 1]]
    _, pair_idx, side_idx = _sentence_membership(3)
    # each sentence is in 2*(n-1) = 4 slots
    assert pair_idx.shape == (3, 4)
    for s in range(3):
        for p, side in zip(pair_idx[s], side_idx[s]):
            assert pairs[p][side] == s


def test_pack_berson_story(tokenizer):
    packer = StoryPacker(tokenizer, max_seq_length=64, per_seq_max_length=10)
    texts = [f"step number {i} has text" for i in range(4)]
    label = [2, 0, 3, 1]
    item = packer.pack_berson_story(texts, label)
    P = 12
    assert item["input_ids"].shape == (P, 20)
    assert item["pairs_list"].shape == (P, 2)
    assert item["ground_truth"].tolist() == label
    # pairwise label for pair (i, j): 1 iff time(i) < time(j) in the chain
    pos = {s: label.index(s) for s in range(4)}
    for p, (i, j) in enumerate(item["pairs_list"].tolist()):
        assert item["pairwise_labels"][p] == int(pos[i] < pos[j])
    # sep positions bound spans of nonpad tokens
    ii = item["input_ids"][0]
    s0, s1 = item["sep_positions"][0]
    assert ii[s0] == tokenizer.sep_token_id
    assert ii[s1] == tokenizer.sep_token_id


def _berson_batch(tokenizer, n=4, b=2, seed=0):
    rng = np.random.RandomState(seed)
    packer = StoryPacker(tokenizer, max_seq_length=64, per_seq_max_length=8)
    items = []
    for k in range(b):
        texts = [f"alpha {k} beta {i} gamma delta" for i in range(n)]
        label = rng.permutation(n).tolist()
        item = packer.pack_berson_story(texts, label)
        item["labels"] = np.asarray(label, np.int32)
        items.append(item)
    batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
             for k in items[0] if k != "labels"}
    batch["labels"] = np.stack([it["labels"] for it in items])
    return batch


def test_berson_forward_and_beam(tokenizer):
    cfg = _cfg(4)
    model = BersonOrdering(cfg, beam_size=4)
    batch = _berson_batch(tokenizer)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
    assert out["pointer_logits"].shape == (2, 4, 4)
    pred = model.apply(params, batch, method=BersonOrdering.beam_search)
    assert pred.shape == (2, 4)
    for row in np.asarray(pred):
        assert sorted(row.tolist()) == [0, 1, 2, 3]


def test_berson_with_heatmap_aux(tokenizer):
    cfg = _cfg(4, wrapper_model_with_heatmap=True)
    model = BersonOrdering(cfg, beam_size=4)
    batch = _berson_batch(tokenizer)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert "heatmap_loss" in out and np.isfinite(float(out["heatmap_loss"]))
    assert out["heatmap"].shape == (2, 4, 4)


def test_berson_overfit_and_decode(tokenizer):
    cfg = _cfg(4)
    model = BersonOrdering(cfg, beam_size=4)
    batch = _berson_batch(tokenizer, b=4, seed=3)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    tx = make_optimizer(learning_rate=3e-3, warmup_steps=2, total_steps=200)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), model_state={}, tx=tx,
                       apply_fn=model.apply)

    @jax.jit
    def step(state, rng):
        rng = jax.random.fold_in(rng, state.step)
        def loss_fn(p):
            out = model.apply({"params": p}, batch, deterministic=False,
                              rngs={"dropout": rng})
            return out["loss"], out
        (loss, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(60):
        state, loss = step(state, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    pred = model.apply({"params": state.params}, batch,
                       method=BersonOrdering.beam_search)
    labels = np.asarray(batch["labels"])
    pm = np.mean([partial_match(p.tolist(), l.tolist())
                  for p, l in zip(np.asarray(pred), labels)])
    assert pm > 0.5, f"berson overfit partial match {pm} (chance 0.25)"


def test_berson_dataset(wikihow_dir, tokenizer):
    proc = WikiHowGeneralProcessor(data_dir=wikihow_dir)
    ds = BersonDataset(proc.get_train_examples(), tokenizer, max_length=64,
                       per_seq_max_length=8, seed=0)
    item = ds[0]
    assert item["input_ids"].shape == (20, 16)  # 5*4 pairs, 2*8 len
    batch = next(data_loader(ds, batch_size=2))
    assert batch["input_ids"].shape == (2, 20, 16)
    assert batch["ground_truth"].shape == (2, 5)


def test_berson_multimodal_clip(tokenizer):
    from multimodal_sequencing_tpu.models.clip_visual import CLIPVisionConfig
    cfg = _cfg(3, multimodal=True, clip_model_name="ViT-B/32",
               image_size=(32, 32))
    model = BersonOrdering(cfg, CLIPVisionConfig.tiny_vit(), beam_size=2)
    batch = _berson_batch(tokenizer, n=3, b=2)
    rng = np.random.RandomState(0)
    batch["images"] = jnp.asarray(
        rng.randn(2, 3, 3, 32, 32).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
    pred = model.apply(params, batch, method=BersonOrdering.beam_search)
    for row in np.asarray(pred):
        assert sorted(row.tolist()) == [0, 1, 2]


def test_berson_time_contrastive_and_multimodal_loss(tokenizer):
    from multimodal_sequencing_tpu.models.clip_visual import CLIPVisionConfig
    cfg = _cfg(4, multimodal=True, clip_model_name="ViT-B/32",
               image_size=(32, 32))
    model = BersonOrdering(cfg, CLIPVisionConfig.tiny_vit(), beam_size=2,
                           time_contrastive=True, multimodal_loss=True)
    batch = _berson_batch(tokenizer, n=4, b=2)
    rng = np.random.RandomState(0)
    batch["images"] = jnp.asarray(
        rng.randn(2, 4, 3, 32, 32).astype(np.float32))
    batch["tc_anchor"] = jnp.asarray([1, 2], jnp.int32)
    batch["tc_positive"] = jnp.asarray([0, 3], jnp.int32)
    batch["tc_negative"] = jnp.asarray([3, 0], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert "time_contrastive_loss" in out
    assert "img_pairwise_loss" in out
    assert np.isfinite(float(out["loss"]))


def test_berson_variable_length_stories(tokenizer):
    """min_story_length < max_story_length: packing pads to the static
    shapes, training losses stay finite and dead-pair-free, and beam search
    returns a valid permutation of each TRUE length with -1 tail padding
    (the reference runs per-story T = num_sen, modeling_bert.py:1472)."""
    n = 5
    cfg = _cfg(n)
    rng = np.random.RandomState(0)
    packer = StoryPacker(tokenizer, max_seq_length=64, per_seq_max_length=8)
    items, lens = [], [3, 5, 4]
    for k, m in enumerate(lens):
        texts = [f"alpha {k} beta {i} gamma delta" for i in range(m)]
        label = rng.permutation(m).tolist()
        item = packer.pack_berson_story(texts, label, max_story_length=n)
        assert item["input_ids"].shape == (n * (n - 1),
                                           2 * packer.per_seq_max_length)
        assert item["mask_cls"].tolist() == [1] * m + [0] * (n - m)
        assert int(item["pairs_num"]) == m * (m - 1)
        assert item["ground_truth"].tolist() == label + list(range(m, n))
        # dead pairs are all-pad with label 0
        for p, (i, j) in enumerate(item["pairs_list"].tolist()):
            if i >= m or j >= m:
                assert item["attention_mask"][p].sum() == 0
                assert item["pairwise_labels"][p] == 0
        items.append(item)
    batch = {k: jnp.asarray(np.stack([it[k] for it in items]))
             for k in items[0]}

    model = BersonOrdering(cfg, beam_size=4)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert np.isfinite(float(out["loss"]))
    pred = np.asarray(model.apply(params, batch,
                                  method=BersonOrdering.beam_search))
    assert pred.shape == (3, n)
    for row, m in zip(pred, lens):
        assert sorted(row[:m].tolist()) == list(range(m)), (row, m)
        assert (row[m:] == -1).all(), (row, m)


def test_berson_short_story_loss_matches_small_model(tokenizer):
    """A story of length m packed to max N must produce the same loss as
    the same story packed to max m (dead steps fully masked)."""
    m = 3
    rng = np.random.RandomState(1)
    packer = StoryPacker(tokenizer, max_seq_length=64, per_seq_max_length=8)
    texts = [f"alpha beta {i} gamma delta" for i in range(m)]
    label = rng.permutation(m).tolist()

    losses = {}
    for n in (m, 5):
        cfg = _cfg(n)
        item = packer.pack_berson_story(texts, label, max_story_length=n)
        batch = {k: jnp.asarray(np.asarray(v)[None]) for k, v in item.items()}
        model = BersonOrdering(cfg, beam_size=4)
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        losses[n] = (float(out["pointer_loss"]), float(out["pairwise_loss"]))
    # pairwise loss must match exactly (same true pairs, masked mean);
    # pointer loss matches because padded positions gather dead nodes
    np.testing.assert_allclose(losses[m][1], losses[5][1], rtol=1e-4)


def test_berson_inner_dispatch_visualbert_and_naive(tokenizer):
    """BERSON over VisualBERT / naive inner encoders
    (`modeling_bert.py:1253-1306`): forward + beam decode work and the
    losses differ across the three inner model types on the same batch,
    proving the dispatch is real (the reference's naive branch is broken
    there; see BersonOrdering.setup)."""
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 3, 3, 32, 32).astype(np.float32))
    losses = {}
    for mt in ("visualbert", "naive"):
        cfg = _cfg(3, multimodal=True, multimodal_model_type=mt,
                   vision_model="resnet18", image_size=(32, 32))
        model = BersonOrdering(cfg, beam_size=2)
        batch = _berson_batch(tokenizer, n=3, b=2)
        batch["images"] = images
        variables = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(variables, batch)
        losses[mt] = float(out["loss"])
        assert np.isfinite(losses[mt]), mt
        pred = model.apply(variables, batch,
                           method=BersonOrdering.beam_search)
        for row in np.asarray(pred):
            assert sorted(row.tolist()) == [0, 1, 2], mt

    from multimodal_sequencing_tpu.models.clip_visual import CLIPVisionConfig
    cfg = _cfg(3, multimodal=True, multimodal_model_type="clip",
               clip_model_name="ViT-B/32", image_size=(32, 32))
    model = BersonOrdering(cfg, CLIPVisionConfig.tiny_vit(), beam_size=2)
    batch = _berson_batch(tokenizer, n=3, b=2)
    batch["images"] = images
    variables = model.init(jax.random.PRNGKey(0), batch)
    losses["clip"] = float(model.apply(variables, batch)["loss"])
    assert len({round(v, 8) for v in losses.values()}) == 3, losses
