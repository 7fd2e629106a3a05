"""Aux-objective (`hl_include_objectives`) head and loss tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_sequencing_tpu.models.config import (
    EncoderConfig, MultimodalConfig)
from multimodal_sequencing_tpu.models.sequencer import SequencingModel
from multimodal_sequencing_tpu.train.steps import compute_loss
from multimodal_sequencing_tpu.train.objectives import plan_itm_swap


def _cfg(objs):
    enc = EncoderConfig.tiny(max_position_embeddings=120)
    return MultimodalConfig(encoder=enc, hierarchical_version="v1",
                            max_story_length=4, max_seq_length=64,
                            per_seq_max_length=12,
                            hl_include_objectives=objs)


def _batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    L, N = cfg.max_seq_length, cfg.max_story_length
    ids = rng.randint(5, cfg.encoder.vocab_size, (b, L)).astype(np.int32)
    step = L // N
    for s in range(N):
        ids[:, s * step] = cfg.cls_id
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((b, L), jnp.int32),
        "token_type_ids": jnp.zeros((b, L), jnp.int32),
        "labels": jnp.asarray(
            np.stack([rng.permutation(N) for _ in range(b)]), jnp.int32),
        "valid": jnp.ones(b, bool),
    }


def test_head_and_binary_aux():
    cfg = _cfg(["head", "binary", "heatmap_pairwise_ranking"])
    model = SequencingModel(cfg)
    batch = _batch(cfg)
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["attention_mask"], batch["token_type_ids"])
    out = model.apply(params, batch["input_ids"], batch["attention_mask"],
                      batch["token_type_ids"])
    assert out["head_logits"].shape == (2, 4)
    assert out["bin_logits"].shape == (2, 6, 2)
    loss, metrics = compute_loss(cfg, out, batch)
    assert np.isfinite(float(loss))
    assert "aux_head" in metrics and "aux_binary" in metrics
    assert float(loss) > float(metrics["loss"] - loss) * 0  # sanity


def test_mlm_aux():
    cfg = _cfg(["mlm"])
    model = SequencingModel(cfg)
    batch = _batch(cfg)
    mlm_labels = np.full(batch["input_ids"].shape, cfg.mlm_ignore_index,
                         np.int32)
    mlm_labels[:, 5] = 7
    batch["mlm_labels"] = jnp.asarray(mlm_labels)
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["attention_mask"], batch["token_type_ids"])
    out = model.apply(params, batch["input_ids"], batch["attention_mask"],
                      batch["token_type_ids"])
    assert out["mlm_logits"].shape == (2, 64, cfg.encoder.vocab_size)
    loss, metrics = compute_loss(cfg, out, batch)
    assert "aux_mlm" in metrics
    assert np.isfinite(float(loss))


def test_itm_plan_and_loss():
    rng = np.random.default_rng(0)
    images = np.arange(4 * 3 * 2).reshape(4, 3, 2).astype(np.float32)
    new, targets = plan_itm_swap(images, rng)
    assert new.shape == images.shape
    for i, t in enumerate(targets):
        if t == 1:
            np.testing.assert_array_equal(new[i], images[i])
        else:
            assert not np.array_equal(new[i], images[i])

    cfg = _cfg(["itm"])
    model = SequencingModel(cfg)
    batch = _batch(cfg)
    batch["itm_targets"] = jnp.asarray([1, 0], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"],
                        batch["attention_mask"], batch["token_type_ids"])
    out = model.apply(params, batch["input_ids"], batch["attention_mask"],
                      batch["token_type_ids"])
    assert out["itm_logits"].shape == (2, 2)
    loss, metrics = compute_loss(cfg, out, batch)
    assert "aux_itm" in metrics
