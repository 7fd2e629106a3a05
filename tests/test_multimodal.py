"""Multimodal encoder tests: CLIP towers, folding, joint encoder, training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sequencing_tpu.models.clip_visual import (
    CLIPVisionConfig, CLIPVisualTower, ModifiedResNet, VisualTransformer)
from multimodal_sequencing_tpu.models.config import (
    EncoderConfig, MultimodalConfig)
from multimodal_sequencing_tpu.models.multimodal_encoder import (
    MultimodalEncoder)
from multimodal_sequencing_tpu.models.sequencer import SequencingModel
from multimodal_sequencing_tpu.train.state import (
    make_train_state, make_optimizer)
from multimodal_sequencing_tpu.train.steps import (
    make_train_step, device_batch)
from multimodal_sequencing_tpu.parallel.mesh import make_mesh, shard_batch


def _mm_cfg(version="v1", clip="RN50", **kw):
    enc = EncoderConfig.tiny(max_position_embeddings=200)
    return MultimodalConfig(
        encoder=enc, hierarchical_version=version, max_story_length=3,
        max_seq_length=64, per_seq_max_length=12, multimodal=True,
        clip_model_name=clip, image_size=(32, 32), num_labels=3, **kw)


def _vcfg(clip):
    return (CLIPVisionConfig.tiny_rn() if clip == "RN50"
            else CLIPVisionConfig.tiny_vit())


def _mm_batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    L, N = cfg.max_seq_length, cfg.max_story_length
    ids = rng.randint(5, cfg.encoder.vocab_size, (b, L)).astype(np.int32)
    step = L // N
    for s in range(N):
        ids[:, s * step] = cfg.cls_id
    return {
        "input_ids": ids,
        "attention_mask": np.ones((b, L), np.int32),
        "token_type_ids": np.zeros((b, L), np.int32),
        "images": rng.randn(b, N, 3, 32, 32).astype(np.float32),
        "labels": np.stack([rng.permutation(N)
                            for _ in range(b)]).astype(np.int32),
        "valid": np.ones(b, bool),
    }


def test_rn50_tower_folding():
    cfg = CLIPVisionConfig.tiny_rn()
    tower = CLIPVisualTower(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).randn(6, 32, 32, 3),
                       jnp.float32)
    vars_ = tower.init(jax.random.PRNGKey(0), imgs, img_len=3)
    out = tower.apply(vars_, imgs, img_len=3,
                      mutable=["batch_stats"])[0]
    # grid = 32/32 = 1 -> 3 images x 1 patch + 1 cls = 4 tokens; channel-dup
    assert out.shape == (2, 3 * cfg.grid ** 2 + 1, 2 * cfg.output_dim)
    # skip_last_layer returns the conv grid
    grid_out = tower.apply(vars_, imgs, skip_last_layer=True, img_len=3,
                           mutable=["batch_stats"])[0]
    assert grid_out.shape == (6, cfg.grid, cfg.grid, cfg.embed_dim)


def test_vit_tower_folding():
    cfg = CLIPVisionConfig.tiny_vit()
    tower = CLIPVisualTower(cfg)
    imgs = jnp.asarray(np.random.RandomState(0).randn(6, 32, 32, 3),
                       jnp.float32)
    vars_ = tower.init(jax.random.PRNGKey(0), imgs, img_len=3)
    out = tower.apply(vars_, imgs, img_len=3)
    # grid = 32/8 = 4 -> 3*16 + 1 = 49 tokens, projected to output_dim
    assert out.shape == (2, 3 * 16 + 1, cfg.output_dim)
    skip = tower.apply(vars_, imgs, skip_last_layer=True, img_len=3)
    assert skip.shape == (2, 49, cfg.vit_width)


@pytest.mark.parametrize("clip", ["RN50", "ViT-B/32"])
def test_multimodal_encoder_shapes(clip):
    cfg = _mm_cfg(clip=clip)
    enc = MultimodalEncoder(cfg, _vcfg(clip))
    batch = _mm_batch(cfg)
    vars_ = enc.init(jax.random.PRNGKey(0), jnp.asarray(batch["input_ids"]),
                     jnp.asarray(batch["attention_mask"]),
                     jnp.asarray(batch["token_type_ids"]),
                     images=jnp.asarray(batch["images"]))
    mutable = [k for k in vars_ if k != "params"]
    lang, visn, pooled = enc.apply(
        vars_, jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["token_type_ids"]),
        images=jnp.asarray(batch["images"]),
        mutable=mutable)[0] if mutable else enc.apply(
        vars_, jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["attention_mask"]),
        jnp.asarray(batch["token_type_ids"]),
        images=jnp.asarray(batch["images"]))
    assert lang.shape == (2, 64, cfg.encoder.hidden_size)
    assert pooled.shape == (2, cfg.encoder.hidden_size)
    assert visn is not None and visn.shape[0] == 2
    assert np.isfinite(np.asarray(pooled)).all()


def test_text_part_and_img_part_modes():
    cfg = _mm_cfg(clip="ViT-B/32")
    batch = _mm_batch(cfg)
    # text-only part: no images consumed
    cfg_t = _mm_cfg(clip="ViT-B/32", multimodal_text_part=True)
    enc = MultimodalEncoder(cfg_t, _vcfg("ViT-B/32"))
    vars_ = enc.init(jax.random.PRNGKey(0),
                     jnp.asarray(batch["input_ids"]))
    lang, visn, pooled = enc.apply(vars_, jnp.asarray(batch["input_ids"]))
    assert visn is None
    # image-only: language shrinks to CLS
    cfg_i = _mm_cfg(clip="ViT-B/32", multimodal_img_part=True)
    enc_i = MultimodalEncoder(cfg_i, _vcfg("ViT-B/32"))
    vars_i = enc_i.init(jax.random.PRNGKey(0),
                        jnp.asarray(batch["input_ids"]),
                        images=jnp.asarray(batch["images"]))
    lang_i, visn_i, pooled_i = enc_i.apply(
        vars_i, jnp.asarray(batch["input_ids"]),
        images=jnp.asarray(batch["images"]))
    assert lang_i.shape[1] == 1
    assert visn_i.shape[1] == 3 * 16 + 1


@pytest.mark.parametrize("clip", ["RN50", "ViT-B/32"])
def test_multimodal_train_step_descends(clip):
    cfg = _mm_cfg(clip=clip)
    batch = _mm_batch(cfg, b=2)
    mesh = make_mesh(n_data=1)
    model = SequencingModel(cfg, _vcfg(clip))
    state = make_train_state(
        model, jax.random.PRNGKey(0), batch,
        tx=make_optimizer(learning_rate=1e-3, warmup_steps=1,
                          total_steps=30))
    if clip == "RN50":
        assert "batch_stats" in state.model_state
    step = make_train_step(cfg, mesh)
    db = shard_batch(device_batch(batch), mesh)
    rng = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, metrics = step(state, db, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_uint8_image_path(tokenizer):
    """uint8 loader layout -> on-device preprocessing matches the float
    pipeline end to end."""
    from multimodal_sequencing_tpu.ops.preprocess import (
        preprocess_uint8_images)
    cfg = _mm_cfg(clip="ViT-B/32")
    enc = MultimodalEncoder(cfg, _vcfg("ViT-B/32"))
    batch = _mm_batch(cfg)
    rng = np.random.RandomState(7)
    u8 = rng.randint(0, 255, (2, 3, 32, 32, 3), np.uint8)
    # float pipeline equivalent
    from multimodal_sequencing_tpu.data.images import (
        IMAGENET_MEAN, IMAGENET_STD)
    f32 = ((u8.astype(np.float32) / 255.0 - IMAGENET_MEAN)
           / IMAGENET_STD).transpose(0, 1, 4, 2, 3)
    vars_ = enc.init(jax.random.PRNGKey(0), jnp.asarray(batch["input_ids"]),
                     images=jnp.asarray(f32))
    out_f = enc.apply(vars_, jnp.asarray(batch["input_ids"]),
                      images=jnp.asarray(f32))
    out_u = enc.apply(vars_, jnp.asarray(batch["input_ids"]),
                      images=jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(out_f[2]), np.asarray(out_u[2]),
                               atol=1e-4, rtol=1e-4)


def test_prefetch_loader_order_and_errors(wikihow_dir, tokenizer):
    from multimodal_sequencing_tpu.data import (
        HeadPredDataset, WikiHowGeneralProcessor)
    from multimodal_sequencing_tpu.data.datasets import data_loader, prefetch
    ex = WikiHowGeneralProcessor(data_dir=wikihow_dir).get_train_examples()
    ds = HeadPredDataset(ex, tokenizer, max_length=64, per_seq_max_length=8,
                         seed=0)
    plain = [b["input_ids"] for b in data_loader(ds, 4, shuffle=True,
                                                 seed=1)]
    fetched = [b["input_ids"] for b in prefetch(
        data_loader(ds, 4, shuffle=True, seed=1))]
    assert len(plain) == len(fetched)
    for a, b in zip(plain, fetched):
        np.testing.assert_array_equal(a, b)

    def boom():
        yield {"x": 1}
        raise RuntimeError("loader exploded")
    it = prefetch(boom())
    next(it)
    with pytest.raises(RuntimeError):
        list(it)


def test_visualbert_pixels_reach_logits():
    """Wiring sensitivity gate for the VisualBERT pixel path: at random
    init, bright-vs-dark images must move the pairwise logits and produce
    nonzero gradients through the vision tower. (The end-metric quality
    gate for visualbert rides the regional-sidecar path — a from-scratch
    resnet18 pooled token doesn't BOOTSTRAP a brightness signal within
    test budget — so this test pins the pixels wiring itself.)"""
    import jax
    from multimodal_sequencing_tpu.models.config import (
        EncoderConfig, MultimodalConfig)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel

    enc = EncoderConfig.tiny(max_position_embeddings=120)
    cfg = MultimodalConfig(
        encoder=enc, hierarchical_version="v0", num_labels=2,
        multimodal=True, multimodal_model_type="visualbert",
        vision_model="resnet18", max_story_length=2,
        max_seq_length=64, per_seq_max_length=12)
    model = SequencingModel(cfg)
    ids = np.full((2, 64), 5, np.int32)
    ids[:, 0] = 0
    ids[:, 32] = 0
    mask = np.ones((2, 64), np.int32)
    types = np.zeros((2, 64), np.int32)
    types[:, 32:] = 1
    imgs = np.concatenate([np.full((1, 2, 16, 16, 3), 200, np.uint8),
                           np.full((1, 2, 16, 16, 3), 30, np.uint8)])
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(ids), jnp.asarray(mask),
        jnp.asarray(types), images=jnp.asarray(imgs), deterministic=True)
    out = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask),
                      jnp.asarray(types), images=jnp.asarray(imgs),
                      deterministic=True)
    logits = np.asarray(out["logits"])
    assert np.abs(logits[0] - logits[1]).max() > 1e-4, logits

    def loss(p):
        o = model.apply({**variables, "params": p}, jnp.asarray(ids),
                        jnp.asarray(mask), jnp.asarray(types),
                        images=jnp.asarray(imgs), deterministic=True)
        return o["logits"][:, 0].sum()

    g = jax.grad(loss)(variables["params"])
    vis_max = max(
        float(jnp.abs(v).max())
        for path, v in jax.tree_util.tree_leaves_with_path(g)
        if "vision" in "/".join(str(k) for k in path).lower())
    assert vis_max > 0.0
