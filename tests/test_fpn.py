"""Detectron2-style FPN tower + ROI extraction (models/fpn.py,
tools/extract_roi_features.py) — the reference's `--vision_model
detectron2_*` / `extract_maskrcnn_features.py` surface rebuilt
TPU-native."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sequencing_tpu.models.fpn import (FPNVisionTower, roi_align,
                                                  build_pooled_vision_tower)


def test_roi_align_constant_and_ramp():
    # constant map: any box aligns to the constant
    c = jnp.full((16, 16, 3), 2.5)
    boxes = jnp.asarray([[0.1, 0.2, 0.8, 0.9], [0.0, 0.0, 1.0, 1.0]])
    out = roi_align(c, boxes, output_size=4)
    assert out.shape == (2, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(out), 2.5, atol=1e-6)

    # linear ramp along x: interior samples reproduce the ramp exactly
    # (bilinear interpolation of a linear function is exact)
    xs = jnp.arange(16, dtype=jnp.float32)
    ramp = jnp.broadcast_to(xs[None, :, None], (16, 16, 1))
    box = jnp.asarray([[0.25, 0.25, 0.75, 0.75]])
    s = 8
    got = np.asarray(roi_align(ramp, box, output_size=s))[0, 0, :, 0]
    # expected pixel-space x coords of the sample centers
    x0, x1 = 0.25 * 16 - 0.5, 0.75 * 16 - 0.5
    exp = x0 + (np.arange(s) + 0.5) / s * (x1 - x0)
    np.testing.assert_allclose(got, exp, atol=1e-5)


def test_tower_modes_shapes_and_jit():
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                       jnp.float32)
    pooled_tower = FPNVisionTower(backbone_name="resnet18", fpn_channels=16,
                                  feature_dim=32)
    v = pooled_tower.init(jax.random.PRNGKey(0), imgs)
    out = jax.jit(lambda v, x: pooled_tower.apply(v, x))(v, imgs)
    assert out.shape[0] == 2 and out.ndim == 2 and out.shape[1] > 0

    k = 4
    reg_tower = FPNVisionTower(backbone_name="resnet18", fpn_channels=16,
                               feature_dim=32, num_regional_features=k)
    v2 = reg_tower.init(jax.random.PRNGKey(0), imgs)
    full, reg, scores, boxes = jax.jit(
        lambda v, x: reg_tower.apply(v, x))(v2, imgs)
    assert full.shape[0] == 2 and full.ndim == 2
    assert reg.shape == (2, k, 32)
    assert scores.shape == (2, k)
    b = np.asarray(boxes)
    assert b.shape == (2, k, 4)
    assert (b >= 0).all() and (b <= 1).all()
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()
    # scores sorted descending per image (top_k contract)
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_build_pooled_vision_tower_dispatch():
    t = build_pooled_vision_tower("detectron2_COCO-Detection/faster_rcnn",
                                  dtype=jnp.float32)
    assert isinstance(t, FPNVisionTower)
    from multimodal_sequencing_tpu.models.resnet import ResNetBackbone
    t2 = build_pooled_vision_tower("resnet18", dtype=jnp.float32)
    assert isinstance(t2, ResNetBackbone)


def test_visualbert_inline_roi_forward():
    """VisualBERT with detectron2 vision model + K regional features and
    no sidecars computes ROI features in-model (reference Detectron2Wrapper
    regional mode, multimodal_utils.py:93-152)."""
    from multimodal_sequencing_tpu.models.config import (EncoderConfig,
                                                         MultimodalConfig)
    from multimodal_sequencing_tpu.models.visualbert import VisualBERTEncoder

    cfg = MultimodalConfig(
        encoder=EncoderConfig.tiny(), multimodal=True,
        multimodal_model_type="visualbert",
        vision_model="detectron2_tiny", num_img_regional_features=3,
        max_story_length=3, image_size=(32, 32))
    model = VisualBERTEncoder(cfg)
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(5, 900, (2, 12)), jnp.int32)
    # uint8 convention is HWC stacks: (B, N, H, W, 3)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 3, 32, 32, 3)), jnp.uint8)
    variables = model.init(jax.random.PRNGKey(0), ids, images=imgs)
    lang, visn, pooled = model.apply(variables, ids, images=imgs)
    # 3 steps x (1 pooled + 3 regional) = 12 visual tokens
    assert visn.shape == (2, 12, cfg.encoder.hidden_size)
    assert lang.shape == (2, 12, cfg.encoder.hidden_size)
    assert np.isfinite(np.asarray(pooled)).all()


def test_roi_extractor_writes_loadable_sidecars(wikihow_dir):
    from multimodal_sequencing_tpu.tools.extract_img_features import (
        collect_story_image_paths)
    from multimodal_sequencing_tpu.tools.extract_roi_features import (
        extract_roi_sidecars)
    from multimodal_sequencing_tpu.data.images import load_maskrcnn_sidecar

    paths = collect_story_image_paths(wikihow_dir, "wikihow", "dev")[:4]
    assert paths
    n = extract_roi_sidecars(paths, num_regional_features=3,
                             backbone="resnet18", image_size=(64, 64),
                             batch_size=2, seed=0)
    assert n == len(paths)
    feats = load_maskrcnn_sidecar(paths[0], 3)
    assert feats is not None and feats.shape == (3, 2048)
    assert np.isfinite(feats).all()

    # deterministic: the identical extraction call (same seed, same
    # batching) reproduces bit-for-bit
    first = feats.copy()
    extract_roi_sidecars(paths, num_regional_features=3,
                         backbone="resnet18", image_size=(64, 64),
                         batch_size=2, seed=0)
    again = load_maskrcnn_sidecar(paths[0], 3)
    np.testing.assert_array_equal(first, again)


def test_dataset_consumes_roi_sidecars(wikihow_dir, tokenizer):
    """End to end: extractor sidecars -> dataset regional features batch
    key (the modality the reference produced with detectron2)."""
    from multimodal_sequencing_tpu.tools.extract_img_features import (
        collect_story_image_paths)
    from multimodal_sequencing_tpu.tools.extract_roi_features import (
        extract_roi_sidecars)
    from multimodal_sequencing_tpu.data.datasets import SortDataset
    from multimodal_sequencing_tpu.data.registry import get_processor

    paths = collect_story_image_paths(wikihow_dir, "wikihow", "dev")
    extract_roi_sidecars(paths, num_regional_features=2,
                         backbone="resnet18", image_size=(64, 64),
                         batch_size=4, seed=0)
    proc = get_processor("wikihow_sort", data_dir=wikihow_dir,
                         paired_with_image=True)
    ds = SortDataset(proc.get_dev_examples(), tokenizer,
                     max_story_length=5, max_length=96,
                     per_seq_max_length=12, multimodal=True,
                     image_size=(32, 32), num_img_regional_features=2,
                     seed=0)
    item = ds[0]
    assert "img_regional_features" in item
    assert item["img_regional_features"].shape == (5, 2, 2048)
    assert np.isfinite(item["img_regional_features"]).all()


def test_visualbert_inline_roi_no_full_img():
    """include_full_img_features=False: the top ROI doubles as the
    per-step image feature and K more follow as regional tokens
    (reference multimodal_utils.py:146-152)."""
    from multimodal_sequencing_tpu.models.config import (EncoderConfig,
                                                         MultimodalConfig)
    from multimodal_sequencing_tpu.models.visualbert import VisualBERTEncoder

    cfg = MultimodalConfig(
        encoder=EncoderConfig.tiny(), multimodal=True,
        multimodal_model_type="visualbert",
        vision_model="detectron2_tiny", num_img_regional_features=2,
        include_full_img_features=False,
        max_story_length=3, image_size=(32, 32))
    model = VisualBERTEncoder(cfg)
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(5, 900, (2, 12)), jnp.int32)
    imgs = jnp.asarray(rng.randint(0, 255, (2, 3, 32, 32, 3)), jnp.uint8)
    variables = model.init(jax.random.PRNGKey(0), ids, images=imgs)
    lang, visn, pooled = model.apply(variables, ids, images=imgs)
    # 3 steps x (1 ROI-as-image + 2 regional) = 9 visual tokens
    assert visn.shape == (2, 9, cfg.encoder.hidden_size)
    assert np.isfinite(np.asarray(pooled)).all()


def test_sidecar_features_reach_the_model(wikihow_dir, tokenizer):
    """Precomputed ROI sidecars flow dataset -> batch -> train/eval step ->
    VisualBERT regional tokens (they must NOT be silently dropped or
    recomputed inline)."""
    from multimodal_sequencing_tpu.tools.extract_img_features import (
        collect_story_image_paths)
    from multimodal_sequencing_tpu.tools.extract_roi_features import (
        extract_roi_sidecars)
    from multimodal_sequencing_tpu.data.datasets import (PureClassDataset,
                                                         data_loader)
    from multimodal_sequencing_tpu.data.registry import get_processor
    from multimodal_sequencing_tpu.models.config import (EncoderConfig,
                                                         MultimodalConfig)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh, shard_batch
    from multimodal_sequencing_tpu.train.state import (make_train_state,
                                                       make_optimizer)
    from multimodal_sequencing_tpu.train.steps import (
        make_train_step, make_eval_step, device_batch, eval_variables)

    paths = collect_story_image_paths(wikihow_dir, "wikihow", "dev")
    extract_roi_sidecars(paths, num_regional_features=2,
                         backbone="resnet18", image_size=(64, 64),
                         batch_size=4, seed=0)
    proc = get_processor("wikihow_sort", data_dir=wikihow_dir,
                         paired_with_image=True)
    ds = PureClassDataset(proc.get_dev_examples(), tokenizer, decode=True,
                          max_story_length=5, max_length=96,
                          per_seq_max_length=12, multimodal=True,
                          image_size=(32, 32), num_img_regional_features=2,
                          uint8_images=True, seed=0)
    batch = next(data_loader(ds, batch_size=2))
    assert "img_regional_features" in batch

    # non-detectron2 vision model: regional tokens can ONLY come from the
    # precomputed sidecar features (no inline ROI tower exists)
    cfg = MultimodalConfig(
        encoder=EncoderConfig.tiny(), multimodal=True,
        multimodal_model_type="visualbert", vision_model="resnet18",
        num_img_regional_features=2, hierarchical_version="v1",
        max_story_length=5, max_seq_length=96, per_seq_max_length=12,
        image_size=(32, 32))
    model = SequencingModel(cfg)
    db = device_batch(batch)
    state = make_train_state(
        model, jax.random.PRNGKey(0), db,
        tx=make_optimizer(learning_rate=1e-3, warmup_steps=1,
                          total_steps=10))
    mesh = make_mesh(n_data=1)
    out = make_eval_step(cfg, mesh)(
        eval_variables(state), state.apply_fn, shard_batch(db, mesh))
    # 5 steps x (1 pooled + 2 regional sidecar tokens) = 15 visual tokens
    assert out["visual_output"].shape[1] == 15
    # and the projection of the sidecar features was actually created
    assert "regional_proj" in state.params["encoder"]

    st2, metrics = make_train_step(cfg, mesh)(
        state, shard_batch(db, mesh), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
