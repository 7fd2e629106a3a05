"""ResNet backbone, naive multimodal model, device preprocessing tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_sequencing_tpu.models.resnet import (
    ResNetBackbone, convert_torchvision_resnet, resnet_feature_dim)
from multimodal_sequencing_tpu.models.naive_model import NaiveMultimodalModel
from multimodal_sequencing_tpu.models.config import (
    EncoderConfig, MultimodalConfig)
from multimodal_sequencing_tpu.ops.preprocess import preprocess_uint8_images
from multimodal_sequencing_tpu.data.images import (
    load_and_transform, IMAGENET_MEAN, IMAGENET_STD)


def test_resnet18_shapes():
    model = ResNetBackbone("resnet18")
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = model.init(jax.random.PRNGKey(0), x)
    out, _ = model.apply(vars_, x, mutable=["batch_stats"])
    assert out.shape == (2, 512)
    grid, _ = model.apply(vars_, x, pool=False, mutable=["batch_stats"])
    assert grid.shape == (2, 2, 2, 512)


def test_torchvision_resnet18_parity():
    torch = pytest.importorskip("torch")
    try:
        from torchvision.models import resnet18
        net = resnet18(weights=None)
    except ImportError:
        # build an equivalent torch resnet18 via torch.hub source? skip
        pytest.skip("torchvision unavailable")
    net.eval()
    params, stats = convert_torchvision_resnet(net.state_dict(), "resnet18")
    x = np.random.RandomState(0).randn(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        ref = net.avgpool(net.layer4(net.layer3(net.layer2(net.layer1(
            net.maxpool(net.relu(net.bn1(net.conv1(
                torch.tensor(x.transpose(0, 3, 1, 2)))))))))))
        ref = ref.flatten(1).numpy()
    model = ResNetBackbone("resnet18")
    out = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-3, rtol=1e-2)


def test_naive_model_forward():
    enc = EncoderConfig.tiny(max_position_embeddings=100)
    cfg = MultimodalConfig(encoder=enc, multimodal=True,
                           multimodal_model_type="naive",
                           max_story_length=3, num_labels=3,
                           image_size=(32, 32))
    model = NaiveMultimodalModel(cfg, vision_name="resnet18")
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 1000, (2, 24)).astype(np.int32)
    imgs = rng.randn(2, 3, 3, 32, 32).astype(np.float32)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                       images=jnp.asarray(imgs))
    out, _ = model.apply(vars_, jnp.asarray(ids), images=jnp.asarray(imgs),
                         mutable=["batch_stats"])
    assert out["logits"].shape == (2, 3)
    # sequence gains 3 image tokens
    assert out["sequence_output"].shape[1] == 24 + 3


def test_device_preprocess_matches_host():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (48, 40, 3), dtype=np.uint8)
    # host path via PIL/cv2 (area/bilinear interpolation differs slightly;
    # compare the normalize math on an identity-resize image)
    img224 = np.repeat(np.repeat(img[:32, :32], 1, 0), 1, 1)
    dev = preprocess_uint8_images(jnp.asarray(img224[None]), size=(32, 32))
    host = ((img224.astype(np.float32) / 255.0 - IMAGENET_MEAN)
            / IMAGENET_STD).transpose(2, 0, 1)
    np.testing.assert_allclose(np.asarray(dev[0]), host, atol=1e-5)
    # arbitrary resize runs and is finite
    out = preprocess_uint8_images(jnp.asarray(img[None]), size=(16, 16))
    assert out.shape == (1, 3, 16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_visualbert_encoder_and_sequencer():
    from multimodal_sequencing_tpu.models.visualbert import (
        VisualBERTEncoder)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    enc = EncoderConfig.tiny(max_position_embeddings=100)
    cfg = MultimodalConfig(encoder=enc, multimodal=True,
                           multimodal_model_type="visualbert",
                           vision_model="resnet18", max_story_length=3,
                           hierarchical_version="v1",
                           max_seq_length=48, per_seq_max_length=12,
                           image_size=(32, 32))
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 1000, (2, 48)).astype(np.int32)
    step = 16
    for s in range(3):
        ids[:, s * step] = cfg.cls_id
    imgs = rng.randn(2, 3, 3, 32, 32).astype(np.float32)
    model = SequencingModel(cfg)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                       images=jnp.asarray(imgs))
    out, _ = model.apply(vars_, jnp.asarray(ids), images=jnp.asarray(imgs),
                         mutable=["batch_stats"])
    assert out["heatmap"].shape == (2, 3, 3)
    assert out["visual_output"].shape == (2, 3, enc.hidden_size)
    assert np.isfinite(np.asarray(out["heatmap"])).all()


def test_naive_sequencer_dispatch():
    """--multimodal_model_type naive builds NaiveMultimodalModel as the
    SequencingModel encoder (the reference finetune trainer ships this
    commented out, train.py:1554-1573; implements the evident intent like
    the BERSON inner dispatch) and feeds the heatmap head from the
    language span."""
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    enc = EncoderConfig.tiny(max_position_embeddings=100)
    cfg = MultimodalConfig(encoder=enc, multimodal=True,
                           multimodal_model_type="naive",
                           vision_model="resnet18", max_story_length=3,
                           hierarchical_version="v1",
                           max_seq_length=48, per_seq_max_length=12,
                           image_size=(32, 32))
    rng = np.random.RandomState(0)
    ids = rng.randint(5, 1000, (2, 48)).astype(np.int32)
    for s in range(3):
        ids[:, s * 16] = cfg.cls_id
    imgs = jnp.asarray(rng.randn(2, 3, 3, 32, 32).astype(np.float32))
    model = SequencingModel(cfg)
    vars_ = model.init(jax.random.PRNGKey(0), jnp.asarray(ids), images=imgs)
    assert "img_project" in vars_["params"]["encoder"]  # naive, not clip
    out, _ = model.apply(vars_, jnp.asarray(ids), images=imgs,
                         mutable=["batch_stats"])
    assert out["heatmap"].shape == (2, 3, 3)
    assert out["visual_output"].shape == (2, 3, enc.hidden_size)
    assert np.isfinite(np.asarray(out["heatmap"])).all()


def test_visualbert_bypass_transformer():
    """mmf bypass mode (visual_bert_mmf.py:64,114-140): text-only stack +
    one additional joint layer; params gain the extra layer and the
    output differs from the full joint path."""
    from multimodal_sequencing_tpu.models.visualbert import (
        VisualBERTEncoder)
    enc = EncoderConfig.tiny(max_position_embeddings=100)
    kw = dict(encoder=enc, multimodal=True,
              multimodal_model_type="visualbert",
              vision_model="resnet18", max_story_length=3,
              max_seq_length=48, per_seq_max_length=12,
              image_size=(32, 32))
    rng = np.random.RandomState(1)
    ids = jnp.asarray(rng.randint(5, 1000, (2, 48)).astype(np.int32))
    imgs = jnp.asarray(rng.randn(2, 3, 3, 32, 32).astype(np.float32))
    outs = {}
    for bypass in (False, True):
        cfg = MultimodalConfig(bypass_transformer=bypass, **kw)
        m = VisualBERTEncoder(cfg)
        vars_ = m.init(jax.random.PRNGKey(0), ids, images=imgs)
        names = set(vars_["params"].keys())
        assert ("additional_layer" in names) == bypass
        (lang, visn, pooled), _ = m.apply(vars_, ids, images=imgs,
                                          mutable=["batch_stats"])
        assert lang.shape == (2, 48, enc.hidden_size)
        assert visn.shape[0] == 2 and np.isfinite(np.asarray(pooled)).all()
        outs[bypass] = np.asarray(lang)
    assert not np.allclose(outs[False], outs[True])
