"""Detectron2 Caffe-style image preprocessing parity.

The reference's detectron2_* vision path feeds the tower cv2-native BGR
images resized to 256 px (INTER_LINEAR) minus cfg.MODEL.PIXEL_MEAN, with
NO /255 scaling (`/root/reference/trainers/multimodal_utils.py:170-192`
+ `datasets/img_utils.py:103-117`). These tests pin both framework
pipelines (host float and uint8 + on-device tail) to that recipe,
reimplemented independently here with cv2.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_sequencing_tpu.data.images import (
    DETECTRON2_PIXEL_MEAN_BGR, load_image_stack_detectron2,
    load_image_stack_uint8_bgr)
from multimodal_sequencing_tpu.ops.preprocess import preprocess_uint8_images


@pytest.fixture(scope="module")
def fixture_png(tmp_path_factory):
    """A deterministic non-square RGB PNG on disk (odd size so the resize
    interpolation actually runs)."""
    import cv2
    rng = np.random.RandomState(42)
    img_rgb = rng.randint(0, 256, (37, 53, 3), np.uint8)
    path = tmp_path_factory.mktemp("d2") / "fix.png"
    cv2.imwrite(str(path), img_rgb[..., ::-1])  # cv2 writes BGR
    return str(path), img_rgb


def _reference_transform(path, size=256):
    """The reference recipe, verbatim ops: cv2.imread (BGR), cv2.resize
    default interpolation, float32, minus PIXEL_MEAN, CHW."""
    import cv2
    img = cv2.imread(path)  # BGR uint8
    img = cv2.resize(img, (size, size)).astype(np.float32)
    img -= np.asarray([103.530, 116.280, 123.675], np.float32)
    return img.transpose(2, 0, 1)


def test_host_float_pipeline_matches_reference(fixture_png):
    path, _ = fixture_png
    want = _reference_transform(path)
    got = load_image_stack_detectron2([path], size=(256, 256))[0]
    np.testing.assert_array_equal(got, want)


def test_uint8_device_tail_matches_reference(fixture_png):
    """uint8 BGR host loader + device mean-subtract == reference exactly
    (the reference also resizes in uint8 before the float conversion)."""
    path, _ = fixture_png
    want = _reference_transform(path)
    u8 = load_image_stack_uint8_bgr([path], size=(256, 256))
    assert u8.dtype == np.uint8
    got = preprocess_uint8_images(jnp.asarray(u8), size=(256, 256),
                                  to_chw=True, mode="detectron2_bgr")
    np.testing.assert_array_equal(np.asarray(got)[0], want)


def test_missing_image_is_black_minus_mean_equivalent(fixture_png):
    """None paths: the float path yields 0-minus-mean, the uint8 path
    yields zeros whose device tail subtracts the same mean."""
    host = load_image_stack_detectron2([None], size=(8, 8))[0]
    assert np.allclose(host.transpose(1, 2, 0)[0, 0],
                       -DETECTRON2_PIXEL_MEAN_BGR)
    u8 = load_image_stack_uint8_bgr([None], size=(8, 8))
    dev = preprocess_uint8_images(jnp.asarray(u8), size=(8, 8),
                                  to_chw=True, mode="detectron2_bgr")
    np.testing.assert_allclose(np.asarray(dev)[0], host)


def test_dataset_selects_detectron2_transform(fixture_png):
    """StoryDataset with image_transform='detectron2' ships the Caffe
    pipeline (both layouts)."""
    path, _ = fixture_png
    from multimodal_sequencing_tpu.data.datasets import SortDataset
    from multimodal_sequencing_tpu.data.examples import HeadExample
    from multimodal_sequencing_tpu.data.tokenization import (
        SimpleWordTokenizer)
    ex = HeadExample(guid="g", text_seq=["a b", "c d"],
                     img_path_seq=[path, path])
    tok = SimpleWordTokenizer(vocab_size=500)
    want = _reference_transform(path)
    for uint8 in (False, True):
        ds = SortDataset([ex], tok, max_length=32, per_seq_max_length=8,
                         max_story_length=2, min_story_length=2,
                         scramble=False, multimodal=True,
                         image_size=(256, 256), uint8_images=uint8,
                         image_transform="detectron2")
        item = ds[0]
        img = item["images"][0]
        if uint8:
            assert img.dtype == np.uint8
            got = np.asarray(preprocess_uint8_images(
                jnp.asarray(img[None]), size=(256, 256), to_chw=True,
                mode="detectron2_bgr"))[0]
        else:
            got = img
        np.testing.assert_array_equal(got, want)


def test_cli_resolves_detectron2_image_size():
    from multimodal_sequencing_tpu.train.cli import (
        build_parser, resolve_args)
    a = resolve_args(build_parser("train").parse_args(
        ["--multimodal", "--vision_model", "detectron2_resnet50"]))
    assert a.vision_image_size == 256
    b = resolve_args(build_parser("train").parse_args(["--multimodal"]))
    assert b.vision_image_size == 224
    c = resolve_args(build_parser("train").parse_args(
        ["--multimodal", "--vision_model", "detectron2_resnet50",
         "--vision_image_size", "224"]))
    assert c.vision_image_size == 224  # explicit flag wins
