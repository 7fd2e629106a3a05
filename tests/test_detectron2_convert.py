"""Detectron2-zoo checkpoint conversion into the FPN vision tower.

Builds a synthetic detectron2-layout state dict (the key schema
DetectionCheckpointer reads for ResNet-FPN models, reference
`multimodal_utils.py:30-41`), converts it with `convert_detectron2_fpn`,
and asserts numeric stage parity of the backbone+FPN against a torch
re-implementation of detectron2's architecture (Caffe-style stride-in-1x1
bottlenecks, FrozenBN, lateral/output convs, p6 = stride-2 maxpool of p5).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from multimodal_sequencing_tpu.models.fpn import FPN, FPNVisionTower
from multimodal_sequencing_tpu.models.resnet import ResNetBackbone
from multimodal_sequencing_tpu.models.convert import (
    convert_detectron2_fpn, load_detectron2_state_dict)

BACKBONE = "resnet50"
LAYERS = (3, 4, 6, 3)
FEATURE_DIM = 32       # synthetic box-head width (zoo uses 1024)
ROI = 7


def _make_d2_state_dict(rng):
    """Random weights in detectron2's key/shape layout for R50-FPN."""
    sd = {}

    def conv(name, cout, cin, k, bias=False):
        sd[f"{name}.weight"] = rng.randn(cout, cin, k, k).astype(
            np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = rng.randn(cout).astype(np.float32) * 0.05

    def norm(name, c):
        sd[f"{name}.weight"] = 1 + 0.1 * rng.randn(c).astype(np.float32)
        sd[f"{name}.bias"] = 0.1 * rng.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = 0.1 * rng.randn(c).astype(np.float32)
        sd[f"{name}.running_var"] = (1 + 0.1 * rng.rand(c)).astype(
            np.float32)

    bu = "backbone.bottom_up"
    conv(f"{bu}.stem.conv1", 64, 3, 7)
    norm(f"{bu}.stem.conv1.norm", 64)
    cin = 64
    for stage, blocks in enumerate(LAYERS):
        width = 64 * 2 ** stage
        cout = width * 4
        for b in range(blocks):
            p = f"{bu}.res{stage+2}.{b}"
            conv(f"{p}.conv1", width, cin if b == 0 else cout, 1)
            norm(f"{p}.conv1.norm", width)
            conv(f"{p}.conv2", width, width, 3)
            norm(f"{p}.conv2.norm", width)
            conv(f"{p}.conv3", cout, width, 1)
            norm(f"{p}.conv3.norm", cout)
            if b == 0:
                conv(f"{p}.shortcut", cout, cin, 1)
                norm(f"{p}.shortcut.norm", cout)
        cin = cout
    for lvl, c in zip((2, 3, 4, 5), (256, 512, 1024, 2048)):
        conv(f"backbone.fpn_lateral{lvl}", 256, c, 1, bias=True)
        conv(f"backbone.fpn_output{lvl}", 256, 256, 3, bias=True)
    conv("proposal_generator.rpn_head.conv", 256, 256, 3, bias=True)
    conv("proposal_generator.rpn_head.objectness_logits", 3, 256, 1,
         bias=True)
    sd["roi_heads.box_head.fc1.weight"] = rng.randn(
        FEATURE_DIM, 256 * ROI * ROI).astype(np.float32) * 0.01
    sd["roi_heads.box_head.fc1.bias"] = rng.randn(FEATURE_DIM).astype(
        np.float32) * 0.01
    sd["roi_heads.box_head.fc2.weight"] = rng.randn(
        FEATURE_DIM, FEATURE_DIM).astype(np.float32) * 0.05
    sd["roi_heads.box_head.fc2.bias"] = rng.randn(FEATURE_DIM).astype(
        np.float32) * 0.01
    return sd


def _torch_fpn_forward(sd, x_nchw):
    """Detectron2 R50-FPN reference forward in torch (eval semantics)."""
    t = {k: torch.from_numpy(v) for k, v in sd.items()}

    def frozen_bn(x, p):
        w, b = t[f"{p}.weight"], t[f"{p}.bias"]
        m, v = t[f"{p}.running_mean"], t[f"{p}.running_var"]
        scale = w / torch.sqrt(v + 1e-5)
        return x * scale[None, :, None, None] + (
            b - m * scale)[None, :, None, None]

    bu = "backbone.bottom_up"
    x = F.conv2d(x_nchw, t[f"{bu}.stem.conv1.weight"], stride=2, padding=3)
    x = F.relu(frozen_bn(x, f"{bu}.stem.conv1.norm"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)
    stages = {}
    for stage, blocks in enumerate(LAYERS):
        stride = 1 if stage == 0 else 2
        for b in range(blocks):
            p = f"{bu}.res{stage+2}.{b}"
            s = stride if b == 0 else 1
            idn = x
            # stride_in_1x1: the stride sits on conv1
            out = F.relu(frozen_bn(F.conv2d(
                x, t[f"{p}.conv1.weight"], stride=s), f"{p}.conv1.norm"))
            out = F.relu(frozen_bn(F.conv2d(
                out, t[f"{p}.conv2.weight"], padding=1),
                f"{p}.conv2.norm"))
            out = frozen_bn(F.conv2d(out, t[f"{p}.conv3.weight"]),
                            f"{p}.conv3.norm")
            if f"{p}.shortcut.weight" in t:
                idn = frozen_bn(F.conv2d(
                    x, t[f"{p}.shortcut.weight"], stride=s),
                    f"{p}.shortcut.norm")
            x = F.relu(out + idn)
        stages[f"c{stage+2}"] = x

    lat = {lvl: F.conv2d(stages[f"c{lvl}"],
                         t[f"backbone.fpn_lateral{lvl}.weight"],
                         t[f"backbone.fpn_lateral{lvl}.bias"])
           for lvl in (2, 3, 4, 5)}
    merged = {5: lat[5]}
    for lvl in (4, 3, 2):
        up = F.interpolate(merged[lvl + 1], size=lat[lvl].shape[-2:],
                           mode="nearest")
        merged[lvl] = lat[lvl] + up
    outs = {f"p{lvl}": F.conv2d(merged[lvl],
                                t[f"backbone.fpn_output{lvl}.weight"],
                                t[f"backbone.fpn_output{lvl}.bias"],
                                padding=1)
            for lvl in (2, 3, 4, 5)}
    outs["p6"] = F.max_pool2d(outs["p5"], 1, stride=2)
    return outs


@pytest.fixture(scope="module")
def d2_sd():
    return _make_d2_state_dict(np.random.RandomState(0))


def test_converted_tree_matches_tower_init(d2_sd):
    tower = FPNVisionTower(backbone_name=BACKBONE, num_regional_features=3,
                           feature_dim=FEATURE_DIM)
    ref = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    conv = convert_detectron2_fpn(d2_sd, BACKBONE)
    ref_shapes = jax.tree_util.tree_map(jnp.shape, ref["params"])
    conv_shapes = jax.tree_util.tree_map(np.shape, conv["params"])
    assert ref_shapes == conv_shapes
    bs_ref = jax.tree_util.tree_map(jnp.shape, ref["batch_stats"])
    bs_conv = jax.tree_util.tree_map(np.shape, conv["batch_stats"])
    assert bs_ref == bs_conv


def test_backbone_fpn_stage_parity_vs_torch(d2_sd):
    """Converted weights reproduce the torch detectron2 forward on every
    FPN level (stride_in_1x1 + FrozenBN + lateral/top-down/output)."""
    rng = np.random.RandomState(1)
    img = rng.randn(2, 64, 64, 3).astype(np.float32)
    want = _torch_fpn_forward(d2_sd, torch.from_numpy(
        img.transpose(0, 3, 1, 2)))

    conv = convert_detectron2_fpn(d2_sd, BACKBONE)
    backbone = ResNetBackbone(BACKBONE, stride_in_1x1=True,
                              name="bottom_up")
    fpn = FPN(256, name="fpn")
    variables = {
        "params": {"bottom_up": conv["params"]["bottom_up"],
                   "fpn": conv["params"]["fpn"]},
        "batch_stats": conv["batch_stats"],
    }

    import flax.linen as nn

    class _BackboneFPN(nn.Module):
        @nn.compact
        def __call__(self, x):
            stages = ResNetBackbone(BACKBONE, stride_in_1x1=True,
                                    name="bottom_up")(
                x, deterministic=True, return_stages=True)
            return FPN(256, name="fpn")(stages)

    got = _BackboneFPN().apply(variables, jnp.asarray(img))
    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        w = want[lvl].detach().numpy().transpose(0, 2, 3, 1)
        # f32 accumulation-order noise across ~50 convs (activations reach
        # |x|~100 here); a layout/stride bug would be O(1) everywhere
        np.testing.assert_allclose(np.asarray(got[lvl]), w, atol=3e-3,
                                   rtol=1e-2, err_msg=lvl)


def test_box_head_flatten_permutation(d2_sd):
    """fc1 row permute: torch flattens ROI features channel-first; the
    tower flattens NHWC. Same ROI values must give the same box features."""
    rng = np.random.RandomState(2)
    roi_hwc = rng.randn(5, ROI, ROI, 256).astype(np.float32)
    roi_chw = roi_hwc.transpose(0, 3, 1, 2)

    t_fc1w = torch.from_numpy(d2_sd["roi_heads.box_head.fc1.weight"])
    t_fc1b = torch.from_numpy(d2_sd["roi_heads.box_head.fc1.bias"])
    t_fc2w = torch.from_numpy(d2_sd["roi_heads.box_head.fc2.weight"])
    t_fc2b = torch.from_numpy(d2_sd["roi_heads.box_head.fc2.bias"])
    x = torch.from_numpy(roi_chw).reshape(5, -1)
    want = F.relu(F.linear(F.relu(F.linear(x, t_fc1w, t_fc1b)),
                           t_fc2w, t_fc2b)).numpy()

    conv = convert_detectron2_fpn(d2_sd, BACKBONE)
    p1, p2 = conv["params"]["box_fc1"], conv["params"]["box_fc2"]
    h = np.maximum(roi_hwc.reshape(5, -1) @ p1["kernel"] + p1["bias"], 0)
    got = np.maximum(h @ p2["kernel"] + p2["bias"], 0)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_rpn_objectness_transfer(d2_sd):
    conv = convert_detectron2_fpn(d2_sd, BACKBONE)
    k = conv["params"]["obj_logit"]["kernel"]
    assert k.shape == (1, 1, 256, 1)
    # middle (ratio-1.0) anchor channel of the 3-anchor zoo head
    src = d2_sd["proposal_generator.rpn_head.objectness_logits.weight"]
    np.testing.assert_array_equal(
        k[0, 0, :, 0], src[1, :, 0, 0])


def test_pkl_roundtrip(tmp_path, d2_sd):
    """model_final_*.pkl loading (plain pickle with a `model` dict)."""
    import pickle
    path = tmp_path / "model_final_abc.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": d2_sd, "__author__": "synthetic"}, f)
    sd = load_detectron2_state_dict(str(path))
    assert set(sd) == set(d2_sd)
    conv = convert_detectron2_fpn(sd, BACKBONE)
    assert "bottom_up" in conv["params"]


def test_full_tower_forward_with_converted_weights(d2_sd):
    """Converted weights drive the full regional-mode tower forward."""
    tower = FPNVisionTower(backbone_name=BACKBONE, num_regional_features=3,
                           feature_dim=FEATURE_DIM)
    conv = convert_detectron2_fpn(d2_sd, BACKBONE)
    img = np.random.RandomState(3).randn(1, 64, 64, 3).astype(np.float32)
    full, regional, scores, boxes = tower.apply(
        {"params": conv["params"], "batch_stats": conv["batch_stats"]},
        jnp.asarray(img), deterministic=True)
    assert regional.shape == (1, 3, FEATURE_DIM)
    assert np.isfinite(np.asarray(full)).all()
    assert np.isfinite(np.asarray(regional)).all()
