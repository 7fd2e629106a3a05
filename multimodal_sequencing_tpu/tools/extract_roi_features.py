"""Offline ROI regional-feature extraction -> `{img}_maskrcnn.npy` sidecars.

Rebuild of `/root/reference/trainers/extract_maskrcnn_features.py` (usage
doc at `:32-37`): walk a dataset's story images, run a region-proposal
vision tower, and write per-image sidecar files that the dataset layer
loads when `--include_num_img_regional_features` is set
(`datasets/processors.py:283-296`; consumer here:
`data/images.load_maskrcnn_sidecar`).

The reference extractor is maskrcnn-benchmark/detectron2 (CUDA-only, not
in this image); this one is the framework's own TPU-native
`FPNVisionTower` (`models/fpn.py`) in regional mode — ResNet-FPN +
static top-K objectness proposals + ROI-align + box head, one jit
program. Weights: randomly initialized by default (deterministic per
--seed), or an Orbax/torchvision checkpoint via --tower_checkpoint /
--resnet_torch_weights, so towers trained in-framework (e.g. through the
image-only pretrain flow) can produce the sidecars.

Usage:
  python -m multimodal_sequencing_tpu.tools.extract_roi_features \
      --data_dir data/wikihow --data_name wikihow --split train \
      --num_regional_features 10
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from .extract_img_features import (collect_story_image_paths,
                                   write_regional_sidecar)

logger = logging.getLogger(__name__)


def build_roi_extractor(num_regional_features: int,
                        backbone: str = "resnet50",
                        image_size=(256, 256), seed: int = 0,
                        tower_checkpoint: str = None,
                        resnet_torch_weights: str = None):
    """Return (forward(imgs_nhwc) -> (full, regional, scores, boxes),
    variables)."""
    import jax
    import jax.numpy as jnp
    from ..models.fpn import FPNVisionTower

    # torchvision weights are stride-in-conv2; detectron2/own checkpoints
    # use the tower's Caffe-style default
    tower = FPNVisionTower(backbone_name=backbone,
                           num_regional_features=num_regional_features,
                           stride_in_1x1=not resnet_torch_weights)
    sample = jnp.zeros((1, image_size[0], image_size[1], 3))
    variables = tower.init(jax.random.PRNGKey(seed), sample)
    if resnet_torch_weights:
        import torch
        from ..models.resnet import convert_torchvision_resnet
        sd = torch.load(resnet_torch_weights, map_location="cpu")
        sd = sd.get("state_dict", sd)
        p, stats = convert_torchvision_resnet(sd, backbone)
        variables["params"]["bottom_up"] = p
        variables["batch_stats"]["bottom_up"] = stats
    if tower_checkpoint:
        import orbax.checkpoint as ocp
        restored = ocp.StandardCheckpointer().restore(
            tower_checkpoint, variables)
        variables = restored

    @jax.jit
    def forward(v, x):
        return tower.apply(v, x, deterministic=True)

    return forward, variables


def extract_roi_sidecars(image_paths, num_regional_features: int = 10,
                         backbone: str = "resnet50", image_size=(256, 256),
                         batch_size: int = 16, seed: int = 0,
                         tower_checkpoint: str = None,
                         resnet_torch_weights: str = None):
    """Write a `{img}_maskrcnn.npy` sidecar per image; returns count."""
    import jax.numpy as jnp
    from ..data.images import load_and_transform

    forward, variables = build_roi_extractor(
        num_regional_features, backbone, image_size, seed,
        tower_checkpoint, resnet_torch_weights)
    paths = list(image_paths)
    for start in range(0, len(paths), batch_size):
        chunk = paths[start:start + batch_size]
        imgs = np.stack([
            load_and_transform(p, image_size).transpose(1, 2, 0)
            for p in chunk])
        full, regional, scores, boxes = forward(variables, jnp.asarray(imgs))
        regional, scores, boxes = (np.asarray(regional),
                                   np.asarray(scores), np.asarray(boxes))
        for i, p in enumerate(chunk):
            write_regional_sidecar(
                p, regional[i],
                extra={"scores": scores[i].astype(np.float32),
                       "boxes": boxes[i].astype(np.float32)})
        if (start // batch_size) % 20 == 0:
            logger.info("extracted %d/%d", start + len(chunk), len(paths))
    return len(paths)


def main(argv=None):
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--data_name", default="wikihow")
    parser.add_argument("--split", default="train")
    parser.add_argument("--version_text", default=None)
    parser.add_argument("--backbone", default="resnet50")
    parser.add_argument("--num_regional_features", type=int, default=10)
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--tower_checkpoint", default=None,
                        help="Orbax checkpoint of FPNVisionTower variables")
    parser.add_argument("--resnet_torch_weights", default=None,
                        help="torchvision ResNet .pth for the backbone")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    paths = collect_story_image_paths(args.data_dir, args.data_name,
                                      args.split, args.version_text)
    logger.info("found %d unique images", len(paths))
    n = extract_roi_sidecars(
        paths, args.num_regional_features, args.backbone,
        (args.image_size, args.image_size), args.batch_size, args.seed,
        args.tower_checkpoint, args.resnet_torch_weights)
    logger.info("wrote %d sidecars", n)


if __name__ == "__main__":
    main()
