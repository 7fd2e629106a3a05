"""Offline image feature extraction.

Rebuild of `/root/reference/trainers/extract_img_features.py`: walk a
dataset's story images, run a vision backbone (ResNet pooled features or
CLIP tower CLS), and save a `{image_path: feature}` dict as .npy — the
visual-token-dict / feature-cache format consumed by `PretrainDataset`
(`datasets/processors.py:941-956`).

The reference also shipped `extract_maskrcnn_features.py` writing
`{img}_maskrcnn.npy` ROI sidecars via maskrcnn-benchmark/detectron2; those
frameworks are CUDA-only and not available here — the *consumer* side
(`data/images.load_maskrcnn_sidecar`) reads the same sidecar format, and
`write_regional_sidecar` below writes it from any (R, C) feature array so
external ROI extractors can interoperate.

Usage:
  python -m multimodal_sequencing_tpu.tools.extract_img_features \
      --data_dir data/wikihow --data_name wikihow --split train \
      --vision_model resnet50 --out features.npy
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def extract_features(image_paths, vision_model: str = "resnet50",
                     image_size=(224, 224), batch_size: int = 32,
                     clip_weights: str = None):
    """Return {path: np.ndarray feature} using a jitted backbone."""
    import jax
    import jax.numpy as jnp
    from ..data.images import load_and_transform
    from ..models.resnet import ResNetBackbone
    from ..models.clip_visual import CLIPVisionConfig, CLIPVisualTower

    if vision_model.startswith("resnet"):
        model = ResNetBackbone(vision_model)
        sample = jnp.zeros((1, image_size[0], image_size[1], 3))
        variables = model.init(jax.random.PRNGKey(0), sample)

        @jax.jit
        def forward(variables, x):
            return model.apply(variables, x, deterministic=True)
    else:  # CLIP tower
        vcfg = (CLIPVisionConfig.rn50() if vision_model.startswith("RN")
                else CLIPVisionConfig.vit_b32())
        model = CLIPVisualTower(vcfg)
        sample = jnp.zeros((1, image_size[0], image_size[1], 3))
        variables = model.init(jax.random.PRNGKey(0), sample, img_len=1)
        if clip_weights:
            from ..models.convert import (
                load_torch_state_dict, filter_visual_state_dict,
                convert_clip_vit, convert_clip_rn50)
            sd = filter_visual_state_dict(load_torch_state_dict(clip_weights))
            if vision_model.startswith("RN"):
                variables = convert_clip_rn50(sd)
            else:
                variables = {"params": convert_clip_vit(sd)}

        @jax.jit
        def forward(variables, x):
            return model.apply(variables, x, img_len=1, deterministic=True)

    out = {}
    paths = list(image_paths)
    for start in range(0, len(paths), batch_size):
        chunk = paths[start:start + batch_size]
        imgs = np.stack([
            load_and_transform(p, image_size).transpose(1, 2, 0)
            for p in chunk])
        feats = np.asarray(forward(variables, jnp.asarray(imgs)))
        for p, f in zip(chunk, feats):
            out[p] = f
        if (start // batch_size) % 20 == 0:
            logger.info("extracted %d/%d", start + len(chunk), len(paths))
    return out


def collect_story_image_paths(data_dir: str, data_name: str, split: str,
                              version_text=None):
    from ..data.registry import get_processor
    proc = get_processor(f"{data_name}_sort", data_dir=data_dir,
                         version_text=version_text, paired_with_image=True)
    getter = {"train": proc.get_train_examples,
              "dev": proc.get_dev_examples,
              "val": proc.get_dev_examples,
              "test": proc.get_test_examples}[split]
    paths = []
    for ex in getter():
        for p in ex.img_path_seq or []:
            if p:
                paths.append(p)
    return sorted(set(paths))


def write_regional_sidecar(img_path: str, features: np.ndarray,
                           extra: dict = None):
    """Write `{img}_maskrcnn.npy` in the format
    `data/images.load_maskrcnn_sidecar` reads
    (`datasets/processors.py:283-296`)."""
    base, _ = os.path.splitext(img_path)
    payload = {"features": np.asarray(features, np.float32)}
    if extra:
        payload.update(extra)
    np.save(base + "_maskrcnn.npy", payload)  # saved as 0-d object array


def main(argv=None):
    from ..utils.platform import apply_platform_env
    apply_platform_env()
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--data_name", default="wikihow")
    parser.add_argument("--split", default="train")
    parser.add_argument("--version_text", default=None)
    parser.add_argument("--vision_model", default="resnet50")
    parser.add_argument("--clip_visual_model_weights", default=None)
    parser.add_argument("--image_size", type=int, default=224)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--out", required=True)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    paths = collect_story_image_paths(args.data_dir, args.data_name,
                                      args.split, args.version_text)
    logger.info("found %d unique images", len(paths))
    feats = extract_features(
        paths, args.vision_model,
        (args.image_size, args.image_size), args.batch_size,
        clip_weights=args.clip_visual_model_weights)
    np.save(args.out, feats)
    logger.info("saved %d features to %s", len(feats), args.out)


if __name__ == "__main__":
    main()
