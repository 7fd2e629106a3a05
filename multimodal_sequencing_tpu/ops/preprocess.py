"""On-device image preprocessing tail.

The north-star design moves the resize/normalize tail of the image pipeline
(host cv2/skimage in the reference, `datasets/img_utils.py`) onto the
device: the host only decodes JPEG/PNG to uint8 (inherently host work), and
the device does resize + scale + ImageNet-normalize + CHW as one fused XLA
program per batch — saving 4x H2D bandwidth (uint8 vs float32) and all host
float math. This matters here because the host has very few cores relative
to the chip.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
# detectron2 Caffe-style: 0-255 BGR minus MODEL.PIXEL_MEAN (BGR order);
# the uint8 loader ships BGR bytes for this mode (data/images.py)
DETECTRON2_PIXEL_MEAN_BGR = jnp.asarray([103.530, 116.280, 123.675],
                                        jnp.float32)


@functools.partial(jax.jit, static_argnames=("size", "to_chw", "mode"))
def preprocess_uint8_images(images_u8: jax.Array,
                            size: Tuple[int, int] = (224, 224),
                            to_chw: bool = True,
                            mode: str = "imagenet") -> jax.Array:
    """(..., H, W, 3) uint8 -> normalized float, (..., 3, size) CHW by
    default or (..., size, 3) NHWC with `to_chw=False`.

    mode="imagenet": bilinear resize + [0,1] scale + ImageNet mean/std
    (RGB bytes). mode="detectron2_bgr": the Caffe-style tail — keep the
    0-255 range and subtract MODEL.PIXEL_MEAN (input bytes are BGR,
    matching the reference's cv2-native read). Fused either way; the
    conv towers consume NHWC (TPU-native layout), so model paths pass
    `to_chw=False` and never round-trip through CHW.
    """
    lead = images_u8.shape[:-3]
    h, w = size
    x = images_u8.reshape((-1,) + images_u8.shape[-3:]).astype(jnp.float32)
    if mode == "detectron2_bgr":
        if images_u8.shape[-3:-1] != (h, w):
            x = jax.image.resize(x, (x.shape[0], h, w, 3), method="bilinear")
        x = x - DETECTRON2_PIXEL_MEAN_BGR
    else:
        x = x / 255.0
        if images_u8.shape[-3:-1] != (h, w):  # loaders ship pre-sized
            x = jax.image.resize(x, (x.shape[0], h, w, 3), method="bilinear")
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if to_chw:
        x = jnp.transpose(x, (0, 3, 1, 2))
        return x.reshape(lead + (3, h, w))
    return x.reshape(lead + (h, w, 3))


def images_to_nhwc(images: jax.Array, mode: str = "imagenet") -> jax.Array:
    """Model-side image intake: (B, N, 3, H, W) float CHW (host
    preprocessing — already normalized in either pipeline) or
    (B, N, H, W, 3) uint8 (low-bandwidth device-preprocess layout, tail
    selected by `mode`) -> (B*N, H, W, 3) float NHWC for the conv
    towers."""
    b, n = images.shape[:2]
    if images.dtype == jnp.uint8:
        x = preprocess_uint8_images(images, size=images.shape[2:4],
                                    to_chw=False, mode=mode)
        return x.reshape((b * n,) + x.shape[2:])
    return jnp.transpose(
        images.reshape((b * n,) + images.shape[2:]), (0, 2, 3, 1))
