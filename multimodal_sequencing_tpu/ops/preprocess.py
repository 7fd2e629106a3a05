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


@functools.partial(jax.jit, static_argnames=("size", "to_chw"))
def preprocess_uint8_images(images_u8: jax.Array,
                            size: Tuple[int, int] = (224, 224),
                            to_chw: bool = True) -> jax.Array:
    """(..., H, W, 3) uint8 -> normalized float, (..., 3, size) CHW by
    default or (..., size, 3) NHWC with `to_chw=False`.

    Bilinear resize + [0,1] scale + ImageNet mean/std, fused. The conv
    towers consume NHWC (TPU-native layout); model paths pass
    `to_chw=False` so the uint8 loader never round-trips through CHW.
    """
    lead = images_u8.shape[:-3]
    h, w = size
    x = images_u8.reshape((-1,) + images_u8.shape[-3:]).astype(jnp.float32)
    x = x / 255.0
    if images_u8.shape[-3:-1] != (h, w):  # dataset loaders ship pre-sized
        x = jax.image.resize(x, (x.shape[0], h, w, 3), method="bilinear")
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if to_chw:
        x = jnp.transpose(x, (0, 3, 1, 2))
        return x.reshape(lead + (3, h, w))
    return x.reshape(lead + (h, w, 3))


def images_to_nhwc(images: jax.Array) -> jax.Array:
    """Model-side image intake: (B, N, 3, H, W) float CHW (host
    preprocessing, torchvision-parity layout) or (B, N, H, W, 3) uint8
    (low-bandwidth device-preprocess layout) -> (B*N, H, W, 3) float NHWC
    for the conv towers."""
    b, n = images.shape[:2]
    if images.dtype == jnp.uint8:
        x = preprocess_uint8_images(images, size=images.shape[2:4],
                                    to_chw=False)
        return x.reshape((b * n,) + x.shape[2:])
    return jnp.transpose(
        images.reshape((b * n,) + images.shape[2:]), (0, 2, 3, 1))
