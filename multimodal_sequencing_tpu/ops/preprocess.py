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


@functools.partial(jax.jit, static_argnames=("size",))
def preprocess_uint8_images(images_u8: jax.Array,
                            size: Tuple[int, int] = (224, 224)) -> jax.Array:
    """(..., H, W, 3) uint8 -> (..., 3, size) normalized float.

    Bilinear resize + [0,1] scale + ImageNet mean/std + HWC->CHW, fused.
    """
    lead = images_u8.shape[:-3]
    h, w = size
    x = images_u8.reshape((-1,) + images_u8.shape[-3:]).astype(jnp.float32)
    x = x / 255.0
    x = jax.image.resize(x, (x.shape[0], h, w, 3), method="bilinear")
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    x = jnp.transpose(x, (0, 3, 1, 2))
    return x.reshape(lead + (3, h, w))
