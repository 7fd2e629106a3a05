"""Masked-language-model masking.

Numpy reimplementation of `mask_tokens_sentence`
(`/root/reference/trainers/train_utils.py:19-66`): per sequence, mask each
non-pad token with `mlm_probability`; never mask CLS tokens; of masked
positions 80% become [MASK], 10% a random token from [cls_id+1, vocab), 10%
stay. Labels are `ignore_index` everywhere except masked positions.

Runs on host over the packed numpy batch (the masking decisions are data-
dependent bit twiddling, not FLOPs) with a deterministic per-batch Philox
stream; the masked batch then ships to device once.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def mask_tokens_sentence(
        input_ids: np.ndarray, *, mlm_probability: float, pad_id: int,
        cls_id: int, mask_id: int, vocab_size: int,
        ignore_index: int = -100,
        rng: np.random.Generator) -> Tuple[np.ndarray, np.ndarray]:
    """input_ids: (B, L) int. Returns (masked_inputs, labels)."""
    inputs = input_ids.copy()
    labels = input_ids.copy()

    non_pad = inputs != pad_id
    is_cls = inputs == cls_id
    candidates = non_pad & ~is_cls

    masked = (rng.random(inputs.shape) < mlm_probability) & candidates
    labels[~masked] = ignore_index

    replaced = (rng.random(inputs.shape) < 0.8) & masked
    inputs[replaced] = mask_id

    random_mask = (rng.random(inputs.shape) < 0.5) & masked & ~replaced
    random_words = rng.integers(cls_id + 1, vocab_size, size=inputs.shape,
                                dtype=np.int64)
    inputs[random_mask] = random_words[random_mask]
    return inputs, labels
