"""Caption (step text) transformations.

Reimplements `/root/reference/trainers/caption_utils.py:21-88`:
`remove_1st` drops the first sentence (when more than one exists) and
`max_sentence_K` keeps the first K sentences. Split selection by train/eval
prefix is done by the caller (reference `trainers/train.py:650-665`).

Sentence splitting uses a regex splitter (the environment has no nltk punkt
model); boundaries are ., !, ? followed by whitespace + an upper-case/digit
start, which matches punkt on instructional text overwhelmingly often.
"""

from __future__ import annotations

import logging
import re
from typing import List, Optional, Sequence, Union

logger = logging.getLogger(__name__)

_SENT_BOUNDARY = re.compile(r'(?<=[.!?])\s+(?=["\'(]?[A-Z0-9])')


def sent_split(text: str) -> List[str]:
    """Split text into sentences."""
    text = text.strip()
    if not text:
        return []
    return [s for s in _SENT_BOUNDARY.split(text) if s]


class CaptionTransformations:
    """Order-sensitive text surgery pipeline (`caption_utils.py:21-88`)."""

    def __init__(self, args=None, task: Optional[str] = None,
                 caption_transformation_list: Optional[Sequence[str]] = None):
        assert task is not None
        self.args = args
        self.task = task
        self.max_sentence = None
        self.transform_funcs = []
        if caption_transformation_list is None:
            caption_transformation_list = []
        logger.info("Using caption transformations: %s",
                    caption_transformation_list)
        for method in caption_transformation_list:
            if method == "remove_1st":
                self.transform_funcs.append(self._remove_1st_func)
            elif "max_sentence" in method:
                self.max_sentence = int(method.split("max_sentence_")[-1])
                self.transform_funcs.append(self._cap_sentence_func)
            else:
                raise NotImplementedError(
                    f"Caption transformation method: {method} not done yet!")

    def transform(self, captions: Union[str, Sequence[str]]):
        if isinstance(captions, str):
            return self.transform_single_caption(captions)
        return [self.transform_single_caption(c) for c in captions]

    def transform_single_caption(self, caption: str) -> str:
        for fn in self.transform_funcs:
            caption = fn(caption)
        return caption

    def _cap_sentence_func(self, caption: str) -> str:
        return " ".join(sent_split(caption)[:self.max_sentence])

    def _remove_1st_func(self, caption: str) -> str:
        sents = sent_split(caption)
        if len(sents) > 1:
            return " ".join(sents[1:])
        return caption


def select_caption_transforms(args, task: str, split: str):
    """Build the transform active for a split from
    `args.caption_transformations` entries prefixed train_/eval_
    (reference `trainers/train.py:650-665`)."""
    spec = getattr(args, "caption_transformations", None)
    if not spec:
        return None
    prefix = "train_" if split == "train" else "eval_"
    chosen = []
    for item in spec:
        if item.startswith("train_") or item.startswith("eval_"):
            if item.startswith(prefix):
                chosen.append(item[len(prefix):])
        else:
            chosen.append(item)
    if not chosen:
        return None
    return CaptionTransformations(
        args, task, caption_transformation_list=chosen)
