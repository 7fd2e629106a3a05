"""Processor registry keyed `{data_name}_{task_type}`.

Mirrors the reflection-built registries at
`/root/reference/datasets/processors.py:43-79`: data names
{roc, vist, recipeqa, mpii_movie, wikihow} x task types {pairwise, head,
sort, abductive, pure_class, pure_decode, pretrain, hl_v1, retrieve}.
Datasets without shipped processors (roc/vist/mpii_movie, like the
reference's missing classes) register as None.
"""

from __future__ import annotations

from .wikihow import (
    WikiHowPairWiseProcessor, WikiHowAbductiveProcessor,
    WikiHowGeneralProcessor)
from .recipeqa import (
    RecipeQAPairWiseProcessor, RecipeQAAbductiveProcessor,
    RecipeQAGeneralProcessor)

DATA_NAMES = ["roc", "vist", "recipeqa", "mpii_movie", "wikihow"]

TASK_TYPES = {
    "pairwise": "pairwise",
    "head": "general",
    "sort": "general",
    "abductive": "abductive",
    "pure_class": "general",
    "pure_decode": "general",
    "pretrain": "general",
    "hl_v1": "general",
    "retrieve": "general",
}

_PROCESSORS = {
    ("wikihow", "pairwise"): WikiHowPairWiseProcessor,
    ("wikihow", "abductive"): WikiHowAbductiveProcessor,
    ("wikihow", "general"): WikiHowGeneralProcessor,
    ("recipeqa", "pairwise"): RecipeQAPairWiseProcessor,
    ("recipeqa", "abductive"): RecipeQAAbductiveProcessor,
    ("recipeqa", "general"): RecipeQAGeneralProcessor,
}

data_processors = {}
output_modes = {}
for _data in DATA_NAMES:
    for _task, _kind in TASK_TYPES.items():
        key = f"{_data}_{_task}"
        data_processors[key] = _PROCESSORS.get((_data, _kind))
        output_modes[key] = "classification"
        output_modes[_task] = "classification"


def get_processor(task_name: str, **kwargs):
    """Instantiate the processor for `{data}_{tasktype}` with processor
    kwargs (data_dir, order_criteria, story lengths, caption_transforms,
    version_text, pure_class...)."""
    cls = data_processors.get(task_name)
    if cls is None:
        raise NotImplementedError(
            f"Task {task_name} has no shipped processor "
            f"(available: {sorted(k for k, v in data_processors.items() if v)})")
    return cls(**kwargs)
