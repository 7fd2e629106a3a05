"""RecipeQA story processors.

Behavioral reimplementation of `/root/reference/datasets/recipeqa.py`:
recipe JSON parsing (`{"data": [...]}` format), step-image discovery from the
`images/images-qa/*/images-qa/*.jpg` layout, recipe-id dedup, new_splits
version files, pairwise/abductive/general example derivation, and the
`human_annotated_to_test` split-generation utility.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import random
import re
from typing import List

from .examples import (
    DataProcessor, PairWiseExample, AbductiveExample, HeadExample)

logger = logging.getLogger(__name__)

RECIPEQA_DATA_ROOT = "data/recipeQA"


class RecipeQAPairWiseProcessor(DataProcessor):
    """Pairwise ordered/unordered recipe step pairs
    (`datasets/recipeqa.py:18-224`)."""

    def __init__(self, data_dir=None, order_criteria="tight",
                 paired_with_image=True, min_story_length=5,
                 max_story_length=5, version_text=None,
                 caption_transforms=None, **kwargs):
        self.data_dir = data_dir or RECIPEQA_DATA_ROOT
        assert order_criteria in ["tight", "loose"]
        self.order_criteria = order_criteria
        self.paired_with_image = paired_with_image

        min_story_length = max(1, min_story_length)
        max_story_length = max(1, max_story_length)
        min_story_length = min(min_story_length, max_story_length)
        self.min_story_length = min_story_length
        self.max_story_length = max_story_length

        self.caption_transforms = caption_transforms
        self.version_text = version_text
        self.multiref_gt = False

    def get_labels(self):
        return ["unordered", "ordered"]

    def _read_image_paths(self, data_dir=None, split="train"):
        """Map recipe_id -> step_id -> [image paths], parsed from filenames
        `{recipe_id}_{step}[_{imgidx}].jpg` (`datasets/recipeqa.py:59-85`).
        The split dir is globbed with '*' (all splits share one pool)."""
        data_dir = data_dir or self.data_dir
        img_dir = os.path.join(
            data_dir, "images", "images-qa", "*", "images-qa")
        out = {}
        for img_path in sorted(glob.glob(os.path.join(img_dir, "*.jpg"))):
            img_name = img_path.strip().split("/")[-1].split(".")[0]
            parts = img_name.split("_")
            if len(parts) >= 2 and not (len(parts) >= 3 and parts[-2].isdigit()):
                recipe_id = "_".join(parts[:-1])
                step_id = int(parts[-1])
            else:
                recipe_id = "_".join(parts[:-2])
                step_id = int(parts[-2])
            out.setdefault(recipe_id, {}).setdefault(step_id, []).append(
                img_path)
        return out

    def _read_json(self, data_dir=None, split="train"):
        data_dir = data_dir or self.data_dir
        json_path = os.path.join(data_dir, "texts", split + ".json")
        if self.version_text is not None:
            json_path = os.path.join(
                data_dir, "new_splits", f"{split}-{self.version_text}.json")
            if not os.path.exists(json_path):
                raise ValueError(f"File: {json_path} not found!")
        logger.info("Using %s", json_path)

        image_paths = self._read_image_paths(data_dir=data_dir, split=split)
        with open(json_path) as f:
            data = json.load(f)["data"]

        story_seqs = []
        used_recipe_ids = {}
        for data_raw in data:
            recipe_id = data_raw["recipe_id"]
            if recipe_id in used_recipe_ids:
                continue
            used_recipe_ids[recipe_id] = True
            context = data_raw["context"]
            image_paths_curr = image_paths.get(recipe_id, {})

            story_seq = [recipe_id]
            if "multiref_gt" in data_raw and not self.multiref_gt:
                self.multiref_gt = True

            for step in context:
                text = step["body"]
                if self.caption_transforms is not None:
                    text = self.caption_transforms.transform(text)
                step_id = int(step["id"])
                if self.paired_with_image:
                    if step_id not in image_paths_curr:
                        continue
                    element = (text, image_paths_curr[step_id][0])
                else:
                    if step_id not in image_paths_curr:
                        element = (text, None)
                    else:
                        element = (text, image_paths_curr[step_id][0])
                story_seq.append(element)

            if len(story_seq) < self.min_story_length + 1:
                continue
            story_seq = story_seq[:self.max_story_length + 1]
            if self.multiref_gt:
                story_seq = {"story_seq": story_seq,
                             "multiref_gt": data_raw["multiref_gt"]}
            # Reference keeps the story regardless of the length window here
            # (`recipeqa.py:159-164` both branches append).
            story_seqs.append(story_seq)

        logger.info("There are %d valid story sequences in %s",
                    len(story_seqs), json_path)
        return story_seqs

    def _unwrap(self, story_seq):
        if self.multiref_gt:
            return story_seq["story_seq"], story_seq["multiref_gt"]
        return story_seq, None

    def _create_examples(self, lines) -> List[PairWiseExample]:
        examples = []
        for story_seq in lines:
            story_seq, multiref_gt = self._unwrap(story_seq)
            story_id, story_seq = story_seq[0], story_seq[1:]
            n = len(story_seq)
            for i in range(n):
                for j in range(n):
                    if i == j:
                        continue
                    if self.order_criteria == "tight":
                        label = "ordered" if j == i + 1 else "unordered"
                    else:
                        label = "ordered" if j > i else "unordered"
                    examples.append(PairWiseExample(
                        guid=f"{story_id}_{i+1}{j+1}",
                        text_a=story_seq[i][0], text_b=story_seq[j][0],
                        label=label,
                        img_path_a=story_seq[i][1],
                        img_path_b=story_seq[j][1],
                        distance=abs(j - i), multiref_gt=multiref_gt))
        return examples

    def get_train_examples(self, data_dir=None):
        return self._create_examples(self._read_json(data_dir, "train"))

    def get_dev_examples(self, data_dir=None):
        return self._create_examples(self._read_json(data_dir, "val"))

    def get_test_examples(self, data_dir=None):
        return self._create_examples(self._read_json(data_dir, "test"))


class RecipeQAAbductiveProcessor(RecipeQAPairWiseProcessor):
    """Abductive triples (`datasets/recipeqa.py:227-337`)."""

    def __init__(self, data_dir=None, pred_method="binary",
                 paired_with_image=True, min_story_length=5,
                 max_story_length=5, version_text=None,
                 caption_transforms=None, **kwargs):
        super().__init__(data_dir=data_dir, order_criteria="tight",
                         paired_with_image=paired_with_image,
                         min_story_length=min_story_length,
                         max_story_length=max_story_length,
                         version_text=version_text,
                         caption_transforms=caption_transforms)
        assert pred_method in ["binary", "contrastive"]
        self.pred_method = pred_method

    def _create_examples(self, lines) -> List[AbductiveExample]:
        examples = []
        for story_seq in lines:
            story_seq, multiref_gt = self._unwrap(story_seq)
            story_id, story_seq = story_seq[0], story_seq[1:]
            n = len(story_seq)
            for i in range(n - 2):
                all_idx = set(range(n))
                curr_idx = sorted(set(range(i, i + 3)))
                for k in list(all_idx - set(curr_idx)):
                    abd = [curr_idx[0], k, curr_idx[1]]
                    examples.append(self._triple(
                        story_id, story_seq, abd, "unordered", multiref_gt))
                examples.append(self._triple(
                    story_id, story_seq, curr_idx, "ordered", multiref_gt))
        return examples

    def _triple(self, story_id, story_seq, abd, label, multiref_gt):
        return AbductiveExample(
            guid=f"{story_id}_{abd[0]}{abd[1]}{abd[2]}",
            label=label if self.pred_method == "binary" else None,
            text_h1=story_seq[abd[0]][0],
            text_h2=story_seq[abd[1]][0],
            text_h3=story_seq[abd[2]][0],
            img_path_h1=story_seq[abd[0]][1],
            img_path_h2=story_seq[abd[1]][1],
            img_path_h3=story_seq[abd[2]][1],
            multiref_gt=multiref_gt)


class RecipeQAGeneralProcessor(RecipeQAPairWiseProcessor):
    """Whole-story examples (`datasets/recipeqa.py:340-418`)."""

    def __init__(self, data_dir=None, max_story_length=5, pure_class=False,
                 paired_with_image=True, min_story_length=5,
                 version_text=None, caption_transforms=None, **kwargs):
        super().__init__(data_dir=data_dir, order_criteria="tight",
                         paired_with_image=paired_with_image,
                         min_story_length=min_story_length,
                         max_story_length=max_story_length,
                         version_text=version_text,
                         caption_transforms=caption_transforms)
        self.pure_class = pure_class

    def get_labels(self):
        if self.pure_class:
            fact = 1
            for i in range(1, self.max_story_length + 1):
                fact *= i
            return [0] * fact
        return list(range(self.max_story_length))

    def _create_examples(self, lines) -> List[HeadExample]:
        examples = []
        for story_seq in lines:
            story_seq, multiref_gt = self._unwrap(story_seq)
            story_id, story_seq = story_seq[0], story_seq[1:]
            examples.append(HeadExample(
                guid=story_id,
                text_seq=[x[0] for x in story_seq],
                img_path_seq=[x[1] for x in story_seq],
                multiref_gt=multiref_gt))
        return examples


def human_annotated_to_test(data_dir, human_annotated_json_files,
                            out_dir=None, version="human_annot"):
    """Regenerate train/val/test splits holding out human-annotated recipes
    (`datasets/recipeqa.py:421-537`), as a callable API (no argparse)."""
    random.seed(42)
    human = {}
    for path in human_annotated_json_files:
        with open(path) as f:
            for line in f:
                datum = json.loads(line.strip())
                human[datum["guid"]] = datum

    out_dir = out_dir or data_dir
    buckets = {"train": [], "val": [], "test": []}
    human_data = []
    for json_path in sorted(glob.glob(os.path.join(data_dir, "texts", "*.json"))):
        with open(json_path) as f:
            data_curr = json.load(f)["data"]
        for data_raw in data_curr:
            if data_raw["recipe_id"] in human:
                human_data.append(data_raw)
            else:
                for split in buckets:
                    if split in os.path.basename(json_path):
                        buckets[split].append(data_raw)

    train_ids = {d["recipe_id"] for d in buckets["train"]}
    for split in ("val", "test"):
        for d in buckets[split]:
            assert d["recipe_id"] not in train_ids, (
                f"recipe_id: {d['recipe_id']} is in train!")

    buckets["test"] = buckets["test"] + human_data
    os.makedirs(out_dir, exist_ok=True)
    for split, data in [("train", buckets["train"]), ("val", buckets["val"]),
                        ("test", buckets["test"])]:
        with open(os.path.join(out_dir, f"{split}-{version}.json"), "w") as f:
            json.dump({"version": 0.9, "data": data}, f, indent=4)
    with open(os.path.join(out_dir, f"test-{version}_only.json"), "w") as f:
        json.dump({"version": 0.9, "data": human_data}, f, indent=4)


_WORD_RE = re.compile(r"\w+|[^\w\s]")


def _word_tokenize(text: str) -> List[str]:
    """Lowercase word/punct split (stand-in for the reference's nltk
    `word_tokenize`, which is an offline-dump detail, not model input)."""
    return _WORD_RE.findall(text.lower())


def output_to_tsv(data_dir, out_dir):
    """Offline dump of the RecipeQA splits as plain-text TSVs
    (`datasets/recipeqa.py:543-601`): one story per line, sentences
    lowercase-word-tokenized and joined by " <eos> "; test splits also get
    a `{split}_examples.json` JSONL of {"url": guid}."""
    from .caption_transforms import CaptionTransformations

    proc = RecipeQAGeneralProcessor(
        data_dir=data_dir, version_text="human_annot",
        caption_transforms=CaptionTransformations(
            None, "wikihow",
            caption_transformation_list=["train_max_sentence_5"]))
    proc_human = RecipeQAGeneralProcessor(
        data_dir=data_dir, version_text="human_annot_only",
        caption_transforms=CaptionTransformations(
            None, "wikihow",
            caption_transformation_list=["eval_max_sentence_5"]))

    os.makedirs(out_dir, exist_ok=True)
    all_examples = [
        ("train", proc.get_train_examples()),
        ("dev", proc.get_dev_examples()),
        ("test", proc.get_test_examples()),
        ("human_test", proc_human.get_test_examples()),
    ]
    for split, examples in all_examples:
        tsv_path = os.path.join(out_dir, f"{split}.tsv")
        json_path = os.path.join(out_dir, f"{split}_examples.json")
        with open(tsv_path, "w") as out_tsv:
            out_json = open(json_path, "w") if "test" in split else None
            for example in examples:
                sents = [" ".join(_word_tokenize(s))
                         for s in example.text_seq]
                out_tsv.write(" <eos> ".join(sents) + "\n")
                if out_json is not None:
                    out_json.write(json.dumps({"url": example.guid}) + "\n")
            if out_json is not None:
                out_json.close()
