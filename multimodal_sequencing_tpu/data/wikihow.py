"""WikiHow instructional-story processors.

Behavioral reimplementation of `/root/reference/datasets/wikihow.py`:
JSONL parsing, image-path fixups across mirror directories, missing-image
logging, `human_annot_only_filtered` gating, story length filters, pairwise /
abductive / general example derivation, multiref ground-truth passthrough.
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional

from .examples import (
    DataProcessor, PairWiseExample, AbductiveExample, HeadExample)

logger = logging.getLogger(__name__)

WIKIHOW_DATA_ROOT = "data/wikihow"

# Preferred step-image fields, in order (`datasets/wikihow.py:19-22`).
IMAGE_FIELD_NAMES = ["image-large", "image-src-1"]


class WikiHowPairWiseProcessor(DataProcessor):
    """Pairwise ordered/unordered step pairs (`datasets/wikihow.py:25-296`).

    order_criteria: "tight" = only j==i+1 pairs are 'ordered';
    "loose" = all j>i pairs are 'ordered'.
    """

    def __init__(self, data_dir=None, order_criteria="tight",
                 paired_with_image=True, min_story_length=5,
                 max_story_length=5, caption_transforms=None, **kwargs):
        self.data_dir = data_dir or WIKIHOW_DATA_ROOT
        assert order_criteria in ["tight", "loose"]
        self.order_criteria = order_criteria
        self.paired_with_image = paired_with_image

        min_story_length = max(1, min_story_length)
        max_story_length = max(1, max_story_length)
        min_story_length = min(min_story_length, max_story_length)
        self.min_story_length = min_story_length
        self.max_story_length = max_story_length

        self.caption_transforms = caption_transforms
        self.version_text = kwargs.get("version_text")
        self.multiref_gt = False

    def get_labels(self):
        return ["unordered", "ordered"]  # 0: unordered, 1: ordered

    # ----- raw story reading -------------------------------------------------

    def _json_path(self, data_dir: str, split: str) -> str:
        if self.version_text is not None:
            path = os.path.join(
                data_dir, f"wikihow-{self.version_text}-{split}.json")
            if not os.path.exists(path):
                raise ValueError(f"File: {path} not found!")
            return path
        return os.path.join(data_dir, f"wikihow-{split}.json")

    def _resolve_image(self, data_dir: str, image_path: str) -> Optional[str]:
        """Image path fixups across the three mirror dir layouts
        (`datasets/wikihow.py:174-199`)."""
        image_path = os.path.join(data_dir, image_path)
        if "wikihow.com" not in image_path:
            cand = image_path.replace("/images/", "/www.wikihow.com/images/")
        else:
            cand = image_path
        if os.path.exists(cand):
            return cand
        cand = image_path.replace("/images/", "/wikihow.com/images/")
        if os.path.exists(cand):
            return cand
        return None

    def _read_json(self, data_dir=None, split="train"):
        """Read JSONL stories; each yielded story is
        [story_id, (text, img_path), ...] or a multiref dict wrapper
        (`datasets/wikihow.py:69-241`)."""
        data_dir = data_dir or self.data_dir
        json_path = self._json_path(data_dir, split)
        logger.info("Using %s", json_path)

        with open(json_path) as f:
            data = [json.loads(line.strip()) for line in f if line.strip()]

        human_check_dict = None
        if self.version_text == "human_annot_only_filtered":
            human_json = os.path.join(
                data_dir, "wikihow_human_studies_picked.jsonl")
            human_check_dict = {}
            with open(human_json) as hf:
                for line in hf:
                    dd = json.loads(line.strip())
                    key = dd["steps"][0]["text"].split(".")[0]
                    human_check_dict[key] = True

        story_seqs = []
        missing_images = []
        for data_raw in data:
            wikihow_url = data_raw["url"]
            if "multiref_gt" in data_raw and not self.multiref_gt:
                self.multiref_gt = True

            for section_id, section in enumerate(data_raw["sections"]):
                page_id = "###".join([wikihow_url, str(section_id)])
                story_seq = [page_id]
                include_data = human_check_dict is None

                for step_id, step in enumerate(section["steps"]):
                    step_text = step["step_text"]["text"]
                    bullets = step["step_text"]["bullet_points"]
                    combined_text = " ".join([step_text] + bullets)

                    if human_check_dict is not None:
                        if combined_text.split(".")[0] in human_check_dict:
                            include_data = True

                    if self.caption_transforms is not None:
                        combined_text = self.caption_transforms.transform(
                            combined_text)

                    element = None
                    if self.paired_with_image:
                        for field in IMAGE_FIELD_NAMES:
                            if field not in step.get("step_assets", {}):
                                continue
                            raw = step["step_assets"][field]
                            if raw is None or len(raw) == 0:
                                missing_images.append(
                                    page_id + "###" + str(step_id))
                                continue
                            resolved = self._resolve_image(data_dir, raw)
                            if resolved is None:
                                missing_images.append(
                                    page_id + "###" + str(step_id))
                            else:
                                element = (combined_text, resolved)
                                break
                    else:
                        element = (combined_text, None)

                    if element is not None:
                        story_seq.append(element)

                if len(story_seq) < self.min_story_length + 1 or not include_data:
                    continue
                story_seq = story_seq[:self.max_story_length + 1]
                curr_len = len(story_seq)
                if self.multiref_gt:
                    story_seq = {"story_seq": story_seq,
                                 "multiref_gt": data_raw["multiref_gt"]}
                if (self.min_story_length + 1 <= curr_len
                        <= self.max_story_length + 1):
                    story_seqs.append(story_seq)

        logger.warning("Number of missing images in %s: %d",
                       split, len(missing_images))
        try:
            miss_path = os.path.join(
                data_dir, f"missing_images_{split}.txt")
            with open(miss_path, "w") as mf:
                mf.writelines(p + "\n" for p in missing_images)
            logger.info("Missing-image log saved at: %s", miss_path)
        except OSError:
            pass  # read-only data dirs are fine
        logger.info("There are %d valid story sequences in %s",
                    len(story_seqs), json_path)
        return story_seqs

    # ----- example derivation ------------------------------------------------

    def _unwrap(self, story_seq):
        if self.multiref_gt:
            return story_seq["story_seq"], story_seq["multiref_gt"]
        return story_seq, None

    def _create_examples(self, lines) -> List[PairWiseExample]:
        """All ordered (i, j) i!=j pairs with tight/loose labels
        (`datasets/wikihow.py:243-281`)."""
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
        return self._create_examples(self._read_json(data_dir, "dev"))

    def get_test_examples(self, data_dir=None):
        return self._create_examples(self._read_json(data_dir, "test"))


class WikiHowAbductiveProcessor(WikiHowPairWiseProcessor):
    """Abductive (h1, h2, h3) triples (`datasets/wikihow.py:299-412`)."""

    def __init__(self, data_dir=None, pred_method="binary",
                 paired_with_image=True, min_story_length=5,
                 max_story_length=5, caption_transforms=None,
                 version_text=None, **kwargs):
        super().__init__(data_dir=data_dir, order_criteria="tight",
                         paired_with_image=paired_with_image,
                         min_story_length=min_story_length,
                         max_story_length=max_story_length,
                         caption_transforms=caption_transforms,
                         version_text=version_text)
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
                left_idx = list(all_idx - set(curr_idx))
                # negative triples: (i, k, i+1) with k outside the window
                for k in left_idx:
                    abd = [curr_idx[0], k, curr_idx[1]]
                    examples.append(self._triple(
                        story_id, story_seq, abd, "unordered", multiref_gt))
                # positive triple: the consecutive window itself
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


class WikiHowGeneralProcessor(WikiHowPairWiseProcessor):
    """Whole-story examples for head/sort/pure_class/pretrain tasks
    (`datasets/wikihow.py:415-492`)."""

    def __init__(self, data_dir=None, max_story_length=5, pure_class=False,
                 paired_with_image=True, min_story_length=5,
                 caption_transforms=None, version_text=None, **kwargs):
        super().__init__(data_dir=data_dir, order_criteria="tight",
                         paired_with_image=paired_with_image,
                         min_story_length=min_story_length,
                         max_story_length=max_story_length,
                         caption_transforms=caption_transforms,
                         version_text=version_text)
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


def read_in_wikihow_categories(cat_path=None, cat_level=1,
                               data_root=WIKIHOW_DATA_ROOT):
    """Category mapping reader (`datasets/wikihow.py:496-518`)."""
    json_f = cat_path or os.path.join(
        data_root, "wikihow-categories-output.json")
    url2cat, cat2url = {}, {}
    with open(json_f) as f:
        for line in f:
            cat = json.loads(line.strip())
            url = cat["url"]
            categories = cat["categories"]
            if len(categories) - 1 >= cat_level:
                desc = categories[cat_level]["category title"]
            elif len(categories) - 1 >= 1:
                desc = categories[-1]["category title"]
            else:
                desc = "Root"
            url2cat[url] = desc
            cat2url.setdefault(desc, []).append(url)
    return url2cat, cat2url
