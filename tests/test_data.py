"""Data-layer tests: processors, packing, datasets, loaders."""

import numpy as np
import pytest

from multimodal_sequencing_tpu.data import (
    WikiHowPairWiseProcessor, WikiHowGeneralProcessor,
    WikiHowAbductiveProcessor, RecipeQAPairWiseProcessor,
    RecipeQAGeneralProcessor, get_processor, data_processors,
    PairwiseDataset, HeadPredDataset, PureClassDataset, SortDataset,
    PretrainDataset, AbductiveDataset, data_loader)
from multimodal_sequencing_tpu.data.packing import StoryPacker
from multimodal_sequencing_tpu.data.caption_transforms import (
    CaptionTransformations, sent_split)


def test_registry_surface():
    assert set(k for k in data_processors if k.startswith("wikihow_")) == {
        f"wikihow_{t}" for t in ["pairwise", "head", "sort", "abductive",
                                 "pure_class", "pure_decode", "pretrain",
                                 "hl_v1", "retrieve"]}
    assert data_processors["wikihow_pairwise"] is WikiHowPairWiseProcessor
    assert data_processors["wikihow_hl_v1"] is WikiHowGeneralProcessor
    assert data_processors["roc_pairwise"] is None
    with pytest.raises(NotImplementedError):
        get_processor("roc_pairwise")


def test_wikihow_pairwise_processor(wikihow_dir):
    proc = WikiHowPairWiseProcessor(data_dir=wikihow_dir,
                                    order_criteria="tight")
    ex = proc.get_train_examples()
    # 6 articles x 1 section x 5 steps -> 6 * 5*4 = 120 pairs
    assert len(ex) == 120
    # tight: exactly 4 ordered pairs per story
    ordered = [e for e in ex if e.label == "ordered"]
    assert len(ordered) == 6 * 4
    assert all(e.img_path_a and e.img_path_a.endswith(".png")
               for e in ex[:10])
    # loose labels
    proc_l = WikiHowPairWiseProcessor(data_dir=wikihow_dir,
                                      order_criteria="loose")
    exl = proc_l.get_train_examples()
    assert sum(e.label == "ordered" for e in exl) == 6 * 10


def test_wikihow_version_text_split(wikihow_dir):
    proc = WikiHowGeneralProcessor(data_dir=wikihow_dir,
                                   version_text="acl22")
    assert len(proc.get_train_examples()) == 3
    proc2 = WikiHowGeneralProcessor(data_dir=wikihow_dir,
                                    version_text="acl22_human")
    assert len(proc2.get_test_examples()) == 2
    with pytest.raises(ValueError):
        WikiHowGeneralProcessor(
            data_dir=wikihow_dir, version_text="nope")._read_json(
                split="train")


def test_wikihow_abductive(wikihow_dir):
    proc = WikiHowAbductiveProcessor(data_dir=wikihow_dir)
    ex = proc.get_dev_examples()
    # per story: i in 0..2, each with (5-3)=2 negatives + 1 positive = 9
    assert len(ex) == 2 * 9
    assert {e.label for e in ex} == {"ordered", "unordered"}


def test_recipeqa_processors(recipeqa_dir):
    proc = RecipeQAPairWiseProcessor(data_dir=recipeqa_dir)
    ex = proc.get_train_examples()
    assert len(ex) == 5 * 20
    gen = RecipeQAGeneralProcessor(data_dir=recipeqa_dir)
    stories = gen.get_dev_examples()
    assert len(stories) == 2
    assert len(stories[0].text_seq) == 5
    assert stories[0].img_path_seq[0].endswith("_0_0.jpg")


def test_recipeqa_output_to_tsv(recipeqa_dir, tmp_path):
    import json as _json
    import os
    from multimodal_sequencing_tpu.data.recipeqa import (
        human_annotated_to_test, output_to_tsv)
    # mark one test recipe as human-annotated, regenerate the new_splits
    human_file = tmp_path / "human.jsonl"
    human_file.write_text(_json.dumps({"guid": "test-recipe_0"}) + "\n")
    new_splits = os.path.join(recipeqa_dir, "new_splits")
    human_annotated_to_test(recipeqa_dir, [str(human_file)],
                            out_dir=new_splits)
    out = str(tmp_path / "tsv")
    output_to_tsv(recipeqa_dir, out)
    for split in ("train", "dev", "test", "human_test"):
        lines = open(os.path.join(out, f"{split}.tsv")).read().splitlines()
        assert lines, split
        assert " <eos> " in lines[0]
        assert lines[0] == lines[0].lower()
    # test splits carry the guid JSONL sidecar
    recs = [_json.loads(l) for l in
            open(os.path.join(out, "test_examples.json"))]
    assert all("url" in r for r in recs)
    human_recs = [_json.loads(l) for l in
                  open(os.path.join(out, "human_test_examples.json"))]
    assert [r["url"] for r in human_recs] == ["test-recipe_0"]


def test_caption_transforms():
    text = "First sentence here. Second one now. Third arrives. Fourth!"
    assert len(sent_split(text)) == 4
    ct = CaptionTransformations(task="wikihow",
                                caption_transformation_list=["remove_1st"])
    assert ct.transform(text).startswith("Second")
    ct2 = CaptionTransformations(
        task="wikihow", caption_transformation_list=["max_sentence_2"])
    assert ct2.transform(text) == "First sentence here. Second one now."
    ct3 = CaptionTransformations(
        task="wikihow",
        caption_transformation_list=["remove_1st", "max_sentence_1"])
    assert ct3.transform(text) == "Second one now."
    # single-sentence captions survive remove_1st
    assert ct.transform("Only one sentence.") == "Only one sentence."


def test_story_packing(tokenizer):
    packer = StoryPacker(tokenizer, max_seq_length=64, per_seq_max_length=10)
    texts = ["one two three", "four five", "six seven eight nine"]
    ii, am, tt = packer.pack_story(texts)
    assert ii.shape == (64,) and am.shape == (64,) and tt.shape == (64,)
    # every step contributes its own CLS
    cls_positions = np.where(ii == tokenizer.cls_token_id)[0]
    assert len(cls_positions) == 3
    # token types are step indices at CLS positions
    assert [tt[p] for p in cls_positions] == [0, 1, 2]
    # attention mask == non-pad
    np.testing.assert_array_equal(am, (ii != tokenizer.pad_token_id))
    # pads are stripped between steps: segment 0 is contiguous
    seg_ends = np.where(ii == tokenizer.sep_token_id)[0]
    assert len(seg_ends) == 3
    # truncation to per_seq_max_length
    long = " ".join(["word"] * 50)
    ids = packer.encode_step(long)
    assert len(ids) == 10 and ids[-1] == tokenizer.sep_token_id


def test_pack_all_pairs(tokenizer):
    packer = StoryPacker(tokenizer, max_seq_length=32, per_seq_max_length=8)
    texts = [f"step {i} text" for i in range(4)]
    ii, am, tt, idx = packer.pack_all_pairs(texts)
    assert ii.shape == (12, 32)
    assert idx.shape == (12, 2)
    assert idx[0].tolist() == [0, 1] and idx[-1].tolist() == [3, 2]


def _head_examples(wikihow_dir, **kw):
    return WikiHowGeneralProcessor(data_dir=wikihow_dir,
                                   **kw).get_train_examples()


def test_head_pred_dataset(wikihow_dir, tokenizer):
    ex = _head_examples(wikihow_dir)
    ds = HeadPredDataset(ex, tokenizer, max_length=128,
                         per_seq_max_length=16, seed=11)
    item = ds[0]
    assert item["input_ids"].shape == (128,)
    assert 0 <= item["labels"] < 5
    # deterministic: same (seed, epoch, idx) -> same scramble
    item2 = ds.__getitem__(0, epoch=0)
    np.testing.assert_array_equal(item["input_ids"], item2["input_ids"])
    # different epoch -> (almost surely) different scramble somewhere
    diffs = [not np.array_equal(
        ds.__getitem__(i, epoch=1)["input_ids"], ds[i]["input_ids"])
        for i in range(len(ds))]
    assert any(diffs)


def test_pure_class_dataset(wikihow_dir, tokenizer):
    ex = _head_examples(wikihow_dir)
    ds = PureClassDataset(ex, tokenizer, max_length=128,
                          per_seq_max_length=16, seed=3)
    item = ds[1]
    assert 0 <= item["labels"] < 120
    # decode mode yields the argsort order
    dsd = PureClassDataset(ex, tokenizer, max_length=128,
                           per_seq_max_length=16, seed=3, decode=True)
    item_d = dsd[1]
    assert sorted(item_d["labels"].tolist()) == [0, 1, 2, 3, 4]
    # the permutation class id round-trips to the same order
    from multimodal_sequencing_tpu.utils.permutation import (
        permutation_unrank)
    perm = permutation_unrank(int(item["labels"]), 5)
    assert np.array_equal(np.argsort(perm), item_d["labels"])


def test_sort_and_pretrain_datasets(wikihow_dir, tokenizer):
    ex = _head_examples(wikihow_dir)
    sd = SortDataset(ex, tokenizer, max_length=128, per_seq_max_length=16,
                     seed=5)
    item = sd[0]
    assert len(item["texts"]) == 5
    assert sorted(item["labels"].tolist()) == [0, 1, 2, 3, 4]
    # unscrambled pretrain story: labels (head idx) == 0
    pd = PretrainDataset(ex, tokenizer, max_length=128,
                         per_seq_max_length=16)
    assert pd[0]["labels"] == 0


def test_pairwise_and_abductive_datasets(wikihow_dir, tokenizer):
    proc = WikiHowPairWiseProcessor(data_dir=wikihow_dir)
    ds = PairwiseDataset(proc.get_dev_examples(), tokenizer, processor=proc,
                         max_length=64, per_seq_max_length=16)
    item = ds[0]
    assert item["labels"] in (0, 1)
    aproc = WikiHowAbductiveProcessor(data_dir=wikihow_dir)
    ads = AbductiveDataset(aproc.get_dev_examples(), tokenizer,
                           max_length=96, per_seq_max_length=16)
    item = ads[0]
    n_cls = (item["input_ids"] == tokenizer.cls_token_id).sum()
    assert n_cls == 3


def test_multimodal_dataset_images(wikihow_dir, tokenizer):
    ex = _head_examples(wikihow_dir)
    ds = HeadPredDataset(ex, tokenizer, max_length=128, per_seq_max_length=16,
                         multimodal=True, image_size=(32, 32), seed=1)
    item = ds[0]
    assert item["images"].shape == (5, 3, 32, 32)
    assert item["images"].dtype == np.float32
    assert np.abs(item["images"]).max() > 0


def test_uint8_image_pipeline_default(wikihow_dir, tokenizer):
    """--device_image_preprocess (uint8 HWC + on-device normalize tail) is
    the CLI default; --host_image_preprocess restores the reference-parity
    float CHW host pipeline. Every multimodal dataset family honors the
    switch, including the non-story pairwise/abductive/retrieval loaders."""
    from multimodal_sequencing_tpu.train.cli import build_parser
    base = ["--model_name_or_path", "simple", "--output_dir", "/tmp/x"]
    assert build_parser("train").parse_args(
        base).device_image_preprocess is True
    assert build_parser("train").parse_args(
        base + ["--host_image_preprocess"]).device_image_preprocess is False

    kw = dict(max_length=96, per_seq_max_length=16, multimodal=True,
              image_size=(32, 32), uint8_images=True, seed=1)
    item = HeadPredDataset(_head_examples(wikihow_dir), tokenizer, **kw)[0]
    assert item["images"].shape == (5, 32, 32, 3)
    assert item["images"].dtype == np.uint8
    assert item["images"].max() > 0

    proc = WikiHowPairWiseProcessor(data_dir=wikihow_dir)
    pitem = PairwiseDataset(proc.get_dev_examples(), tokenizer,
                            processor=proc, **kw)[0]
    assert pitem["images"].shape == (2, 32, 32, 3)
    assert pitem["images"].dtype == np.uint8

    aproc = WikiHowAbductiveProcessor(data_dir=wikihow_dir)
    aitem = AbductiveDataset(aproc.get_dev_examples(), tokenizer, **kw)[0]
    assert aitem["images"].shape == (3, 32, 32, 3)
    assert aitem["images"].dtype == np.uint8

    from multimodal_sequencing_tpu.data import RetrievalDataset
    rds = RetrievalDataset(_head_examples(wikihow_dir), tokenizer, **kw)
    assert rds[0]["images"].dtype == np.uint8
    assert rds.candidates_list()[0]["images"].dtype == np.uint8


def test_data_loader_static_shapes(wikihow_dir, tokenizer):
    ex = _head_examples(wikihow_dir)  # 6 stories
    ds = HeadPredDataset(ex, tokenizer, max_length=128, per_seq_max_length=16,
                         seed=0)
    batches = list(data_loader(ds, batch_size=4, shuffle=True, seed=0))
    assert len(batches) == 2
    for b in batches:
        assert b["input_ids"].shape == (4, 128)
    assert batches[0]["valid"].all()
    assert batches[1]["valid"].sum() == 2
    # shuffling is deterministic given the seed
    again = list(data_loader(ds, batch_size=4, shuffle=True, seed=0))
    np.testing.assert_array_equal(batches[0]["input_ids"],
                                  again[0]["input_ids"])


def test_multiref_pipeline(tmp_path, tokenizer):
    """Multiref ground truth flows from JSONL through SortDataset to the
    multiref-max metrics (reference: wikihow multiref_gt passthrough +
    `processors.py:824-837` + `metrics.py:21-55`)."""
    import json
    from multimodal_sequencing_tpu.data import (
        WikiHowGeneralProcessor, SortDataset)
    from multimodal_sequencing_tpu.utils.metrics import compute_metrics

    root = tmp_path / "wh"
    root.mkdir()
    records = []
    for a in range(2):
        steps = []
        for s in range(4):
            steps.append({
                "step_headline": None,
                "step_text": {"text": f"Article {a} step {s} does a thing.",
                              "bullet_points": []},
                "step_assets": {},
            })
        records.append({
            "url": f"u{a}", "title": "t", "summary": "s",
            "sections": [{"steps": steps}],
            # refs are 1-based orders incl. the identity (reference asserts
            # the identity is present after offset removal)
            "multiref_gt": [[1, 2, 3, 4], [2, 1, 3, 4]],
        })
    with open(root / "wikihow-test.json", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")

    proc = WikiHowGeneralProcessor(data_dir=str(root), max_story_length=4,
                                   min_story_length=4,
                                   paired_with_image=False)
    examples = proc.get_test_examples()
    assert proc.multiref_gt
    assert examples[0].multiref_gt == [[1, 2, 3, 4], [2, 1, 3, 4]]

    ds = SortDataset(examples, tokenizer, max_length=64,
                     per_seq_max_length=12, max_story_length=4,
                     min_story_length=4, seed=0)
    item = ds[0]
    labels = item["labels"]
    assert labels.shape == (2, 4)  # two references

    # scoring a prediction equal to one reference scores EM=1 via max
    class A:
        max_story_length = 4
        multiref_metrics = "max"
    pred = labels[1].tolist()
    assert compute_metrics(A(), "exact_match", [pred], [labels]) == 1.0


def test_retrieval_dataset(wikihow_dir, tokenizer):
    from multimodal_sequencing_tpu.data import RetrievalDataset
    ex = _head_examples(wikihow_dir)
    ds = RetrievalDataset(ex, tokenizer, max_length=128,
                          per_seq_max_length=16, seed=0)
    item = ds[0]
    # one step skipped: 4 CLS tokens packed
    assert (item["input_ids"] == tokenizer.cls_token_id).sum() == 4
    assert sorted(item["labels"].tolist()) == [0, 1, 2, 3, 4]
    skip = int(item["skip_idx"])
    assert item["guid"].endswith(f"###{skip}")
    # the skipped step's label position is last in the argsort input
    cands = ds.candidates_list()
    assert len(cands) == 6 * 5
    assert cands[0]["input_ids"].shape == (16,)
