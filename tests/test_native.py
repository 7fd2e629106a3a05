"""Native packer parity: C kernels vs the numpy reference paths."""

import numpy as np
import pytest

from multimodal_sequencing_tpu.data import _native
from multimodal_sequencing_tpu.data.packing import StoryPacker


@pytest.fixture(scope="module")
def native_ok():
    if not _native.available():
        pytest.skip("native packer not built and no compiler available")
    return True


def _rand_steps(rng, n, lo=3, hi=12):
    return [np.concatenate([[0], rng.randint(5, 900, rng.randint(lo, hi)),
                            [2]]).astype(np.int32) for _ in range(n)]


def test_pack_story_parity(native_ok):
    rng = np.random.RandomState(0)
    for _ in range(20):
        steps = _rand_steps(rng, rng.randint(1, 6))
        L = rng.randint(8, 80)
        ids, types = _native.pack_story(steps, L, 1)
        # numpy reference
        cat = np.concatenate(steps)
        ref_ids = np.full(L, 1, np.int32)
        ref_types = np.zeros(L, np.int32)
        tps = np.concatenate([np.full(len(s), i, np.int32)
                              for i, s in enumerate(steps)])
        m = min(L, len(cat))
        ref_ids[:m] = cat[:m]
        ref_types[:m] = tps[:m]
        np.testing.assert_array_equal(ids, ref_ids)
        np.testing.assert_array_equal(types, ref_types)


def test_pack_all_pairs_parity(native_ok, tokenizer):
    packer = StoryPacker(tokenizer, max_seq_length=40, per_seq_max_length=10)
    texts = [f"some step {i} words here and there" for i in range(5)]
    step_ids = packer.encode_steps(texts)
    nat = _native.pack_all_pairs(step_ids, 40, tokenizer.pad_token_id)
    assert nat is not None
    n_ids, n_types, n_idx = nat
    # numpy reference via the fallback path
    pairs, idx = [], []
    for i in range(5):
        for j in range(5):
            if i != j:
                pairs.append(packer.pack([step_ids[i], step_ids[j]], 40))
                idx.append((i, j))
    np.testing.assert_array_equal(n_ids, np.stack([p[0] for p in pairs]))
    np.testing.assert_array_equal(n_types, np.stack([p[2] for p in pairs]))
    np.testing.assert_array_equal(n_idx, np.asarray(idx, np.int32))


def test_pack_berson_parity(native_ok, tokenizer):
    packer = StoryPacker(tokenizer, max_seq_length=40, per_seq_max_length=8)
    texts = [f"berson step {i} alpha beta gamma" for i in range(4)]
    label = [2, 0, 3, 1]
    item = packer.pack_berson_story(texts, label)  # native path
    # force numpy path
    step_ids = packer.encode_steps(texts)
    import multimodal_sequencing_tpu.data._native as nat_mod
    saved = nat_mod._LIB
    nat_mod._LIB = None
    try:
        ref = packer.pack_berson_story(texts, label)
    finally:
        nat_mod._LIB = saved
    for key in ("input_ids", "attention_mask", "token_type_ids",
                "sep_positions", "pairs_list", "pairwise_labels",
                "ground_truth", "mask_cls"):
        np.testing.assert_array_equal(item[key], ref[key], err_msg=key)


def test_packer_outputs_still_valid(tokenizer):
    """Whichever path runs, StoryPacker invariants hold."""
    packer = StoryPacker(tokenizer, max_seq_length=48, per_seq_max_length=8)
    ii, am, tt = packer.pack_story(["hello world", "second step here"])
    assert (ii[am == 0] == tokenizer.pad_token_id).all()
    assert (ii == tokenizer.cls_token_id).sum() == 2
