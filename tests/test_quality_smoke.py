"""End-metric quality smoke for the `e2e` tier.

The full gates (`tests/test_quality_gate.py`, `-m quality`) train for
hundreds of steps and take 10+ minutes each. This is the scaled-down
guard in the cheaper `-m e2e` tier: 3-step stories, a tiny hashed-vocab
model, ~120 train steps, tau >= 0.8 on unseen dev articles through the
REAL CLI (main_train -> checkpoint -> main_eval decode + metrics).
Budget: ~6-7 min on the 1-core CI host (measured 6m39s, round 4) —
which is also why it is marked `e2e` rather than living in the plain
`pytest` set (pytest.ini documents the tiers). A decode/metric/
checkpoint regression that flips signs or scrambles step alignment
lands far below 0.8; an undertrained but correct harness lands at 1.0
on this easy task.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.e2e

# rank-coded marker words (see test_quality_gate.py for the rationale:
# dev articles are unseen COMBINATIONS of train-vocabulary tokens)
_RANK_WORDS = [
    "alpha opening unbox prologue",
    "charlie middle connect core",
    "echo final polish epilogue",
]
_FILLER_POOL = ["widget", "gadget", "lever", "socket", "spanner", "grommet"]


@pytest.fixture(scope="module")
def smoke_wikihow_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("smoke_wikihow")
    rng = np.random.RandomState(0)
    for split, n_articles in [("train", 16), ("dev", 5)]:
        records = []
        for a in range(n_articles):
            steps = []
            for s in range(3):
                steps.append({
                    "step_headline": f"Headline {s}",
                    "step_text": {
                        "text": (f"{_RANK_WORDS[s]} "
                                 f"{' '.join(rng.choice(_FILLER_POOL, 2))}."),
                        "bullet_points": [],
                    },
                    "step_assets": {"image-large": "", "image-src-1": ""},
                })
            records.append({
                "url": f"https://wikihow.test/{split}/{a}",
                "title": f"How to Order {a}",
                "summary": "Rank-coded synthetic article.",
                "sections": [{"steps": steps}],
            })
        with open(root / f"wikihow-{split}.json", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    return str(root)


def _flags(data_dir, out):
    return [
        "--model_name_or_path", "simple", "--model_size", "tiny",
        "--data_dir", data_dir, "--max_seq_length", "48",
        "--per_seq_max_length", "10", "--max_story_length", "3",
        "--min_story_length", "3",
        "--per_gpu_train_batch_size", "8", "--per_gpu_eval_batch_size", "5",
        "--learning_rate", "3e-3", "--warmup_steps", "5",
        "--logging_steps", "60", "--seed", "0", "--output_dir", out,
    ]


def test_quality_smoke_pairwise_topological(smoke_wikihow_dir, tmp_path):
    from multimodal_sequencing_tpu.train.cli import main_eval, main_train

    out = str(tmp_path)
    steps = 120
    state = main_train(_flags(smoke_wikihow_dir, out) + [
        "--do_train", "--task_name", "wikihow_pairwise",
        "--order_criteria", "loose", "--max_steps", str(steps),
        "--save_steps", str(steps), "--num_train_epochs", "100",
        "--overwrite_output_dir"])
    assert state is not None
    ckpt = os.path.join(out, f"checkpoint-{steps}")
    results = main_eval(_flags(smoke_wikihow_dir, out) + [
        "--task_name", "wikihow_sort", "--sort_method", "topological",
        "--eval_splits", "dev", "--model_name_or_path_1", ckpt])
    res = results["dev"]
    assert res["tau"] >= 0.8, res
    assert res["partial_match"] >= 0.8, res
    # the harness also wrote the per-story artifacts
    orders = open(os.path.join(out, "output_order.txt")).read().split("\n")
    assert len([o for o in orders if o.strip()]) == 5
