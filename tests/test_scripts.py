"""The six published launcher scripts (ports of the reference's
`scripts/*.sh`) must run end-to-end against the synthetic fixture tree
in CI-light mode (tiny model, 2 steps, 32px images). Each script passes
trailing args through `"$@"`, so later flags override the reference
defaults (argparse last-wins)."""

import os
import subprocess

import pytest

pytestmark = pytest.mark.e2e

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LIGHT = [
    "--model_size", "tiny", "--tokenizer_name", "simple",
    "--config_name", "simple", "--vision_image_size", "32",
    "--max_seq_length", "64", "--per_seq_max_length", "12",
    "--per_gpu_train_batch_size", "1", "--per_gpu_eval_batch_size", "1",
    "--max_steps", "2", "--max_eval_steps", "1",
    "--warmup_steps", "1", "--logging_steps", "1", "--save_steps", "2",
]


def _run(script, data_dir, tmp_path, extra):
    env = dict(os.environ)
    env.update({
        "DATA_DIR": data_dir,
        "OUTPUT_ROOT": str(tmp_path),
        "OUTPUT_NAME": "run",
        "MODEL_PATH": "simple",
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
    })
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", script)] + LIGHT + extra,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=2000)
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-3000:]}\n"
        f"stderr:\n{proc.stderr[-3000:]}")
    return proc


# the pretrain scripts ship 3 objectives; every objective adds an init
# trace + a jitted-step compile (minutes each on this 1-core box), so
# CI-light overrides down to one — multi-objective init/step coverage
# lives in tests/test_pretrain.py
_ONE_OBJ = ["--multimodal_pretrain_objectives", "image_swapping"]


@pytest.mark.parametrize("script,extra", [
    ("wikihow_finetune.sh", ["--beam_size", "2"]),
    ("wikihow_pretrain.sh", _ONE_OBJ),
    ("wikihow_image_only_pretrain.sh",
     ["--train_split", "train", "--eval_splits", "dev"]),
])
def test_wikihow_scripts(script, extra, wikihow_dir, tmp_path):
    _run(script, wikihow_dir, tmp_path, extra)
    assert os.path.isdir(tmp_path / "run")


@pytest.mark.parametrize("script,extra", [
    ("recipeqa_finetune.sh", ["--beam_size", "2"]),
    ("recipeqa_pretrain.sh", _ONE_OBJ),
    ("recipeqa_image_only_pretrain.sh", []),
])
def test_recipeqa_scripts(script, extra, recipeqa_dir, tmp_path):
    _run(script, recipeqa_dir, tmp_path,
         ["--train_split", "train", "--eval_splits", "val"] + extra)
    assert os.path.isdir(tmp_path / "run")
