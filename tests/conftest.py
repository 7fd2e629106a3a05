"""Test configuration: force an 8-device virtual CPU platform so multi-chip
sharding semantics (dp/model meshes, psum grad reduction) are exercised
without TPU hardware. Must run before jax is imported anywhere."""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run
# on the local virtual-CPU platform or every dispatch becomes an RPC.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
# persistent compile cache: many tests (and the launcher-script
# subprocesses, which inherit this env) re-compile identical tiny-model
# programs; the disk cache cuts a warm CLI run ~33%
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/mmseq_jax_cache")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np
import pytest


def _png(path, seed):
    from PIL import Image
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (64, 48, 3), dtype=np.uint8)).save(
        path)


STEP_TEXTS = [
    "Gather all the tools you need. Make sure the workbench is clean.",
    "Measure the plank twice before cutting. Use a sharp pencil to mark.",
    "Cut along the marked line slowly. Keep your fingers clear of the blade.",
    "Sand the edges until they are smooth. Wipe away the dust with a cloth.",
    "Apply the first coat of paint evenly. Let it dry for two hours.",
    "Attach the hinges with the provided screws. Tighten them firmly.",
]


@pytest.fixture(scope="session")
def wikihow_dir(tmp_path_factory):
    """Synthetic WikiHow data dir matching the reference JSONL schema
    (url/title/summary/sections[].steps[].{step_headline,step_text,step_assets})."""
    root = tmp_path_factory.mktemp("wikihow")
    img_dir = root / "www.wikihow.com" / "images"
    img_dir.mkdir(parents=True)
    for split, n_articles in [("train", 6), ("dev", 2), ("test", 2),
                              ("acl22-train", 3), ("acl22_human-test", 2)]:
        records = []
        for a in range(n_articles):
            steps = []
            for s in range(5):
                img_name = f"{split}_{a}_{s}.png"
                _png(img_dir / img_name, hash((split, a, s)) % 2**31)
                steps.append({
                    "step_headline": f"Headline {s}",
                    "step_text": {
                        # per-article prefix keeps stories distinguishable
                        # even under tight per-step token caps
                        "text": f"Project {split} {a} phase {s}. "
                                + STEP_TEXTS[s],
                        "bullet_points": [f"Bullet {a} {s}."],
                    },
                    "step_assets": {
                        "image-large": f"images/{img_name}",
                        "image-src-1": "",
                    },
                })
            records.append({
                "url": f"https://wikihow.test/{split}/{a}",
                "title": f"How to Test {a}",
                "summary": "A test article.",
                "sections": [{"steps": steps}],
            })
        if "-" in split:
            version, sp = split.rsplit("-", 1)
            fname = f"wikihow-{version}-{sp}.json"
        else:
            fname = f"wikihow-{split}.json"
        with open(root / fname, "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    return str(root)


@pytest.fixture(scope="session")
def recipeqa_dir(tmp_path_factory):
    """Synthetic RecipeQA dir: texts/{split}.json + images-qa layout."""
    root = tmp_path_factory.mktemp("recipeqa")
    (root / "texts").mkdir()
    img_dir = root / "images" / "images-qa" / "train" / "images-qa"
    img_dir.mkdir(parents=True)
    for split, n in [("train", 5), ("val", 2), ("test", 2)]:
        data = []
        for r in range(n):
            rid = f"{split}-recipe_{r}"
            context = []
            for s in range(5):
                _png(img_dir / f"{rid}_{s}_0.jpg",
                     hash((split, r, s)) % 2**31)
                context.append({"id": s, "body": STEP_TEXTS[s]})
            data.append({"recipe_id": rid, "context": context})
        with open(root / "texts" / f"{split}.json", "w") as f:
            json.dump({"version": 0.9, "data": data}, f)
    return str(root)


@pytest.fixture(autouse=True)
def _isolate_prng_impl():
    """CLI mains flip jax_default_prng_impl process-globally (--prng_impl);
    restore it so later tests keep deterministic threefry streams."""
    before = jax.config.jax_default_prng_impl
    yield
    jax.config.update("jax_default_prng_impl", before)


@pytest.fixture(scope="session")
def tokenizer():
    from multimodal_sequencing_tpu.data.tokenization import (
        SimpleWordTokenizer)
    return SimpleWordTokenizer(vocab_size=1000)
