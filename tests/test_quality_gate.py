"""End-metric quality gate on synthetic data with a recoverable order.

BASELINE.md's tau/PMR parity targets are unverifiable in this environment
(no real WikiHow/RecipeQA ships), so this is the closest stand-in: a
generator whose step TEXTS encode the step's rank (content-based, so the
signal survives the dataset scrambling), and per-head tests that train a
tiny model through the real CLI (`main_train`) and assert the FULL eval
harness (`main_eval`: decode + metrics + output files) recovers the order
with tau >= 0.9 on unseen dev articles. Loss-descent tests can't catch a
decode or metric regression; these do.

Run just these with `pytest -m quality`.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.quality

# rank-coded step texts: each rank has unique marker words a tiny hashed
# vocabulary separates cleanly; the per-article filler varies so dev
# articles are unseen COMBINATIONS while every token stays in the train
# vocabulary (hash-vocab buckets never hit by training keep their random
# init, so split-unique filler words would inject noise at eval)
_RANK_WORDS = [
    "alpha opening unbox prologue",
    "bravo second assemble setup",
    "charlie middle connect core",
    "delta fourth adjust refine",
    "echo final polish epilogue",
]
_FILLER_POOL = [
    "widget", "gadget", "lever", "socket", "spanner", "grommet",
    "flange", "washer", "pulley", "bracket", "hinge", "dowel",
]


@pytest.fixture(scope="module")
def ordered_wikihow_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ordered_wikihow")
    img_dir = root / "www.wikihow.com" / "images"
    img_dir.mkdir(parents=True)
    from PIL import Image
    rng = np.random.RandomState(0)
    for split, n_articles in [("train", 24), ("dev", 6), ("test", 6)]:
        records = []
        for a in range(n_articles):
            steps = []
            for s in range(5):
                img_name = f"{split}_{a}_{s}.png"
                Image.fromarray(rng.randint(
                    0, 255, (32, 32, 3), dtype=np.uint8)).save(
                    img_dir / img_name)
                steps.append({
                    "step_headline": f"Headline {s}",
                    "step_text": {
                        "text": (f"{_RANK_WORDS[s]} "
                                 f"{' '.join(rng.choice(_FILLER_POOL, 2))}."),
                        "bullet_points": [],
                    },
                    "step_assets": {"image-large": f"images/{img_name}",
                                    "image-src-1": ""},
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


def _common(data_dir, out):
    return [
        "--model_name_or_path", "simple", "--model_size", "tiny",
        "--data_dir", data_dir, "--max_seq_length", "96",
        "--per_seq_max_length", "12", "--per_gpu_train_batch_size", "8",
        "--per_gpu_eval_batch_size", "4", "--learning_rate", "3e-3",
        "--warmup_steps", "5", "--logging_steps", "50",
        "--seed", "0", "--output_dir", out,
    ]


def _train(data_dir, out, task, steps, extra=()):
    from multimodal_sequencing_tpu.train.cli import main_train
    state = main_train(_common(data_dir, out) + [
        "--do_train", "--task_name", task, "--max_steps", str(steps),
        "--save_steps", str(steps), "--num_train_epochs", "100",
        "--overwrite_output_dir", *extra])
    assert state is not None
    return os.path.join(out, f"checkpoint-{steps}")


def _eval(data_dir, out, method, ckpt_flags, extra=()):
    from multimodal_sequencing_tpu.train.cli import main_eval
    results = main_eval(_common(data_dir, out) + [
        "--task_name", "wikihow_sort", "--sort_method", method,
        "--eval_splits", "dev", *ckpt_flags, *extra])
    return results["dev"]


def _assert_quality(res, out, tau_min=0.9):
    assert res["tau"] >= tau_min, res
    assert res["partial_match"] >= 0.9, res
    # the harness also wrote the per-story artifacts
    orders = open(os.path.join(out, "output_order.txt")).read().split("\n")
    assert len([o for o in orders if o.strip()]) == 6
    assert os.path.exists(os.path.join(out, "all_predictions.csv"))


def test_quality_pairwise_topological(ordered_wikihow_dir, tmp_path):
    """One training, gated through BOTH the host decode and the
    --device_decode fast path (on a well-trained model both must recover
    the order).

    Uses --order_criteria loose (ordered iff j>i): under the tight
    default only adjacent pairs carry signal, so non-adjacent edges of
    the decode tournament are tie-broken on noise — the gate would then
    measure label-policy generalization, not harness correctness."""
    out = str(tmp_path)
    ckpt = _train(ordered_wikihow_dir, out, "wikihow_pairwise", 400,
                  extra=["--order_criteria", "loose"])
    res = _eval(ordered_wikihow_dir, out, "topological",
                ["--model_name_or_path_1", ckpt])
    _assert_quality(res, out)
    res_dev = _eval(ordered_wikihow_dir, out, "topological",
                    ["--model_name_or_path_1", ckpt],
                    extra=["--device_decode"])
    _assert_quality(res_dev, out)


def test_quality_heatmap(ordered_wikihow_dir, tmp_path):
    out = str(tmp_path)
    ckpt = _train(ordered_wikihow_dir, out, "wikihow_hl_v1", 300,
                  extra=["--hierarchical_version", "v1"])
    res = _eval(ordered_wikihow_dir, out, "heat_map",
                ["--model_name_or_path_1", ckpt],
                extra=["--hierarchical_version", "v1"])
    _assert_quality(res, out)
    # same checkpoint through the on-device exhaustive decoder
    res_dev = _eval(ordered_wikihow_dir, out, "heat_map",
                    ["--model_name_or_path_1", ckpt],
                    extra=["--hierarchical_version", "v1",
                           "--device_decode"])
    _assert_quality(res_dev, out)


def test_quality_head_and_topological(ordered_wikihow_dir, tmp_path):
    """Composite two-checkpoint method: a head-prediction model picks the
    first step, a pairwise model orders the rest — exercises the 1-3
    checkpoint role plumbing (cli.py role map) at end-metric level."""
    out = str(tmp_path)
    head_ckpt = _train(ordered_wikihow_dir, str(tmp_path / "head"),
                       "wikihow_head", 300)
    pair_ckpt = _train(ordered_wikihow_dir, str(tmp_path / "pair"),
                       "wikihow_pairwise", 400,
                       extra=["--order_criteria", "loose"])
    res = _eval(ordered_wikihow_dir, out, "head_and_topological",
                ["--model_name_or_path_1", head_ckpt,
                 "--model_name_or_path_2", pair_ckpt])
    _assert_quality(res, out)


def test_quality_pointer(ordered_wikihow_dir, tmp_path):
    out = str(tmp_path)
    ckpt = _train(ordered_wikihow_dir, out, "wikihow_pure_decode", 300,
                  extra=["--hierarchical_version", "p1"])
    res = _eval(ordered_wikihow_dir, out, "pure_decode",
                ["--model_name_or_path_1", ckpt],
                extra=["--hierarchical_version", "p1"])
    _assert_quality(res, out)


@pytest.fixture(scope="module")
def ordered_recipeqa_dir(tmp_path_factory):
    """RecipeQA-schema twin of the WikiHow generator (texts/{split}.json,
    data/recipeqa.py:52-88 layout) with rank-coded step bodies."""
    root = tmp_path_factory.mktemp("ordered_recipeqa")
    (root / "texts").mkdir()
    img_dir = root / "images" / "images-qa" / "train" / "images-qa"
    img_dir.mkdir(parents=True)
    from PIL import Image
    rng = np.random.RandomState(0)
    for split, n_recipes in [("train", 24), ("val", 6), ("test", 6)]:
        data = []
        for r in range(n_recipes):
            rid = f"{split}-recipe_{r}"
            context = []
            for s in range(5):
                Image.fromarray(rng.randint(
                    0, 255, (32, 32, 3), dtype=np.uint8)).save(
                    img_dir / f"{rid}_{s}_0.jpg")
                context.append({
                    "id": s,
                    "body": (f"{_RANK_WORDS[s]} "
                             f"{' '.join(rng.choice(_FILLER_POOL, 2))}."),
                })
            data.append({"recipe_id": rid, "context": context})
        with open(root / "texts" / f"{split}.json", "w") as f:
            json.dump({"version": 0.9, "data": data}, f)
    return str(root)


def test_quality_recipeqa_pairwise(ordered_recipeqa_dir, tmp_path):
    """The second dataset family through the same gate (RecipeQA maps
    'dev' to its val split)."""
    out = str(tmp_path)
    ckpt = _train(ordered_recipeqa_dir, out, "recipeqa_pairwise", 400,
                  extra=["--order_criteria", "loose"])
    from multimodal_sequencing_tpu.train.cli import main_eval
    res = main_eval(_common(ordered_recipeqa_dir, out) + [
        "--task_name", "recipeqa_sort", "--sort_method", "topological",
        "--eval_splits", "dev", "--model_name_or_path_1", ckpt])
    _assert_quality(res["dev"], out)


def test_quality_pretrain_mlm_perplexity(ordered_wikihow_dir, tmp_path):
    """Pretraining end-metric: dev masked-LM perplexity after a short run
    must be far below the untrained ~vocab-size baseline (the corpus is
    rank-coded and low-entropy). Drives the real pretraining CLI
    (main_pretrain --do_eval -> eval_results_pretrain.txt)."""
    from multimodal_sequencing_tpu.train.cli import main_pretrain
    out = str(tmp_path)
    main_pretrain(_common(ordered_wikihow_dir, out) + [
        "--do_train", "--do_eval", "--task_name", "wikihow_pretrain",
        "--max_steps", "100", "--save_steps", "0",
        "--num_train_epochs", "100", "--overwrite_output_dir"])
    res = {}
    with open(os.path.join(out, "eval_results_pretrain.txt")) as f:
        for line in f:
            k, _, v = line.strip().partition(" = ")
            res[k] = float(v)
    assert res["eval_perplexity"] < 50.0, res
    assert np.isfinite(res["eval_mlm"]), res


@pytest.fixture(scope="module")
def visual_wikihow_dir(tmp_path_factory):
    """WikiHow tree whose ONLY order signal lives in the images: every
    step's text is the same constant filler, while the step image's mean
    brightness encodes its rank (rank s -> band around 30+45*s, +-10
    noise). Any tau recovered here proves the visual stream carries
    signal end-to-end (dataset -> vision tower -> fold -> head ->
    decode); a silent visual regression drops the gate to chance."""
    root = tmp_path_factory.mktemp("visual_wikihow")
    img_dir = root / "www.wikihow.com" / "images"
    img_dir.mkdir(parents=True)
    from PIL import Image
    rng = np.random.RandomState(0)
    for split, n_articles in [("train", 24), ("dev", 6), ("test", 6)]:
        records = []
        for a in range(n_articles):
            steps = []
            for s in range(5):
                img_name = f"{split}_{a}_{s}.png"
                base = 30 + 45 * s
                img = np.clip(
                    base + rng.randint(-10, 11, (32, 32, 3)),
                    0, 255).astype(np.uint8)
                Image.fromarray(img).save(img_dir / img_name)
                # rank-coded maskrcnn ROI sidecar next to the image
                # ({img}_maskrcnn.npy, offline-extractor contract): the
                # visualbert gate consumes these through
                # --include_num_img_regional_features (see its docstring)
                np.save(img_dir / f"{split}_{a}_{s}_maskrcnn.npy",
                        {"features": (np.full((4, 16), float(s - 2))
                                      + rng.randn(4, 16) * 0.1
                                      ).astype(np.float32)})
                steps.append({
                    "step_headline": "Headline",
                    "step_text": {
                        "text": "constant filler widget gadget lever.",
                        "bullet_points": [],
                    },
                    "step_assets": {"image-large": f"images/{img_name}",
                                    "image-src-1": ""},
                })
            records.append({
                "url": f"https://wikihow.test/{split}/{a}",
                "title": f"How to See {a}",
                "summary": "Brightness-coded synthetic article.",
                "sections": [{"steps": steps}],
            })
        with open(root / f"wikihow-{split}.json", "w") as f:
            for r in records:
                f.write(json.dumps(r) + "\n")
    return str(root)


_MM_FLAGS = ["--multimodal", "--vision_image_size", "32"]


def test_quality_multimodal_clip(visual_wikihow_dir, tmp_path):
    """CLIP-fold multimodal end-metric gate: constant text, rank-coded
    image brightness; train pairwise -> topological decode to tau>=0.9.
    The reference's flagship family (`scripts/wikihow_finetune.sh`
    MODEL_TYPE=clip)."""
    out = str(tmp_path)
    mm = _MM_FLAGS + ["--multimodal_model_type", "clip"]
    ckpt = _train(visual_wikihow_dir, out, "wikihow_pairwise", 400,
                  extra=["--order_criteria", "loose"] + mm)
    res = _eval(visual_wikihow_dir, out, "topological",
                ["--model_name_or_path_1", ckpt], extra=mm)
    _assert_quality(res, out)


def test_quality_multimodal_visualbert(visual_wikihow_dir, tmp_path):
    """VisualBERT end-metric gate through its regional-token machinery:
    the rank signal rides the rank-coded maskrcnn SIDECARS (and the image
    brightness), exercising sidecar loading -> regional projection ->
    visual embeddings -> joint transformer -> decode end-to-end. The
    pixels-only path cannot gate here: a from-scratch resnet18's pooled
    token does not bootstrap the brightness signal within test budget
    (measured: pairwise loss ~ln2 after 300-400 steps at lr 3e-3 and
    1e-2, 32px and 64px, frozen and joint tower — gradients flow, init
    logit sensitivity ~0.01, it is a training-dynamics budget limit, not
    a wiring break); pixels end-to-end is gated by the clip variant,
    and the tower wiring by unit/sensitivity tests."""
    out = str(tmp_path)
    mm = _MM_FLAGS + ["--multimodal_model_type", "visualbert",
                      "--vision_model", "resnet18",
                      "--include_num_img_regional_features", "2"]
    ckpt = _train(visual_wikihow_dir, out, "wikihow_pairwise", 400,
                  extra=["--order_criteria", "loose"] + mm)
    res = _eval(visual_wikihow_dir, out, "topological",
                ["--model_name_or_path_1", ckpt], extra=mm)
    _assert_quality(res, out)


def test_quality_berson_multimodal(visual_wikihow_dir, tmp_path):
    """BERSON wrapper over the multimodal inner encoder, gated on the
    image-only signal through beam decode."""
    out = str(tmp_path)
    mm = _MM_FLAGS + ["--multimodal_model_type", "clip"]
    ckpt = _train(visual_wikihow_dir, out, "wikihow_sort", 300,
                  extra=["--wrapper_model_type", "berson",
                         "--beam_size", "4",
                         "--per_gpu_train_batch_size", "4"] + mm)
    res = _eval(visual_wikihow_dir, out, "berson",
                ["--model_name_or_path_1", ckpt],
                extra=["--wrapper_model_type", "berson",
                       "--beam_size", "4"] + mm)
    _assert_quality(res, out)


# NOTE: no pure_class gate — the 120-way arrangement-classification task
# underfits tiny models in test-budget time (measured: train tau 0.19
# after 1000 steps at batch 16); the pure_class decode path is covered by
# unit golden vectors and the CLI e2e eval test instead.


def test_quality_berson(ordered_wikihow_dir, tmp_path):
    out = str(tmp_path)
    ckpt = _train(ordered_wikihow_dir, out, "wikihow_sort", 200,
                  extra=["--wrapper_model_type", "berson",
                         "--beam_size", "4",
                         "--per_gpu_train_batch_size", "4"])
    res = _eval(ordered_wikihow_dir, out, "berson",
                ["--model_name_or_path_1", ckpt],
                extra=["--wrapper_model_type", "berson",
                       "--beam_size", "4"])
    _assert_quality(res, out)


def _pretrain_brightness_tower(steps=150, batch=32, seed=0):
    """Warm-start a resnet18 tower on the fixture's brightness-rank
    distribution (base 30+45*rank +-10 noise, 32px, ImageNet-normalized
    exactly like the CLI image pipeline) and return a torchvision-layout
    state dict. No zoo checkpoint ships in this environment, so the
    warm start the verdict asked for comes from this in-test proxy
    pretraining (~acc 1.0 within ~50 steps; see CHANGELOG round 5)."""
    import jax
    import jax.numpy as jnp
    import optax
    from flax import linen as nn
    from multimodal_sequencing_tpu.models.resnet import (
        ResNetBackbone, export_torchvision_resnet)

    class Clf(nn.Module):
        @nn.compact
        def __call__(self, x):
            f = ResNetBackbone("resnet18", name="tower")(
                x, deterministic=False)
            return nn.Dense(5, name="head")(f)

    rng = np.random.RandomState(seed)
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    def make_batch(n):
        ranks = rng.randint(0, 5, n)
        imgs = np.clip(30 + 45 * ranks[:, None, None, None]
                       + rng.randint(-10, 11, (n, 32, 32, 3)),
                       0, 255).astype(np.float32)
        return (jnp.asarray((imgs / 255.0 - mean) / std),
                jnp.asarray(ranks))

    model = Clf()
    x0, _ = make_batch(4)
    variables = model.init(jax.random.PRNGKey(seed), x0)
    tx = optax.adam(1e-3)
    opt = tx.init(variables["params"])

    @jax.jit
    def step(params, bstats, opt, x, y):
        def loss_fn(p):
            logits, upd = model.apply(
                {"params": p, "batch_stats": bstats}, x,
                mutable=["batch_stats"])
            l = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return l, (upd["batch_stats"], logits)
        (l, (bs, logits)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        u, opt = tx.update(g, opt, params)
        acc = (logits.argmax(-1) == y).mean()
        return optax.apply_updates(params, u), bs, opt, l, acc

    params, bstats = variables["params"], variables["batch_stats"]
    acc = 0.0
    for _ in range(steps):
        x, y = make_batch(batch)
        params, bstats, opt, loss, acc = step(params, bstats, opt, x, y)
    assert float(acc) > 0.9, f"tower pretrain failed to learn: acc={acc}"
    return export_torchvision_resnet(
        jax.device_get(params)["tower"],
        jax.device_get(bstats)["tower"], "resnet18")


def test_quality_visualbert_pixels_warmstart(visual_wikihow_dir, tmp_path):
    """VisualBERT PIXELS-path end-metric gate (verdict r4 item 5): the
    rank signal rides ONLY the image brightness (no maskrcnn sidecars),
    through a resnet18 tower warm-started via --vision_model_checkpoint
    (in-test proxy pretraining + export_torchvision_resnet -> the real
    torchvision-checkpoint loading path). Covers image loading ->
    device preprocess -> tower -> pooled visual token -> joint
    transformer -> decode; a regression that breaks the pixels feature
    flow drops this to chance."""
    import torch
    sd = _pretrain_brightness_tower()
    ckpt_path = str(tmp_path / "tower_warm.pth")
    torch.save({k: torch.from_numpy(np.asarray(v))
                for k, v in sd.items()}, ckpt_path)

    out = str(tmp_path)
    mm = _MM_FLAGS + ["--multimodal_model_type", "visualbert",
                      "--vision_model", "resnet18",
                      "--vision_model_checkpoint", ckpt_path]
    ckpt = _train(visual_wikihow_dir, out, "wikihow_pairwise", 400,
                  extra=["--order_criteria", "loose"] + mm)
    res = _eval(visual_wikihow_dir, out, "topological",
                ["--model_name_or_path_1", ckpt], extra=mm)
    _assert_quality(res, out)
