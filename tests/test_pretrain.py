"""Pretraining stack tests: MLM masking, objective planners, pretrainer."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_sequencing_tpu.train.mlm import mask_tokens_sentence
from multimodal_sequencing_tpu.train.objectives import (
    plan_objective, choose_objective)
from multimodal_sequencing_tpu.models.config import (
    EncoderConfig, MultimodalConfig)
from multimodal_sequencing_tpu.models.clip_visual import CLIPVisionConfig
from multimodal_sequencing_tpu.models.pretrainer import SequencingPretrainer


def _cfg(multimodal=True, n=3, **kw):
    enc = EncoderConfig.tiny(max_position_embeddings=200)
    return MultimodalConfig(
        encoder=enc, max_story_length=n, max_seq_length=60,
        per_seq_max_length=10, multimodal=multimodal,
        clip_model_name="ViT-B/32", image_size=(32, 32),
        mask_id=4, patch_grid=4, **kw)


def _batch(cfg, b=2, seed=0):
    rng = np.random.RandomState(seed)
    n, L = cfg.max_story_length, cfg.max_seq_length
    step = L // n
    ids = rng.randint(5, cfg.encoder.vocab_size, (b, L)).astype(np.int32)
    for s in range(n):
        ids[:, s * step] = cfg.cls_id
    ids[:, -4:] = cfg.pad_id
    batch = {
        "input_ids": ids,
        "attention_mask": (ids != cfg.pad_id).astype(np.int32),
        "token_type_ids": np.repeat(
            np.arange(n, dtype=np.int32), step)[None].repeat(b, 0),
        "images": rng.randn(b, n, 3, 32, 32).astype(np.float32),
    }
    return batch


def test_mask_tokens_sentence():
    rng = np.random.default_rng(0)
    ids = np.full((4, 50), 7, np.int64)
    ids[:, 0] = 0   # cls
    ids[:, 40:] = 1  # pad
    masked, labels = mask_tokens_sentence(
        ids, mlm_probability=0.5, pad_id=1, cls_id=0, mask_id=4,
        vocab_size=100, ignore_index=-100, rng=rng)
    # CLS never masked
    assert (masked[:, 0] == 0).all()
    assert (labels[:, 0] == -100).all()
    # pads untouched
    assert (masked[:, 40:] == 1).all()
    assert (labels[:, 40:] == -100).all()
    # some positions masked, labels keep originals there
    sel = labels != -100
    assert sel.sum() > 20
    assert (labels[sel] == 7).all()
    # ~80% of masked positions become [MASK]
    frac_mask = (masked[sel] == 4).mean()
    assert 0.6 < frac_mask < 0.95


def test_plan_image_swapping():
    cfg = _cfg()
    batch = _batch(cfg, b=4)
    rng = np.random.default_rng(1)
    nb, aux = plan_objective("image_swapping", batch, cfg, rng,
                             subsample_len=2)
    assert aux["objective_labels"].shape == (4,)
    assert int(aux["eff_n"]) == 2
    assert nb["images"].shape == (4, 2, 3, 32, 32)
    # language is subsampled to 2 step spans
    assert nb["input_ids"].shape[1] == cfg.max_seq_length // 3 * 2
    n_cls = (nb["input_ids"] == cfg.cls_id).sum(1)
    assert (n_cls == 2).all()


def test_plan_margin_loss():
    cfg = _cfg(n=4)
    batch = _batch(cfg, b=3)
    rng = np.random.default_rng(2)
    nb, aux = plan_objective("margin_loss", batch, cfg, rng)
    # batch doubles: variant-1 rows then variant-2 rows
    assert nb["input_ids"].shape[0] == 6
    assert nb["images"].shape == (6, 2, 3, 32, 32)
    assert aux["margin_target"].tolist() == [1, 1, 1]


def test_plan_patch_objectives():
    cfg = _cfg()
    batch = _batch(cfg, b=3)
    rng = np.random.default_rng(3)
    nb, aux = plan_objective("patch_based_image_swapping", batch, cfg, rng)
    stream = 1 + 2 * cfg.patch_grid ** 2
    assert aux["patch_perm"].shape == (3, stream)
    for i in range(3):
        assert sorted(aux["patch_perm"][i].tolist()) == list(range(stream))
    nb2, aux2 = plan_objective("patch_based_mrm_classification", batch, cfg,
                               rng)
    assert aux2["mask_idx"].shape == (3, 10)  # 5 per step x 2 steps
    assert (aux2["mask_idx"] >= 1).all()


def test_plan_time_contrastive():
    cfg = _cfg(n=5)
    batch = _batch(cfg, b=4)
    rng = np.random.default_rng(4)
    _, aux = plan_objective("time_contrastive", batch, cfg, rng)
    a, p, g = aux["anchor_idx"], aux["positive_idx"], aux["negative_idx"]
    assert (np.abs(a - p) == 1).all()
    assert (np.abs(a - g) >= 2).all()


def test_choose_objective_uniform():
    rng = np.random.default_rng(0)
    objs = ["image_swapping", "patch_based_mrm_classification"]
    picks = {choose_objective(objs, rng) for _ in range(20)}
    assert picks == set(objs)


@pytest.mark.parametrize("objective", [
    "image_swapping", "multimodal_swapping", "margin_loss",
    "time_contrastive", "patch_based_image_swapping",
    "patch_based_image_sequence_predictions",
    "patch_based_mrm_classification"])
def test_pretrainer_losses(objective, tokenizer):
    cfg = _cfg(n=3)
    vcfg = CLIPVisionConfig.tiny_vit()  # grid 4 matches cfg.patch_grid
    model = SequencingPretrainer(cfg, vcfg)
    batch = _batch(cfg, b=4)
    rng_np = np.random.default_rng(5)
    # MLM labels
    from multimodal_sequencing_tpu.train.mlm import mask_tokens_sentence
    masked, labels = mask_tokens_sentence(
        batch["input_ids"], mlm_probability=0.15, pad_id=cfg.pad_id,
        cls_id=cfg.cls_id, mask_id=cfg.mask_id,
        vocab_size=cfg.encoder.vocab_size,
        ignore_index=cfg.mlm_ignore_index, rng=rng_np)
    batch["input_ids"] = masked
    batch["mlm_labels"] = labels
    nb, aux = plan_objective(objective, batch, cfg, rng_np)
    nb = {k: jnp.asarray(v) for k, v in nb.items()
          if isinstance(v, np.ndarray)}
    aux_j = {k: jnp.asarray(v) for k, v in aux.items()
             if isinstance(v, np.ndarray) and np.asarray(v).ndim > 0}
    variables = model.init(jax.random.PRNGKey(0), nb, objective, aux_j)
    losses = model.apply(variables, nb, objective, aux_j)
    assert np.isfinite(float(losses["loss"]))
    if objective not in ("time_contrastive",):
        assert objective in losses or "mlm" in losses
    assert "mlm" in losses


def test_pretrainer_text_only(tokenizer):
    cfg = _cfg(multimodal=False, n=3)
    model = SequencingPretrainer(cfg)
    batch = {k: v for k, v in _batch(cfg, b=2).items() if k != "images"}
    rng_np = np.random.default_rng(6)
    masked, labels = mask_tokens_sentence(
        batch["input_ids"], mlm_probability=0.15, pad_id=cfg.pad_id,
        cls_id=cfg.cls_id, mask_id=cfg.mask_id,
        vocab_size=cfg.encoder.vocab_size,
        ignore_index=cfg.mlm_ignore_index, rng=rng_np)
    batch["input_ids"] = masked
    batch["mlm_labels"] = labels
    nb, aux = plan_objective("swapping_based_nsp", batch, cfg, rng_np)
    nb = {k: jnp.asarray(v) for k, v in nb.items()}
    aux_j = {k: jnp.asarray(v) for k, v in aux.items()
             if np.asarray(v).ndim > 0}
    variables = model.init(jax.random.PRNGKey(0), nb, "swapping_based_nsp",
                           aux_j)
    losses = model.apply(variables, nb, "swapping_based_nsp", aux_j)
    assert np.isfinite(float(losses["loss"]))
    assert "mlm" in losses and "swapping_based_nsp" in losses


def test_image_only_pretrain_and_visual_transfer(tmp_path):
    """The wikihow_image_only_pretrain.sh flow: image-only pretraining
    (patch-MRM, no MLM) -> visual weights filtered into a finetune state
    via --clip_visual_model_weights pointing at our checkpoint."""
    import jax
    import jax.numpy as jnp
    from multimodal_sequencing_tpu.models.pretrainer import (
        SequencingPretrainer)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.train.state import (
        TrainState, make_optimizer, make_train_state)
    from multimodal_sequencing_tpu.train.checkpoint import save_checkpoint
    from multimodal_sequencing_tpu.models.convert import (
        apply_pretrained_to_state)

    cfg = _cfg(n=3, multimodal_img_part=True)
    vcfg = CLIPVisionConfig.tiny_vit()
    model = SequencingPretrainer(cfg, vcfg)
    batch = _batch(cfg, b=2)
    rng_np = np.random.default_rng(0)
    nb, aux = plan_objective("patch_based_mrm_classification", batch, cfg,
                             rng_np)
    nbj = {k: jnp.asarray(v) for k, v in nb.items()}
    auxj = {k: jnp.asarray(v) for k, v in aux.items()
            if np.asarray(v).ndim > 0}
    variables = dict(model.init(jax.random.PRNGKey(0), nbj,
                                "patch_based_mrm_classification", auxj))
    params = variables.pop("params")
    losses = model.apply({"params": params, **variables}, nbj,
                         "patch_based_mrm_classification", auxj,
                         use_mlm=False)
    assert np.isfinite(float(losses["loss"]))
    assert "mlm" not in losses  # image-only: language is CLS-only

    tx = make_optimizer()
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), model_state=variables,
                       tx=tx, apply_fn=model.apply)
    ckpt = save_checkpoint(str(tmp_path), 5, state, cfg=cfg)

    # finetune model with the visual transfer
    ft_cfg = _cfg(n=3, multimodal_img_part=False)
    ft_model = SequencingModel(ft_cfg, vcfg)
    ft_batch = _batch(ft_cfg, b=2)
    ft_batch["labels"] = np.stack([np.random.RandomState(0).permutation(3)
                                   for _ in range(2)]).astype(np.int32)
    ft_state = make_train_state(ft_model, jax.random.PRNGKey(1), ft_batch,
                                tx=make_optimizer())

    class A:
        model_name_or_path = "simple"
        clip_visual_model_weights = ckpt
        vision_model_checkpoint = None
    ft_state2 = apply_pretrained_to_state(ft_state, A(), ft_cfg)
    got = jax.tree.leaves(
        ft_state2.params["encoder"]["visual_model"])[0]
    want_tree = params["encoder"]["visual_model"]
    want = jax.tree.leaves(want_tree)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


class _ListDataset:
    def __init__(self, items):
        self._items = items

    def __len__(self):
        return len(self._items)

    def __getitem__(self, i, epoch=0):
        return self._items[i]


def test_pretraining_loop_data_parallel(tmp_path):
    """The pretraining loop shards batches over the mesh data axis: an
    8-device run computes the same losses as a 1-device run on the same
    global batch (the DDP-pretraining analogue of the reference's
    run_pretraining.py:168-185)."""
    import argparse
    import json

    from multimodal_sequencing_tpu.train.loop import run_pretraining
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh

    cfg = _cfg(n=3, multimodal_pretrain_objectives=["image_swapping"])
    vcfg = CLIPVisionConfig.tiny_vit()
    items = []
    for i in range(16):
        b = _batch(cfg, b=1, seed=i)
        items.append({k: v[0] for k, v in b.items()})
    ds = _ListDataset(items)

    def run(n_dev, per_gpu, out):
        model = SequencingPretrainer(cfg, vcfg)
        args = argparse.Namespace(
            per_gpu_train_batch_size=per_gpu, learning_rate=1e-3,
            weight_decay=0.0, adam_epsilon=1e-8, max_grad_norm=1.0,
            num_train_epochs=1, max_steps=2, warmup_steps=0,
            gradient_accumulation_steps=1, logging_steps=1, save_steps=0,
            seed=0, output_dir=str(out), mlm_probability=0.15,
            model_name_or_path="simple")
        mesh = make_mesh(n_data=n_dev, devices=jax.devices()[:n_dev])
        run_pretraining(cfg, model, ds, args, tokenizer=None, mesh=mesh)
        losses = []
        with open(os.path.join(str(out), "logs", "scalars.jsonl")) as f:
            for line in f:
                row = json.loads(line)
                if row["tag"] == "pretrain/loss":
                    losses.append(row["value"])
        return losses

    l1 = run(1, 8, tmp_path / "d1")
    l8 = run(8, 1, tmp_path / "d8")
    assert len(l1) == len(l8) == 2
    assert np.isfinite(l1).all() and np.isfinite(l8).all()
    np.testing.assert_allclose(l1, l8, rtol=3e-3)


def test_pretraining_dev_eval(tmp_path):
    """evaluate_pretraining reports masked-LM loss + perplexity on a dev
    split (the reference's pretrain evaluate, run_pretraining.py:377-497)."""
    import argparse

    from multimodal_sequencing_tpu.train.loop import evaluate_pretraining
    from multimodal_sequencing_tpu.train.state import (
        TrainState, make_optimizer)
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh

    cfg = _cfg(n=3)
    vcfg = CLIPVisionConfig.tiny_vit()
    model = SequencingPretrainer(cfg, vcfg)
    items = [
        {k: v[0] for k, v in _batch(cfg, b=1, seed=i).items()}
        for i in range(8)]
    ds = _ListDataset(items)
    nb0 = {k: jnp.asarray(v) for k, v in _batch(cfg, b=2).items()}
    nb0["mlm_labels"] = jnp.full_like(nb0["input_ids"],
                                      cfg.mlm_ignore_index)
    variables = dict(model.init(jax.random.PRNGKey(0), nb0, "mlm_only", {}))
    params = variables.pop("params")
    tx = make_optimizer()
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), model_state=variables,
                       tx=tx, apply_fn=model.apply)
    args = argparse.Namespace(per_gpu_train_batch_size=2,
                              per_gpu_eval_batch_size=None,
                              mlm_probability=0.15)
    res = evaluate_pretraining(cfg, state, args, ds,
                               mesh=make_mesh(n_data=8))
    assert "eval_loss" in res and "eval_mlm" in res
    assert "eval_perplexity" in res
    assert np.isfinite(res["eval_loss"])
    # fresh model: perplexity near uniform over the vocab
    assert res["eval_perplexity"] > 10.0


def test_pretraining_loop_fsdp(tmp_path):
    """--fsdp shards the pretraining state over the data axis; losses
    match the replicated DP run on the same global batch."""
    import argparse
    import json

    from multimodal_sequencing_tpu.train.loop import run_pretraining
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh

    cfg = _cfg(n=3, multimodal_pretrain_objectives=["image_swapping"])
    vcfg = CLIPVisionConfig.tiny_vit()
    items = []
    for i in range(16):
        b = _batch(cfg, b=1, seed=i)
        items.append({k: v[0] for k, v in b.items()})
    ds = _ListDataset(items)

    def run(out, fsdp):
        model = SequencingPretrainer(cfg, vcfg)
        args = argparse.Namespace(
            per_gpu_train_batch_size=1, learning_rate=1e-3,
            weight_decay=0.0, adam_epsilon=1e-8, max_grad_norm=1.0,
            num_train_epochs=1, max_steps=2, warmup_steps=0,
            gradient_accumulation_steps=1, logging_steps=1, save_steps=0,
            seed=0, output_dir=str(out), mlm_probability=0.15,
            model_name_or_path="simple", fsdp=fsdp)
        mesh = make_mesh(n_data=8)
        run_pretraining(cfg, model, ds, args, tokenizer=None, mesh=mesh)
        losses = []
        with open(os.path.join(str(out), "logs", "scalars.jsonl")) as f:
            for line in f:
                row = json.loads(line)
                if row["tag"] == "pretrain/loss":
                    losses.append(row["value"])
        return losses

    l_dp = run(tmp_path / "dp", fsdp=False)
    l_fs = run(tmp_path / "fs", fsdp=True)
    assert len(l_dp) == len(l_fs) == 2
    np.testing.assert_allclose(l_dp, l_fs, rtol=3e-3)


def test_plan_patch_seq_predictions():
    """patch_based_image_sequence_predictions: corrupted samples have
    patch_src slots pointing at a donor sample; intact samples keep an
    identity (perm, src) map."""
    cfg = _cfg()
    batch = _batch(cfg, b=4)
    rng = np.random.default_rng(11)
    nb, aux = plan_objective("patch_based_image_sequence_predictions",
                             batch, cfg, rng)
    stream = 1 + 2 * cfg.patch_grid ** 2  # subsampled to 2 steps
    assert aux["patch_perm"].shape == (4, stream)
    assert aux["patch_src"].shape == (4, stream)
    labels = aux["objective_labels"]
    identity = np.arange(stream)
    own = np.arange(4)[:, None]
    seen_corrupt = False
    for i in range(4):
        foreign = aux["patch_src"][i] != i
        if labels[i] == 1:
            assert not foreign.any()
            assert (aux["patch_perm"][i] == identity).all()
        else:
            seen_corrupt = True
            assert foreign.any()
            # donated slots land inside one step's patch range
            assert (aux["patch_perm"][i][foreign] >= 1).all()
    assert seen_corrupt
    assert (aux["patch_src"][labels == 1] == own[labels == 1]).all()


def test_pretraining_loop_full_reference_objective_list(tmp_path):
    """Loop smoke test with the FULL reference objective flag list
    (`run_pretraining.py --multimodal_pretrain_objectives` choices): every
    objective head inits, and steps train with finite losses across the
    random per-batch objective draws."""
    import argparse
    import json

    from multimodal_sequencing_tpu.train.loop import run_pretraining
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh

    objectives = [
        "image_swapping", "patch_based_image_swapping",
        "patch_based_mrm_classification", "image_sequence_predictions",
        "patch_based_image_sequence_predictions", "time_contrastive",
        "whole_image_sequence_swapping", "multimodal_swapping",
        "margin_loss", "multimodal_margin_loss", "swapping_based_nsp",
        "sequence_based_nsp", "visual_mlm"]
    cfg = _cfg(n=3, multimodal_pretrain_objectives=objectives)
    vcfg = CLIPVisionConfig.tiny_vit()
    items = [{k: v[0] for k, v in _batch(cfg, b=1, seed=i).items()}
             for i in range(8)]
    ds = _ListDataset(items)
    model = SequencingPretrainer(cfg, vcfg)
    args = argparse.Namespace(
        per_gpu_train_batch_size=4, learning_rate=1e-3,
        weight_decay=0.0, adam_epsilon=1e-8, max_grad_norm=1.0,
        num_train_epochs=1, max_steps=6, warmup_steps=0,
        gradient_accumulation_steps=1, logging_steps=1, save_steps=0,
        seed=3, output_dir=str(tmp_path), mlm_probability=0.15,
        model_name_or_path="simple")
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    run_pretraining(cfg, model, ds, args, tokenizer=None, mesh=mesh)
    losses = []
    with open(os.path.join(str(tmp_path), "logs", "scalars.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if row["tag"] == "pretrain/loss":
                losses.append(row["value"])
    assert len(losses) == 6
    assert np.isfinite(losses).all()


def test_visualbert_pretraining_loop(tmp_path):
    """VisualBERT pretraining path (`visual_bert_mmf.py:190`,
    `run_pretraining.py:1359`): per-step visual tokens + image-level
    objectives train; patch-based objectives are rejected loudly."""
    import argparse
    import json

    from multimodal_sequencing_tpu.train.loop import run_pretraining
    from multimodal_sequencing_tpu.parallel.mesh import make_mesh

    cfg = _cfg(n=3, multimodal_model_type="visualbert",
               vision_model="resnet18",
               multimodal_pretrain_objectives=["image_swapping"])
    items = [{k: v[0] for k, v in _batch(cfg, b=1, seed=i).items()}
             for i in range(8)]
    ds = _ListDataset(items)
    model = SequencingPretrainer(cfg)
    args = argparse.Namespace(
        per_gpu_train_batch_size=2, learning_rate=1e-3,
        weight_decay=0.0, adam_epsilon=1e-8, max_grad_norm=1.0,
        num_train_epochs=1, max_steps=2, warmup_steps=0,
        gradient_accumulation_steps=1, logging_steps=1, save_steps=0,
        seed=0, output_dir=str(tmp_path), mlm_probability=0.15,
        model_name_or_path="simple")
    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    run_pretraining(cfg, model, ds, args, tokenizer=None, mesh=mesh)
    losses = []
    with open(os.path.join(str(tmp_path), "logs", "scalars.jsonl")) as f:
        for line in f:
            row = json.loads(line)
            if row["tag"] == "pretrain/loss":
                losses.append(row["value"])
    assert len(losses) == 2 and np.isfinite(losses).all()

    bad_cfg = _cfg(n=3, multimodal_model_type="visualbert",
                   vision_model="resnet18",
                   multimodal_pretrain_objectives=[
                       "patch_based_image_swapping"])
    with pytest.raises(ValueError, match="folded CLIP visual"):
        run_pretraining(bad_cfg, SequencingPretrainer(bad_cfg), ds, args,
                        tokenizer=None, mesh=mesh)


def test_naive_pretraining_forward():
    """Naive pretraining path (`run_pretraining.py:1258`): appended image
    tokens, binary objective + MLM losses finite."""
    cfg = _cfg(n=3, multimodal_model_type="naive", vision_model="resnet18")
    model = SequencingPretrainer(cfg)
    batch = _batch(cfg, b=2)
    rng_np = np.random.default_rng(9)
    masked, labels = mask_tokens_sentence(
        batch["input_ids"], mlm_probability=0.15, pad_id=cfg.pad_id,
        cls_id=cfg.cls_id, mask_id=cfg.mask_id,
        vocab_size=cfg.encoder.vocab_size,
        ignore_index=cfg.mlm_ignore_index, rng=rng_np)
    batch["input_ids"] = masked
    batch["mlm_labels"] = labels
    nb, aux = plan_objective("image_swapping", batch, cfg, rng_np)
    nbj = {k: jnp.asarray(v) for k, v in nb.items()}
    auxj = {k: jnp.asarray(v) for k, v in aux.items()
            if isinstance(v, np.ndarray) and np.asarray(v).ndim > 0}
    variables = model.init(jax.random.PRNGKey(0), nbj, "image_swapping",
                           auxj)
    losses = model.apply(variables, nbj, "image_swapping", auxj)
    assert np.isfinite(float(losses["loss"]))
    assert "image_swapping" in losses and "mlm" in losses
