"""End-to-end CLI tests: train -> checkpoint -> eval on the synthetic
fixture with the tiny model size.

Marked `e2e`: each test runs a real training/eval loop, so the file is
excluded from the plain `pytest` run (see pytest.ini tiers) — opt in
with `pytest -m e2e`."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.e2e

from multimodal_sequencing_tpu.train.cli import (
    build_parser, main_train, main_eval, main_pretrain, build_config)
from multimodal_sequencing_tpu.train.checkpoint import (
    save_checkpoint, restore_checkpoint, find_checkpoints,
    parse_step_from_name)


def _common(wikihow_dir, tmp, extra):
    return [
        "--model_name_or_path", "simple", "--model_size", "tiny",
        "--data_dir", wikihow_dir, "--data_name", "wikihow",
        "--max_seq_length", "96", "--per_seq_max_length", "12",
        "--per_gpu_train_batch_size", "8", "--per_gpu_eval_batch_size", "4",
        "--learning_rate", "1e-3", "--num_train_epochs", "2",
        "--warmup_steps", "1", "--logging_steps", "1",
        "--save_steps", "0", "--seed", "0",
        "--output_dir", tmp,
    ] + extra


def test_flag_surface_accepts_reference_invocation():
    # the wikihow_finetune.sh flag set must parse
    p = build_parser()
    args = p.parse_args([
        "--model_name_or_path", "x", "--config_name", "roberta-large",
        "--tokenizer_name", "roberta-large", "--do_not_load_optimizer",
        "--do_train", "--do_eval", "--evaluate_during_training",
        "--per_gpu_train_batch_size", "1", "--per_gpu_eval_batch_size", "1",
        "--learning_rate", "5e-6", "--num_train_epochs", "4.0",
        "--max_seq_length", "300", "--per_seq_max_length", "60",
        "--data_dir", "data/wikihow", "--output_root", "root",
        "--output_dir", "name", "--task_name", "wikihow_hl_v1",
        "--order_criteria", "loose", "--overwrite_output_dir",
        "--multimodal", "--multimodal_model_type", "clip",
        "--vision_model", "resnet50", "--wrapper_model_type", "berson",
        "--save_steps", "2000", "--logging_steps", "250",
        "--max_eval_steps", "1000", "--iters_to_eval", "50000",
        "--iters_to_eval", "best", "--warmup_steps", "100",
        "--train_split", "train-acl22",
        "--eval_splits", "test-acl22_human",
    ])
    assert args.task_name == "wikihow_hl_v1"
    assert args.iters_to_eval == ["50000", "best"]
    assert args.train_split == "train-acl22"


def test_train_heatmap_then_eval(wikihow_dir, tmp_path):
    out = str(tmp_path / "run")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1",
    ]))
    assert state is not None
    ckpts = find_checkpoints(out)
    assert len(ckpts) >= 1
    assert parse_step_from_name(ckpts[0]) > 0

    results = main_eval(_common(wikihow_dir, out, [
        "--task_name", "wikihow_sort", "--sort_method", "heat_map",
        "--model_name_or_path_1", ckpts[-1],
        "--eval_splits", "dev",
    ]))
    res = results["dev"]
    assert set(res) >= {"partial_match", "exact_match", "tau"}
    assert os.path.exists(os.path.join(out, "output_order.txt"))
    assert os.path.exists(os.path.join(out, "all_predictions.csv"))
    assert os.path.exists(os.path.join(out, "eval_results_split_dev.txt"))


def test_eval_topological_fresh_models(wikihow_dir, tmp_path):
    out = str(tmp_path / "evalrun")
    results = main_eval(_common(wikihow_dir, out, [
        "--task_name", "wikihow_sort", "--sort_method", "topological",
        "--eval_splits", "dev", "--max_eval_steps", "1",
    ]))
    assert "dev" in results
    assert 0.0 <= results["dev"]["partial_match"] <= 1.0


def test_eval_on_every_iter_subsamples_batches(wikihow_dir, tmp_path):
    # int eval-frequency: only every Nth eval batch decoded
    # (`eval.py:1250-1253,1524`); with batch=1 over 2 dev stories, N=2
    # decodes exactly one story
    out = str(tmp_path / "everyiter")
    results = main_eval(_common(wikihow_dir, out, [
        "--task_name", "wikihow_sort", "--sort_method", "topological",
        "--eval_splits", "dev", "--eval_on_every_iter", "2",
        "--per_gpu_eval_batch_size", "1", "--eval_save_all_results",
    ]))
    assert "dev" in results
    csv_rows = open(os.path.join(out, "all_predictions.csv")).readlines()
    assert len(csv_rows) == 2  # header + the single decoded story


def test_pretrain_text_only(wikihow_dir, tmp_path):
    out = str(tmp_path / "pre")
    state = main_pretrain(_common(wikihow_dir, out, [
        "--do_train", "--task_type", "pretrain",
        "--train_split", "train", "--mlm_probability", "0.15",
        "--max_steps", "2",
    ]))
    assert state is not None
    assert find_checkpoints(out)


def test_checkpoint_roundtrip(wikihow_dir, tmp_path):
    import jax
    import jax.numpy as jnp
    from multimodal_sequencing_tpu.models.config import (
        EncoderConfig, MultimodalConfig)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.train.state import (
        make_train_state, make_optimizer)
    cfg = MultimodalConfig(encoder=EncoderConfig.tiny(),
                           max_seq_length=32, per_seq_max_length=8)
    model = SequencingModel(cfg)
    batch = {"input_ids": np.zeros((2, 32), np.int32),
             "attention_mask": np.ones((2, 32), np.int32),
             "token_type_ids": np.zeros((2, 32), np.int32)}
    state = make_train_state(model, jax.random.PRNGKey(0), batch,
                             tx=make_optimizer())
    d = save_checkpoint(str(tmp_path), 7, state, cfg=cfg)
    assert d.endswith("checkpoint-7")
    state2 = make_train_state(model, jax.random.PRNGKey(1), batch,
                              tx=make_optimizer())
    state2 = restore_checkpoint(d, state2)
    l1 = jax.tree.leaves(state.params)
    l2 = jax.tree.leaves(state2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_tools_extract_features(wikihow_dir, tmp_path):
    from multimodal_sequencing_tpu.tools.extract_img_features import (
        collect_story_image_paths, extract_features, write_regional_sidecar)
    paths = collect_story_image_paths(wikihow_dir, "wikihow", "dev")
    assert len(paths) == 2 * 5
    feats = extract_features(paths[:4], "resnet18", image_size=(32, 32),
                             batch_size=2)
    assert len(feats) == 4
    assert next(iter(feats.values())).shape == (512,)
    # regional sidecar roundtrip
    from multimodal_sequencing_tpu.data.images import load_maskrcnn_sidecar
    img = str(tmp_path / "img.png")
    open(img, "wb").close()
    write_regional_sidecar(img, np.ones((7, 16), np.float32))
    reg = load_maskrcnn_sidecar(img, 5)
    assert reg.shape == (5, 16)


def test_finetune_autoresume(wikihow_dir, tmp_path):
    out = str(tmp_path / "resume")
    argv = _common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "2",
        "--save_steps", "2",
    ])
    main_train(argv)
    ckpts1 = find_checkpoints(out)
    assert any(parse_step_from_name(c) == 2 for c in ckpts1)
    # resume and run 2 more steps
    argv2 = [a if a != "2" else a for a in argv]
    idx = argv2.index("--max_steps")
    argv2[idx + 1] = "4"
    main_train(argv2)
    ckpts2 = find_checkpoints(out)
    assert any(parse_step_from_name(c) == 4 for c in ckpts2)


def test_eval_pure_decode_and_berson_methods(wikihow_dir, tmp_path):
    out = str(tmp_path / "pd")
    results = main_eval(_common(wikihow_dir, out, [
        "--task_name", "wikihow_sort", "--sort_method", "pure_decode",
        "--eval_splits", "dev", "--max_eval_steps", "1",
    ]))
    assert "dev" in results
    out2 = str(tmp_path / "bs")
    results2 = main_eval(_common(wikihow_dir, out2, [
        "--task_name", "wikihow_sort", "--sort_method", "berson",
        "--beam_size", "4",
        "--eval_splits", "dev", "--max_eval_steps", "1",
    ]))
    assert "dev" in results2


def test_evaluate_during_training(wikihow_dir, tmp_path):
    out = str(tmp_path / "edt")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "2",
        "--save_steps", "2", "--evaluate_during_training",
        "--eval_splits", "dev", "--max_eval_steps", "1",
        "--overwrite_output_dir",
    ]))
    assert state is not None
    # best checkpoint written from the eval hook
    assert any(c.endswith("checkpoint-best")
               for c in find_checkpoints(out))


def test_berson_cli_train_with_eval(wikihow_dir, tmp_path):
    out = str(tmp_path / "bersonrun")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--wrapper_model_type", "berson", "--beam_size", "2",
        "--per_gpu_train_batch_size", "2", "--max_steps", "2",
        "--save_steps", "2", "--evaluate_during_training",
        "--eval_splits", "dev", "--max_eval_steps", "1",
        "--overwrite_output_dir",
    ]))
    assert state is not None
    assert any(c.endswith("checkpoint-best") for c in find_checkpoints(out))


def test_berson_do_eval_checkpoint_sweep(wikihow_dir, tmp_path):
    # wikihow_finetune.sh-shaped: --wrapper_model_type berson --do_eval
    # --iters_to_eval <step> best must run the post-training beam-eval
    # sweep (`train.py:2168-2225`) and write per-checkpoint result files
    out = str(tmp_path / "bersondoeval")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--do_eval", "--task_name", "wikihow_hl_v1",
        "--wrapper_model_type", "berson", "--beam_size", "2",
        "--per_gpu_train_batch_size", "2", "--max_steps", "2",
        "--save_steps", "2", "--evaluate_during_training",
        "--iters_to_eval", "2", "best",
        "--eval_splits", "dev", "--max_eval_steps", "1",
        "--overwrite_output_dir",
    ]))
    assert state is not None
    for tag in ("checkpoint-2", "checkpoint-best"):
        path = os.path.join(out, f"eval_results_split_dev_{tag}.txt")
        assert os.path.exists(path), path
        body = open(path).read()
        assert "tau" in body and "partial_match" in body


def test_do_eval_after_training(wikihow_dir, tmp_path):
    out = str(tmp_path / "doeval")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--do_eval", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "2",
        "--save_steps", "2", "--eval_all_checkpoints",
        "--eval_splits", "dev", "--max_eval_steps", "1",
        "--overwrite_output_dir",
    ]))
    assert state is not None


def test_pretrain_multi_dataset(wikihow_dir, recipeqa_dir, tmp_path):
    out = str(tmp_path / "multi")
    state = main_pretrain(_common(wikihow_dir, out, [
        "--do_train", "--task_type", "pretrain",
        "--data_dirs", wikihow_dir, recipeqa_dir,
        "--data_names", "wikihow", "recipeqa",
        "--max_steps", "1", "--save_steps", "0",
        "--overwrite_output_dir",
    ]))
    assert state is not None


def test_example_cache(wikihow_dir):
    import argparse, glob
    from multimodal_sequencing_tpu.train.cli import load_examples
    args = argparse.Namespace(
        data_dir=wikihow_dir, data_dirs=None, model_name_or_path="simple",
        max_seq_length=96, use_cached=True, overwrite_cache=False,
        order_criteria="tight", min_story_length=5, max_story_length=5,
        multimodal=False, caption_transformations=None,
        abd_pred_method="binary")
    ex1 = load_examples(args, "wikihow", "sort", "dev")
    caches = glob.glob(os.path.join(wikihow_dir, "cached_dev_*"))
    assert caches, "cache file written"
    ex2 = load_examples(args, "wikihow", "sort", "dev")
    assert len(ex1) == len(ex2)
    assert ex1[0].guid == ex2[0].guid
    for c in caches:
        os.remove(c)


def test_config_name_local_hf_dir(tmp_path, wikihow_dir):
    import json
    cfgdir = tmp_path / "hfcfg"
    cfgdir.mkdir()
    with open(cfgdir / "config.json", "w") as f:
        json.dump({"model_type": "roberta", "vocab_size": 500,
                   "hidden_size": 48, "num_hidden_layers": 3,
                   "num_attention_heads": 4, "intermediate_size": 96,
                   "max_position_embeddings": 130,
                   "type_vocab_size": 1}, f)
    args = build_parser().parse_args([
        "--model_name_or_path", "simple", "--config_name", str(cfgdir),
        "--data_dir", wikihow_dir])
    cfg, tok = build_config(args)
    assert cfg.encoder.hidden_size == 48
    assert cfg.encoder.num_hidden_layers == 3
    assert cfg.encoder.position_offset == 2
    assert cfg.encoder.pad_token_id == 1


def test_train_head_pairwise_pure_class_tasks(wikihow_dir, tmp_path):
    for task, steps in [("wikihow_head", 2), ("wikihow_pairwise", 2),
                        ("wikihow_pure_class", 2)]:
        out = str(tmp_path / task)
        state = main_train(_common(wikihow_dir, out, [
            "--do_train", "--task_name", task, "--max_steps", str(steps),
            "--save_steps", "0", "--overwrite_output_dir",
            "--per_gpu_train_batch_size", "2",
        ]))
        assert state is not None


def test_gradient_accumulation(wikihow_dir, tmp_path):
    out = str(tmp_path / "accum")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "4",
        "--gradient_accumulation_steps", "2", "--save_steps", "0",
        "--overwrite_output_dir",
    ]))
    assert state is not None


def test_train_with_model_parallel(wikihow_dir, tmp_path):
    out = str(tmp_path / "tp")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "2",
        "--save_steps", "0", "--model_parallel_size", "2",
        "--per_gpu_train_batch_size", "2", "--overwrite_output_dir",
    ]))
    assert state is not None


def test_train_with_pipeline_parallel(wikihow_dir, tmp_path):
    out = str(tmp_path / "pp")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "2",
        "--save_steps", "0", "--pipeline_parallel_size", "2",
        "--pipeline_microbatches", "2",
        "--per_gpu_train_batch_size", "2", "--overwrite_output_dir",
    ]))
    assert state is not None


def test_eval_head_and_sequential_abductive(wikihow_dir, tmp_path):
    out = str(tmp_path / "hsa")
    results = main_eval(_common(wikihow_dir, out, [
        "--task_name", "wikihow_sort",
        "--sort_method", "head_and_sequential_abductive",
        "--eval_splits", "dev", "--max_eval_steps", "1",
    ]))
    assert "dev" in results
    out2 = str(tmp_path / "hat")
    results2 = main_eval(_common(wikihow_dir, out2, [
        "--task_name", "wikihow_sort",
        "--sort_method", "head_and_topological",
        "--eval_splits", "dev", "--max_eval_steps", "1",
    ]))
    assert "dev" in results2


def test_eval_all_checkpoints(wikihow_dir, tmp_path):
    out = str(tmp_path / "multi_ckpt")
    main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "4",
        "--save_steps", "2", "--overwrite_output_dir",
    ]))
    results = main_eval(_common(wikihow_dir, out, [
        "--task_name", "wikihow_sort", "--sort_method", "heat_map",
        "--model_name_or_path_1", out, "--eval_all_checkpoints",
        "--eval_splits", "dev", "--max_eval_steps", "1",
    ]))
    # one result block per checkpoint tag
    assert len(results) >= 2
    assert all("dev" in r for r in results.values())


def test_do_not_load_optimizer(wikihow_dir, tmp_path):
    """--do_not_load_optimizer resumes weights but resets optimizer state
    and global_step (reference train.py:195,246-247)."""
    import jax

    out = str(tmp_path / "dnlo")
    argv = _common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "2",
        "--save_steps", "2",
    ])
    main_train(argv)
    ck = [c for c in find_checkpoints(out) if parse_step_from_name(c) == 2]
    assert ck
    # rerun with the flag: training restarts from step 0, so it runs the
    # full 2 steps again and overwrites checkpoint-2 (a plain resume with
    # max_steps=2 would do nothing)
    import os as _os
    mtime0 = _os.path.getmtime(_os.path.join(ck[0], "state"))
    state = main_train(argv + ["--do_not_load_optimizer"])
    assert int(jax.device_get(state.step)) == 2
    mtime1 = _os.path.getmtime(_os.path.join(ck[0], "state"))
    assert mtime1 > mtime0


def test_restore_checkpoint_without_optimizer(wikihow_dir, tmp_path):
    import jax
    import jax.numpy as jnp
    from multimodal_sequencing_tpu.models.config import (
        EncoderConfig, MultimodalConfig)
    from multimodal_sequencing_tpu.models.sequencer import SequencingModel
    from multimodal_sequencing_tpu.train.state import (
        make_train_state, make_optimizer)

    cfg = MultimodalConfig(encoder=EncoderConfig.tiny(),
                           max_seq_length=32, per_seq_max_length=8)
    model = SequencingModel(cfg)
    batch = {"input_ids": np.zeros((2, 32), np.int32),
             "attention_mask": np.ones((2, 32), np.int32),
             "token_type_ids": np.zeros((2, 32), np.int32)}
    state = make_train_state(model, jax.random.PRNGKey(0), batch,
                             tx=make_optimizer())
    state = state.replace(step=jnp.asarray(9, jnp.int32))
    d = save_checkpoint(str(tmp_path), 9, state, cfg=cfg)
    fresh = make_train_state(model, jax.random.PRNGKey(1), batch,
                             tx=make_optimizer())
    got = restore_checkpoint(d, fresh, load_optimizer=False)
    # params restored, step NOT restored
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(got.params)[0]),
        np.asarray(jax.tree.leaves(state.params)[0]))
    assert int(jax.device_get(got.step)) == 0


def test_multihost_hook_attempts_distributed_init(monkeypatch):
    # the TPU-native replacement for the reference's
    # init_process_group(nccl) (`train.py:1433-1437`) must be attempted
    # whenever a multi-process coordinator is advertised in the env
    import jax
    from multimodal_sequencing_tpu.train.cli import _apply_runtime_flags

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    args = build_parser("train").parse_args(
        ["--model_name_or_path", "simple", "--output_dir", "/tmp/x"])

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    _apply_runtime_flags(args)
    assert not calls  # single-host: no init attempt

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    _apply_runtime_flags(args)
    assert calls  # coordinator advertised: init attempted


def test_train_with_sp_fsdp_and_cpu_devices_flag(wikihow_dir, tmp_path):
    """--sequence_parallel + --fsdp + --num_cpu_devices through the real
    CLI (the virtual platform already exists under pytest, so the device
    flag exercises its idempotent path)."""
    out = str(tmp_path / "spfsdp")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "2",
        "--save_steps", "0", "--model_parallel_size", "2",
        "--sequence_parallel", "--fsdp", "--num_cpu_devices", "8",
        "--per_gpu_train_batch_size", "2", "--overwrite_output_dir",
    ]))
    assert state is not None


def test_berson_cli_train_pipeline_parallel(wikihow_dir, tmp_path):
    """BERSON wrapper training with the text trunk pipelined over pp2
    (GPipe via trunk_out; parallel/pipeline.py)."""
    out = str(tmp_path / "bersonpp")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--wrapper_model_type", "berson", "--beam_size", "2",
        "--pipeline_parallel_size", "2", "--pipeline_microbatches", "2",
        "--per_gpu_train_batch_size", "1", "--max_steps", "2",
        "--save_steps", "0", "--overwrite_output_dir",
    ]))
    assert state is not None


def test_berson_cli_train_tp_sp_fsdp(wikihow_dir, tmp_path):
    """BERSON wrapper training under TP + SP + FSDP shardings."""
    out = str(tmp_path / "bersonpar")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--wrapper_model_type", "berson", "--beam_size", "2",
        "--model_parallel_size", "2", "--sequence_parallel", "--fsdp",
        "--per_gpu_train_batch_size", "1", "--max_steps", "2",
        "--save_steps", "0", "--overwrite_output_dir",
    ]))
    assert state is not None


def test_profile_dir_writes_trace(wikihow_dir, tmp_path):
    """--profile_dir captures a jax.profiler trace once training is warm."""
    out = str(tmp_path / "prof")
    trace_dir = str(tmp_path / "trace")
    state = main_train(_common(wikihow_dir, out, [
        "--do_train", "--task_name", "wikihow_hl_v1",
        "--hierarchical_version", "v1", "--max_steps", "6",
        "--save_steps", "0", "--profile_dir", trace_dir,
        "--overwrite_output_dir",
    ]))
    assert state is not None
    assert os.path.isdir(trace_dir) and os.listdir(trace_dir)
