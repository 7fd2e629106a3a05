"""CLI flag surface and entry points.

Preserves the reference's argparse surface (union of
`/root/reference/trainers/train.py:866-1392`,
`run_pretraining.py:705-1210`, `eval.py:1322-1705`; inventoried in SURVEY
§2.5) so reference invocations port over:

  python -m multimodal_sequencing_tpu.trainers.train --do_train ...
  python -m multimodal_sequencing_tpu.trainers.run_pretraining ...
  python -m multimodal_sequencing_tpu.trainers.eval --sort_method ...
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)


def build_parser(kind: str = "train") -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    add = p.add_argument

    # --- model / data --------------------------------------------------------
    add("--model_name_or_path", type=str, default="simple")
    add("--model_name_or_path_1", type=str, default=None)
    add("--model_name_or_path_2", type=str, default=None)
    add("--model_name_or_path_3", type=str, default=None)
    add("--config_name", type=str, default="")
    add("--tokenizer_name", type=str, default="")
    add("--model_size", type=str, default="large",
        choices=["tiny", "base", "large"],
        help="encoder size when config_name gives no local config")
    add("--data_dir", type=str, default=None)
    add("--data_dirs", type=str, nargs="+", default=None)
    add("--data_name", type=str, default="wikihow")
    add("--data_names", type=str, nargs="+", default=None)
    add("--task_name", type=str, default=None)
    add("--task_type", type=str, default=None)
    add("--train_split", type=str, default="train")
    add("--eval_splits", type=str, nargs="+", default=["test"])
    add("--data_splits", type=str, nargs="+", default=None)
    add("--order_criteria", type=str, default="tight",
        choices=["tight", "loose"])
    add("--max_story_length", type=int, default=5)
    add("--min_story_length", type=int, default=5)
    add("--max_seq_length", type=int, default=300)
    add("--per_seq_max_length", type=int, default=60)
    add("--caption_transformations", type=str, nargs="+", default=None)
    add("--paired_with_image", type=str, default="true")
    add("--replace_token_type_embeddings", action="store_true")

    # --- multimodal ----------------------------------------------------------
    add("--multimodal", action="store_true")
    add("--multimodal_model_type", type=str, default="clip",
        choices=["naive", "visualbert", "vilbert", "vlbert", "uniter",
                 "clip"])
    add("--vision_model", type=str, default="resnet50")
    add("--clip_model_name", type=str, default="RN50",
        choices=["RN50", "ViT-B/32"])
    add("--clip_visual_model_weights", type=str, default=None)
    add("--vision_model_checkpoint", type=str, default=None)
    add("--vision_feature_dim", type=int, default=None,
        help="box-head width of the FPN regional-feature tower "
             "(detectron2-zoo checkpoints: 1024)")
    add("--freeze_vision_model", action="store_true")
    add("--multimodal_text_part", action="store_true")
    add("--multimodal_img_part", action="store_true")
    add("--multimodal_fusion_method", type=str, default="sum",
        choices=["sum", "mul", "text_only", "img_only"])
    add("--multimodal_loss", action="store_true")
    add("--include_num_img_regional_features", type=int, default=None)
    add("--include_full_img_features", action="store_true")
    add("--vision_image_size", type=int, default=None,
        help="input resolution for the vision tower; defaults to 224 "
             "(torchvision/CLIP pipelines) or 256 for detectron2_* "
             "models (the reference's hardcoded Detectron2ImageTransform "
             "size, multimodal_utils.py:189)")
    add("--clip_ref_fold_quirk", action="store_true",
        help="replay the reference's byte-order RN50 attnpool fold "
             "(model.py:76-77) for importing reference-finetuned "
             "checkpoints; default is the clean per-image patch fold")
    add("--device_image_preprocess", action="store_true", default=True,
        help="ship uint8 images and normalize on device (4x less H2D "
             "traffic; the default — the flag is kept for compatibility)")
    add("--host_image_preprocess", dest="device_image_preprocess",
        action="store_false",
        help="host float32 CHW preprocessing (reference-parity skimage/cv2 "
             "numerics, `datasets/img_utils.py`); 4x more H2D traffic")

    # --- heads / decoding ----------------------------------------------------
    add("--hierarchical_version", type=str, default="v0",
        choices=["v0", "v1", "v2", "v3", "p0", "p1"])
    add("--heatmap_decode_method", type=str, default="naive_v2_sum",
        choices=["super_naive", "naive", "naive_v2", "naive_v2_sum",
                 "naive_sum", "naive_v3", "mst", "topological"])
    add("--heatmap_decode_beam_size", type=int, default=2)
    add("--device_decode", action="store_true",
        help="decode orders on-device (ops/order_decode): exact n! argmax "
             "for the naive heatmap family, vectorized Kahn for "
             "topological; host decoders remain the parity oracle")
    add("--hl_include_objectives", type=str, nargs="+", default=None)
    add("--wrapper_model_type", type=str, default=None)
    add("--wrapper_model_with_heatmap", action="store_true")
    add("--additional_wrapper_level_objectives", type=str, nargs="+",
        default=None)
    add("--beam_size", type=int, default=16)
    add("--pairwise_loss_lam", type=float, default=0.6)

    # --- pretraining ---------------------------------------------------------
    add("--multimodal_pretrain_objectives", type=str, nargs="+",
        default=None)
    add("--mlm_probability", type=float, default=0.15)
    add("--mlm_ignore_index", type=int, default=-100)

    # --- loop ----------------------------------------------------------------
    add("--do_train", action="store_true")
    add("--do_eval", action="store_true")
    add("--evaluate_during_training", action="store_true")
    add("--per_gpu_train_batch_size", type=int, default=8)
    add("--per_gpu_eval_batch_size", type=int, default=8)
    add("--gradient_accumulation_steps", type=int, default=1)
    add("--learning_rate", type=float, default=5e-6)
    add("--weight_decay", type=float, default=0.0)
    add("--adam_epsilon", type=float, default=1e-8)
    add("--max_grad_norm", type=float, default=1.0)
    add("--num_train_epochs", type=float, default=3.0)
    add("--max_steps", type=int, default=-1)
    add("--max_eval_steps", type=int, default=None)
    add("--warmup_steps", type=int, default=0)
    add("--logging_steps", type=int, default=50)
    add("--save_steps", type=int, default=500)
    add("--iters_to_eval", type=str, nargs="+", action="extend",
        default=None)
    add("--eval_all_checkpoints", action="store_true")
    add("--seed", type=int, default=42)
    add("--fp16", action="store_true",
        help="accepted for reference-compat; compute dtype is bfloat16")
    add("--fp16_opt_level", type=str, default="O1")
    add("--local_rank", type=int, default=-1)
    add("--no_cuda", action="store_true")
    add("--overwrite_output_dir", action="store_true")
    add("--overwrite_cache", action="store_true")
    add("--use_cached", action="store_true")
    add("--do_not_load_optimizer", action="store_true")
    add("--output_dir", type=str, default="outputs/run")
    add("--output_root", type=str, default=None)
    add("--debug", action="store_true")
    add("--metrics", type=str, nargs="+", default=None)
    add("--multiref_metrics", type=str, default="max")
    add("--eval_save_all_results", action="store_true")

    # --- eval-only -----------------------------------------------------------
    add("--gelu_approximate", action="store_true",
        help="tanh-approximate GELU (~17%% faster steps on v5e; keep off "
             "when continuing from converted HF checkpoints)")
    add("--gelu_impl", type=str, default="logit_erf",
        choices=["erf", "fast_erf", "logit_erf", "tanh"],
        help="erf-GELU implementation (ops/gelu.py): logit_erf (default) "
             "computes erf GELU through its logistic form with one exp, "
             "bf16 outputs exhaustively 0-or-1-ulp equal to the XLA erf "
             "lowering; fast_erf is the A&S rational form (same bf16 "
             "guarantee, slower); erf forces the XLA lowering; tanh "
             "equals --gelu_approximate")
    add("--attention_dropout_mode", type=str, default="probs",
        choices=["probs", "folded"],
        help="probs = dropout on attention probabilities (exact HF/"
             "reference train semantics); folded = skip it and rely on "
             "output dropout (keeps attention fused; faster)")
    add("--model_parallel_size", type=int, default=1,
        help="mesh model-axis size; >1 shards qkv/MLP kernels "
             "(Megatron-style TP, parallel/sharding_rules)")
    add("--pipeline_parallel_size", type=int, default=1,
        help="GPipe pipeline stages over the mesh model axis for the "
             "text encoder stack (parallel/pipeline.py); mutually "
             "exclusive with --model_parallel_size/--fsdp")
    add("--pipeline_microbatches", type=int, default=2,
        help="microbatches per step for --pipeline_parallel_size > 1 "
             "(bubble fraction = (P-1)/(M+P-1))")
    add("--profile_dir", type=str, default=None,
        help="capture a 3-step jax.profiler trace (TensorBoard/Perfetto) "
             "into this directory once training is warm")
    add("--num_cpu_devices", type=int, default=0,
        help="force an N-device virtual CPU platform before backend init "
             "(validate dp/tp/sp/fsdp sharding without TPU hardware; the "
             "technique behind tests/conftest.py and dryrun_multichip)")
    add("--sequence_parallel", action="store_true",
        help="with --model_parallel_size > 1: shard layer-boundary "
             "activations over the model axis along the sequence "
             "(Megatron SP; reduce-scatter/all-gather instead of "
             "all-reduce around the TP matmul pairs)")
    add("--fsdp", action="store_true",
        help="ZeRO-style fully-sharded data parallel: shard params + "
             "optimizer moments over the mesh data axis (XLA inserts "
             "all-gather/reduce-scatter); composes with "
             "--model_parallel_size")
    add("--prng_impl", type=str, default="rbg",
        choices=["threefry2x32", "rbg", "unsafe_rbg"],
        help="dropout PRNG; rbg uses the TPU hardware generator "
             "(~15%% faster steps, training-quality neutral)")
    add("--sort_method", type=str, default="topological",
        choices=["topological", "head_and_topological",
                 "head_and_sequential", "head_and_sequential_abductive",
                 "pure_class", "pure_decode", "heat_map", "berson"])
    add("--abd_pred_method", type=str, default="binary")
    # int eval-frequency: only every Nth eval batch is decoded
    # ("usually for movie script type datasets", `eval.py:1250-1251,1524`)
    add("--eval_on_every_iter", type=int, default=None)

    return p


def _is_detectron2(args) -> bool:
    return bool(args.multimodal
                and str(getattr(args, "vision_model", "")
                        ).startswith("detectron2"))


def resolve_args(args):
    """Post-parse resolution of interdependent flags (called by every
    entry point). --vision_image_size defaults by vision family: 256 for
    detectron2_* (the reference's hardcoded transform size), 224
    otherwise."""
    if getattr(args, "vision_image_size", None) is None:
        args.vision_image_size = 256 if _is_detectron2(args) else 224
    return args


def resolve_output_dir(args) -> str:
    if args.output_root:
        return os.path.join(args.output_root, args.output_dir)
    return args.output_dir


def build_config(args):
    """argparse namespace -> MultimodalConfig (replaces the reference's
    args-onto-HF-config copying, `train.py:1587-1620`)."""
    from ..models.config import EncoderConfig, MultimodalConfig
    from ..data.tokenization import load_tokenizer

    tokenizer = load_tokenizer(args.tokenizer_name or args.model_name_or_path)
    vocab = len(tokenizer)
    enc = _encoder_config_from_local_hf(args)
    if enc is None:
        if args.model_size == "tiny":
            enc = EncoderConfig.tiny(vocab_size=vocab)
        elif args.model_size == "base":
            enc = EncoderConfig.roberta_base(vocab_size=vocab)
        else:
            enc = EncoderConfig.roberta_large(vocab_size=vocab)
    if args.replace_token_type_embeddings:
        enc.type_vocab_size = args.max_story_length
    if getattr(args, "gelu_approximate", False):
        enc.gelu_approximate = True
    enc.gelu_impl = getattr(args, "gelu_impl", "logit_erf")
    enc.attention_dropout_mode = getattr(args, "attention_dropout_mode",
                                         "probs")
    if getattr(args, "sequence_parallel", False):
        enc.sequence_parallel = True
    cfg = MultimodalConfig(
        encoder=enc,
        max_story_length=args.max_story_length,
        min_story_length=args.min_story_length,
        max_seq_length=args.max_seq_length,
        per_seq_max_length=args.per_seq_max_length,
        cls_id=tokenizer.cls_token_id,
        pad_id=tokenizer.pad_token_id,
        mask_id=getattr(tokenizer, "mask_token_id", None) or 4,
        mlm_ignore_index=args.mlm_ignore_index,
        multimodal=args.multimodal,
        multimodal_model_type=args.multimodal_model_type,
        vision_model=args.vision_model,
        vision_feature_dim=args.vision_feature_dim,
        clip_model_name=args.clip_model_name,
        freeze_vision_model=args.freeze_vision_model,
        multimodal_text_part=args.multimodal_text_part,
        multimodal_img_part=args.multimodal_img_part,
        # Accepted for flag parity but inert, exactly like the reference:
        # train.py:1596,1713,1755 only copies it onto HF configs, and the
        # sole reader (pointer_module.py:141) hardcodes fusion "mul".
        multimodal_fusion_method=args.multimodal_fusion_method,
        num_img_regional_features=args.include_num_img_regional_features,
        # store_true flag, default False like the reference (train.py:1162);
        # consumed by the detectron2-style tower paths only
        include_full_img_features=bool(args.include_full_img_features),
        image_size=(args.vision_image_size, args.vision_image_size),
        hierarchical_version=args.hierarchical_version,
        hl_include_objectives=args.hl_include_objectives or [],
        heatmap_decode_method=args.heatmap_decode_method,
        heatmap_decode_beam_size=args.heatmap_decode_beam_size,
        device_decode=args.device_decode,
        wrapper_model_type=args.wrapper_model_type,
        wrapper_model_with_heatmap=args.wrapper_model_with_heatmap,
        multimodal_pretrain_objectives=(
            args.multimodal_pretrain_objectives or []),
        mlm_probability=args.mlm_probability,
    )
    if args.multimodal_fusion_method != "sum":
        logger.warning(
            "--multimodal_fusion_method %s has NO effect (parity with the "
            "reference, which copies the flag onto configs but hardcodes "
            "'mul' at its only read site, pointer_module.py:141)",
            args.multimodal_fusion_method)
    return cfg, tokenizer


def _encoder_config_from_local_hf(args):
    """`--config_name <local dir with config.json>` -> EncoderConfig
    (the reference's AutoConfig path, `train.py:1527-1539`)."""
    import json
    from ..models.config import EncoderConfig
    for cand in (args.config_name, args.model_name_or_path):
        if not cand or not os.path.isdir(cand):
            continue
        path = os.path.join(cand, "config.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            hf = json.load(f)
        if "hidden_size" not in hf:
            continue
        model_type = hf.get("model_type", "roberta")
        return EncoderConfig(
            vocab_size=hf.get("vocab_size", 50265),
            hidden_size=hf["hidden_size"],
            num_hidden_layers=hf.get("num_hidden_layers", 12),
            num_attention_heads=hf.get("num_attention_heads", 12),
            intermediate_size=hf.get("intermediate_size",
                                     4 * hf["hidden_size"]),
            max_position_embeddings=hf.get("max_position_embeddings", 514),
            type_vocab_size=hf.get("type_vocab_size", 1),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
            pad_token_id=hf.get("pad_token_id",
                                1 if model_type == "roberta" else 0),
            position_offset=2 if model_type == "roberta" else 0,
            hidden_dropout_prob=hf.get("hidden_dropout_prob", 0.1),
            attention_probs_dropout_prob=hf.get(
                "attention_probs_dropout_prob", 0.1),
        )
    return None


def _parse_task(args):
    """task_name '{data}_{tasktype}' resolution incl. split '-' version
    parsing (`train.py:635-641,1475-1519`)."""
    task_name = args.task_name or f"{args.data_name}_{args.task_type}"
    data_name, _, task_type = task_name.partition("_")
    return data_name, task_type


def _split_version(split: str):
    """'train-acl22' -> (split='train', version_text='acl22')."""
    if "-" in split:
        base, version = split.split("-", 1)
        return base, version
    return split, None


def make_processor(args, data_name: str, split: str, for_task: str):
    from ..data.registry import get_processor
    from ..data.caption_transforms import select_caption_transforms
    base_split, version = _split_version(split)
    task_key = f"{data_name}_{for_task}"
    ct = select_caption_transforms(args, data_name, base_split)
    proc = get_processor(
        task_key, data_dir=args.data_dir or (
            args.data_dirs[0] if args.data_dirs else None),
        order_criteria=args.order_criteria,
        min_story_length=args.min_story_length,
        max_story_length=args.max_story_length,
        version_text=version, caption_transforms=ct,
        pure_class=(for_task == "pure_class"),
        paired_with_image=args.multimodal)
    return proc, base_split


def load_examples(args, data_name, task_type, split):
    """Processor example loading with the reference's disk cache contract
    (`train.py:714-759`): `cached_{split}_{model}_{len}_{task}` under the
    data dir, gated by --use_cached / --overwrite_cache."""
    import pickle
    data_dir = args.data_dir or (args.data_dirs[0] if args.data_dirs else "")
    cache_path = None
    if getattr(args, "use_cached", False) and data_dir:
        model_tag = os.path.basename(
            str(args.model_name_or_path).rstrip("/")) or "model"
        cache_path = os.path.join(
            data_dir, f"cached_{split.replace('/', '_')}_{model_tag}_"
                      f"{args.max_seq_length}_{data_name}_{task_type}.pkl")
        if (os.path.exists(cache_path)
                and not getattr(args, "overwrite_cache", False)):
            logger.info("loading cached examples from %s", cache_path)
            with open(cache_path, "rb") as f:
                return pickle.load(f)

    proc, base_split = make_processor(args, data_name, split, task_type)
    if base_split == "train":
        examples = proc.get_train_examples()
    elif base_split in ("dev", "val"):
        examples = proc.get_dev_examples()
    else:
        examples = proc.get_test_examples()

    if cache_path:
        try:
            with open(cache_path, "wb") as f:
                pickle.dump(examples, f)
            logger.info("cached %d examples to %s", len(examples),
                        cache_path)
        except OSError as e:
            logger.warning("could not write cache %s: %s", cache_path, e)
    return examples


def _dataset_common(args):
    """Dataset kwargs shared by every task dataset AND the eval sort
    loader — image pipeline config must match between train and eval."""
    return dict(
        max_length=args.max_seq_length,
        per_seq_max_length=args.per_seq_max_length,
        max_story_length=args.max_story_length,
        min_story_length=args.min_story_length,
        seed=args.seed, multimodal=args.multimodal,
        image_size=(args.vision_image_size, args.vision_image_size),
        uint8_images=getattr(args, "device_image_preprocess", True),
        image_transform=("detectron2" if _is_detectron2(args)
                         else "imagenet"),
        num_img_regional_features=args.include_num_img_regional_features)


def make_dataset(args, cfg, tokenizer, task_type, examples, scramble=True,
                 decode=False):
    from ..data.datasets import (
        PairwiseDataset, HeadPredDataset, AbductiveDataset, PureClassDataset,
        SortDataset, PretrainDataset, BersonDataset)
    common = _dataset_common(args)
    if args.wrapper_model_type == "berson":
        return BersonDataset(examples, tokenizer, scramble=scramble,
                             **common)
    if task_type == "pairwise":
        return PairwiseDataset(examples, tokenizer, **common)
    if task_type == "head":
        return HeadPredDataset(examples, tokenizer, scramble=scramble,
                               **common)
    if task_type == "abductive":
        return AbductiveDataset(examples, tokenizer,
                                pred_method=args.abd_pred_method, **common)
    if task_type in ("pure_class", "hl_v1"):
        if args.hierarchical_version in ("v1", "v2", "v3", "p0", "p1"):
            return PureClassDataset(examples, tokenizer, scramble=scramble,
                                    decode=True, **common)
        return PureClassDataset(examples, tokenizer, scramble=scramble,
                                decode=decode, **common)
    if task_type == "pure_decode":
        # packed stories + order-sequence labels for the encoder-decoder
        # (the reference trains pure_decode on PureClassDataset(decode=True),
        # `train.py:801-812`)
        return PureClassDataset(examples, tokenizer, scramble=scramble,
                                decode=True, **common)
    if task_type == "sort":
        return SortDataset(examples, tokenizer, scramble=scramble, **common)
    if task_type == "pretrain":
        return PretrainDataset(examples, tokenizer, scramble=False, **common)
    if task_type == "retrieve":
        from ..data.datasets import RetrievalDataset
        return RetrievalDataset(examples, tokenizer, **common)
    raise NotImplementedError(f"task_type {task_type}")


def _vision_cfg(cfg, args):
    """CLIPVisionConfig for the visual tower. Honors --model_size tiny so
    the launcher scripts can run CI-light without building a full RN50."""
    from ..models.clip_visual import CLIPVisionConfig
    if not cfg.multimodal:
        return None
    rn = cfg.clip_model_name.startswith("RN")
    if getattr(args, "model_size", "large") == "tiny":
        vcfg = (CLIPVisionConfig.tiny_rn(dtype=cfg.encoder.dtype) if rn
                else CLIPVisionConfig.tiny_vit(dtype=cfg.encoder.dtype))
    else:
        vcfg = (CLIPVisionConfig.rn50(dtype=cfg.encoder.dtype) if rn
                else CLIPVisionConfig.vit_b32(dtype=cfg.encoder.dtype))
    vcfg.image_resolution = args.vision_image_size
    vcfg.ref_fold_quirk = getattr(args, "clip_ref_fold_quirk", False)
    return vcfg


def build_model(cfg, args):
    from ..models.sequencer import SequencingModel
    from ..models.berson import BersonOrdering
    if cfg.hierarchical_version == "decode":
        from ..models.pure_decode import EncoderIndexDecoder
        return EncoderIndexDecoder(cfg)
    vcfg = _vision_cfg(cfg, args)
    if args.wrapper_model_type == "berson":
        extra = args.additional_wrapper_level_objectives or []
        return BersonOrdering(
            cfg, vcfg, beam_size=args.beam_size,
            pairwise_loss_lam=args.pairwise_loss_lam,
            time_contrastive=("time_contrastive" in extra),
            multimodal_loss=getattr(args, "multimodal_loss", False))
    return SequencingModel(cfg, vcfg)


def _apply_runtime_flags(args):
    import os as _os_early
    from ..utils.platform import apply_platform_env
    apply_platform_env()  # JAX_PLATFORMS env -> config (see utils/platform)
    import jax
    if getattr(args, "num_cpu_devices", 0):
        # must precede any backend touch; a bare JAX_PLATFORMS env var is
        # not enough once a TPU plugin has registered (same recipe as
        # tests/conftest.py / __graft_entry__._respawn_on_virtual_cpu_mesh)
        import re as _re
        flags = _os_early.environ.get("XLA_FLAGS", "")
        want = (f"--xla_force_host_platform_device_count="
                f"{args.num_cpu_devices}")
        if "xla_force_host_platform_device_count" in flags:
            # replace an inherited count rather than silently keeping it
            _os_early.environ["XLA_FLAGS"] = _re.sub(
                r"--xla_force_host_platform_device_count=\d+", want, flags)
        else:
            _os_early.environ["XLA_FLAGS"] = f"{flags} {want}".strip()
        jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_default_prng_impl", args.prng_impl)
    except Exception:
        pass
    # multi-host: initialize the distributed runtime when launched under a
    # multi-process coordinator (DCN across hosts, ICI within a slice) —
    # the TPU-native replacement for the reference's
    # init_process_group(nccl) (`train.py:1433-1437`)
    import os as _os
    if (_os.environ.get("JAX_COORDINATOR_ADDRESS")
            or _os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")):
        try:
            jax.distributed.initialize()
            logger.info("jax.distributed initialized: process %d/%d",
                        jax.process_index(), jax.process_count())
        except Exception as e:  # already initialized / single host
            logger.warning("jax.distributed.initialize skipped: %s", e)


def main_train(argv=None):
    args = build_parser("train").parse_args(argv)
    args = resolve_args(args)
    logging.basicConfig(level=logging.INFO)
    if (getattr(args, "multimodal_loss", False)
            and args.wrapper_model_type != "berson"):
        # the reference only consumes --multimodal_loss inside the BERSON
        # wrapper (`models/berson/modeling_bert.py` pairwise img loss);
        # anywhere else it would silently no-op
        logger.warning(
            "--multimodal_loss has no effect without "
            "--wrapper_model_type berson; ignoring")
    _apply_runtime_flags(args)
    args.output_dir = resolve_output_dir(args)
    os.makedirs(args.output_dir, exist_ok=True)
    cfg, tokenizer = build_config(args)
    data_name, task_type = _parse_task(args)
    if task_type == "hl_v1" and args.hierarchical_version == "v0":
        args.hierarchical_version = "v1"
        cfg.hierarchical_version = "v1"
    if task_type == "pure_decode" and args.wrapper_model_type != "berson":
        # encoder-decoder over index tokens (`train.py:1955-1968`)
        cfg.hierarchical_version = "decode"
    # classification head width by task (`train.py:1544-1620` config copies)
    if cfg.hierarchical_version == "v0":
        if task_type == "pairwise" or task_type == "abductive":
            cfg.num_labels = 2
        elif task_type == "head":
            cfg.num_labels = args.max_story_length
        elif task_type == "pure_class":
            import math
            cfg.num_labels = math.factorial(args.max_story_length)
    examples = load_examples(args, data_name, task_type, args.train_split)
    model = build_model(cfg, args)
    dataset = make_dataset(args, cfg, tokenizer, task_type, examples)
    eval_fn = None
    if args.evaluate_during_training and args.wrapper_model_type != "berson":
        eval_fn = _make_dev_eval_fn(args, cfg, tokenizer, model, data_name)
    from .loop import run_finetune
    if args.wrapper_model_type == "berson":
        state, steps = _run_berson_training(cfg, model, dataset, args,
                                            tokenizer)
    else:
        state, steps = run_finetune(cfg, model, dataset, args,
                                    tokenizer=tokenizer, eval_fn=eval_fn)
    logger.info("training done at step %d; checkpoints in %s", steps,
                args.output_dir)

    # --do_eval: evaluate selected checkpoints after training
    # (`train.py:2168-2225`: iters_to_eval globbing incl. 'best')
    if args.do_eval:
        from .checkpoint import find_checkpoints, restore_checkpoint
        ckpts = find_checkpoints(
            args.output_dir,
            None if args.eval_all_checkpoints else args.iters_to_eval)
        if args.wrapper_model_type == "berson":
            # the flagship launcher (`scripts/wikihow_finetune.sh`) passes
            # --do_eval --iters_to_eval ... WITH the wrapper: per checkpoint,
            # run the beam-search berson_evaluate over every eval split
            # (`train.py:2193-2221` berson branch) and persist the results
            for split in args.eval_splits:
                eval_fn = _make_berson_eval_fn(args, cfg, tokenizer, model,
                                               split=split)
                if eval_fn is None:
                    continue
                for ck in (ckpts or [None]):
                    st = restore_checkpoint(ck, state) if ck else state
                    res = eval_fn(st)
                    tag = (os.path.basename(str(ck).rstrip("/")) if ck
                           else f"checkpoint-{steps}")
                    logger.info("berson eval %s split %s: %s", tag, split,
                                res)
                    out = os.path.join(
                        args.output_dir,
                        f"eval_results_split_{split}_{tag}.txt")
                    with open(out, "w") as f:
                        for k, v in sorted(res.items()):
                            f.write(f"{k} = {v}\n")
        else:
            eval_fn = _make_dev_eval_fn(args, cfg, tokenizer, model,
                                        data_name)
            if eval_fn is not None:
                if not ckpts:
                    res = eval_fn(state)
                    logger.info("final-state eval: %s", res)
                for ck in ckpts:
                    st = restore_checkpoint(ck, state)
                    res = eval_fn(st)
                    logger.info("eval %s: %s", os.path.basename(ck), res)
    return state


def _make_berson_eval_fn(args, cfg, tokenizer, model, split=None):
    """Beam-search dev metrics for the BERSON wrapper (acc/pmr/tau of
    `models/berson/eval.py:131-135`, via the shared metric suite).
    `split` defaults to the first eval split (dev-eval during training);
    the post-training --do_eval sweep passes each split explicitly."""
    import jax.numpy as jnp
    import numpy as np
    from ..data.datasets import BersonDataset, data_loader
    from ..models.berson import BersonOrdering
    from ..utils.metrics import compute_metrics

    data_name, _ = _parse_task(args)
    try:
        examples = load_examples(args, data_name, "sort",
                                 split or args.eval_splits[0])
    except (FileNotFoundError, ValueError) as e:
        logger.warning("no dev split for berson eval: %s", e)
        return None
    ds = BersonDataset(examples, tokenizer, **_dataset_common(args))

    def eval_fn(state):
        variables = {"params": state.params, **state.model_state}
        preds, labels = [], []
        for bi, batch in enumerate(data_loader(
                ds, args.per_gpu_eval_batch_size)):
            if args.max_eval_steps is not None and bi >= args.max_eval_steps:
                break
            db = {k: jnp.asarray(v) for k, v in batch.items()
                  if isinstance(v, np.ndarray) and v.dtype != object}
            pred = state.apply_fn(variables, db,
                                  method=BersonOrdering.beam_search)
            valid = batch.get("valid")
            for i, p in enumerate(np.asarray(pred)):
                if valid is None or valid[i]:
                    preds.append(p.tolist())
                    labels.append(np.asarray(batch["labels"][i]))
        return {m: compute_metrics(args, m, preds, labels)
                for m in ("partial_match", "exact_match", "tau")}

    return eval_fn


def _make_dev_eval_fn(args, cfg, tokenizer, model, data_name):
    """Dev-split decode metrics during training (`train.py:366-422`): runs
    the matching sort strategy for the current head over the first eval
    split; the loop keys the best checkpoint on partial+exact match."""
    from ..data.packing import StoryPacker
    from ..data.datasets import SortDataset, data_loader
    from .evaluation import SortEvaluator

    split = args.eval_splits[0]
    try:
        examples = load_examples(args, data_name, "sort", split)
    except (FileNotFoundError, ValueError) as e:
        logger.warning("no dev split for eval-during-training: %s", e)
        return None
    ds = SortDataset(examples, tokenizer, **_dataset_common(args))
    packer = StoryPacker(tokenizer, args.max_seq_length,
                         args.per_seq_max_length)
    evaluator = SortEvaluator(cfg, packer,
                              micro_batch=args.per_gpu_eval_batch_size * 4)
    v = cfg.hierarchical_version
    method = ("heat_map" if v in ("v1", "v2", "v3")
              else "pure_decode" if v in ("p0", "p1", "decode")
              else "topological")
    role = {"heat_map": "heatmap",
            "pure_decode": "pure_decode" if v == "decode" else "pointer",
            "topological": "pairwise"}[method]

    def eval_fn(state):
        variables = {"params": state.params, **state.model_state}
        loader = data_loader(ds, args.per_gpu_eval_batch_size)
        return evaluator.evaluate(
            loader, method, {role: (model, variables)},
            max_batches=args.max_eval_steps, args_ns=args,
            # per-sample CSV/orders when requested (`--eval_save_all_results`,
            # reference train.py:583-612)
            output_dir=(args.output_dir
                        if getattr(args, "eval_save_all_results", False)
                        else None),
            data_split=split)

    return eval_fn


def _run_berson_training(cfg, model, dataset, args, tokenizer):
    """BERSON uses its own loss signature; reuse the loop via a wrapper
    step."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from .state import make_optimizer, TrainState
    from .checkpoint import save_checkpoint
    from .loop import MetricWriter
    from ..data.datasets import data_loader
    from ..parallel.mesh import make_mesh, shard_batch

    n_pp = max(1, getattr(args, "pipeline_parallel_size", 1))
    if n_pp > 1:
        # the BERSON text trunk pipelines over the model axis — which TP
        # and Megatron SP also consume, and the multimodal inner encoders
        # fuse vision inside the trunk
        if max(1, getattr(args, "model_parallel_size", 1)) > 1:
            raise NotImplementedError(
                "--pipeline_parallel_size and --model_parallel_size both "
                "consume the mesh model axis — pick one for BERSON")
        if getattr(cfg.encoder, "sequence_parallel", False):
            raise NotImplementedError(
                "--sequence_parallel is exclusive with the pipelined "
                "BERSON trunk")
        if cfg.multimodal:
            raise NotImplementedError(
                "pipelined BERSON covers the text trunk; multimodal "
                "inner encoders train with dp/tp/fsdp")
    n_model = n_pp if n_pp > 1 else max(
        1, getattr(args, "model_parallel_size", 1))
    mesh = make_mesh(n_model=n_model)
    n_data = int(np.prod(mesh.devices.shape)) // n_model
    batch_size = args.per_gpu_train_batch_size * n_data
    steps_per_epoch = max(1, len(dataset) // batch_size)
    if args.max_steps > 0:
        total_steps = args.max_steps
        epochs = total_steps // steps_per_epoch + 1
    else:
        epochs = max(1, int(args.num_train_epochs))
        total_steps = int(steps_per_epoch * args.num_train_epochs)
    tx = make_optimizer(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        total_steps=total_steps, weight_decay=args.weight_decay,
        adam_epsilon=args.adam_epsilon, max_grad_norm=args.max_grad_norm,
        grad_accum_steps=args.gradient_accumulation_steps)

    sample = next(data_loader(dataset, batch_size))
    init_batch = {k: jnp.asarray(v) for k, v in sample.items()
                  if isinstance(v, np.ndarray) and v.dtype != object}
    variables = dict(model.init(jax.random.PRNGKey(args.seed), init_batch))
    params = variables.pop("params")
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params), model_state=variables,
                       tx=tx, apply_fn=model.apply)
    from ..models.convert import apply_pretrained_to_state
    state = apply_pretrained_to_state(state, args, cfg, encoder_key="inner")

    from jax.sharding import NamedSharding, PartitionSpec as P
    from .steps import make_berson_train_step
    seq_par = getattr(cfg.encoder, "sequence_parallel", False)
    fsdp = bool(getattr(args, "fsdp", False))
    if n_pp > 1:
        from ..parallel.pipeline import make_berson_pipeline_train_step
        n_micro = max(1, getattr(args, "pipeline_microbatches", 1) or n_pp)
        st_sh = None
        if fsdp:
            from ..parallel.sharding_rules import (tree_shardings,
                                                   shard_state)
            st_sh = tree_shardings(state, mesh, fsdp=True, apply_tp=False)
            state = shard_state(state, mesh, fsdp=True, apply_tp=False)
        else:
            state = jax.device_put(state, NamedSharding(mesh, P()))
        step_fn = make_berson_pipeline_train_step(
            cfg, mesh, n_stages=n_pp, n_micro=n_micro, fsdp=fsdp,
            state_shardings=st_sh)
    elif n_model > 1 or fsdp:
        from ..parallel.sharding_rules import tree_shardings, shard_state
        st_sh = tree_shardings(state, mesh, fsdp=fsdp)
        state = shard_state(state, mesh, fsdp=fsdp)
        step_fn = make_berson_train_step(mesh, state_shardings=st_sh,
                                         sequence_parallel=seq_par)
    else:
        step_fn = make_berson_train_step(mesh, sequence_parallel=seq_par)
        state = jax.device_put(state, NamedSharding(mesh, P()))

    # eval-during-training: beam-search decode over the first eval split
    # (berson_evaluate analogue, `models/berson/eval.py:39-187`)
    beam_eval = None
    if args.evaluate_during_training:
        beam_eval = _make_berson_eval_fn(args, cfg, tokenizer, model)

    writer = MetricWriter(os.path.join(args.output_dir, "logs"))
    rng = jax.random.PRNGKey(args.seed + 1)
    global_step = 0
    best_score = -float("inf")
    tc_enabled = "time_contrastive" in (
        args.additional_wrapper_level_objectives or [])
    host_rng = np.random.default_rng(args.seed + 11)
    from ..utils.profiling import StepTraceWindow
    tracer = StepTraceWindow(getattr(args, "profile_dir", None))
    for epoch in range(epochs):
        for batch in data_loader(dataset, batch_size, shuffle=True,
                                 seed=args.seed, epoch=epoch,
                                 drop_last=False):
            if tc_enabled:
                from .objectives import plan_objective
                _, tc = plan_objective("time_contrastive",
                                       {"input_ids": np.asarray(
                                           batch["input_ids"][:, 0])},
                                       cfg, host_rng)
                batch["tc_anchor"] = tc["anchor_idx"]
                batch["tc_positive"] = tc["positive_idx"]
                batch["tc_negative"] = tc["negative_idx"]
            db = shard_batch({k: v for k, v in batch.items()
                              if isinstance(v, np.ndarray)
                              and v.dtype != object}, mesh)
            tracer.before_step(global_step)
            state, out = step_fn(state, db, rng)
            if tracer.after_step(global_step, sync=out["loss"]):
                logger.info("profiler trace written to %s",
                            args.profile_dir)
            global_step += 1
            if global_step % args.logging_steps == 0:
                writer.scalar("train/loss", float(out["loss"]), global_step)
                logger.info("step %d loss %.4f", global_step,
                            float(out["loss"]))
            if args.save_steps and global_step % args.save_steps == 0:
                save_checkpoint(args.output_dir, global_step, state, cfg=cfg,
                                tokenizer=tokenizer,
                                training_args=vars(args))
                if beam_eval is not None:
                    res = beam_eval(state)
                    for k, v in res.items():
                        writer.scalar(f"eval/{k}", v, global_step)
                    logger.info("eval @%d: %s", global_step, res)
                    score = res.get("partial_match", 0) + res.get(
                        "exact_match", 0)
                    if score > best_score:
                        best_score = score
                        save_checkpoint(args.output_dir, global_step, state,
                                        cfg=cfg, tokenizer=tokenizer,
                                        training_args=vars(args),
                                        name="best")
            if global_step >= total_steps:
                break
        if global_step >= total_steps:
            break
    tracer.close()
    save_checkpoint(args.output_dir, global_step, state, cfg=cfg,
                    tokenizer=tokenizer, training_args=vars(args))
    writer.close()
    return state, global_step


def main_pretrain(argv=None):
    args = build_parser("pretrain").parse_args(argv)
    args = resolve_args(args)
    logging.basicConfig(level=logging.INFO)
    _apply_runtime_flags(args)
    args.output_dir = resolve_output_dir(args)
    os.makedirs(args.output_dir, exist_ok=True)
    if args.task_type is None:
        args.task_type = "pretrain"
    cfg, tokenizer = build_config(args)
    # multi-dataset pretraining: concatenate examples across
    # (--data_dirs, --data_names) pairs (`run_pretraining.py` data_dirs)
    names = args.data_names or [args.data_name]
    dirs = args.data_dirs or [args.data_dir]
    examples = []
    for dname, ddir in zip(names, dirs):
        sub_args = argparse.Namespace(**vars(args))
        sub_args.data_dir = ddir
        sub_args.data_dirs = None
        examples.extend(
            load_examples(sub_args, dname, "pretrain", args.train_split))
    args.data_dir = dirs[0]
    dataset = make_dataset(args, cfg, tokenizer, "pretrain", examples)
    from ..models.pretrainer import SequencingPretrainer
    model = SequencingPretrainer(cfg, _vision_cfg(cfg, args))
    from .loop import run_pretraining, evaluate_pretraining
    dev_dataset = None
    if args.evaluate_during_training or args.do_eval:
        # dev-eval mirrors the reference's pretrain evaluate loop
        # (`run_pretraining.py:377-497`): MLM loss + perplexity on dev
        try:
            dev_examples = load_examples(args, names[0], "pretrain",
                                         args.eval_splits[0])
            dev_dataset = make_dataset(args, cfg, tokenizer, "pretrain",
                                       dev_examples, scramble=False)
        except Exception as e:
            logger.warning("no pretrain dev split (%s); eval disabled", e)
    state, steps = run_pretraining(cfg, model, dataset, args,
                                   tokenizer=tokenizer,
                                   dev_dataset=dev_dataset)
    logger.info("pretraining done at step %d", steps)
    if args.do_eval and dev_dataset is not None:
        res = evaluate_pretraining(
            cfg, state, args, dev_dataset,
            use_mlm="no_mlm" not in (cfg.multimodal_pretrain_objectives
                                     or []),
            max_eval_steps=args.max_eval_steps)
        logger.info("pretrain eval: %s", res)
        with open(os.path.join(args.output_dir,
                               "eval_results_pretrain.txt"), "w") as f:
            for k, v in res.items():
                f.write(f"{k} = {v}\n")
    return state


def main_eval(argv=None):
    args = build_parser("eval").parse_args(argv)
    args = resolve_args(args)
    logging.basicConfig(level=logging.INFO)
    _apply_runtime_flags(args)
    args.output_dir = resolve_output_dir(args)
    cfg, tokenizer = build_config(args)
    data_name, task_type = _parse_task(args)
    from ..data.packing import StoryPacker
    from ..data.datasets import SortDataset, data_loader
    from .evaluation import SortEvaluator
    from .checkpoint import restore_checkpoint

    splits = args.data_splits or args.eval_splits
    packer = StoryPacker(tokenizer, args.max_seq_length,
                         args.per_seq_max_length)
    evaluator = SortEvaluator(cfg, packer,
                              micro_batch=args.per_gpu_eval_batch_size * 4)

    models = {}
    role_by_method = {
        "topological": ["pairwise"],
        "head_and_topological": ["head", "pairwise"],
        "head_and_sequential": ["head", "pairwise"],
        "head_and_sequential_abductive": ["head", "pairwise", "abductive"],
        "pure_class": ["pure_class"],
        "pure_decode": ["pure_decode"],
        "heat_map": ["heatmap"],
        "berson": ["berson"],
    }
    roles = role_by_method[args.sort_method]
    base_path = args.model_name_or_path_1 or args.model_name_or_path

    # --eval_all_checkpoints / --iters_to_eval: iterate checkpoints under
    # the given run directory for the primary model
    # (`eval.py --eval_on_every_iter`, `train.py:2168-2186`)
    primary_paths = [base_path]
    if args.eval_all_checkpoints or args.iters_to_eval:
        from .checkpoint import find_checkpoints
        root = base_path if base_path and os.path.isdir(base_path) \
            else args.output_dir
        found = find_checkpoints(
            root, None if args.eval_all_checkpoints else args.iters_to_eval)
        if found:
            primary_paths = found

    all_results = {}
    for primary in primary_paths:
        paths = [primary, args.model_name_or_path_2,
                 args.model_name_or_path_3]
        for role, path in zip(roles, paths):
            models[role] = load_model_for_eval(cfg, args, role, path)
        tag = os.path.basename(str(primary).rstrip("/")) \
            if len(primary_paths) > 1 else None
        res = _eval_splits(args, cfg, tokenizer, data_name, evaluator,
                           models, tag)
        if tag:
            all_results[tag] = res
        else:
            all_results = res
    return all_results


def _eval_splits(args, cfg, tokenizer, data_name, evaluator, models, tag):
    from ..data.datasets import SortDataset, data_loader
    splits = args.data_splits or args.eval_splits
    results = {}
    for split in splits:
        examples = load_examples(args, data_name, "sort", split)
        # _dataset_common so eval images use the SAME pipeline config as
        # training (--vision_image_size / --device_image_preprocess /
        # regional sidecars); a hand-rolled kwargs list here once defaulted
        # to 224px while the model trained at --vision_image_size (caught
        # by the visual-signal quality gate)
        ds = SortDataset(examples, tokenizer, **_dataset_common(args))
        loader = data_loader(ds, args.per_gpu_eval_batch_size)
        res = evaluator.evaluate(
            loader, args.sort_method, models,
            metrics=args.metrics, output_dir=args.output_dir,
            data_split=split if tag is None else f"{split}_{tag}",
            max_batches=args.max_eval_steps, args_ns=args,
            every_n=getattr(args, "eval_on_every_iter", None))
        results[split] = res
        logger.info("%ssplit %s: %s", f"[{tag}] " if tag else "", split, res)
    return results


def load_model_for_eval(cfg, args, role: str, path: Optional[str]):
    """Build a model for an eval role and restore its checkpoint (if path
    points to one); fresh init otherwise (useful for tests)."""
    import copy
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ..models.sequencer import SequencingModel
    from ..models.berson import BersonOrdering
    from .checkpoint import restore_checkpoint
    from .state import make_optimizer, TrainState

    role_cfg = copy.deepcopy(cfg)
    if role == "pairwise" or role == "abductive":
        role_cfg.hierarchical_version = "v0"
        role_cfg.num_labels = 2
    elif role == "head":
        role_cfg.hierarchical_version = "v0"
        role_cfg.num_labels = cfg.max_story_length
    elif role == "pure_class":
        role_cfg.hierarchical_version = "v0"
        import math
        role_cfg.num_labels = math.factorial(cfg.max_story_length)
    elif role == "heatmap":
        if role_cfg.hierarchical_version not in ("v1", "v2", "v3"):
            role_cfg.hierarchical_version = "v1"
    elif role == "pointer":
        if role_cfg.hierarchical_version not in ("p0", "p1"):
            role_cfg.hierarchical_version = "p0"
    elif role == "pure_decode":
        role_cfg.hierarchical_version = "decode"

    vcfg = _vision_cfg(role_cfg, args)
    if role == "berson":
        model = BersonOrdering(role_cfg, vcfg, beam_size=args.beam_size,
                               pairwise_loss_lam=args.pairwise_loss_lam)
    elif role == "pure_decode":
        from ..models.pure_decode import EncoderIndexDecoder
        model = EncoderIndexDecoder(role_cfg)
    else:
        model = SequencingModel(role_cfg, vcfg)
    L = args.max_seq_length
    ids = np.full((1, L), role_cfg.pad_id, np.int32)
    ids[0, 0] = role_cfg.cls_id
    # multimodal checkpoints carry the vision tower + visual embeddings;
    # the init template must create those params too or the orbax restore
    # fails on the structure diff (caught by the visual-signal quality gate)
    mm_init = {}
    if cfg.multimodal and not cfg.multimodal_text_part:
        S = args.vision_image_size
        mm_init["images"] = jnp.zeros((1, 2, 3, S, S), jnp.float32)
        if getattr(args, "include_num_img_regional_features", None):
            mm_init["img_regional_features"] = jnp.zeros(
                (1, 2, args.include_num_img_regional_features,
                 cfg.visual_feat_dim), jnp.float32)
    if role == "berson":
        from ..data.packing import StoryPacker
        from ..data.tokenization import load_tokenizer
        tok = load_tokenizer(args.tokenizer_name or args.model_name_or_path)
        packer = StoryPacker(tok, L, args.per_seq_max_length)
        item = packer.pack_berson_story(
            ["a"] * cfg.max_story_length, list(range(cfg.max_story_length)))
        init_batch = {k: jnp.asarray(v[None]) for k, v in item.items()}
        if "images" in mm_init:
            init_batch["images"] = jnp.zeros(
                (1, cfg.max_story_length, 3,
                 args.vision_image_size, args.vision_image_size),
                jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), init_batch)
    else:
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                               **mm_init)
    if path and os.path.isdir(path):
        tx = make_optimizer()
        variables = dict(variables)
        params = variables.pop("params")
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params), model_state=variables,
                           tx=tx, apply_fn=model.apply)
        state = restore_checkpoint(path, state)
        variables = {"params": state.params, **state.model_state}
    return model, variables
