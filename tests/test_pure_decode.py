"""pure_decode: encoder + 1-layer index-token decoder with beam-5
generate (reference `trainers/train.py:1955-1968`,
`trainers/eval.py:947-1014`). The beam semantics (num_beams=5,
no_repeat_ngram_size=2, no EOS) are verified against an independent
numpy implementation of HF's beam search driving the same network."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sequencing_tpu.models.config import (
    EncoderConfig, MultimodalConfig)
from multimodal_sequencing_tpu.models.pure_decode import EncoderIndexDecoder


def _model(n=4, seed=0):
    cfg = MultimodalConfig(encoder=EncoderConfig.tiny(),
                           max_story_length=n,
                           max_seq_length=32, per_seq_max_length=8)
    model = EncoderIndexDecoder(cfg)
    rng = np.random.RandomState(seed)
    ids = rng.randint(5, 100, (3, 32)).astype(np.int32)
    ids[:, 0] = cfg.cls_id
    mask = np.ones((3, 32), np.int32)
    types = np.zeros((3, 32), np.int32)
    variables = model.init(jax.random.PRNGKey(seed), jnp.asarray(ids),
                           jnp.asarray(mask), jnp.asarray(types))
    return cfg, model, variables, ids, mask, types


def _numpy_hf_beam(model, variables, ids, mask, types, n, v, start,
                   num_beams=5):
    """Independent reimplementation of HF beam search (transformers
    generate: num_beams, no_repeat_ngram_size=2, no EOS, length_penalty
    neutral for equal-length beams) calling the network per candidate."""
    b = ids.shape[0]
    preds = []
    for i in range(b):
        beams = [([start], 0.0)]
        for t in range(n):
            cands = []
            for seq, score in beams:
                dec = np.asarray(seq, np.int32)[None]
                logits = np.asarray(model.apply(
                    variables, jnp.asarray(ids[i:i + 1]),
                    jnp.asarray(mask[i:i + 1]), jnp.asarray(types[i:i + 1]),
                    jnp.asarray(dec),
                    method=EncoderIndexDecoder.prefix_logits))[0]
                logp = logits - np.log(np.exp(
                    logits - logits.max()).sum()) - logits.max()
                # HF no_repeat_ngram_size=2: ban x if (seq[-1], x) occurred
                banned = {seq[j + 1] for j in range(len(seq) - 1)
                          if seq[j] == seq[-1]}
                for tok in range(v):
                    s = -1e9 if tok in banned else logp[tok]
                    cands.append((seq + [tok], score + s))
            cands.sort(key=lambda c: -c[1])
            beams = cands[:num_beams]
        preds.append(beams[0][0][1:])
    return np.asarray(preds, np.int32)


def test_generate_matches_numpy_hf_beam():
    cfg, model, variables, ids, mask, types = _model()
    got = np.asarray(model.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(types),
        method=EncoderIndexDecoder.generate))
    want = _numpy_hf_beam(model, variables, ids, mask, types,
                          n=cfg.max_story_length,
                          v=cfg.max_story_length + 2,
                          start=cfg.max_story_length)
    np.testing.assert_array_equal(got, want)


def test_generate_no_repeated_bigram():
    for seed in range(4):
        cfg, model, variables, ids, mask, types = _model(n=5, seed=seed)
        out = np.asarray(model.apply(
            variables, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(types), method=EncoderIndexDecoder.generate))
        assert out.shape == (3, 5)
        assert out.min() >= 0 and out.max() < cfg.max_story_length + 2
        for row in out:
            seq = [cfg.max_story_length] + list(row)  # with START
            bigrams = list(zip(seq[:-1], seq[1:]))
            assert len(bigrams) == len(set(bigrams)), seq


@pytest.mark.e2e
def test_teacher_forced_loss_learns_identity_order(wikihow_dir, tmp_path):
    # end to end through the CLI: train the encoder-decoder on the sort
    # task, then eval with sort_method pure_decode (faithful generate)
    from multimodal_sequencing_tpu.train.cli import main_train, main_eval

    out = str(tmp_path / "pd_train")
    common = [
        "--model_name_or_path", "simple", "--model_size", "tiny",
        "--data_dir", wikihow_dir, "--data_name", "wikihow",
        "--max_seq_length", "96", "--per_seq_max_length", "12",
        "--per_gpu_train_batch_size", "8", "--per_gpu_eval_batch_size", "4",
        "--learning_rate", "1e-3", "--warmup_steps", "1",
        "--logging_steps", "1", "--seed", "0", "--output_dir", out,
    ]
    state = main_train(common + [
        "--do_train", "--task_name", "wikihow_pure_decode",
        "--num_train_epochs", "2", "--save_steps", "2", "--max_steps", "2",
        "--overwrite_output_dir",
    ])
    assert state is not None
    results = main_eval(common + [
        "--task_name", "wikihow_pure_decode", "--sort_method", "pure_decode",
        "--model_name_or_path_1", out,
        "--eval_splits", "dev", "--max_eval_steps", "1",
        "--iters_to_eval", "2",
    ])
    assert "dev" in results


def test_pointer_substitution_still_works(wikihow_dir, tmp_path):
    # evaluating without a trained encoder-decoder falls back to the
    # documented pointer-head substitution
    from multimodal_sequencing_tpu.train.cli import (
        build_parser, load_model_for_eval)
    from multimodal_sequencing_tpu.train.evaluation import SortEvaluator
    from multimodal_sequencing_tpu.data.packing import StoryPacker
    from multimodal_sequencing_tpu.data.tokenization import (
        SimpleWordTokenizer)

    args = build_parser("eval").parse_args([
        "--model_name_or_path", "simple", "--model_size", "tiny",
        "--max_seq_length", "64", "--per_seq_max_length", "12",
        "--output_dir", str(tmp_path)])
    from multimodal_sequencing_tpu.train.cli import build_config
    cfg, tokenizer = build_config(args)
    model, variables = load_model_for_eval(cfg, args, "pointer", None)
    packer = StoryPacker(tokenizer, 64, 12)
    ev = SortEvaluator(cfg, packer, micro_batch=4)
    stories = [["alpha one", "beta two", "gamma three", "delta four",
                "epsilon five"]]
    preds = ev._decode_batch("pure_decode", {"pointer": (model, variables)},
                             stories, None)
    assert sorted(preds[0]) == [0, 1, 2, 3, 4]
