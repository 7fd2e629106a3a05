"""Sort-decode evaluation harness.

TPU-native rebuild of `/root/reference/trainers/eval.py`: the decode-method
dispatch (`model_wise_evaluate:1100-1165`) and strategies
(`topological_inference:425`, `head_and_topological_inference:532`,
`head_and_sequential_inference:639` + `select_next:722` +
`abductive_score:794`, `pure_class_inference:883`, `heat_map_inference:1016`)
plus the BERSON evaluator (`models/berson/eval.py:39-368`).

Redesign: the reference runs O(N^2) forwards per story with per-pair host
tokenization (its biggest inefficiency, SURVEY §3.3). Here each batch of
stories packs ALL ordered pairs once (host, memoized tokenization) and runs
ONE jitted forward; decode itself is host-side over the resulting score
matrices using the parity decoders (`utils/`), with on-device decode
(`ops/order_decode`) available as the fast path.

Score conventions preserved: edge direction by argmax over the two logits
(`eval.py:521-524`); greedy next-step scored by the raw 'ordered' logit
(`eval.py:856-881`: `binary_preds[1]`); abductive rerank adds
0.1 * ordered-logit of (prev2, cand, prev1) triples (`eval.py:794-853,988`).
"""

from __future__ import annotations

import csv
import logging
import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.metrics import compute_metrics, METRICS
from ..utils.topo import Graph
from ..utils.heatmap import heatmap2order
from ..utils.permutation import permutation_unrank

logger = logging.getLogger(__name__)

SORT_METHODS = [
    "topological", "head_and_topological", "head_and_sequential",
    "head_and_sequential_abductive", "pure_class", "pure_decode",
    "heat_map", "berson",
]


def _logsumexp(x, axis=-1, keepdims=False):
    m = np.max(x, axis=axis, keepdims=True)
    out = m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))
    return out if keepdims else np.squeeze(out, axis)


def _batched_apply(apply_fn, variables, feed: Dict[str, np.ndarray],
                   micro_batch: int = 64):
    """Run a (possibly huge) flat batch through the model in fixed-size
    micro-batches (pad the tail) so only one jit signature compiles."""
    n = feed["input_ids"].shape[0]
    outs, sizes = [], []
    for start in range(0, n, micro_batch):
        chunk = {k: v[start:start + micro_batch] for k, v in feed.items()}
        m = chunk["input_ids"].shape[0]
        if m < micro_batch:
            chunk = {k: np.concatenate(
                [v, np.repeat(v[-1:], micro_batch - m, axis=0)])
                for k, v in chunk.items()}
        # enqueue async; fetch once at the end (a device_get per chunk
        # costs a full tunnel round trip each)
        outs.append(apply_fn(variables, chunk))
        sizes.append(m)
    outs = jax.device_get(outs)
    return np.concatenate([o[:m] for o, m in zip(outs, sizes)], axis=0)


class SortEvaluator:
    """Evaluate ordering models over a SortDataset-style loader."""

    def __init__(self, cfg, packer, mesh=None, micro_batch: int = 64):
        self.cfg = cfg
        self.packer = packer
        self.mesh = mesh
        self.micro_batch = micro_batch
        self._jit_cache: Dict[str, object] = {}

    # ----- batched model drivers --------------------------------------------

    def _logits_fn(self, model, variables, images_per_seq: int,
                   with_regional: bool = False):
        key = f"v0:{id(model)}:{images_per_seq}:{with_regional}"
        if key not in self._jit_cache:
            def fn(variables, chunk):
                out = model.apply(
                    variables, chunk["input_ids"], chunk["attention_mask"],
                    chunk["token_type_ids"],
                    images=chunk.get("images"),
                    img_regional_features=chunk.get("img_regional_features"),
                    deterministic=True)
                return out["logits"]
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def pair_logit_matrix(self, model, variables, stories: List[List[str]],
                          images: Optional[np.ndarray] = None,
                          regional: Optional[np.ndarray] = None) -> np.ndarray:
        """(B, N, N) raw 'ordered' class logits for every ordered pair; the
        diagonal is 0. Also returns the full 2-class logits via the last
        axis when needed. `regional` is the (B, N, R, C) ROI sidecar batch
        for `--include_num_img_regional_features` checkpoints; pairs gather
        the matching two steps like `images` does."""
        n = self.cfg.max_story_length
        # a pair needs at most 2*per_seq_max_length tokens; padding to the
        # full story length (like the reference does) is dead compute
        pair_len = min(self.cfg.max_seq_length,
                       -(-2 * self.cfg.per_seq_max_length // 64) * 64)
        packs, img_feed, reg_feed = [], [], []
        for b, texts in enumerate(stories):
            ii, am, tt, idx = self.packer.pack_all_pairs(
                texts, pair_len)
            packs.append((ii, am, tt))
            if images is not None:
                img_feed.append(images[b][idx])  # (P, 2, C, H, W)
            if regional is not None:
                reg_feed.append(regional[b][idx])  # (P, 2, R, C)
        P = packs[0][0].shape[0]
        feed = {
            "input_ids": np.concatenate([p[0] for p in packs]),
            "attention_mask": np.concatenate([p[1] for p in packs]),
            "token_type_ids": np.concatenate([p[2] for p in packs]),
        }
        if images is not None:
            feed["images"] = np.concatenate(img_feed)
        if regional is not None:
            feed["img_regional_features"] = np.concatenate(reg_feed)
        fn = self._logits_fn(model, variables,
                             2 if images is not None else 0,
                             with_regional=regional is not None)
        logits = _batched_apply(fn, variables, feed, self.micro_batch)
        logits = logits.reshape(len(stories), P, -1)
        pair_idx = self.packer.pack_all_pairs(stories[0], pair_len)[3]
        mat = np.zeros((len(stories), n, n), np.float32)
        cls2 = np.zeros((len(stories), n, n, 2), np.float32)
        for p, (i, j) in enumerate(pair_idx):
            mat[:, i, j] = logits[:, p, 1]
            cls2[:, i, j] = logits[:, p, :2]
        return mat, cls2

    def story_logits(self, model, variables, stories: List[List[str]],
                     images: Optional[np.ndarray] = None,
                     want: str = "logits",
                     regional: Optional[np.ndarray] = None) -> np.ndarray:
        """Whole-story forward (head / pure_class / heatmap models)."""
        packs = [self.packer.pack_story(t, self.cfg.max_seq_length)
                 for t in stories]
        feed = {
            "input_ids": np.stack([p[0] for p in packs]),
            "attention_mask": np.stack([p[1] for p in packs]),
            "token_type_ids": np.stack([p[2] for p in packs]),
        }
        if images is not None:
            feed["images"] = images
        if regional is not None:
            feed["img_regional_features"] = regional
        key = (f"story:{id(model)}:{want}:{images is not None}:"
               f"{regional is not None}")
        if key not in self._jit_cache:
            def fn(variables, chunk):
                out = model.apply(
                    variables, chunk["input_ids"], chunk["attention_mask"],
                    chunk["token_type_ids"], images=chunk.get("images"),
                    img_regional_features=chunk.get("img_regional_features"),
                    deterministic=True)
                return out[want]
            self._jit_cache[key] = jax.jit(fn)
        return _batched_apply(self._jit_cache[key], variables, feed,
                              self.micro_batch)

    def story_generate(self, model, variables,
                       stories: List[List[str]]) -> List[List[int]]:
        """Beam-5 index-token generate over packed whole stories
        (pure_decode; `eval.py:947-1014`)."""
        packs = [self.packer.pack_story(t, self.cfg.max_seq_length)
                 for t in stories]
        feed = {
            "input_ids": np.stack([p[0] for p in packs]),
            "attention_mask": np.stack([p[1] for p in packs]),
            "token_type_ids": np.stack([p[2] for p in packs]),
        }
        key = f"generate:{id(model)}"
        if key not in self._jit_cache:
            def fn(variables, chunk):
                return model.apply(
                    variables, chunk["input_ids"], chunk["attention_mask"],
                    chunk["token_type_ids"], method=type(model).generate)
            self._jit_cache[key] = jax.jit(fn)
        out = _batched_apply(self._jit_cache[key], variables, feed,
                             self.micro_batch)
        return [[int(x) for x in row] for row in np.asarray(out)]

    def abductive_logit_cube(self, model, variables,
                             stories: List[List[str]]) -> np.ndarray:
        """(B, N, N, N) ordered-logits for all (h1, h2, h3) triples of
        distinct steps (used by the abductive reranker)."""
        n = self.cfg.max_story_length
        triples = [(a, b, c) for a in range(n) for b in range(n)
                   for c in range(n) if len({a, b, c}) == 3]
        packs = []
        for texts in stories:
            ids = self.packer.encode_steps(texts)
            for (a, b, c) in triples:
                packs.append(self.packer.pack(
                    [ids[a], ids[b], ids[c]], self.cfg.max_seq_length))
        feed = {
            "input_ids": np.stack([p[0] for p in packs]),
            "attention_mask": np.stack([p[1] for p in packs]),
            "token_type_ids": np.stack([p[2] for p in packs]),
        }
        fn = self._logits_fn(model, variables, 0)
        logits = _batched_apply(fn, variables, feed, self.micro_batch)
        cube = np.zeros((len(stories), n, n, n), np.float32)
        logits = logits.reshape(len(stories), len(triples), -1)
        for t, (a, b, c) in enumerate(triples):
            cube[:, a, b, c] = logits[:, t, 1]
        return cube

    # ----- decode strategies -------------------------------------------------

    @staticmethod
    def decode_topological(pair_logits_2c: np.ndarray,
                           head_idx: Optional[np.ndarray] = None
                           ) -> List[List[int]]:
        """argmax over i<j pair logits -> directed edge -> DFS topo sort
        (`eval.py:425-529,532-636`)."""
        b, n = pair_logits_2c.shape[:2]
        preds = []
        for s in range(b):
            g = Graph(n)
            for i in range(n):
                for j in range(i + 1, n):
                    if np.argmax(pair_logits_2c[s, i, j]) == 1:
                        g.addEdge(i, j)
                    else:
                        g.addEdge(j, i)
            preds.append(g.topologicalSort(
                assert_head=None if head_idx is None else int(head_idx[s])))
        return preds

    @staticmethod
    def decode_sequential(pair_logits: np.ndarray, head_idx: np.ndarray,
                          abd_cube: Optional[np.ndarray] = None
                          ) -> List[List[int]]:
        """Greedy next-step selection by the raw ordered logit, optional
        abductive rerank +0.1*logit(prev2, cand, prev1)
        (`eval.py:639-744,983-990`)."""
        b, n = pair_logits.shape[:2]
        preds = []
        for s in range(b):
            pred = [int(head_idx[s])]
            left = [i for i in range(n) if i != pred[0]]
            while left:
                prev = pred[-1]
                scores = []
                for cand in left:
                    sc = pair_logits[s, prev, cand]
                    if abd_cube is not None and len(pred) >= 2:
                        sc = sc + 0.1 * abd_cube[s, pred[-2], cand, prev]
                    scores.append(sc)
                nxt = left[int(np.argmax(scores))]
                pred.append(nxt)
                left.remove(nxt)
            preds.append(pred)
        return preds

    # exhaustive n! device decode is exact and cheap up to this story length
    # (7! = 5040 candidate orders per story, still one tiny fused program)
    DEVICE_DECODE_MAX_N = 7

    def decode_heatmap(self, heatmaps: np.ndarray) -> List[List[int]]:
        cfg = self.cfg
        method = cfg.heatmap_decode_method
        n = int(np.asarray(heatmaps).shape[-1])
        if getattr(cfg, "device_decode", False):
            from ..ops.order_decode import (
                exhaustive_naive_decode, topological_decode_batch)
            # mirror the host oracle's range assertions (heatmap.py:68,
            # 152-157): the device kernels would turn an out-of-range
            # heatmap into NaN scores and decode garbage silently
            arr = np.asarray(heatmaps)
            if "naive" in method and "v3" not in method:
                assert arr.min() >= 0, \
                    "heat map cannot have negative values."
            if "v2" in method or "v3" in method:
                assert np.abs(arr).max() <= 1.0, \
                    "prob is > 1, sigmoid applied?"
            hm = jnp.asarray(np.asarray(heatmaps, np.float32))
            if ("naive" in method and method != "super_naive"
                    and n <= self.DEVICE_DECODE_MAX_N):
                out = exhaustive_naive_decode(hm, n, method)
            elif method == "topological":
                out = topological_decode_batch(hm, n)
            else:
                # n > n!-budget for the naive family, or super_naive/mst:
                # fall back to the host decoder — greedy_order_decode
                # chains raw values and would silently change the
                # v2/v3/_sum scoring semantics
                out = None
            if out is not None:
                return [[int(x) for x in row] for row in np.asarray(out)]
        return [heatmap2order(
            hm.astype(np.float64),
            decode_method=method,
            beam_size=cfg.heatmap_decode_beam_size)
            for hm in heatmaps]

    # ----- full evaluation ---------------------------------------------------

    def evaluate(self, loader, sort_method: str, models: Dict,
                 metrics: Optional[Sequence[str]] = None,
                 output_dir: Optional[str] = None,
                 data_split: str = "test", max_batches: Optional[int] = None,
                 args_ns=None,
                 every_n: Optional[int] = None) -> Dict[str, float]:
        """Run decode + metrics over a SortDataset loader.

        `models` maps role -> (model, variables): roles `pairwise`, `head`,
        `heatmap`, `pure_class`, `abductive`, `berson` depending on method.
        `every_n` subsamples the loader to every Nth batch — the
        `--eval_on_every_iter` semantics of `eval.py:1250-1253`.
        """
        metrics = list(metrics or METRICS)
        all_preds, all_labels, all_guids = [], [], []
        decoded = 0
        for bi, batch in enumerate(loader):
            if every_n is not None and bi % every_n != 0:
                continue
            if max_batches is not None and decoded >= max_batches:
                break
            decoded += 1
            valid = batch.get("valid")
            stories = [t for k, t in enumerate(batch["texts"])
                       if valid is None or valid[k]]
            labels = [l for k, l in enumerate(batch["labels"])
                      if valid is None or valid[k]]
            guids = [g for k, g in enumerate(batch.get(
                "guid", [""] * len(stories))) if valid is None or valid[k]]
            sel = np.asarray(valid) if valid is not None else slice(None)
            images = batch.get("images")
            if images is not None:
                images = np.asarray(images)[sel]
            regional = batch.get("img_regional_features")
            if regional is not None:
                regional = np.asarray(regional)[sel]
            preds = self._decode_batch(sort_method, models, stories, images,
                                       regional)
            all_preds.extend(preds)
            all_labels.extend([np.asarray(l) for l in labels])
            all_guids.extend(guids)

        res = {}
        for m in metrics:
            try:
                res[m] = compute_metrics(args_ns or self.cfg, m, all_preds,
                                         all_labels)
            except ValueError:
                # ms/wms require permutation predictions; generative decode
                # (pure_decode) can emit non-permutations. The reference
                # sidesteps this by defaulting --metrics to partial_match
                # only (`eval.py:1430-1431`); report nan instead of dying.
                res[m] = float("nan")
        if output_dir:
            self._write_outputs(output_dir, data_split, all_guids, all_preds,
                                all_labels, res)
        return res

    def _decode_batch(self, sort_method, models, stories, images,
                      regional=None):
        if sort_method == "berson":
            model, variables = models["berson"]
            items = []
            for k, texts in enumerate(stories):
                # identity label; beam search ignores it
                items.append(self.packer.pack_berson_story(
                    texts, list(range(len(texts))),
                    max_story_length=self.cfg.max_story_length))
            batch = {key: jnp.asarray(np.stack([it[key] for it in items]))
                     for key in items[0]}
            if images is not None:
                batch["images"] = jnp.asarray(images)
            from ..models.berson import BersonOrdering
            pred = model.apply(variables, batch,
                               method=BersonOrdering.beam_search)
            # strip the -1 tail padding of stories shorter than
            # max_story_length (beam_search pads to the static shape)
            return [[int(x) for x in p[:len(texts)]]
                    for p, texts in zip(np.asarray(pred), stories)]

        if sort_method == "heat_map":
            model, variables = models["heatmap"]
            hms = self.story_logits(model, variables, stories, images,
                                    want="heatmap", regional=regional)
            return self.decode_heatmap(hms)

        if sort_method == "pure_class":
            model, variables = models["pure_class"]
            logits = self.story_logits(model, variables, stories, images,
                                       regional=regional)
            n = self.cfg.max_story_length
            return [permutation_unrank(int(np.argmax(l)), n) for l in logits]

        if sort_method == "pure_decode":
            if "pure_decode" in models:
                # faithful path: encoder-decoder beam-5 index-token
                # generate, num_beams=5 / no_repeat_ngram_size=2
                # (`eval.py:947-1014`; models/pure_decode.py)
                model, variables = models["pure_decode"]
                return self.story_generate(model, variables, stories)
            # substitution when evaluating a p0/p1 pointer checkpoint: the
            # pointer head plays the decoder's role, decoded with an exact
            # permutation argmax (n! <= 120 beats beam-5)
            model, variables = models["pointer"]
            logits = self.story_logits(model, variables, stories, images,
                                       want="pointer_logits",
                                       regional=regional)
            n = self.cfg.max_story_length
            from itertools import permutations
            logp = logits - _logsumexp(logits, axis=-1, keepdims=True)
            preds = []
            for b in range(len(stories)):
                best, best_s = None, -np.inf
                for perm in permutations(range(n)):
                    s = sum(logp[b, t, perm[t]] for t in range(n))
                    if s > best_s:
                        best, best_s = list(perm), s
                preds.append(best)
            return preds

        head_idx = None
        if sort_method.startswith("head_and"):
            hmodel, hvars = models["head"]
            hlogits = self.story_logits(hmodel, hvars, stories, images,
                                        regional=regional)
            head_idx = np.argmax(hlogits, axis=-1)

        pmodel, pvars = models["pairwise"]
        pair_logits, pair_2c = self.pair_logit_matrix(
            pmodel, pvars, stories, images, regional=regional)

        if sort_method == "topological":
            if getattr(self.cfg, "device_decode", False):
                # device Kahn over the argmax tournament: identical to the
                # host DFS topo sort whenever the pairwise argmax graph is
                # acyclic (then the Hamiltonian order is unique); cycles
                # fall back to lowest-index emission instead of the DFS
                # stack order, so the host decoder stays the parity oracle
                from ..ops.order_decode import topological_decode_batch
                n = pair_2c.shape[1]
                e = pair_2c - _logsumexp(pair_2c, axis=-1, keepdims=True)
                prob_ordered = np.exp(e[..., 1])
                out = topological_decode_batch(
                    jnp.asarray(prob_ordered, jnp.float32), n, thres=0.5)
                return [[int(x) for x in row] for row in np.asarray(out)]
            return self.decode_topological(pair_2c)
        if sort_method == "head_and_topological":
            return self.decode_topological(pair_2c, head_idx)
        if sort_method in ("head_and_sequential",
                           "head_and_sequential_abductive"):
            abd = None
            if (sort_method.endswith("abductive")
                    and "abductive" in models):
                amodel, avars = models["abductive"]
                abd = self.abductive_logit_cube(amodel, avars, stories)
            return self.decode_sequential(pair_logits, head_idx, abd)
        raise NotImplementedError(f"sort_method {sort_method}")

    # ----- reporting ---------------------------------------------------------

    def _write_outputs(self, output_dir, split, guids, preds, labels, res):
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "output_order.txt"), "w") as f:
            for p in preds:
                f.write(" ".join(str(x) for x in p) + "\n")
        with open(os.path.join(output_dir, "all_predictions.csv"), "w",
                  newline="") as f:
            w = csv.writer(f)
            w.writerow(["guid", "prediction", "label"])
            for g, p, l in zip(guids, preds, labels):
                w.writerow([g, list(p), np.asarray(l).tolist()])
        with open(os.path.join(
                output_dir, f"eval_results_split_{split}.txt"), "w") as f:
            for k, v in sorted(res.items()):
                f.write(f"{k} = {v}\n")
        logger.info("***** Paper Results *****")
        logger.info(" %s", paper_result_line(res)[0])
        logger.info(" %s", paper_result_line(res)[1])


def paper_result_line(res: Dict[str, float]):
    """The paper-format summary row (`eval.py:1281-1293`)."""
    headers = "& PM    & EM    & Lseq & Lstr & tau  & Dist."
    content = ("& {:03.2f} & {:03.2f} & {:03.2f} & {:03.2f} & {:03.2f} "
               "& {:03.2f}").format(
        res.get("partial_match", 0) * 100,
        res.get("exact_match", 0) * 100,
        res.get("lcs", 0), res.get("lcs_substr", 0),
        res.get("tau", 0), res.get("distance_based", 0))
    return headers, content
