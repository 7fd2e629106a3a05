"""Story packing: the exact token-stream convention of the reference.

Each step is tokenized separately up to `per_seq_max_length`, pad tokens are
stripped, and the remaining ids are concatenated into ONE sequence of at most
`max_seq_length`, keeping every step's own CLS/SEP. `token_type_ids[t]` is
the step index of token t. `attention_mask = input_ids != pad_id` (the
reference hardcodes RoBERTa's pad id 1, e.g.
`/root/reference/datasets/processors.py:244-270`; we use the tokenizer's
actual pad id, which is identical for RoBERTa). Per-step CLS positions are
later recovered by `input_ids == cls_id` (`models/pointer_module.py:160-164`).

TPU-first deviation from the reference: the reference re-tokenizes every step
on every `__getitem__` (and again inside the BERSON forward). Here tokenized
steps are memoized per unique text so packing is a cheap numpy concat, and
all outputs are fixed-shape numpy arrays ready for device transfer.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


class StoryPacker:
    def __init__(self, tokenizer, max_seq_length: int,
                 per_seq_max_length: int = 32, cache_size: int = 1 << 20):
        self.tokenizer = tokenizer
        self.max_seq_length = max_seq_length
        self.per_seq_max_length = per_seq_max_length
        self.pad_id = tokenizer.pad_token_id
        self.cls_id = tokenizer.cls_token_id
        self.sep_id = tokenizer.sep_token_id
        self.mask_id = getattr(tokenizer, "mask_token_id", None)
        self._cache: Dict[str, np.ndarray] = {}
        self._cache_size = cache_size

    # ----- per-step tokenization (host, memoized) ----------------------------

    def encode_step(self, text: str) -> np.ndarray:
        """Unpadded token ids for one step, truncated to per_seq_max_length."""
        ids = self._cache.get(text)
        if ids is None:
            enc = self.tokenizer(
                text, max_length=self.per_seq_max_length,
                padding="max_length", truncation=True)
            arr = np.asarray(enc["input_ids"], dtype=np.int32)
            ids = arr[arr != self.pad_id]
            if len(self._cache) < self._cache_size:
                self._cache[text] = ids
        return ids

    def encode_steps(self, texts: Sequence[str]) -> List[np.ndarray]:
        return [self.encode_step(t) for t in texts]

    # ----- packing ------------------------------------------------------------

    def pack(self, step_ids: Sequence[np.ndarray],
             max_seq_length: Optional[int] = None
             ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Concatenate per-step id arrays into (input_ids, attention_mask,
        token_type_ids) of fixed length (`processors.py:251-270`). Uses the
        native packer (`native/packer.cc`) when built."""
        L = max_seq_length or self.max_seq_length
        from . import _native
        nat = _native.pack_story(step_ids, L, self.pad_id) if step_ids \
            else None
        if nat is not None:
            input_ids, token_type_ids = nat
        else:
            input_ids = np.full(L, self.pad_id, dtype=np.int32)
            token_type_ids = np.zeros(L, dtype=np.int32)
            if step_ids:
                cat = np.concatenate(step_ids)
                types = np.concatenate([
                    np.full(len(s), i, dtype=np.int32)
                    for i, s in enumerate(step_ids)])
                n = min(L, len(cat))
                input_ids[:n] = cat[:n]
                token_type_ids[:n] = types[:n]
        attention_mask = (input_ids != self.pad_id).astype(np.int32)
        return input_ids, attention_mask, token_type_ids

    def pack_story(self, texts: Sequence[str],
                   max_seq_length: Optional[int] = None):
        return self.pack(self.encode_steps(texts), max_seq_length)

    # ----- pair packing (for all-pairs decode / BERSON) ----------------------

    def pack_pair(self, text_a: str, text_b: str,
                  max_seq_length: Optional[int] = None):
        """Two-step pack used for pairwise training and N^2 decode queries."""
        return self.pack([self.encode_step(text_a), self.encode_step(text_b)],
                         max_seq_length)

    def pack_berson_story(self, texts: Sequence[str],
                          order_label: Sequence[int],
                          max_story_length: Optional[int] = None,
                          roberta_types: bool = True):
        """BERSON pair expansion for one story
        (`/root/reference/models/berson/process_inputs_for_berson.py:113-261`):
        pairs_list = all (i<j) combinations then their reverses; each pair is
        [steps_i ; steps_j] (each step keeps its own CLS/SEP), sep_positions
        = [len_i - 1, len_pair - 1], pairwise_label = 1 iff i's true time
        precedes j's. Fixed shapes: P = N*(N-1) pairs, pair length
        2*per_seq_max_length.

        Stories shorter than max_story_length keep the SAME static pair
        layout: pairs touching a dead step are all-pad rows with label 0
        (masked downstream via mask_cls), unlike the reference's
        variable-then-padded layout (`preprocess_batch.py:59-69`) — the
        model derives pair validity from the static list + mask_cls.
        ground_truth pads with the dead step indices so gathers stay
        in-bounds and position masks fall out of mask_cls."""
        m = len(texts)
        n = max_story_length or m
        assert m <= n, "berson packing: story longer than max_story_length"
        step_ids = self.encode_steps(texts)
        L = 2 * self.per_seq_max_length
        order_label = list(order_label)

        from . import _native
        nat = (_native.pack_berson(step_ids, order_label, L, self.pad_id)
               if roberta_types and m == n else None)
        if nat is not None:
            input_ids, sep_positions, pairwise_labels, pairs_arr = nat
            token_type_ids = np.zeros((len(pairs_arr), L), dtype=np.int32)
            attention_mask = (input_ids != self.pad_id).astype(np.int32)
            return {
                "input_ids": input_ids, "attention_mask": attention_mask,
                "token_type_ids": token_type_ids,
                "sep_positions": sep_positions,
                "pairs_list": pairs_arr,
                "pairwise_labels": pairwise_labels,
                "ground_truth": np.asarray(order_label, dtype=np.int32),
                "mask_cls": np.ones((n,), dtype=np.int32),
                "passage_length": np.int32(n),
                "pairs_num": np.int32(len(pairs_arr)),
            }

        pairs = ([[i, j] for i in range(n) for j in range(i + 1, n)]
                 + [[j, i] for i in range(n) for j in range(i + 1, n)])
        pos = {s: order_label.index(s) for s in range(m)}

        P = len(pairs)
        input_ids = np.full((P, L), self.pad_id, dtype=np.int32)
        token_type_ids = np.zeros((P, L), dtype=np.int32)
        sep_positions = np.zeros((P, 2), dtype=np.int32)
        pairwise_labels = np.zeros((P,), dtype=np.int32)
        true_pairs = 0
        for p, (i, j) in enumerate(pairs):
            if i >= m or j >= m:
                sep_positions[p] = [0, 1]  # harmless span for dead pairs
                continue
            true_pairs += 1
            a, b_ = step_ids[i], step_ids[j]
            cat = np.concatenate([a, b_])[:L]
            input_ids[p, :len(cat)] = cat
            sep_positions[p] = [len(a) - 1, min(len(a) + len(b_), L) - 1]
            if not roberta_types:
                token_type_ids[p, len(a):len(cat)] = 1
            pairwise_labels[p] = int(pos[i] < pos[j])
        attention_mask = (input_ids != self.pad_id).astype(np.int32)
        mask_cls = np.zeros((n,), dtype=np.int32)
        mask_cls[:m] = 1
        return {
            "input_ids": input_ids, "attention_mask": attention_mask,
            "token_type_ids": token_type_ids,
            "sep_positions": sep_positions,
            "pairs_list": np.asarray(pairs, dtype=np.int32),
            "pairwise_labels": pairwise_labels,
            "ground_truth": np.asarray(
                order_label + list(range(m, n)), dtype=np.int32),
            "mask_cls": mask_cls,
            "passage_length": np.int32(m),
            "pairs_num": np.int32(true_pairs),
        }

    def pack_all_pairs(self, texts: Sequence[str],
                       max_pair_len: Optional[int] = None):
        """All N*(N-1) ordered pairs of a story as one (P, L) batch, plus the
        (i, j) index list in generation order (i-major, skipping i==j) —
        mirrors the BERSON pair expansion
        (`models/berson/process_inputs_for_berson.py:13-79`)."""
        n = len(texts)
        step_ids = self.encode_steps(texts)
        L = max_pair_len or self.max_seq_length
        from . import _native
        nat = _native.pack_all_pairs(step_ids, L, self.pad_id)
        if nat is not None:
            input_ids, types, idx = nat
            attn = (input_ids != self.pad_id).astype(np.int32)
            return input_ids, attn, types, idx
        pairs, idx = [], []
        for i in range(n):
            for j in range(n):
                if i == j:
                    continue
                pairs.append(self.pack([step_ids[i], step_ids[j]], L))
                idx.append((i, j))
        input_ids = np.stack([p[0] for p in pairs])
        attn = np.stack([p[1] for p in pairs])
        types = np.stack([p[2] for p in pairs])
        return input_ids, attn, types, np.asarray(idx, dtype=np.int32)
