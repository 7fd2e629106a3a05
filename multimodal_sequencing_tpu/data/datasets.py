"""Dataset variants: tokenize/pack/scramble/label.

Behavioral reimplementations of the seven torch Dataset classes in
`/root/reference/datasets/processors.py` (PairwiseDataset:161,
HeadPredDataset:311, AbductiveDataset:443, PureClassDataset:563,
SortDatasetV1:750, PretrainDataset:873, RetrievalDataset:1068), torch-free.

TPU-first design decisions:
  * Fixed shapes everywhere — batches collate into dense numpy dicts ready
    for `jax.device_put`, with a `valid` mask so the final partial batch can
    be padded instead of dropped (no recompilation from shape churn).
  * Deterministic scrambling — the reference scrambles with the *global*
    numpy RNG (`processors.py:653-658`), which is irreproducible across
    loader workers. Here every example draws its permutation from a
    counter-based Philox key (seed, epoch, index): same distribution,
    bitwise reproducible, order-independent.
  * Tokenization is memoized per unique step text in `StoryPacker` instead
    of re-run on every access.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

from .packing import StoryPacker
from .images import load_image_stack, load_maskrcnn_sidecar
from ..utils.permutation import build_permutation_label_maps


def _example_rng(seed: Optional[int], epoch: int, idx: int
                 ) -> np.random.Generator:
    return np.random.Generator(
        np.random.Philox(key=np.uint64(((seed or 0) << 32)
                                       ^ (epoch << 20) ^ idx)))


class _StoryDatasetBase:
    """Shared story handling: length clamping, scrambling, packing, images."""

    def __init__(self, examples, tokenizer, max_length=None,
                 per_seq_max_length=32, max_story_length=5,
                 min_story_length=5, scramble=True, seed=None,
                 multimodal=False, image_size=(224, 224),
                 uint8_images=False, image_transform="imagenet",
                 num_img_regional_features=None, args=None):
        self.args = args
        self.examples = examples
        self.scramble = scramble
        self.seed = seed
        self.multimodal = multimodal
        self.image_size = image_size
        # uint8 HWC images + on-device normalize (ops/preprocess) instead of
        # float CHW on host: 4x less H2D traffic
        self.uint8_images = uint8_images
        # "imagenet" (default RGB/[0,1]/mean-std) or "detectron2" (Caffe:
        # BGR 0-255 minus PIXEL_MEAN, 256px INTER_LINEAR — the pipeline
        # the reference's detectron2_* vision models were trained on,
        # `multimodal_utils.py:170-192`)
        self.image_transform = image_transform
        self.num_img_regional_features = num_img_regional_features

        min_story_length = max(1, min_story_length)
        max_story_length = max(1, max_story_length)
        self.min_story_length = min(min_story_length, max_story_length)
        self.max_story_length = max_story_length

        self.packer = StoryPacker(tokenizer, max_length or 512,
                                  per_seq_max_length)
        self.pad_id = self.packer.pad_id
        self.cls_id = self.packer.cls_id

    def __len__(self):
        return len(self.examples)

    def _story(self, idx: int, epoch: int = 0):
        """Return (texts, img_paths, idx_seq) after clamp + scramble."""
        ex = self.examples[idx]
        texts = list(ex.text_seq[:self.max_story_length])
        n = len(texts)
        idx_seq = np.arange(n)
        if self.scramble:
            rng = _example_rng(self.seed, epoch, idx)
            rng.shuffle(idx_seq)
            texts = [texts[idx_seq[i]] for i in range(n)]
        img_paths = None
        if self.multimodal and ex.img_path_seq is not None:
            img_paths = [ex.img_path_seq[idx_seq[i]] for i in range(n)]
        return texts, img_paths, idx_seq

    def _pack(self, texts):
        ii, am, tt = self.packer.pack_story(texts)
        return {"input_ids": ii, "attention_mask": am, "token_type_ids": tt}

    def _load_images(self, paths):
        """Image stack in the configured pipeline layout: uint8 HWC for the
        on-device normalize tail (default; 4x less H2D traffic) or float32
        CHW host preprocessing (reference-parity numerics)."""
        if self.image_transform == "detectron2":
            if self.uint8_images:
                from .images import load_image_stack_uint8_bgr
                return load_image_stack_uint8_bgr(paths, self.image_size)
            from .images import load_image_stack_detectron2
            return load_image_stack_detectron2(paths, self.image_size)
        if self.uint8_images:
            from .images import load_image_stack_uint8
            return load_image_stack_uint8(paths, self.image_size)
        return load_image_stack(paths, self.image_size)

    def _images(self, img_paths, n_steps):
        """(max_story_length, ...) zero-padded image stack + sidecars."""
        out: Dict[str, Any] = {}
        if not self.multimodal:
            return out
        paths = list(img_paths or [None] * n_steps)
        paths += [None] * (self.max_story_length - len(paths))
        out["images"] = self._load_images(paths)
        if self.num_img_regional_features:
            feats = []
            ok = True
            for p in paths:
                f = (load_maskrcnn_sidecar(p, self.num_img_regional_features)
                     if p else None)
                if f is None:
                    ok = False
                    break
                feats.append(f)
            out["img_regional_features"] = (
                np.stack(feats) if ok and feats
                else np.zeros(1, dtype=np.float32))
        return out


class PairwiseDataset(_StoryDatasetBase):
    """Binary ordered/unordered pair classification
    (`processors.py:161-308`)."""

    def __init__(self, examples, tokenizer, processor=None,
                 output_mode="classification", **kw):
        kw.setdefault("scramble", False)
        super().__init__(examples, tokenizer, **kw)
        label_list = (processor.get_labels() if processor is not None
                      else ["unordered", "ordered"])
        self.label_map = {l: i for i, l in enumerate(label_list)}
        self.output_mode = output_mode

    def __getitem__(self, idx, epoch: int = 0):
        ex = self.examples[idx]
        item = self._pack([ex.text_a, ex.text_b])
        if self.output_mode == "classification":
            item["labels"] = np.int32(self.label_map[ex.label])
        else:
            item["labels"] = np.float32(ex.label)
        item["guid"] = ex.guid
        if self.multimodal:
            item.update(self._images_pair([ex.img_path_a, ex.img_path_b]))
        return item

    def _images_pair(self, paths):
        out = {"images": self._load_images(paths)}
        if self.num_img_regional_features:
            feats = [load_maskrcnn_sidecar(p, self.num_img_regional_features)
                     if p else None for p in paths]
            out["img_regional_features"] = (
                np.stack(feats) if all(f is not None for f in feats)
                else np.zeros(1, dtype=np.float32))
        return out


class HeadPredDataset(_StoryDatasetBase):
    """Predict which scrambled position holds the true first step
    (`processors.py:311-440`)."""

    def __getitem__(self, idx, epoch: int = 0):
        texts, img_paths, idx_seq = self._story(idx, epoch)
        item = self._pack(texts)
        item["labels"] = np.int32(np.argwhere(idx_seq == 0)[0][0])
        item.update(self._images(img_paths, len(texts)))
        return item


class AbductiveDataset(_StoryDatasetBase):
    """Binary (h1, h2, h3) plausibility (`processors.py:443-560`)."""

    def __init__(self, examples, tokenizer, pred_method="binary", **kw):
        kw.setdefault("scramble", False)
        super().__init__(examples, tokenizer, **kw)
        self.pred_method = pred_method
        self.label_map = {"unordered": 0, "ordered": 1}

    def __getitem__(self, idx, epoch: int = 0):
        ex = self.examples[idx]
        item = self._pack([ex.text_h1, ex.text_h2, ex.text_h3])
        item["labels"] = np.int32(self.label_map[ex.label])
        item["guid"] = ex.guid
        if self.multimodal:
            paths = [ex.img_path_h1, ex.img_path_h2, ex.img_path_h3]
            item["images"] = self._load_images(paths)
        return item


class PureClassDataset(_StoryDatasetBase):
    """Permutation-id classification over all n! orders; in decode mode the
    label is the argsort order (or multiref list)
    (`processors.py:563-747`)."""

    def __init__(self, examples, tokenizer, decode=False, **kw):
        super().__init__(examples, tokenizer, **kw)
        self.decode = decode
        if examples:
            self.max_story_length = min(self.max_story_length,
                                        len(examples[0].text_seq))
        self.label2id, self.id2label = build_permutation_label_maps(
            self.max_story_length)

    def __getitem__(self, idx, epoch: int = 0):
        texts, img_paths, idx_seq = self._story(idx, epoch)
        item = self._pack(texts)
        ex = self.examples[idx]
        if self.decode:
            item["labels"] = _decode_labels(ex, idx_seq,
                                            self.max_story_length)
        else:
            key = "_".join(str(x) for x in idx_seq)
            item["labels"] = np.int32(self.label2id[key])
        item["guid"] = ex.guid
        item.update(self._images(img_paths, len(texts)))
        return item


class SortDataset(_StoryDatasetBase):
    """Decode-time dataset: raw step texts + order labels + images
    (SortDatasetV1, `processors.py:750-870`)."""

    def __getitem__(self, idx, epoch: int = 0):
        texts, img_paths, idx_seq = self._story(idx, epoch)
        ex = self.examples[idx]
        item: Dict[str, Any] = {
            "texts": texts,
            "labels": _decode_labels(ex, idx_seq, self.max_story_length),
            "guid": ex.guid,
        }
        item.update(self._images(img_paths, len(texts)))
        return item


class PretrainDataset(_StoryDatasetBase):
    """Whole unscrambled stories for MLM + multimodal objectives
    (`processors.py:873-1065`)."""

    def __init__(self, examples, tokenizer, scramble=False, get_guid=False,
                 **kw):
        super().__init__(examples, tokenizer, scramble=scramble, **kw)
        self.get_guid = get_guid

    def __getitem__(self, idx, epoch: int = 0):
        texts, img_paths, idx_seq = self._story(idx, epoch)
        item = self._pack(texts)
        item["labels"] = np.int32(np.argwhere(idx_seq == 0)[0][0])
        if self.get_guid:
            item["guid"] = self.examples[idx].guid
        item.update(self._images(img_paths, len(texts)))
        return item


class RetrievalDataset(_StoryDatasetBase):
    """Missing-step retrieval (`processors.py:1068-1244`): each story is
    packed with ONE random step skipped; `labels` is the argsort of the
    kept-step indices followed by the skipped index; `candidates_list()`
    enumerates every step of every story (the retrieval pool)."""

    def __getitem__(self, idx, epoch: int = 0):
        ex = self.examples[idx]
        texts = list(ex.text_seq[:self.max_story_length])
        n = len(texts)
        rng = _example_rng(self.seed, epoch, idx)
        skip = int(rng.integers(0, n))
        kept = [i for i in range(n) if i != skip]
        item = self._pack([texts[i] for i in kept])
        # label = argsort(kept + [skip]) (`processors.py:1197-1218`)
        item["labels"] = np.argsort(
            np.asarray(kept + [skip])).astype(np.int32)
        item["guid"] = f"{ex.guid}###{skip}"
        item["skip_idx"] = np.int32(skip)
        if self.multimodal and ex.img_path_seq is not None:
            item["images"] = self._load_images(
                [ex.img_path_seq[i] for i in kept]
                + [None] * (self.max_story_length - len(kept)))
        return item

    def candidates_list(self):
        """Every step of every story as a retrieval candidate:
        (input_ids, attention_mask, guid###step[, image])
        (`processors.py:1132-1170`)."""
        out = []
        for ex in self.examples:
            texts = ex.text_seq[:self.max_story_length]
            for j, text in enumerate(texts):
                ids = self.packer.encode_step(text)
                padded = np.full(self.packer.per_seq_max_length,
                                 self.pad_id, np.int32)
                padded[:len(ids)] = ids[:len(padded)]
                item = {
                    "input_ids": padded,
                    "attention_mask": (padded != self.pad_id).astype(
                        np.int32),
                    "guid": f"{ex.guid}###{j}",
                }
                if self.multimodal and ex.img_path_seq is not None:
                    item["images"] = self._load_images([ex.img_path_seq[j]])
                out.append(item)
        return out


class BersonDataset(_StoryDatasetBase):
    """BERSON pair-expanded stories: all N(N-1) packed pairs + relation
    metadata (the data-layer home of the reference's in-forward
    `prepare_berson_inputs`, `models/berson/process_inputs_for_berson.py`)."""

    def __getitem__(self, idx, epoch: int = 0):
        texts, img_paths, idx_seq = self._story(idx, epoch)
        label = np.argsort(np.asarray(idx_seq)).astype(np.int32)
        item = self.packer.pack_berson_story(
            texts, label.tolist(), max_story_length=self.max_story_length)
        item["labels"] = np.concatenate(
            [label, np.arange(len(texts), self.max_story_length,
                              dtype=np.int32)])
        item["guid"] = self.examples[idx].guid
        item.update(self._images(img_paths, len(texts)))
        return item


def _decode_labels(ex, idx_seq, max_story_length):
    """Order label(s) for decode: argsort of the scramble, or the scrambled
    multiref list (`processors.py:660-674,824-837`)."""
    if getattr(ex, "multiref_gt", None) is not None:
        multiref = ex.multiref_gt
        assert len(multiref) >= 1 and isinstance(multiref, list)
        offset = min(multiref[0])
        multiref = [[x - offset for x in y] for y in multiref]
        assert list(range(max_story_length)) in multiref, (
            f"Forgot the original 12345 GT for data: {ex.guid}?")
        multiref = sorted(multiref)
        assert list(range(max_story_length)) == multiref[0]
        scrambled = [[x[i] for i in idx_seq] for x in multiref]
        return np.asarray([np.argsort(np.asarray(x)) for x in scrambled],
                          dtype=np.int32)
    return np.argsort(np.asarray(idx_seq)).astype(np.int32)


# ----- batching ---------------------------------------------------------------

_ARRAY_KEYS = ("input_ids", "attention_mask", "token_type_ids", "labels",
               "images", "img_regional_features", "sep_positions",
               "pairs_list", "pairwise_labels", "ground_truth", "mask_cls",
               "passage_length", "pairs_num")


def collate(items: Sequence[Dict[str, Any]], pad_to: Optional[int] = None
            ) -> Dict[str, Any]:
    """Stack example dicts into a dense batch. `pad_to` pads the batch to a
    static size by repeating the last example and marks them invalid in the
    returned `valid` mask (static shapes keep XLA from recompiling)."""
    n = len(items)
    total = pad_to or n
    valid = np.zeros(total, dtype=bool)
    valid[:n] = True
    padded = list(items) + [items[-1]] * (total - n)
    batch: Dict[str, Any] = {"valid": valid}
    for key in padded[0]:
        vals = [it[key] for it in padded]
        stackable = key in _ARRAY_KEYS and (
            isinstance(vals[0], np.ndarray) or np.isscalar(vals[0])
            or isinstance(vals[0], (np.integer, np.floating)))
        if stackable:
            shapes = {np.asarray(v).shape for v in vals}
            if len(shapes) == 1:
                batch[key] = np.stack([np.asarray(v) for v in vals])
            else:  # ragged (e.g. multiref labels) stays a list
                batch[key] = vals
        else:
            batch[key] = vals
    return batch


def data_loader(dataset, batch_size: int, shuffle: bool = False,
                seed: Optional[int] = None, epoch: int = 0,
                drop_last: bool = False, pad_final: bool = True):
    """Minimal deterministic host loader yielding collated numpy batches."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.Generator(
            np.random.Philox(key=np.uint64(((seed or 0) << 32) ^ epoch))
        ).shuffle(order)
    for start in range(0, len(order), batch_size):
        sel = order[start:start + batch_size]
        if len(sel) < batch_size and drop_last:
            return
        items = [dataset.__getitem__(int(i), epoch=epoch) for i in sel]
        yield collate(items,
                      pad_to=batch_size if pad_final else None)


def prefetch(iterator, size: int = 2):
    """Background-thread prefetcher: overlaps host batch preparation
    (tokenize/pack/image decode) with device compute. The reference's
    DataLoader workers analogue for the single-core serving host."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    err = []

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # surface loader errors to the consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
