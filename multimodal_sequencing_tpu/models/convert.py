"""HF / CLIP checkpoint conversion to framework parameters.

Reproduces the reference's checkpoint-interop surface: loading HF
BERT/RoBERTa encoder weights (incl. the `roberta.` / `bert.` prefix-strip
shims, `/root/reference/trainers/train.py:1819-1849`), the CLIP
visual-weights filtered load (`--clip_visual_model_weights`,
`train.py:1885-1899`), and partial vision-checkpoint loads
(`train.py:1909-1921`). Input is a state-dict mapping (torch tensors or
numpy arrays); output is a flax params pytree for `TextEncoder` /
`CLIPVisualTower`.
"""

from __future__ import annotations

import logging
import re
from typing import Dict

import numpy as np

logger = logging.getLogger(__name__)


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def strip_prefixes(state_dict: Dict, prefixes=("roberta.", "bert.",
                                               "module.")) -> Dict:
    """Key-remap shim (`train.py:1819-1849`)."""
    out = {}
    for k, v in state_dict.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


def convert_hf_text_encoder(state_dict: Dict, num_layers: int) -> Dict:
    """HF BertModel/RobertaModel state dict -> TextEncoder flax params."""
    sd = strip_prefixes({k: _np(v) for k, v in state_dict.items()})

    def dense(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T,
                "bias": sd[f"{prefix}.bias"]}

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"],
                "bias": sd[f"{prefix}.bias"]}

    params = {
        "embeddings": {
            "word_embeddings": {
                "embedding": sd["embeddings.word_embeddings.weight"]},
            "position_embeddings": {
                "embedding": sd["embeddings.position_embeddings.weight"]},
            "ln": ln("embeddings.LayerNorm"),
        },
    }
    if "embeddings.token_type_embeddings.weight" in sd:
        params["embeddings"]["token_type_embeddings"] = {
            "embedding": sd["embeddings.token_type_embeddings.weight"]}
    for i in range(num_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "query": dense(f"{p}.attention.self.query"),
                "key": dense(f"{p}.attention.self.key"),
                "value": dense(f"{p}.attention.self.value"),
                "out": dense(f"{p}.attention.output.dense"),
            },
            "attention_ln": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "output_ln": ln(f"{p}.output.LayerNorm"),
        }
    if "pooler.dense.weight" in sd:
        params["pooler"] = dense("pooler.dense")
    return params


def resize_token_type_embeddings(params: Dict, new_size: int) -> Dict:
    """`--replace_token_type_embeddings` analogue (`train.py:1976-1996`):
    tile/truncate the token-type table to `max_story_length` rows."""
    emb = params["embeddings"].get("token_type_embeddings")
    if emb is None:
        return params
    table = np.asarray(emb["embedding"])
    if table.shape[0] >= new_size:
        new = table[:new_size]
    else:
        reps = -(-new_size // table.shape[0])
        new = np.tile(table, (reps, 1))[:new_size]
    params["embeddings"]["token_type_embeddings"] = {"embedding": new}
    return params


# ----- CLIP visual towers -----------------------------------------------------

def filter_visual_state_dict(state_dict: Dict) -> Dict:
    """The `--clip_visual_model_weights` filtered load: keep only
    `visual.`-prefixed weights (`train.py:1885-1899`)."""
    out = {}
    for k, v in state_dict.items():
        m = re.search(r"(?:^|\.)visual\.(.*)$", k)
        if m:
            out[m.group(1)] = v
    return out


def convert_clip_vit(state_dict: Dict) -> Dict:
    """OpenAI CLIP ViT `visual.*` weights -> VisualTransformer params."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    params = {
        "conv1": {"kernel": sd["conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["class_embedding"],
        "positional_embedding": sd["positional_embedding"],
        "ln_pre": {"scale": sd["ln_pre.weight"], "bias": sd["ln_pre.bias"]},
        "ln_post": {"scale": sd["ln_post.weight"],
                    "bias": sd["ln_post.bias"]},
        "proj": sd["proj"],
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        p = f"transformer.resblocks.{i}"
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": sd[f"{p}.ln_1.weight"],
                     "bias": sd[f"{p}.ln_1.bias"]},
            "ln_2": {"scale": sd[f"{p}.ln_2.weight"],
                     "bias": sd[f"{p}.ln_2.bias"]},
            "qkv": {"kernel": sd[f"{p}.attn.in_proj_weight"].T,
                    "bias": sd[f"{p}.attn.in_proj_bias"]},
            "attn_out": {"kernel": sd[f"{p}.attn.out_proj.weight"].T,
                         "bias": sd[f"{p}.attn.out_proj.bias"]},
            "c_fc": {"kernel": sd[f"{p}.mlp.c_fc.weight"].T,
                     "bias": sd[f"{p}.mlp.c_fc.bias"]},
            "c_proj": {"kernel": sd[f"{p}.mlp.c_proj.weight"].T,
                       "bias": sd[f"{p}.mlp.c_proj.bias"]},
        }
        i += 1
    return {"vit": params}


def _bn(sd, prefix):
    return ({"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]},
            {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]})


def convert_clip_rn50(state_dict: Dict, layers=(3, 4, 6, 3)) -> Dict:
    """OpenAI CLIP ModifiedResNet `visual.*` weights -> ModifiedResNet
    params + batch_stats."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def conv(prefix):
        return {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}

    for i in (1, 2, 3):
        params[f"conv{i}"] = conv(f"conv{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"bn{i}")

    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src = f"layer{stage+1}.{b}"
            dst = f"layer{stage+1}_{b}"
            bp: Dict = {}
            bs: Dict = {}
            for c in (1, 2, 3):
                bp[f"conv{c}"] = conv(f"{src}.conv{c}")
                bp[f"bn{c}"], bs[f"bn{c}"] = _bn(sd, f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = conv(f"{src}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    sd, f"{src}.downsample.1")
            params[dst] = bp
            stats[dst] = bs

    ap = "attnpool"
    params[ap] = {
        "positional_embedding": sd[f"{ap}.positional_embedding"],
        "q_proj": {"kernel": sd[f"{ap}.q_proj.weight"].T,
                   "bias": sd[f"{ap}.q_proj.bias"]},
        "k_proj": {"kernel": sd[f"{ap}.k_proj.weight"].T,
                   "bias": sd[f"{ap}.k_proj.bias"]},
        "v_proj": {"kernel": sd[f"{ap}.v_proj.weight"].T,
                   "bias": sd[f"{ap}.v_proj.bias"]},
        "c_proj": {"kernel": sd[f"{ap}.c_proj.weight"].T,
                   "bias": sd[f"{ap}.c_proj.bias"]},
    }
    return {"params": {"resnet": params}, "batch_stats": {"resnet": stats}}


def convert_detectron2_fpn(state_dict: Dict, backbone_name: str = "resnet50",
                           roi_size: int = 7) -> Dict:
    """Detectron2 model-zoo ResNet-FPN weights -> FPNVisionTower variables.

    Accepts the `model` dict of a detectron2 `model_final_*.pkl` / .pth
    (the checkpoints the reference loads via DetectionCheckpointer,
    `multimodal_utils.py:30-41`). Converts:

    * `backbone.bottom_up.*` (stem + res2..res5, FrozenBN as running
      stats) -> `bottom_up` params/batch_stats,
    * `backbone.fpn_lateral{2..5}` / `fpn_output{2..5}` -> `fpn`,
    * `proposal_generator.rpn_head.conv` -> `obj_conv` and the square
      (ratio-1.0) anchor channel of `rpn_head.objectness_logits` ->
      `obj_logit` (this tower's proposal head is a class-agnostic
      objectness peak-picker, so only the aspect-1 anchor transfers),
    * `roi_heads.box_head.fc1/fc2` -> `box_fc1/box_fc2`, with fc1's
      input rows permuted from detectron2's channel-first (C, s, s) ROI
      flattening to this tower's NHWC (s, s, C) flattening.

    The RPN box-regression deltas and box-predictor have no counterpart
    (this tower uses fixed-aspect anchor boxes, fpn.py docstring) and are
    dropped. Returns {"params": ..., "batch_stats": ...} for the
    `vision_model` subtree; build the tower with
    `feature_dim = fc1.shape[0]` (1024 in the zoo configs).
    """
    from .resnet import _SPECS, BasicBlock
    sd = {k: _np(v) for k, v in state_dict.items()}

    def conv(prefix, with_bias=False):
        out = {"kernel": sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)}
        if with_bias:
            out["bias"] = sd[f"{prefix}.bias"]
        return out

    def frozen_bn(prefix):
        return ({"scale": sd[f"{prefix}.weight"],
                 "bias": sd[f"{prefix}.bias"]},
                {"mean": sd[f"{prefix}.running_mean"],
                 "var": sd[f"{prefix}.running_var"]})

    bu = "backbone.bottom_up"
    block_cls, layers, _ = _SPECS[backbone_name]
    n_convs = 2 if block_cls is BasicBlock else 3
    bparams: Dict = {"conv1": conv(f"{bu}.stem.conv1")}
    bstats: Dict = {}
    bparams["bn1"], bstats["bn1"] = frozen_bn(f"{bu}.stem.conv1.norm")
    for stage, blocks in enumerate(layers):
        for b in range(blocks):
            src = f"{bu}.res{stage+2}.{b}"
            dst = f"layer{stage+1}_{b}"
            bp: Dict = {}
            bs: Dict = {}
            for c in range(1, n_convs + 1):
                bp[f"conv{c}"] = conv(f"{src}.conv{c}")
                bp[f"bn{c}"], bs[f"bn{c}"] = frozen_bn(f"{src}.conv{c}.norm")
            if f"{src}.shortcut.weight" in sd:
                bp["downsample_conv"] = conv(f"{src}.shortcut")
                bp["downsample_bn"], bs["downsample_bn"] = frozen_bn(
                    f"{src}.shortcut.norm")
            bparams[dst] = bp
            bstats[dst] = bs

    fpn = {}
    for lvl in (2, 3, 4, 5):
        fpn[f"lateral_c{lvl}"] = conv(f"backbone.fpn_lateral{lvl}",
                                      with_bias=True)
        fpn[f"output_p{lvl}"] = conv(f"backbone.fpn_output{lvl}",
                                     with_bias=True)

    params: Dict = {"bottom_up": bparams, "fpn": fpn}

    rpn = "proposal_generator.rpn_head"
    if f"{rpn}.conv.weight" in sd:
        params["obj_conv"] = conv(f"{rpn}.conv", with_bias=True)
        logit = conv(f"{rpn}.objectness_logits", with_bias=True)
        a = logit["kernel"].shape[-1]  # anchors per cell (3 in zoo cfgs)
        mid = a // 2                   # ratios (0.5, 1.0, 2.0) -> index 1
        params["obj_logit"] = {"kernel": logit["kernel"][..., mid:mid + 1],
                               "bias": logit["bias"][mid:mid + 1]}

    bh = "roi_heads.box_head"
    if f"{bh}.fc1.weight" in sd:
        w1 = sd[f"{bh}.fc1.weight"]                      # (D, C*s*s)
        d = w1.shape[0]
        c_in = w1.shape[1] // (roi_size * roi_size)
        w1 = w1.reshape(d, c_in, roi_size, roi_size)
        w1 = w1.transpose(2, 3, 1, 0).reshape(-1, d)     # (s*s*C, D) NHWC
        params["box_fc1"] = {"kernel": w1, "bias": sd[f"{bh}.fc1.bias"]}
        params["box_fc2"] = {"kernel": sd[f"{bh}.fc2.weight"].T,
                             "bias": sd[f"{bh}.fc2.bias"]}

    return {"params": params, "batch_stats": bstats and {"bottom_up": bstats}}


def load_detectron2_state_dict(path: str) -> Dict:
    """Load a detectron2 checkpoint: `model_final_*.pkl` files are plain
    pickles with a `model` dict of numpy arrays; .pth files are torch
    checkpoints (DetectionCheckpointer handles both; so do we)."""
    if path.endswith(".pkl"):
        import pickle
        with open(path, "rb") as f:
            payload = pickle.load(f, encoding="latin1")
    else:
        payload = load_torch_state_dict(path)
    if isinstance(payload, dict) and "model" in payload:
        payload = payload["model"]
    return {k: _np(v) for k, v in payload.items()}


def apply_pretrained_to_state(state, args, cfg, encoder_key: str = "encoder"):
    """Load pretrained weights (see load_pretrained_weights) into a
    TrainState, merging BatchNorm running stats into model_state. The
    encoder subtree key is 'encoder' for SequencingModel/Pretrainer and
    'inner' for BersonOrdering."""
    import jax
    params = jax.device_get(state.params)
    if encoder_key != "encoder":
        alias = dict(params)
        alias["encoder"] = alias.pop(encoder_key, {})
        loaded = load_pretrained_weights(alias, args, cfg)
        loaded[encoder_key] = loaded.pop("encoder")
    else:
        loaded = load_pretrained_weights(dict(params), args, cfg)
    model_state = dict(jax.device_get(state.model_state))
    clip_bs = loaded.pop("_clip_batch_stats", None)
    vis_bs = loaded.pop("_vision_batch_stats", None)
    if clip_bs is not None or vis_bs is not None:
        bs = dict(model_state.get("batch_stats", {}))
        enc_bs = dict(bs.get(encoder_key, {}))
        if clip_bs is not None:
            enc_bs["visual_model"] = clip_bs
        if vis_bs is not None:
            enc_bs["vision_model"] = vis_bs
        bs[encoder_key] = enc_bs
        model_state["batch_stats"] = bs
    return state.replace(params=loaded, model_state=model_state)


def load_pretrained_weights(params: Dict, args, cfg) -> Dict:
    """Wire the reference's pretrained-weight flags into a params tree:

    * `--model_name_or_path <dir with pytorch_model.bin>`: HF BERT/RoBERTa
      text weights into the encoder (text-only TextEncoder layout or the
      multimodal joint-encoder layout, whose embeddings/layers live at the
      encoder's top level).
    * `--clip_visual_model_weights`: OpenAI-CLIP visual weights filtered
      into the CLIP tower (`train.py:1885-1899`).
    * `--vision_model_checkpoint`: torchvision ResNet weights into the
      vision backbone (`train.py:1909-1921`).

    Returns the updated params (copy-on-write at the top level); missing
    files raise, mismatched architectures raise KeyError from conversion.
    """
    import os
    params = dict(params)

    mp = getattr(args, "model_name_or_path", None)
    if mp and os.path.isdir(mp):
        bin_path = None
        for cand in ("pytorch_model.bin", "model.safetensors"):
            if os.path.exists(os.path.join(mp, cand)):
                bin_path = os.path.join(mp, cand)
                break
        if bin_path and bin_path.endswith(".bin"):
            sd = load_torch_state_dict(bin_path)
            text = convert_hf_text_encoder(sd, cfg.encoder.num_hidden_layers)
            if cfg.encoder.type_vocab_size > 2:
                text = resize_token_type_embeddings(
                    text, cfg.encoder.type_vocab_size)
            enc = dict(params.get("encoder", {}))
            # both encoder layouts keep embeddings/layer_i/pooler names
            for k, v in text.items():
                if k in enc or k.startswith(("embeddings", "layer_",
                                             "pooler")):
                    enc[k] = v
            params["encoder"] = enc
            logger.info("loaded HF text weights from %s", bin_path)

    cw = getattr(args, "clip_visual_model_weights", None)
    if cw and os.path.exists(cw):
        enc = dict(params.get("encoder", {}))
        if os.path.isdir(cw):
            # one of OUR checkpoints (e.g. from image-only pretraining):
            # restore just the visual tower subtree (the filtered-load
            # analogue for the pretrain -> finetune visual transfer)
            payload = _load_own_checkpoint_subtree(cw)
            src_enc = payload["params"].get("encoder", {})
            if "visual_model" in src_enc:
                enc["visual_model"] = src_enc["visual_model"]
            vstats = payload.get("model_state", {}).get(
                "batch_stats", {}).get("encoder", {}).get("visual_model")
            if vstats is not None:
                params["_clip_batch_stats"] = vstats
        else:
            sd = filter_visual_state_dict(load_torch_state_dict(cw))
            if cfg.clip_model_name.startswith("RN"):
                conv = convert_clip_rn50(sd)
                enc["visual_model"] = conv["params"]
                # caller must merge conv["batch_stats"] into model_state
                params["_clip_batch_stats"] = conv["batch_stats"]
            else:
                enc["visual_model"] = convert_clip_vit(sd)
        params["encoder"] = enc
        logger.info("loaded CLIP visual weights from %s", cw)

    vc = getattr(args, "vision_model_checkpoint", None)
    if vc and os.path.exists(vc):
        enc = dict(params.get("encoder", {}))
        if (cfg.vision_model or "").startswith("detectron2"):
            # detectron2-zoo checkpoint -> FPN tower (the interop the
            # reference gets from DetectionCheckpointer,
            # multimodal_utils.py:30-41)
            from .fpn import backbone_from_name
            sd = load_detectron2_state_dict(vc)
            conv = convert_detectron2_fpn(
                sd, backbone_from_name(cfg.vision_model))
            # graft only the subtrees present in the target (obj/box heads
            # exist only in regional mode) and with matching shapes —
            # a feature_dim mismatch must fail loudly, not at trace time
            import jax
            tgt = enc.get("vision_model", {})
            grafted = dict(tgt)
            for k, v in conv["params"].items():
                if tgt and k not in tgt:
                    continue
                if k in tgt:
                    t_leaves = jax.tree_util.tree_leaves(tgt[k])
                    s_leaves = jax.tree_util.tree_leaves(v)
                    if [x.shape for x in t_leaves] != \
                            [x.shape for x in s_leaves]:
                        raise ValueError(
                            f"detectron2 weights for '{k}' do not match "
                            f"the built tower (set --vision_feature_dim "
                            f"to the checkpoint's box-head width)")
                grafted[k] = v
            enc["vision_model"] = grafted
            params["_vision_batch_stats"] = conv["batch_stats"]
        else:
            from .resnet import convert_torchvision_resnet
            sd = load_torch_state_dict(vc)
            p, stats = convert_torchvision_resnet(sd, cfg.vision_model)
            enc["vision_model"] = p
            params["_vision_batch_stats"] = stats
        params["encoder"] = enc
        logger.info("loaded vision backbone weights from %s", vc)
    return params


def _load_own_checkpoint_subtree(ckpt_dir: str) -> Dict:
    """Read a framework checkpoint (orbax StandardCheckpointer dir written
    by train/checkpoint.py) without a state template, returning raw
    {params, model_state} numpy trees."""
    import orbax.checkpoint as ocp
    import os
    path = os.path.join(os.path.abspath(ckpt_dir), "state")
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(path)
    return payload


def load_torch_state_dict(path: str) -> Dict:
    """Load a torch checkpoint file into numpy arrays."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items()}
