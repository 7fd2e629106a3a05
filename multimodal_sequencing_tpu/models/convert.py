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


def load_torch_state_dict(path: str) -> Dict:
    """Load a torch checkpoint file into numpy arrays."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items()}
