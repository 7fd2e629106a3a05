"""Numerical BERSON parity vs the reference torch module.

Weight-transplant test (verdict r4 item 3): instantiate the reference's
`models/berson/modeling_bert.py::BertForOrdering` (torch, tiny config,
text inner encoder), port its weights into `BersonOrdering`, and assert
on identical packed inputs that
  * `encode()` intermediates agree — document matrix (clean_sents_vec),
    pointer keys, LSTM init state, pairwise cls scores and the
    (N, N, .) relation matrices;
  * the training loss agrees (pointer NLL/(len-1) + 0.6 * pairwise CE);
  * `beam_search_pointer` and the batched `beam_search` produce the
    same orders.

This pins the quirk-dense wrapper math — HierarchicalAttention span
masks, l1/l2 history rows, future means over masked zeros, the loss
normalizations (`modeling_bert.py:666-817,937-1237`) — against the
reference's own executable code rather than self-consistency.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted")

torch = pytest.importorskip("torch")

N = 4           # story length
B = 2           # batch
PER_SEQ = 8     # per-step token budget; pair length L = 16
HID = 32
VOCAB = 1000


def _import_reference_berson():
    """Import the reference package with stubs for its unused network
    deps (boto3/botocore/requests are only touched by download paths)."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    bc = types.ModuleType("botocore")
    bc.__path__ = []
    sys.modules.setdefault("botocore", bc)
    cfgmod = types.ModuleType("botocore.config")
    cfgmod.Config = object
    sys.modules.setdefault("botocore.config", cfgmod)
    exmod = types.ModuleType("botocore.exceptions")
    exmod.ClientError = Exception
    sys.modules.setdefault("botocore.exceptions", exmod)
    sys.modules.setdefault("boto3", types.ModuleType("boto3"))
    sys.modules.setdefault("requests", types.ModuleType("requests"))
    import importlib
    return importlib.import_module("models.berson.modeling_bert")


def _ref_args():
    ns = types.SimpleNamespace()
    ns.device = torch.device("cpu")
    ns.multimodal = False
    ns.use_multimodal_model = False
    ns.multimodal_loss = False
    ns.multimodal_img_part = False
    ns.additional_wrapper_level_objectives = None
    # trainers/train.py:2012-2017 hardcodes these
    ns.ff_size = 3072
    ns.heads = 8
    ns.para_dropout = 0.1
    ns.inter_layers = 2
    ns.pairwise_loss_lam = 0.6
    ns.beam_size = 4
    return ns


@pytest.fixture(scope="module")
def ref_model():
    mb = _import_reference_berson()
    from models.berson.configuration_bert import BertConfig
    cfg = BertConfig(
        vocab_size_or_config_json_file=VOCAB, hidden_size=HID,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    cfg.num_labels = 2
    cfg.wrapper_model_with_heatmap = False
    torch.manual_seed(7)
    model = mb.BertForOrdering(cfg, _ref_args())
    model.eval()
    return mb, model


def _flax_model():
    from multimodal_sequencing_tpu.models.berson import BersonOrdering
    from multimodal_sequencing_tpu.models.config import (
        EncoderConfig, MultimodalConfig)
    enc = EncoderConfig(
        vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2,
        layer_norm_eps=1e-12, pad_token_id=0, position_offset=0,
        dtype="float32", use_pallas_attention=False, gelu_impl="erf")
    cfg = MultimodalConfig(encoder=enc, max_story_length=N,
                           max_seq_length=2 * PER_SEQ,
                           per_seq_max_length=PER_SEQ)
    return BersonOrdering(cfg, beam_size=4, pairwise_loss_lam=0.6), cfg


# ----- weight transplant -------------------------------------------------------


def _dense(sd, key):
    return {"kernel": sd[f"{key}.weight"].T, "bias": sd[f"{key}.bias"]}


def _dense_nb(sd, key):
    return {"kernel": sd[f"{key}.weight"].T}


def _mha(sd, prefix, heads):
    """Reference MultiHeadedAttention (models/berson/neural.py:36) ->
    flax nn.MultiHeadDotProductAttention params. Head layout: torch
    shapes (B, S, heads*hd) with heads-major order == flax DenseGeneral
    features=(heads, hd)."""
    d = sd[f"{prefix}.linear_query.weight"].shape[0]
    hd = d // heads

    def qkv(name):
        w = sd[f"{prefix}.{name}.weight"].T        # (d_in, d_out)
        b = sd[f"{prefix}.{name}.bias"]
        return {"kernel": w.reshape(d, heads, hd),
                "bias": b.reshape(heads, hd)}

    out_w = sd[f"{prefix}.final_linear.weight"].T  # (d_in=h*hd, d_out)
    return {
        "query": qkv("linear_query"),
        "key": qkv("linear_keys"),
        "value": qkv("linear_values"),
        "out": {"kernel": out_w.reshape(heads, hd, d),
                "bias": sd[f"{prefix}.final_linear.bias"]},
    }


def _lstm(sd, prefix):
    """torch nn.LSTM (gate order i,f,g,o in the stacked weights) ->
    flax OptimizedLSTMCell (per-gate Dense ii/if/ig/io + hi/hf/hg/ho;
    the single flax bias per gate is the sum of torch's ih+hh biases)."""
    w_ih = sd[f"{prefix}.weight_ih_l0"]    # (4H, H)
    w_hh = sd[f"{prefix}.weight_hh_l0"]
    b = sd[f"{prefix}.bias_ih_l0"] + sd[f"{prefix}.bias_hh_l0"]
    h = w_ih.shape[1]
    out = {}
    for g, name in enumerate("ifgo"):
        sl = slice(g * h, (g + 1) * h)
        out[f"i{name}"] = {"kernel": w_ih[sl].T}
        out[f"h{name}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    return out


def _transplant(ref, flax_params):
    """Port every BertForOrdering weight into the BersonOrdering tree."""
    from multimodal_sequencing_tpu.models.convert import (
        convert_hf_text_encoder)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    p = dict(flax_params["params"])

    inner = convert_hf_text_encoder(
        {k[len("bert."):]: v for k, v in sd.items()
         if k.startswith("bert.")},
        num_layers=2)
    if "pooler" not in inner:
        # the vendored BertModel never materializes its pooler
        # (modeling_bert.py:660 keeps the CLS slice); BersonOrdering
        # likewise only reads top_vec[:, :, 0], so the flax-initialized
        # pooler weights are dead here — keep them
        inner["pooler"] = p["inner"]["pooler"]
    p["inner"] = inner

    p["two_level_encoder"] = {
        "sentence_tran": _dense(sd, "two_level_encoder.sentence_tran"),
        "sentence_tran_2": _dense(sd, "two_level_encoder.sentence_tran_2"),
        "pairwise_relationship": _dense(
            sd, "two_level_encoder.pairwise_relationship"),
        "h1_relationship": _dense(sd, "two_level_encoder.h1_relationship"),
        "h2_relationship": _dense(sd, "two_level_encoder.h2_relationship"),
        "linear_in_2": _dense_nb(sd, "two_level_encoder.linear_in_2"),
    }

    para = {"ln_out": {"scale": sd["encoder.layer_norm.weight"],
                       "bias": sd["encoder.layer_norm.bias"]}}
    for i in range(2):
        t = f"encoder.transformer_inter.{i}"
        layer = {
            "self_attn": _mha(sd, f"{t}.self_attn", heads=8),
            "ff_ln": {"scale": sd[f"{t}.feed_forward.layer_norm.weight"],
                      "bias": sd[f"{t}.feed_forward.layer_norm.bias"]},
            "ff_1": _dense(sd, f"{t}.feed_forward.w_1"),
            "ff_2": _dense(sd, f"{t}.feed_forward.w_2"),
        }
        if i != 0:  # layer 0 never applies its input LN (encoder.py:20-23)
            layer["ln"] = {"scale": sd[f"{t}.layer_norm.weight"],
                           "bias": sd[f"{t}.layer_norm.bias"]}
        para[f"layer_{i}"] = layer
    p["para_encoder"] = para

    p["key_linear"] = _dense(sd, "key_linear")
    p["query_linear"] = _dense(sd, "query_linear")
    p["tanh_linear"] = _dense(sd, "tanh_linear")
    p["pw_k"] = _dense_nb(sd, "pw_k")
    p["decoder"] = _lstm(sd, "decoder")
    return {"params": p}


# ----- shared inputs -----------------------------------------------------------


@pytest.fixture(scope="module")
def packed_batch(tokenizer):
    from multimodal_sequencing_tpu.data.packing import StoryPacker
    packer = StoryPacker(tokenizer, max_seq_length=2 * PER_SEQ,
                         per_seq_max_length=PER_SEQ)
    rng = np.random.RandomState(3)
    items = []
    for k in range(B):
        texts = [f"story {k} step {i} about topic {rng.randint(100)}"
                 for i in range(N)]
        label = rng.permutation(N).tolist()
        items.append(packer.pack_berson_story(texts, label))
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def _torch_inputs(batch):
    t = lambda x, dt=torch.long: torch.as_tensor(np.asarray(x)).to(dt)
    return dict(
        input_ids=t(batch["input_ids"]),
        attention_mask=t(batch["attention_mask"]),
        token_type_ids=t(batch["token_type_ids"]),
        pairs_list=t(batch["pairs_list"]),
        passage_length=t([N] * batch["input_ids"].shape[0]),
        pairs_num=t([batch["pairs_list"].shape[1]]
                    * batch["input_ids"].shape[0]),
        sep_positions=t(batch["sep_positions"]),
        ground_truth=t(batch["ground_truth"]),
        mask_cls=t(batch["mask_cls"]),
        pairwise_labels=t(batch["pairwise_labels"]),
        cuda=None,
    )


@pytest.fixture(scope="module")
def transplanted(ref_model, packed_batch):
    import jax
    import jax.numpy as jnp
    _, ref = ref_model
    model, cfg = _flax_model()
    jbatch = {k: jnp.asarray(v) for k, v in packed_batch.items()}
    params = model.init(jax.random.PRNGKey(0), jbatch)
    params = jax.tree_util.tree_map(
        jnp.asarray, _transplant(ref, params))
    return model, params, jbatch


# ----- tests -------------------------------------------------------------------


def test_encode_intermediates_match(ref_model, transplanted, packed_batch):
    import numpy as np
    from multimodal_sequencing_tpu.models.berson import BersonOrdering
    _, ref = ref_model
    model, params, jbatch = transplanted

    with torch.no_grad():
        (sents, para, hcn, key, cls_pooled, cls_out_m, cls_score,
         cls_score_m, his1_m, his2_m) = ref.encode(**_torch_inputs(
             packed_batch))

    enc = model.apply(params, jbatch, method=BersonOrdering.encode)

    tol = dict(rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(enc["doc"]),
                               sents.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(enc["key"]),
                               key.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(enc["hcn"][0]),
                               hcn[0].numpy()[0], **tol)
    np.testing.assert_allclose(
        np.asarray(enc["cls_score"]).reshape(-1, 2),
        cls_score.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(enc["cls_output_matrix"]),
                               cls_out_m.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(enc["cls_score_matrix"]),
                               cls_score_m.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(enc["his1_matrix"]),
                               his1_m.numpy(), **tol)


def test_training_loss_matches(ref_model, transplanted, packed_batch):
    _, ref = ref_model
    model, params, jbatch = transplanted
    with torch.no_grad():
        (ref_loss,) = ref._forward(**_torch_inputs(packed_batch))
    out = model.apply(params, jbatch)
    np.testing.assert_allclose(float(out["loss"]), float(ref_loss),
                               rtol=2e-4)


def test_beam_search_orders_match(ref_model, transplanted, packed_batch):
    from multimodal_sequencing_tpu.models.berson import BersonOrdering
    mb, ref = ref_model
    model, params, jbatch = transplanted

    chains = np.asarray(model.apply(params, jbatch,
                                    method=BersonOrdering.beam_search))
    args = _ref_args()

    # the reference's step() calls masked_fill_ with a uint8 pointed
    # mask (modeling_bert.py:1399), which modern torch rejects — shim
    # the mask to bool without touching the math
    orig_step = ref.step
    ref.step = (lambda prev_y, prev_handc, original_keys, mask, *a:
                orig_step(prev_y, prev_handc, original_keys,
                          mask.bool(), *a))
    tin = _torch_inputs(packed_batch)
    for b in range(B):
        one = {k: (v[b:b + 1] if torch.is_tensor(v) else v)
               for k, v in tin.items()}
        with torch.no_grad():
            best = mb.beam_search_pointer(args, ref, **one)
        assert chains[b].tolist() == list(best), (
            f"story {b}: flax {chains[b].tolist()} vs ref {list(best)}")
