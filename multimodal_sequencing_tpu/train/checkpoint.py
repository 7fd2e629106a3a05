"""Checkpointing with the reference's directory contract.

Mirrors `/root/reference/trainers/train.py:431-453` (periodic
`checkpoint-{step}` dirs + tokenizer + training args) and `:389-422`
(best checkpoint tracked on acc_dev + pmr_dev into `checkpoint-best`),
plus resume: parse global step from the directory name (`train.py:246-266`)
and reload optimizer state. Storage is Orbax (`StandardCheckpointer`) for
the jax pytrees + JSON sidecars for configs.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


def save_checkpoint(output_dir: str, step: int, state, cfg=None,
                    tokenizer=None, training_args: Optional[dict] = None,
                    name: Optional[str] = None) -> str:
    """Write `checkpoint-{step}` (or `checkpoint-{name}`)."""
    ocp = _ocp()
    tag = name if name is not None else str(step)
    ckpt_dir = os.path.join(os.path.abspath(output_dir), f"checkpoint-{tag}")
    os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "step": np.asarray(state.step),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "model_state": jax.device_get(state.model_state),
    }
    path = os.path.join(ckpt_dir, "state")
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if cfg is not None:
        with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
            f.write(cfg.to_json())
    if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        try:
            tokenizer.save_pretrained(ckpt_dir)
        except Exception:
            pass
    if training_args is not None:
        with open(os.path.join(ckpt_dir, "training_args.json"), "w") as f:
            json.dump(training_args, f, indent=2, default=str)
    return ckpt_dir


def restore_checkpoint(ckpt_dir: str, state, load_optimizer: bool = True):
    """Restore a TrainState from `checkpoint-*/state` (shapes from the
    freshly initialized `state`). With `load_optimizer=False` only params
    and model_state are taken; optimizer moments and the step counter stay
    fresh (`--do_not_load_optimizer`, reference `train.py:195,247`)."""
    ocp = _ocp()
    template = {
        "step": np.asarray(jax.device_get(state.step)),
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "model_state": jax.device_get(state.model_state),
    }
    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.join(os.path.abspath(ckpt_dir), "state"),
                            template)
    if not load_optimizer:
        return state.replace(params=payload["params"],
                             model_state=payload["model_state"])
    return state.replace(
        step=jax.numpy.asarray(payload["step"]),
        params=payload["params"], opt_state=payload["opt_state"],
        model_state=payload["model_state"])


def parse_step_from_name(path: str) -> int:
    """global_step from a checkpoint dir name (`train.py:246-266`)."""
    m = re.search(r"checkpoint-(\d+)", os.path.basename(path.rstrip("/")))
    return int(m.group(1)) if m else 0


def find_checkpoints(output_dir: str, iters_to_eval=None):
    """Checkpoint dirs under output_dir, optionally filtered by
    `--iters_to_eval` entries (numbers or 'best'), mirroring
    `train.py:2168-2186`."""
    # numeric step order (lexicographic would put checkpoint-10000 before
    # checkpoint-2000); non-numeric tags like checkpoint-best sort first
    dirs = sorted(glob.glob(os.path.join(output_dir, "checkpoint-*")),
                  key=parse_step_from_name)
    if not iters_to_eval:
        return dirs
    keep = []
    wanted = {str(x) for x in iters_to_eval}
    for d in dirs:
        tag = os.path.basename(d).split("checkpoint-")[-1]
        if tag in wanted:
            keep.append(d)
    return keep
