"""ctypes bindings for the native host-runtime packing kernels.

Loads `native/libpacker.so` (build: `make -C native`; auto-built on first
import when a compiler is available). All entry points fall back to the
numpy implementations in `packing.py` when the library is unavailable —
`StoryPacker` stays correct either way; the native path removes the python
per-pair loops from the single-core host's O(N^2) eval packing.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")

_I32P = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libpacker.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:
            logger.info("native packer unavailable (%s); using numpy", e)
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        logger.info("native packer load failed (%s); using numpy", e)
        return None
    lib.pack_story.restype = ctypes.c_int32
    lib.pack_story.argtypes = [_I32P, _I32P, ctypes.c_int32, ctypes.c_int32,
                               ctypes.c_int32, _I32P, _I32P]
    lib.pack_all_pairs.restype = None
    lib.pack_all_pairs.argtypes = [_I32P, _I32P, ctypes.c_int32,
                                   ctypes.c_int32, ctypes.c_int32,
                                   _I32P, _I32P, _I32P]
    lib.pack_berson.restype = None
    lib.pack_berson.argtypes = [_I32P, _I32P, ctypes.c_int32, ctypes.c_int32,
                                ctypes.c_int32, _I32P, _I32P, _I32P, _I32P,
                                _I32P]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _flatten(step_ids: Sequence[np.ndarray]) -> Tuple[np.ndarray, np.ndarray]:
    offsets = np.zeros(len(step_ids) + 1, np.int32)
    for k, s in enumerate(step_ids):
        offsets[k + 1] = offsets[k] + len(s)
    flat = (np.concatenate(step_ids).astype(np.int32) if step_ids
            else np.zeros(0, np.int32))
    return np.ascontiguousarray(flat), offsets


def pack_story(step_ids: Sequence[np.ndarray], L: int, pad_id: int):
    lib = _load()
    if lib is None:
        return None
    flat, offsets = _flatten(step_ids)
    out_ids = np.empty(L, np.int32)
    out_types = np.empty(L, np.int32)
    lib.pack_story(flat, offsets, len(step_ids), L, pad_id, out_ids,
                   out_types)
    return out_ids, out_types


def pack_all_pairs(step_ids: Sequence[np.ndarray], L: int, pad_id: int):
    lib = _load()
    if lib is None:
        return None
    n = len(step_ids)
    P = n * (n - 1)
    flat, offsets = _flatten(step_ids)
    out_ids = np.empty((P, L), np.int32)
    out_types = np.empty((P, L), np.int32)
    out_idx = np.empty((P, 2), np.int32)
    lib.pack_all_pairs(flat, offsets, n, L, pad_id,
                       out_ids.reshape(-1), out_types.reshape(-1),
                       out_idx.reshape(-1))
    return out_ids, out_types, out_idx


def pack_berson(step_ids: Sequence[np.ndarray], label: Sequence[int],
                L: int, pad_id: int):
    lib = _load()
    if lib is None or len(step_ids) > 64:
        return None
    n = len(step_ids)
    P = n * (n - 1)
    flat, offsets = _flatten(step_ids)
    out_ids = np.empty((P, L), np.int32)
    out_sep = np.empty((P, 2), np.int32)
    out_plabels = np.empty(P, np.int32)
    out_pairs = np.empty((P, 2), np.int32)
    lib.pack_berson(flat, offsets, n, L, pad_id,
                    np.ascontiguousarray(np.asarray(label, np.int32)),
                    out_ids.reshape(-1), out_sep.reshape(-1), out_plabels,
                    out_pairs.reshape(-1))
    return out_ids, out_sep, out_plabels, out_pairs
