"""Packed quantized-checkpoint persistence via orbax.

The reference re-quantizes weights from the HF checkpoint at every
launch (model_utils.py:24-46) and never persists the packed form
(SURVEY.md §5 checkpoint note). For 72B-class models that is minutes
of load-time work, so here the packed pytree (codes / scales / global
scales / biases) serializes to an orbax checkpoint and restores
without touching the original weights.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from ..quant.packing import PackedWeight, PackedWeightI8


# format tag stored as a tiny int array (orbax rejects string leaves)
_TAG_W4, _TAG_W8 = np.int32(4), np.int32(8)


def _to_plain(tree):
    """NamedTuples -> tagged dicts (orbax round-trips dicts/lists)."""
    if isinstance(tree, PackedWeight):
        d = {"__packed__": _TAG_W4}
        d.update({k: _to_plain(v) for k, v in tree._asdict().items()
                  if v is not None})
        return d
    if isinstance(tree, PackedWeightI8):
        d = {"__packed__": _TAG_W8}
        d.update({k: _to_plain(v) for k, v in tree._asdict().items()
                  if v is not None})
        return d
    if isinstance(tree, dict):
        return {k: _to_plain(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_plain(v) for v in tree]
    return tree


def _from_plain(tree):
    if isinstance(tree, dict):
        tag = tree.get("__packed__")
        if tag is not None:
            cls = PackedWeightI8 if int(np.asarray(tag)) == 8 else \
                PackedWeight
            return cls(codes=tree["codes"], scales=tree["scales"],
                       global_scale=tree["global_scale"],
                       bias=tree.get("bias"))
        return {k: _from_plain(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_from_plain(v) for v in tree]
    return tree


def save_quantized(path: str, qparams: Dict[str, Any]) -> None:
    """Serialize a quantized param pytree (including PackedWeight
    leaves) to an orbax checkpoint directory."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_plain(qparams), force=True)
    ckptr.wait_until_finished()


def load_quantized(path: str) -> Dict[str, Any]:
    """Restore a quantized param pytree saved by save_quantized."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    raw = ckptr.restore(path)
    return _from_plain(raw)
