"""Calibration artifact persistence.

The reference saves three torch `.pt` files into ./saved/
({model}_reorder_index_*, _select_num_*, _average_bits_*;
reorder_indices.py:88-97) which the eval entry point requires
(model/main.py:112-122). Here a single .npz holds everything, keyed by
layer and site, plus metadata.
"""

from __future__ import annotations

import json
import os
from typing import List, Dict

import jax.numpy as jnp
import numpy as np

from ..models.quantized import SiteCalib


def save_calibration(path: str, calib: List[Dict[str, SiteCalib]],
                     meta: dict | None = None) -> None:
    arrays = {}
    select = {}
    for i, layer in enumerate(calib):
        for site, sc in layer.items():
            arrays[f"layer{i}/{site}/reorder_index"] = np.asarray(
                sc.reorder_index, np.int32)
            select[f"layer{i}/{site}"] = int(sc.select_num)
    arrays["__select_nums__"] = np.frombuffer(
        json.dumps(select).encode(), dtype=np.uint8)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    arrays["__num_layers__"] = np.asarray(len(calib))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **arrays)


def load_calibration(path: str) -> List[Dict[str, SiteCalib]]:
    data = np.load(path)
    select = json.loads(bytes(data["__select_nums__"]).decode())
    num_layers = int(data["__num_layers__"])
    calib: List[Dict[str, SiteCalib]] = [{} for _ in range(num_layers)]
    # Sites are read back from the select-num keys rather than a fixed
    # list: MoE configs persist extra sites (e.g. sdown_in).
    for lk in select:
        layer_s, site = lk.split("/", 1)
        i = int(layer_s[len("layer"):])
        calib[i][site] = SiteCalib(
            jnp.asarray(data[f"{lk}/reorder_index"]), select[lk])
    return calib


def load_calibration_meta(path: str) -> dict:
    data = np.load(path)
    return json.loads(bytes(data["__meta__"]).decode())
