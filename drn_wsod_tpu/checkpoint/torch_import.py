"""Import reference (torch/Detectron2) weights into the flax param tree.

Equivalent of the reference's Caffe2/torch name alignment
(detectron2/checkpoint/c2_model_loading.py:211-313 and
projects/WSL/tools/convert_resnet_ws_pth.py): maps Detectron2-style names
(``backbone.res2.0.conv1.norm.weight`` ...) onto this framework's module tree
and fixes layout differences:

  * conv kernels: torch (O, I, kh, kw) -> flax (kh, kw, I, O)
  * dense kernels: torch (O, I) -> flax (I, O)
  * the first DAN FC consumes flattened RoI features, which are (C, 7, 7) in
    torch but (7, 7, C) here — its input axis is permuted accordingly.
"""

from __future__ import annotations

import logging
import pickle
import re
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".pkl"):
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        if "model" in data:
            data = data["model"]
        return {k: np.asarray(v) for k, v in data.items()
                if isinstance(v, np.ndarray) or hasattr(v, "__array__")}
    # .pth / .pt: torch checkpoint
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, dict) and "model" in data:
        data = data["model"]
    if isinstance(data, dict) and "state_dict" in data:
        data = data["state_dict"]
    return {k: v.numpy() for k, v in data.items() if hasattr(v, "numpy")}


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}.{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _d2_name_to_flax(name: str) -> str:
    """Map a Detectron2 WSOD param name to our flax path (dot-joined)."""
    n = name
    n = re.sub(r"^module\.", "", n)
    # backbone.res2.0.conv1.norm.weight -> backbone.res2_0.conv1_norm.weight
    n = re.sub(r"\b(res\d)\.(\d+)\.", r"\1_\2.", n)
    n = re.sub(r"\b(conv\d|shortcut)\.norm\.", r"\1_norm.", n)
    # roi_heads.* heads live at the top level here
    n = re.sub(r"^roi_heads\.", "", n)
    n = re.sub(r"^box_refinery\.(\d+)\.", r"box_refinery_\1.", n)
    # vgg: backbone.plain1.0.conv1.weight -> backbone.plain1.conv1.weight
    n = re.sub(r"\b(plain\d)\.0\.", r"\1.", n)
    # torch leaf names -> flax. Norm modules keep the torch-style leaf name
    # (our FrozenBatchNorm stores weight/bias/running_mean/running_var for
    # checkpoint parity) — only conv/dense weights become flax "kernel".
    if not re.search(r"_norm\.weight$", n):
        n = re.sub(r"\.weight$", ".kernel", n)
    return n


def _convert_array(torch_val: np.ndarray, target: Any, flax_key: str) -> np.ndarray:
    v = np.asarray(torch_val)
    tgt_shape = tuple(target.shape)
    if v.ndim == 4:  # conv OIHW -> HWIO
        v = v.transpose(2, 3, 1, 0)
    elif v.ndim == 2:  # dense (O, I) -> (I, O)
        o, i = v.shape
        if "box_head.fc1" in flax_key and tgt_shape[0] == i:
            # flattened-RoI input axis: (O, C*r*r) -> (O, r, r, C) -> (r*r*C, O)
            rr = 1
            # infer r*r and C from target input dim (r*r*C == i)
            # DAN pools at 7x7 -> 49; fall back to no permute if indivisible.
            if i % 49 == 0:
                c = i // 49
                v = v.reshape(o, c, 7, 7).transpose(0, 2, 3, 1).reshape(o, i)
        v = v.T
    if v.shape != tgt_shape:
        raise ValueError(
            f"Shape mismatch for {flax_key}: got {v.shape}, want {tgt_shape}")
    return v


def load_reference_weights(path: str, variables: Any) -> Any:
    """Load torch/D2 weights into a copy of ``variables`` (flax tree with a
    'params' collection), name-matching what exists and reporting the rest."""
    import flax

    state = _load_state_dict(path)
    flat_params = _flatten(variables["params"])

    converted = {}
    unmatched_src = []
    for name, val in state.items():
        if name.endswith("num_batches_tracked") or name.startswith("anchor"):
            continue
        flax_key = _d2_name_to_flax(name)
        if flax_key in flat_params:
            converted[flax_key] = _convert_array(val, flat_params[flax_key],
                                                 flax_key)
        else:
            unmatched_src.append(name)

    missing = [k for k in flat_params if k not in converted]
    if unmatched_src:
        logger.warning(
            f"{len(unmatched_src)} checkpoint params unmatched, e.g. "
            f"{unmatched_src[:5]}")
    if missing:
        logger.warning(
            f"{len(missing)} model params not in checkpoint (kept init), "
            f"e.g. {missing[:5]}")

    new_flat = dict(flat_params)
    for k, v in converted.items():
        new_flat[k] = jnp.asarray(v, dtype=flat_params[k].dtype)

    nested = flax.traverse_util.unflatten_dict(
        {tuple(k.split(".")): v for k, v in new_flat.items()})
    out = dict(variables)
    out["params"] = nested
    return out
