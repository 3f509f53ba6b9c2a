"""Param-tree checkpoints.

Two formats:
  - npz: flat '/'-keyed arrays — dependency-free, mmap-able, good for the
    converted CLIP/Taiyi weights (the analog of the reference's .pt caches,
    code/utils.py:101-131).
  - orbax: for training state (adapter runs), matching SURVEY.md §5's
    checkpoint story.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


_BF16_SUFFIX = "@bf16"


def save_npz(params: Dict[str, Any], path: str) -> None:
    import ml_dtypes

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(jax.tree.map(np.asarray, params))
    out = {}
    for k, v in flat.items():
        if v.dtype == ml_dtypes.bfloat16:
            # npz has no bfloat16: store the raw bits as uint16 + marker.
            out[k + _BF16_SUFFIX] = v.view(np.uint16)
        else:
            out[k] = v
    tmp = path + ".tmp"
    np.savez(tmp, **out)
    # np.savez appends .npz to the name it's given
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_npz(path: str, to_device: bool = True) -> Dict[str, Any]:
    import jax.numpy as jnp
    import ml_dtypes

    with np.load(path) as z:
        flat = {}
        for k in z.files:
            v = z[k]
            if k.endswith(_BF16_SUFFIX):
                flat[k[: -len(_BF16_SUFFIX)]] = v.view(ml_dtypes.bfloat16)
            else:
                flat[k] = v
    tree = _unflatten(flat)
    if to_device:
        tree = jax.tree.map(jnp.asarray, tree)
    return tree


def save_orbax(state: Any, directory: str) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), state, force=True)
    ckptr.wait_until_finished()


def load_orbax(directory: str, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(directory), template)
