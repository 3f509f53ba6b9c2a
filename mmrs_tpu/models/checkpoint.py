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


# int8-quantized kernels (layers.QTensor) store as a pair of arrays so a
# 7 GB int8 verifier loads directly instead of re-quantizing 13.5 GB of
# bf16 at startup
_Q8_Q = "@int8q"
_Q8_S = "@int8s"


def _flatten(tree: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    from mmrs_tpu.models.layers import QTensor

    out: Dict[str, np.ndarray] = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        elif isinstance(v, QTensor):
            out[key + _Q8_Q] = np.asarray(v.q)
            out[key + _Q8_S] = np.asarray(v.s)
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    from mmrs_tpu.models.layers import QTensor

    qpairs: Dict[str, list] = {}
    plain: Dict[str, Any] = {}
    for key, v in flat.items():
        if key.endswith(_Q8_Q):
            qpairs.setdefault(key[: -len(_Q8_Q)], [None, None])[0] = v
        elif key.endswith(_Q8_S):
            qpairs.setdefault(key[: -len(_Q8_S)], [None, None])[1] = v
        else:
            plain[key] = v
    for base, (q, s) in qpairs.items():
        if q is None or s is None:
            raise ValueError(f"checkpoint is missing half of QTensor {base!r}")
        plain[base] = QTensor(q, s)

    tree: Dict[str, Any] = {}
    for key, v in plain.items():
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


def load_npz(path: str, to_device: bool = True,
             placement=None) -> Dict[str, Any]:
    """Load a param tree.

    `placement` (optional): `flat_key -> jax.sharding.Sharding | None`.
    npz members are lazy, so each array is device_put with its target
    sharding AS IT IS READ — host peak stays at one leaf and sharded
    serving (e.g. a TP-placed 7B, parallel/vlm.llava_checkpoint_placement)
    skips the load-replicated-then-reshard double peak. Keys keep their
    `@int8q`/`@int8s` QTensor suffixes (scales shard differently from
    their weights); the `@bf16` storage marker is stripped first.
    """
    import jax.numpy as jnp
    import ml_dtypes

    with np.load(path) as z:
        flat = {}
        for k in z.files:
            v = z[k]
            if k.endswith(_BF16_SUFFIX):
                k = k[: -len(_BF16_SUFFIX)]
                v = v.view(ml_dtypes.bfloat16)
            if placement is not None:
                sh = placement(k)
                v = jax.device_put(v, sh) if sh is not None else jnp.asarray(v)
            flat[k] = v
    tree = _unflatten(flat)
    if to_device and placement is None:
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
