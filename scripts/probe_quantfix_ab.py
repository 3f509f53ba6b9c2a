"""Interleaved A/B of _quantize_act forms on the real chip (r5 #1).

A = reduce-then-upcast (working tree): abs-max on x's own dtype, only the
    reduced scalar row converts to f32.
B = upcast-then-reduce (r4): x.astype(f32) feeds both the reduce and the
    round — the shared f32 tensor is what the trace blamed for 1.06 ms of
    relayout copies.

Both A and B run the SAME hbtd attention (whatever layers.py currently
has); trials interleave ABAB... so tunnel drift hits both arms equally.

Run: python scripts/probe_quantfix_ab.py [n_trials]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import mmrs_tpu.models.layers as L


def _quantize_act_old(x):
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True),
                     1e-12) / 127.0
    return jnp.round(x32 / sx).astype(jnp.int8), sx


def main(n_trials: int = 5):
    sys.path.insert(0, "/root/repo")
    from scripts.probe_int8_tower import build

    new = L._quantize_act
    arms = {}
    for tag, fn in (("A:new", new), ("B:old", _quantize_act_old)):
        L._quantize_act = fn
        embed, params, img = build(True)
        np.asarray(embed(params, img)[0, 0], np.float32)   # compile
        arms[tag] = (embed, params, img)
    L._quantize_act = new

    times = {t: [] for t in arms}
    for trial in range(n_trials):
        for tag, (embed, params, img) in arms.items():
            np.asarray(embed(params, img)[0, 0], np.float32)  # warm
            t0 = time.perf_counter()
            out = None
            for _ in range(24):
                out = embed(params, img)
            np.asarray(out[0, 0], np.float32)
            total = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(embed(params, img)[0, 0], np.float32)
            single = time.perf_counter() - t0
            per = (total - single) / 23
            times[tag].append(per * 1e3)
            print(f"trial {trial} {tag}: {per*1e3:.2f} ms/batch",
                  flush=True)
    for tag, ts in times.items():
        ts = sorted(ts)
        print(f"{tag}: median {ts[len(ts)//2]:.2f} min {ts[0]:.2f} "
              f"max {ts[-1]:.2f} ms/batch (n={len(ts)})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5)
