"""Pallas-inside-shard_map on REAL TPU hardware, 1-device mesh.

Multi-chip hardware doesn't exist in this environment, but a 1-device
mesh still compiles and runs the exact shard_map programs the sharded
paths use — including the pallas_call kernels inside them (Mosaic under
manual partitioning). This is the closest available evidence for the
NEXT.md Pallas-under-mesh caveat; run it whenever the tunnel is up:

    python scripts/check_mesh1_tpu.py [impl]

Each sharded path is compared against ITS OWN single-device kernel
(exact-equality contract — the quantized rungs intentionally diverge
from the bf16 oracle on iid near-tie data, see test_quant4.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from mmrs_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def main() -> int:
    impl = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    dev = jax.devices()[0]
    print("device:", dev, "impl:", impl)
    mesh = Mesh(np.asarray([dev]).reshape(1, 1), (DATA_AXIS, MODEL_AXIS))

    rng = np.random.default_rng(0)
    n, d, q_n, k = 4096, 256, 8, 10
    g = rng.standard_normal((n, d)).astype(np.float32)
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    q = rng.standard_normal((q_n, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    gj = jnp.asarray(g, jnp.bfloat16)
    qj = jnp.asarray(q, jnp.bfloat16)

    ok = True

    def check(name, got_i, want_i):
        nonlocal ok
        agree = (np.asarray(got_i) == np.asarray(want_i)).mean()
        good = agree == 1.0
        ok = ok and good
        print(f"{name}: sharded vs single-device ids "
              f"{agree:.3f} {'OK' if good else 'MISMATCH'}")

    from mmrs_tpu.ops.topk import cosine_topk
    from mmrs_tpu.parallel.topk import (place_gallery,
                                        place_gallery_quantized,
                                        sharded_cosine_topk,
                                        sharded_cosine_topk_quantized)

    _, want = cosine_topk(qj, gj, k, impl=impl)
    gs = place_gallery(gj, mesh)
    _, i = sharded_cosine_topk(qj, gs, k, mesh, impl=impl, n_valid=n)
    check("bf16 scan kernel under shard_map", i, want)

    from mmrs_tpu.ops.quant import cosine_topk_quantized, quantize_rows

    q8g, q8s = quantize_rows(jnp.asarray(g))
    _, want = cosine_topk_quantized(jnp.asarray(q), q8g, q8s, k, impl=impl)
    g8, s8 = place_gallery_quantized(jnp.asarray(g), mesh)
    _, i = sharded_cosine_topk_quantized(jnp.asarray(q), g8, s8, k, mesh,
                                         impl=impl, n_valid=n)
    check("int8 scan kernel under shard_map", i, want)

    from mmrs_tpu.ops.quant4 import cosine_topk_int4, quantize_rows_int4
    from mmrs_tpu.parallel.quant4 import (place_gallery_int4,
                                          sharded_cosine_topk_int4)

    q4g, q4s = quantize_rows_int4(jnp.asarray(g))
    _, want = cosine_topk_int4(jnp.asarray(q), q4g, q4s, k, impl=impl)
    g4, s4 = place_gallery_int4(jnp.asarray(g), mesh)
    _, i = sharded_cosine_topk_int4(jnp.asarray(q), g4, s4, k, mesh,
                                    impl=impl, n_valid=n)
    check("int4 scan kernel under shard_map", i, want)

    from mmrs_tpu.index.ivf import build_ivf, ivf_topk
    from mmrs_tpu.parallel.ivf import place_ivf, sharded_ivf_topk

    ivf = build_ivf(g, n_clusters=16, iters=3, dtype=jnp.bfloat16)
    _, want = ivf_topk(jnp.asarray(q), ivf, k=k, nprobe=16, impl=impl)
    sivf = place_ivf(ivf, mesh)
    _, si = sharded_ivf_topk(jnp.asarray(q), sivf, k=k, nprobe=16,
                             mesh=mesh, impl=impl)
    check("IVF probe kernel under shard_map", si, want)

    ivf4 = build_ivf(g, n_clusters=16, iters=3, quantize="int4")
    _, want = ivf_topk(jnp.asarray(q), ivf4, k=k, nprobe=16, impl=impl)
    sivf4 = place_ivf(ivf4, mesh)
    _, si = sharded_ivf_topk(jnp.asarray(q), sivf4, k=k, nprobe=16,
                             mesh=mesh, impl=impl)
    check("int4 IVF probe kernel under shard_map", si, want)

    print("mesh1 pallas-under-shard_map:", "ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
