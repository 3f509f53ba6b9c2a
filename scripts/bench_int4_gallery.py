import sys, time
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from bench import pipelined_seconds
from mmrs_tpu.ops.quant4 import quantize_rows_int4, cosine_topk_int4
from mmrs_tpu.ops.quant import quantize_rows, cosine_topk_quantized
from mmrs_tpu.ops.topk import cosine_topk

N, D, Q, K = 1_000_000, 512, 64, 10
print("devices:", jax.devices(), file=sys.stderr, flush=True)

# generate gallery ON DEVICE (CLAUDE.md: host gen is 15+ min)
@jax.jit
def gen(key):
    g = jax.random.normal(key, (N, D), jnp.float32)
    return g / jnp.linalg.norm(g, axis=1, keepdims=True)
g = gen(jax.random.key(0)); g.block_until_ready()
q = gen(jax.random.key(1))[:Q]; q = jnp.asarray(q)

# correctness spot-check on chip: int4 kernel vs int4 xla oracle (exact)
packed, scales = quantize_rows_int4(g)
jax.block_until_ready((packed, scales))
print("packed bytes:", packed.nbytes + scales.nbytes, flush=True)
vx, ix = cosine_topk_int4(q[:8], packed, scales, k=K, impl="xla")
vp, ip = cosine_topk_int4(q[:8], packed, scales, k=K, impl="pallas")
exact_i = np.array_equal(np.asarray(ix), np.asarray(ip))
exact_v = np.array_equal(np.asarray(vx), np.asarray(vp))
print("on-chip kernel exact vs oracle: idx", exact_i, "vals", exact_v, flush=True)

qs = [q * (1 + i*1e-3) for i in range(4)]
def t(fn, tag):
    per = pipelined_seconds(fn, qs * 6, lambda r: np.asarray(r[0][0], np.float32))
    print(f"{tag}: {per*1e3:.3f} ms / {Q}-query batch", flush=True)
    return per

for tile in (4096, 8192, 16384):
    try:
        t(lambda qq, tile=tile: cosine_topk_int4(qq, packed, scales, k=K, impl="pallas", tile_n=tile), f"int4 pallas tile{tile}")
    except Exception as e:
        print(f"int4 tile{tile} FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)

g8, s8 = quantize_rows(g)
jax.block_until_ready((g8, s8))
for tile in (4096, 8192):
    try:
        t(lambda qq, tile=tile: cosine_topk_quantized(qq, g8, s8, k=K, tile_n=tile),
          f"int8 pallas tile{tile}")
    except Exception as e:
        print(f"int8 tile{tile} FAILED {type(e).__name__}: {str(e)[:150]}", flush=True)
gb = g.astype(jnp.bfloat16)
del g8, s8
gb.block_until_ready()
t(lambda qq: cosine_topk(qq.astype(jnp.bfloat16), gb, k=K), "bf16 pallas tile2048")
