import sys, jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from bench import pipelined_seconds
from mmrs_tpu.models.layers import QTensor, matmul

K, N, B, L = 4096, 11008, 16, 8

# on-device s4 creation inside jit
@jax.jit
def make_s4(k):
    q = jax.random.randint(k, (L, K, N), -7, 8, jnp.int8)
    return q.astype(jnp.int4)

try:
    w4 = make_s4(jax.random.key(1))
    w4.block_until_ready()
    print("s4 creation OK; nbytes =", w4.nbytes, "(packed would be", L*K*N//2, ")", flush=True)
except Exception as e:
    print("s4 creation FAILED:", type(e).__name__, str(e)[:200], flush=True)
    sys.exit(0)

x = jax.random.normal(jax.random.key(0), (B, K), jnp.bfloat16)

# candidate 1: int8-activation x s4 dot -> int32
@jax.jit
def f_s4dot(x, w4):
    xq = jnp.round(x.astype(jnp.float32) * 8).astype(jnp.int8)
    out = jnp.zeros((B, N), jnp.float32)
    for i in range(L):
        acc = jax.lax.dot_general(xq, w4[i], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        out = out + acc.astype(jnp.float32)
    return out[0, :8]

# candidate 2: s4 -> bf16 convert then bf16 dot (XLA chooses fusion)
@jax.jit
def f_s4bf(x, w4):
    out = jnp.zeros((B, N), jnp.float32)
    for i in range(L):
        acc = jax.lax.dot_general(x, w4[i].astype(jnp.bfloat16),
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = out + acc
    return out[0, :8]

# int8 baseline in-process
q8 = jax.jit(lambda k: jax.random.randint(k, (L, K, N), -127, 128, jnp.int8))(jax.random.key(2))
s8 = jnp.full((L, N), 2e-4, jnp.float32)
@jax.jit
def f8(x, q8, s8):
    out = jnp.zeros((B, N), jnp.float32)
    for i in range(L):
        out = out + matmul(x, QTensor(q8[i], s8[i]), jnp.bfloat16, jnp.float32)
    return out[0, :8]

xs = [x * (1 + i*1e-3) for i in range(4)]
per8 = pipelined_seconds(lambda xx: f8(xx, q8, s8), xs*6, lambda r: np.asarray(r[0], np.float32)) / L
print(f"int8: {per8*1e6:.1f} us -> {K*N/per8/1e9:.0f} GB/s", flush=True)

for tag, fn in [("s4_int8dot", lambda xx: f_s4dot(xx, w4)),
                ("s4_bf16dot", lambda xx: f_s4bf(xx, w4))]:
    try:
        per = pipelined_seconds(fn, xs*6, lambda r: np.asarray(r[0], np.float32)) / L
        print(f"{tag}: {per*1e6:.1f} us -> {K*N/2/per/1e9:.0f} GB/s packed; {per8/per:.2f}x vs int8", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
