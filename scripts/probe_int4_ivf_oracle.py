"""Is the int4-IVF 0.80 recall the INDEX or the QUANTIZATION?
Compare int4 IVF ids vs the int4 FLAT scan (same packed math) at 1M."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from bench_ivf import _gen_chunk, make_chunks, CHUNK, DIM
from mmrs_tpu.index.ivf import build_ivf_streaming, ivf_topk
from mmrs_tpu.ops.quant4 import quantize_rows_int4, cosine_topk_int4

n_chunks = 16
n = n_chunks * CHUNK
print("building int4 ivf...", flush=True)
ivf = build_ivf_streaming(make_chunks(n_chunks), n, DIM, n_clusters=1024,
                          iters=5, chunk=CHUNK, quantize="int4")
jax.block_until_ready(ivf.buckets)

# flat int4 gallery from the same chunks
print("packing flat int4...", flush=True)
words = []
scales = []
for i in range(n_chunks):
    w, s = quantize_rows_int4(_gen_chunk(jax.random.key(i)).astype(jnp.float32))
    words.append(w); scales.append(s)
packed = jnp.concatenate(words, axis=1)
sc = jnp.concatenate(scales)
jax.block_until_ready((packed, sc))

qd = _gen_chunk(jax.random.key(10_000))[:64].astype(jnp.float32)
fv, fi = cosine_topk_int4(qd, packed, sc, k=10)
fi = np.asarray(fi)
for nprobe in (32, 128, 1024):
    av, ai = ivf_topk(qd, ivf, k=10, nprobe=nprobe)
    ai = np.asarray(ai)
    rec = np.mean([len(set(ai[r]) & set(fi[r])) / 10 for r in range(64)])
    top1 = (ai[:, 0] == fi[:, 0]).mean()
    print(f"nprobe={nprobe}: recall vs INT4-flat oracle {rec:.4f}  top1 {top1:.3f}",
          flush=True)
