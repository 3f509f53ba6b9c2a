import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from bench_ivf import _gen_chunk, make_chunks, CHUNK, DIM
from mmrs_tpu.index.ivf import build_ivf_streaming, ivf_topk
from mmrs_tpu.ops.quant4 import quantize_rows_int4, cosine_topk_int4

n_chunks = 16
n = n_chunks * CHUNK
ivf = build_ivf_streaming(make_chunks(n_chunks), n, DIM, n_clusters=1024,
                          iters=5, chunk=CHUNK, quantize="int4")
words, scales = [], []
for i in range(n_chunks):
    w, s = quantize_rows_int4(_gen_chunk(jax.random.key(i)).astype(jnp.float32))
    words.append(w); scales.append(s)
packed = jnp.concatenate(words, axis=1); sc = jnp.concatenate(scales)
qd = _gen_chunk(jax.random.key(10_000))[:64].astype(jnp.float32)
fv, fi = cosine_topk_int4(qd, packed, sc, k=10)
av, ai = ivf_topk(qd, ivf, k=10, nprobe=1024)
fv, av = np.asarray(fv, np.float64), np.asarray(av, np.float64)
fi, ai = np.asarray(fi), np.asarray(ai)
print("max |value diff| at full probe:", np.abs(fv - av).max())
mism = fi != ai
print("id mismatches:", mism.sum(), "of", fi.size)
if mism.any():
    r, c = np.argwhere(mism)[0]
    print("example row: flat ids", fi[r], "vals", fv[r])
    print("             ivf  ids", ai[r], "vals", av[r])
