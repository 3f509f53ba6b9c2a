import sys, jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
sys.path.insert(0, "/root/repo")
from bench import pipelined_seconds

def kern(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :] * 2.0

def tiny(x):
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(x)

for L in (1, 8, 32):
    @jax.jit
    def f(x):
        y = x
        for _ in range(L):
            y = tiny(y)
        return y[0, :8]
    x = jnp.ones((8, 128), jnp.float32)
    xs = [x * (1 + i*1e-3) for i in range(4)]
    per = pipelined_seconds(lambda xx: f(xx), xs * 6,
                            lambda r: np.asarray(r[0], np.float32)) / L
    print(f"L={L}: {per*1e6:.1f} us per tiny pallas_call", flush=True)

# same but a plain XLA op chain for comparison
for L in (32,):
    @jax.jit
    def g(x):
        y = x
        for _ in range(L):
            y = y * 2.0 + 1.0
        return y[0, :8]
    x = jnp.ones((8, 128), jnp.float32)
    xs = [x * (1 + i*1e-3) for i in range(4)]
    per = pipelined_seconds(lambda xx: g(xx), xs * 6,
                            lambda r: np.asarray(r[0], np.float32)) / L
    print(f"XLA chain L={L}: {per*1e6:.2f} us per op", flush=True)
