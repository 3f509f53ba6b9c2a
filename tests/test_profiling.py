"""trace capture + op-table summarization (CPU backend)."""

import jax
import jax.numpy as jnp
import numpy as np

from mmrs_tpu.utils.profiling import profile_to, trace_op_table


def test_trace_op_table(tmp_path):
    @jax.jit
    def f(x):
        return jnp.dot(x, x.T).sum()

    x = jnp.ones((256, 256))
    np.asarray(f(x))
    with profile_to(str(tmp_path)):
        np.asarray(f(x))
    rows = trace_op_table(str(tmp_path), device_substr="CPU")
    assert rows and all(isinstance(r[1], float) for r in rows)
