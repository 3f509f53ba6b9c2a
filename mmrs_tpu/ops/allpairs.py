"""Tiled all-pairs similarity with threshold — Pallas TPU kernel.

The semantic-dedup engine replacing the reference's O(N^2) Python hash loops:
  - intra-set dedup (tool/find_repeated_in_same_folder.py:56-106): for each
    row i, find the FIRST earlier row j < i with cosine >= tau. Rows with a
    match are duplicates of an earlier keeper ("keep-first" semantics; the
    chain is resolved on host).
  - cross-set leakage (tool/delete repeated.py:11-162): for each train row,
    find the first test row with cosine >= tau.

TPU-first design: the N x N similarity matrix is NEVER materialized — a 2-D
grid of (row-tile, col-tile) steps runs each [TILE, D] x [D, TILE] block on
the MXU and reduces it immediately to a per-row running minimum matching
column index in VMEM scratch. Output is a fixed-shape [N] int32 vector
(first matching column, or -1) — no dynamic sparse emission, which XLA/TPU
cannot do efficiently.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2**30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(tau_ref, nrows_ref, ncols_ref, offs_ref, a_ref, b_ref, out_ref,
            run_min, *, tile: int, intra: bool):
    i = pl.program_id(0)   # row tile
    j = pl.program_id(1)   # col tile (inner loop)
    num_j = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        run_min[:] = jnp.full_like(run_min, BIG)

    a = a_ref[:]           # [TILE, D]
    b = b_ref[:]           # [TILE, D]
    sims = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                      # [TILE, TILE] rows=a cols=b

    row_ids = i * tile + jax.lax.broadcasted_iota(jnp.int32, sims.shape, 0)
    col_ids = j * tile + jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)

    tau = tau_ref[0]
    mask = sims >= tau
    mask &= col_ids < ncols_ref[0]
    mask &= row_ids < nrows_ref[0]
    if intra:
        # Global ordering constraint: only earlier GLOBAL rows count as
        # keepers. Offsets place this shard's rows/cols in the full matrix
        # (sharded ring dedup passes non-zero offsets).
        mask &= (col_ids + offs_ref[1]) < (row_ids + offs_ref[0])

    cand = jnp.where(mask, col_ids, BIG)
    tile_min = jnp.min(cand, axis=1, keepdims=True)       # [TILE, 1]
    run_min[:] = jnp.minimum(run_min[:], tile_min)

    @pl.when(j == num_j - 1)
    def _finish():
        out_ref[:] = jnp.where(run_min[:] >= BIG, -1, run_min[:])


def _first_match_pallas(
    a: jnp.ndarray,        # [N, D] rows to test
    b: jnp.ndarray,        # [M, D] candidate keepers
    tau: float,
    intra: bool,
    row_offset=0,
    col_offset=0,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    n, d = a.shape
    m = b.shape[0]
    dp = _round_up(d, 128)
    np_ = _round_up(n, tile)
    mp = _round_up(m, tile)

    a_p = jnp.zeros((np_, dp), a.dtype).at[:n, :d].set(a)
    b_p = jnp.zeros((mp, dp), b.dtype).at[:m, :d].set(b)
    offs = jnp.stack([jnp.asarray(row_offset, jnp.int32),
                      jnp.asarray(col_offset, jnp.int32)])

    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, intra=intra),
        grid=(np_ // tile, mp // tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tau
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n rows
            pl.BlockSpec(memory_space=pltpu.SMEM),   # n cols
            pl.BlockSpec(memory_space=pltpu.SMEM),   # [row_offset, col_offset]
            pl.BlockSpec((tile, dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, 1), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tile, 1), jnp.int32)],
        interpret=interpret,
    )(
        jnp.asarray([tau], jnp.float32),
        jnp.asarray([n], jnp.int32),
        jnp.asarray([m], jnp.int32),
        offs,
        a_p,
        b_p,
    )
    return out[:n, 0]


def _first_match_xla(a, b, tau, intra, row_offset=0, col_offset=0):
    sims = jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32).T,
                   preferred_element_type=jnp.float32)
    n, m = sims.shape
    mask = sims >= tau
    if intra:
        col = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1) + jnp.asarray(col_offset, jnp.int32)
        row = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0) + jnp.asarray(row_offset, jnp.int32)
        mask &= col < row
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
    cand = jnp.where(mask, col_ids, BIG)
    first = jnp.min(cand, axis=1)
    return jnp.where(first >= BIG, -1, first)


@functools.partial(jax.jit, static_argnames=("intra", "impl", "tile"))
def first_match(
    a: jnp.ndarray,
    b: jnp.ndarray,
    tau: float,
    intra: bool = False,
    row_offset=0,
    col_offset=0,
    impl: str = "auto",
    tile: int = 512,
) -> jnp.ndarray:
    """For each row of `a`, LOCAL index of the first row of `b` with
    cosine >= tau (or -1). With `intra=True`, only columns whose GLOBAL id
    (local + col_offset) precedes the row's global id (local + row_offset)
    count — keep-first dedup semantics; pass offsets of 0 when a and b are
    the same un-sharded matrix.

    Both inputs must be L2-normalized.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "xla":
        return _first_match_xla(a, b, tau, intra, row_offset, col_offset)
    if impl == "pallas":
        return _first_match_pallas(a, b, tau, intra, row_offset, col_offset,
                                   tile=tile)
    if impl == "pallas_interpret":
        return _first_match_pallas(a, b, tau, intra, row_offset, col_offset,
                                   tile=tile, interpret=True)
    raise ValueError(f"unknown impl {impl!r}")


def dedup_groups(first: jnp.ndarray) -> Tuple[list, dict]:
    """Resolve first-match chains on host: returns (keeper row list,
    {dup_row: keeper_row}). A row whose first-match is -1 is a keeper;
    otherwise it is a duplicate of its (transitively resolved) keeper."""
    import numpy as np

    f = np.asarray(first)
    keeper_of = {}
    keepers = []
    for i in range(len(f)):
        j = int(f[i])
        if j < 0:
            keepers.append(i)
        else:
            keeper_of[i] = keeper_of.get(j, j)
    return keepers, keeper_of
