"""Pallas TPU kernels for the bandwidth-bound hot ops.

Two kernels, both of the shape "stream big-M tiles through VMEM, carry a
running reduction for a block of queries":

* ``correspondence_argmax``: per query pixel, argmax + log-softmax value
  of q @ k^T over ~80k keys (inference.py:142-149).  The XLA version in
  ops/similarity.py materializes an (N, chunk) logits tile in HBM per
  fori_loop step; this kernel keeps the tile in VMEM and writes only the
  (N,) results.
* ``nn_min``: nearest-neighbor min-distance (+ index) over point-cloud
  tiles — the inner primitive of Chamfer/ICP/ADD-S (icp.py:113-116).

Both use a 2D grid (query tiles x key tiles): the key-tile axis is the
*minor* grid dimension, so each query tile's carries live in VMEM scratch
across the key sweep and outputs are written once at the last key tile.
Inputs are padded to (8, 128)-aligned tiles by the host wrappers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_BIG = 1e30


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------- argmax


def _corr_kernel(q_ref, k_ref, mask_ref, idx_ref, conf_ref, best, arg, m_run, s_run):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best[:] = jnp.full_like(best, _NEG)
        arg[:] = jnp.zeros_like(arg)
        m_run[:] = jnp.full_like(m_run, _NEG)
        s_run[:] = jnp.zeros_like(s_run)

    q = q_ref[:]                      # (TN, E)
    k = k_ref[:]                      # (TM, E)
    valid = mask_ref[:]               # (1, TM)
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    )  # (TN, TM)
    logits = jnp.where(valid > 0, logits, _NEG)

    # streaming logsumexp
    tile_max = jnp.max(logits, axis=1, keepdims=True)      # (TN, 1)
    m_new = jnp.maximum(m_run[:], tile_max)
    s_run[:] = s_run[:] * jnp.exp(m_run[:] - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=1, keepdims=True
    )
    m_run[:] = m_new

    # streaming argmax
    TM = logits.shape[1]
    a = jnp.argmax(logits, axis=1)[:, None]                # (TN, 1)
    v = jnp.max(logits, axis=1, keepdims=True)
    better = v > best[:]
    arg[:] = jnp.where(better, a + j * TM, arg[:])
    best[:] = jnp.where(better, v, best[:])

    @pl.when(j == nj - 1)
    def _emit():
        idx_ref[:] = arg[:]
        conf_ref[:] = best[:] - (m_run[:] + jnp.log(jnp.maximum(s_run[:], 1e-30)))


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def correspondence_argmax(
    queries: jnp.ndarray,
    keys: jnp.ndarray,
    tile_n: int = 256,
    tile_m: int = 2048,
    interpret: bool | None = None,
):
    """queries (N, E), keys (M, E) -> (idx (N,) int32, conf (N,))."""
    interpret = _interpret_default() if interpret is None else interpret
    N, E = queries.shape
    M = keys.shape[0]
    pad_n = (-N) % tile_n
    pad_m = (-M) % tile_m
    pad_e = (-E) % 128
    q = jnp.pad(queries, ((0, pad_n), (0, pad_e)))
    k = jnp.pad(keys, ((0, pad_m), (0, pad_e)))
    mask = jnp.pad(jnp.ones((1, M), jnp.float32), ((0, 0), (0, pad_m)))
    Np, Mp = N + pad_n, M + pad_m

    grid = (Np // tile_n, Mp // tile_m)
    idx, conf = pl.pallas_call(
        _corr_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, E + pad_e), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, E + pad_e), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, mask)
    return idx[:N, 0], conf[:N, 0]


# ---------------------------------------------------------------- nn min


def _nn_kernel(q_ref, rT_ref, mask_ref, d_ref, i_ref, best, arg, *, ndim):
    """Per-coordinate broadcast distances: for D=3 points the matmul
    expansion (q2 + r2 - 2 q.rT) needs the contraction dim padded to the
    128-lane MXU width and HIGHEST (6-pass) precision to keep f32
    exactness — ~40x the arithmetic actually required.  Three VPU
    broadcast-subtract-square passes are exact f32 at the true op count
    (measured 35.9 -> 2.9 ms for 16k x 41k queries on v5e)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        best[:] = jnp.full_like(best, _BIG)
        arg[:] = jnp.zeros_like(arg)

    q = q_ref[:]                      # (TN, >=8 lanes; first ndim real)
    rT = rT_ref[:]                    # (8, TM) sublane-padded transpose
    valid = mask_ref[:]               # (1, TM)
    d = None
    for k in range(ndim):             # static unroll (ndim is 3)
        diff = q[:, k : k + 1] - rT[k : k + 1, :]   # (TN, TM)
        d = diff * diff if d is None else d + diff * diff
    d = jnp.where(valid > 0, d, _BIG)

    TM = d.shape[1]
    a = jnp.argmin(d, axis=1)[:, None]
    v = jnp.min(d, axis=1, keepdims=True)
    better = v < best[:]
    arg[:] = jnp.where(better, a + j * TM, arg[:])
    best[:] = jnp.where(better, v, best[:])

    @pl.when(j == nj - 1)
    def _emit():
        d_ref[:] = jnp.sqrt(best[:])
        i_ref[:] = arg[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def nn_min(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    ref_mask: jnp.ndarray | None = None,
    tile_n: int = 512,
    tile_m: int = 2048,
    interpret: bool | None = None,
):
    """query (N, 3), ref (M, 3) -> (dist (N,), idx (N,) int32)."""
    interpret = _interpret_default() if interpret is None else interpret
    N, D = query.shape
    M = ref.shape[0]
    pad_n = (-N) % tile_n
    pad_m = (-M) % tile_m
    # the kernel reads q one coordinate column at a time (no MXU), so the
    # lane pad only needs the fp32 packing minimum — 128-lane padding would
    # move ~16x the real query bytes per block (ADVICE r4)
    pad_d = (-D) % 8
    q = jnp.pad(query, ((0, pad_n), (0, pad_d)))
    # ref travels TRANSPOSED (sublane-padded to 8): the kernel reads one
    # (1, TM) coordinate row per axis — no MXU, no 128-lane D padding
    rT = jnp.pad(ref.T, ((0, (-D) % 8), (0, pad_m)))
    m = jnp.ones((M,), jnp.float32) if ref_mask is None else ref_mask.astype(jnp.float32)
    mask = jnp.pad(m[None, :], ((0, 0), (0, pad_m)))
    Np, Mp = N + pad_n, M + pad_m

    grid = (Np // tile_n, Mp // tile_m)
    d, i = pl.pallas_call(
        functools.partial(_nn_kernel, ndim=D),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, D + pad_d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D + (-D) % 8, tile_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Np, 1), jnp.float32),
            jax.ShapeDtypeStruct((Np, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q, rT, mask)
    return d[:N, 0], i[:N, 0]


def chamfer_distance(a: jnp.ndarray, b: jnp.ndarray, interpret: bool | None = None) -> jnp.ndarray:
    d_ab, _ = nn_min(a, b, interpret=interpret)
    d_ba, _ = nn_min(b, a, interpret=interpret)
    return (d_ab.mean() + d_ba.mean()) / 2.0
