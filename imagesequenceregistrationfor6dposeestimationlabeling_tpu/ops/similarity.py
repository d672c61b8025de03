"""Dense query-key correspondence — the flagship inference matmul.

Replaces ``getCors`` (inference.py:142-149): per query pixel, the argmax
and value of ``log_softmax(queries @ keys^T)`` over ~80k surface keys.
The (N, M) logits never materialize: we stream key tiles through the MXU
carrying (running max logit, argmax, running logsumexp).  A Pallas kernel
version lives in ops/pallas_kernels.py; this XLA version is the reference
implementation and CPU fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def correspondence_argmax(
    queries: jnp.ndarray, keys: jnp.ndarray, chunk: int = 8192
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """queries (N, E), keys (M, E) -> (idx (N,), conf (N,)).

    conf is the max of log_softmax over keys: max_logit - logsumexp.
    Dispatches to the fused Pallas kernel on TPU (~100x less HBM traffic);
    the XLA tiling below is the reference implementation / CPU path.
    """
    if jax.default_backend() == "tpu":
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pallas_kernels

        return pallas_kernels.correspondence_argmax(queries, keys, interpret=False)
    return _correspondence_argmax_xla(queries, keys, chunk)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _correspondence_argmax_xla(
    queries: jnp.ndarray, keys: jnp.ndarray, chunk: int = 8192
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    N, E = queries.shape
    M = keys.shape[0]
    pad = (-M) % chunk
    keys_p = jnp.pad(keys, ((0, pad), (0, 0)))
    n_chunks = (M + pad) // chunk
    keys_c = keys_p.reshape(n_chunks, chunk, E)
    valid_last = M - (n_chunks - 1) * chunk

    def body(i, carry):
        best, arg, m_run, s_run = carry
        logits = jnp.matmul(queries, keys_c[i].T, precision=jax.lax.Precision.HIGHEST)
        n_valid = jnp.where(i == n_chunks - 1, valid_last, chunk)
        col = jnp.arange(chunk)
        mask = col[None, :] < n_valid
        logits = jnp.where(mask, logits, -jnp.inf)
        # streaming logsumexp
        m_new = jnp.maximum(m_run, logits.max(-1))
        s_run = s_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(logits - m_new[:, None]), axis=-1
        )
        m_run = m_new
        # streaming argmax
        a = jnp.argmax(logits, axis=-1)
        v = jnp.take_along_axis(logits, a[:, None], axis=-1)[:, 0]
        better = v > best
        arg = jnp.where(better, a + i * chunk, arg)
        best = jnp.where(better, v, best)
        return best, arg, m_run, s_run

    init = (
        jnp.full((N,), -jnp.inf),
        jnp.zeros((N,), jnp.int32),
        jnp.full((N,), -jnp.inf),
        jnp.zeros((N,)),
    )
    best, arg, m_run, s_run = jax.lax.fori_loop(0, n_chunks, body, init)
    conf = best - (m_run + jnp.log(s_run))
    return arg, conf


def confidence_threshold(conf: jnp.ndarray, valid: jnp.ndarray, keep_frac: float = 0.8):
    """Top-`keep_frac` confidence filter (inference.py:282-290): returns a
    boolean mask of valid pixels above the (1-keep_frac) quantile."""
    n_valid = jnp.maximum(valid.sum(), 1)
    masked = jnp.where(valid, conf, jnp.inf)
    # threshold = value at rank floor((1-keep)*n_valid) among valid (ascending)
    k = jnp.floor((1.0 - keep_frac) * n_valid).astype(jnp.int32)
    sorted_conf = jnp.sort(jnp.where(valid, conf, jnp.inf))
    thresh = sorted_conf[jnp.clip(k, 0, conf.shape[0] - 1)]
    return valid & (conf >= thresh)
