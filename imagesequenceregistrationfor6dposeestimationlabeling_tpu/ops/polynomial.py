"""Batched polynomial root finding (Durand-Kerner) for TPU.

``jnp.roots`` needs a general eigendecomposition, which XLA does not
support on TPU; Durand-Kerner is a fixed-iteration, fully-vectorized
simultaneous root iteration in complex arithmetic — perfect for vmapped
P3P quartics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def durand_kerner(coeffs: jnp.ndarray, n_iters: int = 40) -> jnp.ndarray:
    """Roots of sum_k coeffs[..., k] x^(D-k) (highest degree first).

    coeffs: (..., D+1) real or complex, leading coefficient must be
    nonzero (callers normalize/guard).  Returns (..., D) complex roots.
    """
    coeffs = coeffs.astype(jnp.complex64)
    lead = coeffs[..., 0:1]
    c = coeffs / jnp.where(jnp.abs(lead) < 1e-30, 1e-30, lead)
    D = c.shape[-1] - 1

    # standard initialization: powers of (0.4 + 0.9i)
    w = jnp.power(jnp.complex64(0.4 + 0.9j), jnp.arange(D))
    roots = jnp.broadcast_to(w, c.shape[:-1] + (D,))

    def poly_eval(c, x):
        # Horner over the last axis of c
        def body(i, acc):
            return acc * x + c[..., i][..., None]

        acc = jnp.broadcast_to(c[..., 0][..., None], x.shape).astype(jnp.complex64)
        return jax.lax.fori_loop(1, D + 1, body, acc)

    def step(_, roots):
        p = poly_eval(c, roots)  # (..., D)
        diff = roots[..., :, None] - roots[..., None, :]  # (..., D, D)
        eye = jnp.eye(D, dtype=bool)
        diff = jnp.where(eye, 1.0 + 0j, diff)
        denom = jnp.prod(diff, axis=-1)
        denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20 + 0j, denom)
        return roots - p / denom

    return jax.lax.fori_loop(0, n_iters, step, roots)


def real_roots_mask(roots: jnp.ndarray, tol: float = 1e-3) -> jnp.ndarray:
    """Boolean mask of (approximately) real roots."""
    return jnp.abs(roots.imag) < tol * (1.0 + jnp.abs(roots.real))
