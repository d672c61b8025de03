"""Image sampling at normalized locations (torch.grid_sample equivalent).

Used to pull GT pixels at Monte-Carlo ray locations (nutil.py:167-196)
and CNN query features at ray xys (trainPose.py:397-400).  Follows torch
``align_corners=True`` semantics: g=-1 -> pixel 0, g=+1 -> pixel S-1.
The callers pass ``-xys`` (the reference's sign inversion).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _to_pixel(g: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (g + 1.0) * 0.5 * (size - 1)
    return ((g + 1.0) * size - 1.0) * 0.5


def grid_sample(
    images: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "nearest",
    align_corners: bool = True,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """images: (B, H, W, C); grid: (B, N, 2) with (x, y) in [-1, 1].

    Returns (B, N, C).
    """
    B, H, W, C = images.shape
    gx = _to_pixel(grid[..., 0], W, align_corners)
    gy = _to_pixel(grid[..., 1], H, align_corners)

    def sample_one(img, gx, gy):
        if mode == "nearest":
            ix = jnp.round(gx).astype(jnp.int32)
            iy = jnp.round(gy).astype(jnp.int32)
            if padding_mode == "border":
                ix = jnp.clip(ix, 0, W - 1)
                iy = jnp.clip(iy, 0, H - 1)
                return img[iy, ix]
            valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            ix = jnp.clip(ix, 0, W - 1)
            iy = jnp.clip(iy, 0, H - 1)
            return img[iy, ix] * valid[..., None]
        # bilinear
        x0 = jnp.floor(gx)
        y0 = jnp.floor(gy)
        tx = (gx - x0)[..., None]
        ty = (gy - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def tap(ix, iy):
            if padding_mode == "border":
                return img[jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1)]
            valid = (ix >= 0) & (ix <= W - 1) & (iy >= 0) & (iy <= H - 1)
            return img[jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1)] * valid[..., None]

        v00 = tap(x0i, y0i)
        v01 = tap(x0i + 1, y0i)
        v10 = tap(x0i, y0i + 1)
        v11 = tap(x0i + 1, y0i + 1)
        top = v00 * (1 - tx) + v01 * tx
        bot = v10 * (1 - tx) + v11 * tx
        return top * (1 - ty) + bot * ty

    return jax.vmap(sample_one)(images, gx, gy)


def sample_images_at_mc_locs(
    target_images: jnp.ndarray, sampled_rays_xy: jnp.ndarray, mode: str = "nearest"
) -> jnp.ndarray:
    """nutil.py:167-196: sample (B, H, W, C) images at NDC ray xys with the
    sign inversion (NDC +x left/+y up -> grid +x right/+y down)."""
    return grid_sample(target_images, -sampled_rays_xy, mode=mode, align_corners=True)
