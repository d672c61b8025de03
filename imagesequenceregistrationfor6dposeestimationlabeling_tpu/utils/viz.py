"""Visualization helpers (host side, PIL).

Replaces the reference's cv2/matplotlib dumps: feature-embedding images
(``get_emb_vis``, nutil.py:198-210), full-frame render previews
(``show_full_render1``, nutil.py:214-291) and rotating-NeRF video frames
(nutil.py:463-496) — saved as PNGs every N training iterations.
"""

from __future__ import annotations

import os

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

import jax
import jax.numpy as jnp


def emb_vis(emb_img: np.ndarray, mask: np.ndarray | None = None, demean: bool = False) -> np.ndarray:
    """12-d feature image -> RGB in [0, 1] (nutil.py:198-210): channels are
    folded 3x4 and averaged, normalized by max |value|."""
    emb = np.asarray(emb_img, np.float32)
    if demean:
        sel = emb[mask > 0.5] if mask is not None else emb.reshape(-1, emb.shape[-1])
        emb = emb - sel.reshape(-1, emb.shape[-1]).mean(0)
    h, w, c = emb.shape
    rgb = emb.reshape(h, w, 3, -1).mean(-1)
    if mask is not None:
        rgb = rgb * (np.asarray(mask)[..., None] > 0.5)
    rgb = rgb / (np.abs(rgb).max() + 1e-9)
    return rgb * 0.5 + 0.5


def save_image(path: str, img: np.ndarray):
    """Save float [0,1] (H, W[, C]) as PNG."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[..., None].repeat(3, -1)
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


def render_preview(field, params, cam, image_size: int, n_pts: int, min_depth, max_depth, mode="color"):
    """show_full_render1 equivalent: full-frame render at half res for
    training previews (trainNerfFine.py:365-427)."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import renderer

    def field_fn(pts, dirs, m):
        return field.apply(params, pts, dirs, m)

    images, weights, bundle = renderer.render_grid_chunked(
        field_fn, cam, image_size, n_pts, min_depth, max_depth, mode=mode,
        threshold_mode=False, chunk=min(4096, image_size * image_size),
    )
    S = image_size
    rgb = np.asarray(images[:, :-1].reshape(S, S, -1))
    sil = np.asarray(images[:, -1].reshape(S, S))
    return rgb, sil


def image_grid(
    images,
    rows: int | None = None,
    cols: int | None = None,
    fill: bool = True,
    rgb: bool = True,
    pad: int = 0,
) -> np.ndarray:
    """Tile N images into one (rows*H, cols*W, 3) array
    (cowrendersynth.py:1347-1391's matplotlib grid, as a pure-numpy tiler
    so `save_image` can write it without a figure backend).

    `rows`/`cols` must be given together or not at all (reference raises
    the same way); default is one column per image stacked vertically.
    `rgb=True` plots the RGB channels, `rgb=False` the alpha channel.
    `fill=False` adds a 2-px white gutter between cells (the reference's
    non-zero wspace/hspace); `pad` overrides the gutter width."""
    if (rows is None) != (cols is None):
        raise ValueError("Specify either both rows and cols or neither.")
    imgs = [np.asarray(im, np.float32) for im in images]
    if rows is None:
        rows, cols = len(imgs), 1
    cells = []
    for im in imgs:
        if rgb:
            cell = im[..., :3] if im.ndim == 3 else im[..., None].repeat(3, -1)
        else:
            cell = im[..., 3:4].repeat(3, -1) if (im.ndim == 3 and im.shape[-1] > 3) else (
                im[..., None].repeat(3, -1) if im.ndim == 2 else im[..., :3])
        cells.append(cell)
    h = max(c.shape[0] for c in cells)
    w = max(c.shape[1] for c in cells)
    g = pad if pad else (0 if fill else 2)
    grid = np.ones((rows * (h + g) - g if rows else 0,
                    cols * (w + g) - g if cols else 0, 3), np.float32)
    for k, cell in enumerate(cells[: rows * cols]):
        r, c = divmod(k, cols)
        grid[r * (h + g): r * (h + g) + cell.shape[0],
             c * (w + g): c * (w + g) + cell.shape[1]] = cell
    return grid


def rotating_views(n_frames: int = 36, dist: float = 4.0):
    """Camera ring for rotating-NeRF videos (nutil.py:463-496)."""
    import numpy as np

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.rotations import euler_zyx_to_matrix

    Rs, ts = [], []
    for i in range(n_frames):
        phi = 2 * np.pi * i / n_frames
        R = np.asarray(euler_zyx_to_matrix(jnp.asarray([0.0, phi, 0.0])))
        ts.append(np.array([0.0, 0.0, dist]))
        Rs.append(R)
    return np.stack(Rs), np.stack(ts)
