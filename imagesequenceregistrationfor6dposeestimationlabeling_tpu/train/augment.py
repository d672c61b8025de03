"""On-device image augmentation for descriptor training.

Rebuilds augment.py:284-432 + dataGen.py as a *jittable, batched* JAX
pipeline instead of CPU DataLoader workers — the TPU never starves
(SURVEY.md hard part #5).  Per image:

* random rotation/scale/translation with the SurfEmb scale rule
  ``224/max(w,h)/1.2 * U(1 +- 0.05*fac)`` (augment.py:332-337),
* occlusion cutouts + line erosion of the mask (augment.py:315-324,
  434-489),
* random smooth background compositing (stand-in for the COCO paste,
  augment.py:297-314 — no external dataset needed),
* color jitter and border blackout (augment.py:422-428),
* ImageNet normalization (dataGen.py:10-20).

The affine transform is returned as (A, t) acting on NDC ray coordinates:
``xys' = xys @ A.T + t`` — the exact warp applied to the image, so the
per-view ray dumps stay aligned (augment.py:639-702 getNerfSamples does
the same with cv2 rotation matrices).  Both the image warp and the xys
transform are generated from one parameter set, and the self-consistency
is unit-tested (the reference's #1 silent-failure risk).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import normalize_image


class AugmentConfig(NamedTuple):
    crop_res: int = 224
    pad: float = 1.2                  # SurfEmb crop pad
    scale_jitter: float = 0.075       # 0.05 * surfEmbScaleFac(1.5)
    trans_frac: float = 0.1           # transScale(0.2) * imX/2 -> frac of S
    p_background: float = 0.9         # augment.py:300
    p_occlude: float = 0.49           # maskErosion 0.7 * inner 0.7
    p_line_erode: float = 0.49
    p_color_jitter: float = 0.7
    p_border: float = 0.4
    p_distractor: float = 0.0         # tless_aug distractor paste (augment.py:402-418)
    p_blur: float = 0.5               # AB.GaussianBlur(blur_limit=(1,3)) (augment.py:248,347)
    p_iso_noise: float = 0.5          # AB.ISONoise() (augment.py:249,348)
    min_mask_sum: float = 200.0       # maskMax analog at our test scales


class Augmented(NamedTuple):
    rgb: jnp.ndarray        # (S, S, 3) ImageNet-normalized
    mask_full: jnp.ndarray  # (S, S) transformed original mask (BCE target)
    mask_crop: jnp.ndarray  # (S, S) transformed occluded mask
    A: jnp.ndarray          # (2, 2) NDC linear part
    t: jnp.ndarray          # (2,) NDC translation


def transform_xys(xys: jnp.ndarray, A: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply the augmentation to NDC ray coordinates."""
    return xys @ A.T + t


def _mask_bbox(mask: jnp.ndarray):
    """(x, y, w, h) of the mask's bounding box (cv2.boundingRect equiv)."""
    S = mask.shape[0]
    cols = mask.max(axis=0) > 0.5
    rows = mask.max(axis=1) > 0.5
    idx = jnp.arange(S)
    x0 = jnp.min(jnp.where(cols, idx, S))
    x1 = jnp.max(jnp.where(cols, idx, -1))
    y0 = jnp.min(jnp.where(rows, idx, S))
    y1 = jnp.max(jnp.where(rows, idx, -1))
    w = jnp.maximum(x1 - x0 + 1, 1)
    h = jnp.maximum(y1 - y0 + 1, 1)
    return x0, y0, w, h


def _bilinear_sample(img: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """img (S, S, C); px/py continuous pixel coords (pixel i center i+0.5)."""
    S = img.shape[0]
    x = px - 0.5
    y = py - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(ix, iy):
        valid = (ix >= 0) & (ix < S) & (iy >= 0) & (iy < S)
        return img[jnp.clip(iy, 0, S - 1), jnp.clip(ix, 0, S - 1)] * valid[..., None]

    v00 = tap(x0i, y0i)
    v01 = tap(x0i + 1, y0i)
    v10 = tap(x0i, y0i + 1)
    v11 = tap(x0i + 1, y0i + 1)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def warp_all_ndc(rgb: jnp.ndarray, mask_full: jnp.ndarray, mask_crop: jnp.ndarray,
                 A: jnp.ndarray, t: jnp.ndarray):
    """The three augment warps (bilinear rgb + two nearest masks) in ONE
    gather.

    TPU gathers cost ~4.5 ms + ~0.7 ms/channel at the (16, 224, 224)
    batch (EXPERIMENTS.md "augmentation decomposition"), so the six
    separate gathers of three ``warp_affine_ndc`` calls (4 bilinear taps
    + 2 nearest) dominate the descriptor train step.  Here the source is
    pre-packed so channel c of the gathered value carries tap (dy, dx) of
    source plane p — one gather at the bilinear base (y0, x0) fetches
    every tap of every plane; bilinear lerp weights and the nearest-tap
    selection (nearest index == base + (frac >= 0.5), exactly) are then
    pure VPU math.  Per-tap validity is applied post-gather from the
    UNCLIPPED coordinates, reproducing ``warp_affine_ndc``'s
    out-of-bounds zeroing bit-for-bit.
    """
    S = rgb.shape[0]
    src = jnp.concatenate([rgb, mask_full[..., None], mask_crop[..., None]], -1)
    C = src.shape[-1]
    # Z[y+1, x+1] = src[y, x], zero beyond; taps reach (y0+1, x0+1)+1
    Z = jnp.pad(src, ((1, 2), (1, 2), (0, 0)))
    packed = jnp.concatenate(
        [Z[:-1, :-1], Z[:-1, 1:], Z[1:, :-1], Z[1:, 1:]], axis=-1
    )  # (S+2, S+2, 4C): tap order (0,0), (0,+1x), (+1y,0), (+1y,+1x)

    ii = jnp.arange(S, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(ii, ii, indexing="ij")
    ux = 1.0 - 2.0 * px / S
    uy = 1.0 - 2.0 * py / S
    u_out = jnp.stack([ux, uy], axis=-1)
    A_inv = jnp.linalg.inv(A)
    u_in = (u_out - t) @ A_inv.T
    px_in = (1.0 - u_in[..., 0]) * S / 2.0
    py_in = (1.0 - u_in[..., 1]) * S / 2.0

    x = px_in - 0.5
    y = py_in - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    gx = jnp.clip(x0i + 1, 0, S + 1)
    gy = jnp.clip(y0i + 1, 0, S + 1)
    g = packed[gy, gx]                                   # ONE gather (S, S, 4C)

    def vmask(ix, iy):
        return ((ix >= 0) & (ix < S) & (iy >= 0) & (iy < S)).astype(src.dtype)[..., None]

    v00 = g[..., 0 * C : 1 * C] * vmask(x0i, y0i)
    v01 = g[..., 1 * C : 2 * C] * vmask(x0i + 1, y0i)
    v10 = g[..., 2 * C : 3 * C] * vmask(x0i, y0i + 1)
    v11 = g[..., 3 * C : 4 * C] * vmask(x0i + 1, y0i + 1)

    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    rgb_w = (top * (1 - ty) + bot * ty)[..., :3]

    # nearest tap: floor(p) == base + (frac >= 0.5) for both axes
    right = tx >= 0.5
    down = ty >= 0.5
    near = jnp.where(
        down, jnp.where(right, v11, v10), jnp.where(right, v01, v00)
    )
    return rgb_w, near[..., 3], near[..., 4]


def warp_affine_ndc(img: jnp.ndarray, A: jnp.ndarray, t: jnp.ndarray, nearest: bool = False):
    """Warp so that content at NDC u appears at u' = A u + t.

    NDC convention matches geometry.cameras: u = 1 - 2*p/S (both axes),
    so pixels transform as (p' - S/2) = A (p - S/2) - (S/2) t.
    """
    S = img.shape[0]
    ii = jnp.arange(S, dtype=jnp.float32) + 0.5
    py, px = jnp.meshgrid(ii, ii, indexing="ij")
    # output pixel -> output NDC
    ux = 1.0 - 2.0 * px / S
    uy = 1.0 - 2.0 * py / S
    u_out = jnp.stack([ux, uy], axis=-1)  # (S, S, 2)
    A_inv = jnp.linalg.inv(A)
    u_in = (u_out - t) @ A_inv.T
    px_in = (1.0 - u_in[..., 0]) * S / 2.0
    py_in = (1.0 - u_in[..., 1]) * S / 2.0
    if nearest:
        xi = jnp.clip(jnp.floor(px_in).astype(jnp.int32), 0, S - 1)
        yi = jnp.clip(jnp.floor(py_in).astype(jnp.int32), 0, S - 1)
        valid = (px_in >= 0) & (px_in < S) & (py_in >= 0) & (py_in < S)
        out = img[yi, xi]
        return out * valid[..., None] if img.ndim == 3 else out * valid
    if img.ndim == 2:
        return _bilinear_sample(img[..., None], px_in, py_in)[..., 0]
    return _bilinear_sample(img, px_in, py_in)


def _smooth_noise(key, S, channels=3, res=8):
    low = jax.random.uniform(key, (res, res, channels))
    return jax.image.resize(low, (S, S, channels), "linear")


def _occlude(key, mask, x0, y0, w, h):
    """Rectangle cutout inside the bbox (augment.py:465-489)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    S = mask.shape[0]
    nx = x0 + (jax.random.uniform(k1) * w).astype(jnp.int32)
    ny = y0 + (jax.random.uniform(k2) * h).astype(jnp.int32)
    max_w = jnp.minimum(w, 30 + (jax.random.uniform(k3) * 40).astype(jnp.int32))
    max_h = jnp.minimum(h, 30 + (jax.random.uniform(k4) * 40).astype(jnp.int32))
    nw = (jax.random.uniform(k3) * max_w).astype(jnp.int32)
    nh = (jax.random.uniform(k4) * max_h).astype(jnp.int32)
    ii = jnp.arange(S)
    in_x = (ii >= nx) & (ii < nx + nw)
    in_y = (ii >= ny) & (ii < ny + nh)
    cut = in_y[:, None] & in_x[None, :]
    return jnp.where(cut, 0.0, mask)


def _line_erode(key, mask, x0, y0, w, h):
    """Half-plane cut through a random bbox point (augment.py:434-462)."""
    k1, k2, k3 = jax.random.split(key, 3)
    S = mask.shape[0]
    cx = x0.astype(jnp.float32) + jax.random.uniform(k1) * w
    cy = y0.astype(jnp.float32) + jax.random.uniform(k2) * h
    phi = jax.random.uniform(k3) * 2 * jnp.pi
    n = jnp.asarray([jnp.cos(phi), jnp.sin(phi)])
    ii = jnp.arange(S, dtype=jnp.float32)
    py, px = jnp.meshgrid(ii, ii, indexing="ij")
    side = (px - cx) * n[0] + (py - cy) * n[1]
    return jnp.where(side > 0, 0.0, mask)


def _shift_clamp(x: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Shift by d along axis with edge replication (no wrap-around)."""
    idx = jnp.clip(jnp.arange(x.shape[axis]) + d, 0, x.shape[axis] - 1)
    return jnp.take(x, idx, axis=axis)


def gaussian_blur3(img: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Separable 3x3 Gaussian blur with a (traced) sigma — the jittable
    equivalent of AB.GaussianBlur(blur_limit=(1, 3)) (reference
    augment.py:248,252,347).  sigma -> 0 degenerates to the identity
    (kernel size 1)."""
    w1 = jnp.exp(-0.5 / jnp.maximum(sigma, 1e-3) ** 2)
    norm = 1.0 + 2.0 * w1

    def conv1d(x, axis):
        return (x + w1 * (_shift_clamp(x, -1, axis) + _shift_clamp(x, 1, axis))) / norm

    return conv1d(conv1d(img, 0), 1)


def iso_noise(key: jax.Array, img: jnp.ndarray) -> jnp.ndarray:
    """Sensor/ISO-style noise: shot (Poisson-like, sqrt-of-signal scaled)
    luma noise + small chroma shift — the jittable analog of AB.ISONoise()
    (reference augment.py:249,348; defaults color_shift (0.01, 0.05),
    intensity (0.1, 0.5))."""
    k_int, k_shift, k_lum, k_col = jax.random.split(key, 4)
    intensity = jax.random.uniform(k_int, minval=0.1, maxval=0.5)
    color_shift = jax.random.uniform(k_shift, minval=0.01, maxval=0.05)
    shot = jnp.sqrt(jnp.clip(img, 0.0, 1.0) + 1e-3)
    luma = jax.random.normal(k_lum, img.shape[:-1] + (1,)) * intensity * 0.1 * shot.mean(-1, keepdims=True)
    chroma = jax.random.normal(k_col, img.shape) * color_shift
    return jnp.clip(img + luma + chroma, 0.0, 1.0)


def paste_distractor(key, rgb, mask, dis_rgb, dis_mask, cfg: AugmentConfig):
    """tless_aug distractor paste (augment.py:402-418): composite another
    object's pixels over the image with a random shift, zeroing the
    occluded part of the mask — skipped when it would erase too much."""
    k_shift, k_scale = jax.random.split(key)
    S = rgb.shape[0]
    # shift the distractor by a random NDC offset (pure roll keeps shapes)
    shift = jax.random.randint(k_shift, (2,), -S // 2, S // 2)
    dr = jnp.roll(dis_rgb, (shift[0], shift[1]), axis=(0, 1))
    dm = jnp.roll(dis_mask, (shift[0], shift[1]), axis=(0, 1))
    remaining = jnp.sum(mask * (1 - dm))
    ok = (jnp.sum(mask) - remaining) < jnp.sum(mask) * 0.6  # keep >40% visible
    new_rgb = jnp.where((dm > 0.5)[..., None], dr, rgb)
    new_mask = mask * (1.0 - (dm > 0.5))
    rgb = jnp.where(ok, new_rgb, rgb)
    mask = jnp.where(ok, new_mask, mask)
    return rgb, mask


def augment_view(
    key: jax.Array,
    rgb: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: AugmentConfig = AugmentConfig(),
    distractor: tuple | None = None,
    bg_bank: jnp.ndarray | None = None,
) -> Augmented:
    """Augment one (S, S, 3) image + (S, S) mask.  vmap over the batch.

    ``distractor``: optional (rgb, mask) of another object/view to paste
    with probability cfg.p_distractor (the reference pastes crops of other
    T-LESS objects, augment.py:402-418).

    ``bg_bank``: optional (N, S, S, 3) bank of background images — a random
    one replaces the smooth-noise background (the reference composites COCO
    images, augment.py:297-314; any image folder works as a stand-in)."""
    S = rgb.shape[0]
    keys = jax.random.split(key, 18)
    x0, y0, w, h = _mask_bbox(mask)

    # --- geometric params (augment.py:329-342)
    theta = jax.random.uniform(keys[0]) * 2 * jnp.pi
    base_scale = cfg.crop_res / jnp.maximum(w, h).astype(jnp.float32) / cfg.pad
    # our images are already crops at resolution S; rescale rule relative to S
    base_scale = base_scale * (S / cfg.crop_res)
    scale = base_scale * jax.random.uniform(
        keys[1], minval=1.0 - cfg.scale_jitter, maxval=1.0 + cfg.scale_jitter
    )
    t_ndc = jax.random.uniform(keys[2], (2,), minval=-cfg.trans_frac, maxval=cfg.trans_frac)
    c, s = jnp.cos(theta), jnp.sin(theta)
    A = scale * jnp.asarray([[c, -s], [s, c]])

    # --- mask occlusions BEFORE the warp (augment.py:315-324)
    occluded = mask
    m1 = _occlude(keys[3], occluded, x0, y0, w, h)
    occluded = jnp.where(
        (jax.random.uniform(keys[4]) < cfg.p_occlude) & (m1.sum() > cfg.min_mask_sum), m1, occluded
    )
    m2 = _line_erode(keys[5], occluded, x0, y0, w, h)
    occluded = jnp.where(
        (jax.random.uniform(keys[6]) < cfg.p_line_erode) & (m2.sum() > cfg.min_mask_sum), m2, occluded
    )

    # --- warp: all three planes in one packed gather (six gathers' worth
    # of taps; see warp_all_ndc)
    rgb_w, mask_full_w, mask_crop_w = warp_all_ndc(rgb, mask, occluded, A, t_ndc)

    # --- background composite (augment.py:297-314, 370-374)
    if bg_bank is not None:
        bg = bg_bank[jax.random.randint(keys[7], (), 0, bg_bank.shape[0])]
    else:
        bg = _smooth_noise(keys[7], S)
    use_bg = jax.random.uniform(keys[8]) < cfg.p_background
    bg = jnp.where(use_bg, bg, jnp.zeros_like(bg))
    out = jnp.where(mask_crop_w[..., None] > 0.5, rgb_w, bg)

    # --- color jitter on the composited image (augment.py:422-423)
    kj = jax.random.split(keys[9], 3)
    gain = jax.random.uniform(kj[0], (3,), minval=0.8, maxval=1.2)
    bias = jax.random.uniform(kj[1], (3,), minval=-0.08, maxval=0.08)
    gamma = jax.random.uniform(kj[2], minval=0.8, maxval=1.25)
    jittered = jnp.clip(jnp.clip(out, 0, 1) ** gamma * gain + bias, 0.0, 1.0)
    out = jnp.where(jax.random.uniform(keys[10]) < cfg.p_color_jitter, jittered, out)

    # --- photometric sensor passes (augment.py:246-252, 344-348):
    # Gaussian blur (blur_limit (1, 3)) and ISO noise, each p=0.5
    sigma = jax.random.uniform(keys[14], minval=0.3, maxval=1.0)
    blurred = gaussian_blur3(out, sigma)
    out = jnp.where(jax.random.uniform(keys[15]) < cfg.p_blur, blurred, out)
    noisy = iso_noise(keys[16], out)
    out = jnp.where(jax.random.uniform(keys[17]) < cfg.p_iso_noise, noisy, out)

    # --- distractor-object paste (augment.py:402-418)
    mask_out = mask_crop_w
    if distractor is not None and cfg.p_distractor > 0:
        d_rgb, d_mask = distractor
        pasted_rgb, pasted_mask = paste_distractor(keys[12], out, mask_crop_w, d_rgb, d_mask, cfg)
        use = jax.random.uniform(keys[13]) < cfg.p_distractor
        out = jnp.where(use, pasted_rgb, out)
        mask_out = jnp.where(use, pasted_mask, mask_crop_w)

    # --- border blackout (augment.py:425-428): zero outside dilated mask
    dil = jax.lax.reduce_window(
        mask_out, -jnp.inf, jax.lax.max, (9, 9), (1, 1), "SAME"
    )
    blacked = out * (dil > 0.5)[..., None]
    out = jnp.where(jax.random.uniform(keys[11]) < cfg.p_border, blacked, out)

    return Augmented(normalize_image(out), mask_full_w, mask_out, A, t_ndc)


augment_batch = jax.jit(
    jax.vmap(augment_view, in_axes=(0, 0, 0, None)), static_argnames=()
)


def _list_image_files(dir_path: str, max_images: int, kind: str):
    import os

    exts = (".jpg", ".jpeg", ".png", ".bmp")
    files = sorted(
        os.path.join(dir_path, f)
        for f in os.listdir(dir_path)
        if f.lower().endswith(exts)
    )[:max_images]
    if not files:
        raise ValueError(f"no images found in {kind} dir {dir_path}")
    return files


def _load_image_dir(dir_path: str, size: int, max_images: int, resample, kind: str):
    """Shared scaffold for the image-folder banks: sorted scan, resize to
    (size, size), float32 in [0, 1]."""
    import numpy as np
    from PIL import Image

    files = _list_image_files(dir_path, max_images, kind)
    return np.stack([
        np.asarray(
            Image.open(f).convert("RGB").resize((size, size), resample),
            np.float32,
        ) / 255.0
        for f in files
    ])


def load_background_bank(dir_path: str, size: int, max_images: int = 256):
    """Load an image folder as an (N, size, size, 3) float32 background bank
    (the COCO stand-in for augment.py:297-314 — any image directory works)."""
    from PIL import Image

    return _load_image_dir(dir_path, size, max_images, Image.BICUBIC, "background")


def load_distractor_bank(dir_path: str, size: int, max_images: int = 128):
    """Load an image folder as a distractor bank: (N, size, size, 3) rgb +
    (N, size, size) masks.  Intended for masked crops of OTHER objects (the
    reference pastes other T-LESS objects' crops, augment.py:402-418), so
    the mask is recovered as the non-black region — exactly the convention
    of the BOP loader's background-masked crops (data/bop.py).

    The mask is computed at NATIVE resolution before any resampling (a
    NEAREST-resized rgb would alias and true-black pixels inside the object
    would punch holes); rgb then resizes BICUBIC (like the reference's
    pasted crops) and the mask NEAREST so its edges stay crisp."""
    import numpy as np
    from PIL import Image

    rgbs, masks = [], []
    for f in _list_image_files(dir_path, max_images, "distractor"):
        im = Image.open(f).convert("RGB")
        native = np.asarray(im, np.float32) / 255.0
        m_native = (native.max(-1) > 1.0 / 255.0).astype(np.uint8) * 255
        rgbs.append(
            np.asarray(im.resize((size, size), Image.BICUBIC), np.float32) / 255.0
        )
        masks.append(
            np.asarray(
                Image.fromarray(m_native).resize((size, size), Image.NEAREST),
                np.float32,
            ) / 255.0
        )
    return np.clip(np.stack(rgbs), 0.0, 1.0), np.stack(masks)


def nocs_map(xys: jnp.ndarray, pos_vec: jnp.ndarray, valid: jnp.ndarray, res: int = 224) -> jnp.ndarray:
    """Rasterize per-ray 3D surface coordinates into a NOCS image
    (getNerfSamples NOCS branch, augment.py:686-700): each transformed ray
    xy writes its 3D hit into the pixel it lands on."""
    # NDC -> pixel indices (reference flips x then rot90; equivalently our
    # ndc->pixel for both axes)
    px = ((1.0 - xys[:, 0]) * 0.5 * (res - 1)).astype(jnp.int32)
    py = ((1.0 - xys[:, 1]) * 0.5 * (res - 1)).astype(jnp.int32)
    in_b = (px >= 0) & (px < res) & (py >= 0) & (py < res) & valid
    flat = jnp.where(in_b, py * res + px, res * res)
    img = jnp.zeros((res * res + 1, 3))
    img = img.at[flat].set(jnp.where(in_b[:, None], pos_vec, 0.0))
    return img[:-1].reshape(res, res, 3)


def select_ray_samples(key, xys, valid, sample_size: int):
    """Fixed-size sample of ray indices with |xys'| < 1 (getNerfSamples,
    augment.py:649-653/668-678).  Samples with replacement when needed."""
    in_bounds = (jnp.abs(xys[..., 0]) < 1.0) & (jnp.abs(xys[..., 1]) < 1.0) & valid
    logits = jnp.where(in_bounds, 0.0, -1e9)
    return jax.random.categorical(key, logits, shape=(sample_size,))
