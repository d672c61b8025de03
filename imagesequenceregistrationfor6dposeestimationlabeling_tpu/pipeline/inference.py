"""Per-image 6D pose inference — inference.py / finalposes.py rebuilt.

Given a masked crop, the trained query CNN and the baked surface arrays
(vert1_scaled / feat1_scaled / normals_scaled):

1. CNN -> 12-d query map + mask logit (inference.py:236-239),
2. /3 stride downsample with pixel-center K fixup (inference.py:254-263),
3. dense correspondence: per masked pixel, argmax log-softmax similarity
   over all keys (the MXU-streamed kernel, ops/similarity.py),
4. keep the top-80% most confident correspondences (inference.py:282-290),
5. fixed-budget RANSAC-P3P (500 hypotheses, 2 px) -> (R, t)
   (inference.py:293-294),
6. ADD/ADD-S vs GT with the 0.1*diameter criterion (inference.py:300-320).

The whole per-image path after JPEG decode is one jitted computation with
static shapes (masked pixels are a validity mask, not a dynamic gather).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import InferenceConfig
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry.cameras import downsample_K
from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pnp, similarity


class PoseEstimate(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    n_inliers: jnp.ndarray
    success: jnp.ndarray
    conf_mask: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cnn", "down_sample", "n_hyp"))
def estimate_pose_single(
    cnn,
    cnn_params,
    image: jnp.ndarray,          # (S, S, 3) ImageNet-normalized masked crop
    mask: jnp.ndarray,           # (S, S) visibility mask
    cam_K: jnp.ndarray,          # (3, 3) crop camera matrix (camMat = Ms @ K)
    verts: jnp.ndarray,          # (M, 3) baked surface points (CAD scale)
    feats: jnp.ndarray,          # (M, 12) baked keys
    key: jax.Array,
    down_sample: int = 3,
    keep_frac: float = 0.8,
    n_hyp: int = 500,
    reproj_err: float = 2.0,
) -> PoseEstimate:
    S = image.shape[0]
    feat_full = cnn.apply(cnn_params, image[None])[0]  # (S, S, 13)
    q_map = feat_full[..., :12]

    # stride downsample (inference.py:254-259) + K fixup
    q = q_map[::down_sample, ::down_sample]
    m = mask[::down_sample, ::down_sample] > 0.5
    Kd = downsample_K(cam_K, down_sample)

    Sd = q.shape[0]
    queries = q.reshape(-1, 12)
    valid = m.reshape(-1)

    idx, conf = similarity.correspondence_argmax(queries, feats)
    conf_mask = similarity.confidence_threshold(conf, valid, keep_frac)

    p3d = verts[idx]
    yy = jnp.arange(Sd)
    gy, gx = jnp.meshgrid(yy, yy, indexing="ij")
    # ep2d[:, 0] = column (x), ep2d[:, 1] = row (y)  (inference.py:278-280)
    p2d = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1).astype(jnp.float32)

    res = pnp.ransac_pnp(
        p3d,
        p2d,
        Kd,
        key,
        weights=conf_mask.astype(jnp.float32),
        n_hyp=n_hyp,
        reproj_err=reproj_err,
    )
    return PoseEstimate(res.R, res.t, res.n_inliers, res.success, conf_mask)


def run_sequence(
    cnn,
    cnn_params,
    images,
    masks,
    cam_Ks,
    verts,
    feats,
    cfg: InferenceConfig = InferenceConfig(),
    seed: int = 1,
):
    """finalposes.py / choosePose.py --posesEst: per-image poses of a whole
    sequence -> (pred_R (N, 3, 3), pred_t (N, 3))."""
    key = jax.random.PRNGKey(seed)
    Rs, ts = [], []
    verts_j = jnp.asarray(verts, jnp.float32)
    feats_j = jnp.asarray(feats, jnp.float32)
    for i in range(images.shape[0]):
        key, sub = jax.random.split(key)
        est = estimate_pose_single(
            cnn,
            cnn_params,
            jnp.asarray(images[i]),
            jnp.asarray(masks[i]),
            jnp.asarray(cam_Ks[i], jnp.float32),
            verts_j,
            feats_j,
            sub,
            down_sample=cfg.down_sample,
            keep_frac=cfg.conf_keep_frac,
            n_hyp=cfg.ransac_iters,
            reproj_err=cfg.reproj_err_px,
        )
        Rs.append(np.asarray(est.R))
        ts.append(np.asarray(est.t))
    return np.stack(Rs), np.stack(ts)
