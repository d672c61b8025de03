"""Registration-stage scale timing at reference sequence length
(VERDICT r1 weak #7).

The reference registers N ~= 1280-image half-sequences: choosePose.py
builds an (N, N) relative-pose agreement matrix (1.6M pairs) and
verfication.py runs N-1 consecutive-pair Chamfer checks.  Round 1 never
timed our batched implementations at that N — this experiment does, on
fabricated poses (timing is pose-value independent: fixed shapes, no
data-dependent control flow).

Run on TPU:  python experiments/registration_scale.py
Env: RS_N (1280), RS_VERTS (128), RS_CLOUD (4000).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N = int(os.environ.get("RS_N", 1280))
N_VERTS = int(os.environ.get("RS_VERTS", 128))
N_CLOUD = int(os.environ.get("RS_CLOUD", 4000))


def rand_rots(rng, n):
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import rotations

    v = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    return jax.vmap(rotations.rotvec_to_matrix)(v)


def main():
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import registration

    rng = np.random.default_rng(0)
    R_gt = np.asarray(rand_rots(rng, N))
    t_gt = rng.normal(size=(N, 3)).astype(np.float32) * 0.1 + np.array([0, 0, 4], np.float32)
    # predictions = GT + noise (some agree, some don't — realistic sparsity)
    R_pred = np.array(rand_rots(rng, N))
    half = N // 2
    R_pred[:half] = R_gt[:half]
    t_pred = t_gt + rng.normal(size=(N, 3)).astype(np.float32) * 0.05
    verts = rng.normal(size=(N_VERTS, 3)).astype(np.float32)
    cloud = rng.normal(size=(N_CLOUD, 3)).astype(np.float32)
    diameter = 2.0

    out = {"N": N, "n_verts": N_VERTS, "n_cloud": N_CLOUD}

    # --- rel-pose tensors (choosePose.py:98-114): two timed calls
    # (cold = compile through the relay, warm = steady state)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        rel_R_gt, rel_t_gt = registration.relative_pose_tensor(
            jnp.asarray(R_gt), jnp.asarray(t_gt)
        )
        jax.block_until_ready(rel_R_gt)
        out[f"rel_poses_{tag}_s"] = round(time.perf_counter() - t0, 2)
    rel_R_pred, rel_t_pred = registration.relative_pose_tensor(
        jnp.asarray(R_pred), jnp.asarray(t_pred)
    )

    # --- (N, N) agreement matrix (choosePose.py:116-151)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        agree, errs = registration.agreement_matrix(
            rel_R_gt, rel_t_gt, rel_R_pred, rel_t_pred, jnp.asarray(verts), diameter
        )
        jax.block_until_ready(errs)
        out[f"agreement_{tag}_s"] = round(time.perf_counter() - t0, 2)
    best, _top = registration.choose_best_image(np.asarray(agree))
    out["choose_best"] = best
    out["best_row_agreements"] = int(np.asarray(agree).sum(axis=1).max())

    # --- N-1 consecutive-pair Chamfer verification (verfication.py:59-108)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        bidx, chams = registration.verify_consecutive(cloud, R_gt, t_gt, R_pred, t_pred)
        out[f"verify_{tag}_s"] = round(time.perf_counter() - t0, 2)
    out["verify_best"] = bidx
    out["verify_min_chamfer"] = round(float(min(chams)), 4)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
