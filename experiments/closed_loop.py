"""Fully-trained closed loop on the synthetic scene (TPU experiment).

Unlike bench.py (which uses the analytic field as a converged stand-in for
downstream stages), this trains everything for real:

  1. NeRF per half-sequence (real schedule scale),
  2. correspondences from the TRAINED field,
  3. descriptors (CNN + feature head) trained with InfoNCE,
  4. features baked from the TRAINED field/feature head,
  5. per-image inference with the TRAINED CNN on the other half,
  6. ICP + Chamfer registration.

Reports per-stage wall-clock and the quality numbers (pose correctness
under 0.1*diameter, final Chamfer).  Run on TPU:
    python experiments/closed_loop.py
Env knobs: CL_NERF_STEPS, CL_POSE_STEPS, CL_VIEWS, CL_IMG.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

NERF_STEPS = int(os.environ.get("CL_NERF_STEPS", 3000))
POSE_STEPS = int(os.environ.get("CL_POSE_STEPS", 1500))
N_VIEWS = int(os.environ.get("CL_VIEWS", 16))
IMG = int(os.environ.get("CL_IMG", 224))
N_INFER = int(os.environ.get("CL_INFER", 6))


def main():
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
        CorsConfig, FeatConfig, FieldConfig, NerfTrainConfig, PoseTrainConfig, RenderConfig,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import ResNetUNet, normalize_image
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import metrics
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import (
        artifacts, gen_feat, generate_cors, inference, registration,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import nerf_trainer, pose_trainer

    import tempfile

    out_root = tempfile.mkdtemp(prefix="closed_loop_")
    timings = {}
    t0 = time.perf_counter()

    # Two half-sequences viewing the same object
    halves = [synthetic.make_scene(n_views=N_VIEWS, image_size=IMG, key=jax.random.PRNGKey(uh)) for uh in (0, 1)]
    diam = halves[0].diameter
    scale = diam / 1.8
    timings["data"] = time.perf_counter() - t0

    field = fields.NerfField(FieldConfig())
    cors_cfg = CorsConfig(density_threshold=0.2, mesh_filter_dist=0.1)

    # --- 1+2: NeRF + cors per half, with the TRAINED fine field
    states, cors_dirs = [], []
    t = time.perf_counter()
    for uh, scene in enumerate(halves):
        state, losses = nerf_trainer.train_nerf(
            scene.images, scene.sils, scene.R_bop, scene.t_bop, scene.K, field,
            render_cfg=RenderConfig(), train_cfg=NerfTrainConfig(),
            n_steps=NERF_STEPS, steps_per_call=50,
        )
        states.append(state)
        print(f"half {uh}: nerf loss {np.mean(losses[:20]):.3f} -> {np.mean(losses[-20:]):.3f}")
    timings["nerf"] = time.perf_counter() - t

    t = time.perf_counter()
    for uh, scene in enumerate(halves):
        exp = os.path.join(out_root, f"{uh}_synth_obj_1")
        cors = generate_cors.generate_cors(
            field, states[uh].params_fine, scene.R_bop, scene.t_bop, scene.K, scene.sils,
            exp, 1, cors_cfg, grid_res=128, image_size=IMG,
        )
        cors_dirs.append(cors)
    timings["cors"] = time.perf_counter() - t

    # --- 3: descriptors on half 0 (queries CNN + feature head)
    t = time.perf_counter()
    scene0 = halves[0]
    bank = pose_trainer.load_ray_bank(cors_dirs[0], IMG, N_VIEWS)
    a1 = artifacts.load_array(cors_dirs[0], "a1.npy")
    neg = pose_trainer.build_negatives(
        field, states[0].params_fine, scene0.R_bop, scene0.t_bop, scene0.K, scene0.sils,
        a1, PoseTrainConfig(), image_size=IMG, n_loops=5, threshold=0.2,
    )
    print(f"negatives: {neg.shape}")
    pstate, cnn, plosses = pose_trainer.train_pose(
        field, states[0].params_fine, scene0.images, scene0.sils, bank, neg,
        cfg=PoseTrainConfig(), n_steps=POSE_STEPS,
    )
    print(f"pose loss {np.mean(plosses[:20]):.5f} -> {np.mean(plosses[-20:]):.5f}")
    timings["pose"] = time.perf_counter() - t

    # --- 4: bake features from the trained feature head
    t = time.perf_counter()
    exp0 = os.path.join(out_root, "0_synth_obj_1")
    verts_scaled, feats, normals = gen_feat.gen_feat(
        field, pstate.nerf_params, scene0.R_bop, scene0.t_bop, scene0.K, scene0.sils,
        diam, exp0, 1, FeatConfig(mc_threshold=0.05), image_size=IMG, threshold=0.2,
    )
    print(f"baked {verts_scaled.shape[0]} keys")
    timings["bake"] = time.perf_counter() - t

    # --- 5: inference with the trained CNN on half 1
    t = time.perf_counter()
    scene1 = halves[1]
    imgs_n = normalize_image(scene1.images)
    correct = 0
    adds = []
    key = jax.random.PRNGKey(3)
    pred = []
    for i in range(N_INFER):
        key, sub = jax.random.split(key)
        K_inf = jnp.asarray(scene1.K[i]).at[0:2, 2].add(-0.5)
        est = inference.estimate_pose_single(
            cnn, pstate.cnn_params, imgs_n[i], scene1.sils[i], K_inf,
            jnp.asarray(verts_scaled, jnp.float32), jnp.asarray(feats, jnp.float32), sub,
        )
        add = float(metrics.add_metric(
            jnp.asarray(verts_scaled, jnp.float32),
            jnp.asarray(scene1.R_bop[i]), jnp.asarray(scene1.t_bop[i]) * scale,
            est.R, est.t))
        adds.append(add)
        pred.append((np.asarray(est.R), np.asarray(est.t)))
        correct += add < 0.1 * diam * scale
        print(f"img {i}: ADD {add:.3f} (thresh {0.1*diam*scale:.3f}) inliers {int(est.n_inliers)}")
    timings["infer"] = time.perf_counter() - t

    # --- 6: registration with the best image
    t = time.perf_counter()
    best = int(np.argmin(adds))
    cad_pts, ok = synthetic.analytic_surface_points(20000, jax.random.PRNGKey(9))
    cad = np.asarray(cad_pts)[np.asarray(ok)] * scale
    upper = artifacts.load_array(artifacts.pose_dir(os.path.join(out_root, "0_synth_obj_1"), 1), "vert1_scaled.npy")
    lower = cad[cad[:, 2] < 2]
    out = registration.register_halves(
        upper[:20000], lower,
        np.asarray(scene1.R_bop[best]), np.asarray(scene1.t_bop[best]) * scale,
        pred[best][0], pred[best][1],
        cad, diameter=diam * scale, icp_threshold=0.2 * scale, icp_iters=20,
    )
    timings["icp"] = time.perf_counter() - t
    timings["total"] = time.perf_counter() - t0

    print(json.dumps({
        "pose_correct": f"{correct}/{N_INFER}",
        "median_add": float(np.median(adds)),
        "add_thresh": 0.1 * diam * scale,
        "chamfer": out["chamfer"],
        "chamfer_thresh": 0.1 * diam * scale,
        "chamfer_ok": out["correct"],
        "timings_s": {k: round(v, 1) for k, v in timings.items()},
    }))


if __name__ == "__main__":
    main()
