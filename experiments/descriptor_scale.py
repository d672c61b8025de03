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
N_INFER = int(os.environ.get("DS_INFER", 64))
# held-out images used ONLY for DS_EVAL_EVERY checkpoint selection — kept
# disjoint from the N_INFER report set (VERDICT r4 weak #5: selection on
# the report set leaks future information into the reported number)
N_SELECT = int(os.environ.get("DS_SELECT", 16))
# optional suffix so ablation reruns (e.g. scaled NeRF steps) don't
# overwrite the canonical dscale_<views>v_<steps>s checkpoint dir
TAG = os.environ.get("DS_TAG", "")
# which half-sequence to train on (inference runs on the OTHER half) —
# the reference labels both halves by running the pipeline twice
# (README.md:52-60); DS_TRAIN_HALF=1 measures the mirrored direction
TRAIN_HALF = int(os.environ.get("DS_TRAIN_HALF", 0))
# scene kind: "analytic" (volumetric blob), "mesh" (rasterized, flat
# shading) or "mesh_tex" (rasterized + high-frequency procedural texture —
# the texture-anchoring hypothesis run, EXPERIMENTS.md round 4)
SCENE = os.environ.get("DS_SCENE", "analytic")
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

    # DS_OUT_ROOT: stable artifact root shared by knob-ablation runs — the
    # NeRF field, cors artifacts and negatives are identical across
    # descriptor-knob sweeps (same scene/seed/schedule), so reruns skip
    # ~6 min of recompute AND every ablation trains against the exact same
    # field (generate_cors already has per-view idempotent skip).
    out_root = os.environ.get("DS_OUT_ROOT") or tempfile.mkdtemp(prefix="dscale_")
    os.makedirs(out_root, exist_ok=True)
    timings = {}
    t0 = time.perf_counter()

    scene0 = load_scene_cached(TRAIN_HALF, N_VIEWS, IMG, cache_dir=_CACHE, kind=SCENE)
    # other-half views: [0:N_INFER] = report set, [N_INFER:] = selection set
    scene1 = load_scene_cached(1 - TRAIN_HALF, N_INFER + N_SELECT, IMG,
                               cache_dir=_CACHE, kind=SCENE)
    diam = scene0.diameter
    scale = diam / 1.8
    timings["data"] = round(time.perf_counter() - t0, 1)
    print(f"scenes ready ({timings['data']} s)", flush=True)

    # bf16 activation storage enables the fused Pallas field kernel on TPU
    # (same losses/quality measured in kernel_train_ab.py; ~1.6x on the
    # NeRF phase, which dominates this run's wall time)
    field = fields.NerfField(FieldConfig(act_dtype=os.environ.get("ACT_DTYPE", "bfloat16")))

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import checkpoint

    t = time.perf_counter()
    nerf_ckpt = os.path.join(out_root, f"nerf_{SCENE}_{N_VIEWS}v_{NERF_STEPS}s_{IMG}")
    if checkpoint.exists(nerf_ckpt):
        like = fields.init_field(field, jax.random.PRNGKey(0))
        params_fine, _ = checkpoint.load(nerf_ckpt, like=like)
        timings["nerf"] = round(time.perf_counter() - t, 1)
        print(f"nerf: cached <- {nerf_ckpt} ({timings['nerf']} s)", flush=True)
    else:
        state, losses = nerf_trainer.train_nerf(
            scene0.images, scene0.sils, scene0.R_bop, scene0.t_bop, scene0.K, field,
            render_cfg=RenderConfig(), train_cfg=NerfTrainConfig(),
            n_steps=NERF_STEPS, steps_per_call=50,
        )
        params_fine = state.params_fine
        checkpoint.save(nerf_ckpt, params_fine, NERF_STEPS)
        timings["nerf"] = round(time.perf_counter() - t, 1)
        print(f"nerf: loss {np.mean(losses[:20]):.2f} -> {np.mean(losses[-20:]):.2f} "
              f"({timings['nerf']} s)", flush=True)

    t = time.perf_counter()
    exp0 = os.path.join(out_root, "0_synth_obj_1")
    cors = generate_cors.generate_cors(
        field, params_fine, scene0.R_bop, scene0.t_bop, scene0.K, scene0.sils,
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
    # descriptor-overfitting regularizer knobs (round-5 sweep; defaults are
    # reference parity — see PoseTrainConfig in config.py)
    cfg = PoseTrainConfig(
        key_noise=float(os.environ.get("DS_KEY_NOISE", "1e-3")),
        pos_noise=float(os.environ.get("DS_POS_NOISE", "0")),
        infonce_temp=float(os.environ.get("DS_TEMP", "1")),
        head_weight_decay=float(os.environ.get("DS_WD", "0")),
    )
    neg_path = os.path.join(out_root, f"neg_{SCENE}_{N_VIEWS}v_{IMG}.npy")
    if os.path.exists(neg_path):
        neg = np.load(neg_path)
        print(f"negatives: cached {neg.shape}", flush=True)
    else:
        neg = pose_trainer.build_negatives(
            field, params_fine, scene0.R_bop, scene0.t_bop, scene0.K, scene0.sils,
            a1, cfg, image_size=IMG, n_loops=20, threshold=0.2,
        )
        np.save(neg_path, np.asarray(neg))
        print(f"negatives: {neg.shape}", flush=True)
    # DS_AUG_BOOST scales the geometric-jitter strength; DS_P_DISTRACTOR the
    # occluder paste rate (aug diversity is a view-count-scaled overfitting
    # lever — VERDICT r4 next #1)
    boost = float(os.environ.get("DS_AUG_BOOST", "1"))
    aug_cfg = aug_lib.AugmentConfig(
        crop_res=IMG, min_mask_sum=10.0,
        p_distractor=float(os.environ.get("DS_P_DISTRACTOR", "0.3")),
        scale_jitter=0.075 * boost, trans_frac=0.1 * boost,
    )

    n_eval = N_INFER + N_SELECT
    imgs_n = np.asarray(normalize_image(jnp.asarray(scene1.images[:n_eval])))
    Ks = np.asarray(scene1.K[:n_eval]).astype(np.float32)
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

    def eval_adds(cnn, cnn_params, verts_scaled, feats, n_real, lo=0, hi=None):
        """Per-image ADD on other-half views [lo:hi] ([0:N_INFER] = report
        set, [N_INFER:] = the DS_EVAL_EVERY selection set)."""
        hi = N_INFER if hi is None else hi
        pred_R, pred_t = inference.run_sequence(
            cnn, cnn_params, imgs_n[lo:hi], np.asarray(scene1.sils[lo:hi]),
            Ks[lo:hi], verts_scaled, feats, cfg=InferenceConfig(),
            batch=min(8, hi - lo),
        )
        # metric cloud without the cycled pad tail (duplicates would
        # double-weight the cycled prefix in the ADD mean)
        verts_j = jnp.asarray(verts_scaled[:n_real], jnp.float32)
        return [
            float(metrics.add_metric(
                verts_j, jnp.asarray(scene1.R_bop[lo + i]),
                jnp.asarray(scene1.t_bop[lo + i]) * scale,
                jnp.asarray(pred_R[i]), jnp.asarray(pred_t[i])))
            for i in range(hi - lo)
        ]

    # DS_EVAL_EVERY>0 trains in segments with a held-out ADD eval (bake +
    # infer on the SELECTION pool, disjoint from the report set) after each,
    # and keeps the BEST checkpoint — train-InfoNCE is not a quality proxy
    # for the descriptor phase (EXPERIMENTS.md round-4 cross-eval: a
    # lower-loss CNN can collapse on novel views), so model selection must
    # use a held-out metric; the report metric stays untouched.
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
                field, params_fine, scene0.images, scene0.sils, bank,
                neg, cfg=cfg, aug_cfg=aug_cfg, n_steps=done,
                steps_per_call=50, resume_state=pstate,
            )
            plosses.extend(np.asarray(pl).tolist())
            v, f, nrm, n_real = bake(pstate.nerf_params)
            adds = eval_adds(cnn, pstate.cnn_params, v, f, n_real,
                             lo=N_INFER, hi=N_INFER + N_SELECT)
            ok = int(sum(a < thresh for a in adds))
            med = float(np.median(adds))
            step_curve.append({"step": done, "correct": f"{ok}/{N_SELECT}",
                               "median_add": round(med, 4)})
            print(f"select-eval @{done}: {ok}/{N_SELECT} median {med:.4f}",
                  flush=True)
            if best is None or (ok, -med) > (best[0], -best[1]):
                best = (ok, med, done, pstate)
        pstate = best[3]
        print(f"best checkpoint: step {best[2]} ({best[0]}/{N_SELECT}, "
              f"median {best[1]:.4f})", flush=True)
    else:
        pstate, cnn, plosses = pose_trainer.train_pose(
            field, params_fine, scene0.images, scene0.sils, bank, neg,
            cfg=cfg, aug_cfg=aug_cfg, n_steps=POSE_STEPS, steps_per_call=50,
        )
    timings["pose"] = round(time.perf_counter() - t, 1)
    print(f"pose: loss {np.mean(plosses[:20]):.5f} -> {np.mean(plosses[-20:]):.5f} "
          f"({timings['pose']} s)", flush=True)

    # persist the trained nets so later rounds can reuse them (the pose
    # phase is hours; everything else regenerates in minutes)
    save_dir = os.path.join(
        _CACHE, f"dscale_{N_VIEWS}v_{POSE_STEPS}s"
        + ("" if SCENE == "analytic" else f"_{SCENE}")
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
        "views": N_VIEWS, "train_half": TRAIN_HALF, "scene": SCENE,
        "pose_steps": POSE_STEPS, "nerf_steps": NERF_STEPS,
        "n_neg": int(neg.shape[0]),
        "n_keys": n_real, "n_keys_padded": int(verts_scaled.shape[0]),
        "pose_correct": f"{correct}/{N_INFER}",
        "median_add": round(float(np.median(adds)), 4),
        "add_thresh": round(thresh, 4),
        "adds": [round(a, 3) for a in adds],
        "knobs": {
            "key_noise": cfg.key_noise, "pos_noise": cfg.pos_noise,
            "infonce_temp": cfg.infonce_temp,
            "head_weight_decay": cfg.head_weight_decay,
            "aug_boost": boost, "p_distractor": aug_cfg.p_distractor,
        },
        "timings_s": timings,
    }
    if step_curve:
        out["step_curve"] = step_curve
        out["best_step"] = best[2]
        out["n_select"] = N_SELECT
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
