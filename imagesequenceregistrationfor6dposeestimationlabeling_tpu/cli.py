"""Command-line interface mirroring the reference's script entry points
(README.md:52-106):

  python -m imagesequenceregistrationfor6dposeestimationlabeling_tpu.cli \\
      train-nerf    --objid 1 --dataset ruapc --UH 1 [--cont]
      generate-cors --objid 1 --dataset ruapc --UH 1
      train-pose    --objid 1 --dataset ruapc --UH 1 [--cont]
      gen-feat      --objid 1 --dataset ruapc --UH 1
      inference     --objid 1 --dataset ruapc --UH 0 [--id N]
      poses-est     --objid 1 --dataset ruapc --UH 0   (choosePose --posesEst)
      rel-poses     --objid 1 --dataset ruapc --UH 0 --cal-gt/--cal-pred
      choose-image  --objid 1 --dataset ruapc --UH 0
      icp           --objid 1 --dataset ruapc
      verify        --objid 1 --dataset ruapc --UH 0

Stages communicate through the on-disk artifact bus (pipeline/artifacts.py)
exactly like the reference's file conventions; ``--root`` selects the
experiment root (default '.').  ``--synthetic`` swaps the BOP loader for
the analytic scene so the full pipeline runs without downloaded data.
"""

from __future__ import annotations

import argparse
import functools
import json
import os

import numpy as np


def _lazy():
    import jax
    import jax.numpy as jnp

    return jax, jnp


def load_data(args, image_size):
    jax, jnp = _lazy()
    if getattr(args, "synthetic_mesh", False):
        # mesh-rasterized synthetic data — the reference's synth=True cow
        # branch (trainNerfFine.py:84-87, cowrendersynth.py:1189-1336)
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import mesh_scene

        scene = mesh_scene.make_mesh_scene(
            n_views=args.synthetic_views, image_size=image_size,
            key=jax.random.PRNGKey(int(args.UH)),
        )
        diam = scene.diameter
        return (
            scene.images, scene.sils, scene.R_bop,
            scene.t_bop * (diam / 1.8), scene.K, diam,
        )
    if args.synthetic:
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic

        scene = synthetic.make_scene(
            n_views=args.synthetic_views, image_size=image_size, key=jax.random.PRNGKey(int(args.UH))
        )
        diam = scene.diameter
        return (
            np.asarray(scene.images),
            np.asarray(scene.sils),
            np.asarray(scene.R_bop),
            np.asarray(scene.t_bop) * (diam / 1.8),  # loader returns mm-like units
            np.asarray(scene.K),
            diam,
        )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import bop

    ids = bop.half_sequence_ids(args.dataset, int(args.UH))
    if args.fsamps:
        ids = ids[: args.fsamps]
    split = "lm" if args.dataset == "lm" else "train"
    samples = bop.load_bop_samples(
        os.path.join(args.bop_root, args.dataset), args.objid, ids,
        max_b=image_size, offset=5, split_dir=split,
    )
    diam = bop.load_diameter(os.path.join(args.bop_root, args.dataset), args.objid)
    return samples.images, samples.sils, samples.R, samples.t, samples.K, diam


def load_other_half(args, image_size):
    """Images/GT of the OTHER half-sequence: the reference estimates the
    poses of the second sequence's images with this experiment's model
    (finalposes.py:105-238 and inference.py:159-163 loop file_list[:1280]
    = ids 0..1279 for the 0_ experiment; choosePose.py:79-89 --cal_GT
    reads the same ids' scene_gt).  Flipping UH here reproduces exactly
    that cross-half evaluation."""
    import copy

    other = copy.copy(args)
    other.UH = 1 - int(args.UH)
    return load_data(other, image_size)


def exp_dir(args):
    return os.path.join(args.root, f"{args.UH}_{args.dataset}_obj_{args.objid}")


def field_config(args):
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import FieldConfig

    # --act-dtype bfloat16 also auto-enables the fused Pallas field kernel
    # on TPU (ops/field_kernel.py enabled(): the kernel's numerics ARE
    # bf16 activation storage, so the knobs stay truthful)
    act = getattr(args, "act_dtype", "float32")
    if getattr(args, "field_preset", "full") == "small":
        return FieldConfig(n_harmonic_functions=8, n_hidden=48, act_dtype=act)
    return FieldConfig(act_dtype=act)


def render_config(args):
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import RenderConfig

    if getattr(args, "field_preset", "full") == "small":
        return RenderConfig(n_rays_per_image=192, n_pts_coarse=32, n_pts_fine=48)
    return RenderConfig()


def cmd_train_nerf(args):
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
        FieldConfig, NerfTrainConfig, RenderConfig,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import checkpoint, nerf_trainer

    cfg = NerfTrainConfig()
    S = args.image_size or cfg.image_size
    images, sils, R, t, K, diam = load_data(args, S)
    scale = diam / 1.8
    t = t / scale  # trainNerfFine.py:95-101

    field = fields.NerfField(field_config(args))
    exp = exp_dir(args)
    nerf_d = artifacts.nerf_dir(exp, args.objid)
    os.makedirs(nerf_d, exist_ok=True)

    n_steps = args.steps or cfg.n_epochs * max(images.shape[0] // cfg.batch_size, 1)
    import dataclasses
    cfg = dataclasses.replace(cfg, warmup_steps=min(cfg.warmup_steps, max(n_steps // 3, 1)))

    state_path = os.path.join(nerf_d, "trainstate")
    init_params = None
    resume_state = None
    if args.cont and checkpoint.exists(state_path):
        # full-state resume: params + Adam moments + step (exact)
        like, _ = nerf_trainer.init_state(field, cfg, jax.random.PRNGKey(0))
        resume_state = checkpoint.load_state(state_path, like)
        print(f"continuing exactly from step {int(resume_state.step)}")
    elif args.cont and checkpoint.exists(os.path.join(nerf_d, "nerflatestFine")):
        # params-only fallback (reference .pth semantics)
        like = fields.init_field(field, jax.random.PRNGKey(0))
        pc, _ = checkpoint.load(os.path.join(nerf_d, "nerflatest"), like)
        pf, step0 = checkpoint.load(os.path.join(nerf_d, "nerflatestFine"), like)
        init_params = (pc, pf)
        print(f"continuing (params only) from step {step0}")

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.utils import viz

    cam0 = cam_lib.camera_from_bop(jnp.asarray(R[:1]), jnp.asarray(t[:1]), jnp.asarray(K[:1]), S)[0]
    min_d, max_d = nerf_trainer.depth_bounds(t)
    milestone = {"done": False}

    def save_latest(state, step):
        checkpoint.save(os.path.join(nerf_d, "nerflatest"), state.params_coarse, step)
        checkpoint.save(os.path.join(nerf_d, "nerflatestFine"), state.params_fine, step)
        checkpoint.save_state(state_path, state)
        # milestone snapshot at iter 50000 (trainNerfFine.py:349-351)
        if step >= 50000 and not milestone["done"]:
            checkpoint.save(os.path.join(nerf_d, "nerf50000Fine"), state.params_fine, step)
            milestone["done"] = True
        # render previews every checkpoint (trainNerfFine.py:365-427)
        if args.viz_every and step % args.viz_every < cfg.ckpt_every:
            rgb, sil = viz.render_preview(
                field, state.params_fine, cam0, S, 64, min_d, max_d, mode="color"
            )
            viz.save_image(os.path.join(nerf_d, "previews", f"{step}_rgb.png"), rgb)
            viz.save_image(os.path.join(nerf_d, "previews", f"{step}_sil.png"), sil)
            # one-glance grid (cowrendersynth.py:1347-1391's image_grid)
            viz.save_image(os.path.join(nerf_d, "previews", f"{step}_grid.png"),
                           viz.image_grid([rgb, sil], rows=1, cols=2, fill=False))
        # point-cloud dumps every pc_every (trainNerfFine.py:357-362);
        # the final cloud is extracted after training either way
        if step % cfg.pc_every < cfg.ckpt_every and step >= cfg.pc_every:
            try:
                v, _ = nerf_trainer.extract_point_cloud(
                    field, state.params_fine, threshold=0.03, grid_res=args.grid_res
                )
                artifacts.save_array(nerf_d, "v1fine.npy", v)
                vc, _ = nerf_trainer.extract_point_cloud(
                    field, state.params_coarse, threshold=0.03, grid_res=args.grid_res
                )
                artifacts.save_array(nerf_d, "v1.npy", vc)
            except Exception as e:  # early in training there may be no surface
                print(f"pc dump skipped at {step}: {e}")

    state, losses = nerf_trainer.train_nerf(
        jnp.asarray(images), jnp.asarray(sils), R, t, K, field,
        render_config(args), cfg, n_steps=n_steps, log_every=args.log_every,
        on_checkpoint=save_latest, init_params=init_params, resume_state=resume_state,
    )
    checkpoint.save(os.path.join(nerf_d, "nerflatest"), state.params_coarse, int(state.step))
    checkpoint.save(os.path.join(nerf_d, "nerflatestFine"), state.params_fine, int(state.step))
    checkpoint.save_state(state_path, state)
    verts, tris = nerf_trainer.extract_point_cloud(field, state.params_fine, threshold=0.03)
    artifacts.save_array(nerf_d, "v1fine.npy", verts)
    vc, _ = nerf_trainer.extract_point_cloud(field, state.params_coarse, threshold=0.03)
    artifacts.save_array(nerf_d, "v1.npy", vc)
    print(f"trained {n_steps} steps; final loss {losses[-1]:.4f}; cloud {verts.shape[0]} verts -> {nerf_d}")


def _load_field_params(args, which="nerflatestFine"):
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import FieldConfig
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import checkpoint

    field = fields.NerfField(field_config(args))
    like = fields.init_field(field, jax.random.PRNGKey(0))
    exp = exp_dir(args)
    path = os.path.join(artifacts.nerf_dir(exp, args.objid), which)
    if args.synthetic and not checkpoint.exists(path):
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic

        return synthetic.AnalyticField(), None
    params, step = checkpoint.load(path, like)
    return field, params


def cmd_generate_cors(args):
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import CorsConfig
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import generate_cors

    field, params = _load_field_params(args)
    # the analytic stand-in field has a sharp 0.5-level surface; trained
    # NeRFs use the reference's 0.2 (generateCors.py:180)
    cfg = CorsConfig(density_threshold=0.5 if params is None else 0.2)
    if args.image_size:
        import dataclasses
        # smoke scale: short-trained NeRFs have fuzzier surfaces — loosen
        # the denoising filters like the other smoke-scale stages
        cfg = dataclasses.replace(
            cfg, render_size=args.image_size, grid_pts_per_ray=96,
            mesh_filter_dist=0.15, outlier_nb_points=4, outlier_radius=0.2,
            n_subsurface=200, normals_k=48,
        )
    images, sils, R, t, K, diam = load_data(args, cfg.render_size)
    t = t / (diam / 1.8)
    cors = generate_cors.generate_cors(
        field, params, R, t, K, sils, exp_dir(args), args.objid, cfg, grid_res=args.grid_res
    )
    print(f"correspondences -> {cors}")


def cmd_train_pose(args):
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import PoseTrainConfig
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import ResNetUNet
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import checkpoint, pose_trainer
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields as fields_lib

    cfg = PoseTrainConfig()
    if args.image_size:
        import dataclasses
        # smoke scale: shorter-trained NeRFs have a fuzzier surface shell
        cfg = dataclasses.replace(
            cfg, image_size=args.image_size, sample_size=128, neg_mesh_dist=0.15
        )
    images, sils, R, t, K, diam = load_data(args, cfg.image_size)
    t = t / (diam / 1.8)
    exp = exp_dir(args)
    cors = artifacts.cors_dir(exp, args.objid)
    pose_d = artifacts.pose_dir(exp, args.objid)
    os.makedirs(pose_d, exist_ok=True)
    field, params = _load_field_params(args)
    if params is None:
        # analytic stand-in has no trainable feature head: swap in a real
        # field so descriptor training can optimize keys
        import jax as _jax

        field = fields_lib.NerfField(field_config(args))
        params = fields_lib.init_field(field, _jax.random.PRNGKey(0))

    # phase 1: negatives (trainPose.py:315-353 runs once then quits)
    neg_path = os.path.join(pose_d, "negVec.npy")
    if not os.path.exists(neg_path):
        mverts = artifacts.load_array(cors, "a1.npy")
        neg = pose_trainer.build_negatives(
            field, params, R, t, K, sils, mverts, cfg, image_size=cfg.image_size,
            threshold=0.5 if params is None else 0.2,
        )
        np.save(neg_path, neg)
        print(f"negVec built: {neg.shape} -> {neg_path}")
        if args.neg_only:
            return
    neg = np.load(neg_path)

    bank = pose_trainer.load_ray_bank(cors, cfg.image_size, images.shape[0])
    n_steps = args.steps or int(cfg.total_query_steps * cfg.batch_size / images.shape[0])
    state_path = os.path.join(pose_d, "trainstate")

    # few.npy: the image-id subset this run trains on (trainPose.py:177)
    if args.synthetic:
        few = np.arange(images.shape[0])
    else:
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import bop as _bop

        few = np.asarray(_bop.half_sequence_ids(args.dataset, int(args.UH)))
        if args.fsamps:
            few = few[: args.fsamps]
    np.save(os.path.join(exp, f"{args.objid}few.npy"), few)

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import normalize_image as _norm
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.utils import viz

    cnn_for_viz = ResNetUNet()
    img0_n = np.asarray(_norm(jnp.asarray(images[:1])))

    def save_latest(st, step):
        checkpoint.save(os.path.join(pose_d, "nerflatest"), st.nerf_params, step)
        checkpoint.save(os.path.join(pose_d, "encoderRGBlatest"), st.cnn_params, step)
        checkpoint.save_state(state_path, st)
        # query-embedding + mask-logit previews (trainPose.py:458-501)
        if args.viz_every and step % args.viz_every < cfg.ckpt_every:
            feat = np.asarray(cnn_for_viz.apply(st.cnn_params, jnp.asarray(img0_n)))[0]
            viz.save_image(
                os.path.join(pose_d, "previews", f"{step}_emb.png"),
                viz.emb_vis(feat[..., :12], sils[0]),
            )
            viz.save_image(
                os.path.join(pose_d, "previews", f"{step}_mask.png"),
                1.0 / (1.0 + np.exp(-feat[..., 12])),
            )
            viz.save_image(
                os.path.join(pose_d, "previews", f"{step}_grid.png"),
                viz.image_grid([viz.emb_vis(feat[..., :12], sils[0]),
                                1.0 / (1.0 + np.exp(-feat[..., 12]))],
                               rows=1, cols=2, fill=False),
            )

    init_cnn = None
    resume_state = None
    if args.cont and checkpoint.exists(state_path):
        # full-state resume: both nets' params + Adam moments + warmup step
        like_state = pose_trainer.init_pose_state(
            field, params, cfg, jax.random.PRNGKey(0), cfg.image_size
        )
        resume_state = checkpoint.load_state(state_path, like_state)
        print(f"continuing descriptor training exactly from step {int(resume_state.step)}")
    elif args.cont and checkpoint.exists(os.path.join(pose_d, "encoderRGBlatest")):
        init_cnn, step0 = checkpoint.load(os.path.join(pose_d, "encoderRGBlatest"))
        nerf_resume_path = os.path.join(pose_d, "nerflatest")
        if checkpoint.exists(nerf_resume_path):
            from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields as _f
            import jax as _j

            like = _f.init_field(field, _j.random.PRNGKey(0))
            params, _ = checkpoint.load(nerf_resume_path, like)
        print(f"continuing descriptor training (params only) from step {step0}")

    # content augmentation: distractor pastes + image-file backgrounds
    # (reference augment.py:297-314, 402-418)
    aug_cfg = None
    if args.distractors or args.distractor_dir:
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment as aug_lib

        aug_cfg = aug_lib.AugmentConfig(
            crop_res=cfg.image_size, min_mask_sum=10.0, p_distractor=0.3
        )
    bg_bank = None
    if args.bg_dir:
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment as aug_lib

        bg_bank = aug_lib.load_background_bank(args.bg_dir, cfg.image_size)
        print(f"background bank: {bg_bank.shape[0]} images from {args.bg_dir}")
    distractor_bank = None
    if args.distractor_dir:
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import augment as aug_lib

        distractor_bank = aug_lib.load_distractor_bank(args.distractor_dir, cfg.image_size)
        print(f"distractor bank: {distractor_bank[0].shape[0]} crops from {args.distractor_dir}")

    state, cnn, losses = pose_trainer.train_pose(
        field, params, jnp.asarray(images), jnp.asarray(sils), bank, neg,
        cfg=cfg, n_steps=n_steps, log_every=args.log_every,
        on_checkpoint=save_latest, init_cnn_params=init_cnn, resume_state=resume_state,
        aug_cfg=aug_cfg, bg_bank=bg_bank, distractor_bank=distractor_bank,
    )
    checkpoint.save(os.path.join(pose_d, "nerflatest"), state.nerf_params, int(state.step))
    checkpoint.save(os.path.join(pose_d, "encoderRGBlatest"), state.cnn_params, int(state.step))
    print(f"pose training done ({n_steps} steps, final loss {losses[-1]:.5f}) -> {pose_d}")


def cmd_gen_feat(args):
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import FeatConfig
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import gen_feat

    S = args.image_size or 224
    images, sils, R, t, K, diam = load_data(args, S)
    t = t / (diam / 1.8)
    field, params = _load_field_params(args)
    # thresholds follow the FIELD, not the data source: the analytic
    # stand-in has a sharp 0.5-level surface; a trained NeRF uses the
    # reference's 0.2 hit / 0.05 mesh thresholds (genFeat.py:183,206) —
    # matching cmd_generate_cors (a short-trained field may never reach
    # density 0.5 anywhere, which would yield an empty mesh)
    analytic = params is None
    verts, feats, normals = gen_feat.gen_feat(
        field, params, R, t, K, sils, diam, exp_dir(args), args.objid,
        FeatConfig(mc_threshold=0.5 if analytic else 0.05,
                   n_points=8000 if args.image_size else 80000,
                   sample_loops=3 if args.image_size else 19,
                   mesh_dist=0.15 if args.image_size else 0.05),
        image_size=S, grid_res=args.grid_res,
        threshold=0.5 if analytic else 0.2,
    )
    print(f"baked {verts.shape[0]} surface features -> {exp_dir(args)}")


def cmd_poses_est(args):
    """choosePose.py --posesEst / finalposes.py: per-image poses of the
    OTHER half-sequence -> pred_R.npy / pred_t.npy."""
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import ResNetUNet, normalize_image
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts, inference
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import checkpoint

    exp = exp_dir(args)
    pose_d = artifacts.pose_dir(exp, args.objid)
    # padded keys for correspondence (bucketed shapes hit the compile cache)
    verts, feats, normals, _ = artifacts.load_keys(pose_d, trim=False)
    # the estimated images are the OTHER half's (finalposes.py:105-238)
    images, sils, R, t, K, diam = load_other_half(args, args.image_size or 224)

    cnn = ResNetUNet()
    ckpt = os.path.join(pose_d, "encoderRGBlatest")
    cnn_params, _ = checkpoint.load(ckpt) if checkpoint.exists(ckpt) else (None, 0)
    imgs_n = np.asarray(normalize_image(jnp.asarray(images)))
    if args.use_surf_eval:
        # useSurfEval path: SurfEmb hypothesis scoring + refinement
        # (reference inference.py:324-366), batched — one compiled program
        # per image batch instead of a per-image dispatch loop
        pred_R, pred_t, _ = inference.run_sequence_surfemb(
            cnn, cnn_params, imgs_n, K, verts, normals, feats, diam,
        )
    else:
        pred_R, pred_t = inference.run_sequence(cnn, cnn_params, imgs_n, sils, K, verts, feats)
    np.save(os.path.join(exp, f"{args.objid}pred_R.npy"), pred_R)
    np.save(os.path.join(exp, f"{args.objid}pred_t.npy"), pred_t)
    print(f"saved {pred_R.shape[0]} poses -> {exp}")


def cmd_inference(args):
    """inference.py: per-image pose + ADD(-S) accuracy counters vs GT,
    writes <obj>correctly_predicted_list.txt (inference.py:312-374)."""
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models.unet import ResNetUNet, normalize_image
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import metrics
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts, inference
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import checkpoint

    exp = exp_dir(args)
    pose_d = artifacts.pose_dir(exp, args.objid)
    # padded keys for correspondence; n_real for the trimmed metric cloud
    # (the cycled tail would double-weight the prefix in ADD means)
    verts, feats, _, n_real = artifacts.load_keys(pose_d, trim=False)
    S = args.image_size or 224
    # evaluated images are the OTHER half's ("inference for second
    # sequence", inference.py:159-163)
    images, sils, R_gt, t_gt, K, diam = load_other_half(args, S)

    cnn = ResNetUNet()
    ckpt = os.path.join(pose_d, "encoderRGBlatest")
    cnn_params, _ = checkpoint.load(ckpt) if checkpoint.exists(ckpt) else (None, 0)

    if args.full_frames and not args.synthetic:
        # raw-frame path: SurfEmb affine crop + camMat = Ms @ K
        # (reference inference.py:196-233)
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import InferenceConfig
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import bop as bop_io

        frame_ids = bop_io.half_sequence_ids(args.dataset, 1 - int(args.UH))
        if args.fsamps:
            frame_ids = frame_ids[: args.fsamps]
        if args.id >= 0:
            frame_ids = [args.id]
        ds = os.path.join(args.bop_root, args.dataset)
        full = bop_io.load_bop_full_frames(ds, args.objid, frame_ids)
        diam = bop_io.load_diameter(ds, args.objid)
        key = jax.random.PRNGKey(1)
        work_ct = tot = 0
        correct_ids = []
        verts_j = jnp.asarray(verts, jnp.float32)
        verts_m = verts_j[:n_real]  # metric cloud without the cycled pad tail
        # Metric clouds exactly as the reference: the ADD/ADDS query cloud
        # is the CAD model's vertices (inference.py:84 `mesh1` -> :301-305
        # `modelVerts`) and ADDS NN-targets the BAKED surface cloud
        # (inference.py:118-120 `surfacePointsScaled`).
        try:
            metric_verts = jnp.asarray(bop_io.load_cad_points(ds, args.objid), jnp.float32)
        except OSError:
            metric_verts = verts_m  # no CAD ply on disk — baked cloud fallback
        if args.dataset == "tless":
            m = functools.partial(metrics.adds_metric, surface_points=verts_m)
        else:
            m = metrics.add_metric
        for a, i in enumerate(full.ids):
            key, sub = jax.random.split(key)
            est = inference.estimate_pose_full_frame(
                cnn, cnn_params, full.frames[a], full.masks[a], full.K[a],
                verts_j, jnp.asarray(feats, jnp.float32), sub, cfg=InferenceConfig(),
            )
            err = float(m(metric_verts, jnp.asarray(full.R[a], jnp.float32),
                          jnp.asarray(full.t[a], jnp.float32), est.R, est.t))
            tot += 1
            if err < 0.1 * diam:
                work_ct += 1
                correct_ids.append(int(i))
            print(f"img {int(i)}: ADD={err:.3f} (0.1*diam={0.1*diam:.3f}) workCT={work_ct}/{tot}")
        with open(os.path.join(exp, f"{args.objid}correctly_predicted_list.txt"), "w") as f:
            for i in correct_ids:
                f.write(f"{i}\n")
        print(f"final: workCT={work_ct} total={tot}")
        return

    imgs_n = np.asarray(normalize_image(jnp.asarray(images)))
    ids = range(images.shape[0]) if args.id < 0 else [args.id]
    work_ct = rot_work_ct = tot = 0
    correct_ids = []
    key = jax.random.PRNGKey(1)
    symmetric = args.dataset == "tless"
    verts_j = jnp.asarray(verts, jnp.float32)
    if args.use_surf_eval:
        normals = artifacts.load_array(pose_d, "normals_scaled.npy")
    for i in ids:
        key, sub = jax.random.split(key)
        if args.use_surf_eval:
            from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import (
                mesh as mesh_lib,
            )

            # single-image path: shard the hypothesis axis over the mesh
            R_i, t_i, _ = inference.estimate_pose_surfemb(
                cnn, cnn_params, jnp.asarray(imgs_n[i]), jnp.asarray(K[i], jnp.float32),
                verts_j, jnp.asarray(normals, jnp.float32),
                jnp.asarray(feats, jnp.float32), diam, sub,
                hyp_mesh=mesh_lib.auto_mesh(),
            )
            est = inference.PoseEstimate(R_i, t_i, jnp.zeros(()), jnp.ones((), bool), jnp.zeros(()))
        else:
            est = inference.estimate_pose_single(
                cnn, cnn_params, jnp.asarray(imgs_n[i]), jnp.asarray(sils[i]),
                jnp.asarray(K[i], jnp.float32), verts_j, jnp.asarray(feats, jnp.float32), sub,
            )
        m = metrics.adds_metric if symmetric else metrics.add_metric
        verts_m = verts_j[:n_real]  # metric cloud without the cycled pad tail
        err = float(m(verts_m, jnp.asarray(R_gt[i], jnp.float32), jnp.asarray(t_gt[i], jnp.float32), est.R, est.t))
        err_r = float(m(verts_m, jnp.asarray(R_gt[i], jnp.float32), jnp.zeros(3), est.R, jnp.zeros(3)))
        tot += 1
        if err < 0.1 * diam:
            work_ct += 1
            correct_ids.append(i)
        if err_r < 0.1 * diam:
            rot_work_ct += 1
        print(f"img {i}: ADD{'S' if symmetric else ''}={err:.3f} rotOnly={err_r:.3f} (0.1*diam={0.1*diam:.3f}) workCT={work_ct}/{tot}")
    with open(os.path.join(exp, f"{args.objid}correctly_predicted_list.txt"), "w") as f:
        for i in correct_ids:
            f.write(f"{i}\n")
    print(f"final: workCT={work_ct} rotWorkCT={rot_work_ct} total={tot}")


def cmd_rel_poses(args):
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import registration

    exp = exp_dir(args)
    # the reference runs choosePose.py twice (--cal_GT 1 / --cal_pred 1,
    # choosePose.py:98-114); here both can be requested in one invocation
    tags = [t for t, on in (("gt", args.cal_gt), ("pred", args.cal_pred)) if on] or ["gt"]
    for tag in tags:
        if tag == "pred":
            R = np.load(os.path.join(exp, f"{args.objid}pred_R.npy"))
            t = np.load(os.path.join(exp, f"{args.objid}pred_t.npy"))
        else:
            # GT of the estimated (OTHER-half) images (choosePose.py:79-89)
            images, sils, R, t, K, diam = load_other_half(args, 64)
        rel_R, rel_t = registration.relative_pose_tensor(
            jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)
        )
        n = R.shape[0]
        T = np.zeros((n, n, 4, 4))
        T[..., :3, :3] = np.asarray(rel_R)
        T[..., :3, 3] = np.asarray(rel_t)
        T[..., 3, 3] = 1
        np.save(os.path.join(exp, f"{args.objid}{tag}_relative_poses.npy"), T)
        print(f"saved {tag} relative poses {T.shape} -> {exp}")


def cmd_choose_image(args):
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops.pointcloud import farthest_point_sampling
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts, registration

    exp = exp_dir(args)
    gt = np.load(os.path.join(exp, f"{args.objid}gt_relative_poses.npy"))
    pr = np.load(os.path.join(exp, f"{args.objid}pred_relative_poses.npy"))
    # trimmed cloud: the cycled pad tail would bias FPS/ADD-S (ADVICE r2)
    verts, _, _, _ = artifacts.load_keys(artifacts.pose_dir(exp, args.objid))
    idx = farthest_point_sampling(jnp.asarray(verts, jnp.float32), min(512, verts.shape[0]))
    sub = jnp.asarray(verts, jnp.float32)[idx]
    images, sils, R, t, K, diam = load_data(args, 64)
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.parallel import mesh as mesh_lib

    agree, errs = registration.agreement_matrix(
        jnp.asarray(gt[..., :3, :3], jnp.float32), jnp.asarray(gt[..., :3, 3], jnp.float32),
        jnp.asarray(pr[..., :3, :3], jnp.float32), jnp.asarray(pr[..., :3, 3], jnp.float32),
        sub, diam, mesh=mesh_lib.auto_mesh(),
    )
    best, top = registration.choose_best_image(np.asarray(agree), top_k=50)
    with open(os.path.join(exp, f"{args.objid}top_50_choices.txt"), "w") as f:
        for i in top:
            f.write(f"{i}\n")
    np.save(os.path.join(exp, f"{args.objid}error.npy"), np.asarray(agree).astype(np.float64))
    print(f"best image: {best}; top-50 saved")


def cmd_icp(args):
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts, registration
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import bop as bop_io

    root = args.root
    exp0 = os.path.join(root, f"0_{args.dataset}_obj_{args.objid}")
    exp1 = os.path.join(root, f"1_{args.dataset}_obj_{args.objid}")
    # trimmed clouds: the cycled pad tail would double-weight the prefix in
    # the ICP least-squares fit and the Chamfer mean (ADVICE r2)
    upper, _, _, _ = artifacts.load_keys(artifacts.pose_dir(exp1, args.objid))
    lower, _, _, _ = artifacts.load_keys(artifacts.pose_dir(exp0, args.objid))
    with open(os.path.join(exp0, f"{args.objid}top_50_choices.txt")) as f:
        chosen = int(f.readline())
    pred_R = np.load(os.path.join(exp0, f"{args.objid}pred_R.npy"))[chosen]
    pred_t = np.load(os.path.join(exp0, f"{args.objid}pred_t.npy"))[chosen]
    if args.synthetic:
        # GT pose of the chosen image — an OTHER-half (UH=1) image, since
        # the 0_ experiment's pred poses are of ids 0..1279 (icp.py:59-64
        # reads scene_gt[str(id_chosen)] = an upper-half id)
        args.UH = 0
        images, sils, R, t, K, diam = load_other_half(args, 64)
        gt_R, gt_t = R[chosen], t[chosen]
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
        import jax as _jax

        pts, ok = synthetic.analytic_surface_points(20000, _jax.random.PRNGKey(9))
        cad = np.asarray(pts)[np.asarray(ok)] * (diam / 1.8)
    else:
        ds = os.path.join(args.bop_root, args.dataset)
        import json as _json

        gt = _json.load(open(os.path.join(ds, "train", str(args.objid).zfill(6), "scene_gt.json")))
        gt_R = np.asarray(gt[str(chosen)][0]["cam_R_m2c"]).reshape(3, 3)
        gt_t = np.asarray(gt[str(chosen)][0]["cam_t_m2c"])
        cad = bop_io.load_cad_points(ds, args.objid)
        diam = bop_io.load_diameter(ds, args.objid)
    out = registration.register_halves(
        upper, lower, gt_R, gt_t, pred_R, pred_t, cad, diam, icp_threshold=args.icp_threshold
    )
    summary = {
        k: (v.tolist() if isinstance(v, np.ndarray) else v)
        for k, v in out.items()
        if k != "merged"
    }
    print(json.dumps(summary, default=float))


def cmd_verify(args):
    jax, jnp = _lazy()
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts, registration

    exp = exp_dir(args)
    # trimmed cloud: duplicates would double-weight the Chamfer mean
    cloud, _, _, _ = artifacts.load_keys(artifacts.pose_dir(exp, args.objid))
    pred_R = np.load(os.path.join(exp, f"{args.objid}pred_R.npy"))
    pred_t = np.load(os.path.join(exp, f"{args.objid}pred_t.npy"))
    images, sils, R, t, K, diam = load_data(args, 64)
    n = min(len(R), len(pred_R))
    best, chams = registration.verify_consecutive(cloud[:5000], R[:n], t[:n], pred_R[:n], pred_t[:n])
    print(f"best image {best}, min chamfer {min(chams):.4f}")


def cmd_video(args):
    """Rotating-NeRF video (nutil.py:463-496): render a camera ring around
    the trained fine field and save frames + an animated GIF."""
    jax, jnp = _lazy()
    from PIL import Image

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.geometry import cameras as cam_lib
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.utils import viz

    field, params = _load_field_params(args)
    exp = exp_dir(args)
    nerf_d = artifacts.nerf_dir(exp, args.objid)
    S = args.image_size or 128
    Rs, ts = viz.rotating_views(n_frames=args.frames, dist=4.0)
    K = np.asarray([[2.1 * S, 0.0, S / 2], [0.0, 2.1 * S, S / 2], [0.0, 0.0, 1.0]])
    out_dir = os.path.join(nerf_d, "video")
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for i in range(args.frames):
        cam = cam_lib.camera_from_bop(
            jnp.asarray(Rs[i : i + 1]), jnp.asarray(ts[i : i + 1]), jnp.asarray(K)[None], S
        )[0]
        if params is None:
            from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic

            from imagesequenceregistrationfor6dposeestimationlabeling_tpu.render import renderer

            images, weights, _ = renderer.render_grid_chunked(
                lambda p, d, m: synthetic.analytic_field(p, d, m), cam, S, 64,
                2.0, 6.0, mode="color", chunk=S * S,
            )
            rgb = np.asarray(images[:, :3].reshape(S, S, 3))
        else:
            rgb, sil = viz.render_preview(field, params, cam, S, 64, 2.0, 6.0, mode="color")
        viz.save_image(os.path.join(out_dir, f"{i:03d}.png"), rgb)
        frames.append(Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)))
    gif = os.path.join(nerf_d, "rotating.gif")
    frames[0].save(gif, save_all=True, append_images=frames[1:], duration=100, loop=0)
    print(f"{args.frames} frames -> {out_dir}; gif -> {gif}")


def cmd_check(args):
    """check_pose.py analog: print shapes of pipeline artifacts."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.pipeline import artifacts

    exp = exp_dir(args)
    cors = artifacts.cors_dir(exp, args.objid)
    pose_d = artifacts.pose_dir(exp, args.objid)
    for d, name in [
        (cors, "a1.npy"), (cors, "subvert1.npy"), (cors, "subnormal1.npy"),
        (pose_d, "negVec.npy"), (pose_d, "vert1_scaled.npy"),
        (pose_d, "feat1_scaled.npy"), (pose_d, "normals_scaled.npy"),
    ]:
        p = os.path.join(d, name)
        if os.path.exists(p):
            print(f"{p}: {np.load(p).shape}")
        else:
            print(f"{p}: MISSING")
    for i in range(3):
        if artifacts.has_view_rays(cors, 224, i):
            xys, pv, bxys, bv = artifacts.load_view_rays(cors, 224, i)
            print(f"view {i}: posVec {pv.shape} back {bv.shape}")


def build_parser():
    p = argparse.ArgumentParser(prog="isr6d", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--objid", default=1, type=int)
        sp.add_argument("--dataset", default="ruapc")
        sp.add_argument("--UH", default=0, type=int)
        sp.add_argument("--root", default=".")
        sp.add_argument("--bop-root", default="bop")
        sp.add_argument("--cont", action="store_true")
        sp.add_argument("--synthetic", action="store_true")
        sp.add_argument("--synthetic-mesh", action="store_true",
                        help="mesh-rasterized synthetic data (the reference's "
                             "cow-render branch, cowrendersynth.py:1189-1336)")
        sp.add_argument("--synthetic-views", default=8, type=int)
        sp.add_argument("--fsamps", default=0, type=int)
        sp.add_argument("--steps", default=0, type=int)
        sp.add_argument("--log-every", default=100, type=int)
        sp.add_argument("--grid-res", default=128, type=int)
        sp.add_argument(
            "--act-dtype", default="float32", choices=("float32", "bfloat16"),
            help="field activation storage; bfloat16 halves HBM traffic and "
                 "enables the fused Pallas field kernel on TPU",
        )
        sp.add_argument("--image-size", default=0, type=int,
                        help="override stage image size (smoke runs)")
        sp.add_argument("--field-preset", default="full", choices=["full", "small"],
                        help="small = tiny NeRF for smoke runs")
        sp.add_argument("--viz-every", default=100, type=int,
                        help="training preview-image cadence (0 = off; "
                             "reference dumps every 100, trainNerfFine.py:365)")

    for name, fn in [
        ("train-nerf", cmd_train_nerf),
        ("generate-cors", cmd_generate_cors),
        ("train-pose", cmd_train_pose),
        ("gen-feat", cmd_gen_feat),
        ("inference", cmd_inference),
        ("poses-est", cmd_poses_est),
        ("rel-poses", cmd_rel_poses),
        ("choose-image", cmd_choose_image),
        ("icp", cmd_icp),
        ("verify", cmd_verify),
        ("check", cmd_check),
        ("video", cmd_video),
    ]:
        sp = sub.add_parser(name)
        common(sp)
        sp.set_defaults(fn=fn)
        if name == "train-pose":
            sp.add_argument("--neg-only", action="store_true")
            sp.add_argument("--distractors", action="store_true",
                            help="paste other-view distractors, p=0.3 (augment.py:402-418)")
            sp.add_argument("--bg-dir", default="",
                            help="directory of background images (COCO stand-in, augment.py:297-314)")
            sp.add_argument("--distractor-dir", default="",
                            help="directory of other-object masked crops pasted as "
                                 "occluding distractors, p=0.3 (tless_aug, augment.py:402-418)")
        if name == "rel-poses":
            sp.add_argument("--cal-gt", action="store_true")
            sp.add_argument("--cal-pred", action="store_true")
        if name == "icp":
            sp.add_argument("--icp-threshold", default=20.0, type=float)
        if name == "inference" or name == "poses-est":
            sp.add_argument("--id", default=-1, type=int)
            sp.add_argument("--use-surf-eval", action="store_true",
                            help="SurfEmb hypothesis scoring + refinement instead of "
                                 "argmax-PnP (reference useSurfEval, inference.py:324-366)")
        if name == "video":
            sp.add_argument("--frames", default=36, type=int,
                            help="number of rotating views (nutil.py:463-496)")
        if name == "inference":
            sp.add_argument("--full-frames", action="store_true",
                            help="consume raw rgb/mask_visib frames via the SurfEmb "
                                 "affine crop, camMat = Ms @ K (inference.py:196-233)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
