"""NeRF schedule ablation: few-steps x huge-ray-batch vs the reference's
many-steps x small-batch (EXPERIMENTS.md round-1 proposal; VERDICT r1 #3d).

Wall-clock on TPU is ~linear in TOTAL ray-samples processed (the chunked
remat step is FLOP-bound at ~23 us/ray incl. fwd+bwd at 64+320 pts);
convergence per ray favors more optimizer steps.  This sweep holds the
scene fixed and varies (n_steps, rays/step) at roughly constant and
reduced total-ray budgets, gating quality on the Chamfer distance of the
extracted marching-cubes cloud against the analytic surface.

Run on TPU:  python experiments/nerf_schedule.py
Env: NS_VIEWS (8), NS_IMG (224), NS_SCHEDULES override.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N_VIEWS = int(os.environ.get("NS_VIEWS", 8))
IMG = int(os.environ.get("NS_IMG", 224))

# (n_steps, batch_cams, rays_per_image) — reference is (800, 3, 400)
SCHEDULES = [
    (800, 3, 400),    # round-1 bench schedule (0.96M rays)
    (400, 3, 800),    # same ray budget, half the steps
    (200, 6, 800),    # same ray budget, quarter the steps
    (400, 3, 400),    # HALF the ray budget, half the steps
    (250, 3, 400),    # third budget (multiple of steps_per_call=50 — odd
                      # tails compile an extra program, ~60-200 s via relay)
]


def main():
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.config import (
        FieldConfig,
        NerfTrainConfig,
        RenderConfig,
    )
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.models import fields
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.ops import pointcloud as pc
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.train import nerf_trainer

    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data.scene_cache import (
        load_scene_cached,
    )

    scene = load_scene_cached(0, N_VIEWS, IMG)
    gt_pts, ok = synthetic.analytic_surface_points(20000, jax.random.PRNGKey(9))
    gt = jnp.asarray(np.asarray(gt_pts)[np.asarray(ok)], jnp.float32)
    field = fields.NerfField(FieldConfig())

    results = []
    for n_steps, bs, rays in SCHEDULES:
        t0 = time.perf_counter()
        state, losses = nerf_trainer.train_nerf(
            scene.images, scene.sils, scene.R_bop, scene.t_bop, scene.K, field,
            render_cfg=RenderConfig(n_rays_per_image=rays),
            train_cfg=NerfTrainConfig(
                batch_size=bs, warmup_steps=min(300, max(n_steps // 3, 1))
            ),
            n_steps=n_steps, steps_per_call=50,
        )
        t_train = time.perf_counter() - t0
        t0 = time.perf_counter()
        try:
            verts, _ = nerf_trainer.extract_point_cloud(field, state.params_fine, threshold=0.03)
            # uniform random subsample — verts are in grid-slice order, so a
            # [:20000] prefix would be a spatial slab and inflate the
            # symmetric Chamfer regardless of quality
            sub = verts[np.random.default_rng(0).permutation(verts.shape[0])[:20000]]
            cham = float(pc.chamfer_distance(jnp.asarray(sub, jnp.float32), gt))
            n_verts = int(verts.shape[0])
        except Exception as e:
            cham, n_verts = float("nan"), 0
        t_extract = time.perf_counter() - t0
        row = {
            "steps": n_steps, "bs": bs, "rays": rays,
            "mrays": round(n_steps * bs * rays / 1e6, 3),
            "train_s": round(t_train, 1), "extract_s": round(t_extract, 1),
            "final_loss": round(float(np.mean(losses[-10:])), 2),
            "chamfer": round(cham, 4), "verts": n_verts,
            "chamfer_ok": bool(cham < 0.1 * scene.diameter),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
