"""Disk cache for synthetic scenes (bench + experiments).

Synthetic scene rendering is deterministic in (seed, n_views, image_size)
but costs minutes per sequence on-device; the reference pipeline loads
images from disk (cowrendersynth.py:610-747), so cached scenes keep the
benchmarked pipeline comparable while bench/experiment reruns skip the
generation cost (VERDICT r1 weak #8).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

_DEFAULT_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".bench_cache",
)


def load_scene_cached(seed: int, n_views: int, image_size: int, cache_dir: str | None = None,
                      kind: str = "analytic"):
    """Return a ``SyntheticScene``, generating and caching it if absent.

    ``kind``: "analytic" (volumetric blob, synthetic.make_scene),
    "mesh" (rasterized blob mesh, flat NOCS shading) or "mesh_tex"
    (rasterized with the high-frequency procedural texture — the
    texture-anchoring experiment's data, EXPERIMENTS.md round 4)."""
    from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import synthetic

    cache_dir = cache_dir or _DEFAULT_CACHE
    os.makedirs(cache_dir, exist_ok=True)
    prefix = "scene" if kind == "analytic" else f"scene-{kind}"
    path = os.path.join(cache_dir, f"{prefix}_{seed}_{n_views}_{image_size}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return synthetic.SyntheticScene(
            images=jnp.asarray(z["images"]), sils=jnp.asarray(z["sils"]),
            R_bop=jnp.asarray(z["R_bop"]), t_bop=jnp.asarray(z["t_bop"]),
            K=jnp.asarray(z["K"]), diameter=float(z["diameter"]),
        )
    if kind == "analytic":
        scene = synthetic.make_scene(
            n_views=n_views, image_size=image_size, key=jax.random.PRNGKey(seed)
        )
    elif kind in ("mesh", "mesh_tex"):
        from imagesequenceregistrationfor6dposeestimationlabeling_tpu.data import mesh_scene

        ms = mesh_scene.make_mesh_scene(
            n_views=n_views, image_size=image_size, key=jax.random.PRNGKey(seed),
            subdivisions=4, textured=(kind == "mesh_tex"),
        )
        scene = synthetic.SyntheticScene(
            images=jnp.asarray(ms.images), sils=jnp.asarray(ms.sils),
            R_bop=jnp.asarray(ms.R_bop), t_bop=jnp.asarray(ms.t_bop),
            K=jnp.asarray(ms.K), diameter=float(ms.diameter),
        )
    else:
        raise ValueError(f"unknown scene kind: {kind!r}")
    jax.block_until_ready(scene.images)
    # atomic publish: an interrupted or concurrent writer must never leave a
    # truncated .npz that poisons every later run
    tmp = path + f".tmp.{os.getpid()}.npz"
    np.savez(
        tmp, images=np.asarray(scene.images), sils=np.asarray(scene.sils),
        R_bop=np.asarray(scene.R_bop), t_bop=np.asarray(scene.t_bop),
        K=np.asarray(scene.K), diameter=scene.diameter,
    )
    os.replace(tmp, path)
    return scene
