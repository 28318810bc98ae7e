"""Pallas packet-traversal kernel vs. oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from lens_flare_tpu.accel.wide import build_wide_bvh, choose_shape
from lens_flare_tpu.ops.intersect_pallas import PallasScene, intersect_pallas
from lens_flare_tpu.oracle import tracer as oracle
from lens_flare_tpu.scene.build import load_scene
from lens_flare_tpu.scene.camera import Camera, place_from_scene_info


def test_choose_shape_capacity():
    for n in (1, 100, 2000, 30000, 120000):
        b1, b2, k = choose_shape(n)
        assert b1 * b2 * k >= n


def _check_scene(path, n_rays=256, seed=0):
    scene, info = load_scene(path)
    wb = build_wide_bvh(scene.tri_p)
    ps = PallasScene(wb, scene.sph_center, scene.sph_radius, scene.num_triangles)
    cam = Camera()
    cam.configure(info.camera, 128, 128)
    place_from_scene_info(cam, info, scene.bbox_min, scene.bbox_max)

    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, 1, n_rays)
    ys = rng.uniform(0, 1, n_rays)
    o = np.zeros((n_rays, 3), np.float32)
    d = np.zeros((n_rays, 3), np.float32)
    for i in range(n_rays):
        oo, dd = oracle.generate_ray(cam, xs[i], ys[i])
        o[i] = oo
        d[i] = dd

    t, prim, b1v, b2v, hit = intersect_pallas(
        ps,
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.full(n_rays, cam.n_clip, jnp.float32),
        jnp.full(n_rays, cam.f_clip, jnp.float32),
        interpret=True,
    )
    t = np.asarray(t)
    prim = np.asarray(prim)
    hit = np.asarray(hit)

    n_hits = 0
    for i in range(n_rays):
        ref = oracle.intersect_brute(
            scene, o[i].astype(np.float64), d[i].astype(np.float64), cam.n_clip, cam.f_clip
        )
        if ref is None:
            assert not hit[i], f"ray {i}: false positive"
        else:
            n_hits += 1
            assert hit[i], f"ray {i}: missed"
            assert prim[i] == ref["prim"], f"ray {i}"
            assert abs(t[i] - ref["t"]) < 1e-3 * max(1.0, ref["t"]), f"ray {i}"
    return n_hits


def test_pallas_matches_oracle_pyramid(dae_dir):
    assert _check_scene(dae_dir / "pyramid.dae") > 30


def test_pallas_matches_oracle_spheres(dae_dir):
    # mixed triangles + analytic spheres
    assert _check_scene(dae_dir / "sky" / "CBspheres_lambertian.dae", n_rays=128) >= 20
