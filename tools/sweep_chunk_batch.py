"""A/B sweep of the kernel's chunk_batch (child chunks fused per traversal
iteration) on the real TPU, with honest tunnel timing.

Usage: python tools/sweep_chunk_batch.py [scene ...]
Scenes: pyramid terrain128 terrain256 terrain512 (default: all)
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def make_rays(scene, cam, n_rays):
    import jax.numpy as jnp

    from lens_flare_tpu.scene.camera import generate_rays

    side = int(np.sqrt(n_rays))
    ys, xs = np.mgrid[0:side, 0:side]
    bs = 32
    order = np.argsort(
        ((ys.ravel() // bs) * (side // bs) + xs.ravel() // bs) * bs * bs
        + (ys.ravel() % bs) * bs
        + (xs.ravel() % bs),
        kind="stable",
    )
    px = jnp.asarray((xs.ravel()[order] + 0.5) / side, jnp.float32)
    py = jnp.asarray((ys.ravel()[order] + 0.5) / side, jnp.float32)
    o, d = generate_rays(cam.params(), px, py)
    t_lo = jnp.full(n_rays, cam.n_clip, jnp.float32)
    t_hi = jnp.full(n_rays, cam.f_clip, jnp.float32)
    return o, d, t_lo, t_hi


def load(name):
    from lens_flare_tpu.scene.build import load_scene
    from lens_flare_tpu.scene.camera import Camera, place_from_scene_info
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    if name == "pyramid":
        scene, info = load_scene("/root/reference/dae/pyramid.dae")
        cam = Camera()
        cam.configure(info.camera, 512, 512)
        place_from_scene_info(cam, info, scene.bbox_min, scene.bbox_max)
    else:
        nq = int(name.replace("terrain", ""))
        scene = make_terrain_scene(n_quads=nq)
        cam = Camera()
        center = (scene.bbox_min + scene.bbox_max) / 2
        extent = float(np.linalg.norm(scene.bbox_max - scene.bbox_min))
        cam.place(center, np.pi / 3, np.pi / 4, extent, extent / 10, extent * 10)
        cam.screen_w = cam.screen_h = 512
    return scene, cam


def main():
    import jax
    import jax.numpy as jnp

    from lens_flare_tpu.accel.wide import build_wide_bvh
    from lens_flare_tpu.ops.intersect_pallas import PallasScene, intersect_pallas
    from tools.timing import timeit

    print("backend:", jax.default_backend())
    names = sys.argv[1:] or ["pyramid", "terrain128", "terrain256", "terrain512"]
    n_rays = 1 << 18

    for name in names:
        scene, cam = load(name)
        wb = build_wide_bvh(scene.tri_p)
        ps = PallasScene(wb, scene.sph_center, scene.sph_radius, scene.num_triangles)
        print(
            f"\n=== {name}: {scene.num_triangles} tris shape=({ps.b1},{ps.b2},{ps.k}) "
            f"stream={ps.stream} ==="
        )
        o, d, t_lo, t_hi = make_rays(scene, cam, n_rays)
        # shadow wavefront: origins at primary hit points, direction to a
        # fixed light, 1/3 lanes dead (like masked NEE slots)
        base = intersect_pallas(ps, o, d, t_lo, t_hi)
        hp = o + d * jnp.where(base[4], base[0], 0.0)[:, None]
        light = jnp.asarray(scene.bbox_max + 1.0, jnp.float32)
        sd = light[None, :] - hp
        dist = jnp.linalg.norm(sd, axis=-1)
        sd = sd / jnp.maximum(dist, 1e-9)[:, None]
        dead = jnp.arange(n_rays) % 3 == 0
        s_hi = jnp.where(dead, 0.0, dist * 0.999)

        for cb in (1, 2, 4, 8):
            f = jax.jit(
                lambda o, d, lo, hi, cb=cb: intersect_pallas(ps, o, d, lo, hi, chunk_batch=cb)
            )
            out = f(o, d, t_lo, t_hi)
            dt = timeit(f, o, d, t_lo, t_hi)
            tests = float(np.asarray(out[5]).mean())
            g = jax.jit(
                lambda o, d, lo, hi, cb=cb: intersect_pallas(
                    ps, o, d, lo, hi, any_hit=True, chunk_batch=cb
                )
            )
            g(hp, sd, jnp.full(n_rays, 1e-4), s_hi)
            dts = timeit(g, hp, sd, jnp.full(n_rays, 1e-4), s_hi)
            print(
                f"cb={cb}:  primary {n_rays/dt/1e6:8.2f} Mrays/s ({dt*1e3:7.2f} ms, "
                f"{tests:5.1f} tests/ray)   shadow-anyhit {n_rays/dts/1e6:8.2f} Mrays/s"
            )


if __name__ == "__main__":
    main()
