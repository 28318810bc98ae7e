"""Quick TPU benchmark of the HBM-streaming kernel on dragon-class scenes.

Usage: python tools/bench_stream.py [n_quads ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from lens_flare_tpu.accel.wide import build_wide_bvh, choose_shape
    from lens_flare_tpu.ops.intersect_pallas import PallasScene, intersect_pallas
    from lens_flare_tpu.scene.build import vertex_normals  # noqa: F401
    from lens_flare_tpu.scene.camera import Camera, generate_rays
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    print("backend:", jax.default_backend(), jax.devices())
    quads = [int(a) for a in sys.argv[1:]] or [352, 708]
    n_rays = 1 << 18

    for nq in quads:
        t0 = time.perf_counter()
        scene = make_terrain_scene(n_quads=nq)
        t_scene = time.perf_counter() - t0
        n_tris = scene.num_triangles
        shape = choose_shape(n_tris)
        t0 = time.perf_counter()
        wb = build_wide_bvh(scene.tri_p)
        t_build = time.perf_counter() - t0
        ps = PallasScene(wb, scene.sph_center, scene.sph_radius, n_tris)
        print(
            f"\n=== {n_tris} tris, shape={shape}, stream={ps.stream}, "
            f"scene {t_scene:.2f}s, build {t_build:.2f}s ==="
        )

        cam = Camera()
        center = (scene.bbox_min + scene.bbox_max) / 2
        extent = float(np.linalg.norm(scene.bbox_max - scene.bbox_min))
        cam.place(center, np.pi / 3, np.pi / 4, extent, extent / 10, extent * 10)
        cam.screen_w = cam.screen_h = 512

        # blocked pixel order like the renderer feeds the kernel
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

        from tools.timing import timeit  # honest axon-tunnel timing

        f = jax.jit(lambda o, d, lo, hi: intersect_pallas(ps, o, d, lo, hi))
        out = f(o, d, t_lo, t_hi)
        dt = timeit(f, o, d, t_lo, t_hi)
        hits = int(np.asarray(out[4]).sum())
        tests = float(np.asarray(out[5]).mean())
        print(
            f"primary: {dt*1e3:8.2f} ms  {n_rays/dt/1e6:8.2f} Mrays/s  "
            f"hits {hits}/{n_rays}  isect-tests/ray {tests:.1f}"
        )


if __name__ == "__main__":
    main()
