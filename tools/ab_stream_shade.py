"""A/B the round-5 stream-mode in-kernel shade rows on the real TPU.

Measures, on a terrain-class HBM-streamed scene (524k tris by default), the
full closest-hit + shading-row materialization path the integrator runs:
trace_closest -> Hit with normals/bsdf — (a) finalize_hit row GATHER
(pre-round-5 stream behavior), (b) in-kernel shade-row accumulation riding
a second HBM page ring.  Honest tunnel timing via tools/timing.py.

Usage: python tools/ab_stream_shade.py [n_quads] [n_rays_log2]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from lens_flare_tpu.accel import build_bvh
    from lens_flare_tpu.accel.wide import build_wide_bvh
    from lens_flare_tpu.integrator.path import SceneBundle, trace_closest
    from lens_flare_tpu.integrator.shading import bsdf_to_device
    from lens_flare_tpu.integrator.lights import lights_to_device
    from lens_flare_tpu.ops import scene_to_device
    from lens_flare_tpu.ops.intersect_pallas import PallasScene
    from lens_flare_tpu.scene.camera import Camera, generate_rays
    from lens_flare_tpu.scene.procedural import make_terrain_scene
    from tools.timing import timeit

    print("backend:", jax.default_backend())
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 708
    n_rays = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 18)

    scene = make_terrain_scene(n_quads=nq)
    n_t = scene.num_triangles
    lo, hi = scene.primitive_bboxes()
    sa = scene_to_device(scene, build_bvh(lo, hi))
    wb = build_wide_bvh(scene.tri_p)
    shade_rows = np.concatenate(
        [
            np.asarray(scene.tri_n, np.float32).reshape(n_t, 9),
            np.asarray(scene.tri_bsdf, np.float32).reshape(n_t, 1),
        ],
        axis=1,
    )
    ps_gather = PallasScene(wb, scene.sph_center, scene.sph_radius, n_t)
    ps_shade = PallasScene(
        wb, scene.sph_center, scene.sph_radius, n_t, shade_rows=shade_rows,
        stream_shade=True,
    )
    print(f"tris={n_t} stream={ps_shade.stream} shade={ps_shade.shade}")
    assert ps_shade.stream and ps_shade.shade and not ps_gather.shade

    def bundle_with(ps):
        return SceneBundle(
            scene=sa,
            bsdfs=bsdf_to_device(scene.bsdfs),
            lights=lights_to_device(scene.lights),
            env=None,
            pscene=ps,
        )

    # primary rays (coherent) + a bounce-like scrambled wavefront
    cam = Camera()
    center = (scene.bbox_min + scene.bbox_max) / 2
    extent = float(np.linalg.norm(scene.bbox_max - scene.bbox_min))
    cam.place(center, np.pi / 3, np.pi / 4, extent, extent / 10, extent * 10)
    side = int(np.sqrt(n_rays))
    ys, xs = np.mgrid[0:side, 0:side]
    x = jnp.asarray((xs.ravel() + 0.5) / side, jnp.float32)
    y = jnp.asarray((ys.ravel() + 0.5) / side, jnp.float32)
    o, d = generate_rays(cam.params(), x, y)
    t_lo = jnp.full(n_rays, 1e-3)
    t_hi = jnp.full(n_rays, 1e30)

    rng = np.random.default_rng(0)
    # bounce-like: origins on the terrain surface, random upward directions
    ob = np.asarray(o) + np.asarray(d) * rng.uniform(0.3, 0.9, (n_rays, 1))
    db = rng.normal(size=(n_rays, 3))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    ob, db = jnp.asarray(ob, jnp.float32), jnp.asarray(db, jnp.float32)

    for name, (oo, dd) in [("primary", (o, d)), ("bounce", (ob, db))]:
        row = {"wavefront": name, "lanes": n_rays}
        for mode, ps in [("gather", ps_gather), ("shade", ps_shade)]:
            b = bundle_with(ps)

            def run(oo, dd, lo_, hi_, b=b):
                hit, stats = trace_closest(b, oo, dd, lo_, hi_)
                # materialize everything the integrator consumes
                return hit.t, hit.n, hit.bsdf, hit.hit

            fn = jax.jit(run)
            dt = timeit(fn, oo, dd, t_lo, t_hi)
            row[f"{mode}_ms"] = round(dt * 1e3, 3)
        row["speedup"] = round(row["gather_ms"] / row["shade_ms"], 3)
        print(row)

    # parity: identical hits + normals between the two paths
    b_g, b_s = bundle_with(ps_gather), bundle_with(ps_shade)
    hg, _ = jax.jit(lambda: trace_closest(b_g, ob, db, t_lo, t_hi))()
    hs, _ = jax.jit(lambda: trace_closest(b_s, ob, db, t_lo, t_hi))()
    for f in ("t", "prim", "bsdf", "hit", "n"):
        a, b = np.asarray(getattr(hg, f)), np.asarray(getattr(hs, f))
        assert np.array_equal(a, b), f"parity break on {f}"
    print("parity: identical hits, normals and bsdf rows")


if __name__ == "__main__":
    main()
