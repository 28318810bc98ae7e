"""A/B the MXU Möller-Trumbore coefficient walk (VERDICT r4 item 2).

Per chunk the coefficient walk replaces the one-hot plane extraction + VPU
cross-product chain (~41 (K,TILE) vector issues) with one 128-aligned lane
slice + ONE (16,128)^T x (16,TILE) MXU matmul at HIGHEST (f32) precision.
Costs it pays: 7.1x plane VMEM (16 feature rows x 4 outputs vs 9 geometry
rows) and the 3-pass f32 MXU mode.

Measures closest-hit primary/bounce wavefronts on VMEM-resident terrain
scenes (the coefficient planes cap out near 32k tris; streamed scenes would
need 7x page DMA).  Honest tunnel timing (tools/timing.py).

Usage: python tools/ab_mxu_mt.py [n_rays_log2]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from lens_flare_tpu.accel.wide import build_wide_bvh
    from lens_flare_tpu.ops.intersect_pallas import PallasScene, intersect_pallas
    from lens_flare_tpu.scene.camera import Camera, generate_rays
    from lens_flare_tpu.scene.procedural import make_terrain_scene
    from tools.timing import timeit

    print("backend:", jax.default_backend())
    n_rays = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)

    # exact-fit tree shapes: the default choose_shape pads the node grid and
    # the coefficient planes are 8 KiB/node — (16, b1*b2*128) must stay well
    # under the 16 MiB scoped-VMEM limit
    for nq, (b1_, b2_) in ((64, (8, 32)), (128, (32, 32))):
        scene = make_terrain_scene(n_quads=nq)
        n_t = scene.num_triangles
        wb = build_wide_bvh(scene.tri_p, b1_, b2_, 32)
        ps = PallasScene(wb, scene.sph_center, scene.sph_radius, n_t, mxu=True)
        print(
            f"\n=== terrain{nq}: {n_t} tris, shape ({ps.b1},{ps.b2},{ps.k}), "
            f"coeff planes {ps.mxu_planes.nbytes / 2**20:.1f} MiB ==="
        )

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
        ob = np.asarray(o) + np.asarray(d) * rng.uniform(0.3, 0.9, (n_rays, 1))
        db = rng.normal(size=(n_rays, 3))
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        ob, db = jnp.asarray(ob, jnp.float32), jnp.asarray(db, jnp.float32)

        for name, (oo, dd) in [("primary", (o, d)), ("bounce", (ob, db))]:
            row = {"scene": f"terrain{nq}", "wavefront": name, "lanes": n_rays}
            for mode, kw in [("base", {}), ("mxu", {"mxu": True})]:
                fn = jax.jit(
                    lambda oo, dd, lo_, hi_, kw=kw: intersect_pallas(
                        ps, oo, dd, lo_, hi_, **kw
                    )
                )
                dt = timeit(fn, oo, dd, t_lo, t_hi)
                row[f"{mode}_ms"] = round(dt * 1e3, 3)
            row["speedup"] = round(row["base_ms"] / row["mxu_ms"], 3)
            print(row)

        # parity on the bounce wavefront
        rb = intersect_pallas(ps, ob, db, t_lo, t_hi)
        rm = intersect_pallas(ps, ob, db, t_lo, t_hi, mxu=True)
        hb, hm = np.asarray(rb[4]), np.asarray(rm[4])
        agree = float((hb == hm).mean())
        both = hb & hm
        pa = float((np.asarray(rb[1])[both] == np.asarray(rm[1])[both]).mean())
        trel = float(
            np.max(
                np.abs(np.asarray(rb[0])[both] - np.asarray(rm[0])[both])
                / np.maximum(np.abs(np.asarray(rb[0])[both]), 1e-6)
            )
        )
        print({"hit_agree": agree, "prim_agree": pa, "t_maxrel": trel})


if __name__ == "__main__":
    main()
