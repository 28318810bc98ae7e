"""Time breakdown of the render hot path on the current backend.

Measures, per scene:
  - primary trace_closest alone (Mrays/s)
  - shadow wavefront (trace_occluded) alone
  - direct_lighting (NEE incl. shadow trace + shading)
  - one full radiance_sample
  - RNG folding cost (the per-lane threefry work)

Usage: python tools/profile_breakdown.py [--scene pyramid|terrain] [--n 262144]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


from tools.timing import timeit  # noqa: E402  (honest axon-tunnel timing)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="pyramid", choices=["pyramid", "terrain"])
    ap.add_argument("--n", type=int, default=512 * 512, help="wavefront lanes")
    ap.add_argument("--terrain-quads", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--sweep-shapes", action="store_true")
    args = ap.parse_args()

    from lens_flare_tpu.integrator.path import (
        direct_lighting,
        radiance_sample,
        trace_closest,
        trace_occluded,
        _fold,
        _uniforms,
    )
    from lens_flare_tpu.renderer import Renderer

    r = Renderer(width=512, height=512, ns_aa=1, max_ray_depth=args.depth, indirect=True)
    if args.scene == "pyramid":
        r.load("/root/reference/dae/pyramid.dae")
    else:
        from lens_flare_tpu.scene.procedural import make_terrain_scene

        r.load_flat_scene(make_terrain_scene(args.terrain_quads))
    print(f"backend={jax.default_backend()} scene={args.scene} "
          f"tris={r.scene.num_triangles} pallas={r.bundle.pscene is not None}")

    n = args.n
    cam = r.camera.params()
    key = jax.random.PRNGKey(0)
    ys, xs = np.mgrid[0:512, 0:512]
    xs, ys = xs.ravel(), ys.ravel()
    # blocked pixel order, as the renderer uses (32x32 tiles)
    bs = 32
    order = np.argsort(
        ((ys // bs) * (512 // bs) + (xs // bs)) * bs * bs + (ys % bs) * bs + (xs % bs),
        kind="stable",
    )
    px = jnp.asarray(xs[order][:n])
    py = jnp.asarray(ys[order][:n])

    from lens_flare_tpu.scene.camera import generate_rays

    x = (px.astype(jnp.float32) + 0.5) / 512
    y = (py.astype(jnp.float32) + 0.5) / 512
    o, d = generate_rays(cam, x, y)
    t_lo = jnp.full(n, cam.n_clip)
    t_hi = jnp.full(n, cam.f_clip)

    trace = jax.jit(lambda o, d: trace_closest(r.bundle, o, d, t_lo, t_hi))
    dt = timeit(trace, o, d)
    print(f"primary trace_closest: {dt*1e3:8.2f} ms  {n/dt/1e6:8.2f} Mrays/s")

    if r.bundle.pscene is not None:
        from lens_flare_tpu.ops.intersect_pallas import intersect_pallas as _ip

        raw = jax.jit(lambda o, d: _ip(r.bundle.pscene, o, d, t_lo, t_hi))
        dt = timeit(raw, o, d)
        print(f"  raw kernel only:     {dt*1e3:8.2f} ms  {n/dt/1e6:8.2f} Mrays/s")

    occ = jax.jit(lambda o, d: trace_occluded(r.bundle, o, d, t_lo, t_hi))
    dt = timeit(occ, o, d)
    print(f"shadow trace_occluded: {dt*1e3:8.2f} ms  {n/dt/1e6:8.2f} Mrays/s")

    hit, _ = trace(o, d)
    hit_p = o + d * jnp.where(hit.hit, hit.t, 0.0)[:, None]
    pixel_ids = (py * 512 + px).astype(jnp.uint32)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pixel_ids)

    s = r.settings.total_light_samples
    u_tape = _uniforms(keys, n, (2 * s,))
    dl = jax.jit(
        lambda u, hit_p: direct_lighting(
            r.bundle, r.settings, u, hit_p, hit.n, -d, hit.bsdf
        )
    )
    dt = timeit(dl, u_tape, hit_p)
    print(f"direct_lighting ({s} slots): {dt*1e3:8.2f} ms  "
          f"{n*s/dt/1e6:8.2f} Mrays/s (shadow)")

    rs = jax.jit(
        lambda keys: radiance_sample(r.bundle, r.settings, cam, keys, px, py, 512, 512)
    )
    dt = timeit(rs, keys)
    nee = r.settings.total_light_samples
    exp_b = sum(0.7**k for k in range(1, r.settings.max_ray_depth))
    rays = n * (1 + nee) * (1 + exp_b)
    print(f"radiance_sample (depth {r.settings.max_ray_depth}): {dt*1e3:8.2f} ms  "
          f"{rays/dt/1e6:8.2f} Mrays/s (expected-ray)")

    rng = jax.jit(lambda keys: _uniforms(_fold(keys, 7), n, (3,)))
    dt = timeit(rng, keys)
    print(f"fold+uniform(3) per lane: {dt*1e3:8.2f} ms")

    # incoherent bounce-style wavefront: cosine-scatter from the hit points
    from lens_flare_tpu.integrator.shading import local_to_world, make_coord_space

    u3 = _uniforms(keys, n, (3,))
    z = jnp.sqrt(u3[:, 0])
    sin_t = jnp.sqrt(jnp.maximum(1.0 - u3[:, 0], 0.0))
    phi = 2 * jnp.pi * u3[:, 1]
    wi = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), z], axis=-1)
    o2w = make_coord_space(hit.n)
    d2 = local_to_world(o2w, wi)
    o2 = hit_p + hit.n * 1e-4
    lo2 = jnp.full(n, 1e-4)
    hi2 = jnp.where(hit.hit, 1e30, 0.0)

    tr_u = jax.jit(lambda o2, d2: trace_closest(r.bundle, o2, d2, lo2, hi2))
    dt = timeit(tr_u, o2, d2)
    print(f"bounce trace: {dt*1e3:8.2f} ms  {n/dt/1e6:8.2f} Mrays/s")

    if r.bundle.pscene is not None:
        from lens_flare_tpu.ops.intersect_pallas import intersect_pallas

        key_fn = None
        dq = jnp.clip(((d2 + 1.0) * 2.0).astype(jnp.int32), 0, 3)
        lo_b = r.bundle.scene.node_min[0]
        span = jnp.maximum(r.bundle.scene.node_max[0] - lo_b, 1e-6)
        oq = jnp.clip(((o2 - lo_b) / span * 4.0).astype(jnp.int32), 0, 3)
        skey = (
            (((dq[:, 0] * 4 + dq[:, 1]) * 4 + dq[:, 2]) * 4 + oq[:, 0]) * 4
            + oq[:, 1]
        ) * 4 + oq[:, 2]
        order = jnp.argsort(skey)
        srt = jax.jit(lambda k_, o_, d_: (lambda ord_: (o_[ord_], d_[ord_], jnp.argsort(ord_)))(jnp.argsort(k_)))
        dt = timeit(srt, skey, o2, d2)
        print(f"  argsort+2 gathers+inv:  {dt*1e3:8.2f} ms")
        for tile in (1024, 512, 256, 128):
            for tag, (oo, dd, l2, h2) in {
                "raw": (o2, d2, lo2, hi2),
                "sorted": (o2[order], d2[order], lo2[order], hi2[order]),
            }.items():
                f = jax.jit(
                    lambda oo, dd, l2, h2, tile=tile: intersect_pallas(
                        r.bundle.pscene, oo, dd, l2, h2, tile=tile
                    )
                )
                dt = timeit(f, oo, dd, l2, h2)
                print(f"  tile={tile:4d} {tag:6s}: {dt*1e3:8.2f} ms  {n/dt/1e6:8.2f} Mrays/s")

        if args.sweep_shapes:
            from lens_flare_tpu.accel.wide import build_wide_bvh
            from lens_flare_tpu.ops.intersect_pallas import PallasScene

            for b1, b2, kk in [(32, 32, 128), (32, 64, 64), (64, 64, 32), (64, 64, 64), (64, 128, 16), (128, 128, 8)]:
                if b1 * b2 * kk < r.scene.num_triangles:
                    continue
                wb = build_wide_bvh(r.scene.tri_p, b1, b2, kk)
                ps = PallasScene(wb, r.scene.sph_center, r.scene.sph_radius, r.scene.num_triangles)
                for tile in (256, 128):
                    f = jax.jit(
                        lambda oo, dd, l2, h2, ps=ps, tile=tile: intersect_pallas(
                            ps, oo, dd, l2, h2, tile=tile
                        )
                    )
                    dt = timeit(f, o2[order], d2[order], lo2[order], hi2[order])
                    pdt = timeit(f, o, d, t_lo, t_hi)
                    print(
                        f"  shape=({b1},{b2},{kk}) tile={tile:4d}: bounce {dt*1e3:8.2f} ms "
                        f"({n/dt/1e6:6.2f} Mr/s)  primary {pdt*1e3:8.2f} ms ({n/pdt/1e6:6.2f} Mr/s)"
                    )


if __name__ == "__main__":
    main()
