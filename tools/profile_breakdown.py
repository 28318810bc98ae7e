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
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, runs=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="pyramid", choices=["pyramid", "terrain"])
    ap.add_argument("--n", type=int, default=512 * 512, help="wavefront lanes")
    ap.add_argument("--terrain-quads", type=int, default=256)
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

    r = Renderer(width=512, height=512, ns_aa=1, max_ray_depth=4, indirect=True)
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

    occ = jax.jit(lambda o, d: trace_occluded(r.bundle, o, d, t_lo, t_hi))
    dt = timeit(occ, o, d)
    print(f"shadow trace_occluded: {dt*1e3:8.2f} ms  {n/dt/1e6:8.2f} Mrays/s")

    hit = trace(o, d)
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


if __name__ == "__main__":
    main()
