"""Machine-readable kernel throughput table (VERDICT r3 item 7).

Measures the raw Pallas traversal kernels per scene class and wavefront
kind — the table that previously lived only in docs/PERFORMANCE.md — and
writes a JSON artifact so kernel regressions between rounds show up in the
checked-in series, not in prose.

Usage: python tools/bench_kernels.py [--out KERNELS_rNN.json] [--n 262144]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def _build(scene_name):
    from lens_flare_tpu.renderer import Renderer

    r = Renderer(width=512, height=512, ns_aa=1, max_ray_depth=4, indirect=True)
    if scene_name == "pyramid":
        r.load("/root/reference/dae/pyramid.dae")
    else:
        from lens_flare_tpu.scene.procedural import make_terrain_scene

        r.load_flat_scene(make_terrain_scene(int(scene_name[len("terrain"):])))
    return r


def _wavefronts(r, n, key):
    """(primary, bounce, shadow) ray sets: (o, d, t_lo, t_hi) each."""
    import jax
    import jax.numpy as jnp

    from lens_flare_tpu.integrator.path import trace_closest, _uniforms
    from lens_flare_tpu.integrator.shading import local_to_world, make_coord_space
    from lens_flare_tpu.scene.camera import generate_rays

    cam = r.camera.params()
    ys, xs = np.mgrid[0:512, 0:512]
    xs, ys = xs.ravel(), ys.ravel()
    bs = 32
    order = np.argsort(
        ((ys // bs) * (512 // bs) + (xs // bs)) * bs * bs + (ys % bs) * bs + (xs % bs),
        kind="stable",
    )
    px = jnp.asarray(xs[order][:n])
    py = jnp.asarray(ys[order][:n])
    x = (px.astype(jnp.float32) + 0.5) / 512
    y = (py.astype(jnp.float32) + 0.5) / 512
    o, d = generate_rays(cam, x, y)
    t_lo = jnp.full(n, cam.n_clip)
    t_hi = jnp.full(n, cam.f_clip)
    primary = (o, d, t_lo, t_hi)

    hit, _ = jax.jit(lambda o, d: trace_closest(r.bundle, o, d, t_lo, t_hi))(o, d)
    hit_p = o + d * jnp.where(hit.hit, hit.t, 0.0)[:, None]

    # incoherent bounce wavefront: cosine scatter from the hit points
    pixel_ids = (py * 512 + px).astype(jnp.uint32)
    keys = jax.vmap(jax.random.fold_in, in_axes=(None, 0))(key, pixel_ids)
    u3 = _uniforms(keys, n, (3,))
    z = jnp.sqrt(u3[:, 0])
    sin_t = jnp.sqrt(jnp.maximum(1.0 - u3[:, 0], 0.0))
    phi = 2 * jnp.pi * u3[:, 1]
    wi = jnp.stack([sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), z], axis=-1)
    o2w = make_coord_space(hit.n)
    d2 = local_to_world(o2w, wi)
    o2 = hit_p + hit.n * 1e-4
    bounce = (o2, d2, jnp.full(n, 1e-4), jnp.where(hit.hit, 1e30, 0.0))

    # shadow wavefront toward the first light
    lp = jnp.asarray(r.scene.lights.position[0])
    wl = lp - hit_p
    dist = jnp.linalg.norm(wl, axis=-1, keepdims=True)
    wl = wl / jnp.maximum(dist, 1e-9)
    shadow = (
        o2, wl, jnp.full(n, 1e-4),
        jnp.where(hit.hit, dist[:, 0] * 0.999, 0.0),
    )
    return primary, bounce, shadow


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="JSON artifact path")
    ap.add_argument("--n", type=int, default=262144)
    ap.add_argument("--scenes", default="pyramid,terrain256,terrain512")
    args = ap.parse_args()

    import jax

    from tools.timing import timeit

    key = jax.random.PRNGKey(0)
    rows = []
    for scene_name in args.scenes.split(","):
        r = _build(scene_name)
        if r.bundle.pscene is None:
            print(f"# {scene_name}: no Pallas scene on {jax.default_backend()}, skipping")
            continue
        from lens_flare_tpu.ops.intersect_pallas import intersect_pallas

        primary, bounce, shadow = _wavefronts(r, args.n, key)
        for kind, (o, d, lo, hi), any_hit in [
            ("primary_closest", primary, False),
            ("bounce_closest", bounce, False),
            ("shadow_anyhit", shadow, True),
        ]:
            fn = jax.jit(
                lambda o, d, lo, hi, any_hit=any_hit: intersect_pallas(
                    r.bundle.pscene, o, d, lo, hi, any_hit=any_hit
                )
            )
            dt = timeit(fn, o, d, lo, hi)
            out = fn(o, d, lo, hi)
            tests = float(np.asarray(out[5]).sum())
            live = float(np.asarray(hi > lo).sum())
            row = {
                "scene": scene_name,
                "tris": int(r.scene.num_triangles),
                "wavefront": kind,
                "lanes": args.n,
                "ms": round(dt * 1e3, 3),
                "mrays_per_s": round(args.n / dt / 1e6, 2),
                # tree-quality signal: counting basis differs between the
                # brute and tree kernels (see docs/PERFORMANCE.md), compare
                # within a scene/wavefront series only
                "tests_per_live_ray": round(tests / max(live, 1.0), 2),
            }
            rows.append(row)
            print(json.dumps(row))

        # Exercise the COMPILED top_batch>1 group walk on real hardware and
        # assert it matches the default walk.  TOP_BATCH defaults to 1, so
        # without this the fused (TB*B2, TILE) path would only ever run in
        # CPU interpret mode (tests/test_pallas.py) and could silently rot
        # on TPU (dynamic-slice alignment differs there).
        if r.bundle.pscene.b1 > 1:
            o, d, lo, hi = bounce
            base = intersect_pallas(r.bundle.pscene, o, d, lo, hi)
            tb = intersect_pallas(r.bundle.pscene, o, d, lo, hi, top_batch=2)
            for j, name in ((0, "t"), (1, "prim"), (4, "hit")):
                if not np.array_equal(np.asarray(base[j]), np.asarray(tb[j])):
                    raise AssertionError(
                        f"{scene_name}: top_batch=2 group walk diverges on {name}"
                    )
            print(f'{{"scene": "{scene_name}", "check": "top_batch2_parity", "ok": true}}')
            rows.append({"scene": scene_name, "check": "top_batch2_parity", "ok": True})

    artifact = {"platform": jax.default_backend(), "lanes": args.n, "kernels": rows}
    if args.out:
        Path(args.out).write_text(json.dumps(artifact, indent=1))
        print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
