"""Scaling sweep: render_sharded at n = 1/2/4/8 devices, one command.

Pre-positioning for the BASELINE >= 85% rays/s scaling-efficiency target on
a real pod (v4-16): on this machine only a virtual CPU mesh is available, so
wall-clock here measures nothing about ICI — what IS meaningful and is
recorded per device count:

- per-device compiled FLOPs (must fall ~1/n: the work actually shards)
- bit-equality of the assembled film vs the single-device render
- wall time (reported for completeness; on a real pod this column becomes
  the efficiency measurement, no code changes needed — run with
  JAX_PLATFORMS=tpu on the pod and read mrays_per_s scaling directly)

Writes a JSON artifact (default SCALING.json) next to the bench outputs.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling.py [--size 128] [--spp 4] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--spp", type=int, default=4)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--out", default="SCALING.json")
    ap.add_argument("--scene", default="/root/reference/dae/pyramid.dae")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lens_flare_tpu.parallel.mesh import make_mesh
    from lens_flare_tpu.parallel.render import render_sharded
    from lens_flare_tpu.renderer import Renderer

    n_avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8) if n <= n_avail]

    r = Renderer(
        width=args.size, height=args.size, ns_aa=args.spp,
        max_ray_depth=args.depth, indirect=args.depth > 1,
        samples_per_batch=args.spp, max_tolerance=0.0,
    )
    r.load(args.scene)
    W = H = args.size
    ys, xs = np.mgrid[0:H, 0:W]
    px = jnp.asarray(xs.ravel())
    py = jnp.asarray(ys.ravel())
    key = jax.random.PRNGKey(0)
    cam = r.camera.params()

    rows, base = [], None
    for n in counts:
        mesh = make_mesh(n)
        # compiled per-device cost: lower the same jit render_sharded wraps
        from lens_flare_tpu.integrator.path import render_wavefront
        from lens_flare_tpu.parallel.mesh import replicate, shard_batch

        ds, repl = shard_batch(mesh), replicate(mesh)
        fn = jax.jit(
            lambda b, x, y: render_wavefront(
                b, r.settings, cam, x, y, W, H, key
            ),
            in_shardings=(repl, ds, ds),
            out_shardings=(ds, ds, None),
        )
        bundle = jax.device_put(r.bundle, repl)
        pxs = jax.device_put(px, ds)
        pys = jax.device_put(py, ds)
        compiled = fn.lower(bundle, pxs, pys).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else (ca or {})
        flops = float(ca.get("flops", 0.0))

        out = render_sharded(bundle, r.settings, cam, px, py, W, H, key, mesh=mesh)
        rad = np.asarray(out[0])
        stats = np.asarray(out[2])
        t0 = time.perf_counter()
        out = render_sharded(bundle, r.settings, cam, px, py, W, H, key, mesh=mesh)
        np.asarray(out[0])
        dt = time.perf_counter() - t0

        if base is None:
            base = rad
            bitequal = True
        else:
            bitequal = bool(np.array_equal(base, rad))
        row = {
            "devices": n,
            "per_device_flops": flops,
            "flops_vs_1dev": round(flops / rows[0]["per_device_flops"], 4) if rows else 1.0,
            "wall_s": round(dt, 4),
            "mrays_per_s": round(float(stats[0]) / dt / 1e6, 3),
            "film_bitequal_vs_1dev": bitequal,
        }
        rows.append(row)
        print(json.dumps(row))
        assert bitequal, f"sharded render at n={n} is not bit-equal to single-device"

    artifact = {
        "platform": jax.default_backend(),
        "scene": args.scene,
        "size": args.size,
        "spp": args.spp,
        "depth": args.depth,
        "note": "virtual-mesh run measures per-device compiled FLOPs + bit "
        "equality; rerun on a pod for the >=85% rays/s efficiency number",
        "rows": rows,
    }
    Path(args.out).write_text(json.dumps(artifact, indent=1))
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
