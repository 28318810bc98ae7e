"""A/B spatial ray reordering for incoherent (bounce) wavefronts.

Hypothesis (the cheap half of the "chunk-major" follow-up in
docs/PERFORMANCE.md): the streamed kernel's cost is per (tile, activated
top cluster) — a 512-lane tile of scrambled bounce rays activates the
UNION of its lanes' top clusters.  Sorting the wavefront by a spatial key
before the trace groups rays that start in the same region into the same
tile, shrinking that union, without touching the kernel at all.  The
round-5 alive-mask compaction measured the permutation overhead (~sorts +
gathers); this experiment asks whether a SPATIAL key buys enough tile-top
density to beat that overhead where it matters — HBM-streamed scenes'
bounce traces (40-75 ms per 262k lanes).

Keys measured:
- ``morton``: 21-bit Morton code of the quantized ray origin
- ``top``: id of the top cluster containing the origin (page-aligned
  grouping) x 8 direction octants

Usage: python tools/ab_ray_sort.py [n_quads] [n_rays_log2]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def _part1by2(x):
    """Spread 7 bits of x to every 3rd bit (jnp int32)."""
    x = x & 0x7F
    x = (x | (x << 8)) & 0x0700F00F
    x = (x | (x << 4)) & 0x430C30C3
    x = (x | (x << 2)) & 0x49249249
    return x


def main():
    import jax
    import jax.numpy as jnp

    from lens_flare_tpu.accel import build_bvh
    from lens_flare_tpu.integrator.path import SceneBundle, trace_closest
    from lens_flare_tpu.integrator.shading import bsdf_to_device
    from lens_flare_tpu.integrator.lights import lights_to_device
    from lens_flare_tpu.accel.wide import build_wide_bvh
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
    ps = PallasScene(wb, scene.sph_center, scene.sph_radius, n_t)
    print(f"tris={n_t} stream={ps.stream} shape=({wb.b1},{wb.b2},{wb.k})")
    bundle = SceneBundle(
        scene=sa, bsdfs=bsdf_to_device(scene.bsdfs),
        lights=lights_to_device(scene.lights), env=None, pscene=ps,
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

    rng = np.random.default_rng(0)
    t_lo = jnp.full(n_rays, 1e-3)
    t_hi = jnp.full(n_rays, 1e30)

    # REAL bounce wavefront: origins at the primary hit points (film
    # order, so origins inherit the film's spatial coherence — exactly
    # what the integrator's later path vertices look like), directions
    # scrambled over the sphere
    hit0, _ = jax.jit(lambda: trace_closest(bundle, o, d, t_lo, t_hi))()
    t_hit = np.asarray(hit0.t)
    t_hit = np.where(np.asarray(hit0.hit), t_hit, 1.0)
    ob = np.asarray(o) + np.asarray(d) * (0.999 * t_hit[:, None])
    db = rng.normal(size=(n_rays, 3))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    ob, db = jnp.asarray(ob, jnp.float32), jnp.asarray(db, jnp.float32)

    # control: the SAME rays randomly shuffled — a wavefront with the
    # film coherence destroyed, the case sorting is supposed to recover
    shuf = rng.permutation(n_rays)
    os_, ds_ = ob[shuf], db[shuf]

    bb_lo = jnp.asarray(scene.bbox_min, jnp.float32)
    bb_span = jnp.asarray(
        np.maximum(scene.bbox_max - scene.bbox_min, 1e-9), jnp.float32)
    top_lo = jnp.asarray(wb.top_boxes[:, 0:3])  # (B1, 3)
    top_hi = jnp.asarray(wb.top_boxes[:, 3:6])

    def key_morton(o_, d_):
        q = jnp.clip((o_ - bb_lo) / bb_span, 0.0, 0.9999)
        q = (q * 128.0).astype(jnp.int32)  # 7 bits/axis
        return (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
                | (_part1by2(q[:, 2]) << 2))

    def key_top(o_, d_):
        inside = jnp.all(
            (o_[:, None, :] >= top_lo[None]) & (o_[:, None, :] <= top_hi[None]),
            axis=-1)  # (N, B1)
        top = jnp.argmax(inside, axis=1).astype(jnp.int32)
        octant = ((d_[:, 0] > 0).astype(jnp.int32)
                  + 2 * (d_[:, 1] > 0).astype(jnp.int32)
                  + 4 * (d_[:, 2] > 0).astype(jnp.int32))
        return top * 8 + octant

    def run_plain(oo, dd, lo_, hi_):
        hit, _ = trace_closest(bundle, oo, dd, lo_, hi_)
        return hit.t, hit.n, hit.bsdf, hit.hit, hit.prim

    def make_sorted(keyfn):
        def run(oo, dd, lo_, hi_):
            perm = jnp.argsort(keyfn(oo, dd))
            hit, _ = trace_closest(
                bundle, oo[perm], dd[perm], lo_[perm], hi_[perm])
            inv = jnp.zeros_like(perm).at[perm].set(
                jnp.arange(len(perm), dtype=perm.dtype))
            return (hit.t[inv], hit.n[inv], hit.bsdf[inv],
                    hit.hit[inv], hit.prim[inv])
        return run

    def overhead_only(oo, dd, lo_, hi_):
        # the permutation machinery alone (key + sort + gathers), no trace
        perm = jnp.argsort(key_morton(oo, dd))
        inv = jnp.zeros_like(perm).at[perm].set(
            jnp.arange(len(perm), dtype=perm.dtype))
        return (oo[perm][inv], dd[perm][inv], lo_[perm], hi_[perm])

    # tile-top density diagnostic (host): distinct tops activated per tile
    def density(oo, dd, label):
        oo, dd = np.asarray(oo), np.asarray(dd)
        tl, th = np.asarray(top_lo), np.asarray(top_hi)
        inv_d = 1.0 / np.where(np.abs(dd) < 1e-12, 1e-12, dd)
        t0 = (tl[None] - oo[:, None]) * inv_d[:, None]
        t1 = (th[None] - oo[:, None]) * inv_d[:, None]
        lo_t = np.minimum(t0, t1).max(axis=-1)
        hi_t = np.maximum(t0, t1).min(axis=-1)
        hits = (hi_t >= np.maximum(lo_t, 0.0))  # (N, B1)
        tiles = hits.reshape(-1, 512, hits.shape[1]).any(axis=1)
        print(f"  {label}: mean active tops/tile = {tiles.sum(1).mean():.1f}"
              f" (of {hits.shape[1]}), mean tops/ray = {hits.sum(1).mean():.1f}")

    for name, (oo, dd) in [("primary", (o, d)), ("bounce", (ob, db)),
                           ("bounce-shuffled", (os_, ds_))]:
        print(f"[{name}]")
        km = np.asarray(key_morton(oo, dd))
        perm_np = np.argsort(km)
        density(oo, dd, "unsorted")
        density(np.asarray(oo)[perm_np], np.asarray(dd)[perm_np],
                "morton-sorted")
        base = timeit(jax.jit(run_plain), oo, dd, t_lo, t_hi)
        ovh = timeit(jax.jit(overhead_only), oo, dd, t_lo, t_hi)
        row = {"wavefront": name, "lanes": n_rays,
               "plain_ms": round(base * 1e3, 3),
               "perm_overhead_ms": round(ovh * 1e3, 3)}
        for kname, kfn in [("morton", key_morton), ("top", key_top)]:
            dt = timeit(jax.jit(make_sorted(kfn)), oo, dd, t_lo, t_hi)
            row[f"{kname}_ms"] = round(dt * 1e3, 3)
            row[f"{kname}_speedup"] = round(base / dt, 3)
        print(row)

    # parity: sorted path returns identical hits after inverse permutation
    a = jax.jit(run_plain)(ob, db, t_lo, t_hi)
    b = jax.jit(make_sorted(key_morton))(ob, db, t_lo, t_hi)
    for name, x, y in zip(("t", "n", "bsdf", "hit", "prim"), a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y)), name
    print("parity: sorted == plain after inverse permutation")


if __name__ == "__main__":
    main()
