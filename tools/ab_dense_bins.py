"""Measure the chunk-major (dense-bin) traversal CEILING without a new kernel.

The chunk-major follow-up (docs/PERFORMANCE.md "Known optimization
headroom") proposes binning rays by the top clusters they overlap and
walking each bin densely, changing the cost model from per-(tile,
activated-top) to per-pair.  This tool builds that exact workload at the
WAVEFRONT level and runs it through the unmodified streamed kernel:

1. host slab tests give the (ray, top) overlap pairs,
2. each pair becomes one lane whose t-interval is clipped to its top's
   box slab interval — so the lane activates exactly that one top,
3. lanes are ordered by top id (tiles become ~top-pure: DENSE bins),
4. the per-ray closest hit is the min over the ray's pair lanes, checked
   for exact parity against the plain trace.

The measured dense trace time + the ~20 ms/262k-lane device binning toll
(tools/ab_ray_sort.py) is an honest projection of what a real chunk-major
kernel could reach — if the ceiling is not well below the plain trace,
the redesign cannot pay.

Usage: python tools/ab_dense_bins.py [n_quads] [n_rays_log2]
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
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 512
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
    t_lo = jnp.full(n_rays, 1e-3)
    t_hi = jnp.full(n_rays, 1e30)

    # realistic bounce wavefront: origins at primary hits, scrambled dirs
    hit0, _ = jax.jit(lambda: trace_closest(bundle, o, d, t_lo, t_hi))()
    t_hit = np.where(np.asarray(hit0.hit), np.asarray(hit0.t), 1.0)
    rng = np.random.default_rng(0)
    ob = np.asarray(o) + np.asarray(d) * (0.999 * t_hit[:, None])
    db = rng.normal(size=(n_rays, 3))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    obj, dbj = jnp.asarray(ob, jnp.float32), jnp.asarray(db, jnp.float32)

    def run_plain(oo, dd, lo_, hi_):
        hit, _ = trace_closest(bundle, oo, dd, lo_, hi_)
        return hit.t, hit.prim, hit.hit

    base_ms = timeit(jax.jit(run_plain), obj, dbj, t_lo, t_hi) * 1e3

    # ---- host binning: (ray, top) pairs with slab-clipped intervals ----
    tb = wb.top_boxes
    tl, th = tb[:, 0:3], tb[:, 3:6]
    inv_d = 1.0 / np.where(np.abs(db) < 1e-12, np.where(db < 0, -1e-12, 1e-12), db)
    t0 = (tl[None] - ob[:, None]) * inv_d[:, None]
    t1 = (th[None] - ob[:, None]) * inv_d[:, None]
    ent = np.minimum(t0, t1).max(axis=-1)  # (N, B1)
    ext = np.maximum(t0, t1).min(axis=-1)
    ent = np.maximum(ent, 1e-3)
    pairs = ent <= ext
    ray_ids, top_ids = np.nonzero(pairs)
    # order by top id -> tiles become dense per-top bins
    order = np.argsort(top_ids, kind="stable")
    ray_ids, top_ids = ray_ids[order], top_ids[order]
    n_pairs = len(ray_ids)
    TILE = 512
    n_pad = -(-n_pairs // TILE) * TILE - n_pairs
    print(f"pairs={n_pairs} ({n_pairs / n_rays:.2f}/ray), padded "
          f"+{n_pad} -> {(n_pairs + n_pad) // TILE} tiles "
          f"(plain: {n_rays // TILE} tiles x "
          f"{pairs.reshape(-1, TILE, wb.b1).any(axis=1).sum(-1).mean():.1f}"
          " active tops)")
    po = np.concatenate([ob[ray_ids], np.zeros((n_pad, 3), np.float32)])
    pd = np.concatenate([db[ray_ids], np.ones((n_pad, 3), np.float32)])
    # clip each pair lane's interval to its top's slab window, with a hair
    # of slack for f32 re-computation inside the kernel
    plo = np.concatenate([
        np.maximum(ent[ray_ids, top_ids] * 0.999, 1e-3),
        np.full(n_pad, 1e-3, np.float32)])
    phi = np.concatenate([
        ext[ray_ids, top_ids] * 1.001, np.zeros(n_pad, np.float32)])
    po, pd = jnp.asarray(po, jnp.float32), jnp.asarray(pd, jnp.float32)
    plo, phi = jnp.asarray(plo, jnp.float32), jnp.asarray(phi, jnp.float32)

    dense_ms = timeit(jax.jit(run_plain), po, pd, plo, phi) * 1e3

    # ---- parity: per-ray min over pair lanes == plain closest hit ----
    pt, pp, ph = jax.jit(run_plain)(po, pd, plo, phi)
    pt = np.where(np.asarray(ph), np.asarray(pt), np.inf)[:n_pairs]
    best = np.full(n_rays, np.inf)
    np.minimum.at(best, ray_ids, pt)
    bt, bp, bh = jax.jit(run_plain)(obj, dbj, t_lo, t_hi)
    bt = np.where(np.asarray(bh), np.asarray(bt), np.inf)
    hit_mismatch = (np.isfinite(best) != np.isfinite(bt)).sum()
    both = np.isfinite(best) & np.isfinite(bt)
    t_err = np.abs(best[both] - bt[both]) / np.maximum(bt[both], 1e-6)
    print(f"parity: hit-mask mismatches {hit_mismatch}/{n_rays}, "
          f"t rel err max {t_err.max():.2e}")

    bin_toll = 20.0 * (n_pairs + n_pad) / (1 << 18)  # measured argsort toll
    print({
        "plain_ms": round(base_ms, 2),
        "dense_trace_ms": round(dense_ms, 2),
        "projected_chunk_major_ms": round(dense_ms + bin_toll, 2),
        "ceiling_speedup": round(base_ms / dense_ms, 2),
        "projected_speedup": round(base_ms / (dense_ms + bin_toll), 2),
    })

    # ---- DEVICE-side sort-free variant: per-ray top_k expansion --------
    # Bins via jax.lax.top_k of the M nearest tops per ray (no argsort);
    # lane order (m, ray) keeps the wavefront's own origin coherence, so
    # block m holds each ray's m-th nearest top — tiles are near-top-pure
    # without any permutation.  Rays overlapping > M tops keep a fallback
    # full trace (masked to those rays only: dead lanes skip).
    INF = 3.0e38
    tlj = jnp.asarray(tl)
    thj = jnp.asarray(th)

    def slab(oo, dd, lo_, hi_):
        invd = 1.0 / jnp.where(jnp.abs(dd) < 1e-12,
                               jnp.where(dd < 0, -1e-12, 1e-12), dd)
        a = (tlj[None] - oo[:, None]) * invd[:, None]
        b = (thj[None] - oo[:, None]) * invd[:, None]
        ent_ = jnp.maximum(jnp.minimum(a, b).max(-1), lo_[:, None])
        ext_ = jnp.minimum(jnp.maximum(a, b).min(-1), hi_[:, None])
        return ent_, ext_, ent_ <= ext_

    def run_topk(oo, dd, lo_, hi_, m_cap=6):
        n = oo.shape[0]
        ent_, ext_, hm = slab(oo, dd, lo_, hi_)
        negent, idx = jax.lax.top_k(jnp.where(hm, -ent_, -INF), m_cap)
        valid = negent > -INF  # (n, M)
        entk = -negent
        extk = jnp.take_along_axis(ext_, idx, axis=1)
        po_ = jnp.broadcast_to(oo, (m_cap, n, 3)).reshape(-1, 3)
        pd_ = jnp.broadcast_to(dd, (m_cap, n, 3)).reshape(-1, 3)
        plo_ = jnp.maximum(entk * 0.999, lo_[:, None]).T.reshape(-1)
        phi_ = jnp.where(valid, extk * 1.001, 0.0).T.reshape(-1)
        t_, prim_, hit_ = run_plain(po_, pd_, plo_, phi_)
        t_ = jnp.where(hit_, t_, INF).reshape(m_cap, n)
        best_t = t_.min(0)
        m_star = t_.argmin(0)
        best_prim = prim_.reshape(m_cap, n)[m_star, jnp.arange(n)]
        # fallback: rays overlapping more tops than the cap
        over = hm.sum(1) > m_cap
        fo_t, fo_prim, fo_hit = run_plain(
            oo, dd, lo_, jnp.where(over, hi_, 0.0))
        fo_t = jnp.where(fo_hit, fo_t, INF)
        use_f = over & (fo_t < best_t)
        return (jnp.where(use_f, fo_t, best_t),
                jnp.where(use_f, fo_prim, best_prim))

    for m_cap in (4, 6, 8):
        fn = jax.jit(lambda oo, dd, lo_, hi_, m=m_cap: run_topk(oo, dd, lo_, hi_, m))
        dt = timeit(fn, obj, dbj, t_lo, t_hi) * 1e3
        # parity vs plain
        kt, kp = fn(obj, dbj, t_lo, t_hi)
        kt = np.asarray(kt)
        mis = (np.isfinite(np.where(kt >= INF, np.inf, kt)) != np.isfinite(bt)).sum()
        both2 = np.isfinite(bt) & (kt < INF)
        terr = np.abs(kt[both2] - bt[both2]) / np.maximum(bt[both2], 1e-6)
        print({"device_topk_M": m_cap, "ms": round(dt, 2),
               "speedup": round(base_ms / dt, 2),
               "hit_mismatch": int(mis),
               "t_relerr_max": float(terr.max()) if both2.any() else 0.0})


if __name__ == "__main__":
    main()
