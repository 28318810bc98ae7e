"""Empirical roofline for the Pallas packet-traversal kernel (PERFORMANCE.md).

"Is it actually fast?" is answered against *measured* chip peaks, not data
sheets: a VPU f32 FMA chain and an HBM stream microbenchmark run first on the
same device, then the closest-hit kernel is timed per scene class and its
time is attributed with a FLOP + bytes model whose traversal counts (active
top clusters / active child chunks per ray tile) are reproduced exactly on
the host from the same cluster-tree boxes the kernel walks.

Usage: python tools/roofline.py [--scenes pyramid,terrain256,terrain512]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

TILE = 256
# f32 flop model per test (count of mul/add/min/max in the kernel bodies)
BOX_FLOPS = 22  # _box_hits: 3 axes x (2 sub + 2 mul + 2 min/max) + 4 combines
MT_FLOPS = 80  # Moller-Trumbore incl. the winner one-hot reduction


from tools.timing import timeit  # noqa: E402  (honest axon-tunnel timing)


def measure_vpu_peak():
    """Achievable f32 elementwise FLOP/s.

    The FMA chain is unrolled at trace time so the whole dependency chain
    lives inside ONE fusion: each element is read from HBM once, hit with
    256 serial FMAs in VMEM/registers, written once — compute-bound by
    construction (a lax.fori_loop formulation round-trips the carry through
    HBM every iteration and measures bandwidth instead; observed 1.5 TFLOP/s
    vs ~14 for the unrolled chain on v5e).
    """
    n = 8 * 1024 * 1024  # 32 MB operand
    iters = 256
    x = jnp.ones((8, n // 8), jnp.float32)

    @jax.jit
    def fma_chain(x):
        y = x
        for _ in range(iters):
            y = y * 1.000001 + 1e-7
        return y

    # tunnel timing jitters run to run; the peak is the best of 3
    dt = min(timeit(fma_chain, x) for _ in range(3))
    return 2.0 * iters * n / dt  # FLOP/s


def measure_hbm_peak():
    """Achievable HBM stream bandwidth: big out-of-VMEM copy+scale."""
    n = 64 * 1024 * 1024  # 256 MB, far beyond VMEM

    x = jnp.ones((n,), jnp.float32)
    f = jax.jit(lambda x: x * 1.0001)
    dt = min(timeit(f, x) for _ in range(3))
    return 2.0 * 4 * n / dt  # read + write bytes/s


def _slab_np(boxes, o, inv_d, t_lo, t_hi):
    """(B, 8) boxes vs (N, 3) rays -> (B, N) bool, matching _box_hits."""
    t1 = (boxes[:, None, 0:3] - o[None, :, :]) * inv_d[None, :, :]
    t2 = (boxes[:, None, 3:6] - o[None, :, :]) * inv_d[None, :, :]
    tmin = np.minimum(t1, t2).max(axis=2)
    tmax = np.maximum(t1, t2).min(axis=2)
    return (tmin <= tmax) & (tmax >= t_lo[None, :]) & (tmin <= t_hi[None, :])


def traversal_counts(wb, o, d, t_lo, t_hi):
    """Host replay of the kernel's tile culling: per-tile active tops/children.

    Returns (sum active tops over tiles, sum active children over tiles).
    """
    o = np.asarray(o, np.float64)
    d = np.asarray(d, np.float64)
    eps = 1e-12
    inv = 1.0 / np.where(d >= 0, np.maximum(d, eps), np.minimum(d, -eps))
    t_lo = np.asarray(t_lo, np.float64)
    t_hi = np.asarray(t_hi, np.float64)
    top = np.asarray(wb.top_boxes, np.float64)  # (B1, 8)
    child = np.asarray(wb.child_boxes[:, :8], np.float64)  # (B1*B2, 8)
    b1, b2 = wb.b1, wb.b2
    n = len(o)
    tops = children = 0
    for s in range(0, n, TILE):
        sl = slice(s, min(s + TILE, n))
        th = _slab_np(top, o[sl], inv[sl], t_lo[sl], t_hi[sl])  # (B1, T)
        act_top = np.flatnonzero(th.any(axis=1))
        tops += len(act_top)
        for t_idx in act_top:
            ch = _slab_np(
                child[t_idx * b2 : (t_idx + 1) * b2], o[sl], inv[sl], t_lo[sl], t_hi[sl]
            )
            children += int(ch.any(axis=1).sum())
    return tops, children


def analyze_scene(name, renderer, vpu_peak, hbm_peak, n=512 * 512):
    from lens_flare_tpu.accel.wide import build_wide_bvh
    from lens_flare_tpu.ops.intersect_pallas import intersect_pallas
    from lens_flare_tpu.scene.camera import generate_rays

    r = renderer
    ps = r.bundle.pscene
    if ps is None:
        print(f"{name}: no Pallas scene (CPU backend?) — skipping")
        return None
    wb = build_wide_bvh(r.scene.tri_p)  # same boxes the PallasScene packed
    b1, b2, k = ps.b1, ps.b2, ps.k

    cam = r.camera.params()
    ys, xs = np.mgrid[0:512, 0:512]
    xs, ys = xs.ravel(), ys.ravel()
    bs = 32
    order = np.argsort(
        ((ys // bs) * (512 // bs) + (xs // bs)) * bs * bs + (ys % bs) * bs + (xs % bs),
        kind="stable",
    )
    px, py = xs[order][:n], ys[order][:n]
    x = (jnp.asarray(px).astype(jnp.float32) + 0.5) / 512
    y = (jnp.asarray(py).astype(jnp.float32) + 0.5) / 512
    o, d = generate_rays(cam, x, y)
    t_lo = jnp.full(n, cam.n_clip)
    t_hi = jnp.full(n, cam.f_clip)

    f = jax.jit(lambda o, d: intersect_pallas(ps, o, d, t_lo, t_hi))
    dt = timeit(f, o, d)
    out = f(o, d)
    tests_per_ray = float(jnp.sum(out[5])) / n

    tops, children = traversal_counts(wb, o, d, t_lo, t_hi)
    n_tiles = -(-n // TILE)

    # FLOP model: every tile pays the B1 top matrix; every active top pays
    # the child-extraction matmul + B2 child matrix + 2 compactions; every
    # active child pays a full (K, TILE) Moller-Trumbore
    box_flops = BOX_FLOPS * TILE * (b1 * n_tiles + b2 * tops)
    compact_flops = 3 * 2 * (b1 * b1 * n_tiles + b2 * b2 * tops)
    extract_flops = 2 * 8 * 128 * b2 * tops
    mt_flops = MT_FLOPS * k * TILE * children
    flops = box_flops + compact_flops + extract_flops + mt_flops
    # HBM traffic: streamed tri-plane pages (stream mode) + rays in/out
    page_bytes = 9 * k * b2 * 4
    hbm_bytes = (page_bytes * tops if ps.stream else 0) + n * (8 + 5) * 4

    mrays = n / dt / 1e6
    pct_vpu = flops / dt / vpu_peak * 100
    pct_hbm = hbm_bytes / dt / hbm_peak * 100
    # scalar-bound proxy: walltime per inner loop iteration (active child)
    ns_per_child = dt / max(children, 1) * 1e9
    bound = "VPU" if pct_vpu >= max(pct_hbm, 40) else (
        "HBM" if pct_hbm >= 40 else "scalar/latency"
    )
    row = dict(
        name=name, tris=r.scene.num_triangles, shape=f"({b1},{b2},{k})",
        stream=ps.stream, mrays=mrays, tests=tests_per_ray,
        tops_per_tile=tops / n_tiles, children_per_tile=children / n_tiles,
        pct_vpu=pct_vpu, pct_hbm=pct_hbm, ns_per_child=ns_per_child, bound=bound,
    )
    print(
        f"{name:12s} tris={row['tris']:>8d} {row['shape']:>13s} stream={ps.stream!s:5s} "
        f"{mrays:7.1f} Mrays/s  {tests_per_ray:6.1f} tests/ray  "
        f"tops/tile={row['tops_per_tile']:5.1f} children/tile={row['children_per_tile']:6.1f}  "
        f"VPU {pct_vpu:5.1f}%  HBM {pct_hbm:5.1f}%  {ns_per_child:6.0f} ns/chunk  -> {bound}-bound"
    )
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="pyramid,terrain128,terrain256,terrain512")
    ap.add_argument("--n", type=int, default=512 * 512)
    args = ap.parse_args()

    from lens_flare_tpu.renderer import Renderer
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    print(f"backend={jax.default_backend()}")
    vpu = measure_vpu_peak()
    hbm = measure_hbm_peak()
    print(f"measured peaks: VPU f32 {vpu/1e12:.2f} TFLOP/s   HBM {hbm/1e9:.0f} GB/s")

    rows = []
    for name in args.scenes.split(","):
        r = Renderer(width=512, height=512, ns_aa=1, max_ray_depth=1, indirect=False)
        if name == "pyramid":
            r.load("/root/reference/dae/pyramid.dae")
        elif name.startswith("terrain"):
            r.load_flat_scene(make_terrain_scene(int(name[len("terrain"):])))
        else:
            raise SystemExit(f"unknown scene {name}")
        row = analyze_scene(name, r, vpu, hbm, n=args.n)
        if row:
            rows.append(row)

    if rows:
        print("\nmarkdown:\n")
        print("| Scene | tris | shape | stream | Mrays/s | tests/ray | %VPU | %HBM | ns/chunk | bound |")
        print("|---|---|---|---|---|---|---|---|---|---|")
        for r_ in rows:
            print(
                f"| {r_['name']} | {r_['tris']} | {r_['shape']} | {r_['stream']} | "
                f"{r_['mrays']:.1f} | {r_['tests']:.1f} | {r_['pct_vpu']:.1f} | "
                f"{r_['pct_hbm']:.1f} | {r_['ns_per_child']:.0f} | {r_['bound']} |"
            )


if __name__ == "__main__":
    main()
