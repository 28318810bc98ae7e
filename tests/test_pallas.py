"""Pallas packet-traversal kernel vs. oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from lens_flare_tpu.accel.wide import build_wide_bvh, choose_shape
from lens_flare_tpu.ops.intersect_pallas import PallasScene, intersect_pallas
from lens_flare_tpu.oracle import tracer as oracle
from lens_flare_tpu.scene.build import load_scene
from lens_flare_tpu.scene.camera import Camera, place_from_scene_info


def test_choose_shape_capacity():
    for n in (1, 100, 2000, 30000, 120000):
        b1, b2, k = choose_shape(n)
        assert b1 * b2 * k >= n


def _check_scene(path, n_rays=256, seed=0):
    scene, info = load_scene(path)
    wb = build_wide_bvh(scene.tri_p)
    ps = PallasScene(wb, scene.sph_center, scene.sph_radius, scene.num_triangles)
    cam = Camera()
    cam.configure(info.camera, 128, 128)
    place_from_scene_info(cam, info, scene.bbox_min, scene.bbox_max)

    rng = np.random.default_rng(seed)
    xs = rng.uniform(0, 1, n_rays)
    ys = rng.uniform(0, 1, n_rays)
    o = np.zeros((n_rays, 3), np.float32)
    d = np.zeros((n_rays, 3), np.float32)
    for i in range(n_rays):
        oo, dd = oracle.generate_ray(cam, xs[i], ys[i])
        o[i] = oo
        d[i] = dd

    t, prim, b1v, b2v, hit, _tests = intersect_pallas(
        ps,
        jnp.asarray(o),
        jnp.asarray(d),
        jnp.full(n_rays, cam.n_clip, jnp.float32),
        jnp.full(n_rays, cam.f_clip, jnp.float32),
        interpret=True,
    )
    t = np.asarray(t)
    prim = np.asarray(prim)
    hit = np.asarray(hit)

    n_hits = 0
    for i in range(n_rays):
        ref = oracle.intersect_brute(
            scene, o[i].astype(np.float64), d[i].astype(np.float64), cam.n_clip, cam.f_clip
        )
        if ref is None:
            assert not hit[i], f"ray {i}: false positive"
        else:
            n_hits += 1
            assert hit[i], f"ray {i}: missed"
            assert prim[i] == ref["prim"], f"ray {i}"
            assert abs(t[i] - ref["t"]) < 1e-3 * max(1.0, ref["t"]), f"ray {i}"
    return n_hits


def test_pallas_matches_oracle_pyramid(dae_dir):
    assert _check_scene(dae_dir / "pyramid.dae") > 30


def test_pallas_matches_oracle_spheres(dae_dir):
    # mixed triangles + analytic spheres
    assert _check_scene(dae_dir / "sky" / "CBspheres_lambertian.dae", n_rays=128) >= 20


def test_choose_shape_streaming_capacity():
    # beyond the VMEM ceiling the shapes keep B2=128 (one DMA page per top)
    for n in (300_000, 1_000_000, 4_000_000, 16_000_000):
        b1, b2, k = choose_shape(n)
        assert b1 * b2 * k >= n
        assert b2 == 128


def _camera_rays(scene, n_rays, seed=0, width=128, height=128):
    from lens_flare_tpu.scene.camera import generate_rays
    import jax

    cam = Camera()
    center = (scene.bbox_min + scene.bbox_max) / 2
    extent = float(np.linalg.norm(scene.bbox_max - scene.bbox_min))
    cam.place(center, np.pi / 3, np.pi / 4, extent, extent / 10, extent * 10)
    cam.screen_w, cam.screen_h = width, height
    rng = np.random.default_rng(seed)
    xs = jnp.asarray(rng.uniform(0, 1, n_rays), jnp.float32)
    ys = jnp.asarray(rng.uniform(0, 1, n_rays), jnp.float32)
    o, d = generate_rays(cam.params(), xs, ys)
    return cam, o, d


def test_stream_kernel_matches_vmem_kernel():
    """The HBM page-streaming kernel is hit-for-hit identical to VMEM mode."""
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    scene = make_terrain_scene(n_quads=40)  # 3200 triangles
    n_rays = 512
    cam, o, d = _camera_rays(scene, n_rays)
    t_lo = jnp.full(n_rays, cam.n_clip, jnp.float32)
    t_hi = jnp.full(n_rays, cam.f_clip, jnp.float32)

    # same tree shape for both so hits/slots are comparable exactly
    wb = build_wide_bvh(scene.tri_p, 4, 128, 8)
    ps_vmem = PallasScene(
        wb, scene.sph_center, scene.sph_radius, scene.num_triangles, force_stream=False
    )
    ps_stream = PallasScene(
        wb, scene.sph_center, scene.sph_radius, scene.num_triangles, force_stream=True
    )
    assert not ps_vmem.stream and ps_stream.stream

    res_v = intersect_pallas(ps_vmem, o, d, t_lo, t_hi, interpret=True)
    res_s = intersect_pallas(ps_stream, o, d, t_lo, t_hi, interpret=True)
    for a, b in zip(res_v, res_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(np.asarray(res_s[4]).sum()) > 100  # plenty of hits


def test_stream_kernel_matches_oracle():
    """Streamed hits agree with the brute-force oracle on a terrain slice."""
    from lens_flare_tpu.oracle import tracer as oracle
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    scene = make_terrain_scene(n_quads=24)  # 1152 triangles
    n_rays = 64
    cam, o, d = _camera_rays(scene, n_rays, seed=3)
    t_lo = jnp.full(n_rays, cam.n_clip, jnp.float32)
    t_hi = jnp.full(n_rays, cam.f_clip, jnp.float32)

    wb = build_wide_bvh(scene.tri_p, 2, 128, 8)
    ps = PallasScene(
        wb, scene.sph_center, scene.sph_radius, scene.num_triangles, force_stream=True
    )
    assert ps.stream
    t, prim, _, _, hit, tests = intersect_pallas(ps, o, d, t_lo, t_hi, interpret=True)
    t, prim, hit = np.asarray(t), np.asarray(prim), np.asarray(hit)
    o_np, d_np = np.asarray(o, np.float64), np.asarray(d, np.float64)
    n_hits = 0
    for i in range(n_rays):
        ref = oracle.intersect_brute(scene, o_np[i], d_np[i], cam.n_clip, cam.f_clip)
        if ref is None:
            assert not hit[i], f"ray {i}: false positive"
        else:
            n_hits += 1
            assert hit[i], f"ray {i}: missed"
            assert prim[i] == ref["prim"], f"ray {i}"
            assert abs(t[i] - ref["t"]) < 1e-3 * max(1.0, ref["t"]), f"ray {i}"
    assert n_hits >= 20


def test_any_hit_matches_closest_hit_occlusion(dae_dir):
    """The divide-free any-hit fast path finds exactly the closest-hit
    occlusion set (same rays, same clips), including dead lanes (t_hi = 0)
    and mixed triangle+sphere scenes."""
    scene, info = load_scene(dae_dir / "sky" / "CBspheres_lambertian.dae")
    wb = build_wide_bvh(scene.tri_p)
    ps = PallasScene(wb, scene.sph_center, scene.sph_radius, scene.num_triangles)
    cam = Camera()
    cam.configure(info.camera, 64, 64)
    place_from_scene_info(cam, info, scene.bbox_min, scene.bbox_max)

    rng = np.random.default_rng(7)
    n = 384
    xs, ys = rng.uniform(0, 1, n), rng.uniform(0, 1, n)
    o = np.zeros((n, 3), np.float32)
    d = np.zeros((n, 3), np.float32)
    for i in range(n):
        o[i], d[i] = oracle.generate_ray(cam, xs[i], ys[i])
    t_lo = jnp.full(n, cam.n_clip, jnp.float32)
    # a third of the lanes dead (masked NEE slots), a third clipped short
    t_hi = jnp.asarray(
        np.where(np.arange(n) % 3 == 0, 0.0, np.where(np.arange(n) % 3 == 1, 2.0, cam.f_clip)),
        jnp.float32,
    )
    o_j, d_j = jnp.asarray(o), jnp.asarray(d)
    res_c = intersect_pallas(ps, o_j, d_j, t_lo, t_hi, interpret=True)
    res_a = intersect_pallas(ps, o_j, d_j, t_lo, t_hi, interpret=True, any_hit=True)
    found_closest = np.asarray(res_c[4])
    found_any = np.asarray(res_a[4])
    np.testing.assert_array_equal(found_any, found_closest)
    assert found_any.sum() > 20  # meaningful occlusion mix
    assert not found_any[np.arange(n) % 3 == 0].any()  # dead lanes stay dead


def test_chunk_batch_invariance(dae_dir):
    """Results are identical for any chunk_batch (incl. tail iterations
    where the batch is only partially filled), in both residency modes."""
    import pytest

    scene, info = load_scene(dae_dir / "sky" / "CBbunny.dae")
    n_rays = 512
    cam = Camera()
    cam.configure(info.camera, 64, 64)
    place_from_scene_info(cam, info, scene.bbox_min, scene.bbox_max)
    rng = np.random.default_rng(11)
    xs, ys = rng.uniform(0, 1, n_rays), rng.uniform(0, 1, n_rays)
    o = np.zeros((n_rays, 3), np.float32)
    d = np.zeros((n_rays, 3), np.float32)
    for i in range(n_rays):
        o[i], d[i] = oracle.generate_ray(cam, xs[i], ys[i])
    o, d = jnp.asarray(o), jnp.asarray(d)
    t_lo = jnp.full(n_rays, cam.n_clip, jnp.float32)
    t_hi = jnp.full(n_rays, cam.f_clip, jnp.float32)

    wb = build_wide_bvh(scene.tri_p)  # CBbunny ~28k tris -> (32, 64, 32)
    for force_stream in (False, True):
        ps = PallasScene(
            wb, scene.sph_center, scene.sph_radius, scene.num_triangles,
            force_stream=force_stream,
        )
        ref = intersect_pallas(ps, o, d, t_lo, t_hi, interpret=True, chunk_batch=1)
        assert int(np.asarray(ref[4]).sum()) > 100
        for cb in (2, 3, 4, 8):
            res = intersect_pallas(ps, o, d, t_lo, t_hi, interpret=True, chunk_batch=cb)
            for a, b in zip(ref, res):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            occ = intersect_pallas(
                ps, o, d, t_lo, t_hi, interpret=True, any_hit=True, chunk_batch=cb
            )
            np.testing.assert_array_equal(np.asarray(occ[4]), np.asarray(ref[4]))


def test_brute_kernel_matches_tree(dae_dir):
    """Tiny scenes auto-select the brute (no-tree) kernel for any-hit
    queries; results must equal the cluster-tree kernel's exactly, including
    mixed sphere scenes.  Closest-hit brute is forced for coverage (the
    production path keeps the tree walk there)."""
    for rel in ("pyramid.dae", "sky/CBspheres_lambertian.dae"):
        scene, info = load_scene(str(dae_dir / rel))
        wb = build_wide_bvh(scene.tri_p)
        ps_b = PallasScene(wb, scene.sph_center, scene.sph_radius, scene.num_triangles)
        ps_t = PallasScene(
            wb, scene.sph_center, scene.sph_radius, scene.num_triangles,
            force_brute=False,
        )
        assert ps_b.brute and not ps_t.brute
        cam = Camera()
        cam.configure(info.camera, 128, 128)
        place_from_scene_info(cam, info, scene.bbox_min, scene.bbox_max)
        rng = np.random.default_rng(3)
        n = 512
        o = np.zeros((n, 3), np.float32)
        d = np.zeros((n, 3), np.float32)
        for i in range(n):
            o[i], d[i] = oracle.generate_ray(cam, rng.uniform(), rng.uniform())
        o, d = jnp.asarray(o), jnp.asarray(d)
        t_lo = jnp.full(n, cam.n_clip, jnp.float32)
        t_hi = jnp.full(n, cam.f_clip, jnp.float32)
        rb = intersect_pallas(ps_b, o, d, t_lo, t_hi, interpret=True, brute=True)
        rt = intersect_pallas(ps_t, o, d, t_lo, t_hi, interpret=True)
        assert int(np.asarray(rb[4]).sum()) > 50
        np.testing.assert_allclose(np.asarray(rb[0]), np.asarray(rt[0]), rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(rb[1]), np.asarray(rt[1]))  # prim
        np.testing.assert_allclose(np.asarray(rb[2]), np.asarray(rt[2]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(rb[3]), np.asarray(rt[3]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(rb[4]), np.asarray(rt[4]))  # hit
        # any-hit with shortened intervals + dead lanes (t_hi = 0)
        t_short = jnp.where(jnp.arange(n) % 3 == 0, 0.0, t_hi * 0.5)
        ab = intersect_pallas(ps_b, o, d, t_lo, t_short, interpret=True, any_hit=True)
        at = intersect_pallas(ps_t, o, d, t_lo, t_short, interpret=True, any_hit=True)
        np.testing.assert_array_equal(np.asarray(ab[4]), np.asarray(at[4]))
        assert (np.asarray(ab[1]) == -1).all()  # any-hit prim sentinel


def test_shade_mode_rows_match_table():
    """In-kernel shade accumulation (large-table scenes) returns exactly the
    winner's tri_shade row; the other outputs are unchanged."""
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    scene = make_terrain_scene(n_quads=64)  # 8192 tris -> (16, 32, 32)
    n_rays = 512
    cam, o, d = _camera_rays(scene, n_rays)
    t_lo = jnp.full(n_rays, cam.n_clip, jnp.float32)
    t_hi = jnp.full(n_rays, cam.f_clip, jnp.float32)
    n_t = scene.num_triangles
    shade_rows = np.concatenate(
        [
            np.asarray(scene.tri_n, np.float32).reshape(n_t, 9),
            np.asarray(scene.tri_bsdf, np.float32).reshape(n_t, 1),
        ],
        axis=1,
    )
    wb = build_wide_bvh(scene.tri_p)
    ps = PallasScene(
        wb, scene.sph_center, scene.sph_radius, n_t, shade_rows=shade_rows
    )
    assert ps.shade  # multi-level, >512 tris, fits the VMEM budget

    base = intersect_pallas(ps, o, d, t_lo, t_hi, interpret=True)
    sh = intersect_pallas(ps, o, d, t_lo, t_hi, interpret=True, return_shade=True)
    for a, b in zip(base, sh[:6]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    shade_cm = np.asarray(sh[6])  # (10, N) component-major
    prim = np.asarray(base[1])
    mask = np.asarray(base[4]) & (prim >= 0) & (prim < n_t)
    assert mask.sum() > 100
    np.testing.assert_array_equal(shade_cm[:, mask].T, shade_rows[prim[mask]])


def test_dead_lanes_activate_nothing():
    """A dead lane (t_hi = 0) whose ORIGIN is inside cluster boxes must not
    activate them (VERDICT r4: the slab test lacked the t_lo <= t_hi term,
    so RR/miss/NEE-masked lanes dragged dead chunks through the MT walk).

    With the fix, a wavefront of dead lanes placed inside the scene counts
    ZERO intersection tests; mixed tiles count only the live lanes'.
    """
    import jax.numpy as jnp
    import numpy as np

    from lens_flare_tpu.accel.wide import build_wide_bvh
    from lens_flare_tpu.ops.intersect_pallas import PallasScene, intersect_pallas
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    scene = make_terrain_scene(n_quads=40)  # 3200 tris, multi-level tree
    wb = build_wide_bvh(scene.tri_p)
    ps = PallasScene(wb, scene.sph_center, scene.sph_radius, scene.num_triangles)

    n = 256
    rng = np.random.default_rng(0)
    # origins strictly inside the terrain bbox, directions downward
    o = np.stack(
        [
            rng.uniform(-8, 8, n),
            rng.uniform(-8, 8, n),
            np.full(n, 1.0),
        ],
        axis=-1,
    ).astype(np.float32)
    d = np.tile(np.array([[0.1, 0.05, -1.0]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_lo = jnp.full(n, 1e-4)

    # all-dead wavefront: zero tests, zero hits
    t, prim, b1, b2, found, tests = intersect_pallas(
        ps, jnp.asarray(o), jnp.asarray(d), t_lo, jnp.zeros(n), interpret=True
    )
    assert int(np.asarray(tests).sum()) == 0
    assert not np.asarray(found).any()

    # mixed tile: dead lanes contribute nothing to the counters, and live
    # lanes' results are unchanged vs an all-live wavefront
    alive = np.arange(n) % 2 == 0
    hi_mixed = jnp.where(jnp.asarray(alive), 1e30, 0.0)
    t_m, prim_m, _, _, found_m, tests_m = intersect_pallas(
        ps, jnp.asarray(o), jnp.asarray(d), t_lo, hi_mixed, interpret=True
    )
    t_f, prim_f, _, _, found_f, tests_f = intersect_pallas(
        ps, jnp.asarray(o), jnp.asarray(d), t_lo, jnp.full(n, 1e30), interpret=True
    )
    tests_m = np.asarray(tests_m)
    assert (tests_m[~alive] == 0).all()
    np.testing.assert_array_equal(np.asarray(found_m)[alive], np.asarray(found_f)[alive])
    np.testing.assert_array_equal(np.asarray(t_m)[alive], np.asarray(t_f)[alive])


def test_group_walk_matches_default():
    """The top-batched group walk (top_batch > 1) is hit-for-hit identical."""
    import jax.numpy as jnp
    import numpy as np

    from lens_flare_tpu.accel.wide import build_wide_bvh
    from lens_flare_tpu.ops.intersect_pallas import PallasScene, intersect_pallas
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    scene = make_terrain_scene(n_quads=40)
    wb = build_wide_bvh(scene.tri_p)
    ps = PallasScene(wb, scene.sph_center, scene.sph_radius, scene.num_triangles)
    assert ps.b1 > 1  # the group walk only exists for multi-level trees

    n = 512
    rng = np.random.default_rng(1)
    o = np.stack(
        [rng.uniform(-9, 9, n), rng.uniform(-9, 9, n), rng.uniform(2.0, 4.0, n)],
        axis=-1,
    ).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_lo = jnp.full(n, 1e-4)
    t_hi = jnp.full(n, 1e30)

    base = intersect_pallas(ps, jnp.asarray(o), jnp.asarray(d), t_lo, t_hi, interpret=True)
    for tbv in (2, 4):
        got = intersect_pallas(
            ps, jnp.asarray(o), jnp.asarray(d), t_lo, t_hi,
            interpret=True, top_batch=tbv,
        )
        for a, b_, name in zip(got[:5], base[:5], ["t", "prim", "b1", "b2", "found"]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_), err_msg=name)


def test_group_walk_matches_default_anyhit():
    """Group walk parity for ANY-HIT (early-exit loop) queries too."""
    import jax.numpy as jnp
    import numpy as np

    from lens_flare_tpu.accel.wide import build_wide_bvh
    from lens_flare_tpu.ops.intersect_pallas import PallasScene, intersect_pallas
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    scene = make_terrain_scene(n_quads=40)
    wb = build_wide_bvh(scene.tri_p)
    ps = PallasScene(wb, scene.sph_center, scene.sph_radius, scene.num_triangles)
    assert ps.b1 > 1

    n = 512
    rng = np.random.default_rng(3)
    o = np.stack(
        [rng.uniform(-9, 9, n), rng.uniform(-9, 9, n), rng.uniform(2.0, 4.0, n)],
        axis=-1,
    ).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_lo = jnp.full(n, 1e-4)
    # mix of live and dead lanes, finite and infinite intervals
    t_hi = jnp.asarray(
        np.where(np.arange(n) % 3 == 0, 0.0, np.where(np.arange(n) % 3 == 1, 5.0, 1e30)),
        jnp.float32,
    )

    base = intersect_pallas(
        ps, jnp.asarray(o), jnp.asarray(d), t_lo, t_hi, interpret=True, any_hit=True
    )
    for tbv in (2, 4):
        got = intersect_pallas(
            ps, jnp.asarray(o), jnp.asarray(d), t_lo, t_hi,
            interpret=True, any_hit=True, top_batch=tbv,
        )
        np.testing.assert_array_equal(
            np.asarray(got[4]), np.asarray(base[4]), err_msg=f"TB={tbv} occlusion"
        )


def test_stream_shade_rows_match_vmem():
    """Stream-mode in-kernel shade rows (round-5): the HBM-paged shade ring
    must return exactly the same winner rows as the VMEM shade path, so
    524k-tri streamed scenes skip the finalize_hit row gather too."""
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    scene = make_terrain_scene(n_quads=64)  # 8192 tris -> multi-level tree
    n_rays = 512
    cam, o, d = _camera_rays(scene, n_rays)
    t_lo = jnp.full(n_rays, cam.n_clip, jnp.float32)
    t_hi = jnp.full(n_rays, cam.f_clip, jnp.float32)
    n_t = scene.num_triangles
    shade_rows = np.concatenate(
        [
            np.asarray(scene.tri_n, np.float32).reshape(n_t, 9),
            np.asarray(scene.tri_bsdf, np.float32).reshape(n_t, 1),
        ],
        axis=1,
    )
    wb = build_wide_bvh(scene.tri_p)
    ps_v = PallasScene(
        wb, scene.sph_center, scene.sph_radius, n_t,
        shade_rows=shade_rows, force_stream=False,
    )
    ps_s = PallasScene(
        wb, scene.sph_center, scene.sph_radius, n_t,
        shade_rows=shade_rows, force_stream=True, stream_shade=True,
    )
    assert ps_v.shade and ps_s.shade and ps_s.stream

    rv = intersect_pallas(ps_v, o, d, t_lo, t_hi, interpret=True, return_shade=True)
    rs = intersect_pallas(ps_s, o, d, t_lo, t_hi, interpret=True, return_shade=True)
    for a, b in zip(rv, rs):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the rows really are the winner's table rows
    prim = np.asarray(rs[1])
    mask = np.asarray(rs[4]) & (prim >= 0) & (prim < n_t)
    assert mask.sum() > 100
    np.testing.assert_array_equal(
        np.asarray(rs[6])[:, mask].T, shade_rows[prim[mask]]
    )


def test_mxu_mt_coefficient_walk_parity():
    """MXU Möller-Trumbore coefficient walk == classic walk (VERDICT r4 #2).

    The mode exists as a measured experiment (tools/ab_mxu_mt.py): per-top
    recentered affine coefficients + one (16,128)^T x (16,TILE) HIGHEST-
    precision matmul per chunk.  On v5e it is 0.67-0.78x the classic VPU
    chain (and only reaches ~1.0x even at numerically-unusable bf16), so it
    stays off by default — but its correctness must not rot: identical hits
    and prims, t within f32 cancellation tolerance.
    """
    from lens_flare_tpu.scene.procedural import make_terrain_scene

    scene = make_terrain_scene(n_quads=64)
    rng = np.random.default_rng(0)
    n_rays = 1024
    lo, hi = np.asarray(scene.bbox_min), np.asarray(scene.bbox_max)
    o = jnp.asarray(rng.uniform(lo - 1, hi + 1, (n_rays, 3)), jnp.float32)
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d, jnp.float32)
    t_lo = jnp.full(n_rays, 1e-4, jnp.float32)
    t_hi = jnp.full(n_rays, 1e30, jnp.float32)

    wb = build_wide_bvh(scene.tri_p, 8, 32, 32)
    ps = PallasScene(wb, scene.sph_center, scene.sph_radius, scene.num_triangles, mxu=True)
    assert ps.mxu

    base = intersect_pallas(ps, o, d, t_lo, t_hi, interpret=True)
    mx = intersect_pallas(ps, o, d, t_lo, t_hi, interpret=True, mxu=True)
    hb, hm = np.asarray(base[4]), np.asarray(mx[4])
    assert hb.sum() > 200
    np.testing.assert_array_equal(hb, hm)
    np.testing.assert_array_equal(np.asarray(base[1])[hb], np.asarray(mx[1])[hb])
    np.testing.assert_allclose(
        np.asarray(base[0])[hb], np.asarray(mx[0])[hb], rtol=1e-3, atol=1e-5
    )
