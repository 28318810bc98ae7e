"""Slow NumPy reference implementations used as test oracles.

Mirrors the reference C++ semantics directly (brute force, no BVH) so the
JAX/Pallas paths can be validated against it: Möller-Trumbore
(``triangle.cpp:25-68``), sphere quadratic (``sphere.cpp:11-111``), pinhole
rays (``camera.cpp:278-305``), and the direct-lighting estimator
(``pathtracer.cpp:142-232``).
"""

from __future__ import annotations

import numpy as np

EPS_F = 0.00001
INF = 1e30


def intersect_brute(scene, o, d, t_lo, t_hi):
    """Closest hit by testing every primitive. o,d: (3,). Returns dict or None."""
    best = None
    best_t = t_hi
    for i in range(scene.num_triangles):
        p0, p1, p2 = scene.tri_p[i]
        res = moller_trumbore(p0, p1, p2, o, d)
        if res is None:
            continue
        t, b1, b2 = res
        if t_lo <= t <= best_t:
            n = (
                (1 - b1 - b2) * scene.tri_n[i, 0]
                + b1 * scene.tri_n[i, 1]
                + b2 * scene.tri_n[i, 2]
            )
            n = n / np.linalg.norm(n)
            best_t = t
            best = dict(t=t, prim=i, bsdf=int(scene.tri_bsdf[i]), n=n)
    for s in range(scene.num_spheres):
        t = sphere_test(scene.sph_center[s], scene.sph_radius[s], o, d, t_lo, best_t)
        if t is not None:
            p = o + d * t
            n = p - scene.sph_center[s]
            n = n / np.linalg.norm(n)
            best_t = t
            best = dict(t=t, prim=scene.num_triangles + s, bsdf=int(scene.sph_bsdf[s]), n=n)
    return best


def moller_trumbore(p0, p1, p2, o, d):
    e1 = p1 - p0
    e2 = p2 - p0
    s = o - p0
    s1 = np.cross(d, e2)
    s2 = np.cross(s, e1)
    det = np.dot(s1, e1)
    if det == 0:
        return None
    t = np.dot(s2, e2) / det
    b1 = np.dot(s1, s) / det
    b2 = np.dot(s2, d) / det
    if b1 < 0 or b1 > 1 or b2 < 0 or b2 > 1 or b1 + b2 > 1:
        return None
    return t, b1, b2


def sphere_test(c, r, o, d, t_lo, t_hi):
    oc = o - c
    a = np.dot(d, d)
    b = 2 * np.dot(oc, d)
    cc = np.dot(oc, oc) - r * r
    disc = b * b - 4 * a * cc
    if disc < 0:
        return None
    sq = np.sqrt(disc)
    t1 = (-b - sq) / (2 * a)
    t2 = (-b + sq) / (2 * a)
    if t_lo <= t1 <= t_hi:
        return t1
    if t_lo <= t2 <= t_hi:
        return t2
    return None


def make_coord_space(n):
    """Normal frame (bsdf.cpp:21-41): returns o2w with columns x,y,z(=n)."""
    z = np.array(n, dtype=np.float64)
    h = z.copy()
    ax = np.abs(h)
    if ax[0] <= ax[1] and ax[0] <= ax[2]:
        h[0] = 1.0
    elif ax[1] <= ax[0] and ax[1] <= ax[2]:
        h[1] = 1.0
    else:
        h[2] = 1.0
    z = z / np.linalg.norm(z)
    y = np.cross(h, z)
    y = y / np.linalg.norm(y)
    x = np.cross(z, y)
    x = x / np.linalg.norm(x)
    o2w = np.stack([x, y, z], axis=1)
    return o2w


def sample_light(lights, li, p, uniforms):
    """sample_L for light row li at point p (light.cpp). uniforms: (2,) in [0,1).

    Returns (radiance, wi, dist, pdf).
    """
    lt = int(lights.light_type[li])
    if lt == 1:  # directional
        wi = lights.direction[li].astype(np.float64)
        return lights.radiance[li].astype(np.float64), wi, INF, 1.0
    if lt == 2:  # point
        d = lights.position[li].astype(np.float64) - p
        dist = np.linalg.norm(d)
        return lights.radiance[li].astype(np.float64), d / dist, dist, 1.0
    if lt == 3:  # area (light.cpp:76-94)
        u, v = uniforms[0] - 0.5, uniforms[1] - 0.5
        d = (
            lights.position[li].astype(np.float64)
            + u * lights.dim_x[li]
            + v * lights.dim_y[li]
            - p
        )
        cos_theta = np.dot(d, lights.direction[li].astype(np.float64))
        sq_dist = np.dot(d, d)
        dist = np.sqrt(sq_dist)
        pdf = sq_dist / (lights.area[li] * abs(cos_theta))
        rad = lights.radiance[li].astype(np.float64) if cos_theta < 0 else np.zeros(3)
        return rad, d / dist, dist, pdf
    if lt == 0:  # infinite hemisphere (light.cpp:28-43)
        xi1, xi2 = uniforms
        theta = np.arccos(xi1)
        phi = 2 * np.pi * xi2
        dir_local = np.array(
            [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)]
        )
        s2w = np.array([[1.0, 0, 0], [0, 0, -1], [0, 1, 0]])
        wi = s2w @ dir_local
        return lights.radiance[li].astype(np.float64), wi, INF, 1.0 / (2 * np.pi)
    raise ValueError(lt)


def orient_normal(bsdfs, isect, ray_d):
    """Face-forward shading normal for reflective materials (see
    integrator.path._orient_normals)."""
    btype = int(bsdfs.bsdf_type[isect["bsdf"]])
    if btype in (4, 5):  # refraction/glass keep the raw normal
        return isect["n"]
    if np.dot(isect["n"], ray_d) > 0:
        return -isect["n"]
    return isect["n"]


def direct_lighting(scene, bsdfs, ray_o, ray_d, isect, ns_area_light, light_uniforms):
    """estimate_direct_lighting_importance (pathtracer.cpp:142-213), diffuse only.

    light_uniforms: dict (light_index, sample_index) -> (2,) uniforms.
    """
    lights = scene.lights
    o2w = make_coord_space(orient_normal(bsdfs, isect, ray_d))
    w2o = o2w.T
    hit_p = ray_o + ray_d * isect["t"]
    w_out = w2o @ (-ray_d)

    L_out = np.zeros(3)
    total_samples = 0
    for li in range(len(lights.light_type)):
        ns = 1 if lights.is_delta[li] else ns_area_light
        total_samples += ns
        for s in range(ns):
            uni = light_uniforms.get((li, s), np.zeros(2))
            emission, wi_world, dist, pdf = sample_light(lights, li, hit_p, uni)
            wi_obj = w2o @ wi_world
            if wi_obj[2] < 0:
                continue
            # f32-consistent shadow bias (integrator.path._offset_origin)
            n_sh = o2w[:, 2]
            side = np.sign(np.dot(n_sh, wi_world))
            offset = n_sh * side * 1e-4 * max(1.0, np.abs(hit_p).max())
            # relative shadow clip (integrator.path.direct_lighting): emitter
            # geometry at the sample point must not occlude its own light
            shadow = intersect_brute(
                scene, hit_p + offset, wi_world, EPS_F, dist * (1.0 - 1e-3) - EPS_F
            )
            if shadow is None:
                cos_theta = wi_obj[2] / np.linalg.norm(wi_obj)
                f = bsdf_f(bsdfs, isect["bsdf"], -wi_obj, w_out)
                L_out += f * emission * cos_theta / pdf
    return L_out / total_samples


def bsdf_f(bsdfs, b, wi, wo):
    """BSDF::f. Diffuse: albedo/pi (bsdf.cpp:52-61); emission: 0."""
    btype = int(bsdfs.bsdf_type[b])
    if btype == 0:
        return bsdfs.albedo[b].astype(np.float64) / np.pi
    if btype == 3:
        return microfacet_f(bsdfs, b, wi, wo)
    return np.zeros(3)


def bsdf_emission(bsdfs, b):
    btype = int(bsdfs.bsdf_type[b])
    if btype == 1:
        return bsdfs.radiance[b].astype(np.float64)
    return np.zeros(3)


def microfacet_f(bsdfs, b, wi, wo):
    """Beckmann microfacet with conductor Fresnel (proper implementation of
    the reference's stub MicrofacetBSDF, advanced_bsdf.cpp:55-102 TODOs)."""
    wi = np.asarray(wi, np.float64)
    wo = np.asarray(wo, np.float64)
    # NOTE: the integrator convention passes wi pointing *into* the surface
    # (reference calls f(-wi_obj, w_out)); flip to the usual convention here.
    wi = -wi
    if wi[2] <= 0 or wo[2] <= 0:
        return np.zeros(3)
    h = wi + wo
    h = h / np.linalg.norm(h)
    alpha = float(bsdfs.alpha[b])
    # Beckmann NDF
    cos_h = h[2]
    tan2 = (1 - cos_h * cos_h) / (cos_h * cos_h)
    D = np.exp(-tan2 / (alpha * alpha)) / (np.pi * alpha * alpha * cos_h ** 4)
    # Smith shadowing (Beckmann rational approx)
    G = smith_g1_beckmann(wi, alpha) * smith_g1_beckmann(wo, alpha)
    # conductor Fresnel per channel at cos(theta_i) w.r.t. half vector
    eta = bsdfs.eta[b].astype(np.float64)
    k = bsdfs.k[b].astype(np.float64)
    cos_i = wi[2]
    F = fresnel_conductor(cos_i, eta, k)
    return F * G * D / (4 * wo[2] * wi[2])


def smith_g1_beckmann(w, alpha):
    cos_t = abs(w[2])
    sin_t = np.sqrt(max(0.0, 1 - cos_t * cos_t))
    if sin_t == 0:
        return 1.0
    a = cos_t / (alpha * sin_t)
    if a >= 1.6:
        return 1.0
    return (3.535 * a + 2.181 * a * a) / (1 + 2.276 * a + 2.577 * a * a)


def fresnel_conductor(cos_i, eta, k):
    """Per-channel conductor Fresnel (CS184 approximation)."""
    c2 = cos_i * cos_i
    e2k2 = eta * eta + k * k
    rs = (e2k2 - 2 * eta * cos_i + c2) / (e2k2 + 2 * eta * cos_i + c2)
    rp = (e2k2 * c2 - 2 * eta * cos_i + 1) / (e2k2 * c2 + 2 * eta * cos_i + 1)
    return (rs + rp) / 2


def generate_ray(camera, x, y):
    """Pinhole ray for normalized (x, y) (camera.cpp:278-305)."""
    edge_x = np.tan(0.5 * np.radians(camera.h_fov))
    edge_y = np.tan(0.5 * np.radians(camera.v_fov))
    d = np.array([edge_x * (2 * x - 1), edge_y * (2 * y - 1), -1.0])
    d = d / np.linalg.norm(d)
    d_world = camera.c2w @ d
    return camera.pos.copy(), d_world
