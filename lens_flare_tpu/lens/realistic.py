"""Full sequential lens-stack ray tracing: Snell refraction + Fresnel ghosts.

BASELINE config 3 ("full lens-stack sequential trace: multi-element
refraction + Fresnel ghost flares").  This is the physically-based upgrade
path from the paraxial 2x2 model (pathtracer.cpp:511-689): real 3-D rays are
traced sphere-by-sphere through the same prescription, each interface doing
exact Snell refraction with exact unpolarized dielectric Fresnel
transmittance; a ghost = the two-reflection path (i, j), whose energy is the
product of Fresnel R at the two bounce surfaces and T everywhere else —
instead of the paraxial model's flat "10/scale^2" intensity.

Everything is jnp and differentiable w.r.t. the prescription, so config 5
(lens-design optimization) can run against this model too.

Geometry: optical axis = +z, surface vertex i at z_i = sum(spacings[:i]),
sensor plane at z = sum(spacings).  A spherical surface with curvature c has
center z_i + 1/c; c = 0 is planar (the iris).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .prescription import LensPrescription
from .paraxial import reference_ghost_pairs


def surface_z(lens: LensPrescription):
    """Axial vertex positions (N+1,): interfaces 0..N-1 then the sensor plane."""
    return jnp.concatenate([jnp.zeros(1), jnp.cumsum(lens.spacings)])


def fresnel_dielectric(cos_i, n1, n2):
    """Exact unpolarized dielectric Fresnel reflectance; handles TIR (R=1)."""
    cos_i = jnp.abs(cos_i)
    sin2_t = (n1 / n2) ** 2 * jnp.maximum(0.0, 1.0 - cos_i ** 2)
    tir = sin2_t >= 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    rs = ((n1 * cos_i - n2 * cos_t) / jnp.maximum(n1 * cos_i + n2 * cos_t, 1e-12)) ** 2
    rp = ((n1 * cos_t - n2 * cos_i) / jnp.maximum(n1 * cos_t + n2 * cos_i, 1e-12)) ** 2
    return jnp.where(tir, 1.0, 0.5 * (rs + rp))


def _intersect_surface(o, d, z_vertex, c):
    """Ray to spherical (or planar) interface. Returns (t, normal, valid).

    o, d: (..., 3); normal points towards -z (against propagation) for a
    surface hit from the front.
    """
    planar = jnp.abs(c) < 1e-9
    # --- plane z = z_vertex ---
    t_plane = (z_vertex - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) < 1e-12, 1e-12, d[..., 2])
    n_plane = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), o.shape)

    # --- sphere: center on axis at z_vertex + R, R = 1/c ---
    R = 1.0 / jnp.where(planar, 1.0, c)
    center = jnp.stack(
        [jnp.zeros_like(o[..., 0]), jnp.zeros_like(o[..., 0]), jnp.full_like(o[..., 0], z_vertex) + R],
        axis=-1,
    )
    oc = o - center
    b = 2.0 * jnp.sum(oc * d, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - R * R
    disc = b * b - 4.0 * cc  # a = |d|^2 = 1
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t1 = (-b - sq) / 2.0
    t2 = (-b + sq) / 2.0
    # choose the root whose hit point is nearest the vertex plane (the actual
    # lens cap, not the far side of the sphere): for R > 0 take the near root,
    # for R < 0 the far root (when travelling in +z).
    going_fwd = d[..., 2] > 0
    near_first = jnp.where(going_fwd, R > 0, R < 0)
    t_sph = jnp.where(near_first, t1, t2)
    p = o + d * t_sph[..., None]
    n_sph = (p - center) / R[..., None] if jnp.ndim(R) else (p - center) / R
    # orient against the ray
    flip = jnp.sum(n_sph * d, axis=-1) > 0
    n_sph = jnp.where(flip[..., None], -n_sph, n_sph)

    t = jnp.where(planar, t_plane, t_sph)
    n = jnp.where(planar[..., None] if jnp.ndim(planar) else planar, n_plane, n_sph)
    n_flip = jnp.sum(n * d, axis=-1) > 0
    n = jnp.where(n_flip[..., None], -n, n)
    valid = jnp.where(planar, jnp.abs(d[..., 2]) > 1e-12, disc >= 0) & (t > 1e-9)
    return t, n, valid


def _refract(d, n, eta_ratio):
    """Snell; n opposes d. Returns (d_new, valid)."""
    cos_i = -jnp.sum(d * n, axis=-1)
    sin2_t = eta_ratio ** 2 * jnp.maximum(0.0, 1.0 - cos_i ** 2)
    tir = sin2_t > 1.0
    cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
    d_new = eta_ratio[..., None] * d + (eta_ratio * cos_i - cos_t)[..., None] * n
    d_new = d_new / jnp.maximum(jnp.linalg.norm(d_new, axis=-1, keepdims=True), 1e-12)
    return d_new, jnp.logical_not(tir)


def _reflect(d, n):
    return d - 2.0 * jnp.sum(d * n, axis=-1, keepdims=True) * n


class StackTrace(NamedTuple):
    xy: jnp.ndarray  # (..., 2) sensor-plane coordinates
    energy: jnp.ndarray  # (...,) product of Fresnel factors (0 = vignetted)


def trace_ghost_stack(lens: LensPrescription, o, d, color: int, pair):
    """Trace rays through reflection pair (i, j) to the sensor.

    o, d: (..., 3) in lens space; color in {0,1,2}; pair = (i, j) python ints.
    Surface event sequence is static: 0..j forward, reflect j, back to i,
    reflect i, forward to sensor.
    """
    i, j = pair
    n_int = lens.num_interfaces
    zs = surface_z(lens)
    iors = lens.iors[color]

    def n_before(k):
        return jnp.where(k == 0, 1.0, iors[max(k - 1, 0)])

    def media(k):
        """(n1, n2) refractive indices across interface k in forward direction."""
        n1 = 1.0 if k == 0 else iors[k - 1]
        n2 = iors[k]
        return n1, n2

    energy = jnp.ones(o.shape[:-1])
    valid = jnp.ones(o.shape[:-1], bool)

    def hit_surface(o, d, k):
        t, n, ok = _intersect_surface(o, d, zs[k], lens.curvatures[k])
        p = o + d * t[..., None]
        return p, n, ok

    def aperture_clip(p, energy, valid):
        r2 = p[..., 0] ** 2 + p[..., 1] ** 2
        ok = r2 <= lens.aperture_height ** 2
        return energy * ok.astype(energy.dtype), valid & ok

    # events: (kind, surface) with kind in {"T", "Rf"}; direction bookkeeping
    events = []
    for k in range(0, j + 1):
        if k == j:
            events.append(("R", k, "fwd"))
        else:
            events.append(("T", k, "fwd"))
    for k in range(j - 1, i - 1, -1):
        if k == i:
            events.append(("R", k, "bwd"))
        else:
            events.append(("T", k, "bwd"))
    for k in range(i + 1, n_int):
        events.append(("T", k, "fwd"))

    for kind, k, direction in events:
        p, n, ok = hit_surface(o, d, k)
        valid = valid & ok
        if k == lens.aperture_index:
            energy, valid = aperture_clip(p, energy, valid)
            o = p
            continue  # the iris neither refracts nor reflects
        n1, n2 = media(k)
        if direction == "bwd":
            n1, n2 = n2, n1
        cos_i = -jnp.sum(d * n, axis=-1)
        R = fresnel_dielectric(cos_i, n1, n2)
        if kind == "T":
            d_new, ok_r = _refract(d, n, jnp.broadcast_to(jnp.asarray(n1 / n2), cos_i.shape))
            energy = energy * (1.0 - R)
            valid = valid & ok_r
            d = d_new
        else:  # reflection: this is the ghost bounce
            d = _reflect(d, n)
            energy = energy * R
        o = p

    # propagate to the sensor plane
    z_sensor = zs[n_int]
    t = (z_sensor - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) < 1e-12, 1e-12, d[..., 2])
    p = o + d * t[..., None]
    valid = valid & (t > 0)
    return StackTrace(xy=p[..., :2], energy=energy * valid.astype(energy.dtype))


def render_ghosts_stack(
    lens: LensPrescription,
    angle_to_sun,
    radiance,  # (3,) sun radiance
    axis_ray,  # (2,) sun position in normalized screen coords
    width: int,
    height: int,
    pupil_samples: int = 32,
    sensor_scale: float = 0.4,
    intensity: float = 10.0,
):
    """Physically-based ghost buffer: trace pupil grids per (pair, color), splat.

    ``sensor_scale`` maps sensor units to pixels (the paraxial pipeline's
    shift factor 0.4 is the visual reference point).  Returns (H, W, 3).
    """
    pairs = reference_ghost_pairs()

    # collimated beam from the sun: meridional angle, rotated by screen angle
    sin_t = jnp.sin(angle_to_sun)
    cos_t = jnp.cos(angle_to_sun)
    d0 = jnp.array([sin_t, 0.0, cos_t])

    lin = jnp.linspace(-1.0, 1.0, pupil_samples)
    gx, gy = jnp.meshgrid(lin, lin)
    in_disc = gx ** 2 + gy ** 2 <= 1.0
    px_lens = gx * lens.marginal_r
    py_lens = gy * lens.marginal_r
    o0 = jnp.stack([px_lens, py_lens, jnp.full_like(px_lens, -1.0)], axis=-1).reshape(-1, 3)
    d = jnp.broadcast_to(d0, o0.shape)
    disc_mask = in_disc.reshape(-1)

    gb_x = jnp.ceil(axis_ray[0] * width)
    gb_y = jnp.ceil(axis_ray[1] * height)
    screen_angle = jnp.arctan((axis_ray[1] - 0.5) / (axis_ray[0] - 0.5))
    ca, sa = jnp.cos(screen_angle), jnp.sin(screen_angle)

    buf = jnp.zeros((height * width, 3))
    n_rays = int(disc_mask.sum()) if hasattr(disc_mask, "sum") else pupil_samples ** 2

    for pair in pairs:
        for color in range(3):
            tr = trace_ghost_stack(lens, o0, d, color, pair)
            # rotate the sensor pattern into the sun's screen direction
            sx = (ca * tr.xy[:, 0] - sa * tr.xy[:, 1]) * sensor_scale
            sy = (sa * tr.xy[:, 0] + ca * tr.xy[:, 1]) * sensor_scale
            fx = gb_x + sx
            fy = gb_y + sy
            w = tr.energy * disc_mask * (intensity / n_rays)
            # bilinear scatter-add
            x0 = jnp.floor(fx)
            y0 = jnp.floor(fy)
            for dx_o in (0, 1):
                for dy_o in (0, 1):
                    xi = (x0 + dx_o).astype(jnp.int32)
                    yi = (y0 + dy_o).astype(jnp.int32)
                    wgt = (1 - jnp.abs(fx - (x0 + dx_o))) * (1 - jnp.abs(fy - (y0 + dy_o)))
                    inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
                    idx = jnp.clip(yi * width + xi, 0, height * width - 1)
                    val = w * wgt * inb.astype(w.dtype)
                    buf = buf.at[idx, color].add(val)

    rad_scale = jnp.asarray(radiance)
    return buf.reshape(height, width, 3) * rad_scale
