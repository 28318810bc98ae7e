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


def _safe_sqrt(x):
    """sqrt clamped at 0 with a NaN-free gradient.

    ``sqrt(max(x, 0))`` backprops ``inf * 0 = NaN`` for x <= 0 even when the
    lane is masked downstream (energy *= valid): the double-where keeps the
    non-taken branch finite so masked lanes can't poison ``jax.grad``.
    """
    pos = x > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, x, 1.0)), 0.0)


def fresnel_dielectric(cos_i, n1, n2):
    """Exact unpolarized dielectric Fresnel reflectance; handles TIR (R=1)."""
    cos_i = jnp.abs(cos_i)
    sin2_t = (n1 / n2) ** 2 * jnp.maximum(0.0, 1.0 - cos_i ** 2)
    tir = sin2_t >= 1.0
    cos_t = _safe_sqrt(1.0 - sin2_t)
    rs = ((n1 * cos_i - n2 * cos_t) / jnp.maximum(n1 * cos_i + n2 * cos_t, 1e-12)) ** 2
    rp = ((n1 * cos_t - n2 * cos_i) / jnp.maximum(n1 * cos_t + n2 * cos_i, 1e-12)) ** 2
    return jnp.where(tir, 1.0, 0.5 * (rs + rp))


def _intersect_surface(o, d, z_vertex, c):
    """Ray to spherical (or planar) interface. Returns (t, normal, valid).

    o, d: (..., 3); z_vertex, c: scalars or arrays broadcasting against
    o[..., 0]; normal points towards -z (against propagation) for a surface
    hit from the front.
    """
    z_b = jnp.broadcast_to(jnp.asarray(c * 0.0 + z_vertex), o[..., 0].shape)
    planar = jnp.broadcast_to(jnp.abs(jnp.asarray(c)) < 1e-9, o[..., 0].shape)
    # --- plane z = z_vertex ---
    t_plane = (z_b - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) < 1e-12, 1e-12, d[..., 2])
    n_plane = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), o.shape)

    # --- sphere: center on axis at z_vertex + R, R = 1/c ---
    R = 1.0 / jnp.where(planar, 1.0, jnp.broadcast_to(jnp.asarray(c), planar.shape))
    center = jnp.stack(
        [jnp.zeros_like(o[..., 0]), jnp.zeros_like(o[..., 0]), z_b + R],
        axis=-1,
    )
    oc = o - center
    b = 2.0 * jnp.sum(oc * d, axis=-1)
    cc = jnp.sum(oc * oc, axis=-1) - R * R
    disc = b * b - 4.0 * cc  # a = |d|^2 = 1
    sq = _safe_sqrt(disc)
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
    cos_t = _safe_sqrt(1.0 - sin2_t)
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


from functools import partial

# event kinds for the table-driven batched trace
_EV_T, _EV_R, _EV_AP, _EV_NOOP = 0, 1, 2, 3


def build_event_table(pairs, n_interfaces: int, aperture_index: int):
    """Static per-ghost surface-event tables, padded to a common length.

    Returns numpy (surf, kind, bwd) each (G, E) for the G = len(pairs)
    ghosts: the same event sequences :func:`trace_ghost_stack` unrolls in
    Python, encoded as data so a single ``lax.scan`` step can execute every
    ghost in lockstep (one compiled step instead of 39 unrolled traces).
    """
    import numpy as _np

    rows = []
    for i, j in pairs:
        ev = []
        for k in range(0, j + 1):
            ev.append((k, _EV_R if k == j else _EV_T, 0))
        for k in range(j - 1, i - 1, -1):
            ev.append((k, _EV_R if k == i else _EV_T, 1))
        for k in range(i + 1, n_interfaces):
            ev.append((k, _EV_T, 0))
        ev = [
            (k, _EV_AP if (k == aperture_index and kd == _EV_T) else kd, bw)
            for k, kd, bw in ev
        ]
        rows.append(ev)
    n_ev = max(len(r) for r in rows)
    surf = _np.zeros((len(rows), n_ev), _np.int32)
    kind = _np.full((len(rows), n_ev), _EV_NOOP, _np.int32)
    bwd = _np.zeros((len(rows), n_ev), _np.int32)
    for g, ev in enumerate(rows):
        for e, (k, kd, bw) in enumerate(ev):
            surf[g, e], kind[g, e], bwd[g, e] = k, kd, bw
    return surf, kind, bwd


def trace_ghosts_batched(lens: LensPrescription, o, d, colors, surf, kind, bwd):
    """Table-driven batched ghost trace: scan over events, all ghosts in lockstep.

    o, d: (G, N, 3); colors: (G,) int32 wavelength per ghost; surf/kind/bwd:
    (G, E) int32 event tables from :func:`build_event_table`.  Returns
    :class:`StackTrace` with xy (G, N, 2) and energy (G, N).  Semantics are
    identical to per-pair :func:`trace_ghost_stack` (tested equal); this
    form compiles one scan step instead of G unrolled traces.
    """
    zs = surface_z(lens)  # (N_int + 1,)
    n_int = lens.num_interfaces
    # ior_ext[c, k] = index of the medium BEFORE interface k (air for k = 0),
    # so (n1, n2) across interface k forward is (ior_ext[k], ior_ext[k+1])
    ior_ext = jnp.concatenate([jnp.ones((3, 1), lens.iors.dtype), lens.iors], axis=1)
    iors_g = ior_ext[colors]  # (G, N_int + 1)

    energy = jnp.ones(o.shape[:-1], o.dtype)
    valid = jnp.ones(o.shape[:-1], bool)

    def step(carry, ev):
        o, d, energy, valid = carry
        k, kd, bw = ev  # (G,) each
        zk = zs[k][:, None]  # (G, 1)
        ck = lens.curvatures[k][:, None]
        t, n, ok = _intersect_surface(o, d, zk, ck)
        p = o + d * t[..., None]

        is_refl = (kd == _EV_R)[:, None]
        is_ap = (kd == _EV_AP)[:, None]
        is_noop = (kd == _EV_NOOP)[:, None]

        r2 = p[..., 0] ** 2 + p[..., 1] ** 2
        ap_ok = r2 <= lens.aperture_height ** 2

        n1 = jnp.take_along_axis(iors_g, k[:, None], axis=1)  # (G, 1)
        n2 = jnp.take_along_axis(iors_g, k[:, None] + 1, axis=1)
        bwd_g = (bw == 1)[:, None]
        n1, n2 = (
            jnp.where(bwd_g, n2, n1),
            jnp.where(bwd_g, n1, n2),
        )

        cos_i = -jnp.sum(d * n, axis=-1)
        R = fresnel_dielectric(cos_i, n1, n2)
        d_refr, ok_r = _refract(d, n, jnp.broadcast_to(n1 / n2, cos_i.shape))
        d_refl = _reflect(d, n)

        new_d = jnp.where(
            (is_ap | is_noop)[..., None],
            d,
            jnp.where(is_refl[..., None], d_refl, d_refr),
        )
        gain = jnp.where(is_refl, R, jnp.where(is_ap, ap_ok, 1.0 - R))
        new_energy = jnp.where(is_noop, energy, energy * gain)
        ev_ok = ok & jnp.where(
            is_ap, ap_ok, jnp.where(is_refl, True, ok_r)
        )
        new_valid = valid & (is_noop | ev_ok)
        new_o = jnp.where(is_noop[..., None], o, p)
        return (new_o, new_d, new_energy, new_valid), None

    events = (surf.T, kind.T, bwd.T)  # (E, G) each, scanned over E
    (o, d, energy, valid), _ = jax.lax.scan(step, (o, d, energy, valid), events)

    # propagate to the sensor plane
    z_sensor = zs[n_int]
    t = (z_sensor - o[..., 2]) / jnp.where(jnp.abs(d[..., 2]) < 1e-12, 1e-12, d[..., 2])
    p = o + d * t[..., None]
    valid = valid & (t > 0)
    return StackTrace(xy=p[..., :2], energy=energy * valid.astype(energy.dtype))


@partial(jax.jit, static_argnames=("width", "height", "pupil_samples", "pairs"))
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
    pairs: tuple | None = None,  # static subset override (tests)
):
    """Physically-based ghost buffer (one jitted device program).

    The 13 reflection pairs are unrolled statically (each has its own
    surface-event sequence), vmapped over the 3 wavelengths, and all
    39 x pupil_samples^2 x 4 bilinear taps land in ONE scatter-add —
    the eager per-ghost ``.at[].add`` loop this replaces cost seconds of
    host dispatch per frame.  ``sensor_scale`` maps sensor units to pixels
    (the paraxial pipeline's shift factor 0.4 is the visual reference
    point).  Returns (H, W, 3); differentiable w.r.t. the prescription
    (the bilinear hat gives position gradients).
    """
    import numpy as _np

    if pairs is None:
        pairs = reference_ghost_pairs()

    # collimated beam from the sun: meridional angle, rotated by screen angle
    sin_t = jnp.sin(angle_to_sun)
    cos_t = jnp.cos(angle_to_sun)
    d0 = jnp.stack([sin_t, jnp.zeros_like(sin_t), cos_t])

    # static pupil grid + disc mask (the traced int() this replaces broke jit)
    lin = _np.linspace(-1.0, 1.0, pupil_samples)
    gx, gy = _np.meshgrid(lin, lin)
    in_disc = (gx**2 + gy**2 <= 1.0).reshape(-1)
    n_rays = int(in_disc.sum())
    disc = jnp.asarray(in_disc, jnp.float32)
    o0 = jnp.stack(
        [
            jnp.asarray(gx.reshape(-1), jnp.float32) * lens.marginal_r,
            jnp.asarray(gy.reshape(-1), jnp.float32) * lens.marginal_r,
            jnp.full(gx.size, -1.0, jnp.float32),
        ],
        axis=-1,
    )
    d = jnp.broadcast_to(d0, o0.shape)

    gb_x = jnp.ceil(axis_ray[0] * width)
    gb_y = jnp.ceil(axis_ray[1] * height)
    screen_angle = jnp.arctan((axis_ray[1] - 0.5) / (axis_ray[0] - 0.5))
    ca, sa = jnp.cos(screen_angle), jnp.sin(screen_angle)

    # one ghost per (pair, color): event tables are static data, the trace
    # is a single lax.scan over events with all G ghosts in lockstep
    surf, kind, bwd = build_event_table(
        list(pairs), lens.num_interfaces, lens.aperture_index
    )
    surf = _np.repeat(surf, 3, axis=0)
    kind = _np.repeat(kind, 3, axis=0)
    bwd = _np.repeat(bwd, 3, axis=0)
    colors_g = jnp.asarray(_np.tile(_np.arange(3), len(pairs)), jnp.int32)  # (G,)
    n_ghosts = len(pairs) * 3
    tr = trace_ghosts_batched(
        lens,
        jnp.broadcast_to(o0, (n_ghosts,) + o0.shape),
        jnp.broadcast_to(d, (n_ghosts,) + d.shape),
        colors_g,
        jnp.asarray(surf),
        jnp.asarray(kind),
        jnp.asarray(bwd),
    )
    XY = tr.xy  # (G, N, 2)
    EN = tr.energy  # (G, N)

    # rotate the sensor pattern into the sun's screen direction
    fx = gb_x + (ca * XY[..., 0] - sa * XY[..., 1]) * sensor_scale
    fy = gb_y + (sa * XY[..., 0] + ca * XY[..., 1]) * sensor_scale
    w = EN * disc * (intensity / n_rays)  # (G, N)
    ch = jnp.broadcast_to(colors_g[:, None], EN.shape)

    # bilinear splat: all (G, N, 4) taps in one scatter-add
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    idxs, vals = [], []
    for dx_o in (0, 1):
        for dy_o in (0, 1):
            xi = (x0 + dx_o).astype(jnp.int32)
            yi = (y0 + dy_o).astype(jnp.int32)
            wgt = (1 - jnp.abs(fx - (x0 + dx_o))) * (1 - jnp.abs(fy - (y0 + dy_o)))
            inb = (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
            flat = jnp.clip(yi * width + xi, 0, height * width - 1) * 3 + ch
            idxs.append(flat.reshape(-1))
            vals.append((w * wgt * inb.astype(w.dtype)).reshape(-1))
    buf = jnp.zeros(height * width * 3).at[jnp.concatenate(idxs)].add(
        jnp.concatenate(vals)
    )

    return buf.reshape(height, width, 3) * jnp.asarray(radiance)
