"""Batched BSDF evaluation and sampling over the material table.

All 6 reference BSDF families (``bsdf.h:119-288``), with the four stubbed
"advanced" ones (``advanced_bsdf.cpp`` Mirror/Microfacet/Refraction/Glass)
implemented for real per the CS184 spec the stubs were meant to satisfy.

Wavefront dispatch: every family is evaluated for every shading point and the
result selected by ``bsdf_type`` masks — branch-free, so XLA vectorizes the
whole batch (6 families is cheap compared to a gather/scatter regroup).

Conventions (matching the reference):
- directions are in the local shading frame, +z = normal
- ``f(wi_neg, wo)``: the integrator passes wi *negated* (pointing into the
  surface), exactly like ``isect.bsdf->f(-1 * incoming_wi, w_out)`` at
  pathtracer.cpp:201; helpers here flip it back internally
- ``sample_f`` returns (f, wi, pdf) with wi pointing away from the surface
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.lookup import row_lookup, rows_lookup
from ..scene.collada import (
    BSDF_DIFFUSE,
    BSDF_EMISSION,
    BSDF_GLASS,
    BSDF_MICROFACET,
    BSDF_MIRROR,
    BSDF_REFRACTION,
)


class BSDFArrays(NamedTuple):
    bsdf_type: jnp.ndarray  # (B,)
    albedo: jnp.ndarray
    radiance: jnp.ndarray
    reflectance: jnp.ndarray
    transmittance: jnp.ndarray
    eta: jnp.ndarray
    k: jnp.ndarray
    alpha: jnp.ndarray
    roughness: jnp.ndarray
    ior: jnp.ndarray


def bsdf_to_device(table, dtype=jnp.float32) -> BSDFArrays:
    return BSDFArrays(
        bsdf_type=jnp.asarray(table.bsdf_type),
        albedo=jnp.asarray(table.albedo, dtype),
        radiance=jnp.asarray(table.radiance, dtype),
        reflectance=jnp.asarray(table.reflectance, dtype),
        transmittance=jnp.asarray(table.transmittance, dtype),
        eta=jnp.asarray(table.eta, dtype),
        k=jnp.asarray(table.k, dtype),
        alpha=jnp.asarray(table.alpha, dtype),
        roughness=jnp.asarray(table.roughness, dtype),
        ior=jnp.asarray(table.ior, dtype),
    )


def make_coord_space(n):
    """Batched normal frame (bsdf.cpp:21-41). n: (N, 3) -> o2w (N, 3, 3) columns x,y,z."""
    ax = jnp.abs(n)
    # h = n with a 1.0 in the smallest-|component| slot
    smallest = jnp.argmin(ax, axis=-1)
    h = jnp.where(jnp.arange(3) == smallest[..., None], 1.0, n)
    z = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    y = jnp.cross(h, z)
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-30)
    x = jnp.cross(z, y)
    x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-30)
    return jnp.stack([x, y, z], axis=-1)


def world_to_local(o2w, v):
    """(N,3,3), (N,3) -> (N,3): o2w^T @ v."""
    return jnp.einsum("nij,ni->nj", o2w, v)


def local_to_world(o2w, v):
    return jnp.einsum("nij,nj->ni", o2w, v)


def get_emission(bsdfs: BSDFArrays, b):
    """BSDF::get_emission — radiance for emission BSDFs, 0 otherwise."""
    is_em = (bsdfs.bsdf_type[b] == BSDF_EMISSION)[..., None]
    return jnp.where(is_em, row_lookup(bsdfs.radiance, b), 0.0)


def is_delta(bsdfs: BSDFArrays, b):
    t = bsdfs.bsdf_type[b]
    return (t == BSDF_MIRROR) | (t == BSDF_REFRACTION) | (t == BSDF_GLASS)


# ---------------------------------------------------------------------------
# f — evaluation (wi_neg points INTO the surface, reference convention)
# ---------------------------------------------------------------------------


def eval_f(bsdfs: BSDFArrays, b, wi_neg, wo, families=None):
    """Batched BSDF::f(-wi, wo). Returns (N, 3).

    ``families``: optional static collection of the BSDF_* type codes present
    in the scene's material table — absent families are specialized away at
    trace time instead of evaluated-and-masked per lane (the Beckmann
    microfacet path costs exp/rational-G/Fresnel per lane and dominated NEE
    shading on all-diffuse scenes).  None evaluates everything.
    """
    wi = -wi_neg  # usual convention: away from surface
    t = bsdfs.bsdf_type[b]

    f_diffuse = row_lookup(bsdfs.albedo, b) / jnp.pi  # bsdf.cpp:52-61
    f = jnp.where((t == BSDF_DIFFUSE)[..., None], f_diffuse, 0.0)
    if families is None or BSDF_MICROFACET in families:
        eta, k = rows_lookup(b, bsdfs.eta, bsdfs.k)
        f_micro = _microfacet_f(bsdfs.alpha[b], eta, k, wi, wo)
        f = jnp.where((t == BSDF_MICROFACET)[..., None], f_micro, f)
    # emission/mirror/refraction/glass: f = 0 (delta or emitter)
    return f


def _microfacet_f(alpha_rows, eta, k, wi, wo):
    """Beckmann NDF x Smith shadowing x conductor Fresnel (advanced_bsdf.cpp TODOs).

    alpha_rows: (N,) pre-gathered; eta/k: (N, 3) pre-looked-up rows (the
    per-lane row gathers were the cost center — see ops.lookup).
    """
    valid = (wi[..., 2] > 0) & (wo[..., 2] > 0)
    h = wi + wo
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-30)
    alpha = jnp.maximum(alpha_rows, 1e-4)
    cos_h = jnp.clip(h[..., 2], 1e-6, 1.0)
    tan2 = (1.0 - cos_h * cos_h) / (cos_h * cos_h)
    D = jnp.exp(-tan2 / (alpha * alpha)) / (jnp.pi * alpha * alpha * cos_h ** 4)
    G = _smith_g1(wi, alpha) * _smith_g1(wo, alpha)
    F = fresnel_conductor(jnp.abs(wi[..., 2]), eta, k)
    denom = 4.0 * jnp.maximum(wo[..., 2] * wi[..., 2], 1e-6)
    f = F * (G * D / denom)[..., None]
    return jnp.where(valid[..., None], f, 0.0)


def _smith_g1(w, alpha):
    cos_t = jnp.abs(w[..., 2])
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    a = cos_t / jnp.maximum(alpha * sin_t, 1e-12)
    g = (3.535 * a + 2.181 * a * a) / (1.0 + 2.276 * a + 2.577 * a * a)
    return jnp.where((a >= 1.6) | (sin_t == 0.0), 1.0, g)


def fresnel_conductor(cos_i, eta, k):
    """Per-channel conductor Fresnel (CS184 approximation). cos_i: (N,), eta/k: (N,3)."""
    c = cos_i[..., None]
    c2 = c * c
    e2k2 = eta * eta + k * k
    rs = (e2k2 - 2 * eta * c + c2) / (e2k2 + 2 * eta * c + c2)
    rp = (e2k2 * c2 - 2 * eta * c + 1) / (e2k2 * c2 + 2 * eta * c + 1)
    return (rs + rp) / 2


def fresnel_schlick(cos_i, ior):
    """Schlick dielectric reflectance (used by GlassBSDF, CS184 part 1 spec)."""
    r0 = ((1.0 - ior) / (1.0 + ior)) ** 2
    return r0 + (1.0 - r0) * (1.0 - jnp.abs(cos_i)) ** 5


# ---------------------------------------------------------------------------
# sample_f — one importance sample per shading point
# ---------------------------------------------------------------------------


class BSDFSample(NamedTuple):
    f: jnp.ndarray  # (N, 3) BSDF value
    wi: jnp.ndarray  # (N, 3) sampled direction, local frame, away from surface
    pdf: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,) sample usable (e.g. TIR handled, pdf > 0)


def sample_f(bsdfs: BSDFArrays, b, wo, u, families=None):
    """Batched BSDF::sample_f. u: (N, 3) uniforms. Returns BSDFSample.

    u[:, 0:2] drive the direction sample; u[:, 2] picks reflect/refract for
    glass.  ``families``: optional static collection of the BSDF_* codes in
    the scene — absent families are specialized away at trace time (see
    eval_f).  None evaluates everything.
    """

    def has(code):
        return families is None or code in families

    t = bsdfs.bsdf_type[b]
    n = wo.shape[0]

    # per-lane material rows via ONE one-hot matmul (ops.lookup): the
    # per-family row gathers were the bounce-shading cost center on TPU
    need = [bsdfs.albedo]
    if has(BSDF_MIRROR) or has(BSDF_GLASS):
        need.append(bsdfs.reflectance)
    if has(BSDF_REFRACTION) or has(BSDF_GLASS):
        need.append(bsdfs.transmittance)
    if has(BSDF_MICROFACET):
        need.extend([bsdfs.eta, bsdfs.k])
    rows = list(rows_lookup(b, *need))
    albedo = rows.pop(0)
    reflectance = rows.pop(0) if (has(BSDF_MIRROR) or has(BSDF_GLASS)) else None
    transmittance = rows.pop(0) if (has(BSDF_REFRACTION) or has(BSDF_GLASS)) else None
    eta_rows, k_rows = (rows.pop(0), rows.pop(0)) if has(BSDF_MICROFACET) else (None, None)

    # --- diffuse: cosine-weighted hemisphere (sampler.cpp:58-68) ---
    # (also the fallback sample for emission lanes, so always computed)
    xi1, xi2 = u[:, 0], u[:, 1]
    r = jnp.sqrt(xi1)
    phi = 2.0 * jnp.pi * xi2
    z_cos = jnp.sqrt(jnp.maximum(1.0 - xi1, 0.0))
    wi_diff = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z_cos], axis=-1)
    pdf_diff = z_cos / jnp.pi
    f_diff = albedo / jnp.pi
    valid_diff = pdf_diff > 0

    f, wi, pdf, valid = f_diff, wi_diff, pdf_diff, valid_diff

    def sel(code, vec_f, vec_wi, vec_pdf, vec_valid):
        m = t == code
        return (
            jnp.where(_bc(m, vec_f), vec_f, f),
            jnp.where(_bc(m, vec_wi), vec_wi, wi),
            jnp.where(m, vec_pdf, pdf),
            jnp.where(m, vec_valid, valid),
        )

    if has(BSDF_MIRROR) or has(BSDF_GLASS):
        # --- mirror: perfect reflection, f = R / cos so f*cos/pdf = R ---
        wi_mirr = jnp.stack([-wo[:, 0], -wo[:, 1], wo[:, 2]], axis=-1)
        cos_mirr = jnp.maximum(jnp.abs(wi_mirr[:, 2]), 1e-6)
    if has(BSDF_MIRROR):
        f_mirr = reflectance / cos_mirr[:, None]
        valid_mirr = jnp.abs(wo[:, 2]) > 1e-6
        f, wi, pdf, valid = sel(BSDF_MIRROR, f_mirr, wi_mirr, jnp.ones(n), valid_mirr)

    if has(BSDF_REFRACTION) or has(BSDF_GLASS):
        # --- refraction: Snell, f = T / cos / eta^2 ---
        ior = bsdfs.ior[b]
        entering = wo[:, 2] > 0
        eta_ratio = jnp.where(entering, 1.0 / ior, ior)  # eta_i / eta_t
        sin2_t = eta_ratio ** 2 * jnp.maximum(0.0, 1.0 - wo[:, 2] ** 2)
        tir = sin2_t > 1.0
        cos_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - sin2_t))
        wi_refr = jnp.stack(
            [
                -eta_ratio * wo[:, 0],
                -eta_ratio * wo[:, 1],
                jnp.where(entering, -cos_t, cos_t),
            ],
            axis=-1,
        )
        cos_refr = jnp.maximum(jnp.abs(wi_refr[:, 2]), 1e-6)
        f_refr = transmittance / cos_refr[:, None] / (eta_ratio ** 2)[:, None]
    if has(BSDF_REFRACTION):
        f, wi, pdf, valid = sel(
            BSDF_REFRACTION, f_refr, wi_refr, jnp.ones(n), jnp.logical_not(tir)
        )

    if has(BSDF_GLASS):
        # --- glass: Schlick coin flip between reflection and refraction ---
        R = fresnel_schlick(wo[:, 2], bsdfs.ior[b])
        R_eff = jnp.where(tir, 1.0, R)
        choose_reflect = u[:, 2] < R_eff
        f_glass_reflect = R_eff[:, None] * reflectance / cos_mirr[:, None]
        f_glass_refract = (
            (1.0 - R_eff)[:, None]
            * transmittance
            / cos_refr[:, None]
            / (eta_ratio ** 2)[:, None]
        )
        wi_glass = jnp.where(choose_reflect[:, None], wi_mirr, wi_refr)
        f_glass = jnp.where(choose_reflect[:, None], f_glass_reflect, f_glass_refract)
        pdf_glass = jnp.where(choose_reflect, R_eff, 1.0 - R_eff)
        f, wi, pdf, valid = sel(BSDF_GLASS, f_glass, wi_glass, pdf_glass, pdf_glass > 0)

    if has(BSDF_MICROFACET):
        # --- microfacet: Beckmann half-vector importance sampling ---
        alpha = jnp.maximum(bsdfs.alpha[b], 1e-4)
        theta_h = jnp.arctan(
            jnp.sqrt(
                jnp.maximum(-(alpha ** 2) * jnp.log(jnp.maximum(1.0 - xi1, 1e-12)), 0.0)
            )
        )
        phi_h = 2.0 * jnp.pi * xi2
        sin_h, cos_h = jnp.sin(theta_h), jnp.cos(theta_h)
        h = jnp.stack([sin_h * jnp.cos(phi_h), sin_h * jnp.sin(phi_h), cos_h], axis=-1)
        wo_dot_h = jnp.sum(wo * h, axis=-1)
        wi_mf = 2.0 * wo_dot_h[:, None] * h - wo
        # p(theta) = 2 sin / (alpha^2 cos^3) e^{-tan^2/alpha^2}; p(phi) = 1/2pi
        tan2_h = (sin_h / jnp.maximum(cos_h, 1e-6)) ** 2
        p_theta = (
            2.0 * sin_h / (alpha ** 2 * jnp.maximum(cos_h, 1e-6) ** 3)
        ) * jnp.exp(-tan2_h / alpha ** 2)
        p_phi = 1.0 / (2.0 * jnp.pi)
        pdf_h = p_theta * p_phi / jnp.maximum(sin_h, 1e-9)
        pdf_mf = pdf_h / jnp.maximum(4.0 * wo_dot_h, 1e-9)
        valid_mf = (wi_mf[:, 2] > 0) & (wo[:, 2] > 0) & (pdf_mf > 1e-9)
        f_mf = _microfacet_f(bsdfs.alpha[b], eta_rows, k_rows, wi_mf, wo)
        f, wi, pdf, valid = sel(BSDF_MICROFACET, f_mf, wi_mf, pdf_mf, valid_mf)

    if has(BSDF_EMISSION):
        # --- emission: cosine sample, f = 0 (bsdf.cpp:95-101) ---
        is_em = t == BSDF_EMISSION
        f = jnp.where(is_em[..., None], 0.0, f)

    return BSDFSample(f=f, wi=wi, pdf=pdf, valid=valid)


def _bc(mask, like):
    """Broadcast a (N,) mask against (N,) or (N,3)."""
    if like.ndim == mask.ndim:
        return mask
    return mask[..., None]
