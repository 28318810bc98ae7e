"""Batched light sampling (``src/scene/light.cpp`` semantics).

Light table rows carry a type code; ``sample_light`` evaluates every family
for a (shading-point, light) pair batch and mask-selects — same branch-free
wavefront dispatch as the BSDFs.  The environment light (type LT_ENV) routes
through :mod:`lens_flare_tpu.integrator.envlight` CDF tables.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..scene.build import LT_AREA, LT_HEMISPHERE, LT_POINT, LT_SPOT

LT_ENV = 4
INF = jnp.float32(1e30)

# InfiniteHemisphereLight sampleToWorld (light.cpp:30-33)
_HEMI_S2W = jnp.array([[1.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])


class LightArrays(NamedTuple):
    light_type: jnp.ndarray  # (L,)
    radiance: jnp.ndarray  # (L,3)
    position: jnp.ndarray
    direction: jnp.ndarray
    dim_x: jnp.ndarray
    dim_y: jnp.ndarray
    area: jnp.ndarray
    is_delta: jnp.ndarray


class LightSample(NamedTuple):
    radiance: jnp.ndarray  # (N, 3)
    wi: jnp.ndarray  # (N, 3) world, towards the light
    dist: jnp.ndarray  # (N,)
    pdf: jnp.ndarray  # (N,)


def lights_to_device(table, dtype=jnp.float32) -> LightArrays:
    return LightArrays(
        light_type=jnp.asarray(table.light_type),
        radiance=jnp.asarray(table.radiance, dtype),
        position=jnp.asarray(table.position, dtype),
        direction=jnp.asarray(table.direction, dtype),
        dim_x=jnp.asarray(table.dim_x, dtype),
        dim_y=jnp.asarray(table.dim_y, dtype),
        area=jnp.asarray(table.area, dtype),
        is_delta=jnp.asarray(table.is_delta),
    )


def sample_light(lights: LightArrays, li, p, u, env=None):
    """sample_L for light index batch li (N,), points p (N,3), uniforms u (N,2).

    Returns a LightSample; env is the optional EnvLightArrays for LT_ENV rows.
    """
    lt = lights.light_type[li]
    rad = lights.radiance[li]

    # directional (light.cpp:19-24): wi = dirToLight, dist = inf, pdf = 1
    wi_dir = lights.direction[li]

    # point (light.cpp:51-58)
    d_point = lights.position[li] - p
    dist_point = jnp.linalg.norm(d_point, axis=-1)
    wi_point = d_point / jnp.maximum(dist_point[..., None], 1e-30)

    # area (light.cpp:76-94)
    uv = u - 0.5
    d_area = (
        lights.position[li]
        + uv[..., 0:1] * lights.dim_x[li]
        + uv[..., 1:2] * lights.dim_y[li]
        - p
    )
    cos_theta = jnp.sum(d_area * lights.direction[li], axis=-1)
    sq_dist = jnp.sum(d_area * d_area, axis=-1)
    dist_area = jnp.sqrt(sq_dist)
    wi_area = d_area / jnp.maximum(dist_area[..., None], 1e-30)
    pdf_area = sq_dist / jnp.maximum(lights.area[li] * jnp.abs(cos_theta), 1e-30)
    rad_area = jnp.where((cos_theta < 0)[..., None], rad, 0.0)

    # infinite hemisphere (light.cpp:36-43): uniform hemisphere about +y world
    xi1, xi2 = u[..., 0], u[..., 1]
    theta = jnp.arccos(jnp.clip(xi1, -1.0, 1.0))
    phi = 2.0 * jnp.pi * xi2
    local = jnp.stack(
        [jnp.sin(theta) * jnp.cos(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(theta)],
        axis=-1,
    )
    wi_hemi = local @ _HEMI_S2W.T

    # spot (proper implementation of the reference stub, light.cpp:63-71):
    # point-light geometry, radiance scaled by a smooth cone falloff
    cos_cone = lights.dim_x[li][..., 0]
    fall_exp = lights.dim_x[li][..., 1]
    cos_dir = jnp.sum(-wi_point * lights.direction[li], axis=-1)
    spot_scale = jnp.clip(
        (cos_dir - cos_cone) / jnp.maximum(1.0 - cos_cone, 1e-6), 0.0, 1.0
    ) ** jnp.maximum(fall_exp, 1e-6)
    rad_spot = rad * spot_scale[..., None]

    wi = wi_dir
    wi = jnp.where((lt == LT_POINT)[..., None], wi_point, wi)
    wi = jnp.where((lt == LT_SPOT)[..., None], wi_point, wi)
    wi = jnp.where((lt == LT_AREA)[..., None], wi_area, wi)
    wi = jnp.where((lt == LT_HEMISPHERE)[..., None], wi_hemi, wi)

    dist = jnp.full(p.shape[:-1], INF)
    dist = jnp.where(lt == LT_POINT, dist_point, dist)
    dist = jnp.where(lt == LT_SPOT, dist_point, dist)
    dist = jnp.where(lt == LT_AREA, dist_area, dist)

    pdf = jnp.ones(p.shape[:-1])
    pdf = jnp.where(lt == LT_AREA, pdf_area, pdf)
    pdf = jnp.where(lt == LT_HEMISPHERE, 1.0 / (2.0 * jnp.pi), pdf)

    out_rad = rad
    out_rad = jnp.where((lt == LT_AREA)[..., None], rad_area, out_rad)
    out_rad = jnp.where((lt == LT_SPOT)[..., None], rad_spot, out_rad)

    if env is not None:
        from . import envlight

        es = envlight.sample_env(env, u)
        is_env = lt == LT_ENV
        wi = jnp.where(is_env[..., None], es.wi, wi)
        pdf = jnp.where(is_env, es.pdf, pdf)
        out_rad = jnp.where(is_env[..., None], es.radiance, out_rad)
        dist = jnp.where(is_env, INF, dist)

    return LightSample(radiance=out_rad, wi=wi, dist=dist, pdf=pdf)
