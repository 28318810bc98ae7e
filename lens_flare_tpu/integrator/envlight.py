"""Equirect environment light: importance sampling + miss-shader lookup.

Re-design of ``src/scene/environment_light.cpp``: the luminance * sin(theta)
pdf grid, marginal-y CDF and per-row conditional-x CDFs are built with array
ops (cumsum) instead of loops, inversion uses ``searchsorted``, and the miss
lookup is the same robust wrap-around bilerp (environment_light.cpp:123-140).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

INF = jnp.float32(1e30)


class EnvLightArrays(NamedTuple):
    data: jnp.ndarray  # (H, W, 3) radiance
    pdf_map: jnp.ndarray  # (H, W) normalized pdf
    marginal_y: jnp.ndarray  # (H,) inclusive CDF over rows
    conds_y: jnp.ndarray  # (H, W) inclusive CDF within each row


class EnvSample(NamedTuple):
    radiance: jnp.ndarray
    wi: jnp.ndarray
    pdf: jnp.ndarray


def build_env(envmap: np.ndarray) -> EnvLightArrays:
    """CDF construction (environment_light.cpp:18-67)."""
    data = np.asarray(envmap, np.float64)
    h, w = data.shape[:2]
    lum = 0.2126 * data[..., 0] + 0.7152 * data[..., 1] + 0.0722 * data[..., 2]
    j = np.arange(h)
    pdf = lum * np.sin(np.pi * (j[:, None] + 0.5) / h)
    pdf /= pdf.sum()
    marginal_y = np.cumsum(pdf.sum(axis=1))
    row_sums = pdf.sum(axis=1, keepdims=True)
    conds_y = np.cumsum(pdf / np.maximum(row_sums, 1e-300), axis=1)
    return EnvLightArrays(
        data=jnp.asarray(data, jnp.float32),
        pdf_map=jnp.asarray(pdf, jnp.float32),
        marginal_y=jnp.asarray(marginal_y, jnp.float32),
        conds_y=jnp.asarray(conds_y, jnp.float32),
    )


def save_probability_debug(env: EnvLightArrays, path="probability_debug.png") -> None:
    """CDF debug image (environment_light.cpp:71-86): R = marginal, G = conditional."""
    import numpy as np

    from ..utils.image import save_png

    h, w = env.pdf_map.shape
    img = np.zeros((h, w, 3), np.float32)
    img[..., 0] = np.asarray(env.marginal_y)[:, None]
    img[..., 1] = np.asarray(env.conds_y)
    save_png(path, np.clip(img, 0, 1))


def sample_env(env: EnvLightArrays, u) -> EnvSample:
    """Importance sample (environment_light.cpp:143-171). u: (N,2)."""
    h, w = env.pdf_map.shape
    y = jnp.searchsorted(env.marginal_y, u[..., 1], side="right")
    y = jnp.clip(y, 0, h - 1)
    rows = env.conds_y[y]  # (N, W)
    x = jnp.sum(rows <= u[..., 0:1], axis=-1)  # upper_bound per row
    x = jnp.clip(x, 0, w - 1)

    theta = y.astype(jnp.float32) / h * jnp.pi
    phi = x.astype(jnp.float32) / w * 2.0 * jnp.pi
    wi = theta_phi_to_dir(theta, phi)
    pdf = (
        env.pdf_map[y, x]
        * (w * h)
        / (2.0 * jnp.pi * jnp.pi * jnp.maximum(jnp.sin(theta), 1e-6))
    )
    return EnvSample(radiance=env.data[y, x], wi=wi, pdf=pdf)


def sample_dir(env: EnvLightArrays, d) -> jnp.ndarray:
    """Miss-shader radiance lookup (environment_light.cpp:173-182). d: (N,3) unit."""
    theta, phi = dir_to_theta_phi(d)
    h, w = env.pdf_map.shape
    x = phi / (2.0 * jnp.pi) * w
    y = theta / jnp.pi * h
    return bilerp(env.data, x, y)


def dir_to_theta_phi(d):
    unit = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-30)
    theta = jnp.arccos(jnp.clip(unit[..., 1], -1.0, 1.0))
    phi = jnp.arctan2(-unit[..., 2], unit[..., 0]) + jnp.pi
    return theta, phi


def theta_phi_to_dir(theta, phi):
    y = jnp.cos(theta)
    x = jnp.cos(phi - jnp.pi) * jnp.sin(theta)
    z = -jnp.sin(phi - jnp.pi) * jnp.sin(theta)
    return jnp.stack([x, y, z], axis=-1)


def bilerp(data, x, y):
    """Wrap-around bilerp matching environment_light.cpp:123-140."""
    h, w = data.shape[:2]
    right = jnp.round(x).astype(jnp.int32)
    v = jnp.round(y).astype(jnp.int32)
    u1 = right.astype(jnp.float32) - x + 0.5
    wrap = (right == 0) | (right == w)
    left = jnp.where(wrap, w - 1, right - 1)
    right = jnp.where(right == w, 0, right)

    v_lo = v == 0
    v_hi = v == h
    v1 = jnp.where(v_lo, 0.0, jnp.where(v_hi, 0.0, v.astype(jnp.float32) - y + 0.5))
    # reference: if v==0 -> v=1, v1=1; if v==h -> v=h-1, v1=0
    v1 = jnp.where(v_lo, 1.0, v1)
    v = jnp.where(v_lo, 1, jnp.where(v_hi, h - 1, v))

    top = v - 1
    bottom = v
    u0 = 1.0 - u1
    c_tl = data[top, left]
    c_tr = data[top, right]
    c_bl = data[bottom, left]
    c_br = data[bottom, right]
    u1e = u1[..., None]
    u0e = u0[..., None]
    v1e = v1[..., None]
    return (c_tl * u1e + c_tr * u0e) * v1e + (c_bl * u1e + c_br * u0e) * (1.0 - v1e)
