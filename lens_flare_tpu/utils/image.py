"""Image buffers and IO.

TPU-native equivalents of the reference's image machinery
(``src/util/image.h``, vendored lodepng): the HDR film is a plain
``(H, W, 3)`` float array; LDR conversion is the reference's fixed
gamma-2.2 / exposure transform (``image.h:208-223``) expressed as an
array op, and PNG IO goes through PIL instead of lodepng.
"""

from __future__ import annotations

import numpy as np

GAMMA = 2.2
LEVEL = 1.0
# exposure = sqrt(2^level), image.h:212-213
EXPOSURE = float(np.sqrt(2.0 ** LEVEL))

# Rec.601 luma weights used by CGL's Color::illum() / Vector3D::illum().
ILLUM_WEIGHTS = np.array([0.2126, 0.7152, 0.0722], dtype=np.float64)


def illum(rgb):
    """Luminance, matching ``Vector3D::illum()``."""
    import numpy as xp

    rgb = xp.asarray(rgb)
    return rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722


def to_color(hdr):
    """HDR film -> [0,1] LDR, matching ``HDRImageBuffer::toColor`` (image.h:208-223).

    out = clamp((c * exposure) ** (1/gamma), 0, 1) with gamma=2.2, exposure=sqrt(2).
    Works on NumPy or JAX arrays (pure function of the input namespace).
    """
    xp = _namespace_of(hdr)
    scaled = xp.maximum(hdr * EXPOSURE, 0.0)
    return xp.clip(scaled ** (1.0 / GAMMA), 0.0, 1.0)


def tonemap(hdr, gamma=GAMMA, level=1.0, key=0.18, wht=5.0):
    """Global Reinhard-style tonemap, matching ``HDRImageBuffer::tonemap`` (image.h:176-203)."""
    xp = _namespace_of(hdr)
    lum = illum(hdr)
    avg = xp.exp(xp.mean(xp.log(1e-7 + lum)))
    exposure = xp.sqrt(2.0 ** level)
    s = hdr * (key / avg)
    s = s * (((lum + 1.0) / (wht * wht)) / (lum + 1.0))[..., None]
    return xp.maximum(s * exposure, 0.0) ** (1.0 / gamma)


def _namespace_of(a):
    if type(a).__module__.startswith("jax"):
        import jax.numpy as jnp

        return jnp
    return np


def load_png_gray(path) -> np.ndarray:
    """Load a grayscale aperture/bokeh mask PNG as float (H, W) in [0, 1].

    Matches ``CameraApertureTexture::init`` (camera.h:26-83): only the red
    channel is used, scaled by 1/255.
    """
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 2:
        red = arr
    else:
        red = arr[..., 0]
    if red.dtype == np.uint8:
        return red.astype(np.float32) / 255.0
    if red.dtype == np.uint16:
        return red.astype(np.float32) / 65535.0
    return red.astype(np.float32)


def load_png_rgb(path) -> np.ndarray:
    """Load an RGB PNG as float (H, W, 3) in [0, 1]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img).astype(np.float32) / 255.0


def save_png(path, ldr: np.ndarray) -> None:
    """Save a [0,1] float (H, W, 3) or (H, W) image as 8-bit PNG."""
    from PIL import Image

    arr = np.asarray(ldr)
    arr = np.clip(np.round(arr * 255.0), 0, 255).astype(np.uint8)
    # compress_level=1: PNG stays lossless; zlib level 9 (PIL default 6)
    # costs seconds at 1080p for a few percent smaller file
    Image.fromarray(arr).save(path, compress_level=1)


def save_hdr_png(path, hdr: np.ndarray, flip_y: bool = False) -> None:
    """Gamma-correct an HDR film and save, like ``save_image`` (raytraced_renderer.cpp:717-755).

    Film row 0 is the BOTTOM of the view (sensor y=0 maps to cy=-tan(vFov/2)
    in ``generate_ray``, camera.cpp:278-305 — same formula both frameworks),
    so PNG writers pass ``flip_y=True`` to emit a right-side-up image, the
    exact counterpart of the reference's ``save_image`` y-flip.  Proven
    against the real C++ binary: tests/test_reference_binary.py renders the
    same camera both sides and the PNGs match row-for-row only with the flip
    (an earlier revision believed the film was top-down; the golden test
    falsified that).
    """
    ldr = to_color(np.asarray(hdr))
    if flip_y:
        ldr = ldr[::-1]
    save_png(path, ldr)


def sampling_rate_heatmap(sample_counts: np.ndarray, max_samples: int) -> np.ndarray:
    """Sampling-rate debug image, matching ``save_sampling_rate`` (raytraced_renderer.cpp:757-788).

    Blue (low) -> green (mid) -> red (high) ramp over rate = count/max.
    """
    rate = np.asarray(sample_counts, dtype=np.float32) / float(max_samples)
    h, w = rate.shape
    out = np.zeros((h, w, 3), dtype=np.float32)
    lo = rate <= 0.5
    out[..., 0] = np.where(lo, 0.0, (rate - 0.5) * 2.0)
    out[..., 1] = np.where(lo, rate * 2.0, 1.0 - (rate - 0.5) * 2.0)
    out[..., 2] = np.where(lo, 1.0 - rate * 2.0, 0.0)
    return np.clip(out, 0.0, 1.0)
