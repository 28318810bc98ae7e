"""NumPy oracles for the lens-flare pipeline (brute-force, reference-faithful).

Direct transcriptions of the reference math (NOT used in production paths —
only as test oracles): per-pixel DFT starburst (pathtracer.cpp:947-1041),
paraxial ghost matrix chains (pathtracer.cpp:511-689), and the scanline
ghost rasterizer (pathtracer.cpp:305-508).
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# starburst (brute-force DFT, pathtracer.cpp:947-1041)
# ---------------------------------------------------------------------------


def convert_coordinate(pixel_coord, length, is_y):
    if is_y:
        cc = -float(pixel_coord) + length / 2.0
    else:
        cc = float(pixel_coord) - length / 2.0
    return cc if cc >= 0 else length + cc


def starburst_pixel(
    aperture, total_value, bbox, x, y, width, height, flare_origin_ns,
    flare_radiances, flare_intensity=0.0, flare_radius=0.0,
):
    """Brute-force starburst radiance at pixel (x, y). aperture: (H_a, W_a)."""
    min_x, min_y, max_x, max_y = bbox
    ap_w = aperture.shape[1]

    xp = convert_coordinate(x, width, False)
    yp = convert_coordinate(y, height, True)

    lr = math.ceil(flare_origin_ns[0] * width)
    ud = math.ceil(flare_origin_ns[1] * height)
    lr_c = lr - width / 2.0
    ud_c = -ud + height / 2.0

    total = 0j
    for yc in range(min_y, max_y + 1):
        for xc in range(min_x, max_x + 1):
            a = aperture[yc, xc]
            u = xc / ap_w - 0.5
            v = yc / ap_w - 0.5
            total += (
                a
                * np.exp(2j * np.pi * (u * lr_c + v * ud_c))
                * np.exp(-2j * np.pi * (u * xp + v * yp))
            )

    mag = abs(total) / total_value

    dist = math.hypot(lr - x, ud - y)
    if dist > ap_w / 2.0:
        mag *= (ap_w / 2.0 / dist) ** 8
    elif dist <= flare_radius:
        mag = mag ** (dist / flare_radius)

    intensity = 3.0 - flare_intensity
    if intensity <= 0:
        intensity = 2.0

    out = np.zeros(3)
    for rad in flare_radiances:
        out += (mag ** intensity) * np.asarray(rad)
    return out


# ---------------------------------------------------------------------------
# paraxial ghosts (pathtracer.cpp:511-689)
# ---------------------------------------------------------------------------


def _m(a, b, c, d):
    return np.array([[a, b], [c, d]], dtype=np.float64)


def _T(d):
    return _m(1, d, 0, 1)


def _R(c, n1, n2):
    return _m(1, 0, c * (n1 - n2) / n2, n1 / n2)


def _L(c):
    return _m(1, 0, 2 * c, 1)


class RefLens:
    """The reference's hardcoded lens tables (pathtracer.cpp:539-586)."""

    def __init__(self):
        self.Ts = [_T(d) for d in (7.700, 1.850, 3.520, 1.850, 4.180, 3.000, 1.850, 7.270, 83.91)]
        self.curvatures = [
            1 / 30.810, 1 / -89.350, 1 / 580.380, 1 / -80.630, 1 / 28.340,
            0.0, 0.0, 1 / 32.190, 1 / -52.990, 1 / 81.320,
        ]
        refr = {
            "red": [1.652, 1.5991, 1, 1.6396, 1, 1, 1.5776, 1.68990, 1],
            "green": [1.652, 1.6113, 1, 1.65, 1, 1, 1.5885, 1.6999, 1],
            "blue": [1.652, 1.6164, 1, 1.6542, 1, 1, 1.5930, 1.7040, 1],
        }
        self.Rs = {}
        for color, ns in refr.items():
            arr = []
            prev = 1.0
            for i in range(9):
                arr.append(_R(self.curvatures[i], prev, ns[i]))
                prev = ns[i]
            self.Rs[color] = arr
        self.Ls = [_L(self.curvatures[i]) for i in range(9)]


def trace_ray_before(lens: RefLens, r, theta, i, j, color):
    Rc = lens.Rs[color]
    ray = np.array([r, theta], dtype=np.float64)
    M = np.eye(2)
    for k in range(j):
        M = lens.Ts[k] @ Rc[k] @ M
    M = lens.Ls[j] @ M
    for k in range(j - 1, i, -1):
        M = np.linalg.inv(Rc[k]) @ lens.Ts[k] @ M
    M = lens.Ts[i] @ np.linalg.inv(lens.Ls[i]) @ lens.Ts[i] @ M
    for k in range(i + 1, 9):
        if k == 5:
            after = M @ ray
            if after[0] > 11.6 or after[0] < -11.6:
                r_a = 11.6 if r >= 0 else -11.5
                r_e = (r_a - M[0, 1] * theta) / M[0, 0]
                ray = np.array([r_e, theta])
            M = lens.Ts[k] @ M
            continue
        M = lens.Ts[k] @ Rc[k] @ M
    res = M @ ray
    return res


def trace_ray_after(lens: RefLens, r, theta, i, j, color):
    Rc = lens.Rs[color]
    ray = np.array([r, theta], dtype=np.float64)
    M = np.eye(2)
    for k in range(j):
        if k == 5:
            after = M @ ray
            if after[0] > 11.6 or after[0] < -11.6:
                r_a = 11.6 if r >= 0 else -11.5
                r_e = (r_a - M[0, 1] * theta) / M[0, 0]
                ray = np.array([r_e, theta])
            M = lens.Ts[k] @ M
            continue
        M = lens.Ts[k] @ Rc[k] @ M
    M = lens.Ls[j] @ M
    for k in range(j - 1, i, -1):
        M = np.linalg.inv(Rc[k]) @ lens.Ts[k] @ M
    M = lens.Ts[i] @ np.linalg.inv(lens.Ls[i]) @ lens.Ts[i] @ M
    for k in range(i + 1, 9):
        M = lens.Ts[k] @ Rc[k] @ M
    res = M @ ray
    return res


# ---------------------------------------------------------------------------
# ghost rasterizer (pathtracer.cpp:305-508)
# ---------------------------------------------------------------------------


def shift_vertex(x, y, scale, shift_amount, axis_ray):
    angle = math.atan((axis_ray[1] - 0.5) / (axis_ray[0] - 0.5))
    sx, sy = scale * x, scale * y
    rx = math.cos(angle) * sx - math.sin(angle) * sy + shift_amount * math.cos(angle)
    ry = math.sin(angle) * sx + math.cos(angle) * sy + shift_amount * math.sin(angle)
    return rx, ry


def fill_textured_pixel(tex, buf, tri, x, y, color):
    (x0, y0, u0, v0), (x1, y1, u1, v1), (x2, y2, u2, v2) = tri
    den_a = -(y1 - y0) * (x2 - x0) + (x1 - x0) * (y2 - y0)
    alpha = (-(y1 - y0) * (x - x0) + (x1 - x0) * (y - y0)) / den_a
    den_b = -(y2 - y1) * (x0 - x1) + (x2 - x1) * (y0 - y1)
    beta = (-(y2 - y1) * (x - x1) + (x2 - x1) * (y - y1)) / den_b
    gamma = 1 - alpha - beta
    if gamma >= 0 and alpha >= 0 and beta >= 0:
        u = u2 * alpha + u0 * beta + u1 * gamma
        v = v2 * alpha + v0 * beta + v1 * gamma
        h_a, w_a = tex.shape
        idx = int(math.floor(v) * w_a + u)
        idx = min(max(idx, 0), h_a * w_a - 1)
        sample = tex.reshape(-1)[idx]
        buf[y, x] += sample * np.asarray(color)


def rasterize_textured_triangle(tex, buf, verts, color):
    """verts: list of (x, y, u, v)."""
    v = sorted(range(3), key=lambda i: 0)  # placeholder for clarity
    v = list(verts)
    if v[1][1] < v[0][1]:
        v[0], v[1] = v[1], v[0]
    if v[2][1] < v[0][1]:
        v[0], v[2] = v[2], v[0]
    if v[2][1] < v[1][1]:
        v[1], v[2] = v[2], v[1]
    v = [(x - 0.5, y - 0.5, u, vv) for (x, y, u, vv) in v]
    h, w = buf.shape[:2]
    min_x = max(0, int(math.floor(min(p[0] for p in v))))
    max_x = min(w - 1, int(math.ceil(max(p[0] for p in v))))
    min_y = max(0, int(math.floor(v[0][1])))
    max_y = min(h - 1, int(math.ceil(v[2][1])))
    for y in range(min_y, max_y):
        for x in range(min_x, max_x):
            fill_textured_pixel(tex, buf, v, x, y, color)


def draw_ghost(tex, buf, color_name, r1, r2, axis_ray):
    """draw_ghost (pathtracer.cpp:433-508)."""
    h, w = buf.shape[:2]
    h_a, w_a = tex.shape
    shift_amt = -(r1 + r2) / 2 * 0.4
    scale_amt = abs(r2 - r1) * 0.2
    gb_mid_w = math.ceil(axis_ray[0] * w)
    gb_mid_h = math.ceil(axis_ray[1] * h)

    ul = shift_vertex(-1, 1, scale_amt, shift_amt, axis_ray)
    ll = shift_vertex(-1, -1, scale_amt, shift_amt, axis_ray)
    ur = shift_vertex(1, 1, scale_amt, shift_amt, axis_ray)
    lr = shift_vertex(1, -1, scale_amt, shift_amt, axis_ray)

    color = {"red": [1, 0, 0], "green": [0, 1, 0], "blue": [0, 0, 1]}[color_name]
    color = np.asarray(color, np.float64) * 10.0 / (scale_amt * scale_amt)

    rasterize_textured_triangle(
        tex,
        buf,
        [
            (gb_mid_w + ul[0], gb_mid_h + ul[1], 0, 0),
            (gb_mid_w + ll[0], gb_mid_h + ll[1], 0, h_a),
            (gb_mid_w + ur[0], gb_mid_h + ur[1], w_a, 0),
        ],
        color,
    )
    rasterize_textured_triangle(
        tex,
        buf,
        [
            (gb_mid_w + lr[0], gb_mid_h + lr[1], 0, 0),
            (gb_mid_w + ll[0], gb_mid_h + ll[1], 0, h_a),
            (gb_mid_w + ur[0], gb_mid_h + ur[1], w_a, 0),
        ],
        color,
    )
