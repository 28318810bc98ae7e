"""Benchmark: Mrays/s on one chip for the flagship lens-flare render.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no numbers (BASELINE.md) — ``vs_baseline`` is the
ratio against a recorded single-thread C++-equivalent CPU figure measured in
this repo (see BASELINE_CPU_MRAYS below), the closest stand-in for the
reference's own per-run Mrays/s printout.
"""

import json
import time

import numpy as np

# The reference prints Mrays/s per run but records none.  This constant is a
# measured stand-in: the NumPy oracle tracer (same brute-force semantics as
# the single-threaded C++ inner loop) on this machine's CPU, ~0.4 Mrays/s for
# pyramid.dae primary+shadow rays.  Updated when the C++ binary is buildable.
BASELINE_CPU_MRAYS = 0.4


def main():
    import jax
    import jax.numpy as jnp

    from lens_flare_tpu.renderer import Renderer

    width, height, spp = 480, 360, 4
    r = Renderer(
        width=width,
        height=height,
        ns_aa=spp,
        max_ray_depth=2,
        ns_area_light=1,
        indirect=True,
        tile_pixels=width * height,
        seed=0,
    )
    r.load("/root/reference/dae/pyramid.dae")

    from lens_flare_tpu.integrator.path import render_wavefront

    cam = r.camera.params()
    key = jax.random.PRNGKey(0)
    ys, xs = np.mgrid[0:height, 0:width]
    px = jnp.asarray(xs.ravel())
    py = jnp.asarray(ys.ravel())

    fn = jax.jit(
        lambda px, py: render_wavefront(r.bundle, r.settings, cam, px, py, width, height, key)
    )
    # warmup / compile
    rad, cnt = fn(px, py)
    jax.block_until_ready(rad)

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        rad, cnt = fn(px, py)
    jax.block_until_ready(rad)
    dt = (time.perf_counter() - t0) / runs

    total_samples = int(np.asarray(cnt).sum())
    # rays per sample: primary + NEE shadow per vertex + expected RR bounces
    nee = r.settings.total_light_samples
    expect_bounces = sum(0.7 ** k for k in range(1, r.max_ray_depth))
    rays_per_sample = (1 + nee) * (1 + expect_bounces)
    total_rays = total_samples * rays_per_sample
    mrays = total_rays / dt / 1e6

    print(
        json.dumps(
            {
                "metric": "pyramid_pathtrace_mrays_per_s_per_chip",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / BASELINE_CPU_MRAYS, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
