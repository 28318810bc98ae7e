"""Honest device timing through the axon TPU tunnel.

``jax.block_until_ready`` does NOT synchronize through the tunnel (measured:
a 10x 8192^3 bf16 matmul loop "completes" in 0.3 ms — 36,000 TFLOP/s, ~90x
the v5e peak).  Only a device->host read of result bytes truly waits for the
device, and that read costs a ~25 ms round trip which would swamp ms-scale
kernels.  ``timeit`` therefore uses the k-difference method:

    time(k runs + tiny fetch) = tunnel_overhead + k * t_device

on the TPU's serial compute stream, so

    t_device = (time(k2) - time(k1)) / (k2 - k1)

and the constant fetch overhead cancels.  Dispatching a repeated same-input
call is cheap (~40 us measured), so the device stays busy between runs for
any kernel longer than that.

Validated against known chip peaks (tools/roofline.py calibration): an
8192^3 bf16 matmul measures 183 TFLOP/s (93% of the v5e's 197) and a 256 MB
f32 copy+scale 558 GB/s (68% of the 819 GB/s HBM peak).
"""

from __future__ import annotations

import time

import jax
import numpy as np


def fetch_scalar(out):
    """Force device completion with a 4-byte device->host read."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(leaf.ravel()[:1])


def timeit(fn, *args, runs=8):
    """Median-free min-of-3 per-call device seconds via the k-difference.

    A short kernel under the ~10-20% tunnel jitter can yield d2 <= d1;
    silently flooring that to 1e-9 reports absurd throughput — exactly the
    mis-measurement class this tool exists to eliminate.  Instead the run
    count is grown (x4, up to two retries) until the k-difference clears
    the observed jitter; if it never does, a warning is raised.
    """
    fetch_scalar(fn(*args))  # compile + warmup

    def run_k(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        fetch_scalar(out)
        return time.perf_counter() - t0

    k2 = 1 + runs
    for attempt in range(3):
        d1_samples = [run_k(1) for _ in range(3)]
        d2_samples = [run_k(k2) for _ in range(3)]
        d1, d2 = min(d1_samples), min(d2_samples)
        diff = d2 - d1
        # require the difference to clear the run-to-run spread of the
        # baseline measurement, else the kernel is too short for this k2
        jitter = max(max(d1_samples) - d1, max(d2_samples) - d2)
        if diff > jitter:
            return diff / (k2 - 1)
        if attempt < 2:
            k2 = 1 + (k2 - 1) * 4
    import warnings

    warnings.warn(
        f"timeit: k-difference ({diff * 1e6:.1f} us) never cleared measured "
        f"jitter ({jitter * 1e6:.1f} us) even at k={k2}; result unreliable"
    )
    return max(diff / (k2 - 1), 1e-9)
