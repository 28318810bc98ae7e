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
    """Median-free min-of-3 per-call device seconds via the k-difference."""
    fetch_scalar(fn(*args))  # compile + warmup

    def run_k(k):
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        fetch_scalar(out)
        return time.perf_counter() - t0

    k1, k2 = 1, 1 + runs
    d1 = min(run_k(k1) for _ in range(3))
    d2 = min(run_k(k2) for _ in range(3))
    return max((d2 - d1) / (k2 - k1), 1e-9)
