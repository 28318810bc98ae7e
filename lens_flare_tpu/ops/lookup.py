"""TPU-friendly table lookups.

XLA lowers a row gather ``table[ids]`` (ids (N,), table (B, C)) to a
scalar-core gather loop on TPU — measured ~2.2 ms for a 786k-lane NEE
wavefront against an 8-row material table (tools: /tmp micro-bench, v5e),
which made table lookups the single largest cost of ``direct_lighting``.
The MXU-native form is a one-hot matmul: build (N, B) one-hot rows and
multiply into the table — ~0.19 ms for the same shape, >10x faster, and
bit-exact (each output row receives exactly one nonzero product; the
HIGHEST-precision 6-pass bf16 matmul reconstructs f32 products of 1.0 *
value exactly).

1-D gathers (``vec[ids]``) lower fine on TPU and are left alone.  Row
gathers from *large* tables (the (N_tris, 10) shading table of a 500k-tri
scene) would need an (N, T) one-hot — worse than the gather — so lookups
fall back to plain indexing above ``max_rows``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# one-hot beats the scalar gather comfortably up to a few hundred rows
# (cost grows linearly in B; the gather is ~flat); beyond that fall back
MAX_ONEHOT_ROWS = 512


def row_lookup(table, ids, max_rows: int = MAX_ONEHOT_ROWS):
    """``table[ids]`` for a 2-D table (B, C) and integer ids (N,).

    Uses a one-hot MXU matmul when B <= max_rows (bit-exact, see module
    docstring), else the plain gather.  Out-of-range ids are the caller's
    contract, same as indexing (one-hot simply yields a zero row).
    """
    b = table.shape[0]
    if b > max_rows or table.ndim != 2:
        return table[ids]
    onehot = (ids[:, None] == jnp.arange(b, dtype=ids.dtype)).astype(table.dtype)
    return jax.lax.dot_general(
        onehot,
        table,
        (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=table.dtype,
    )


def rows_lookup(ids, *tables, max_rows: int = MAX_ONEHOT_ROWS):
    """Look up the same ids in several (B, C_i) tables with ONE matmul.

    The tables are concatenated column-wise (they share the row count), so
    the one-hot matrix is built and multiplied once; results are split back
    per table.  Falls back to per-table gathers above ``max_rows``.
    """
    b = tables[0].shape[0]
    if b > max_rows or any(t.ndim != 2 or t.shape[0] != b for t in tables):
        return tuple(t[ids] for t in tables)
    cat = jnp.concatenate(tables, axis=1)
    out = row_lookup(cat, ids, max_rows=max_rows)
    parts = []
    c0 = 0
    for t in tables:
        parts.append(out[:, c0 : c0 + t.shape[1]])
        c0 += t.shape[1]
    return tuple(parts)
