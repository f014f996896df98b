"""Uniform-grid spatial binning.

Replaces the reference's segmented container + atomic grid build:

* cell mapping & torus wrap — ``set_pos_t`` (``/root/reference/source/code/inc/app.cu:117-158``)
* grid build (cell lists, occupancy maxima, overflow kill) —
  ``particleSystem_build_grid_host`` (``particleSystem.cpp:1468-1537``), which
  uses serialized atomicAdd/atomicMax appends; here it is one stable sort +
  prefix sums, fully deterministic and parallel.

Axis convention (kept bit-for-bit from the reference, ``app.cu:126-128``):

    i1 = floor(-y / cell) + G/2      (row    index)
    i2 = floor( x / cell) + G/2      (column index)
    i3 = floor(-z / cell) + G/2      (plane  index)
    cell_id = i3*G^2 + i1*G + i2

Positions wrap torus-style: the integer cell index is reduced mod G and the
coordinate shifted by the corresponding whole number of box lengths, exactly
as the relocation loop in ``app.cu:132-148`` (a single mod is the fixed point
of that loop).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.config import GridSpec


def cell_coords(pos: jax.Array, grid: GridSpec) -> jax.Array:
    """Unwrapped integer cell coordinates ``(..., 3) -> (i1, i2, i3)``."""
    half = grid.grid_dim // 2
    inv = 1.0 / grid.cell_size
    i1 = jnp.floor(-pos[..., 1] * inv).astype(jnp.int32) + half
    i2 = jnp.floor(pos[..., 0] * inv).astype(jnp.int32) + half
    i3 = jnp.floor(-pos[..., 2] * inv).astype(jnp.int32) + half
    return jnp.stack([i1, i2, i3], axis=-1)


def coords_to_cell(coords: jax.Array, grid: GridSpec) -> jax.Array:
    g = grid.grid_dim
    return coords[..., 2] * g * g + coords[..., 0] * g + coords[..., 1]


def wrap_positions(pos: jax.Array, grid: GridSpec):
    """Torus-wrap positions into the box; returns (wrapped_pos, coords).

    Matches ``set_pos_t`` (``app.cu:117-158``): the coordinate is shifted by
    whole cell widths so the fractional position within its cell is preserved
    exactly.  Note the sign flips — i1/i3 track -y/-z.
    """
    g = grid.grid_dim
    cs = jnp.asarray(grid.cell_size, pos.dtype)
    c = cell_coords(pos, grid)
    cw = jnp.mod(c, g)
    d = (cw - c).astype(pos.dtype)
    # x += (i2w - i2)*cs ; y -= (i1w - i1)*cs ; z -= (i3w - i3)*cs
    shift = jnp.stack([d[..., 1], -d[..., 0], -d[..., 2]], axis=-1) * cs
    return pos + shift, cw


class GridBins(NamedTuple):
    """Result of binning ``slots`` particles into ``num_cells`` cells.

    * ``cell_list``  — ``(num_cells, cell_capacity)`` slot indices, ``-1`` pad;
      within a cell, slots appear in ascending slot order (stable sort), which
      reproduces the reference host path's serial insertion order
      (``particleSystem.cpp:1488-1516`` iterates slots in order).
    * ``counts``     — per-cell live count, capped at ``cell_capacity``.
    * ``overflow``   — particles that did not fit their cell; the reference
      kills these (``particleSystem.cpp:1517-1531``).
    * ``cell_of``    — per-slot cell id (or ``num_cells`` sentinel if dead).
    * ``max_cell_occupancy`` — ``gridmax[1]`` analog (pre-cap count max).
    """

    cell_list: jax.Array
    counts: jax.Array
    overflow: jax.Array
    cell_of: jax.Array
    max_cell_occupancy: jax.Array
    n_listed_dropped: jax.Array


def build_bins(cell_of: jax.Array, alive: jax.Array, num_cells: int,
               cell_capacity: int, list_width: int = 0) -> GridBins:
    """Sort-based grid build.  ``cell_of`` must already be in [0, num_cells).

    ``list_width`` (default = ``cell_capacity``) narrows the padded cell
    lists for the neighbor pass: the dense pass costs O(width^2) per cell
    pair, and actual occupancy is usually far below the kill cap (the
    reference reads ``gridmax`` back each frame to size its launches,
    ``particleSystem.cpp:1900`` — this is the same adaptivity).  Kill
    semantics are unchanged (``overflow`` is still rank >= cell_capacity);
    rows with rank in [list_width, cell_capacity) are *dropped from the
    lists* for this frame and counted in ``n_listed_dropped`` — callers keep
    that zero by sizing ``list_width`` from the previous frame's
    ``max_cell_occupancy`` with margin.
    """
    width = min(list_width or cell_capacity, cell_capacity)
    n = cell_of.shape[0]
    slot = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(alive, cell_of, num_cells).astype(jnp.int32)

    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    sorted_key = key[order]

    counts_all = jnp.bincount(key, length=num_cells + 1)
    start = jnp.concatenate([jnp.zeros((1,), counts_all.dtype),
                             jnp.cumsum(counts_all)])[:-1]
    rank_sorted = slot - start[sorted_key].astype(jnp.int32)

    in_list = (rank_sorted < width) & (sorted_key < num_cells)
    flat = jnp.where(in_list, sorted_key * width + rank_sorted,
                     num_cells * width)
    cell_list = jnp.full((num_cells * width,), -1, jnp.int32)
    cell_list = cell_list.at[flat].set(order, mode="drop",
                                       unique_indices=True)
    cell_list = cell_list.reshape(num_cells, width)

    overflow_sorted = ((rank_sorted >= cell_capacity)
                       & (sorted_key < num_cells))
    overflow = jnp.zeros((n,), jnp.bool_).at[order].set(overflow_sorted)

    live_counts = counts_all[:num_cells]
    n_listed_dropped = jnp.sum(
        ((rank_sorted >= width) & (rank_sorted < cell_capacity)
         & (sorted_key < num_cells)).astype(jnp.int32))
    return GridBins(
        cell_list=cell_list,
        counts=jnp.minimum(live_counts, width).astype(jnp.int32),
        overflow=overflow,
        cell_of=key,
        max_cell_occupancy=jnp.max(live_counts).astype(jnp.int32),
        n_listed_dropped=n_listed_dropped,
    )


def chunk_occupancy(cell_of: jax.Array, alive: jax.Array, grid: GridSpec) -> jax.Array:
    """Per-chunk live counts — the ``chunkgrid`` occupancy / ``gridmax[0]``
    statistic (``particleSystem.cpp:1502-1508``); stays on device."""
    g, cd, cf = grid.grid_dim, grid.chunk_dim, grid.chunk_factor
    i3 = cell_of // (g * g)
    rem = cell_of % (g * g)
    i1 = rem // g
    i2 = rem % g
    chunk = (i3 // cd) * cf * cf + (i1 // cd) * cf + (i2 // cd)
    chunk = jnp.where(alive, chunk, cf ** 3)
    return jnp.bincount(chunk, length=cf ** 3 + 1)[: cf ** 3]


# 27-cell stencil offsets in (i1, i2, i3); the reference enumerates the same
# neighborhood by linear-id arithmetic and rejects out-of-box candidates with
# an integer distance^2 <= 3 test (``fill_cells``/``fill_cell``,
# ``app.cu:352-409``) — equivalent to a per-axis bounds check, with NO
# periodic wrap even though positions wrap (boundary cells have truncated
# stencils).
# numpy at module scope: a jnp constant here would instantiate a JAX backend
# at import time, breaking callers that must pick the platform first
# (e.g. __graft_entry__.dryrun_multichip forcing virtual CPU devices).
import numpy as _np  # noqa: E402

STENCIL = _np.array(
    [(d1, d2, d3) for d3 in (-1, 0, 1) for d1 in (-1, 0, 1) for d2 in (-1, 0, 1)],
    dtype=_np.int32,
)


def stencil_cells(coords: jax.Array, grid: GridSpec):
    """For cell coords ``(3,)`` return (27,) neighbor cell ids + validity mask.

    Order matches ``fill_cells``: the centre cell first in the reference's
    list does not matter for our order-independent reductions.
    """
    g = grid.grid_dim
    nc = coords[None, :] + STENCIL
    valid = jnp.all((nc >= 0) & (nc < g), axis=1)
    ids = nc[:, 2] * g * g + nc[:, 0] * g + nc[:, 1]
    return jnp.where(valid, ids, 0), valid
