"""Batched min-plus forward DP for the squeeze parse, as a lax.scan.

TPU reformulation of reference GetBestLengths (squeeze.c:217-309): the
relaxation over (literal edge, match edges at lengths 3..258 each at its
min distance) becomes a 259-wide vector min against a sliding cost
window, batched over B independent blocks in lockstep so the VPU stays
busy.  Distances are recorded during relaxation, so the reference's
FollowPath re-search (squeeze.c:338-389) disappears.

Inputs are the per-position condensed sublen breakpoints from
ops.hashmatch (data-only, computed once per block) plus the per-iteration
cost model (288+32 bit costs).  Output is the per-position chosen
(length, dist), traced back on the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec
from .hashmatch import MAX_BP

BIG = jnp.float32(1e30)
# Window slots: 0..258 used (cost at current position + reach of matches).
_W = 259


# Per-length constants for lengths 3..258 (index 0 -> length 3).
_LSYM = jnp.asarray(spec.LENGTH_SYMBOL[3:259], dtype=jnp.int32)
_LEXTRA = jnp.asarray(spec.LENGTH_EXTRA_BITS[3:259], dtype=jnp.float32)
_LENGTHS = jnp.arange(3, 259, dtype=jnp.int32)

_DSYM_BASE = jnp.asarray(spec.DIST_SYM_BASE, dtype=jnp.int32)
_DSYM_EXTRA = jnp.asarray(spec.DIST_SYM_EXTRA_BITS, dtype=jnp.float32)


def dist_symbol_jax(dist: jnp.ndarray) -> jnp.ndarray:
    """DEFLATE distance symbol, branch-free (spec.dist_symbol in jnp)."""
    d1 = jnp.maximum(dist - 1, 1)
    lg = 31 - jax.lax.clz(d1)
    r = (d1 >> jnp.maximum(lg - 1, 0)) & 1
    return jnp.where(dist < 5, dist - 1, 2 * lg + r).astype(jnp.int32)


def edge_cost_tables(ll_cost: jnp.ndarray, d_cost: jnp.ndarray,
                     bp_dsym: jnp.ndarray, bp_dextra: jnp.ndarray,
                     data_block: jnp.ndarray):
    """Per-iteration cost arrays for the scan.

    ll_cost (B,288), d_cost (B,32): the statistical model in bits.
    bp_dsym/bp_dextra (B,L,MAX_BP): dist symbol / extra bits per breakpoint.
    data_block (B,L): input bytes per block position.

    Returns (lcost_vec (B,256), bp_dcost (B,L,MAX_BP), litcost (B,L)).
    """
    lcost_vec = ll_cost[:, _LSYM] + _LEXTRA[None, :]
    bp_dcost = jnp.take_along_axis(
        d_cost, bp_dsym.reshape(bp_dsym.shape[0], -1), axis=1
    ).reshape(bp_dsym.shape) + bp_dextra
    litcost = jnp.take_along_axis(ll_cost, data_block, axis=1)
    return lcost_vec, bp_dcost, litcost


@functools.partial(jax.jit, donate_argnums=())
def squeeze_scan(bp_len, bp_dist, bp_dcost, litcost, lcost_vec, length_mask):
    """Forward DP over all positions of B blocks in lockstep.

    bp_len, bp_dist: (B, L, MAX_BP) int32 breakpoints (0 = unused slot)
    bp_dcost: (B, L, MAX_BP) float32 distance cost per breakpoint
    litcost: (B, L) float32 literal cost per position
    lcost_vec: (B, 256) float32 length-symbol cost for lengths 3..258
    length_mask: (B, L) bool — True for real (non padding) positions

    Returns (choice_len, choice_dist): (B, L+1) int32 — the edge chosen to
    *reach* each position (length 1 = literal), plus final cost (B,).
    """
    B, L, _ = bp_len.shape

    w0 = jnp.full((B, _W), BIG, jnp.float32).at[:, 0].set(0.0)
    cl0 = jnp.zeros((B, _W), jnp.int32)
    cd0 = jnp.zeros((B, _W), jnp.int32)

    lengths = _LENGTHS[None, :]  # (1,256)

    def step(carry, xs):
        w, cl, cd = carry
        bl, bd, bdc, lc, real = xs  # (B,MAX_BP)x3, (B,), (B,)
        cost_j = w[:, 0]

        # Literal edge j -> j+1.
        lit_new = cost_j + jnp.where(real, lc, BIG)
        upd = lit_new < w[:, 1]
        w = w.at[:, 1].set(jnp.where(upd, lit_new, w[:, 1]))
        cl = cl.at[:, 1].set(jnp.where(upd, 1, cl[:, 1]))
        cd = cd.at[:, 1].set(jnp.where(upd, 0, cd[:, 1]))

        # Match edges: expand the breakpoint step function over l=3..258.
        edge_dcost = jnp.full((B, 256), BIG)
        edge_dist = jnp.zeros((B, 256), jnp.int32)
        for k in range(MAX_BP - 1, -1, -1):
            sel = (lengths <= bl[:, k][:, None]) & (bl[:, k][:, None] > 0)
            edge_dcost = jnp.where(sel, bdc[:, k][:, None], edge_dcost)
            edge_dist = jnp.where(sel, bd[:, k][:, None], edge_dist)
        edge = lcost_vec + edge_dcost
        edge = jnp.where(real[:, None], edge, BIG)
        new = cost_j[:, None] + edge
        old = w[:, 3:259]
        upd = new < old
        w = w.at[:, 3:259].set(jnp.where(upd, new, old))
        cl = cl.at[:, 3:259].set(jnp.where(upd, lengths, cl[:, 3:259]))
        cd = cd.at[:, 3:259].set(jnp.where(upd, edge_dist, cd[:, 3:259]))

        out = (w[:, 1], cl[:, 1], cd[:, 1])
        # Slide the window one position forward.
        w = jnp.concatenate([w[:, 1:], jnp.full((B, 1), BIG)], axis=1)
        cl = jnp.concatenate([cl[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
        cd = jnp.concatenate([cd[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
        return (w, cl, cd), out

    xs = (
        jnp.moveaxis(bp_len, 1, 0),
        jnp.moveaxis(bp_dist, 1, 0),
        jnp.moveaxis(bp_dcost, 1, 0),
        jnp.moveaxis(litcost, 1, 0),
        jnp.moveaxis(length_mask, 1, 0),
    )
    (w, cl, cd), (costs, lens, dists) = jax.lax.scan(
        step, (w0, cl0, cd0), xs)
    # costs[j] is the final cost of position j+1; prepend position 0.
    final_cost = jnp.moveaxis(costs, 0, 1)  # (B, L)
    choice_len = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.moveaxis(lens, 0, 1)], axis=1)
    choice_dist = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), jnp.moveaxis(dists, 0, 1)], axis=1)
    return choice_len, choice_dist, final_cost


def traceback(choice_len: np.ndarray, choice_dist: np.ndarray, L: int,
              data_block: np.ndarray):
    """Host traceback: walk back from position L (squeeze.c:317-336)."""
    lens = []
    dists = []
    idx = L
    while idx > 0:
        l = int(choice_len[idx])
        assert 1 <= l <= idx, (l, idx)
        if l >= spec.MIN_MATCH:
            lens.append(l)
            dists.append(int(choice_dist[idx]))
        else:
            lens.append(int(data_block[idx - 1]))
            dists.append(0)
        idx -= l
    lens.reverse()
    dists.reverse()
    return (np.array(lens, dtype=np.uint16), np.array(dists, dtype=np.uint16))
