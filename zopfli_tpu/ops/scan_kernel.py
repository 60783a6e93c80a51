"""Pallas TPU kernel: batched min-plus squeeze DP over parse tiles.

This is the TPU-native core of the zopfli algorithm: the forward DP of
reference GetBestLengths (src/zopfli/squeeze.c:217-309) reformulated as
a lockstep wavefront over many independent parse tiles (lanes).  Each
lane scans TILE positions; per step the kernel relaxes the literal edge
and the 256 match edges (lengths 3..258, each at the min distance from
the per-position breakpoint table) with vector min — the VPU processes
all lanes at once, so the sequential chain is paid once for the whole
batch instead of once per block.

The per-position candidate breakpoints (ops.hashmatch) stream from HBM
in position chunks; the DP state (cost window + chosen edge arrays)
lives in VMEM scratch that persists across the sequential grid.

Distances are recorded during relaxation, so the reference's FollowPath
re-search (squeeze.c:338-389) has no equivalent here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import spec

BIG = 1e30  # python float: jnp scalars would be captured consts in kernels
W = 256          # match lengths 3..258
SHIFT = 272      # carried window rows (>= 258, multiple of 16)


@functools.lru_cache(maxsize=None)
def make_scan(tile: int, nt: int, kbp: int, ch: int = 32,
              interpret: bool = False):
    """Build the jitted DP scan for a (tile, lanes, breakpoints) shape.

    Returns fn(bp_len, bp_dist, bp_dcost, litcost, lcost_vec) ->
    (cl, cd, cost) with
      bp_len, bp_dist: (tile, kbp, nt) int32 (0 len = unused slot)
      bp_dcost: (tile, kbp, nt) float32 — distance cost per breakpoint
      litcost: (tile, nt) float32 — literal cost per position (BIG pads)
      lcost_vec: (W, nt) float32 — length-symbol cost for lengths 3..258
      cl, cd: (tile + 1, nt) int32 — edge chosen to reach each position
      cost: (tile, nt) float32 — final cost of positions 1..tile
    """
    assert tile % ch == 0, (tile, ch)
    nch = tile // ch
    buf_rows = ch + SHIFT

    def kern(bl_ref, bd_ref, bc_ref, lit_ref, lcost_ref,
             cl_out, cd_out, cost_out, buf, clb, cdb):
        c = pl.program_id(0)
        # Constants must be materialized inside the kernel body.
        liota = jax.lax.broadcasted_iota(jnp.int32, (W, nt), 0) + 3

        @pl.when(c == 0)
        def _():
            buf[:, :] = jnp.full((buf_rows, nt), BIG, jnp.float32)
            buf[0, :] = jnp.zeros((nt,), jnp.float32)
            clb[:, :] = jnp.zeros((buf_rows, nt), jnp.int32)
            cdb[:, :] = jnp.zeros((buf_rows, nt), jnp.int32)

        # Fully unrolled over the chunk: every offset is static, which
        # Mosaic lowers to aligned vector ops (dynamic sublane offsets
        # can't be proven 8-aligned and fail to compile at wider lanes).
        for j in range(ch):
            cost_j = buf[j, :]
            # Literal edge j -> j+1.
            lt = cost_j + lit_ref[j, :]
            pred = lt < buf[j + 1, :]
            buf[j + 1, :] = jnp.where(pred, lt, buf[j + 1, :])
            clb[j + 1, :] = jnp.where(pred, 1, clb[j + 1, :])
            cdb[j + 1, :] = jnp.where(pred, 0, cdb[j + 1, :])

            # Expand breakpoints to dense per-length (dist cost, dist).
            dcost = jnp.full((W, nt), BIG, jnp.float32)
            ddist = jnp.zeros((W, nt), jnp.int32)
            for k in range(kbp - 1, -1, -1):
                bl = bl_ref[j, k, :]
                sel = liota <= bl[None, :]
                dcost = jnp.where(sel, bc_ref[j, k, :][None, :], dcost)
                ddist = jnp.where(sel, bd_ref[j, k, :][None, :], ddist)

            new = cost_j[None, :] + lcost_ref[:, :] + dcost
            old = buf[j + 3:j + 3 + W, :]
            pred = new < old
            buf[j + 3:j + 3 + W, :] = jnp.where(pred, new, old)
            oldl = clb[j + 3:j + 3 + W, :]
            clb[j + 3:j + 3 + W, :] = jnp.where(pred, liota, oldl)
            oldd = cdb[j + 3:j + 3 + W, :]
            cdb[j + 3:j + 3 + W, :] = jnp.where(pred, ddist, oldd)

        # Positions c*ch+1 .. c*ch+ch are final: emit and slide.
        cost_out[:, :] = buf[pl.ds(1, ch), :]
        cl_out[:, :] = clb[pl.ds(1, ch), :]
        cd_out[:, :] = cdb[pl.ds(1, ch), :]
        buf[pl.ds(0, SHIFT), :] = buf[pl.ds(ch, SHIFT), :]
        buf[pl.ds(SHIFT, ch), :] = jnp.full((ch, nt), BIG, jnp.float32)
        clb[pl.ds(0, SHIFT), :] = clb[pl.ds(ch, SHIFT), :]
        cdb[pl.ds(0, SHIFT), :] = cdb[pl.ds(ch, SHIFT), :]

    grid_in = [
        pl.BlockSpec((ch, kbp, nt), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, kbp, nt), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, kbp, nt), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, nt), lambda c: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((W, nt), lambda c: (0, 0), memory_space=pltpu.VMEM),
    ]
    grid_out = [
        pl.BlockSpec((ch, nt), lambda c: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, nt), lambda c: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, nt), lambda c: (c, 0), memory_space=pltpu.VMEM),
    ]

    @jax.jit
    def run(bp_len, bp_dist, bp_dcost, litcost, lcost_vec):
        cl, cd, cost = pl.pallas_call(
            kern,
            grid=(nch,),
            in_specs=grid_in,
            out_specs=grid_out,
            out_shape=[
                jax.ShapeDtypeStruct((tile, nt), jnp.int32),
                jax.ShapeDtypeStruct((tile, nt), jnp.int32),
                jax.ShapeDtypeStruct((tile, nt), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((buf_rows, nt), jnp.float32),
                pltpu.VMEM((buf_rows, nt), jnp.int32),
                pltpu.VMEM((buf_rows, nt), jnp.int32),
            ],
            interpret=interpret,
        )(bp_len, bp_dist, bp_dcost, litcost, lcost_vec)
        zero = jnp.zeros((1, nt), jnp.int32)
        cl = jnp.concatenate([zero, cl], axis=0)
        cd = jnp.concatenate([zero, cd], axis=0)
        return cl, cd, cost

    return run


def scan_reference(bp_len, bp_dist, bp_dcost, litcost, lcost_vec):
    """Pure-numpy oracle for the kernel (tests): same contract as make_scan.

    Shapes as in make_scan (position-major, lanes last).
    """
    tile, kbp, nt = bp_len.shape
    cost = np.full((tile + 1, nt), 1e30, np.float32)
    cost[0] = 0.0
    cl = np.zeros((tile + 1, nt), np.int32)
    cd = np.zeros((tile + 1, nt), np.int32)
    lengths = np.arange(3, 259)[:, None]
    for j in range(tile):
        cj = cost[j]
        lt = (cj + litcost[j]).astype(np.float32)
        upd = lt < cost[j + 1]
        cost[j + 1] = np.where(upd, lt, cost[j + 1])
        cl[j + 1] = np.where(upd, 1, cl[j + 1])
        cd[j + 1] = np.where(upd, 0, cd[j + 1])

        dcost = np.full((W, nt), 1e30, np.float32)
        ddist = np.zeros((W, nt), np.int32)
        for k in range(kbp - 1, -1, -1):
            sel = lengths <= bp_len[j, k][None, :]
            dcost = np.where(sel, bp_dcost[j, k][None, :], dcost)
            ddist = np.where(sel, bp_dist[j, k][None, :], ddist)
        new = (cj[None, :] + lcost_vec + dcost).astype(np.float32)
        hi = min(j + 259, tile + 1)
        n = hi - (j + 3)
        if n <= 0:
            continue
        old = cost[j + 3:hi]
        upd = new[:n] < old
        cost[j + 3:hi] = np.where(upd, new[:n], old)
        cl[j + 3:hi] = np.where(upd, lengths[:n], cl[j + 3:hi])
        cd[j + 3:hi] = np.where(upd, ddist[:n], cd[j + 3:hi])
    return cl, cd, cost[1:]
