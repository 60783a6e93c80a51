"""Pallas TPU kernels: batched min-plus squeeze DP + traceback.

This is the TPU-native core of the zopfli algorithm: the forward DP of
reference GetBestLengths (src/zopfli/squeeze.c:217-309) reformulated as
a lockstep wavefront over many independent parse tiles (lanes).  Each
lane scans TILE positions; per step the kernel relaxes the literal edge
and the 256 match edges (lengths 3..258, each at the min distance from
the per-position breakpoint table) with vector min — the VPU processes
all lanes at once, so the sequential chain is paid once for the whole
batch instead of once per block.

The chosen edge is carried as ONE packed int32 per position:
`len | dist << 9` (len <= 258 fits 9 bits, dist <= 32768 fits 16; a
literal edge is the value 1).  The distance MUST be captured during the
relaxation — it is a function of the edge's SOURCE position (p - len),
which only the forward scan has in hand; resolving it later from the
destination row looks plausible and is wrong (see the regression test
in tests/test_batched.py).  Packing halves the chosen-edge VMEM state
and drops one output stream versus separate len/dist buffers, and the
packed value flows unchanged through the traceback, the keep-best
state, the lane compaction sort, and the d2h fetch.

The per-position candidate breakpoints (ops.hashmatch) stream from HBM
in position chunks; the DP state (cost window + chosen packed edges)
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
LEN_BITS = 9     # packed edge: len | dist << LEN_BITS
LEN_MASK = (1 << LEN_BITS) - 1


def pack_edge(length, dist):
    """Pack an edge as the kernels carry it (numpy/jnp int32)."""
    return length | (dist << LEN_BITS)


@functools.lru_cache(maxsize=None)
def make_scan(tile: int, nt: int, kbp: int, ch: int = 16,
              interpret: bool = False, groups: int = 1):
    """Build the jitted DP scan for a (tile, lanes, breakpoints) shape.

    Returns fn(bp_len, bp_dist, bp_dcost, litcost, lcost_vec) ->
    (ce, cost) with
      bp_len, bp_dist: (groups*tile, kbp, nt) int32 (0 len = unused)
      bp_dcost: (groups*tile, kbp, nt) float32 — distance cost per bp
      litcost: (groups*tile, nt) float32 — literal cost (BIG pads)
      lcost_vec: (groups*W, nt) float32 — length-symbol cost, 3..258
      ce: (groups*tile, nt) int32 — PACKED edge (len | dist << 9)
          chosen to reach each position (row j = position j+1 of its
          tile; the literal edge is the value 1)
      cost: (groups*tile, nt) float32 — final cost of each position

    One grid serves every group — a single kernel instance and a single
    dispatch for a whole multi-master batch.
    """
    assert tile % ch == 0, (tile, ch)
    nch = tile // ch
    buf_rows = ch + SHIFT

    def kern(bl_ref, bd_ref, bc_ref, lit_ref, lcost_ref,
             ce_out, cost_out, buf, ceb):
        c = pl.program_id(0)
        # Constants must be materialized inside the kernel body.
        liota = jax.lax.broadcasted_iota(jnp.int32, (W, nt), 0) + 3

        @pl.when(c % nch == 0)
        def _():
            buf[:, :] = jnp.full((buf_rows, nt), BIG, jnp.float32)
            buf[0, :] = jnp.zeros((nt,), jnp.float32)
            ceb[:, :] = jnp.zeros((buf_rows, nt), jnp.int32)

        def step(j):
            cost_j = buf[pl.ds(j, 1), :][0]
            # Literal edge j -> j+1 (packed value 1: len 1, dist 0).
            lt = cost_j + lit_ref[pl.ds(j, 1), :][0]
            old1 = buf[pl.ds(j + 1, 1), :][0]
            pred = lt < old1
            buf[pl.ds(j + 1, 1), :] = jnp.where(pred, lt, old1)[None]
            ceb[pl.ds(j + 1, 1), :] = jnp.where(
                pred, 1, ceb[pl.ds(j + 1, 1), :][0])[None]

            # Expand breakpoints to dense per-length (dist cost, packed
            # edge).  The packed edge captures the SOURCE row's distance
            # — the only point in the pipeline where it is available.
            dcost = jnp.full((W, nt), BIG, jnp.float32)
            dedge = liota
            for k in range(kbp - 1, -1, -1):
                bl = bl_ref[pl.ds(j, 1), k, :][0]
                sel = liota <= bl[None, :]
                dcost = jnp.where(sel, bc_ref[pl.ds(j, 1), k, :][0][None, :],
                                  dcost)
                dedge = jnp.where(
                    sel,
                    liota | (bd_ref[pl.ds(j, 1), k, :][0][None, :]
                             << LEN_BITS),
                    dedge)

            new = cost_j[None, :] + lcost_ref[:, :] + dcost
            old = buf[pl.ds(j + 3, W), :]
            pred = new < old
            buf[pl.ds(j + 3, W), :] = jnp.where(pred, new, old)
            olde = ceb[pl.ds(j + 3, W), :]
            ceb[pl.ds(j + 3, W), :] = jnp.where(pred, dedge, olde)

        if interpret:
            # Dynamic indexing keeps the trace small (the grid loop is
            # traced per step in interpret mode; an unrolled chunk body
            # makes test-mode compiles scale with total positions).
            jax.lax.fori_loop(0, ch, lambda j, _: (step(j), 0)[1], 0)
        else:
            # Fully unrolled on TPU: every offset is static, which
            # Mosaic lowers to aligned vector ops (dynamic sublane
            # offsets can't be proven 8-aligned and fail to compile at
            # wider lanes).
            for j in range(ch):
                step(j)

        # Positions c*ch+1 .. c*ch+ch are final: emit and slide.
        cost_out[:, :] = buf[pl.ds(1, ch), :]
        ce_out[:, :] = ceb[pl.ds(1, ch), :]
        buf[pl.ds(0, SHIFT), :] = buf[pl.ds(ch, SHIFT), :]
        buf[pl.ds(SHIFT, ch), :] = jnp.full((ch, nt), BIG, jnp.float32)
        ceb[pl.ds(0, SHIFT), :] = ceb[pl.ds(ch, SHIFT), :]

    grid_in = [
        pl.BlockSpec((ch, kbp, nt), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, kbp, nt), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, kbp, nt), lambda c: (c, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, nt), lambda c: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((W, nt), lambda c: (c // nch, 0),
                     memory_space=pltpu.VMEM),
    ]
    grid_out = [
        pl.BlockSpec((ch, nt), lambda c: (c, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ch, nt), lambda c: (c, 0), memory_space=pltpu.VMEM),
    ]

    @jax.jit
    def run(bp_len, bp_dist, bp_dcost, litcost, lcost_vec):
        rows = groups * tile
        ce, cost = pl.pallas_call(
            kern,
            grid=(groups * nch,),
            in_specs=grid_in,
            out_specs=grid_out,
            out_shape=[
                jax.ShapeDtypeStruct((rows, nt), jnp.int32),
                jax.ShapeDtypeStruct((rows, nt), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((buf_rows, nt), jnp.float32),
                pltpu.VMEM((buf_rows, nt), jnp.int32),
            ],
            interpret=interpret,
        )(bp_len, bp_dist, bp_dcost, litcost, lcost_vec)
        return ce, cost

    return run


HBINS = 320  # 288 litlen rows + 32 dist rows


def symbol_range_table() -> np.ndarray:
    """(HBINS, 8) int32 range table for the in-kernel histogram.

    Row r matches a path edge when:
      r < 256: literal edge with byte == r (compared directly, not here)
      257..285: match edge with length in [col0, col1)
      288..317: match edge with distance in [col2, col3)
    Sentinel -1 ranges never match.
    """
    tab = np.full((HBINS, 8), -1, dtype=np.int32)
    tab[:, 1] = -2  # empty [lo, hi)
    tab[:, 3] = -2
    for l in range(spec.MIN_MATCH, spec.MAX_MATCH + 1):
        s = int(spec.LENGTH_SYMBOL[l])
        if tab[s, 0] == -1:
            tab[s, 0] = l
        tab[s, 1] = l + 1
    base = spec.DIST_SYM_BASE
    for s in range(30):
        hi = int(base[s + 1]) if s + 1 < 30 else spec.WINDOW_SIZE + 1
        tab[288 + s, 2] = int(base[s])
        tab[288 + s, 3] = hi
    return tab


@functools.lru_cache(maxsize=None)
def make_traceback(tile: int, nt: int, ch: int = 32,
                   interpret: bool = False, groups: int = 1):
    """Backward traceback kernel: path edges + histograms, no gathers.

    The DP path is walked backwards in lockstep over all lanes: a
    per-lane cursor `nextpos` starts at each tile's end; at position p
    (descending) a lane is *active* iff its cursor equals p, in which
    case the packed edge ce[p] is on the path.  Rows are visited in
    static order, so there is zero gathering — the reference's serial
    TraceBackwards (squeeze.c:317-336) becomes 1 vector step/position.

    Returns fn(ce, lit, tile_nbytes, symtab) ->
      (hist (groups*HBINS, nt) f32, pe (groups*tile, nt) i32)
    where ce is the scan output ((groups*tile, nt) packed edges, row j
    = position j+1), lit (groups*tile, nt) byte values, tile_nbytes
    (groups, nt), symtab from symbol_range_table().
    pe[j] = the packed edge into position j+1 if on the path, else 0 —
    the exact format the fused engine's keep-best/compaction and the
    host decode consume.
    """
    assert tile % ch == 0
    nch = tile // ch

    def kern(ce_ref, lit_ref, nbyt_ref, tab_ref,
             hist_out, pe_out, nextpos, hist):
        c = pl.program_id(0)
        inner = c % nch
        base = (nch - 1 - inner) * ch
        riota = jax.lax.broadcasted_iota(jnp.int32, (HBINS, nt), 0)

        @pl.when(inner == 0)
        def _():
            nextpos[0, :] = nbyt_ref[0, :]
            hist[:, :] = jnp.zeros((HBINS, nt), jnp.float32)

        ll_lo = tab_ref[:, 0:1]
        ll_hi = tab_ref[:, 1:2]
        d_lo = tab_ref[:, 2:3]
        d_hi = tab_ref[:, 3:4]

        def step(j):
            p = base + j + 1
            np_row = nextpos[0, :]
            active = np_row == p
            v = ce_ref[pl.ds(j, 1), :][0]
            l = v & LEN_MASK
            d = v >> LEN_BITS
            byte = lit_ref[pl.ds(j, 1), :][0]
            is_match = l >= 3

            am = (active & is_match)[None, :]
            oh = (active & (l == 1))[None, :] & (riota == byte[None, :])
            oh |= am & (l[None, :] >= ll_lo) & (l[None, :] < ll_hi)
            oh |= am & (d[None, :] >= d_lo) & (d[None, :] < d_hi)
            hist[:, :] = hist[:, :] + oh.astype(jnp.float32)

            pe_out[pl.ds(j, 1), :] = jnp.where(active, v, 0)[None]
            nextpos[0, :] = jnp.where(active, p - l, np_row)

        if interpret:
            jax.lax.fori_loop(
                0, ch, lambda t, _: (step(ch - 1 - t), 0)[1], 0)
        else:
            for j in range(ch - 1, -1, -1):
                step(j)

        hist_out[:, :] = hist[:, :]

    rev = lambda c: ((c // nch) * nch + (nch - 1 - c % nch), 0)
    @jax.jit
    def run(ce, lit, tile_nbytes, symtab):
        # tile_nbytes: (groups, nt) -> 8 replicated sublane rows per
        # group (Mosaic requires sublane-divisible block shapes).
        tile_nbytes = jnp.broadcast_to(tile_nbytes[:, None, :],
                                       (groups, 8, nt)).reshape(
                                           groups * 8, nt)
        rows = groups * tile
        return pl.pallas_call(
            kern,
            grid=(groups * nch,),
            in_specs=[
                pl.BlockSpec((ch, nt), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((ch, nt), rev, memory_space=pltpu.VMEM),
                pl.BlockSpec((8, nt), lambda c: (c // nch, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((HBINS, 8), lambda c: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((HBINS, nt), lambda c: (c // nch, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ch, nt), rev, memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((groups * HBINS, nt), jnp.float32),
                jax.ShapeDtypeStruct((rows, nt), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((1, nt), jnp.int32),
                pltpu.VMEM((HBINS, nt), jnp.float32),
            ],
            interpret=interpret,
        )(ce, lit, tile_nbytes, symtab)

    return run


def traceback_reference(ce, lit, tile_nbytes):
    """Numpy oracle for make_traceback (same contract, minus symtab)."""
    tile, nt = ce.shape
    hist = np.zeros((HBINS, nt), np.float32)
    pe_o = np.zeros((tile, nt), np.int32)
    for lane in range(nt):
        p = int(tile_nbytes[0, lane])
        while p > 0:
            v = int(ce[p - 1, lane])
            l = v & LEN_MASK
            d = v >> LEN_BITS
            pe_o[p - 1, lane] = v
            if l >= 3:
                hist[spec.LENGTH_SYMBOL[l], lane] += 1
                hist[288 + spec.dist_symbol(max(d, 1)), lane] += 1
            else:
                hist[int(lit[p - 1, lane]), lane] += 1
            p -= l
    return hist, pe_o


def scan_reference(bp_len, bp_dist, bp_dcost, litcost, lcost_vec):
    """Pure-numpy oracle for the scan kernel (tests): same contract.

    Shapes as in make_scan (position-major, lanes last); returns
    (ce (tile, nt) packed edges, cost (tile, nt)) — row j = pos j+1.
    """
    tile, kbp, nt = bp_len.shape
    cost = np.full((tile + 1, nt), 1e30, np.float32)
    cost[0] = 0.0
    ce = np.zeros((tile + 1, nt), np.int32)
    lengths = np.arange(3, 259)[:, None]
    for j in range(tile):
        cj = cost[j]
        lt = (cj + litcost[j]).astype(np.float32)
        upd = lt < cost[j + 1]
        cost[j + 1] = np.where(upd, lt, cost[j + 1])
        ce[j + 1] = np.where(upd, 1, ce[j + 1])

        dcost = np.full((W, nt), 1e30, np.float32)
        dedge = np.broadcast_to(lengths, (W, nt)).astype(np.int32)
        for k in range(kbp - 1, -1, -1):
            sel = lengths <= bp_len[j, k][None, :]
            dcost = np.where(sel, bp_dcost[j, k][None, :], dcost)
            dedge = np.where(sel,
                             lengths | (bp_dist[j, k][None, :] << LEN_BITS),
                             dedge)
        new = (cj[None, :] + lcost_vec + dcost).astype(np.float32)
        hi = min(j + 259, tile + 1)
        n = hi - (j + 3)
        if n <= 0:
            continue
        old = cost[j + 3:hi]
        upd = new[:n] < old
        cost[j + 3:hi] = np.where(upd, new[:n], old)
        ce[j + 3:hi] = np.where(upd, dedge[:n], ce[j + 3:hi])
    return ce[1:], cost[1:]
