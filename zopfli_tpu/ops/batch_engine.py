"""Batched TPU squeeze engine: all blocks of a master block in lockstep.

Architecture (no reference counterpart — the reference is strictly
serial, squeeze.c:446-526 one block at a time):

  master block (<= 1 MiB, 32 KiB halo)
    -> candidate breakpoints built ONCE on device (ops.hashmatch):
       depend only on the bytes, reused by every iteration/run
    -> blocks (from the host splitter) partitioned into fixed parse
       TILES; every tile is one lane of the Pallas DP scan kernel
       (ops.scan_kernel); tiles run in fixed-size lane groups so one
       compiled kernel shape serves any input size
    -> per squeeze iteration ONE fused device call per group: cost
       expansion (30-way select, no gathers) -> forward DP scan ->
       backward traceback kernel (path + histograms, no gathers) ->
       per-block histogram matmul; only (320, nb) counters come back
    -> zopfli iteration control (keep-best by exact histogram cost via
       native zt_hist_dynamic_cost) runs on the host between calls
    -> the best parse, kept on device as sparse per-position (len,
       dist) rows, is pulled once per master block at the end

Device/host traffic per iteration is a few KB each way, independent of
input size; the raw bytes cross once, the chosen parse crosses once.

Tiles introduce forced path nodes at tile boundaries (like the
reference's own forced nodes at block-split boundaries,
deflate.c:845-861); with 8 KiB tiles the size impact is a few bits per
tile.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import spec
from . import hashmatch, scan_kernel

KBP = hashmatch.MAX_BP          # breakpoint slots per position
# Parse tile length (forced-node spacing) and kernel lanes per group.
# Env-overridable so CPU test runs can use small interpret-mode shapes.
TILE = int(os.environ.get("ZT_TILE", "8192"))
LANES = int(os.environ.get("ZT_LANES", "256"))

# Host-side constants: constant-folded into jitted functions on first
# trace (a module-level jnp.asarray would device_put at import time).
_LSYM = np.asarray(spec.LENGTH_SYMBOL[3:259], dtype=np.int32)
_LEXTRA = np.asarray(spec.LENGTH_EXTRA_BITS[3:259], dtype=np.float32)
_DSYM_EXTRA = np.zeros(spec.NUM_D, dtype=np.float32)
_DSYM_EXTRA[:30] = spec.DIST_SYM_EXTRA_BITS

FIXED_LL = np.zeros(spec.NUM_LL, dtype=np.float32)
FIXED_LL[0:144] = 8
FIXED_LL[144:256] = 9
FIXED_LL[256:280] = 7
FIXED_LL[280:288] = 8
FIXED_D = np.full(spec.NUM_D, 5, dtype=np.float32)


def dist_symbol_jax(dist: jnp.ndarray) -> jnp.ndarray:
    d1 = jnp.maximum(dist - 1, 1)
    lg = 31 - jax.lax.clz(d1)
    r = (d1 >> jnp.maximum(lg - 1, 0)) & 1
    return jnp.where(dist < 5, dist - 1, 2 * lg + r).astype(jnp.int32)


import functools


@functools.lru_cache(maxsize=None)
def _make_prepare_group(cap: int):
    @jax.jit
    def prepare(bp_len, bp_dist, data_block, tile_start, tile_nbytes):
        """Slice master-level candidate tables into one lane group.

        bp_len/bp_dist: (cap, KBP) int32 master tables; data_block
        (cap,) int32; tile_start/tile_nbytes: (LANES,) int32.
        Returns kernel layout (bl_t, bd_t, dsym_t, lit_t, valid_t).
        """
        pos_in_tile = jnp.arange(TILE, dtype=jnp.int32)
        rows = tile_start[:, None] + pos_in_tile[None, :]   # (LANES, TILE)
        rows_c = jnp.clip(rows, 0, cap - 1)
        bl = bp_len[rows_c]            # (LANES, TILE, KBP)
        bd = bp_dist[rows_c]
        lit = data_block[rows_c]       # (LANES, TILE)

        # Matches may not extend beyond the tile's real end (forced node).
        maxlen = tile_nbytes[:, None] - pos_in_tile[None, :]
        bl = jnp.minimum(bl, maxlen[:, :, None])
        bl = jnp.where(bl >= spec.MIN_MATCH, bl, 0)
        valid = pos_in_tile[None, :] < tile_nbytes[:, None]
        bl = jnp.where(valid[:, :, None], bl, 0)

        dsym = dist_symbol_jax(jnp.maximum(bd, 1)).astype(jnp.int8)
        return (jnp.transpose(bl, (1, 2, 0)), jnp.transpose(bd, (1, 2, 0)),
                jnp.transpose(dsym, (1, 2, 0)), jnp.transpose(lit, (1, 0)),
                jnp.transpose(valid, (1, 0)))
    return prepare


@functools.lru_cache(maxsize=None)
def _make_run_group(scan, traceback, nbyte_values: int):
    """One fused device call per group per iteration.

    Folds EVERYTHING between host syncs into a single dispatch — cost
    expansion, forward DP, backward traceback, per-block histograms AND
    the keep-best update for the *previous* iteration (separate chained
    dispatches cost hundreds of ms of scheduling latency on the axon
    transport).  nbyte_values: static padded count of distinct byte
    values in the master block (literal costs become a select chain;
    XLA per-lane table gathers are ~15x slower).
    """
    symtab = np.asarray(scan_kernel.symbol_range_table(), dtype=np.int32)

    @functools.partial(jax.jit, donate_argnums=(10, 11))
    def run_group(ll_cost_b, d_cost_b, bl_t, bd_t, dsym_t, lit_t, valid_t,
                  tile_block, tile_nbytes, blk_oh,
                  best_pl, best_pd, last_pl, last_pd, improved_lane,
                  byte_values):
        # Apply the previous iteration's keep-best decision first.
        m = improved_lane[None, :]
        best_pl = jnp.where(m, last_pl, best_pl)
        best_pd = jnp.where(m, last_pd, best_pd)

        ll_t = ll_cost_b[tile_block]          # (LANES, 288)
        d_t = d_cost_b[tile_block]            # (LANES, 32)

        lcost_vec = jnp.transpose(ll_t[:, _LSYM] + _LEXTRA[None, :])

        dplus = d_t + _DSYM_EXTRA[None, :]    # (LANES, 32)
        bp_dcost_t = jnp.zeros(dsym_t.shape, jnp.float32)
        for s in range(30):
            bp_dcost_t = jnp.where(dsym_t == np.int8(s),
                                   dplus[:, s][None, None, :], bp_dcost_t)

        # Literal cost: select chain over the distinct byte values when
        # the alphabet is small (beats XLA's per-lane gather ~15x); wide
        # alphabets (e.g. random data) fall back to the gather.
        if nbyte_values <= 128:
            litcost_t = jnp.zeros(lit_t.shape, jnp.float32)
            for k in range(nbyte_values):
                v = byte_values[k]
                litcost_t = jnp.where(lit_t == v,
                                      ll_t[:, v][None, :], litcost_t)
        else:
            litcost = jnp.take_along_axis(ll_t, jnp.transpose(lit_t),
                                          axis=1)
            litcost_t = jnp.transpose(litcost)
        litcost_t = jnp.where(valid_t, litcost_t, scan_kernel.BIG)

        cl, cd, _cost = scan(bl_t, bd_t, bp_dcost_t, litcost_t, lcost_vec)
        hist, plp, pdp = traceback(cl[1:], cd[1:], lit_t,
                                   tile_nbytes[None, :],
                                   jnp.asarray(symtab))
        # HIGHEST precision: the default TPU matmul truncates inputs to
        # bfloat16, silently rounding per-lane symbol counts above 256
        # and corrupting the exact keep-best cost downstream.
        hist_b = jnp.matmul(hist, blk_oh,
                            precision=jax.lax.Precision.HIGHEST)  # (HBINS, NB)
        return hist_b, plp, pdp, best_pl, best_pd
    return run_group


@jax.jit
def _keep_best(best_pl, best_pd, plp, pdp, improved_lane):
    m = improved_lane[None, :]
    return (jnp.where(m, plp, best_pl), jnp.where(m, pdp, best_pd))


@jax.jit
def _to_i16_pair(plp, pdp):
    return (jnp.transpose(plp).astype(jnp.int16),
            jnp.transpose(pdp).astype(jnp.int16))


def _filler(n: int) -> np.ndarray:
    return (np.arange(n, dtype=np.uint32) * 2654435761 >> 13).astype(np.uint8)


class MasterBatch:
    """Device context for one master block's batched squeeze.

    data: full input array (host); [instart, inend) the master block;
    block_bounds: byte offsets delimiting the zopfli blocks inside the
    master (host splitter output): [instart, b1, ..., inend].
    """

    def __init__(self, data: np.ndarray, instart: int, inend: int,
                 block_bounds: list[int], interpret: bool | None = None):
        if interpret is None:
            # Mosaic kernels need a real TPU; elsewhere (CPU test meshes)
            # run the kernels in interpret mode.
            interpret = jax.default_backend() != "tpu"
        self.data = data
        self.instart = instart
        self.inend = inend
        self.bounds = [int(b) for b in block_bounds]
        assert self.bounds[0] == instart and self.bounds[-1] == inend
        self.nb = len(self.bounds) - 1
        L = inend - instart
        self.L = L
        assert L > 0

        # --- tiles ---
        tile_start, tile_nbytes, tile_block = [], [], []
        for b in range(self.nb):
            s, e = self.bounds[b] - instart, self.bounds[b + 1] - instart
            p = s
            while p < e:
                n = min(TILE, e - p)
                tile_start.append(p)
                tile_nbytes.append(n)
                tile_block.append(b)
                p += n
        self.nt = len(tile_start)
        self.ngroups = max(1, int(np.ceil(self.nt / LANES)))
        pad = self.ngroups * LANES - self.nt
        self.tile_start = np.array(tile_start + [0] * pad, np.int32)
        self.tile_nbytes = np.array(tile_nbytes + [0] * pad, np.int32)
        # Padding lanes point at block 0 but have 0 bytes -> no effect.
        self.tile_block = np.array(tile_block + [0] * pad, np.int32)

        # --- candidate tables (once per master block) ---
        cap = 16384
        while cap < L:
            cap *= 2
        self.cap = cap
        prefix_len = min(instart, spec.WINDOW_SIZE)
        total = hashmatch.PREFIX + cap + 264
        buf = np.empty(total, dtype=np.uint8)
        buf[:hashmatch.PREFIX] = _filler(hashmatch.PREFIX)
        if prefix_len:
            buf[hashmatch.PREFIX - prefix_len:hashmatch.PREFIX] = \
                data[instart - prefix_len:instart]
        buf[hashmatch.PREFIX:hashmatch.PREFIX + L] = data[instart:inend]
        buf[hashmatch.PREFIX + L:] = 0
        bp_len, bp_dist, _ = hashmatch.build_candidates(
            jnp.asarray(buf), cap,
            jnp.int32(hashmatch.PREFIX - prefix_len),
            jnp.int32(hashmatch.PREFIX + L))

        data_block = np.zeros(cap, dtype=np.int32)
        data_block[:L] = data[instart:inend]
        data_block_d = jnp.asarray(data_block)

        # Distinct byte values (static padded count -> select-chain
        # literal costs in the fused call).
        values = np.unique(data[instart:inend])
        nv = 32
        while nv < len(values):
            nv *= 2
        # > 128 distinct bytes switches run_group to the gather path,
        # where the values are unused: one shared bucket.
        if nv > 128:
            nv = 256
        values = values[:nv]
        self._byte_values = jnp.asarray(np.concatenate(
            [values, np.full(nv - len(values), values[0], np.uint8)]
        ).astype(np.int32))

        scan = scan_kernel.make_scan(TILE, LANES, KBP, interpret=interpret)
        traceback = scan_kernel.make_traceback(TILE, LANES,
                                               interpret=interpret)
        self._run_group = _make_run_group(scan, traceback, nv)
        prepare = _make_prepare_group(cap)

        def zeros():
            # Fresh buffer each time: best_pl/best_pd are donated to the
            # fused call, so no aliasing with last_pl/last_pd.
            return jnp.zeros((TILE, LANES), jnp.int32)

        self._groups = []
        for g in range(self.ngroups):
            sl = slice(g * LANES, (g + 1) * LANES)
            prep = prepare(bp_len, bp_dist, data_block_d,
                           jnp.asarray(self.tile_start[sl]),
                           jnp.asarray(self.tile_nbytes[sl]))
            blk_oh = np.zeros((LANES, self.nb), np.float32)
            lanes_used = self.tile_nbytes[sl] > 0
            blk_oh[np.arange(LANES)[lanes_used],
                   self.tile_block[sl][lanes_used]] = 1.0
            self._groups.append({
                "prep": prep,
                "tile_block": jnp.asarray(self.tile_block[sl]),
                "tile_nbytes": jnp.asarray(self.tile_nbytes[sl]),
                "blk_oh": jnp.asarray(blk_oh),
                "best": (zeros(), zeros()),
                "last": (zeros(), zeros()),
            })
        # Keep-best mask pending application (folded into the next call).
        self._pending = np.zeros(self.ngroups * LANES, bool)

    def run_iteration(self, ll_cost_b: np.ndarray, d_cost_b: np.ndarray):
        """One DP run for all blocks under per-block cost models.

        ll_cost_b: (nb, 288), d_cost_b: (nb, 32).  Returns host arrays
        (ll_hist (nb, 288) i64, d_hist (nb, 32) i64); the parse stays
        on device until keep_best / fetch_parse.
        """
        ll = jnp.asarray(np.ascontiguousarray(ll_cost_b, dtype=np.float32))
        dd = jnp.asarray(np.ascontiguousarray(d_cost_b, dtype=np.float32))
        hist = np.zeros((scan_kernel.HBINS, self.nb), np.int64)
        for g, grp in enumerate(self._groups):
            sl = slice(g * LANES, (g + 1) * LANES)
            bl_t, bd_t, dsym_t, lit_t, valid_t = grp["prep"]
            bpl, bpd = grp["best"]
            lpl, lpd = grp["last"]
            hist_b, plp, pdp, nbpl, nbpd = self._run_group(
                ll, dd, bl_t, bd_t, dsym_t, lit_t, valid_t,
                grp["tile_block"], grp["tile_nbytes"], grp["blk_oh"],
                bpl, bpd, lpl, lpd, jnp.asarray(self._pending[sl]),
                self._byte_values)
            grp["last"] = (plp, pdp)
            grp["best"] = (nbpl, nbpd)
            hist += np.asarray(hist_b).astype(np.int64)
        self._pending[:] = False
        ll_hist = np.ascontiguousarray(hist[:spec.NUM_LL].T)
        d_hist = np.ascontiguousarray(hist[spec.NUM_LL:].T)
        return ll_hist, d_hist

    def keep_best(self, improved_blocks: np.ndarray) -> None:
        """Flag the last run as best for the given blocks ((nb,) bool).

        The actual device update is folded into the next fused call (or
        into fetch_parse) — chained standalone dispatches are expensive
        on the remote transport.
        """
        imp = np.asarray(improved_blocks, bool)
        self._pending = imp[self.tile_block]

    def fetch_parse(self, which: str = "best"):
        """Pull the chosen parse (sparse per-position rows) and convert.

        Returns a list of per-block (litlens, dists) uint16 arrays in
        forward order (ascending positions ARE forward symbol order).
        """
        PL = np.empty((self.ngroups * LANES, TILE), np.int16)
        PD = np.empty_like(PL)
        for g, grp in enumerate(self._groups):
            sl = slice(g * LANES, (g + 1) * LANES)
            if which == "best":
                bpl, bpd = grp["best"]
                if self._pending[sl].any():
                    lpl, lpd = grp["last"]
                    bpl, bpd = _keep_best(bpl, bpd, lpl, lpd,
                                          jnp.asarray(self._pending[sl]))
                    grp["best"] = (bpl, bpd)
                pair = (bpl, bpd)
            else:
                pair = grp["last"]
            a, b = _to_i16_pair(*pair)
            PL[g * LANES:(g + 1) * LANES] = np.asarray(a)
            PD[g * LANES:(g + 1) * LANES] = np.asarray(b)
        if which == "best":
            self._pending[:] = False

        out = []
        t = 0
        for b in range(self.nb):
            lit_parts, dist_parts = [], []
            while t < self.nt and self.tile_block[t] == b:
                rows = np.nonzero(PL[t])[0]
                l = PL[t][rows].astype(np.int64)
                d = PD[t][rows].astype(np.uint16)
                abs_start = self.instart + int(self.tile_start[t])
                bytes_at = self.data[abs_start + rows]
                lit_parts.append(
                    np.where(l >= spec.MIN_MATCH, l,
                             bytes_at).astype(np.uint16))
                dist_parts.append(
                    np.where(l >= spec.MIN_MATCH, d, 0).astype(np.uint16))
                t += 1
            if lit_parts:
                out.append((np.concatenate(lit_parts),
                            np.concatenate(dist_parts)))
            else:
                out.append((np.zeros(0, np.uint16), np.zeros(0, np.uint16)))
        return out

    def verify_parse(self, b: int, litlens: np.ndarray,
                     dists: np.ndarray) -> bool:
        """Hash-collision guard: every match must reproduce its bytes."""
        instart = self.bounds[b]
        if len(litlens) == 0:
            return self.bounds[b + 1] == instart
        step = np.where(dists == 0, 1, litlens).astype(np.int64)
        if int(step.sum()) != self.bounds[b + 1] - instart:
            return False
        pos = np.concatenate([[0], np.cumsum(step[:-1])]) + instart
        m = dists != 0
        if not m.any():
            return True
        mp = pos[m]
        md = dists[m].astype(np.int64)
        ml = litlens[m].astype(np.int64)
        if (md > mp).any() or (md > spec.WINDOW_SIZE).any():
            return False
        total = int(ml.sum())
        offs = np.arange(total) - np.repeat(np.cumsum(ml) - ml, ml)
        dsts = np.repeat(mp, ml) + offs
        srcs = np.repeat(mp - md, ml) + offs
        return bool(np.array_equal(self.data[dsts], self.data[srcs]))
