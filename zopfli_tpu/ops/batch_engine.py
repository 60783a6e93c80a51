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
    -> per squeeze iteration: per-block cost models (tiny h2d) -> DP
       scan -> on-device pointer-doubling path extraction -> per-block
       symbol histograms (tiny d2h); exact dynamic-block bit cost from
       histograms on the host (native.hist_dynamic_cost) drives
       zopfli's keep-best / randomize / blend iteration control
    -> final parse pulled once per master block and traced back in
       native code (zt_traceback_tiles)

Device/host traffic per iteration is a few KB each way, independent of
input size; the raw bytes cross once, the chosen parse crosses once.

Tiles introduce forced path nodes at tile boundaries (like the
reference's own forced nodes at block-split boundaries,
deflate.c:845-861); with 8 KiB tiles the size impact is a few bits per
tile.
"""

from __future__ import annotations

import functools
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
_DSYM_EXTRA = np.asarray(spec.DIST_SYM_EXTRA_BITS, dtype=np.float32)
_LSYM_FULL = np.asarray(spec.LENGTH_SYMBOL, dtype=np.int32)

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


@functools.partial(jax.jit, static_argnums=(3,))
def _prepare_group(bp_len, bp_dist, data_block, cap,
                   tile_start, tile_nbytes):
    """Slice master-level candidate tables into one lane group.

    bp_len/bp_dist: (cap, KBP) int32 master tables; data_block (cap,)
    int32; tile_start/tile_nbytes: (LANES,) int32 (0-length = padding).

    Returns kernel-layout (bl_t, bd_t, dsym_t, lit_t, valid_t):
    (TILE, KBP, LANES) x3, (TILE, LANES) x2.
    """
    pos_in_tile = jnp.arange(TILE, dtype=jnp.int32)
    rows = tile_start[:, None] + pos_in_tile[None, :]     # (LANES, TILE)
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

    dsym = dist_symbol_jax(jnp.maximum(bd, 1))
    return (jnp.transpose(bl, (1, 2, 0)), jnp.transpose(bd, (1, 2, 0)),
            jnp.transpose(dsym, (1, 2, 0)), jnp.transpose(lit, (1, 0)),
            jnp.transpose(valid, (1, 0)))


@jax.jit
def _iteration_inputs(ll_cost_b, d_cost_b, dsym_t, lit_t, tile_block,
                      valid_t):
    """Per-iteration cost arrays for one lane group.

    ll_cost_b: (NB, 288) f32, d_cost_b: (NB, 32) f32 per-block models;
    tile_block: (LANES,) int32 block id per lane.
    """
    ll_t = ll_cost_b[tile_block]        # (LANES, 288)
    d_t = d_cost_b[tile_block]          # (LANES, 32)
    lanes = ll_t.shape[0]
    tile = lit_t.shape[0]

    lcost = ll_t[:, _LSYM] + _LEXTRA[None, :]       # (LANES, 256)
    lcost_vec = jnp.transpose(lcost, (1, 0))

    dsym_flat = jnp.transpose(dsym_t, (2, 0, 1)).reshape(lanes, -1)
    dcost = jnp.take_along_axis(d_t, dsym_flat, axis=1) + \
        jnp.asarray(_DSYM_EXTRA)[dsym_flat]
    bp_dcost_t = jnp.transpose(dcost.reshape(lanes, tile, KBP), (1, 2, 0))

    lit_flat = jnp.transpose(lit_t, (1, 0))
    litcost = jnp.take_along_axis(ll_t, lit_flat, axis=1)
    litcost_t = jnp.where(valid_t, jnp.transpose(litcost, (1, 0)),
                          scan_kernel.BIG)
    return bp_dcost_t, litcost_t, lcost_vec


@functools.partial(jax.jit, static_argnums=(2,))
def _extract_stats(cl, cd, nb_pad, lit_t, tile_block, tile_nbytes, cost):
    """Path extraction + per-block histograms for one lane group.

    cl/cd: (TILE+1, LANES) int32 chosen edges.  Pointer doubling from
    each tile's end yields every path node in parallel.  Returns
    (ll_hist (nb_pad,288) i32, d_hist (nb_pad,32) i32,
    block_dp_cost (nb_pad,) f32).
    """
    tile = cl.shape[0] - 1
    lanes = cl.shape[1]
    pidx = jnp.arange(tile + 1, dtype=jnp.int32)[:, None]
    nxt = jnp.clip(pidx - cl, 0, tile)               # (TILE+1, LANES)

    ks = int(np.ceil(np.log2(max(tile, 2))))
    jumps = [nxt]
    for _ in range(ks - 1):
        j = jumps[-1]
        jumps.append(jnp.take_along_axis(j, j, axis=0))

    slots = jnp.broadcast_to(tile_nbytes[None, :],
                             (tile, lanes)).astype(jnp.int32)
    ii = jnp.arange(tile, dtype=jnp.int32)[:, None]
    for k in range(ks):
        take = (ii >> k) & 1
        jumped = jnp.take_along_axis(jumps[k], slots, axis=0)
        slots = jnp.where(take == 1, jumped, slots)

    valid = slots > 0
    l = jnp.take_along_axis(cl, slots, axis=0)
    d = jnp.take_along_axis(cd, slots, axis=0)
    is_match = l >= spec.MIN_MATCH
    lsym = jnp.asarray(_LSYM_FULL)[jnp.clip(l, 0, 258)]
    lit_prev = jnp.take_along_axis(
        lit_t, jnp.clip(slots - 1, 0, tile - 1), axis=0)
    sym = jnp.where(is_match, lsym, lit_prev)
    dsym = jnp.where(is_match, dist_symbol_jax(jnp.maximum(d, 1)), 0)

    blk = jnp.broadcast_to(tile_block[None, :], (tile, lanes))
    ll_flat = jnp.where(valid, blk * spec.NUM_LL + sym, nb_pad * spec.NUM_LL)
    ll_hist = jnp.zeros(nb_pad * spec.NUM_LL + 1, jnp.int32).at[
        ll_flat.reshape(-1)].add(1)[:-1].reshape(nb_pad, spec.NUM_LL)
    d_ok = valid & is_match
    d_flat = jnp.where(d_ok, blk * spec.NUM_D + dsym, nb_pad * spec.NUM_D)
    d_hist = jnp.zeros(nb_pad * spec.NUM_D + 1, jnp.int32).at[
        d_flat.reshape(-1)].add(1)[:-1].reshape(nb_pad, spec.NUM_D)

    fin = jnp.take_along_axis(
        cost, jnp.clip(tile_nbytes[None, :] - 1, 0, tile - 1), axis=0)[0]
    fin = jnp.where(tile_nbytes > 0, fin, 0.0)
    blk_cost = jnp.zeros(nb_pad + 1, jnp.float32).at[
        jnp.where(tile_nbytes > 0, tile_block, nb_pad)].add(fin)[:-1]
    return ll_hist, d_hist, blk_cost


@jax.jit
def _keep_best(best_cl, best_cd, cl, cd, improved_lane):
    m = improved_lane[None, :]
    return (jnp.where(m, cl, best_cl), jnp.where(m, cd, best_cd))


@jax.jit
def _to_i16_pair(cl, cd):
    return (jnp.transpose(cl).astype(jnp.int16),
            jnp.transpose(cd).astype(jnp.int16))


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
            # run the kernel in interpret mode.
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

        self._scan = scan_kernel.make_scan(TILE, LANES, KBP,
                                           interpret=interpret)
        self._groups = []
        for g in range(self.ngroups):
            sl = slice(g * LANES, (g + 1) * LANES)
            prep = _prepare_group(
                bp_len, bp_dist, data_block_d, cap,
                jnp.asarray(self.tile_start[sl]),
                jnp.asarray(self.tile_nbytes[sl]))
            self._groups.append({
                "prep": prep,
                "tile_block": jnp.asarray(self.tile_block[sl]),
                "tile_nbytes": jnp.asarray(self.tile_nbytes[sl]),
                "best": None,
                "last": None,
            })

    def run_iteration(self, ll_cost_b: np.ndarray, d_cost_b: np.ndarray):
        """One DP run for all blocks under per-block cost models.

        ll_cost_b: (nb, 288), d_cost_b: (nb, 32).  Returns host arrays
        (ll_hist (nb, 288), d_hist (nb, 32), dp_cost (nb,)); the parse
        stays on device until keep_best / fetch_parse.
        """
        ll = jnp.asarray(np.ascontiguousarray(ll_cost_b, dtype=np.float32))
        dd = jnp.asarray(np.ascontiguousarray(d_cost_b, dtype=np.float32))
        ll_hist = np.zeros((self.nb, spec.NUM_LL), np.int64)
        d_hist = np.zeros((self.nb, spec.NUM_D), np.int64)
        dp_cost = np.zeros(self.nb, np.float64)
        for grp in self._groups:
            bl_t, bd_t, dsym_t, lit_t, valid_t = grp["prep"]
            bp_dcost_t, litcost_t, lcost_vec = _iteration_inputs(
                ll, dd, dsym_t, lit_t, grp["tile_block"], valid_t)
            cl, cd, cost = self._scan(bl_t, bd_t, bp_dcost_t, litcost_t,
                                      lcost_vec)
            grp["last"] = (cl, cd)
            lh, dh, bc = _extract_stats(cl, cd, self.nb, lit_t,
                                        grp["tile_block"],
                                        grp["tile_nbytes"], cost)
            ll_hist += np.asarray(lh, dtype=np.int64)
            d_hist += np.asarray(dh, dtype=np.int64)
            dp_cost += np.asarray(bc, dtype=np.float64)
        return ll_hist, d_hist, dp_cost

    def keep_best(self, improved_blocks: np.ndarray) -> None:
        """Adopt the last run as best for blocks flagged True ((nb,) bool)."""
        imp = np.asarray(improved_blocks, bool)
        lane_imp = imp[self.tile_block]
        for g, grp in enumerate(self._groups):
            sl = slice(g * LANES, (g + 1) * LANES)
            if grp["best"] is None:
                grp["best"] = grp["last"]
            else:
                bcl, bcd = grp["best"]
                lcl, lcd = grp["last"]
                grp["best"] = _keep_best(bcl, bcd, lcl, lcd,
                                         jnp.asarray(lane_imp[sl]))

    def fetch_parse(self, which: str = "best"):
        """Pull the chosen parse and trace it back natively.

        Returns a list of per-block (litlens, dists) uint16 arrays.
        """
        from .. import native
        cl16 = np.empty((self.ngroups * LANES, TILE + 1), np.int16)
        cd16 = np.empty_like(cl16)
        for g, grp in enumerate(self._groups):
            pair = grp[which] if grp[which] is not None else grp["last"]
            a, b = _to_i16_pair(*pair)
            cl16[g * LANES:(g + 1) * LANES] = np.asarray(a)
            cd16[g * LANES:(g + 1) * LANES] = np.asarray(b)

        out = []
        t = 0
        for b in range(self.nb):
            idxs = []
            while t < self.nt and self.tile_block[t] == b:
                idxs.append(t)
                t += 1
            data_tiles = np.zeros((len(idxs), TILE), np.uint8)
            for r, ti in enumerate(idxs):
                s = self.instart + self.tile_start[ti]
                n = self.tile_nbytes[ti]
                data_tiles[r, :n] = self.data[s:s + n]
            lit, dst = native.traceback_tiles(
                cl16[idxs], cd16[idxs], data_tiles,
                self.tile_nbytes[idxs].astype(np.int64))
            out.append((lit, dst))
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
