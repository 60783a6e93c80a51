"""Fused multi-master TPU squeeze engine.

Round-1's MasterBatch ran one device dispatch per squeeze iteration per
master, with the iteration control (exact keep-best cost, stats
feedback, randomization — reference squeeze.c:446-526) on the host:
15 host round trips per master, and a tail master paid the full
lockstep kernel cost for a near-empty lane group.

This engine removes both costs:

  - Tiles from ALL masters of an input share the same fixed-size lane
    groups (a 48 KB tail master adds 6 lanes to the 1 MB master's 123
    instead of its own half-empty dispatch chain).
  - The ENTIRE iteration loop runs inside one jitted lax.fori_loop:
    per iteration, cost expansion -> Pallas DP scan -> Pallas traceback
    -> per-block histograms -> exact dynamic-block cost
    (ops.costmodel, integer-identical to the native engine) ->
    keep-best update -> stats feedback/blending/randomization, all on
    device.  The host sees ONE dispatch per master batch and pulls the
    chosen parses once, compacted (paths are sparse; positions are
    reconstructible from the symbol sequence, so each row packs into
    one int32).

Shape discipline (axon compiles cost minutes and are not persistently
cached): candidate tables are bucketed to power-of-two caps, the block
axis is padded to power-of-two NB, byte-value counts to the existing
buckets, so a handful of compiled variants serve any input.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import spec
from . import costmodel, hashmatch, scan_kernel

KBP = hashmatch.MAX_BP
TILE = int(os.environ.get("ZT_TILE", "8192"))
LANES = int(os.environ.get("ZT_LANES", "256"))
TIE_GRID = float(os.environ.get("ZT_TIE_GRID", "128"))  # 0 = off
MAX_EVENTS = 48          # randomization events cap; replicas start at
                         # staggered offsets into the same map stream
LARGE_COST = np.int32(1 << 30)

_LSYM = np.asarray(spec.LENGTH_SYMBOL[3:259], dtype=np.int32)
_LEXTRA = np.asarray(spec.LENGTH_EXTRA_BITS[3:259], dtype=np.float32)
_DSYM_EXTRA = np.zeros(spec.NUM_D, dtype=np.float32)
_DSYM_EXTRA[:30] = spec.DIST_SYM_EXTRA_BITS


class FetchOverflow(Exception):
    """Legacy marker (the overflow path now pulls the resident path
    tensor instead of re-running; kept for API compatibility)."""


# Diagnostic counter: a fetch-cap overflow pulls the full (G, TILE,
# LANES) path tensor over the slow d2h link instead of the compact
# rows, so perf regressions could hide here — bench.py reports it.
FETCH_RETRIES = [0]


def _dist_symbol_jax(dist: jnp.ndarray) -> jnp.ndarray:
    d1 = jnp.maximum(dist - 1, 1)
    lg = 31 - jax.lax.clz(d1)
    r = (d1 >> jnp.maximum(lg - 1, 0)) & 1
    return jnp.where(dist < 5, dist - 1, 2 * lg + r).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _make_prepare_group(cap_total: int):
    @jax.jit
    def prepare(bp_len, bp_dist, data_block, tile_start, tile_nbytes):
        """Slice combined candidate tables into one lane group's layout."""
        pos_in_tile = jnp.arange(TILE, dtype=jnp.int32)
        rows = tile_start[:, None] + pos_in_tile[None, :]   # (LANES, TILE)
        rows_c = jnp.clip(rows, 0, cap_total - 1)
        bl = bp_len[rows_c]
        bd = bp_dist[rows_c]
        lit = data_block[rows_c]
        maxlen = tile_nbytes[:, None] - pos_in_tile[None, :]
        bl = jnp.minimum(bl, maxlen[:, :, None])
        bl = jnp.where(bl >= spec.MIN_MATCH, bl, 0)
        valid = pos_in_tile[None, :] < tile_nbytes[:, None]
        bl = jnp.where(valid[:, :, None], bl, 0)
        dsym = _dist_symbol_jax(jnp.maximum(bd, 1)).astype(jnp.int8)
        return (jnp.transpose(bl, (1, 2, 0)), jnp.transpose(bd, (1, 2, 0)),
                jnp.transpose(dsym, (1, 2, 0)), jnp.transpose(lit, (1, 0)),
                jnp.transpose(valid, (1, 0)))
    return prepare


def _filler(n: int) -> np.ndarray:
    return (np.arange(n, dtype=np.uint32) * 2654435761 >> 13).astype(np.uint8)


def _loop_pieces(scan, traceback, ngroups: int, nb_pad: int,
                 nbyte_values: int, fetch_cap: int, mesh=None,
                 axis: str = "blocks"):
    """Shared builders for the fused iteration loop.

    Returns (make_body, init_state, finish) — unjitted closures used by
    _make_run_all (standalone dispatch) and ops.mega (the megafused
    seed+split+squeeze single-dispatch program).
    """
    symtab = np.asarray(scan_kernel.symbol_range_table(), dtype=np.int32)
    HB = scan_kernel.HBINS
    G = ngroups
    W = scan_kernel.W

    def make_body(bl_t, bd_t, dsym_t, lit_t, valid_t,
                  tile_block, tile_nbytes, blk_oh,
                  byte_values, ll_maps, d_maps, rep_off):
        # Row-major group-flattened layouts: bl_t/bd_t/dsym_t
        # (G*TILE, KBP, LANES), lit_t/valid_t (G*TILE, LANES);
        # tile_block/tile_nbytes (G, LANES); blk_oh (G, LANES, nb_pad);
        # seed_ll: (nb_pad, 288) i32.
        dsym_g = dsym_t.reshape(G, TILE, KBP, LANES)
        lit_g = lit_t.reshape(G, TILE, LANES)

        def one_iteration(stats_ll, stats_d):
            """DP run under the entropy model of the given stats.

            Model costs are quantized to a 1/128-bit grid: per-tile
            path sums of grid multiples stay EXACT in f32 (tile cost
            << 2^24/128 bits), so cost ties are real ties and the
            kernel's relaxation order resolves them toward the longer
            match — the reference DP's tie behavior (squeeze.c:288-302
            keeps the earliest relaxation).  Without this, f32 ulp
            noise breaks true ties randomly and the final exact size
            pays ~0.1% in scattered histograms.
            """
            ll_cost_b = costmodel.calculate_entropy(stats_ll)
            d_cost_b = costmodel.calculate_entropy(stats_d)
            if TIE_GRID:
                grid = np.float32(TIE_GRID)
                ll_cost_b = jnp.round(ll_cost_b * grid) / grid
                d_cost_b = jnp.round(d_cost_b * grid) / grid
            ll_t = ll_cost_b[tile_block]           # (G, LANES, 288)
            d_t = d_cost_b[tile_block]             # (G, LANES, 32)
            lcost_vec = jnp.transpose(ll_t[:, :, _LSYM]
                                      + _LEXTRA[None, None, :],
                                      (0, 2, 1)).reshape(G * W, LANES)
            dplus = d_t + _DSYM_EXTRA[None, None, :]   # (G, LANES, 30)
            bp_dcost = jnp.zeros(dsym_g.shape, jnp.float32)
            for s in range(30):
                bp_dcost = jnp.where(dsym_g == np.int8(s),
                                     dplus[:, None, None, :, s], bp_dcost)
            if nbyte_values <= 128:
                litcost = jnp.zeros(lit_g.shape, jnp.float32)
                for k in range(nbyte_values):
                    v = byte_values[k]
                    litcost = jnp.where(lit_g == v,
                                        ll_t[:, None, :, v], litcost)
            else:
                litcost = jnp.transpose(jnp.take_along_axis(
                    ll_t, jnp.transpose(lit_g, (0, 2, 1)), axis=2),
                    (0, 2, 1))
            litcost = jnp.where(valid_t.reshape(G, TILE, LANES), litcost,
                                scan_kernel.BIG)

            ce, _ = scan(bl_t, bd_t,
                         bp_dcost.reshape(G * TILE, KBP, LANES),
                         litcost.reshape(G * TILE, LANES), lcost_vec)
            hist_g, pep = traceback(ce, lit_t, tile_nbytes,
                                    jnp.asarray(symtab))
            hist = jnp.einsum(
                "ghl,glb->hb", hist_g.reshape(G, HB, LANES), blk_oh,
                precision=jax.lax.Precision.HIGHEST)
            if mesh is not None:
                hist = jax.lax.psum(hist, axis)
            ll_hist = jnp.transpose(hist[:spec.NUM_LL]).astype(jnp.int32)
            d_hist = jnp.transpose(hist[spec.NUM_LL:]).astype(jnp.int32)
            return ll_hist, d_hist, pep.reshape(G, TILE, LANES)

        def body(i, state):
            (stats_ll, stats_d, best_cost, best_sll, best_sd,
             last_cost, last_rand, ec, best_pe) = state

            ll_hist, d_hist, pep = one_iteration(stats_ll, stats_d)

            # Exact dynamic-block bits incl. 3-bit header (squeeze.c:492).
            cost = 3 + costmodel.hist_dynamic_cost(ll_hist, d_hist)
            improved = cost < best_cost
            best_cost = jnp.where(improved, cost, best_cost)
            best_sll = jnp.where(improved[:, None], stats_ll, best_sll)
            best_sd = jnp.where(improved[:, None], stats_d, best_sd)
            lane_imp = improved[tile_block]            # (G, LANES)
            m = lane_imp[:, None, :]
            best_pe = jnp.where(m, pep, best_pe)

            # Stats feedback (squeeze.c:503-517).  Counts are integers;
            # trunc(new + 0.5*last) == new + last // 2 exactly.
            new_ll = ll_hist.at[:, 256].set(1)
            blended_ll = (new_ll + stats_ll // 2).at[:, 256].set(1)
            blended_d = d_hist + stats_d // 2
            blend = (last_rand != -1)[:, None]
            next_ll = jnp.where(blend, blended_ll, new_ll)
            next_d = jnp.where(blend, blended_d, d_hist)

            stuck = (i > 5) & (cost == last_cost)
            # Replica rows draw from a staggered window of the map
            # stream: each restart explores a different randomization
            # trajectory (plain restarts converge to the same optimum).
            ecc = jnp.minimum(ec + rep_off, MAX_EVENTS - 1)
            rnd_ll = jnp.take_along_axis(
                best_sll, ll_maps[ecc], axis=1).at[:, 256].set(1)
            rnd_d = jnp.take_along_axis(best_sd, d_maps[ecc], axis=1)
            next_ll = jnp.where(stuck[:, None], rnd_ll, next_ll)
            next_d = jnp.where(stuck[:, None], rnd_d, next_d)
            ec = ec + stuck.astype(jnp.int32)
            last_rand = jnp.where(stuck, i, last_rand)

            return (next_ll, next_d, best_cost, best_sll, best_sd,
                    cost, last_rand, ec, best_pe)

        return body

    def init_state(seed_ll, seed_d, g: int = ngroups):
        return (seed_ll, seed_d,
                jnp.full((nb_pad,), LARGE_COST, jnp.int32),
                jnp.zeros((nb_pad, spec.NUM_LL), jnp.int32),
                jnp.zeros((nb_pad, spec.NUM_D), jnp.int32),
                jnp.zeros((nb_pad,), jnp.int32),
                jnp.full((nb_pad,), -1, jnp.int32),
                jnp.zeros((nb_pad,), jnp.int32),
                jnp.zeros((g, TILE, LANES), jnp.int32))

    def finish(state):
        (_, _, best_cost, best_sll, best_sd, _, _, _, best_pe) = state

        # Compact each lane's sparse packed path rows to the front
        # (stable sort by emptiness keeps rows position-ordered);
        # positions are implied by the symbol sequence, and the packed
        # len | dist << 9 format is exactly what the host decode reads.
        # best_pe is ALSO returned (device-resident, never transferred
        # unless read): a lane overflowing fetch_cap pulls it instead
        # of re-running the whole iteration loop at full fetch.
        empty = (best_pe == 0).astype(jnp.int32)        # (G, TILE, LANES)
        _, pe_c = jax.lax.sort(
            (empty, best_pe), num_keys=1, is_stable=True, dimension=1)
        nsym = jnp.sum(1 - empty, axis=1)               # (G, LANES)
        packed = pe_c[:, :fetch_cap, :]
        return best_cost, best_sll, best_sd, nsym, packed, best_pe

    return make_body, init_state, finish


@functools.lru_cache(maxsize=None)
def _make_run_all(scan, traceback, ngroups: int, nb_pad: int,
                  nbyte_values: int, fetch_cap: int,
                  interpret: bool = False, mesh=None, axis: str = "blocks"):
    """The single-dispatch squeeze: all iterations, all groups.

    Group tensors arrive stacked on a leading axis.  Returns the final
    best parses (compacted per lane), exact best costs, and the best
    stats (the host fallback uses them on hash-collision verify
    failure).

    On TPU the whole iteration loop is ONE jitted lax.fori_loop.  In
    interpret mode (CPU tests) the same jitted body runs under a host
    Python loop instead: XLA:CPU takes >8 min to compile the cost
    stack (sorts in package_merge) inside a while body, while the body
    alone compiles in seconds.  Identical math either way.

    With `mesh`, everything runs under shard_map: group tensors are
    sharded over `axis` (ngroups here is the per-device group count;
    the caller pads total groups to a device multiple), the per-block
    iteration-control state is computed redundantly on every device,
    and the ONE collective is a psum of the per-device block histogram
    contributions (SURVEY §5 distributed-backend design: compression is
    data-parallel; only observability/stats cross devices).
    """
    make_body, init_state, finish = _loop_pieces(
        scan, traceback, ngroups, nb_pad, nbyte_values, fetch_cap,
        mesh=mesh, axis=axis)

    # shard_map partition specs: group-major tensors sharded over the
    # mesh axis, iteration-control/per-block state replicated.
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        ax = axis
        TENS_SPECS = (P(ax, None, None), P(ax, None, None),
                      P(ax, None, None), P(ax, None), P(ax, None),
                      P(ax, None), P(ax, None), P(ax, None, None),
                      P(), P(), P(), P())
        STATE_SPECS = (P(), P(), P(), P(), P(), P(), P(), P(),
                       P(ax, None, None))
        OUT_SPECS = (P(), P(), P(), P(ax, None), P(ax, None, None),
                     P(ax, None, None))

        def smap(fn, in_specs, out_specs):
            return shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    if not interpret:
        def run_core(bl_t, bd_t, dsym_t, lit_t, valid_t,
                     tile_block, tile_nbytes, blk_oh,
                     seed_ll, seed_d, byte_values, ll_maps, d_maps,
                     rep_off, n_iter):
            body = make_body(bl_t, bd_t, dsym_t, lit_t, valid_t,
                             tile_block, tile_nbytes, blk_oh,
                             byte_values, ll_maps, d_maps, rep_off)
            state = jax.lax.fori_loop(0, n_iter, body,
                                      init_state(seed_ll, seed_d))
            return finish(state)

        if mesh is None:
            return jax.jit(run_core)
        return jax.jit(smap(
            run_core,
            in_specs=TENS_SPECS[:8] + (P(), P(), P(), P(), P(), P(), P()),
            out_specs=OUT_SPECS))

    def step_core(i, state, bl_t, bd_t, dsym_t, lit_t, valid_t,
                  tile_block, tile_nbytes, blk_oh, byte_values,
                  ll_maps, d_maps, rep_off):
        body = make_body(bl_t, bd_t, dsym_t, lit_t, valid_t,
                         tile_block, tile_nbytes, blk_oh,
                         byte_values, ll_maps, d_maps, rep_off)
        return body(i, state)

    if mesh is None:
        step = jax.jit(step_core)
        finish_j = jax.jit(finish)
    else:
        step = jax.jit(smap(step_core,
                            in_specs=(P(), STATE_SPECS) + TENS_SPECS,
                            out_specs=STATE_SPECS))
        finish_j = jax.jit(smap(finish, in_specs=(STATE_SPECS,),
                                out_specs=OUT_SPECS))

    def run_all(bl_t, bd_t, dsym_t, lit_t, valid_t,
                tile_block, tile_nbytes, blk_oh,
                seed_ll, seed_d, byte_values, ll_maps, d_maps,
                rep_off, n_iter):
        tens = (bl_t, bd_t, dsym_t, lit_t, valid_t,
                tile_block, tile_nbytes, blk_oh, byte_values,
                ll_maps, d_maps, rep_off)
        # Host-loop path: the state crosses the shard_map boundary, so
        # build it at GLOBAL shape (the specs shard it per device).
        g_total = ngroups * (mesh.size if mesh is not None else 1)
        state = init_state(seed_ll, seed_d, g_total)
        for i in range(int(n_iter)):
            state = step(jnp.int32(i), state, *tens)
        return finish_j(state)

    return run_all


class FusedSqueeze:
    """Device context for a batch of masters' fused squeeze.

    masters: list of (instart, inend, block_bounds) with block_bounds =
    [instart, b1, ..., inend] from the host splitter.  Block and tile
    bookkeeping is global across masters; candidate tables are built
    per master (window halo semantics per SURVEY §5) and concatenated.
    """

    def __init__(self, data: np.ndarray, masters,
                 interpret: bool | None = None, mesh=None,
                 axis: str = "blocks", cand=None, window_starts=None):
        """cand: optional per-master [(bp_len, bp_dist)] device arrays
        of shape (cap(master), KBP) — reused from the seed program
        instead of rebuilding (they depend only on the input bytes).
        window_starts: per-master first byte the LZ77 window may reach
        back to (default 0 = all preceding bytes; multi-file batches
        concatenate independent inputs, so matches must not cross)."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.mesh = mesh
        self.axis = axis
        self.data = data
        self.masters = [(int(s), int(e), [int(b) for b in bb])
                        for (s, e, bb) in masters]
        for s, e, bb in self.masters:
            assert bb[0] == s and bb[-1] == e and e > s
        if window_starts is None:
            window_starts = [0] * len(self.masters)
        self.window_starts = [int(w) for w in window_starts]
        # Per-block window start (blocks are global across masters).
        self.block_wstart = []
        for (s, e, bb), w in zip(self.masters, self.window_starts):
            self.block_wstart.extend([w] * (len(bb) - 1))

        # --- global blocks & tiles ---
        self.block_bounds = []     # global list of (start, end)
        tile_start, tile_nbytes, tile_block, tile_abs = [], [], [], []
        caps = []
        row = 0                    # row offset in the combined tables
        for (instart, inend, bb) in self.masters:
            L = inend - instart
            cap = 16384
            while cap < L:
                cap *= 2
            caps.append(cap)
            for b in range(len(bb) - 1):
                gb = len(self.block_bounds)
                self.block_bounds.append((bb[b], bb[b + 1]))
                s, e = bb[b] - instart, bb[b + 1] - instart
                p = s
                while p < e:
                    n = min(TILE, e - p)
                    tile_start.append(row + p)
                    tile_nbytes.append(n)
                    tile_block.append(gb)
                    tile_abs.append(instart + p)
                    p += n
            row += cap
        self.nb = len(self.block_bounds)
        nt0 = len(tile_start)
        ngroups = max(1, -(-nt0 // LANES))
        # Bucket to a power of two: each distinct group count is a fresh
        # multi-minute Pallas compile on the remote backend, so the
        # kernel geometry set must stay log-bounded.  Padded groups are
        # empty lanes (zero blk_oh) — wasted grid steps, never wrong.
        g = 1
        while g < ngroups:
            g *= 2
        ngroups = g
        if mesh is not None:
            # Also a device multiple: empty groups shard cleanly.
            d = mesh.size
            ngroups = -(-ngroups // d) * d
        self.ngroups = ngroups

        # Replica restarts: the bucketed geometry leaves free lanes; fill
        # them with COPIES of blocks seeded differently (dispatch
        # perturbs replica seeds).  Each replica is an independent
        # restart of the squeeze search — collect() keeps the best parse
        # per original block by exact cost.  Extra search at near-zero
        # marginal kernel time (the padded grid steps run either way).
        self.replica_of = list(range(self.nb))
        block_tiles = {}
        for t, b in enumerate(tile_block):
            block_tiles.setdefault(b, []).append(t)
        free = ngroups * LANES - nt0
        order = sorted(range(self.nb),
                       key=lambda b: -len(block_tiles.get(b, [])))
        for _round in range(int(os.environ.get("ZT_REPLICAS", "2"))):
            for b in order:
                ts = block_tiles.get(b, [])
                if not ts or len(ts) > free:
                    continue
                rb = len(self.replica_of)
                self.replica_of.append(b)
                for t in ts:
                    tile_start.append(tile_start[t])
                    tile_nbytes.append(tile_nbytes[t])
                    tile_block.append(rb)
                    tile_abs.append(tile_abs[t])
                free -= len(ts)
        self.nb_total = len(self.replica_of)
        self.nb_pad = 4
        while self.nb_pad < self.nb_total:
            self.nb_pad *= 2
        self.nt = len(tile_start)
        pad = self.ngroups * LANES - self.nt
        self.tile_start = np.array(tile_start + [0] * pad, np.int32)
        self.tile_nbytes = np.array(tile_nbytes + [0] * pad, np.int32)
        self.tile_block = np.array(tile_block + [0] * pad, np.int32)
        self.tile_abs = np.array(tile_abs + [0] * pad, np.int64)

        # --- combined candidate tables (bucketed total cap) ---
        cap_total = 16384
        while cap_total < row:
            cap_total *= 2
        self.cap_total = cap_total

        bp_len_parts, bp_dist_parts, data_parts = [], [], []
        for mi, ((instart, inend, _), cap) in enumerate(
                zip(self.masters, caps)):
            L = inend - instart
            if cand is not None and cand[mi] is not None:
                bl, bd = cand[mi]
                assert bl.shape == (cap, KBP), (bl.shape, cap, KBP)
            else:
                prefix_len = min(instart - self.window_starts[mi],
                                 spec.WINDOW_SIZE)
                total = hashmatch.PREFIX + cap + 264
                buf = np.empty(total, dtype=np.uint8)
                buf[:hashmatch.PREFIX] = _filler(hashmatch.PREFIX)
                if prefix_len:
                    buf[hashmatch.PREFIX - prefix_len:hashmatch.PREFIX] = \
                        data[instart - prefix_len:instart]
                buf[hashmatch.PREFIX:hashmatch.PREFIX + L] = \
                    data[instart:inend]
                buf[hashmatch.PREFIX + L:] = 0
                bl, bd, _ = hashmatch.build_candidates(
                    jnp.asarray(buf), cap,
                    jnp.int32(hashmatch.PREFIX - prefix_len),
                    jnp.int32(hashmatch.PREFIX + L),
                    max_bp=KBP, **hashmatch.current_knobs())
            bp_len_parts.append(bl)
            bp_dist_parts.append(bd)
            dblock = np.zeros(cap, dtype=np.int32)
            dblock[:L] = data[instart:inend]
            data_parts.append(dblock)

        pad_rows = cap_total - row
        if pad_rows:
            bp_len_parts.append(jnp.zeros((pad_rows, KBP), jnp.int32))
            bp_dist_parts.append(jnp.zeros((pad_rows, KBP), jnp.int32))
            data_parts.append(np.zeros(pad_rows, np.int32))
        bp_len = jnp.concatenate(bp_len_parts, axis=0)
        bp_dist = jnp.concatenate(bp_dist_parts, axis=0)
        data_block_d = jnp.asarray(np.concatenate(data_parts))

        # --- byte-value select chain (union across masters) ---
        values = np.unique(np.concatenate(
            [data[s:e] for (s, e, _) in self.masters]))
        nv = 32
        while nv < len(values):
            nv *= 2
        if nv > 128:
            nv = 256
        if interpret:
            # One compiled shape for CPU test runs: always gather.
            nv = 256
        values = values[:nv]
        self._byte_values = jnp.asarray(np.concatenate(
            [values, np.full(max(nv - len(values), 0), values[0], np.uint8)]
        ).astype(np.int32))
        self._nv = nv

        # --- prepared group tensors, stacked over groups ---
        prepare = _make_prepare_group(cap_total)
        preps = []
        blk_oh = np.zeros((self.ngroups, LANES, self.nb_pad), np.float32)
        for g in range(self.ngroups):
            sl = slice(g * LANES, (g + 1) * LANES)
            preps.append(prepare(bp_len, bp_dist, data_block_d,
                                 jnp.asarray(self.tile_start[sl]),
                                 jnp.asarray(self.tile_nbytes[sl])))
            used = self.tile_nbytes[sl] > 0
            blk_oh[g, np.arange(LANES)[used], self.tile_block[sl][used]] = 1.0
        # Flatten the group axis into rows (grouped-kernel layout).
        self._prep = tuple(
            jnp.concatenate([p[i] for p in preps], axis=0)
            for i in range(5))
        # Compact-fetch cap: the seed program predicts per-lane path
        # rows exactly (seed parses bound the stat parses' density in
        # practice, with 1.5x headroom; overflow pulls the raw path
        # tensor) — dense masters dispatch with a full-TILE fetch up
        # front to keep even that pull compact.
        self.default_fetch_cap = TILE // 2
        self._blk_oh = jnp.asarray(blk_oh)
        self._tile_block_d = jnp.asarray(
            self.tile_block.reshape(self.ngroups, LANES))
        self._tile_nbytes_d = jnp.asarray(
            self.tile_nbytes.reshape(self.ngroups, LANES))
        self._interpret = interpret

    def run(self, seed_ll: np.ndarray, seed_d: np.ndarray,
            numiterations: int, fetch_cap: int | None = None):
        """Run the full squeeze; returns per-block parses + costs.

        seed_ll: (nb, 288) counts, seed_d: (nb, 32).
        Returns (parses, best_cost, best_sll, best_sd): parses is a
        list of (litlens, dists) uint16 arrays per global block.
        Lanes exceeding fetch_cap rows fall back to pulling the raw
        device-resident path tensor (FETCH_RETRIES counts it).
        """
        return self.collect(self.dispatch(seed_ll, seed_d, numiterations))

    def dispatch(self, seed_ll: np.ndarray, seed_d: np.ndarray,
                 numiterations: int, fetch_cap: int | None = None):
        """Queue the device loop; returns an opaque handle for collect().

        Dispatch is async — the caller can do host work (splitting,
        emission of a previous batch) while the device runs.
        """
        if fetch_cap is None:
            fetch_cap = self.default_fetch_cap
        # Under a mesh the Pallas kernels and run_all body see the
        # per-device group count; shard_map splits the group axis.
        g_local = (self.ngroups // self.mesh.size
                   if self.mesh is not None else self.ngroups)
        scan = scan_kernel.make_scan(TILE, LANES, KBP,
                                     interpret=self._interpret,
                                     groups=g_local)
        traceback = scan_kernel.make_traceback(TILE, LANES,
                                               interpret=self._interpret,
                                               groups=g_local)
        run_all = _make_run_all(scan, traceback, g_local, self.nb_pad,
                                self._nv, fetch_cap,
                                interpret=self._interpret,
                                mesh=self.mesh, axis=self.axis)

        sll = np.zeros((self.nb_pad, spec.NUM_LL), np.int32)
        sd = np.zeros((self.nb_pad, spec.NUM_D), np.int32)
        sll[:self.nb] = seed_ll
        sd[:self.nb] = seed_d
        # Replica seeds: perturbed copies of the original block's seed
        # stats (restart diversification; replica 0 of each block keeps
        # the reference-faithful greedy seed).  A block's FIRST replica
        # gets a CHAOTIC seed: all weight on its most common literal.
        # Its iteration-1 cost model is absurd, which makes iteration 2
        # restart from the stats of an out-of-distribution parse — an
        # aggressive exploration trajectory that keep-best can only
        # benefit from.  (Found by accident: a seed-stats corruption
        # bug produced exactly this shape and measured 0.24% SMALLER
        # than the honest seed on 1 MB text; ZT_REPLICA_CHAOS=0
        # restores perturbed-only replicas.)
        chaos = os.environ.get("ZT_REPLICA_CHAOS", "1") != "0"
        ordinal: dict[int, int] = {}
        for rb in range(self.nb, self.nb_total):
            b = self.replica_of[rb]
            ordinal[b] = ordinal.get(b, 0) + 1
            rng = np.random.default_rng(0xA5F00D + rb)
            if chaos and ordinal[b] == 1:
                top = int(np.argmax(seed_ll[b, :256]))
                sll[rb] = 0
                sll[rb, top] = max(int(seed_ll[b].sum()), 1)
                sd[rb] = 0
            else:
                for dst, src in ((sll, seed_ll), (sd, seed_d)):
                    row = src[b].astype(np.int32).copy()
                    mask = rng.random(row.shape[0]) < (1.0 / 3.0)
                    take = rng.integers(0, row.shape[0], row.shape[0])
                    row[mask] = src[b][take[mask]]
                    dst[rb] = row
            sll[rb, 256] = 1
        ll_maps, d_maps = costmodel.randomize_maps(MAX_EVENTS)

        # Staggered randomization-stream offsets per replica ordinal.
        rep_off = np.zeros(self.nb_pad, np.int32)
        seen: dict[int, int] = {}
        for rb in range(self.nb, self.nb_total):
            b = self.replica_of[rb]
            seen[b] = seen.get(b, 0) + 1
            rep_off[rb] = 9 * seen[b]

        out = run_all(
            *self._prep, self._tile_block_d, self._tile_nbytes_d,
            self._blk_oh, jnp.asarray(sll), jnp.asarray(sd),
            self._byte_values, jnp.asarray(np.asarray(ll_maps)),
            jnp.asarray(np.asarray(d_maps)), jnp.asarray(rep_off),
            jnp.int32(numiterations))
        return (out, seed_ll, seed_d, numiterations, fetch_cap)

    def collect(self, handle):
        """Block on a dispatch() handle and decode the parses."""
        ((best_cost, best_sll, best_sd, nsym, packed, best_pe),
         seed_ll, seed_d, numiterations, fetch_cap) = handle

        nsym_h = np.asarray(nsym).reshape(-1)        # (G*LANES,)
        over = (nsym_h[:self.nt] > fetch_cap).any()
        if over:
            # Dense parses (e.g. a dense master sharing a chunk with
            # text): pull the device-resident raw path tensor instead
            # of re-running the whole iteration loop at full fetch
            # (the pre-r5 retry doubled the chunk's device time).
            FETCH_RETRIES[0] += 1
            pe_h = np.asarray(best_pe)               # (G, TILE, LANES)
        else:
            packed_h = np.asarray(packed)            # (G, cap, LANES)
        cost_all = np.asarray(best_cost)[:self.nb_total]
        best_sll = np.asarray(best_sll)
        best_sd = np.asarray(best_sd)

        def decode(tiles):
            lit_parts, dist_parts = [], []
            for t in tiles:
                g, lane = divmod(t, LANES)
                if over:
                    rows = pe_h[g, :, lane]
                    rows = rows[rows != 0].astype(np.int64)
                else:
                    k = int(nsym_h[t])
                    rows = packed_h[g, :k, lane].astype(np.int64)
                pl = rows & 0x1FF
                pd = rows >> 9
                # Positions are implied: literal rows step 1 (pl == 1),
                # match rows step pl.
                pos = np.concatenate([[0], np.cumsum(pl[:-1])])
                bytes_at = self.data[self.tile_abs[t] + pos]
                lit_parts.append(np.where(pl >= spec.MIN_MATCH, pl,
                                          bytes_at).astype(np.uint16))
                dist_parts.append(np.where(pl >= spec.MIN_MATCH, pd,
                                           0).astype(np.uint16))
            if lit_parts:
                return (np.concatenate(lit_parts),
                        np.concatenate(dist_parts))
            return (np.zeros(0, np.uint16), np.zeros(0, np.uint16))

        block_tiles: dict[int, list[int]] = {}
        for t in range(self.nt):
            block_tiles.setdefault(int(self.tile_block[t]), []).append(t)

        # Best replica per original block by exact device cost.
        chosen = list(range(self.nb))
        for rb in range(self.nb, self.nb_total):
            b = self.replica_of[rb]
            if cost_all[rb] < cost_all[chosen[b]]:
                chosen[b] = rb
        parses = [decode(block_tiles.get(chosen[b], []))
                  for b in range(self.nb)]
        best_cost = cost_all[chosen]
        best_sll = best_sll[chosen]
        best_sd = best_sd[chosen]
        return parses, best_cost, best_sll, best_sd

    def verify_parse(self, b: int, litlens: np.ndarray,
                     dists: np.ndarray) -> bool:
        """Hash-collision guard: every match must reproduce its bytes."""
        instart, inend = self.block_bounds[b]
        if len(litlens) == 0:
            return inend == instart
        step = np.where(dists == 0, 1, litlens).astype(np.int64)
        if int(step.sum()) != inend - instart:
            return False
        pos = np.concatenate([[0], np.cumsum(step[:-1])]) + instart
        m = dists != 0
        if not m.any():
            return True
        mp = pos[m]
        md = dists[m].astype(np.int64)
        ml = litlens[m].astype(np.int64)
        # Matches must stay within this block's window (which starts at
        # the owning input's first byte in multi-file batches).
        if (md > mp - self.block_wstart[b]).any() \
                or (md > spec.WINDOW_SIZE).any():
            return False
        total = int(ml.sum())
        offs = np.arange(total) - np.repeat(np.cumsum(ml) - ml, ml)
        dsts = np.repeat(mp, ml) + offs
        srcs = np.repeat(mp - md, ml) + offs
        return bool(np.array_equal(self.data[dsts], self.data[srcs]))
