"""Megafused single-dispatch program: seed + split + squeeze, one jit.

The devseed path (ops.seed -> host sync -> fused_engine.FusedSqueeze)
pays, per master: a seed dispatch, a host round trip to read the split
points, G host-side `prepare` dispatches re-slicing the candidate
tables into block-aligned lanes, and the squeeze dispatch — on the
remote TPU transport each extra dispatch in a chain costs 250-500 ms
of scheduling latency (CLAUDE.md), and the host round trip serializes
the device pipeline.

This module fuses the WHOLE per-master pipeline into one jitted
program (VERDICT r4 item 1):

  1. seed core (ops.seed.make_seed_core): candidates + fixed-cost seed
     parse + reference split search + per-block seed stats
  2. tile->block geometry derived ON DEVICE from the split points
     (byte_splits), including the replica-lane fill — bit-compatible
     with FusedSqueeze's host geometry (same largest-first two-round
     policy, same replica seed construction)
  3. candidate-table slicing into block-aligned lanes (the former
     host-dispatched `prepare`)
  4. the full iteration loop + keep-best + compaction
     (fused_engine._loop_pieces)

The host sees ONE dispatch per master and pulls everything in one
sync.  Mega is used for LARGE masters only (>= ZT_MEGA_MIN bytes,
default 512 KiB): the squeeze grid cost scales with lane-group count,
not bytes, so small files stay on the batched FusedSqueeze path where
many masters share one grid.

No reference counterpart exists for any of this (the reference's
driver is the sequential per-part loop, src/zopfli/deflate.c:811-924).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from .. import spec
from . import costmodel, devsplit, fused_engine, hashmatch, scan_kernel
from . import seed as seed_mod

KBP = fused_engine.KBP
TILE = fused_engine.TILE
LANES = fused_engine.LANES
MAX_EVENTS = fused_engine.MAX_EVENTS

# Masters at or above this size route to the megafused program (below
# it, the batched FusedSqueeze shares lane groups across masters).
MEGA_MIN = int(os.environ.get("ZT_MEGA_MIN", str(1 << 19)))


def enabled() -> bool:
    """Megafused routing toggle (ZT_MEGA=1 to enable).

    Measured on a v5e chip (8 MiB, warm): the single-dispatch mega is
    byte-identical to the two-dispatch devseed path but ~0.1 s/MiB
    slower in batches — per-master squeeze loops repay the iteration-
    control ops the batched FusedSqueeze amortizes across a chunk.
    Default off; kept as validated infrastructure (tests_tpu/ asserts
    bit-equality, which doubles as the TPU miscompile sentinel).
    """
    return os.environ.get("ZT_MEGA", "0") == "1"


@functools.lru_cache(maxsize=None)
def _perturb_tables(nb_pad: int):
    """Replica-seed perturbation masks/takes, bit-equal to the host's.

    Row rb uses numpy default_rng(0xA5F00D + rb) drawing ll then d —
    the exact stream FusedSqueeze.dispatch consumes per replica row.
    Data-independent, so they are precomputed inputs to the program.
    """
    mll = np.zeros((nb_pad, spec.NUM_LL), bool)
    tll = np.zeros((nb_pad, spec.NUM_LL), np.int32)
    md = np.zeros((nb_pad, spec.NUM_D), bool)
    td = np.zeros((nb_pad, spec.NUM_D), np.int32)
    for rb in range(nb_pad):
        rng = np.random.default_rng(0xA5F00D + rb)
        mll[rb] = rng.random(spec.NUM_LL) < (1.0 / 3.0)
        tll[rb] = rng.integers(0, spec.NUM_LL, spec.NUM_LL)
        md[rb] = rng.random(spec.NUM_D) < (1.0 / 3.0)
        td[rb] = rng.integers(0, spec.NUM_D, spec.NUM_D)
    return mll, tll, md, td


def _geometry(byte_splits, npts, L, cap: int, MB: int, NL: int,
              nb_pad: int, replicas: int):
    """Device tile->block geometry + replica fill from split points.

    Mirrors FusedSqueeze.__init__'s host geometry exactly: data tiles
    cover each block in order; replica lanes copy whole blocks,
    largest-first, for `replicas` rounds while free lanes remain.

    Returns (tile_start, tile_nbytes, tile_block, nt0, nb_total,
             replica_of, ordinal) — all master-relative, fixed shapes.
    """
    bidx = jnp.arange(MB + 1, dtype=jnp.int32)
    bs = jnp.minimum(byte_splits, L)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), bs])[:MB + 1]
    ends = jnp.concatenate([bs, L[None]])[:MB + 1]
    live = bidx <= npts
    blk_len = jnp.where(live, jnp.maximum(ends - starts, 0), 0)
    ntiles_b = -(-blk_len // TILE)
    tile_off = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(ntiles_b)])     # (MB+2,)
    nt0 = tile_off[MB + 1]

    lane = jnp.arange(NL, dtype=jnp.int32)
    cmp = tile_off[None, :MB + 1] <= lane[:, None]           # (NL, MB+1)
    b_of = jnp.maximum(jnp.sum(cmp.astype(jnp.int32), axis=1) - 1, 0)
    k = lane - tile_off[b_of]
    t_start_d = starts[b_of] + k * TILE
    t_nb_d = jnp.clip(ends[b_of] - t_start_d, 0, TILE)
    is_data = lane < nt0

    # Replica fill: `replicas` rounds over blocks sorted by tile count
    # descending (ties by block index — the host's stable sort).
    okey = ((jnp.int32(1 << 12) - ntiles_b) << 7) | bidx
    _, order = jax.lax.sort((okey, bidx), num_keys=1)
    ord_r = jnp.concatenate([order] * max(replicas, 1))
    rounds = jnp.concatenate(
        [jnp.full(MB + 1, r + 1, jnp.int32) for r in range(max(replicas, 1))])

    def step(carry, x):
        free, lane_cur, rb_cur = carry
        b, rnd = x
        nt_b = ntiles_b[b]
        fit = (nt_b > 0) & (nt_b <= free) if replicas else jnp.bool_(False)
        out = (fit, b, lane_cur, nt_b, rb_cur, rnd)
        free = jnp.where(fit, free - nt_b, free)
        lane_cur = jnp.where(fit, lane_cur + nt_b, lane_cur)
        rb_cur = jnp.where(fit, rb_cur + 1, rb_cur)
        return (free, lane_cur, rb_cur), out

    init = (jnp.int32(NL) - nt0, nt0, npts + 1)
    (_, _, nb_total), (fit_s, b_s, lane_s, nt_s, rb_s, rnd_s) = \
        jax.lax.scan(step, init, (ord_r, rounds))

    in_seg = fit_s[None, :] & (lane_s[None, :] <= lane[:, None]) & \
        (lane[:, None] < (lane_s + nt_s)[None, :])           # (NL, S)
    has_rep = jnp.any(in_seg, axis=1)

    def pick(v):
        return jnp.sum(jnp.where(in_seg, v[None, :], 0), axis=1)

    rb_lane = pick(rb_s)
    srcb = pick(b_s)
    k_r = lane - pick(lane_s)
    t_start_r = starts[srcb] + k_r * TILE
    t_nb_r = jnp.clip(ends[srcb] - t_start_r, 0, TILE)

    tile_start = jnp.where(is_data, t_start_d,
                           jnp.where(has_rep, t_start_r, 0))
    tile_nbytes = jnp.where(is_data, t_nb_d,
                            jnp.where(has_rep, t_nb_r, 0))
    tile_block = jnp.where(is_data, b_of, jnp.where(has_rep, rb_lane, 0))
    lane_k = jnp.where(is_data, k, jnp.where(has_rep, k_r, 0))

    rows = jnp.arange(nb_pad, dtype=jnp.int32)
    oh = fit_s[None, :] & (rows[:, None] == rb_s[None, :])   # (nb_pad, S)
    any_oh = jnp.any(oh, axis=1)
    replica_of = jnp.where(
        any_oh, jnp.sum(jnp.where(oh, b_s[None, :], 0), axis=1), rows)
    ordinal = jnp.sum(jnp.where(oh, rnd_s[None, :], 0), axis=1)
    return (tile_start, tile_nbytes, tile_block, nt0, nb_total,
            replica_of, ordinal, lane_k)


def _replica_seeds(ll_h1, d_hist, replica_of, ordinal, pmask_ll, ptake_ll,
                   pmask_d, ptake_d, nb_pad: int, chaos: bool):
    """Seed stats for all nb_pad rows (base + chaos/perturbed replicas).

    Bit-equal to FusedSqueeze.dispatch's host construction: ordinal-1
    replicas get the chaotic all-weight-on-top-literal seed, ordinal-2+
    the rng-perturbed copy (tables from _perturb_tables).
    """
    MBp1 = ll_h1.shape[0]
    base_ll = jnp.zeros((nb_pad, spec.NUM_LL), jnp.int32) \
        .at[:MBp1].set(ll_h1.astype(jnp.int32))
    base_d = jnp.zeros((nb_pad, spec.NUM_D), jnp.int32) \
        .at[:MBp1].set(d_hist.astype(jnp.int32))
    src_ll = base_ll[replica_of]
    src_d = base_d[replica_of]

    pert_ll = jnp.where(pmask_ll,
                        jnp.take_along_axis(src_ll, ptake_ll, axis=1),
                        src_ll)
    pert_d = jnp.where(pmask_d,
                       jnp.take_along_axis(src_d, ptake_d, axis=1),
                       src_d)

    top = jnp.argmax(src_ll[:, :256], axis=1).astype(jnp.int32)
    tot = jnp.maximum(jnp.sum(src_ll, axis=1), 1)
    i288 = jnp.arange(spec.NUM_LL, dtype=jnp.int32)
    chaos_ll = jnp.where(i288[None, :] == top[:, None], tot[:, None], 0)

    is_r1 = ordinal == 1
    is_r2 = ordinal >= 2
    if not chaos:
        is_r2 = is_r2 | is_r1
        is_r1 = jnp.zeros_like(is_r1)
    sll = jnp.where(is_r1[:, None], chaos_ll,
                    jnp.where(is_r2[:, None], pert_ll, base_ll))
    sd = jnp.where(is_r1[:, None], 0,
                   jnp.where(is_r2[:, None], pert_d, base_d))
    is_rep = is_r1 | is_r2
    sll = sll.at[:, 256].set(jnp.where(is_rep, 1, sll[:, 256]))
    rep_off = 9 * ordinal
    return sll, sd, rep_off


@functools.lru_cache(maxsize=None)
def make_mega(cap: int, maxblocks: int, nv: int, fetch_cap: int,
              interpret: bool = False, knobs_items: tuple = (),
              replicas: int | None = None, chaos: bool | None = None):
    """Build the megafused program for one master capacity bucket.

    Returns run(buf, min_pos, inend_real, byte_values, ll_maps, d_maps,
                pmask_ll, ptake_ll, pmask_d, ptake_d, n_iter) ->
      (byte_splits, npts, block_costs, ll_h1, d_hist,
       best_cost, best_sll, best_sd, nsym, packed, best_pe,
       tile_start, tile_nbytes, tile_block, nsym_seed)
    with the seed outputs exactly as ops.seed.make_seed_core and the
    squeeze outputs exactly as fused_engine's finish (plus the full
    packed-path tensor `best_pe`, left device-resident for the rare
    fetch-cap overflow).
    """
    if replicas is None:
        replicas = int(os.environ.get("ZT_REPLICAS", "2"))
    if chaos is None:
        chaos = os.environ.get("ZT_REPLICA_CHAOS", "1") != "0"
    MB = maxblocks
    ntiles_max = -(-cap // TILE) + MB
    g = 1
    while g * LANES < ntiles_max:
        g *= 2
    G = g
    NL = G * LANES
    nb_pad = 4
    while nb_pad < (MB + 1) * (1 + max(replicas, 1)):
        nb_pad *= 2

    seed_core = seed_mod.make_seed_core(cap, MB, interpret, knobs_items)
    scan = scan_kernel.make_scan(TILE, LANES, KBP, interpret=interpret,
                                 groups=G)
    traceback = scan_kernel.make_traceback(TILE, LANES, interpret=interpret,
                                           groups=G)
    make_body, init_state, finish = fused_engine._loop_pieces(
        scan, traceback, G, nb_pad, nv, fetch_cap)

    if interpret:
        # CPU test mode: jit the per-iteration body (a fori_loop
        # WRAPPING the cost stack takes XLA:CPU minutes to compile;
        # same workaround as fused_engine._make_run_all).
        def _step_core(i, state, *tens):
            return make_body(*tens)(i, state)
        _step_j = jax.jit(_step_core)
    del finish  # mega uses its own byte-carrying finish below

    LEN_MASK = scan_kernel.LEN_MASK
    LB = scan_kernel.LEN_BITS
    DCAP = cap + devsplit.CKPT
    assert MB + 1 <= 64 and cap // TILE <= 1024, (MB, cap)  # perm key bits

    def mega_finish(state, lit_t, geo, npts):
        """Byte-carrying compaction + ON-DEVICE second split attempt.

        Completes the reference's deflate.c:872-893 inside the same
        dispatch: choose the best replica per block by exact cost,
        build the chosen parse's global symbol stream (block order),
        run the reference split search on it, and compute the exact
        auto-type cost totals of BOTH bound sets (first-pass costs use
        the per-block-store GetFixedCost gate, second-pass the
        whole-store gate — matching the host exactly).  The host just
        compares two integers.
        """
        (tile_start, tile_nbytes, tile_block, nt0, nb_total,
         replica_of, ordinal, lane_k) = geo
        (_, _, best_cost, best_sll, best_sd, _, _, _, best_pe) = state

        litg = lit_t.reshape(G, TILE, LANES)
        empty = (best_pe == 0).astype(jnp.int32)
        _, pe_c, lit_c = jax.lax.sort((empty, best_pe, litg), num_keys=1,
                                      is_stable=True, dimension=1)
        pl_c = pe_c & LEN_MASK
        # Literal rows carry their byte above the length bits (the seed
        # program's packed-stream format); empty rows stay 0.
        pe_pk = jnp.where(pl_c == 1, (lit_c << LB) | 1, pe_c)
        nsym_lane = jnp.sum(1 - empty, axis=1)            # (G, LANES)
        packed = pe_pk[:, :fetch_cap, :]

        # Best replica per block: earliest strict minimum in rb order
        # (the host collect's scan semantics) == lexicographic
        # (cost, rb) minimum.
        rows = jnp.arange(nb_pad, dtype=jnp.int32)
        mask = replica_of[None, :] == rows[:, None]       # (o, rb)
        costm = jnp.where(mask, best_cost[None, :], fused_engine.LARGE_COST)
        minc = jnp.min(costm, axis=1)
        chosen = jnp.min(jnp.where(mask & (costm == minc[:, None]),
                                   rows[None, :], nb_pad), axis=1)

        owner_c = replica_of[tile_block]                  # (NL,)
        inc = (tile_nbytes > 0) & (chosen[owner_c] == tile_block)
        nsym_flat = nsym_lane.reshape(-1)
        nsym_eff = jnp.where(inc, nsym_flat, 0)
        key = (owner_c << 16) | (tile_block << 10) | lane_k
        lane_ids = jnp.arange(NL, dtype=jnp.int32)
        _, perm = jax.lax.sort((key, lane_ids), num_keys=1, is_stable=True)
        off_sorted = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(nsym_eff[perm], dtype=jnp.int32)])[:-1]
        off_lane = jnp.zeros(NL, jnp.int32).at[perm].set(off_sorted)
        nsym_total = jnp.sum(nsym_eff)

        k_pos = jnp.arange(TILE, dtype=jnp.int32)
        off_g = off_lane.reshape(G, LANES)
        inc_g = inc.reshape(G, LANES)
        idx = off_g[:, None, :] + k_pos[None, :, None]
        ok = (k_pos[None, :, None] < nsym_lane[:, None, :]) \
            & inc_g[:, None, :]
        idx = jnp.where(ok, idx, DCAP)
        stream = jnp.zeros(DCAP, jnp.int32).at[idx.reshape(-1)].set(
            pe_pk.reshape(-1), mode="drop")
        pl_s = stream & LEN_MASK
        hi_s = stream >> LB
        lit_stream = jnp.where(pl_s >= spec.MIN_MATCH, pl_s, hi_s)
        dist_stream = jnp.where(pl_s >= spec.MIN_MATCH, hi_s, 0)

        sp2, npts2, ll_ck, d_ck, bcum = devsplit.split_lz77_device(
            lit_stream, dist_stream, DCAP, MB, nsym_total, return_ck=True)
        ll_sym, d_sym, _nb = devsplit.stream_symbols(
            lit_stream, dist_stream, DCAP, nsym_total)

        bidx = jnp.arange(MB + 1, dtype=jnp.int32)
        nsym_blk = jnp.zeros(nb_pad, jnp.int32).at[owner_c].add(nsym_eff)
        nsym_blk = nsym_blk[:MB + 1]
        csum = jnp.cumsum(nsym_blk)
        starts1 = jnp.concatenate([jnp.zeros(1, jnp.int32), csum])[:MB + 1]
        ends1 = csum[:MB + 1]
        live1 = (bidx <= npts) & (ends1 > starts1)
        c1 = devsplit.autotype_costs(ll_ck, d_ck, ll_sym, d_sym, bcum,
                                     starts1, ends1, DCAP,
                                     nsym_blk <= 1000)
        tc1 = jnp.sum(jnp.where(live1, c1, 0))
        sp2c = jnp.minimum(sp2, nsym_total)
        starts2 = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), sp2c])[:MB + 1]
        ends2 = jnp.concatenate(
            [sp2c, jnp.reshape(nsym_total, (1,))])[:MB + 1]
        live2 = (bidx <= npts2) & (ends2 > starts2)
        c2 = devsplit.autotype_costs(ll_ck, d_ck, ll_sym, d_sym, bcum,
                                     starts2, ends2, DCAP,
                                     nsym_total <= 1000)
        tc2 = jnp.sum(jnp.where(live2, c2, 0))

        return (best_cost, best_sll, best_sd, nsym_lane, packed,
                state[8], sp2, npts2, tc1, tc2)

    def prepare_and_loop(bp_len, bp_dist, data_block, geo, seeds,
                         byte_values, ll_maps, d_maps, n_iter):
        (tile_start, tile_nbytes, tile_block, nt0, nb_total,
         replica_of, ordinal, lane_k) = geo
        sll, sd, rep_off = seeds

        # Candidate slicing into block-aligned lanes (the former
        # host-dispatched fused_engine._make_prepare_group, all groups
        # at once).  A barrier isolates the gather composition from
        # upstream fusion: an XLA:TPU fusion of shared-index gathers
        # with a transpose/min chain was MISCOMPILED in r3/r4
        # (CLAUDE.md round-4 findings); the on-TPU A/B test
        # (tests_tpu/) asserts this path against the two-dispatch one.
        tile_start, tile_nbytes = jax.lax.optimization_barrier(
            (tile_start, tile_nbytes))
        pos_in_tile = jnp.arange(TILE, dtype=jnp.int32)
        rows = tile_start[:, None] + pos_in_tile[None, :]     # (NL, TILE)
        rows_c = jnp.clip(rows, 0, cap - 1)
        bl = bp_len[rows_c]                                   # (NL, T, K)
        bd = bp_dist[rows_c]
        lit = data_block[rows_c]                              # (NL, T)
        # Barrier BETWEEN the gathers and the min/transpose chain:
        # XLA:TPU miscompiles the fused shared-index-gather +
        # transpose/min composition at >= 512 KiB caps (element-0
        # broadcast — the r4 seed-stats bug, reproduced here when the
        # barrier was only on the inputs).  Isolated gathers are
        # correct; this forces that isolation.
        bl, bd, lit = jax.lax.optimization_barrier((bl, bd, lit))
        maxlen = tile_nbytes[:, None] - pos_in_tile[None, :]
        bl = jnp.minimum(bl, maxlen[:, :, None])
        bl = jnp.where(bl >= spec.MIN_MATCH, bl, 0)
        valid = pos_in_tile[None, :] < tile_nbytes[:, None]
        dsym = fused_engine._dist_symbol_jax(jnp.maximum(bd, 1)) \
            .astype(jnp.int8)

        def to3(x):   # (NL, TILE, K) -> (G*TILE, K, LANES)
            y = x.reshape(G, LANES, TILE, -1)
            return jnp.transpose(y, (0, 2, 3, 1)).reshape(
                G * TILE, -1, LANES)

        def to2(x):   # (NL, TILE) -> (G*TILE, LANES)
            y = x.reshape(G, LANES, TILE)
            return jnp.transpose(y, (0, 2, 1)).reshape(G * TILE, LANES)

        bl_t = to3(bl)
        bd_t = to3(bd)
        dsym_t = to3(dsym)
        lit_t = to2(lit)
        valid_t = to2(valid)

        tb_g = tile_block.reshape(G, LANES)
        tn_g = tile_nbytes.reshape(G, LANES)
        used = tn_g > 0
        blk_oh = (used[:, :, None] &
                  (tb_g[:, :, None] ==
                   jnp.arange(nb_pad, dtype=jnp.int32)[None, None, :])) \
            .astype(jnp.float32)

        tens = (bl_t, bd_t, dsym_t, lit_t, valid_t, tb_g, tn_g, blk_oh,
                byte_values, ll_maps, d_maps, rep_off)
        if not interpret:
            body = make_body(*tens)
            state = jax.lax.fori_loop(0, n_iter, body, init_state(sll, sd))
        else:
            state = init_state(sll, sd)
            for i in range(int(n_iter)):
                state = _step_j(jnp.int32(i), state, *tens)
        return state, lit_t

    def run_core(buf, min_pos, inend_real, byte_values, ll_maps, d_maps,
                 pmask_ll, ptake_ll, pmask_d, ptake_d, n_iter):
        (sp, npts, byte_splits, ll_h1, d_hist, block_costs,
         nsym_seed, bp_len, bp_dist) = seed_core(buf, min_pos, inend_real)
        L = inend_real - hashmatch.PREFIX
        geo = _geometry(byte_splits, npts, L, cap, MB, NL, nb_pad,
                        replicas)
        seeds = _replica_seeds(ll_h1, d_hist, geo[5], geo[6],
                               pmask_ll, ptake_ll, pmask_d, ptake_d,
                               nb_pad, chaos)
        data_block = buf[hashmatch.PREFIX:hashmatch.PREFIX + cap] \
            .astype(jnp.int32)
        state, lit_t = prepare_and_loop(bp_len, bp_dist, data_block, geo,
                                        seeds, byte_values, ll_maps,
                                        d_maps, n_iter)
        (best_cost, best_sll, best_sd, nsym, packed, best_pe,
         sp2, npts2, tc1, tc2) = mega_finish(state, lit_t, geo, npts)
        return (byte_splits, npts, block_costs, ll_h1, d_hist,
                best_cost, best_sll, best_sd, nsym, packed, best_pe,
                geo[0], geo[1], geo[2], geo[4], geo[5], geo[6], nsym_seed,
                sp2, npts2, tc1, tc2)

    if not interpret:
        return jax.jit(run_core)
    return run_core


class MegaResult:
    """Host-side view of one master's megafused outputs.

    Exposes the same decode/verify surface squeeze_batched.fused_collect
    needs, plus the SeedResult-compatible stored-exit fields.
    """

    def __init__(self, data, instart, inend, out, fetch_cap,
                 window_start: int = 0):
        self.data = data
        self.instart, self.inend = instart, inend
        self.fetch_cap = fetch_cap
        self.window_start = window_start
        (byte_splits, npts, block_costs, ll_h1, d_hist,
         best_cost, best_sll, best_sd, nsym, packed, best_pe,
         tile_start, tile_nbytes, tile_block, nb_total,
         replica_of, ordinal, nsym_seed, sp2, npts2, tc1, tc2) = out
        # Device-computed second-split attempt (deflate.c:872-893):
        # symbol indices into the concatenated chosen parse, plus the
        # exact auto-type cost totals of both bound sets.
        self.split2 = ([int(x) for x in np.asarray(sp2)[:int(npts2)]],
                       int(tc1), int(tc2))
        npts = int(npts)
        bsp = [int(b) for b in np.asarray(byte_splits)[:npts]]
        self.bounds = [instart] + [instart + b for b in bsp] + [inend]
        nb = npts + 1
        self.nb = nb
        self.block_bounds = list(zip(self.bounds[:-1], self.bounds[1:]))
        self.block_wstart = [window_start] * nb
        self.masters = [(instart, inend, self.bounds)]
        self.seed_ll = np.asarray(ll_h1)[:nb].astype(np.int64)
        self.seed_d = np.asarray(d_hist)[:nb].astype(np.int64)
        self.block_costs = np.asarray(block_costs)[:nb]
        self.nb_total = int(nb_total)
        self.replica_of = np.asarray(replica_of)[:self.nb_total]
        self.tile_start = np.asarray(tile_start)
        self.tile_nbytes = np.asarray(tile_nbytes)
        self.tile_block = np.asarray(tile_block)
        self.nt = int(np.sum(self.tile_nbytes > 0))
        self._nsym = np.asarray(nsym).reshape(-1)
        self._packed = packed       # device until needed
        self._best_pe = best_pe     # device; pulled only on overflow
        self._cost = np.asarray(best_cost)
        self._sll = np.asarray(best_sll)
        self._sd = np.asarray(best_sd)
        # Stored-exit fields (ops.seed.SeedResult semantics).
        self.all_stored = _all_stored(self.block_costs, self.seed_ll,
                                      self.bounds)

    def collect(self, handle=None):
        """(parses, best_cost, best_sll, best_sd) per real block."""
        lanes_used = self.tile_nbytes > 0
        nsym = self._nsym
        over = (nsym[lanes_used] > self.fetch_cap).any()
        if over:
            fused_engine.FETCH_RETRIES[0] += 1
            pe = np.asarray(self._best_pe)       # (G, TILE, LANES)
            G = pe.shape[0]
        else:
            packed = np.asarray(self._packed)    # (G, cap, LANES)
            G = packed.shape[0]

        block_tiles: dict[int, list[int]] = {}
        for t in range(len(self.tile_block)):
            if self.tile_nbytes[t] > 0:
                block_tiles.setdefault(int(self.tile_block[t]), []).append(t)

        def decode(tiles):
            lit_parts, dist_parts = [], []
            for t in tiles:
                g, lane = divmod(t, LANES)
                if over:
                    # Overflow pull: raw path edges (no bytes) —
                    # literal bytes come from positions in the input.
                    rows = pe[g, :, lane]
                    rows = rows[rows != 0].astype(np.int64)
                    pl = rows & 0x1FF
                    pd = rows >> 9
                    pos = np.concatenate([[0], np.cumsum(pl[:-1])])
                    bytes_at = self.data[self.instart
                                         + self.tile_start[t] + pos]
                    lit = np.where(pl >= spec.MIN_MATCH, pl, bytes_at)
                else:
                    # Compact rows carry literal bytes in the high bits
                    # (byte << 9 | 1) — no input gather needed.
                    k = int(nsym[t])
                    rows = packed[g, :k, lane].astype(np.int64)
                    pl = rows & 0x1FF
                    pd = np.where(pl >= spec.MIN_MATCH, rows >> 9, 0)
                    lit = np.where(pl >= spec.MIN_MATCH, pl, rows >> 9)
                lit_parts.append(lit.astype(np.uint16))
                dist_parts.append(np.where(pl >= spec.MIN_MATCH, pd,
                                           0).astype(np.uint16))
            if lit_parts:
                return (np.concatenate(lit_parts),
                        np.concatenate(dist_parts))
            return (np.zeros(0, np.uint16), np.zeros(0, np.uint16))

        chosen = list(range(self.nb))
        for rb in range(self.nb, self.nb_total):
            b = int(self.replica_of[rb])
            if self._cost[rb] < self._cost[chosen[b]]:
                chosen[b] = rb
        parses = [decode(block_tiles.get(chosen[b], []))
                  for b in range(self.nb)]
        return (parses, self._cost[chosen], self._sll[chosen],
                self._sd[chosen])

    # Hash-collision guard — identical semantics, reuse the fused
    # engine's implementation (it only reads block_bounds/data/wstart).
    verify_parse = fused_engine.FusedSqueeze.verify_parse


def _all_stored(block_costs, seed_ll, bounds) -> bool:
    """ops.seed.SeedResult's stored-exit gate, shared logic."""
    c = block_costs.astype(np.float64)
    nlit = seed_ll[:, :256].sum(axis=1).astype(np.float64)
    blk_bytes = np.diff(np.asarray(bounds, np.float64))
    cover = 1.0 - nlit / np.maximum(blk_bytes, 1)
    nsym_store = float(seed_ll.sum()) - (len(bounds) - 1)
    margin = 16.0 + c[:, 0] / 8192.0
    dyn_ok = c[:, 0] + margin < c[:, 2]
    fx_ok = (c[:, 0] + margin < c[:, 1]) if nsym_store <= 1000 \
        else np.ones_like(dyn_ok)
    return bool(np.all(dyn_ok & fx_ok) and np.all(cover < 0.02))


def mega_dispatch(data: np.ndarray, instart: int, inend: int,
                  maxblocks: int, numiterations: int,
                  interpret: bool | None = None, window_start: int = 0,
                  fetch_cap: int | None = None):
    """Queue the megafused program for one master (async handle)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if fetch_cap is None:
        fetch_cap = int(os.environ.get("ZT_FETCH_CAP", str(TILE // 2)))
    L = inend - instart
    cap = 16384
    while cap < L:
        cap *= 2
    prefix_len = min(instart - window_start, spec.WINDOW_SIZE)
    total = hashmatch.PREFIX + cap + 264
    buf = np.empty(total, dtype=np.uint8)
    buf[:hashmatch.PREFIX] = seed_mod._filler(hashmatch.PREFIX)
    if prefix_len:
        buf[hashmatch.PREFIX - prefix_len:hashmatch.PREFIX] = \
            data[instart - prefix_len:instart]
    buf[hashmatch.PREFIX:hashmatch.PREFIX + L] = data[instart:inend]
    buf[hashmatch.PREFIX + L:] = 0

    # Byte-value select chain bucket (host knows the data).
    values = np.unique(data[instart:inend])
    nv = 32
    while nv < len(values):
        nv *= 2
    if nv > 128 or interpret:
        nv = 256
    values = values[:nv]
    byte_values = jnp.asarray(np.concatenate(
        [values, np.full(max(nv - len(values), 0), values[0], np.uint8)]
    ).astype(np.int32))

    MB = maxblocks
    knobs = hashmatch.current_knobs()
    prog = make_mega(cap, MB, nv, fetch_cap, interpret,
                     tuple(sorted(knobs.items())))
    nb_pad = 4
    replicas = int(os.environ.get("ZT_REPLICAS", "2"))
    while nb_pad < (MB + 1) * (1 + max(replicas, 1)):
        nb_pad *= 2
    mll, tll, md, td = _perturb_tables(nb_pad)
    ll_maps, d_maps = costmodel.randomize_maps(MAX_EVENTS)
    out = prog(jnp.asarray(buf), jnp.int32(hashmatch.PREFIX - prefix_len),
               jnp.int32(hashmatch.PREFIX + L), byte_values,
               jnp.asarray(np.asarray(ll_maps)),
               jnp.asarray(np.asarray(d_maps)),
               jnp.asarray(mll), jnp.asarray(tll), jnp.asarray(md),
               jnp.asarray(td), jnp.int32(numiterations))
    return (data, instart, inend, out, fetch_cap, window_start)


def mega_finish(handle) -> MegaResult:
    """Blocking half of mega_dispatch."""
    data, instart, inend, out, fetch_cap, window_start = handle
    return MegaResult(data, instart, inend, out, fetch_cap, window_start)
