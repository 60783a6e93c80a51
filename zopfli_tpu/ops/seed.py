"""Device seed program: candidates + fixed-cost seed parse + split.

Replaces the host greedy parse (reference ZopfliLZ77Greedy,
src/zopfli/lz77.c:544-630) in the TPU path.  SURVEY row 7 allows the
greedy seed to be "replaced by a fixed-cost optimal parse (same kernel,
cheaper model)" — this runs ZopfliLZ77OptimalFixed semantics
(squeeze.c:528-560: one DP pass under the exact fixed-tree cost model)
over a whole master block, then performs the reference block-split
search (ops.devsplit) on that parse and derives per-block seed
statistics, all inside ONE device dispatch:

  1. hashmatch.build_candidates — per-position sublen tables
  2. fixed-cost DP scan + traceback over master-aligned TILE lanes
  3. per-lane path compaction -> one global LZ77 symbol stream
  4. devsplit.split_lz77_device on the stream (exact
     ZopfliBlockSplitLZ77 semantics)
  5. per-block (ll, d) histograms of the seed parse (iteration-0 stats,
     squeeze.c:481-482 semantics with the end-symbol=1 convention)
  6. per-block exact auto-type costs of the seed parse (stored /
     fixed / dynamic) — the host's stored-block early-exit signal for
     incompressible masters
  7. per-lane symbol counts (exact fetch_cap prediction for the fused
     engine's compact parse pull)

The candidate tables are returned as device residents and reused by the
fused squeeze (they depend only on the input bytes).  One dispatch and
one small d2h replace: host greedy (once for splitting + once per block
for seeds) and the separate devsplit dispatch — and the chip does the
parsing, so the TPU engine no longer calls zt_greedy at all.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import spec
from . import costmodel, devsplit, hashmatch, scan_kernel

_LSYM = np.asarray(spec.LENGTH_SYMBOL[3:259], dtype=np.int32)
_LEXTRA = np.asarray(spec.LENGTH_EXTRA_BITS[3:259], dtype=np.float32)

# Fixed-tree base costs (GetCostFixed, squeeze.c:125-140): litlen code
# lengths by symbol; every dist code is 5 bits; extra bits added by the
# DP itself.
_FIXED_LL = np.zeros(spec.NUM_LL, dtype=np.float32)
_FIXED_LL[0:144] = 8
_FIXED_LL[144:256] = 9
_FIXED_LL[256:280] = 7
_FIXED_LL[280:288] = 8
_FIXED_LCOST = (_FIXED_LL[_LSYM] + _LEXTRA).astype(np.float32)  # (256,)

_FIXED_LL_BITS_I = _FIXED_LL.astype(np.int32)
_LL_EXTRA_I = np.zeros(spec.NUM_LL, np.int32)
_LL_EXTRA_I[257:286] = spec.LENGTH_SYMBOL_EXTRA_BITS
_D_EXTRA_I = np.zeros(spec.NUM_D, np.int32)
_D_EXTRA_I[:30] = spec.DIST_SYM_EXTRA_BITS

# Cheap candidate knobs for masters a host probe already called
# incompressible: the parse only needs to confirm "stored wins", so
# neighbor quality is irrelevant (dyn cost is decided by literal
# entropy) — one sort round + exact short distances.
CHEAP_KNOBS = {
    "sort_levels": (3,),
    "refine_plan": "",
    "short_dists": 4,
    "recent_k2_min": 0,
    "recent_levels": (3, 4, 6, 8, 12, 16, 24, 32),
}


def _dextra_f(dist: jnp.ndarray) -> jnp.ndarray:
    """DEFLATE distance extra bits, arithmetically (no table gather)."""
    d1 = jnp.maximum(dist - 1, 1)
    lg = 31 - jax.lax.clz(d1)
    return jnp.maximum(lg - 1, 0).astype(jnp.float32)


def _dist_symbol(dist: jnp.ndarray) -> jnp.ndarray:  # noqa: kept for tests
    d1 = jnp.maximum(dist - 1, 1)
    lg = 31 - jax.lax.clz(d1)
    r = (d1 >> jnp.maximum(lg - 1, 0)) & 1
    return jnp.where(dist < 5, dist - 1, 2 * lg + r).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def make_seed_core(cap: int, maxblocks: int, interpret: bool = False,
                   knobs_items: tuple = ()):
    """Build the UNJITTED seed computation for one master capacity.

    Returns fn(buf, min_pos, inend_real) ->
      (sp, npts, byte_splits, ll_hist, d_hist, block_costs, nsym_lane,
       bp_len, bp_dist)
    with sp (MB,) i32 symbol split points (sentinel-padded), npts i32,
    byte_splits (MB,) i32 bytes-before-split (master-relative),
    ll_hist (MB+1, 288) / d_hist (MB+1, 32) i32 seed stats per block,
    block_costs (MB+1, 3) i32 exact [stored, fixed, dynamic] bits of
    the seed parse per block, nsym_lane (G*LANES,) i32 path rows per
    tile lane, and the candidate tables (cap, KBP) for reuse.

    Callable inside a larger jit (ops.mega embeds it in the megafused
    single-dispatch program); make_seed_program wraps it standalone.
    """
    from . import fused_engine as _fe
    TILE, LANES, KBP = _fe.TILE, _fe.LANES, _fe.KBP
    W = scan_kernel.W
    MB = maxblocks
    ntiles = -(-cap // TILE)
    G = max(1, -(-ntiles // LANES))
    DCAP = cap + devsplit.CKPT     # stream capacity (multiple of CKPT)
    knobs = dict(knobs_items) if knobs_items else hashmatch.current_knobs()

    scan = scan_kernel.make_scan(TILE, LANES, KBP, interpret=interpret,
                                 groups=G)
    traceback = scan_kernel.make_traceback(TILE, LANES, interpret=interpret,
                                           groups=G)
    symtab = np.asarray(scan_kernel.symbol_range_table(), dtype=np.int32)

    def run(buf: jnp.ndarray, min_pos: jnp.ndarray, inend_real: jnp.ndarray):
        bp_len, bp_dist, _best = hashmatch.build_candidates(
            buf, cap, min_pos, inend_real, max_bp=KBP, **knobs)
        L_real = inend_real - hashmatch.PREFIX          # scalar i32

        # ---- lane geometry: lane t covers master rows [t*TILE, ...) ----
        # Seed lanes tile the master CONTIGUOUSLY, so the per-lane
        # tables are reshapes of the flat arrays — zero gathers.  (The
        # former rows_c gather composition was miscompiled by XLA:TPU
        # at cap >= 512 KiB when fused with the downstream
        # transpose/min chain — the lit gather broadcast element 0
        # across all lanes, which silently poisoned every >=512 KiB
        # master's seed stats; reshapes are also simply faster.)
        lane_ids = jnp.arange(G * LANES, dtype=jnp.int32)
        tile_start = lane_ids * TILE                     # (G*LANES,)
        tile_nbytes = jnp.clip(L_real - tile_start, 0, TILE)
        pos_in_tile = jnp.arange(TILE, dtype=jnp.int32)
        total_rows = G * LANES * TILE

        def flat_rows(x, fill):
            if total_rows > cap:
                pad_shape = (total_rows - cap,) + x.shape[1:]
                x = jnp.concatenate(
                    [x, jnp.full(pad_shape, fill, x.dtype)])
            return x[:total_rows].reshape((G * LANES, TILE) + x.shape[1:])

        bl = flat_rows(bp_len, 0)                        # (GL, TILE, KBP)
        bd = flat_rows(bp_dist, 0)
        data_block = buf[hashmatch.PREFIX:hashmatch.PREFIX + cap] \
            .astype(jnp.int32)
        lit = flat_rows(data_block, 0)                   # (GL, TILE)
        maxlen = tile_nbytes[:, None] - pos_in_tile[None, :]
        bl = jnp.minimum(bl, maxlen[:, :, None])
        bl = jnp.where(bl >= spec.MIN_MATCH, bl, 0)
        valid = pos_in_tile[None, :] < tile_nbytes[:, None]

        # scan layout: (G*TILE, KBP, LANES) etc.
        def to_rows3(x):  # (GL, TILE, K) -> (G*TILE, K, LANES)
            y = x.reshape(G, LANES, TILE, -1)
            y = jnp.transpose(y, (0, 2, 3, 1))          # (G, TILE, K, LANES)
            return y.reshape(G * TILE, -1, LANES)

        def to_rows2(x):  # (GL, TILE) -> (G*TILE, LANES)
            y = x.reshape(G, LANES, TILE)
            y = jnp.transpose(y, (0, 2, 1))
            return y.reshape(G * TILE, LANES)

        bl_t = to_rows3(bl)
        bd_t = to_rows3(bd)
        lit_t = to_rows2(lit)
        valid_t = to_rows2(valid)

        bp_dcost = 5.0 + _dextra_f(jnp.maximum(bd_t, 1))
        litcost = jnp.where(valid_t,
                            jnp.where(lit_t < 144, 8.0, 9.0),
                            scan_kernel.BIG).astype(jnp.float32)
        lcost_vec = jnp.broadcast_to(
            jnp.asarray(_FIXED_LCOST)[:, None], (W, LANES))
        lcost_vec = jnp.tile(lcost_vec, (G, 1))

        ce, _ = scan(bl_t, bd_t, bp_dcost, litcost, lcost_vec)
        nbytes_g = tile_nbytes.reshape(G, LANES)
        _, pep = traceback(ce, lit_t, nbytes_g, jnp.asarray(symtab))

        # ---- per-lane compaction, carrying the literal byte ----
        peg = pep.reshape(G, TILE, LANES)
        litg = lit_t.reshape(G, TILE, LANES)
        empty = (peg == 0).astype(jnp.int32)
        _, pe_c, lit_c = jax.lax.sort(
            (empty, peg, litg), num_keys=1, is_stable=True,
            dimension=1)
        pl_c = pe_c & scan_kernel.LEN_MASK
        nsym_lane = jnp.sum(1 - empty, axis=1)           # (G, LANES)

        # ---- global symbol stream (position order = lane order) ----
        # ONE packed scatter (literal rows carry their byte above the
        # length bits) instead of separate lit/dist scatters.
        nsym_flat = nsym_lane.reshape(-1)
        off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(nsym_flat, dtype=jnp.int32)])[:-1]
        off_gl = off.reshape(G, LANES)
        k = pos_in_tile                                   # (TILE,)
        idx = off_gl[:, None, :] + k[None, :, None]       # (G, TILE, LANES)
        slot_valid = k[None, :, None] < nsym_lane[:, None, :]
        idx = jnp.where(slot_valid, idx, DCAP)
        LB = scan_kernel.LEN_BITS
        pe_packed = jnp.where(pl_c >= spec.MIN_MATCH, pe_c,
                              (lit_c << LB) | 1)
        stream = jnp.zeros(DCAP, jnp.int32).at[idx.reshape(-1)].set(
            pe_packed.reshape(-1), mode="drop")
        pl_s = stream & scan_kernel.LEN_MASK
        hi_s = stream >> LB
        lit_stream = jnp.where(pl_s >= spec.MIN_MATCH, pl_s, hi_s)
        dist_stream = jnp.where(pl_s >= spec.MIN_MATCH, hi_s, 0)
        nsym_total = jnp.sum(nsym_flat)

        # ---- reference split search on the seed parse ----
        sp, npts, ll_ck, d_ck, bcum = devsplit.split_lz77_device(
            lit_stream, dist_stream, DCAP, MB, nsym_total,
            return_ck=True)

        # ---- per-block seed stats + byte bounds + exact costs ----
        # Histograms come from the splitter's checkpointed cumulative
        # histograms differenced at the block boundaries (32 boundary
        # rows) — no second pass over the stream.
        byte_splits = bcum[jnp.minimum(sp, DCAP)]         # (MB,)
        ll_sym, d_sym, _nb = devsplit.stream_symbols(
            lit_stream, dist_stream, DCAP, nsym_total)
        starts_sym = jnp.minimum(
            jnp.concatenate([jnp.zeros(1, jnp.int32), sp])[:MB + 1],
            nsym_total)
        ends_sym = jnp.minimum(
            jnp.concatenate([sp, jnp.full(1, DCAP + 1, jnp.int32)])
            [:MB + 1], nsym_total)
        pll, pd = devsplit.prefix_hist_at(
            ll_ck, d_ck, ll_sym, d_sym,
            jnp.concatenate([starts_sym, ends_sym]), DCAP)
        ll_hist = pll[MB + 1:] - pll[:MB + 1]
        d_hist = pd[MB + 1:] - pd[:MB + 1]

        # Exact auto-type costs of the seed parse per block.  Sentinel
        # split points map to bcum[DCAP] == total bytes, so ends/starts
        # line up for the real blocks 0..npts and give 0 for the rest.
        total_b = bcum[DCAP][None]
        ends = jnp.concatenate([byte_splits, total_b])[:MB + 1]
        starts = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), byte_splits])[:MB + 1]
        bidx = jnp.arange(MB + 1, dtype=jnp.int32)
        blk_bytes = jnp.where(bidx <= npts, ends - starts, 0)
        rem = blk_bytes % 65535
        unc = (blk_bytes // 65535 + (rem != 0)) * 40 + blk_bytes * 8
        ll_h1 = ll_hist.at[:, 256].set(1)
        fx = 3 + jnp.sum(ll_h1 * (jnp.asarray(_FIXED_LL_BITS_I)
                                  + jnp.asarray(_LL_EXTRA_I))[None, :],
                         axis=1) \
            + jnp.sum(d_hist * (5 + jnp.asarray(_D_EXTRA_I))[None, :],
                      axis=1)
        fx = jnp.where(nsym_total <= 1000, fx, unc)   # deflate.c:615-616
        dyn = 3 + costmodel.hist_dynamic_cost(ll_h1, d_hist)
        block_costs = jnp.stack([unc, fx, dyn], axis=1)   # (MB+1, 3)

        return (sp, npts, byte_splits, ll_h1, d_hist, block_costs,
                nsym_flat, bp_len, bp_dist)

    return run


@functools.lru_cache(maxsize=None)
def make_seed_program(cap: int, maxblocks: int, interpret: bool = False,
                      knobs_items: tuple = ()):
    """Standalone (jitted on TPU) wrapper of make_seed_core."""
    run = make_seed_core(cap, maxblocks, interpret, knobs_items)
    if interpret:
        return run          # pieces are individually jitted already
    return jax.jit(run)


class SeedResult:
    """Host-side view of one master's seed program outputs."""

    __slots__ = ("bounds", "seed_ll", "seed_d", "block_costs",
                 "max_lane_rows", "bp_len", "bp_dist", "all_stored")

    def __init__(self, instart, inend, sp, npts, byte_splits, ll_hist,
                 d_hist, block_costs, nsym_lane, bp_len, bp_dist):
        npts = int(npts)
        bsp = [int(b) for b in np.asarray(byte_splits)[:npts]]
        self.bounds = [instart] + [instart + b for b in bsp] + [inend]
        nb = npts + 1
        self.seed_ll = np.asarray(ll_hist)[:nb].astype(np.int64)
        self.seed_d = np.asarray(d_hist)[:nb].astype(np.int64)
        self.block_costs = np.asarray(block_costs)[:nb]
        self.max_lane_rows = int(np.max(np.asarray(nsym_lane)))
        self.bp_len = bp_len
        self.bp_dist = bp_dist
        # Stored-exit (VERDICT r2 item 3): every block (a) already
        # prefers stored over the seed parse's fixed/dynamic encodings
        # with a small absolute margin, and (b) has near-zero match
        # coverage under the FIXED cost model.  (b) is the load-bearing
        # part: the fixed model charges any distance only 5 bits, so if
        # even it finds <2% of bytes coverable by matches, the stat
        # model (which charges the true distance entropy, ~25+ bits on
        # random data) will use fewer matches still — its dynamic cost
        # cannot drop below the seed's by more than the margin, and the
        # final auto-type choice is stored either way.  Skip the
        # iteration loop and emit stored directly.
        c = self.block_costs.astype(np.float64)
        nlit = self.seed_ll[:, :256].sum(axis=1).astype(np.float64)
        blk_bytes = np.diff(np.asarray(self.bounds, np.float64))
        cover = 1.0 - nlit / np.maximum(blk_bytes, 1)
        # Stored must beat DYNAMIC with margin.  The fixed column
        # aliases the uncompressed cost for stores over 1000 symbols
        # (deflate.c:612-615 semantics), so compare against it only
        # when it is a real fixed cost — min(c1, c2) made the
        # condition unsatisfiable for every large block (c0 < c0+256
        # always) and the stored-exit never fired.
        # True stream symbol count (reference deflate.c:615 uses
        # lz77->size): seed_ll counts the forced per-block end-of-block
        # symbol (ll_hist[:,256] == 1 per block), which the device
        # fixed-cost column does NOT include in its nsym_total gate —
        # subtract the block count so both sides gate identically.
        nsym_store = float(self.seed_ll.sum()) - (len(self.bounds) - 1)
        margin = 16.0 + c[:, 0] / 8192.0      # ~0.012% of the block
        dyn_ok = c[:, 0] + margin < c[:, 2]
        fx_ok = (c[:, 0] + margin < c[:, 1]) if nsym_store <= 1000 \
            else np.ones_like(dyn_ok)
        self.all_stored = bool(
            np.all(dyn_ok & fx_ok) and np.all(cover < 0.02))


def seed_dispatch(data: np.ndarray, instart: int, inend: int,
                  maxblocks: int = 15, interpret: bool | None = None,
                  cheap: bool = False, window_start: int = 0):
    """Queue the seed program for one master; returns an async handle.

    cheap=True uses CHEAP_KNOBS (for masters the host probe already
    called incompressible — candidate quality is irrelevant there).
    window_start: first byte the halo may reach back to (file start in
    multi-file batches where `data` concatenates independent inputs).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L = inend - instart
    cap = 16384
    while cap < L:
        cap *= 2
    prefix_len = min(instart - window_start, spec.WINDOW_SIZE)
    total = hashmatch.PREFIX + cap + 264
    buf = np.empty(total, dtype=np.uint8)
    buf[:hashmatch.PREFIX] = _filler(hashmatch.PREFIX)
    if prefix_len:
        buf[hashmatch.PREFIX - prefix_len:hashmatch.PREFIX] = \
            data[instart - prefix_len:instart]
    buf[hashmatch.PREFIX:hashmatch.PREFIX + L] = data[instart:inend]
    buf[hashmatch.PREFIX + L:] = 0

    knobs = CHEAP_KNOBS if cheap else hashmatch.current_knobs()
    prog = make_seed_program(cap, maxblocks, interpret,
                             tuple(sorted(knobs.items())))
    out = prog(jnp.asarray(buf), jnp.int32(hashmatch.PREFIX - prefix_len),
               jnp.int32(hashmatch.PREFIX + L))
    return (instart, inend, out)


def seed_finish(handle) -> SeedResult:
    """Blocking half of seed_dispatch."""
    instart, inend, out = handle
    return SeedResult(instart, inend, *out)


def seed_master(data: np.ndarray, instart: int, inend: int,
                maxblocks: int = 15, interpret: bool | None = None,
                cheap: bool = False, window_start: int = 0) -> SeedResult:
    """Run the seed program for one master; returns host-side results."""
    return seed_finish(seed_dispatch(data, instart, inend, maxblocks,
                                     interpret, cheap, window_start))


def _filler(n: int) -> np.ndarray:
    return (np.arange(n, dtype=np.uint32) * 2654435761 >> 13).astype(np.uint8)


def probably_incompressible(data: np.ndarray, instart: int,
                            inend: int) -> bool:
    """Host pre-gate: zlib level-1 barely shrinks the master.

    Only selects CHEAP candidate knobs — the stored-exit decision
    itself is made from exact seed-parse costs (SeedResult.all_stored).
    """
    import zlib
    blob = data[instart:inend].tobytes()
    return len(zlib.compress(blob, 1)) > 0.99 * len(blob)
