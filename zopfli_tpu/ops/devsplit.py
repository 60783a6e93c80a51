"""Device-side block splitting: ZopfliBlockSplitLZ77 as one jitted program.

The reference's splitter (blocksplitter.c:215-275) repeatedly picks the
largest unsplit segment and finds its best single split point with a
9-probe recursive search (FindMinimum, blocksplitter.c:43-96), where
each probe evaluates the exact auto-type block cost of both halves
(deflate.c:585-621).  Here the WHOLE search runs on device in one
dispatch: range histograms come from checkpointed cumulative histograms
(the lz77.h:56-61 trick as device arrays), probe costs batch through
the exact integer cost stack (ops.costmodel), and the outer
accept/mark-done loop is a fori_loop — no per-probe host round trips
(a chained dispatch costs 250-500 ms on the remote transport).

Semantics notes (bit-exact to the reference):
  - auto-type cost = min(uncompressed, fixed, dynamic); the fixed cost
    is only computed when the whole store has <= 1000 symbols
    (deflate.c:612-615), else it aliases the uncompressed cost.
  - FindMinimum's nine probes narrow to [p[i-1], p[i+1]] and stop when
    the best worsens or the range is <= 9; ranges under 1024 are
    scanned linearly.  All costs are integers, so f32/f64 comparison
    order cannot diverge.
  - done[] segments are keyed by their start symbol index, and the last
    segment ends at size-1 (FindLargestSplittableBlock quirk,
    blocksplitter.c:201).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .. import spec
from . import costmodel

CKPT = 256           # symbols per cumulative-histogram checkpoint
LINEAR_MAX = 1024    # FindMinimum linear-scan bound (blocksplitter.c:44)
NUM = 9              # probe count (blocksplitter.c:59)
BIG = np.int32(1) << 30

_LSYM = np.zeros(259, np.int32)
_LSYM[3:259] = spec.LENGTH_SYMBOL[3:259]
_FIXED_LL_BITS = np.zeros(spec.NUM_LL, np.int32)
_FIXED_LL_BITS[:144] = 8
_FIXED_LL_BITS[144:256] = 9
_FIXED_LL_BITS[256:280] = 7
_FIXED_LL_BITS[280:] = 8
_LL_EXTRA = np.zeros(spec.NUM_LL, np.int32)
_LL_EXTRA[257:286] = spec.LENGTH_SYMBOL_EXTRA_BITS
_D_EXTRA = np.zeros(spec.NUM_D, np.int32)
_D_EXTRA[:30] = spec.DIST_SYM_EXTRA_BITS


def _dist_symbol(dist: jnp.ndarray) -> jnp.ndarray:
    d1 = jnp.maximum(dist - 1, 1)
    lg = 31 - jax.lax.clz(d1)
    r = (d1 >> jnp.maximum(lg - 1, 0)) & 1
    return jnp.where(dist < 5, dist - 1, 2 * lg + r).astype(jnp.int32)


def stream_symbols(litlens, dists, ncap: int, nsym):
    """(ll_sym, d_sym, nbytes) for an LZ77 stream, devsplit conventions:
    ll_sym 0 outside [0, nsym), d_sym -1 for literals/invalid."""
    iota = jnp.arange(ncap, dtype=jnp.int32)
    valid = iota < nsym
    is_match = dists != 0
    ll_sym = jnp.where(is_match,
                       jnp.asarray(_LSYM)[jnp.minimum(litlens, 258)],
                       litlens)
    ll_sym = jnp.where(valid, ll_sym, 0)
    d_sym = jnp.where(is_match & valid, _dist_symbol(dists), -1)
    nbytes = jnp.where(valid, jnp.where(is_match, litlens, 1), 0)
    return ll_sym, d_sym, nbytes


def prefix_hist_at(ll_ck, d_ck, ll_sym, d_sym, pts, ncap: int):
    """Cumulative (ll, d) histograms of symbols [0, pts[b]), batched.

    ll_ck/d_ck/ll_sym/d_sym as built by split_lz77_device(return_ck=
    True) + stream_symbols; pts (B,) int32 in [0, ncap].
    """
    j = pts // CKPT
    base_ll = ll_ck[j]
    base_d = d_ck[j]
    start = j * CKPT
    ck_pos = jnp.arange(CKPT, dtype=jnp.int32)
    rows_i = jnp.minimum(start[:, None] + ck_pos[None, :], ncap - 1)
    sym_rows = ll_sym[rows_i]
    dsym_rows = d_sym[rows_i]
    m = ck_pos[None, :] < (pts - start)[:, None]
    B = pts.shape[0]
    bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                            sym_rows.shape)
    part_ll = jnp.zeros((B, spec.NUM_LL), jnp.int32).at[
        bidx, sym_rows].add(jnp.where(m, 1, 0))
    part_d = jnp.zeros((B, spec.NUM_D), jnp.int32).at[
        bidx, jnp.maximum(dsym_rows, 0)].add(
        jnp.where(m & (dsym_rows >= 0), 1, 0))
    return base_ll + part_ll, base_d + part_d


def autotype_costs(ll_ck, d_ck, ll_sym, d_sym, bcum, starts, ends,
                   ncap: int, small_store):
    """Exact auto-type bits of blocks [starts[i], ends[i]), batched.

    Arrays as built by split_lz77_device(return_ck=True) +
    stream_symbols; starts/ends (B,) symbol indices; small_store is the
    GetFixedCost gate (deflate.c:612-615) — a scalar for the
    whole-store rule or a (B,) vector for the per-block-store rule
    (the reference applies it to whichever store the cost call sees).
    Returns (B,) int32 (0-length blocks cost BIG).
    """
    pll, pd = prefix_hist_at(ll_ck, d_ck, ll_sym, d_sym,
                             jnp.concatenate([starts, ends]), ncap)
    B = starts.shape[0]
    ll_h = pll[B:] - pll[:B]
    d_h = pd[B:] - pd[:B]
    length = bcum[jnp.minimum(ends, ncap)] - bcum[jnp.minimum(starts, ncap)]
    rem = length % 65535
    nblk = length // 65535 + (rem != 0)
    unc = nblk * 40 + length * 8
    dyn = 3 + costmodel.hist_dynamic_cost(ll_h, d_h)
    ll_h1 = ll_h.at[:, 256].set(1)
    fx = 3 + jnp.sum(
        ll_h1 * (jnp.asarray(_FIXED_LL_BITS) + jnp.asarray(_LL_EXTRA)),
        axis=1) + jnp.sum(d_h * (5 + jnp.asarray(_D_EXTRA)), axis=1)
    fixed = jnp.where(small_store, fx, unc)
    cost = jnp.minimum(jnp.minimum(unc, fixed), dyn)
    return jnp.where(ends > starts, cost, BIG)


@functools.partial(jax.jit, static_argnums=(2, 3, 6))
def split_lz77_device(litlens: jnp.ndarray, dists: jnp.ndarray,
                      ncap: int, maxblocks: int, nsym: jnp.ndarray,
                      debug_ranges=None, return_ck: bool = False):
    """Split points for one LZ77 store, entirely on device.

    litlens/dists: (ncap,) int32, real entries in [0, nsym).
    Returns (splitpoints (maxblocks,) int32 ascending, npoints int32)
    in SYMBOL indices.  With return_ck, additionally returns the
    checkpointed cumulative histograms and byte prefix
    (ll_ck (ncap/CKPT+1, 288), d_ck (..., 32), bcum (ncap+1,)) so the
    caller can derive per-block histograms/bounds without re-paying
    the stream scatter-adds (ops.seed does).
    """
    litlens = litlens.astype(jnp.int32)
    dists = dists.astype(jnp.int32)
    iota = jnp.arange(ncap, dtype=jnp.int32)
    ll_sym, d_sym, nbytes = stream_symbols(litlens, dists, ncap, nsym)

    # Checkpointed cumulative histograms + byte prefix.
    nck = ncap // CKPT
    ck_idx = iota // CKPT
    ll_ck = jnp.zeros((nck, spec.NUM_LL), jnp.int32).at[
        ck_idx, ll_sym].add(jnp.where(iota < nsym, 1, 0))
    d_ck = jnp.zeros((nck, spec.NUM_D), jnp.int32).at[
        ck_idx, jnp.maximum(d_sym, 0)].add(
        jnp.where(d_sym >= 0, 1, 0))
    ll_ck = jnp.concatenate(
        [jnp.zeros((1, spec.NUM_LL), jnp.int32),
         jnp.cumsum(ll_ck, axis=0)], axis=0)          # (nck+1, 288)
    d_ck = jnp.concatenate(
        [jnp.zeros((1, spec.NUM_D), jnp.int32),
         jnp.cumsum(d_ck, axis=0)], axis=0)
    bcum = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nbytes, dtype=jnp.int32)])

    ck_pos = jnp.arange(CKPT, dtype=jnp.int32)

    def prefix_hist(i):
        """Cumulative (ll, d) histograms of symbols [0, i), batched.

        i: (B,) int32.
        """
        j = i // CKPT
        base_ll = ll_ck[j]                             # (B, 288)
        base_d = d_ck[j]
        start = j * CKPT
        rows_i = jnp.minimum(start[:, None] + ck_pos[None, :], ncap - 1)
        sym_rows = ll_sym[rows_i]                      # (B, CKPT)
        dsym_rows = d_sym[rows_i]
        m = ck_pos[None, :] < (i - start)[:, None]
        B = i.shape[0]
        bidx = jnp.broadcast_to(jnp.arange(B, dtype=jnp.int32)[:, None],
                                sym_rows.shape)
        part_ll = jnp.zeros((B, spec.NUM_LL), jnp.int32).at[
            bidx, sym_rows].add(jnp.where(m, 1, 0))
        part_d = jnp.zeros((B, spec.NUM_D), jnp.int32).at[
            bidx, jnp.maximum(dsym_rows, 0)].add(
            jnp.where(m & (dsym_rows >= 0), 1, 0))
        return base_ll + part_ll, base_d + part_d

    small_store = nsym <= 1000

    def auto_cost(a, b):
        """Exact auto-type bits of blocks [a, b), batched over (B,)."""
        ll_a, d_a = prefix_hist(a)
        ll_b, d_b = prefix_hist(b)
        ll_h = ll_b - ll_a
        d_h = d_b - d_a
        length = bcum[b] - bcum[a]
        rem = length % 65535
        blocks = length // 65535 + (rem != 0)
        unc = blocks * 40 + length * 8          # fits int32 for <=16MB

        dyn = 3 + costmodel.hist_dynamic_cost(ll_h, d_h)

        ll_h1 = ll_h.at[:, 256].set(1)
        fx = 3 + jnp.sum(
            ll_h1 * (jnp.asarray(_FIXED_LL_BITS) + jnp.asarray(_LL_EXTRA)),
            axis=1) + jnp.sum(d_h * (5 + jnp.asarray(_D_EXTRA)), axis=1)
        fixed = jnp.where(small_store, fx, unc)

        cost = jnp.minimum(jnp.minimum(unc, fixed), dyn)
        return jnp.where(b > a, cost, BIG)

    def split_cost(i, lstart, lend):
        """(B,) split costs: cost(lstart, i) + cost(i, lend)."""
        B = i.shape[0]
        both = auto_cost(
            jnp.concatenate([jnp.full((B,), lstart, jnp.int32), i]),
            jnp.concatenate([i, jnp.full((B,), lend, jnp.int32)]))
        return both[:B] + both[B:]

    probe_sl = jnp.arange(LINEAR_MAX, dtype=jnp.int32)

    def find_minimum(lstart, lend):
        """(pos, smallest) per FindMinimum(blocksplitter.c:43-96)."""
        start0, end0 = lstart + 1, lend

        def linear():
            i = start0 + probe_sl
            ok = i < end0
            v = jnp.where(ok, split_cost(jnp.where(ok, i, start0),
                                         lstart, lend), BIG)
            k = jnp.argmin(v)
            return i[k], v[k]

        def probes():
            def body(state):
                start, end, pos, lastbest, stop = state
                step = (end - start) // (NUM + 1)
                p = start + (jnp.arange(NUM, dtype=jnp.int32) + 1) * step
                vp = split_cost(p, lstart, lend)
                besti = jnp.argmin(vp)
                best = vp[besti]
                worse = best > lastbest
                nstart = jnp.where(besti == 0, start, p[besti - 1])
                nend = jnp.where(besti == NUM - 1, end, p[besti + 1])
                npos = p[besti]
                stop2 = worse | (nend - nstart <= NUM)
                return (jnp.where(worse, start, nstart),
                        jnp.where(worse, end, nend),
                        jnp.where(worse, pos, npos),
                        jnp.where(worse, lastbest, best),
                        stop2)

            state = (start0, end0, start0, BIG, end0 - start0 <= NUM)
            state = jax.lax.while_loop(lambda s: ~s[4], body, state)
            return state[2], state[3]

        return jax.lax.cond(end0 - start0 < LINEAR_MAX, linear, probes)

    if debug_ranges is not None:
        return auto_cost(debug_ranges[:, 0], debug_ranges[:, 1])

    # --- outer accept/mark-done loop (blocksplitter.c:233-266) ---
    MB = maxblocks
    sp0 = jnp.full((MB,), ncap + 1, jnp.int32)     # sorted, sentinel-padded
    done0 = jnp.full((MB + 1,), -1, jnp.int32)     # done segment starts

    def outer(carry):
        it, state = carry
        sp, npts, done, ndone, numblocks, finished = state

        # Largest splittable segment over current splitpoints.  The
        # reference's FIRST evaluation runs on [0, size) before any
        # FindLargestSplittableBlock call; later segment ends use the
        # size-1 quirk (blocksplitter.c:235-236 vs :201).
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32), sp])[:MB + 1]
        ends = jnp.concatenate([sp, jnp.zeros(1, jnp.int32)])[:MB + 1]
        seg_i = jnp.arange(MB + 1, dtype=jnp.int32)
        ends = jnp.where(seg_i == npts, nsym - 1, ends)
        live = seg_i <= npts
        is_done = jnp.any(starts[:, None] == done[None, :], axis=1)
        lengths = jnp.where(live & ~is_done, ends - starts, -1)
        seg = jnp.argmax(lengths)
        first = it == 0
        lstart = jnp.where(first, 0, starts[seg])
        lend = jnp.where(first, nsym, ends[seg])
        found = first | (lengths[seg] > 0)

        small = lend - lstart < 10
        finished2 = finished | ~found | (numblocks >= MB) | small
        do_eval = ~finished2

        def eval_branch():
            llpos, splitcost = find_minimum(lstart, lend)
            origcost = auto_cost(lstart[None], lend[None])[0]
            return llpos, splitcost, origcost

        def skip_branch():
            return lstart + 1, BIG, jnp.int32(0)

        llpos, splitcost, origcost = jax.lax.cond(
            do_eval, eval_branch, skip_branch)
        reject = ((splitcost > origcost) | (llpos == lstart + 1)
                  | (llpos == lend))

        # reject -> mark segment start done; accept -> insert llpos.
        done2 = jnp.where(do_eval & reject,
                          done.at[ndone].set(lstart), done)
        ndone2 = ndone + (do_eval & reject).astype(jnp.int32)
        insert = do_eval & ~reject
        sp_new = jnp.sort(sp.at[npts].set(llpos))
        sp2 = jnp.where(insert, sp_new, sp)
        npts2 = npts + insert.astype(jnp.int32)
        numblocks2 = numblocks + insert.astype(jnp.int32)
        return (it + 1, (sp2, npts2, done2, ndone2, numblocks2,
                         finished2))

    state = (sp0, jnp.int32(0), done0, jnp.int32(0), jnp.int32(1),
             nsym < 10)
    # Early-exit outer loop: 2*MB bounds the accept/reject count, but
    # small stores finish in a handful of rounds — a while_loop stops
    # paying the (sequential, FindMinimum-sized) body the moment
    # `finished` latches, where a fori_loop ran all 30 rounds.
    _, state = jax.lax.while_loop(
        lambda c: (c[0] < 2 * MB) & ~c[1][5], outer,
        (jnp.int32(0), state))
    sp, npts = state[0], state[1]
    if return_ck:
        return sp, npts, ll_ck, d_ck, bcum
    return sp, npts


def block_split_lz77_device_dispatch(litlens: np.ndarray,
                                     dists: np.ndarray,
                                     maxblocks: int = 15,
                                     floor: int = CKPT):
    """Async half of block_split_lz77_device: queue the device search.

    Returns an opaque handle for ..._collect() (None for tiny stores).
    """
    n = len(litlens)
    if n < 10:
        return None
    ncap = max(CKPT, floor)
    while ncap < n + 1:
        ncap *= 2
    ll = np.zeros(ncap, np.int32)
    dd = np.zeros(ncap, np.int32)
    ll[:n] = litlens
    dd[:n] = dists
    return split_lz77_device(jnp.asarray(ll), jnp.asarray(dd),
                             ncap, maxblocks, jnp.int32(n))


def block_split_lz77_device_collect(handle) -> list[int]:
    """Blocking half of block_split_lz77_device_dispatch."""
    if handle is None:
        return []
    sp, npts = handle
    return [int(x) for x in np.asarray(sp)[:int(npts)]]


def block_split_lz77_device(litlens: np.ndarray, dists: np.ndarray,
                            maxblocks: int = 15,
                            floor: int = CKPT) -> list[int]:
    """Host wrapper: returns ascending LZ77-symbol split indices.

    floor: minimum pow2 capacity bucket — production callers pass a
    larger floor to keep the compiled shape set small (capacity only
    pads; results are identical for any ncap >= n + 1).
    """
    return block_split_lz77_device_collect(
        block_split_lz77_device_dispatch(litlens, dists, maxblocks, floor))
