"""TPU-native match candidate search.

Replaces the reference's serial hash-chain walk (lz77.c:407-542, hash.c)
with a sort-based, fully data-parallel formulation:

1. A *fingerprint ladder*: rolling u32 polynomial hashes of prefixes at
   26 lengths between 3 and 258 (powers of two by doubling, in-between
   lengths by composition) at every position.
2. ONE hierarchical sort of all positions by the level-hash tuple — an
   approximate suffix order quantized to the ladder.  Sorted neighbors
   are the positions sharing the longest prefixes; the shared-prefix
   level of any pair is the running minimum of adjacent-pair levels
   (prefix sharing is transitive), so J neighbors per side yield match
   candidates with zero gathers.
3. A second small sort on the exact 3-byte key whose k most recent
   predecessors give minimal distances for short matches.
4. The min-distance-per-length step function ("sublen",
   lz77.h:115-118) as a skyline over (distance, length) pairs,
   condensed to MAX_BP breakpoints per position.

All outputs depend only on the input bytes, so one evaluation per
master block serves every squeeze iteration (this subsumes the
reference's longest-match cache, cache.c).  Match lengths are
*underestimates* (quantized to the ladder, hash-verified): a shorter
claim is always a valid match, up to hash collisions.  Candidate
equality decisions are confirmed with a second independent hash family
(see _P2) — without it, sorting by the primary hash concentrates all
of its ~n^2/2^33 pairwise collisions into adjacent slots, making false
candidates near-certain at 1 MiB scale.  The only unconfirmed checks
are the greedy-doubling refinement steps (~0.01 expected false matches
per MiB); the emission path still verifies chosen matches on the host
and falls back to the exact native engine on the rare failure.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec

# Ladder of prefix lengths (quantization grid for match lengths).
LEVELS = (3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48,
          56, 64, 80, 96, 112, 128, 160, 192, 224, 256)
# Levels used as LSD sort keys for the approximate-suffix order (the
# sorts dominate candidate-build time; adjacency still checks ALL
# LEVELS and extends exactly, so skipping sort keys only degrades
# neighbor grouping).  Named presets (ZT_SORT_LEVELS):
#   all     every LEVELS entry (26 rounds)
#   coarse  every other entry (13 rounds)
#   short   thinned AND capped at 64 (9 rounds): beyond the top sort
#           key, grouping relies on stability + the exact adjacent-lcp
#           doubling extension, which always runs to MAX_MATCH.
_SORT_PRESETS = {
    "all": LEVELS,
    "coarse": (3, 5, 7, 10, 14, 20, 28, 40, 56, 80, 112, 160, 224),
    "short": (3, 4, 6, 8, 12, 16, 24, 40, 64),
    "short12": (3, 4, 5, 6, 8, 10, 14, 20, 28, 40, 64, 128),
}
SORT_LEVELS = _SORT_PRESETS[os.environ.get("ZT_SORT_LEVELS", "all")]
# Suffix-order neighbors taken per side.
NEIGHBORS = 8
# Levels that get a dedicated most-recent-occurrence candidate (the
# min-distance occurrence per ladder length — the quantized "sublen"
# short/mid range where distance precision drives the cost model; long
# lengths are covered by the suffix neighbors).  Denser presets shrink
# the just-above-a-rung quantization loss on periodic data (log/xml
# lines recur at one period with slightly varying lengths, so one
# recent per coarse rung loses the longer occurrences — see
# PARITY_CORPUS xml/log rows).  ZT_RECENT_LEVELS selects a preset.
_RECENT_PRESETS = {
    "base": (3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32, 48, 64),
    # Step-4 rungs across 32..64 erase the xml/log quantization loss
    # (measured: xml_mime +1.03% -> +0.25%, log_repetitive +1.31% ->
    # +0.42% vs native on 384 KB slices); rungs above 64 add nothing.
    "dense": (3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32, 36, 40,
              44, 48, 52, 56, 60, 64),
}
RECENT_LEVELS = _RECENT_PRESETS[os.environ.get("ZT_RECENT_LEVELS", "dense")]
# Breakpoint slots per position in the condensed sublen table.  8 slots
# match the reference's own sublen cache (util.h:68-74); dropping an
# interior breakpoint only widens the distance used for its range.
MAX_BP = int(os.environ.get("ZT_MAX_BP", "12"))
# Exact refinement plan: one char per round, each round picks a claim
# per position and resolves its TRUE length with the RMQ below.  'L' =
# longest unrefined claim, 'D' = smallest-distance unrefined claim,
# 'R' = longest recent, '2' = longest k=2-recent.
# ZT_REFINE=<int> is accepted as legacy: n -> 'L'*min(n,2) + 'D'*(n-2).
# Measured with exact-RMQ rounds (exp_r4_refine, 1 MB slices): LD2
# beats LDD2 on text (+0.061% vs +0.185% — extra rounds can shadow
# useful breakpoints out of the condensed table) and costs log-like
# data ~0.04%; each round is ~0.12 s/MiB.
_refine_env = os.environ.get("ZT_REFINE", "LD2")
if _refine_env.isdigit():
    _n = int(_refine_env)
    REFINE_PLAN = "L" * min(_n, 2) + "D" * max(_n - 2, 0)
else:
    REFINE_PLAN = _refine_env.upper()
# Exact match lengths for every distance 1..SHORT_DISTS (vectorized
# equality runs, no hashing): the cheapest distances in the cost model
# get exact sublen entries, and d=1 covers same-byte runs (the
# reference's hash.c:128-136 second-hash mechanism).
SHORT_DISTS = int(os.environ.get("ZT_SHORT_DISTS", "16"))
# k=2 recents: add a 2nd most-recent occurrence column per rung for
# rungs >= this value (0 = off).  Pairs with a '2' refinement round.
RECENT_K2_MIN = int(os.environ.get("ZT_RECENT_K2", "16"))

# Engine-level candidate knobs: the fused engine reads these at table
# build time, so an in-process experiment can A/B variants while the
# (much more expensive to compile) scan kernels stay warm.  max_bp is
# NOT here — it changes the scan kernel geometry (env-only, ZT_MAX_BP).
KNOBS = {
    "sort_levels": SORT_LEVELS,
    "refine_plan": REFINE_PLAN,
    "short_dists": SHORT_DISTS,
    "recent_k2_min": RECENT_K2_MIN,
    "recent_levels": RECENT_LEVELS,
    "sort_group": 0,
}


def current_knobs() -> dict:
    return dict(KNOBS)

# Polynomial rolling-hash bases (odd, so powers never vanish mod 2^32).
# Two independent families: sorts and grouping use _P; every equality
# DECISION is confirmed with the _P2 family.  Sorting positions by a
# 32-bit hash concentrates all of its pairwise collisions into adjacent
# slots (~n^2/2^33 false pairs per level — hundreds at 1 MiB), so a
# single family makes false long matches near-certain at master scale;
# the second family cuts the false-candidate rate to ~2^-64 per pair.
_P = np.uint32(0x01000193)
_P2 = np.uint32(0xCC9E2D51)


def _pow_mod(e: int, base: np.uint32 = _P) -> np.uint32:
    r = np.uint64(1)
    b = np.uint64(base)
    while e:
        if e & 1:
            r = (r * b) & np.uint64(0xFFFFFFFF)
        b = (b * b) & np.uint64(0xFFFFFFFF)
        e >>= 1
    return np.uint32(r)


def _ladder(data_padded: jnp.ndarray,
            base: np.uint32 = _P) -> dict[int, jnp.ndarray]:
    """u32 prefix hashes for every LEVELS entry (+ pow2 scaffolding).

    Polynomial hash H(s) = sum b[k] * P^(L-1-k): composition
    H_{a+b}[i] = H_a[i] * P^b + H_b[i+a] builds any length from
    power-of-two pieces (data must be padded by >= 256 bytes).
    """
    n = data_padded.shape[0]
    h = {1: data_padded.astype(jnp.uint32)}
    pow_mod = functools.partial(_pow_mod, base=base)

    def shifted(arr, by):
        return jnp.concatenate([arr[by:], jnp.zeros(by, jnp.uint32)])

    for lvl in (2, 4, 8, 16, 32, 64, 128, 256):
        half = lvl // 2
        h[lvl] = h[half] * jnp.uint32(pow_mod(half)) + shifted(h[half], half)

    def compose(parts):
        acc = None
        off = 0
        for p in parts:
            piece = shifted(h[p], off) if off else h[p]
            acc = piece if acc is None else \
                acc * jnp.uint32(pow_mod(p)) + piece
            off += p
        return acc

    decomp = {3: (2, 1), 5: (4, 1), 6: (4, 2), 7: (4, 2, 1),
              10: (8, 2), 12: (8, 4), 14: (8, 4, 2), 20: (16, 4),
              24: (16, 8), 28: (16, 8, 4), 36: (32, 4), 40: (32, 8),
              44: (32, 8, 4), 48: (32, 16), 52: (32, 16, 4),
              56: (32, 16, 8), 60: (32, 16, 8, 4), 80: (64, 16),
              96: (64, 32), 112: (64, 32, 16), 160: (128, 32),
              192: (128, 64), 224: (128, 64, 32)}
    for lvl, parts in decomp.items():
        h[lvl] = compose(parts)

    # Exact 3-byte key (24 bits, collision-free) replaces the hashed 3.
    b = data_padded.astype(jnp.uint32)
    h[3] = (b << 16) | (shifted(b, 1) << 8) | shifted(b, 2)
    return h


# Fixed window-prefix length in the padded block layout: the block's
# bytes always start at row PREFIX of the padded array; rows [PREFIX -
# prefix_len, PREFIX) hold real preceding bytes, earlier rows are filler
# rejected via min_pos.
PREFIX = spec.WINDOW_SIZE


@functools.partial(
    jax.jit,
    static_argnames=("block_cap", "sort_levels", "refine_plan", "max_bp",
                     "short_dists", "recent_k2_min", "recent_levels",
                     "sort_group", "stage"))
def build_candidates(data_padded: jnp.ndarray, block_cap: int,
                     min_pos: jnp.ndarray, inend_real: jnp.ndarray,
                     *, sort_levels: tuple = SORT_LEVELS,
                     refine_plan: str = REFINE_PLAN,
                     max_bp: int = MAX_BP,
                     short_dists: int = SHORT_DISTS,
                     recent_k2_min: int = RECENT_K2_MIN,
                     recent_levels: tuple = RECENT_LEVELS,
                     sort_group: int = 0,
                     stage: int = 0):
    """Per-position condensed sublen tables for a block.

    data_padded: uint8 of length PREFIX + block_cap + >=258; the block
    occupies rows [PREFIX, PREFIX + real_len).
    block_cap: static padded block length (bucketed to limit recompiles).
    min_pos: first row holding a real byte (PREFIX - prefix_len).
    inend_real: PREFIX + real block length.
    Keyword-only statics override the module-level env defaults (used by
    the experiment harness and engine-level tuning); recent_k2_min > 0
    adds a SECOND most-recent occurrence column for every RECENT_LEVELS
    rung >= recent_k2_min (periodic data has multiple same-rung
    occurrences with different true lengths — one recent per rung loses
    the longer ones; see PARITY_CORPUS xml/log rows).

    Returns (bp_len, bp_dist, best_len):
      bp_len  (block_cap, max_bp) int32 — breakpoint lengths, ascending
      bp_dist (block_cap, max_bp) int32 — distance for lengths in
              (bp_len[k-1], bp_len[k]]
      best_len (block_cap,) int32 — longest match, <3 if none
    """
    h = _ladder(data_padded)
    h2 = _ladder(data_padded, base=_P2)
    n = data_padded.shape[0]
    instart = PREFIX
    L = block_cap
    nl = len(LEVELS)
    if stage == 1:        # profiling early-exit: ladders only
        return h[256], h2[256], h[3]

    # EXACT suffix order by prefix doubling on ranks (Manber-Myers on
    # the VPU): the initial sort keys on the exact 24-bit 3-byte word,
    # then each round sorts by (rank, rank[i + p]) — collision-free
    # integer ranks, so within-group order is truly lexicographic.
    # This replaced the 26-round hash-LSD order in r4: the sparse-table
    # RMQ refinement below is only EXACT on a true suffix order (on the
    # hash order, within-group placement is by hash value, so the
    # min-chain frequently bottomed out at the pair's rung — measured
    # +0.2% size).  7 doubling rounds cover prefix length 384 > 258.
    # sort_levels / sort_group are retained for API compatibility but
    # no longer shape the order (the doubling rounds are fixed).
    del sort_levels, sort_group
    iota_i32 = jnp.arange(n, dtype=jnp.int32)
    sk3, sidx = jax.lax.sort((h[3], iota_i32), num_keys=1, is_stable=True)
    changed = jnp.concatenate(
        [jnp.ones(1, bool), sk3[1:] != sk3[:-1]])
    rank = jnp.zeros(n, jnp.int32).at[sidx].set(
        jnp.cumsum(changed.astype(jnp.int32)) - 1)
    p = 3
    while p < spec.MAX_MATCH:
        rs = jnp.concatenate([rank[p:], jnp.full(p, -1, jnp.int32)])
        r_s, rs_s, sidx = jax.lax.sort((rank, rs, iota_i32), num_keys=2,
                                       is_stable=True)
        changed = jnp.concatenate(
            [jnp.ones(1, bool),
             (r_s[1:] != r_s[:-1]) | (rs_s[1:] != rs_s[:-1])])
        rank = jnp.zeros(n, jnp.int32).at[sidx].set(
            jnp.cumsum(changed.astype(jnp.int32)) - 1)
        p *= 2
    if stage == 2:        # profiling early-exit: + suffix sort rounds
        return sidx, sidx, sidx
    hstack = jnp.stack([h[lvl] for lvl in LEVELS])   # (nl, n)
    skeys = hstack[:, sidx]                          # one batched gather

    # Adjacent-pair shared-prefix LENGTH (0 = not even 3 bytes); storing
    # lengths directly (min of lengths == min of levels, monotone)
    # removes a 26-way level->length expansion downstream.
    all_eq = jnp.ones(n, bool)
    adj_lvl = jnp.zeros(n, jnp.int16)
    adj_idx = jnp.zeros(n, jnp.int32)
    for li in range(nl):
        sk = skeys[li]
        eq = jnp.concatenate(
            [jnp.zeros(1, bool), sk[1:] == sk[:-1]])
        all_eq = all_eq & eq
        adj_lvl = jnp.where(all_eq, np.int16(LEVELS[li]), adj_lvl)
        adj_idx = jnp.where(all_eq, li, adj_idx)

    # Confirm each pair's claimed level with the second hash family:
    # two flat n-sized gathers at the final level (not 26n) — a pair
    # failing confirmation is a sort-concentrated _P collision.
    h2flat = jnp.stack([h2[lvl] for lvl in LEVELS]).reshape(-1)
    sidx_prev = jnp.concatenate([sidx[:1], sidx[:-1]])
    vcur = jnp.take(h2flat, adj_idx * n + sidx)
    vprev = jnp.take(h2flat, adj_idx * n + sidx_prev)
    adj_lvl = jnp.where(vcur == vprev, adj_lvl, np.int16(0))

    # Make every adjacent-pair lcp EXACT: the true lcp lies in
    # [rung, next_rung) and rung gaps are <= 32, so six doubling
    # levels extend each confirmed rung to the exact shared-prefix
    # length (12 n-sized gathers total).  lcp obeys the ultrametric
    # inequality lcp(a,c) >= min(lcp(a,b), lcp(b,c)) in ANY order, so
    # the running-min neighbor chains below stay valid and get
    # near-exact lengths for all 2J neighbors at once — what used to
    # need a per-candidate refinement round each.
    ln_adj = adj_lvl.astype(jnp.int32)
    for lvl in (32, 16, 8, 4, 2, 1):
        fits = ln_adj >= spec.MIN_MATCH
        a = jnp.take(h[lvl], jnp.where(fits, sidx + ln_adj, 0),
                     mode="clip")
        b = jnp.take(h[lvl], jnp.where(fits, sidx_prev + ln_adj, 0),
                     mode="clip")
        ln_adj = jnp.where(fits & (a == b), ln_adj + lvl, ln_adj)
    adj_lvl = jnp.minimum(ln_adj, spec.MAX_MATCH).astype(jnp.int16)
    if stage == 3:        # profiling early-exit: + adjacency/exact lcp
        return adj_lvl, sidx, sidx

    # Neighbor candidates: positions j slots away in suffix order, with
    # pairwise level = running min of adjacent levels (transitivity).
    cand_list = []
    lvl_list = []
    run_prev = None
    run_next = None
    for j in range(1, NEIGHBORS + 1):
        # previous neighbor at sorted slot i-j: chain over adj[i-j+1..i]
        if run_prev is None:
            run_prev = adj_lvl
        else:
            shifted = jnp.concatenate(
                [jnp.zeros(j - 1, jnp.int16), adj_lvl[:-(j - 1)]])
            run_prev = jnp.minimum(run_prev, shifted)
        cprev = jnp.concatenate(
            [jnp.full(j, -1, jnp.int32), sidx[:-j]])
        cand_list.append(cprev)
        lvl_list.append(run_prev)
        # next neighbor at sorted slot i+j: chain over adj[i+1..i+j]
        nshift = jnp.concatenate(
            [adj_lvl[j:], jnp.zeros(j, jnp.int16)])
        if run_next is None:
            run_next = nshift
        else:
            run_next = jnp.minimum(run_next, nshift)
        cnext = jnp.concatenate(
            [sidx[j:], jnp.full(j, -1, jnp.int32)])
        cand_list.append(cnext)
        lvl_list.append(run_next)

    cand_sorted = jnp.stack(cand_list, axis=1)       # (n, 2J) positions
    lvl_sorted = jnp.stack(lvl_list, axis=1)         # (n, 2J) lengths

    # Back to position order.
    cand_pos = jnp.full((n, 2 * NEIGHBORS), -1, jnp.int32)
    cand_pos = cand_pos.at[sidx].set(cand_sorted)
    cand_lvl = jnp.zeros((n, 2 * NEIGHBORS), jnp.int16)
    cand_lvl = cand_lvl.at[sidx].set(lvl_sorted)

    # Slice to block rows.
    cand_pos = cand_pos[instart:instart + L]
    cand_lvl = cand_lvl[instart:instart + L]
    if stage == 4:        # profiling early-exit: + neighbors/scatter
        return cand_pos, cand_lvl, sidx

    pos = jnp.arange(L, dtype=jnp.int32)[:, None] + instart
    cap = jnp.clip(inend_real - pos, 0, spec.MAX_MATCH)   # (L, 1)
    cap16 = cap.astype(jnp.int16)

    # Candidate (length, dist) columns are 16-bit from here on: lengths
    # fit i16 (<= 258), distances fit u16 (sentinel WINDOW_SIZE+1 =
    # 32769 < 65536).  The (L, ~70) column tables are the largest
    # materializations in the build (the concat alone was ~0.4 s/MiB at
    # i32 — exp_r4_candphases/exp_r5_knobs); halving element width
    # halves that HBM traffic, and the skyline below sorts ONE packed
    # u32 key instead of multi-array payloads.

    # Suffix-neighbor candidates (lengths already ladder-quantized).
    valid_n = (cand_pos >= 0) & (cand_pos >= min_pos) & (cand_pos < pos)
    dist_n32 = jnp.where(valid_n, pos - cand_pos, spec.WINDOW_SIZE + 1)
    ok_n = valid_n & (dist_n32 <= spec.WINDOW_SIZE)
    dist_n = jnp.where(ok_n, dist_n32, spec.WINDOW_SIZE + 1) \
        .astype(jnp.uint16)
    ln_n = jnp.where(ok_n, cand_lvl, np.int16(0))
    ln_n = jnp.minimum(ln_n, cap16)

    # Per-level most-recent candidates: the minimum distance achieving
    # each ladder length (distance precision for short/mid matches).
    # All levels ride ONE batched stable sort (identical per-row results
    # to the per-level sorts; dimension=1 sorts rows independently).
    nr = len(recent_levels)
    keys = jnp.stack([h[lvl] for lvl in recent_levels])        # (R, n)
    keys2 = jnp.stack([h2[lvl] for lvl in recent_levels])
    idx_b = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                             keys.shape)
    sk, si, sk2 = jax.lax.sort((keys, idx_b, keys2), num_keys=1,
                               is_stable=True, dimension=1)
    prev_i = jnp.concatenate(
        [jnp.full((nr, 1), -1, jnp.int32), si[:, :-1]], axis=1)
    prev_k = jnp.concatenate(
        [jnp.zeros((nr, 1), keys.dtype), sk[:, :-1]], axis=1)
    prev_k2 = jnp.concatenate(
        [jnp.zeros((nr, 1), keys2.dtype), sk2[:, :-1]], axis=1)
    same = (prev_k == sk) & (prev_k2 == sk2) & (prev_i >= min_pos)
    dist_sr = si - prev_i
    ok = same & (dist_sr >= 1) & (dist_sr <= spec.WINDOW_SIZE)
    cand_r = jnp.where(ok, prev_i, -1)
    recent_all = jnp.full(keys.shape, -1, jnp.int32)
    recent_all = recent_all.at[jnp.arange(nr)[:, None], si].set(cand_r)
    recent_all = recent_all[:, instart:instart + L]             # (R, L)

    ln_parts = [ln_n]
    dist_parts = [dist_n]
    lvl_arr = np.asarray(recent_levels, np.int16)
    valid_r = recent_all >= 0
    # recents were built with dist <= WINDOW_SIZE (mask `ok` above), so
    # valid entries fit u16 directly.
    dist_r = jnp.where(valid_r, pos.T - recent_all,
                       spec.WINDOW_SIZE + 1).astype(jnp.uint16)
    ln_r = jnp.where(valid_r, lvl_arr[:, None], np.int16(0))
    ln_parts.append(jnp.minimum(ln_r, cap16.T).T)
    dist_parts.append(dist_r.T)

    # k=2 recents: the SECOND most-recent occurrence per rung, for rungs
    # >= recent_k2_min.  Same sorted arrays, one more shift — no extra
    # sort.  These enter at the rung length with a larger distance, so
    # they only matter once a refinement round extends them (kind '2').
    n_k2 = 0
    if recent_k2_min:
        k2_rows = [i for i, lvl in enumerate(recent_levels)
                   if lvl >= recent_k2_min]
        n_k2 = len(k2_rows)
        rows_a = np.asarray(k2_rows, np.int32)
        prev2_i = jnp.concatenate(
            [jnp.full((nr, 2), -1, jnp.int32), si[:, :-2]], axis=1)
        same2 = jnp.concatenate(
            [jnp.zeros((nr, 2), bool),
             (sk[:, 2:] == sk[:, :-2]) & (sk2[:, 2:] == sk2[:, :-2])],
            axis=1) & (prev2_i >= min_pos)
        d2 = si - prev2_i
        ok2 = same2 & (d2 >= 1) & (d2 <= spec.WINDOW_SIZE)
        cand2 = jnp.where(ok2, prev2_i, -1)
        recent2 = jnp.full((nr, n), -1, jnp.int32)
        recent2 = recent2.at[jnp.arange(nr)[:, None], si].set(cand2)
        recent2 = recent2[rows_a][:, instart:instart + L]     # (K2, L)
        valid2 = recent2 >= 0
        dist2 = jnp.where(valid2, pos.T - recent2,
                          spec.WINDOW_SIZE + 1).astype(jnp.uint16)
        ln2 = jnp.where(valid2, lvl_arr[rows_a][:, None], np.int16(0))
        ln_parts.append(jnp.minimum(ln2, cap16.T).T)
        dist_parts.append(dist2.T)
    if stage == 5:        # profiling early-exit: + recents (+k2)
        return ln_parts[-1], dist_parts[-1], cand_pos

    # Exact short-distance candidates: for d = 1..SHORT_DISTS the match
    # length at p is the run of data[i] == data[i-d] starting at p —
    # one compare + one suffix-min per distance, no hashing, exact.
    if short_dists:
        iota_n = jnp.arange(n, dtype=jnp.int32)
        x = data_padded
        # All distances at once, run lengths by doubling: after step s,
        # r = min(true_run, 2s), so 9 constant-shift steps reach the
        # MAX_MATCH cap.  The former per-d reverse-cummax-reverse chain
        # cost ~0.4 s/MiB on TPU (cummax lowers to a full O(n log n)
        # scan; phase-timed in exp_r4_candphases.py); these are pure
        # elementwise ops with static shifts.
        eq_rows = jnp.stack([
            jnp.concatenate([jnp.zeros(d, bool), x[d:] == x[:-d]])
            for d in range(1, short_dists + 1)])          # (D, n)
        r = eq_rows.astype(jnp.int16)
        for s in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            sh = jnp.concatenate(
                [r[:, s:], jnp.zeros((short_dists, s), jnp.int16)],
                axis=1)
            r = jnp.where(r == np.int16(s), r + sh, r)
        runlen = r                                        # (D, n)
        dvec = jnp.arange(1, short_dists + 1, dtype=jnp.int32)
        # Source must be a real (halo) byte: p - d >= min_pos.
        ok = (iota_n[None, :] - dvec[:, None]) >= min_pos
        ln_sd = jnp.where(ok, runlen, np.int16(0))[:, instart:instart + L].T
        ln_parts.append(jnp.minimum(ln_sd, cap16))
        dist_parts.append(jnp.broadcast_to(
            jnp.arange(1, short_dists + 1, dtype=jnp.uint16)[None, :],
            (L, short_dists)))

    lcp = jnp.concatenate(ln_parts, axis=1)
    dist = jnp.concatenate(dist_parts, axis=1)
    C = lcp.shape[1]
    if stage == 6:        # profiling early-exit: + short dists, concat
        return lcp, dist, cand_pos

    # Exact refinement of REFINE_ROUNDS candidates per position.  The
    # first rounds take the LONGEST claims (ladder quantization costs
    # most there); later rounds take the SMALLEST-distance unrefined
    # claims — their true length often exceeds the rung (e.g. a
    # length-9 match surfaces as the level-8 recent), and the skyline
    # turns each refinement into exact min-dist entries for the
    # in-between lengths.
    #
    # Each round resolves its claim's TRUE length with a sparse-table
    # range-min over the exact adjacent lcps in suffix order (the
    # classic SA-LCP identity: lcp(a, b) = min of adjacent lcps between
    # their suffix ranks).  Three n-gathers per round replace the
    # 12-18 gathers of the former greedy-doubling ladder (phase-timed
    # at 0.86 s/MiB for plan LDD2; see exp_r4_candphases.py).  On a
    # hash-misordered run (sort-concentrated collision) the chain min
    # is a strict LOWER bound on the true lcp — claims never overstate
    # a length, which is the direction verify_parse guards.
    rows1 = jnp.arange(L, dtype=jnp.int32)
    p1 = pos[:, 0]
    cap1 = cap[:, 0]
    rank = jnp.zeros(n, jnp.int32).at[sidx].set(
        jnp.arange(n, dtype=jnp.int32))
    rank_blk = rank[instart:instart + L]            # rank[p1] as a slice
    nlev = max(1, (n - 1).bit_length())
    t_levels = [adj_lvl]
    tcur = adj_lvl
    for k in range(1, nlev + 1):
        sh = 1 << (k - 1)
        tcur = jnp.minimum(
            tcur, jnp.concatenate(
                [tcur[sh:], jnp.full(sh, np.int16(spec.MAX_MATCH))]))
        t_levels.append(tcur)
    t_flat = jnp.concatenate(t_levels)              # ((nlev+1) * n,)

    def rmq_lcp(c_other):
        """Exact lcp(p1, c_other) via the suffix-order sparse table."""
        rb = jnp.take(rank, c_other, mode="clip")
        lo = jnp.minimum(rank_blk, rb) + 1
        hi = jnp.maximum(rank_blk, rb)
        width = hi - lo + 1                          # >= 1
        # floor(log2) exactly via the f32 exponent (ints < 2^24).
        k = (jax.lax.bitcast_convert_type(
            width.astype(jnp.float32), jnp.int32) >> 23) - 127
        pk = jnp.left_shift(1, k)
        v1 = jnp.take(t_flat, k * n + lo, mode="clip")
        v2 = jnp.take(t_flat, k * n + hi - pk + 1, mode="clip")
        return jnp.minimum(v1, v2).astype(jnp.int32)
    # The short-distance columns are exact by construction — exclude
    # them from refinement candidate selection, or the min-dist rounds
    # burn their picks on d<=SHORT_DISTS entries and the rung-quantized
    # recents (e.g. the line-period matches of log-like data, whose
    # true lengths sit just above a rung) never get extended.
    lcp_work = lcp
    if short_dists:
        selectable = np.ones(C, bool)
        selectable[C - short_dists:] = False
        lcp_work = jnp.where(jnp.asarray(selectable)[None, :], lcp,
                             np.int16(0))
    n_neigh = 2 * NEIGHBORS
    # Rounds are scatter- and gather-free (r5): the chosen column is
    # read with a one-hot select-max, removed from the skyline input
    # with an elementwise where, and the refined entry is APPENDED as a
    # new column — the skyline only sees the entry set, so this is
    # exactly equivalent to the former in-place .at[rows, bestk].set
    # updates, which lowered to 1M-row scatters (~0.25 s/MiB of the
    # 0.37 s/MiB refine cost; exp_r5_knobs).
    iota_c = jnp.arange(C, dtype=jnp.int32)
    extra_ln, extra_dist = [], []
    for kind in refine_plan:
        if kind == "L":
            bestk = jnp.argmax(lcp_work, axis=1)
        elif kind == "R":
            # Longest RECENT claim: recents are the min-dist occurrence
            # per rung, so this extends the highest rung reachable at a
            # small distance (log-period matches sit just above it).
            rsel = np.zeros(C, bool)
            rsel[n_neigh:n_neigh + len(recent_levels)] = True
            bestk = jnp.argmax(
                jnp.where(jnp.asarray(rsel)[None, :], lcp_work,
                          np.int16(0)), axis=1)
        elif kind == "2":
            # Longest k=2-recent claim: same-rung second occurrences
            # are skyline-dominated until extended past their rung.
            rsel = np.zeros(C, bool)
            rsel[n_neigh + nr:n_neigh + nr + n_k2] = True
            bestk = jnp.argmax(
                jnp.where(jnp.asarray(rsel)[None, :], lcp_work,
                          np.int16(0)), axis=1)
        else:
            dist_work = jnp.where(lcp_work >= spec.MIN_MATCH, dist,
                                  np.uint16(65535))
            bestk = jnp.argmin(dist_work, axis=1)
        sel = iota_c[None, :] == bestk[:, None]          # (L, C)
        bdist = jnp.max(jnp.where(sel, dist, np.uint16(0)),
                        axis=1).astype(jnp.int32)
        claim = jnp.max(jnp.where(sel, lcp_work, np.int16(0)),
                        axis=1).astype(jnp.int32)
        has = claim >= spec.MIN_MATCH
        c1 = jnp.where(has, p1 - bdist, 0)
        ln = jnp.minimum(rmq_lcp(c1), cap1)
        refined = jnp.maximum(claim, jnp.where(has, ln, 0))
        extra_ln.append(jnp.where(has, refined, 0).astype(jnp.int16))
        extra_dist.append(jnp.where(has, bdist, spec.WINDOW_SIZE + 1)
                          .astype(jnp.uint16))
        # The appended column supersedes the chosen one: drop it from
        # the skyline input (only when actually refined) and from the
        # next round's selection (always — matching the former
        # unconditional lcp_work masking).
        lcp = jnp.where(sel & has[:, None], np.int16(0), lcp)
        lcp_work = jnp.where(sel, np.int16(0), lcp_work)
    if extra_ln:
        lcp = jnp.concatenate(
            [lcp] + [e[:, None] for e in extra_ln], axis=1)
        dist = jnp.concatenate(
            [dist] + [e[:, None] for e in extra_dist], axis=1)
        C = lcp.shape[1]

    if stage == 7:        # profiling early-exit: + refinement rounds
        return lcp, dist, cand_pos

    # Skyline: sort rows by ONE packed u32 key, dist << 9 | (258 - len)
    # == (distance asc, length desc) — no payload arrays (the former
    # 2-key payload sort moved 4x the bytes), then keep candidates
    # whose length strictly exceeds every smaller-distance length.
    MM = np.uint32(spec.MAX_MATCH)
    packed = (dist.astype(jnp.uint32) << 9) | \
        (MM - lcp.astype(jnp.uint32))
    packed_s = jax.lax.sort(packed, dimension=1, is_stable=False)
    enc_s = (packed_s & np.uint32(511)).astype(jnp.int16)  # 258 - len
    # Running min of enc == running max of length; init = 258 -
    # (MIN_MATCH - 1).
    run_min = jax.lax.cummin(
        jnp.concatenate(
            [jnp.full((L, 1), np.int16(spec.MAX_MATCH - spec.MIN_MATCH + 1)),
             enc_s[:, :-1]], axis=1), axis=1)
    keep = (enc_s < run_min) & \
        (enc_s <= np.int16(spec.MAX_MATCH - spec.MIN_MATCH)) & \
        (packed_s < np.uint32((spec.WINDOW_SIZE + 1) << 9))

    best_len = (np.int32(spec.MAX_MATCH) - jnp.min(
        jnp.where(keep, enc_s, np.int16(spec.MAX_MATCH)),
        axis=1).astype(jnp.int32))

    # Condense to max_bp slots (first max_bp-1 kept plus the final,
    # longest one) via one more single-key u32 sort: rank (7b) | len
    # (9b) | dist (16b), dropped entries parked at rank C.
    assert C < 128, C
    slot = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(keep, slot, C)
    nkept = jnp.sum(keep, axis=1)
    last_slot = nkept - 1
    is_last = keep & (slot == last_slot[:, None])
    rank = jnp.where(
        slot < max_bp - 1, slot,
        jnp.where(is_last, jnp.minimum(last_slot, max_bp - 1)[:, None], C))
    lenbits = jnp.where(keep, MM - enc_s.astype(jnp.uint32), np.uint32(0))
    distbits = jnp.where(keep, packed_s >> 9, np.uint32(0))
    v = (rank.astype(jnp.uint32) << 25) | (lenbits << 16) | distbits
    v_s = jax.lax.sort(v, dimension=1, is_stable=False)[:, :max_bp]
    bp_len = ((v_s >> 16) & np.uint32(511)).astype(jnp.int32)
    bp_dist = (v_s & np.uint32(65535)).astype(jnp.int32)
    return bp_len, bp_dist, best_len
