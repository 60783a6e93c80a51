"""Device-side exact DEFLATE cost stack, batched over blocks.

Computes the exact dynamic-block bit size (Huffman tree header + symbol
payload) from litlen/dist histograms entirely on device, so the squeeze
iteration control (keep-best by exact size, stats feedback,
randomization — reference squeeze.c:446-526) can run inside one jitted
loop with no per-iteration host sync.

Semantics mirror the reference exactly, in fixed-shape array form:
  - package_merge: length-limited Huffman (katajainen.c) via the
    counting formulation (same tie rules as the native engine:
    leaves stable-sorted by (weight, symbol); a package precedes an
    equal-weight leaf).
  - rle_optimize: OptimizeHuffmanForRle (deflate.c:434-518). The
    serial pass's control flow depends only on the ORIGINAL counts
    (writes always land strictly behind the cursor), so it becomes a
    lax.scan emitting non-overlapping range-fill events.
  - tree_size: best of the 8 use_16/17/18 RLE variants
    (EncodeTree size path, deflate.c:105-249): per-run chunk counts
    have closed forms, so no loops at all.
  - hist_dynamic_cost: GetDynamicLengths incl. the tried-and-kept
    RleOptimize variant (deflate.c:525-582); exact integer bits.

All functions take a leading batch axis and are jit-friendly.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import spec

INF = np.int32(1 << 29)


# ---------------------------------------------------------------------------
# Package-merge (counting formulation).
# ---------------------------------------------------------------------------

def package_merge(freqs: jnp.ndarray, maxbits: int) -> jnp.ndarray:
    """Batched exact length-limited Huffman code lengths.

    freqs: (B, n) int32 (non-negative; weights must stay far below 2^29).
    Returns (B, n) int32 lengths; zero-frequency symbols get 0.
    """
    B, n = freqs.shape
    iota_n = jnp.arange(n, dtype=jnp.int32)

    used = freqs > 0
    m = jnp.sum(used, axis=1).astype(jnp.int32)          # (B,)
    # Stable sort of leaves by (weight, symbol); unused leaves to the end.
    key = jnp.where(used, freqs.astype(jnp.int32), INF)
    leaf_w, order = jax.lax.sort((key, jnp.broadcast_to(iota_n, (B, n))),
                                 num_keys=1, is_stable=True, dimension=1)

    eff_max = jnp.minimum(jnp.int32(maxbits), m - 1)     # (B,)

    # Bottom-up level lists.  Level l's merged list (packages of level
    # l-1 + all leaves) is materialized as 2n sorted weights with a
    # leaf-prefix-count array; INF padding makes the size bookkeeping
    # implicit (all real items sort before any pad).
    two_n = 2 * n
    iota_2n1 = jnp.arange(two_n + 1, dtype=jnp.int32)

    # Level 0 list = the leaves themselves.
    pfx_levels = [jnp.minimum(iota_2n1[None, :], m[:, None])]
    size_levels = [m]
    prev_w = jnp.concatenate(
        [leaf_w, jnp.full((B, n), INF, jnp.int32)], axis=1)  # (B, 2n)
    prev_size = m

    is_leaf_tpl = jnp.concatenate(
        [jnp.zeros((B, n), jnp.int32), jnp.ones((B, n), jnp.int32)], axis=1)
    leaves_padded = jnp.concatenate(
        [jnp.full((B, n), INF, jnp.int32), leaf_w], axis=1)

    for _level in range(1, maxbits):
        pw = jnp.minimum(prev_w[:, 0::2] + prev_w[:, 1::2], INF)  # (B, n)
        cand_w = leaves_padded.at[:, :n].set(pw)
        # Stable sort: packages (first) win ties against leaves.
        cur_w, leaf_flag = jax.lax.sort((cand_w, is_leaf_tpl), num_keys=1,
                                        is_stable=True, dimension=1)
        pfx = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32),
             jnp.cumsum(leaf_flag, axis=1, dtype=jnp.int32)], axis=1)
        pfx_levels.append(pfx)
        size_levels.append(prev_size // 2 + m)
        prev_w = cur_w
        prev_size = size_levels[-1]

    # Top-down take counts; levels >= eff_max are skipped so the chain
    # starts at the effective depth limit (katajainen.c:216 clamp).
    # The per-level "prefix count at take" lookup is a select-sum, not a
    # gather: XLA:CPU compile time explodes on the 15 chained dynamic
    # gathers (B>=3), and select-sums are faster on TPU anyway.
    take = 2 * m - 2                                      # (B,)
    counts = jnp.zeros((B, n), jnp.int32)
    for level in range(maxbits - 1, -1, -1):
        active = jnp.int32(level) < eff_max               # (B,)
        t = jnp.minimum(take, size_levels[level])
        leaves_taken = jnp.sum(
            jnp.where(iota_2n1[None, :] == t[:, None],
                      pfx_levels[level], 0), axis=1)      # (B,)
        counts = counts + jnp.where(
            active[:, None] & (iota_n[None, :] < leaves_taken[:, None]),
            1, 0)
        take = jnp.where(active, 2 * (t - leaves_taken), take)

    # Scatter back to symbol order.
    lengths = jnp.zeros((B, n), jnp.int32)
    lengths = lengths.at[jnp.arange(B)[:, None], order].set(counts)
    # Special cases m <= 2: every used symbol gets length 1.
    small = (m <= 2)[:, None]
    lengths = jnp.where(small, jnp.where(used, 1, 0), lengths)
    return lengths


# ---------------------------------------------------------------------------
# OptimizeHuffmanForRle.
# ---------------------------------------------------------------------------

def _run_bounds(vals: jnp.ndarray):
    """(start, end_exclusive) of the equal-value run containing each pos."""
    B, n = vals.shape
    iota = jnp.arange(n, dtype=jnp.int32)[None, :]
    change = jnp.concatenate(
        [jnp.ones((B, 1), bool), vals[:, 1:] != vals[:, :-1]], axis=1)
    start = jax.lax.cummax(jnp.where(change, iota, jnp.int32(-1)), axis=1)
    nxt = jnp.concatenate([change[:, 1:], jnp.ones((B, 1), bool)], axis=1)
    # next change at or after i+1 == end of this run (exclusive):
    # suffix-min of marked positions+1.
    marked = jnp.where(nxt, iota + 1, jnp.int32(n + 1))
    end = -jax.lax.cummax(-marked[:, ::-1], axis=1)[:, ::-1]
    return start, end


def rle_optimize(counts: jnp.ndarray) -> jnp.ndarray:
    """Batched OptimizeHuffmanForRle (deflate.c:434-518), exact."""
    B, n = counts.shape
    counts = counts.astype(jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)[None, :]

    nz = counts != 0
    length = jnp.max(jnp.where(nz, iota + 1, 0), axis=1)  # (B,)

    # good_for_rle over the original counts, within [0, length).
    start, end = _run_bounds(counts)
    runlen = end - start
    good = jnp.where(
        counts == 0, runlen >= 5, runlen >= 7) & (iota < length[:, None])

    counts_pad = jnp.concatenate(
        [counts, jnp.zeros((B, 1), jnp.int32)], axis=1)
    good_pad = jnp.concatenate([good, jnp.zeros((B, 1), bool)], axis=1)

    # Serial pass 2: control flow depends only on the original counts, so
    # run it as a scan emitting (collapse?, write_start, value) events.
    limit0 = counts[:, 0]

    def step(carry, i):
        stride, limit, ssum = carry
        ci = counts_pad[:, i]
        is_end = i == length
        done = i > length
        diff = jnp.abs(ci - limit)
        boundary = (is_end | good_pad[:, i] | (diff >= 4)) & ~done
        collapse = boundary & ((stride >= 4) | ((stride >= 3) & (ssum == 0)))
        val = jnp.where(ssum == 0, 0,
                        jnp.maximum(1, (ssum + stride // 2)
                                    // jnp.maximum(stride, 1)))
        ev = (collapse, i - stride, val)

        # limit refresh at boundaries (reads original counts ahead).
        i1 = jnp.minimum(i + 1, n)
        i2 = jnp.minimum(i + 2, n)
        i3 = jnp.minimum(i + 3, n)
        avg4 = (counts_pad[:, i] + counts_pad[:, i1] + counts_pad[:, i2]
                + counts_pad[:, i3] + 2) // 4
        new_limit = jnp.where(
            i < length - 3, avg4,
            jnp.where(i < length, ci, 0))
        limit = jnp.where(boundary, new_limit, limit)
        stride = jnp.where(boundary, 0, stride)
        ssum = jnp.where(boundary, 0, ssum)
        stride = stride + 1
        ssum = ssum + jnp.where(i != length, ci, 0) * jnp.where(done, 0, 1)
        return (stride, limit, ssum), ev

    init = (jnp.zeros(B, jnp.int32), limit0, jnp.zeros(B, jnp.int32))
    _, (ev_on, ev_start, ev_val) = jax.lax.scan(
        step, init, jnp.arange(n + 1, dtype=jnp.int32))
    # ev_*: (n+1, B)

    # Apply the (non-overlapping) range fills [start, event_step).
    ev_i = jnp.arange(n + 1, dtype=jnp.int32)[:, None, None]   # (E, 1, 1)
    pos = iota[None, :, :]                                      # (1, B, n)
    cover = (ev_on[:, :, None] & (ev_start[:, :, None] <= pos)
             & (pos < ev_i))
    filled = jnp.sum(jnp.where(cover, ev_val[:, :, None], 0), axis=0)
    covered = jnp.any(cover, axis=0)
    return jnp.where(covered, filled, counts)


# ---------------------------------------------------------------------------
# Tree header size (8 RLE variants).
# ---------------------------------------------------------------------------

_CL_ORDER = np.asarray(spec.CL_ORDER, dtype=np.int32)


def patch_dist_codes(d_lengths: jnp.ndarray) -> jnp.ndarray:
    """>=2 nonzero dist code lengths (deflate.c:86-99), batched."""
    B, _ = d_lengths.shape
    num = jnp.sum(d_lengths[:, :30] != 0, axis=1)
    d0_set = d_lengths[:, 0] != 0
    out = d_lengths
    out = out.at[:, 0].set(jnp.where(num == 0, 1, out[:, 0]))
    out = out.at[:, 1].set(jnp.where(num == 0, 1, out[:, 1]))
    out = out.at[:, 0].set(
        jnp.where((num == 1) & ~d0_set, 1, out[:, 0]))
    out = out.at[:, 1].set(
        jnp.where((num == 1) & d0_set, 1, out[:, 1]))
    return out


def tree_size(ll_lengths: jnp.ndarray, d_lengths: jnp.ndarray) -> jnp.ndarray:
    """Batched exact dynamic-tree header bits: min of the 8 RLE variants.

    ll_lengths: (B, 288) int32, d_lengths: (B, 32) int32.
    Returns (B,) int32.
    """
    B = ll_lengths.shape[0]
    i29 = jnp.arange(29, dtype=jnp.int32)[None, :]
    hlit = jnp.max(jnp.where(ll_lengths[:, 257:286] != 0, i29 + 1, 0), axis=1)
    hdist = jnp.max(jnp.where(d_lengths[:, 1:30] != 0, i29 + 1, 0), axis=1)
    hlit2 = hlit + 257
    total = hlit2 + hdist + 1                     # (B,)

    NJ = 320
    ij = jnp.arange(NJ, dtype=jnp.int32)[None, :]
    concat = jnp.concatenate([ll_lengths, d_lengths], axis=1)  # (B, 320)
    src = jnp.where(ij < hlit2[:, None], ij, ij - hlit2[:, None] + 288)
    src = jnp.clip(src, 0, NJ - 1)
    joint = jnp.take_along_axis(concat, src, axis=1)
    valid = ij < total[:, None]
    joint = jnp.where(valid, joint, -1)           # sentinel stops runs

    # Runs of equal values.
    start, end = _run_bounds(joint)
    is_start = ij == start
    runlen = (end - start)
    sym = joint                                   # per position
    use_run = is_start & valid                    # one contribution per run

    # Closed-form chunk counts per run, per variant.
    sizes = []
    for v in range(8):
        use16, use17, use18 = bool(v & 1), bool(v & 2), bool(v & 4)
        grouped = use16 or (use17 or use18)
        if use16:
            grp = jnp.ones_like(sym, dtype=bool)
        elif use17 or use18:
            grp = sym == 0
        else:
            grp = jnp.zeros_like(sym, dtype=bool)

        cnt = jnp.where(grp, runlen, 1)
        # For ungrouped runs every element contributes individually:
        # weight the per-run contribution by runlen instead.
        indiv = jnp.where(grp, 1, runlen)

        rem = cnt
        n18 = jnp.zeros_like(rem)
        n17 = jnp.zeros_like(rem)
        zrun = (sym == 0) & (cnt >= 3) & grp
        if use18:
            q, r = rem // 138, rem % 138
            n18 = jnp.where(zrun, q + (r >= 11), 0)
            rem = jnp.where(zrun, jnp.where(r >= 11, 0, r), rem)
        if use17:
            q, r = rem // 10, rem % 10
            n17 = jnp.where(zrun, q + (r >= 3), 0)
            rem = jnp.where(zrun, jnp.where(r >= 3, 0, r), rem)
        n16 = jnp.zeros_like(rem)
        lit = jnp.zeros_like(rem)
        if use16:
            g16 = rem >= 4
            c = rem - 1
            q, r = c // 6, c % 6
            n16 = jnp.where(g16, q + (r >= 3), 0)
            lit = jnp.where(g16, 1, 0)
            rem = jnp.where(g16, jnp.where(r >= 3, 0, r), rem)
        own = lit + rem                           # clcounts[sym] += own

        own = jnp.where(use_run, own * indiv, 0)
        n16 = jnp.where(use_run, n16, 0)
        n17 = jnp.where(use_run, n17, 0)
        n18 = jnp.where(use_run, n18, 0)

        # Segment-sum into the 19-symbol cl histogram.
        sym_c = jnp.clip(sym, 0, 15)
        oh = (sym_c[:, :, None]
              == jnp.arange(16, dtype=jnp.int32)[None, None, :])
        cl_own = jnp.sum(jnp.where(oh, own[:, :, None], 0), axis=1)  # (B,16)
        clcounts = jnp.concatenate([
            cl_own,
            jnp.sum(n16, axis=1)[:, None],
            jnp.sum(n17, axis=1)[:, None],
            jnp.sum(n18, axis=1)[:, None]], axis=1)   # (B, 19)
        sizes.append(clcounts)

    clc_all = jnp.stack(sizes, axis=1).reshape(B * 8, 19)   # (B*8, 19)
    clcl = package_merge(clc_all, 7)                        # (B*8, 19)

    i15 = jnp.arange(15, dtype=jnp.int32)[None, :]
    order_tail = jnp.asarray(_CL_ORDER[4:19])
    clc_tail = clc_all[:, order_tail]                       # (B*8, 15)
    hclen = jnp.max(jnp.where(clc_tail != 0, i15 + 1, 0), axis=1)

    size = (14 + (hclen + 4) * 3
            + jnp.sum(clcl * clc_all, axis=1)
            + clc_all[:, 16] * 2 + clc_all[:, 17] * 3 + clc_all[:, 18] * 7)
    return jnp.min(size.reshape(B, 8), axis=1)


# ---------------------------------------------------------------------------
# Symbol payload size + full dynamic cost.
# ---------------------------------------------------------------------------

_LL_EXTRA = np.zeros(spec.NUM_LL, dtype=np.int32)
_LL_EXTRA[257:286] = spec.LENGTH_SYMBOL_EXTRA_BITS
_D_EXTRA = np.zeros(spec.NUM_D, dtype=np.int32)
_D_EXTRA[:30] = spec.DIST_SYM_EXTRA_BITS
_LL_PAYLOAD_MASK = np.ones(spec.NUM_LL, dtype=np.int32)
_LL_PAYLOAD_MASK[256] = 0   # end symbol charged once, not by count
_LL_PAYLOAD_MASK[286:] = 0
_D_PAYLOAD_MASK = np.ones(spec.NUM_D, dtype=np.int32)
_D_PAYLOAD_MASK[30:] = 0


def symbol_payload_size(ll_counts, d_counts, ll_lengths, d_lengths):
    """CalculateBlockSymbolSizeGivenCounts (deflate.c:375-401), batched."""
    llm = jnp.asarray(_LL_PAYLOAD_MASK)[None, :]
    dm = jnp.asarray(_D_PAYLOAD_MASK)[None, :]
    r = jnp.sum((ll_lengths + jnp.asarray(_LL_EXTRA)[None, :])
                * ll_counts * llm, axis=1)
    r = r + jnp.sum((d_lengths + jnp.asarray(_D_EXTRA)[None, :])
                    * d_counts * dm, axis=1)
    return r + ll_lengths[:, 256]


def hist_dynamic_cost(ll_counts: jnp.ndarray, d_counts: jnp.ndarray,
                      want_lengths: bool = False):
    """Exact dynamic-block tree+data bits from histograms (batched).

    Mirrors native HistDynamicCost / GetDynamicLengths
    (deflate.c:525-582): plain lengths vs RleOptimize'd lengths, keep
    the smaller total.  ll_counts: (B, 288) int32, d_counts: (B, 32).
    Returns (B,) int32 bits (and the chosen lengths if want_lengths).
    """
    ll_counts = ll_counts.astype(jnp.int32).at[:, 256].set(1)
    d_counts = d_counts.astype(jnp.int32)

    ll = package_merge(ll_counts, 15)
    d = patch_dist_codes(package_merge(d_counts, 15))
    t1 = tree_size(ll, d) + symbol_payload_size(ll_counts, d_counts, ll, d)

    ll_c2 = rle_optimize(ll_counts)
    d_c2 = rle_optimize(d_counts)
    ll2 = package_merge(ll_c2, 15)
    d2 = patch_dist_codes(package_merge(d_c2, 15))
    t2 = tree_size(ll2, d2) + symbol_payload_size(ll_counts, d_counts,
                                                  ll2, d2)

    cost = jnp.minimum(t1, t2)
    if not want_lengths:
        return cost
    pick2 = (t2 < t1)[:, None]
    return (cost, jnp.where(pick2, ll2, ll), jnp.where(pick2, d2, d))


# ---------------------------------------------------------------------------
# Entropy cost model (tree.c:71-94 conventions).
# ---------------------------------------------------------------------------

_INV_LN2_X2 = float(2.0 / np.log(2.0))


def _log2_int(c: jnp.ndarray) -> jnp.ndarray:
    """Accurate f32 log2 of positive int32 counts.

    TPU's transcendental log2 is only ~1e-4-accurate, which audibly
    shifts the squeeze cost model (every DP edge uses these values) and
    cost ~0.2% size vs the host-f64 model.  Decompose c = 2^e * m with
    exact integer ops (e via clz, m in [1,2) by exact power-of-two
    divide), then log2(m) = 2*atanh(f/(2+f))/ln2 with an odd series in
    z = f/(2+f) < 1/3: truncation after z^11 is ~2e-7 bits — same
    accuracy class as host f32.
    """
    c = c.astype(jnp.int32)
    e = 31 - jax.lax.clz(jnp.maximum(c, 1))
    m = c.astype(jnp.float32) / (jnp.int32(1) << e).astype(jnp.float32)
    f = m - 1.0
    z = f / (2.0 + f)
    z2 = z * z
    p = 1.0 / 11.0
    for q in (9.0, 7.0, 5.0, 3.0):
        p = 1.0 / q + z2 * p
    atanh = z * (1.0 + z2 * p)
    return e.astype(jnp.float32) + atanh * _INV_LN2_X2


def calculate_entropy(counts: jnp.ndarray) -> jnp.ndarray:
    """Shannon cost-per-symbol bits, batched (B, n) -> (B, n) f32."""
    n = counts.shape[1]
    ci = counts.astype(jnp.int32)
    s = jnp.sum(ci, axis=1, keepdims=True)
    log2sum = jnp.where(s > 0, _log2_int(jnp.maximum(s, 1)),
                        float(np.log2(n)))
    bl = log2sum - _log2_int(jnp.maximum(ci, 1))
    bl = jnp.where(ci == 0, log2sum, bl)
    bl = jnp.where((bl < 0) & (bl > -1e-5), 0.0, bl)
    return bl


# ---------------------------------------------------------------------------
# Precomputed randomization gather maps (squeeze.c:80-107).
# ---------------------------------------------------------------------------

def randomize_maps(max_events: int):
    """Gather maps equivalent to RandomizeStatFreqs event #e.

    The MWC stream is data-independent and each event consumes a fixed
    number of draws, so the in-place self-referential rewrite
    freqs[i] = freqs[rand % n] resolves to a pure gather through the
    chase map m[i] = m[src[i]] (src < i reads already-rewritten values).
    Returns (ll_maps (E, 288) int32, d_maps (E, 32) int32) as numpy.
    """
    from ..squeeze import MwcRng
    rng = MwcRng()
    ll_maps = np.empty((max_events, spec.NUM_LL), np.int32)
    d_maps = np.empty((max_events, spec.NUM_D), np.int32)
    for e in range(max_events):
        for arr, n in ((ll_maps[e], spec.NUM_LL), (d_maps[e], spec.NUM_D)):
            m = np.arange(n, dtype=np.int32)
            for i in range(n):
                if (rng.next() >> 4) % 3 == 0:
                    src = rng.next() % n
                    m[i] = m[src] if src < i else src
            arr[:] = m
    return ll_maps, d_maps
