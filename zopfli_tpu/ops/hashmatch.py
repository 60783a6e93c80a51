"""TPU-native match candidate search.

Replaces the reference's serial hash-chain walk (lz77.c:407-542, hash.c)
with a fully data-parallel formulation:

1. A *hash ladder*: rolling u32 hashes of prefixes of length
   3,4,8,16,...,256 at every position, built by logarithmic doubling
   (H_{2L}[i] = mix(H_L[i], H_L[i+L])).
2. Per ladder level, the K most recent earlier occurrences of the same
   prefix hash, found with one stable sort of (hash, position) and K
   shifted comparisons — no pointer chasing.
3. Exact-up-to-hash-collision LCP per candidate by greedy doubling over
   the ladder (log2(258) equality tests instead of byte loops).
4. The min-distance-per-length step function ("sublen",
   lz77.h:115-118) as a skyline over (distance, lcp) pairs, condensed to
   at most `MAX_BP` breakpoints per position.

All outputs depend only on the input bytes, so one evaluation per block
serves every squeeze iteration (this subsumes the reference's
longest-match cache, cache.c).  Hash collisions can only overstate an
LCP; the emission path verifies chosen matches on the host and falls
back to the native engine in the (cryptographically unlikely) failure
case.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import spec

# Ladder of prefix lengths used for candidate buckets.
BUCKET_LEVELS = (3, 4, 8, 16, 32, 64, 128, 256)
# Candidates kept per level (most recent occurrences).
BUCKET_K = {3: 8, 4: 8, 8: 6, 16: 4, 32: 4, 64: 2, 128: 2, 256: 2}
# LCP doubling levels (descending).
LCP_LEVELS = (256, 128, 64, 32, 16, 8, 4, 2, 1)
# Breakpoint slots per position in the condensed sublen table.  8 slots
# halve the DP kernel's expansion work vs 16; dropping an interior
# breakpoint only widens the distance used for its length range (the
# reference's own sublen cache also keeps 8, util.h:68-74).
MAX_BP = 8

# Polynomial rolling-hash base (odd, so powers never vanish mod 2^32).
_P = np.uint32(0x01000193)


def _level_weights():
    """P^L mod 2^32 per doubling level (position weights stay distinct)."""
    w = {1: _P}
    for lvl in (2, 4, 8, 16, 32, 64, 128):
        w[lvl] = np.uint32((np.uint64(w[lvl // 2]) * np.uint64(w[lvl // 2]))
                           & np.uint64(0xFFFFFFFF))
    return w


_PW = _level_weights()


def _ladder(data_padded: jnp.ndarray) -> dict[int, jnp.ndarray]:
    """u32 prefix hashes per level; data must be padded by >=256 bytes.

    Polynomial hash H(s) = sum b[k] * P^(L-1-k): composition by doubling
    is H_{2L}[i] = H_L[i] * P^L + H_L[i+L], giving every byte position a
    distinct weight (a plain xor-mix collides systematically on runs).
    """
    h = {1: data_padded.astype(jnp.uint32)}
    for lvl in (2, 4, 8, 16, 32, 64, 128, 256):
        half = lvl // 2
        prev = h[half]
        shifted = jnp.concatenate(
            [prev[half:], jnp.zeros(half, jnp.uint32)])
        h[lvl] = prev * jnp.uint32(_PW[half]) + shifted
    # Exact 3-byte key (24 bits, collision-free) for the shortest level.
    b = data_padded.astype(jnp.uint32)
    b1 = jnp.concatenate([b[1:], jnp.zeros(1, jnp.uint32)])
    b2 = jnp.concatenate([b[2:], jnp.zeros(2, jnp.uint32)])
    h[3] = (b << 16) | (b1 << 8) | b2
    return h


def _recent_same_hash(h: jnp.ndarray, k: int,
                      min_pos: jnp.ndarray) -> jnp.ndarray:
    """For each position, its k most recent predecessors with equal hash.

    Returns (n, k) int32 of candidate positions, -1 where none.  One
    stable sort groups equal hashes with positions ascending; the j-th
    predecessor is the row j slots earlier in sorted order.  Candidates
    below min_pos (outside the valid window prefix) are rejected.
    """
    n = h.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sorted_h, sorted_idx = jax.lax.sort((h, idx), num_keys=1, is_stable=True)
    cands = []
    for j in range(1, k + 1):
        prev_idx = jnp.concatenate(
            [jnp.full(j, -1, jnp.int32), sorted_idx[:-j]])
        prev_h = jnp.concatenate([jnp.zeros(j, h.dtype), sorted_h[:-j]])
        same = (prev_h == sorted_h) & (prev_idx >= min_pos)
        dist = sorted_idx - prev_idx
        ok = same & (dist >= 1) & (dist <= spec.WINDOW_SIZE)
        cands.append(jnp.where(ok, prev_idx, -1))
    cand_sorted = jnp.stack(cands, axis=1)  # (n, k) in sorted order
    out = jnp.full((n, k), -1, jnp.int32)
    out = out.at[sorted_idx].set(cand_sorted)
    return out


def _lcp(h: dict[int, jnp.ndarray], i: jnp.ndarray, c: jnp.ndarray,
         cap: jnp.ndarray) -> jnp.ndarray:
    """Greedy-doubling longest common prefix of positions i and c, <= cap."""
    ln = jnp.zeros_like(i)
    for lvl in LCP_LEVELS:
        fits = ln + lvl <= cap
        a = jnp.take(h[lvl], jnp.where(fits, i + ln, 0), mode="clip")
        b = jnp.take(h[lvl], jnp.where(fits, c + ln, 0), mode="clip")
        ln = jnp.where(fits & (a == b), ln + lvl, ln)
    return ln


# Fixed window-prefix length in the padded block layout: the block's
# bytes always start at row PREFIX of the padded array; rows [PREFIX -
# prefix_len, PREFIX) hold real preceding bytes, earlier rows are filler
# rejected via min_pos.
PREFIX = spec.WINDOW_SIZE


@functools.partial(jax.jit, static_argnums=(1,))
def build_candidates(data_padded: jnp.ndarray, block_cap: int,
                     min_pos: jnp.ndarray, inend_real: jnp.ndarray):
    """Per-position condensed sublen tables for a block.

    data_padded: uint8 of length PREFIX + block_cap + >=258; the block
        occupies rows [PREFIX, PREFIX + real_len) with real_len <=
        block_cap (padding rows produce garbage that callers mask).
    block_cap: static padded block length (bucketed to limit recompiles).
    min_pos: first row holding a real byte (PREFIX - prefix_len).
    inend_real: PREFIX + real block length.

    Returns (bp_len, bp_dist, best_len):
      bp_len  (block_cap, MAX_BP) int32 — breakpoint lengths, ascending
      bp_dist (block_cap, MAX_BP) int32 — distance for lengths in
              (bp_len[k-1], bp_len[k]]
      best_len (block_cap,) int32 — longest match, <3 if none
    """
    h = _ladder(data_padded)
    L = block_cap
    instart = PREFIX

    # Candidate positions per level, sliced to the block rows.
    cand_cols = []
    for lvl in BUCKET_LEVELS:
        k = BUCKET_K[lvl]
        cands = _recent_same_hash(h[lvl], k, min_pos)[instart:instart + L]
        cand_cols.append(cands)
    cand = jnp.concatenate(cand_cols, axis=1)  # (L, C)
    C = cand.shape[1]

    pos = jnp.arange(L, dtype=jnp.int32)[:, None] + instart  # (L,1)
    cap = jnp.clip(inend_real - pos, 0, spec.MAX_MATCH)  # (L,1)
    valid = cand >= 0
    cand_safe = jnp.where(valid, cand, 0)
    lcp = _lcp(h, jnp.broadcast_to(pos, (L, C)), cand_safe,
               jnp.broadcast_to(cap, (L, C)))
    lcp = jnp.where(valid, lcp, 0)
    dist = jnp.where(valid, pos - cand, spec.WINDOW_SIZE + 1)

    # Deduplicate/skyline: sort by distance ascending; keep candidates
    # whose lcp strictly exceeds every smaller-distance lcp.
    order = jnp.argsort(dist, axis=1)
    dist_s = jnp.take_along_axis(dist, order, axis=1)
    lcp_s = jnp.take_along_axis(lcp, order, axis=1)
    run_best = jax.lax.cummax(
        jnp.concatenate([jnp.full((L, 1), spec.MIN_MATCH - 1), lcp_s[:, :-1]],
                        axis=1), axis=1)
    keep = (lcp_s > run_best) & (lcp_s >= spec.MIN_MATCH) & \
        (dist_s <= spec.WINDOW_SIZE)

    best_len = jnp.max(jnp.where(keep, lcp_s, 0), axis=1)

    # Compact kept entries to the front, preserving order.
    slot = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(keep, slot, C)  # parked at overflow column
    nkept = jnp.sum(keep, axis=1)

    # Condense to MAX_BP slots: keep the first MAX_BP-1 plus the final
    # (longest) breakpoint.  Dropping an interior breakpoint only widens
    # the distance used for its length range — still a valid match.
    last_slot = nkept - 1
    is_last = slot == last_slot[:, None]
    slot_c = jnp.where(
        slot < MAX_BP - 1, slot,
        jnp.where(is_last, jnp.minimum(last_slot, MAX_BP - 1)[:, None], C))

    bp_len = jnp.zeros((L, MAX_BP + 1), jnp.int32)
    bp_dist = jnp.zeros((L, MAX_BP + 1), jnp.int32)
    rows = jnp.arange(L, dtype=jnp.int32)[:, None]
    slot_c = jnp.minimum(slot_c, MAX_BP)  # overflow -> scratch column
    bp_len = bp_len.at[rows, slot_c].set(jnp.where(keep, lcp_s, 0))
    bp_dist = bp_dist.at[rows, slot_c].set(jnp.where(keep, dist_s, 0))
    return bp_len[:, :MAX_BP], bp_dist[:, :MAX_BP], best_len
