"""Attribute the seed program's non-candidate cost (chip).

seed_sync was profiled at 2.64 s/MiB while build_candidates alone is
1.44 s — this times the pieces between: the one-iteration scan, the
traceback, the per-lane compaction sort, the device split search, and
the full seed program, each as its own jitted call (warm, min of 3).

Usage: python experiments/exp_r4_seedparts.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(name, fn):
    import jax.numpy as jnp
    out = fn()
    import jax
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
        else x, out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn()
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "ravel")]
        float(jnp.sum(jnp.ravel(leaves[0])[:4].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} {best:6.3f}s", flush=True)
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp
    from zopfli_tpu.ops import fused_engine, hashmatch, scan_kernel, seed
    from zopfli_tpu.ops import devsplit
    from bench import bench_data

    TILE, LANES, KBP = fused_engine.TILE, fused_engine.LANES, fused_engine.KBP
    blob = bench_data()[: 1 << 20]
    cap = 1 << 20
    n = hashmatch.PREFIX + cap + 264
    buf = np.zeros(n, np.uint8)
    buf[hashmatch.PREFIX:hashmatch.PREFIX + len(blob)] = \
        np.frombuffer(blob, np.uint8)
    bufd = jnp.asarray(buf)
    min_pos = jnp.int32(hashmatch.PREFIX)
    inend = jnp.int32(hashmatch.PREFIX + len(blob))

    # Full seed program (candidates + scan + traceback + compact + split).
    prog = seed.make_seed_program(cap, 15, interpret=False)
    timed("seed_full", lambda: prog(bufd, min_pos, inend))

    # Candidates alone.
    kn = hashmatch.current_knobs()
    cand = timed("candidates", lambda: hashmatch.build_candidates(
        bufd, cap, min_pos, inend, max_bp=KBP, **kn))
    bp_len, bp_dist = cand[0], cand[1]

    # Scan + traceback with fixed costs (the seed geometry).
    ntiles = -(-cap // TILE)
    G = max(1, -(-ntiles // LANES))
    scan = scan_kernel.make_scan(TILE, LANES, KBP, interpret=False, groups=G)
    traceback = scan_kernel.make_traceback(TILE, LANES, interpret=False,
                                           groups=G)
    symtab = np.asarray(scan_kernel.symbol_range_table(), dtype=np.int32)

    @jax.jit
    def prep():
        lane_ids = jnp.arange(G * LANES, dtype=jnp.int32)
        tile_start = lane_ids * TILE
        L_real = inend - hashmatch.PREFIX
        tile_nbytes = jnp.clip(L_real - tile_start, 0, TILE)
        pos_in_tile = jnp.arange(TILE, dtype=jnp.int32)
        rows = tile_start[:, None] + pos_in_tile[None, :]
        rows_c = jnp.clip(rows, 0, cap - 1)
        bl = bp_len[rows_c]
        bd = bp_dist[rows_c]
        data_block = bufd[hashmatch.PREFIX:hashmatch.PREFIX + cap] \
            .astype(jnp.int32)
        lit = data_block[rows_c]
        maxlen = tile_nbytes[:, None] - pos_in_tile[None, :]
        bl = jnp.minimum(bl, maxlen[:, :, None])
        bl = jnp.where(bl >= 3, bl, 0)
        valid = pos_in_tile[None, :] < tile_nbytes[:, None]

        def to_rows3(x):
            y = x.reshape(G, LANES, TILE, -1)
            y = jnp.transpose(y, (0, 2, 3, 1))
            return y.reshape(G * TILE, -1, LANES)

        def to_rows2(x):
            y = x.reshape(G, LANES, TILE)
            y = jnp.transpose(y, (0, 2, 1))
            return y.reshape(G * TILE, LANES)

        bl_t = to_rows3(bl)
        bd_t = to_rows3(bd)
        lit_t = to_rows2(lit)
        valid_t = to_rows2(valid)
        bp_dcost = 5.0 + seed._dextra_f(jnp.maximum(bd_t, 1))
        litcost = jnp.where(valid_t, jnp.where(lit_t < 144, 8.0, 9.0),
                            scan_kernel.BIG).astype(jnp.float32)
        lcost_vec = jnp.broadcast_to(
            jnp.asarray(seed._FIXED_LCOST)[:, None],
            (scan_kernel.W, LANES))
        lcost_vec = jnp.tile(lcost_vec, (G, 1))
        return bl_t, bd_t, bp_dcost, litcost, lcost_vec, lit_t, tile_nbytes

    bl_t, bd_t, bp_dcost, litcost, lcost_vec, lit_t, tile_nbytes = \
        timed("prep", prep)

    ce, cost = timed("scan", lambda: scan(bl_t, bd_t, bp_dcost, litcost,
                                          lcost_vec))
    nbytes_g = tile_nbytes.reshape(G, LANES)
    hist, pep = timed("traceback", lambda: traceback(
        ce, lit_t, nbytes_g, jnp.asarray(symtab)))

    @jax.jit
    def compact(pep, lit_t):
        peg = pep.reshape(G, TILE, LANES)
        litg = lit_t.reshape(G, TILE, LANES)
        empty = (peg == 0).astype(jnp.int32)
        return jax.lax.sort((empty, peg, litg), num_keys=1,
                            is_stable=True, dimension=1)

    timed("compact", lambda: compact(pep, lit_t))

    # Device split search on the seed parse stream.
    DCAP = cap + devsplit.CKPT
    rng = np.random.default_rng(0)
    nsym = 300000
    lit_s = np.zeros(DCAP, np.int32)
    dst_s = np.zeros(DCAP, np.int32)
    lit_s[:nsym] = rng.integers(0, 255, nsym)
    dst_s[:nsym] = 0
    m = rng.random(nsym) < 0.4
    lit_s[:nsym][m] = rng.integers(3, 258, int(m.sum()))
    dst_s[:nsym][m] = rng.integers(1, 32768, int(m.sum()))
    timed("devsplit", lambda: devsplit.split_lz77_device(
        jnp.asarray(lit_s), jnp.asarray(dst_s), DCAP, 15,
        jnp.int32(nsym)))


if __name__ == "__main__":
    main()
