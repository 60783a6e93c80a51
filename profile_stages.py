"""Per-stage performance profile of the TPU engine (PROFILE.md generator).

Times every stage of a 1 MiB `compress()` on the real chip, warm
(in-process warmup first — axon remote-compiled Pallas kernels never
hit the persistent cache, so cross-process "warm" numbers are a
compile-bound illusion; see CLAUDE.md).

Stages (production devseed path — no host greedy):
  probe       host incompressibility probe
  candidates  hashmatch.build_candidates alone (device; also inside seed)
  seed        seed program total: candidates + fixed-cost parse + split
              + seed stats, one device dispatch (ops.seed)
  prepare     FusedSqueeze init with reused candidate tables
  loop1       fused device loop, numiterations=1
  loop15      fused device loop, numiterations=15
  periter     (loop15 - loop1) / 14
  fetch       d2h pull of packed parses + host decode (collect)
  emit        finish_part: second split + auto-type + bit emission
  total       one full compress() call

Usage: python profile_stages.py [--md PROFILE.md]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def sync(*arrays):
    """Force device completion (block_until_ready lies on axon)."""
    import jax.numpy as jnp
    s = 0.0
    for a in arrays:
        s += float(jnp.sum(a.astype(jnp.float32) if a.dtype != jnp.float32
                           else a))
    return s


def timeit(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from bench import bench_data
    import zopfli_tpu
    from zopfli_tpu.deflate import (Options, finish_part,
                                    default_engine_factory, local_mesh)
    from zopfli_tpu.emit import BitStream
    from zopfli_tpu.lz77 import LZ77Store
    from zopfli_tpu.ops import hashmatch, fused_engine
    from zopfli_tpu.ops import seed as seed_mod
    from zopfli_tpu.squeeze_batched import fused_collect
    import jax.numpy as jnp

    data_b = bench_data()
    data = np.frombuffer(data_b, dtype=np.uint8)
    n = len(data)
    opts = Options(engine="tpu", numiterations=15)
    mesh = local_mesh()

    # ---- full warmup: one compress() compiles every kernel shape ----
    t0 = time.perf_counter()
    zopfli_tpu.compress(data_b, "gzip", opts)
    warm_s = time.perf_counter() - t0

    res: dict[str, float] = {}

    # ---- probe ----
    res["probe"] = timeit(
        lambda: seed_mod.probably_incompressible(data, 0, n))

    # ---- candidates alone (device build, one master) ----
    cap = 16384
    while cap < n:
        cap *= 2
    total = hashmatch.PREFIX + cap + 264
    buf = np.zeros(total, np.uint8)
    buf[hashmatch.PREFIX:hashmatch.PREFIX + n] = data
    buf_d = jnp.asarray(buf)

    def cand():
        bl, bd, _ = hashmatch.build_candidates(
            buf_d, cap, jnp.int32(hashmatch.PREFIX),
            jnp.int32(hashmatch.PREFIX + n),
            **hashmatch.current_knobs())
        sync(bl[:8, :], bd[:8, :])
    cand()  # warm this exact shape
    res["candidates"] = timeit(cand)

    # ---- seed program (candidates + fixed parse + split + stats) ----
    def seed():
        return seed_mod.seed_master(data, 0, n,
                                    opts.blocksplittingmax)
    sr = seed()
    res["seed"] = timeit(seed)

    masters = [(0, n, sr.bounds)]
    cand_t = [(sr.bp_len, sr.bp_dist)]

    # ---- FusedSqueeze init with reused candidates (prepare) ----
    def fs_init():
        fs = fused_engine.FusedSqueeze(data, masters, mesh=mesh,
                                       cand=cand_t)
        sync(fs._prep[3][:8])
        return fs
    fs = fs_init()
    res["prepare"] = timeit(fs_init)

    seed_ll, seed_d = sr.seed_ll, sr.seed_d

    # ---- device loop: 1 iter vs full ----
    def loop(k):
        h = fs.dispatch(seed_ll, seed_d, k)
        sync(h[0][0])
    loop(1)
    res["loop1"] = timeit(lambda: loop(1))
    res["loop15"] = timeit(lambda: loop(15))
    res["periter"] = (res["loop15"] - res["loop1"]) / 14.0

    # ---- fetch/collect (d2h + decode) ----
    handle = fs.dispatch(seed_ll, seed_d, 15)
    sync(handle[0][0])
    res["fetch"] = timeit(lambda: fs.collect(handle))

    # ---- emit (second split + auto-type + bit emission) ----
    parses, best_cost, _, _ = fs.collect(handle)
    stores = [LZ77Store(data, lit, dst, fs.block_bounds[b][0])
              for b, (lit, dst) in enumerate(parses)]

    def emit():
        out = BitStream()
        finish_part(opts, True, list(stores), out,
                    default_engine_factory(opts))
    res["emit"] = timeit(emit)

    # ---- total ----
    res["total"] = timeit(lambda: zopfli_tpu.compress(data_b, "gzip", opts),
                          n=2)

    res["warm_first_call"] = warm_s
    accounted = (res["probe"] + res["seed"] + res["prepare"]
                 + res["loop15"] + res["fetch"] + res["emit"])
    res["accounted"] = accounted

    knobs = {k: os.environ.get(k, "") for k in
             ("ZT_TILE", "ZT_LANES", "ZT_MAX_BP", "ZT_REFINE",
              "ZT_SORT_LEVELS", "ZT_REPLICAS", "ZT_SHORT_DISTS")}
    out = {"input_MiB": n / (1 << 20), "stages_s": {
        k: round(v, 4) for k, v in res.items()}, "knobs": knobs}
    print(json.dumps(out, indent=2))

    if "--md" in sys.argv:
        path = sys.argv[sys.argv.index("--md") + 1]
        with open(path, "w") as f:
            f.write("# PROFILE — TPU engine per-stage times (1 MiB, warm, "
                    "one v5e chip)\n\n")
            f.write("Generated by `python profile_stages.py --md "
                    "PROFILE.md`.  All times seconds, min of 3.  The\n"
                    "production path is devseed: no host greedy "
                    "(VERDICT r2 item 2).\n\n")
            f.write("| stage | seconds | notes |\n|---|---|---|\n")
            notes = {
                "probe": "host incompressibility probe",
                "candidates": "hashmatch.build_candidates alone (device)",
                "seed": "seed program: candidates + fixed parse + split",
                "prepare": "FusedSqueeze init reusing seed candidates",
                "loop1": "fused loop, 1 iteration",
                "loop15": "fused loop, 15 iterations",
                "periter": "(loop15 - loop1)/14",
                "fetch": "collect(): d2h packed parses + decode",
                "emit": "second split + auto-type + emission (host)",
                "total": "one full compress() call, warm",
                "accounted": "probe+seed+prepare+loop15+fetch+emit",
                "warm_first_call": "first compress() incl. compiles",
            }
            for k, v in res.items():
                f.write(f"| {k} | {v:.3f} | {notes.get(k, '')} |\n")
            f.write(f"\nKnobs: `{json.dumps(knobs)}`\n")


if __name__ == "__main__":
    main()
