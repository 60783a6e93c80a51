"""r5: break down verify_emit (PROFILE.md's 0.64 s/MiB host stage).

Monkeypatch-timers around the host emit path's pieces during one real
TPU devseed compress of the 1 MiB bench blob: verify_parse, block cost
calls, the device second-split, fixed re-parse probes, dynamic length
computation, tree encoding, symbol emission, bit packing.

Usage: python experiments/exp_r5_emit.py
"""

from __future__ import annotations

import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ACC: dict[str, list] = {}


def wrap(obj, name, label=None):
    label = label or name
    orig = getattr(obj, name)
    ACC[label] = [0.0, 0]

    def f(*a, **k):
        t0 = time.perf_counter()
        r = orig(*a, **k)
        ACC[label][0] += time.perf_counter() - t0
        ACC[label][1] += 1
        return r

    setattr(obj, name, f)
    return orig


def main() -> None:
    import importlib

    import zopfli_tpu
    # the pkg exports a deflate() FUNCTION shadowing the submodule
    deflate = importlib.import_module("zopfli_tpu.deflate")
    from zopfli_tpu import blocks, squeeze, tree_encode
    from zopfli_tpu import squeeze_batched as sb
    from zopfli_tpu.deflate import Options, finish_part, \
        default_engine_factory, _seed_maxblocks
    from zopfli_tpu.emit import BitStream
    from zopfli_tpu.ops import seed as seed_mod
    from zopfli_tpu.ops import fused_engine
    from bench import bench_data

    data = bench_data()
    arr = np.frombuffer(data, np.uint8)
    n = len(arr)
    iters = 15
    opts = Options(engine="tpu", numiterations=iters)

    # Warm compile + produce stores once.
    zopfli_tpu.compress(data, "gzip", opts)

    sr = seed_mod.seed_master(arr, 0, n, _seed_maxblocks(opts),
                              interpret=False)
    fs = fused_engine.FusedSqueeze(arr, [(0, n, sr.bounds)],
                                   interpret=False,
                                   cand=[(sr.bp_len, sr.bp_dist)])
    want = int(sr.max_lane_rows * 1.5) + 8
    cap = 512
    while cap < want and cap < fused_engine.TILE:
        cap *= 2
    fs.default_fetch_cap = min(cap, fused_engine.TILE)
    handle = fs.dispatch(sr.seed_ll, sr.seed_d, iters)

    # --- instrument ---
    wrap(blocks, "calculate_block_size", "calc_block_size")
    wrap(blocks, "calculate_block_size_auto_type", "calc_auto_type")
    wrap(blocks, "get_dynamic_lengths", "get_dyn_lengths")
    wrap(tree_encode, "add_dynamic_tree", "add_dyn_tree")
    wrap(deflate, "_emit_lz77_data", "emit_lz77_data")
    wrap(deflate, "_block_split_lz77_device", "second_split_dev")
    wrap(squeeze, "lz77_optimal_fixed", "fixed_reparse")
    wrap(fused_engine.FusedSqueeze, "verify_parse", "verify_parse")

    t0 = time.perf_counter()
    stores = sb.fused_collect(fs, handle, iters)
    t_collect = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = BitStream()
    finish_part(opts, True, stores[0], out, default_engine_factory(opts))
    t_finish = time.perf_counter() - t0

    t0 = time.perf_counter()
    payload = out.getvalue()
    t_pack = time.perf_counter() - t0
    assert zlib.decompress(payload, -15) == data

    print(f"collect (incl. d2h+decode+verify): {t_collect:.3f}s")
    print(f"finish_part total:                 {t_finish:.3f}s")
    print(f"bitstream getvalue:                {t_pack:.3f}s")
    for k, (s, c) in sorted(ACC.items(), key=lambda kv: -kv[1][0]):
        print(f"  {k:18s} {s:7.3f}s  x{c}")


if __name__ == "__main__":
    main()
