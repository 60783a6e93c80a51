"""Round benchmark: encode MB/s on a fixed 1 MiB corpus at --i15.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N, ...}

vs_baseline is our throughput divided by the reference zopfli binary's
throughput on the same data and iteration count (reference built from
/root/reference into /tmp, cached).  Every output is verified with
stock zlib; size_vs_ref is reported alongside.

Engine selection: ZT_BENCH_ENGINE=tpu|native (default tpu — the
TPU-native engine is the headline; the byte-identical native C++
engine is the host oracle/fallback).
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_SRC = "/root/reference/src/zopfli"
REF_BIN = "/tmp/zt_bench_ref_zopfli"
SIZE = 1 << 20
ITERS = 15


def bench_data() -> bytes:
    """Deterministic ~1 MiB of real text/code (reference sources)."""
    chunks = []
    if os.path.isdir(REF_SRC):
        names = sorted(os.listdir(REF_SRC))
        for name in names:
            p = os.path.join(REF_SRC, name)
            if os.path.isfile(p):
                with open(p, "rb") as f:
                    chunks.append(f.read())
        lp = "/root/reference/src/zopflipng/lodepng"
        if os.path.isdir(lp):
            for name in sorted(os.listdir(lp)):
                p = os.path.join(lp, name)
                if os.path.isfile(p):
                    with open(p, "rb") as f:
                        chunks.append(f.read())
    blob = b"".join(chunks)
    if not blob:  # fallback: synthetic text
        import numpy as np
        rng = np.random.default_rng(7)
        words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over ",
                 b"lazy ", b"dogs ", b"pack ", b"my ", b"box ", b"with "]
        blob = b"".join(words[i] for i in rng.integers(0, len(words), 400000))
    while len(blob) < SIZE:
        blob += blob
    return blob[:SIZE]


def reference_baseline(data: bytes) -> tuple[float, int]:
    """(seconds, compressed_size) for the reference binary, cached.

    Min of 3 runs — the same methodology as our own timing (a single
    cold run would flatter vs_baseline under machine jitter).
    """
    key = hashlib.sha256(data).hexdigest()[:16]
    cache = f"/tmp/zt_bench_ref_{key}_{ITERS}_min3.json"
    if os.path.exists(cache):
        with open(cache) as f:
            d = json.load(f)
        return d["seconds"], d["size"]
    if not os.path.exists(REF_BIN):
        import glob
        srcs = glob.glob(os.path.join(REF_SRC, "*.c"))
        subprocess.run(["gcc", "-O2", *srcs, "-lm", "-o", REF_BIN], check=True)
    path = f"/tmp/zt_bench_data_{key}"
    with open(path, "wb") as f:
        f.write(data)
    secs = 1e9
    for _ in range(3):
        if os.path.exists(path + ".gz"):
            os.unlink(path + ".gz")
        t0 = time.perf_counter()
        subprocess.run([REF_BIN, f"--i{ITERS}", path], check=True)
        secs = min(secs, time.perf_counter() - t0)
    size = os.path.getsize(path + ".gz")
    with open(cache, "w") as f:
        json.dump({"seconds": secs, "size": size, "timing": "min3"}, f)
    return secs, size


def main() -> None:
    import zopfli_tpu
    from zopfli_tpu.deflate import Options

    engine = os.environ.get("ZT_BENCH_ENGINE", "tpu")
    data = bench_data()
    ref_s, ref_size = reference_baseline(data)

    # Warm up on the full-size data so every kernel shape is compiled
    # (first-process Pallas compiles cost minutes; the persistent XLA
    # cache makes later processes fast but the timed run must not pay).
    opts = Options(engine=engine, numiterations=ITERS)
    t0 = time.perf_counter()
    zopfli_tpu.compress(data, "gzip", opts)
    warm_s = time.perf_counter() - t0

    from zopfli_tpu import squeeze_batched as _sb
    from zopfli_tpu.ops import fused_engine as _fe
    fails_before = _sb.VERIFY_FAILS[0]
    retries_before = _fe.FETCH_RETRIES[0]
    # Min of 3 timed runs: the axon transport adds 250-500 ms of
    # scheduling jitter per dispatch chain, which would otherwise swamp
    # run-to-run comparisons (CLAUDE.md).
    secs = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = zopfli_tpu.compress(data, "gzip", opts)
        secs = min(secs, time.perf_counter() - t0)
    assert zlib.decompress(out, 16 + 15) == data

    mb = SIZE / 1e6
    ours_mbs = mb / secs
    ref_mbs = mb / ref_s
    print(json.dumps({
        "metric": f"encode_MBps_1MiB_i{ITERS}_{engine}",
        "value": round(ours_mbs, 4),
        "unit": "MB/s",
        "vs_baseline": round(ours_mbs / ref_mbs, 3),
        "size_bytes": len(out),
        "ref_size_bytes": ref_size,
        "size_vs_ref": round(len(out) / ref_size, 5),
        "seconds": round(secs, 3),
        "ref_seconds": round(ref_s, 3),
        # Honesty fields (VERDICT r2 weak 5): the timed run is in-
        # process warm; a fresh process pays first_call_seconds once.
        # native_fallbacks must be 0 or the timing is fallback-tainted.
        "timing": "warm_in_process_min3_both",
        "first_call_seconds": round(warm_s, 3),
        "native_fallbacks": _sb.VERIFY_FAILS[0] - fails_before,
        "fetch_retries": _fe.FETCH_RETRIES[0] - retries_before,
    }))


if __name__ == "__main__":
    main()
