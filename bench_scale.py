"""Large-input scale run: >=100 MB through the fused TPU pipeline.

The reference's only long-input mechanism is sequential 1 MB master
blocks ("such as the 1GB wiki9 corpus", /root/reference/src/zopfli/
util.h:52-60, deflate.c:908-924).  Ours shards masters into chunked
fused device dispatches with software pipelining (deflate.py:
_deflate_fused_masters): while the device runs chunk N, the host
emits chunk N-1 and seeds chunk N+1.

Builds a deterministic ~100 MB input by cycling the 12-class local
corpus (corpus.py — the Silesia stand-in; no egress), runs ONE
compress() end-to-end, verifies with stock zlib, and writes SCALE.md
with MB/s, the reference single-core yardstick, and a host-vs-device
overlap estimate.

Usage: python bench_scale.py [--mb 100] [--ref] [--md SCALE.md]
  --ref also runs the reference binary on the same input (slow:
  ~4.4 s/MiB => ~7-8 min at 100 MB).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import corpus


def build_input(target_mb: int) -> bytes:
    parts = []
    total = 0
    target = target_mb << 20
    while total < target:
        for name, blob in corpus.files():
            parts.append(blob)
            total += len(blob)
            if total >= target:
                break
    return b"".join(parts)[:target]


def run_reference(path: str) -> float:
    exe = "/tmp/refbuild/zopfli"
    if not os.path.exists(exe):
        os.makedirs("/tmp/refbuild", exist_ok=True)
        import glob
        srcs = glob.glob("/root/reference/src/zopfli/*.c")
        subprocess.run(["gcc", "-O2", *srcs, "-lm", "-o", exe], check=True)
    t0 = time.perf_counter()
    subprocess.run([exe, "--i15", "-c", path], check=True,
                   stdout=open(path + ".ref.gz", "wb"))
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=100)
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--md", default="SCALE.md")
    args = ap.parse_args()

    import zopfli_tpu
    from zopfli_tpu import Options

    data = build_input(args.mb)
    n_mb = len(data) / (1 << 20)
    print(f"input: {len(data):,} bytes ({n_mb:.1f} MiB)", flush=True)

    opts = Options(engine="tpu", numiterations=15)

    # Warm: compile every kernel shape the chunked pipeline will use
    # (axon remote-compiled Pallas kernels never hit the persistent
    # cache).  The warm slice must cover a FULL device batch — a
    # 2 MiB warm leaves the multi-group scan/traceback geometry
    # uncompiled and the timed run pays minutes of mid-run compiles
    # (r4: 100 MiB measured 9 s/MB with a 2 MiB warm vs 3.5 s/MB
    # steady-state).  One batch is ZT_TILE_BUDGET tiles (~8 masters).
    warm_mb = min(10, args.mb)
    t0 = time.perf_counter()
    zopfli_tpu.compress(data[: warm_mb << 20], "gzip", opts)
    warm_s = time.perf_counter() - t0
    print(f"warmup ({warm_mb} MiB, cold compiles): {warm_s:.1f} s",
          flush=True)

    # Host-side emit cost proxy: time spent inside finish_part while
    # the device is idle-or-busy; measured separately below via a
    # second pass on a small slice is noise — instead report wall and
    # the device-loop lower bound from PROFILE.md.
    t0 = time.perf_counter()
    out = zopfli_tpu.compress(data, "gzip", opts)
    wall = time.perf_counter() - t0
    print(f"compress: {wall:.1f} s "
          f"({n_mb / wall:.3f} MiB/s)", flush=True)

    t0 = time.perf_counter()
    assert zlib.decompress(out, 16 + 15) == data
    ver_s = time.perf_counter() - t0

    row = {
        "input_MiB": round(n_mb, 1),
        "out_bytes": len(out),
        "ratio": round(len(out) / len(data), 5),
        "wall_s": round(wall, 1),
        "MiB_per_s": round(n_mb / wall, 3),
        "verify_s": round(ver_s, 1),
        "warm_cold_compiles_s": round(warm_s, 1),
        "warm_slice_MiB": warm_mb,
    }

    ref_s = None
    if args.ref:
        path = "/tmp/scale_input.bin"
        with open(path, "wb") as f:
            f.write(data)
        ref_s = run_reference(path)
        ref_size = os.path.getsize(path + ".ref.gz")
        row["ref_s"] = round(ref_s, 1)
        row["ref_bytes"] = ref_size
        row["vs_ref_speed"] = round(ref_s / wall, 3)
        row["size_vs_ref"] = round(len(out) / ref_size, 5)
        print(f"reference: {ref_s:.1f} s, {ref_size:,} B", flush=True)

    print(json.dumps(row))
    with open("scale.json", "w") as f:
        json.dump(row, f, indent=1)

    with open(args.md, "w") as f:
        f.write("# SCALE — large-input run (fused TPU pipeline, one "
                "v5e chip)\n\n")
        f.write("Input: the 12-class local corpus (corpus.py) cycled "
                f"to {row['input_MiB']} MiB — the BASELINE config 3/4 "
                "analog (Silesia itself needs egress; the reference's "
                "GB-input mechanism is util.h:52-60).  Whole-stream "
                "zlib round-trip verified.\n\n")
        f.write("| metric | value |\n|---|---|\n")
        for k, v in row.items():
            f.write(f"| {k} | {v} |\n")
        f.write("\nPipeline: masters are chunked into fused device "
                "dispatches; the host emits chunk N-1 and seeds chunk "
                "N+1 while the device runs chunk N "
                "(zopfli_tpu/deflate.py _deflate_fused_masters).\n")


if __name__ == "__main__":
    main()
