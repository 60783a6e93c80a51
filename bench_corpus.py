"""Corpus-scale benchmark: per-file size/time vs the reference binary.

Runs every corpus.py file through the reference zopfli binary (cached
by content hash) and through our engines, verifies each output with
stock zlib, and writes a markdown table + JSON to PARITY_CORPUS.md /
bench_corpus.json.  This is BASELINE.md configs 2-3 on the documented
local corpus (canonical Silesia/Canterbury are unavailable offline).

Usage:
    python bench_corpus.py [--engines native,tpu] [--iters 15]

Timing: each engine runs the whole corpus twice in-process; only the
second (warm) pass is timed — first-process kernel compiles on the
remote TPU backend cost minutes and are not representative.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import subprocess
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import corpus  # noqa: E402

REF_SRC = "/root/reference/src/zopfli"
REF_BIN = "/tmp/zt_bench_ref_zopfli"


def reference_result(data: bytes, iters: int) -> tuple[float, int]:
    key = hashlib.sha256(data).hexdigest()[:16]
    cache = f"/tmp/zt_corpus_ref_{key}_{iters}.json"
    if os.path.exists(cache):
        d = json.load(open(cache))
        return d["seconds"], d["size"]
    if not os.path.exists(REF_BIN):
        import glob
        srcs = glob.glob(os.path.join(REF_SRC, "*.c"))
        subprocess.run(["gcc", "-O2", *srcs, "-lm", "-o", REF_BIN],
                       check=True)
    path = f"/tmp/zt_corpus_{key}"
    with open(path, "wb") as f:
        f.write(data)
    if os.path.exists(path + ".gz"):
        os.unlink(path + ".gz")
    t0 = time.perf_counter()
    subprocess.run([REF_BIN, f"--i{iters}", path], check=True)
    secs = time.perf_counter() - t0
    size = os.path.getsize(path + ".gz")
    json.dump({"seconds": secs, "size": size}, open(cache, "w"))
    os.unlink(path)
    os.unlink(path + ".gz")
    return secs, size


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", default="native,tpu")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--out", default="PARITY_CORPUS.md")
    args = ap.parse_args()
    engines = args.engines.split(",")

    import zopfli_tpu
    from zopfli_tpu.deflate import Options

    files = corpus.files()
    rows = []
    for name, data in files:
        ref_s, ref_size = reference_result(data, args.iters)
        rows.append({"name": name, "bytes": len(data),
                     "ref_size": ref_size, "ref_s": round(ref_s, 2)})

    for engine in engines:
        opts = Options(engine=engine, numiterations=args.iters)
        for timed in (False, True):
            for row, (name, data) in zip(rows, files):
                t0 = time.perf_counter()
                out = zopfli_tpu.compress(data, "gzip", opts)
                secs = time.perf_counter() - t0
                assert zlib.decompress(out, 16 + 15) == data, name
                if timed:
                    row[f"{engine}_size"] = len(out)
                    row[f"{engine}_s"] = round(secs, 2)
                print(f"[{engine} pass{2 if timed else 1}] {name}: "
                      f"{len(out)} B {secs:.2f}s", flush=True)

    total = {"name": "TOTAL", "bytes": sum(r["bytes"] for r in rows),
             "ref_size": sum(r["ref_size"] for r in rows),
             "ref_s": round(sum(r["ref_s"] for r in rows), 2)}
    for engine in engines:
        total[f"{engine}_size"] = sum(r[f"{engine}_size"] for r in rows)
        total[f"{engine}_s"] = round(sum(r[f"{engine}_s"] for r in rows), 2)
    rows.append(total)

    with open("bench_corpus.json", "w") as f:
        json.dump({"iters": args.iters, "rows": rows}, f, indent=1)

    cols = ["name", "bytes", "ref_size", "ref_s"]
    for e in engines:
        cols += [f"{e}_size", f"{e}_s", f"{e}_vs_ref"]
    lines = [
        "# Corpus parity vs reference `zopfli --i%d`" % args.iters,
        "",
        "Corpus: `corpus.py` (documented local stand-in for Silesia/"
        "Canterbury; no network egress in the build environment).",
        "All outputs verified with stock `zlib.decompress`.",
        "",
        "| " + " | ".join(cols) + " |",
        "|" + "---|" * len(cols),
    ]
    for r in rows:
        cells = [str(r["name"]), f'{r["bytes"]:,}', f'{r["ref_size"]:,}',
                 str(r["ref_s"])]
        for e in engines:
            ratio = r[f"{e}_size"] / max(r["ref_size"], 1)
            cells += [f'{r[f"{e}_size"]:,}', str(r[f"{e}_s"]),
                      f"{ratio:.5f}"]
        lines.append("| " + " | ".join(cells) + " |")
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(total))


if __name__ == "__main__":
    main()
