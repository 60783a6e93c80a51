"""Refine-plan size/time A/B with the exact-RMQ refinement (chip).

With RMQ each round resolves its claim's TRUE length (the old doubling
'D' rounds were capped at rung+63), so shorter plans may now match
LDD2's size.  Each variant: warm + min-of-2 compress on the 1 MiB
bench blob and a 1 MB log_repetitive slice; fails must stay 0.

Usage: python experiments/exp_r4_refine.py [--variants a,b]
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "LD":    {"refine_plan": "LD"},
    "LD2":   {"refine_plan": "LD2"},
    "LDD":   {"refine_plan": "LDD"},
    "LDD2":  {},
    "LDD22": {"refine_plan": "LDD22"},
}


def main() -> None:
    import zopfli_tpu
    from zopfli_tpu.deflate import Options
    from zopfli_tpu.ops import hashmatch
    from zopfli_tpu import squeeze_batched
    from bench import bench_data
    from experiments.exp_r3_candidates import ref_size
    import corpus

    names = None
    if "--variants" in sys.argv:
        names = sys.argv[sys.argv.index("--variants") + 1].split(",")
    data = {"text1m": bench_data()[:1000000],
            "log_repetitive": dict(corpus.files())["log_repetitive"]
            [:1000000]}
    refs = {k: ref_size(k, v) for k, v in data.items()}
    opts = Options(engine="tpu", numiterations=15)
    base_knobs = hashmatch.current_knobs()

    results = {}
    try:
        for vname, spec_v in VARIANTS.items():
            if names and vname not in names:
                continue
            kn = dict(base_knobs)
            kn.update(spec_v)
            hashmatch.KNOBS.update(kn)
            row = {}
            for dname, blob in data.items():
                squeeze_batched.VERIFY_FAILS[0] = 0
                t0 = time.perf_counter()
                zopfli_tpu.compress(blob, "gzip", opts)
                warm_s = time.perf_counter() - t0
                secs = 1e9
                for _ in range(2):
                    t0 = time.perf_counter()
                    out = zopfli_tpu.compress(blob, "gzip", opts)
                    secs = min(secs, time.perf_counter() - t0)
                assert zlib.decompress(out, 16 + 15) == blob
                row[dname] = {
                    "size": len(out), "ref": refs[dname],
                    "vs_ref": round(len(out) / refs[dname], 5),
                    "secs": round(secs, 3), "warm_s": round(warm_s, 1),
                    "fails": squeeze_batched.VERIFY_FAILS[0],
                }
                print(f"[{vname}] {dname}: {row[dname]}", flush=True)
            results[vname] = row
            with open("/tmp/exp_r4_refine.json", "w") as f:
                json.dump(results, f, indent=1)
    finally:
        hashmatch.KNOBS.update(base_knobs)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
