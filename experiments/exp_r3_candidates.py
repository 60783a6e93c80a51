"""Round-3 candidate-build experiment: sort-ladder / refine-plan / k2
variants, measured in ONE process (scan kernels stay warm; only the
candidate program recompiles per variant).

Datasets are exactly 10^6 bytes (one master -> one candidate shape).
For each variant: warm run, then timed run; records compressed size,
seconds, candidate-build seconds, and verify-fallback count (a nonzero
fails= means sizes are fallback-tainted — see CLAUDE.md).

Usage: python experiments/exp_r3_candidates.py [--variants a,b,...]
Writes /tmp/exp_r3_candidates.json as it goes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def datasets() -> dict[str, bytes]:
    from bench import bench_data
    import corpus
    out = {"text1m": bench_data()[:1000000]}
    blobs = dict(corpus.files())
    for name in ("xml_mime", "log_repetitive"):
        out[name] = blobs[name][:1000000]
    return out


VARIANTS = {
    "base": {},
    "coarse": {"sort_levels": "coarse"},
    "short": {"sort_levels": "short"},
    "short12": {"sort_levels": "short12"},
    "k2": {"recent_k2_min": 16, "refine_plan": "L2DD"},
    "short_k2": {"sort_levels": "short", "recent_k2_min": 16,
                 "refine_plan": "L2DD"},
    "lr2d": {"recent_k2_min": 16, "refine_plan": "LR2D"},
}


def ref_size(name: str, data: bytes) -> int:
    import hashlib
    import subprocess
    from bench import REF_BIN, REF_SRC
    key = hashlib.sha256(data).hexdigest()[:16]
    cache = f"/tmp/zt_exp_ref_{key}.json"
    if os.path.exists(cache):
        return json.load(open(cache))["size"]
    if not os.path.exists(REF_BIN):
        import glob
        srcs = glob.glob(os.path.join(REF_SRC, "*.c"))
        subprocess.run(["gcc", "-O2", *srcs, "-lm", "-o", REF_BIN],
                       check=True)
    p = f"/tmp/zt_exp_{key}"
    with open(p, "wb") as f:
        f.write(data)
    if os.path.exists(p + ".gz"):
        os.unlink(p + ".gz")
    subprocess.run([REF_BIN, "--i15", p], check=True)
    size = os.path.getsize(p + ".gz")
    json.dump({"size": size}, open(cache, "w"))
    return size


def main() -> None:
    import zopfli_tpu
    from zopfli_tpu.deflate import Options
    from zopfli_tpu.ops import hashmatch
    from zopfli_tpu import squeeze_batched
    import jax.numpy as jnp

    names = None
    if "--variants" in sys.argv:
        names = sys.argv[sys.argv.index("--variants") + 1].split(",")
    data = datasets()
    refs = {k: ref_size(k, v) for k, v in data.items()}
    opts = Options(engine="tpu", numiterations=15)
    base_knobs = hashmatch.current_knobs()

    results = {}
    for vname, spec_v in VARIANTS.items():
        if names and vname not in names:
            continue
        kn = dict(base_knobs)
        for k, v in spec_v.items():
            kn[k] = hashmatch._SORT_PRESETS[v] if k == "sort_levels" else v
        hashmatch.KNOBS.update(kn)
        row = {}
        for dname, blob in data.items():
            squeeze_batched.VERIFY_FAILS[0] = 0
            zopfli_tpu.compress(blob, "gzip", opts)      # warm
            t0 = time.perf_counter()
            out = zopfli_tpu.compress(blob, "gzip", opts)
            secs = time.perf_counter() - t0
            assert zlib.decompress(out, 16 + 15) == blob

            # candidate build alone (device, warm)
            buf = np.zeros(hashmatch.PREFIX + (1 << 20) + 264, np.uint8)
            buf[hashmatch.PREFIX:hashmatch.PREFIX + len(blob)] = \
                np.frombuffer(blob, np.uint8)
            bufd = jnp.asarray(buf)

            def cand():
                bl, bd, _ = hashmatch.build_candidates(
                    bufd, 1 << 20, jnp.int32(hashmatch.PREFIX),
                    jnp.int32(hashmatch.PREFIX + len(blob)),
                    **hashmatch.current_knobs())
                float(jnp.sum(bl[:8].astype(jnp.float32)))
            cand()
            t1 = time.perf_counter()
            cand()
            cand_s = time.perf_counter() - t1

            row[dname] = {
                "size": len(out), "ref": refs[dname],
                "vs_ref": round(len(out) / refs[dname], 5),
                "secs": round(secs, 3), "cand_s": round(cand_s, 3),
                "fails": squeeze_batched.VERIFY_FAILS[0],
            }
            print(f"[{vname}] {dname}: {row[dname]}", flush=True)
        results[vname] = {"knobs": {k: str(v) for k, v in kn.items()},
                          "rows": row}
        with open("/tmp/exp_r3_candidates.json", "w") as f:
            json.dump(results, f, indent=1)
    hashmatch.KNOBS.update(base_knobs)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
