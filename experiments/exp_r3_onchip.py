"""Round-3 on-chip timing: the knobs that landed while the TPU pool was
down, A/B'd in ONE process (scan kernels compile once; only the
candidate program recompiles per variant).

Variants (vs the r2 headline config):
  old_r2    r2 defaults: sparse recents, plan LDD, no k2    (3.31 s ref pt)
  base      r3 defaults: dense recents, LDD2, k2=16, group=1
  group4    base + sort_group=4 (26 -> 7 sort dispatches, byte-identical)
  coarse_g4 base + coarse sort levels + group=4 (4 dispatches; size cost)

Each row: warm + timed full compress on the 1 MiB bench blob and on a
1 MB log_repetitive slice (the size-sensitive class), plus candidate-
build-only seconds.  fails= must be 0 (CLAUDE.md: nonzero means the
native fallback tainted both size and time).

Usage: python experiments/exp_r3_onchip.py [--variants a,b] [--quick]
Writes /tmp/exp_r3_onchip.json as it goes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = {
    "old_r2": {"recent_levels": "base", "refine_plan": "LDD",
               "recent_k2_min": 0, "sort_group": 1},
    "base": {"sort_group": 1},
    "group4": {"sort_group": 4},
    "coarse_g4": {"sort_levels": "coarse", "sort_group": 4},
}


def main() -> None:
    import zopfli_tpu
    from zopfli_tpu.deflate import Options
    from zopfli_tpu.ops import hashmatch
    from zopfli_tpu import squeeze_batched
    import jax.numpy as jnp
    from bench import bench_data
    from experiments.exp_r3_candidates import ref_size
    import corpus

    names = None
    if "--variants" in sys.argv:
        names = sys.argv[sys.argv.index("--variants") + 1].split(",")
    data = {"text1m": bench_data()[:1000000]}
    if "--quick" not in sys.argv:
        data["log_repetitive"] = dict(corpus.files())["log_repetitive"][:1000000]
    refs = {k: ref_size(k, v) for k, v in data.items()}
    opts = Options(engine="tpu", numiterations=15)
    base_knobs = hashmatch.current_knobs()

    results = {}
    try:
      for vname, spec_v in VARIANTS.items():
        if names and vname not in names:
            continue
        kn = dict(base_knobs)
        for k, v in spec_v.items():
            kn[k] = hashmatch._SORT_PRESETS[v] if k == "sort_levels" else (
                hashmatch._RECENT_PRESETS[v] if k == "recent_levels" else v)
        hashmatch.KNOBS.update(kn)
        row = {}
        for dname, blob in data.items():
            squeeze_batched.VERIFY_FAILS[0] = 0
            t0 = time.perf_counter()
            zopfli_tpu.compress(blob, "gzip", opts)      # warm (compiles)
            warm_s = time.perf_counter() - t0
            secs = 1e9
            for _ in range(2):  # min-of-2: axon jitter is 250-500 ms
                t0 = time.perf_counter()
                out = zopfli_tpu.compress(blob, "gzip", opts)
                secs = min(secs, time.perf_counter() - t0)
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
            samples = []
            for _ in range(3):  # axon dispatch jitter is 250-500 ms
                t1 = time.perf_counter()
                cand()
                samples.append(time.perf_counter() - t1)
            cand_s = min(samples)

            row[dname] = {
                "size": len(out), "ref": refs[dname],
                "vs_ref": round(len(out) / refs[dname], 5),
                "secs": round(secs, 3), "warm_s": round(warm_s, 1),
                "cand_s": round(cand_s, 3),
                "fails": squeeze_batched.VERIFY_FAILS[0],
            }
            print(f"[{vname}] {dname}: {row[dname]}", flush=True)
        results[vname] = {"rows": row}
        with open("/tmp/exp_r3_onchip.json", "w") as f:
            json.dump(results, f, indent=1)
    finally:
        hashmatch.KNOBS.update(base_knobs)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
