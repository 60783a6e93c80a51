"""A/B the candidate-build knobs on FULL build_candidates time (chip).

Pure build-time comparison (no Pallas kernels, so each variant is a
small XLA compile): refine plan length, dense vs base recents, k2.

Usage: python experiments/exp_r4_buildknobs.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = {
    "none":     {"refine_plan": ""},
    "L":        {"refine_plan": "L"},
    "LD":       {"refine_plan": "LD"},
    "LDD2":     {},
    "base_rec": {"recent_levels": "base"},
    "no_k2":    {"recent_k2_min": 0, "refine_plan": "LDD"},
    "no_short": {"short_dists": 0},
}


def main() -> None:
    import jax.numpy as jnp
    from zopfli_tpu.ops import hashmatch
    from bench import bench_data

    blob = bench_data()[: 1 << 20]
    n = hashmatch.PREFIX + (1 << 20) + 264
    buf = np.zeros(n, np.uint8)
    buf[hashmatch.PREFIX:hashmatch.PREFIX + len(blob)] = \
        np.frombuffer(blob, np.uint8)
    bufd = jnp.asarray(buf)
    base = hashmatch.current_knobs()

    for name, spec_v in VARIANTS.items():
        kn = dict(base)
        for k, v in spec_v.items():
            kn[k] = hashmatch._RECENT_PRESETS[v] if k == "recent_levels" \
                else v

        def run():
            out = hashmatch.build_candidates(
                bufd, 1 << 20, jnp.int32(hashmatch.PREFIX),
                jnp.int32(hashmatch.PREFIX + len(blob)), **kn)
            float(jnp.sum(jnp.ravel(out[0])[:4].astype(jnp.float32)))
        run()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:9s} {best:6.3f}s", flush=True)


if __name__ == "__main__":
    main()
