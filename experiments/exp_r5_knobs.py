"""r5: isolate candidate-build phase costs by KNOB (full-program A/B).

Stage-delta profiling is DCE-prone (CLAUDE.md r4); knob variants time
the FULL program each time, so deltas are real end-to-end costs.

Usage: python experiments/exp_r5_knobs.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = {
    "base_LD2":   {},
    "no_refine":  {"refine_plan": ""},
    "no_short":   {"short_dists": 0},
    "short4":     {"short_dists": 4},
    "refine_L":   {"refine_plan": "L"},
    "no_k2":      {"recent_k2_min": 0, "refine_plan": "LD"},
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
        kn.update(spec_v)

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
        print(f"{name:10s} {best:6.3f}s", flush=True)


if __name__ == "__main__":
    main()
