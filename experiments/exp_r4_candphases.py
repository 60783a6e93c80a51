"""Phase-by-phase timing of build_candidates on the current backend.

Uses the `stage` early-exit static arg: stage k compiles the program
prefix up to phase k, so time(stage k) - time(stage k-1) attributes
cost to that phase (XLA may schedule differently per prefix, but the
deltas have matched intuition well).  Phases:
  1 ladders    polynomial hash ladders (both families)
  2 lsd        LSD sort rounds (gather+sort per round)
  3 adj        skeys batched gather + adjacency + confirm + exact lcp
  4 neigh      neighbor chains + scatter to position order
  5 recents    batched recents sort + k2
  6 short      exact short-distance runs + concat
  7 refine     refinement rounds (REFINE_PLAN)
  0 full       + skyline + condense

Usage: python experiments/exp_r4_candphases.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STAGES = [(1, "ladders"), (2, "lsd"), (3, "adj"), (4, "neigh"),
          (5, "recents"), (6, "short"), (7, "refine"), (0, "full")]


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
    kn = hashmatch.current_knobs()

    prev = 0.0
    for stage, name in STAGES:
        def run():
            out = hashmatch.build_candidates(
                bufd, 1 << 20, jnp.int32(hashmatch.PREFIX),
                jnp.int32(hashmatch.PREFIX + len(blob)),
                stage=stage, **kn)
            float(jnp.sum(jnp.ravel(out[0])[:4].astype(jnp.float32)))
        run()
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:8s} cum {best:6.3f}s  delta {best - prev:+6.3f}s",
              flush=True)
        prev = best


if __name__ == "__main__":
    main()
