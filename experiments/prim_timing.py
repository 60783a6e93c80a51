"""Raw primitive timings on the current backend: what do the candidate
build's building blocks actually cost on a v5e chip?

Times (min of 5, tiny-d2h sync per CLAUDE.md):
  sort1     lax.sort (u32 key, i32 payload), n = 1.3M   x26 in 'all'
  sort2     lax.sort 2-key (u32,u32,i32), n = 1.3M       grouped rounds
  bsortR    batched row sort (R, n) 3-arr num_keys=1     recents (R=22)
  gather    n-sized random u32 gather                    refinement unit
  full      build_candidates with current knobs

Usage: python experiments/prim_timing.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, reps=5):
    import jax.numpy as jnp
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        float(jnp.sum(jnp.ravel(out[0] if isinstance(out, tuple) else out)
                      [:4].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    import jax
    import jax.numpy as jnp
    from zopfli_tpu.ops import hashmatch

    n = (1 << 20) + hashmatch.PREFIX + 264
    rng = np.random.default_rng(0)
    keys = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                       .astype(np.uint32))
    keys2 = jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint64)
                        .astype(np.uint32))
    idx = jnp.arange(n, dtype=jnp.int32)

    s1 = jax.jit(lambda k, i: jax.lax.sort((k, i), num_keys=1,
                                           is_stable=True))
    print("sort1  ", round(timeit(lambda: s1(keys, idx)), 4), flush=True)

    s2 = jax.jit(lambda a, b, i: jax.lax.sort((a, b, i), num_keys=2,
                                              is_stable=True))
    print("sort2  ", round(timeit(lambda: s2(keys, keys2, idx)), 4),
          flush=True)

    for R in (8, 22):
        kb = jnp.tile(keys[None, :], (R, 1))
        k2b = jnp.tile(keys2[None, :], (R, 1))
        ib = jnp.tile(idx[None, :], (R, 1))
        sb = jax.jit(lambda a, i, b: jax.lax.sort(
            (a, i, b), num_keys=1, is_stable=True, dimension=1))
        print(f"bsort{R} ", round(timeit(lambda: sb(kb, ib, k2b)), 4),
              flush=True)

    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    g1 = jax.jit(lambda k, p: jnp.take(k, p))
    print("gather ", round(timeit(lambda: g1(keys, perm)), 4), flush=True)

    # Full candidate build, current knobs, 1 MiB block.
    data = np.zeros(n, np.uint8)
    blob = open("/root/reference/src/zopfli/deflate.c", "rb").read()
    rep = (blob * ((1 << 20) // len(blob) + 1))[: 1 << 20]
    data[hashmatch.PREFIX:hashmatch.PREFIX + len(rep)] = \
        np.frombuffer(rep, np.uint8)
    bufd = jnp.asarray(data)

    def full():
        bl, bd, bln = hashmatch.build_candidates(
            bufd, 1 << 20, jnp.int32(hashmatch.PREFIX),
            jnp.int32(hashmatch.PREFIX + len(rep)),
            **hashmatch.current_knobs())
        return bl
    print("full   ", round(timeit(full, reps=3), 4), flush=True)


if __name__ == "__main__":
    main()
