"""Micro-timing of the short-dists phase pieces on the current backend."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(name, f, *args):
    import jax
    import jax.numpy as jnp
    jf = jax.jit(f)
    out = jf(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = jf(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.sum(jnp.ravel(leaves[0])[:4].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:12s} {best:.4f}s", flush=True)


def main() -> None:
    import jax.numpy as jnp
    from zopfli_tpu.ops import hashmatch

    n = hashmatch.PREFIX + (1 << 20) + 264
    L = 1 << 20
    D = 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 8, n).astype(np.uint8))
    instart = hashmatch.PREFIX

    def eq_stack(x):
        return jnp.stack([
            jnp.concatenate([jnp.zeros(d, bool), x[d:] == x[:-d]])
            for d in range(1, D + 1)])

    t("eq_stack", eq_stack, x)

    eqr = np.asarray(eq_stack(x))
    eqd = jnp.asarray(eqr)

    def doubling(eq_rows):
        r = eq_rows.astype(jnp.int32)
        for s in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            sh = jnp.concatenate(
                [r[:, s:], jnp.zeros((D, s), jnp.int32)], axis=1)
            r = jnp.where(r == s, r + sh, r)
        return r

    t("doubling", doubling, eqd)

    r32 = jnp.asarray(eqr.astype(np.int32))

    def slice_T(r):
        return r[:, instart:instart + L].T

    t("slice_T", slice_T, r32)

    def whole(x, min_pos):
        iota_n = jnp.arange(n, dtype=jnp.int32)
        eq_rows = eq_stack(x)
        r = doubling(eq_rows)
        dvec = jnp.arange(1, D + 1, dtype=jnp.int32)
        ok = (iota_n[None, :] - dvec[:, None]) >= min_pos
        return jnp.where(ok, r, 0)[:, instart:instart + L].T

    t("whole", whole, x, jnp.int32(instart))

    # 1-D single-distance pieces for comparison
    def one_d(x):
        eq = jnp.concatenate([jnp.zeros(3, bool), x[3:] == x[:-3]])
        r = eq.astype(jnp.int32)
        for s in (1, 2, 4, 8, 16, 32, 64, 128, 256):
            sh = jnp.concatenate([r[s:], jnp.zeros(s, jnp.int32)])
            r = jnp.where(r == s, r + sh, r)
        return r

    t("one_d", one_d, x)


if __name__ == "__main__":
    main()
