"""Data-parallel block pipeline over a TPU device mesh.

The reference is single-threaded C (SURVEY.md §2 checklist); the scale
axes it leaves on the table — independent deflate blocks, independent
1 MB master blocks, independent files — become one batched block axis
here, sharded over a `jax.sharding.Mesh` with `shard_map`.  Each device
runs the full per-block compute (hash-ladder candidate search + min-plus
squeeze DP) on its shard of blocks; the only collective is a `psum` of
per-shard cost totals for observability (compression is embarrassingly
data-parallel — the ragged bitstream gather happens on the host, see
SURVEY.md §5 "Distributed communication backend").

Block layout (one row per block, fixed shape for XLA):

    [ filler | window prefix (halo) | block bytes | padding ]
      ^PREFIX-prefix_len            ^PREFIX       ^PREFIX+len

The 32 KiB halo of preceding bytes restores cross-block matches at
shard boundaries (reference semantics: deflate.c:802-810 warmup), while
keeping every block fully independent — option (ii) of SURVEY.md §5.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import spec
from ..ops import dp, hashmatch

PREFIX = hashmatch.PREFIX
PAD_TAIL = 264  # >= MAX_MATCH + ladder slack


def total_row_len(cap: int) -> int:
    """Padded row length for a block capacity."""
    return PREFIX + cap + PAD_TAIL


def make_mesh(n_devices: int | None = None, axis: str = "blocks") -> Mesh:
    """1-D device mesh over the batched-block axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@functools.partial(jax.jit, static_argnums=(1,))
def block_pipeline(bufs: jnp.ndarray, cap: int, min_pos: jnp.ndarray,
                   inend_real: jnp.ndarray, ll_cost: jnp.ndarray,
                   d_cost: jnp.ndarray):
    """Full squeeze DP for a batch of blocks (no mesh; also the vmap core).

    bufs: (B, total_row_len(cap)) uint8 padded block rows
    min_pos: (B,) int32 — first row index holding a real (halo) byte
    inend_real: (B,) int32 — PREFIX + real block length
    ll_cost: (B, 288) float32, d_cost: (B, 32) float32 — cost model

    Returns (choice_len, choice_dist, final_cost):
      choice_len/choice_dist (B, cap+1) int32 — edge chosen to reach each
      position; final_cost (B,) float32 — DP cost of each full block.
    """
    bp_len, bp_dist, _ = jax.vmap(
        lambda b, mp, ie: hashmatch.build_candidates(b, cap, mp, ie)
    )(bufs, min_pos, inend_real)

    d_clamped = jnp.maximum(bp_dist, 1)
    dsym = dp.dist_symbol_jax(d_clamped)
    dextra = dp._DSYM_EXTRA[dsym]
    data_block = bufs[:, PREFIX:PREFIX + cap].astype(jnp.int32)
    real_len = inend_real - PREFIX
    mask = jnp.arange(cap, dtype=jnp.int32)[None, :] < real_len[:, None]

    lcost_vec, bp_dcost, litcost = dp.edge_cost_tables(
        ll_cost, d_cost, dsym, dextra, data_block)
    choice_len, choice_dist, costs = dp.squeeze_scan(
        bp_len, bp_dist, bp_dcost, litcost, lcost_vec, mask)
    # costs[:, j] is the cost of position j+1; block cost is at real_len-1.
    idx = jnp.clip(real_len - 1, 0, cap - 1)
    final_cost = jnp.take_along_axis(costs, idx[:, None], axis=1)[:, 0]
    final_cost = jnp.where(real_len > 0, final_cost, 0.0)
    return choice_len, choice_dist, final_cost


def sharded_pipeline(mesh: Mesh, cap: int, axis: str = "blocks"):
    """The block pipeline sharded over a device mesh.

    Returns a jitted fn with the same signature as `block_pipeline`
    (minus cap) whose batch axis is sharded over `axis`; also returns a
    replicated psum of the shard cost totals (the one collective).
    """
    def _local(bufs, min_pos, inend_real, ll_cost, d_cost):
        cl, cd, cost = block_pipeline(bufs, cap, min_pos, inend_real,
                                      ll_cost, d_cost)
        total = jax.lax.psum(jnp.sum(cost), axis)
        return cl, cd, cost, total

    fn = shard_map(
        _local, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis, None),
                  P(axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def pack_blocks(data: np.ndarray, ranges: list[tuple[int, int]], cap: int):
    """Pack (instart, inend) block ranges of `data` into padded rows.

    Returns (bufs (B,total) uint8, min_pos (B,) i32, inend_real (B,) i32).
    Every range must satisfy inend - instart <= cap.
    """
    total = total_row_len(cap)
    B = len(ranges)
    bufs = np.empty((B, total), dtype=np.uint8)
    min_pos = np.empty(B, dtype=np.int32)
    inend_real = np.empty(B, dtype=np.int32)
    filler = hashmatch_filler(total)
    for i, (instart, inend) in enumerate(ranges):
        L = inend - instart
        assert 0 <= L <= cap, (instart, inend, cap)
        prefix_len = min(instart, spec.WINDOW_SIZE)
        row = bufs[i]
        row[:PREFIX] = filler[:PREFIX]
        if prefix_len:
            row[PREFIX - prefix_len:PREFIX] = data[instart - prefix_len:instart]
        row[PREFIX:PREFIX + L] = data[instart:inend]
        row[PREFIX + L:] = 0
        min_pos[i] = PREFIX - prefix_len
        inend_real[i] = PREFIX + L
    return bufs, min_pos, inend_real


def hashmatch_filler(n: int) -> np.ndarray:
    """Deterministic filler for unused prefix rows (avoids equal-hash runs)."""
    return (np.arange(n, dtype=np.uint32) * 2654435761 >> 13).astype(np.uint8)
