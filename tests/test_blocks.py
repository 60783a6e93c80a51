"""Native vs Python parity for exact block costs, and splitter sanity."""

import numpy as np
import pytest

from zopfli_tpu import blocks, native
from zopfli_tpu.lz77 import LZ77Store


def _random_store(rng, n=2000):
    """Synthesize a plausible symbol stream (valid symbols, not valid LZ77)."""
    is_match = rng.random(n) < 0.4
    litlens = np.where(is_match, rng.integers(3, 259, n),
                       rng.integers(0, 256, n)).astype(np.uint16)
    dists = np.where(is_match, rng.integers(1, 32769, n), 0).astype(np.uint16)
    data = rng.integers(0, 256, 10 * n, dtype=np.uint8)
    return LZ77Store(data, litlens, dists)


@pytest.mark.parametrize("btype", [0, 1, 2])
def test_native_cost_matches_python(rng, btype):
    store = _random_store(rng)
    ranges = [(0, store.size), (5, 117), (0, 1), (100, 1500), (1999, 2000)]
    for lstart, lend in ranges:
        native_cost = blocks._native_ctx(store).block_cost(lstart, lend, btype)
        blocks.USE_NATIVE_COSTS = False
        try:
            py_cost = blocks.calculate_block_size(store, lstart, lend, btype)
        finally:
            blocks.USE_NATIVE_COSTS = True
        assert native_cost == py_cost, (btype, lstart, lend)


def test_native_auto_matches_python(rng):
    store = _random_store(rng, 900)  # small store => fixed probe active
    for lstart, lend in [(0, store.size), (13, 700)]:
        native_cost = blocks._native_ctx(store).block_cost(lstart, lend, -1)
        blocks.USE_NATIVE_COSTS = False
        try:
            py_cost = blocks.calculate_block_size_auto_type(store, lstart, lend)
        finally:
            blocks.USE_NATIVE_COSTS = True
        assert native_cost == py_cost


def test_native_dynamic_lengths_match(rng):
    store = _random_store(rng, 3000)
    cost_n, ll_n, d_n = blocks._native_ctx(store).dynamic_lengths(40, 2900)
    blocks.USE_NATIVE_COSTS = False
    try:
        cost_p, ll_p, d_p = blocks.get_dynamic_lengths(store, 40, 2900)
    finally:
        blocks.USE_NATIVE_COSTS = True
    assert cost_n == cost_p
    assert np.array_equal(ll_n, ll_p)
    assert np.array_equal(d_n, d_p)


def test_split_reduces_cost(rng):
    # Two statistically different halves should be split apart.
    a = rng.integers(0, 4, 6000, dtype=np.uint16)
    b = rng.integers(200, 256, 6000, dtype=np.uint16)
    litlens = np.concatenate([a, b])
    dists = np.zeros(12000, dtype=np.uint16)
    data = litlens.astype(np.uint8)
    store = LZ77Store(data, litlens, dists)
    points = blocks.block_split_lz77(store, 15)
    assert points, "expected at least one split"
    whole = blocks.estimate_cost(store, 0, store.size)
    bounds = [0] + points + [store.size]
    split_total = sum(blocks.estimate_cost(store, bounds[i], bounds[i + 1])
                      for i in range(len(bounds) - 1))
    assert split_total < whole


def test_device_split_matches_host(rng):
    """ops.devsplit reproduces the host (reference-parity) splitter
    bit-for-bit on diverse inputs."""
    from zopfli_tpu import blocks as blk
    from zopfli_tpu.deflate import Options, default_greedy
    from zopfli_tpu.lz77 import LZ77Store
    from zopfli_tpu.ops.devsplit import block_split_lz77_device

    greedy = default_greedy(Options())
    words = [b"alpha ", b"beta ", b"gamma ", b"delta "]
    text = b"".join(words[i] for i in rng.integers(0, 4, 30000))
    cases = [
        np.frombuffer(text[:60000], np.uint8),
        np.frombuffer((b"\x00" * 5000 + text[:20000] + b"z" * 4000), np.uint8),
        rng.integers(0, 256, 12000, dtype=np.uint8),
        np.frombuffer(text[:300], np.uint8),            # tiny: no split
    ]
    for data in cases:
        gl, gd = greedy(data, 0, len(data))
        store = LZ77Store(data, gl, gd, 0)
        host = blk.block_split_lz77(store, 15)
        dev = block_split_lz77_device(gl.astype(np.int32),
                                      gd.astype(np.int32), 15)
        assert host == dev, (host, dev)
