"""Tests for the batched TPU squeeze pipeline (CPU interpret mode)."""

import zlib

import numpy as np
import pytest

import zopfli_tpu
from zopfli_tpu import native
from zopfli_tpu.deflate import Options
from zopfli_tpu.lz77 import LZ77Store
from zopfli_tpu.ops import scan_kernel


def _random_bp(rng, tile, kbp, nt):
    """Random but well-formed breakpoint tables: ascending lengths."""
    bp_len = np.sort(rng.integers(0, 80, (tile, kbp, nt)), axis=1)
    bp_len = np.where(bp_len < 3, 0, bp_len).astype(np.int32)
    bp_dist = rng.integers(1, 3000, (tile, kbp, nt)).astype(np.int32)
    return bp_len, bp_dist


def test_scan_kernel_matches_reference():
    rng = np.random.default_rng(5)
    tile, nt, kbp = 128, 8, 4
    bp_len, _ = _random_bp(rng, tile, kbp, nt)
    bp_dcost = rng.uniform(1, 15, (tile, kbp, nt)).astype(np.float32)
    litcost = rng.uniform(1, 12, (tile, nt)).astype(np.float32)
    lcost = rng.uniform(1, 10, (scan_kernel.W, nt)).astype(np.float32)

    run = scan_kernel.make_scan(tile, nt, kbp, interpret=True)
    cl, cost = run(bp_len, bp_dcost, litcost, lcost)
    rcl, rcost = scan_kernel.scan_reference(bp_len, bp_dcost, litcost, lcost)

    np.testing.assert_allclose(np.asarray(cost), rcost, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(cl), rcl)


def test_traceback_kernel_matches_reference():
    rng = np.random.default_rng(9)
    tile, nt, kbp = 128, 8, 4
    bl, bd = _random_bp(rng, tile, kbp, nt)
    # Plausible cl: random edges whose lengths the bp tables can cover
    # (the resolver returns 0 for uncovered lengths — also exercised).
    cl = np.zeros((tile, nt), np.int32)
    for lane in range(nt):
        for p in range(1, tile + 1):
            if rng.random() < 0.7 or p < 4:
                cl[p - 1, lane] = 1
            else:
                cl[p - 1, lane] = int(rng.integers(3, min(p, 80) + 1))
    lit = rng.integers(0, 256, (tile, nt)).astype(np.int32)
    nbyt = rng.integers(0, tile + 1, (1, nt)).astype(np.int32)
    nbyt[0, 0] = tile
    nbyt[0, 1] = 0

    run = scan_kernel.make_traceback(tile, nt, kbp, interpret=True)
    symtab = scan_kernel.symbol_range_table()
    hist, plp, pdp = run(cl, bl, bd, lit, nbyt, symtab)
    rhist, rpl, rpd = scan_kernel.traceback_reference(cl, bl, bd, lit, nbyt)
    np.testing.assert_array_equal(np.asarray(hist), rhist)
    np.testing.assert_array_equal(np.asarray(plp), rpl)
    np.testing.assert_array_equal(np.asarray(pdp), rpd)


def test_batched_roundtrip(corpus):
    for name in ["foobar", "text", "runs", "underscore_foobar",
                 "random_3000"]:
        data = corpus[name]
        out = zopfli_tpu.compress(data, "gzip",
                                  Options(engine="tpu", numiterations=5))
        assert zlib.decompress(out, 16 + 15) == data, name


def test_batched_size_close_to_native(corpus):
    # Tiles are 1 KiB here (conftest), so forced path nodes are dense;
    # allow a modest slack relative to the serial native engine.
    for name in ["text", "underscore_foobar"]:
        data = corpus[name]
        tpu = zopfli_tpu.compress(data, "gzip",
                                  Options(engine="tpu", numiterations=10))
        nat = zopfli_tpu.compress(data, "gzip",
                                  Options(engine="native", numiterations=10))
        assert len(tpu) <= len(nat) * 1.10 + 16, (name, len(tpu), len(nat))


def test_hist_dynamic_cost_matches_store_cost():
    data = np.frombuffer(b"a quick brown fox " * 300, dtype=np.uint8)
    lit, dst = native.greedy(data, 0, len(data))
    store = LZ77Store(data, lit, dst)
    ll_c, d_c = store.histogram(0, store.size)
    ctx = native.CostContext(lit, dst)
    assert ctx.dynamic_lengths(0, store.size)[0] == \
        native.hist_dynamic_cost(ll_c, d_c)


def test_traceback_tiles_literals_and_matches():
    # Path: 4 literals then a match of length 5 at distance 4.
    TL = 9
    cl = np.zeros((1, TL + 1), np.int16)
    cd = np.zeros((1, TL + 1), np.int16)
    cl[0, 1:5] = 1
    cl[0, 9] = 5
    cd[0, 9] = 4
    data = np.frombuffer(b"abcdabcda", dtype=np.uint8)[None]
    lit, dst = native.traceback_tiles(cl, cd, data, np.array([TL]))
    np.testing.assert_array_equal(lit, [97, 98, 99, 100, 5])
    np.testing.assert_array_equal(dst, [0, 0, 0, 0, 4])
