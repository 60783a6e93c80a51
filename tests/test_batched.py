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
    bp_len, bp_dist = _random_bp(rng, tile, kbp, nt)
    bp_dcost = rng.uniform(1, 15, (tile, kbp, nt)).astype(np.float32)
    litcost = rng.uniform(1, 12, (tile, nt)).astype(np.float32)
    lcost = rng.uniform(1, 10, (scan_kernel.W, nt)).astype(np.float32)

    run = scan_kernel.make_scan(tile, nt, kbp, interpret=True)
    ce, cost = run(bp_len, bp_dist, bp_dcost, litcost, lcost)
    rce, rcost = scan_kernel.scan_reference(
        bp_len, bp_dist, bp_dcost, litcost, lcost)

    np.testing.assert_allclose(np.asarray(cost), rcost, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(ce), rce)


def test_traceback_kernel_matches_reference():
    rng = np.random.default_rng(9)
    tile, nt = 128, 8
    # Build plausible packed edges: random lengths, <= position.
    ce = np.zeros((tile, nt), np.int32)
    for lane in range(nt):
        for p in range(1, tile + 1):
            if rng.random() < 0.7 or p < 4:
                ce[p - 1, lane] = 1
            else:
                l = int(rng.integers(3, min(p, 258) + 1))
                d = int(rng.integers(1, 2000))
                ce[p - 1, lane] = scan_kernel.pack_edge(l, d)
    lit = rng.integers(0, 256, (tile, nt)).astype(np.int32)
    nbyt = rng.integers(0, tile + 1, (1, nt)).astype(np.int32)
    nbyt[0, 0] = tile
    nbyt[0, 1] = 0

    run = scan_kernel.make_traceback(tile, nt, interpret=True)
    symtab = scan_kernel.symbol_range_table()
    hist, pep = run(ce, lit, nbyt, symtab)
    rhist, rpe = scan_kernel.traceback_reference(ce, lit, nbyt)
    np.testing.assert_array_equal(np.asarray(hist), rhist)
    np.testing.assert_array_equal(np.asarray(pep), rpe)


def test_scan_traceback_path_covers_tile():
    # End-to-end kernel invariant (regression: resolving distances at
    # the destination row instead of carrying them from the source row
    # made paths stop covering their tiles): the traceback path's edge
    # lengths must sum to exactly tile_nbytes for every lane, and every
    # match edge's packed distance must be one the source row offered.
    rng = np.random.default_rng(11)
    tile, nt, kbp = 128, 8, 4
    bp_len, bp_dist = _random_bp(rng, tile, kbp, nt)
    bp_dcost = rng.uniform(1, 15, (tile, kbp, nt)).astype(np.float32)
    litcost = rng.uniform(4, 12, (tile, nt)).astype(np.float32)
    lcost = rng.uniform(1, 10, (scan_kernel.W, nt)).astype(np.float32)

    scan = scan_kernel.make_scan(tile, nt, kbp, interpret=True)
    ce, _ = scan(bp_len, bp_dist, bp_dcost, litcost, lcost)
    nbyt = np.full((1, nt), tile, np.int32)
    lit = rng.integers(0, 256, (tile, nt)).astype(np.int32)
    tb = scan_kernel.make_traceback(tile, nt, interpret=True)
    _, pep = tb(ce, lit, nbyt, scan_kernel.symbol_range_table())
    pep = np.asarray(pep)
    lens = pep & scan_kernel.LEN_MASK
    dists = pep >> scan_kernel.LEN_BITS
    np.testing.assert_array_equal(lens.sum(axis=0), nbyt[0])
    for lane in range(nt):
        for j in np.nonzero(lens[:, lane] >= 3)[0]:
            l, d = int(lens[j, lane]), int(dists[j, lane])
            src = j + 1 - l  # 0-based source row
            covering = bp_len[src, :, lane] >= l
            assert covering.any()
            assert d in bp_dist[src, covering, lane]


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


def test_no_silent_native_fallback(corpus):
    # Regression guard: a traceback/decode bug makes every block fail
    # verify_parse and silently fall back to the native engine (sizes
    # look fine, time doubles) — assert zero fallbacks on normal data.
    from zopfli_tpu import squeeze_batched as sb
    before = sb.VERIFY_FAILS[0]
    data = corpus["text"] + corpus["runs"] + corpus["foobar"]
    out = zopfli_tpu.compress(data, "gzip",
                              Options(engine="tpu", numiterations=4))
    assert zlib.decompress(out, 16 + 15) == data
    assert sb.VERIFY_FAILS[0] == before, "TPU parse fell back to native"


def test_compress_many_window_isolation(corpus):
    # Identical adjacent blobs: any cross-blob window leak WOULD be
    # exploited (a match into the identical previous input) and the
    # standalone stream would fail to decompress.
    rng = np.random.default_rng(3)
    base = bytes(rng.integers(97, 123, 6000, dtype=np.uint8))
    blobs = [base, base, b"", base[:100], b"x", corpus["text"]]
    outs = zopfli_tpu.compress_many(
        blobs, "zlib", Options(engine="tpu", numiterations=3))
    for i, (b, o) in enumerate(zip(blobs, outs)):
        assert zlib.decompress(o) == b, f"blob {i}"


def test_compress_many_matches_compress_gzip(corpus):
    blobs = [corpus["foobar"], corpus["random_3000"]]
    outs = zopfli_tpu.compress_many(
        blobs, "gzip", Options(engine="tpu", numiterations=2))
    for b, o in zip(blobs, outs):
        assert zlib.decompress(o, 16 + 15) == b


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
