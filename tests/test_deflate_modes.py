"""Forced block types, tracer output, and master-block edges."""

import zlib

import numpy as np

import zopfli_tpu
from zopfli_tpu import Options
from zopfli_tpu.deflate import deflate
from zopfli_tpu.emit import BitStream
from zopfli_tpu.utils.logging import Tracer


def _raw(btype, data):
    out = BitStream()
    deflate(Options(numiterations=3), btype, True,
            np.frombuffer(data, np.uint8), out)
    return out.getvalue()


def test_forced_stored_blocks(rng):
    data = b"stored block path " * 100
    payload = _raw(0, data)
    assert zlib.decompress(payload, -15) == data
    # Stored encoding: 5-byte headers + raw bytes.
    assert len(payload) >= len(data)


def test_forced_fixed_blocks(rng):
    data = b"fixed tree path " * 200
    payload = _raw(1, data)
    assert zlib.decompress(payload, -15) == data
    assert len(payload) < len(data)


def test_stored_chunking_over_65535():
    data = bytes(np.random.default_rng(0).integers(0, 256, 70_000,
                                                   dtype=np.uint8))
    payload = _raw(0, data)
    assert zlib.decompress(payload, -15) == data


def test_tracer_records(rng):
    tr = Tracer()
    data = b"trace me " * 300
    out = zopfli_tpu.compress(data, "gzip",
                              Options(numiterations=3, tracer=tr))
    assert zlib.decompress(out, 16 + 15) == data
    kinds = {r["kind"] for r in tr.records}
    assert {"iteration", "block", "summary"} <= kinds
    summary = [r for r in tr.records if r["kind"] == "summary"][0]
    assert summary["insize"] == len(data)
    assert summary["outsize"] == len(out)


def test_master_block_boundary(rng):
    # Crosses the 1 MB master boundary; matches may span it via window.
    data = (b"boundary pattern " * 70000)[:1_100_000]
    out = zopfli_tpu.compress(data, "gzip", Options(numiterations=2))
    assert zlib.decompress(out, 16 + 15) == data
