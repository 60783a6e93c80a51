"""Tests for parallel master compression, splicing, and checksums."""

import zlib

import numpy as np
import pytest

import zopfli_tpu
from zopfli_tpu import containers
from zopfli_tpu.deflate import Options
from zopfli_tpu.emit import BitStream
from zopfli_tpu.parallel.multihost import compress_multihost


def _big(rng, n=2_300_000):
    words = [b"alpha ", b"beta ", b"gamma ", b"delta ", b"epsilon "]
    return b"".join(words[i]
                    for i in rng.integers(0, 5, n // 5))[:n]


def test_parallel_masters_match_serial(rng):
    data = _big(rng)
    o_serial = zopfli_tpu.compress(data, "gzip", Options(numiterations=2))
    o_par = zopfli_tpu.compress(data, "gzip",
                                Options(numiterations=2, workers=0))
    assert zlib.decompress(o_par, 16 + 15) == data
    assert o_par == o_serial  # same per-master streams, same splice order


def test_parallel_stored_blocks_splice(rng):
    # Random data -> stored blocks; alignment must re-resolve at splice.
    data = rng.integers(0, 256, 2_100_000, dtype=np.uint8).tobytes()
    out = zopfli_tpu.compress(data, "gzip",
                              Options(numiterations=1, workers=0))
    assert zlib.decompress(out, 16 + 15) == data


def test_bitstream_extend_alignment():
    a = BitStream()
    a.bits(0b101, 3)
    b = BitStream()
    b.bits(0b1, 1)
    b.align_byte()
    b.raw_bytes(b"\xff")
    a.extend(b)
    assert a.nbits == 8 + 8  # 3+1 bits padded to 8, then one byte
    assert a.getvalue() == bytes([0b1101, 0xff])


def test_checksum_combines(rng):
    data = rng.integers(0, 256, 300_001, dtype=np.uint8).tobytes()
    for cut in (0, 1, 1000, 299_999, 300_001):
        a, b = data[:cut], data[cut:]
        assert containers.crc32_combine(
            containers.crc32(a), containers.crc32(b), len(b)) == \
            zlib.crc32(data)
        assert containers.adler32_combine(
            containers.adler32(a), containers.adler32(b), len(b)) == \
            zlib.adler32(data)


def test_multihost_single_process(rng):
    data = _big(rng, 1_200_000)
    for fmt, hdr in (("gzip", 16 + 15), ("zlib", 15), ("deflate", -15)):
        out = compress_multihost(data, fmt, Options(numiterations=2))
        assert zlib.decompress(out, hdr) == data
    assert zlib.decompress(compress_multihost(b"", "gzip"), 16 + 15) == b""


def test_multihost_matches_serial_bytes(rng):
    data = _big(rng, 1_500_000)
    serial = zopfli_tpu.compress(data, "gzip", Options(numiterations=2))
    mh = compress_multihost(data, "gzip", Options(numiterations=2))
    assert mh == serial
