"""Megafused single-dispatch pipeline (ops.mega) on the CPU backend.

The real-TPU equality sentinels live in tests_tpu/ (XLA:TPU miscompiles
do not reproduce on CPU); here we pin the host-visible semantics: the
mega path round-trips, takes the device-computed second-split decision,
matches the two-dispatch path's seed outputs bit-for-bit, and falls
back cleanly on fetch-cap overflow.
"""

import os
import zlib

import numpy as np
import pytest

import zopfli_tpu
from zopfli_tpu import Options


@pytest.fixture()
def mega_on(monkeypatch):
    from zopfli_tpu.deflate import _LOCAL_MESH
    from zopfli_tpu.ops import mega
    monkeypatch.setenv("ZT_MEGA", "1")
    monkeypatch.setattr(mega, "MEGA_MIN", 1000)
    # Mega routes single-device only; the suite's virtual 8-CPU mesh
    # would silently disable it through compress().
    saved = _LOCAL_MESH[0]
    _LOCAL_MESH[0] = None
    yield
    _LOCAL_MESH[0] = saved


def _composite() -> bytes:
    a = open("/root/reference/src/zopfli/deflate.c", "rb").read()[:30000]
    b = bytes([i % 11 for i in range(25000)])
    c = b"log line 12345 GET /index.html 200\n" * 700
    return a + b + c


def test_mega_roundtrip_multiblock(mega_on):
    data = _composite()
    out = zopfli_tpu.compress(data, "gzip",
                              Options(engine="tpu", numiterations=4))
    assert zlib.decompress(out, 16 + 15) == data


def test_mega_seed_outputs_match_two_dispatch(mega_on):
    from zopfli_tpu.ops import mega as mega_mod
    from zopfli_tpu.ops import seed as seed_mod

    data = np.frombuffer(_composite(), np.uint8)
    mr = mega_mod.mega_finish(mega_mod.mega_dispatch(
        data, 0, len(data), 15, 3, interpret=True))
    sr = seed_mod.seed_master(data, 0, len(data), 15, interpret=True)
    assert mr.bounds == sr.bounds
    assert np.array_equal(mr.seed_ll, sr.seed_ll)
    assert np.array_equal(mr.seed_d, sr.seed_d)
    assert np.array_equal(mr.block_costs, sr.block_costs)


def test_mega_split_decision_is_integer_pair(mega_on):
    from zopfli_tpu.ops import mega as mega_mod

    data = np.frombuffer(_composite(), np.uint8)
    mr = mega_mod.mega_finish(mega_mod.mega_dispatch(
        data, 0, len(data), 15, 3, interpret=True))
    sp2, tc1, tc2 = mr.split2
    assert all(isinstance(p, int) for p in sp2)
    assert sorted(sp2) == sp2
    assert tc1 > 0 and tc2 > 0


def test_mega_fetch_overflow_path(mega_on, monkeypatch):
    from zopfli_tpu.ops import fused_engine

    monkeypatch.setenv("ZT_FETCH_CAP", "64")
    data = _composite()
    before = fused_engine.FETCH_RETRIES[0]
    out = zopfli_tpu.compress(data, "gzip",
                              Options(engine="tpu", numiterations=3))
    assert zlib.decompress(out, 16 + 15) == data
    assert fused_engine.FETCH_RETRIES[0] > before
