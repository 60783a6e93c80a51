"""TPU (JAX) engine: candidate validity, parse validity, quality, e2e."""

import zlib

import numpy as np
import jax.numpy as jnp
import pytest

import zopfli_tpu
from zopfli_tpu import Options, native
from zopfli_tpu.lz77 import LZ77Store, verify_store
from zopfli_tpu.ops import hashmatch
from zopfli_tpu.ops.engine import TpuBlockEngine


def _build(data: bytes, **knobs):
    """Candidate tables for a whole small buffer as one block."""
    n = len(data)
    cap = 16384
    assert n <= cap
    total = hashmatch.PREFIX + cap + 264
    buf = np.zeros(total, dtype=np.uint8)
    from zopfli_tpu.ops.engine import _FILLER
    buf[:hashmatch.PREFIX] = _FILLER
    buf[hashmatch.PREFIX:hashmatch.PREFIX + n] = np.frombuffer(data, np.uint8)
    bp_len, bp_dist, best_len = hashmatch.build_candidates(
        jnp.asarray(buf), cap, jnp.int32(hashmatch.PREFIX),
        jnp.int32(hashmatch.PREFIX + n), **knobs)
    return (np.asarray(bp_len)[:n], np.asarray(bp_dist)[:n],
            np.asarray(best_len)[:n])


def _assert_valid_candidates(data: bytes, bp_len, bp_dist, name=""):
    """Every claimed (length, dist) must reproduce its bytes exactly."""
    arr = np.frombuffer(data, np.uint8)
    n = len(data)
    rows, cols = np.nonzero(bp_len)
    ls = bp_len[rows, cols].astype(np.int64)
    ds = bp_dist[rows, cols].astype(np.int64)
    assert (ls >= 3).all() and (ls <= np.minimum(258, n - rows)).all()
    assert (ds >= 1).all() and (ds <= rows).all(), name
    tot = int(ls.sum())
    offs = np.arange(tot) - np.repeat(np.cumsum(ls) - ls, ls)
    dsts = np.repeat(rows, ls) + offs
    srcs = np.repeat(rows - ds, ls) + offs
    assert np.array_equal(arr[dsts], arr[srcs]), name
    prev = np.where(bp_len[:, :-1] > 0, bp_len[:, :-1], -1)
    nxt = bp_len[:, 1:]
    assert ((nxt == 0) | (nxt > prev)).all(), name


def test_candidates_are_real_matches(corpus):
    for name in ["foobar", "text", "runs", "alternating", "random_3000"]:
        data = corpus[name]
        bp_len, bp_dist, _ = _build(data)
        _assert_valid_candidates(data, bp_len, bp_dist, name)


def test_candidate_knob_variants_valid(corpus):
    """Every knob combination must still produce only real matches."""
    variants = [
        dict(sort_levels=hashmatch._SORT_PRESETS["short"]),
        dict(recent_k2_min=16, refine_plan="L2D"),
        dict(sort_levels=hashmatch._SORT_PRESETS["coarse"],
             recent_k2_min=16, refine_plan="LR2D", max_bp=8),
    ]
    for name in ["text", "runs", "random_3000"]:
        data = corpus[name]
        for kn in variants:
            bp_len, bp_dist, _ = _build(data, **kn)
            _assert_valid_candidates(data, bp_len, bp_dist,
                                     f"{name}:{kn}")


def test_candidate_quality_vs_native(corpus):
    """The hash-ladder search should find the greedy-longest match nearly
    everywhere the chain search does."""
    data = corpus["text"]
    arr = np.frombuffer(data, np.uint8)
    _, _, best_len = _build(data)
    # Native greedy parse lengths as a proxy for achievable matches.
    eng = native.BlockEngine(arr, 0, len(arr))
    litlens, dists = eng.squeeze_run(None, None)
    store = LZ77Store(arr, litlens, dists)
    m = store.dists > 0
    found = best_len[store.pos[m]]
    want = store.litlens[m]
    # Match lengths are quantized to the fingerprint ladder (an
    # intentional underestimate; only the best candidate per position is
    # refined exactly), so a perfect score is not expected — but the
    # bulk of the greedy matches must be matched or beaten, and missed
    # ones must still be nearly covered (>= 75% of the wanted length).
    ok = (found >= want).mean()
    assert ok > 0.80, ok
    near = (found >= np.minimum(want, (want * 3) // 4)).mean()
    assert near > 0.97, near


@pytest.mark.parametrize("name", ["foobar", "text", "runs", "random_3000",
                                  "long_run", "tiny_repeat", "three"])
def test_tpu_squeeze_run_valid(corpus, name):
    data = corpus[name]
    arr = np.frombuffer(data, np.uint8)
    eng = TpuBlockEngine(arr, 0, len(arr))
    for model in ("fixed", "stat"):
        if model == "fixed":
            litlens, dists = eng.squeeze_run(None, None)
        else:
            ll = np.full(288, 8.0)
            dd = np.full(32, 5.0)
            litlens, dists = eng.squeeze_run(ll, dd)
        store = LZ77Store(arr, litlens, dists)
        verify_store(store)
        covered = np.where(dists == 0, 1, litlens).sum()
        assert covered == len(data)


def test_tpu_engine_end_to_end(corpus):
    for name in ["foobar", "text", "runs", "underscore_foobar"]:
        data = corpus[name]
        out = zopfli_tpu.compress(data, "gzip",
                                  Options(engine="tpu", numiterations=5))
        assert zlib.decompress(out, 16 + 15) == data


def test_tpu_size_close_to_native(corpus):
    for name in ["text", "underscore_foobar"]:
        data = corpus[name]
        tpu = zopfli_tpu.compress(data, "gzip",
                                  Options(engine="tpu", numiterations=10))
        nat = zopfli_tpu.compress(data, "gzip",
                                  Options(engine="native", numiterations=10))
        assert len(tpu) <= len(nat) * 1.02 + 16, (name, len(tpu), len(nat))
