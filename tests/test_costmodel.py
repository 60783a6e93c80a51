"""Device cost stack vs host/native oracles (exact integer parity).

ops/costmodel.py re-expresses the reference's tree machinery
(katajainen.c package-merge, deflate.c:434-518 OptimizeHuffmanForRle,
deflate.c:105-249 EncodeTree size, deflate.c:525-582 GetDynamicLengths)
in batched fixed-shape array form so the squeeze iteration control can
run on device.  Every component must agree bit-for-bit with the host
implementations that are themselves parity-tested against the
reference binary.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from zopfli_tpu import entropy, native, tree_encode
from zopfli_tpu.ops import costmodel as cm


def _hists(rng, n, trials):
    """Mixed histogram styles: dense, sparse, tiny, runs, zipf."""
    out = []
    for t in range(trials):
        style = t % 5
        if style == 0:
            h = rng.integers(0, 1000, n).astype(np.int64)
        elif style == 1:
            h = np.zeros(n, np.int64)
            k = int(rng.integers(1, n))
            h[rng.choice(n, k, replace=False)] = rng.integers(1, 50000, k)
        elif style == 2:
            h = np.zeros(n, np.int64)
            k = int(rng.integers(0, 5))
            if k:
                h[rng.choice(n, k, replace=False)] = rng.integers(1, 10, k)
        elif style == 3:
            h = np.repeat(rng.integers(0, 20, n // 8 + 1), 8)[:n]
            h = h.astype(np.int64)
        else:
            h = (rng.zipf(1.5, n) % 100000).astype(np.int64)
        out.append(h)
    return out


@pytest.mark.parametrize("n,maxbits", [(19, 7), (32, 15), (288, 15)])
def test_package_merge_vs_oracle(rng, n, maxbits):
    hs = _hists(rng, n, 40)
    got = np.asarray(cm.package_merge(
        jnp.asarray(np.stack(hs), jnp.int32), maxbits))
    for h, g in zip(hs, got):
        want = entropy.length_limited_code_lengths(h, maxbits)
        assert np.array_equal(want, g), h


@pytest.mark.parametrize("n", [32, 288])
def test_rle_optimize_vs_oracle(rng, n):
    hs = _hists(rng, n, 40)
    got = np.asarray(cm.rle_optimize(jnp.asarray(np.stack(hs), jnp.int32)))
    for h, g in zip(hs, got):
        want = tree_encode.optimize_huffman_for_rle(h.copy())
        assert np.array_equal(want, g), h


def test_tree_size_vs_oracle(rng):
    lls, ds = [], []
    for ll_h, d_h in zip(_hists(rng, 288, 30), _hists(rng, 32, 30)):
        ll_h[256] = 1
        d_h[30:] = 0
        lls.append(entropy.calculate_bit_lengths(ll_h, 15))
        ds.append(tree_encode.patch_distance_codes(
            entropy.calculate_bit_lengths(d_h, 15)))
    got = np.asarray(cm.tree_size(jnp.asarray(np.stack(lls), jnp.int32),
                                  jnp.asarray(np.stack(ds), jnp.int32)))
    for ll, d, g in zip(lls, ds, got):
        assert tree_encode.calculate_tree_size(ll, d) == int(g)


def test_hist_dynamic_cost_vs_native(rng):
    lls = _hists(rng, 288, 30)
    ds = _hists(rng, 32, 30)
    for d in ds:
        d[30:] = 0
    got = np.asarray(cm.hist_dynamic_cost(
        jnp.asarray(np.stack(lls), jnp.int32),
        jnp.asarray(np.stack(ds), jnp.int32)))
    for ll_h, d_h, g in zip(lls, ds, got):
        assert int(native.hist_dynamic_cost(ll_h, d_h)) == int(g)


def test_hist_dynamic_cost_lengths_match_native(rng):
    lls = _hists(rng, 288, 10)
    ds = _hists(rng, 32, 10)
    for d in ds:
        d[30:] = 0
    cost, gll, gd = cm.hist_dynamic_cost(
        jnp.asarray(np.stack(lls), jnp.int32),
        jnp.asarray(np.stack(ds), jnp.int32), want_lengths=True)
    cost, gll, gd = np.asarray(cost), np.asarray(gll), np.asarray(gd)
    for i, (ll_h, d_h) in enumerate(zip(lls, ds)):
        want_c, want_ll, want_d = native.hist_dynamic_cost(
            ll_h, d_h, want_lengths=True)
        assert int(want_c) == int(cost[i])
        assert np.array_equal(want_ll, gll[i])
        assert np.array_equal(want_d, gd[i])


def test_randomize_maps_match_mwc_simulation(rng):
    from zopfli_tpu.squeeze import MwcRng, SymbolStats, randomize_stat_freqs
    ll_maps, d_maps = cm.randomize_maps(6)
    r = MwcRng()
    st = SymbolStats()
    st.litlens = rng.integers(0, 100, 288).astype(np.int64)
    st.dists = rng.integers(0, 100, 32).astype(np.int64)
    for e in range(6):
        ll0, d0 = st.litlens.copy(), st.dists.copy()
        randomize_stat_freqs(r, st)
        got_ll = ll0[ll_maps[e]]
        got_ll[256] = 1
        assert np.array_equal(st.litlens, got_ll), e
        assert np.array_equal(st.dists, d0[d_maps[e]]), e


@pytest.mark.parametrize("n", [32, 288])
def test_entropy_vs_oracle(rng, n):
    hs = _hists(rng, n, 30)
    got = np.asarray(cm.calculate_entropy(jnp.asarray(np.stack(hs),
                                                      jnp.int32)))
    for h, g in zip(hs, got):
        want = entropy.calculate_entropy(h).astype(np.float32)
        assert np.allclose(want, g, atol=2e-5)
