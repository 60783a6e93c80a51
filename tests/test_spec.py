"""Spec tables vs RFC 1951 section 3.2.5."""

import numpy as np

from zopfli_tpu import spec


def test_length_symbol_boundaries():
    # Spot values straight from the RFC table.
    assert spec.LENGTH_SYMBOL[3] == 257
    assert spec.LENGTH_SYMBOL[10] == 264
    assert spec.LENGTH_SYMBOL[11] == 265
    assert spec.LENGTH_SYMBOL[12] == 265
    assert spec.LENGTH_SYMBOL[13] == 266
    assert spec.LENGTH_SYMBOL[114] == 279
    assert spec.LENGTH_SYMBOL[115] == 280
    assert spec.LENGTH_SYMBOL[130] == 280
    assert spec.LENGTH_SYMBOL[131] == 281
    assert spec.LENGTH_SYMBOL[257] == 284
    assert spec.LENGTH_SYMBOL[258] == 285


def test_length_extra_bits():
    assert spec.LENGTH_EXTRA_BITS[3] == 0
    assert spec.LENGTH_EXTRA_BITS[10] == 0
    assert spec.LENGTH_EXTRA_BITS[11] == 1
    assert spec.LENGTH_EXTRA_BITS[18] == 1
    assert spec.LENGTH_EXTRA_BITS[19] == 2
    assert spec.LENGTH_EXTRA_BITS[34] == 2
    assert spec.LENGTH_EXTRA_BITS[35] == 3
    assert spec.LENGTH_EXTRA_BITS[66] == 3
    assert spec.LENGTH_EXTRA_BITS[67] == 4
    assert spec.LENGTH_EXTRA_BITS[130] == 4
    assert spec.LENGTH_EXTRA_BITS[131] == 5
    assert spec.LENGTH_EXTRA_BITS[257] == 5
    assert spec.LENGTH_EXTRA_BITS[258] == 0


def test_length_extra_value_reconstructs_length():
    # base(symbol) + extra_value == length for all lengths.
    for l in range(3, 259):
        s = spec.LENGTH_SYMBOL[l]
        eb = spec.LENGTH_EXTRA_BITS[l]
        v = spec.LENGTH_EXTRA_VALUE[l]
        assert 0 <= v < (1 << eb) or (eb == 0 and v == 0)
        assert spec.LENGTH_SYMBOL_EXTRA_BITS[s - 257] == eb


def test_dist_symbol_boundaries():
    cases = {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 4, 7: 5, 8: 5, 9: 6, 12: 6,
             13: 7, 16: 7, 17: 8, 24: 8, 25: 9, 32: 9, 33: 10, 48: 10,
             49: 11, 64: 11, 65: 12, 97: 13, 129: 14, 193: 15, 256: 15,
             257: 16, 385: 17, 513: 18, 769: 19, 1025: 20, 1537: 21,
             2049: 22, 3073: 23, 4097: 24, 6145: 25, 8193: 26, 12289: 27,
             16385: 28, 24577: 29, 32768: 29}
    d = np.array(sorted(cases))
    got = spec.dist_symbol(d)
    want = np.array([cases[int(x)] for x in d])
    assert np.array_equal(got, want)


def test_dist_extra_bits_and_value():
    for dist in [1, 4, 5, 8, 9, 16, 100, 1024, 1025, 32768]:
        s = int(spec.dist_symbol(dist))
        eb = int(spec.dist_extra_bits(dist))
        v = int(spec.dist_extra_value(dist))
        assert eb == spec.DIST_SYM_EXTRA_BITS[s]
        assert spec.DIST_SYM_BASE[s] + v == dist
        assert 0 <= v < max(1 << eb, 1)


def test_dist_sym_base_covers_range():
    # Symbol s covers [base[s], base[s] + 2^eb - 1]; ranges tile 1..32768.
    assert spec.DIST_SYM_BASE[0] == 1
    for s in range(29):
        span = 1 << spec.DIST_SYM_EXTRA_BITS[s]
        assert spec.DIST_SYM_BASE[s] + span == spec.DIST_SYM_BASE[s + 1]
    assert (spec.DIST_SYM_BASE[29] + (1 << spec.DIST_SYM_EXTRA_BITS[29])
            == 32769)


def test_fixed_tree():
    ll, d = spec.fixed_tree_lengths()
    assert list(ll[:144]) == [8] * 144
    assert list(ll[144:256]) == [9] * 112
    assert list(ll[256:280]) == [7] * 24
    assert list(ll[280:288]) == [8] * 8
    assert list(d) == [5] * 32
