"""Huffman construction: optimality, Kraft validity, reference conventions."""

import itertools

import numpy as np
import pytest

from zopfli_tpu import entropy


def kraft_sum(lengths):
    return sum(2.0 ** -l for l in lengths if l > 0)


def brute_force_best(freqs, maxbits):
    """Exhaustive optimal length-limited cost for tiny alphabets."""
    used = [i for i, f in enumerate(freqs) if f > 0]
    n = len(used)
    best = None
    for lens in itertools.product(range(1, maxbits + 1), repeat=n):
        if kraft_sum(lens) <= 1.0 + 1e-12:
            cost = sum(freqs[used[i]] * lens[i] for i in range(n))
            if best is None or cost < best:
                best = cost
    return best


@pytest.mark.parametrize("freqs,maxbits", [
    ([1, 1, 1, 1], 2),
    ([1, 2, 3, 4], 3),
    ([1, 1, 5, 5, 10], 3),
    ([13, 1, 1, 1, 1], 4),
    ([5, 5, 5, 5, 5], 3),
    ([1, 100], 15),
    ([8, 4, 2, 1, 1], 3),
    ([0, 7, 0, 3, 0, 1], 3),
])
def test_optimal_vs_brute_force(freqs, maxbits):
    lens = entropy.length_limited_code_lengths(freqs, maxbits)
    used = np.array(freqs) > 0
    assert (lens[~used] == 0).all()
    assert (lens[used] >= 1).all() and (lens[used] <= maxbits).all()
    # A valid prefix code exists (Kraft) ...
    assert kraft_sum(lens) <= 1.0 + 1e-12
    # ... and the total cost is optimal.
    cost = int((np.array(freqs) * lens).sum())
    assert cost == brute_force_best(freqs, maxbits)


def test_special_cases():
    assert (entropy.length_limited_code_lengths([0, 0, 0], 15) == 0).all()
    lens = entropy.length_limited_code_lengths([0, 5, 0], 15)
    assert list(lens) == [0, 1, 0]
    lens = entropy.length_limited_code_lengths([3, 0, 7], 15)
    assert list(lens) == [1, 0, 1]


def test_matches_unrestricted_huffman_when_deep():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(3, 30))
        freqs = rng.integers(0, 1000, n)
        if (freqs > 0).sum() < 3:
            continue
        lens = entropy.length_limited_code_lengths(freqs, 15)
        # Compare total cost against plain heapq Huffman; valid whenever
        # the unrestricted tree happens to fit in 15 bits.
        import heapq
        items = [(int(f), [i]) for i, f in enumerate(freqs) if f > 0]
        heap = [(f, j, leaves) for j, (f, leaves) in enumerate(items)]
        heapq.heapify(heap)
        j = len(heap)
        lensum = np.zeros(n, dtype=int)
        while len(heap) > 1:
            f1, _, l1 = heapq.heappop(heap)
            f2, _, l2 = heapq.heappop(heap)
            for x in l1 + l2:
                lensum[x] += 1
            heapq.heappush(heap, (f1 + f2, j, l1 + l2))
            j += 1
        if lensum.max() <= 15:
            assert int((freqs * lens).sum()) == int((freqs * lensum).sum())


def test_lengths_to_symbols_rfc_example():
    # RFC 1951 3.2.2 worked example: lengths (3,3,3,3,3,2,4,4) ->
    # codes 010,011,100,101,110,00,1110,1111.
    lens = [3, 3, 3, 3, 3, 2, 4, 4]
    syms = entropy.lengths_to_symbols(lens, 4)
    assert list(syms) == [0b010, 0b011, 0b100, 0b101, 0b110, 0b00,
                          0b1110, 0b1111]


def test_lengths_to_symbols_prefix_free():
    rng = np.random.default_rng(3)
    for _ in range(10):
        freqs = rng.integers(0, 50, 19)
        lens = entropy.length_limited_code_lengths(freqs, 7)
        syms = entropy.lengths_to_symbols(lens, 7)
        codes = [(format(int(s), "b").zfill(int(l)))
                 for s, l in zip(syms, lens) if l > 0]
        for a, b in itertools.permutations(codes, 2):
            assert not b.startswith(a) or a == b


def test_calculate_entropy_conventions():
    # All-zero histogram -> log2(n) everywhere.
    bl = entropy.calculate_entropy(np.zeros(4))
    assert np.allclose(bl, 2.0)
    # Zero count costed as count 1.
    bl = entropy.calculate_entropy([2, 2, 0])
    assert np.isclose(bl[2], np.log2(4))
    assert np.isclose(bl[0], 1.0)
    # Never negative.
    bl = entropy.calculate_entropy([7])
    assert (bl >= 0).all()
