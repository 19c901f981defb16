"""Native C++ edit-ops library (builds lazily via make)."""

import pytest

from cor_asv_ann_tpu.lib import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='native library not buildable')


def test_lev_distance():
    assert native.lev_distance('kitten', 'sitting') == 3
    assert native.lev_distance('', 'abc') == 3
    assert native.lev_distance('abc', 'abc') == 0
    assert native.lev_distance('Straße', 'Strasse') == 2


def test_lev_distance_batch():
    pairs = [('kitten', 'sitting'), ('abc', 'abc'), ('', 'xy')]
    assert native.lev_distance_batch(pairs) == [3, 0, 2]


def test_lev_matches_python():
    from cor_asv_ann_tpu.lib.alignment import _levenshtein
    cases = [('Der Hvnd', 'Der Hund'), ('aͤb', 'äb'), ('x' * 50, 'y' * 30)]
    for a, b in cases:
        assert native.lev_distance(a, b) == _levenshtein(a, b)


def test_nw_align_pairs():
    pairs = native.nw_align('abcd', 'abxd')
    assert pairs == [('a', 'a'), ('b', 'b'), ('c', 'x'), ('d', 'd')]
    pairs = native.nw_align('abd', 'abcd')
    assert (0, 'c') in pairs
    # distance along the path equals Levenshtein
    dist = sum(1 for s, t in native.nw_align('kitten', 'sitting')
               if s != t)
    assert dist == 3
