"""Alignment & metrics library semantics."""

import math


from cor_asv_ann_tpu.lib.alignment import (
    Alignment, Edits, splitwords, L1_HISTLAT_EQV, L2_HISTLAT_EQV)


def test_best_alignment_basic():
    a = Alignment()
    a.set_seqs("abcd", "abxd")
    pairs = a.get_best_alignment()
    assert pairs == [('a', 'a'), ('b', 'b'), ('c', 'x'), ('d', 'd')]


def test_best_alignment_gap():
    a = Alignment()
    a.set_seqs("abd", "abcd")
    pairs = a.get_best_alignment()
    assert pairs == [('a', 'a'), ('b', 'b'), (0, 'c'), ('d', 'd')]
    a.set_seqs("abcd", "abd")
    pairs = a.get_best_alignment()
    assert pairs == [('a', 'a'), ('b', 'b'), ('c', 0), ('d', 'd')]


def test_replace_unequal_lengths():
    a = Alignment()
    a.set_seqs("xABy", "xCy")
    pairs = a.get_best_alignment()
    # substitution + deletion tail
    assert pairs == [('x', 'x'), ('A', 'C'), ('B', 0), ('y', 'y')]


def test_grapheme_recombination():
    a = Alignment()
    # combining diaeresis attaches to the preceding base letter
    pairs = Alignment.best_alignment("äb", "äb")
    syms = [p[0] for p in pairs]
    assert "ä" in syms


def test_adjusted_distance_identity():
    a = Alignment()
    dist, length = a.get_adjusted_distance("abc", "abc")
    assert dist == 0 and length == 3


def test_adjusted_distance_historic_latin_level1():
    a = Alignment()
    # long s counts as equal to s at GT level 1
    dist, _ = a.get_adjusted_distance("Waſſer", "Wasser",
                                      normalization='historic_latin',
                                      gtlevel=1)
    assert dist == 0
    # but not at level 2
    dist2, _ = a.get_adjusted_distance("Waſſer", "Wasser",
                                       normalization='historic_latin',
                                       gtlevel=2)
    assert dist2 == 2


def test_adjusted_distance_ligature_level2():
    a = Alignment()
    # fi ligature is replaced below level 3 on both sides
    dist, _ = a.get_adjusted_distance("ﬁnden", "finden",
                                      normalization='historic_latin',
                                      gtlevel=2)
    assert dist == 0
    dist3, _ = a.get_adjusted_distance("ﬁnden", "finden",
                                       normalization='historic_latin',
                                       gtlevel=3)
    assert dist3 > 0


def test_adjusted_distance_wordlists():
    a = Alignment()
    dist, length = a.get_adjusted_distance(
        ["der", "hund"], ["der", "hunt"], normalization='NFC')
    assert dist == 1 and length == 2


def test_levenshtein():
    dist, length = Alignment.get_levenshtein_distance("kitten", "sitting")
    assert dist == 3 and length == 7


def test_confusion_counting():
    a = Alignment(confusion=True)
    for _ in range(3):
        a.set_seqs("abc\n", "axc\n")
        a.get_best_alignment()
    table, total = a.get_confusion(5)
    assert total == 12
    assert table[0].pair == ('b', 'x') and table[0].count == 3


def test_is_bad():
    a = Alignment()
    a.set_seqs("completely different text", "zzzzqqqq")
    assert a.is_bad()
    a.set_seqs("abc", "xyz")
    assert not a.is_bad()  # too short to judge


def test_edits_streaming_mean_variance():
    e = Edits()
    rates = [(2, 10), (0, 5), (1, 4)]
    for dist, length in rates:
        e.add(dist, length, 'x' * length, 'y' * length)
    total_len = sum(l for _, l in rates)
    exp_mean = sum(d for d, _ in rates) / total_len
    assert math.isclose(e.mean, exp_mean, rel_tol=1e-9)
    assert e.length == total_len and e.steps == 3


def test_edits_merge_equals_sequential():
    e1, e2, both = Edits(), Edits(), Edits()
    data = [(2, 10), (0, 5), (1, 4), (3, 9)]
    for d, l in data[:2]:
        e1.add(d, l, '', '')
        both.add(d, l, '', '')
    for d, l in data[2:]:
        e2.add(d, l, '', '')
        both.add(d, l, '', '')
    e1.merge(e2)
    assert math.isclose(e1.mean, both.mean, rel_tol=1e-9)
    assert math.isclose(e1.varia, both.varia, rel_tol=1e-9)
    assert e1.length == both.length


def test_edits_worst_tracking():
    e = Edits()
    e.add(9, 10, '', '', name='bad')
    e.add(0, 10, '', '', name='good')
    assert e.worst[0].name == 'bad'


def test_splitwords():
    words = splitwords("Der Hund, die Katze; und das Pferd.\n")
    assert words == ["Der", "Hund", "die", "Katze", "und", "das", "Pferd"]


def test_splitwords_apostrophe():
    assert "geht's" in splitwords("geht's gut") or \
        ["geht", "s"] == splitwords("geht's gut")[:2]


def test_tables_shape():
    assert any("ſ" in s for s in L1_HISTLAT_EQV)
    assert L2_HISTLAT_EQV["ﬁ"] == "fi"


def test_simple_words_uax29_known_answers():
    """The uniseg-free fallback tokenizer must reproduce UAX-29 word
    boundaries on the medial-punctuation cases that occur in historic
    text (WB6/7 MidLetter, WB11/12 MidNum, MidNumLet; compared against
    real `uniseg` output where that package is installed)."""
    from cor_asv_ann_tpu.lib.alignment import _simple_words, splitwords
    cases = {
        "don't stop": ["don't", ' ', 'stop'],
        "don’t": ["don’t"],
        '3.14': ['3.14'],
        '1,000 Taler': ['1,000', ' ', 'Taler'],
        'a:b': ['a:b'],          # Swedish abbreviation colon (MidLetter)
        'Ende.': ['Ende', '.'],  # trailing period breaks
        'Haus, Hof': ['Haus', ',', ' ', 'Hof'],
        'e.g. so': ['e.g', '.', ' ', 'so'],
        'ſchoͤn gut': ['ſchoͤn', ' ', 'gut'],  # combining marks stay
    }
    for text, want in cases.items():
        assert _simple_words(text) == want, text
    # splitwords drops whitespace/punctuation-only tokens
    assert splitwords("don't stop, 3.14!") == ["don't", 'stop', '3.14']
    try:
        import uniseg.wordbreak
    except ImportError:
        return
    for text in cases:
        assert _simple_words(text) == list(uniseg.wordbreak.words(text)), \
            text
