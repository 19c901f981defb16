"""Fuzz the whitespace-preserving TextEquiv rewrite + resegmentation.

Random word-structured lines receive random character edits
(substitutions/insertions/deletions incl. whitespace changes); the hard
alignment path comes from the string aligner (the same fallback the
reference offers, transcode.py:351-375). Invariants checked:

- _update_sequence never trips its internal consistency assertions,
- whitespace elements keep only whitespace, real elements never start or
  end with whitespace,
- after resegmentation + higher-level update, word texts joined by
  single spaces equal the line text (the reference suite's core
  consistency check, test_all.py:85-99).
"""

import numpy as np
import pytest

from cor_asv_ann_tpu.utils import page as P
from cor_asv_ann_tpu.wrapper import transcode as TC


def random_line_doc(rng):
    doc = P.new_page()
    region = P.add_region(doc, 'r1')
    line = P.add_line(region, 'l1', points=[(0, 0), (400, 18)])
    x = 0
    nwords = rng.integers(1, 5)
    for j in range(nwords):
        n = rng.integers(1, 6)
        wtext = ''.join(rng.choice(list('abcdef'), n))
        w = P.add_word(line, f'w{j}', points=[(x, 0), (x + 10 * n, 18)])
        w.add_textequiv(wtext, conf=0.9)
        x += 10 * n + 5
    line.add_textequiv(
        ' '.join(w.get_text() for w in line.get_words()), conf=0.9)
    return doc


def random_edit(rng, text):
    """Random output line: edit chars of `text` (keeping the newline)."""
    body = list(text[:-1])
    out = []
    for ch in body:
        r = rng.random()
        if r < 0.08:
            continue  # delete (possibly whitespace -> merge)
        if r < 0.16:
            out.append(rng.choice(list('abcdef ')))  # substitute
        else:
            out.append(ch)
        if rng.random() < 0.06:
            out.append(rng.choice(list('abcdef ')))  # insert
    # collapse runs of spaces (the model would rarely emit them, and the
    # whitespace rules assume single separators like the reference data)
    s = ''.join(out)
    while '  ' in s:
        s = s.replace('  ', ' ')
    s = s.strip(' ')
    if not s:
        s = 'a'
    return s + '\n'


@pytest.mark.parametrize('seed', range(8))
def test_fuzz_update_and_resegment(seed):
    rng = np.random.default_rng(seed)
    for trial in range(40):
        doc = random_line_doc(rng)
        seqs = TC._page_get_line_sequences_at('word', doc)
        input_lines, starts = TC._line_sequences2confmat_sequences({}, seqs)
        input_text = ''.join(c[0][0] for c in input_lines[0])
        output = random_edit(rng, input_text)
        realignment, _ = TC._alignment_path(input_text, output)
        probs = [0.9] * len(output)
        line, seq = TC._update_sequence(
            input_lines[0], output, probs, 0.1, realignment, starts[0],
            None)
        for te in seq:
            if te.index == -1:
                assert not te.unicode.split(), \
                    (trial, input_text, output, te.unicode)
            else:
                assert te.unicode == te.unicode.strip(' '), \
                    (trial, input_text, output, te.unicode)
        TC._resegment_sequence(seq, 'word')
        TC.page_update_higher_textequiv_levels('word', doc)
        line = doc.get_lines()[0]
        words = line.get_words()
        joined = ' '.join(w.get_text() or '' for w in words)
        assert joined == line.get_text(), \
            (trial, input_text, output, joined, line.get_text())


def random_glyph_doc(rng):
    doc = P.new_page()
    region = P.add_region(doc, 'r1')
    line = P.add_line(region, 'l1', points=[(0, 0), (400, 18)])
    x = 0
    for j in range(rng.integers(1, 4)):
        n = rng.integers(1, 5)
        wtext = ''.join(rng.choice(list('abcd'), n))
        w = P.add_word(line, f'w{j}', points=[(x, 0), (x + 10 * n, 18)])
        for gi, ch in enumerate(wtext):
            g = P.add_glyph(w, f'w{j}_g{gi}',
                            points=[(x + gi * 10, 0),
                                    (x + gi * 10 + 9, 18)])
            g.add_textequiv(ch, conf=0.9)
        w.add_textequiv(wtext, conf=0.9)
        x += 10 * n + 5
    line.add_textequiv(
        ' '.join(w.get_text() for w in line.get_words()), conf=0.9)
    return doc


@pytest.mark.parametrize('seed', range(4))
def test_fuzz_glyph_level(seed):
    rng = np.random.default_rng(100 + seed)
    for trial in range(30):
        doc = random_glyph_doc(rng)
        seqs = TC._page_get_line_sequences_at('glyph', doc)
        input_lines, starts = TC._line_sequences2confmat_sequences({}, seqs)
        input_text = ''.join(c[0][0] for c in input_lines[0])
        output = random_edit(rng, input_text)
        realignment, _ = TC._alignment_path(input_text, output)
        probs = [0.9] * len(output)
        line, seq = TC._update_sequence(
            input_lines[0], output, probs, 0.1, realignment, starts[0],
            None)
        TC._resegment_sequence(seq, 'glyph')
        TC.page_update_higher_textequiv_levels('glyph', doc)
        line = doc.get_lines()[0]
        words = line.get_words()
        joined = ' '.join(w.get_text() or '' for w in words)
        assert joined == line.get_text(), \
            (trial, input_text, output, joined, line.get_text())


@pytest.mark.parametrize('seed', range(4))
def test_fuzz_viterbi_path(seed):
    """Viterbi over random soft alignments: path is a monotone surjection
    onto the endpoints."""
    rng = np.random.default_rng(200 + seed)
    for trial in range(30):
        i_max = int(rng.integers(2, 30))
        j_max = int(rng.integers(2, 30))
        soft = rng.uniform(0, 1, (j_max, i_max)).astype(np.float32)
        soft /= soft.sum(axis=1, keepdims=True)
        path, dist = TC._alignment2path(list(soft), i_max, j_max, 0.01)
        assert path[0] == 0 and path[i_max] == j_max
        keys = sorted(k for k in path if 0 <= k <= i_max)
        vals = [path[k] for k in keys]
        assert all(b >= a for a, b in zip(vals, vals[1:])), \
            (trial, path)
        assert all(0 <= v <= j_max for v in vals)
