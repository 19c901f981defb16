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
