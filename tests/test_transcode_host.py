"""Host-side transcode machinery: PAGE parsing, sequences, Viterbi,
whitespace-preserving updates, resegmentation, higher-level consistency.
No model required."""

import numpy as np
import pytest

from cor_asv_ann_tpu.utils import page as P
from cor_asv_ann_tpu.wrapper import transcode as TC


def build_doc(words_per_line=(("Der", "Hund"), ("liegt",))):
    doc = P.new_page()
    region = P.add_region(doc, 'r1', points=[(0, 0), (100, 0), (100, 50),
                                             (0, 50)])
    for li, words in enumerate(words_per_line):
        line = P.add_line(region, f'l{li + 1}',
                          points=[(0, li * 20), (100, li * 20),
                                  (100, li * 20 + 18), (0, li * 20 + 18)])
        x = 0
        for wi, wtext in enumerate(words):
            w = 10 * len(wtext)
            word = P.add_word(line, f'l{li + 1}_w{wi + 1}',
                              points=[(x, li * 20), (x + w, li * 20),
                                      (x + w, li * 20 + 18),
                                      (x, li * 20 + 18)])
            for gi, ch in enumerate(wtext):
                glyph = P.add_glyph(word, f'l{li + 1}_w{wi + 1}_g{gi + 1}',
                                    points=[(x + gi * 10, li * 20),
                                            (x + gi * 10 + 9, li * 20 + 18)])
                glyph.add_textequiv(ch, conf=0.9)
            word.add_textequiv(wtext, conf=0.9)
            x += w + 5
        line.add_textequiv(' '.join(words), conf=0.9)
    return doc


def test_roundtrip_serialization(tmp_path):
    doc = build_doc()
    path = str(tmp_path / 'page.xml')
    doc.save(path)
    doc2 = P.parse_page(path)
    lines = doc2.get_lines()
    assert [l.id for l in lines] == ['l1', 'l2']
    assert lines[0].get_text() == 'Der Hund'


@pytest.mark.parametrize('level,expected', [
    ('line', ['Der Hund\n', 'liegt\n']),
    ('word', ['Der Hund\n', 'liegt\n']),
    ('glyph', ['Der Hund\n', 'liegt\n']),
])
def test_line_sequences(level, expected):
    doc = build_doc()
    seqs = TC._page_get_line_sequences_at(level, doc)
    texts = [''.join(tes[0].unicode for tes in seq) for seq in seqs]
    assert texts == expected
    # artificial whitespace entries carry index -1
    for seq in seqs:
        for tes in seq:
            if tes[0].unicode in (' ', '\n'):
                assert tes[0].index == -1


def test_confmat_conversion():
    doc = build_doc()
    seqs = TC._page_get_line_sequences_at('word', doc)
    mapping = {c: i for i, c in enumerate(' \nDerHundligt', 1)}
    input_lines, starts = TC._line_sequences2confmat_sequences(mapping, seqs)
    assert ''.join(c[0][0] for c in input_lines[0]) == 'Der Hund\n'
    # position map points at the right chunks
    assert 0 in starts[0] and 3 in starts[0] and 4 in starts[0]


def test_alignment2path_identity():
    # perfect diagonal soft alignment -> identity path
    n = 6
    alignment = [np.eye(n)[j] for j in range(n)]
    path, dist = TC._alignment2path(alignment, n, n, 0.01)
    assert path[0] == 0 and path[n] == n
    for i in range(n):
        assert path[i] == i
    assert dist < 1e-6


def test_alignment2path_deletion():
    # output one char shorter: input position 2 deleted
    align = np.zeros((5, 6), np.float32)
    src_for_out = [0, 1, 3, 4, 5]
    for j, i in enumerate(src_for_out):
        align[j, i] = 1.0
    path, dist = TC._alignment2path(list(align), 6, 5, 0.01)
    assert path[6] == 5 and path[0] == 0


def test_update_sequence_simple_substitution():
    doc = build_doc()
    seqs = TC._page_get_line_sequences_at('word', doc)
    mapping = {}
    input_lines, starts = TC._line_sequences2confmat_sequences({}, seqs)
    line0 = input_lines[0]
    output = 'Der Hund\n'.replace('u', 'o')  # 'Der Hond\n'
    n = len(output)
    realignment = {i: i for i in range(n + 1)}
    probs = [0.8] * n
    line, seq = TC._update_sequence(line0, output, probs, 0.1, realignment,
                                    starts[0], None)
    assert line.id == 'l1'
    texts = [te.unicode for te in seq]
    assert texts == ['Der', ' ', 'Hond', '\n']
    # conf was rewritten from output probabilities
    real = [te for te in seq if te.index != -1]
    assert all(abs(te.conf - 0.8) < 1e-6 for te in real)


def test_update_sequence_whitespace_push():
    """Non-whitespace output landing on a whitespace element is pushed to
    the neighbor (reference transcode.py:437-475)."""
    doc = build_doc()
    seqs = TC._page_get_line_sequences_at('word', doc)
    input_lines, starts = TC._line_sequences2confmat_sequences({}, seqs)
    # 'Der Hund\n' -> 'Ders Hund\n': the 's' is inserted at the space
    output = 'Ders Hund\n'
    realignment = {0: 0, 3: 3, 4: 5, 8: 9, 9: 10}
    probs = [0.9] * len(output)
    _, seq = TC._update_sequence(input_lines[0], output, probs, 0.1,
                                 realignment, starts[0], None)
    texts = [te.unicode for te in seq]
    assert texts == ['Ders', ' ', 'Hund', '\n']


def test_resegment_merge():
    """Deleted whitespace merges the adjacent words."""
    doc = build_doc()
    seqs = TC._page_get_line_sequences_at('word', doc)
    input_lines, starts = TC._line_sequences2confmat_sequences({}, seqs)
    output = 'DerHund\n'
    realignment = {0: 0, 3: 3, 4: 3, 8: 7, 9: 8}
    probs = [0.9] * len(output)
    _, seq = TC._update_sequence(input_lines[0], output, probs, 0.1,
                                 realignment, starts[0], None)
    assert [te.unicode for te in seq] == ['Der', '', 'Hund', '\n']
    TC._resegment_sequence(seq, 'word')
    line = doc.get_lines()[0]
    words = line.get_words()
    assert len(words) == 1
    assert words[0].get_text() == 'DerHund'


def test_resegment_split():
    """Introduced whitespace splits the word proportionally."""
    doc = build_doc((("DerHund",),))
    seqs = TC._page_get_line_sequences_at('word', doc)
    input_lines, starts = TC._line_sequences2confmat_sequences({}, seqs)
    output = 'Der Hund\n'
    realignment = {0: 0, 7: 8, 8: 9}
    probs = [0.9] * len(output)
    _, seq = TC._update_sequence(input_lines[0], output, probs, 0.1,
                                 realignment, starts[0], None)
    assert [te.unicode for te in seq] == ['Der Hund', '\n']
    TC._resegment_sequence(seq, 'word')
    line = doc.get_lines()[0]
    words = line.get_words()
    assert [w.get_text() for w in words] == ['Der', 'Hund']
    # proportional bbox split
    b0 = P.points_bbox(words[0].get_points())
    b1 = P.points_bbox(words[1].get_points())
    assert b0[2] <= b1[0] + 1


def test_update_higher_levels():
    doc = build_doc()
    line = doc.get_lines()[0]
    words = line.get_words()
    words[0].set_text('Das')
    TC.page_update_higher_textequiv_levels('word', doc)
    assert doc.get_lines()[0].get_text() == 'Das Hund'
    region = doc.get_regions()[0]
    assert region.get_text() == 'Das Hund\nliegt'


def test_remove_lower_levels():
    doc = build_doc()
    TC.page_remove_lower_textequiv_levels('line', doc)
    assert doc.get_lines()[0].get_words() == []


def test_workspace_roundtrip(tmp_path):
    from cor_asv_ann_tpu.utils.workspace import make_workspace, Workspace
    ws = make_workspace(str(tmp_path / 'ws'), ['page1', 'page2'])
    doc = build_doc()
    ws.add_file('OCR', 'page1', doc.to_bytes())
    ws.add_file('OCR', 'page2', doc.to_bytes())
    ws.save()
    ws2 = Workspace(str(tmp_path / 'ws'))
    assert ws2.file_groups() == ['OCR']
    assert ws2.page_ids() == ['page1', 'page2']
    files = ws2.page_files('OCR')
    assert set(files) == {'page1', 'page2'}
    doc2 = P.parse_page(files['page1'].path)
    assert doc2.get_lines()[0].get_text() == 'Der Hund'


def test_update_higher_levels_nested_regions():
    """A parent region's text must concatenate its subregions' FRESH
    texts (children-first traversal), sorted by ReadingOrder when the
    subregions appear there as ordered groups."""
    import xml.etree.ElementTree as ET
    doc = P.new_page()
    ns = doc.ns
    ro = ET.SubElement(doc.page.elem, '{%s}ReadingOrder' % ns)
    og = ET.SubElement(ro, '{%s}OrderedGroup' % ns)
    og.set('id', 'g0')
    for i, rid in enumerate(['ra', 'rb']):
        # subregions registered as ordered groups (the recursive-region
        # pattern the reference sorts by; plain RegionRefIndexed entries
        # keep XML order there, faithfully)
        sub_g = ET.SubElement(og, '{%s}OrderedGroupIndexed' % ns)
        sub_g.set('index', str(i))
        sub_g.set('id', 'g_' + rid)
        sub_g.set('regionRef', rid)
    parent = P.add_region(doc, 'rp')
    # XML order rb, ra — ReadingOrder says ra first
    for rid, text in (('rb', 'zwei'), ('ra', 'eins')):
        e = ET.SubElement(parent.elem, '{%s}TextRegion' % ns)
        e.set('id', rid)
        sub = P.PageElement(e, doc, parent)
        line = P.add_line(sub, rid + '_l1')
        line.add_textequiv(text, conf=0.9)
    TC.page_update_higher_textequiv_levels('line', doc)
    by_id = {r.id: r for r in doc.get_regions(order=False)}
    assert by_id['ra'].get_text() == 'eins'
    assert by_id['rb'].get_text() == 'zwei'
    # children-first: parent sees the fresh subregion texts, in
    # ReadingOrder (ra before rb despite XML order)
    assert by_id['rp'].get_text() == 'eins\nzwei'


def test_baseline_after_coords():
    """The PAGE schema sequence requires Coords before Baseline."""
    doc = P.new_page()
    region = P.add_region(doc, 'r1')
    line = P.add_line(region, 'l1', points=[(0, 0), (10, 10)],
                      baseline=[(0, 8), (10, 8)])
    tags = [t.split('}')[-1] for t in
            (e.tag for e in line.elem)]
    assert tags.index('Coords') < tags.index('Baseline')
