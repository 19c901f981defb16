"""Evaluate / join / align / mark processors over a synthetic workspace."""


import pytest

from cor_asv_ann_tpu.utils import page as P
from cor_asv_ann_tpu.utils.workspace import Workspace, make_workspace
from cor_asv_ann_tpu.wrapper.align import AlignLines
from cor_asv_ann_tpu.wrapper.evaluate import EvaluateLines, page_get_lines
from cor_asv_ann_tpu.wrapper.join import JoinLines
from cor_asv_ann_tpu.wrapper.mark import MarkWords


def make_doc(line_texts, conf=0.9, with_words=True):
    doc = P.new_page()
    region = P.add_region(doc, 'r1')
    for i, text in enumerate(line_texts):
        line = P.add_line(region, f'l{i + 1}',
                          points=[(0, i * 20), (100, i * 20 + 18)],
                          baseline=[(0, i * 20 + 15), (100, i * 20 + 15)])
        if with_words:
            x = 0
            for j, wtext in enumerate(text.split(' ')):
                w = P.add_word(line, f'l{i + 1}_w{j + 1}',
                               points=[(x, i * 20), (x + 10 * len(wtext),
                                                     i * 20 + 18)])
                w.add_textequiv(wtext, conf=conf)
                x += 10 * len(wtext) + 5
        line.add_textequiv(text, conf=conf)
    return doc


@pytest.fixture
def ws3(tmp_path):
    """Workspace with GT + two OCR fileGrps over 2 pages."""
    ws = make_workspace(str(tmp_path / 'ws'), ['p1', 'p2'])
    gt = [["Der Hund liegt", "im Garten"], ["Die Katze sitzt"]]
    ocr1 = [["Der Hvnd liegt", "im Garten"], ["Die Katzc sitzt"]]
    ocr2 = [["Der Hund liegt", "irn Garten"], ["Die Katze sitzt"]]
    for grp, pages in (('GT', gt), ('OCR1', ocr1), ('OCR2', ocr2)):
        for pid, texts in zip(['p1', 'p2'], pages):
            ws.add_file(grp, pid, make_doc(texts).to_bytes())
    ws.save()
    return ws


def test_page_get_lines_match_modes(ws3):
    doc = P.parse_page(ws3.page_files('GT')['p1'].path)
    by_id = page_get_lines(doc, 'id')
    assert by_id == {'l1': 'Der Hund liegt', 'l2': 'im Garten'}
    by_coords = page_get_lines(doc, 'coords')
    assert len(by_coords) == 2
    by_baseline = page_get_lines(doc, 'baseline')
    assert len(by_baseline) == 2


def test_evaluate(ws3):
    proc = EvaluateLines(parameter={'match_on': 'id', 'metric': 'NFC',
                                    'confusion': 5, 'histogram': True})
    proc.process_workspace(ws3, ['GT', 'OCR1', 'OCR2'], 'EVAL')
    report = proc.report
    pair1 = 'OCR1,GT'
    assert pair1 in report
    # OCR1 has 2 wrong chars out of (14+9+15)=38 alignment positions
    assert 0 < report[pair1]['char-error-rate-mean'] < 0.2
    assert report[pair1]['num-lines'] == 3
    # per-page and document reports are in the workspace
    files = ws3.files(group='EVAL')
    assert len(files) >= 3
    doc_report = [f for f in files if f.page_id is None]
    assert doc_report


def test_evaluate_requires_multiple_groups(ws3):
    from cor_asv_ann_tpu.wrapper.base import ParameterError
    proc = EvaluateLines(parameter={'match_on': 'id'})
    with pytest.raises(ParameterError, match='multiple input fileGrps'):
        proc.process_workspace(ws3, ['GT'], 'EVAL2')
    proc = EvaluateLines(parameter={'match_on': 'index'})
    with pytest.raises(ParameterError, match='only 1 input fileGrp'):
        proc.process_workspace(ws3, ['GT', 'OCR1'], 'EVAL2')
    # the fast metric never feeds the confusion aligners: reject upfront
    proc = EvaluateLines(parameter={'match_on': 'id', 'confusion': 5,
                                    'metric': 'Levenshtein-fast'})
    with pytest.raises(ParameterError, match='full alignment metric'):
        proc.process_workspace(ws3, ['GT', 'OCR1'], 'EVAL2')


def test_join_and_evaluate_index(ws3):
    proc = JoinLines(parameter={'add-filegrp-index': True})
    proc.process_workspace(ws3, ['GT', 'OCR1', 'OCR2'], 'JOIN')
    doc = P.parse_page(ws3.page_files('JOIN')['p1'].path)
    tes = doc.get_lines()[0].get_textequivs()
    assert len(tes) == 3
    assert [te.index for te in tes] == [0, 1, 2]
    assert tes[0].unicode == 'Der Hund liegt'
    assert tes[1].unicode == 'Der Hvnd liegt'
    # evaluation on the joined annotation must match the multi-fileGrp one
    proc1 = EvaluateLines(parameter={'match_on': 'id', 'metric': 'NFC'})
    proc1.process_workspace(ws3, ['GT', 'OCR1', 'OCR2'], None)
    proc2 = EvaluateLines(parameter={'match_on': 'index', 'metric': 'NFC'})
    proc2.process_workspace(ws3, ['JOIN'], None)
    for i in (1, 2):
        m1 = proc1.report[proc1._pair(i)]['char-error-rate-mean']
        m2 = proc2.report[proc2._pair(i)]['char-error-rate-mean']
        assert abs(m1 - m2) < 1e-9


def test_align_majority(ws3):
    proc = AlignLines(parameter={'method': 'majority'})
    proc.process_workspace(ws3, ['OCR1', 'OCR2', 'GT'], 'ALIGN')
    doc = P.parse_page(ws3.page_files('ALIGN')['p1'].path)
    lines = doc.get_lines()
    # 2 of 3 inputs agree on the correct text everywhere
    assert lines[0].get_text() == 'Der Hund liegt'
    assert lines[1].get_text() == 'im Garten'
    # word segmentation dropped
    assert lines[0].get_words() == []


def test_align_combined(ws3):
    proc = AlignLines(parameter={'method': 'combined'})
    proc.process_workspace(ws3, ['OCR1', 'OCR2', 'GT'], 'ALIGN2')
    doc = P.parse_page(ws3.page_files('ALIGN2')['p2'].path)
    assert doc.get_lines()[0].get_text() == 'Die Katze sitzt'


def test_align_needs_three_for_majority(ws3):
    proc = AlignLines(parameter={'method': 'majority'})
    with pytest.raises(AssertionError):
        proc.process_workspace(ws3, ['OCR1', 'OCR2'], 'ALIGN3')


def test_mark_words(ws3, tmp_path):
    # fake spellchecker: echoes words NOT in its dictionary (like
    # hunspell -w); knows only lowercase German articles + 'Hund'
    script = tmp_path / 'spell.sh'
    script.write_text(
        '#!/bin/sh\nwhile read w; do\n'
        'case "$w" in Der|Die|Hund|im|liegt|sitzt) ;; *) echo "$w";; esac\n'
        'done\n')
    script.chmod(0o755)
    proc = MarkWords(parameter={'command': str(script), 'format': 'OOV'})
    proc.process_workspace(ws3, ['OCR1'], 'MARK')
    doc = P.parse_page(ws3.page_files('MARK')['p1'].path)
    words = doc.get_lines()[0].get_words()
    marks = {w.get_text(): w.get_textequivs()[0].comments for w in words}
    assert marks['Hvnd'] == 'OOV'
    assert marks['Der'] is None
    assert proc.total_nonmatches >= 2  # Hvnd, Garten, Katzc


def test_mark_words_conf_format(ws3, tmp_path):
    script = tmp_path / 'all_oov.sh'
    script.write_text('#!/bin/sh\ncat\n')
    script.chmod(0o755)
    proc = MarkWords(parameter={'command': str(script), 'format': 'conf'})
    proc.process_workspace(ws3, ['OCR2'], 'MARK2')
    doc = P.parse_page(ws3.page_files('MARK2')['p1'].path)
    word = doc.get_lines()[0].get_words()[0]
    assert abs(word.get_textequivs()[0].conf - 0.123) < 1e-9


@pytest.fixture
def spell_script(tmp_path):
    """Toy hunspell ``-w``-alike: echoes every word NOT in its
    dictionary back, one per line (the documented command contract)."""
    script = tmp_path / 'spell.sh'
    script.write_text(
        '#!/bin/sh\nwhile read w; do\n'
        'case "$w" in Der|Hund|liegt|Garten|Weihnacht) ;; *) echo "$w";; '
        'esac\ndone\n')
    script.chmod(0o755)
    return script


def mark_workspace(tmp_path, line_texts, conf=0.9):
    ws = make_workspace(str(tmp_path / 'wsm'), ['p1'])
    ws.add_file('OCR', 'p1', make_doc(line_texts, conf=conf).to_bytes())
    ws.save()
    return ws


def page_marks(ws, grp):
    doc = P.parse_page(ws.page_files(grp)['p1'].path)
    return {w.get_text(): w.get_textequivs()[0].comments
            for line in doc.get_lines() for w in line.get_words()}


def test_mark_dehyphenation_revert(tmp_path, spell_script):
    """A hyphenated line-final unknown whose join with the next line's
    first word IS known gets its mark reverted, and the continuation
    word stays unmarked (reference mark.py:107-124)."""
    ws = mark_workspace(tmp_path, ['Der Gar-', 'ten liegt'])
    proc = MarkWords(parameter={'command': str(spell_script),
                                'format': 'OOV'})
    proc.process_workspace(ws, ['OCR'], 'MARK')
    marks = page_marks(ws, 'MARK')
    assert marks == {'Der': None, 'Gar-': None, 'ten': None, 'liegt': None}
    assert proc.total_nonmatches == 0


def test_mark_dehyphenation_join_unknown_keeps_marks(tmp_path,
                                                     spell_script):
    """When the joined form is ALSO unknown, both halves stay marked."""
    ws = mark_workspace(tmp_path, ['Der xyz-', 'abc liegt'])
    proc = MarkWords(parameter={'command': str(spell_script),
                                'format': 'OOV'})
    proc.process_workspace(ws, ['OCR'], 'MARK')
    marks = page_marks(ws, 'MARK')
    assert marks['xyz-'] == 'OOV'
    assert marks['abc'] == 'OOV'
    assert proc.total_nonmatches == 2


def test_mark_dehyphenation_pending_survives_known_lines(tmp_path,
                                                         spell_script):
    """The reference quirk, faithfully kept: the pending hyphen
    candidate is only consulted/cleared by a markable UNKNOWN word, so
    it survives an intermediate all-known line and may join with a
    first word several lines later (reference mark.py:107-124)."""
    ws = mark_workspace(tmp_path, ['Weih-', 'Der Hund', 'nacht liegt'])
    proc = MarkWords(parameter={'command': str(spell_script),
                                'format': 'OOV'})
    proc.process_workspace(ws, ['OCR'], 'MARK')
    marks = page_marks(ws, 'MARK')
    assert marks == {'Weih-': None, 'Der': None, 'Hund': None,
                     'nacht': None, 'liegt': None}
    assert proc.total_nonmatches == 0


def test_mark_dehyphenation_conf_revert_removes_attribute(tmp_path,
                                                          spell_script):
    """format=conf marking sets conf=0.123; a join revert on a word
    that never had @conf must REMOVE the attribute (restore None), not
    crash on float(None)."""
    ws = mark_workspace(tmp_path, ['Der Gar-', 'ten liegt'], conf=None)
    proc = MarkWords(parameter={'command': str(spell_script),
                                'format': 'conf'})
    proc.process_workspace(ws, ['OCR'], 'MARK')
    doc = P.parse_page(ws.page_files('MARK')['p1'].path)
    confs = {w.get_text(): w.get_textequivs()[0].conf
             for line in doc.get_lines() for w in line.get_words()}
    assert confs == {'Der': None, 'Gar-': None, 'ten': None,
                     'liegt': None}


def test_align_confidence_gap_does_not_outvote():
    """An alignment gap (empty chunk) must score confidence 0, like the
    reference's avg([]) — never 1.0, which would delete real characters
    under confidence voting."""
    from cor_asv_ann_tpu.lib.alignment import Alignment
    from cor_asv_ann_tpu.wrapper.align import nway_align, vote
    aligner = Alignment()
    chars, confs = nway_align(['cat', 'ct'], [[0.9] * 3, [0.9] * 2],
                              aligner)
    text, conf = vote(chars, confs, 'confidence')
    assert text == 'cat'
    # and the seeded first input's gap slots are 0 too
    for subchars, subconfs in zip(chars, confs):
        for c, p in zip(subchars, subconfs):
            if c == '':
                assert p == 0.0


def test_histlat_l2_precomposed_macrons():
    """The L2 table must key precomposed macron vowels (what NFC input
    contains) with the reference's exact value forms (decomposed
    a+tilde; precomposed n-tilde)."""
    from cor_asv_ann_tpu.lib.alignment import Alignment, L2_HISTLAT_EQV
    assert L2_HISTLAT_EQV['\u0101'] == 'a\u0303'
    assert L2_HISTLAT_EQV['\u0113'] == '\u1ebd'
    assert L2_HISTLAT_EQV['\ue5dc'] == '\u00f1'
    aligner = Alignment()
    dist, _ = aligner.get_adjusted_distance(
        '\u0101', 'a\u0303', normalization='historic_latin', gtlevel=2)
    assert dist == 0
    dist, _ = aligner.get_adjusted_distance(
        '\ue5dc', '\u00f1', normalization='historic_latin', gtlevel=2)
    assert dist == 0
