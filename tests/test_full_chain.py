"""Full processor chain over one workspace (mirror of reference
tests/test_all.py:106-303): process -> align -> evaluate(match_on=id) ->
join -> evaluate(match_on=index) -> mark, asserting the two evaluation
paths produce identical CER means."""

from cor_asv_ann_tpu.utils import page as P
from cor_asv_ann_tpu.utils.workspace import make_workspace
from cor_asv_ann_tpu.wrapper.align import AlignLines
from cor_asv_ann_tpu.wrapper.evaluate import EvaluateLines
from cor_asv_ann_tpu.wrapper.join import JoinLines
from cor_asv_ann_tpu.wrapper.mark import MarkWords
from cor_asv_ann_tpu.wrapper.transcode import ANNCorrection

from test_e2e_workspace import toy_model_file  # noqa: F401 (fixture)


def make_doc(line_texts, conf=0.9):
    doc = P.new_page()
    region = P.add_region(doc, 'r1')
    for i, text in enumerate(line_texts):
        line = P.add_line(region, f'l{i + 1}',
                          points=[(0, i * 20), (200, i * 20 + 18)])
        x = 0
        for j, wtext in enumerate(text.split(' ')):
            w = P.add_word(line, f'l{i + 1}_w{j + 1}',
                           points=[(x, i * 20),
                                   (x + 10 * len(wtext), i * 20 + 18)])
            w.add_textequiv(wtext, conf=conf)
            x += 10 * len(wtext) + 5
        line.add_textequiv(text, conf=conf)
    return doc


def test_full_chain(toy_model_file, tmp_path):  # noqa: F811
    ws = make_workspace(str(tmp_path / 'ws'), ['p1', 'p2'])
    gt = [["ab ca", "cab"], ["ba cc"]]
    ocr = [["ab cb", "cab"], ["ba cc"]]
    for grp, pages in (('GT', gt), ('OCR', ocr)):
        for pid, texts in zip(['p1', 'p2'], pages):
            ws.add_file(grp, pid, make_doc(texts).to_bytes())
    ws.save()

    # 1. post-correction
    proc = ANNCorrection(parameter={'model_file': toy_model_file,
                                    'textequiv_level': 'word',
                                    'fast_mode': True,
                                    'rejection_threshold': 0.1})
    proc.process_workspace(ws, ['OCR'], 'COR')
    assert set(ws.page_files('COR')) == {'p1', 'p2'}

    # 2. align (ensemble of GT+OCR+COR, majority)
    align = AlignLines(parameter={'method': 'majority'})
    align.process_workspace(ws, ['OCR', 'COR', 'GT'], 'MAJ')
    assert set(ws.page_files('MAJ')) == {'p1', 'p2'}

    # 3. evaluate across fileGrps (match_on=id)
    ev1 = EvaluateLines(parameter={'match_on': 'id', 'metric': 'NFC',
                                   'confusion': 5, 'histogram': True})
    ev1.process_workspace(ws, ['GT', 'OCR', 'COR', 'MAJ'], 'EVAL1')

    # 4. join into one annotation per line (indexed)
    join = JoinLines(parameter={'add-filegrp-index': True})
    join.process_workspace(ws, ['GT', 'OCR', 'COR', 'MAJ'], 'JOIN')

    # 5. evaluate on the joined annotation (match_on=index)
    ev2 = EvaluateLines(parameter={'match_on': 'index', 'metric': 'NFC',
                                   'confusion': 5, 'histogram': True})
    ev2.process_workspace(ws, ['JOIN'], 'EVAL2')

    # the two evaluation paths must agree (reference test_all.py:267-271)
    for i in (1, 2, 3):
        m1 = ev1.report[ev1._pair(i)]['char-error-rate-mean']
        m2 = ev2.report[ev2._pair(i)]['char-error-rate-mean']
        assert abs(m1 - m2) < 1e-9, (i, m1, m2)

    # the ensemble result must not be worse than raw OCR
    ocr_cer = ev1.report['OCR,GT']['char-error-rate-mean']
    maj_cer = ev1.report['MAJ,GT']['char-error-rate-mean']
    assert maj_cer <= ocr_cer

    # 6. mark words unknown to a toy spellchecker
    script = tmp_path / 'spell.sh'
    script.write_text('#!/bin/sh\nwhile read w; do\n'
                      'case "$w" in ab|ca|cab|ba|cc) ;; *) echo "$w";; '
                      'esac\ndone\n')
    script.chmod(0o755)
    mark = MarkWords(parameter={'command': str(script), 'format': 'OOV'})
    mark.process_workspace(ws, ['OCR'], 'MARK')
    doc = P.parse_page(ws.page_files('MARK')['p1'].path)
    words = [w for line in doc.get_lines() for w in line.get_words()]
    marked = [w.get_text() for w in words
              if w.get_textequivs()[0].comments == 'OOV']
    assert marked == ['cb']
