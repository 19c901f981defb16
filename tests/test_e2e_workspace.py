"""End-to-end: trained model correcting a PAGE-XML workspace.

Mirror of the reference integration strategy (tests/test_all.py:21-104):
run the full processor chain over a real workspace and assert behavioral
invariants (consistency of levels, confidence ranges, smoke accuracy) —
here with a toy model trained in-process instead of a 53 MB download.
"""

import numpy as np
import pytest

from cor_asv_ann_tpu.utils import page as P
from cor_asv_ann_tpu.utils.workspace import make_workspace
from cor_asv_ann_tpu.wrapper.transcode import ANNCorrection


@pytest.fixture(scope='module')
def toy_model_file(tmp_path_factory):
    """Train the uppercase toy model and save it as h5."""
    import jax
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    from cor_asv_ann_tpu.models import train as T
    from cor_asv_ann_tpu.utils.data import vectorize_lines

    rng = np.random.default_rng(0)
    words = [''.join(rng.choice(list('abc'), rng.integers(2, 5)))
             for _ in range(160)]
    # lines of 1-3 words so the model sees spaces
    lines = []
    i = 0
    while i < len(words):
        k = int(rng.integers(1, 4))
        lines.append(' '.join(words[i:i + k]))
        i += k
    s2s = Sequence2Sequence()
    s2s.width, s2s.depth, s2s.batch_size = 32, 2, 16
    s2s.dropout = 0.0
    s2s.mapping, _ = s2s.mapping.grow(['abc ABC\n'])
    s2s.configure()
    srcs = [l + '\n' for l in lines]
    tgts = [l.upper() + '\n' for l in lines]
    pad = max(len(s) for s in srcs) + 1
    batches = []
    for lo in range(0, len(srcs), 32):
        batches.append(vectorize_lines(
            s2s.mapping, srcs[lo:lo + 32] + [''] * (32 - len(srcs[lo:lo + 32])),
            tgts[lo:lo + 32] + [''] * (32 - len(tgts[lo:lo + 32])),
            bucketed=False, pad_encoder=pad, pad_decoder=pad + 1))
    opt = T.make_optimizer(1.5e-2)
    opt_state = opt.init(s2s.params)
    key = jax.random.PRNGKey(0)
    params = s2s.params
    for step in range(1500):
        enc, dec_in, dec_out, w = batches[step % len(batches)]
        key, sub = jax.random.split(key)
        params, opt_state, _ = T.train_step(
            params, opt_state, s2s.config, enc, dec_in, dec_out, w, sub,
            lm_loss=False, optimizer=opt)
    s2s.params = params
    s2s.status = 2
    path = str(tmp_path_factory.mktemp('model') / 'toy.h5')
    s2s.save(path)
    return path


def build_workspace(tmp_path):
    ws = make_workspace(str(tmp_path / 'ws'), ['p1'])
    doc = P.new_page()
    region = P.add_region(doc, 'r1')
    texts = [("ab ca", ['ab', 'ca']), ("cab", ['cab'])]
    for li, (line_text, wtexts) in enumerate(texts):
        line = P.add_line(region, f'l{li + 1}',
                          points=[(0, li * 20), (200, li * 20 + 18)])
        x = 0
        for wi, wt in enumerate(wtexts):
            word = P.add_word(line, f'l{li + 1}_w{wi + 1}',
                              points=[(x, li * 20),
                                      (x + 10 * len(wt), li * 20 + 18)])
            for gi, ch in enumerate(wt):
                glyph = P.add_glyph(
                    word, f'l{li + 1}_w{wi + 1}_g{gi + 1}',
                    points=[(x + gi * 10, li * 20),
                            (x + gi * 10 + 9, li * 20 + 18)])
                glyph.add_textequiv(ch, conf=0.8)
            word.add_textequiv(wt, conf=0.8)
            x += 10 * len(wt) + 8
        line.add_textequiv(line_text, conf=0.8)
    ws.add_file('OCR', 'p1', doc.to_bytes())
    ws.save()
    return ws


@pytest.mark.parametrize('level', ['line', 'word', 'glyph'])
@pytest.mark.parametrize('fast', [True, False])
def test_transcode_workspace(toy_model_file, tmp_path, level, fast):
    ws = build_workspace(tmp_path)
    proc = ANNCorrection(parameter={
        'model_file': toy_model_file,
        'textequiv_level': level,
        'fast_mode': fast,
        'rejection_threshold': 0.1,
    })
    proc.process_workspace(ws, ['OCR'], 'COR')
    files = ws.page_files('COR')
    assert 'p1' in files
    doc = P.parse_page(files['p1'].path)
    lines = doc.get_lines()
    assert len(lines) == 2
    line_texts = [l.get_text() for l in lines]
    # smoke accuracy: the toy model uppercases
    joined = ' '.join(line_texts)
    upper_ratio = sum(c.isupper() for c in joined) / max(
        sum(c.isalpha() for c in joined), 1)
    assert upper_ratio > 0.5, line_texts
    for line in lines:
        tes = line.get_textequivs()
        assert tes and tes[0].conf is not None
        assert 0 < tes[0].conf <= 1
        if level == 'line':
            assert line.get_words() == []  # lower levels removed
        else:
            # consistency: word texts joined by space equal line text
            words = line.get_words()
            assert ' '.join(w.get_text() or '' for w in words) == \
                line.get_text()
            if level == 'word':
                for w in words:
                    assert w.get_glyphs() == []
            else:
                for w in words:
                    glyphs = w.get_glyphs()
                    if glyphs:
                        assert ''.join(
                            g.get_text() or '' for g in glyphs) == \
                            (w.get_text() or '')


def build_merged_glyph_workspace(tmp_path):
    """A page exercising the confmat format's distinctive glyph cases
    (reference transcode.py:236-277): a MERGED glyph whose text spans
    two characters, an EMPTY glyph (OCR rejection -> GAP char), and a
    glyph with a second, differing-length alternative."""
    ws = make_workspace(str(tmp_path / 'wsm'), ['p1'])
    doc = P.new_page()
    region = P.add_region(doc, 'r1')
    line = P.add_line(region, 'l1', points=[(0, 0), (200, 18)])
    word = P.add_word(line, 'w1', points=[(0, 0), (120, 18)])
    specs = [('a', None), ('bc', 'b'), ('', None), ('d', 'a')]
    for gi, (text, alt) in enumerate(specs):
        glyph = P.add_glyph(word, f'g{gi + 1}',
                            points=[(gi * 30, 0), (gi * 30 + 28, 18)])
        glyph.add_textequiv(text, conf=0.8)
        if alt is not None:
            glyph.add_textequiv(alt, conf=0.3)
    word.add_textequiv('abcd', conf=0.8)
    line.add_textequiv('abcd', conf=0.8)
    ws.add_file('OCR', 'p1', doc.to_bytes())
    ws.save()
    return ws


@pytest.mark.parametrize('fast', [True, False])
def test_transcode_merged_and_empty_glyphs(toy_model_file, tmp_path,
                                           fast):
    """End-to-end glyph-level correction over merged/empty glyphs: the
    confmat fed to the model must contain a multi-char chunk and a
    GAP-char chunk (reference seq2seq.py:1067-1081 placement), and the
    corrected PAGE output must hold the usual consistency invariants."""
    from cor_asv_ann_tpu.utils.data import GAP
    from cor_asv_ann_tpu.wrapper import transcode as TC

    ws = build_merged_glyph_workspace(tmp_path)
    doc = P.parse_page(ws.page_files('OCR')['p1'].path)
    seqs = TC._page_get_line_sequences_at('glyph', doc)
    lines, _ = TC._line_sequences2confmat_sequences({'a': 1}, seqs)
    chunks = lines[0]
    assert any(len(alt[0]) > 1 for chunk in chunks for alt in chunk), \
        'no multi-char alternative in the confmat'
    assert any(alt[0] == GAP for chunk in chunks for alt in chunk), \
        'empty glyph did not become the GAP char'
    assert any(len({len(a[0]) for a in chunk}) > 1
               for chunk in chunks), 'no differing-length alternatives'

    proc = ANNCorrection(parameter={
        'model_file': toy_model_file,
        'textequiv_level': 'glyph',
        'fast_mode': fast,
        'rejection_threshold': 0.1,
    })
    proc.process_workspace(ws, ['OCR'], 'COR')
    out = P.parse_page(ws.page_files('COR')['p1'].path)
    (line,) = out.get_lines()
    assert line.get_text()
    words = line.get_words()
    assert ' '.join(w.get_text() or '' for w in words) == line.get_text()
    for w in words:
        glyphs = w.get_glyphs()
        if glyphs:
            assert ''.join(g.get_text() or '' for g in glyphs) == \
                (w.get_text() or '')
            for g in glyphs:
                assert GAP not in (g.get_text() or '')


def test_transcode_deployment_modes(toy_model_file, tmp_path):
    """The trained-model correction chain through the deployment
    runtime (wrapper/server.py + utils/mets_server.py): a processor
    server with a cached model instance, jobs routed over HTTP, METS
    access through a METS server — outputs byte-identical to the
    direct in-process run (cf. reference worker/server modes,
    README.md:447-450)."""
    from cor_asv_ann_tpu.utils.mets_server import MetsServer
    from cor_asv_ann_tpu.utils.workspace import Workspace
    from cor_asv_ann_tpu.wrapper.server import (
        ProcessorServer, client_process)

    params = {'model_file': toy_model_file, 'textequiv_level': 'word',
              'fast_mode': True, 'rejection_threshold': 0.1}
    # direct run = baseline bytes
    ws_direct = build_workspace(tmp_path / 'direct')
    ANNCorrection(parameter=params).process_workspace(
        ws_direct, ['OCR'], 'COR')
    baseline = open(ws_direct.page_files('COR')['p1'].path, 'rb').read()

    ws_dir = str((tmp_path / 'served') / 'ws')
    build_workspace(tmp_path / 'served')
    sock = str(tmp_path / 'mets.sock')
    mets = MetsServer(ws_dir, sock).start()
    server = ProcessorServer(ANNCorrection, '127.0.0.1:0').start()
    try:
        job = {'workspace': ws_dir, 'mets_server_url': sock,
               'input_file_grp': 'OCR', 'output_file_grp': 'COR',
               'parameter': params}
        assert client_process(server.address, job)['ok']
        # a second job reuses the cached (loaded+jitted) model
        assert client_process(server.address, dict(
            job, output_file_grp='COR2'))['ok']
        assert len(server._cache) == 1
    finally:
        server.stop()
        mets.stop()
    ws = Workspace(ws_dir)
    for grp in ('COR', 'COR2'):
        assert open(ws.page_files(grp)['p1'].path, 'rb').read() == baseline
