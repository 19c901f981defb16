"""Correction quality with the bundled pretrained synthetic model.

`testmodels/soak.d2.w128.synthetic.h5` was trained in-repo (14k steps,
lr 2e-3) on synthetic historical-OCR noise (long-s/ligature-style
substitutions + deletions) over a 48-word German vocabulary; on held-out
noisy lines it reaches CER ~0.023 vs OCR ~0.077 (3.3x error reduction).
This test regenerates the same held-out set and checks the model still
delivers a real improvement end-to-end through the public API — the
bundled-pretrained-model strategy of the reference suite
(tests/test_all.py:19 with its 53 MB download) at laptop scale.
"""

import os

import numpy as np
import pytest

MODELS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'testmodels')
MODEL = os.path.join(MODELS_DIR, 'soak.d2.w128.synthetic.h5')
FLAGSHIP = os.path.join(MODELS_DIR, 'flagship.d2.w512.synthetic.h5')

pytestmark = pytest.mark.skipif(not os.path.exists(MODEL),
                                reason='bundled model missing')

WORDS = ("der die das und ist ein eine mit von auf nicht sich auch als "
         "wird nach bei aus durch über unter vor zwischen gegen ohne "
         "Mensch Welt Leben Zeit Jahr Hand Tag Nacht Haus Land Stadt "
         "Wasser Feuer Erde Licht Aufklärung Vernunft Freiheit Wissen "
         "Schrift Buch Seite Wort Sprache Geschichte Natur Wesen Geist"
         ).split()
NOISE = {'s': 'ſ', 'f': 'ſ', 't': 'l', 'e': 'c', 'n': 'u', 'u': 'n',
         'r': 'x', 'i': 'j', 'h': 'b', 'ä': 'a'}


def make_test_pairs(n=64):
    """Regenerate the soak's held-out set (same generator, same seed
    stream position is irrelevant — any sample from this distribution)."""
    rng = np.random.default_rng(7)

    def make_line():
        k = rng.integers(3, 8)
        return ' '.join(rng.choice(WORDS) for _ in range(k))

    def corrupt(text):
        out = []
        for ch in text:
            if ch in NOISE and rng.random() < 0.12:
                out.append(NOISE[ch])
            elif rng.random() < 0.01:
                continue
            else:
                out.append(ch)
        return ''.join(out)

    lines = [make_line() for _ in range(n)]
    return [(corrupt(l), l) for l in lines]


def corpus_cer(outs, tgts):
    from cor_asv_ann_tpu.lib.alignment import Alignment
    D = N = 0
    for o, t in zip(outs, tgts):
        d, n = Alignment().get_adjusted_distance(o, t)
        D += d
        N += n
    return D / N


@pytest.fixture(scope='module')
def model():
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    s2s = Sequence2Sequence()
    s2s.load_config(MODEL)
    s2s.configure()
    s2s.load_weights(MODEL)
    return s2s


def test_greedy_beats_ocr(model):
    pairs = make_test_pairs()
    srcs = [a + '\n' for a, _ in pairs]
    tgts = [b + '\n' for _, b in pairs]
    out, _, _, _ = model.correct_lines(srcs, fast=True, greedy=True)
    ocr_cer = corpus_cer(srcs, tgts)
    cor_cer = corpus_cer(out, tgts)
    assert cor_cer < ocr_cer * 0.6, (ocr_cer, cor_cer)


@pytest.fixture(scope='module')
def flagship():
    if not os.path.exists(FLAGSHIP):
        pytest.skip('flagship model missing')
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    s2s = Sequence2Sequence()
    s2s.load_config(FLAGSHIP)
    s2s.configure()
    s2s.load_weights(FLAGSHIP)
    return s2s


def test_flagship_near_perfect(flagship):
    """The bundled d2/w512 model (trained in-repo with LM multi-task loss
    and scheduled sampling — BASELINE config 4) corrects the held-out set
    almost perfectly (measured greedy CER 0.0008 vs OCR 0.068)."""
    s2s = flagship
    pairs = make_test_pairs(48)
    srcs = [a + '\n' for a, _ in pairs]
    tgts = [b + '\n' for _, b in pairs]
    out, _, _, _ = s2s.correct_lines(srcs, fast=True, greedy=True,
                                     return_alignments=False)
    ocr_cer = corpus_cer(srcs, tgts)
    cor_cer = corpus_cer(out, tgts)
    assert cor_cer < ocr_cer * 0.25, (ocr_cer, cor_cer)


def test_beam_with_rejection_beats_ocr(model):
    pairs = make_test_pairs(24)
    srcs = [a + '\n' for a, _ in pairs]
    tgts = [b + '\n' for _, b in pairs]
    model.rejection_threshold = 0.5
    out, _, _, _ = model.correct_lines(srcs, fast=False, greedy=False)
    ocr_cer = corpus_cer(srcs, tgts)
    cor_cer = corpus_cer(out, tgts)
    assert cor_cer < ocr_cer, (ocr_cer, cor_cer)


def test_golden_decodes(flagship):
    """Byte-exact decode regression against recorded golden outputs
    (the north-star fidelity bar: identical corrected text at matched
    decoder settings, BASELINE.md)."""
    import json
    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'golden_decodes.json')
    if not os.path.exists(golden_path):
        pytest.skip('golden fixture missing')
    with open(golden_path) as f:
        golden = json.load(f)
    s2s = flagship
    s2s.rejection_threshold = 0.3
    out_g, _, scores, _ = s2s.correct_lines(
        golden['inputs'], fast=True, greedy=True, return_alignments=False)
    assert out_g == golden['greedy']
    np.testing.assert_allclose(scores, golden['greedy_scores'], atol=2e-3)
    s2s.rejection_threshold = 0.5
    out_b, _, _, _ = s2s.correct_lines(
        golden['inputs'], fast=False, greedy=False,
        return_alignments=False)
    # beam ordering can tie-break differently across backends; require
    # byte equality on at least 90% of lines
    same = sum(a == b for a, b in zip(out_b, golden['beamed']))
    assert same >= int(0.9 * len(out_b)), (same, len(out_b))
