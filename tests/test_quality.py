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

from cor_asv_ann_tpu.utils.synthdata import make_pairs


def make_test_pairs(n=64):
    """Regenerate the soak's held-out set (same generator, same seed —
    the corpus tables live in utils/synthdata.py, shared with bench.py
    so all consumers stay on the distribution the models trained on)."""
    return make_pairs(n, seed=7)


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
    # byte-exact since the beam matches reference pop/admission/state
    # semantics exactly (0/30 divergence vs the Keras-verified oracle,
    # tests/test_beam.py); regressions here are semantics bugs, not ties
    assert out_b == golden['beamed'], [
        (a, b) for a, b in zip(out_b, golden['beamed']) if a != b]


def test_golden_corpus(flagship):
    """Byte-exact decode regression across every decode mode and input
    format: {greedy, beam} x {plain, prob-line, confmat} x rejection
    {0, 0.3, 0.5} (tools/record_corpus_goldens.py records the fixture;
    reference surface seq2seq.py:782-842, input formats :949-958).

    Fidelity vs the reference itself at flagship scale: 11/12 1-best
    beam agreement at serving bounds; the single residual divergence is
    a measured eligibility-bound tie at the reference's own hard
    ``misalignment < 0.1`` rejection gate (margin 6e-4, straddled by the
    reference's sibling hypotheses; f64 referee unchanged) — see
    tools/beam_divergence.py and its committed report."""
    import importlib.util
    import json
    tools = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'tools', 'record_corpus_goldens.py')
    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'golden_corpus.json')
    if not os.path.exists(golden_path):
        pytest.skip('golden corpus fixture missing')
    spec = importlib.util.spec_from_file_location('record_corpus', tools)
    recorder = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(recorder)
    with open(golden_path) as f:
        golden = json.load(f)
    inputs = golden['inputs']
    confmat = [[[tuple(alt) for alt in chunk] for chunk in entry]
               for entry in inputs['confmat']]
    probline = [[tuple(pair) for pair in entry]
                for entry in inputs['probline']]
    confmat_multi = ([[[tuple(alt) for alt in chunk] for chunk in entry]
                      for entry in inputs['confmat_multi']]
                     if 'confmat_multi' in inputs else None)
    results = recorder.decode_all(flagship, inputs['plain'], probline,
                                  confmat, confmat_multi)
    for name, got in results.items():
        want = golden['modes'][name]
        diffs = [(a, b) for a, b in zip(got['output'], want['output'])
                 if a != b]
        assert not diffs, (name, diffs[:5])
        np.testing.assert_allclose(got['scores'], want['scores'],
                                   atol=2e-3, err_msg=name)
