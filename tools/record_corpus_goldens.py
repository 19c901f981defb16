"""Record tests/golden_corpus.json — the extended byte-exact fidelity
corpus over every decode mode and input format.

Coverage grid (VERDICT round-1 item 5; reference decode surface
seq2seq.py:782-842, input formats :949-958):

    greedy        x {plain, prob-line, confmat}
    beam r=0.0    x {plain}
    beam r=0.3    x {plain, prob-line, confmat}
    beam r=0.5    x {plain}

Inputs are drawn from the flagship's synthetic training distribution
(utils/synthdata.py, fixed seeds) so decodes exercise realistic
correction behavior with early termination.  Run after an intentional
decoder-semantics change only:

    python tools/record_corpus_goldens.py [--check]
"""

import json
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, 'tests', 'golden_corpus.json')
FLAGSHIP = os.path.join(REPO, 'testmodels', 'flagship.d2.w512.synthetic.h5')

N_PLAIN = 120
N_CONF = 32


def build_inputs():
    """Deterministic input sets in the three reference formats."""
    import numpy as np
    sys.path.insert(0, REPO)
    from cor_asv_ann_tpu.utils.synthdata import make_pairs, corrupt

    rng = np.random.default_rng(1234)
    plain = [src + '\n' for src, _ in make_pairs(N_PLAIN, seed=99)]

    probline_texts = [src + '\n' for src, _ in make_pairs(N_CONF, seed=101)]
    probline = [[(ch, float(round(rng.uniform(0.5, 1.0), 3)))
                 for ch in text]
                for text in probline_texts]

    confmat = []
    for src, _ in make_pairs(N_CONF, seed=103):
        text = src + '\n'
        chunks = []
        for ch in text:
            alts = [(ch, float(round(rng.uniform(0.6, 1.0), 3)))]
            if ch.isalpha() and rng.random() < 0.3:
                alt = corrupt(ch, rng, noise_rate=1.0, drop_rate=0)
                if alt and alt != ch:
                    alts.append((alt,
                                 float(round(rng.uniform(0.05, 0.4), 3))))
            chunks.append(alts)
        confmat.append(chunks)

    # multi-character chunks — the production format's distinctive case
    # (reference seq2seq.py:1067-1081; merged/empty glyphs from
    # transcode.py:236-277): 2-char best alternatives spanning two
    # timesteps, shorter-than-max alternatives, empty (deleted-glyph)
    # alternatives
    confmat_multi = []
    for src, _ in make_pairs(N_CONF, seed=107):
        text = src + '\n'
        chunks = []
        i = 0
        while i < len(text):
            ch = text[i]
            nxt = text[i + 1] if i + 1 < len(text) else None
            r = rng.random()
            if nxt and ch.isalpha() and nxt.isalpha() and r < 0.25:
                chunks.append(
                    [(ch + nxt, float(round(rng.uniform(0.5, 0.9), 3))),
                     (ch, float(round(rng.uniform(0.05, 0.3), 3)))])
                i += 2
            elif ch.isalpha() and r > 0.88:
                chunks.append(
                    [(ch, float(round(rng.uniform(0.6, 0.95), 3))),
                     ('', float(round(rng.uniform(0.05, 0.2), 3)))])
                i += 1
            else:
                chunks.append(
                    [(ch, float(round(rng.uniform(0.6, 1.0), 3)))])
                i += 1
        confmat_multi.append(chunks)
    return plain, probline, confmat, confmat_multi


MODES = [
    # name, kind (plain|probline|confmat|confmat_multi), fast/greedy,
    # rejection
    ('greedy_plain', 'plain', True, 0.3),
    ('greedy_probline', 'probline', True, 0.3),
    ('greedy_confmat', 'confmat', True, 0.3),
    ('greedy_confmat_multi', 'confmat_multi', True, 0.3),
    ('beam_r00_plain', 'plain', False, 0.0),
    ('beam_r03_plain', 'plain', False, 0.3),
    ('beam_r03_probline', 'probline', False, 0.3),
    ('beam_r03_confmat', 'confmat', False, 0.3),
    ('beam_r03_confmat_multi', 'confmat_multi', False, 0.3),
    ('beam_r05_plain', 'plain', False, 0.5),
]


def decode_all(s2s, plain, probline, confmat, confmat_multi=None):
    results = {}
    for name, kind, greedy, rejection in MODES:
        if kind == 'plain':
            lines, conf = plain, None
        elif kind == 'probline':
            lines = [''.join(ch for ch, _ in entry) for entry in probline]
            conf = [[p for _, p in entry] for entry in probline]
        else:
            cm = confmat_multi if kind == 'confmat_multi' else confmat
            if cm is None:
                continue          # pre-round-5 fixture without multi
            lines = [''.join(chunk[0][0] if chunk else ''
                             for chunk in entry) for entry in cm]
            conf = cm
        s2s.rejection_threshold = rejection
        out, _, scores, _ = s2s.correct_lines(
            lines, conf=conf, fast=greedy, greedy=greedy,
            return_alignments=False)
        results[name] = {'output': out,
                         'scores': [round(float(x), 4) for x in scores]}
        print('  %-20s %3d lines' % (name, len(out)))
    return results


def main():
    sys.path.insert(0, REPO)
    import jax
    try:
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass
    from cor_asv_ann_tpu.models.api import Sequence2Sequence

    plain, probline, confmat, confmat_multi = build_inputs()
    s2s = Sequence2Sequence()
    s2s.load_config(FLAGSHIP)
    s2s.configure()
    s2s.load_weights(FLAGSHIP)
    results = decode_all(s2s, plain, probline, confmat,
                         confmat_multi)

    if '--check' in sys.argv:
        with open(GOLDEN) as f:
            recorded = json.load(f)
        bad = 0
        for name, got in results.items():
            want = recorded['modes'][name]['output']
            diff = sum(a != b for a, b in zip(got['output'], want))
            print('%-20s %d lines differ' % (name, diff))
            bad += diff
        return 1 if bad else 0

    payload = {
        'inputs': {'plain': plain, 'probline': probline,
                   'confmat': confmat,
                   'confmat_multi': confmat_multi},
        'modes': results,
    }
    with open(GOLDEN, 'w') as f:
        json.dump(payload, f, ensure_ascii=False)
    print('rewrote', GOLDEN)
    return 0


if __name__ == '__main__':
    sys.exit(main())
