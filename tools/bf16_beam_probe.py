"""Probe: bf16 beamed serving vs the f32 golden corpus (NOTES.md
"bf16 serving vs the f32 golden corpus"). Lists the divergent lines at
each rejection threshold so the threshold-clamp tie referee (round-5
work) can be validated: target is 0 diffs in every beam mode.

Usage: python tools/bf16_beam_probe.py [--cpu]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

if '--cpu' in sys.argv:
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')

GOLDEN = os.path.join(REPO, 'tests', 'golden_corpus.json')
FLAGSHIP = os.path.join(REPO, 'testmodels', 'flagship.d2.w512.synthetic.h5')

BEAM_MODES = [
    ('beam_r00_plain', 'plain', 0.0),
    ('beam_r03_plain', 'plain', 0.3),
    ('beam_r03_probline', 'probline', 0.3),
    ('beam_r03_confmat', 'confmat', 0.3),
    ('beam_r05_plain', 'plain', 0.5),
]


def main():
    from cor_asv_ann_tpu.models.api import Sequence2Sequence

    with open(GOLDEN) as f:
        golden = json.load(f)
    inputs = golden['inputs']
    s2s = Sequence2Sequence()
    s2s.load_config(FLAGSHIP)
    s2s.configure()
    s2s.load_weights(FLAGSHIP)
    s2s.compute = 'bfloat16'

    total = 0
    for name, kind, rejection in BEAM_MODES:
        if kind == 'plain':
            lines, conf = inputs['plain'], None
        elif kind == 'probline':
            probline = [[tuple(p) for p in e] for e in inputs['probline']]
            lines = [''.join(ch for ch, _ in e) for e in probline]
            conf = [[p for _, p in e] for e in probline]
        else:
            confmat = [[[tuple(a) for a in chunk] for chunk in e]
                       for e in inputs['confmat']]
            lines = [''.join(chunk[0][0] if chunk else '' for chunk in e)
                     for e in confmat]
            conf = confmat
        s2s.rejection_threshold = rejection
        out, _, scores, _ = s2s.correct_lines(
            lines, conf=conf, fast=False, greedy=False,
            return_alignments=False)
        want = golden['modes'][name]['output']
        diffs = [(i, a, b) for i, (a, b) in enumerate(zip(out, want))
                 if a != b]
        total += len(diffs)
        print('%-20s %d/%d lines differ' % (name, len(diffs), len(out)))
        for i, a, b in diffs:
            print('  line %3d:' % i)
            print('    bf16: %r' % a)
            print('    f32 : %r' % b)
    print('TOTAL: %d' % total)
    return 1 if total else 0


if __name__ == '__main__':
    sys.exit(main())
