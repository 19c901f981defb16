"""Quickstart: load the bundled flagship model and correct noisy lines.

Run from the repository root:

    python examples/quickstart.py

Demonstrates the three public entry points: the Python API, greedy and
beamed decoding, and evaluation metrics.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from cor_asv_ann_tpu import Sequence2Sequence
from cor_asv_ann_tpu.lib.alignment import Alignment

MODEL = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'testmodels',
    'flagship.d2.w512.synthetic.h5')

NOISY = [
    'nicbl Nalur übcr Licbt\n',
    'Mcnsch und Wclt\n',
    'Aufklaxuug ist Vcruunft\n',
]


def main():
    s2s = Sequence2Sequence()
    s2s.load_config(MODEL)
    s2s.configure()
    s2s.load_weights(MODEL)

    # greedy (fast) decoding — fully on device
    corrected, probs, scores, alignments = s2s.correct_lines(
        NOISY, fast=True, greedy=True)
    print('greedy:')
    for src, out, score in zip(NOISY, corrected, scores):
        print('  %-28r -> %-28r (ppl %.2f)'
              % (src.strip(), out.strip(), 2.718 ** score))

    # beamed decoding with rejection (precision-oriented)
    s2s.rejection_threshold = 0.3
    beamed, _, _, _ = s2s.correct_lines(NOISY, fast=False, greedy=False)
    print('beamed:')
    for src, out in zip(NOISY, beamed):
        print('  %-28r -> %r' % (src.strip(), out.strip()))

    # character error rate, historic-Latin normalization
    aligner = Alignment()
    dist, length = aligner.get_adjusted_distance(
        corrected[0], 'nicht Natur über Licht\n',
        normalization='historic_latin')
    print('CER of line 1 vs ground truth: %.4f' % (dist / length))


if __name__ == '__main__':
    main()
