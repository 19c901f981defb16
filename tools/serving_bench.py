"""Serving-level correct_lines throughput: dispatch-pipeline A/B.

`Sequence2Sequence.correct_stream` keeps PIPELINE_DEPTH batches queued on
the device while the host rebuilds text for the oldest fetched chunk, so
the per-chunk host work (UTF-32 decode, list building) overlaps device
decode instead of serializing with it. This tool measures end-to-end
correct_lines lines/sec on the trained flagship at depth 0 (strictly
serial, the pre-pipeline behavior) vs the serving default, greedy and
beam, and checks outputs are identical.

Usage: python tools/serving_bench.py [n_lines] [batch_size]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = os.path.join(REPO, 'testmodels',
                        'flagship.d2.w512.synthetic.h5')


def make_text_lines(n, min_len=40, max_len=62, seed=1):
    """Noisy historical-OCR-style text lines from the flagship's
    training distribution (same tables as bench.make_flagship_lines)."""
    import numpy as np
    from cor_asv_ann_tpu.utils.synthdata import WORDS, NOISE
    rng = np.random.default_rng(seed)
    lines = []
    for _ in range(n):
        text = ''
        while len(text) < min_len:
            text += WORDS[rng.integers(len(WORDS))] + ' '
        text = ''.join(NOISE[ch]
                       if ch in NOISE and rng.random() < 0.12 else ch
                       for ch in text.strip()[:max_len]) + '\n'
        lines.append(text)
    return lines


def run(s2s, lines, greedy, reps):
    out = None
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        out = s2s.correct_lines(lines, fast=greedy, greedy=greedy,
                                return_alignments=False)
        best = min(best, time.perf_counter() - t0)
    return out, len(lines) / best


def main():
    sys.path.insert(0, REPO)
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    s2s = Sequence2Sequence()
    s2s.load_config(FLAGSHIP)
    s2s.configure(batch_size=bs)
    s2s.load_weights(FLAGSHIP)
    s2s.compute = 'bfloat16'
    lines = make_text_lines(n)
    default_depth = Sequence2Sequence.PIPELINE_DEPTH

    # beam runs at a smaller batch so the same n covers several chunks
    for greedy, label, reps, use_bs in ((True, 'greedy', 3, bs),
                                        (False, 'beam', 1, 256)):
        s2s.batch_size = use_bs     # host-side chunking only
        n_use = n if greedy else min(n, 4 * use_bs)
        use = lines[:n_use]
        results = {}
        for depth in (0, default_depth):
            s2s.PIPELINE_DEPTH = depth
            run(s2s, use[:use_bs], greedy, 1)       # warm the compile
            out, lps = run(s2s, use, greedy, reps)
            results[depth] = out
            print('%s depth=%d: %.0f lines/s (%d lines, B=%d)'
                  % (label, depth, lps, n_use, use_bs), flush=True)
        assert results[0][0] == results[default_depth][0], \
            'pipelined output differs from serial output'
        print('%s: outputs identical across depths' % label, flush=True)


if __name__ == '__main__':
    main()
