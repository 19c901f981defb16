"""Re-record tests/golden_decodes.json from the bundled flagship model.

Run after an intentional decoder-semantics change (never to paper over a
regression): decodes the fixture inputs with the current greedy and beam
at the same settings test_quality.py uses, and rewrites the golden file.

    python tools/record_goldens.py [--check]

--check decodes and diffs without writing.
"""

import json
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, 'tests', 'golden_decodes.json')
FLAGSHIP = os.path.join(REPO, 'testmodels', 'flagship.d2.w512.synthetic.h5')


def main():
    sys.path.insert(0, REPO)
    import jax
    try:
        jax.config.update('jax_platforms', 'cpu')
    except Exception:
        pass
    from cor_asv_ann_tpu.models.api import Sequence2Sequence

    with open(GOLDEN) as f:
        golden = json.load(f)
    s2s = Sequence2Sequence()
    s2s.load_config(FLAGSHIP)
    s2s.configure()
    s2s.load_weights(FLAGSHIP)

    s2s.rejection_threshold = 0.3
    greedy, _, greedy_scores, _ = s2s.correct_lines(
        golden['inputs'], fast=True, greedy=True, return_alignments=False)
    s2s.rejection_threshold = 0.5
    beamed, _, _, _ = s2s.correct_lines(
        golden['inputs'], fast=False, greedy=False, return_alignments=False)

    changed = {
        'greedy': sum(a != b for a, b in zip(greedy, golden['greedy'])),
        'beamed': sum(a != b for a, b in zip(beamed, golden['beamed'])),
    }
    print('lines differing from recorded goldens:', changed)
    if '--check' in sys.argv:
        return 1 if any(changed.values()) else 0
    golden['greedy'] = greedy
    golden['greedy_scores'] = [float(s) for s in greedy_scores]
    golden['beamed'] = beamed
    with open(GOLDEN, 'w') as f:
        json.dump(golden, f, ensure_ascii=False, indent=1)
    print('rewrote', GOLDEN)
    return 0


if __name__ == '__main__':
    sys.exit(main())
