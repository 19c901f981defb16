"""Extend testmodels/reference_trained.goldens.json to the production
input formats: probability lines and confusion networks.

Round-3 goldens pinned cross-implementation parity for PLAIN text only;
the reference's *production* path through the OCR-D processor feeds
confidence inputs (prob-lines: seq2seq.py:1101-1103 binary-with-conf;
confmats: seq2seq.py:1067-1081 chunk placement, produced by
transcode.py:236-277).  This tool loads the committed reference-trained
artifact with the REFERENCE'S OWN code (tests/keras_ref.reference_s2s:
its load_config/configure/load_weights/_resync_decoder under tf_keras)
and decodes deterministic prob-line and confmat variants of the same 48
golden sources with the reference's own ``correct_lines`` in both modes
(batch-greedy and beam), appending the outputs to the goldens file.

Input construction keeps the total encoder length at the artifact's
fixed T_SRC (the tf_keras attention-cell port needs a static encoder
length): prob-lines attach a per-char confidence to the already-padded
source text; confmats use single-character chunks (alternatives are
single chars only) so chunk count == char count == T_SRC.

Usage: python tools/extend_reference_goldens.py
Consumed by tests/test_reference_artifact.py.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, 'testmodels', 'reference_trained.w64.h5')
GOLDENS = os.path.join(REPO, 'testmodels',
                       'reference_trained.goldens.json')


def build_conf_inputs(sources, seed=4243):
    """Deterministic prob-line and confmat variants of the golden
    sources (single-char chunks/alternatives keep the encoder length
    static; same flavor as tools/record_corpus_goldens.build_inputs)."""
    import numpy as np
    from cor_asv_ann_tpu.utils.synthdata import corrupt

    rng = np.random.default_rng(seed)
    probline = [[(ch, float(round(rng.uniform(0.5, 1.0), 3)))
                 for ch in text]
                for text in sources]
    confmat = []
    for text in sources:
        chunks = []
        for ch in text:
            alts = [(ch, float(round(rng.uniform(0.6, 1.0), 3)))]
            if ch.isalpha() and rng.random() < 0.3:
                alt = corrupt(ch, rng, noise_rate=1.0, drop_rate=0)
                if alt and alt != ch and len(alt) == 1:
                    alts.append((alt,
                                 float(round(rng.uniform(0.05, 0.4), 3))))
            chunks.append(alts)
        confmat.append(chunks)
    return probline, confmat


def build_multichar_confmat(sources, seed=4244):
    """Confusion networks with MULTI-CHARACTER chunks — the production
    format's distinctive case (reference seq2seq.py:1067-1081: each
    chunk occupies max(len(alt)) timesteps, every alternative's chars
    placed at the chunk's base offset with its own confidence;
    produced by transcode.py:236-277 for merged/empty glyphs).

    To keep the artifact's static encoder length, chunk widths still
    sum to len(text): a "merged-glyph" chunk covers TWO source chars
    with a 2-char best alternative (plus a shorter 1-char alternative —
    alternatives of differing length inside one chunk), and some
    single-char chunks carry an EMPTY alternative (deleted glyph,
    zero-width)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    confmat = []
    for text in sources:
        chunks = []
        i = 0
        while i < len(text):
            ch = text[i]
            nxt = text[i + 1] if i + 1 < len(text) else None
            r = rng.random()
            if (nxt and ch.isalpha() and nxt.isalpha() and r < 0.25):
                # merged chunk: 2-char best alternative spanning two
                # timesteps + a 1-char (shorter) alternative
                alts = [(ch + nxt,
                         float(round(rng.uniform(0.5, 0.9), 3))),
                        (ch, float(round(rng.uniform(0.05, 0.3), 3)))]
                chunks.append(alts)
                i += 2
            elif ch.isalpha() and r > 0.88:
                # single-char chunk with an empty (deleted) alternative
                alts = [(ch, float(round(rng.uniform(0.6, 0.95), 3))),
                        ('', float(round(rng.uniform(0.05, 0.2), 3)))]
                chunks.append(alts)
                i += 1
            else:
                chunks.append(
                    [(ch, float(round(rng.uniform(0.6, 1.0), 3)))])
                i += 1
        confmat.append(chunks)
    return confmat


def main():
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    import numpy as np
    import keras_ref
    assert keras_ref.available()

    with open(GOLDENS) as f:
        gold = json.load(f)
    sources = gold['sources']
    t_src = gold['topology']['t_src']
    assert all(len(s) == t_src for s in sources)

    probline, confmat = build_conf_inputs(sources)

    s2s = keras_ref.reference_s2s(ARTIFACT, t_src)
    for k, v in gold['serving'].items():
        setattr(s2s, k, v)
    s2s.batch_size = 256   # beam fringe bound, reference default

    confmat_multi = build_multichar_confmat(sources)
    n_multi = sum(sum(1 for c in entry
                      if any(len(a[0]) != 1 for a in c))
                  for entry in confmat_multi)
    assert n_multi > 0, 'multichar builder produced no special chunks'
    print('confmat_multi: %d merged/empty chunks over %d lines'
          % (n_multi, len(confmat_multi)), flush=True)

    results = {}
    for kind, conf in (('probline', [[p for _, p in e] for e in probline]),
                       ('confmat', confmat),
                       ('confmat_multi', confmat_multi)):
        lines = (sources if kind == 'probline' else
                 [''.join(c[0][0] if c else '' for c in entry)
                  for entry in conf])
        out_g, _, sc_g, _ = s2s.correct_lines(
            list(lines), conf=conf, fast=True, greedy=True)
        print('reference greedy %s done' % kind, flush=True)
        out_b, _, sc_b, _ = s2s.correct_lines(
            list(lines), conf=conf, fast=False, greedy=False)
        print('reference beam %s done' % kind, flush=True)
        results['reference_greedy_%s' % kind] = out_g
        results['reference_greedy_%s_scores' % kind] = [
            float(s) for s in sc_g]
        results['reference_beamed_%s' % kind] = out_b
        results['reference_beam_%s_scores' % kind] = [
            float(s) for s in sc_b]

    gold['probline_inputs'] = probline
    gold['confmat_inputs'] = confmat
    gold['confmat_multi_inputs'] = confmat_multi
    gold['conf_inputs_seed'] = 4243
    gold.update(results)
    with open(GOLDENS, 'w') as f:
        json.dump(gold, f, indent=1, ensure_ascii=False)
    print('goldens extended -> %s' % GOLDENS, flush=True)


if __name__ == '__main__':
    main()
