"""Produce a fidelity artifact this repo did NOT write: a model trained and
saved by the REFERENCE'S OWN CODE, plus golden decodes from the reference's
own decoders.

The north-star check (BASELINE.md) is CER parity with the Keras reference.
The environment has zero network egress, so the published pretrained model
(reference wrapper/ocrd-tool.json:66, 53,735,168 bytes) and GT4HistOCR
cannot be fetched — this tool first attempts the download and records the
failure, then builds the closest possible substitute exactly as VERDICT.md
round 2 prescribed:

1. write a TSV corpus from the same synthetic historical-OCR distribution
   the bundled testmodels use (cor_asv_ann_tpu.utils.synthdata),
2. run the genuine reference ``Sequence2Sequence`` under tf_keras
   (tests/keras_ref.py shims): its own ``map_files`` (vocab discovery),
   ``configure`` (all three Keras graphs + compile with Adam clipnorm 5 and
   temporal sample weights), ``gen_data`` (its vectorization, is_bad
   filtering, random encoder degradation — reference seq2seq.py:846-917),
   and the ``train_on_batch`` hot loop that the reference's
   ``fit_generator_autosized`` drives (reference keras_train.py:195; the
   surrounding autosized-epoch machinery needs Keras-2.3-only internals
   like ``_standardize_user_data`` and is environment, not model math),
3. save with the reference's own ``save()`` (Keras ``save_weights`` + the
   custom config group, seq2seq.py:1121-1141),
4. decode held-out lines with the reference's own ``correct_lines`` in
   both modes (batch-greedy and beam) and store them as goldens.

Outputs (committed; consumed by tests/test_reference_artifact.py):
  testmodels/reference_trained.w64.h5       — the artifact
  testmodels/reference_trained.goldens.json — reference decodes + metadata

Sources are padded to a fixed length (spaces before the newline): the
tf_keras port of the reference attention cell needs a static encoder
length (tests/keras_ref.py patch_reference_cell), and fixed shapes are
what the TPU side buckets to anyway.

Usage: python tools/train_reference_artifact.py [steps]
"""

import json
import logging
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_H5 = os.path.join(REPO, 'testmodels', 'reference_trained.w64.h5')
OUT_GOLD = os.path.join(REPO, 'testmodels',
                        'reference_trained.goldens.json')
PUBLISHED_URL = ('https://ub-backup.bib.uni-mannheim.de/~stweil/'
                 'cor-asv-ann/models/s2s.dta19.Fraktur4.d2.w0512.'
                 'adam.attention.stateless.variational-dropout.char.'
                 'pretrained+retrained-conf.h5')

WIDTH = 64
DEPTH = 2
BATCH = 32
T_SRC = 48          # source length incl. the trailing newline
N_TRAIN = 4000
N_GOLD = 48
SERVING = dict(rejection_threshold=0.3, beam_width_in=15,
               beam_threshold_in=0.2, beam_width_out=16)


def attempt_download(url, timeout=20):
    """Try fetching the published pretrained model; report the outcome."""
    import urllib.request
    try:
        t0 = time.time()
        with urllib.request.urlopen(url, timeout=timeout) as r:
            head = r.read(1 << 20)
        return {'ok': True, 'bytes_read': len(head),
                'seconds': time.time() - t0}
    except Exception as exc:  # zero-egress environment: expected to fail
        return {'ok': False, 'error': '%s: %s' % (type(exc).__name__, exc)}


def fixed_len_source(noisy):
    return (noisy + ' ' * T_SRC)[:T_SRC - 1]


def write_corpus(path, n, seed):
    import numpy as np
    from cor_asv_ann_tpu.utils import synthdata
    rng = np.random.default_rng(seed)
    with open(path, 'w') as f:
        for _ in range(n):
            clean = synthdata.make_line(rng)
            noisy = synthdata.corrupt(clean, rng)
            f.write('%s\t%s\n' % (fixed_len_source(noisy), clean))


def main():
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    import numpy as np

    dl = attempt_download(PUBLISHED_URL)
    print('published-model download attempt: %s' % dl, flush=True)

    import keras_ref
    assert keras_ref.available()
    keras_ref.install_full_shims()
    keras_ref.patch_reference_cell(T_SRC, WIDTH)
    from ocrd_cor_asv_ann.lib.seq2seq import Sequence2Sequence

    train_tsv = os.path.join(REPO, 'testmodels', 'reference_trained.tsv')
    write_corpus(train_tsv, N_TRAIN, seed=41)

    logging.basicConfig(level=logging.INFO)
    s2s = Sequence2Sequence(logger=logging.getLogger('ref_train'),
                            progbars=False)
    s2s.width = WIDTH
    s2s.depth = DEPTH
    s2s.batch_size = BATCH
    np.random.seed(17)       # reference uses np.random for degradation
    # the reference's own orchestration order (its train(), seq2seq.py:
    # 590-604): configure first, then map_files — vocabulary growth
    # triggers _reconfigure_for_mapping, which requires a built model
    s2s.configure()
    num_lines = s2s.map_files([train_tsv])
    print('corpus: %d lines, voc_size %d' % (num_lines, s2s.voc_size),
          flush=True)

    # the reference's own training hot loop (keras_train.py:195) over its
    # own data pipeline; fixed step count stands in for early stopping
    gen = s2s.gen_data([train_tsv], None, train=True)
    t0 = time.time()
    loss = None
    for step in range(steps):
        batch = next(gen)
        if batch is False:
            batch = next(gen)
        x, y, sw = batch
        loss = s2s.encoder_decoder_model.train_on_batch(
            x, y, sample_weight=sw)
        if step % 100 == 0:
            print('step %4d loss %.4f (%.1fs)' %
                  (step, float(np.ravel(loss)[0]), time.time() - t0),
                  flush=True)
    s2s._resync_decoder()
    s2s.status = 2
    s2s.save(OUT_H5)
    print('saved %s (%d bytes)' % (OUT_H5, os.path.getsize(OUT_H5)),
          flush=True)

    # --- golden decodes with the reference's own decoders ---------------
    from cor_asv_ann_tpu.utils import synthdata
    pairs = synthdata.make_pairs(N_GOLD, seed=4242)
    sources = [fixed_len_source(n) + '\n' for n, _ in pairs]
    targets = [c + '\n' for _, c in pairs]

    for k, v in SERVING.items():
        setattr(s2s, k, v)
    s2s.batch_size = 256   # beam fringe bound, reference default
    keras_ref.patch_beam_broadcast(s2s)

    greedy, _, greedy_scores, _ = s2s.correct_lines(
        list(sources), fast=True, greedy=True)
    t0 = time.time()
    beamed, _, beam_scores, _ = s2s.correct_lines(
        list(sources), fast=False, greedy=False)
    print('reference beam: %d lines in %.1fs'
          % (len(sources), time.time() - t0), flush=True)

    gold = {
        'download_attempt': dl,
        'topology': {'width': WIDTH, 'depth': DEPTH, 'batch': BATCH,
                     't_src': T_SRC, 'steps': steps,
                     'final_loss': float(np.ravel(loss)[0])},
        'serving': SERVING,
        'corpus': {'train_lines': N_TRAIN, 'train_seed': 41,
                   'gold_seed': 4242,
                   'distribution': 'cor_asv_ann_tpu.utils.synthdata'},
        'sources': sources,
        'targets': targets,
        'reference_greedy': greedy,
        'reference_greedy_scores': [float(s) for s in greedy_scores],
        'reference_beamed': beamed,
        'reference_beam_scores': [float(s) for s in beam_scores],
    }
    with open(OUT_GOLD, 'w') as f:
        json.dump(gold, f, indent=1, ensure_ascii=False)
    os.remove(train_tsv)
    print('goldens -> %s' % OUT_GOLD, flush=True)


if __name__ == '__main__':
    main()
