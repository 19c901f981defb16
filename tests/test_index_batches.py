"""Compact (B, T) index batches vs dense (B, T, V) one-hot batches.

The index form (utils/data.py:vectorize_lines_indices,
lines_to_index_batch) must be an exact drop-in for the dense form at
every consumer: device one-hot expansion (seq2seq.py:ensure_onehot),
teacher-forced loss (train.py:weighted_xent index targets), greedy and
beam decoding, degradation and scheduled sampling.
"""

import numpy as np
import jax
import jax.numpy as jnp

from cor_asv_ann_tpu.models import seq2seq, train as T
from cor_asv_ann_tpu.models.beam import BeamParams, decode_beam
from cor_asv_ann_tpu.utils.data import (CharMapping, lines_to_index_batch,
                                        vectorize_lines,
                                        vectorize_lines_indices)

LINES_SRC = ["abba dig.\n", "chef i gad.\n", "hi.\n"]
LINES_TGT = ["abba dog.\n", "chef i gab.\n", "ho.\n"]


def test_index_vectorizer_matches_dense(tiny_setup):
    config, mapping, params = tiny_setup
    enc, dec_in, dec_out, w = vectorize_lines(mapping, LINES_SRC,
                                              LINES_TGT)
    ei, di, do, wi = vectorize_lines_indices(mapping, LINES_SRC,
                                             LINES_TGT)
    np.testing.assert_array_equal(w, wi)
    # device one-hot of the index form == host one-hot, bit for bit
    np.testing.assert_array_equal(
        enc, np.asarray(seq2seq.ensure_onehot(jnp.asarray(ei), config,
                                              params)))
    np.testing.assert_array_equal(
        dec_in, np.asarray(seq2seq.ensure_onehot(jnp.asarray(di), config,
                                                 params)))
    np.testing.assert_array_equal(
        dec_out, np.asarray(seq2seq.ensure_onehot(jnp.asarray(do), config,
                                                  params)))


def test_loss_identical_for_both_forms(tiny_setup):
    config, mapping, params = tiny_setup
    enc, dec_in, dec_out, w = vectorize_lines(mapping, LINES_SRC,
                                              LINES_TGT)
    ei, di, do, wi = vectorize_lines_indices(mapping, LINES_SRC,
                                             LINES_TGT)
    rng = jax.random.PRNGKey(0)
    dense = float(T.loss_fn(params, config, enc, dec_in, dec_out, w, rng))
    compact = float(T.loss_fn(params, config, ei, di, do, wi, rng))
    assert dense == compact


def test_decode_identical_for_both_forms(tiny_setup):
    config, mapping, params = tiny_setup
    import copy
    params = copy.deepcopy(params)
    params['char_embedding']['kernel'] = \
        params['char_embedding']['kernel'] * 400.0
    from conftest import make_onehot_batch
    enc = make_onehot_batch(mapping, LINES_SRC, pad_to=12)
    idx_batch = lines_to_index_batch(mapping, LINES_SRC, pad_to=12)
    newline = mapping.get('\n')
    d = seq2seq.decode_greedy(params, config, enc, newline)
    i = seq2seq.decode_greedy(params, config, idx_batch, newline)
    np.testing.assert_array_equal(np.asarray(d[0]), np.asarray(i[0]))
    np.testing.assert_array_equal(np.asarray(d[2]), np.asarray(i[2]))
    src_len = np.array([len(l) for l in LINES_SRC], np.int32)
    bd = decode_beam(params, config, BeamParams(), enc, newline, src_len)
    bi = decode_beam(params, config, BeamParams(), idx_batch, newline,
                     src_len)
    np.testing.assert_array_equal(np.asarray(bd['idx']),
                                  np.asarray(bi['idx']))


def test_degrade_and_sample_index_forms(tiny_setup):
    config, mapping, params = tiny_setup
    ei, di, do, wi = vectorize_lines_indices(mapping, LINES_SRC * 40,
                                             LINES_TGT * 40)
    for seed in range(50):             # ~1%/line: find a degrading draw
        np.random.seed(seed)
        deg = T._degrade_encoder(ei)
        assert deg.shape == ei.shape
        changed = deg != ei
        if changed.sum() >= 1:
            break
    assert changed.sum() >= 1
    assert np.all(deg[changed] == 0)   # degraded to underspecification
    newline = mapping.get('\n')
    np.random.seed(4)
    sampled = T._scheduled_sample(params, config, mapping, ei, di, 1.0,
                                  newline)
    assert sampled.shape == di.shape
    assert np.all(sampled[:, 0] == -1)       # start symbol stays zero row
    assert np.all(sampled >= -1)
    assert np.all(sampled != 0)              # never feeds underspec
