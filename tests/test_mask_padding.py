"""Length-masked mode: results must be independent of padded length."""

import dataclasses

import numpy as np

from cor_asv_ann_tpu.models import seq2seq, beam
from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.utils.data import CharMapping

from conftest import make_onehot_batch

LINES = ["abba dig.\n", "chef i gad.\n", "hi.\n"]


def setup(mask=True):
    mapping = CharMapping.from_texts(["abcdefghij .,\n"])
    config = Seq2SeqConfig(width=16, voc_size=mapping.voc_size,
                           mask_padding=mask)
    params = init_params(config, seed=3)
    params['char_embedding']['kernel'] *= 400.0
    return mapping, config, params


def test_encode_pad_invariant():
    mapping, config, params = setup()
    enc1 = make_onehot_batch(mapping, LINES, pad_to=16)
    enc2 = make_onehot_batch(mapping, LINES, pad_to=48)
    out1, states1, u1 = seq2seq.encode(params, config, enc1)
    out2, states2, u2 = seq2seq.encode(params, config, enc2)
    np.testing.assert_allclose(np.asarray(out1),
                               np.asarray(out2)[:, :16], atol=1e-6)
    # outputs past the true length are exactly zero
    assert np.all(np.asarray(out2)[:, 16:] == 0)
    for (h1, c1), (h2, c2) in zip(states1, states2):
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   atol=1e-6)


def test_greedy_decode_pad_invariant():
    mapping, config, params = setup()
    newline = mapping.get('\n')
    outs = []
    for pad in (16, 48):
        enc = make_onehot_batch(mapping, LINES, pad_to=pad)
        idx, prob, length, score, _ = seq2seq.decode_greedy(
            params, config, enc, newline, max_steps=24)
        outs.append((np.asarray(idx)[:, :24], np.asarray(length),
                     np.asarray(score)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])
    np.testing.assert_allclose(outs[0][2], outs[1][2], atol=1e-5)


def test_beam_decode_pad_invariant():
    mapping, config, params = setup()
    newline = mapping.get('\n')
    src_len = np.array([len(l) for l in LINES], np.int32)
    bp = beam.BeamParams(reservoir=24, expand=4, beam_width_in=4,
                         beam_width_out=2)
    outs = []
    for pad in (16, 48):
        enc = make_onehot_batch(mapping, LINES, pad_to=pad)
        out = {k: np.asarray(v) for k, v in beam.decode_beam(
            params, config, bp, enc, newline, src_len,
            max_steps=24).items()}
        outs.append(out)
    np.testing.assert_array_equal(outs[0]['count'], outs[1]['count'])
    np.testing.assert_array_equal(outs[0]['idx'][:, :, :24],
                                  outs[1]['idx'][:, :, :24])


def test_unmasked_is_pad_dependent():
    """Sanity check that the parity (run-through) mode is actually pad
    dependent — the property masking removes."""
    mapping, config, params = setup(mask=False)
    enc1 = make_onehot_batch(mapping, LINES, pad_to=16)
    enc2 = make_onehot_batch(mapping, LINES, pad_to=48)
    _, states1, _ = seq2seq.encode(params, config, enc1)
    _, states2, _ = seq2seq.encode(params, config, enc2)
    h1 = np.asarray(states1[-1][0])
    h2 = np.asarray(states2[-1][0])
    assert np.abs(h1 - h2).max() > 1e-4


def test_api_keras_padding_mode():
    """s2s.keras_padding=True restores the reference's run-through
    numerics through the high-level API (for imported reference models)."""
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    from cor_asv_ann_tpu.lib import numpy_ref
    from cor_asv_ann_tpu.utils.data import vectorize_lines

    s2s = Sequence2Sequence()
    s2s.width, s2s.depth, s2s.batch_size = 16, 2, 8
    s2s.mapping, _ = s2s.mapping.grow(["abcdefghij .,\n"])
    s2s.keras_padding = True
    s2s.configure()
    assert s2s.config.mask_padding is False
    s2s.params['char_embedding']['kernel'] = \
        s2s.params['char_embedding']['kernel'] * 400.0
    s2s.status = 2
    lines = ["abba dig.\n", "hi.\n"]
    # pin the padded length to what the oracle sees
    enc, _, _, _ = s2s.vectorize_lines(lines, ['' for _ in lines])
    texts_np, _, _, _ = numpy_ref.decode_batch_greedy(
        s2s.params, s2s.config.as_dict(), s2s.mapping, enc)
    out, _, _, _ = s2s.correct_lines(lines, fast=True, greedy=True)
    assert out == texts_np
