"""End-to-end interop with genuinely Keras-written HDF5 models.

These tests build the reference topology in tf_keras — including the
reference's own DenseAnnotationAttention cell imported from the read-only
reference checkout (tests/keras_ref.py) — install known weights, save with
Keras's real ``save_weights``, and then prove:

1. ``io_h5.load_config``/``load_weights`` reconstruct the exact parameter
   pytree from the genuine Keras file layout (gate packing, bidirectional
   forward/backward grouping, attention weight names),
2. teacher-forced probabilities of the JAX model match the Keras graph,
3. greedy decodes byte-match the Keras model's own raw-softmax-feedback
   decode loop,
4. files written by ``io_h5.save_model`` load back into the tf_keras
   model (round-trip in the other direction: the reference tool could
   consume models trained here).

Covers reference lib/seq2seq.py:1121-1174 (save/load), :216-314 (layer
naming and CPU-LSTM semantics), and lib/attention.py:440-621 (cell).
"""

import numpy as np
import pytest

import keras_ref
from conftest import make_onehot_batch

from cor_asv_ann_tpu.models import seq2seq
from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.utils import io_h5
from cor_asv_ann_tpu.utils.data import CharMapping

pytestmark = pytest.mark.skipif(
    not keras_ref.available(),
    reason='reference checkout or tf_keras unavailable')

CHARS = "abcdefghij .,\n"
LINES = ["abba dig.\n", "chef i gad.\n", "hi.\n", "jiffa be.\n"]
T_ENC = 12


def _setup(sharpen=1.0, **kwargs):
    mapping = CharMapping.from_texts([CHARS])
    kwargs.setdefault('depth', 2)
    config = Seq2SeqConfig(width=8, voc_size=mapping.voc_size, **kwargs)
    params = init_params(config, seed=11)
    if sharpen != 1.0:
        params['char_embedding']['kernel'] = (
            params['char_embedding']['kernel'] * sharpen)
    return config, mapping, params


def _teacher_batch(mapping, lines, pad_to):
    """(enc_input, dec_input) with the shifted teacher-forcing input."""
    enc = make_onehot_batch(mapping, lines, pad_to=pad_to)
    dec = np.zeros_like(enc)
    dec[:, 1:, :] = enc[:, :-1, :]
    return enc, dec


VARIANTS = [
    {},
    {'depth': 1},
    {'depth': 3},
    {'depth': 3, 'residual_connections': True},
    {'deep_bidirectional_encoder': True},
    {'bridge_dense': True},
]


@pytest.mark.parametrize('kwargs', VARIANTS)
def test_load_keras_written_file(tmp_path, kwargs):
    """A file written by genuine Keras save_weights loads into the exact
    same pytree that was installed into the Keras model."""
    config, mapping, params = _setup(**kwargs)
    krs = keras_ref.ReferenceKerasModel(config, T_ENC)
    krs.set_from_pytree(params)
    path = str(tmp_path / 'model.h5')
    krs.save(path, mapping)

    loaded_config, loaded_mapping = io_h5.load_config(path)
    assert loaded_config == config
    assert loaded_mapping.c2i == mapping.c2i

    loaded = io_h5.load_weights(path, loaded_config)

    import jax
    flat_exp, tree_exp = jax.tree_util.tree_flatten(params)
    flat_got, tree_got = jax.tree_util.tree_flatten(loaded)
    assert tree_exp == tree_got
    for exp, got in zip(flat_exp, flat_got):
        np.testing.assert_array_equal(np.asarray(exp, np.float32),
                                      np.asarray(got, np.float32))


@pytest.mark.parametrize('kwargs', VARIANTS)
def test_teacher_forced_probs_match_keras(tmp_path, kwargs):
    """JAX forward on weights loaded from a Keras-written file reproduces
    the Keras graph's teacher-forced probabilities."""
    config, mapping, params = _setup(**kwargs)
    krs = keras_ref.ReferenceKerasModel(config, T_ENC)
    krs.set_from_pytree(params)
    path = str(tmp_path / 'model.h5')
    krs.save(path, mapping)
    loaded = io_h5.load_weights(path, config)

    enc, dec = _teacher_batch(mapping, LINES, T_ENC)
    probs_keras = krs.predict(enc, dec)
    probs_jax = np.asarray(seq2seq.forward_teacher(loaded, config, enc, dec))
    np.testing.assert_allclose(probs_jax, probs_keras, atol=2e-5)


def test_greedy_decode_bytematch_keras(tmp_path):
    """Greedy decodes on a Keras-written model byte-match the Keras
    model's own raw-softmax-feedback decode."""
    config, mapping, params = _setup(sharpen=400.0)
    krs = keras_ref.ReferenceKerasModel(config, T_ENC)
    krs.set_from_pytree(params)
    path = str(tmp_path / 'model.h5')
    krs.save(path, mapping)
    loaded = io_h5.load_weights(path, config)

    enc = make_onehot_batch(mapping, LINES, pad_to=T_ENC)
    newline = mapping.get('\n')
    keras_seqs = krs.greedy(enc, newline)

    idx, _prob, length, _score, _ = seq2seq.decode_greedy(
        loaded, config, enc, newline)
    idx, length = np.asarray(idx), np.asarray(length)
    jax_seqs = [[int(i) for i in idx[j, :length[j]]]
                for j in range(len(LINES))]
    assert jax_seqs == keras_seqs


def test_keras_loads_io_h5_written_file(tmp_path):
    """The reverse direction: a file written by io_h5.save_model loads
    into the tf_keras reference model via Keras's own by-name loader and
    produces identical outputs (the reference tool can consume models
    trained in this framework)."""
    config, mapping, params = _setup()
    path = str(tmp_path / 'ours.h5')
    io_h5.save_model(path, params, config, mapping)

    krs = keras_ref.ReferenceKerasModel(config, T_ENC)
    krs.model.load_weights(path, by_name=True)

    enc, dec = _teacher_batch(mapping, LINES, T_ENC)
    probs_keras = krs.predict(enc, dec)
    probs_jax = np.asarray(seq2seq.forward_teacher(params, config, enc, dec))
    np.testing.assert_allclose(probs_jax, probs_keras, atol=2e-5)


@pytest.mark.parametrize('rejection', [0.3, 0.5])
def test_beam_decode_matches_real_reference(tmp_path, rejection):
    """The device beam byte-matches the REFERENCE'S OWN decode_sequence_beam
    (the genuine code from the reference checkout, running its three Keras
    graphs under tf_keras via keras_ref.reference_s2s) on every line and
    every banked solution — the authoritative beam-parity referee.

    Covers reference seq2seq.py:1356-1544 (A* queue, rejection boosts,
    final skim, early stop) end to end; rejection 0.5 (the proc/eval CLI
    default) stresses the longer rejection chains."""
    import numpy as np
    from cor_asv_ann_tpu.models import beam

    config, mapping, params = _setup(sharpen=400.0)
    path = str(tmp_path / 'model.h5')
    io_h5.save_model(path, params, config, mapping)
    s2s = keras_ref.reference_s2s(path, t_enc=T_ENC)
    s2s.rejection_threshold = rejection
    s2s.beam_width_in = 6
    s2s.beam_threshold_in = 0.2
    s2s.beam_width_out = 4
    s2s.batch_size = 8

    enc = make_onehot_batch(mapping, LINES, pad_to=T_ENC)
    src_len = np.full(len(LINES), T_ENC, np.int32)
    bp = beam.BeamParams(reservoir=192, expand=8, beam_width_in=6,
                         beam_width_out=4, rejection_threshold=rejection)
    out = {k: np.asarray(v) for k, v in beam.decode_beam(
        params, config, bp, enc, mapping.get('\n'), src_len).items()}

    for j in range(len(LINES)):
        gen = s2s.decode_sequence_beam(source_seq=enc[j])
        ref_solutions = []
        for _ in range(int(out['count'][j])):
            try:
                txt, _probs, score, _al = next(gen)
            except StopIteration:
                break
            ref_solutions.append((txt, score))
        dev_solutions = []
        for f in range(int(out['count'][j])):
            L = int(out['length'][j, f])
            txt = ''.join(mapping.i2c[int(i)]
                          for i in out['idx'][j, f, :L])
            dev_solutions.append((txt, float(out['cum'][j, f]) / L))
        assert [t for t, _ in dev_solutions[:len(ref_solutions)]] == \
            [t for t, _ in ref_solutions], (j, dev_solutions, ref_solutions)
        for (dt, ds), (rt, rs) in zip(dev_solutions, ref_solutions):
            np.testing.assert_allclose(ds, rs, atol=2e-2)
