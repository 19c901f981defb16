"""Training variants: LM multi-task loss, scheduled sampling, transfer
freezing, lm_predict beam — smoke + behavior tests."""

import numpy as np
import jax
import pytest

from cor_asv_ann_tpu.models import train as T
from cor_asv_ann_tpu.models import beam
from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.utils.data import CharMapping, vectorize_lines

from conftest import make_onehot_batch


@pytest.fixture(scope='module')
def setup():
    mapping = CharMapping.from_texts(["abcd \n"])
    config = Seq2SeqConfig(width=8, depth=2, voc_size=mapping.voc_size,
                           dropout=0.2)
    params = init_params(config, seed=0)
    enc, dec_in, dec_out, w = vectorize_lines(
        mapping, ["abcd\n", "dcba\n"], ["abcd\n", "dcba\n"],
        bucketed=False)
    return mapping, config, params, (enc, dec_in, dec_out, w)


def test_lm_loss_step(setup):
    mapping, config, params, (enc, dec_in, dec_out, w) = setup
    opt = T.make_optimizer()
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(0)
    p1, _, loss = T.train_step(params, opt_state, config, enc, dec_in,
                               dec_out, w, rng, lm_loss=True, optimizer=opt)
    base = T.loss_fn(params, config, enc, dec_in, dec_out, w, rng, False)
    # combined loss is larger than the single-output loss
    assert float(loss) > float(base)
    assert np.isfinite(float(loss))


def test_dropout_train_step_finite(setup):
    mapping, config, params, (enc, dec_in, dec_out, w) = setup
    opt = T.make_optimizer()
    opt_state = opt.init(params)
    rng = jax.random.PRNGKey(1)
    _, _, loss = T.train_step(params, opt_state, config, enc, dec_in,
                              dec_out, w, rng, lm_loss=False, optimizer=opt)
    assert np.isfinite(float(loss))


def test_sample_ratio_curves():
    assert T.sample_ratio('linear', 1, 100) == 0
    assert T.sample_ratio('linear', 100, 100) == 3.0
    assert 0 < T.sample_ratio('sigmoid', 50, 100) <= 1
    assert 0.99 < T.sample_ratio('exponential', 50, 100) <= 1
    with pytest.raises(ValueError):
        T.sample_ratio('bogus', 1, 10)


def test_scheduled_sample_replaces_lines(setup):
    mapping, config, params, (enc, dec_in, dec_out, w) = setup
    np.random.seed(0)
    out = T._scheduled_sample(params, config, mapping, enc, dec_in,
                              ratio=1.0, newline=mapping.get('\n'))
    assert out.shape == dec_in.shape
    # start symbol stays zero; underspecification never fed
    assert np.all(out[:, 0] == 0)
    assert np.all(out[:, :, 0] == 0)
    # with ratio 0 nothing changes
    same = T._scheduled_sample(params, config, mapping, enc, dec_in,
                               ratio=0.0, newline=mapping.get('\n'))
    np.testing.assert_array_equal(same, dec_in)


def test_frozen_mask_zeroes_layers(setup):
    mapping, config, params, _ = setup
    mask = T.frozen_gradient_mask(params, ['encoder_lstm_1',
                                           'decoder_lstm_1'], config.depth)
    assert float(mask['encoder'][0]['fw']['kernel']) == 0
    assert float(mask['decoder'][0]['kernel']) == 0
    assert float(mask['decoder'][1]['cell']['kernel']) == 1
    assert float(mask['char_embedding']['kernel']) == 1


def test_lm_predict_beam_runs(setup):
    mapping, config, params, _ = setup
    import copy
    params = copy.deepcopy(params)
    params['char_embedding']['kernel'] = \
        params['char_embedding']['kernel'] * 400.0
    lines = ["abcd\n", "dcba\n"]
    enc = make_onehot_batch(mapping, lines, pad_to=8)
    src_len = np.array([5, 5], np.int32)
    bp = beam.BeamParams(reservoir=16, expand=4, beam_width_in=4,
                         beam_width_out=2, lm_predict=True)
    out = {k: np.asarray(v) for k, v in beam.decode_beam(
        params, config, bp, enc, mapping.get('\n'), src_len).items()}
    # LM rating may exhaust the budget before any final bubbles to the
    # top of the queue (the reference then yields nothing and the API
    # echoes the input); any solutions that ARE produced must be
    # well-formed newline-terminated sequences
    nl = mapping.get('\n')
    for j in range(2):
        assert 0 <= out['count'][j] <= 2
        for f in range(out['count'][j]):
            L = out['length'][j, f]
            assert out['idx'][j, f, L - 1] == nl
    # a random sharpened "LM" may rate the newline astronomically low,
    # so lm_predict legitimately yields nothing (the reference hits
    # StopIteration and the API echoes); without LM rating the same
    # search banks solutions within the full padded budget
    src_len8 = np.array([8, 8], np.int32)
    bp_nolm = beam.BeamParams(reservoir=16, expand=4, beam_width_in=4,
                              beam_width_out=2, lm_predict=False)
    out8 = {k: np.asarray(v) for k, v in beam.decode_beam(
        params, config, bp_nolm, enc, mapping.get('\n'), src_len8).items()}
    assert out8['count'].max() >= 1


def test_bf16_train_step_converges(setup):
    """Mixed-precision training step: finite loss, same trend as f32."""
    mapping, config, params, (enc, dec_in, dec_out, w) = setup
    import copy
    opt = T.make_optimizer(1e-2)
    results = {}
    for dtype in (None, 'bfloat16'):
        p = copy.deepcopy(params)
        st = opt.init(p)
        rng = jax.random.PRNGKey(0)
        for i in range(30):
            rng, sub = jax.random.split(rng)
            p, st, loss = T.train_step(p, st, config, enc, dec_in,
                                       dec_out, w, sub, lm_loss=False,
                                       optimizer=opt, compute_dtype=dtype)
        results[dtype] = float(loss)
    assert np.isfinite(results['bfloat16'])
    # both reach a similar loss region
    assert abs(results[None] - results['bfloat16']) < 0.5, results


def test_checkpoint_resume(tmp_path):
    """Training state (incl. optimizer moments) persists and resumes —
    a capability the reference lacks."""
    import pathlib
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    data = tmp_path / 'train.tsv'
    rows = [f"{w}\t{w.upper()}" for w in ('ab', 'ba', 'aab', 'bba') * 8]
    data.write_text('\n'.join(rows) + '\n')
    ckpt = tmp_path / 'ckpt'
    ckpt.mkdir()

    s2s = Sequence2Sequence()
    s2s.width, s2s.depth, s2s.batch_size = 8, 2, 8
    s2s.epochs = 2
    s2s.configure()
    h1 = s2s.train([str(data)], checkpoint_dir=str(ckpt))
    assert (ckpt / 'train_state.pkl').exists()
    loss_after_2 = h1['loss'][-1]

    s2s2 = Sequence2Sequence()
    s2s2.width, s2s2.depth, s2s2.batch_size = 8, 2, 8
    s2s2.epochs = 4
    s2s2.mapping = s2s.mapping
    s2s2.configure()
    h2 = s2s2.train([str(data)], checkpoint_dir=str(ckpt), resume=True)
    # resumed run covers epochs 3..4 only and keeps improving
    assert len(h2['loss']) <= 2
    assert h2['loss'][-1] <= loss_after_2 + 0.1

    # a stale train_state.pkl from an unrelated run (different topology
    # or dataset) must be ignored, not crash the resumed run
    s2s3 = Sequence2Sequence()
    s2s3.width, s2s3.depth, s2s3.batch_size = 16, 2, 8   # other width
    s2s3.epochs = 1
    s2s3.mapping = s2s.mapping
    s2s3.configure()
    h3 = s2s3.train([str(data)], checkpoint_dir=str(ckpt), resume=True)
    assert s2s3.status == 2
    assert np.isfinite(h3['loss'][-1])
    # same topology but a different (larger) dataset: the restored split
    # no longer covers the line count and must be regenerated
    data2 = tmp_path / 'train2.tsv'
    rows2 = [f"{w}\t{w.upper()}" for w in ('ab', 'ba', 'aab', 'bba') * 24]
    data2.write_text('\n'.join(rows2) + '\n')
    s2s4 = Sequence2Sequence()
    s2s4.width, s2s4.depth, s2s4.batch_size = 8, 2, 8
    s2s4.epochs = 4
    s2s4.mapping = s2s.mapping
    s2s4.configure()
    h4 = s2s4.train([str(data2)], checkpoint_dir=str(ckpt), resume=True)
    assert s2s4.status == 2
    assert np.isfinite(h4['loss'][-1])


def test_keras_sampling_quirk_zeroes_teacher_input():
    """With keras_sampling, sampled lines get ZERO teacher input (the
    reference's uint32-truncated feedback, seq2seq.py:1236-1252)."""
    import numpy as np
    from cor_asv_ann_tpu.models import train as T
    from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
    from cor_asv_ann_tpu.utils.data import CharMapping
    mapping = CharMapping.from_texts(["ab\n"])
    config = Seq2SeqConfig(width=4, depth=1, voc_size=mapping.voc_size)
    params = init_params(config, seed=0)
    B, Td, V = 4, 6, mapping.voc_size
    enc = np.zeros((B, 8, V), np.float32)
    enc[:, 0, 1] = 1.0
    dense = np.zeros((B, Td, V), np.float32)
    dense[:, :, 2] = 1.0
    np.random.seed(0)
    out = T._scheduled_sample(params, config, mapping, enc, dense,
                              ratio=1.0, newline=mapping.get('\n'),
                              keras_quirk=True)
    assert (out == 0).all()
    idxb = np.full((B, Td), 2, np.int32)
    np.random.seed(0)
    out2 = T._scheduled_sample(params, config, mapping, enc, idxb,
                               ratio=1.0, newline=mapping.get('\n'),
                               keras_quirk=True)
    assert (out2 == -1).all()


def test_keras_dropout_masks_shared_over_batch():
    """config.keras_dropout shares HL dropout masks over the batch
    (reference Dropout(noise_shape=(1, dim))): every sample must see
    the same dropped channels."""
    import numpy as np
    import jax
    from cor_asv_ann_tpu.models import seq2seq
    from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
    from cor_asv_ann_tpu.utils.data import CharMapping
    mapping = CharMapping.from_texts(["abcd\n"])
    config = Seq2SeqConfig(width=8, depth=2, voc_size=mapping.voc_size,
                           dropout=0.5, keras_dropout=True)
    params = init_params(config, seed=1)
    B, T, V = 4, 6, mapping.voc_size
    enc = np.zeros((B, T, V), np.float32)
    enc[:, :, 1] = 1.0  # identical lines
    rng = jax.random.PRNGKey(3)
    out, _, _ = seq2seq.encode(params, config, enc, dropout_rng=rng,
                               train=True)
    out = np.asarray(out)
    # identical inputs + batch-shared masks => identical outputs
    for j in range(1, B):
        np.testing.assert_array_equal(out[0], out[j])
    # per-sample masks (default) must differ across the batch
    config2 = Seq2SeqConfig(width=8, depth=2, voc_size=mapping.voc_size,
                            dropout=0.5)
    out2 = np.asarray(seq2seq.encode(params, config2, enc,
                                     dropout_rng=rng, train=True)[0])
    assert any((out2[0] != out2[j]).any() for j in range(1, B))
