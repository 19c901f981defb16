"""HDF5 persistence: Keras-2-compatible layout round trips."""

import numpy as np
import jax
import pytest

from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.utils import io_h5
from cor_asv_ann_tpu.utils.data import CharMapping


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize('kwargs', [
    {},
    {'depth': 3, 'bridge_dense': True},
    {'deep_bidirectional_encoder': True},
])
def test_save_load_roundtrip(tmp_path, kwargs):
    mapping = CharMapping.from_texts(["abc def\n"])
    config = Seq2SeqConfig(width=8, voc_size=mapping.voc_size, **kwargs)
    params = init_params(config, seed=3)
    path = str(tmp_path / 'model.h5')
    io_h5.save_model(path, params, config, mapping)
    config2, mapping2 = io_h5.load_config(path)
    assert config2 == config
    assert mapping2.c2i == mapping.c2i
    params2 = io_h5.load_weights(path, config2)
    _tree_equal(params, params2)


def test_cudnn_bias_conversion(tmp_path):
    """A CuDNN-style double bias (8N,) must load as the summed (4N,) bias."""
    import h5py
    mapping = CharMapping.from_texts(["ab\n"])
    config = Seq2SeqConfig(width=4, depth=2, voc_size=mapping.voc_size)
    params = init_params(config, seed=0)
    path = str(tmp_path / 'model.h5')
    io_h5.save_model(path, params, config, mapping)
    with h5py.File(path, 'r+') as f:
        g = f['encoder_lstm_2']
        name = 'encoder_lstm_2/bias:0'
        old = np.asarray(g[name])
        del g[name]
        double = np.concatenate([old * 0.25, old * 0.75])
        g.create_dataset(name, data=double)
    params2 = io_h5.load_weights(path, config)
    np.testing.assert_allclose(params2['encoder'][1]['bias'], old, rtol=1e-6)


def test_transfer_from_lm(tmp_path):
    """An LM-style donor (top decoder layer without attention, kernel input
    dim W) transfers into the attention cell's first W kernel rows."""
    import h5py
    mapping = CharMapping.from_texts(["ab\n"])
    config = Seq2SeqConfig(width=4, depth=2, voc_size=mapping.voc_size)
    donor = init_params(config, seed=1)
    path = str(tmp_path / 'lm.h5')
    io_h5.save_model(path, donor, config, mapping)
    # rewrite decoder_lstm_2 as a plain LSTM with input dim W (LM layout)
    with h5py.File(path, 'r+') as f:
        del f['decoder_lstm_2']
        g = f.create_group('decoder_lstm_2')
        k = np.arange(4 * 16, dtype=np.float32).reshape(4, 16)
        rk = donor['decoder'][1]['cell']['recurrent_kernel']
        b = donor['decoder'][1]['cell']['bias']
        names = ['decoder_lstm_2/kernel:0', 'decoder_lstm_2/recurrent_kernel:0',
                 'decoder_lstm_2/bias:0']
        g.attrs['weight_names'] = np.array([n.encode() for n in names])
        g.create_dataset(names[0], data=k)
        g.create_dataset(names[1], data=rk)
        g.create_dataset(names[2], data=b)
    params = init_params(config, seed=2)
    before = params['decoder'][1]['cell']['kernel'].copy()
    params, mapping2, frozen = io_h5.load_transfer_weights(
        path, params, config)
    after = params['decoder'][1]['cell']['kernel']
    np.testing.assert_array_equal(after[:4], k)       # transferred rows
    np.testing.assert_array_equal(after[4:], before[4:])  # kept rows
    assert mapping2.c2i == mapping.c2i
    assert frozen == []


def test_transfer_from_shallower_freezes(tmp_path):
    mapping = CharMapping.from_texts(["ab\n"])
    donor_cfg = Seq2SeqConfig(width=4, depth=1, voc_size=mapping.voc_size)
    donor = init_params(donor_cfg, seed=1)
    path = str(tmp_path / 'shallow.h5')
    io_h5.save_model(path, donor, donor_cfg, mapping)
    config = Seq2SeqConfig(width=4, depth=2, voc_size=mapping.voc_size)
    params = init_params(config, seed=2)
    params, _, frozen = io_h5.load_transfer_weights(path, params, config)
    assert frozen == ['encoder_lstm_1', 'decoder_lstm_1']
    # donor layer 1 is bidirectional in both configs -> weights transferred
    np.testing.assert_array_equal(params['encoder'][0]['fw']['kernel'],
                                  donor['encoder'][0]['fw']['kernel'])


def test_load_relative_weight_names(tmp_path):
    """Keras 2 stores weight_names relative to the layer group (no outer
    prefix); the reader must handle that layout too."""
    import h5py
    mapping = CharMapping.from_texts(["ab\n"])
    config = Seq2SeqConfig(width=4, depth=2, voc_size=mapping.voc_size)
    params = init_params(config, seed=0)
    path = str(tmp_path / 'model.h5')
    io_h5.save_model(path, params, config, mapping)
    # rewrite encoder_lstm_2 with relative names
    with h5py.File(path, 'r+') as f:
        g = f['encoder_lstm_2']
        arrs = {}
        for name in list(g.attrs['weight_names']):
            name = name.decode()
            arrs[name.split('/')[-1]] = np.asarray(g[name])
            del g[name]
        g.attrs['weight_names'] = np.array(
            [k.encode() for k in arrs])
        for k, v in arrs.items():
            g.create_dataset(k, data=v)
    params2 = io_h5.load_weights(path, config)
    np.testing.assert_array_equal(params2['encoder'][1]['kernel'],
                                  params['encoder'][1]['kernel'])


def test_truncated_file_fails_loudly(tmp_path):
    """A weights file missing layer groups for the configured topology
    must raise (naming the missing layers) instead of silently returning
    a half-random model; partial=True downgrades to a warning."""
    import h5py
    mapping = CharMapping.from_texts(["ab\n"])
    config = Seq2SeqConfig(width=4, depth=2, voc_size=mapping.voc_size)
    params = init_params(config, seed=0)
    path = str(tmp_path / 'model.h5')
    io_h5.save_model(path, params, config, mapping)
    with h5py.File(path, 'r+') as f:
        del f['decoder_lstm_2']
    with pytest.raises(ValueError, match='decoder_lstm_2'):
        io_h5.load_weights(path, config)
    params2 = io_h5.load_weights(path, config, partial=True)
    np.testing.assert_array_equal(params2['encoder'][1]['bias'],
                                  params['encoder'][1]['bias'])


def test_incomplete_group_fails_loudly(tmp_path):
    """A layer group that exists but is missing weights inside (e.g.
    weight_names paths that resolve to no dataset) must be as loud as a
    missing group, not a silently half-random layer."""
    import h5py
    mapping = CharMapping.from_texts(["ab\n"])
    config = Seq2SeqConfig(width=4, depth=2, voc_size=mapping.voc_size)
    params = init_params(config, seed=0)
    path = str(tmp_path / 'model.h5')
    io_h5.save_model(path, params, config, mapping)
    with h5py.File(path, 'r+') as f:
        g = f['decoder_lstm_1']
        # drop one dataset but leave the group and its weight_names
        victim = [n.decode() for n in g.attrs['weight_names']
                  if n.decode().endswith('recurrent_kernel:0')][0]
        del g[victim]
    with pytest.raises(ValueError, match='decoder_lstm_1.*recurrent'):
        io_h5.load_weights(path, config)
    io_h5.load_weights(path, config, partial=True)  # downgraded


def test_transfer_positional_halves_encoder(tmp_path):
    """load_transfer_weights must load a bidirectional encoder donor
    whose weight paths lack 'forward'/'backward' markers (positional
    halves), like load_weights does."""
    import h5py
    mapping = CharMapping.from_texts(["ab\n"])
    config = Seq2SeqConfig(width=4, depth=1, voc_size=mapping.voc_size)
    donor = init_params(config, seed=3)
    path = str(tmp_path / 'donor.h5')
    io_h5.save_model(path, donor, config, mapping)
    with h5py.File(path, 'r+') as f:
        g = f['encoder_lstm_1']
        arrs = []
        for name in list(g.attrs['weight_names']):
            name = name.decode()
            arrs.append((name.split('/')[-1].split(':')[0],
                         np.asarray(g[name])))
            del g[name]
        # re-store fw then bw halves under direction-free auto-names
        # (Keras-style 'cell_<i>/kernel:0' paths, no forward/backward)
        names = []
        for i, (base, v) in enumerate(arrs):
            flat = 'cell_%d/%s:0' % (i // 3, base)
            g.create_dataset(flat, data=v)
            names.append(flat.encode())
        g.attrs['weight_names'] = np.array(names)
    fresh = init_params(config, seed=9)
    loaded, _, _ = io_h5.load_transfer_weights(path, fresh, config)
    np.testing.assert_array_equal(loaded['encoder'][0]['fw']['kernel'],
                                  donor['encoder'][0]['fw']['kernel'])
    np.testing.assert_array_equal(loaded['encoder'][0]['bw']['bias'],
                                  donor['encoder'][0]['bw']['bias'])
