"""Cross-validate the NumPy golden reference against real Keras LSTMs.

The whole parity chain rests on lib/numpy_ref.py encoding exactly the
Keras LSTM semantics the reference model was trained with (gate order
i,f,c~,o; sigmoid recurrent activation; backward-state conventions of
Bidirectional). Here we verify that against the *installed* TensorFlow /
Keras implementation directly (runs on host CPU, no JAX involved).
"""

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from cor_asv_ann_tpu.lib import numpy_ref  # noqa: E402


def make_lstm_weights(rng, in_dim, units):
    return {
        'kernel': rng.normal(0, 0.5, (in_dim, 4 * units)).astype(np.float32),
        'recurrent_kernel': rng.normal(
            0, 0.5, (units, 4 * units)).astype(np.float32),
        'bias': rng.normal(0, 0.5, (4 * units,)).astype(np.float32),
    }


def test_lstm_seq_matches_keras():
    rng = np.random.default_rng(0)
    B, T, D, N = 2, 7, 5, 4
    w = make_lstm_weights(rng, D, N)
    x = rng.normal(0, 1, (B, T, D)).astype(np.float32)

    layer = tf.keras.layers.LSTM(N, return_sequences=True,
                                 return_state=True,
                                 recurrent_activation='sigmoid')
    layer.build((None, T, D))
    layer.set_weights([w['kernel'], w['recurrent_kernel'], w['bias']])
    out_tf, h_tf, c_tf = layer(x)

    out_np, h_np, c_np = numpy_ref.lstm_seq(x, w)
    np.testing.assert_allclose(out_np, out_tf.numpy(), atol=1e-5)
    np.testing.assert_allclose(h_np, h_tf.numpy(), atol=1e-5)
    np.testing.assert_allclose(c_np, c_tf.numpy(), atol=1e-5)


def test_bidirectional_matches_keras():
    """Backward final states must be the states after consuming index 0
    (what the reference uses to initialize the decoder,
    seq2seq.py:277-281)."""
    rng = np.random.default_rng(1)
    B, T, D, N = 2, 6, 4, 3
    wf = make_lstm_weights(rng, D, N)
    wb = make_lstm_weights(rng, D, N)
    x = rng.normal(0, 1, (B, T, D)).astype(np.float32)

    layer = tf.keras.layers.Bidirectional(
        tf.keras.layers.LSTM(N, return_sequences=True, return_state=True,
                             recurrent_activation='sigmoid'))
    layer.build((None, T, D))
    layer.set_weights([wf['kernel'], wf['recurrent_kernel'], wf['bias'],
                       wb['kernel'], wb['recurrent_kernel'], wb['bias']])
    out_tf, fh, fc, bh, bc = layer(x)

    fw_out, fw_h, fw_c = numpy_ref.lstm_seq(x, wf)
    bw_out, bw_h, bw_c = numpy_ref.lstm_seq(x, wb, reverse=True)
    np.testing.assert_allclose(
        np.concatenate([fw_out, bw_out], -1), out_tf.numpy(), atol=1e-5)
    np.testing.assert_allclose(fw_h, fh.numpy(), atol=1e-5)
    np.testing.assert_allclose(bw_h, bh.numpy(), atol=1e-5)
    np.testing.assert_allclose(bw_c, bc.numpy(), atol=1e-5)
