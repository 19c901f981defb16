"""Model configuration and parameter initialization.

The parameter pytree layout is shared between the NumPy golden reference
(lib/numpy_ref.py) and the JAX/TPU model (models/seq2seq.py):

    params = {
      'char_embedding': {'kernel': (V, W)},            # tied in/out projection
      'attention_dense': {'kernel': (A, W)},           # precomputed u = enc.A
      'encoder': [ {'fw': LSTMW, 'bw': LSTMW} | LSTMW, ... ],   # depth entries
      'decoder': [ LSTMW, ..., {'cell': LSTMW, 'W_a': (W,W), 'v_a': (W,1),
                                'b_UW': (W,), 'b_v': (1,)} ],   # depth entries
      'bridge': [ {'h': DENSEW, 'c': DENSEW}, ... ],   # only if bridge_dense
    }
    LSTMW  = {'kernel': (in, 4W), 'recurrent_kernel': (W, 4W), 'bias': (4W,)}
    DENSEW = {'kernel': (in, out), 'bias': (out,)}

Gate order is Keras (i, f, c~, o) so reference HDF5 weights drop straight in
(reference lib/seq2seq.py:190-489; topology knobs :108-179).
"""

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class Seq2SeqConfig:
    width: int = 512
    depth: int = 2
    voc_size: int = 1
    residual_connections: bool = False
    deep_bidirectional_encoder: bool = False
    bridge_dense: bool = False
    window_width: int = 5
    dropout: float = 0.2
    stateful: bool = False
    # use the fused Pallas LSTM-step kernel (ops/pallas_lstm.py) for the
    # per-step decode cells instead of the XLA-fused jnp ops
    use_pallas_lstm: bool = False
    # mask the encoder recurrence and attention at true line lengths so
    # results are independent of padded length and batchmates (the
    # reference runs padding through the recurrence, which couples model
    # behavior to the padding distribution; the high-level API enables
    # this, the raw functions default to reference parity)
    mask_padding: bool = False
    # share the hidden-layer variational dropout masks over the BATCH as
    # well as time, like the reference's Dropout(noise_shape=(1, dim))
    # (seq2seq.py:296-298, 365-367); the default draws per-sample masks
    # (a strictly better regularizer) — set True to reproduce reference
    # training trajectories exactly
    keras_dropout: bool = False

    @property
    def attended_size(self):
        """Dim of the top encoder output (the attended sequence)."""
        if self.depth == 1 or self.deep_bidirectional_encoder:
            return 2 * self.width
        return self.width

    def as_dict(self):
        return dataclasses.asdict(self)


def _glorot(rng, shape):
    limit = np.sqrt(6.0 / (shape[0] + shape[-1]))
    return rng.uniform(-limit, limit, shape).astype(np.float32)


def _orthogonal(rng, shape):
    a = rng.normal(0.0, 1.0, (shape[0], shape[0]))
    q, r = np.linalg.qr(a)
    q = q * np.sign(np.diag(r))
    return np.tile(q, (1, shape[1] // shape[0]))[:, :shape[1]].astype(np.float32)


def _lstm_weights(rng, input_dim, units):
    """Keras LSTM defaults: glorot kernel, orthogonal recurrent per gate,
    zero bias with unit forget bias."""
    rk = np.concatenate(
        [_orthogonal(rng, (units, units)) for _ in range(4)], axis=1)
    bias = np.zeros(4 * units, np.float32)
    bias[units:2 * units] = 1.0  # unit_forget_bias
    return {'kernel': _glorot(rng, (input_dim, 4 * units)),
            'recurrent_kernel': rk,
            'bias': bias}


def init_params(config: Seq2SeqConfig, seed=0):
    """Initialize a parameter pytree of NumPy arrays."""
    rng = np.random.default_rng(seed)
    W, V, d = config.width, config.voc_size, config.depth
    deep = config.deep_bidirectional_encoder
    params = {
        'char_embedding': {
            'kernel': rng.normal(0.0, 0.001, (V, W)).astype(np.float32)},
        'attention_dense': {
            'kernel': _glorot(rng, (config.attended_size, W))},
        'encoder': [],
        'decoder': [],
    }
    for n in range(d):
        if n == 0 or deep:
            in_dim = W if n == 0 else 2 * W
            params['encoder'].append({'fw': _lstm_weights(rng, in_dim, W),
                                      'bw': _lstm_weights(rng, in_dim, W)})
        else:
            in_dim = 2 * W if n == 1 else W
            params['encoder'].append(_lstm_weights(rng, in_dim, W))
    for n in range(d - 1):
        params['decoder'].append(_lstm_weights(rng, W, W))
    params['decoder'].append({
        'cell': _lstm_weights(rng, W + config.attended_size, W),
        'W_a': _glorot(rng, (W, W)),
        'v_a': _glorot(rng, (W, 1)),
        'b_UW': np.zeros(W, np.float32),
        'b_v': np.zeros(1, np.float32),
    })
    if config.bridge_dense:
        params['bridge'] = [
            {'h': {'kernel': _glorot(rng, (W, W)),
                   'bias': np.zeros(W, np.float32)},
             'c': {'kernel': _glorot(rng, (W, W)),
                   'bias': np.zeros(W, np.float32)}}
            for _ in range(d)]
    return params
