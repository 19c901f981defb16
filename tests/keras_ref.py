"""Build the genuine reference Keras model under tf_keras for interop tests.

The reference implementation (``/root/reference/ocrd_cor_asv_ann``) targets
Keras 2.3 / TF 1.15.  This module makes its *custom attention cell* —
``DenseAnnotationAttention``, the only non-standard layer in the model —
importable and runnable under the installed ``tf_keras`` (the Keras-2 API
package shipped with TF 2.x), and rebuilds the reference network topology
(reference lib/seq2seq.py:190-489) around it with genuine tf_keras layers.

The point: files written by ``tf_keras``'s own ``save_weights`` are real
Keras HDF5 artifacts (root ``layer_names`` attr, per-layer groups with
``weight_names``), and the attention/LSTM numerics come from original
Keras kernels — so tests built on this module prove that
``cor_asv_ann_tpu.utils.io_h5`` and the JAX model interoperate with the
actual reference format and semantics, not merely with files we wrote
ourselves.

Nothing from the reference is vendored: the cell class is imported from
the read-only reference checkout at test time and the tests skip when it
is unavailable.
"""

import os
import sys
import types

import numpy as np

REFERENCE_PATH = os.environ.get('CORASVANN_REFERENCE', '/root/reference')


def available():
    """True when the reference checkout and tf_keras are both present."""
    if not os.path.isdir(os.path.join(REFERENCE_PATH, 'ocrd_cor_asv_ann')):
        return False
    try:
        import tf_keras  # noqa: F401
    except ImportError:
        return False
    return True


# ---------------------------------------------------------------------------
# Keras-2.3 compatibility shims.  The reference attention layer imports a few
# internals that moved or changed signature between Keras 2.3 and tf_keras:
#   keras.engine.base_layer._collect_previous_mask  (mask plumbing; inputs
#       carry no masks in these tests, so None is the correct answer)
#   keras.engine.base_layer.disable_tracking        (a Keras-2.3 weight
#       bookkeeping workaround; identity under tf_keras)
#   keras.utils.generic_utils.to_list               (lost allow_tuple=)
#   K.arange                                        (tf_keras's version does a
#       Python bool test on the start value, which breaks on symbolic shapes)
# These must live in a real source file so tf.autograph can inspect them.
# ---------------------------------------------------------------------------

def _tf():
    import tensorflow as tf
    return tf


def collect_previous_mask(x):
    return None


def disable_tracking(func):
    return func


def to_list(x, allow_tuple=False):
    if isinstance(x, list):
        return x
    if allow_tuple and isinstance(x, tuple):
        return list(x)
    return [x]


def safe_arange(start, stop=None, step=1, dtype='int32'):
    if stop is None:
        start, stop = 0, start
    return _tf().range(start, stop, step, dtype=dtype)


_shimmed = False


def install_shims():
    """Alias `keras` to tf_keras and patch the moved internals."""
    global _shimmed
    if _shimmed:
        return
    import tensorflow as tf
    import tf_keras
    from tf_keras.src.utils.generic_utils import has_arg

    dnc = tf.autograph.experimental.do_not_convert
    tf_keras.backend.arange = safe_arange

    sys.modules['keras'] = tf_keras
    for sub in ('layers', 'initializers', 'regularizers', 'constraints',
                'backend', 'utils', 'models', 'optimizers', 'callbacks'):
        sys.modules['keras.' + sub] = getattr(tf_keras, sub)
    gen = types.ModuleType('keras.utils.generic_utils')
    gen.has_arg = has_arg
    gen.to_list = dnc(to_list)
    sys.modules['keras.utils.generic_utils'] = gen
    engine = types.ModuleType('keras.engine')
    base_layer = types.ModuleType('keras.engine.base_layer')
    base_layer._collect_previous_mask = dnc(collect_previous_mask)
    base_layer.disable_tracking = disable_tracking
    engine.base_layer = base_layer
    sys.modules['keras.engine'] = engine
    sys.modules['keras.engine.base_layer'] = base_layer
    if 'uniseg' not in sys.modules:
        try:
            import uniseg.wordbreak  # noqa: F401
        except ImportError:
            uniseg = types.ModuleType('uniseg')
            wordbreak = types.ModuleType('uniseg.wordbreak')
            wordbreak.words = lambda s: iter(s.split())
            uniseg.wordbreak = wordbreak
            sys.modules['uniseg'] = uniseg
            sys.modules['uniseg.wordbreak'] = wordbreak
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    _shimmed = True


def reference_attention_cell():
    """Import the genuine DenseAnnotationAttention from the reference."""
    install_shims()
    from ocrd_cor_asv_ann.lib.attention import DenseAnnotationAttention
    return DenseAnnotationAttention


_full_shimmed = False


def install_full_shims():
    """Extra shims for running the reference's full Sequence2Sequence
    class (configure/load/decode) under tf_keras:

    - ``keras.layers.CuDNNLSTM`` must be importable (never instantiated —
      the reference selects it only when a CUDA GPU is visible),
    - ``K.set_session`` / ``K.tensorflow_backend._get_available_gpus``
      are TF1-isms (no-op / no GPUs here),
    - TF2 rejects the reference's ``'transpose+softmax'`` Lambda layer
      name ('+' is not a valid scope char), so Lambda names are
      sanitized; Lambdas carry no weights, so save/load is unaffected.
    """
    global _full_shimmed
    install_shims()
    if _full_shimmed:
        return
    import re
    import tf_keras

    class _NoCuDNN:
        def __init__(self, *args, **kwargs):
            raise RuntimeError('CuDNNLSTM requires CUDA')

    tf_keras.layers.CuDNNLSTM = _NoCuDNN
    tf_keras.backend.set_session = lambda sess: None
    tf_keras.backend.tensorflow_backend = types.SimpleNamespace(
        _get_available_gpus=lambda: [])
    if not hasattr(tf_keras.backend, 'slice'):
        # TF1 K.slice (used by the reference's _regularise_chars,
        # seq2seq.py:540) was dropped from tf_keras.backend
        import tensorflow as tf
        tf_keras.backend.slice = tf.slice
    lambda_init = tf_keras.layers.Lambda.__init__

    def sanitizing_init(self, *args, **kwargs):
        if kwargs.get('name'):
            kwargs['name'] = re.sub(r'[^A-Za-z0-9_.\\/>-]', '_',
                                    kwargs['name'])
        lambda_init(self, *args, **kwargs)

    tf_keras.layers.Lambda.__init__ = sanitizing_init
    _full_shimmed = True


# static shape parameters consumed by the in-place cell patch below
# (the reference builds with runtime-length sources; tf_keras needs
# concrete state sizes, so tests fix the encoder length per run)
_cell_t_enc = None
_cell_attended = None
_cell_patched = False


def patch_reference_cell(t_enc, attended_size):
    """Patch the reference cell class *in place* for tf_keras RNN builds.

    tf_keras RNN layers call ``cell.build`` with only the per-step input
    shape (Keras 2.3 passed ``[input_shape, *constants_shapes]``), and
    require a concrete state size where the reference pins the alignment
    state size to None.  Patching methods on the original class (rather
    than subclassing + rebinding the module attribute) keeps the
    reference's internal ``super(DenseAnnotationAttention, ...)`` calls
    working.  All math and weights remain the reference's.
    """
    global _cell_t_enc, _cell_attended, _cell_patched
    _cell_t_enc = t_enc
    _cell_attended = attended_size
    if _cell_patched:
        return
    base = reference_attention_cell()
    orig_build = base.build

    def patched_build(self, input_shape):
        if not isinstance(input_shape, list):
            shape = (input_shape.as_list()
                     if hasattr(input_shape, 'as_list')
                     else list(input_shape))
            input_shape = [tuple(shape),
                           (None, _cell_t_enc, _cell_attended),
                           (None, _cell_t_enc, shape[-1])]
        orig_build(self, input_shape)

    base.build = patched_build
    base.state_size = property(
        lambda self: (self.cell.units, self.cell.units, _cell_t_enc))
    _cell_patched = True


def reference_s2s(model_path, t_enc):
    """Load a model file into the reference's own Sequence2Sequence.

    Runs the genuine reference code end-to-end — ``load_config``,
    ``configure`` (all three Keras graphs), ``load_weights`` (by-name +
    ``_resync_decoder``) — under tf_keras, returning the live object so
    tests can call its real ``decode_batch_greedy`` /
    ``decode_sequence_beam`` / ``correct_lines`` as the authoritative
    referee.  Only depth>=2 non-deep topologies: the reference's own
    inference decoder hardcodes the attended dim to ``width``
    (seq2seq.py:440 ``Input(shape=(None, self.width))``).
    """
    import logging
    install_full_shims()
    from ocrd_cor_asv_ann.lib.seq2seq import Sequence2Sequence
    s2s = Sequence2Sequence(logger=logging.getLogger('keras_ref'),
                            progbars=False)
    s2s.load_config(model_path)
    # h5 scalars load as np.int64, which tf_keras's shape conversion
    # treats as non-atomic (ValueError deep in cell.build); the
    # reference ran under Keras 2.3 which tolerated them
    s2s.width = int(s2s.width)
    s2s.depth = int(s2s.depth)
    s2s.voc_size = int(s2s.voc_size)
    s2s.stateful = bool(s2s.stateful)
    assert s2s.depth >= 2 and not s2s.deep_bidirectional_encoder
    patch_reference_cell(int(t_enc), int(s2s.width))
    s2s.configure()
    s2s.load_weights(model_path)
    patch_beam_broadcast(s2s)
    return s2s


def patch_beam_broadcast(s2s):
    """The reference's beam passes the attended sequence with batch 1
    alongside a fringe of N stacked hypothesis states, relying on
    Keras 2.3's implicit broadcast; tf_keras enforces cardinality, so
    materialize the broadcast (numerically identical)."""
    orig_pob = s2s.decoder_model.predict_on_batch

    def predict_on_batch(inputs):
        inputs = list(inputs)
        n = inputs[0].shape[0]
        for i in range(1, len(inputs)):
            if inputs[i].shape[0] == 1 and n > 1:
                inputs[i] = np.repeat(inputs[i], n, axis=0)
        return orig_pob(inputs)

    s2s.decoder_model.predict_on_batch = predict_on_batch


def _adapted_cell_class(width, t_enc, attended_size):
    """Subclass the reference cell with two tf_keras adaptations.

    - tf_keras RNN layers call ``cell.build`` with just the per-step input
      shape; Keras 2.3 passed ``[input_shape, *constants_shapes]``.  The
      constants shapes are statically known here, so re-supply them.
    - the reference pins ``attention_state_size = None`` (alignment over a
      runtime-length source); tf_keras requires concrete state sizes, so
      pin the encoder length, which is fixed per model instance anyway.
    Both adaptations change plumbing only — all math and weights are the
    reference's.
    """
    base = reference_attention_cell()

    class AdaptedAttention(base):
        def build(self, input_shape):
            if not isinstance(input_shape, list):
                shape = (input_shape.as_list()
                         if hasattr(input_shape, 'as_list')
                         else list(input_shape))
                input_shape = [tuple(shape),
                               (None, t_enc, attended_size),
                               (None, t_enc, width)]
            super().build(input_shape)

        @property
        def state_size(self):
            return (width, width, t_enc)

    return AdaptedAttention


class ReferenceKerasModel:
    """The reference network topology, built with tf_keras layers.

    Follows the reference configure() recipe (lib/seq2seq.py:190-489):
    tied char projection, biLSTM-first encoder (backward final states
    initialize the decoder), optional deep-bidirectional/residual/bridge
    variants, precomputed attention_dense half, and the reference's own
    attention cell on the top decoder layer.  Supports teacher-forced
    prediction and a greedy decode loop with raw-softmax feedback
    (reference decode_batch_greedy, seq2seq.py:1215-1286).
    """

    def __init__(self, config, t_enc):
        install_shims()
        import tf_keras
        from tf_keras import backend as K
        from tf_keras.layers import (
            Input, Dense, TimeDistributed, Lambda, RNN, LSTMCell, LSTM,
            Bidirectional, add)
        from tf_keras.models import Model
        import tensorflow as tf

        self.config = config
        self.t_enc = t_enc
        width, depth, voc = config.width, config.depth, config.voc_size
        deep = config.deep_bidirectional_encoder

        enc_in = Input(shape=(t_enc, voc), name='encoder_input')
        dec_in = Input(shape=(None, voc), name='decoder_input')
        char_embedding = Dense(width, use_bias=False, name='char_embedding')
        char_proj = TimeDistributed(char_embedding,
                                    name='char_input_projection')
        x = char_proj(enc_in)

        def cross_sum_fn(t):
            half = t.shape[-1] // 2
            flipped = tf.reverse(
                tf.reshape(t, [-1, t.shape[1], half, 2]), [-1])
            return t + tf.reshape(flipped, [-1, t.shape[1], t.shape[-1]])

        enc_states = []
        for n in range(depth):
            name = 'encoder_lstm_%d' % (n + 1)
            layer = LSTM(width, return_state=True, return_sequences=True,
                         recurrent_activation='sigmoid', name=name)
            if n == 0 or deep:
                inp = x if n == 0 else Lambda(cross_sum_fn)(x)
                x2, _fh, _fc, bh, bc = Bidirectional(layer, name=name)(inp)
                x, h, c = x2, bh, bc
            else:
                x2, h, c = layer(x)
                if config.residual_connections and n >= 2:
                    x = add([x2, x])
                else:
                    x = x2
            if config.bridge_dense:
                h = Dense(width, activation='tanh',
                          name='bridge_h_%d' % (n + 1))(h)
                c = Dense(width, activation='tanh',
                          name='bridge_c_%d' % (n + 1))(c)
            enc_states.append((h, c))
        attended = x
        att0 = Lambda(lambda t: K.zeros_like(t)[:, :, 0],
                      name='attention_state_init')(attended)
        attention_dense = TimeDistributed(Dense(width, use_bias=False),
                                          name='attention_dense')
        u = attention_dense(attended)

        y = char_proj(dec_in)
        for n in range(depth):
            name = 'decoder_lstm_%d' % (n + 1)
            h, c = enc_states[n]
            if n < depth - 1:
                layer = LSTM(width, return_state=True,
                             return_sequences=True,
                             recurrent_activation='sigmoid', name=name)
                y2, _, _ = layer(y, initial_state=[h, c])
            else:
                cell = _adapted_cell_class(width, t_enc,
                                           config.attended_size)(
                    LSTMCell(width, recurrent_activation='sigmoid'),
                    window_width=config.window_width,
                    input_mode='concatenate', output_mode='cell_output')
                layer = RNN(cell, return_state=True, return_sequences=True,
                            name=name)
                y2, _, _, _ = layer(y, initial_state=[h, c, att0],
                                    constants=[attended, u])
            if n > 0 and config.residual_connections:
                y = add([y2, y])
            else:
                y = y2
        out = TimeDistributed(
            Lambda(lambda t: K.softmax(
                K.dot(t, K.transpose(char_embedding.kernel)))),
            name='char_output_projection')(y)

        self.model = Model([enc_in, dec_in], out,
                           name='encoder_decoder_model')
        self.voc_size = voc
        self._tf_keras = tf_keras

    # -- weights ----------------------------------------------------------

    def set_from_pytree(self, params):
        """Install a cor_asv_ann_tpu parameter pytree into the Keras model."""
        config = self.config
        depth, deep = config.depth, config.deep_bidirectional_encoder
        by_layer = {}
        by_layer['char_input_projection'] = [
            params['char_embedding']['kernel']]
        by_layer['attention_dense'] = [params['attention_dense']['kernel']]
        for n in range(depth):
            lw = params['encoder'][n]
            if n == 0 or deep:
                by_layer['encoder_lstm_%d' % (n + 1)] = [
                    lw['fw']['kernel'], lw['fw']['recurrent_kernel'],
                    lw['fw']['bias'],
                    lw['bw']['kernel'], lw['bw']['recurrent_kernel'],
                    lw['bw']['bias']]
            else:
                by_layer['encoder_lstm_%d' % (n + 1)] = [
                    lw['kernel'], lw['recurrent_kernel'], lw['bias']]
        for n in range(depth):
            lw = params['decoder'][n]
            if n < depth - 1:
                by_layer['decoder_lstm_%d' % (n + 1)] = [
                    lw['kernel'], lw['recurrent_kernel'], lw['bias']]
            else:
                # reference attention-RNN weight order: wrapper weights
                # (W_a, v_a, b_UW, b_v) then wrapped-cell weights
                by_layer['decoder_lstm_%d' % (n + 1)] = [
                    lw['W_a'], lw['v_a'], lw['b_UW'], lw['b_v'],
                    lw['cell']['kernel'], lw['cell']['recurrent_kernel'],
                    lw['cell']['bias']]
        if config.bridge_dense:
            for n in range(depth):
                for s in ('h', 'c'):
                    bw = params['bridge'][n][s]
                    by_layer['bridge_%s_%d' % (s, n + 1)] = [
                        bw['kernel'], bw['bias']]
        for layer in self.model.layers:
            if layer.name in by_layer:
                layer.set_weights([np.asarray(w, np.float32)
                                   for w in by_layer[layer.name]])

    def save(self, path, mapping):
        """Save via genuine Keras save_weights + the reference config group
        (reference save(), lib/seq2seq.py:1121-1141)."""
        import h5py
        self.model.save_weights(path)
        with h5py.File(path, 'a') as f:
            group = f.create_group('config')
            group.create_dataset('width', data=np.array(self.config.width))
            group.create_dataset('depth', data=np.array(self.config.depth))
            group.create_dataset('stateful',
                                 data=np.array(self.config.stateful))
            group.create_dataset(
                'residual_connections',
                data=np.array(self.config.residual_connections))
            group.create_dataset(
                'deep_bidirectional_encoder',
                data=np.array(self.config.deep_bidirectional_encoder))
            group.create_dataset('bridge_dense',
                                 data=np.array(self.config.bridge_dense))
            group.create_dataset('mapping', data=mapping.to_codepoints())

    # -- inference --------------------------------------------------------

    def predict(self, enc_input, dec_input):
        """Teacher-forced probabilities (B, Td, V)."""
        return np.asarray(self.model.predict_on_batch(
            [np.asarray(enc_input, np.float32),
             np.asarray(dec_input, np.float32)]))

    def greedy(self, enc_input, newline_idx, max_steps=None):
        """Greedy decode with raw-softmax feedback, by prefix re-run.

        Each step re-runs the teacher-forced model on the feedback
        sequence so far and appends the last softmax output — numerically
        identical to the reference's stepwise decoder-model loop
        (the recurrence is deterministic in the prefix), without needing
        the resynced inference decoder.  Argmax excludes index 0 like the
        reference (seq2seq.py:1250).
        Returns list of index lists (newline included when produced).
        """
        enc_input = np.asarray(enc_input, np.float32)
        B = enc_input.shape[0]
        steps = max_steps or 2 * enc_input.shape[1]
        dec = np.zeros((B, 1, self.voc_size), np.float32)
        done = np.zeros(B, bool)
        out = [[] for _ in range(B)]
        for _ in range(steps):
            probs = self.predict(enc_input, dec)
            feedback = probs[:, -1]
            idx = feedback[:, 1:].argmax(axis=1) + 1
            for j in range(B):
                if not done[j]:
                    out[j].append(int(idx[j]))
                    if idx[j] == newline_idx:
                        done[j] = True
            if done.all():
                break
            dec = np.concatenate([dec, feedback[:, None, :]], axis=1)
        return out
