"""Training: jitted train step + autosized-epoch loop.

Reproduces the reference training regime (lib/seq2seq.py:590-649,
lib/keras_train.py:27-296) on TPU:

- categorical crossentropy with temporal sample weights (Keras semantics:
  sum(loss*w)/count(w != 0); seq2seq.py:491-497),
- Adam with *per-tensor* gradient norm clipping at 5 (Keras `clipnorm`),
  lr 1e-3, eps 1e-7,
- the underspecification regularizer on the character embedding: pull
  vector 0 to the (gradient-stopped) mean of the others, plus 0.01-weight
  unit-norm penalty on all rows; active in training only
  (seq2seq.py:530-553),
- random encoder degradation: ~1% of lines get one position zeroed to
  index 0 per batch (seq2seq.py:909-915),
- scheduled sampling with linear/sigmoid/exponential ratio curves and
  attenuation 3 (seq2seq.py:859-878); sampled lines get their teacher
  input replaced by the greedy-decoded output. Note: the reference
  actually fed the recorded feedback scores truncated through a uint32
  buffer (effectively zeros, seq2seq.py:1236-1252); we feed one-hot
  greedy outputs, matching the intent documented in seq2seq.py:1251 —
  `s2s.keras_sampling = True` reproduces the zero-input quirk instead
  (and `config.keras_dropout` the batch-shared dropout masks), so
  reference training trajectories can be replicated exactly,
- epochs are *discovered, not declared*: the generator yields an epoch
  marker, the first epoch measures the step count (keras_train.py:27-296),
- early stopping (patience 3, restore best weights), NaN termination,
  per-epoch weight checkpoints, graceful SIGINT stop
  (seq2seq.py:619-624, lib/callbacks.py:5-33),
- optional LM multi-task loss: a second unconditioned decoder pass with
  tied weights, summed loss (seq2seq.py:321-322, 383-385).
"""

import functools
import math
import os
import pickle
import signal

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..utils.data import (gen_line_batches, vectorize_lines,
                          vectorize_lines_indices)
from .seq2seq import forward_teacher, decode_greedy


def clip_per_tensor_norm(max_norm):
    """Keras-style `clipnorm`: clip each gradient tensor to max_norm."""
    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale
        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate=1e-3):
    return optax.chain(
        clip_per_tensor_norm(5.0),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-7),
        optax.scale(-learning_rate))


def embedding_regularizer(kernel):
    """Underspecification + unit-norm regularizer (seq2seq.py:530-553)."""
    vec0 = kernel[0]
    vecs = jax.lax.stop_gradient(jnp.mean(kernel[1:], axis=0))
    underspec = jnp.sum(jnp.square(vec0 - vecs))
    norms = jnp.sum(jnp.square(kernel), axis=1)
    lowrank = 0.01 * jnp.sum(jnp.square(1.0 - norms))
    return underspec + lowrank


def weighted_xent(probs, targets, weights):
    """Keras categorical crossentropy with temporal sample weights.

    `targets` may be dense one-hot (B, T, V) or compact indices (B, T)
    with -1 at padding (zero weight there anyway); the index form
    computes the identical -log p of the target character."""
    eps = 1e-7
    logp = jnp.log(jnp.clip(probs, eps, 1.0))
    if targets.ndim == 2:
        ll = -jnp.take_along_axis(
            logp, jnp.maximum(targets, 0)[..., None], axis=-1)[..., 0]
        ll = ll * (targets >= 0)
    else:
        ll = -jnp.sum(targets * logp, axis=-1)
    denom = jnp.maximum(jnp.sum(weights != 0), 1)
    return jnp.sum(ll * weights) / denom


def _data_loss(out, dec_out, weights, lm_loss):
    """Crossentropy over a forward_teacher result; with lm_loss, the sum
    of the conditioned and unconditioned passes (seq2seq.py:383-385)."""
    if lm_loss:
        probs, lm_probs = out
        return (weighted_xent(probs, dec_out, weights)
                + weighted_xent(lm_probs, dec_out, weights))
    return weighted_xent(out, dec_out, weights)


@functools.partial(jax.jit, static_argnames=('config', 'lm_loss'))
def loss_fn(params, config, enc, dec_in, dec_out, weights, rng,
            lm_loss=False):
    out = forward_teacher(params, config, enc, dec_in, dropout_rng=rng,
                          train=True, lm=lm_loss)
    loss = _data_loss(out, dec_out, weights, lm_loss)
    return loss + embedding_regularizer(params['char_embedding']['kernel'])


@functools.partial(jax.jit,
                   static_argnames=('config', 'lm_loss', 'optimizer',
                                    'compute_dtype'))
def train_step(params, opt_state, config, enc, dec_in, dec_out, weights,
               rng, frozen_mask=None, lm_loss=False, optimizer=None,
               compute_dtype=None):
    """One optimizer step. With compute_dtype='bfloat16' the forward and
    backward matmuls run in bf16 (float32 masters and accumulation —
    standard mixed precision; ~2x MXU throughput)."""
    if compute_dtype == 'bfloat16':
        def cast(t):
            return jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, t)

        def lossf(p):
            return loss_fn(cast(p), config, enc, dec_in, dec_out,
                           weights, rng, lm_loss)
    else:
        def lossf(p):
            return loss_fn(p, config, enc, dec_in, dec_out, weights,
                           rng, lm_loss)
    loss, grads = jax.value_and_grad(lossf)(params)
    grads = jax.tree_util.tree_map(
        lambda g: g.astype(jnp.float32), grads)
    if frozen_mask is not None:
        grads = jax.tree_util.tree_map(
            lambda g, m: g * m, grads, frozen_mask)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(jax.jit, static_argnames=('config', 'lm_loss'))
def eval_step(params, config, enc, dec_in, dec_out, weights,
              lm_loss=False):
    out = forward_teacher(params, config, enc, dec_in, train=False,
                          lm=lm_loss)
    return _data_loss(out, dec_out, weights, lm_loss)


def sample_ratio(schedule, epoch, epochs):
    """Scheduled-sampling ratio curves (seq2seq.py:859-878)."""
    attenuation = 3
    if schedule == 'linear':
        # max() guards single-epoch runs (the reference's bare
        # epochs - 1 divides by zero there); ratio is 0 either way
        return attenuation * (epoch - 1) / max(1, epochs - 1)
    if schedule == 'sigmoid':
        return 1 / (1 + math.exp(5 - 10 * attenuation * epoch / epochs))
    if schedule == 'exponential':
        return 1 - 0.9 ** (50 * attenuation * epoch / epochs)
    raise ValueError('unknown scheduled sampling curve %r' % schedule)


def frozen_gradient_mask(params, frozen_layers, depth):
    """1/0 multiplier pytree for transfer-frozen layers
    (reference freezes encoder/decoder_lstm_1..depth-1; seq2seq.py:1206-1211)."""
    mask = jax.tree_util.tree_map(lambda x: jnp.ones(()), params)
    for name in frozen_layers:
        kind, _, num = name.rpartition('_')
        n = int(num) - 1
        if kind == 'encoder_lstm':
            mask['encoder'][n] = jax.tree_util.tree_map(
                lambda x: jnp.zeros(()), mask['encoder'][n])
        elif kind == 'decoder_lstm':
            mask['decoder'][n] = jax.tree_util.tree_map(
                lambda x: jnp.zeros(()), mask['decoder'][n])
    return mask


class StopSignal:
    """First SIGINT: stop after the current epoch; second: re-raise
    (reference StopSignalCallback, lib/callbacks.py:5-33)."""

    def __init__(self, logger):
        self.logger = logger
        self.stopping = False
        self._prev = None

    def __enter__(self):
        def handler(sig, frame):
            if self.stopping:
                raise KeyboardInterrupt
            self.logger.info('stopping training at end of epoch '
                             '(interrupt again to abort)')
            self.stopping = True
        try:
            self._prev = signal.signal(signal.SIGINT, handler)
        except ValueError:  # not in main thread
            self._prev = None
        return self

    def __exit__(self, *exc):
        if self._prev is not None:
            signal.signal(signal.SIGINT, self._prev)
        return False


def _state_path(checkpoint_dir):
    return os.path.join(checkpoint_dir or '.', 'train_state.pkl')


def save_train_state(checkpoint_dir, params, opt_state, epoch, best_loss,
                     best_params, split):
    """Persist the full training state (incl. optimizer moments) for
    resume — a capability the reference lacks (SURVEY.md 5: 'no
    checkpoint-resume of optimizer state')."""
    to_np = lambda t: jax.tree_util.tree_map(np.asarray, t)
    state = dict(params=to_np(params), opt_state=to_np(opt_state),
                 epoch=epoch, best_loss=best_loss,
                 best_params=to_np(best_params), split=split)
    path = _state_path(checkpoint_dir)
    with open(path + '.tmp', 'wb') as f:
        pickle.dump(state, f)
    os.replace(path + '.tmp', path)


def load_train_state(checkpoint_dir):
    path = _state_path(checkpoint_dir)
    if not os.path.exists(path):
        return None
    with open(path, 'rb') as f:
        return pickle.load(f)


def train_model(s2s, filenames, val_filenames=None, checkpoint_dir='.',
                resume=False):
    """Full training orchestration for a Sequence2Sequence instance
    (reference seq2seq.py:590-649). With `resume=True`, continue from the
    train_state.pkl in `checkpoint_dir` (params, optimizer moments,
    epoch counter and validation split are all restored).

    When `s2s.mesh` is set (`use_mesh()`), training runs SPMD over the
    ('data', 'model') mesh: batches sharded over 'data' (data-parallel
    gradients — XLA GSPMD inserts the psum), wide parameter matrices
    over 'model'; optimizer state inherits the parameter shardings.
    The mesh is also published to seq2seq._TRAIN_MESH for the duration
    so the fused Pallas training scans launch per data shard
    (shard_map) instead of falling back to the XLA scan."""
    from . import seq2seq as _S
    old_mesh = _S._TRAIN_MESH
    _S._TRAIN_MESH = getattr(s2s, 'mesh', None)
    try:
        return _train_model_impl(s2s, filenames, val_filenames,
                                 checkpoint_dir, resume)
    finally:
        _S._TRAIN_MESH = old_mesh


def _train_model_impl(s2s, filenames, val_filenames, checkpoint_dir,
                      resume):
    logger = s2s.logger
    num_lines = s2s.map_files(filenames)
    logger.info('Training on %d files with %d lines', len(filenames),
                num_lines)
    if val_filenames:
        s2s.map_files(val_filenames)
        split = None
    else:
        logger.info('Validating on random 20%% of lines')
        split = np.random.uniform(0, 1, (num_lines,))

    config = s2s.config
    params = s2s.params
    train_compute = getattr(s2s, 'train_compute', None)
    if train_compute in ('bf16', 'bfloat16'):
        train_compute = 'bfloat16'
    elif train_compute in (None, 'float32', 'f32'):
        train_compute = None
    else:
        raise ValueError('unknown train_compute %r (use float32 or '
                         'bfloat16)' % (train_compute,))
    mesh = getattr(s2s, 'mesh', None)
    if mesh is not None:
        from ..parallel.mesh import shard_params, shard_batch, replicated
        import jax as _jax
        params = shard_params(params, mesh)
        logger.info('training over mesh %s', dict(mesh.shape))

        def to_device(arrays):
            if arrays[0].shape[0] % mesh.shape['data'] == 0:
                return shard_batch(arrays, mesh)
            # indivisible trailing batch: place replicated (same policy
            # as serving, api.py:_place_batch)
            return tuple(_jax.device_put(a, replicated(mesh))
                         for a in arrays)
    else:
        def to_device(arrays):
            return arrays
    optimizer = make_optimizer(getattr(s2s, 'learning_rate', 1e-3))
    opt_state = optimizer.init(params)
    frozen = getattr(s2s, 'frozen_layers', None)
    fmask = (frozen_gradient_mask(params, frozen, config.depth)
             if frozen else None)
    rng = jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
    newline = s2s.mapping.get('\n')

    def is_bad(src, tgt):
        s2s.aligner.set_seqs(src, tgt)
        return s2s.aligner.is_bad()

    best_loss = np.inf
    best_params = params
    patience = getattr(s2s, 'patience', 3)  # reference: EarlyStopping(3)
    bad_epochs = 0
    start_epoch = 1
    if resume and checkpoint_dir is not None:
        state = load_train_state(checkpoint_dir)
        if state is not None and not _tree_shapes_match(state['params'],
                                                        params):
            # a stale train_state.pkl from an unrelated run (different
            # topology/charset) must not be restored — start fresh
            logger.warning('train_state.pkl in %s does not match the '
                           'current model topology; ignoring it',
                           checkpoint_dir)
            state = None
        if state is not None:
            params = state['params']
            opt_state = state['opt_state']
            if mesh is not None:
                # re-place the restored parameters on the mesh; the
                # optimizer state follows from the first step's output
                # shardings (GSPMD reshards its inputs as needed)
                params = shard_params(params, mesh)
            best_loss = state['best_loss']
            best_params = state['best_params']
            start_epoch = state['epoch'] + 1
            if state.get('split') is not None:
                if val_filenames:
                    # explicit validation files: a checkpointed random
                    # split must not be restored (it would misalign
                    # gen_line_batches against this dataset)
                    pass
                elif len(state['split']) != num_lines:
                    logger.warning(
                        'restored validation split covers %d lines but '
                        'the dataset has %d; regenerating the split',
                        len(state['split']), num_lines)
                else:
                    split = state['split']
            logger.info('resuming training from epoch %d '
                        '(best val_loss %.4f)', start_epoch, best_loss)
        else:
            logger.warning('resume requested but no usable '
                           'train_state.pkl in %s', checkpoint_dir)
    history = {'loss': [], 'val_loss': []}
    with StopSignal(logger) as stop:
        for epoch in range(start_epoch, s2s.epochs + 1):
            ratio = (sample_ratio(s2s.scheduled_sampling, epoch, s2s.epochs)
                     if s2s.scheduled_sampling else 0.0)
            losses = []
            params_ref = [params]  # freshest params for scheduled sampling

            def batch_iter():
                """Vectorize batches on a host thread (the reference's
                generator worker processes, keras_train.py:133-150)."""
                gen = gen_line_batches(filenames, s2s.batch_size,
                                       repeat=False, split=split,
                                       train=True, is_bad=is_bad)
                for batch in gen:
                    if batch is None:
                        return
                    sources, confs, targets, _ = batch
                    enc, dec_in, dec_out, w = _vectorize(
                        s2s.mapping, sources, targets, confs, logger)
                    if ratio > 0:
                        dec_in = _scheduled_sample(
                            params_ref[0], config, s2s.mapping, enc,
                            dec_in, ratio, newline,
                            keras_quirk=getattr(s2s, 'keras_sampling',
                                                False))
                    # device placement on the prefetch thread overlaps
                    # the host->device transfer with the train step
                    yield to_device((_degrade_encoder(enc), dec_in,
                                     dec_out, w))

            from ..utils.prefetch import prefetch
            with prefetch(batch_iter()) as feed:
                for enc, dec_in, dec_out, w in feed:
                    rng, sub = jax.random.split(rng)
                    params, opt_state, loss = train_step(
                        params, opt_state, config, enc, dec_in, dec_out,
                        w, sub, frozen_mask=fmask, lm_loss=s2s.lm_loss,
                        optimizer=optimizer, compute_dtype=train_compute)
                    params_ref[0] = params
                    losses.append(float(loss))
                    if stop.stopping:
                        break
            if not losses:
                logger.critical('training failed: no data')
                s2s.status = 1
                return history
            train_loss = float(np.mean(losses))

            val_losses = []
            vgen = gen_line_batches(val_filenames or filenames,
                                    s2s.batch_size, repeat=False,
                                    split=split, train=False)
            for batch in vgen:
                if batch is None:
                    break
                sources, confs, targets, _ = batch
                enc, dec_in, dec_out, w = to_device(_vectorize(
                    s2s.mapping, sources, targets, confs, logger))
                val_losses.append(float(eval_step(
                    params, config, enc, dec_in, dec_out, w,
                    lm_loss=s2s.lm_loss)))
            val_loss = float(np.mean(val_losses)) if val_losses else train_loss
            history['loss'].append(train_loss)
            history['val_loss'].append(val_loss)
            logger.info('epoch %d loss %.4f val_loss %.4f', epoch,
                        train_loss, val_loss)

            nan_stop = np.isnan(train_loss) or np.isnan(val_loss)
            if not nan_stop and val_loss < best_loss:
                best_loss = val_loss
                best_params = params
                bad_epochs = 0
            elif not nan_stop:
                bad_epochs += 1

            if checkpoint_dir is not None:
                try:
                    from ..utils import io_h5
                    io_h5.save_model(
                        '%s/model.ckpt.weights-%02d-%.2f.h5'
                        % (checkpoint_dir, epoch, val_loss),
                        params, config, s2s.mapping)
                    save_train_state(checkpoint_dir, params, opt_state,
                                     epoch, best_loss, best_params, split)
                except Exception as err:  # pragma: no cover
                    logger.warning('cannot checkpoint: %s', err)

            if nan_stop:
                logger.warning('NaN loss, terminating')
                break
            if bad_epochs >= patience:
                logger.info('early stopping (patience %d)', patience)
                break
            if stop.stopping:
                break

    s2s.params = best_params
    s2s.status = 2
    logger.info('training finished with val_loss %f', best_loss)
    return history


def _tree_shapes_match(a, b):
    """True when two parameter pytrees have identical structure and leaf
    shapes (resume-state sanity check)."""
    la, ta = jax.tree_util.tree_flatten(a)
    lb, tb = jax.tree_util.tree_flatten(b)
    return (ta == tb and len(la) == len(lb)
            and all(np.shape(x) == np.shape(y) for x, y in zip(la, lb)))


def _vectorize(mapping, sources, targets, confs, logger):
    """Compact index batches for plain text (V times less host->device
    traffic, utils/data.py:vectorize_lines_indices); dense probability
    arrays when per-character confidences are present."""
    if confs is not None and any(confs):
        return vectorize_lines(mapping, sources, targets, confs=confs,
                               logger=logger)
    return vectorize_lines_indices(mapping, sources, targets,
                                   logger=logger)


def _degrade_encoder(enc):
    """Underspecify ~1% of lines' one random position to index 0
    (seq2seq.py:909-915); works on dense (B, T, V) or index (B, T)
    batches.

    Reference-faithful quirks (both forms match the reference's dense
    `eye[0]` assignment exactly): the position is drawn over the PADDED
    batch length, so for short lines most hits land in padding — and a
    padding hit writes a non-zero index-0 row there, un-masking a
    phantom post-EOS step for the encoder of that line."""
    B, T = enc.shape[:2]
    u = np.random.uniform(0, 1, B)
    pos = (T * u / 0.01).astype(int)
    hit = pos < T
    enc = np.array(enc)
    if enc.ndim == 2:
        enc[np.arange(B)[hit], pos[hit]] = 0
        return enc
    V = enc.shape[2]
    enc[np.arange(B)[hit], pos[hit], :] = np.eye(V, dtype=enc.dtype)[0]
    return enc


def _scheduled_sample(params, config, mapping, enc, dec_in, ratio, newline,
                      keras_quirk=False):
    """Replace a random subset of lines' teacher input with the greedy
    decoder's own output, one-hot encoded and shifted right; works on
    dense (B, Td, V) or index (B, Td) teacher batches.

    With `keras_quirk`, sampled lines instead get ZERO teacher input:
    the reference records the greedy feedback through a uint32 buffer
    (seq2seq.py:1236-1252), truncating every softmax score below 1.0 to
    0 — so its sampled lines train against (effectively) empty decoder
    input. The default feeds the one-hot greedy outputs, matching the
    comment-documented intent (seq2seq.py:1251); the flag reproduces
    reference training trajectories bit-for-bit minus the rare exact-1.0
    saturated score."""
    B, Td = dec_in.shape[:2]
    pick = np.random.uniform(0, 1, B) < ratio
    if not pick.any():
        return dec_in
    if keras_quirk:
        if dec_in.ndim == 2:
            return np.where(pick[:, None], -1, dec_in)
        return np.where(pick[:, None, None], 0.0, dec_in)
    idx, _, length, _, _ = decode_greedy(params, config, enc, newline,
                                         max_steps=Td - 1)
    idx = np.asarray(idx)[:, :Td - 1]
    if dec_in.ndim == 2:
        sampled = np.full_like(dec_in, -1)
        sampled[:, 1:] = np.where(idx == 0, -1, idx)
        return np.where(pick[:, None], sampled, dec_in)
    V = dec_in.shape[2]
    sampled = np.zeros_like(dec_in)
    rows = np.repeat(np.arange(B), Td - 1)
    cols = np.tile(np.arange(1, Td), B)
    sampled[rows, cols, idx.reshape(-1)] = 1.0
    sampled[:, :, 0] = 0  # never feed underspecification
    return np.where(pick[:, None, None], sampled, dec_in)
