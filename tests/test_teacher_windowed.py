"""Windowed teacher-forced attention vs the dense reference-shaped path.

The training-side twin of decode_greedy_windowed (models/seq2seq.py
_decode_teacher body_windowed): only the ±window_width visible rows are
gathered per step. The dense path computes full-T energies and masks
everything outside the window to -inf, so forward probabilities AND
gradients must match exactly — any divergence is a semantics bug, not
tolerance noise (adding exact zeros commutes in float arithmetic).
"""

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp
import pytest

from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.models import seq2seq as S
from cor_asv_ann_tpu.utils.data import CharMapping
from conftest import make_onehot_batch


T_PAD = 64  # tests force the mode explicitly; 'auto' picks by MIN_T


def _setup(mask_padding, dtype=jnp.float32, seed=3):
    mapping = CharMapping.from_texts(["abcdefgh .,\n"])
    config = Seq2SeqConfig(width=16, depth=2, voc_size=mapping.voc_size,
                           mask_padding=mask_padding)
    params = init_params(config, seed=seed)
    if dtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            params)
    lines = ["abba dig.\n", "hi.\n", "deaf bad cab.\n", "gag.\n"] * 2
    enc = make_onehot_batch(mapping, lines, pad_to=T_PAD)
    dec_in = np.zeros((len(lines), T_PAD + 1, mapping.voc_size),
                      np.float32)
    dec_in[:, 1:] = enc
    return config, params, enc, dec_in


def _probs(params, config, enc, dec_in, mode):
    old = S._TEACHER_ATTENTION
    S._TEACHER_ATTENTION = mode
    try:
        return np.asarray(
            S.forward_teacher(params, config, enc, dec_in),
            np.float32)
    finally:
        S._TEACHER_ATTENTION = old


@pytest.mark.parametrize('mask_padding', [False, True])
@pytest.mark.parametrize('dtype', [jnp.float32, jnp.bfloat16])
def test_forward_probs_identical(mask_padding, dtype):
    config, params, enc, dec_in = _setup(mask_padding, dtype)
    dense = _probs(params, config, enc, dec_in, 'dense')
    windowed = _probs(params, config, enc, dec_in, 'windowed')
    np.testing.assert_array_equal(dense, windowed)


def test_gradients_identical():
    config, params, enc, dec_in = _setup(False)
    tgt = jnp.asarray(dec_in)

    def loss(p, mode):
        old = S._TEACHER_ATTENTION
        S._TEACHER_ATTENTION = mode
        try:
            probs = S.forward_teacher(p, config, enc, dec_in)
        finally:
            S._TEACHER_ATTENTION = old
        return -jnp.mean(jnp.sum(tgt * jnp.log(probs + 1e-8), axis=-1))

    g_dense = jax.grad(lambda p: loss(p, 'dense'))(params)
    g_win = jax.grad(lambda p: loss(p, 'windowed'))(params)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    flat_w, _ = jax.flatten_util.ravel_pytree(g_win)
    # forward is bit-exact (test above); the backward accumulates the
    # weight gradients in a different summation order (scatter-add over
    # WIN visible rows vs a full-T reduction with exact-zero terms), so
    # gradients agree to ulp-level accumulation noise (measured max
    # |diff| 1.3e-11 on f32), not bitwise
    np.testing.assert_allclose(np.asarray(flat_d), np.asarray(flat_w),
                               rtol=1e-5, atol=1e-8)


def test_auto_thresholds():
    """'auto' uses the dense path below _TEACHER_WINDOWED_MIN_T and for
    global-attention models (window_width 0) at any length — their
    semantics have no window to exploit."""
    config, params, enc, dec_in = _setup(False)
    cfg_global = config.replace(window_width=0) \
        if hasattr(config, 'replace') else None
    if cfg_global is None:
        import dataclasses
        cfg_global = dataclasses.replace(config, window_width=0)
    out = S.forward_teacher(params, cfg_global, enc, dec_in)
    assert out.shape == (enc.shape[0], dec_in.shape[1],
                         config.voc_size)
