"""Pallas fused LSTM step vs the reference jnp implementation."""

import numpy as np
import jax
import pytest

from cor_asv_ann_tpu.ops import lstm
from cor_asv_ann_tpu.ops.pallas_lstm import lstm_step_fused


@pytest.mark.parametrize('B,D,W', [(8, 16, 8), (130, 256, 128)])
def test_fused_matches_reference(B, D, W):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (B, D)).astype(np.float32)
    h = rng.normal(0, 1, (B, W)).astype(np.float32)
    c = rng.normal(0, 1, (B, W)).astype(np.float32)
    w = {'kernel': rng.normal(0, 0.5, (D, 4 * W)).astype(np.float32),
         'recurrent_kernel': rng.normal(0, 0.5, (W, 4 * W)).astype(
             np.float32),
         'bias': rng.normal(0, 0.5, (4 * W,)).astype(np.float32)}
    h_ref, c_ref = lstm.lstm_step(x, h, c, w)
    interpret = jax.default_backend() != 'tpu'
    h_k, c_k = lstm_step_fused(x, h, c, w['kernel'],
                               w['recurrent_kernel'], w['bias'],
                               block_b=64, interpret=interpret)
    np.testing.assert_allclose(np.asarray(h_ref), np.asarray(h_k),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_k),
                               atol=1e-5)


def test_pallas_flag_decode_matches():
    """decode_greedy with use_pallas_lstm must byte-match the jnp path."""
    import dataclasses
    from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
    from cor_asv_ann_tpu.models.seq2seq import decode_greedy
    from cor_asv_ann_tpu.utils.data import CharMapping
    from conftest import make_onehot_batch

    mapping = CharMapping.from_texts(["abcdefgh .,\n"])
    config = Seq2SeqConfig(width=16, voc_size=mapping.voc_size)
    params = init_params(config, seed=5)
    params['char_embedding']['kernel'] *= 400.0
    enc = make_onehot_batch(mapping, ["abba dig.\n", "hi.\n"], pad_to=12)
    newline = mapping.get('\n')
    idx1, _, len1, _, _ = decode_greedy(params, config, enc, newline)
    config2 = dataclasses.replace(config, use_pallas_lstm=True)
    idx2, _, len2, _, _ = decode_greedy(params, config2, enc, newline)
    np.testing.assert_array_equal(np.asarray(idx1), np.asarray(idx2))
    np.testing.assert_array_equal(np.asarray(len1), np.asarray(len2))


def test_fused_bf16_matches_reference():
    """bf16 weights: kernel outputs follow the weight dtype and match
    the jnp path's per-matmul rounding exactly."""
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    B, D, W = 16, 24, 16
    cast = lambda a: jnp.asarray(a, jnp.float32).astype(jnp.bfloat16)
    x = cast(rng.normal(0, 1, (B, D)))
    h = cast(rng.normal(0, 1, (B, W)))
    c = cast(rng.normal(0, 1, (B, W)))
    w = {'kernel': cast(rng.normal(0, 0.5, (D, 4 * W))),
         'recurrent_kernel': cast(rng.normal(0, 0.5, (W, 4 * W))),
         'bias': cast(rng.normal(0, 0.5, (4 * W,)))}
    h_ref, c_ref = lstm.lstm_step(x, h, c, w)
    assert h_ref.dtype == jnp.bfloat16
    interpret = jax.default_backend() != 'tpu'
    h_k, c_k = lstm_step_fused(x, h, c, w['kernel'],
                               w['recurrent_kernel'], w['bias'],
                               block_b=64, interpret=interpret)
    assert h_k.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(h_ref, np.float32), np.asarray(h_k, np.float32))
    np.testing.assert_array_equal(
        np.asarray(c_ref, np.float32), np.asarray(c_k, np.float32))
