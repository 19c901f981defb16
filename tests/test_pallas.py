"""Pallas fused LSTM step vs the reference jnp implementation."""

import numpy as np
import jax
import pytest

from cor_asv_ann_tpu.models.config import _glorot, _orthogonal
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
