"""Batch-shared window attention vs the dense step (ops/attention.py).

The shared path must produce the same visible window and (up to float
summation order) the same alignment as the dense step, for every branch:
shared slice taken, dense fallback on wide spread, padding mask, and the
low-precision long-line guard (bf16 positions are exact only up to 256,
so T > 256 in bf16 must stay dense — both cond branches must agree on
visibility).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cor_asv_ann_tpu.ops.attention import (attention_step,
                                           attention_step_shared)


def _setup(T, B=4, W=16, dtype=np.float32, center=10.0, spread=0.0,
           seed=0):
    rng = np.random.default_rng(seed)
    W_a = rng.normal(0, 0.3, (W, W)).astype(dtype)
    v_a = rng.normal(0, 0.3, (W, 1)).astype(dtype)
    b_UW = np.zeros(W, dtype)
    b_v = np.zeros(1, dtype)
    h = rng.normal(0, 0.5, (B, W)).astype(dtype)
    attended = rng.normal(0, 0.5, (B, T, W)).astype(dtype)
    u = rng.normal(0, 0.5, (B, T, W)).astype(dtype)
    # previous alignment: one-hot at per-line centers
    prev_a = np.zeros((B, T), dtype)
    centers = (center + spread * np.arange(B)).astype(int) % T
    prev_a[np.arange(B), centers] = 1.0
    return (W_a, v_a, b_UW, b_v, h, prev_a, attended, u)


@pytest.mark.parametrize('T,spread', [(64, 0.0), (64, 3.0), (128, 0.0)])
def test_shared_matches_dense(T, spread):
    args = _setup(T, spread=spread)
    ctx_d, a_d = attention_step(*args)
    ctx_s, a_s = attention_step_shared(*args)
    np.testing.assert_allclose(np.asarray(ctx_d), np.asarray(ctx_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_d), np.asarray(a_s),
                               atol=1e-5)
    # identical visible sets: zero exactly where dense is zero
    np.testing.assert_array_equal(np.asarray(a_d) == 0,
                                  np.asarray(a_s) == 0)


def test_wide_spread_falls_back_to_dense():
    """Spread wider than the shared window: bit-identical to dense."""
    args = _setup(64, spread=15.0)  # 4 lines spread over 45 > 32-11
    ctx_d, a_d = attention_step(*args)
    ctx_s, a_s = attention_step_shared(*args)
    np.testing.assert_array_equal(np.asarray(ctx_d), np.asarray(ctx_s))
    np.testing.assert_array_equal(np.asarray(a_d), np.asarray(a_s))


def test_mask_respected():
    args = _setup(64)
    mask = np.ones((4, 64), bool)
    mask[:, 12:] = False  # true length 12, window center 10 straddles it
    ctx_d, a_d = attention_step(*args, mask=mask)
    ctx_s, a_s = attention_step_shared(*args, mask=mask)
    np.testing.assert_allclose(np.asarray(a_d), np.asarray(a_s),
                               atol=1e-5)
    assert np.all(np.asarray(a_s)[:, 12:] == 0)


def test_exclude_does_not_change_included_lines():
    args = _setup(64, spread=3.0)
    exclude = np.array([False, False, False, True])
    ctx_d, a_d = attention_step(*args)
    ctx_s, a_s = attention_step_shared(*args, exclude=exclude)
    np.testing.assert_allclose(np.asarray(a_d)[:3], np.asarray(a_s)[:3],
                               atol=1e-5)


def test_bf16_long_lines_stay_dense():
    """T > 256 in bf16: positions land on the bf16 integer grid (step 2
    above 256), where dense and shared would disagree on visibility —
    the shared path must return the dense result bit-exactly."""
    args = _setup(320, dtype=np.float32, center=272.0, spread=1.0)
    args = tuple(jnp.asarray(a).astype(jnp.bfloat16) for a in args)
    ctx_d, a_d = attention_step(*args)
    ctx_s, a_s = attention_step_shared(*args)
    np.testing.assert_array_equal(np.asarray(ctx_d), np.asarray(ctx_s))
    np.testing.assert_array_equal(np.asarray(a_d), np.asarray(a_s))
