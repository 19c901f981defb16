"""Fused whole-sequence Pallas teacher scan (ops/pallas_teacher.py) vs
the dense XLA teacher path: forward parity and gradient parity against
autodiff, in interpreter mode on the host backend; real-TPU lowering and
byte-level checks live in the CORASVANN_TEST_TPU-gated test.

The kernel computes the SAME dense masked-window attention math as
ops.attention.attention_step (dense alignment-row carry), so parity is
to f32 accumulation-order noise — per-step backward error is ~1e-6 and
grows only through genuine chain sensitivity (verified against a
down-scaled weight draw where the recurrent chain is stable).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cor_asv_ann_tpu.ops.pallas_teacher import (teacher_top_fused,
                                                teacher_fused_supported,
                                                pick_bt)
from cor_asv_ann_tpu.ops.attention import attention_step
from cor_asv_ann_tpu.ops.lstm import gate_math, attention_cell_preact

WW = 5


@pytest.fixture(autouse=True)
def _exact_f32_matmuls():
    """On the real TPU, default-precision f32 matmuls run as bf16 MXU
    passes, so two differently-factored computations drift past the
    CPU-tight parity tolerances; HIGHEST restores exact f32 products in
    both the kernel and the XLA reference (no-op on the CPU backend)."""
    with jax.default_matmul_precision('highest'):
        yield


def _setup(seed=0, B=5, Td=9, T=16, W=128, A=128, scale=0.18):
    rng = np.random.default_rng(seed)

    def f(*s):
        return jnp.asarray(rng.normal(0, scale, s), jnp.float32)

    top = {'W_a': f(W, W), 'v_a': f(W, 1), 'b_UW': f(W), 'b_v': f(1),
           'cell': {'kernel': f(W + A, 4 * W),
                    'recurrent_kernel': f(W, 4 * W), 'bias': f(4 * W)}}
    xs = f(B, Td, W)
    att, u = f(B, T, A), f(B, T, W)
    h0, c0 = f(B, W), f(B, W)
    masks = jnp.asarray(rng.random((4, B, W + A)) < 0.8,
                        jnp.float32) / 0.8
    return top, xs, att, u, h0, c0, masks


def _ref_scan(top, xs, att, u, h0, c0, masks):
    """The dense XLA teacher body (seq2seq._decode_teacher's `body`)."""
    def body(carry, x_t):
        h, c, a = carry
        ctx, a2 = attention_step(top['W_a'], top['v_a'], top['b_UW'],
                                 top['b_v'], h, a, att, u, WW)
        cell_in = jnp.concatenate([x_t, ctx.astype(x_t.dtype)], -1)
        z = attention_cell_preact(top['cell'], cell_in, h, masks)
        h2, c2 = gate_math(z, c)
        return (h2, c2, a2), h2

    a0 = jnp.zeros((xs.shape[0], att.shape[1]), att.dtype)
    _, hs = jax.lax.scan(body, (h0, c0, a0), jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(hs, 0, 1)


@pytest.mark.parametrize('with_masks', [False, True])
def test_fused_forward_matches_dense(with_masks):
    top, xs, att, u, h0, c0, masks = _setup()
    m = masks if with_masks else None
    ref = _ref_scan(top, xs, att, u, h0, c0, m)
    got = teacher_top_fused(top, xs, att, u, h0, c0, m, WW, True, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('with_masks', [False, True])
def test_fused_gradients_match_autodiff(with_masks):
    top, xs, att, u, h0, c0, masks = _setup()
    m = masks if with_masks else None

    def loss_ref(top, xs, att, u, h0, c0):
        return jnp.sum(_ref_scan(top, xs, att, u, h0, c0, m) ** 2)

    def loss_fus(top, xs, att, u, h0, c0):
        return jnp.sum(teacher_top_fused(top, xs, att, u, h0, c0, m,
                                         WW, True, 8) ** 2)

    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(
        top, xs, att, u, h0, c0)
    gf = jax.grad(loss_fus, argnums=tuple(range(6)))(
        top, xs, att, u, h0, c0)
    for (path, r), g in zip(jax.tree_util.tree_leaves_with_path(gr),
                            jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-3, atol=2e-4,
            err_msg=str(jax.tree_util.keystr(path)))


def test_fused_unaligned_batch_pads():
    """B not a multiple of the tile pads internally; outputs match the
    aligned computation on the common rows."""
    top, xs, att, u, h0, c0, _ = _setup(B=7)
    got = teacher_top_fused(top, xs, att, u, h0, c0, None, WW, True, 8)
    ref = _ref_scan(top, xs, att, u, h0, c0, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_dispatch_engages_for_training(monkeypatch):
    """_TEACHER_KERNEL='on' routes training through the fused scan; eval
    and 'off' stay on the XLA paths."""
    from cor_asv_ann_tpu.models import seq2seq as S
    from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
    from cor_asv_ann_tpu.ops import pallas_teacher as PT

    calls = []
    real = PT.teacher_top_fused

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(PT, 'teacher_top_fused', spy)
    config = Seq2SeqConfig(width=8, depth=2, voc_size=12)
    params = jax.tree_util.tree_map(jnp.asarray, init_params(config, 3))
    rng = np.random.default_rng(5)
    enc = jnp.asarray(
        np.eye(12, dtype=np.float32)[rng.integers(1, 12, (2, 6))])
    dec = jnp.asarray(
        np.eye(12, dtype=np.float32)[rng.integers(1, 12, (2, 7))])
    key = jax.random.PRNGKey(0)
    monkeypatch.setattr(S, '_TEACHER_KERNEL', 'on')
    jax.clear_caches()
    S.forward_teacher(params, config, enc, dec)            # eval
    assert not calls
    p_kernel = S.forward_teacher(params, config, enc, dec,
                                 dropout_rng=key, train=True)
    assert calls
    monkeypatch.setattr(S, '_TEACHER_KERNEL', 'off')
    jax.clear_caches()
    p_ref = S.forward_teacher(params, config, enc, dec,
                              dropout_rng=key, train=True)
    np.testing.assert_allclose(np.asarray(p_kernel), np.asarray(p_ref),
                               rtol=1e-4, atol=1e-5)


def test_supported_gates():
    top, *_ = _setup(W=128, A=128)
    if jax.default_backend() not in ('tpu', 'axon'):
        assert not teacher_fused_supported(top, 256, 129, 128, 128, 128,
                                           has_enc_mask=False)
        return
    # production training compute is bf16; the f32 flagship working set
    # genuinely exceeds VMEM (weights alone 9.1 MB) and is declined
    top16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), top)
    assert teacher_fused_supported(top16, 256, 129, 128, 512, 512,
                                   has_enc_mask=False)
    assert not teacher_fused_supported(top16, 256, 129, 128, 512, 512,
                                       has_enc_mask=True)
    assert not teacher_fused_supported(top16, 256, 129, 100, 512, 512,
                                       has_enc_mask=False)


def test_pick_bt_flagship():
    assert pick_bt(128, 512, 512, 2) in (16, 24, 32)
    assert pick_bt(256, 512, 512, 2) >= 8


@pytest.mark.skipif(not os.environ.get('CORASVANN_TEST_TPU'),
                    reason='real-TPU lowering test (set '
                           'CORASVANN_TEST_TPU=1)')
def test_fused_tpu_lowering_and_parity():
    """Compile + run the fused kernels on real hardware at a
    flagship-shaped (narrowed) config and check forward/grad parity
    against the XLA dense path in f32."""
    top, xs, att, u, h0, c0, masks = _setup(B=16, Td=17, T=32,
                                            W=512, A=512)

    def loss_fus(top, xs, att, u, h0, c0):
        return jnp.sum(teacher_top_fused(top, xs, att, u, h0, c0, masks,
                                         WW, False, 16) ** 2)

    def loss_ref(top, xs, att, u, h0, c0):
        return jnp.sum(_ref_scan(top, xs, att, u, h0, c0, masks) ** 2)

    ref = _ref_scan(top, xs, att, u, h0, c0, masks)
    got = teacher_top_fused(top, xs, att, u, h0, c0, masks, WW, False,
                            16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    gr = jax.grad(loss_ref, argnums=(0,))(top, xs, att, u, h0, c0)
    gf = jax.grad(loss_fus, argnums=(0,))(top, xs, att, u, h0, c0)
    for (path, r), g in zip(jax.tree_util.tree_leaves_with_path(gr),
                            jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=5e-3, atol=5e-3,
            err_msg=str(jax.tree_util.keystr(path)))
