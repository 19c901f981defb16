"""JAX model vs NumPy golden reference parity.

The NumPy reference (lib/numpy_ref.py) encodes the exact Keras semantics of
the reference model; the jitted JAX implementation must reproduce its
encoder outputs and greedy decodes on identical parameters.
"""

import numpy as np
import pytest

from cor_asv_ann_tpu.lib import numpy_ref
from cor_asv_ann_tpu.models import seq2seq
from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.utils.data import CharMapping

from conftest import make_onehot_batch

LINES = ["abba dig.\n", "chef i gad.\n", "hi.\n"]


def _np_config(config):
    return config.as_dict()


def test_encoder_parity(tiny_setup):
    config, mapping, params = tiny_setup
    enc = make_onehot_batch(mapping, LINES, pad_to=12)
    out_np, states_np, _a0, u_np = numpy_ref.encode(
        params, _np_config(config), enc)
    out_jx, states_jx, u_jx = seq2seq.encode(params, config, enc)
    np.testing.assert_allclose(out_np, np.asarray(out_jx), atol=2e-5)
    np.testing.assert_allclose(u_np, np.asarray(u_jx), atol=2e-5)
    for (hn, cn), (hj, cj) in zip(states_np, states_jx):
        np.testing.assert_allclose(hn, np.asarray(hj), atol=2e-5)
        np.testing.assert_allclose(cn, np.asarray(cj), atol=2e-5)


@pytest.mark.parametrize('kwargs', [
    {},
    {'depth': 1},
    {'depth': 3},
    {'depth': 3, 'residual_connections': True},
    {'deep_bidirectional_encoder': True},
    {'bridge_dense': True},
])
def test_greedy_decode_parity(kwargs):
    chars = "abcdefghij .,\n"
    mapping = CharMapping.from_texts([chars])
    config = Seq2SeqConfig(width=8, voc_size=mapping.voc_size, **kwargs)
    params = init_params(config, seed=7)
    # sharpen the tied output softmax so argmax margins dominate float
    # noise: chain parity is only well-defined for peaked distributions
    params['char_embedding']['kernel'] *= 400.0
    enc = make_onehot_batch(mapping, LINES, pad_to=12)
    texts_np, probs_np, scores_np, aligns_np = numpy_ref.decode_batch_greedy(
        params, _np_config(config), mapping, enc)
    newline = mapping.get('\n')
    idx, prob, length, score, aligns = seq2seq.decode_greedy(
        params, config, enc, newline, return_alignments=True)
    idx, prob, length = map(np.asarray, (idx, prob, length))
    texts_jx = [''.join(mapping.i2c[int(i)] for i in idx[j, :length[j]])
                for j in range(len(LINES))]
    # after many feedback steps through a sharpened network, float32
    # order-of-ops drift accumulates; the decoded bytes must match unless
    # the divergence happens at a genuine numerical tie (top-2 prob gap
    # below float noise at the first differing step)
    for j in range(len(LINES)):
        a, b = texts_jx[j], texts_np[j]
        if a == b:
            np.testing.assert_allclose(prob[j, :length[j]], probs_np[j],
                                       atol=5e-3)
            np.testing.assert_allclose(
                np.asarray(aligns)[j, :length[j]], np.stack(aligns_np[j]),
                atol=5e-3)
            continue
        t = next(k for k in range(min(len(a), len(b))) if a[k] != b[k])
        gap = abs(probs_np[j][t] - float(prob[j, t]))
        assert gap < 1e-2, (
            f'line {j} diverges at step {t} with prob gap {gap}: '
            f'{a!r} vs {b!r}')


def test_greedy_decode_empty_line(tiny_setup):
    config, mapping, params = tiny_setup
    enc = make_onehot_batch(mapping, ["ab.\n", ""], pad_to=8)
    newline = mapping.get('\n')
    idx, prob, length, score, _ = seq2seq.decode_greedy(
        params, config, enc, newline)
    assert int(np.asarray(length)[1]) == 0


def test_teacher_forward_matches_stepwise(tiny_setup):
    """Teacher-forced scan must equal stepping the decoder manually."""
    config, mapping, params = tiny_setup
    enc = make_onehot_batch(mapping, LINES, pad_to=12)
    dec_in = make_onehot_batch(mapping, ["\0" + l for l in LINES], pad_to=16)
    dec_in[:, 0, :] = 0  # true zero start symbol
    probs_seq = np.asarray(
        seq2seq.forward_teacher(params, config, enc, dec_in))
    attended, states, u = seq2seq.encode(params, config, enc)
    state = (list(states), np.zeros(enc.shape[:2], np.float32))
    for t in range(dec_in.shape[1]):
        p, state, _ = seq2seq.decoder_step(
            params, config, dec_in[:, t], state, attended, u)
        np.testing.assert_allclose(probs_seq[:, t], np.asarray(p), atol=2e-5)


def test_windowed_equals_full_greedy(tiny_setup):
    """The windowed-attention greedy decoder must match the full-T one."""
    config, mapping, params = tiny_setup
    import copy
    params = copy.deepcopy(params)
    params['char_embedding']['kernel'] = \
        params['char_embedding']['kernel'] * 400.0
    enc = make_onehot_batch(mapping, LINES, pad_to=20)
    newline = mapping.get('\n')
    full = seq2seq.decode_greedy(params, config, enc, newline,
                                 return_alignments=True)
    win = seq2seq.decode_greedy_windowed(params, config, enc, newline,
                                         return_alignments=True)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(win[0]))
    np.testing.assert_array_equal(np.asarray(full[2]), np.asarray(win[2]))
    np.testing.assert_allclose(np.asarray(full[4]), np.asarray(win[4]),
                               atol=1e-5)


def test_windowed_equals_full_greedy_zero_conf_row(tiny_setup):
    """A zero-confidence char (all-zero encoder row mid-line) must be
    masked identically by the dense and windowed serving paths: both
    hide exactly that row (positional mask), not just positions past a
    summed length."""
    config, mapping, params = tiny_setup
    import copy
    params = copy.deepcopy(params)
    params['char_embedding']['kernel'] = \
        params['char_embedding']['kernel'] * 400.0
    enc = make_onehot_batch(mapping, LINES, pad_to=20)
    enc[0, 3, :] = 0.0   # conf-0.0 char inside line 0
    newline = mapping.get('\n')
    full = seq2seq.decode_greedy(params, config, enc, newline)
    win = seq2seq.decode_greedy_windowed(params, config, enc, newline)
    np.testing.assert_array_equal(np.asarray(full[0]), np.asarray(win[0]))
    np.testing.assert_array_equal(np.asarray(full[2]), np.asarray(win[2]))


def test_shared_attention_global_window():
    """With window_width=0 (global attention) the shared fast path must
    defer to the dense step — its window keep-mask has no meaning."""
    from cor_asv_ann_tpu.ops import attention as ATT
    rng = np.random.default_rng(0)
    B, T, W, A = 4, 64, 8, 16
    args = (rng.standard_normal((W, W)).astype(np.float32),       # W_a
            rng.standard_normal((W, 1)).astype(np.float32),       # v_a
            rng.standard_normal((W,)).astype(np.float32),         # b_UW
            rng.standard_normal((1,)).astype(np.float32),         # b_v
            rng.standard_normal((B, W)).astype(np.float32))       # h_prev
    prev_a = rng.random((B, T)).astype(np.float32)
    prev_a /= prev_a.sum(1, keepdims=True)
    attended = rng.standard_normal((B, T, A)).astype(np.float32)
    u = rng.standard_normal((B, T, W)).astype(np.float32)
    ctx_s, a_s = ATT.attention_step_shared(*args, prev_a, attended, u,
                                           window_width=0, shared_width=32)
    ctx_d, a_d = ATT._attention_step(*args, prev_a, attended, u,
                                     window_width=0)
    np.testing.assert_array_equal(np.asarray(ctx_s), np.asarray(ctx_d))
    np.testing.assert_array_equal(np.asarray(a_s), np.asarray(a_d))


def test_api_global_attention_long_lines():
    """A global-attention model (window_width 0) must serve long buckets
    on the dense decoder (the windowed-gather path is window-based)."""
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    from cor_asv_ann_tpu.utils.data import lines_to_index_batch

    s2s = Sequence2Sequence()
    s2s.width, s2s.depth, s2s.batch_size = 16, 1, 4
    s2s.window_width = 0
    s2s.mapping, _ = s2s.mapping.grow(["abcdefgh .,\n"])
    s2s.configure()
    assert s2s.config.window_width == 0
    s2s.params['char_embedding']['kernel'] = \
        s2s.params['char_embedding']['kernel'] * 400.0
    s2s.status = 2
    long = ("abba dig. " * 15).strip() + "\n"      # T >= 128 bucket
    assert len(long) >= 128
    out, _, _, _ = s2s.correct_lines([long], fast=True, greedy=True)
    enc = lines_to_index_batch(s2s.mapping, [long])
    idx, _, length, _, _ = seq2seq.decode_greedy(
        s2s.params, s2s.config, enc, s2s.mapping.get('\n'))
    want = s2s._indexes2text(np.asarray(idx)[0, :int(np.asarray(length)[0])])
    assert out[0] == want


def test_api_windowed_switch_long_lines():
    """correct_lines auto-selects windowed-gather attention for long
    buckets (T >= 256); results equal the dense decoder's."""
    from cor_asv_ann_tpu.models import api as A
    from cor_asv_ann_tpu.models.api import Sequence2Sequence

    s2s = Sequence2Sequence()
    s2s.width, s2s.depth, s2s.batch_size = 16, 2, 4
    s2s.mapping, _ = s2s.mapping.grow(["abcdefgh .,\n"])
    s2s.configure()
    s2s.params['char_embedding']['kernel'] = \
        s2s.params['char_embedding']['kernel'] * 400.0
    s2s.status = 2
    long = ("abba dig. " * 25).strip() + "\n"      # ~250 chars -> T=256
    assert len(long) >= 200
    out_w, _, scores_w, _ = s2s.correct_lines([long, "hi.\n"], fast=True,
                                              greedy=True)
    # force the dense path for comparison
    old = A.WINDOWED_DECODE_MIN_T
    try:
        A.WINDOWED_DECODE_MIN_T = 10 ** 9
        s2s._infer_cache = None
        out_d, _, scores_d, _ = s2s.correct_lines([long, "hi.\n"],
                                                  fast=True, greedy=True)
    finally:
        A.WINDOWED_DECODE_MIN_T = old
    assert out_w == out_d
    np.testing.assert_allclose(scores_w, scores_d, atol=1e-4)
