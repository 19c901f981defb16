"""Whole-loop fused Pallas greedy decode vs the XLA decoder.

The fused kernel (ops/pallas_decode_loop.py) runs the ENTIRE decode
loop — embedding, both decoder LSTMs, windowed additive attention,
tied softmax readout, argmax/termination — inside one kernel launch
with the weights VMEM-resident across characters (reference hot loop:
one predict_on_batch per character, seq2seq.py:1243-1246). CPU tests
run the kernel in interpreter mode; the TPU throughput/parity claims
(2.8x at B=16, NOTES.md) are validated by tools/ + bench.py on the
real chip.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.models import seq2seq
from cor_asv_ann_tpu.ops import pallas_decode_loop as pdl
from cor_asv_ann_tpu.utils.data import CharMapping, lines_to_index_batch


def _tiny_model(mask_padding):
    mapping = CharMapping.from_texts(["abcdefgh .,\n"])
    config = Seq2SeqConfig(width=16, depth=2, voc_size=mapping.voc_size,
                           mask_padding=mask_padding)
    params = init_params(config, seed=11)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, params)
    return mapping, config, params


@pytest.mark.parametrize('mask_padding', [False, True])
def test_fused_matches_xla_interpret(mask_padding):
    """Interpreter-mode kernel vs decode_greedy: same indices, lengths,
    and close scores on a tiny random model (ties possible under a flat
    random model are avoided by checking per-step chosen probabilities
    instead of raw index equality when they differ)."""
    mapping, config, params = _tiny_model(mask_padding)
    lines = ["abba dig.\n", "hi.\n", "deaf bad cab.\n", "gag.\n"] * 4
    enc = lines_to_index_batch(mapping, lines, pad_to=16, bucketed=False)
    newline = mapping.get('\n')

    idx_r, prob_r, len_r, score_r, _ = seq2seq.decode_greedy(
        params, config, enc, newline)
    idx_f, prob_f, len_f, score_f, aligns = pdl.decode_greedy_fused(
        params, config, enc, newline, interpret=True)
    assert aligns is None
    idx_r, len_r = np.asarray(idx_r), np.asarray(len_r)
    idx_f, len_f = np.asarray(idx_f), np.asarray(len_f)
    prob_r = np.asarray(prob_r, np.float32)
    prob_f = np.asarray(prob_f, np.float32)
    for b in range(len(lines)):
        L = int(len_r[b])
        if int(len_f[b]) == L and np.array_equal(idx_r[b, :L],
                                                 idx_f[b, :L]):
            continue
        # a random flat model can flip exact argmax ties between the
        # two summation orders; require the chosen probabilities to
        # match closely at every step up to the first divergence
        Lm = min(L, int(len_f[b]))
        np.testing.assert_allclose(prob_r[b, :Lm], prob_f[b, :Lm],
                                   atol=2e-2)
    np.testing.assert_allclose(np.asarray(score_r), np.asarray(score_f),
                               atol=5e-2)


def test_fused_supported_gate():
    mapping, config, params = _tiny_model(False)
    on_tpu = jax.default_backend() in ('tpu', 'axon')
    # sub-lane widths (w16) fail Mosaic lowering -> never supported on
    # hardware (measured; the interpreter-mode CPU tests still exercise
    # the kernel math at w16)
    assert not pdl.fused_greedy_supported(params, config, 16)
    # lane-aligned width: supported exactly on TPU
    c512 = Seq2SeqConfig(width=512, depth=2, voc_size=config.voc_size)
    assert pdl.fused_greedy_supported(params, c512, 64) == on_tpu
    # f32 weights exceed VMEM -> unsupported
    params32 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), params)
    assert not pdl.fused_greedy_supported(params32, c512, 64)
    # depth 3 unsupported
    c3 = Seq2SeqConfig(width=512, depth=3, voc_size=config.voc_size)
    assert not pdl.fused_greedy_supported(params, c3, 64)
    # the tile-fit limit is a property of _tile_rows: at flagship scale
    # with very long lines the attended/u residency exceeds VMEM and no
    # 8-row tile fits
    assert pdl._tile_rows(4096, 512, config.voc_size) < 8
    assert pdl._tile_rows(64, 512, config.voc_size) >= 8
    # and the supported gate must track the tile fit on any backend
    assert pdl.fused_greedy_supported(params, c512, 4096) == (
        on_tpu and pdl._tile_rows(4096, 512, config.voc_size) >= 8)


def test_pick_fused_bound():
    """The autotune picks a (min, max) dispatch WINDOW — the longest
    contiguous run of measured wins; the B<=16 floor holds when the
    small end is unmeasured or winning; a small-end loss raises the
    window's lower bound instead of discarding larger wins
    (models/api.py)."""
    from cor_asv_ann_tpu.models.api import _pick_fused_bound
    assert _pick_fused_bound({16: 1.2, 32: 1.1, 64: 1.15}) == (1, 64)
    assert _pick_fused_bound({16: 1.2, 32: 0.9, 64: 1.15}) == (1, 16)
    assert _pick_fused_bound({16: 1.2, 32: 1.05, 64: 0.8}) == (1, 32)
    assert _pick_fused_bound({}) == (1, 16)
    assert _pick_fused_bound({64: 0.5}) == (1, 16)
    # a measured loss AT the floor: the sub-floor assumption dies, but
    # contiguous wins above it stay dispatched (round 5: the scalar
    # bound used to discard the 32-64 wins on a B=16-losing day)
    assert _pick_fused_bound({16: 0.42, 32: 0.76, 64: 0.94}) == (0, 0)
    assert _pick_fused_bound({16: 0.9, 32: 1.2}) == (32, 32)
    assert _pick_fused_bound({16: 0.93, 32: 1.13, 64: 1.08}) == (32, 64)


def test_autotune_unsupported_returns_none():
    """autotune_fused_decode declines gracefully off-TPU / at f32."""
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    mapping, config, params = _tiny_model(False)
    s2s = Sequence2Sequence()
    s2s.width, s2s.depth = 16, 2
    s2s.mapping = mapping
    s2s.configure()
    s2s.params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), params)
    s2s.status = 2
    assert s2s.autotune_fused_decode() is None  # f32 compute
    if jax.default_backend() not in ('tpu', 'axon'):
        s2s.compute = 'bfloat16'
        assert s2s.autotune_fused_decode() is None  # CPU backend gate


@pytest.mark.skipif(jax.default_backend() not in ('tpu', 'axon'),
                    reason='real-TPU parity test (CORASVANN_TEST_TPU=1)')
def test_fused_golden_byte_parity_tpu():
    """On real TPU hardware the dispatched fused path must byte-match
    the XLA decoder on the golden corpus at the dispatch regime
    (bf16, B<=FUSED_DECODE_MAX_B). Guards the fused_decode=True default
    (models/api.py) with actual-hardware numerics rather than the
    interpreter-mode tolerance fallback."""
    import json
    import os
    models_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'testmodels')
    flagship = os.path.join(models_dir, 'flagship.d2.w512.synthetic.h5')
    golden_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               'golden_corpus.json')
    if not (os.path.exists(flagship) and os.path.exists(golden_path)):
        pytest.skip('flagship/golden fixture missing')
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    s2s = Sequence2Sequence()
    s2s.load_config(flagship)
    s2s.configure()
    s2s.load_weights(flagship)
    s2s.compute = 'bfloat16'
    with open(golden_path) as f:
        inputs = json.load(f)['inputs']['plain'][:s2s.fused_decode_max_b]
    s2s.fused_decode = True
    out_fused, _, sc_fused, _ = s2s.correct_lines(
        list(inputs), fast=True, greedy=True, return_alignments=False)
    s2s.fused_decode = False
    out_xla, _, sc_xla, _ = s2s.correct_lines(
        list(inputs), fast=True, greedy=True, return_alignments=False)
    assert out_fused == out_xla, [
        (a, b) for a, b in zip(out_fused, out_xla) if a != b]
    # scores are diagnostics (length-normalized -log p, ~2e-3 on a
    # confident model): the kernel's f32 gate math vs the XLA path's
    # bf16 per-op rounding compounds through the recurrence into
    # per-line deltas of a few 1e-3 abs (measured 2.5e-3 max on the
    # flagship; text stays byte-equal because argmax is robust to it)
    np.testing.assert_allclose(sc_fused, sc_xla, atol=5e-3)


def test_api_dispatch_uses_fused_only_when_supported(monkeypatch):
    """correct_lines routes small bf16 batches through the fused path
    on TPU and never elsewhere (models/api.py dispatch gate)."""
    from cor_asv_ann_tpu.models import api as api_mod
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    s2s = Sequence2Sequence()
    s2s.width = 16
    s2s.depth = 2
    mapping, config, params = _tiny_model(False)
    s2s.mapping = mapping
    s2s.configure()
    s2s.params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32), params)
    s2s.status = 2
    calls = []
    real = api_mod.decode_greedy_fused

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k, interpret=jax.default_backend() == 'cpu')

    monkeypatch.setattr(api_mod, 'decode_greedy_fused', spy)
    lines = ["abba dig.\n", "hi.\n"]
    out, _, _, _ = s2s.correct_lines(list(lines), fast=True, greedy=True,
                                     return_alignments=False)
    assert len(out) == 2
    # f32 compute -> never fused
    assert not calls
    s2s.compute = 'bfloat16'
    out, _, _, _ = s2s.correct_lines(list(lines), fast=True, greedy=True,
                                     return_alignments=False)
    assert len(out) == 2
    # dispatch must track the supported gate exactly (w16 is sub-lane,
    # so on real TPU hardware this stays on the XLA path; the CPU suite
    # covers the dispatch-taken branch through the interpreter spy only
    # when the gate says so — the flagship TPU parity test covers the
    # dispatch-taken case on hardware)
    import cor_asv_ann_tpu.ops.pallas_decode_loop as pdl_mod
    pb = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, s2s.params)
    expected = pdl_mod.fused_greedy_supported(pb, s2s.config, 16)
    assert bool(calls) == expected
