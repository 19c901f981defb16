"""On-device A*-reservoir beam vs the reference-semantics NumPy oracle.

The oracle (lib/numpy_ref.py decode_sequence_beam) re-derives the
reference's global best-first queue with rejection; the batched TPU beam
must find the same 1-best on peaked models.
"""

import numpy as np
import pytest

from cor_asv_ann_tpu.lib import numpy_ref
from cor_asv_ann_tpu.models import beam
from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.utils.data import CharMapping

from conftest import make_onehot_batch

LINES = ["abba dig.\n", "chef i gad.\n", "hi.\n"]
T = 12


def _decode(mapping, out, j, f=0):
    L = out['length'][j, f]
    return ''.join(mapping.i2c[int(i)] for i in out['idx'][j, f, :L])


SEEDS = [(7, 2), (11, 2), (23, 2), (3, 2), (5, 2), (13, 2), (31, 2),
         (42, 2), (7, 1), (11, 3)]


def test_beam_matches_oracle_1best():
    """The device beam's 1-best must text-match the reference-semantics
    oracle on nearly all (seed, depth) combinations; any divergent line
    must additionally be at least as good by the shared prospective cost
    (near-tie searches can legitimately resolve differently between the
    bounded reservoir and the reference's heuristic early stop, but a
    systematic regression would push the divergence count over the
    bound)."""
    mapping = CharMapping.from_texts(["abcdefghij .,\n"])
    total = 0
    divergent = []
    for seed, depth in SEEDS:
        config = Seq2SeqConfig(width=8, depth=depth,
                               voc_size=mapping.voc_size)
        params = init_params(config, seed=seed)
        params['char_embedding']['kernel'] *= 400.0
        enc = make_onehot_batch(mapping, LINES, pad_to=T)
        # oracle uses the padded length as len0 (like the reference), so
        # pass the same to the device beam for comparability; reservoir
        # matched to the reference's effective queue bound
        # (max_batches * batch_size = 2*T*8 = 192) so the only pruning
        # difference vanishes
        src_len = np.full(len(LINES), T, np.int32)
        bp = beam.BeamParams(reservoir=192, expand=8, beam_width_in=6,
                             beam_width_out=4)
        out = {k: np.asarray(v) for k, v in beam.decode_beam(
            params, config, bp, enc, mapping.get('\n'), src_len).items()}
        for j in range(len(LINES)):
            gen = numpy_ref.decode_sequence_beam(
                params, config.as_dict(), mapping, enc[j],
                rejection_threshold=0.3, beam_width_in=6,
                beam_threshold_in=0.2, beam_width_out=4, batch_size=8)
            ref_txt, _, ref_score, _ = next(gen)
            dev_txt = _decode(mapping, out, j)
            total += 1
            if dev_txt == ref_txt:
                L = out['length'][j, 0]
                np.testing.assert_allclose(out['cum'][j, 0] / L, ref_score,
                                           atol=2e-2)
            else:
                divergent.append((seed, depth, j, dev_txt, ref_txt))
                # the divergent line must never be materially worse
                nch = len(ref_txt)
                ref_pro = ref_score * nch + 3.0 * abs(nch + 1 - T)
                assert out['cost'][j, 0] <= ref_pro * 1.005 + 1e-6, \
                    (dev_txt, ref_txt)
    # 0/30 divergence on this backend after the round-2 semantics fixes
    # (exact final-skim, underspec admission slot, soft attention state
    # through rejections); allow a single float-tie flip on backends
    # with different op ordering
    assert len(divergent) <= 1, (
        'beam diverges from the oracle on %d/%d lines: %r'
        % (len(divergent), total, divergent))


def test_beam_properties():
    mapping = CharMapping.from_texts(["abcdefghij .,\n"])
    config = Seq2SeqConfig(width=8, voc_size=mapping.voc_size)
    params = init_params(config, seed=7)
    params['char_embedding']['kernel'] *= 400.0
    enc = make_onehot_batch(mapping, LINES + [""], pad_to=T)
    src_len = np.array([len(l) for l in LINES] + [0], np.int32)
    bp = beam.BeamParams(reservoir=32, expand=8, beam_width_in=6,
                         beam_width_out=4)
    out = {k: np.asarray(v) for k, v in beam.decode_beam(
        params, config, bp, enc, mapping.get('\n'), src_len).items()}
    nl = mapping.get('\n')
    for j in range(len(LINES)):
        n = out['count'][j]
        assert 1 <= n <= 4
        # bank is ordered best-first by prospective cost
        costs = out['cost'][j, :n]
        assert np.all(np.diff(costs) >= -1e-6)
        for f in range(n):
            L = out['length'][j, f]
            assert out['idx'][j, f, L - 1] == nl  # every solution ends in \n
            # alignment centers are recorded and within the source
            assert np.all(out['align_pos'][j, f, :L] < T)
    # empty line produces no solutions
    assert out['count'][len(LINES)] == 0


def test_beam_rejection_echoes_input():
    """With an untrained (uninformative) model, the rejection mechanism
    must keep the copy-input path alive so decoding echoes the source
    (the reference guarantees this fallback, seq2seq.py:1370-1375)."""
    mapping = CharMapping.from_texts(["abcdefghij .,\n"])
    config = Seq2SeqConfig(width=8, voc_size=mapping.voc_size)
    params = init_params(config, seed=0)  # near-uniform outputs
    enc = make_onehot_batch(mapping, ["abba dig.\n"], pad_to=T)
    src_len = np.array([T], np.int32)
    bp = beam.BeamParams(reservoir=48, expand=8, beam_width_in=6,
                         beam_width_out=4, rejection_threshold=0.5)
    out = {k: np.asarray(v) for k, v in beam.decode_beam(
        params, config, bp, enc, mapping.get('\n'), src_len).items()}
    texts = [_decode(mapping, out, 0, f) for f in range(out['count'][0])]
    assert "abba dig.\n" in texts


def test_beam_soft_alignments_match_oracle():
    """With return_alignments, the beam yields full per-step soft
    alignment rows (one-hot for rejection steps, raw attention rows
    otherwise) matching the reference-semantics oracle's node.alignment
    sequence — the inputs to soft-score Viterbi re-alignment
    (reference transcode.py:279-349)."""
    mapping = CharMapping.from_texts(["abcdefghij .,\n"])
    config = Seq2SeqConfig(width=8, depth=2, voc_size=mapping.voc_size)
    params = init_params(config, seed=7)
    params['char_embedding']['kernel'] *= 400.0
    enc = make_onehot_batch(mapping, LINES, pad_to=T)
    src_len = np.full(len(LINES), T, np.int32)
    bp = beam.BeamParams(reservoir=192, expand=8, beam_width_in=6,
                         beam_width_out=4)
    out = {k: np.asarray(v) for k, v in beam.decode_beam(
        params, config, bp, enc, mapping.get('\n'), src_len,
        return_alignments=True).items()}
    for j in range(len(LINES)):
        gen = numpy_ref.decode_sequence_beam(
            params, config.as_dict(), mapping, enc[j],
            rejection_threshold=0.3, beam_width_in=6,
            beam_threshold_in=0.2, beam_width_out=4, batch_size=8)
        ref_txt, _, _, ref_aligns = next(gen)
        L = out['length'][j, 0]
        dev_txt = _decode(mapping, out, j)
        assert dev_txt == ref_txt
        # expand windowed rows to dense (L, T) like models/api.py does
        rows, starts = out['align_row'][j, 0], out['align_start'][j, 0]
        win = rows.shape[-1]
        for step in range(L):
            dense = np.zeros(T, np.float32)
            start = int(starts[step])
            n = min(win, T - start)
            dense[start:start + n] = rows[step, :n]
            ref_row = np.asarray(ref_aligns[step], np.float32).reshape(-1)
            np.testing.assert_allclose(dense, ref_row, atol=5e-3,
                                       err_msg=f'line {j} step {step}')


def test_beam_expand_clamped_to_reservoir():
    """expand > reservoir must not crash (top-K is taken over R slots);
    decode_beam clamps K = min(expand, R)."""
    mapping = CharMapping.from_texts(["abcdefghij .,\n"])
    config = Seq2SeqConfig(width=8, voc_size=mapping.voc_size)
    params = init_params(config, seed=7)
    params['char_embedding']['kernel'] *= 400.0
    enc = make_onehot_batch(mapping, LINES[:2], pad_to=T)
    src_len = np.array([len(l) for l in LINES[:2]], np.int32)
    bp = beam.BeamParams(reservoir=8, expand=48, beam_width_in=6,
                         beam_width_out=4)
    out = {k: np.asarray(v) for k, v in beam.decode_beam(
        params, config, bp, enc, mapping.get('\n'), src_len).items()}
    assert np.all(out['count'] >= 1)
