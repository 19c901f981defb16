"""High-level API: correct_lines, predict, evaluate, and training."""

import numpy as np
import pytest

from cor_asv_ann_tpu.models.api import Sequence2Sequence


def make_model(width=16, depth=2, batch_size=8):
    s2s = Sequence2Sequence()
    s2s.width = width
    s2s.depth = depth
    s2s.batch_size = batch_size
    return s2s


def cer(a, b):
    from cor_asv_ann_tpu.lib.alignment import Alignment
    d, n = Alignment().get_adjusted_distance(a, b)
    return d / n


PROBES = ["abca\n", "cab\n", "bbac\n"]


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    """Train a tiny model to uppercase characters (a toy 'correction').

    To keep the test fast over the TPU tunnel, the bulk of the training
    runs as direct train_step calls on a few fixed batches; a short
    `train_model` pass afterwards exercises the full end-to-end loop
    (file reading, split, early stopping, best-weight restore)."""
    import jax
    from cor_asv_ann_tpu.models import train as T
    from cor_asv_ann_tpu.utils.data import vectorize_lines

    tmp = tmp_path_factory.mktemp('train')
    data = tmp / 'train.txt'
    rng = np.random.default_rng(0)
    lines = []
    for _ in range(192):
        n = rng.integers(2, 6)
        word = ''.join(rng.choice(list('abc'), n))
        lines.append(f"{word}\t{word.upper()}")
    data.write_text('\n'.join(lines) + '\n')

    s2s = make_model(width=32, batch_size=16)
    s2s.dropout = 0.0       # tiny toy model: regularization off
    s2s.learning_rate = 1.5e-2
    s2s.map_files([str(data)])
    s2s.configure()

    # fast pretraining: direct jitted steps over 3 fixed big batches
    batches = []
    for lo in range(0, 192, 64):
        srcs = [l.split('\t')[0] + '\n' for l in lines[lo:lo + 64]]
        tgts = [l.split('\t')[1] + '\n' for l in lines[lo:lo + 64]]
        batches.append(vectorize_lines(s2s.mapping, srcs, tgts,
                                       bucketed=False, pad_encoder=8,
                                       pad_decoder=9))
    opt = T.make_optimizer(1.5e-2)
    opt_state = opt.init(s2s.params)
    key = jax.random.PRNGKey(0)
    params = s2s.params
    for step in range(1400):
        enc, dec_in, dec_out, w = batches[step % len(batches)]
        key, sub = jax.random.split(key)
        params, opt_state, loss = T.train_step(
            params, opt_state, s2s.config, enc, dec_in, dec_out, w, sub,
            lm_loss=False, optimizer=opt)
    s2s.params = params
    s2s.status = 2

    # end-to-end loop on top (also verifies it does not regress the model)
    s2s.epochs = 2
    s2s.patience = 3
    s2s.learning_rate = 1e-3
    history = s2s.train([str(data)], checkpoint_dir=None)
    return s2s, history, str(tmp)


def test_training_learns(trained):
    s2s, history, _ = trained
    assert s2s.status == 2
    assert history['loss'][-1] < 1.0  # far below the ~1.6 unigram plateau
    out, probs, scores, aligns = s2s.correct_lines(
        PROBES, fast=True, greedy=True)
    exact = sum(o == p.upper() for o, p in zip(out, PROBES))
    assert exact >= 2, out
    # never much worse than a char off, far better than the raw input
    rates = [cer(o, p.upper()) for o, p in zip(out, PROBES)]
    assert np.mean(rates) < 0.2, (out, rates)
    assert all(0 < p <= 1 for p in probs[0])
    assert len(aligns[0]) == len(out[0])


def test_beam_decoding_trained(trained):
    s2s, _, _ = trained
    greedy, _, _, _ = s2s.correct_lines(PROBES, fast=True, greedy=True)
    beamed, _, scores, _ = s2s.correct_lines(PROBES, fast=False,
                                             greedy=False)
    g_cer = np.mean([cer(o, p.upper()) for o, p in zip(greedy, PROBES)])
    b_cer = np.mean([cer(o, p.upper()) for o, p in zip(beamed, PROBES)])
    assert b_cer <= g_cer + 0.15, (greedy, beamed)
    assert all(s < 2.0 for s in scores)


def test_save_load_roundtrip_decode(trained, tmp_path):
    s2s, _, _ = trained
    path = str(tmp_path / 'toy.h5')
    s2s.save(path)
    s2s2 = Sequence2Sequence()
    s2s2.load_config(path)
    s2s2.configure()
    s2s2.load_weights(path)
    out1, _, _, _ = s2s.correct_lines(PROBES[:1], fast=True, greedy=True)
    out2, _, _, _ = s2s2.correct_lines(PROBES[:1], fast=True, greedy=True)
    assert out1 == out2


def test_predict_generator(trained, tmp_path):
    s2s, _, _ = trained
    f = tmp_path / 'input.txt'
    f.write_text("abca\ncab\n")
    results = list(s2s.predict([str(f)], fast=True, greedy=True))
    names, lines, scores = results[0]
    assert lines[0].endswith('\n')
    assert names[0] == str(f)
    assert cer(lines[0], 'ABCA\n') < 0.5


def test_predict_pipeline_equivalence(trained, tmp_path):
    """predict() streams batches through correct_stream; its pipelined
    results (order, trimming, scores) must match strictly serial
    dispatch across a multi-batch file."""
    s2s, _, _ = trained
    f = tmp_path / 'input.txt'
    words = (PROBES * (3 * s2s.batch_size // len(PROBES) + 1))[
        :3 * s2s.batch_size + 5]
    f.write_text(''.join(words))
    default_depth = Sequence2Sequence.PIPELINE_DEPTH
    results = {}
    try:
        for depth in (0, default_depth):
            s2s.PIPELINE_DEPTH = depth
            results[depth] = list(s2s.predict([str(f)], fast=True,
                                              greedy=True))
    finally:
        s2s.PIPELINE_DEPTH = default_depth
    assert len(results[0]) > 2    # actually spans several batches
    assert results[0] == results[default_depth]


def test_evaluate(trained, tmp_path):
    s2s, _, _ = trained
    f = tmp_path / 'eval.txt'
    f.write_text("abca\tABCA\nbbac\tBBAC\ncba\tCBA\n")
    result = s2s.evaluate([str(f)], fast=True, normalization='NFC',
                          confusion=3, histogram=True)
    # raw OCR is all-lowercase: every char wrong; greedy must be far better
    assert result['greedy']['cer'] < result['OCR']['cer'] * 0.5
    assert 'perplexity' in result['greedy']


def test_evaluate_pipeline_equivalence(trained, tmp_path):
    """evaluate() pipelines both decodes across batches; its result dict
    (streaming Edits means/variances, perplexity, confusion) must match
    strictly serial dispatch on a multi-batch file, greedy and beamed."""
    s2s, _, _ = trained
    f = tmp_path / 'eval.txt'
    rows = [p.rstrip('\n') + '\t' + p.upper().rstrip('\n') for p in PROBES]
    rows = (rows * (2 * s2s.batch_size // len(rows) + 1))[
        :2 * s2s.batch_size + 3]
    f.write_text('\n'.join(rows) + '\n')
    default_depth = Sequence2Sequence.PIPELINE_DEPTH
    results = {}
    try:
        for depth in (0, default_depth):
            s2s.PIPELINE_DEPTH = depth
            results[depth] = s2s.evaluate([str(f)], fast=False,
                                          normalization='NFC',
                                          confusion=3, histogram=False)
    finally:
        s2s.PIPELINE_DEPTH = default_depth
    assert results[0] == results[default_depth]


def test_incremental_mapping_growth(trained):
    s2s, _, tmp = trained
    import pathlib
    data2 = pathlib.Path(tmp) / 'more.txt'
    data2.write_text("xyz\tXYZ\n")
    old_voc = s2s.voc_size
    before, _, _, _ = s2s.correct_lines(PROBES[:1], fast=True, greedy=True)
    s2s.map_files([str(data2)])
    assert s2s.voc_size > old_voc
    assert s2s.status == 2  # weights were transferred, still trained
    after, _, _, _ = s2s.correct_lines(PROBES[:1], fast=True, greedy=True)
    assert before == after  # old capability survives embedding transfer


def test_length_sorted_multibatch(trained):
    """Inputs larger than batch_size are sorted by length internally;
    outputs must come back in input order."""
    s2s, _, _ = trained
    lines = (["abca\n", "cab\n"] * (s2s.batch_size // 2 + 2))[
        :s2s.batch_size + 3]
    out, probs, scores, aligns = s2s.correct_lines(lines, fast=True,
                                                   greedy=True)
    assert len(out) == len(lines)
    single, _, _, _ = s2s.correct_lines(["abca\n"], fast=True, greedy=True)
    for line, o in zip(lines, out):
        if line == "abca\n":
            assert o == single[0]


def test_expand_windowed_alignment_matches_naive():
    """Vectorized window-row scatter == the naive per-step loop,
    including windows whose tail crosses the T boundary (rejection rows
    started at src_pos near T-1)."""
    from cor_asv_ann_tpu.models.api import _expand_windowed_alignment
    rng = np.random.default_rng(7)
    for L, win, T in ((5, 12, 16), (9, 12, 64), (1, 12, 12), (0, 12, 8)):
        rows = rng.random((L, win)).astype(np.float32)
        starts = rng.integers(0, T, L).astype(np.int32)
        naive = np.zeros((L, T), np.float32)
        for step in range(L):
            start = int(starts[step])
            n = min(win, T - start)
            naive[step, start:start + n] = rows[step, :n]
        got = _expand_windowed_alignment(rows, starts, T)
        assert got.shape == (L, T)
        assert np.array_equal(got, naive)


def test_pipeline_depth_equivalence(trained):
    """Pipelined chunk dispatch (PIPELINE_DEPTH queued device batches)
    must produce results identical to strictly serial dispatch/fetch,
    for greedy and beam, across multiple chunks."""
    s2s, _, _ = trained
    lines = (PROBES * (2 * s2s.batch_size // len(PROBES) + 1))[
        :2 * s2s.batch_size + 3]
    default_depth = Sequence2Sequence.PIPELINE_DEPTH
    assert default_depth > 0
    try:
        for greedy in (True, False):
            results = {}
            for depth in (0, default_depth):
                s2s.PIPELINE_DEPTH = depth
                results[depth] = s2s.correct_lines(
                    lines, fast=greedy, greedy=greedy)
            assert results[0] == results[default_depth], \
                'greedy=%s' % greedy
    finally:
        s2s.PIPELINE_DEPTH = default_depth


def test_pipeline_fuzz_modes(trained):
    """Randomized depth-0 vs pipelined equivalence across the
    combinations the targeted tests skip: per-char confidence inputs,
    beam + alignments, odd batch counts/sizes."""
    s2s, _, _ = trained
    rng = np.random.default_rng(11)
    B = s2s.batch_size
    default_depth = Sequence2Sequence.PIPELINE_DEPTH
    chars = list('abc')
    try:
        for case in range(4):
            n = int(rng.integers(1, 2 * B + 4))
            lines = [''.join(rng.choice(chars,
                                        int(rng.integers(1, 6)))) + '\n'
                     for _ in range(n)]
            conf = None
            if case % 2:
                conf = [[float(rng.uniform(0.5, 1.0)) for _ in line]
                        for line in lines]
            greedy = case < 2
            results = {}
            for depth in (0, default_depth):
                s2s.PIPELINE_DEPTH = depth
                results[depth] = s2s.correct_lines(
                    lines, conf=conf, fast=greedy, greedy=greedy,
                    return_alignments=True)
            assert results[0] == results[default_depth], \
                'case %d (n=%d greedy=%s conf=%s)' % (
                    case, n, greedy, conf is not None)
    finally:
        s2s.PIPELINE_DEPTH = default_depth


def test_beam_oracle_agreement_trained(trained):
    """On the trained model, the device beam's 1-best must agree with the
    reference-semantics NumPy oracle (global best-first queue)."""
    from cor_asv_ann_tpu.lib import numpy_ref
    from cor_asv_ann_tpu.models import beam
    from cor_asv_ann_tpu.utils.data import vectorize_lines

    s2s, _, _ = trained
    enc, _, _, _ = vectorize_lines(s2s.mapping, PROBES, ['' for _ in PROBES],
                                   bucketed=False, pad_encoder=8,
                                   pad_decoder=9)
    T = enc.shape[1]
    src_len = np.full(len(PROBES), T, np.int32)  # oracle uses padded len0
    bp = beam.BeamParams(reservoir=48, expand=8, beam_width_in=6,
                         beam_width_out=4,
                         rejection_threshold=s2s.rejection_threshold)
    out = {k: np.asarray(v) for k, v in beam.decode_beam(
        s2s.params, s2s.config, bp, enc, s2s.mapping.get('\n'),
        src_len).items()}
    agree = 0
    for j in range(len(PROBES)):
        gen = numpy_ref.decode_sequence_beam(
            s2s.params, s2s.config.as_dict(), s2s.mapping, enc[j],
            rejection_threshold=s2s.rejection_threshold, beam_width_in=6,
            beam_threshold_in=0.2, beam_width_out=4, batch_size=8)
        try:
            ref_txt, _, _, _ = next(gen)
        except StopIteration:
            continue
        L = out['length'][j, 0]
        ours = ''.join(s2s.mapping.i2c[int(i)]
                       for i in out['idx'][j, 0, :L])
        agree += ours == ref_txt
    assert agree >= len(PROBES) - 1, agree


def test_bfloat16_inference(trained):
    """bfloat16 compute keeps decode quality (tiny CER delta)."""
    s2s, _, _ = trained
    f32, _, _, _ = s2s.correct_lines(PROBES, fast=True, greedy=True)
    s2s.compute = 'bfloat16'
    try:
        bf16, _, _, _ = s2s.correct_lines(PROBES, fast=True, greedy=True)
    finally:
        s2s.compute = 'float32'
    rates = [cer(a, b) for a, b in zip(bf16, f32)]
    assert np.mean(rates) < 0.15, (f32, bf16)


def test_predict_confmat_pkl(trained, tmp_path):
    """Confusion-network pickle input through the full predict path
    (reference configs: pkl confmat -> gen_lines -> correct_lines)."""
    import pickle
    s2s, _, _ = trained
    data = [
        ([[('a', 0.7), ('b', 0.3)], [('b', 0.9)], [('ca', 0.6)],
          [('\n', 1.0)]], 'abca\n'),
        ([[('c', 0.8)], [('ab', 0.9), ('a', 0.1)], [('\n', 1.0)]],
         'cab\n'),
    ]
    f = tmp_path / 'confmat.pkl'
    f.write_bytes(pickle.dumps(data))
    results = list(s2s.predict([str(f)], fast=True, greedy=True))
    names, lines, scores = results[0]
    assert len(lines) >= 2
    # the model corrects the top path of the confmat to uppercase
    assert lines[0].strip().isupper() or lines[0] == '\n', lines[0]
    # beamed decode over the same confmat input also runs
    results_b = list(s2s.predict([str(f)], fast=False, greedy=False))
    assert len(results_b[0][1]) >= 2
