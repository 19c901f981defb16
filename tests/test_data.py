"""Data pipeline: mapping, readers, vectorization semantics."""

import pickle

import numpy as np

from cor_asv_ann_tpu.utils.data import (
    CharMapping, GAP, bucket_length, gen_line_batches, scan_files,
    vectorize_lines)


def test_mapping_reserves_zero_and_gap():
    m = CharMapping.from_texts(["ab\a\n"])
    assert m.c2i[''] == 0
    assert GAP not in m.c2i
    assert m.voc_size == 4  # '', '\n', 'a', 'b'
    codes = m.to_codepoints()
    m2 = CharMapping.from_codepoints(codes)
    assert m2.c2i == m.c2i and m2.i2c == m.i2c


def test_mapping_sorted_indices():
    m = CharMapping.from_texts(["cba\n"])
    # indices sorted by codepoint after the reserved 0
    assert m.c2i['\n'] < m.c2i['a'] < m.c2i['b'] < m.c2i['c']


def test_bucket_length():
    assert bucket_length(1) == 32
    assert bucket_length(32) == 32
    assert bucket_length(33) == 64
    assert bucket_length(2000) == 2048


def test_vectorize_teacher_forcing():
    m = CharMapping.from_texts(["ab\n"])
    enc, dec_in, dec_out, w = vectorize_lines(
        m, ["ab\n"], ["ba\n"], bucketed=False)
    a, b, nl = m.c2i['a'], m.c2i['b'], m.c2i['\n']
    assert enc.shape == (1, 3, 4)
    assert enc[0, 0, a] == 1 and enc[0, 1, b] == 1 and enc[0, 2, nl] == 1
    # decoder input shifted right with zero start symbol
    assert np.all(dec_in[0, 0] == 0)
    assert dec_in[0, 1, b] == 1 and dec_in[0, 2, a] == 1 and dec_in[0, 3, nl] == 1
    # teacher-forced output aligned at t
    assert dec_out[0, 0, b] == 1 and dec_out[0, 1, a] == 1 and dec_out[0, 2, nl] == 1
    # padding weight zero after end
    assert w[0, 2] == 1 and np.all(w[0, 3:] == 0)


def test_vectorize_unmapped_char_underspecifies():
    m = CharMapping.from_texts(["a\n"])
    enc, _, _, _ = vectorize_lines(m, ["x\n"], ["a\n"], bucketed=False)
    assert enc[0, 0, 0] == 1  # 'x' -> index 0


def test_vectorize_confmat():
    m = CharMapping.from_texts(["abc\n"])
    confs = [[[('ab', 0.6), ('c', 0.4)], [('\n', 1.0)]]]
    enc, _, _, _ = vectorize_lines(m, ["ab\n"], ["ab\n"], confs=confs,
                                   bucketed=False)
    a, b, c, nl = m.c2i['a'], m.c2i['b'], m.c2i['c'], m.c2i['\n']
    assert enc[0, 0, a] == np.float32(0.6)
    assert enc[0, 1, b] == np.float32(0.6)
    assert enc[0, 0, c] == np.float32(0.4)
    assert enc[0, 2, nl] == np.float32(1.0)


def test_gen_line_batches_tsv(tmp_path):
    f = tmp_path / 'data.txt'
    f.write_text("abc\tabd\nxyz\txyz\nfoo\tboo\n")
    batches = list(gen_line_batches([str(f)], batch_size=2))
    assert len(batches) == 2
    srcs, confs, tgts, names = batches[0]
    assert srcs == ["abc\n", "xyz\n"]
    assert tgts == ["abd\n", "xyz\n"]
    # final partial batch padded with empty lines
    srcs2, _, tgts2, _ = batches[1]
    assert srcs2 == ["foo\n", ""]


def test_gen_line_batches_split(tmp_path):
    f = tmp_path / 'data.txt'
    f.write_text(''.join(f"l{i}\tl{i}\n" for i in range(10)))
    split = np.array([0.1, 0.9] * 5)
    train = list(gen_line_batches([str(f)], 100, split=split, train=True))
    val = list(gen_line_batches([str(f)], 100, split=split, train=False))
    assert len(train[0][0]) == 100  # padded batch
    train_lines = [l for l in train[0][0] if l]
    val_lines = [l for l in val[0][0] if l]
    assert len(train_lines) == 5 and len(val_lines) == 5
    assert not set(train_lines) & set(val_lines)


def test_gen_line_batches_pkl_probs(tmp_path):
    f = tmp_path / 'data.pkl'
    data = [([('a', 0.9), ('b', 0.8), ('\n', 1.0)], 'ab\n')]
    f.write_bytes(pickle.dumps(data))
    (srcs, confs, tgts, _), = gen_line_batches([str(f)], 1)
    assert srcs == ['ab\n']
    assert confs == [[0.9, 0.8, 1.0]]
    assert tgts == ['ab\n']


def test_pkl_plain_string_entries(tmp_path):
    """Plain-string pkl sources are text-only (conf None), not
    misdetected as confusion networks (which crashes vectorization —
    as it does in the reference)."""
    f = tmp_path / 'data.pkl'
    f.write_bytes(pickle.dumps([('abc\n', 'abc\n'), ('xy', 'xy\n')]))
    (srcs, confs, tgts, _), = gen_line_batches([str(f)], 2)
    assert srcs == ['abc\n', '\n']  # no trailing newline -> bare EOS
    assert confs is None
    from cor_asv_ann_tpu.utils.data import CharMapping, vectorize_lines
    m = CharMapping.from_texts(srcs + tgts)
    enc, *_ = vectorize_lines(m, srcs, tgts, confs)
    assert enc.shape[0] == 2


def test_pkl_missing_newline_keeps_entry_format(tmp_path):
    """The bare-EOS replacement for a truncated line stays in the
    entry's own conf format, so one short line cannot poison a
    prob-line batch with a confmat (which crashes vectorization both
    here and in the reference)."""
    from cor_asv_ann_tpu.utils.data import CharMapping, vectorize_lines
    f = tmp_path / 'data.pkl'
    data = [([('a', 0.9), ('b', 0.8), ('\n', 1.0)], 'ab\n'),
            ([('a', 0.7), ('b', 0.6)], 'ab\n')]  # no newline
    f.write_bytes(pickle.dumps(data))
    (srcs, confs, tgts, _), = gen_line_batches([str(f)], 2)
    assert srcs == ['ab\n', '\n']
    assert confs == [[0.9, 0.8, 1.0], [1.0]]
    m = CharMapping.from_texts(srcs + tgts)
    enc, *_ = vectorize_lines(m, srcs, tgts, confs)
    assert enc[0, 0, m.get('a')] == np.float32(0.9)
    assert enc[1, 0, m.get('\n')] == 1.0


def test_mixed_conf_formats_vectorize(tmp_path):
    """A prob line and a confmat in ONE batch vectorize equivalently
    regardless of which format is detected first (batch-wide detection
    coerces per line)."""
    from cor_asv_ann_tpu.utils.data import CharMapping, vectorize_lines
    m = CharMapping.from_texts(['ab\n'])
    prob_line, prob_conf = 'ab\n', [0.9, 0.8, 1.0]
    cm_line = 'ab\n'
    cm_conf = [[('a', 0.9)], [('b', 0.8)], [('\n', 1.0)]]
    for confs in ([prob_conf, cm_conf], [cm_conf, prob_conf]):
        enc, *_ = vectorize_lines(m, [prob_line, cm_line],
                                  ['ab\n', 'ab\n'], confs)
        np.testing.assert_array_equal(enc[0], enc[1])
        assert enc[0, 1, m.get('b')] == np.float32(0.8)
    # a conf-less plain-text line in a confmat batch keeps its text
    # (one-hot, prob 1.0) instead of vectorizing to all-padding
    enc, *_ = vectorize_lines(m, ['ab\n', 'ab\n'], ['ab\n', 'ab\n'],
                              [cm_conf, None])
    assert enc[1, 0, m.get('a')] == 1.0
    assert enc[1, 2, m.get('\n')] == 1.0


def test_nfc_composition_realigns_conf(tmp_path):
    """NFC composition shortens 'e' + combining acute to one char; the
    per-char confidences are realigned instead of crashing
    vectorization."""
    f = tmp_path / 'data.pkl'
    data = [([('e', 0.9), ('́', 0.7), ('\n', 1.0)], 'é\n')]
    f.write_bytes(pickle.dumps(data))
    (srcs, confs, tgts, _), = gen_line_batches([str(f)], 1)
    assert srcs == ['é\n']
    assert len(confs[0]) == len(srcs[0])
    from cor_asv_ann_tpu.utils.data import CharMapping, vectorize_lines
    m = CharMapping.from_texts(srcs + tgts)
    enc, *_ = vectorize_lines(m, srcs, tgts, confs)
    assert enc[0, 0, m.get('é')] == np.float32(0.9)


def test_tab_inside_target_row(tmp_path):
    """A stray tab inside the target column must not abort the whole
    run (the reference's bare split() raises there)."""
    f = tmp_path / 'data.txt'
    f.write_text('ab\tta\tb\n')
    (srcs, confs, tgts, _), = gen_line_batches([str(f)], 1)
    assert srcs == ['ab\n']
    assert tgts == ['ta\tb\n']


def test_scan_files(tmp_path):
    f = tmp_path / 'data.txt'
    f.write_text("ab\tabc\n")
    chars, n = scan_files([str(f)])
    assert n == 1
    assert {'a', 'b', 'c', '\n'} <= chars
