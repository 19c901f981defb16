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


@pytest.fixture(scope='module')
def trained(tmp_path_factory):
    """Train a tiny model to uppercase characters (a toy 'correction')."""
    tmp = tmp_path_factory.mktemp('train')
    data = tmp / 'train.txt'
    rng = np.random.default_rng(0)
    lines = []
    for _ in range(200):
        n = rng.integers(3, 10)
        word = ''.join(rng.choice(list('abcd'), n))
        lines.append(f"{word}\t{word.upper()}")
    data.write_text('\n'.join(lines) + '\n')
    s2s = make_model()
    s2s.epochs = 30
    s2s.configure()
    history = s2s.train([str(data)], checkpoint_dir=None)
    return s2s, history, str(tmp)


def test_training_learns(trained):
    s2s, history, _ = trained
    assert s2s.status == 2
    assert history['loss'][-1] < history['loss'][0]
    # the toy task must actually be learned
    out, probs, scores, aligns = s2s.correct_lines(
        ["abcd\n", "dcba\n"], fast=True, greedy=True)
    assert out[0] == "ABCD\n"
    assert out[1] == "DCBA\n"
    assert all(0 < p <= 1 for p in probs[0])
    assert len(aligns[0]) == len(out[0])


def test_beam_decoding_trained(trained):
    s2s, _, _ = trained
    out, _, scores, _ = s2s.correct_lines(
        ["abcd\n", "bbca\n"], fast=False, greedy=False)
    assert out[0] == "ABCD\n"
    assert out[1] == "BBCA\n"
    assert scores[0] < 1.0  # confident


def test_save_load_roundtrip_decode(trained, tmp_path):
    s2s, _, _ = trained
    path = str(tmp_path / 'toy.h5')
    s2s.save(path)
    s2s2 = Sequence2Sequence()
    s2s2.load_config(path)
    s2s2.configure()
    s2s2.load_weights(path)
    out1, _, _, _ = s2s.correct_lines(["abcd\n"], fast=True, greedy=True)
    out2, _, _, _ = s2s2.correct_lines(["abcd\n"], fast=True, greedy=True)
    assert out1 == out2


def test_predict_generator(trained, tmp_path):
    s2s, _, _ = trained
    f = tmp_path / 'input.txt'
    f.write_text("abcd\ndcba\n")
    results = list(s2s.predict([str(f)], fast=True, greedy=True))
    names, lines, scores = results[0]
    assert lines[0] == "ABCD\n"


def test_evaluate(trained, tmp_path):
    s2s, _, _ = trained
    f = tmp_path / 'eval.txt'
    f.write_text("abcd\tABCD\nbbca\tBBCA\n")
    result = s2s.evaluate([str(f)], fast=True, normalization='NFC',
                          confusion=3, histogram=True)
    assert result['greedy']['cer'] <= result['OCR']['cer']
    assert result['greedy']['cer'] == 0.0
    assert 'perplexity' in result['greedy']


def test_incremental_mapping_growth(trained):
    s2s, _, tmp = trained
    import pathlib
    data2 = pathlib.Path(tmp) / 'more.txt'
    data2.write_text("xyz\tXYZ\n")
    old_voc = s2s.voc_size
    s2s.map_files([str(data2)])
    assert s2s.voc_size > old_voc
    assert s2s.status == 2  # weights were transferred, still trained
    # old capability survives the embedding transfer
    out, _, _, _ = s2s.correct_lines(["abcd\n"], fast=True, greedy=True)
    assert out[0] == "ABCD\n"
