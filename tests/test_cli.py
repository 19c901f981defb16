"""CLI surfaces: compare, proc, eval, train (via click test runner)."""

import json

import numpy as np
import pytest
from click.testing import CliRunner

from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.utils import io_h5
from cor_asv_ann_tpu.utils.data import CharMapping


@pytest.fixture(scope='module')
def model_file(tmp_path_factory):
    """A small random (untrained) model over a-j."""
    mapping = CharMapping.from_texts(["abcdefghij .,\n"])
    config = Seq2SeqConfig(width=16, depth=2, voc_size=mapping.voc_size)
    params = init_params(config, seed=1)
    params['char_embedding']['kernel'] *= 300.0  # peaked -> terminates
    path = str(tmp_path_factory.mktemp('model') / 'rand.h5')
    io_h5.save_model(path, params, config, mapping)
    return path


def test_compare_cli(tmp_path):
    from cor_asv_ann_tpu.scripts.compare import cli
    gt = tmp_path / 'gt.txt'
    ocr = tmp_path / 'ocr.txt'
    gt.write_text("Der Hund liegt\nim Garten\n")
    ocr.write_text("Der Hvnd liegt\nim Garten\n")
    report_file = tmp_path / 'report.json'
    runner = CliRunner()
    result = runner.invoke(cli, ['-o', str(report_file), '-n', 'NFC',
                                 str(gt), str(ocr)])
    assert result.exit_code == 0, result.output
    report = json.loads(report_file.read_text())
    pair = f'{ocr},{gt}'
    assert pair in report
    assert 0 < report[pair]['char-error-rate-mean'] < 0.2
    assert report[pair]['num-lines'] == 2


def test_compare_cli_page_xml(tmp_path):
    from cor_asv_ann_tpu.scripts.compare import cli
    from cor_asv_ann_tpu.utils import page as P
    doc = P.new_page()
    region = P.add_region(doc, 'r1')
    line = P.add_line(region, 'l1')
    line.add_textequiv('Der Hund')
    gt_xml = tmp_path / 'gt.xml'
    doc.save(str(gt_xml))
    doc2 = P.new_page()
    region2 = P.add_region(doc2, 'r1')
    line2 = P.add_line(region2, 'l1')
    line2.add_textequiv('Der Hvnd')
    ocr_xml = tmp_path / 'ocr.xml'
    doc2.save(str(ocr_xml))
    runner = CliRunner()
    result = runner.invoke(cli, ['-n', 'NFC', str(gt_xml), str(ocr_xml)])
    assert result.exit_code == 0, result.output
    assert 'char-error-rate-mean' in result.output


def test_proc_cli(model_file, tmp_path):
    from cor_asv_ann_tpu.scripts.proc import cli
    data = tmp_path / 'lines.txt'
    data.write_text("abba dig\nchef i gad\n")
    runner = CliRunner()
    result = runner.invoke(cli, ['-m', model_file, '-f',
                                 '-s', '.cor.txt', str(data)])
    assert result.exit_code == 0, result.output
    out = tmp_path / 'lines.cor.txt'
    assert out.exists()
    # untrained model output is garbage, but one output line is written
    # per input line (unterminated decodes lack the trailing newline)
    assert len(out.read_text()) > 0


def test_proc_cli_mesh(model_file, tmp_path):
    """--mesh -1 serves over all (virtual) devices; output matches the
    single-device run byte for byte."""
    from cor_asv_ann_tpu.scripts.proc import cli
    data = tmp_path / 'lines.txt'
    data.write_text("abba dig\nchef i gad\n")
    runner = CliRunner()
    result = runner.invoke(cli, ['-m', model_file, '-f',
                                 '-s', '.cor1.txt', str(data)])
    assert result.exit_code == 0, result.output
    result = runner.invoke(cli, ['-m', model_file, '-f', '--mesh', '-1',
                                 '-s', '.cor8.txt', str(data)])
    assert result.exit_code == 0, result.output
    assert (tmp_path / 'lines.cor8.txt').read_text() == \
        (tmp_path / 'lines.cor1.txt').read_text()


def test_proc_cli_compute_bf16(model_file, tmp_path):
    from cor_asv_ann_tpu.scripts.proc import cli
    data = tmp_path / 'lines.txt'
    data.write_text("abba dig\n")
    runner = CliRunner()
    result = runner.invoke(cli, ['-m', model_file, '-f',
                                 '--compute', 'bfloat16',
                                 '-s', '.cor.txt', str(data)])
    assert result.exit_code == 0, result.output
    assert (tmp_path / 'lines.cor.txt').exists()


def test_eval_cli(model_file, tmp_path):
    from cor_asv_ann_tpu.scripts.eval import cli
    data = tmp_path / 'pairs.tsv'
    data.write_text("abba\tabba\ndig\tdig\n")
    runner = CliRunner()
    result = runner.invoke(cli, ['-m', model_file, '-f', '-n', 'NFC',
                                 str(data)])
    assert result.exit_code == 0, result.output


def test_train_cli(tmp_path):
    from cor_asv_ann_tpu.scripts.train import cli
    data = tmp_path / 'train.tsv'
    rows = [f"{w}\t{w}" for w in ('ab', 'ba', 'aab', 'bba') * 8]
    data.write_text('\n'.join(rows) + '\n')
    model = tmp_path / 'out.h5'
    runner = CliRunner()
    # patch epochs down via a tiny width/depth fast run
    result = runner.invoke(cli, ['-m', str(model), '-w', '8', '-d', '1',
                                 str(data)],
                           catch_exceptions=False,
                           env={'CORASVANN_TEST_EPOCHS': '2'})
    assert result.exit_code == 0, result.output
    assert model.exists()
    config, mapping = io_h5.load_config(str(model))
    assert config.width == 8 and config.depth == 1
    assert 'a' in mapping.c2i


def test_prefetcher():
    from cor_asv_ann_tpu.utils.prefetch import prefetch
    assert list(prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError('x')
    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)


def test_prefetcher_early_close():
    """Abandoning the iterator mid-stream releases the worker thread."""
    import threading
    from cor_asv_ann_tpu.utils.prefetch import prefetch
    opened = []

    def gen():
        opened.append(True)
        for i in range(1000):
            yield i

    before = threading.active_count()
    with prefetch(gen(), depth=2) as it:
        assert next(it) == 0
    # worker must have exited
    import time
    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_prefetcher_stopiteration_after_exhaustion():
    """The iterator protocol must keep raising StopIteration after
    exhaustion instead of blocking on the dead worker's empty queue."""
    from cor_asv_ann_tpu.utils.prefetch import prefetch
    it = prefetch(iter(range(3)))
    assert list(it) == [0, 1, 2]
    with pytest.raises(StopIteration):
        next(it)
    assert list(it) == []


def test_prefetcher_close_bounded_on_stuck_producer():
    """close() must return within its timeout even when the wrapped
    generator is blocked producing (e.g. a wedged device transfer)."""
    import threading
    import time
    from cor_asv_ann_tpu.utils.prefetch import prefetch
    release = threading.Event()

    def stuck():
        yield 1
        release.wait(30)   # simulates a hung to_device()
        yield 2

    it = prefetch(stuck(), depth=1)
    assert next(it) == 1
    t0 = time.monotonic()
    it.close(timeout=0.5)
    assert time.monotonic() - t0 < 5.0
    release.set()   # let the daemon thread die


def test_echo_line_formats():
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    echo = Sequence2Sequence._echo_line
    assert echo('abc\n') == 'abc\n'
    assert echo([('a', 0.9), ('b', 0.8)]) == 'ab'
    assert echo([[('ab', 0.6), ('c', 0.4)], [('\n', 1.0)]]) == 'ab\n'
    assert echo([[], [('x', 1.0)]]) == 'x'


def test_scan_files_confmat_alternatives(tmp_path):
    """Characters occurring only in non-top confmat alternatives must
    enter the charset (reference map_files, seq2seq.py:570-573)."""
    import pickle
    from cor_asv_ann_tpu.utils.data import scan_files
    data = [([[('o', 0.6), ('ö', 0.4)], [('\n', 1.0)]], 'o\n')]
    f = tmp_path / 'cm.pkl'
    f.write_bytes(pickle.dumps(data))
    chars, n = scan_files([str(f)])
    assert 'ö' in chars and n == 1


def test_transfer_dta_lm_cli(tmp_path):
    import h5py
    from cor_asv_ann_tpu.scripts.transfer_dta_lm import cli
    src = tmp_path / 'lm.h5'
    with h5py.File(str(src), 'w') as f:
        f.attrs['layer_names'] = np.array([b'lstm_1'])
        g = f.create_group('lstm_1')
        g.attrs['weight_names'] = np.array([b'lstm_1/kernel:0'])
        g.create_dataset('lstm_1/kernel:0',
                         data=np.ones((20, 16), np.float32))
    dst = tmp_path / 'init.h5'
    runner = CliRunner()
    result = runner.invoke(cli, [str(src), str(dst)])
    assert result.exit_code == 0, result.output
    with h5py.File(str(dst)) as f:
        assert 'decoder_lstm_1' in f
        k = np.asarray(f['decoder_lstm_1/lstm_1/kernel:0'])
        assert k.shape == (10, 16)  # 10 context rows sliced


def test_profiling_helpers(tmp_path, capsys):
    from cor_asv_ann_tpu.utils.profiling import maybe_profile, PhaseTimer
    prof_file = tmp_path / 'out.prof'
    with maybe_profile(profile_file=str(prof_file)):
        sum(range(1000))
    assert prof_file.exists()
    timer = PhaseTimer()
    with timer.phase('a'):
        sum(range(1000))
    with timer.phase('b'):
        pass
    report = timer.report()
    assert 'a' in report and 'b' in report


def test_api_decode_batch_greedy_wrapper():
    from cor_asv_ann_tpu.models.api import Sequence2Sequence
    from cor_asv_ann_tpu.models.config import init_params
    s2s = Sequence2Sequence()
    s2s.width, s2s.depth, s2s.batch_size = 8, 2, 4
    s2s.mapping, _ = s2s.mapping.grow(["ab\n"])
    s2s.configure()
    s2s.params['char_embedding']['kernel'] = \
        s2s.params['char_embedding']['kernel'] * 400.0
    s2s.status = 2
    enc, _, _, _ = s2s.vectorize_lines(["ab\n"], [""])
    texts, probs, scores, aligns = s2s.decode_batch_greedy(enc)
    assert len(texts) == 1 and len(probs[0]) == len(texts[0])
    assert aligns[0].shape[1] == enc.shape[1]


def test_compare_lookup_mixed_key_types():
    """PAGE-XML OCR (string line ids) against plain-text GT (list):
    ids that cannot match positionally count as missing, not TypeError."""
    from cor_asv_ann_tpu.scripts.compare import lookup
    assert lookup({'l1': 'x'}, 'l1') == 'x'
    assert lookup({'l1': 'x'}, 'l2') is None
    assert lookup(['a', 'b'], 1) == 'b'
    assert lookup(['a', 'b'], 7) is None
    assert lookup(['a', 'b'], 'l1') is None
