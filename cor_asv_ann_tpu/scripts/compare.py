"""cor-asv-ann-compare CLI (reference scripts/compare.py:16-173).

Model-free 1:n comparison of PAGE-XML or plain-text files, producing a
JSON report with per-line CER/WER, aggregate statistics, worst lines,
confusion tables and histograms.
"""

import json
import logging
import math
import os
import sys

import click

from ..lib.alignment import Alignment, Edits, splitwords

CONTEXT_SETTINGS = dict(help_option_names=['-h', '--help'])


def get_lines(fname, flist=False):
    """Read lines from a PAGE-XML file (dict by line id), a plain text
    file (list), or a file list (dict by base name)."""
    with open(fname, 'r', encoding='utf-8') as fd:
        rawlines = [line.rstrip('\r\n') for line in fd.readlines()]
    if rawlines and rawlines[0].lstrip().startswith('<?xml'):
        try:
            from ..utils.page import parse_page
            from ..wrapper.evaluate import page_get_lines
            doc = parse_page(fname)
            return page_get_lines(doc, 'id')
        except Exception:
            pass
    lines = rawlines
    if flist:
        # ocropy style (e.g. -F <(ls -1 *.gt.txt) <(ls -1 *.ocr.txt))
        files = lines
        lines = dict()
        for fname2 in files:
            with open(fname2, 'r', encoding='utf-8') as fd:
                key = fname2
                if fname2.endswith('.txt'):
                    dirname, basename = os.path.split(fname2)
                    key = os.path.join(dirname, basename.split('.')[0])
                lines[key] = fd.readline()
    return lines


@click.command(context_settings=CONTEXT_SETTINGS)
@click.option('-o', '--output-file', default='-',
              help='path name of generated report (default: stdout)',
              type=click.Path(dir_okay=False, writable=True,
                              allow_dash=True))
@click.option('-n', '--normalization', default='historic_latin',
              type=click.Choice(['Levenshtein-fast', 'Levenshtein', 'NFC',
                                 'NFKC', 'historic_latin']),
              help='normalize character sequences before comparison')
@click.option('-l', '--gt-level', default=1, type=click.IntRange(1, 3),
              help='GT transcription level for historic_latin')
@click.option('-c', '--confusion', default=10, type=click.IntRange(min=0),
              help='show this number of most frequent (non-identity) edits')
@click.option('-H', '--histogram', is_flag=True,
              help='aggregate and compare character histograms')
@click.option('-F', '--file-lists', is_flag=True,
              help='interpret files as lists of single-line text file paths')
@click.argument('gt_file', type=click.Path(dir_okay=False, exists=True))
@click.argument('ocr_files', type=click.Path(dir_okay=False, exists=True),
                nargs=-1)
def cli(output_file, normalization, gt_level, confusion, histogram,
        file_lists, gt_file, ocr_files):
    """Compare text lines by aligning and computing the textual distance
    and character error rate.

    This compares 1:n given PAGE-XML or plain text files.

    If `--file-lists` is given and files are plain text, then they will
    be interpreted as (newline-separated) lists of path names for
    single-line text files (Ocropus convention).

    Writes a JSON report file to `--output-file`.
    """
    logging.basicConfig(
        format='%(asctime)s.%(msecs)03d %(levelname)s %(name)s - %(message)s',
        datefmt='%H:%M:%S', level=logging.INFO)
    log = logging.getLogger(__name__)

    caligners = [Alignment(logger=log, confusion=bool(confusion))
                 for _ in ocr_files]
    waligners = [Alignment(logger=log) for _ in ocr_files]
    cedits = [Edits(logger=log, histogram=bool(histogram))
              for _ in ocr_files]
    wedits = [Edits(logger=log) for _ in ocr_files]
    log.info('processing %r', gt_file)
    gt_lines = get_lines(gt_file, file_lists)
    if not gt_lines:
        log.critical('file %r contains no text lines to compare', gt_file)
        sys.exit(1)
    report = dict()
    for i, ocr_file in enumerate(ocr_files):
        log.info('processing %r', ocr_file)
        ocr_lines = get_lines(ocr_file, file_lists)
        if not ocr_lines:
            log.error('file %r contains no text lines to compare', ocr_file)
            continue
        pair = ocr_file + ',' + gt_file
        line_ids = (ocr_lines.keys() if isinstance(ocr_lines, dict)
                    else range(len(ocr_lines)))
        for line_id in line_ids:
            report.setdefault(pair, dict()).setdefault('lines', list())
            has_line = (line_id in gt_lines
                        if isinstance(gt_lines, dict)
                        else line_id < len(gt_lines))
            if not has_line:
                log.error('line %r in file %r is missing from GT file %r',
                          line_id, ocr_file, gt_file)
                report[pair]['lines'].append({str(line_id): 'missing'})
                continue
            gt_line = gt_lines[line_id].strip()
            gt_words = splitwords(gt_line)
            ocr_line = ocr_lines[line_id].strip()
            ocr_words = splitwords(ocr_line)
            if 0.2 * (len(gt_line) + len(ocr_line)) < \
                    math.fabs(len(gt_line) - len(ocr_line)) > 5:
                log.warning('line %r in file %r deviates significantly in '
                            'length (%d vs %d)', line_id, ocr_file,
                            len(gt_line), len(ocr_line))
            if normalization == 'Levenshtein-fast':
                cdist, clen = caligners[i].get_levenshtein_distance(
                    ocr_line, gt_line)
                wdist, wlen = waligners[i].get_levenshtein_distance(
                    ocr_words, gt_words)
            else:
                norm = None if normalization == 'Levenshtein' \
                    else normalization
                cdist, clen = caligners[i].get_adjusted_distance(
                    ocr_line, gt_line, normalization=norm,
                    gtlevel=gt_level)
                wdist, wlen = waligners[i].get_adjusted_distance(
                    ocr_words, gt_words, normalization=norm,
                    gtlevel=gt_level)
            _, conf = Alignment.best_alignment(ocr_line, gt_line, True)
            cedits[i].add(cdist, clen, ocr_line, gt_line, name=str(line_id))
            wedits[i].add(wdist, wlen, ocr_words, gt_words,
                          name=str(line_id))
            report[pair]['lines'].append({str(line_id): {
                'char-length': len(gt_line),
                'char-error-rate': cdist / clen if clen else 0,
                'word-error-rate': wdist / wlen if wlen else 0,
                'gt': gt_line, 'ocr': ocr_line,
                'edits': repr(conf)}})
        log.info('%5d lines %.3f±%.3f CER %.3f±%.3f WER %s vs %s',
                 cedits[i].length, cedits[i].mean,
                 math.sqrt(cedits[i].varia), wedits[i].mean,
                 math.sqrt(wedits[i].varia), ocr_file, gt_file)
        report[pair]['num-lines'] = cedits[i].steps
        report[pair]['num-words'] = wedits[i].length
        report[pair]['num-chars'] = cedits[i].length
        report[pair]['char-error-rate-mean'] = cedits[i].mean
        report[pair]['char-error-rate-varia'] = cedits[i].varia
        report[pair]['word-error-rate-mean'] = wedits[i].mean
        report[pair]['word-error-rate-varia'] = wedits[i].varia
        report[pair]['char-error-worst-lines'] = [
            str(example) for example in cedits[i].worst]
        if confusion and cedits[i].length:
            conf = caligners[i].get_confusion(confusion)
            log.info('most frequent confusion / %s vs %s: %s', gt_file,
                     ocr_file, conf)
            report[pair]['confusion'] = repr(conf)
        if histogram:
            report[pair]['histogram'] = repr(cedits[i].hist())
    output = sys.stdout if output_file == '-' else open(output_file, 'w')
    json.dump(report, output, indent=2, ensure_ascii=False)
    if output is not sys.stdout:
        output.close()


if __name__ == '__main__':
    cli()
