"""N-way line alignment/voting processor (ocrd-cor-asv-ann-align).

Re-derivation of reference AlignLines (wrapper/align.py:27-342): per
TextLine id, collect each input fileGrp's text and per-character
confidence sequence (projected from glyph-, word- or line-level conf),
pairwise-align all inputs, order them along a minimum-total-distance path
(brute-force over permutations), incrementally expand the pairwise
alignments into an N-way character lattice with merge/split repair, and
vote per position by majority / max confidence / combined score. The
result overwrites the first fileGrp's line (dropping Word/Glyph children)
and higher levels are updated.
"""

import itertools

from ..lib.alignment import Alignment
from .base import PageProcessor, processor_cli
from .transcode import page_update_higher_textequiv_levels


def pairwise(iterable):
    a, b = itertools.tee(iterable)
    next(b, None)
    return zip(a, b)


def avg(values):
    return sum(values) / len(values) if values else 0


def page_get_line_sequences(doc, logger=None):
    """Per line: (text, per-char confidences) projected from the deepest
    available annotation level (reference align.py:263-329)."""
    result = dict()
    for region in doc.get_regions():
        lines = region.get_lines()
        for line in lines:
            line_equivs = line.get_textequivs()
            if not line_equivs:
                if logger:
                    logger.warning('Line "%s" contains no text results',
                                   line.id)
                continue
            line_str = line_equivs[0].unicode or ''
            line_conf0 = float(line_equivs[0].conf or 1.0)
            line_confs = []
            words = line.get_words()
            for word in words:
                word_equivs = word.get_textequivs()
                if not word_equivs:
                    line_confs = []
                    break
                word_conf0 = float(word_equivs[0].conf or line_conf0)
                word_confs = []
                for glyph in word.get_glyphs():
                    glyph_equivs = glyph.get_textequivs()
                    if not glyph_equivs:
                        word_confs = []
                        break
                    glyph_conf0 = float(glyph_equivs[0].conf or word_conf0)
                    word_confs.extend(
                        [glyph_conf0] * len(glyph_equivs[0].unicode or ''))
                if not word_confs:
                    word_confs = [word_conf0] * len(
                        word_equivs[0].unicode or '')
                line_confs.extend(word_confs)
                if word is not words[-1]:
                    line_confs.append(line_conf0)
            if not line_confs:
                line_confs = [line_conf0] * len(line_str)
            elif len(line_confs) > len(line_str):
                line_confs = line_confs[:len(line_str)]
            elif len(line_confs) < len(line_str):
                fill = avg(line_confs)
                line_confs += [fill] * (len(line_str) - len(line_confs))
            result[line] = (line_str, line_confs)
    return result


def nway_align(charseqs, confseqs, aligner):
    """Expand pairwise alignments into an N-way character lattice.

    Returns (chars, confs): parallel lists over lattice positions of
    per-input alternative strings and confidences
    (reference align.py:127-219)."""
    nseqs = len(charseqs)
    alignments = dict()
    distances = dict()
    for i, seq1 in enumerate(charseqs):
        for j, seq2 in enumerate(charseqs[i + 1:], i + 1):
            dist, _, align = aligner.get_adjusted_distance(
                seq1, seq2, normalization=None, gtlevel=1,
                return_alignment=True)
            distances.setdefault(i, dict())[j] = dist
            alignments.setdefault(i, dict())[j] = list(align)
            distances.setdefault(j, dict())[i] = dist
            alignments.setdefault(j, dict())[i] = [(y, x) for x, y in align]
    paths = list(itertools.permutations(range(nseqs)))
    dists = [sum(distances[i][j] for i, j in pairwise(path))
             for path in paths]
    path = paths[min(enumerate(dists), key=lambda x: x[1])[0]]

    chars, confs = [], []
    i = path[0]
    for char, conf in zip(charseqs[i], confseqs[i]):
        subchar = [''] * nseqs
        subconf = [1.0] * nseqs
        subchar[i] = char
        subconf[i] = conf
        chars.append(subchar)
        confs.append(subconf)
    for i, j in pairwise(path):
        starti = startj = 0
        newpos = oldpos = 0
        align = alignments[i][j]
        while newpos < len(align):
            ci, cj = align[newpos]
            ci = ci or ''
            cj = cj or ''
            endi = starti + len(ci)
            endj = startj + len(cj)
            if oldpos == len(chars):
                # previous alignments were all shorter
                chars[oldpos - 1][j] += cj
                confs[oldpos - 1][j] = avg(
                    [confs[oldpos - 1][j]] + confseqs[j][startj:endj])
                newpos += 1
                startj = endj
                continue
            subchars = chars[oldpos]
            subconfs = confs[oldpos]
            if len(ci) > len(subchars[i]):
                # merge lattice positions oldpos/oldpos+1
                nextsub = chars[oldpos + 1]
                nextconf = confs[oldpos + 1]
                chars[oldpos] = [c1 + c2 for c1, c2 in zip(subchars, nextsub)]
                confs[oldpos] = [avg([c1, c2])
                                 for c1, c2 in zip(subconfs, nextconf)]
                del chars[oldpos + 1]
                del confs[oldpos + 1]
            elif len(ci) < len(subchars[i]):
                # merge alignment entries newpos/newpos+1
                nextci, nextcj = align[newpos + 1]
                align[newpos] = (ci + (nextci or ''), cj + (nextcj or ''))
                del align[newpos + 1]
            else:
                subchars[j] = cj
                subconfs[j] = avg(confseqs[j][startj:endj]) \
                    if endj > startj else 1.0
                starti = endi
                startj = endj
                newpos += 1
                oldpos += 1
    return chars, confs


def vote(chars, confs, method):
    """Per-position choice by majority / confidence / combined score
    (reference align.py:221-246)."""
    linetext = ''
    lineconf = []
    for subchars, subconfs in zip(chars, confs):
        if method == 'majority':
            counts = [subchars.count(c) for c in subchars]
            best = counts.index(max(counts))
            linetext += subchars[best]
            lineconf.append(max(conf for count, conf
                                in zip(counts, subconfs)
                                if count == max(counts)))
        elif method == 'confidence':
            best = max(enumerate(subconfs), key=lambda x: x[1])[0]
            linetext += subchars[best]
            lineconf.append(subconfs[best])
        else:  # combined
            scores = dict()
            for c, conf in zip(subchars, subconfs):
                scores[c] = conf + scores.setdefault(c, 0)
            best = max(scores, key=scores.get)
            linetext += best
            lineconf.append(max(conf for c, conf in zip(subchars, subconfs)
                                if c == best))
    return linetext, avg(lineconf) if lineconf else 1.0


class AlignLines(PageProcessor):
    """Combine multiple OCR results by character-level alignment voting."""

    executable = 'ocrd-cor-asv-ann-align'
    input_file_grp_cardinality = (2, None)
    parameter_schema = {
        'method': {'type': 'string', 'default': 'majority',
                   'enum': ['majority', 'confidence', 'combined']},
    }

    def setup(self):
        self.aligner = Alignment(logger=self.logger)

    def verify(self, input_grps):
        super().verify(input_grps)
        assert len(input_grps) > 2 or \
            self.parameter['method'] not in ('majority', 'combined'), \
            'need more than 2 input fileGrps to align in this mode'

    def process_page(self, docs, page_id):
        method = self.parameter['method']
        result = None
        master = 0
        file_line2seq = [{} for _ in docs]
        file_id2line = [{} for _ in docs]
        for i, doc in enumerate(docs):
            if doc is None:
                continue
            file_line2seq[i] = page_get_line_sequences(doc, self.logger)
            file_id2line[i] = {line.id: line for line in file_line2seq[i]}
            if result is None:
                result = doc
                master = i
        if result is None:
            raise ValueError('no file in any input fileGrp for page %s'
                             % page_id)
        for line_id in file_id2line[master]:
            lines = [id2line.get(line_id) for id2line in file_id2line]
            line0 = lines[master]
            seqs = [line2seq[line]
                    for line, line2seq in zip(lines, file_line2seq)
                    if line in line2seq and line2seq[line][0]]
            if not seqs:
                continue
            charseqs, confseqs = zip(*seqs)
            chars, confs = nway_align(list(charseqs), list(confseqs),
                                      self.aligner)
            linetext, lineconf = vote(chars, confs, method)
            self.logger.debug('best voted line for "%s": %s', line_id,
                              linetext)
            tes = line0.get_textequivs()
            if tes:
                tes[0].unicode = linetext
                tes[0].conf = lineconf
            else:
                line0.add_textequiv(linetext, conf=lineconf)
            line0.remove_children('Word')
        page_update_higher_textequiv_levels('line', result)
        return result


ocrd_cor_asv_ann_align = processor_cli(AlignLines)


if __name__ == '__main__':
    ocrd_cor_asv_ann_align()
