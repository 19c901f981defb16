"""Spellcheck marking processor (ocrd-cor-asv-ann-mark).

Re-derivation of reference MarkWords (wrapper/mark.py:21-137): run each
word's letter-normalized text through an external lookup command (e.g.
``hunspell -i utf-8 -w -L de_historical``, which echoes unknown words);
unknown words get marked via @comments (default) or conf=0.123. A word
ending in a hyphen retries joined with the following line's first word
(dehyphenation), undoing the previous mark when the joined form is known.
"""

import subprocess
import unicodedata

from .base import PageProcessor, processor_cli


class MarkWords(PageProcessor):
    """Mark words not recognized by a spellchecker command."""

    executable = 'ocrd-cor-asv-ann-mark'
    parameter_schema = {
        'command': {'type': 'string', 'required': True},
        'normalization': {'type': 'object', 'default': {}},
        'format': {'type': 'string', 'default': 'OOV'},
    }

    def start_document(self, workspace, input_grps, output_grp):
        self.total_candidates = 0
        self.total_nonmatches = 0

    def end_document(self, workspace, input_grps, output_grp):
        self.logger.info(
            'marked %d unmatched words out of %d tokens (%d%%) overall',
            self.total_nonmatches, self.total_candidates,
            100 * self.total_nonmatches / self.total_candidates
            if self.total_candidates else 0)

    def _run_command(self, text):
        if not text.endswith('\n'):
            text += '\n'
        result = subprocess.run(self.parameter['command'], input=text,
                                encoding='utf-8', shell=True,
                                capture_output=True, text=True)
        return result.returncode, result.stdout.rstrip('\n'), result.stderr

    def _asword(self, token):
        for nfrom, nto in self.parameter['normalization'].items():
            token = token.replace(nfrom, nto)
        return ''.join(c for c in token
                       if unicodedata.category(c)[0] in 'LM')

    def process_page(self, docs, page_id):
        doc = docs[0]
        format_ = self.parameter['format']
        file_candidates = 0
        file_nonmatches = 0
        undo = None  # (undo_fn, stripped_text) of a line-final hyphen word

        def save(equiv):
            attr = 'conf' if format_ == 'conf' else 'comments'
            old = getattr(equiv, attr)

            def fun():
                setattr(equiv, attr, old)
            return fun

        for line in doc.get_lines():
            words = line.get_words()
            for word in words:
                equiv = word.get_textequivs()
                if not equiv:
                    self.logger.warning('Word "%s" contains no text results',
                                        word.id)
                    continue
                text = equiv[0].unicode
                if not text:
                    self.logger.warning('Word "%s" contains empty text',
                                        word.id)
                    continue
                text0 = self._asword(text)
                if not text0:
                    continue
                rc, out, err = self._run_command(text0)
                file_candidates += 1
                if rc != 0:
                    self.logger.error('Word "%s" lookup failed (%d): %s',
                                      text0, rc, err)
                elif out:
                    if undo and word is words[0]:
                        # dehyphenation retry across the line boundary
                        undo_fn, prev_text = undo
                        joined = self._asword(prev_text + text)
                        rc2, out2, _ = self._run_command(joined)
                        if rc2 == 0 and not out2:
                            undo_fn()
                            undo = None
                            file_nonmatches -= 1
                            continue
                    undo = None
                    if word is words[-1] and text.endswith(('-', '⸗')):
                        undo = save(equiv[0]), text[:-1]
                    file_nonmatches += 1
                    if format_ == 'conf':
                        equiv[0].conf = 0.123
                    else:
                        equiv[0].comments = format_
        self.logger.info(
            'marked %d unmatched words out of %d tokens (%d%%) on %s',
            file_nonmatches, file_candidates,
            100 * file_nonmatches / file_candidates
            if file_candidates else 0, page_id)
        self.total_candidates += file_candidates
        self.total_nonmatches += file_nonmatches
        return doc


ocrd_cor_asv_ann_mark = processor_cli(MarkWords)


if __name__ == '__main__':
    ocrd_cor_asv_ann_mark()
