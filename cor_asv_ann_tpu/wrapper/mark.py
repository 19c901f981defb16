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

HYPHENS = ('-', '⸗')


class SpellLookup:
    """Letter-normalization + external lookup command (e.g. hunspell
    ``-w -L``, which echoes every unknown word back)."""

    def __init__(self, command, normalization):
        self.command = command
        self.normalization = normalization

    def letters(self, token):
        """Apply the char normalization map, keep letters/marks only."""
        for old, new in self.normalization.items():
            token = token.replace(old, new)
        return ''.join(char for char in token
                       if unicodedata.category(char)[0] in 'LM')

    def unknown(self, word):
        """(lookup_failed_or_unknown, returncode, stderr) for `word`."""
        proc = subprocess.run(self.command, input=word + '\n',
                              encoding='utf-8', shell=True,
                              capture_output=True, text=True)
        return bool(proc.stdout.rstrip('\n')), proc.returncode, proc.stderr


class MarkWords(PageProcessor):
    """Mark words not recognized by a spellchecker command."""

    executable = 'ocrd-cor-asv-ann-mark'
    parameter_schema = {
        'command': {'type': 'string', 'required': True},
        'normalization': {'type': 'object', 'default': {}},
        'format': {'type': 'string', 'default': 'OOV'},
    }

    def setup(self):
        # initialized here (not only in start_document) so per-page use
        # without the workspace runner — e.g. through the OCR-D core
        # adapter, which drives document iteration itself — still works
        self.total_candidates = 0
        self.total_nonmatches = 0

    def start_document(self, workspace, input_grps, output_grp):
        self.total_candidates = 0
        self.total_nonmatches = 0

    def end_document(self, workspace, input_grps, output_grp):
        self.logger.info(
            'marked %d unmatched words out of %d tokens (%d%%) overall',
            self.total_nonmatches, self.total_candidates,
            100 * self.total_nonmatches / self.total_candidates
            if self.total_candidates else 0)

    def _mark(self, equiv):
        if self.parameter['format'] == 'conf':
            equiv.conf = 0.123
        else:
            equiv.comments = self.parameter['format']

    def _unmark_closure(self, equiv):
        """Capture the pre-mark state of a hyphenated word so a
        successful dehyphenation join can revert the mark later."""
        attr = 'conf' if self.parameter['format'] == 'conf' else 'comments'
        old = getattr(equiv, attr)
        return lambda: setattr(equiv, attr, old)

    def process_page(self, docs, page_id):
        doc = docs[0]
        lookup = SpellLookup(self.parameter['command'],
                             self.parameter['normalization'])
        candidates = 0
        nonmatches = 0
        # pending dehyphenation candidate: (revert_fn, text minus the
        # hyphen) of the most recent line-final hyphen-terminated word.
        # NOTE: faithfully kept from the reference (mark.py:107-124),
        # including its quirk — the pending entry is only consulted and
        # cleared when a MARKABLE word is processed, so a skipped
        # (letterless/empty) line start leaves it live for a later line.
        pending = None

        for line in doc.get_lines():
            words = line.get_words()
            for word in words:
                equivs = word.get_textequivs()
                if not equivs:
                    self.logger.warning('Word "%s" contains no text results',
                                        word.id)
                    continue
                text = equivs[0].unicode
                if not text:
                    self.logger.warning('Word "%s" contains empty text',
                                        word.id)
                    continue
                stripped = lookup.letters(text)
                if not stripped:
                    continue
                is_unknown, status, err = lookup.unknown(stripped)
                candidates += 1
                if status != 0:
                    self.logger.error('Word "%s" lookup failed (%d): %s',
                                      stripped, status, err)
                    continue
                if not is_unknown:
                    continue
                if pending and word is words[0]:
                    # unknown word opening a line after a hyphenated
                    # line end: retry the joined form
                    revert, head = pending
                    joined_unknown, status, _ = lookup.unknown(
                        lookup.letters(head + text))
                    if status == 0 and not joined_unknown:
                        revert()
                        pending = None
                        nonmatches -= 1
                        continue
                pending = None
                if word is words[-1] and text.endswith(HYPHENS):
                    pending = self._unmark_closure(equivs[0]), text[:-1]
                nonmatches += 1
                self._mark(equivs[0])
        self.logger.info(
            'marked %d unmatched words out of %d tokens (%d%%) on %s',
            nonmatches, candidates,
            100 * nonmatches / candidates if candidates else 0, page_id)
        with self._lock:    # page-parallel safe (cf. reference mark.py:32)
            self.total_candidates += candidates
            self.total_nonmatches += nonmatches
        return doc


ocrd_cor_asv_ann_mark = processor_cli(MarkWords)


if __name__ == '__main__':
    ocrd_cor_asv_ann_mark()
