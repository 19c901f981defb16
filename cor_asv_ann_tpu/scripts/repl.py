"""cor-asv-ann-repl CLI (reference scripts/repl.py:15-146).

Interactive console with a preloaded `s2s` object and a `transcode_line`
helper that decodes one line greedily and beamed, printing per-character
probabilities with rejection marking and (when matplotlib is available)
plotting both soft alignments.
"""

import atexit
import code
import logging
import os

import click

CONTEXT_SETTINGS = dict(help_option_names=['-h', '--help'])


@click.command(context_settings=CONTEXT_SETTINGS)
def cli():
    """Try a correction model interactively.

    Import Sequence2Sequence, instantiate `s2s`, then enter REPL.
    Also, provide function `transcode_line` for single line correction.
    """
    logging.basicConfig(
        format='%(asctime)s.%(msecs)03d %(levelname)s %(name)s - %(message)s',
        datefmt='%H:%M:%S')
    logging.getLogger(__name__).setLevel(logging.DEBUG)

    import numpy as np
    from ..models.api import Sequence2Sequence
    s2s = Sequence2Sequence(logger=logging.getLogger(__name__))

    def transcode_line(source_line, plot=True):
        """Correct one line greedily and beamed; show probabilities and
        alignments."""
        if s2s.status < 2:
            print('no model loaded yet — run:\n'
                  '>>> s2s.load_config("model.h5"); s2s.configure(); '
                  's2s.load_weights("model.h5")')
            return None, None
        if not source_line.endswith('\n'):
            source_line += '\n'
        greedy_lines, greedy_probs, greedy_scores, greedy_aligns = \
            s2s.correct_lines([source_line], fast=False, greedy=True)
        beam_lines, beam_probs, beam_scores, beam_aligns = \
            s2s.correct_lines([source_line], fast=False, greedy=False)
        print('input:  %r' % source_line)
        print('greedy: %r [%.3f]' % (greedy_lines[0], greedy_scores[0]))
        for ch, p in zip(greedy_lines[0], greedy_probs[0]):
            mark = '!' if p < s2s.rejection_threshold else ' '
            print('   %r %.3f %s' % (ch, p, mark))
        print('beamed: %r [%.3f]' % (beam_lines[0], beam_scores[0]))
        if plot:
            try:
                from matplotlib import pyplot
            except ModuleNotFoundError:
                return greedy_lines[0], beam_lines[0]
            for k, (name, line, aligns) in enumerate([
                    ('greedy', greedy_lines[0], greedy_aligns[0]),
                    ('beamed', beam_lines[0], beam_aligns[0])]):
                if not aligns:
                    continue
                ax = pyplot.subplot(2, 1, k + 1)
                matrix = np.array(aligns)
                ax.imshow(matrix, aspect='auto')
                ax.set_title('%s alignment' % name)
                ax.set_xticks(range(len(source_line)))
                ax.set_xticklabels(list(source_line.replace('\n', '⏎')))
                ax.set_yticks(range(len(line)))
                ax.set_yticklabels(list(line.replace('\n', '⏎')))
            pyplot.tight_layout()
            pyplot.show()
        return greedy_lines[0], beam_lines[0]

    history_path = os.path.expanduser('~/.cor-asv-ann-repl_history')
    try:
        import readline
        import rlcompleter  # noqa: F401
        readline.parse_and_bind('tab: complete')
        if os.path.exists(history_path):
            readline.read_history_file(history_path)
        atexit.register(readline.write_history_file, history_path)
    except ImportError:
        pass

    banner = ('cor-asv-ann-tpu REPL\n'
              'usage example:\n'
              '>>> s2s.load_config("model.h5")\n'
              '>>> s2s.configure()\n'
              '>>> s2s.load_weights("model.h5")\n'
              '>>> transcode_line("Der Mann fteht an der Ecke.")')
    code.interact(banner=banner, local=dict(s2s=s2s,
                                            transcode_line=transcode_line))


if __name__ == '__main__':
    cli()
