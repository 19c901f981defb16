"""cor-asv-ann-transfer-dta-lm: convert an ocrd_keraslm language model
into an --init-model for cor-asv-ann-train.

Equivalent of the reference's transfer-dta-lm.py h5-surgery script:
rename the LM's ``lstm_<n>`` layer groups to ``decoder_lstm_<n>`` and
slice the context-input rows off the first layer's kernel (ocrd_keraslm
appends 10 context dims to the character input), so that
``load_transfer_weights`` can map the LM onto the decoder stack
(lib/seq2seq.py:1176-1213 in the reference).
"""

import shutil

import click
import h5py
import numpy as np

CONTEXT_SETTINGS = dict(help_option_names=['-h', '--help'])


def transfer(source, target, context_dims=10, depth=None):
    shutil.copy(source, target)
    with h5py.File(target, 'r+') as f:
        names = [n.decode('utf8') if isinstance(n, bytes) else n
                 for n in f.attrs.get('layer_names', [])]
        lstm_names = sorted(n for n in names if n.startswith('lstm_'))
        if depth:
            lstm_names = lstm_names[:depth]
        rename = {}
        for n in lstm_names:
            idx = n.split('_')[-1]
            rename[n] = 'decoder_lstm_%s' % idx
        for old, new in rename.items():
            f.copy(old, new)
            del f[old]
        # remove the context-input rows from the first layer's kernel
        first = rename.get('lstm_1')
        if first and first in f:
            grp = f[first]
            def find_kernel(g, prefix=''):
                for key in g:
                    item = g[key]
                    if isinstance(item, h5py.Dataset) and \
                            key.startswith('kernel'):
                        return prefix + key
                    if isinstance(item, h5py.Group):
                        sub = find_kernel(item, prefix + key + '/')
                        if sub:
                            return sub
                return None
            path = find_kernel(grp)
            if path is not None and context_dims > 0:
                data = np.asarray(grp[path])[:-context_dims, :]
                del grp[path]
                grp.create_dataset(path, data=data)
        new_names = [rename.get(n, n) for n in names]
        f.attrs['layer_names'] = np.array(
            [n.encode('utf8') for n in new_names])
    return target


@click.command(context_settings=CONTEXT_SETTINGS)
@click.option('-c', '--context-dims', default=10, show_default=True,
              help='number of context input dims to slice off the first '
                   'LSTM kernel')
@click.argument('source', type=click.Path(dir_okay=False, exists=True))
@click.argument('target', type=click.Path(dir_okay=False, writable=True))
def cli(context_dims, source, target):
    """Convert an ocrd_keraslm language model HDF5 file into an
    initialization model for cor-asv-ann-train --init-model."""
    transfer(source, target, context_dims=context_dims)
    click.echo('wrote %s' % target)


if __name__ == '__main__':
    cli()
