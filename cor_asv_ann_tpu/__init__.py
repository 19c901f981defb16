"""cor_asv_ann_tpu — TPU-native OCR post-correction framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of
ASVLeipzig/cor-asv-ann (character-level attention seq2seq OCR post-correction):

- stacked (bi)LSTM encoder + forward-LSTM decoder whose top layer carries a
  local, monotonic, additive attention mechanism and weight-tied character
  projections (reference: ocrd_cor_asv_ann/lib/seq2seq.py:13-106),
- greedy and beamed decoders that feed the full softmax distribution back as
  the next decoder input — here executed fully on-device under ``jax.jit``
  with ``lax.scan``/``lax.while_loop`` instead of one Python->session round
  trip per character (reference hot loop: lib/seq2seq.py:1243-1246),
- training with scheduled sampling, LM multi-task loss, underspecification
  regularization and input degradation (reference: lib/seq2seq.py:590-649),
- alignment/metrics library, CLIs and PAGE-XML processors.

Model files remain interoperable with the reference's Keras HDF5 layout
(lib/seq2seq.py:1121-1162).
"""

__version__ = "0.1.0"

# reserved character that never gets mapped (gap repairs); duplicated as a
# literal from utils.data.GAP so `import cor_asv_ann_tpu` stays numpy-free
GAP = '\a'


def __getattr__(name):
    # lazy re-export of the high-level API (keeps `import cor_asv_ann_tpu`
    # light for CLI --help paths; jax loads only on first use)
    if name == 'Sequence2Sequence':
        from .models.api import Sequence2Sequence
        return Sequence2Sequence
    raise AttributeError(name)
