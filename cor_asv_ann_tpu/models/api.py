"""High-level model API mirroring the reference `Sequence2Sequence` class.

Public surface parity with reference lib/seq2seq.py:13-1608: configure /
load_config / load_weights / load_transfer_weights / save / map_files /
correct_lines / predict / evaluate / train, with the same knobs (width,
depth, residual_connections, deep_bidirectional_encoder, bridge_dense,
beam and rejection parameters, scheduled sampling, LM loss).

TPU-first differences:
- decode batches are padded to the fixed ``batch_size`` and bucketed
  lengths so XLA compiles a bounded set of programs,
- both greedy and beamed decoding run entirely on device (the reference's
  'fast' flag only switched between batch-parallel and per-line host
  loops; here greedy is always batch-parallel, so fast==greedy),
- beam alignments are recorded as windowed soft rows (WIN scores + a
  window start per step, models/beam.py align_row/align_start) and
  expanded host-side to dense length-T soft-alignment vectors
  (_expand_windowed_alignment), so the transcode Viterbi path and the
  repl plots run on real soft alignments for beamed output too.
"""

import logging
import math

import numpy as np

from ..lib.alignment import Alignment, Edits, splitwords
from ..utils import io_h5
from ..utils.data import (CharMapping, GAP, gen_line_batches,
                          lines_to_index_batch, scan_files,
                          vectorize_lines)
from .beam import BeamParams, decode_beam
from .config import Seq2SeqConfig, init_params
from .seq2seq import decode_greedy, decode_greedy_windowed
from ..ops.pallas_decode_loop import (FUSED_DECODE_MAX_B,
                                      decode_greedy_fused,
                                      fused_greedy_supported)

# bucket length above which windowed-gather attention beats the
# shared-window/dense decoder (which still streams T-sized tensors on
# fallback steps). Measured steady-state with the fixed timing harness:
# equal within noise at T <= 96, windowed 1.2x at T=128, 1.5x at 256,
# 2.4x at 512 (round 1's 25x-slower-gather figure and its T~280
# crossover came from the lazy-compile measurement artifact, NOTES.md)
WINDOWED_DECODE_MIN_T = 128


def _pick_fused_bound(ratios, floor=16):
    """Choose the fused-decode dispatch WINDOW (min_b, max_b) from
    measured fused/XLA throughput ratios per batch size: the longest
    contiguous run of measured wins (ratio >= 1.0; ties resolved toward
    larger batches) — the dispatched regime is then >=1.0x by
    construction on the measuring device. When the run includes the
    smallest measured batch and that batch is within `floor`, the
    window extends down to 1 (the B<=16 win is stable across sessions,
    NOTES.md, and smaller batches are unmeasured); a measured loss at
    the small end instead RAISES the window's lower bound, so e.g. a
    day where B=16 loses but B=32-64 win keeps the 32-64 regime fused
    (round 5 — the old scalar bound discarded those wins). No measured
    wins at all -> (0, 0) (fused dispatch off); no measurements -> the
    static default window (1, floor)."""
    bs = sorted(ratios)
    if not bs:
        return 1, floor
    runs, cur = [], []
    for b in bs:
        if ratios[b] >= 1.0:
            cur.append(b)
        else:
            if cur:
                runs.append(cur)
            cur = []
    if cur:
        runs.append(cur)
    if not runs:
        # the sub-floor assumption survives only when nothing at or
        # below the floor was measured losing
        return (1, floor) if bs[0] > floor else (0, 0)
    # prefer the longest run; ties resolve first toward the run that
    # anchors the stable small-batch regime, then toward larger batches
    best = max(runs, key=lambda r: (len(r),
                                    r[0] == bs[0] and r[0] <= floor,
                                    r[-1]))
    if best[0] == bs[0] and best[0] <= floor:
        return 1, max(best[-1], floor)
    return best[0], best[-1]


def _pack_results(idx, prob, length, score):
    """Concatenate the greedy-decode result arrays into one (B, 2S+2)
    float32 buffer on device so the host fetches once instead of four
    times (each fetch is a full transport round trip). Exact: the packed
    values (char indices < V, probabilities, lengths <= S) are all well
    inside float32's integer range."""
    import jax.numpy as jnp
    f32 = jnp.float32
    return jnp.concatenate(
        [idx.astype(f32), prob.astype(f32),
         length[:, None].astype(f32), score[:, None].astype(f32)], axis=1)


def _expand_windowed_alignment(rows, starts, T):
    """Expand per-step windowed soft-alignment rows (L, WIN) with window
    offsets (L,) to a dense (L, T) float32 matrix — the reference's full
    per-step alignments (transcode.py:279-349 consumes them for Viterbi
    re-alignment). Vectorized scatter: out-of-bounds window tails
    (possible for rejection rows whose start is src_pos near T-1) land
    in a scratch column T that is sliced off, so they can never clobber
    column T-1."""
    L, win = rows.shape
    align = np.zeros((L, T + 1), np.float32)
    cols = starts[:, None] + np.arange(win)
    align[np.arange(L)[:, None], np.minimum(cols, T)] = \
        rows.astype(np.float32)
    return align[:, :T]


class Sequence2Sequence:
    """Character-level seq2seq OCR post-correction on TPU."""

    def __init__(self, logger=None, progbars=True):
        # model parameters (reference seq2seq.py:108-179)
        self.batch_size = 256
        self.stateful = False
        self.width = 512
        self.depth = 2
        self.mapping = CharMapping()
        self.residual_connections = False
        self.deep_bidirectional_encoder = False
        self.bridge_dense = False
        # training parameters
        self.epochs = 100
        self.lm_loss = False
        self.lm_predict = False
        self.scheduled_sampling = None
        # reference-quirk parity for scheduled sampling: feed sampled
        # lines ZERO teacher input like the reference's uint32-truncated
        # feedback buffer (models/train.py:_scheduled_sample); default
        # feeds one-hot greedy outputs (the documented intent)
        self.keras_sampling = False
        self.dropout = 0.2
        self.learning_rate = 1e-3  # Keras Adam default (seq2seq.py:496)
        self.patience = 3           # early-stopping patience (seq2seq.py:619)
        # inference compute dtype: 'float32' (reference parity) or
        # 'bfloat16' (MXU-native, ~2x matmul throughput, tiny CER impact;
        # master weights stay float32)
        self.compute = 'float32'
        # whole-loop Pallas greedy decode (weights VMEM-resident across
        # all characters) for small bf16 batches: measured 2.3-2.8x at
        # B=16 vs the XLA path on the flagship, parity-within-noise at
        # B=64 (NOTES.md); the XLA path amortizes weight streaming at
        # production batch and stays the default there
        # (ops/pallas_decode_loop.py FUSED_DECODE_MAX_B)
        self.fused_decode = True
        self.fused_decode_max_b = FUSED_DECODE_MAX_B
        # lower edge of the fused-decode dispatch window: raised by
        # autotune_fused_decode when small batches measure losing while
        # larger ones win (_pick_fused_bound)
        self.fused_decode_min_b = 1
        # training compute dtype: None/'float32' or 'bfloat16' (mixed
        # precision: bf16 forward/backward, float32 masters)
        self.train_compute = None
        # beam decoder parameters
        self.rejection_threshold = 0.3
        self.beam_width_in = 15
        self.beam_threshold_in = 0.2
        self.beam_width_out = 16
        # device-beam search bounds (None = auto, see _beam_params).
        # Auto bounds ADAPT to a cheap measured confidence signal (one
        # cached greedy probe, `_model_confidence`): a confident model
        # (flagship: 12/12 reference agreement at R=32) keeps the fast
        # tuned bounds, while weakly trained models — which ride
        # near-ties the fixed-shape reservoir would otherwise prune
        # where the reference's unbounded best-first queue explores —
        # get a deeper reservoir automatically (reference-trained w64
        # artifact: 27/48 byte-equal at R=32 -> 46/48 at the adaptive
        # R=256, tests/test_reference_artifact.py). Set explicitly to
        # pin speed/fidelity for throughput-critical serving.
        self.beam_reservoir = None
        self.beam_expand = None
        # runtime
        self.logger = logger or logging.getLogger(__name__)
        self.progbars = progbars
        self.aligner = Alignment(0, logger=self.logger)
        self.config = None
        self.params = None
        self.status = 0
        # multi-chip serving: a jax.sharding.Mesh with ('data', 'model')
        # axes (see use_mesh); None = single-device placement
        self.mesh = None

    @property
    def voc_size(self):
        return self.mapping.voc_size

    def __repr__(self):
        return (__name__
                + " (width: %d)" % self.width
                + " (depth: %d)" % self.depth
                + " (chars: %d)" % self.voc_size
                + " (attention)"
                + (" (stateful)" if self.stateful else " (stateless)")
                + " status: %s" % ("empty" if self.status < 1 else
                                   "configured" if self.status < 2 else
                                   "trained"))

    # ------------------------------------------------------------------
    # configuration & persistence

    def configure(self, batch_size=None):
        if batch_size:
            self.batch_size = batch_size
        if self.stateful:
            # like the reference, stateful decoding remains unfinished
            # (seq2seq.py:57-59: "features still wanting of implementation")
            self.logger.warning('stateful mode is not implemented; '
                                'proceeding stateless')
        self.config = Seq2SeqConfig(
            width=int(self.width), depth=int(self.depth),
            voc_size=self.voc_size,
            residual_connections=bool(self.residual_connections),
            deep_bidirectional_encoder=bool(self.deep_bidirectional_encoder),
            bridge_dense=bool(self.bridge_dense),
            dropout=float(self.dropout), stateful=bool(self.stateful),
            # the reference hard-codes the ±5 local attention window
            # (attention.py local mode); 0 = global attention (served on
            # the dense decoder at every length)
            window_width=int(getattr(self, 'window_width', 5)),
            # length-masked recurrence/attention: results independent of
            # padded length and batchmates (see Seq2SeqConfig docs);
            # reference-parity (run-through) mode is available by setting
            # s2s.keras_padding = True before configure()
            mask_padding=not getattr(self, 'keras_padding', False))
        if self.params is None or self.status < 2:
            self.params = init_params(self.config)
        self.logger.info(
            'TPU model of depth %d width %d size %d with attention',
            self.depth, self.width, self.voc_size)
        self.status = max(self.status, 1)

    def _reconfigure_for_mapping(self, old_voc_size):
        """Rebuild after vocabulary growth, transferring embedding rows
        (reference seq2seq.py:499-525)."""
        old_params = self.params if self.status >= 2 else None
        status = self.status
        self.status = min(self.status, 1)
        self.params = None
        self.configure()
        if old_params is not None:
            new_params = self.params
            for key in ('char_embedding',):
                new_kernel = np.array(new_params[key]['kernel'])
                old_kernel = np.asarray(old_params[key]['kernel'])
                new_kernel[:old_voc_size] = old_kernel[:old_voc_size]
                new_params[key]['kernel'] = new_kernel
            # all other weights are shape-independent of voc_size
            for key in ('attention_dense', 'encoder', 'decoder', 'bridge'):
                if key in old_params:
                    new_params[key] = old_params[key]
            self.params = new_params
            self.status = status

    def map_files(self, filenames, charmap=None):
        chars, num_lines = scan_files(filenames, charmap=charmap)
        new_mapping, grew = self.mapping.grow([''.join(chars)])
        if grew:
            old_voc = self.voc_size
            # remap embedding rows from old indices to new
            old_mapping = self.mapping
            self.mapping = new_mapping
            if self.status >= 1:
                if self.status >= 2 and self.params is not None:
                    old_kernel = np.asarray(
                        self.params['char_embedding']['kernel'])
                    self._reconfigure_for_mapping(0)
                    kernel = np.array(self.params['char_embedding']['kernel'])
                    for char, old_idx in old_mapping.c2i.items():
                        new_idx = self.mapping.get(char)
                        kernel[new_idx] = old_kernel[old_idx]
                    self.params['char_embedding']['kernel'] = kernel
                else:
                    self._reconfigure_for_mapping(old_voc)
        return num_lines

    def save(self, filename):
        assert self.status > 1
        self.logger.info('Saving model under "%s"', filename)
        io_h5.save_model(filename, self.params, self.config, self.mapping)

    def load_config(self, filename):
        config, mapping = io_h5.load_config(filename)
        self.width = config.width
        self.depth = config.depth
        self.stateful = config.stateful
        self.residual_connections = config.residual_connections
        self.deep_bidirectional_encoder = config.deep_bidirectional_encoder
        self.bridge_dense = config.bridge_dense
        self.mapping = mapping

    def load_weights(self, filename):
        assert self.status > 0
        self.logger.info('Loading model from "%s"', filename)
        self.params = io_h5.load_weights(filename, self.config,
                                         logger=self.logger)
        self.status = 2

    def load_transfer_weights(self, filename):
        assert self.status > 0
        assert self.depth > 1
        self.logger.info('Transferring model from "%s"', filename)
        params, mapping, frozen = io_h5.load_transfer_weights(
            filename, self.params, self.config, logger=self.logger)
        if mapping is not None and mapping.c2i != self.mapping.c2i:
            self.mapping = mapping
            self.configure()
            params, _, frozen = io_h5.load_transfer_weights(
                filename, self.params, self.config, logger=self.logger)
        self.params = params
        self.frozen_layers = frozen
        self.status = 1

    # ------------------------------------------------------------------
    # inference

    def _beam_params(self, confidence=None):
        # expand width 48: the tools/beam_ablation.py sweep (flagship,
        # B=256, serving settings, agreement judged against the
        # reference's own beam) found K=48 strictly better than the old
        # K=16 — equal-best reference agreement, zero empty-bank
        # failures (K=16 starved some noisy lines of expansions within
        # the 2*len0 iteration cap), AND faster: wider iterations reach
        # the early-stop rule sooner, and iteration cost is dominated by
        # reservoir-merge overhead, not expansion width
        # reservoir 2*width_in (>=32) at rejection <= 0.3: halving from
        # 4*width_in keeps every golden-corpus decode byte-exact and
        # full agreement with the reference beam at serving settings
        # (tools/beam_ablation.py, R=32 K=48: 12/12 agree, 0/256
        # failures) while the per-slot reservoir merges — the dominant
        # beam iteration cost — shrink ~1.35x (NOTES.md backlog #3).
        # Higher rejection thresholds spawn longer rejection chains and
        # genuinely need the deeper reservoir (the r=0.5 golden set
        # diverges at R=32), so they keep 4*width_in.
        #
        # ADAPTIVE auto bounds (round 4): a weakly trained model rides
        # near-ties constantly, so the fixed-shape reservoir prunes
        # races the reference's unbounded best-first queue explores —
        # agreement converges with R (reference-trained w64 artifact:
        # 27/48 byte-equal at R=32 -> 37/48 at R=64 -> 46/48 at R=256,
        # tests/test_reference_artifact.py). `confidence` is the
        # geometric-mean greedy top-1 probability of the model on the
        # actual inputs (exp(-mean length-normalized score), one cached
        # cheap greedy probe, `_model_confidence`); measured signal:
        # flagship 0.997, soak-w128 0.940, reference-trained artifact
        # 0.809 — so >=0.95 keeps the tuned fast bounds, the mid tier
        # doubles the reservoir, and low-confidence models get the
        # deep-fidelity bounds (R=256, K=96) that measured 46/48.
        deep = self.rejection_threshold > 0.3
        if confidence is None or confidence >= 0.95:
            auto_r = max((4 if deep else 2) * self.beam_width_in,
                         64 if deep else 32)
            auto_k = 48
        elif confidence >= 0.85:
            auto_r = max(4 * self.beam_width_in, 128 if deep else 64)
            auto_k = 48
        else:
            auto_r, auto_k = 256, 96
        return BeamParams(
            reservoir=int(self.beam_reservoir
                          if self.beam_reservoir is not None else auto_r),
            expand=int(self.beam_expand
                       if self.beam_expand is not None else auto_k),
            beam_width_in=int(self.beam_width_in),
            beam_threshold_in=float(self.beam_threshold_in),
            beam_width_out=int(self.beam_width_out),
            rejection_threshold=float(self.rejection_threshold),
            lm_predict=bool(self.lm_predict))

    # probe at most this many lines for the confidence signal (greedy
    # decode is ~100x cheaper than beam, so the probe is noise in the
    # beam budget even when the cache misses)
    _CONF_PROBE_B = 32

    def _model_confidence(self, params, enc, newline):
        """Geometric-mean greedy top-1 probability of this model on (a
        probe slice of) the actual encoder batch — the cheap confidence
        signal driving the adaptive auto beam bounds. Cached per
        parameter set (invalidated whenever self.params is rebound:
        load_weights/train)."""
        cached = getattr(self, '_conf_cache', None)
        if cached is not None and cached[0] is self.params:
            return cached[1]
        probe = enc[:self._CONF_PROBE_B]
        _, _, length, score, _ = decode_greedy(
            params, self.config, probe, newline, return_alignments=False)
        length = np.asarray(length)
        score = np.asarray(score)
        live = length > 0
        conf = float(np.exp(-np.mean(score[live]))) if live.any() else 1.0
        self._conf_cache = (self.params, conf)
        self.logger.debug('model confidence probe: %.4f', conf)
        return conf

    def correct_lines(self, lines, conf=None, fast=True, greedy=True,
                      return_alignments=True):
        """Correct text strings (reference seq2seq.py:782-842).

        Returns (output_lines, probability lists, perplexity scores,
        alignments). Both decoders run fully on device; `fast` and
        `greedy` both map to greedy decoding (their split in the
        reference was a host-scheduling artifact), otherwise beam.
        With `return_alignments=False` the (B, S, T) soft-alignment
        buffers are neither materialized nor transferred (the hot path
        for proc/eval, which discard them); the alignments slot is then
        a list of empty lists.
        """
        assert not fast or greedy, \
            'cannot decode in fast mode with beam search enabled'
        if not lines:
            return [], [], [], []
        B = self.batch_size
        # sort large inputs by source length so each chunk pads to a
        # tight bucket (decode cost is 2*bucket steps for the whole
        # chunk); results are scattered back to input order
        if len(lines) > B:
            order = sorted(range(len(lines)),
                           key=lambda j: self._source_length(
                               lines[j], conf[j] if conf else None))
            inv = [0] * len(lines)
            for pos, j in enumerate(order):
                inv[j] = pos
            sorted_lines = [lines[j] for j in order]
            sorted_conf = [conf[j] for j in order] if conf else None
            res = self._correct_chunks(sorted_lines, sorted_conf, greedy,
                                       return_alignments)
            return tuple([r[inv[j]] for j in range(len(lines))]
                         for r in res)
        return self._correct_chunks(lines, conf, greedy, return_alignments)

    # chunks dispatched ahead of the one being fetched: the host-side
    # text reconstruction of chunk k then overlaps the device decode of
    # chunks k+1..k+DEPTH (jax dispatch is async). Bounded so at most
    # DEPTH+1 chunks of device result buffers (incl. the (B, S, T)
    # alignment tensors) are live at once — dispatching everything up
    # front would hold the whole corpus's buffers on a 16 GB chip.
    PIPELINE_DEPTH = 2

    def correct_stream(self, batches, greedy=True,
                       return_alignments=False):
        """Pipeline decoding over an iterator of ``(lines, conf, meta)``
        batches (each at most ``batch_size`` lines; ``meta`` is passed
        through untouched), yielding ``(meta, lines, probs, scores,
        alignments)`` per batch in input order. Up to PIPELINE_DEPTH
        batches stay queued on the device while the host vectorizes the
        next inputs and rebuilds text for the oldest fetched one, so
        host work overlaps device decode across the whole stream —
        including across file batches in `predict` (the reference
        serializes these, seq2seq.py:772-776)."""
        handles = []

        def finish_oldest():
            meta, n, handle = handles.pop(0)
            res = self._finish_batch(handle)
            return (meta, res[0][:n], res[1][:n], res[2][:n], res[3][:n])

        for lines, conf, meta in batches:
            handles.append(
                (meta, *self._dispatch_bucketed(lines, conf, greedy,
                                                return_alignments)))
            if len(handles) > self.PIPELINE_DEPTH:
                yield finish_oldest()
        while handles:
            yield finish_oldest()

    def _dispatch_bucketed(self, lines, conf, greedy, return_alignments):
        """Pad one batch (at most ``batch_size`` lines) to its
        power-of-two bucket (bounded set of compiled shapes, no waste on
        small inputs) and queue its decode; returns ``(n, handle)`` —
        `_finish_batch(handle)` results are then trimmed to ``n``."""
        B = self.batch_size
        n = len(lines)
        assert n <= B, 'batch larger than batch_size'
        bucket = 8
        while bucket < n:
            bucket *= 2
        bucket = min(bucket, B)
        if n < bucket:
            lines = list(lines) + [''] * (bucket - n)
            if conf:
                conf = list(conf) + [[]] * (bucket - n)
        return n, self._dispatch_batch(lines, conf, greedy,
                                       return_alignments)

    def _correct_chunks(self, lines, conf, greedy, return_alignments=True):
        B = self.batch_size
        chunks = ((lines[i:i + B], conf[i:i + B] if conf else None, None)
                  for i in range(0, len(lines), B))
        out = ([], [], [], [])
        for _, ls, ps, ss, als in self.correct_stream(
                chunks, greedy, return_alignments):
            out[0].extend(ls)
            out[1].extend(ps)
            out[2].extend(ss)
            out[3].extend(als)
        return out

    def use_mesh(self, mesh=None, n_devices=None):
        """Enable multi-chip SPMD execution over a ('data', 'model') mesh
        — both serving and training (`train()` shards batches over 'data'
        for data-parallel gradients).

        Batches are sharded over 'data' (pure data parallelism — decoding
        scales in lines) and the wide parameter matrices over 'model'
        (tensor parallelism); XLA GSPMD inserts the collectives. The
        reference has no multi-device execution at all (SURVEY.md 2.9).
        Call with no arguments to span all visible devices, or pass a
        prebuilt Mesh. `use_mesh(mesh=False)` reverts to single-device.
        """
        if mesh is False:
            self.mesh = None
        else:
            from ..parallel.mesh import make_mesh
            self.mesh = mesh or make_mesh(n_devices)
        self._infer_cache = None
        return self.mesh

    def _infer_params(self):
        """Parameters for inference: float32 masters, or a cached
        bfloat16 copy when self.compute == 'bfloat16'; placed onto
        self.mesh (model-axis sharded) when one is set."""
        import jax
        import jax.numpy as jnp
        cached = getattr(self, '_infer_cache', None)
        if cached is not None and cached[0][0] is self.params \
                and cached[0][1] == self.compute \
                and cached[0][2] is self.mesh:
            return cached[1]
        params = jax.tree_util.tree_map(jnp.asarray, self.params)
        if self.compute == 'bfloat16':
            params = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, params)
        if self.mesh is not None:
            from ..parallel.mesh import shard_params
            params = shard_params(params, self.mesh)
        self._infer_cache = ((self.params, self.compute, self.mesh),
                             params)
        return params

    def autotune_fused_decode(self, batches=(16, 32, 64), repeats=8,
                              t=64):
        """Measure fused vs XLA greedy decode on the LIVE device and set
        ``fused_decode_max_b`` to the largest batch size whose measured
        regime wins end-to-end — so the dispatched fused regime is
        >=1.0x by construction on this device/session rather than a
        hardcoded bound (the B<=16 default is the only regime that wins
        reliably across sessions on unstable transports; calmer devices
        measure wins up to B=64, bench.py fused_smallbatch_B64).

        Uses the chained-timing protocol (inputs pinned, iterations
        chained through a 0-valued data dependency, one final fetch —
        see bench.py for why block_until_ready timing lies on remote
        transports). Costs a few seconds; intended for serving setup
        (scripts/proc.py --autotune-fused) or bench harnesses.

        Returns {'ratios': {B: fused/xla}, 'chosen': max_b} or None when
        the fused path is unsupported (non-TPU backend, f32 compute,
        unsupported topology)."""
        import time as _time
        import jax
        import jax.numpy as jnp
        if self.compute != 'bfloat16':
            return None
        params = self._infer_params()
        if not fused_greedy_supported(params, self.config, t):
            return None
        newline = self.mapping.get('\n')
        V = self.voc_size
        rng = np.random.default_rng(11)

        def timed(fn, enc):
            out = fn(enc)
            np.asarray(out[3])          # compile + warm
            e = enc
            for _ in range(2):          # throwaway: chain-op compiles
                out = fn(e)
                e = enc + (out[3][0] * 0).astype(enc.dtype)
            np.asarray(out[3])
            t0 = _time.perf_counter()
            e = enc
            for _ in range(repeats):
                out = fn(e)
                e = enc + (out[3][0] * 0).astype(enc.dtype)
            np.asarray(out[3])
            return _time.perf_counter() - t0

        ratios = {}
        for b in batches:
            idx = rng.integers(1, V, size=(b, t)).astype(np.int32)
            enc = jax.device_put(jnp.asarray(idx))
            dt_xla = timed(
                lambda e: decode_greedy(params, self.config, e, newline,
                                        return_alignments=False), enc)
            dt_fused = timed(
                lambda e: decode_greedy_fused(params, self.config, e,
                                              newline), enc)
            ratios[int(b)] = round(dt_xla / dt_fused, 3)
        (self.fused_decode_min_b,
         self.fused_decode_max_b) = _pick_fused_bound(ratios)
        result = {'ratios': ratios,
                  'chosen': (self.fused_decode_min_b,
                             self.fused_decode_max_b)}
        self.logger.info('fused-decode autotune: %s', result)
        return result

    def _place_batch(self, enc):
        """Put a host batch onto the serving mesh, sharded over 'data'
        (replicated if the batch doesn't divide the data axis)."""
        if self.mesh is None:
            return enc
        import jax
        from ..parallel.mesh import batch_sharding, replicated
        sh = (batch_sharding(self.mesh, np.ndim(enc))
              if enc.shape[0] % self.mesh.shape['data'] == 0
              else replicated(self.mesh))
        return jax.device_put(enc, sh)

    def _correct_batch(self, lines, conf, greedy,
                       return_alignments=True):
        return self._finish_batch(
            self._dispatch_batch(lines, conf, greedy, return_alignments))

    def _dispatch_batch(self, lines, conf, greedy,
                        return_alignments=True):
        """Queue one batch's decode on the device and return a handle
        (device buffers + metadata) without fetching; `_finish_batch`
        fetches and reconstructs host results."""
        if conf and any(conf):
            # per-char confidences / confmats need the dense prob array
            enc, _, _, _ = vectorize_lines(
                self.mapping, lines, ['' for _ in lines], confs=conf,
                logger=self.logger)
            T = enc.shape[1]
        else:
            # plain text ships as a compact (B, T) index batch; the
            # one-hot expansion happens on device (V times less host
            # link traffic — seq2seq.py:ensure_onehot)
            enc = lines_to_index_batch(self.mapping, lines,
                                       logger=self.logger)
            T = enc.shape[1]
        enc = self._place_batch(enc)
        newline = self.mapping.get('\n')
        params = self._infer_params()
        if greedy:
            if (self.fused_decode and not return_alignments
                    and self.mesh is None
                    and self.fused_decode_min_b <= enc.shape[0]
                    <= self.fused_decode_max_b
                    and fused_greedy_supported(params, self.config, T)):
                # small-batch bf16 serving: the whole decode loop in one
                # Pallas kernel, weights resident in VMEM across steps
                idx, prob, length, score, aligns = decode_greedy_fused(
                    params, self.config, enc, newline)
            else:
                # windowed-gather decoding is inherently window-based; a
                # global-attention model (window_width 0) must stay on
                # the dense decoder at every length
                decode = (decode_greedy_windowed
                          if T >= WINDOWED_DECODE_MIN_T
                          and self.config.window_width > 0
                          else decode_greedy)
                idx, prob, length, score, aligns = decode(
                    params, self.config, enc, newline,
                    return_alignments=return_alignments)
            # pack the four result arrays into one device buffer so the
            # finish phase fetches once: each separate fetch pays a full
            # transport round trip (~30 ms on the tunneled TPU)
            return ('greedy', lines, _pack_results(idx, prob, length,
                                                   score),
                    aligns if return_alignments else None, idx.shape[1])
        # beam
        src_len = np.array(
            [self._source_length(l, c)
             for l, c in zip(lines, conf or [None] * len(lines))],
            np.int32)
        # adaptive auto bounds: only probe when an auto bound is in play
        confidence = (self._model_confidence(params, enc, newline)
                      if self.beam_reservoir is None
                      or self.beam_expand is None else None)
        out = decode_beam(params, self.config,
                          self._beam_params(confidence),
                          enc, newline, src_len,
                          return_alignments=return_alignments)
        # pack into two device buffers -> two host fetches instead of
        # seven (each fetch is a transport round trip); the alignment
        # rows only travel when the caller wants alignments
        import jax.numpy as jnp
        f32 = jnp.float32
        big_parts = [out['idx'].astype(f32), out['prob'].astype(f32)]
        if return_alignments:
            big_parts.append(out['align_start'].astype(f32))
            Bb, Fb, Sb, WINb = out['align_row'].shape
            big_parts.append(
                out['align_row'].astype(f32).reshape(Bb, Fb, Sb * WINb))
        big_dev = jnp.concatenate(big_parts, axis=2)
        small_dev = jnp.concatenate(
            [out['length'].astype(f32), out['cost'].astype(f32),
             out['cum'].astype(f32),
             out['count'][:, None].astype(f32)], axis=1)
        return ('beam', lines, big_dev, small_dev,
                out['idx'].shape[2], out['length'].shape[1], T,
                return_alignments)

    def _finish_batch(self, handle):
        """Fetch a `_dispatch_batch` handle and rebuild host results."""
        if handle[0] == 'greedy':
            _, lines, packed_dev, aligns_dev, S = handle
            packed = np.asarray(packed_dev)
            idx = packed[:, :S].astype(np.int32)
            prob = packed[:, S:2 * S]
            length = packed[:, 2 * S].astype(np.int32)
            score = packed[:, 2 * S + 1]
            return_alignments = aligns_dev is not None
            if return_alignments:
                aligns = np.asarray(aligns_dev)
            out_lines, out_probs, out_scores, out_aligns = [], [], [], []
            for j in range(len(lines)):
                L = int(length[j])
                text = self._indexes2text(idx[j, :L])
                out_lines.append(text.replace(GAP, ''))
                out_probs.append(prob[j, :L].tolist())
                out_scores.append(float(score[j]))
                out_aligns.append(aligns[j, :L].tolist()
                                  if return_alignments else [])
            return out_lines, out_probs, out_scores, out_aligns
        _, lines, big_dev, small_dev, S, F, T, return_alignments = handle
        big = np.asarray(big_dev)
        small = np.asarray(small_dev)
        out = dict(idx=big[:, :, :S].astype(np.int32),
                   prob=big[:, :, S:2 * S],
                   align_start=(big[:, :, 2 * S:3 * S].astype(np.int32)
                                if return_alignments else None),
                   align_row=(big[:, :, 3 * S:].reshape(
                       big.shape[0], F, S, -1)
                       if return_alignments else None),
                   length=small[:, :F].astype(np.int32),
                   cost=small[:, F:2 * F], cum=small[:, 2 * F:3 * F],
                   count=small[:, 3 * F].astype(np.int32))
        out_lines, out_probs, out_scores, out_aligns = [], [], [], []
        for j, input_line in enumerate(lines):
            if not input_line:
                out_lines.append('')
                out_probs.append([])
                out_scores.append(0)
                out_aligns.append([])
                continue
            if out['count'][j] == 0:
                self.logger.error('cannot beam-decode input line %d: "%s"',
                                  j, input_line)
                text = self._echo_line(input_line)
                out_lines.append(text.replace(GAP, ''))
                out_probs.append([1.0] * len(text))
                out_scores.append(0)
                out_aligns.append(np.eye(len(text)).tolist())
                continue
            L = int(out['length'][j, 0])
            text = self._indexes2text(out['idx'][j, 0, :L])
            out_lines.append(text.replace(GAP, ''))
            out_probs.append(out['prob'][j, 0, :L].tolist())
            out_scores.append(float(out['cum'][j, 0] / max(L, 1)))
            if return_alignments:
                # expand the windowed soft rows to full (L, T) soft
                # alignment matrices (one-hot rows for rejection steps,
                # raw attention rows otherwise) — the same soft scores
                # the reference's Viterbi re-alignment and repl plots
                # consume (reference transcode.py:279-349)
                align = _expand_windowed_alignment(
                    out['align_row'][j, 0, :L],
                    out['align_start'][j, 0, :L], T)
                out_aligns.append(align.tolist())
            else:
                out_aligns.append([])
        return out_lines, out_probs, out_scores, out_aligns

    def _indexes2text(self, indexes):
        # bulk index->text via a codepoint LUT + UTF-32 decode (an order
        # of magnitude faster than per-char dict lookups at serving
        # batch sizes); index 0 maps to codepoint 0, dropped like the
        # reference's '' entry. The LUT is cached on the mapping itself
        # (CharMapping.inverse_lut), same invalidation as its forward lut
        cps = self.mapping.inverse_lut()[np.asarray(indexes,
                                                    dtype=np.int64)]
        return cps.tobytes().decode('utf-32-le').replace('\x00', '')

    @staticmethod
    def _source_length(line, conf=None):
        if conf and isinstance(conf[0], list):  # confmat
            return sum(max((len(alt[0]) for alt in chunk), default=0)
                       for chunk in conf)
        return len(line)

    @staticmethod
    def _echo_line(input_line):
        """Echo an input line as text (beam-failure fallback,
        reference seq2seq.py:826-836). Handles plain strings, per-char
        (char, prob) tuple lists and confmat chunk lists."""
        if isinstance(input_line, (list, tuple)) and input_line:
            if isinstance(input_line[0], tuple):      # prob line
                return ''.join(chunk[0] for chunk in input_line)
            if isinstance(input_line[0], list):       # confmat
                return ''.join(chunk[0][0] if chunk else ''
                               for chunk in input_line)
        return input_line

    def predict(self, filenames, fast=False, greedy=False, charmap=None):
        """Apply the model to text files, yielding per batch
        (filenames, corrected lines, scores) — reference seq2seq.py:756-780.

        Batches are pipelined through `correct_stream`: file reading and
        vectorization of batch k+1 overlap the device decode of batch k
        (the reference serializes them, seq2seq.py:772-776)."""
        assert self.status == 2
        assert not fast or greedy, \
            'cannot decode in fast mode with beam search enabled'

        def batches():
            for batch in gen_line_batches(filenames, self.batch_size,
                                          repeat=False, unsupervised=True,
                                          charmap=charmap):
                lines_source, lines_conf, _, lines_filename = batch
                yield lines_source, lines_conf, lines_filename

        for fnames, lines_result, _, scores_result, _ in \
                self.correct_stream(batches(), greedy=greedy,
                                    return_alignments=False):
            yield (fnames, lines_result, scores_result)

    def evaluate(self, filenames, fast=False, normalization='historic_latin',
                 charmap=None, gt_level=1, confusion=10, histogram=True):
        """Evaluate greedy+beamed CER/WER/perplexity on text files
        (reference seq2seq.py:651-754). Returns a result dict."""
        assert self.status == 2
        counts = {k: Edits(self.logger, histogram=histogram and k[0] == 'c')
                  for k in (('c', 'OCR'), ('w', 'OCR'), ('c', 'greedy'),
                            ('w', 'greedy'), ('c', 'beamed'), ('w', 'beamed'))}
        aligners = {k: Alignment(0, logger=self.logger,
                                 confusion=confusion > 0 and k[0] == 'c')
                    for k in counts}
        # evaluation is pipelined like correct_stream: both decodes of
        # batch k stay queued on the device while the host computes the
        # (expensive) alignment metrics of batch k-1, and up to
        # PIPELINE_DEPTH batches run ahead
        pending = []

        def consume_oldest():
            sources, targets, n, handle_g, handle_b = pending.pop(0)
            res = self._finish_batch(handle_g)
            greedy_lines, greedy_scores = res[0][:n], res[2][:n]
            if handle_b is None:
                beamed_lines, beamed_scores = greedy_lines, greedy_scores
            else:
                res = self._finish_batch(handle_b)
                beamed_lines, beamed_scores = res[0][:n], res[2][:n]
            self._evaluate_batch(
                sources, targets, greedy_lines, greedy_scores,
                beamed_lines, beamed_scores, counts, aligners,
                normalization, gt_level)

        for batch in gen_line_batches(filenames, self.batch_size,
                                      repeat=False, charmap=charmap):
            sources, confs, targets, _ = batch
            n, handle_g = self._dispatch_bucketed(sources, confs, True,
                                                  False)
            handle_b = (None if fast else
                        self._dispatch_bucketed(sources, confs, False,
                                                False)[1])
            pending.append((sources, targets, n, handle_g, handle_b))
            if len(pending) > self.PIPELINE_DEPTH:
                consume_oldest()
        while pending:
            consume_oldest()

        result = {}
        self.logger.info('finished %d lines', counts[('c', 'OCR')].steps)
        for kind in ('OCR', 'greedy', 'beamed'):
            c, w = counts[('c', kind)], counts[('w', kind)]
            result[kind] = {
                'cer': c.mean, 'cer_stddev': math.sqrt(c.varia),
                'wer': w.mean, 'wer_stddev': math.sqrt(w.varia),
            }
            if confusion > 0:
                table, _ = aligners[('c', kind)].get_confusion(confusion)
                result[kind]['confusion'] = [
                    (conf.count, conf.pair) for conf in table]
            if histogram:
                result[kind]['histogram'] = c.hist()
            if kind != 'OCR' and c.length:
                result[kind]['perplexity'] = math.exp(c.score / c.length)
            self.logger.info('CER %s: %.3f±%.3f  WER %s: %.3f±%.3f',
                             kind, c.mean, math.sqrt(c.varia),
                             kind, w.mean, math.sqrt(w.varia))
        return result

    def _evaluate_batch(self, sources, targets, greedy_lines,
                        greedy_scores, beamed_lines, beamed_scores,
                        counts, aligners, normalization, gt_level):
        """Accumulate one batch's alignment metrics (the host-side half
        of `evaluate`, reference seq2seq.py:703-736)."""
        for j, (src, tgt) in enumerate(zip(sources, targets)):
            if not src or not tgt:
                continue
            self.logger.info('Source input              : %s',
                             src.rstrip('\n'))
            self.logger.info('Target output             : %s',
                             tgt.rstrip('\n'))
            self.logger.info('Target prediction (greedy): %s [%.2f]',
                             greedy_lines[j].rstrip('\n'),
                             greedy_scores[j])
            self.logger.info('Target prediction (beamed): %s [%.2f]',
                             beamed_lines[j].rstrip('\n'),
                             beamed_scores[j])
            for kind, line in (('OCR', src), ('greedy', greedy_lines[j]),
                               ('beamed', beamed_lines[j])):
                dist, length = aligners[('c', kind)].get_adjusted_distance(
                    line, tgt, normalization=normalization,
                    gtlevel=gt_level)
                counts[('c', kind)].add(dist, length, line, tgt)
                wsrc, wtgt = splitwords(line), splitwords(tgt)
                dist, length = aligners[('w', kind)].get_adjusted_distance(
                    wsrc, wtgt, normalization=normalization,
                    gtlevel=gt_level)
                counts[('w', kind)].add(dist, length, wsrc, wtgt)
        counts[('c', 'greedy')].score += sum(greedy_scores)
        counts[('c', 'beamed')].score += sum(beamed_scores)

    # ------------------------------------------------------------------
    # reference-surface convenience wrappers (lib/seq2seq.py names)

    def vectorize_lines(self, source_lines, target_lines, conf=None):
        """Reference-compatible vectorization (seq2seq.py:1020-1119)."""
        return vectorize_lines(self.mapping, source_lines, target_lines,
                               confs=conf, logger=self.logger)

    def gen_lines(self, filenames, repeat=False, split=None, train=False,
                  unsupervised=False, charmap=None):
        """Reference-compatible line batch generator (seq2seq.py:919)."""
        def is_bad(src, tgt):
            self.aligner.set_seqs(src, tgt)
            return self.aligner.is_bad()
        return gen_line_batches(
            filenames, self.batch_size, repeat=repeat, split=split,
            train=train, unsupervised=unsupervised, charmap=charmap,
            is_bad=is_bad if train else None)

    def decode_batch_greedy(self, encoder_input_data):
        """Reference-compatible greedy batch decode over raw input arrays
        (seq2seq.py:1215-1286). Returns (texts, probs, scores, alignments)."""
        newline = self.mapping.get('\n')
        idx, prob, length, score, aligns = decode_greedy(
            self._infer_params(), self.config,
            self._place_batch(np.asarray(encoder_input_data, np.float32)),
            newline, return_alignments=True)
        idx = np.asarray(idx)
        length = np.asarray(length)
        texts = [self._indexes2text(idx[j, :length[j]])
                 for j in range(idx.shape[0])]
        probs = [np.asarray(prob)[j, :length[j]].tolist()
                 for j in range(idx.shape[0])]
        aligns = [np.asarray(aligns)[j, :length[j]]
                  for j in range(idx.shape[0])]
        return texts, probs, np.asarray(score).tolist(), aligns

    # training is provided by models/train.py (train_model) and bound
    # here lazily to keep JAX-optimizer imports off the inference path
    def train(self, filenames, val_filenames=None, checkpoint_dir='.',
              resume=False):
        from .train import train_model
        return train_model(self, filenames, val_filenames,
                           checkpoint_dir=checkpoint_dir, resume=resume)
