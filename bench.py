"""Benchmark: on-device decode throughput vs the real reference baseline.

Measures lines/sec of the flagship configuration (depth 2, width 512 —
the reference's pretrained topology, SURVEY.md 6) decoding realistic OCR
lines on one TPU chip, fully on-device, in BOTH decode modes:
- greedy (the reference's "fast mode", lib/seq2seq.py:1215-1286),
- beamed (A* with rejection, lib/seq2seq.py:1356-1544).

The baseline denominator runs the REFERENCE'S OWN code: tests/keras_ref
loads the same flagship h5 into the genuine Sequence2Sequence class
(three Keras graphs under tf_keras) and times its real
decode_batch_greedy host loop at the reference's default batch size and
its real per-line decode_sequence_beam, on the same lines. When the
reference checkout or tf_keras is unavailable the greedy baseline falls
back to the NumPy host-loop proxy (flagged in the output).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
auxiliary keys ("beam", "baseline") the driver ignores.
"""

import json
import os
import sys
import time

import numpy as np


FLAGSHIP = 'testmodels/flagship.d2.w512.synthetic.h5'


def build(width=512, depth=2, voc=96):
    """Synthetic sharpened random model (used by tools/ experiments)."""
    from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
    from cor_asv_ann_tpu.utils.data import CharMapping
    chars = ''.join(chr(c) for c in range(32, 32 + voc - 2)) + '\n'
    mapping = CharMapping.from_texts([chars])
    config = Seq2SeqConfig(width=width, depth=depth,
                           voc_size=mapping.voc_size)
    params = init_params(config, seed=0)
    # sharpen the output so decoding terminates like a trained model
    params['char_embedding']['kernel'] *= 200.0
    return config, mapping, params


def build_flagship():
    """The bundled trained flagship model (d2/w512, the reference's
    pretrained topology): decoding it early-terminates on newline like
    real serving, unlike a random-weight model which always runs the
    full 2T step cap."""
    import os
    from cor_asv_ann_tpu.utils import io_h5
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        FLAGSHIP)
    config, mapping = io_h5.load_config(path)
    params = io_h5.load_weights(path, config)
    return config, mapping, params


def make_lines(mapping, batch, length, pad):
    rng = np.random.default_rng(1)
    V = mapping.voc_size
    enc = np.zeros((batch, pad, V), np.float32)
    for b in range(batch):
        idx = rng.integers(1, V - 1, length - 1)
        enc[b, np.arange(length - 1), idx] = 1.0
        enc[b, length - 1, mapping.get('\n')] = 1.0
    return enc


def make_flagship_lines(mapping, batch, min_len, pad):
    """Noisy historical-OCR-style lines from the flagship's training
    distribution (cor_asv_ann_tpu.utils.synthdata — the same tables the
    model trained on and tests/test_quality.py evaluates with)."""
    from cor_asv_ann_tpu.utils.synthdata import WORDS, NOISE
    rng = np.random.default_rng(1)
    V = mapping.voc_size
    enc = np.zeros((batch, pad, V), np.float32)
    for b in range(batch):
        text = ''
        while len(text) < min_len:
            text += WORDS[rng.integers(len(WORDS))] + ' '
        text = ''.join(NOISE[ch]
                       if ch in NOISE and rng.random() < 0.12 else ch
                       for ch in text.strip()[:pad - 1]) + '\n'
        idx = mapping.encode(text)
        enc[b, np.arange(len(idx)), idx] = 1.0
    return enc


def bench_tpu(params, config, mapping, enc, repeats=20):
    """Greedy decode throughput with bfloat16 compute (the production
    inference mode, s2s.compute='bfloat16'; float32 masters, float32
    accumulation — see models/api.py).

    Measurement protocol (hardened against remote-device transports):
    the input batch is pinned on device once (host-link bandwidth is not
    the quantity under test), the `repeats` iterations are CHAINED — each
    iteration's input depends on the previous iteration's output, so an
    asynchronous or memoizing transport cannot elide executions — and a
    single host fetch at the end is the sync point, amortizing the
    transport round trip over all repeats. A short throwaway chained
    loop runs before the measured one: the chaining expression itself
    (`e + out*0`) is a handful of tiny XLA programs that compile lazily
    on first use — seconds on the remote transport, which would
    otherwise be billed to the measured loop (caused 6-7x
    under-reporting before this warm-up was added).
    """
    import jax
    import jax.numpy as jnp
    from cor_asv_ann_tpu.models.api import WINDOWED_DECODE_MIN_T
    from cor_asv_ann_tpu.models.seq2seq import (decode_greedy,
                                                decode_greedy_windowed)
    if enc.shape[1] >= WINDOWED_DECODE_MIN_T and config.window_width > 0:
        # exactly the serving dispatch rule (models/api.py), so the
        # bench measures the path correct_lines would actually run
        decode_greedy = decode_greedy_windowed
    newline = mapping.get('\n')
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a).astype(jnp.bfloat16), params)
    enc = jax.device_put(enc)
    out = decode_greedy(params, config, enc, newline)
    np.asarray(out[2])  # compile + pipeline warm-up, fetch = full sync
    e = enc
    for _ in range(2):  # throwaway: compiles the chain ops
        out = decode_greedy(params, config, e, newline)
        e = e + (out[3][0] * 0).astype(e.dtype)
    np.asarray(out[2])
    t0 = time.perf_counter()
    e = enc
    for _ in range(repeats):
        out = decode_greedy(params, config, e, newline)
        # 0-valued data dependency on this iteration's result
        e = e + (out[3][0] * 0).astype(e.dtype)
    lengths = np.asarray(out[2])
    dt = time.perf_counter() - t0
    # steps the while_loop actually ran (early exit when all lines hit
    # newline — trained models terminate; the step cap is 2T): the body
    # executes exactly max-final-length times (the newline is emitted on
    # the final executed step)
    steps = min(int(lengths.max()), 2 * enc.shape[1])
    return repeats * enc.shape[0] / dt, steps


def bench_fused(params, config, mapping, enc, repeats=20):
    """Fused whole-loop Pallas greedy decode vs the XLA path at small
    batch (chained protocol like bench_tpu). Returns lines/sec for both
    and the ratio — the fused path is the serving default at
    B <= FUSED_DECODE_MAX_B (models/api.py)."""
    import jax
    import jax.numpy as jnp
    from cor_asv_ann_tpu.models.seq2seq import decode_greedy
    from cor_asv_ann_tpu.ops.pallas_decode_loop import decode_greedy_fused
    newline = mapping.get('\n')
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a).astype(jnp.bfloat16), params)
    enc = jax.device_put(enc)

    def run(fn):
        out = fn(params, config, enc, newline)
        np.asarray(out[2])
        e = enc
        for _ in range(2):
            out = fn(params, config, e, newline)
            e = e + (out[3][0] * 0).astype(e.dtype)
        np.asarray(out[2])
        t0 = time.perf_counter()
        e = enc
        for _ in range(repeats):
            out = fn(params, config, e, newline)
            e = e + (out[3][0] * 0).astype(e.dtype)
        np.asarray(out[2])
        return repeats * enc.shape[0] / (time.perf_counter() - t0)

    xla = run(decode_greedy)
    fused = run(decode_greedy_fused)
    return {'fused': round(fused, 2), 'xla': round(xla, 2),
            'ratio': round(fused / xla, 2), 'unit': 'lines/sec/chip'}


def bench_tpu_beam(params, config, mapping, enc, src_len, repeats=5,
                   dtype='bfloat16'):
    """Beamed decode throughput at serving settings (BeamParams
    defaults = the reference's widths 15/16, rejection 0.3), chained
    like bench_tpu. dtype='float32' is the byte-stable serving mode
    (the API default); 'bfloat16' the throughput mode (NOTES.md:
    bf16 beam diverges from the f32 goldens on ~7% of lines at high
    rejection)."""
    import jax
    import jax.numpy as jnp
    from cor_asv_ann_tpu.models.beam import BeamParams, decode_beam
    newline = mapping.get('\n')
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a).astype(dtype), params)
    enc = jax.device_put(enc)
    src_len = jax.device_put(src_len)
    bp = BeamParams()
    out = decode_beam(params, config, bp, enc, newline, src_len)
    np.asarray(out['count'])  # compile + full sync
    e = enc
    for _ in range(2):  # throwaway: compiles the chain ops
        out = decode_beam(params, config, bp, e, newline, src_len)
        e = e + (out['cum'][0, 0] * 0).astype(e.dtype)
    np.asarray(out['count'])
    t0 = time.perf_counter()
    e = enc
    for _ in range(repeats):
        out = decode_beam(params, config, bp, e, newline, src_len)
        e = e + (out['cum'][0, 0] * 0).astype(e.dtype)
    np.asarray(out['count'])
    dt = time.perf_counter() - t0
    return repeats * enc.shape[0] / dt


def train_flops_estimate(width, voc, t_enc, t_dec, batch):
    """Analytic matmul-FLOP count for one train step (fwd + bwd ~= 3x
    fwd) of the d2 topology: bidir encoder L1 (32W^2/char), encoder L2
    (24W^2), attention projection (4W^2), decoder L1 (16W^2), top cell
    with context input (32W^2), additive attention energies/context
    (~6TW/char), embedding + logits (2VW each)."""
    W, V = width, voc
    fwd = (t_enc * (2 * V * W + 60 * W * W)
           + t_dec * (2 * V * W + 48 * W * W + 6 * t_enc * W + 2 * W * V))
    return 3.0 * fwd * batch


def bench_train(params, config, mapping, batch=256, t_enc=128, steps=8):
    """Train-step latency and MFU at the flagship training shape
    (B=256, T=128 — the reference's gen_data batching at its default
    batch_size, lib/seq2seq.py:878-1014), both compute dtypes.

    Chaining is inherent: each step consumes the previous step's params
    and optimizer state, so a lazy/acking transport cannot elide steps;
    the single host fetch of the final loss is the sync point. FLOPs
    come from XLA's own cost model when the backend exposes it, else
    from the analytic estimate (train_flops_estimate)."""
    import jax
    import jax.numpy as jnp
    from cor_asv_ann_tpu.models import train as T
    rng = np.random.default_rng(7)
    V = mapping.voc_size
    idx = rng.integers(1, V, size=(batch, t_enc))
    enc = np.zeros((batch, t_enc, V), np.float32)
    enc[np.arange(batch)[:, None], np.arange(t_enc)[None, :], idx] = 1.0
    dec_in = np.zeros((batch, t_enc + 1, V), np.float32)
    dec_in[:, 1:] = enc
    dec_out = np.concatenate(
        [enc, np.zeros((batch, 1, V), np.float32)], axis=1)
    weights = (dec_out.sum(-1) > 0).astype(np.float32)
    opt = T.make_optimizer(1e-3)
    key = jax.random.PRNGKey(0)
    enc_d, din_d, dout_d, w_d = map(jax.device_put,
                                    (enc, dec_in, dec_out, weights))
    result = {'batch': batch, 't': t_enc}
    for name, cdt in (('bf16', 'bfloat16'), ('f32', None)):
        p = jax.tree_util.tree_map(jnp.asarray, params)
        opt_state = opt.init(p)
        # MFU numerator: the ANALYTIC model-flop count (standard MFU
        # practice — the model's matmul math, independent of the
        # implementation). XLA's cost model is recorded alongside but
        # NOT used: it undercounted the scan flops ~2x in rounds 1-3
        # (the 0.0787 r03 headline recomputes to 0.19 analytic on the
        # same measurement) and cannot see into pallas_call custom
        # calls at all, so it would silently shrink whenever compute
        # moves into a kernel.
        flops = train_flops_estimate(config.width, V, t_enc,
                                     t_enc + 1, batch)
        flops_cost_model = None

        def cost_model_flops():
            # runs AFTER the timed arms: the informational AOT
            # lower().compile() intermittently fails on the tunnel's
            # compile helper at large shapes and must not poison the
            # measurement path (B=1024 lost its data point twice to
            # this ordering in round 5)
            comp = T.train_step.lower(
                p, opt_state, config, enc_d, din_d, dout_d, w_d, key,
                lm_loss=False, optimizer=opt, compute_dtype=cdt).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            if ca and ca.get('flops', 0) > 0:
                return float(ca['flops'])
            return None
        # compile + warm
        for _ in range(2):
            p, opt_state, loss = T.train_step(
                p, opt_state, config, enc_d, din_d, dout_d, w_d, key,
                lm_loss=False, optimizer=opt, compute_dtype=cdt)
        float(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            p, opt_state, loss = T.train_step(
                p, opt_state, config, enc_d, din_d, dout_d, w_d, key,
                lm_loss=False, optimizer=opt, compute_dtype=cdt)
        float(loss)
        dt = (time.perf_counter() - t0) / steps
        result['step_ms_%s' % name] = round(dt * 1e3, 2)
        try:
            flops_cost_model = cost_model_flops()
        except Exception:
            flops_cost_model = None
        if name == 'bf16':
            # v5e peak: 197 TFLOP/s bf16
            result['mfu_bf16'] = round(flops / dt / 197e12, 4)
            result['flops_per_step'] = flops
            result['flops_denominator'] = ('analytic model flops '
                                           '(r04: was XLA cost model, '
                                           'which undercounts scans and '
                                           'cannot see pallas kernels; '
                                           'r03 0.0787 -> 0.19 analytic '
                                           'on the same measurement)')
            if flops_cost_model:
                result['mfu_bf16_xla_cost_model'] = round(
                    flops_cost_model / dt / 197e12, 4)
    # A/B the round-4 training-path rework — fused whole-sequence Pallas
    # scans + the hand-written teacher-scan VJP — against the plain XLA
    # autodiff baseline at the same shape (same-session ratio: device
    # speed swings day to day, only the ratio is comparable across
    # rounds). The dispatch flags are read at trace time, so caches are
    # dropped around each flip.
    from cor_asv_ann_tpu.models import seq2seq as S
    from cor_asv_ann_tpu.ops.pallas_lstm_train import fused_scan_supported
    pb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    if fused_scan_supported(pb['decoder'][0], batch, config.width):
        old = (S._FUSED_TRAIN_SCAN, S._TEACHER_VJP, S._TEACHER_KERNEL)
        times = {}
        # own fence: a failure in one arm (e.g. OOM at an experimental
        # shape) must not void the bf16/f32 timings already recorded
        # above — record the error instead (ADVICE r4)
        try:
            for mode, flags in (('baseline', ('off', 'off', 'off')),
                                ('shipped', ('auto', 'auto', 'auto'))):
                jax.clear_caches()
                (S._FUSED_TRAIN_SCAN, S._TEACHER_VJP,
                 S._TEACHER_KERNEL) = flags
                p = jax.tree_util.tree_map(jnp.asarray, params)
                opt_state = opt.init(p)
                for _ in range(2):
                    p, opt_state, loss = T.train_step(
                        p, opt_state, config, enc_d, din_d, dout_d, w_d,
                        key, lm_loss=False, optimizer=opt,
                        compute_dtype='bfloat16')
                float(loss)
                t0 = time.perf_counter()
                for _ in range(steps):
                    p, opt_state, loss = T.train_step(
                        p, opt_state, config, enc_d, din_d, dout_d, w_d,
                        key, lm_loss=False, optimizer=opt,
                        compute_dtype='bfloat16')
                float(loss)
                times[mode] = (time.perf_counter() - t0) / steps
            result['train_rework_baseline_ms'] = round(
                times['baseline'] * 1e3, 2)
            result['train_rework_ratio'] = round(
                times['baseline'] / times['shipped'], 3)
        except Exception as exc:          # noqa: BLE001 - recorded
            result['train_rework_error'] = '%s: %s' % (
                type(exc).__name__, str(exc)[:200])
        finally:
            (S._FUSED_TRAIN_SCAN, S._TEACHER_VJP,
             S._TEACHER_KERNEL) = old
            jax.clear_caches()
    return result


def bench_baseline_numpy(params, config, mapping, enc, full_steps,
                         sample=4, max_steps=24):
    """Fallback denominator: reference-structure decode (host loop per
    character) via the NumPy golden model, extrapolated."""
    from cor_asv_ann_tpu.lib import numpy_ref
    cfg = config.as_dict()
    sub = enc[:sample]
    t0 = time.perf_counter()
    numpy_ref.decode_batch_greedy(params, cfg, mapping, sub,
                                  max_steps=max_steps)
    dt = time.perf_counter() - t0
    per_line = dt / sample * (full_steps / max_steps)
    return 1.0 / per_line


def bench_baseline_reference(enc, model_path, greedy_batch=256,
                             greedy_steps=24, beam_lines=2):
    """The authoritative denominators: the reference's own decode loops
    (genuine Sequence2Sequence running under tf_keras, loading the same
    flagship h5) timed on the same lines.

    - greedy: per-step cost of decode_batch_greedy's predict_on_batch
      loop at the reference's default batch_size (256), scaled to the
      full 2*T steps the reference always runs (no early exit,
      seq2seq.py:1243);
    - beamed: decode_sequence_beam 1-best, timed per line (the
      reference serves beams line-serially, seq2seq.py:810-836).

    Returns (greedy_lines_per_sec, beam_lines_per_sec) or None if the
    reference checkout / tf_keras is unavailable.
    """
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'tests'))
    try:
        import keras_ref
        if not keras_ref.available():
            return None
        s2s = keras_ref.reference_s2s(model_path, t_enc=enc.shape[1])
    except Exception as exc:  # pragma: no cover - env-dependent
        sys.stderr.write('bench: reference baseline unavailable (%s)\n'
                         % exc)
        return None
    try:
        T = enc.shape[1]
        batch = np.ascontiguousarray(
            np.resize(enc, (greedy_batch,) + enc.shape[1:]))
        # one throwaway step compiles the tf.functions
        enc_out = s2s.encoder_model.predict_on_batch(batch)
        states = list(enc_out[1:])
        dec = np.zeros((greedy_batch, 1, s2s.voc_size), np.float32)
        out = s2s.decoder_model.predict_on_batch(
            [dec, enc_out[0]] + states)
        t0 = time.perf_counter()
        for _ in range(greedy_steps):
            out = s2s.decoder_model.predict_on_batch(
                [out[0][:, -1:], enc_out[0]] + list(out[1:]))
        per_step = (time.perf_counter() - t0) / greedy_steps
        greedy_lps = greedy_batch / (per_step * 2 * T)

        t0 = time.perf_counter()
        for j in range(beam_lines):
            next(s2s.decode_sequence_beam(source_seq=enc[j]))
        beam_lps = beam_lines / (time.perf_counter() - t0)
        return greedy_lps, beam_lps
    except Exception as exc:  # pragma: no cover - env-dependent
        # a runtime failure in the reference loops (tf_keras API drift,
        # OOM) must not cost the whole bench data point — fall back to
        # the NumPy proxy like an unavailable reference does
        sys.stderr.write('bench: reference baseline failed mid-run '
                         '(%s)\n' % exc)
        return None


def _ensure_live_backend():
    """Probe the default JAX backend in a subprocess; if the TPU tunnel
    is wedged (every op blocks forever at buffer fetch, NOTES.md 7),
    re-exec this script on the host-CPU backend instead of hanging the
    driver until the watchdog kills us with no data point at all. The
    fallback run is disclosed via BENCH_BACKEND=cpu -> "backend": "cpu"
    in the JSON and uses reduced sizes (one host core)."""
    import subprocess
    if os.environ.get('BENCH_BACKEND') == 'cpu':
        return 'cpu'
    probe = ("import jax, jax.numpy as jnp; "
             "(jnp.ones(3) + 1).block_until_ready()")
    try:
        rc = subprocess.run([sys.executable, '-c', probe],
                            timeout=180).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    if rc == 0:
        return 'device'
    sys.stderr.write('bench.py: device probe failed (rc=%s) — TPU '
                     'tunnel appears wedged; falling back to the '
                     'host-CPU backend\n' % rc)
    sys.stderr.flush()
    env = {k: v for k, v in os.environ.items() if k != 'PYTHONPATH'}
    env['JAX_PLATFORMS'] = 'cpu'
    env['BENCH_BACKEND'] = 'cpu'
    os.execvpe(sys.executable, [sys.executable,
                                os.path.abspath(__file__)], env)


def main():
    cpu_fallback = _ensure_live_backend() == 'cpu'
    # watchdog: the tunnel to the TPU occasionally wedges mid-run,
    # blocking the main thread inside a C++ device call where Python
    # signal handlers cannot run — a watchdog *thread* with os._exit is
    # the only reliable way to die loudly instead of hanging the driver.
    # 900s covers a slow-day build+compile+20 repeats comfortably
    # (typical run <60s); the single-core CPU fallback gets more.
    import threading

    def _die():
        sys.stderr.write('bench.py: watchdog expired — TPU tunnel '
                         'appears wedged\n')
        sys.stderr.flush()
        os._exit(3)

    watchdog = threading.Timer(2700 if cpu_fallback else 900, _die)
    watchdog.daemon = True
    watchdog.start()
    # the bundled trained flagship (d2/w512): early-terminates on
    # newline like real serving (a random-weight model never does and
    # always pays the full 2T step cap — through round 1 the bench used
    # one, under-reporting real throughput ~2x)
    config, mapping, params = build_flagship()
    # batch 1024 saturates the chip (per-step overhead amortizes across
    # lines; beyond that HBM working sets start to spill); the CPU
    # fallback shrinks batches/repeats to finish on one host core
    batch, min_len, pad = (128, 50, 64) if cpu_fallback else (1024, 50, 64)
    repeats = 3 if cpu_fallback else 20
    enc = make_flagship_lines(mapping, batch, min_len, pad)
    lines_per_sec, steps = bench_tpu(params, config, mapping, enc,
                                     repeats=repeats)
    # beamed serving point: serving beam settings
    beam_batch = 64 if cpu_fallback else 256
    src_len = np.sum(np.any(enc[:beam_batch] != 0, axis=2),
                     axis=1).astype(np.int32)
    beam_lps = bench_tpu_beam(params, config, mapping, enc[:beam_batch],
                              src_len, repeats=1 if cpu_fallback else 5)
    beam_f32_lps = bench_tpu_beam(params, config, mapping,
                                  enc[:beam_batch], src_len,
                                  repeats=1 if cpu_fallback else 5,
                                  dtype='float32')
    model_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              FLAGSHIP)
    ref = bench_baseline_reference(enc[:8], model_path)
    if ref is not None:
        base_greedy, base_beam = ref
        baseline_kind = 'reference_tf_keras'
    else:
        base_greedy = bench_baseline_numpy(params, config, mapping, enc,
                                           steps)
        base_beam = None
        baseline_kind = 'numpy_host_proxy'
    result = {
        'metric': 'greedy_decode_throughput_d2w512',
        'value': round(lines_per_sec, 2),
        'unit': 'lines/sec/chip',
        'vs_baseline': round(lines_per_sec / base_greedy, 2),
        'baseline': baseline_kind,
        'beam': {
            'value': round(beam_lps, 2),
            'unit': 'lines/sec/chip',
            'vs_baseline': (round(beam_lps / base_beam, 2)
                            if base_beam else None),
            'f32_byte_stable': round(beam_f32_lps, 2),
        },
        'methodology': 'chained-timing protocol (inputs pinned, '
                       'iterations chained via 0-valued data deps, one '
                       'final fetch); denominator = the reference\'s own '
                       'tf_keras decode loops measured in-process on '
                       'this host',
    }
    if cpu_fallback:
        result['backend'] = 'cpu'
        result['train'] = bench_train(params, config, mapping,
                                      batch=16, t_enc=32, steps=2)
        result['train'].pop('mfu_bf16', None)  # meaningless off-TPU
    else:
        # each auxiliary point is fenced: a failure (e.g. an OOM at an
        # experimental shape) is recorded instead of killing the run.
        # One retry: the tunnel's remote compile-helper intermittently
        # 500s under concurrent Mosaic compiles (env race, NOTES r5) —
        # a fresh attempt with cleared caches usually lands
        def fenced(name, fn):
            for attempt in (0, 1):
                try:
                    result[name] = fn()
                    return
                except Exception as exc:   # noqa: BLE001 - recorded
                    result[name] = {'error': '%s: %s' % (
                        type(exc).__name__, str(exc)[:200])}
                    import jax as _jax
                    _jax.clear_caches()

        fenced('train', lambda: bench_train(params, config, mapping))

        # long-line point: T=256 bucket exercises the windowed-gather
        # decoder (decode_greedy_windowed, the T>=128 serving path)
        def long_point():
            long_enc = make_flagship_lines(mapping, 256, 220, 256)
            long_lps, _ = bench_tpu(params, config, mapping, long_enc,
                                    repeats=5)
            return {'value': round(long_lps, 2),
                    'unit': 'lines/sec/chip'}
        fenced('long_lines_T256', long_point)
        # small-batch latency points: the fused whole-loop Pallas decode
        # (weights VMEM-resident across characters) vs the XLA path;
        # the measured ratios drive the dispatch bound exactly like
        # Sequence2Sequence.autotune_fused_decode (the dispatched fused
        # regime is >=1.0x by construction on the measuring device)
        from cor_asv_ann_tpu.models.api import _pick_fused_bound
        ratios = {}
        for b in (16, 32, 64):
            try:
                r = bench_fused(params, config, mapping, enc[:b])
            except Exception as exc:      # noqa: BLE001 - recorded
                result['fused_smallbatch_B%d' % b] = {
                    'error': '%s: %s' % (type(exc).__name__,
                                         str(exc)[:200])}
                continue
            result['fused_smallbatch_B%d' % b] = r
            ratios[b] = r['ratio']
        (result['fused_autotuned_min_b'],
         result['fused_autotuned_max_b']) = _pick_fused_bound(ratios)
        # large-batch training point: remat makes B=1024/T=128 trainable
        # (README.md); bigger per-step matmuls amortize the sequential
        # scan-step latency that bounds MFU at B=256
        fenced('train_B1024', lambda: bench_train(
            params, config, mapping, batch=1024, steps=4))
        # long-sequence training point: T=256 is the windowed +
        # manual-VJP teacher regime (T >= _TEACHER_WINDOWED_MIN_T) —
        # keeps the shipped long-T path measured every round
        fenced('train_T256', lambda: bench_train(
            params, config, mapping, batch=256, t_enc=256, steps=3))
    # full record first (humans / NOTES), then a COMPACT summary as the
    # FINAL stdout line: the driver captures only the last ~2000 chars
    # of output and parses the tail line — BENCH_r04's single full-JSON
    # line outgrew that window and the round record lost the greedy
    # headline ("parsed": null). The compact line carries the headline
    # plus the key auxiliary numbers and stays well under the window.
    print(json.dumps(result))
    train = result.get('train') or {}
    compact = {
        'metric': result['metric'],
        'value': result['value'],
        'unit': result['unit'],
        'vs_baseline': result['vs_baseline'],
        'baseline': result['baseline'],
        'beam_lps': result['beam']['value'],
        'beam_vs_baseline': result['beam']['vs_baseline'],
        'beam_f32_lps': result['beam']['f32_byte_stable'],
        'train_step_ms_bf16': train.get('step_ms_bf16'),
        'train_mfu_bf16': train.get('mfu_bf16'),
        'train_rework_ratio': train.get('train_rework_ratio'),
        'train_B1024_ms': (result.get('train_B1024') or {}).get(
            'step_ms_bf16'),
        'train_B1024_mfu': (result.get('train_B1024') or {}).get(
            'mfu_bf16'),
        'fused_autotuned_max_b': result.get('fused_autotuned_max_b'),
    }
    if cpu_fallback:
        compact['backend'] = 'cpu'
    line = json.dumps(compact)
    assert len(line) < 1900, 'compact bench line outgrew the driver tail'
    print(line)
    watchdog.cancel()


if __name__ == '__main__':
    sys.exit(main())
