"""Beam serving-parameter ablation: quality = agreement with the
genuine reference beam; speed = lines/sec on the real chip.

The device beam bounds the reference's unbounded best-first queue with a
per-line reservoir R and per-iteration expansion width K (the reference
uses fringe = batch_size = 256 and queue <= 2T*256).  This tool measures,
at serving settings (rejection 0.3, widths 15/16) on flagship lines:

- 1-best agreement with the reference's own decode_sequence_beam
  (tests/keras_ref runs the real implementation under tf_keras),
- beam-failure count (empty bank -> echo fallback),
- bf16 throughput at B=256.

Usage: python tools/beam_ablation.py [n_ref_lines]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = os.path.join(REPO, 'testmodels',
                        'flagship.d2.w512.synthetic.h5')

CONFIGS = [  # (reservoir, expand)
    (64, 16),   # current serving default
    (64, 48),
    (96, 32),
    (32, 16),
    (128, 64),
]


def main():
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    import numpy as np
    import jax
    import jax.numpy as jnp
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'bench', os.path.join(REPO, 'bench.py'))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    from cor_asv_ann_tpu.models.beam import BeamParams, decode_beam

    n_ref = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    config, mapping, params = bench.build_flagship()
    B, pad = 256, 64
    # full-width lines (min_len > pad => every line is exactly pad
    # chars): true length == padded length, so the reference's padded
    # length prior (decode_sequence_beam length0=attended_len,
    # seq2seq.py:1393) and this framework's true-length prior coincide
    # and agreement measures pure search structure
    enc = bench.make_flagship_lines(mapping, B, 80, pad)
    src_len = np.sum(np.any(enc != 0, axis=2), axis=1).astype(np.int32)
    assert (src_len == pad).all()
    newline = mapping.get('\n')

    # --- reference 1-best on the first n_ref lines ---------------------
    import keras_ref
    assert keras_ref.available()
    s2s = keras_ref.reference_s2s(FLAGSHIP, t_enc=pad)
    s2s.rejection_threshold = 0.3
    s2s.beam_width_in = 15
    s2s.beam_threshold_in = 0.2
    s2s.beam_width_out = 16
    s2s.batch_size = 256
    ref_best = []
    t0 = time.perf_counter()
    for j in range(n_ref):
        txt, _p, _s, _a = next(s2s.decode_sequence_beam(
            source_seq=enc[j]))
        ref_best.append(txt)
    print('reference beam: %d lines in %.1fs' %
          (n_ref, time.perf_counter() - t0), flush=True)

    # --- device beam across configs ------------------------------------
    params_f32 = jax.tree_util.tree_map(jnp.asarray, params)
    params_bf16 = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a).astype(jnp.bfloat16), params)
    enc_d = jax.device_put(enc)
    src_d = jax.device_put(src_len)

    for R, K in CONFIGS:
        bp = BeamParams(reservoir=R, expand=K)
        # quality: f32 (the byte-stable serving mode)
        out = {k: np.asarray(v) for k, v in decode_beam(
            params_f32, config, bp, enc_d, newline, src_d).items()}
        fails = int((out['count'] == 0).sum())
        agree = 0
        for j in range(n_ref):
            if out['count'][j] == 0:
                continue
            L = out['length'][j, 0]
            txt = ''.join(mapping.i2c[int(i)]
                          for i in out['idx'][j, 0, :L])
            agree += txt == ref_best[j]
        # speed: bf16 chained
        o = decode_beam(params_bf16, config, bp, enc_d, newline, src_d)
        np.asarray(o['count'])
        e = enc_d
        for _ in range(2):
            o = decode_beam(params_bf16, config, bp, e, newline, src_d)
            e = e + (o['cum'][0, 0] * 0).astype(e.dtype)
        np.asarray(o['count'])
        t0 = time.perf_counter()
        e = enc_d
        reps = 5
        for _ in range(reps):
            o = decode_beam(params_bf16, config, bp, e, newline, src_d)
            e = e + (o['cum'][0, 0] * 0).astype(e.dtype)
        np.asarray(o['count'])
        lps = reps * B / (time.perf_counter() - t0)
        print('R=%3d K=%2d: ref-agree %d/%d, failures %d/%d, '
              '%.0f lines/s bf16' % (R, K, agree, n_ref, fails, B, lps),
              flush=True)


if __name__ == '__main__':
    main()
