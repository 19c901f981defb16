"""Classify the residual beam divergences on the reference-trained
artifact.

The reservoir-convergence record (tests/test_reference_artifact.py,
NOTES.md) shows byte-agreement with the reference's own
``decode_sequence_beam`` on its own trained w64 artifact rising
27/48 (R=32) -> 46/48 (R=256) and SATURATING (46/48 at R=512 and
R=1024, measured round 4) — the two residual lines are
bound-independent.  This tool classifies them the way
tools/beam_divergence.py classified the flagship's residual line:
exhaust the reference's final ranking per divergent line, locate each
side's 1-best in the other's ranking, and measure the prospective-cost
margins — margins at float-noise scale mean the two searches are
resolving a tie the reference's own scoring cannot separate.

Writes artifact_beam_divergence_report.json next to this file.

Usage: env -u PYTHONPATH JAX_PLATFORMS=cpu \
           python tools/artifact_beam_divergence.py
(the reference side runs under tf_keras on the host CPU)
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, 'testmodels', 'reference_trained.w64.h5')
GOLDENS = os.path.join(REPO, 'testmodels',
                       'reference_trained.goldens.json')
REPORT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'artifact_beam_divergence_report.json')


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, 'tools', name + '.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, 'tests'))
    import numpy as np
    import jax
    import jax.numpy as jnp
    from cor_asv_ann_tpu.utils import io_h5
    from cor_asv_ann_tpu.utils.data import vectorize_lines
    from cor_asv_ann_tpu.models.beam import BeamParams, decode_beam
    bd = _load_tool('beam_divergence')

    with open(GOLDENS) as f:
        gold = json.load(f)
    sources = gold['sources']
    ref_best_texts = gold['reference_beamed']
    config, mapping = io_h5.load_config(ARTIFACT)
    params = io_h5.load_weights(ARTIFACT, config)
    enc = vectorize_lines(mapping, list(sources), list(sources),
                          bucketed=False)[0]
    enc = np.asarray(enc, np.float32)
    src_len = np.sum(np.any(enc != 0, axis=2), axis=1).astype(np.int32)
    newline = mapping.get('\n')
    serving = gold['serving']

    # --- our beam at the saturated deep bounds --------------------------
    bp = BeamParams(reservoir=1024, expand=128,
                    rejection_threshold=serving['rejection_threshold'],
                    beam_width_in=serving['beam_width_in'],
                    beam_threshold_in=serving['beam_threshold_in'],
                    beam_width_out=serving['beam_width_out'])
    params_f32 = jax.tree_util.tree_map(jnp.asarray, params)
    out = {k: np.asarray(v) for k, v in decode_beam(
        params_f32, config, bp, jax.device_put(enc), newline,
        jax.device_put(src_len)).items()}

    divergent = [j for j in range(len(sources))
                 if bd.our_finals(out, mapping, j)
                 and bd.our_finals(out, mapping, j)[0]['text']
                 != ref_best_texts[j]]
    print('divergent at R=1024: %s' % divergent, flush=True)

    # --- reference finals on the divergent lines ------------------------
    import keras_ref
    assert keras_ref.available()
    s2s = keras_ref.reference_s2s(ARTIFACT, t_enc=enc.shape[1])
    for k, v in serving.items():
        setattr(s2s, k, v)
    s2s.batch_size = 256
    keras_ref.patch_beam_broadcast(s2s)

    report = []
    for j in divergent:
        rf = bd.ref_finals(s2s, enc[j], int(src_len[j]))
        of = bd.our_finals(out, mapping, j)
        r_rank, r_margin = bd.locate(rf, of[0]['text'])
        o_rank, o_margin = bd.locate(of, rf[0]['text'] if rf else None)
        rec = {
            'line': j,
            'source': sources[j],
            'ref_best': rf[0]['text'] if rf else None,
            'our_best': of[0]['text'],
            'ref_matches_goldens': bool(rf) and (rf[0]['text']
                                                 == ref_best_texts[j]),
            'our_best_in_ref_rank': r_rank,
            'our_best_ref_pro_margin': r_margin,
            'ref_best_in_ours_rank': o_rank,
            'ref_best_our_pro_margin': o_margin,
            'ref_finals_top': rf[:6],
            'our_finals_top': of[:6],
        }
        report.append(rec)
        print('line %d:' % j)
        print('  ref 1-best %r' % rec['ref_best'])
        print('  our 1-best %r' % rec['our_best'])
        print('  our best in ref ranking: rank %s margin %s'
              % (r_rank, r_margin))
        print('  ref best in our ranking: rank %s margin %s'
              % (o_rank, o_margin), flush=True)

    # --- float64 referee: does the reference's own 1-best survive f64? --
    if divergent:
        import tf_keras
        orig_arange = tf_keras.backend.arange

        def arange64(start, stop=None, step=1, dtype='int32'):
            if dtype == 'float32' and tf_keras.backend.floatx() == 'float64':
                dtype = 'float64'
            return orig_arange(start, stop, step, dtype)

        tf_keras.backend.arange = arange64
        tf_keras.backend.set_floatx('float64')
        try:
            s2s64 = keras_ref.reference_s2s(ARTIFACT, t_enc=enc.shape[1])
            for k, v in serving.items():
                setattr(s2s64, k, v)
            s2s64.batch_size = 256
            keras_ref.patch_beam_broadcast(s2s64)
            for rec in report:
                j = rec['line']
                rf64 = bd.ref_finals(s2s64, enc[j].astype(np.float64),
                                     int(src_len[j]))
                best64 = rf64[0]['text'] if rf64 else None
                rec['ref_f64_best'] = best64
                rec['ref_f64_flipped'] = best64 != rec['ref_best']
                print('line %d f64 referee: %s%s' % (
                    j, 'FLIPPED' if rec['ref_f64_flipped'] else 'unchanged',
                    ' (matches OURS)' if best64 == rec['our_best'] else ''),
                    flush=True)
        finally:
            tf_keras.backend.set_floatx('float32')
            tf_keras.backend.arange = orig_arange

    # --- chain-entry gate probe (rejection-eligibility tie detector) ----
    if divergent:
        out_tr = decode_beam(params_f32, config, bp, jax.device_put(enc),
                             newline, jax.device_put(src_len),
                             return_trace=True)
        tr = {k: np.asarray(v) for k, v in out_tr['trace'].items()}
        t_end = int(tr['t'])
        for rec in report:
            j, ref_best = rec['line'], rec['ref_best']
            rp, rc = tr['rec_parent'][j], tr['rec_char'][j]
            rexp, rmis = tr['rec_exp'][j], tr['rec_misal'][j]
            rok = tr['rec_rejok'][j]
            R = rc.shape[1]
            texts = [''] * R
            ev = {}
            for t in range(t_end):
                for k in range(rexp.shape[1]):
                    r = rexp[t, k]
                    if r >= 0 and ref_best.startswith(texts[r]):
                        ev.setdefault(texts[r], []).append(
                            (float(rmis[t, k]), bool(rok[t, k])))
                texts = [texts[rp[t, r]]
                         + (mapping.i2c[int(rc[t, r])] if rc[t, r] >= 0
                            else '') for r in range(R)]
            gate = bd.chain_entry_probe(config, mapping, params, enc[j],
                                        ev, ref_best)
            rec['chain_entry'] = gate
            if gate:
                print('line %d chain-entry gate: prefix %r margin %.2e '
                      'straddles=%s' % (j, gate['prefix'],
                                        gate['gate_margin'],
                                        gate['straddles']), flush=True)
            else:
                print('line %d chain-entry gate: no decisive '
                      'rejection-chain split found' % j, flush=True)

    with open(REPORT, 'w') as f:
        json.dump({'divergent': divergent, 'lines': report,
                   'bounds': {'reservoir': 1024, 'expand': 128},
                   'agreement': '%d/%d' % (len(sources) - len(divergent),
                                           len(sources))}, f, indent=1)
    print('wrote %s' % REPORT)


if __name__ == '__main__':
    main()
