"""Instrument flagship-scale beam divergences against the genuine reference.

The serving ablation (tools/beam_ablation.py, NOTES.md) measures 1-best
agreement with the reference's own ``decode_sequence_beam`` on 12 full-width
flagship lines.  This tool classifies every divergent line: **float tie**
(the two finals are within float noise of each other under the reference's
own prospective-cost ordering, and/or the reference's own 1-best flips when
re-run in float64) versus **semantics** (a final missing from the other
search's bank, or a materially large margin).

Method, per line:
  1. run the reference beam (tf_keras, float32) to exhaustion and
     reconstruct its full final ranking: the generator yields
     ``(text, probs, entropy, alignments)`` best-first by prospective cost
     (reference seq2seq.py:1538-1544); ``cum = entropy * len(text)`` and
     ``pro = cum + cost0 * |len(text)+1 - length0|`` with cost0=3.0 and
     length0 = attended_len (Node.pro_cost, seq2seq.py:1588-1595),
  2. run this framework's ``decode_beam`` at serving settings and read the
     banked finals (texts, cum, prospective cost),
  3. for a divergence, locate our 1-best inside the reference's final list
     (rank + pro margin vs the reference's 1-best, i.e. how much worse the
     reference itself scores our choice) and the reference's 1-best inside
     our bank (rank + margin under our scoring),
  4. re-run the reference under ``floatx=float64`` on the divergent lines
     (same weights, cast): if its 1-best changes, the line is a measured
     float tie in the reference itself,
  5. for lines still open, run the **chain-entry margin probe**: replay
     the NumPy oracle (reference semantics, host f32) with its debug
     hook and our device beam with return_trace, collect the
     rejection-mechanism internals (misalignment, eligibility) for every
     expanded node whose text is a prefix of the reference's 1-best, and
     locate the longest prefix where the oracle designates a rejection
     candidate but our search does not.  If the misalignment values
     there sit within MARGIN of the reference's hard ``misalignment <
     0.1`` gate (reference seq2seq.py:1457-1461) on either side, the
     divergence is a measured eligibility-bound tie: the reference's own
     sibling hypotheses straddle its own cutoff.

Writes a JSON report next to this file (beam_divergence_report.json) and a
human-readable summary to stdout.

Usage: python tools/beam_divergence.py [n_ref_lines]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAGSHIP = os.path.join(REPO, 'testmodels', 'flagship.d2.w512.synthetic.h5')
REPORT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      'beam_divergence_report.json')
COST0 = 3.0
# eligibility-bound tie window around the reference's misalignment<0.1
# rejection gate: a divergence whose gate-side misalignments sit this
# close to 0.1 is decided by float noise the reference itself exhibits
MARGIN = 0.02


def chain_entry_probe(config, mapping, params, enc_line, our_trace_events,
                      ref_best):
    """Locate the decisive rejection-eligibility gate for one line.

    our_trace_events: {prefix_text: [(misal, rej_ok), ...]} from the
    device beam's return_trace, restricted to prefixes of ref_best.
    Runs the NumPy oracle (reference semantics) with the same
    restriction and returns the longest ref-best prefix where the oracle
    has an eligible soft-alignment expansion (chain entry) but ours has
    none, with both sides' misalignment values there.
    """
    import jax
    import numpy as np
    from cor_asv_ann_tpu.lib import numpy_ref
    cfg = dict(depth=config.depth, width=config.width,
               mask_padding=config.mask_padding,
               window_width=config.window_width,
               residual_connections=config.residual_connections,
               deep_bidirectional_encoder=config.deep_bidirectional_encoder,
               bridge_dense=config.bridge_dense)
    np_params = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float32), params)
    oracle_events = {}

    def cb(info):
        tx = info['text']
        if ref_best.startswith(tx):
            oracle_events.setdefault(tx, []).append(
                (info['misalignment'], info['eligible'], info['was_rej']))

    next(numpy_ref.decode_sequence_beam(np_params, cfg, mapping, enc_line,
                                        debug_cb=cb), None)
    # longest prefix where the oracle enters a rejection chain through
    # the soft gate (eligible without a prior one-hot marker) but our
    # search never does
    best = None
    for tx, evs in oracle_events.items():
        o_soft = [m for m, e, w in evs if e and not w]
        if not o_soft:
            continue
        ours = our_trace_events.get(tx, [])
        if any(ok for _, ok in ours):
            continue
        if best is None or len(tx) > len(best[0]):
            best = (tx, o_soft, [m for m, _ in ours])
    if best is None:
        return None
    tx, o_soft, our_mis = best
    o_all = [m for m, _, _ in oracle_events[tx]]
    gate_margin = min([abs(m - 0.1) for m in o_soft + our_mis] or [1e9])
    return {'prefix': tx, 'prefix_len': len(tx),
            'oracle_misal_eligible': sorted(o_soft),
            'oracle_misal_all': sorted(o_all),
            'our_misal': sorted(our_mis),
            'gate_margin': gate_margin,
            'straddles': bool(o_soft and (max(o_all) >= 0.1
                                          or bool(our_mis)))}


def ref_finals(s2s, enc_line, length0):
    """Exhaust the reference beam generator; return ranked finals."""
    finals = []
    for txt, _probs, ent, _al in s2s.decode_sequence_beam(
            source_seq=enc_line):
        cum = float(ent) * len(txt)
        pro = cum + COST0 * abs(len(txt) + 1 - length0)
        finals.append({'text': txt, 'cum': cum, 'pro': pro})
    return finals


def our_finals(out, mapping, j):
    finals = []
    import numpy as np
    n = int(out['count'][j])
    for f in range(n):
        L = int(out['length'][j, f])
        txt = ''.join(mapping.i2c[int(i)] for i in out['idx'][j, f, :L])
        finals.append({'text': txt, 'cum': float(out['cum'][j, f]),
                       'pro': float(out['cost'][j, f])})
    return finals


def locate(finals, text):
    for rank, f in enumerate(finals):
        if f['text'] == text:
            return rank, f['pro'] - finals[0]['pro']
    return None, None


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
    enc = bench.make_flagship_lines(mapping, B, 80, pad)
    src_len = np.sum(np.any(enc != 0, axis=2), axis=1).astype(np.int32)
    assert (src_len == pad).all()
    newline = mapping.get('\n')

    # --- our beam, serving defaults, f32 (byte-stable serving mode) ----
    bp = BeamParams()
    params_f32 = jax.tree_util.tree_map(jnp.asarray, params)
    out = {k: np.asarray(v) for k, v in decode_beam(
        params_f32, config, bp, jax.device_put(enc), newline,
        jax.device_put(src_len)).items()}

    # --- reference beam, f32, full final ranking ------------------------
    import keras_ref
    assert keras_ref.available()

    def make_ref():
        s2s = keras_ref.reference_s2s(FLAGSHIP, t_enc=pad)
        s2s.rejection_threshold = 0.3
        s2s.beam_width_in = 15
        s2s.beam_threshold_in = 0.2
        s2s.beam_width_out = 16
        s2s.batch_size = 256
        return s2s

    s2s = make_ref()
    lines = []
    divergent = []
    for j in range(n_ref):
        rf = ref_finals(s2s, enc[j], pad)
        of = our_finals(out, mapping, j)
        agree = bool(rf and of and rf[0]['text'] == of[0]['text'])
        rec = {'line': j, 'agree': agree,
               'ref_best': rf[0]['text'] if rf else None,
               'our_best': of[0]['text'] if of else None,
               'ref_finals': rf[:8], 'our_finals': of[:8]}
        if not agree:
            # our 1-best under the reference's own ranking
            r_rank, r_margin = locate(rf, of[0]['text']) if of else (None,
                                                                     None)
            # the reference's 1-best under our ranking
            o_rank, o_margin = locate(of, rf[0]['text']) if rf else (None,
                                                                     None)
            rec.update(our_best_in_ref_rank=r_rank,
                       our_best_ref_pro_margin=r_margin,
                       ref_best_in_ours_rank=o_rank,
                       ref_best_our_pro_margin=o_margin)
            divergent.append(j)
        lines.append(rec)
        print('line %2d: %s' % (j, 'AGREE' if agree else 'DIVERGE'),
              flush=True)
        if not agree:
            print('  ref 1-best %r (cum %.6f pro %.6f)'
                  % (rec['ref_best'], rf[0]['cum'], rf[0]['pro']))
            print('  our 1-best %r (cum %.6f pro %.6f)'
                  % (rec['our_best'], of[0]['cum'], of[0]['pro']))
            print('  our 1-best in ref finals: rank %s, ref-pro margin %s'
                  % (rec['our_best_in_ref_rank'],
                     rec['our_best_ref_pro_margin']))
            print('  ref 1-best in our finals: rank %s, our-pro margin %s'
                  % (rec['ref_best_in_ours_rank'],
                     rec['ref_best_our_pro_margin']))

    # --- reservoir-capacity probe on the divergent lines ----------------
    # distinguishes bounded-reservoir loss (the ref's queue holds up to
    # 2T*256 nodes vs our R slots) from numeric/semantic divergence: if a
    # larger R recovers the reference's 1-best, the line is a capacity
    # effect, not a search-structure bug
    for R, K in ((256, 64), (1024, 128)):
        bigbp = BeamParams(reservoir=R, expand=K)
        bigout = {k: np.asarray(v) for k, v in decode_beam(
            params_f32, config, bigbp, jax.device_put(enc), newline,
            jax.device_put(src_len)).items()}
        for j in divergent:
            of = our_finals(bigout, mapping, j)
            rec = lines[j]
            rank, margin = locate(of, rec['ref_best'])
            rec.setdefault('capacity_probe', {})['R%d_K%d' % (R, K)] = {
                'our_best': of[0]['text'] if of else None,
                'agree': bool(of) and of[0]['text'] == rec['ref_best'],
                'ref_best_rank': rank, 'ref_best_margin': margin}
            print('line %2d R=%4d K=%3d: our 1-best %r; ref-best rank %s '
                  'margin %s' % (j, R, K, of[0]['text'] if of else None,
                                 rank, margin), flush=True)

    # --- float64 referee on the divergent lines -------------------------
    f64 = {}
    if divergent:
        import tf_keras
        # the reference cell hardcodes dtype='float32' in its window
        # arange (attention.py:552/561, written when floatx was always
        # f32); under floatx=float64 route it to floatx so prev_a @ steps
        # type-checks — values are exact small integers either way
        orig_arange = tf_keras.backend.arange

        def arange64(start, stop=None, step=1, dtype='int32'):
            if dtype == 'float32' and tf_keras.backend.floatx() == 'float64':
                dtype = 'float64'
            return orig_arange(start, stop, step, dtype)

        tf_keras.backend.arange = arange64
        tf_keras.backend.set_floatx('float64')
        try:
            s2s64 = make_ref()
            for j in divergent:
                rf64 = ref_finals(s2s64, enc[j].astype(np.float64), pad)
                f64[j] = rf64[:8]
                ref32 = lines[j]['ref_best']
                ours = lines[j]['our_best']
                best64 = rf64[0]['text'] if rf64 else None
                flip = best64 != ref32
                print('line %2d f64 referee: 1-best %s (%s)'
                      % (j,
                         'FLIPPED' if flip else 'unchanged',
                         'matches OURS' if best64 == ours else
                         'matches ref-f32' if not flip else 'third text'),
                      flush=True)
        finally:
            tf_keras.backend.set_floatx('float32')
            tf_keras.backend.arange = orig_arange

    # --- classify --------------------------------------------------------
    open_lines = []
    for rec in lines:
        if rec['agree']:
            continue
        j = rec['line']
        rf64 = f64.get(j)
        best64 = rf64[0]['text'] if rf64 else None
        margin = rec.get('our_best_ref_pro_margin')
        probe = rec.get('capacity_probe', {})
        recovered = [k for k, v in probe.items() if v['agree']]
        if best64 is not None and best64 != rec['ref_best']:
            rec['class'] = ('float-tie (reference flips under f64 to %s)'
                            % ('OURS' if best64 == rec['our_best']
                               else 'a third text'))
        elif recovered:
            rec['class'] = ('bounded-reservoir (recovered at %s; the '
                            'reference queue holds up to 2T*256 nodes)'
                            % recovered[0])
        elif margin is not None and margin < 1e-2:
            rec['class'] = ('float-tie (ref-pro margin %.2e at the '
                            'decisive ranking)' % margin)
        else:
            open_lines.append(rec)
        rec['ref_f64_best'] = best64
        rec['ref_f64_finals'] = rf64

    # --- chain-entry margin probe on still-open lines --------------------
    if open_lines:
        out_tr = decode_beam(params_f32, config, bp, jax.device_put(enc),
                             newline, jax.device_put(src_len),
                             return_trace=True)
        tr = {k: np.asarray(v) for k, v in out_tr['trace'].items()}
        t_end = int(tr['t'])
        for rec in open_lines:
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
            gate = chain_entry_probe(config, mapping, params, enc[j], ev,
                                     ref_best)
            rec['chain_entry'] = gate
            margin = rec.get('our_best_ref_pro_margin')
            if gate and gate['gate_margin'] < MARGIN:
                rec['class'] = (
                    'eligibility-bound tie: at prefix len %d the decisive '
                    'rejection gate (misalignment < 0.1, reference '
                    'seq2seq.py:1457-1461) is crossed both ways by the '
                    "reference's own sibling hypotheses (eligible %s, all "
                    '%s) while ours land at %s — min gate margin %.2e'
                    % (gate['prefix_len'],
                       ['%.4f' % m for m in gate['oracle_misal_eligible']],
                       ['%.4f' % m for m in gate['oracle_misal_all'][:6]],
                       ['%.4f' % m for m in gate['our_misal'][:6]],
                       gate['gate_margin']))
            elif margin is None:
                rec['class'] = 'OPEN: our 1-best absent from reference finals'
            else:
                rec['class'] = ('OPEN: margin %.4f — needs step-level look'
                                % margin)
    for rec in lines:
        if not rec['agree']:
            print('line %2d class: %s' % (rec['line'], rec['class']))

    agree_n = sum(r['agree'] for r in lines)
    summary = {'settings': {'rejection': 0.3, 'width_in': 15,
                            'threshold_in': 0.2, 'width_out': 16,
                            'reservoir': bp.reservoir, 'expand': bp.expand,
                            'pad': pad, 'cost0': COST0},
               'agree': agree_n, 'n': n_ref, 'lines': lines}
    with open(REPORT, 'w') as f:
        json.dump(summary, f, indent=1, ensure_ascii=False)
    print('agreement %d/%d; report -> %s' % (agree_n, n_ref, REPORT))


if __name__ == '__main__':
    main()
