"""Fully on-device A*-like beam search with rejection thresholding.

Re-architecture of the reference beam decoder
(lib/seq2seq.py:1356-1544 `decode_sequence_beam`, `Node` trie :1546-1608)
for TPU static shapes. The reference keeps an *unbounded best-first queue*
of hypothesis nodes and expands up to batch_size of them per iteration;
unexpanded nodes persist and can win later (A*). Here each line carries a
fixed **reservoir** of R node slots ordered by prospective cost; every
iteration the best K unexpanded nodes are stepped through the decoder
(lines-parallel and hypotheses-parallel), their K*C candidate children are
merged back into the reservoir (keep best R), and finished hypotheses go
to a bank of F solutions. All of it runs inside one `lax.while_loop`.

TPU-first optimization: the local monotonic attention window (±5 around
the expected source position, attention.py:544-569) makes every attention
state sparse — at most 11 positions are visible. The beam therefore
carries only the *windowed* alignment (WIN values + window start) per
node, and each step gathers just the WIN relevant rows of the encoder
output/projection instead of broadcasting the full (T, A) attended
sequence per hypothesis. This is mathematically identical to the full
computation (everything outside the window is masked to zero anyway).

Semantics carried over from the reference:
- candidate admission per node: top `beam_width_in` by probability, cut at
  the relative threshold `highest * beam_threshold_in`
  (seq2seq.py:1472-1480); index 0 (underspecification) excluded,
- **rejection**: the input character at the currently aligned source
  position is boosted to `rejection_threshold` probability and guaranteed
  admission, when the hypothesis is still aligned (misalignment < 0.1) or
  the previous choice was a rejection; a rejection choice gets a one-hot
  alignment marker (seq2seq.py:1441-1496),
- decoder feedback for a candidate ranked r is the full (boosted) score
  vector with the r better-ranked maxima zeroed (seq2seq.py:1515-1520),
- node ordering by prospective cost cum + cost0*|length - len0| with
  cost0 = 3 (Node.pro_cost, seq2seq.py:1588-1595),
- termination after 2*len0 iterations, or early once strictly more than
  beam_width_out solutions exist and the best of them strictly beats the
  best queued node's prospective cost (seq2seq.py:1417-1419) — the bank
  internally holds beam_width_out+1 slots for exactly this test.

Deviations (documented):
- the queue is bounded by R per line (the reference prunes to
  max_batches*batch_size nodes globally, seq2seq.py:1530-1532),
- `len0` is passed by the caller (the reference uses the batch-padded
  length; models/api.py passes the true per-line source length),
- per-step soft alignments are recorded as windowed rows (WIN floats +
  a start offset) rather than dense length-T vectors; outside the
  attention window the reference's scores are exactly zero, so the
  host-side expansion (models/api.py) is lossless,
- finals popped past the bank's F best are dropped rather than kept in
  an unbounded final_beam (the reference can yield arbitrarily many
  solutions; callers only ever consume the best few).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .config import Seq2SeqConfig
from . import seq2seq
from .seq2seq import encode
from ..ops.lstm import mm

INF = jnp.inf


@dataclasses.dataclass(frozen=True)
class BeamParams:
    reservoir: int = 64        # queued node slots R per line
    # nodes expanded per iteration K: 48 per the serving ablation
    # (tools/beam_ablation.py — best reference agreement, no empty-bank
    # failures, fastest; see NOTES.md)
    expand: int = 48
    beam_width_in: int = 15    # max candidates admitted per node C
    beam_threshold_in: float = 0.2  # relative admission threshold
    beam_width_out: int = 16   # finished-hypothesis bank size F
    rejection_threshold: float = 0.3
    cost0: float = 3.0         # per-char cost for the length prior
    # rate hypotheses by an unconditioned LM readout (same weights, zero
    # attention context) while decoder scores control beam entry
    # (reference lm_predict, seq2seq.py:144-149, 1431-1434, 1488-1490)
    lm_predict: bool = False


def _gather_rows(x, ix):
    """x (B, T, D), ix (B, K, WIN) -> (B, K, WIN, D).

    For short attended lengths (T <= 128) the selection runs as a
    one-hot matmul on the MXU (XLA row gathers are far slower per byte;
    measured 1.2x on whole-beam decode at T=64); the matmul reads all T
    rows though, so genuine row gathers take over from T=129 up, where
    reading only the WIN visible rows is the point (this is also the
    regime of decode_greedy_windowed). precision=HIGHEST is required
    for bit-exactness: at default precision the MXU rounds the f32
    operands to bf16 in the multiply, corrupting every selected row by
    ~2^-8 relative — enough, compounded over a line, to drift the
    beam's states macroscopically off the greedy trunk (measured: the
    round-2 flagship 8/12 divergence was exactly this). HIGHEST is
    measured speed-neutral for these shapes (one operand is one-hot)."""
    B, T = x.shape[0], x.shape[1]
    if T <= 128:
        oh = jax.nn.one_hot(ix, T, dtype=x.dtype)    # (B, K, WIN, T)
        out = jnp.einsum('bkwt,btd->bkwd', oh, x,
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return out.astype(x.dtype)
    return x[jnp.arange(B)[:, None, None], ix]


def _sel_rows(ix, src, n):
    """Select rows src[b, ix[b, k]] -> (B, K, D) as a one-hot matmul.

    XLA's row gather runs far slower per byte than streaming reads on
    TPU; a (B, K, n) one-hot times (B, n, D) batched matmul streams both
    operands through the MXU instead. Bit-exact ONLY at
    precision=HIGHEST: exactly one unit term contributes to each output
    row, but at default precision the MXU rounds the f32 source operand
    to bf16 in the multiply (measured 3.9e-3 relative), which corrupted
    every reservoir merge per iteration and drifted hypothesis states
    off the greedy trunk (the round-2 8/12 flagship beam divergence).
    HIGHEST restores exact selection at no measured cost (0.75ms vs
    0.73ms at B=256, R+K=112, D=1024; take_along_axis: 1.18ms)."""
    oh = jax.nn.one_hot(ix, n, dtype=src.dtype)
    out = jnp.einsum('bks,bsd->bkd', oh, src,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.astype(src.dtype)


def beam_decoder_step(params, config, feedback, layer_states, aw, astart,
                      attended, u, with_lm=False, src_lengths=None):
    """One decoder step over (B, K) hypotheses with windowed attention.

    feedback (B,K,V); layer_states: tuple of (h, c) each (B,K,W);
    aw (B,K,WIN) windowed previous alignment with window starts astart
    (B,K). attended (B,T,A) and u (B,T,W) are shared per line.
    Returns (probs (B,K,V), new_layer_states, new_aw, new_astart,
    expected_pos (B,K)); with `with_lm` an unconditioned LM readout over
    the same input states (zero attention context, discarded LM states —
    reference decoder_model lm branch, seq2seq.py:464-469) is appended:
    (..., lm_probs (B,K,V)).
    """
    depth = config.depth
    W = config.width
    ww = config.window_width
    B, K, V = feedback.shape
    T = attended.shape[1]
    WIN = aw.shape[-1]
    step = seq2seq.decode_step_fn(config)
    out, new_states = seq2seq.decoder_lower_stack(params, config, feedback,
                                                  layer_states, step)
    top = params['decoder'][depth - 1]
    h_prev, c_prev = layer_states[depth - 1]
    # expected previous source position t0 = prev_a . arange + 1
    offs = jnp.arange(WIN, dtype=aw.dtype)
    t0 = jnp.sum(aw * (astart[..., None] + offs), axis=-1) + 1.0   # (B,K)
    # new window around t0
    new_start = jnp.clip(jnp.floor(t0).astype(jnp.int32) - ww, 0,
                         max(T - WIN, 0))
    win_ix = new_start[..., None] + jnp.arange(WIN)                # B,K,WIN
    win_ix = jnp.minimum(win_ix, T - 1)
    u_w = _gather_rows(u, win_ix)                                  # B,K,WIN,W
    att_w = _gather_rows(attended, win_ix)                         # B,K,WIN,A
    w_vec = mm(h_prev, top['W_a']) + top['b_UW']
    s_en = (mm(jnp.tanh(w_vec[:, :, None, :] + u_w),
               top['v_a'])[..., 0]
            + top['b_v'])                                          # B,K,WIN
    visible = jnp.abs(t0[..., None] - win_ix.astype(t0.dtype)) <= ww
    if src_lengths is not None:
        visible = visible & (win_ix < src_lengths[:, None, None])
    # stable softmax over the window (see ops/attention.py)
    s_en = jnp.where(visible, s_en, -1e30)
    a_w = jax.nn.softmax(s_en, axis=-1)
    a_w = a_w * jnp.any(visible, axis=-1, keepdims=True)
    # HIGHEST: exact multiplies, like the greedy paths' elementwise
    # context sums (attention.py finish/shared) — keeps the beam's
    # per-step float behavior aligned with the greedy trunk
    ctx = jnp.einsum('bkn,bkna->bka', a_w, att_w,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    probs, hc = seq2seq.decoder_top_cell(params, config, out, ctx, h_prev,
                                         c_prev, step)
    new_states.append(hc)
    exp_pos = jnp.sum(a_w * win_ix.astype(a_w.dtype), axis=-1)
    if not with_lm:
        return probs, tuple(new_states), a_w, new_start, exp_pos
    # LM readout: same layers/input states, zero attention context
    # (states discarded — reference decoder_model lm branch)
    lm_out, _ = seq2seq.decoder_lower_stack(params, config, feedback,
                                            layer_states, step)
    lm_probs, _ = seq2seq.decoder_top_cell(params, config, lm_out,
                                           jnp.zeros_like(ctx), h_prev,
                                           c_prev, step)
    return probs, tuple(new_states), a_w, new_start, exp_pos, lm_probs


@functools.partial(jax.jit, static_argnames=('config', 'bp', 'max_steps',
                                             'return_alignments',
                                             'return_trace'))
def decode_beam(params, config: Seq2SeqConfig, bp: BeamParams, enc_input,
                newline_idx, src_len, max_steps=None,
                return_alignments=False, return_trace=False):
    """Beam-decode a batch of lines entirely on device.

    enc_input: (B, T, V) source vectors; src_len: (B,) per-line source
    lengths used for the length prior (len0). Returns a dict with the
    finished bank, best-first: 'idx' (B,F,S), 'prob' (B,F,S), 'length'
    (B,F), 'cost' (B,F) prospective cost, 'cum' (B,F) cumulative -log p,
    'count' (B,), and per-step alignment centers 'align_pos' (B,F,S).

    With `return_alignments`, also 'align_row' (B,F,S,WIN) windowed soft
    alignment rows and 'align_start' (B,F,S) their window offsets — the
    full per-step bookkeeping alignments (one-hot for rejection steps,
    the raw soft attention row otherwise, reference
    seq2seq.py:1495/1510), for soft-score Viterbi re-alignment
    (transcode.py:279-349) and repl plots.
    """
    from .seq2seq import ensure_onehot
    enc_input = ensure_onehot(enc_input, config, params)
    B, T, V = enc_input.shape
    # expand cannot exceed the reservoir (top-K is taken over R slots);
    # guards e.g. BeamParams(reservoir=32) with the default expand=48
    R = bp.reservoir
    K = min(bp.expand, R)
    # internal bank holds one slot more than beam_width_out: the
    # reference's early stop requires *more than* beam_width_out finished
    # solutions (seq2seq.py:1417 `len(final_beam) > self.beam_width_out`)
    F = bp.beam_width_out + 1
    C = min(bp.beam_width_in, V)  # cannot admit more than the vocab
    S = max_steps or 2 * T
    WIN = min(2 * config.window_width + 2, T)
    attended, states, u = encode(params, config, enc_input)
    lengths = (jnp.sum(jnp.any(enc_input != 0, axis=2), axis=1)
               if config.mask_padding else None)

    src_any = jnp.any(enc_input != 0, axis=2)                     # (B, T)
    src_top = jnp.argmax(enc_input, axis=2).astype(jnp.int32)     # (B, T)
    # costs/length prior accumulate in f32 even in bf16 compute:
    # bf16's 8-bit mantissa is too coarse for ordering summed -log p
    len0 = src_len.astype(jnp.float32)                             # (B,)
    line_live = jnp.any(enc_input.reshape(B, -1) != 0, axis=1)

    def tile_r(x):  # (B, ...) -> (B, R, ...)
        return jnp.broadcast_to(x[:, None], (B, R) + x.shape[1:])

    # reservoir; slot 0 is the root node, others dead (pro = INF)
    root = jnp.arange(R) == 0
    state0 = dict(
        t=jnp.array(0, jnp.int32),
        h=tuple((tile_r(h), tile_r(c)) for h, c in states),
        aw=jnp.zeros((B, R, WIN), attended.dtype),
        astart=jnp.zeros((B, R), jnp.int32),
        # rejection bookkeeping, separate from the attention state: the
        # reference stores the one-hot marker in the NODE's alignment
        # attribute only, while the decoder state keeps the raw soft
        # alignment (seq2seq.py:1510-1521 `state=states` vs
        # `alignment=alignment1`) — so the attention keeps windowing on
        # the soft distribution even through rejection chains.
        # book_pos = expected source position of the bookkeeping
        # alignment (src_pos for rejection nodes, soft expectation
        # otherwise); book_max1 = max(bookkeeping alignment) == 1.0,
        # the reference's rejection-chain marker (true for one-hot
        # marker rows AND for genuinely saturated soft alignments)
        book_pos=jnp.zeros((B, R), jnp.float32),
        book_max1=jnp.zeros((B, R), bool),
        feedback=jnp.zeros((B, R, V), attended.dtype),
        cum=jnp.where(root, 0.0, INF).astype(jnp.float32)
            * jnp.ones((B, 1)),
        pro=(jnp.where(root, 0.0, INF)[None]
             + bp.cost0 * jnp.abs(1.0 - len0[:, None])
             ).astype(jnp.float32),
        nchars=jnp.zeros((B, R), jnp.int32),
        # finished (newline-terminated) hypotheses stay in the reservoir
        # and compete by prospective cost like everything else; they move
        # to the bank exactly when they would pop in the reference's
        # best-first skim — when they outrank the K-th active of an
        # iteration (seq2seq.py:1400-1415). A poor final that never
        # bubbles up is never counted by the early-stop rule.
        is_fin=jnp.zeros((B, R), bool),
        # backpointer trie: hypothesis texts are NOT carried per slot
        # (that would re-gather (B,R,S) buffers every iteration); instead
        # each iteration records, per post-merge slot, its parent slot in
        # the previous iteration's numbering and the char it appended
        # (-1 for carried-over unexpanded slots). Final texts are rebuilt
        # by one reverse scan after the loop (standard beam backtrace).
        rec_char=jnp.full((B, S, R), -1, jnp.int32),
        rec_p=jnp.zeros((B, S, R), attended.dtype),
        rec_ap=jnp.zeros((B, S, R), jnp.int32),
        rec_parent=jnp.zeros((B, S, R), jnp.int32),
        # full windowed soft alignment rows, only when requested (the
        # (B,S,R,WIN) buffer is the largest in the loop)
        rec_arow=(jnp.zeros((B, S, R, WIN), attended.dtype)
                  if return_alignments
                  else jnp.zeros((0,), attended.dtype)),
        rec_astart=(jnp.zeros((B, S, R), jnp.int32)
                    if return_alignments
                    else jnp.zeros((0,), jnp.int32)),
        # candidate-level debug records, allocated only under
        # return_trace (tools/beam_divergence.py instrumentation)
        rec_exp=(jnp.full((B, S, K), -1, jnp.int32) if return_trace
                 else jnp.zeros((0,), jnp.int32)),
        rec_cidx=(jnp.full((B, S, K, C + 1), -1, jnp.int32)
                  if return_trace else jnp.zeros((0,), jnp.int32)),
        rec_cp=(jnp.zeros((B, S, K, C + 1), jnp.float32)
                if return_trace else jnp.zeros((0,), jnp.float32)),
        rec_cvalid=(jnp.zeros((B, S, K, C + 1), bool)
                    if return_trace else jnp.zeros((0,), bool)),
        rec_misal=(jnp.zeros((B, S, K), jnp.float32) if return_trace
                   else jnp.zeros((0,), jnp.float32)),
        rec_srcpos=(jnp.full((B, S, K), -1, jnp.int32) if return_trace
                    else jnp.zeros((0,), jnp.int32)),
        rec_rejok=(jnp.zeros((B, S, K), bool) if return_trace
                   else jnp.zeros((0,), bool)),
        rec_rejp=(jnp.zeros((B, S, K), jnp.float32) if return_trace
                  else jnp.zeros((0,), jnp.float32)),
        bank_cost=jnp.full((B, F), INF, jnp.float32),
        bank_cum=jnp.full((B, F), INF, jnp.float32),
        bank_len=jnp.zeros((B, F), jnp.int32),
        bank_t=jnp.zeros((B, F), jnp.int32),
        bank_parent=jnp.zeros((B, F), jnp.int32),
        done=~line_live,
    )

    def ta(x, ix):
        """take_along_axis on axis 1 with trailing broadcast dims."""
        return jnp.take_along_axis(
            x, ix.reshape(ix.shape + (1,) * (x.ndim - 2)), axis=1)

    def body(s):
        t = s['t']
        # --- pick the K best ACTIVE nodes per line for expansion ------
        # (the reference pops best-first, skimming '\n' nodes into
        # final_beam along the way, until the fringe holds batch_size
        # actives, seq2seq.py:1400-1415 — so finals never consume
        # expansion slots, and exactly the finals that outrank the K-th
        # active pop before the fringe fills)
        active_pro = jnp.where(s['is_fin'], INF, s['pro'])
        neg, exp_ix = jax.lax.top_k(-active_pro, K)       # (B, K)
        exp_pro = -neg
        exp_ok = jnp.isfinite(exp_pro) & ~s['done'][:, None]

        def g(x):  # wide float rows: select on the MXU (see _sel_rows)
            return _sel_rows(exp_ix, x, R)

        e_cum = jnp.take_along_axis(s['cum'], exp_ix, axis=1)
        e_nchars = jnp.take_along_axis(s['nchars'], exp_ix, axis=1)

        # --- bank queued finals that pop before the fringe fills ------
        # a final pops iff it ranks better than the K-th active; when the
        # queue holds fewer than K actives the reference drains it
        # completely, banking every final
        kth = jnp.where(jnp.all(jnp.isfinite(exp_pro), axis=1),
                        exp_pro[:, -1], INF)              # (B,)
        fin_bank = (s['is_fin'] & jnp.isfinite(s['pro'])
                    & (s['pro'] < kth[:, None]) & ~s['done'][:, None])
        fin_cost = jnp.where(fin_bank, s['pro'], INF)     # (B, R)
        all_fin = jnp.concatenate([s['bank_cost'], fin_cost], axis=1)
        neg3, bsel = jax.lax.top_k(-all_fin, F)
        nb_cost = -neg3
        b_old = bsel < F
        b_oix = jnp.minimum(bsel, F - 1)
        bk = jnp.maximum(bsel - F, 0)                     # (B, F) into R

        def bfield(old, new_r):
            return jnp.where(b_old,
                             jnp.take_along_axis(old, b_oix, axis=1),
                             jnp.take_along_axis(new_r, bk, axis=1))

        new_bank = dict(
            bank_cost=nb_cost,
            bank_cum=bfield(s['bank_cum'], s['cum']),
            bank_len=bfield(s['bank_len'], s['nchars']),
            # the banked node's text is its trie chain up to iteration t:
            # start the backtrace at its start-of-t slot index
            bank_t=bfield(s['bank_t'], jnp.broadcast_to(t, (B, R))),
            bank_parent=bfield(s['bank_parent'],
                               jnp.broadcast_to(jnp.arange(R), (B, R))),
        )

        # --- reference early stop (seq2seq.py:1417-1419): strictly more
        # --- than beam_width_out finals found AND the best final strictly
        # --- beats the best active selected this iteration --------------
        bank_full = jnp.isfinite(nb_cost[:, -1])
        best_active = jnp.where(exp_ok[:, 0], exp_pro[:, 0], INF)
        stop = bank_full & (nb_cost[:, 0] < best_active)
        e_aw = g(s['aw'])
        e_astart = jnp.take_along_axis(s['astart'], exp_ix, axis=1)
        e_bpos = jnp.take_along_axis(s['book_pos'], exp_ix, axis=1)
        e_wasrej = jnp.take_along_axis(s['book_max1'], exp_ix, axis=1)
        e_feedback = g(s['feedback'])
        e_h = tuple((g(h), g(c)) for h, c in s['h'])

        # --- decoder step for the expansion set -----------------------
        step_out = beam_decoder_step(
            params, config, e_feedback, list(e_h), e_aw, e_astart,
            attended, u, with_lm=bp.lm_predict, src_lengths=lengths)
        probs, n_h, a_w, a_start, new_exp = step_out[:5]
        lm_probs = step_out[5] if bp.lm_predict else None

        # --- rejection candidate (seq2seq.py:1441-1470) ---------------
        # prev position comes from the BOOKKEEPING alignment (src_pos
        # for rejection nodes, the soft expectation otherwise), while
        # new_exp is this step's soft expectation — exactly the
        # reference's prev_source_pos/source_pos pair
        prev_exp = e_bpos
        first = e_nchars == 0
        misal = jnp.where(first, 0.0, jnp.abs(new_exp - prev_exp - 1.0))
        src_pos = jnp.where(
            first, 0,
            jnp.where(e_wasrej,
                      prev_exp.astype(jnp.int32) + 1,
                      jnp.round(new_exp).astype(jnp.int32)))
        src_pos = jnp.clip(src_pos, 0, T - 1)
        rej_ok = ((bp.rejection_threshold > 0)
                  & ((misal < 0.1) | e_wasrej | first)
                  & jnp.take_along_axis(src_any, src_pos, axis=1))
        rej_idx = jnp.take_along_axis(src_top, src_pos, axis=1)
        # an unmapped source char is index 0 (underspecification), which
        # the reference never admits as a candidate — not even via the
        # rejection path (seq2seq.py:1504-1506 `value == '': continue`)
        rej_ok = rej_ok & (rej_idx != 0)
        rej_oh = jax.nn.one_hot(rej_idx, V, dtype=probs.dtype)
        # candidate SCORING runs in f32 even under bf16 compute: the
        # rejection boost clamps candidates to exactly the threshold,
        # and a bf16 clamp value (bf16(0.3)=0.30078125) would drift a
        # clamped chain's cost by n*0.0026 vs the f32 serving path —
        # the measured source of the bf16-vs-f32-golden beam diffs at
        # rejection >= 0.3 (NOTES.md). With thresholds, ordering, and
        # admission in f32, the tie structure matches f32 serving; only
        # the model's own bf16 rounding noise remains (which greedy and
        # the r=0 beam are measured byte-stable under). In f32 compute
        # this is the identical arithmetic as before.
        probs_f = probs.astype(jnp.float32)
        rej_p = jnp.sum(probs_f * rej_oh.astype(jnp.float32), axis=-1)
        boost = rej_ok & (rej_p < bp.rejection_threshold)
        clamp = (rej_oh > 0) & boost[..., None]
        probs_adj = jnp.where(clamp, bp.rejection_threshold, probs_f)
        # feedback copy stays in the model dtype (it re-enters the
        # decoder step like the reference's score vector)
        probs_adj_fb = jnp.where(
            clamp, jnp.asarray(bp.rejection_threshold, probs.dtype), probs)

        # --- candidate admission --------------------------------------
        # top-C by (boosted) probability plus one dedicated slot for the
        # rejection candidate: the reference admits it *in addition* to
        # every threshold-admitted candidate, scanning past the cutoff
        # until it is found (seq2seq.py:1480-1501).
        # The underspecification char (index 0) stays IN the ranking: the
        # reference scans it, counts it against the beam width, lets it
        # define `highest`, and only then skips it via `value == '':
        # continue` (seq2seq.py:1480-1506) — so it consumes an admission
        # slot without ever being enqueued (or zeroed in the feedback)
        cand_p, cand_idx = jax.lax.top_k(probs_adj, C)   # (B, K, C)
        valid = ((cand_p >= cand_p[..., :1] * bp.beam_threshold_in)
                 & (cand_idx != 0))
        in_top = jnp.any((cand_idx == rej_idx[..., None]) & valid,
                         axis=-1)
        rej_slot_ok = rej_ok & ~in_top
        cand_idx = jnp.concatenate(
            [cand_idx, rej_idx[..., None]], axis=-1)     # (B, K, C+1)
        cand_p = jnp.concatenate(
            [cand_p, jnp.maximum(rej_p, bp.rejection_threshold)[..., None]],
            axis=-1)
        valid = jnp.concatenate(
            [valid, rej_slot_ok[..., None]], axis=-1)
        # admitted rejection candidates inside the top-C also bypass the
        # relative threshold
        is_rej = rej_ok[..., None] & (cand_idx == rej_idx[..., None])
        valid = valid | is_rej
        # avoid enqueueing the rejection twice (top-C copy wins)
        valid = valid.at[..., C].set(valid[..., C] & ~in_top)

        if bp.lm_predict:
            # LM probability rates the hypothesis globally; decoder
            # scores still control beam entry (seq2seq.py:1488-1490)
            rate_p = jnp.take_along_axis(lm_probs, cand_idx, axis=-1)
        else:
            rate_p = cand_p
        cand_cost = -jnp.log(
            jnp.maximum(rate_p.astype(jnp.float32), 1e-30))
        c_cum = e_cum[..., None] + cand_cost
        c_nchars = (e_nchars + 1)[..., None]                      # (B,K,1)
        c_pro = c_cum + bp.cost0 * jnp.abs(
            (c_nchars + 1).astype(len0.dtype) - len0[:, None, None])
        ok = valid & exp_ok[..., None] & jnp.isfinite(c_cum)
        c_pro = jnp.where(ok, c_pro, INF)
        # newline candidates enter the reservoir like all others (flagged
        # final); they reach the bank only via a later top-K selection
        c_fin = (cand_idx == newline_idx) & ok

        # per-candidate alignment center (rejection -> one-hot marker)
        c_center = jnp.broadcast_to(
            jnp.clip(jnp.round(new_exp).astype(jnp.int32), 0, T - 1
                     )[..., None], cand_idx.shape)
        c_center = jnp.where(is_rej, src_pos[..., None], c_center)

        # --- merge candidates into the reservoir ----------------------
        # every popped node leaves the queue: actives by expansion,
        # finals by banking
        res_pro = s['pro'].at[jnp.arange(B)[:, None], exp_ix].set(
            jnp.where(exp_ok, INF,
                      jnp.take_along_axis(s['pro'], exp_ix, axis=1)))
        res_pro = jnp.where(fin_bank, INF, res_pro)
        CC = C + 1
        all_pro = jnp.concatenate(
            [res_pro, c_pro.reshape(B, K * CC)], axis=1)  # (B, R+K*CC)
        neg2, sel = jax.lax.top_k(-all_pro, R)
        new_pro = -neg2
        is_old = sel < R
        old_ix = jnp.minimum(sel, R - 1)
        j = jnp.maximum(sel - R, 0)
        par_k = j // CC
        rank = j % CC

        cand_of = lambda x: jnp.take_along_axis(      # (B,K,CC)->(B,R)
            x.reshape(B, K * CC), j, axis=1)
        new_cum = jnp.where(is_old,
                            jnp.take_along_axis(s['cum'], old_ix, axis=1),
                            cand_of(c_cum))
        new_cum = jnp.where(jnp.isfinite(new_pro), new_cum, INF)
        new_nchars = jnp.where(
            is_old, jnp.take_along_axis(s['nchars'], old_ix, axis=1),
            cand_of(jnp.broadcast_to(c_nchars, cand_idx.shape)))

        # reservoir merge for wide float state: select from the stacked
        # (B, R+K, D) sources with one one-hot matmul per tensor
        merge_ix = jnp.where(is_old, old_ix, R + par_k)       # (B, R)

        def merge(old, new_k):
            src = jnp.concatenate([old, new_k], axis=1)       # (B, R+K, D)
            return _sel_rows(merge_ix, src, R + K)

        # attention state: ALWAYS the raw soft alignment rows — the
        # reference feeds the soft state back through rejections too
        # (the one-hot marker lives only in the node's bookkeeping
        # alignment, seq2seq.py:1510-1521)
        sel_isrej = cand_of(is_rej)
        sel_srcpos = cand_of(
            jnp.broadcast_to(src_pos[..., None], cand_idx.shape))
        new_aw = merge(s['aw'], a_w)
        new_astart = jnp.where(is_old,
                               jnp.take_along_axis(
                                   s['astart'], old_ix, axis=1),
                               jnp.take_along_axis(a_start, par_k, axis=1))
        # bookkeeping: rejection candidates record the one-hot position
        # (marker), normal candidates the step's soft expectation and
        # whether the soft row saturated to exactly 1.0
        step_max1 = jnp.max(a_w, axis=-1) == 1.0               # (B, K)
        new_bpos = jnp.where(
            is_old, jnp.take_along_axis(s['book_pos'], old_ix, axis=1),
            jnp.where(sel_isrej, sel_srcpos.astype(jnp.float32),
                      jnp.take_along_axis(new_exp.astype(jnp.float32),
                                          par_k, axis=1)))
        new_bmax1 = jnp.where(
            is_old, jnp.take_along_axis(s['book_max1'], old_ix, axis=1),
            sel_isrej | jnp.take_along_axis(step_max1, par_k, axis=1))
        new_h = tuple((merge(s['h'][l][0], n_h[l][0]),
                       merge(s['h'][l][1], n_h[l][1]))
                      for l in range(len(n_h)))
        # trie records for this iteration's post-merge slots: parent in
        # previous-iteration numbering; char/p/center only for new nodes
        par_slot = jnp.take_along_axis(exp_ix, par_k, axis=1)   # (B, R)
        rec_parent = s['rec_parent'].at[:, t, :].set(
            jnp.where(is_old, old_ix, par_slot))
        rec_char = s['rec_char'].at[:, t, :].set(
            jnp.where(is_old, -1, cand_of(cand_idx)))
        rec_p = s['rec_p'].at[:, t, :].set(
            jnp.where(is_old, 0, cand_of(cand_p)).astype(s['rec_p'].dtype))
        rec_ap = s['rec_ap'].at[:, t, :].set(
            jnp.where(is_old, 0, cand_of(c_center)))
        rec_arow, rec_astart = s['rec_arow'], s['rec_astart']
        if return_alignments:
            # bookkeeping alignment row per new node: one-hot at
            # src_pos for rejection candidates (window start =
            # src_pos, weight 1 at offset 0), the step's raw soft
            # windowed row otherwise (reference node.alignment,
            # seq2seq.py:1495/1510)
            soft_rows = _sel_rows(par_k, a_w, K)          # (B, R, WIN)
            onehot0 = (jnp.zeros((B, R, WIN), a_w.dtype)
                       .at[:, :, 0].set(1.0))
            rows = jnp.where(sel_isrej[..., None], onehot0, soft_rows)
            starts = jnp.where(sel_isrej, sel_srcpos,
                               jnp.take_along_axis(a_start, par_k,
                                                   axis=1))
            rec_arow = rec_arow.at[:, t, :, :].set(
                jnp.where(is_old[..., None], 0.0, rows))
            rec_astart = rec_astart.at[:, t, :].set(
                jnp.where(is_old, 0, starts))

        # feedback for new nodes: parent boosted probs with better-ranked
        # candidate maxima zeroed (seq2seq.py:1515-1520)
        par_probs = _sel_rows(par_k, probs_adj_fb, K)  # (B, R, V)
        par_cidx = ta(cand_idx, par_k)                # (B, R, CC)
        par_valid = ta(valid, par_k)                  # (B, R, CC)
        # zero only previously *admitted* maxima (the reference zeroes
        # the candidates it actually enqueued, seq2seq.py:1515-1520):
        # one scatter-multiply over the CC candidate slots instead of CC
        # full passes over (B, R, V)
        zero_c = ((jnp.arange(CC)[None, None, :] < rank[..., None])
                  & par_valid)                        # (B, R, CC)
        cand_feedback = par_probs.at[
            jnp.arange(B)[:, None, None], jnp.arange(R)[None, :, None],
            par_cidx].multiply(
                jnp.where(zero_c, 0.0, 1.0).astype(par_probs.dtype))
        new_feedback = jnp.where(is_old[..., None],
                                 _sel_rows(old_ix, s['feedback'], R),
                                 cand_feedback)

        # finality flag travels with the merged nodes
        new_isfin = jnp.where(
            is_old, jnp.take_along_axis(s['is_fin'], old_ix, axis=1),
            cand_of(c_fin))

        rec_dbg = {}
        if return_trace:
            rec_dbg = dict(
                rec_exp=s['rec_exp'].at[:, t, :].set(
                    jnp.where(exp_ok, exp_ix, -1)),
                rec_cidx=s['rec_cidx'].at[:, t].set(cand_idx),
                rec_cp=s['rec_cp'].at[:, t].set(
                    cand_p.astype(jnp.float32)),
                rec_cvalid=s['rec_cvalid'].at[:, t].set(valid),
                rec_misal=s['rec_misal'].at[:, t].set(
                    misal.astype(jnp.float32)),
                rec_srcpos=s['rec_srcpos'].at[:, t].set(src_pos),
                rec_rejok=s['rec_rejok'].at[:, t].set(rej_ok),
                rec_rejp=s['rec_rejp'].at[:, t].set(
                    rej_p.astype(jnp.float32)))

        # --- termination ----------------------------------------------
        no_live = ~jnp.any(jnp.isfinite(new_pro), axis=1)
        over = (t + 1).astype(len0.dtype) >= 2.0 * len0
        done = s['done'] | stop | no_live | over

        return dict(t=t + 1, h=new_h, aw=new_aw, astart=new_astart,
                    book_pos=new_bpos, book_max1=new_bmax1,
                    feedback=new_feedback, cum=new_cum, pro=new_pro,
                    nchars=new_nchars,
                    is_fin=new_isfin, done=done,
                    rec_parent=rec_parent, rec_char=rec_char, rec_p=rec_p,
                    rec_ap=rec_ap, rec_arow=rec_arow,
                    rec_astart=rec_astart,
                    rec_exp=rec_dbg.get('rec_exp', s['rec_exp']),
                    rec_cidx=rec_dbg.get('rec_cidx', s['rec_cidx']),
                    rec_cp=rec_dbg.get('rec_cp', s['rec_cp']),
                    rec_cvalid=rec_dbg.get('rec_cvalid', s['rec_cvalid']),
                    rec_misal=rec_dbg.get('rec_misal', s['rec_misal']),
                    rec_srcpos=rec_dbg.get('rec_srcpos', s['rec_srcpos']),
                    rec_rejok=rec_dbg.get('rec_rejok', s['rec_rejok']),
                    rec_rejp=rec_dbg.get('rec_rejp', s['rec_rejp']),
                    **new_bank)

    def cond(s):
        return (s['t'] < S) & ~jnp.all(s['done'])

    s = jax.lax.while_loop(cond, body, state0)
    count = jnp.sum(jnp.isfinite(s['bank_cost']), axis=1)

    # --- backtrace: rebuild the banked texts from the trie -------------
    # each bank entry holds (t, parent slot, final char); walk the
    # per-iteration (parent, char) records backwards, emitting chars
    # right-to-left (one reverse lax.scan, (B, F) gathers per step)
    valid = jnp.isfinite(s['bank_cost'])
    fin_len = s['bank_len']
    bix = jnp.arange(B)[:, None]
    fix = jnp.arange(F)[None, :]
    idx0 = jnp.zeros((B, F, S), jnp.int32)
    prob0 = jnp.zeros((B, F, S), attended.dtype)
    ap0 = jnp.zeros((B, F, S), jnp.int32)
    arow0 = (jnp.zeros((B, F, S, WIN), attended.dtype)
             if return_alignments else jnp.zeros((0,), attended.dtype))
    ast0 = (jnp.zeros((B, F, S), jnp.int32)
            if return_alignments else jnp.zeros((0,), jnp.int32))

    def walk(carry, tt):
        pos, outpos, idx, prob, ap, arow, ast = carry
        rc = jnp.take_along_axis(
            jax.lax.dynamic_index_in_dim(s['rec_char'], tt, 1, False),
            pos, axis=1)                                       # (B, F)
        rp = jnp.take_along_axis(
            jax.lax.dynamic_index_in_dim(s['rec_p'], tt, 1, False),
            pos, axis=1)
        ra = jnp.take_along_axis(
            jax.lax.dynamic_index_in_dim(s['rec_ap'], tt, 1, False),
            pos, axis=1)
        rpar = jnp.take_along_axis(
            jax.lax.dynamic_index_in_dim(s['rec_parent'], tt, 1, False),
            pos, axis=1)
        active = valid & (tt < s['bank_t'])
        emit = active & (rc >= 0) & (outpos >= 0)
        wpos = jnp.where(emit, outpos, S)
        idx = idx.at[bix, fix, wpos].set(rc, mode='drop')
        prob = prob.at[bix, fix, wpos].set(rp, mode='drop')
        ap = ap.at[bix, fix, wpos].set(ra, mode='drop')
        if return_alignments:
            rrow = jnp.take_along_axis(
                jax.lax.dynamic_index_in_dim(s['rec_arow'], tt, 1, False),
                pos[..., None], axis=1)                    # (B, F, WIN)
            rast = jnp.take_along_axis(
                jax.lax.dynamic_index_in_dim(s['rec_astart'], tt, 1,
                                             False),
                pos, axis=1)
            arow = arow.at[bix, fix, wpos].set(rrow, mode='drop')
            ast = ast.at[bix, fix, wpos].set(rast, mode='drop')
        outpos = outpos - emit.astype(jnp.int32)
        pos = jnp.where(active, rpar, pos)
        return (pos, outpos, idx, prob, ap, arow, ast), None

    # the banked node's own newline record is part of its trie chain, so
    # the walk emits the complete text including the final char
    carry0 = (s['bank_parent'], fin_len - 1, idx0, prob0, ap0, arow0,
              ast0)
    (pos, outpos, idx, prob, ap, arow, ast), _ = jax.lax.scan(
        walk, carry0, jnp.arange(S - 1, -1, -1))
    # expose only beam_width_out solutions (the extra internal slot
    # exists for the reference's early-stop rule)
    Fo = bp.beam_width_out
    out = dict(idx=idx[:, :Fo], prob=prob[:, :Fo],
               length=s['bank_len'][:, :Fo], cost=s['bank_cost'][:, :Fo],
               cum=s['bank_cum'][:, :Fo],
               count=jnp.minimum(count, Fo), align_pos=ap[:, :Fo])
    if return_alignments:
        out['align_row'] = arow[:, :Fo]
        out['align_start'] = ast[:, :Fo]
    if return_trace:
        # debugging/instrumentation (tools/beam_divergence.py): the raw
        # per-iteration trie records plus final reservoir state, enough
        # to reconstruct every slot's text/cost at every iteration
        out['trace'] = dict(rec_parent=s['rec_parent'],
                            rec_char=s['rec_char'], rec_p=s['rec_p'],
                            pro=s['pro'], cum=s['cum'],
                            nchars=s['nchars'], is_fin=s['is_fin'],
                            t=s['t'], rec_exp=s['rec_exp'],
                            rec_cidx=s['rec_cidx'], rec_cp=s['rec_cp'],
                            rec_cvalid=s['rec_cvalid'],
                            rec_misal=s['rec_misal'],
                            rec_srcpos=s['rec_srcpos'],
                            rec_rejok=s['rec_rejok'],
                            rec_rejp=s['rec_rejp'])
    return out
