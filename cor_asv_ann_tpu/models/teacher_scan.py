"""Teacher-forced top-decoder scan with a hand-written VJP.

The training backward of the windowed-attention top scan is where the
train step's time goes: XLA's scan transpose accumulates the cotangents
of the loop-invariant ``u``/``attended`` tensors by carrying full
(B, T, W) buffers through every backward step and scatter-adding the
per-step window gradient into them — ~2·2·(B·T·W) bytes of read+write
traffic PER STEP (17 GB per train step at the flagship shape), for a
gradient that only ever touches WIN≈12 rows per line per step.

This module replaces that with a `jax.custom_vjp`:

- forward: a plain `lax.scan` (per-step windowed additive attention +
  the top LSTM cell, same math as seq2seq._decode_teacher's windowed
  body), saving small residuals — h/c sequences, the (B, WIN) alignment
  windows and their int32 start offsets (~80 MB total at B=256/T=128,
  vs the 8 GB the dense path's autodiff would save; no remat needed);
- backward: one reverse `lax.scan` that recomputes the cheap per-step
  elementwise work (gates, window energies) from the residuals and
  EMITS the per-step window cotangents as stacked outputs; the
  (B, T, W) gradients of ``u``/``attended`` are then built by ONE
  scatter-add over the stacks after the loop, and every weight gradient
  is one large MXU contraction over all steps at once
  (dR = h_prevᵀ·dZ etc.) — the same fused-sequential/big-contraction
  split as ops/pallas_lstm_train.py.

Semantics follow the reference's attention cell + Keras LSTM gate order
(reference lib/attention.py:440-621, lib/seq2seq.py:342-356): windowed
energies are mathematically identical to the dense masked energies
(everything outside the ±window_width window is -inf-masked anyway).
The alignment-state chain contributes ZERO gradient in both the dense
and windowed autodiff paths (the previous alignment only enters through
the discontinuous window mask and integer window start), so the manual
backward matches autodiff exactly on that front.

Mixed-precision rounding mirrors seq2seq._decode_teacher exactly:
per-product f32 accumulation rounded to the weight dtype (ops.lstm.mm)
without dropout masks; one f32 accumulation rounded once on the
masked-gate path.
"""

import functools

import jax
import jax.numpy as jnp

from ..ops.lstm import mm, gate_math, attention_cell_preact

# scan unroll (loop-overhead amortization, same as ops.lstm._UNROLL)
_UNROLL = 4


def _win_ix(astart, WIN, T):
    return jnp.minimum(astart[:, None] + jnp.arange(WIN), T - 1)


def _attention_fwd(top, h, aw, astart, attended, u, ww, WIN, enc_mask):
    """One windowed attention step (gather form; identical visible set
    to seq2seq._windowed_attention). Returns (ctx f32, a, new_start).

    Mirrors seq2seq._windowed_attention's gather branch step-for-step
    (t0 in f32, clip-to-[0, T-WIN] start, -1e30 mask, all-masked-row
    zeroing, f32 context accumulation); any edit there must land here
    too — equality is pinned by tests/test_teacher_vjp.py::
    test_manual_vjp_forward_matches_windowed."""
    B, T, A = attended.shape
    offs = jnp.arange(WIN, dtype=jnp.float32)
    t0 = jnp.sum(aw.astype(jnp.float32)
                 * (astart[:, None].astype(jnp.float32) + offs),
                 axis=-1) + 1.0
    new_start = jnp.clip(jnp.floor(t0).astype(jnp.int32) - ww, 0,
                         max(T - WIN, 0))
    win_ix = _win_ix(new_start, WIN, T)
    u_w = u[jnp.arange(B)[:, None], win_ix]
    att_w = attended[jnp.arange(B)[:, None], win_ix]
    w_vec = mm(h, top['W_a']) + top['b_UW']
    e = jnp.tanh(w_vec[:, None, :] + u_w)
    s_en = mm(e, top['v_a'])[..., 0] + top['b_v']
    visible = jnp.abs(t0[:, None] - win_ix.astype(jnp.float32)) <= ww
    if enc_mask is not None:
        visible = visible & (enc_mask[jnp.arange(B)[:, None], win_ix] > 0)
    s_m = jnp.where(visible, s_en, -1e30)
    a = jax.nn.softmax(s_m, axis=-1)
    a = a * jnp.any(visible, axis=-1, keepdims=True)
    ctx = jnp.sum(a.astype(jnp.float32)[:, :, None]
                  * att_w.astype(jnp.float32), axis=1)
    return ctx, a, new_start


def _cell_z(top, cell_in, h, masks):
    """Gate preactivations — the SAME implementation _decode_teacher's
    cell_update consumes (ops.lstm.attention_cell_preact), so the
    manual-VJP forward cannot drift from the eval/autodiff forward."""
    return attention_cell_preact(top['cell'], cell_in, h, masks)


def _attention_fwd_dense(top, h, aw, astart, attended, u, ww, WIN,
                         enc_mask):
    """One windowed attention step computed DENSELY: full-T energies
    streamed at HBM bandwidth (no gathers), window mask from the carried
    (aw, astart) state, and the result re-windowed into the same
    (aw, astart) carry the gather form produces.

    Rationale (measured, NOTES.md): below T~192 the dense (B, T, W)
    energy stream beats per-line row gathers — XLA row gathers are
    random-access while the dense tanh streams at full bandwidth. The
    visible position set and per-element math are identical to
    _attention_fwd, so the reverse sweep (_tts_bwd) recomputes the same
    windowed intermediates from the same residuals regardless of which
    forward ran. Returns (ctx f32, aw_new, new_start)."""
    B, T, A = attended.shape
    offs = jnp.arange(WIN, dtype=jnp.float32)
    t0 = jnp.sum(aw.astype(jnp.float32)
                 * (astart[:, None].astype(jnp.float32) + offs),
                 axis=-1) + 1.0
    new_start = jnp.clip(jnp.floor(t0).astype(jnp.int32) - ww, 0,
                         max(T - WIN, 0))
    w_vec = mm(h, top['W_a']) + top['b_UW']
    e = jnp.tanh(w_vec[:, None, :] + u)              # (B, T, W) dense
    s_en = mm(e, top['v_a'])[..., 0] + top['b_v']    # (B, T)
    pos = jnp.arange(T, dtype=jnp.float32)
    visible = jnp.abs(t0[:, None] - pos[None, :]) <= ww
    if enc_mask is not None:
        visible = visible & (enc_mask > 0)
    s_m = jnp.where(visible, s_en, -1e30)
    a = jax.nn.softmax(s_m, axis=-1)
    a = a * jnp.any(visible, axis=-1, keepdims=True)
    ctx = jnp.sum(a.astype(jnp.float32)[:, :, None]
                  * attended.astype(jnp.float32), axis=1)
    win_ix = _win_ix(new_start, WIN, T)
    aw_new = jnp.take_along_axis(a, win_ix, axis=1)
    return ctx, aw_new, new_start


def _fwd_scan(top, xs, attended, u, h0, c0, enc_mask, masks, ww, WIN,
              dense=False):
    """Returns (hs, cs, aws, astarts) stacked time-major. `dense`
    selects the dense-streaming attention forward (same visible set and
    residual format as the gather form; the T<192 fast path)."""
    B = xs.shape[0]
    a0 = jnp.zeros((B, WIN), attended.dtype)
    s0 = jnp.zeros((B,), jnp.int32)
    att_step = _attention_fwd_dense if dense else _attention_fwd

    def body(carry, x_t):
        h, c, aw, astart = carry
        ctx, a, new_start = att_step(top, h, aw, astart, attended,
                                     u, ww, WIN, enc_mask)
        cell_in = jnp.concatenate([x_t, ctx.astype(x_t.dtype)], axis=-1)
        z = _cell_z(top, cell_in, h, masks)
        h2, c2 = gate_math(z, c)
        return (h2, c2, a, new_start), (h2, c2, a, new_start)

    xs_t = jnp.swapaxes(xs, 0, 1)
    _, (hs, cs, aws, astarts) = jax.lax.scan(body, (h0, c0, a0, s0),
                                             xs_t, unroll=_UNROLL)
    return hs, cs, aws, astarts


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def teacher_top_scan(top, xs, attended, u, h0, c0, enc_mask, masks,
                     ww, WIN, dense=False):
    """Teacher-forced windowed-attention top scan.

    top: the top decoder layer params (W_a, v_a, b_UW, b_v, cell{...});
    xs (B, Td, W): lower-stack activations; attended/u (B, T, A/W);
    h0/c0 (B, W); enc_mask: float (B, T) visibility or None; masks:
    (4, B, W+A) variational dropout multipliers or None; ww/WIN static.
    `dense` selects the dense-streaming forward (T<192 regime) — the
    backward is the same windowed reverse sweep either way (the window
    mask zeroes every out-of-window gradient, so even the dense
    forward's true cotangents touch only WIN rows per step).
    Returns hs (B, Td, W).
    """
    hs, _, _, _ = _fwd_scan(top, xs, attended, u, h0, c0, enc_mask,
                            masks, ww, WIN, dense)
    return jnp.swapaxes(hs, 0, 1)


def _tts_fwd(top, xs, attended, u, h0, c0, enc_mask, masks, ww, WIN,
             dense):
    hs, cs, aws, astarts = _fwd_scan(top, xs, attended, u, h0, c0,
                                     enc_mask, masks, ww, WIN, dense)
    res = (top, xs, attended, u, h0, c0, enc_mask, masks, hs, cs, aws,
           astarts)
    return jnp.swapaxes(hs, 0, 1), res


def _tts_bwd(ww, WIN, dense, res, g_out):
    (top, xs, attended, u, h0, c0, enc_mask, masks, hs, cs, aws,
     astarts) = res
    B, T, A = attended.shape
    Td = xs.shape[1]
    W = top['cell']['recurrent_kernel'].shape[0]
    f32 = jnp.float32
    kdt = top['cell']['kernel'].dtype
    xs_t = jnp.swapaxes(xs, 0, 1)                      # (Td, B, W)
    g_t = jnp.swapaxes(g_out, 0, 1).astype(f32)        # (Td, B, W)
    hprev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
    cprev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    K = top['cell']['kernel']
    R = top['cell']['recurrent_kernel']
    v_a = top['v_a']
    bidx = jnp.arange(B)[:, None]

    def body(carry, step):
        dh, dc, dv_a, db_v = carry
        g_hs, h_p, c_p, c_t, a, astart, x_t = step
        # ---- recompute the forward step's cheap intermediates --------
        win_ix = _win_ix(astart, WIN, T)
        u_w = u[bidx, win_ix]
        att_w = attended[bidx, win_ix].astype(f32)
        w_vec = mm(h_p, top['W_a']) + top['b_UW']
        e = jnp.tanh(w_vec[:, None, :] + u_w)
        a_f = a.astype(f32)
        ctx = jnp.sum(a_f[:, :, None] * att_w, axis=1)
        cell_in = jnp.concatenate([x_t, ctx.astype(x_t.dtype)], axis=-1)
        z = _cell_z(top, cell_in, h_p, masks)
        n = W
        i = jax.nn.sigmoid(z[:, :n]).astype(f32)
        f = jax.nn.sigmoid(z[:, n:2 * n]).astype(f32)
        gg = jnp.tanh(z[:, 2 * n:3 * n]).astype(f32)
        o = jax.nn.sigmoid(z[:, 3 * n:]).astype(f32)
        th = jnp.tanh(c_t.astype(f32))
        # ---- LSTM cell backward --------------------------------------
        dh_tot = g_hs + dh
        dcc = dc + dh_tot * o * (1.0 - th * th)
        do = dh_tot * th
        di = dcc * gg
        dgg = dcc * i
        df = dcc * c_p.astype(f32)
        dz = jnp.concatenate(
            [di * i * (1.0 - i), df * f * (1.0 - f),
             dgg * (1.0 - gg * gg), do * o * (1.0 - o)], axis=-1)
        dc_next = dcc * f
        dz_w = dz.astype(kdt)
        dh_next = jax.lax.dot_general(
            dz_w, R, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        if masks is not None:
            dcell_in = sum(
                masks[g].astype(f32)
                * jax.lax.dot_general(
                    dz_w[:, g * W:(g + 1) * W], K[:, g * W:(g + 1) * W],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                for g in range(4))
        else:
            dcell_in = jax.lax.dot_general(
                dz_w, K, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
        dx_t = dcell_in[:, :W]
        dctx = dcell_in[:, W:]
        # ---- attention backward --------------------------------------
        da = jnp.einsum('ba,bwa->bw', dctx, att_w,
                        preferred_element_type=f32)
        datt_w = a_f[:, :, None] * dctx[:, None, :]
        ds = a_f * (da - jnp.sum(a_f * da, axis=-1, keepdims=True))
        dv_a = dv_a + jnp.einsum('bwk,bw->k', e.astype(f32), ds,
                                 preferred_element_type=f32)
        db_v = db_v + jnp.sum(ds)
        de = ds[:, :, None] * v_a[None, None, :, 0].astype(f32)
        dpre = de * (1.0 - e.astype(f32) ** 2)
        dwvec = jnp.sum(dpre, axis=1)                  # (B, W)
        du_w = dpre
        dh_next = dh_next + jax.lax.dot_general(
            dwvec.astype(top['W_a'].dtype), top['W_a'],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        # emit stacks in the weight dtype: the f32 stacks cost 2x the
        # HBM and every consumer accumulates in f32 anyway
        # (preferred_element_type on the contractions, f32 scatter
        # targets); measured identical gradient quality at bf16
        emit = (dx_t.astype(xs.dtype), dz.astype(kdt),
                dwvec.astype(kdt), du_w.astype(u.dtype),
                datt_w.astype(attended.dtype), win_ix,
                ctx.astype(xs.dtype))
        return (dh_next, dc_next, dv_a, db_v), emit

    carry0 = (jnp.zeros((B, W), f32), jnp.zeros((B, W), f32),
              jnp.zeros((W,), f32), jnp.zeros((), f32))
    steps = (g_t, hprev, cprev, cs, aws, astarts, xs_t)
    (dh0, dc0, dv_a, db_v), emits = jax.lax.scan(body, carry0, steps,
                                                 reverse=True,
                                                 unroll=_UNROLL)
    dxs_t, dz_t, dwvec_t, duw_t, dattw_t, winix_t, ctx_t = emits

    # ---- assemble the large gradients outside the loop ----------------
    # u/attended: scatter-add the stacked window cotangents in a few
    # static time chunks — each chunk's f32 conversion is transient, so
    # the peak is chunk-sized instead of a full-stack f32 copy (a full
    # copy cost ~6.5 GB at B=1024/T=128 and OOM'd the 16 GB chip)
    n_chunks = min(8, Td)
    bounds = [round(k * Td / n_chunks) for k in range(n_chunks + 1)]
    du = jnp.zeros((B, T, W), f32)
    datt = jnp.zeros((B, T, A), f32)
    b_full = jnp.broadcast_to(jnp.arange(B)[None, :, None],
                              winix_t.shape)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if hi == lo:
            continue
        ix = winix_t[lo:hi].reshape(-1)
        bix = b_full[lo:hi].reshape(-1)
        du = du.at[bix, ix].add(
            duw_t[lo:hi].astype(f32).reshape(-1, W))
        datt = datt.at[bix, ix].add(
            dattw_t[lo:hi].astype(f32).reshape(-1, A))
    # weight grads as whole-sequence contractions (f32 MXU accumulation
    # over the low-precision stacks — no materialized f32 copies)
    dW_a = jnp.einsum('tbn,tbm->nm', hprev, dwvec_t,
                      preferred_element_type=f32)
    db_UW = jnp.sum(dwvec_t, axis=(0, 1), dtype=f32)
    dR = jnp.einsum('tbn,tbm->nm', hprev, dz_t,
                    preferred_element_type=f32)
    dbias = jnp.sum(dz_t, axis=(0, 1), dtype=f32)
    cell_in_t = jnp.concatenate(
        [xs_t, ctx_t.astype(xs_t.dtype)], axis=-1)
    if masks is not None:
        dK = jnp.concatenate(
            [jnp.einsum('tbi,tbn->in',
                        cell_in_t * masks[g][None].astype(cell_in_t.dtype),
                        dz_t[..., g * W:(g + 1) * W],
                        preferred_element_type=f32)
             for g in range(4)], axis=-1)
        dmasks = jnp.zeros_like(masks)
    else:
        dK = jnp.einsum('tbi,tbn->in', cell_in_t, dz_t,
                        preferred_element_type=f32)
        dmasks = None
    dtop = {
        'W_a': dW_a.astype(top['W_a'].dtype),
        'v_a': dv_a[:, None].astype(top['v_a'].dtype),
        'b_UW': db_UW.astype(top['b_UW'].dtype),
        'b_v': db_v[None].astype(top['b_v'].dtype),
        'cell': {
            'kernel': dK.astype(K.dtype),
            'recurrent_kernel': dR.astype(R.dtype),
            'bias': dbias.astype(top['cell']['bias'].dtype),
        },
    }
    denc_mask = (jnp.zeros_like(enc_mask)
                 if enc_mask is not None else None)
    return (dtop, jnp.swapaxes(dxs_t, 0, 1).astype(xs.dtype),
            datt.astype(attended.dtype), du.astype(u.dtype),
            dh0.astype(h0.dtype), dc0.astype(c0.dtype), denc_mask,
            dmasks)


teacher_top_scan.defvjp(_tts_fwd, _tts_bwd)
