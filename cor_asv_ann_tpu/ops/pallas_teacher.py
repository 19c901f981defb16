"""Pallas TPU kernels: fused teacher-forced attention+LSTM top scan.

The teacher-forced top decoder layer owns the train step (~36 of 56.6 ms
at B=256/T=128 bf16, tools/profile_train.py): per decoder step the dense
additive-attention energies re-read ``u``/``attended`` ((B, T, W) each)
from HBM — 8.6 GB per forward at the flagship shape — and the autodiff
backward re-reads them again while accumulating (B, T, W) cotangent
buffers. Round-5 measurements killed every XLA rearrangement: windowed
gathers/scatters lose 84 vs 56.6 ms regardless of forward (NOTES.md),
because XLA row gathers/scatters are random-access HBM traffic.

These kernels remove the traffic instead: per batch tile, ``u`` and
``attended`` are fetched into VMEM ONCE and stay resident across all Td
decoder steps (the grid iterates t fastest, like pallas_lstm_train.py),
so the per-step dense energies/context are pure on-chip VPU/MXU work.
The recurrent operands (K_ctx, R, W_a, v_a) are VMEM-resident too; the
input projection x@K_x is hoisted OUTSIDE as one large MXU matmul over
all timesteps (the ops.lstm hoisting), entering the kernel as a
streamed f32 preactivation stack. The window mask is applied DENSELY
(positions outside |t0-i|<=ww get -1e30 before the softmax) —
mathematically identical to the reference's local attention
(reference lib/attention.py:544-569) and to
ops.attention.attention_step, with the dense alignment row as the
carried attention state. All (bt, T, W)-shaped intermediates are
computed in static T-chunks so VMEM temporaries stay bounded.

Differentiable via jax.custom_vjp with TWO kernel launches + XLA
assembly:

- TFWD: sequential forward; emits hs, cs and the alignment stack.
- TB1: sequential reverse sweep; recomputes the cheap per-step
  intermediates from the residuals (energies against resident u,
  context from the saved alignment row), carries (dh, dc) in f32,
  emits the dz / ds / dctx / dwvec stacks plus the accumulated v_a
  gradient — one launch per batch tile.
  The du / dattended gradients accumulate in VMEM-resident f32
  blocks inside the same sweep (du's contribution IS the dwvec
  integrand) — replacing the XLA scatter-adds that dominated the
  manual-VJP timing (models/teacher_scan.py).
- outside: every weight gradient is one large MXU contraction over the
  stacks (dK_x, dK_ctx, dR, dW_a, biases) — the same
  fused-sequential / big-contraction split as pallas_lstm_train.py.

Variational dropout (the production train path) is supported by
multiplying the per-gate masks inside (ctx half) and outside (x half);
a mask of ones is exact, so masked and unmasked share one code path.
The alignment-state chain carries zero gradient (established for the
windowed VJP, models/teacher_scan.py docstring) — TB1's carry is only
(dh, dc). Forward parity vs the XLA dense teacher and gradient parity
vs autodiff are asserted in tests/test_teacher_kernel.py.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Scoped-VMEM cap passed to every kernel: the 16 MB default is the
# compiler's conservative pipelining budget, not the physical VMEM
# ceiling; bt=24/32 tiles exceed it and run fine with the raised cap
# (bt=24 measured exactly 17.04 MB).
_VMEM_CAP = 64 * 1024 * 1024


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sig(v):
    one = jnp.asarray(1.0, v.dtype)
    return one / (one + jnp.exp(-v))


def _chunk(T):
    """Static T-chunk width bounding the (bt, TC, W) VMEM temporaries.
    16 (not 32) keeps the f32 temporaries small enough for bt=24 tiles
    at the flagship T=128 (pick_bt)."""
    for tc in (16, 8):
        if T % tc == 0:
            return tc
    return T


def _wvec_of(h, W_a_ref, b_UW_ref):
    """w_vec = round_f32(h @ W_a) + b_UW (the ops.lstm.mm discipline) —
    shared by all kernels so backward recomputes are bit-exact."""
    return jax.lax.dot_general(
        h, W_a_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(h.dtype) + b_UW_ref[:]


def _z_of(zx_f32, ctx, h, maskc_ref, Kc_ref, R_ref, bias_ref, W):
    """z = round(zx + sum_g (ctx*mask_g) @ Kc_g + h @ R) + bias — the
    masked one-rounding discipline (ops.lstm.attention_cell_preact) with
    the x half hoisted into zx."""
    dt = h.dtype
    parts = []
    for g in range(4):
        cg = (ctx.astype(dt) * maskc_ref[g]).astype(dt)
        parts.append(jax.lax.dot_general(
            cg, Kc_ref[:, g * W:(g + 1) * W],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    zc = jnp.concatenate(parts, axis=-1)
    zr = jax.lax.dot_general(
        h, R_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return (zx_f32 + zc + zr).astype(dt) + bias_ref[:]


def _ctx_of(a_f, att_ref, TC):
    """f32 context sum_i a_i * attended_i, T-chunked.

    The (bt, T) -> (bt, T, 1) expansion happens ONCE on the full array
    and chunks slice the SUBLANE dim of the 3D value: slicing the lane
    dim of the 2D array then expanding per chunk fails Mosaic lowering
    (gather shape mismatch, measured on v5e)."""
    T = a_f.shape[-1]
    a3 = a_f[:, :, None]
    ctx = jnp.zeros((a_f.shape[0], att_ref.shape[2]), jnp.float32)
    for lo in range(0, T, TC):
        ctx = ctx + jnp.sum(
            a3[:, lo:lo + TC, :]
            * att_ref[:, lo:lo + TC, :].astype(jnp.float32), axis=1)
    return ctx


def _fwd_kernel(ww, W, TC,
                zx_ref, u_ref, att_ref, Kc_ref, R_ref, W_a_ref,
                v_row_ref, b_UW_ref, b_v_ref, bias_ref, maskc_ref,
                h0_ref, c0_ref,
                hs_ref, cs_ref, aa_ref, zs_ref,
                h_s, c_s, a_s):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]
        a_s[:] = jnp.zeros_like(a_s)

    dt = h_s.dtype
    f32 = jnp.float32
    bt, T = a_s.shape
    wvec = _wvec_of(h_s[:], W_a_ref, b_UW_ref)             # (bt, W)
    v_f = v_row_ref[:].astype(f32)                         # (1, W)
    b_v = b_v_ref[0, 0].astype(dt)
    s_parts = []
    for lo in range(0, T, TC):
        e_c = jnp.tanh(wvec[:, None, :] + u_ref[:, lo:lo + TC, :])
        s_parts.append(
            jnp.sum(e_c.astype(f32) * v_f[None], axis=-1).astype(dt)
            + b_v)
    s = jnp.concatenate(s_parts, axis=-1)                  # (bt, T)
    # Mosaic iota must be integer-typed; cast after
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(f32)
    t0 = jnp.sum(a_s[:].astype(f32) * pos, axis=-1,
                 keepdims=True) + 1.0                      # (bt, 1)
    keep = jnp.abs(t0 - pos) <= ww
    sm = jnp.where(keep, s.astype(f32), -1e30)
    m = jnp.max(sm, axis=-1, keepdims=True)
    p = jnp.exp(sm - m)
    a_new = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
    # round-trip a through its output ref before the broadcasted
    # contraction: the softmax chain leaves a in a layout whose
    # (bt, T, 1) expansion Mosaic cannot relayout for the reduce
    # ("Non-singleton logical dimension is replicated in destination
    # but not in source", v5e) — a ref store/load canonicalizes it
    aa_ref[0] = a_new
    a_new = aa_ref[0]
    ctx = _ctx_of(a_new.astype(f32), att_ref, TC)
    z = _z_of(zx_ref[0], ctx, h_s[:], maskc_ref, Kc_ref, R_ref,
              bias_ref, W)
    # the gate preactivations are a residual: TB1 reads them back
    # instead of recomputing ctx + the two cell matmuls per step
    # (halves the reverse sweep's MXU work)
    zs_ref[0] = z
    i = _sig(z[:, :W])
    f = _sig(z[:, W:2 * W])
    g_ = jnp.tanh(z[:, 2 * W:3 * W])
    o = _sig(z[:, 3 * W:])
    c = f * c_s[:] + i * g_
    h = o * jnp.tanh(c)
    h_s[:] = h
    c_s[:] = c
    a_s[:] = a_new
    hs_ref[0] = h
    cs_ref[0] = c
    aa_ref[0] = a_new


def _b1_kernel(ww, W, TC,
               zs_ref, g_ref, hprev_ref, cprev_ref, cs_ref, aa_ref,
               u_ref, att_ref, Kc_ref, R_ref, W_a_ref, v_row_ref,
               b_UW_ref, maskc_ref,
               dz_ref, ds_ref, dctx_ref, dwvec_ref, dh0_ref, dc0_ref,
               dva_ref, du_ref, datt_ref,
               dh_s, dc_s, wv_s):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dh_s[:] = jnp.zeros_like(dh_s)
        dc_s[:] = jnp.zeros_like(dc_s)
        dva_ref[:] = jnp.zeros_like(dva_ref)
        du_ref[:] = jnp.zeros_like(du_ref)
        datt_ref[:] = jnp.zeros_like(datt_ref)

    dt = hprev_ref.dtype
    f32 = jnp.float32
    bt, T = aa_ref.shape[1], aa_ref.shape[2]
    hp = hprev_ref[0]
    a_f = aa_ref[0].astype(f32)                            # (bt, T)
    # ---- gates from the SAVED preactivations (no ctx/cell recompute:
    # ---- halves the reverse sweep's per-step MXU work) ---------------
    # wvec round-trips through scratch: the matmul-output layout breaks
    # the later sublane reduce over its broadcast products (Mosaic
    # "Invalid relayout" on the dwvec/dva sums, v5e)
    wv_s[:] = _wvec_of(hp, W_a_ref, b_UW_ref)
    wvec = wv_s[:]
    z = zs_ref[0]
    i = _sig(z[:, :W]).astype(f32)
    f = _sig(z[:, W:2 * W]).astype(f32)
    g_ = jnp.tanh(z[:, 2 * W:3 * W]).astype(f32)
    o = _sig(z[:, 3 * W:]).astype(f32)
    th = jnp.tanh(cs_ref[0].astype(f32))
    # ---- LSTM cell backward ------------------------------------------
    dh_tot = g_ref[0].astype(f32) + dh_s[:]
    dcc = dc_s[:] + dh_tot * o * (1.0 - th * th)
    do = dh_tot * th
    di = dcc * g_
    dg = dcc * i
    df = dcc * cprev_ref[0].astype(f32)
    dz = jnp.concatenate(
        [di * i * (1.0 - i), df * f * (1.0 - f),
         dg * (1.0 - g_ * g_), do * o * (1.0 - o)], axis=-1)
    dz_w = dz.astype(dt)
    dz_ref[0] = dz_w
    # dctx = sum_g mask_g * (dz_g @ Kc_g^T); dh' = dz @ R^T
    dctx = jnp.zeros((bt, att_ref.shape[2]), f32)
    for g in range(4):
        dctx = dctx + (maskc_ref[g].astype(f32)
                       * jax.lax.dot_general(
                           dz_w[:, g * W:(g + 1) * W],
                           Kc_ref[:, g * W:(g + 1) * W],
                           dimension_numbers=(((1,), (1,)), ((), ())),
                           preferred_element_type=f32))
    dctx_ref[0] = dctx.astype(dt)
    dh_n = jax.lax.dot_general(
        dz_w, R_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    # ---- attention backward ------------------------------------------
    da_parts = []
    for lo in range(0, T, TC):
        da_parts.append(jnp.sum(
            att_ref[:, lo:lo + TC, :].astype(f32) * dctx[:, None, :],
            axis=-1))
    da = jnp.concatenate(da_parts, axis=-1)                # (bt, T)
    ds = a_f * (da - jnp.sum(a_f * da, axis=-1, keepdims=True))
    # store-then-reload canonicalizes the layout for the broadcasted
    # chunk loop below (same Mosaic relayout limitation as the
    # forward's alignment row); B2 consumes the identical rounded stack
    ds_ref[0] = ds.astype(dt)
    v_f = v_row_ref[:].astype(f32)
    ds3 = ds_ref[0].astype(f32)[:, :, None]
    a3 = a_f[:, :, None]
    dwvec = jnp.zeros((bt, W), f32)
    dva = jnp.zeros((bt, W), f32)
    for lo in range(0, T, TC):
        e_c = jnp.tanh(wvec[:, None, :]
                       + u_ref[:, lo:lo + TC, :]).astype(f32)
        ds_c = ds3[:, lo:lo + TC, :]
        # per-ROW partials only: the final (bt,W)->(1,W) sublane-to-1
        # reduce fails Mosaic relayout on v5e (bisected), so the batch
        # reduction happens outside the kernel over the (B, W) output
        dva = dva + jnp.sum(e_c * ds_c, axis=1)
        dpre_c = ds_c * v_f[None] * (1.0 - e_c * e_c)
        dwvec = dwvec + jnp.sum(dpre_c, axis=1)
        # du/dattended accumulate IN this sweep (VMEM-resident f32
        # blocks, zeroed at the first step of each tile): dpre_c IS the
        # du contribution, so the former second recompute pass (its own
        # kernel, wvec matmul, and full tanh re-read) is gone
        du_ref[:, lo:lo + TC, :] = du_ref[:, lo:lo + TC, :] + dpre_c
        datt_ref[:, lo:lo + TC, :] = (
            datt_ref[:, lo:lo + TC, :]
            + a3[:, lo:lo + TC, :] * dctx[:, None, :])
    dva_ref[:] = dva_ref[:] + dva
    dwvec_ref[0] = dwvec.astype(dt)
    dh_n = dh_n + jax.lax.dot_general(
        dwvec.astype(dt), W_a_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dh_s[:] = dh_n
    dc_s[:] = dcc * f
    dh0_ref[:] = dh_s[:]
    dc0_ref[:] = dc_s[:]


def pick_bt(T, W, A, itemsize):
    """Largest batch tile whose TB1 working set fits VMEM: residents
    (u/att tiles + K_ctx + R + W_a) + chunked temporaries + double-
    buffered stream blocks. The budget is measured, not the nominal
    16 MB: bt=24 at the flagship shape (est. 13.3 MB) fails Mosaic
    compilation intermittently on the v5e while bt=16 (est. 11.5 MB)
    is solid — the compiler's own scratch overhead eats the rest."""
    TC = _chunk(T)
    weights = (A * 4 * W + W * 4 * W + W * W) * itemsize
    for bt in (64, 48, 32, 24, 16, 8):
        residents = bt * T * (W + A) * itemsize + weights
        accumulators = bt * T * (W + A) * 4        # du/datt f32
        temps = 2 * bt * TC * W * 4
        streams = 2 * bt * (8 * W * itemsize + 6 * W * itemsize
                            + 2 * T * itemsize)
        if residents + accumulators + temps + streams \
                < 40 * 1024 * 1024:
            return bt
    return 8


def _pad_b(x, pad, axis):
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _prep(top, attended, masks, B, W, A, dt):
    """Shared operand preparation: split K, shape the small operands."""
    K = top['cell']['kernel']
    K_x, K_ctx = K[:W], K[W:]
    v_row = top['v_a'][:, 0][None].astype(dt)              # (1, W)
    b_UW = top['b_UW'][None].astype(dt)                    # (1, W)
    b_v = top['b_v'].reshape(1, 1).astype(jnp.float32)
    bias = top['cell']['bias'][None].astype(dt)            # (1, 4W)
    if masks is None:
        mask_x = jnp.ones((4, B, W), dt)
        maskc = jnp.ones((4, B, A), dt)
    else:
        mask_x = masks[:, :, :W].astype(dt)
        maskc = masks[:, :, W:].astype(dt)
    return K_x, K_ctx, v_row, b_UW, b_v, bias, mask_x, maskc


def _zx_of(xs, mask_x, K_x, W, dt):
    """Hoisted per-gate input preactivations (Td, B, 4W) f32 — one big
    MXU matmul per gate over all timesteps (masks are time-constant)."""
    parts = []
    for g in range(4):
        xg = (xs * mask_x[g][:, None, :]).astype(dt)
        parts.append(jnp.einsum(
            'btw,wn->btn', xg, K_x[:, g * W:(g + 1) * W],
            preferred_element_type=jnp.float32))
    zx = jnp.concatenate(parts, axis=-1)                   # (B, Td, 4W)
    return jnp.swapaxes(zx, 0, 1)                          # (Td, B, 4W)


def _fwd_impl(top, xs, attended, u, h0, c0, masks, ww, interpret, bt):
    B, Td, W = xs.shape
    T, A = attended.shape[1], attended.shape[2]
    dt = top['cell']['recurrent_kernel'].dtype
    TC = _chunk(T)
    K_x, K_ctx, v_row, b_UW, b_v, bias, mask_x, maskc = _prep(
        top, attended, masks, B, W, A, dt)
    zx = _zx_of(xs, mask_x, K_x, W, dt)
    pad = _round_up(B, bt) - B
    zx_p = _pad_b(zx, pad, 1)
    u_p = _pad_b(u.astype(dt), pad, 0)
    att_p = _pad_b(attended.astype(dt), pad, 0)
    maskc_p = _pad_b(maskc, pad, 1)
    h0_p = _pad_b(h0.astype(dt), pad, 0)
    c0_p = _pad_b(c0.astype(dt), pad, 0)
    Bp = B + pad
    nb = Bp // bt

    hs, cs, aa, zs = pl.pallas_call(
        functools.partial(_fwd_kernel, ww, W, TC),
        grid=(nb, Td),
        in_specs=[
            pl.BlockSpec((1, bt, 4 * W), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, T, W), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, T, A), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((A, 4 * W), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 4 * W), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, t: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4 * W), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bt, A), lambda i, t: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, W), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, W), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, W), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, W), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, T), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, 4 * W), lambda i, t: (t, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Td, Bp, W), dt),
            jax.ShapeDtypeStruct((Td, Bp, W), dt),
            jax.ShapeDtypeStruct((Td, Bp, T), dt),
            jax.ShapeDtypeStruct((Td, Bp, 4 * W), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, W), dt),
            pltpu.VMEM((bt, W), dt),
            pltpu.VMEM((bt, T), dt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_CAP),
        interpret=interpret,
    )(zx_p.astype(jnp.float32), u_p, att_p, K_ctx.astype(dt),
      top['cell']['recurrent_kernel'].astype(dt), top['W_a'].astype(dt),
      v_row, b_UW, b_v, bias, maskc_p, h0_p, c0_p)
    if pad:
        hs, cs, aa, zs = hs[:, :B], cs[:, :B], aa[:, :B], zs[:, :B]
    return hs, cs, aa, zs


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def teacher_top_fused(top, xs, attended, u, h0, c0, masks, ww,
                      interpret=False, bt=32):
    """Fused teacher-forced top scan. Same contract as
    models.teacher_scan.teacher_top_scan (returns hs (B, Td, W));
    `masks` (4, B, W+A) variational dropout multipliers or None;
    enc_mask is unsupported (callers gate on mask_padding)."""
    hs, _, _, _ = _fwd_impl(top, xs, attended, u, h0, c0, masks, ww,
                            interpret, bt)
    return jnp.swapaxes(hs, 0, 1)


def _tf_fwd(top, xs, attended, u, h0, c0, masks, ww, interpret, bt):
    hs, cs, aa, zs = _fwd_impl(top, xs, attended, u, h0, c0, masks, ww,
                               interpret, bt)
    res = (top, xs, attended, u, h0, c0, masks, hs, cs, aa, zs)
    return jnp.swapaxes(hs, 0, 1), res


def _tf_bwd(ww, interpret, bt, res, g_out):
    top, xs, attended, u, h0, c0, masks, hs, cs, aa, zs = res
    B, Td, W = xs.shape
    T, A = attended.shape[1], attended.shape[2]
    dt = top['cell']['recurrent_kernel'].dtype
    f32 = jnp.float32
    TC = _chunk(T)
    K_x, K_ctx, v_row, b_UW, b_v, bias, mask_x, maskc = _prep(
        top, attended, masks, B, W, A, dt)
    hprev = jnp.concatenate([h0.astype(dt)[None], hs[:-1]], axis=0)
    cprev = jnp.concatenate([c0.astype(dt)[None], cs[:-1]], axis=0)
    g_t = jnp.swapaxes(g_out, 0, 1).astype(dt)             # (Td, B, W)

    pad = _round_up(B, bt) - B
    Bp = B + pad
    nb = Bp // bt
    zs_p = _pad_b(zs, pad, 1)
    g_p = _pad_b(g_t, pad, 1)
    hprev_p = _pad_b(hprev, pad, 1)
    cprev_p = _pad_b(cprev, pad, 1)
    cs_p = _pad_b(cs, pad, 1)
    aa_p = _pad_b(aa, pad, 1)
    u_p = _pad_b(u.astype(dt), pad, 0)
    att_p = _pad_b(attended.astype(dt), pad, 0)
    maskc_p = _pad_b(maskc, pad, 1)

    def tmap3(i, j):
        return (Td - 1 - j, i, 0)

    const2 = dict(memory_space=pltpu.VMEM)
    (dz_t, ds_t, dctx_t, dwvec_t, dh0, dc0, dva,
     du, datt) = pl.pallas_call(
        functools.partial(_b1_kernel, ww, W, TC),
        grid=(nb, Td),
        in_specs=[
            pl.BlockSpec((1, bt, 4 * W), tmap3, **const2),
            pl.BlockSpec((1, bt, W), tmap3, **const2),
            pl.BlockSpec((1, bt, W), tmap3, **const2),
            pl.BlockSpec((1, bt, W), tmap3, **const2),
            pl.BlockSpec((1, bt, W), tmap3, **const2),
            pl.BlockSpec((1, bt, T), tmap3, **const2),
            pl.BlockSpec((bt, T, W), lambda i, j: (i, 0, 0), **const2),
            pl.BlockSpec((bt, T, A), lambda i, j: (i, 0, 0), **const2),
            pl.BlockSpec((A, 4 * W), lambda i, j: (0, 0), **const2),
            pl.BlockSpec((W, 4 * W), lambda i, j: (0, 0), **const2),
            pl.BlockSpec((W, W), lambda i, j: (0, 0), **const2),
            pl.BlockSpec((1, W), lambda i, j: (0, 0), **const2),
            pl.BlockSpec((1, W), lambda i, j: (0, 0), **const2),
            pl.BlockSpec((4, bt, A), lambda i, j: (0, i, 0), **const2),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, 4 * W), tmap3, **const2),
            pl.BlockSpec((1, bt, T), tmap3, **const2),
            pl.BlockSpec((1, bt, A), tmap3, **const2),
            pl.BlockSpec((1, bt, W), tmap3, **const2),
            pl.BlockSpec((bt, W), lambda i, j: (i, 0), **const2),
            pl.BlockSpec((bt, W), lambda i, j: (i, 0), **const2),
            pl.BlockSpec((bt, W), lambda i, j: (i, 0), **const2),
            pl.BlockSpec((bt, T, W), lambda i, j: (i, 0, 0), **const2),
            pl.BlockSpec((bt, T, A), lambda i, j: (i, 0, 0), **const2),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Td, Bp, 4 * W), dt),
            jax.ShapeDtypeStruct((Td, Bp, T), dt),
            jax.ShapeDtypeStruct((Td, Bp, A), dt),
            jax.ShapeDtypeStruct((Td, Bp, W), dt),
            jax.ShapeDtypeStruct((Bp, W), f32),
            jax.ShapeDtypeStruct((Bp, W), f32),
            jax.ShapeDtypeStruct((Bp, W), f32),
            jax.ShapeDtypeStruct((Bp, T, W), f32),
            jax.ShapeDtypeStruct((Bp, T, A), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, W), f32),
            pltpu.VMEM((bt, W), f32),
            pltpu.VMEM((bt, W), dt),
        ],
        # the 16 MB scoped-vmem default is the COMPILER's conservative
        # pipelining budget, not the physical ceiling; bt=24 measured
        # exactly 17.04 MB and runs with the raised cap — which is what
        # lets the du/datt f32 accumulators live INSIDE this sweep
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_CAP),
        interpret=interpret,
    )(zs_p, g_p, hprev_p, cprev_p, cs_p, aa_p, u_p, att_p,
      K_ctx.astype(dt), top['cell']['recurrent_kernel'].astype(dt),
      top['W_a'].astype(dt), v_row, b_UW, maskc_p)

    if pad:
        dz_t = dz_t[:, :B]
        ds_t = ds_t[:, :B]
        dctx_t = dctx_t[:, :B]
        dwvec_t = dwvec_t[:, :B]
        dh0, dc0 = dh0[:B], dc0[:B]
        du, datt = du[:B], datt[:B]
        dva = dva[:B]

    # ---- weight gradients: whole-sequence MXU contractions -----------
    # dxs through the hoisted input projection (per-gate mask)
    dxs = jnp.zeros((B, Td, W), f32)
    dz_b = jnp.swapaxes(dz_t, 0, 1)                        # (B, Td, 4W)
    for g in range(4):
        part = jnp.einsum('btn,wn->btw', dz_b[..., g * W:(g + 1) * W],
                          K_x[:, g * W:(g + 1) * W],
                          preferred_element_type=f32)
        dxs = dxs + part * mask_x[g][:, None, :].astype(f32)
    # context sequence recomputed as one batched MXU contraction
    ctx_all = jnp.einsum('tbs,bsa->tba', aa.astype(dt),
                         attended.astype(dt),
                         preferred_element_type=f32)       # (Td, B, A)
    dK_parts_x, dK_parts_c = [], []
    xs_b = xs.astype(dt)
    for g in range(4):
        xg = (xs_b * mask_x[g][:, None, :]).astype(dt)
        dK_parts_x.append(jnp.einsum(
            'btw,btn->wn', xg,
            jnp.swapaxes(dz_t[..., g * W:(g + 1) * W], 0, 1),
            preferred_element_type=f32))
        cg = (ctx_all.astype(dt)
              * maskc[g].astype(dt)[None]).astype(dt)      # (Td, B, A)
        dK_parts_c.append(jnp.einsum(
            'tba,tbn->an', cg, dz_t[..., g * W:(g + 1) * W],
            preferred_element_type=f32))
    dK = jnp.concatenate(
        [jnp.concatenate([x, c], axis=0)
         for x, c in zip(dK_parts_x, dK_parts_c)], axis=1)
    dR = jnp.einsum('tbw,tbn->wn', hprev, dz_t,
                    preferred_element_type=f32)
    dbias = jnp.sum(dz_t.astype(f32), axis=(0, 1))
    dW_a = jnp.einsum('tbw,tbn->wn', hprev, dwvec_t,
                      preferred_element_type=f32)
    db_UW = jnp.sum(dwvec_t.astype(f32), axis=(0, 1))
    db_v = jnp.sum(ds_t.astype(f32))
    dtop = {
        'W_a': dW_a.astype(top['W_a'].dtype),
        'v_a': jnp.sum(dva, axis=0)[:, None].astype(top['v_a'].dtype),
        'b_UW': db_UW.astype(top['b_UW'].dtype),
        'b_v': db_v[None].astype(top['b_v'].dtype),
        'cell': {
            'kernel': dK.astype(top['cell']['kernel'].dtype),
            'recurrent_kernel': dR.astype(
                top['cell']['recurrent_kernel'].dtype),
            'bias': dbias.astype(top['cell']['bias'].dtype),
        },
    }
    dmasks = jnp.zeros_like(masks) if masks is not None else None
    return (dtop, dxs.astype(xs.dtype), datt.astype(attended.dtype),
            du.astype(u.dtype), dh0.astype(h0.dtype),
            dc0.astype(c0.dtype), dmasks)


teacher_top_fused.defvjp(_tf_fwd, _tf_bwd)


def teacher_top_fused_sharded(top, xs, attended, u, h0, c0, masks, ww,
                              interpret, bt, mesh):
    """teacher_top_fused under shard_map over the mesh's 'data' axis:
    each data shard runs the full fused scan on its local batch rows
    with the (possibly tp-sharded) weights gathered into the region;
    shard_map's transpose psums the per-shard weight gradients — the
    same wrapper pattern as ops.pallas_lstm_train.lstm_scan_fused."""
    from jax.sharding import PartitionSpec as P
    if masks is None:
        def inner(top, xs, attended, u, h0, c0):
            return teacher_top_fused(top, xs, attended, u, h0, c0,
                                     None, ww, interpret, bt)
        in_specs = (P(), P('data'), P('data'), P('data'), P('data'),
                    P('data'))
        args = (top, xs, attended, u, h0, c0)
    else:
        def inner(top, xs, attended, u, h0, c0, masks):
            return teacher_top_fused(top, xs, attended, u, h0, c0,
                                     masks, ww, interpret, bt)
        in_specs = (P(), P('data'), P('data'), P('data'), P('data'),
                    P('data'), P(None, 'data'))
        args = (top, xs, attended, u, h0, c0, masks)
    try:
        from jax import shard_map              # jax >= 0.8
        wrapped = shard_map(inner, mesh=mesh, in_specs=in_specs,
                            out_specs=P('data'), check_vma=False)
    except ImportError:                        # pragma: no cover
        from jax.experimental.shard_map import shard_map
        wrapped = shard_map(inner, mesh=mesh, in_specs=in_specs,
                            out_specs=P('data'), check_rep=False)
    return wrapped(*args)


def teacher_fused_supported(top, B, Td, T, W, A, has_enc_mask,
                            mesh=None):
    """Engagement test for the fused teacher scan: TPU backend,
    MXU-aligned widths, chunkable T, no padding mask (the kernels apply
    the window mask only), and a bounded backward working set (stacks
    are HBM-resident; very large B falls back to dense autodiff, which
    remat handles). With `mesh`, the kernel runs per data shard under
    shard_map (teacher_top_fused_sharded), so the shard-local batch is
    what must divide and budget."""
    if jax.default_backend() not in ('tpu', 'axon'):
        return False
    if mesh is not None:
        dp = mesh.shape.get('data', 1)
        if B % dp != 0:
            return False
        B = B // dp
    elif jax.device_count() > 1:
        # multi-device without a declared mesh: GSPMD would gather the
        # pallas operands to one device
        return False
    if has_enc_mask or W % 128 or A % 128 or T % 8:
        return False
    itemsize = jnp.dtype(top['cell']['recurrent_kernel'].dtype).itemsize
    # backward stacks: zs residual + dz + ds/dctx/dwvec + hs/cs/aa
    # (HBM, not VMEM — ~3 GB at B=1024/T=128 bf16, fine on the 16 GB
    # chip next to params/optimizer/batch; measured engaged and faster
    # there, see NOTES round 5)
    stack_bytes = (Td * B * 4 * W * 2 * itemsize
                   + Td * B * (T + A + 3 * W + T) * itemsize
                   + 2 * B * T * (W + A) * 4)
    # f32 training (the reference-parity mode, not the perf mode) keeps
    # the known-good dense-autodiff path at large shapes: the f32
    # kernel's ~4.5 GB stacks at B=1024 fail Mosaic compilation on the
    # v5e (bisected round 5 — the bf16 arm at the same shape is fine)
    budget = (2_500 if itemsize >= 4 else 6_000) * 1024 * 1024
    if stack_bytes > budget:
        return False
    return pick_bt(T, W, A, itemsize) >= 16
