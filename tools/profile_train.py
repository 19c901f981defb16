"""Per-segment roofline profile of the training step (the decode
counterpart is tools/profile_decode.py; VERDICT round 3 asked for this).

Times each stage of train_step in isolation on the live device with the
chained-timing protocol (inputs pinned, iterations chained through a
0-valued data dependency, one final fetch — see bench.py): full step,
grad-only, forward-only, encoder fwd / fwd+bwd, lower decoder scan,
teacher-forced top attention scan fwd / fwd+bwd, and the dense
attention-energy block alone. Prints one JSON line with ms per segment
plus derived shares so the MFU bound (BENCH train.mfu_bf16) can be
attributed to a specific stage rather than guessed.

Usage: python tools/profile_train.py [batch] [t] [steps]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def chained_time(fn, chain_in, steps, fetch):
    """Run fn(chain_in) -> (out, chain_scalar) `steps` times, feeding a
    0-valued dependency on each iteration's chain scalar back into the
    next iteration's input; fetch(out) is the sync point."""
    out, ch = fn(chain_in)
    fetch(out)           # compile + warm
    x = chain_in
    for _ in range(2):   # throwaway: compiles the chain ops
        out, ch = fn(x)
        x = chain_in + (ch * 0).astype(chain_in.dtype)
    fetch(out)
    t0 = time.perf_counter()
    x = chain_in
    for _ in range(steps):
        out, ch = fn(x)
        x = chain_in + (ch * 0).astype(chain_in.dtype)
    fetch(out)
    return (time.perf_counter() - t0) / steps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    t_enc = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import jax
    import jax.numpy as jnp
    sys.path.insert(0, REPO)
    import bench
    from cor_asv_ann_tpu.models import seq2seq as S
    from cor_asv_ann_tpu.models import train as T
    from cor_asv_ann_tpu.ops.lstm import lstm_scan
    from cor_asv_ann_tpu.ops.attention import attention_step

    config, mapping, params = bench.build(512, 2, 96)
    V, W = mapping.voc_size, config.width
    rng = np.random.default_rng(7)
    idx = rng.integers(1, V, size=(batch, t_enc))
    enc = np.zeros((batch, t_enc, V), np.float32)
    enc[np.arange(batch)[:, None], np.arange(t_enc)[None, :], idx] = 1.0
    dec_in = np.zeros((batch, t_enc + 1, V), np.float32)
    dec_in[:, 1:] = enc
    dec_out = np.concatenate([enc, np.zeros((batch, 1, V), np.float32)], 1)
    weights = (dec_out.sum(-1) > 0).astype(np.float32)

    enc_d, din_d, dout_d, w_d = map(jax.device_put,
                                    (enc, dec_in, dec_out, weights))
    key = jax.random.PRNGKey(0)
    opt = T.make_optimizer(1e-3)
    p32 = jax.tree_util.tree_map(jnp.asarray, params)
    pb = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, p32)
    opt_state = opt.init(p32)
    res = {'batch': batch, 't': t_enc}

    # --- full train step (bf16 mixed precision) -------------------------
    def full_step(e):
        p2, _, loss = T.train_step(p32, opt_state, config, e, din_d,
                                   dout_d, w_d, key, lm_loss=False,
                                   optimizer=opt,
                                   compute_dtype='bfloat16')
        return loss, loss
    res['full_step'] = chained_time(full_step, enc_d, steps, float)

    # --- value_and_grad only (no optimizer) -----------------------------
    @jax.jit
    def grad_only(e):
        def lossf(p):
            return T.loss_fn(
                jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16)
                    if a.dtype == jnp.float32 else a, p),
                config, e, din_d, dout_d, w_d, key, False)
        loss, grads = jax.value_and_grad(lossf)(p32)
        # fold a grad reduction into the chain scalar: without consuming
        # the grads XLA dead-code-eliminates the entire backward pass
        # (this made every *bwd segment report forward-only time once)
        gsum = sum(jnp.sum(g.astype(jnp.float32))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss, loss + gsum
    res['grad_only'] = chained_time(grad_only, enc_d, steps, float)

    # --- forward loss only ----------------------------------------------
    @jax.jit
    def fwd_only(e):
        loss = T.loss_fn(pb, config, e, din_d, dout_d, w_d, key, False)
        return loss, loss
    res['forward_only'] = chained_time(fwd_only, enc_d, steps, float)

    # --- encoder fwd / fwd+bwd ------------------------------------------
    @jax.jit
    def enc_fwd(e):
        att, states, u = S.encode(pb, config, e, key, True)
        s = jnp.sum(att.astype(jnp.float32)) + jnp.sum(u.astype(jnp.float32))
        return s, s
    res['encode_fwd'] = chained_time(enc_fwd, enc_d, steps, float)

    @jax.jit
    def enc_bwd(e):
        def f(p):
            att, states, u = S.encode(p, config, e, key, True)
            return (jnp.sum(att.astype(jnp.float32))
                    + jnp.sum(u.astype(jnp.float32)))
        s, g = jax.value_and_grad(f)(pb)
        gs = sum(jnp.sum(x.astype(jnp.float32))
                 for x in jax.tree_util.tree_leaves(g))
        return s, s + gs
    res['encode_fwdbwd'] = chained_time(enc_bwd, enc_d, steps, float)

    # --- lower decoder scan fwd+bwd (isolated) --------------------------
    x_low = jax.device_put(
        rng.standard_normal((batch, t_enc + 1, W)).astype(np.float32) * .1
    ).astype(jnp.bfloat16)

    @jax.jit
    def lower_bwd(x):
        def f(p):
            out, _, _ = lstm_scan(x, p['decoder'][0],
                                  jnp.zeros((batch, W), jnp.bfloat16),
                                  jnp.zeros((batch, W), jnp.bfloat16))
            return jnp.sum(out.astype(jnp.float32))
        s, g = jax.value_and_grad(f)(pb)
        gs = sum(jnp.sum(x.astype(jnp.float32))
                 for x in jax.tree_util.tree_leaves(g))
        return s, s + gs
    res['lower_scan_fwdbwd'] = chained_time(lower_bwd, x_low, steps, float)

    # --- fused whole-sequence Pallas scan A/B (same shapes as above) ----
    from cor_asv_ann_tpu.ops.pallas_lstm_train import (lstm_scan_fused,
                                                       fused_scan_supported)
    if fused_scan_supported(pb['decoder'][0], batch, W):
        @jax.jit
        def lower_fused_fwd(x):
            out, hT, cT = lstm_scan_fused(x, pb['decoder'][0],
                                          jnp.zeros((batch, W), jnp.bfloat16),
                                          jnp.zeros((batch, W), jnp.bfloat16))
            s = jnp.sum(out.astype(jnp.float32))
            return s, s
        res['lower_scan_fused_fwd'] = chained_time(lower_fused_fwd, x_low,
                                                   steps, float)

        @jax.jit
        def lower_fused_bwd(x):
            def f(p):
                out, _, _ = lstm_scan_fused(
                    x, p['decoder'][0],
                    jnp.zeros((batch, W), jnp.bfloat16),
                    jnp.zeros((batch, W), jnp.bfloat16))
                return jnp.sum(out.astype(jnp.float32))
            s, g = jax.value_and_grad(f)(pb)
            gs = sum(jnp.sum(x.astype(jnp.float32))
                     for x in jax.tree_util.tree_leaves(g))
            return s, s + gs
        res['lower_scan_fused_fwdbwd'] = chained_time(lower_fused_bwd,
                                                      x_low, steps, float)

        @jax.jit
        def lower_xla_fwd(x):
            out, hT, cT = lstm_scan(x, pb['decoder'][0],
                                    jnp.zeros((batch, W), jnp.bfloat16),
                                    jnp.zeros((batch, W), jnp.bfloat16))
            s = jnp.sum(out.astype(jnp.float32))
            return s, s
        res['lower_scan_xla_fwd'] = chained_time(lower_xla_fwd, x_low,
                                                 steps, float)

        # full train step with the fused scan adopted. The flag is read
        # at TRACE time, so the compile cache from the earlier full_step
        # timing must be dropped or the same program would be reused.
        jax.clear_caches()
        old_flag = S._FUSED_TRAIN_SCAN
        S._FUSED_TRAIN_SCAN = 'on'
        try:
            def full_step_fused(e):
                p2, _, loss = T.train_step(p32, opt_state, config, e,
                                           din_d, dout_d, w_d, key,
                                           lm_loss=False, optimizer=opt,
                                           compute_dtype='bfloat16')
                return loss, loss
            res['full_step_fused_scan'] = chained_time(
                full_step_fused, enc_d, steps, float)
        finally:
            S._FUSED_TRAIN_SCAN = old_flag
            jax.clear_caches()

    # --- PRODUCTION teacher-forced decoder (_decode_teacher: embedding,
    # lower scans, windowed-attention top scan, tied softmax head) -------
    states0 = [(jnp.zeros((batch, W), jnp.bfloat16),
                jnp.zeros((batch, W), jnp.bfloat16))
               for _ in range(config.depth)]
    att_p = jax.device_put(rng.standard_normal(
        (batch, t_enc, W)).astype(np.float32) * .1).astype(jnp.bfloat16)
    u_p = jax.device_put(rng.standard_normal(
        (batch, t_enc, W)).astype(np.float32) * .1).astype(jnp.bfloat16)

    @jax.jit
    def teacher_fwd(e):
        probs = S._decode_teacher(pb, config, din_d, states0, att_p, u_p,
                                  key, True)
        s = jnp.sum(probs.astype(jnp.float32))
        return s, s
    res['teacher_fwd'] = chained_time(teacher_fwd, enc_d, steps, float)

    @jax.jit
    def teacher_bwd(e):
        def f(p, att, u):
            probs = S._decode_teacher(p, config, din_d, states0, att, u,
                                      key, True)
            return jnp.sum(probs.astype(jnp.float32))
        s, g = jax.value_and_grad(f, argnums=(0, 1, 2))(pb, att_p, u_p)
        gs = sum(jnp.sum(x.astype(jnp.float32))
                 for x in jax.tree_util.tree_leaves(g))
        return s, s + gs
    res['teacher_fwdbwd'] = chained_time(teacher_bwd, enc_d, steps, float)

    # --- manual-VJP teacher scan A/B (same-session; trace-time flags).
    # Forces the WINDOWED attention for both arms so the A/B isolates
    # the VJP even below _TEACHER_WINDOWED_MIN_T (at the default T=128
    # the shipped path is dense — run with t=256 to profile the shipped
    # windowed regime).
    old_att = getattr(S, '_TEACHER_ATTENTION', None)
    for mode in ('off', 'on'):
        jax.clear_caches()
        old_vjp = getattr(S, '_TEACHER_VJP', None)
        if old_vjp is None or old_att is None:
            break
        S._TEACHER_VJP = mode
        S._TEACHER_ATTENTION = 'windowed'
        try:
            @jax.jit
            def teacher_bwd_mode(e):
                def f(p, att, u):
                    probs = S._decode_teacher(p, config, din_d, states0,
                                              att, u, key, True)
                    return jnp.sum(probs.astype(jnp.float32))
                s, g = jax.value_and_grad(f, argnums=(0, 1, 2))(
                    pb, att_p, u_p)
                gs = sum(jnp.sum(x.astype(jnp.float32))
                         for x in jax.tree_util.tree_leaves(g))
                return s, s + gs
            res['teacher_fwdbwd_vjp_%s' % mode] = chained_time(
                teacher_bwd_mode, enc_d, steps, float)

            def full_step_mode(e):
                p2, _, loss = T.train_step(p32, opt_state, config, e,
                                           din_d, dout_d, w_d, key,
                                           lm_loss=False, optimizer=opt,
                                           compute_dtype='bfloat16')
                return loss, loss
            res['full_step_vjp_%s' % mode] = chained_time(
                full_step_mode, enc_d, steps, float)
        finally:
            S._TEACHER_VJP = old_vjp
            S._TEACHER_ATTENTION = old_att
    jax.clear_caches()

    # --- teacher-forced top attention scan ------------------------------
    att_in = jax.device_put(rng.standard_normal(
        (batch, t_enc, W)).astype(np.float32) * .1).astype(jnp.bfloat16)
    u_in = jax.device_put(rng.standard_normal(
        (batch, t_enc, W)).astype(np.float32) * .1).astype(jnp.bfloat16)

    def top_scan(p, x, att, u):
        top = p['decoder'][config.depth - 1]
        h0 = jnp.zeros((batch, W), jnp.bfloat16)
        c0 = jnp.zeros((batch, W), jnp.bfloat16)
        a0 = jnp.zeros((batch, t_enc), jnp.bfloat16)

        def body(carry, x_t):
            h, c, a = carry
            ctx, a_new = attention_step(
                top['W_a'], top['v_a'], top['b_UW'], top['b_v'],
                h, a, att, u, config.window_width)
            from cor_asv_ann_tpu.ops.lstm import mm, gate_math
            cell_in = jnp.concatenate([x_t, ctx.astype(x_t.dtype)], -1)
            z = mm(cell_in, top['cell']['kernel']) \
                + mm(h, top['cell']['recurrent_kernel']) \
                + top['cell']['bias']
            h2, c2 = gate_math(z, c)
            return (h2, c2, a_new), h2
        xs = jnp.swapaxes(x, 0, 1)
        _, hs = jax.lax.scan(jax.checkpoint(body), (h0, c0, a0), xs,
                             unroll=S._TEACHER_UNROLL)
        return jnp.sum(hs.astype(jnp.float32))

    @jax.jit
    def top_fwd(x):
        s = top_scan(pb, x, att_in, u_in)
        return s, s
    res['top_scan_fwd'] = chained_time(top_fwd, x_low, steps, float)

    @jax.jit
    def top_bwd(x):
        s, g = jax.value_and_grad(top_scan, argnums=(0, 1, 2, 3))(
            pb, x, att_in, u_in)
        gs = sum(jnp.sum(x2.astype(jnp.float32))
                 for x2 in jax.tree_util.tree_leaves(g))
        return s, s + gs
    res['top_scan_fwdbwd'] = chained_time(top_bwd, x_low, steps, float)

    # --- dense attention-energy block alone (one step, x Td) ------------
    h_one = jax.device_put(rng.standard_normal(
        (batch, W)).astype(np.float32) * .1).astype(jnp.bfloat16)
    a_one = jnp.zeros((batch, t_enc), jnp.bfloat16)
    top = pb['decoder'][config.depth - 1]

    @jax.jit
    def energy_only(h):
        def step(carry, _):
            hh = carry
            ctx, a_new = attention_step(
                top['W_a'], top['v_a'], top['b_UW'], top['b_v'],
                hh, a_one, att_in, u_in, config.window_width)
            return hh + ctx.astype(hh.dtype) * 0, ctx
        _, ctxs = jax.lax.scan(step, h, None, length=t_enc + 1)
        s = jnp.sum(ctxs.astype(jnp.float32))
        return s, s
    res['attention_only_fwd'] = chained_time(energy_only, h_one, steps,
                                             float)

    # --- output projection + xent fwd+bwd -------------------------------
    h_all = jax.device_put(rng.standard_normal(
        (batch, t_enc + 1, W)).astype(np.float32) * .1).astype(jnp.bfloat16)

    @jax.jit
    def head_bwd(h):
        def f(p):
            probs = S._output_probs(p, h)
            return T.weighted_xent(probs, dout_d, w_d)
        s, g = jax.value_and_grad(f)(pb)
        gs = sum(jnp.sum(x.astype(jnp.float32))
                 for x in jax.tree_util.tree_leaves(g))
        return s, s + gs
    res['head_fwdbwd'] = chained_time(head_bwd, h_all, steps, float)

    for k in list(res):
        if k not in ('batch', 't'):
            res[k] = round(res[k] * 1e3, 2)
    res['backend'] = jax.default_backend()
    print(json.dumps(res))


if __name__ == '__main__':
    main()
