"""Pallas TPU kernel: fully fused greedy-decode step (depth-2 models).

One kernel per decoded character instead of ~10 XLA ops: character
embedding of the softmax feedback, LSTM layer 1, windowed additive
attention, the attention LSTM cell, and the weight-tied output projection
+ softmax all execute in a single pallas_call with every weight matrix
resident in VMEM (bfloat16 weights ~11MB for the flagship d2/w512
topology; float32 accumulation and gate math). The host-side while_loop
only computes the attention window gathers (data-dependent) and the
argmax/termination bookkeeping between kernel calls.

This is the first-party replacement for the cuDNN fused LSTM path of the
reference (SURVEY.md 2.9) taken toward its TPU conclusion: the per-step
working set never leaves the chip.

Performance note (measured on v5e): at large batch (1024) the XLA per-op
path wins — each XLA matmul streams the weights once per step across the
whole batch, while this kernel re-fetches all ~11MB of weights per
32-row batch tile (VMEM cannot hold weights plus larger tiles). The
kernel is correctness-complete and is the building block for the next
step: the *entire decode loop* in one kernel with weights resident in
VMEM across characters, which removes per-step weight traffic entirely.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gates(z, c_prev):
    n = z.shape[-1] // 4
    i = jax.nn.sigmoid(z[:, :n])
    f = jax.nn.sigmoid(z[:, n:2 * n])
    g = jnp.tanh(z[:, 2 * n:3 * n])
    o = jax.nn.sigmoid(z[:, 3 * n:])
    c = f * c_prev + i * g
    return o * jnp.tanh(c), c


def _fused_step_kernel(fb_ref, h1_ref, c1_ref, h2_ref, c2_ref,
                       uw_ref, aw_ref, vis_ref,
                       e_ref, k1_ref, r1_ref, b1_ref,
                       k2_ref, r2_ref, b2_ref,
                       wa_ref, va_ref, buw_ref, bv_ref,
                       probs_ref, h1o_ref, c1o_ref, h2o_ref, c2o_ref,
                       align_ref):
    f32 = jnp.float32
    # embedding of the softmax feedback (weight-tied input projection)
    x = jnp.dot(fb_ref[:].astype(e_ref.dtype), e_ref[:],
                preferred_element_type=f32)
    # LSTM layer 1
    z1 = (jnp.dot(x.astype(k1_ref.dtype), k1_ref[:],
                  preferred_element_type=f32)
          + jnp.dot(h1_ref[:].astype(r1_ref.dtype), r1_ref[:],
                    preferred_element_type=f32)
          + b1_ref[:])
    h1, c1 = _gates(z1, c1_ref[:])
    h1o_ref[:] = h1
    c1o_ref[:] = c1
    # windowed additive attention from the previous top-cell state
    w_vec = (jnp.dot(h2_ref[:].astype(wa_ref.dtype), wa_ref[:],
                     preferred_element_type=f32) + buw_ref[:])   # (bm, W)
    t = jnp.tanh(w_vec[:, None, :] + uw_ref[:].astype(f32))     # bm,WIN,W
    s = (jnp.dot(t.astype(va_ref.dtype).reshape(t.shape[0] * t.shape[1],
                                                t.shape[2]),
                 va_ref[:], preferred_element_type=f32)
         .reshape(t.shape[0], t.shape[1]) + bv_ref[0, 0])        # bm,WIN
    vis = vis_ref[:] > 0
    s = jnp.where(vis, s, -1e30)
    s = s - jnp.max(s, axis=1, keepdims=True)
    es = jnp.exp(s)
    a = es / jnp.sum(es, axis=1, keepdims=True)
    a = a * jnp.any(vis, axis=1, keepdims=True)
    align_ref[:] = a
    ctx = jnp.sum(a[:, :, None] * aw_ref[:].astype(f32), axis=1)
    # attention LSTM cell: input = [h1, ctx]
    cell_in = jnp.concatenate([h1, ctx], axis=-1)
    z2 = (jnp.dot(cell_in.astype(k2_ref.dtype), k2_ref[:],
                  preferred_element_type=f32)
          + jnp.dot(h2_ref[:].astype(r2_ref.dtype), r2_ref[:],
                    preferred_element_type=f32)
          + b2_ref[:])
    h2, c2 = _gates(z2, c2_ref[:])
    h2o_ref[:] = h2
    c2o_ref[:] = c2
    # weight-tied output projection + softmax
    logits = jax.lax.dot_general(
        h2.astype(e_ref.dtype), e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    logits = logits - jnp.max(logits, axis=1, keepdims=True)
    el = jnp.exp(logits)
    probs_ref[:] = el / jnp.sum(el, axis=1, keepdims=True)


@functools.partial(jax.jit,
                   static_argnames=('block_b', 'interpret'))
def fused_decode_step(fb, h1, c1, h2, c2, u_w, att_w, visible, weights,
                      block_b=32, interpret=False):
    """One fused decode step.

    fb (B,V) softmax feedback; h1/c1/h2/c2 (B,W); u_w (B,WIN,W) gathered
    attention projections; att_w (B,WIN,A) gathered encoder rows; visible
    (B,WIN) attention mask. `weights`: dict with E (V,W), k1/r1/b1,
    k2/r2/b2, W_a (W,W), v_a (W,1), b_UW (W,), b_v (1,) — pass bfloat16
    matrices for full MXU throughput. Returns (probs, h1, c1, h2, c2,
    align (B,WIN)).
    """
    B, V = fb.shape
    W = h1.shape[-1]
    WIN = u_w.shape[1]
    A = att_w.shape[-1]
    bm = min(block_b, B)
    pad = (-B) % bm
    if pad:
        fb, h1, c1, h2, c2, u_w, att_w, visible = [
            jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
            for x in (fb, h1, c1, h2, c2, u_w, att_w, visible)]
    Bp = B + pad
    grid = (Bp // bm,)

    def tile(shape):
        return pl.BlockSpec(shape, lambda i: (i,) + (0,) * (len(shape) - 1),
                            memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    wts = weights
    out = pl.pallas_call(
        _fused_step_kernel,
        grid=grid,
        in_specs=[
            tile((bm, V)), tile((bm, W)), tile((bm, W)),
            tile((bm, W)), tile((bm, W)),
            tile((bm, WIN, W)), tile((bm, WIN, A)), tile((bm, WIN)),
            full((V, W)),
            full((W, 4 * W)), full((W, 4 * W)), full((1, 4 * W)),
            full((W + A, 4 * W)), full((W, 4 * W)), full((1, 4 * W)),
            full((W, W)), full((W, 1)), full((1, W)), full((1, 1)),
        ],
        out_specs=[
            tile((bm, V)), tile((bm, W)), tile((bm, W)),
            tile((bm, W)), tile((bm, W)), tile((bm, WIN)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, V), jnp.float32),
            jax.ShapeDtypeStruct((Bp, W), jnp.float32),
            jax.ShapeDtypeStruct((Bp, W), jnp.float32),
            jax.ShapeDtypeStruct((Bp, W), jnp.float32),
            jax.ShapeDtypeStruct((Bp, W), jnp.float32),
            jax.ShapeDtypeStruct((Bp, WIN), jnp.float32),
        ],
        interpret=interpret,
    )(fb, h1, c1, h2, c2, u_w, att_w,
      visible.astype(jnp.float32),
      wts['E'], wts['k1'], wts['r1'], wts['b1'].reshape(1, -1),
      wts['k2'], wts['r2'], wts['b2'].reshape(1, -1),
      wts['W_a'], wts['v_a'], wts['b_UW'].reshape(1, -1),
      wts['b_v'].reshape(1, 1))
    probs, h1o, c1o, h2o, c2o, align = out
    if pad:
        return (probs[:B], h1o[:B], c1o[:B], h2o[:B], c2o[:B], align[:B])
    return probs, h1o, c1o, h2o, c2o, align


def pack_weights(params, dtype=jnp.bfloat16):
    """Extract the depth-2 decode weights as a flat dict (cast matrices
    to `dtype`, keep biases float32)."""
    def cast(a):
        return jnp.asarray(a).astype(dtype)
    top = params['decoder'][1]
    return dict(
        E=cast(params['char_embedding']['kernel']),
        k1=cast(params['decoder'][0]['kernel']),
        r1=cast(params['decoder'][0]['recurrent_kernel']),
        b1=jnp.asarray(params['decoder'][0]['bias'], jnp.float32),
        k2=cast(top['cell']['kernel']),
        r2=cast(top['cell']['recurrent_kernel']),
        b2=jnp.asarray(top['cell']['bias'], jnp.float32),
        W_a=cast(top['W_a']),
        v_a=cast(top['v_a']),
        b_UW=jnp.asarray(top['b_UW'], jnp.float32),
        b_v=jnp.asarray(top['b_v'], jnp.float32),
    )
