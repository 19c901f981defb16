"""Local monotonic additive attention (Bahdanau with windowing).

Re-derivation of reference DenseAnnotationAttention
(lib/attention.py:440-621): the state-independent half of the additive
energy, u = enc_out @ A, is precomputed once per line; per decoder step the
energies are

    e_i = exp( tanh(h_prev @ W_a + b_UW + u_i) @ v_a + b_v )

masked to the local window |t0 - i| <= window_width around the expected
source position t0 = prev_alignment . arange + 1 ("local attention hack",
attention.py:544-569), normalized into the alignment vector a which is both
the context weighting and the attention state carried to the next step.
"""

import jax
import jax.numpy as jnp


def attention_step(W_a, v_a, b_UW, b_v, h_prev, prev_a, attended, u,
                   window_width=5, mask=None):
    """One attention step over the full attended length T (see below).

    `attention_step_shared` computes the same quantities through a
    batch-shared contiguous slice — the fast path for batch decoding."""
    return _attention_step(W_a, v_a, b_UW, b_v, h_prev, prev_a, attended,
                           u, window_width, mask)


def attention_step_shared(W_a, v_a, b_UW, b_v, h_prev, prev_a, attended, u,
                          window_width=5, shared_width=32, mask=None,
                          exclude=None):
    """Attention step reading only a batch-shared contiguous window.

    TPU-first optimization for batch decoding: the local monotonic window
    (±window_width around each line's expected source position t0) makes
    all but ~11 positions invisible, and because alignments advance
    monotonically ~1 position per emitted character, *all* lines' windows
    cluster around the same source position at any decode step. One
    contiguous `dynamic_slice` [lo, lo+shared_width) of `u` and `attended`
    therefore covers every line's window on almost every step — replacing
    the dense per-step re-read of the full (B, T, ·) tensors (the HBM
    bottleneck of batch decode) with a slice `shared_width/T` the size,
    streamed contiguously (XLA row-gather would be far slower per byte).
    When the live lines' windows spread wider than `shared_width` (rare:
    heavy insert/delete drift), a `lax.cond` falls back to the dense step,
    so visibility semantics are *identical* to `attention_step` — only
    float summation order inside the softmax may differ.

    `exclude` (B,) marks lines whose window must not constrain the shared
    slice (finished lines: their alignment stops being meaningful but
    keeps stepping; their context/alignment results are never consumed).

    Returns (context (B, A), alignment (B, T)).
    """
    from .lstm import mm
    B, T, A = attended.shape
    SW = shared_width
    if not window_width or window_width <= 0 or T <= SW:
        # global attention (window_width 0) has no window to share — the
        # shared branch's |t0-pos| <= ww keep-mask would differ from the
        # dense branch, which skips it entirely (_attention_step guard)
        return _attention_step(W_a, v_a, b_UW, b_v, h_prev, prev_a,
                               attended, u, window_width, mask)
    if T > 256 and jnp.dtype(prev_a.dtype).itemsize < 4:
        # in low precision the dense branch compares window positions on
        # the bf16 integer grid, which is exact only up to 256; beyond
        # that the two cond branches would disagree on visibility, so
        # stay dense (such lengths use the windowed-gather decoder
        # anyway, models/api.py:WINDOWED_DECODE_MIN_T)
        return _attention_step(W_a, v_a, b_UW, b_v, h_prev, prev_a,
                               attended, u, window_width, mask)
    ww = window_width
    steps = jnp.arange(T, dtype=prev_a.dtype)
    t0 = jnp.dot(prev_a, steps, preferred_element_type=jnp.float32) + 1.0
    if exclude is not None:
        t0_lo = jnp.where(exclude, jnp.inf, t0)
        t0_hi = jnp.where(exclude, -jnp.inf, t0)
    else:
        t0_lo = t0_hi = t0
    lo_f = jnp.floor(jnp.min(t0_lo)) - ww
    hi_f = jnp.ceil(jnp.max(t0_hi)) + ww
    fits = (hi_f - lo_f + 1.0) <= SW
    lo = jnp.clip(lo_f.astype(jnp.int32), 0, T - SW)

    def shared(_):
        u_s = jax.lax.dynamic_slice(u, (0, lo, 0), (B, SW, u.shape[2]))
        att_s = jax.lax.dynamic_slice(attended, (0, lo, 0), (B, SW, A))
        w = mm(h_prev, W_a) + b_UW
        s = (mm(jnp.tanh(w[:, None, :] + u_s), v_a) + b_v)[..., 0]
        pos = (lo + jnp.arange(SW)).astype(t0.dtype)
        keep = jnp.abs(t0[:, None] - pos[None, :]) <= ww
        if mask is not None:
            mask_s = jax.lax.dynamic_slice(
                mask.astype(bool), (0, lo), (B, SW))
            keep = keep & mask_s
        s = jnp.where(keep, s, -1e30)
        a_s = jax.nn.softmax(s, axis=1)
        a_s = a_s * jnp.any(keep, axis=1, keepdims=True)
        # elementwise multiply+reduce (not dot_general): XLA fuses it with
        # the dynamic slice, so the attended window streams from HBM once
        ctx = jnp.sum(a_s.astype(jnp.float32)[:, :, None]
                      * att_s.astype(jnp.float32), axis=1)
        a_full = jax.lax.dynamic_update_slice(
            jnp.zeros((B, T), a_s.dtype), a_s, (0, lo))
        return ctx, a_full

    def dense(_):
        return _attention_step(W_a, v_a, b_UW, b_v, h_prev, prev_a,
                               attended, u, window_width, mask)

    return jax.lax.cond(fits, shared, dense, None)


def _attention_step(W_a, v_a, b_UW, b_v, h_prev, prev_a, attended, u,
                    window_width=5, mask=None):
    """One attention step.

    h_prev (B, W): previous top-cell hidden state; prev_a (B, T): previous
    alignment; attended (B, T, A); u (B, T, W) precomputed projection.
    With `mask` (B, T), energies outside the true line extent are zeroed
    (used in mask_padding mode). Returns (context (B, A), alignment (B, T)).
    """
    from .lstm import mm
    T = attended.shape[1]
    w = mm(h_prev, W_a) + b_UW
    # energies; normalized with a numerically stable softmax — identical
    # alignments to the reference's raw exp/sum (attention.py:539-571)
    # but immune to exp overflow once v_a grows during training
    s = (mm(jnp.tanh(w[:, None, :] + u), v_a) + b_v)[..., 0]  # (B, T)
    keep = jnp.ones_like(s, dtype=bool)
    if mask is not None:
        keep = keep & mask.astype(bool)
    if window_width and window_width > 0:
        steps = jnp.arange(T, dtype=s.dtype)
        t0 = jnp.dot(prev_a, steps, preferred_element_type=jnp.float32) + 1.0
        keep = keep & (jnp.abs(t0[:, None] - steps[None, :])
                       <= window_width)
    s = jnp.where(keep, s, -1e30)
    a = jax.nn.softmax(s, axis=1)
    # all-masked rows (possible in mask_padding mode) get zero alignment
    a = a * jnp.any(keep, axis=1, keepdims=True)
    ctx = jnp.einsum('bt,bta->ba', a, attended,
                     preferred_element_type=jnp.float32)
    return ctx, a
