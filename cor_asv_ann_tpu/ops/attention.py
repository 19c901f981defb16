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

import jax.numpy as jnp


def attention_step(W_a, v_a, b_UW, b_v, h_prev, prev_a, attended, u,
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
    e = jnp.exp(mm(jnp.tanh(w[:, None, :] + u), v_a) + b_v)[..., 0]
    if mask is not None:
        e = e * mask
    if window_width and window_width > 0:
        steps = jnp.arange(T, dtype=e.dtype)
        t0 = jnp.dot(prev_a, steps, preferred_element_type=jnp.float32) + 1.0
        visible = jnp.abs(t0[:, None] - steps[None, :]) <= window_width
        e = e * visible
    denom = jnp.sum(e, axis=1, keepdims=True)
    # safe divide: all-masked rows yield a = 0 without inf/NaN gradients
    # (a tiny epsilon would square to zero in the f32 quotient-rule term)
    a = e / jnp.where(denom > 0, denom, 1.0)
    ctx = jnp.einsum('bt,bta->ba', a, attended,
                     preferred_element_type=jnp.float32)
    return ctx, a
