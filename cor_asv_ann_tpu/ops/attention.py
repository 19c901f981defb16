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
