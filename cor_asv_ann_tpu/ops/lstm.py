"""LSTM ops for TPU: scan-based sequence LSTM with hoisted input projection.

Keras cell semantics (gate order i, f, c~, o; sigmoid recurrent activation,
tanh activation) so reference HDF5 weights are directly usable
(reference lib/seq2seq.py:216-232 auto-selects CuDNNLSTM/LSTM with exactly
these semantics; weights are interchangeable across the two).

TPU-first structure: the input projection ``x @ kernel`` for a whole
sequence is one large MXU matmul hoisted out of the recurrence; the
``lax.scan`` body then only contains the (W x 4W) recurrent matmul and the
element-wise gate math, which XLA fuses into a single loop step.
"""

import jax
import jax.numpy as jnp

# scan unroll factor: amortizes per-iteration loop overhead (the scans
# are latency-bound: tiny per-step matmuls)
_UNROLL = 4


def gate_math(z, c_prev):
    """Apply Keras LSTM gate nonlinearities to preactivations z (..., 4N)."""
    n = z.shape[-1] // 4
    i = jax.nn.sigmoid(z[..., :n])
    f = jax.nn.sigmoid(z[..., n:2 * n])
    g = jnp.tanh(z[..., 2 * n:3 * n])
    o = jax.nn.sigmoid(z[..., 3 * n:])
    c = f * c_prev + i * g
    h = o * jnp.tanh(c)
    return h, c


def mm(a, w):
    """Matmul with the activation cast to the weight dtype and float32
    accumulation, the result rounded back to the weight dtype.

    This makes the weight dtype the single compute-precision knob: with
    float32 params everything stays float32 (reference parity); with
    bfloat16 params the activations flowing between ops are bfloat16
    too, which halves the HBM traffic of the recurrent scans (measured
    1.9x on the d2/w512 training step; matmul accumulation stays f32)."""
    out = jnp.dot(a.astype(w.dtype), w, preferred_element_type=jnp.float32)
    return out.astype(w.dtype)


def lstm_step(x, h, c, w):
    """Single LSTM step: x (B, D), h/c (B, N). Returns (h, c)."""
    z = mm(x, w['kernel']) + mm(h, w['recurrent_kernel']) + w['bias']
    return gate_math(z, c)


def attention_cell_preact(cell, cell_in, h, masks):
    """Gate preactivations of the top attention-LSTM cell, with optional
    per-gate variational dropout masks (4, B, D) on the input half.

    The single implementation consumed by BOTH teacher-forced forwards —
    seq2seq._decode_teacher's eval/autodiff body and teacher_scan's
    manual-VJP training forward — so the two cannot silently diverge
    (their equality is pinned by tests/test_teacher_vjp.py::
    test_manual_vjp_forward_matches_windowed). Rounding disciplines:
    with masks, the four per-gate input matmuls and the recurrent matmul
    accumulate in f32 and round ONCE; without, the `mm` per-product
    rounding (reference-parity path)."""
    if masks is not None:
        W = cell['recurrent_kernel'].shape[0]
        kdt = cell['kernel'].dtype
        ks = [jnp.dot((cell_in * masks[g]).astype(kdt),
                      cell['kernel'][:, g * W:(g + 1) * W],
                      preferred_element_type=jnp.float32)
              for g in range(4)]
        z = (jnp.concatenate(ks, axis=-1)
             + jnp.dot(h.astype(kdt),
                       cell['recurrent_kernel'],
                       preferred_element_type=jnp.float32)
             ).astype(kdt) + cell['bias']
    else:
        z = mm(cell_in, cell['kernel']) \
            + mm(h, cell['recurrent_kernel']) \
            + cell['bias']
    return z


def lstm_scan(xs, w, h0=None, c0=None, reverse=False, mask=None):
    """Run an LSTM over xs (B, T, D). Returns (outputs (B, T, N), h, c).

    The input projection runs as one batched matmul over all timesteps;
    the scan carries (h, c) and consumes precomputed preactivations.

    With `mask` (B, T) the recurrence skips masked-out timesteps (the
    carry passes through unchanged and the output is zero there) — this
    makes results independent of padded length. Without it, padding runs
    through the recurrence like the reference (seq2seq.py:1026-1043).
    """
    B, T, _ = xs.shape
    N = w['recurrent_kernel'].shape[0]
    dt = w['recurrent_kernel'].dtype
    h = jnp.zeros((B, N), dt) if h0 is None else h0.astype(dt)
    c = jnp.zeros((B, N), dt) if c0 is None else c0.astype(dt)
    zx = mm(xs, w['kernel']) + w['bias']
    rk = w['recurrent_kernel']

    if mask is None:
        def body(carry, z_t):
            h, c = carry
            z = z_t + mm(h, rk)
            h, c = gate_math(z, c)
            return (h, c), h

        zx_t = jnp.swapaxes(zx, 0, 1)  # (T, B, 4N) scan over time
        (h, c), out = jax.lax.scan(body, (h, c), zx_t, reverse=reverse,
                               unroll=_UNROLL)
        return jnp.swapaxes(out, 0, 1), h, c

    def body(carry, inp):
        h, c = carry
        z_t, m_t = inp
        z = z_t + mm(h, rk)
        h_new, c_new = gate_math(z, c)
        m = m_t[:, None]
        h = jnp.where(m, h_new, h)
        c = jnp.where(m, c_new, c)
        return (h, c), jnp.where(m, h_new, 0.0)

    zx_t = jnp.swapaxes(zx, 0, 1)
    mask_t = jnp.swapaxes(mask, 0, 1)
    (h, c), out = jax.lax.scan(body, (h, c), (zx_t, mask_t),
                               reverse=reverse, unroll=_UNROLL)
    return jnp.swapaxes(out, 0, 1), h, c
