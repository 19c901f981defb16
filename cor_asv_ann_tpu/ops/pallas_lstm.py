"""Pallas TPU kernel: fused LSTM step.

The hot per-character decode op is one LSTM step per layer:
z = x.K + h.R + b followed by the gate nonlinearities. This kernel fuses
both MXU matmuls with the VPU gate math in a single pallas_call so the
(B, 4W) preactivations never round-trip through HBM — the first-party
replacement for the cuDNN fused LSTM cell the reference depends on
(SURVEY.md 2.9; reference lib/seq2seq.py:216-232 auto-selects CuDNNLSTM).

The kernel tiles the batch over the grid; kernels, recurrent kernels and
bias stay resident in VMEM across the batch tiles. Falls back to
interpreter mode off-TPU (tests run it on the CPU backend).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _lstm_step_kernel(x_ref, h_ref, c_ref, k_ref, r_ref, b_ref,
                      h_out_ref, c_out_ref):
    # mirror ops.lstm.mm exactly: f32 accumulation per matmul, each
    # result rounded to the weight dtype before the sum and gate math
    dt = h_out_ref.dtype
    z = (jnp.dot(x_ref[:], k_ref[:],
                 preferred_element_type=jnp.float32).astype(dt)
         + jnp.dot(h_ref[:], r_ref[:],
                   preferred_element_type=jnp.float32).astype(dt)
         + b_ref[:])
    n = z.shape[-1] // 4
    # manual sigmoid: Mosaic rejects jax.nn.sigmoid's f32 scalar
    # broadcast on bf16 vectors; this form is byte-identical to XLA's
    # logistic on both f32 and bf16 (verified on TPU)
    one = jnp.asarray(1.0, dt)

    def sig(v):
        return one / (one + jnp.exp(-v))

    i = sig(z[:, :n])
    f = sig(z[:, n:2 * n])
    g = jnp.tanh(z[:, 2 * n:3 * n])
    o = sig(z[:, 3 * n:])
    c = f * c_ref[:] + i * g
    h_out_ref[:] = o * jnp.tanh(c)
    c_out_ref[:] = c


@functools.partial(jax.jit, static_argnames=('block_b', 'interpret'))
def lstm_step_fused(x, h, c, kernel, recurrent_kernel, bias,
                    block_b=64, interpret=False):
    """Fused LSTM step: x (B, D), h/c (B, W) -> (h', c').

    Keras gate order (i, f, c~, o), sigmoid recurrent activation —
    identical semantics to ops.lstm.lstm_step.
    """
    B, D = x.shape
    W = h.shape[-1]
    bm = min(block_b, _round_up(B, 8))
    pad_b = _round_up(B, bm)
    if pad_b != B:
        x = jnp.pad(x, ((0, pad_b - B), (0, 0)))
        h = jnp.pad(h, ((0, pad_b - B), (0, 0)))
        c = jnp.pad(c, ((0, pad_b - B), (0, 0)))
    grid = (pad_b // bm,)
    h_out, c_out = pl.pallas_call(
        _lstm_step_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 4 * W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, 4 * W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, W), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # outputs follow the weight dtype, matching ops.lstm.mm's
            # rounding (bf16 params -> bf16 carries, f32 accumulation)
            jax.ShapeDtypeStruct((pad_b, W), kernel.dtype),
            jax.ShapeDtypeStruct((pad_b, W), kernel.dtype),
        ],
        interpret=interpret,
    )(x.astype(kernel.dtype), h.astype(kernel.dtype),
      c.astype(kernel.dtype), kernel, recurrent_kernel,
      bias.reshape(1, -1))
    return h_out[:B], c_out[:B]


def lstm_step_auto(x, h, c, w):
    """Drop-in for ops.lstm.lstm_step using the fused kernel on TPU and
    the interpreter elsewhere.

    On real TPUs the kernel's MXU accumulation order differs from XLA's,
    so results can drift by ~1 ulp of the weight dtype — enough to flip
    greedy argmax ties on low-margin (untrained) models. Trained models
    with confident outputs are unaffected in practice; the float32 path
    stays the parity reference."""
    # sub-lane widths fail Mosaic lowering (same class as the decode
    # kernel's measured w16 'unsupported shape cast'); keep the XLA
    # step for them on hardware
    if (jax.default_backend() in ('tpu', 'axon')
            and w['recurrent_kernel'].shape[0] % 128 != 0):
        from .lstm import lstm_step
        return lstm_step(x, h, c, w)
    on_tpu = jax.default_backend() == 'tpu'
    if x.ndim > 2:
        # hypotheses-parallel callers (models/beam.py) carry (B, K, ...)
        # shapes; the kernel grid is 2D, so flatten the leading dims
        lead = x.shape[:-1]
        h2, c2 = lstm_step_fused(
            x.reshape(-1, x.shape[-1]), h.reshape(-1, h.shape[-1]),
            c.reshape(-1, c.shape[-1]), w['kernel'],
            w['recurrent_kernel'], w['bias'], interpret=not on_tpu)
        return (h2.reshape(lead + h2.shape[-1:]),
                c2.reshape(lead + c2.shape[-1:]))
    return lstm_step_fused(x, h, c, w['kernel'], w['recurrent_kernel'],
                           w['bias'], interpret=not on_tpu)
