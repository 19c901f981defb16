"""Pallas TPU kernel: fused whole-sequence LSTM scan, differentiable.

The training step is latency-bound on ~1000 sequential tiny-matmul scan
steps (NOTES.md "Performance map"): each XLA `lax.scan` iteration of an
LSTM re-streams the (W, 4W) recurrent kernel from HBM (2 MB per step at
W=512 bf16) and round-trips the (B, W) carry. This kernel runs the ENTIRE
recurrence — all T steps — inside one pallas_call: the recurrent kernel
is fetched into VMEM once and stays resident across every timestep, the
carry lives in VMEM scratch, and only the per-step preactivations /
outputs stream (pipelined by the Mosaic grid). It is the training-side
counterpart of ops/pallas_decode_loop.py and the first-party answer to
the CuDNN fused LSTM the reference auto-selects for training
(SURVEY.md 2.9; reference lib/seq2seq.py:216-232) — cuDNN fuses the
per-step matmul+gate chain natively, XLA's scan does not.

Differentiable via `jax.custom_vjp`: the forward kernel additionally
saves the cell-state sequence; the backward kernel sweeps time in
reverse inside one launch, recomputing the (cheap, elementwise) gate
values from the saved states and emitting preactivation gradients. The
weight gradient is then two large MXU matmuls OUTSIDE the kernel
(dRk = h_prevᵀ · dZ over all steps at once) — exactly the split the
fused-kernel guidance prescribes (fused sequential part in Pallas, big
batched contractions in XLA).

Numerics mirror ops.lstm exactly where it matters: f32 matmul
accumulation rounded to the weight dtype, Keras gate order (i, f, c~, o),
manual logistic (Mosaic rejects jax.nn.sigmoid's f32 scalar broadcast on
bf16 vectors; the manual form measured byte-identical to XLA's logistic
on TPU — see ops/pallas_lstm.py). The backward accumulates carries in
f32.

Input projections (x @ kernel + bias) stay OUTSIDE as one big MXU matmul
over all timesteps, the same hoisting ops.lstm.lstm_scan does.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lstm import mm


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _sig(v):
    one = jnp.asarray(1.0, v.dtype)
    return one / (one + jnp.exp(-v))


def _fwd_kernel(zx_ref, rk_ref, h0_ref, c0_ref,
                hs_ref, cs_ref, ht_ref, ct_ref, h_s, c_s):
    """One grid step = one timestep for one batch tile.

    Grid (nb, T) iterates t fastest, so the carry scratch (h_s, c_s)
    persists across the whole time sweep of each batch tile; rk's block
    index is constant, so Mosaic fetches it once and keeps it resident.
    """
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h_s[:] = h0_ref[:]
        c_s[:] = c0_ref[:]

    dt = h_s.dtype
    z = (zx_ref[0]
         + jnp.dot(h_s[:], rk_ref[:],
                   preferred_element_type=jnp.float32).astype(dt))
    n = z.shape[-1] // 4
    i = _sig(z[:, :n])
    f = _sig(z[:, n:2 * n])
    g = jnp.tanh(z[:, 2 * n:3 * n])
    o = _sig(z[:, 3 * n:])
    c = f * c_s[:] + i * g
    h = o * jnp.tanh(c)
    h_s[:] = h
    c_s[:] = c
    hs_ref[0] = h
    cs_ref[0] = c
    # final-state blocks live in VMEM across the t sweep (constant block
    # index); writing every step costs a VMEM store, flushed once
    ht_ref[:] = h
    ct_ref[:] = c


def _bwd_kernel(g_ref, ghT_ref, gcT_ref, zx_ref, rk_ref,
                hprev_ref, cprev_ref, cs_ref,
                dzx_ref, dh0_ref, dc0_ref, dh_s, dc_s):
    """Reverse time sweep: grid step j is timestep t = T-1-j (the index
    maps do the reversal, so the kernel body sees 'current step' blocks).

    Recomputes the gate values from the saved neighbor states (cheap VPU
    work — the alternative, saving 4 gate planes, would quadruple the
    forward's output traffic), then emits the preactivation gradient
    dz for this step and carries (dh, dc) in f32 scratch.
    """
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dh_s[:] = ghT_ref[:].astype(jnp.float32)
        dc_s[:] = gcT_ref[:].astype(jnp.float32)

    dt = hprev_ref.dtype
    f32 = jnp.float32
    # recompute gates exactly as the forward did
    z = (zx_ref[0]
         + jnp.dot(hprev_ref[0], rk_ref[:],
                   preferred_element_type=f32).astype(dt))
    n = z.shape[-1] // 4
    i = _sig(z[:, :n]).astype(f32)
    f = _sig(z[:, n:2 * n]).astype(f32)
    g = jnp.tanh(z[:, 2 * n:3 * n]).astype(f32)
    o = _sig(z[:, 3 * n:]).astype(f32)
    th = jnp.tanh(cs_ref[0].astype(f32))

    dh = g_ref[0].astype(f32) + dh_s[:]
    dc = dc_s[:] + dh * o * (1.0 - th * th)
    do = dh * th
    di = dc * g
    dg = dc * i
    df = dc * cprev_ref[0].astype(f32)
    dz = jnp.concatenate(
        [di * i * (1.0 - i),
         df * f * (1.0 - f),
         dg * (1.0 - g * g),
         do * o * (1.0 - o)], axis=-1)
    dzx_ref[0] = dz.astype(dzx_ref.dtype)
    # dh_{t-1} = dz @ rk^T: contract rk's 4W axis (MXU, no transpose)
    dh_s[:] = jax.lax.dot_general(
        dz.astype(dt), rk_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=f32)
    dc_s[:] = dc * f
    # initial-state grads: blocks are index-constant, last write wins
    dh0_ref[:] = dh_s[:].astype(dh0_ref.dtype)
    dc0_ref[:] = dc_s[:].astype(dc0_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _scan_core(zx, rk, h0, c0, reverse, interpret, block_b):
    hs, cs, hT, cT = _scan_core_fwd(zx, rk, h0, c0, reverse, interpret,
                                    block_b)[0]
    return hs, hT, cT


def _fwd_call(zx, rk, h0, c0, reverse, interpret, block_b):
    """zx (T, B, 4N) time-major; returns hs, cs (T, B, N), hT, cT (B, N).

    `reverse` flips the time order via the index maps only — the carry
    still sweeps grid steps 0..T-1, reading/writing block T-1-t.
    """
    T, B, N4 = zx.shape
    N = N4 // 4
    dt = rk.dtype
    # tile rows must be sublane-aligned (16 covers bf16's 16x128 tiling
    # and f32's 8x128): an unaligned user batch (e.g. 100) pads up to
    # one aligned tile instead of emitting unaligned Pallas blocks —
    # the same Mosaic lowering-failure class the width%128 gate guards
    bt = min(_round_up(B, 16), block_b)
    pad_b = _round_up(B, bt)
    if pad_b != B:
        zx = jnp.pad(zx, ((0, 0), (0, pad_b - B), (0, 0)))
        h0 = jnp.pad(h0, ((0, pad_b - B), (0, 0)))
        c0 = jnp.pad(c0, ((0, pad_b - B), (0, 0)))
    nb = pad_b // bt

    if reverse:
        def tmap(i, t):
            return (T - 1 - t, i, 0)
    else:
        def tmap(i, t):
            return (t, i, 0)

    hs, cs, hT, cT = pl.pallas_call(
        _fwd_kernel,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, bt, N4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N4), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, N), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, N), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i, t: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, pad_b, N), dt),
            jax.ShapeDtypeStruct((T, pad_b, N), dt),
            jax.ShapeDtypeStruct((pad_b, N), dt),
            jax.ShapeDtypeStruct((pad_b, N), dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, N), dt),
            pltpu.VMEM((bt, N), dt),
        ],
        interpret=interpret,
    )(zx.astype(dt), rk, h0.astype(dt), c0.astype(dt))
    if pad_b != B:
        hs, cs = hs[:, :B], cs[:, :B]
        hT, cT = hT[:B], cT[:B]
    return hs, cs, hT, cT


def _scan_core_fwd(zx, rk, h0, c0, reverse, interpret, block_b):
    hs, cs, hT, cT = _fwd_call(zx, rk, h0, c0, reverse, interpret, block_b)
    return ((hs, cs, hT, cT), (zx, rk, h0, c0, hs, cs))


def _scan_core_fwd_vjp(zx, rk, h0, c0, reverse, interpret, block_b):
    (hs, cs, hT, cT), res = _scan_core_fwd(zx, rk, h0, c0, reverse,
                                           interpret, block_b)
    return (hs, hT, cT), res


def _scan_core_bwd(reverse, interpret, block_b, res, grads):
    zx, rk, h0, c0, hs, cs = res
    g_hs, g_hT, g_cT = grads
    T, B, N4 = zx.shape
    N = N4 // 4
    dt = rk.dtype
    # neighbor states: h_prev[t] = h_{t-1} (h0 at the first step). For a
    # reverse scan "first step" is t = T-1 and the neighbor is t+1.
    if reverse:
        hprev = jnp.concatenate([hs[1:], h0[None]], axis=0)
        cprev = jnp.concatenate([cs[1:], c0[None]], axis=0)
    else:
        hprev = jnp.concatenate([h0[None], hs[:-1]], axis=0)
        cprev = jnp.concatenate([c0[None], cs[:-1]], axis=0)

    bt = min(_round_up(B, 16), block_b)  # sublane-aligned, like _fwd_call
    pad_b = _round_up(B, bt)
    if pad_b != B:
        pad = ((0, 0), (0, pad_b - B), (0, 0))
        g_hs = jnp.pad(g_hs, pad)
        zx_p = jnp.pad(zx, pad)
        hprev_p = jnp.pad(hprev, pad)
        cprev_p = jnp.pad(cprev, pad)
        cs_p = jnp.pad(cs, pad)
        g_hT = jnp.pad(g_hT, ((0, pad_b - B), (0, 0)))
        g_cT = jnp.pad(g_cT, ((0, pad_b - B), (0, 0)))
    else:
        zx_p, hprev_p, cprev_p, cs_p = zx, hprev, cprev, cs
    nb = pad_b // bt

    # the backward sweeps time in the opposite order of the forward:
    # grid step j touches forward-step T-1-j (forward scan) or j
    # (reverse scan, whose forward already ran T-1..0)
    if reverse:
        def tmap(i, j):
            return (j, i, 0)
    else:
        def tmap(i, j):
            return (T - 1 - j, i, 0)

    dzx, dh0, dc0 = pl.pallas_call(
        _bwd_kernel,
        grid=(nb, T),
        in_specs=[
            pl.BlockSpec((1, bt, N), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, N4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((N, N4), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, N), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, N), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, N), tmap, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bt, N4), tmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, N), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, pad_b, N4), dt),
            jax.ShapeDtypeStruct((pad_b, N), jnp.float32),
            jax.ShapeDtypeStruct((pad_b, N), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bt, N), jnp.float32),
            pltpu.VMEM((bt, N), jnp.float32),
        ],
        interpret=interpret,
    )(g_hs.astype(dt), g_hT.astype(dt), g_cT.astype(dt),
      zx_p.astype(dt), rk, hprev_p, cprev_p, cs_p)
    if pad_b != B:
        dzx = dzx[:, :B]
        dh0, dc0 = dh0[:B], dc0[:B]
    # weight gradient as ONE large MXU contraction over all steps
    drk = jax.lax.dot_general(
        hprev.reshape(T * B, N), dzx.reshape(T * B, N4),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(rk.dtype)
    return (dzx.astype(zx.dtype), drk,
            dh0.astype(h0.dtype), dc0.astype(c0.dtype))


_scan_core.defvjp(_scan_core_fwd_vjp, _scan_core_bwd)


def fused_scan_supported(w, batch, width, mesh=None):
    """The kernel pays off when the recurrent weight block is large
    enough that keeping it VMEM-resident matters, and requires
    MXU/VPU-aligned shapes; tiny-model tests run interpreter mode.

    With `mesh` (a ('data', 'model') jax.sharding.Mesh), the kernel runs
    per-data-shard under shard_map (each shard launches on its local
    batch with the full weights), so the fit test applies to the local
    batch. Without a mesh, multi-device GSPMD would gather the operands
    of a pallas_call to one device — unsupported."""
    dt = w['recurrent_kernel'].dtype
    if jax.default_backend() not in ('tpu', 'axon'):
        return False
    if mesh is not None:
        dp = mesh.shape.get('data', 1)
        if batch % dp != 0:
            return False
        batch = batch // dp
    elif jax.device_count() > 1:
        # under the GSPMD mesh (parallel/mesh.py) a pallas_call has no
        # partitioning rule — XLA would gather operands to one device;
        # multi-chip training must pass the mesh for the shard_map path
        return False
    if width % 128 != 0:
        return False
    # weights + two pipeline slots of the streamed blocks must fit VMEM
    itemsize = 2 if dt == jnp.bfloat16 else 4
    bt = min(batch, 256)
    resident = width * 4 * width * itemsize          # rk
    streamed = bt * 4 * width * itemsize * 3         # zx in, hs/cs out
    return resident + 3 * streamed < 12 * 1024 * 1024


def _scan_local(xs, w, h, c, reverse, interpret, block_b):
    """Single-device (or single-shard) fused scan body."""
    zx = mm(xs, w['kernel']) + w['bias']
    zx_t = jnp.swapaxes(zx, 0, 1)
    hs, hT, cT = _scan_core(zx_t, w['recurrent_kernel'], h, c,
                            reverse, interpret, block_b)
    return jnp.swapaxes(hs, 0, 1), hT, cT


def lstm_scan_fused(xs, w, h0=None, c0=None, reverse=False, mask=None,
                    interpret=False, block_b=256, mesh=None):
    """Drop-in for ops.lstm.lstm_scan using the whole-sequence kernel.

    xs (B, T, D) -> (outputs (B, T, N), hT, cT). `mask` is unsupported
    (mask_padding models fall back to the XLA scan in the caller).

    With `mesh`, the launch is wrapped in `shard_map` over the 'data'
    axis: each data shard runs its own whole-sequence launch on its
    local batch rows with the weights replicated into the region (GSPMD
    all-gathers tp-sharded weights once per step; the batch-tiled kernel
    itself is unchanged). shard_map's autodiff transposes the replicated
    weight inputs into a psum of the per-shard weight gradients — the
    standard data-parallel gradient reduction.
    """
    assert mask is None, 'masked scan uses the XLA path'
    B, T, _ = xs.shape
    N = w['recurrent_kernel'].shape[0]
    dt = w['recurrent_kernel'].dtype
    h = jnp.zeros((B, N), dt) if h0 is None else h0.astype(dt)
    c = jnp.zeros((B, N), dt) if c0 is None else c0.astype(dt)
    if mesh is not None and B % mesh.shape.get('data', 1) == 0 \
            and mesh.devices.size > 1:
        from jax.sharding import PartitionSpec as P
        inner = functools.partial(_scan_local, reverse=reverse,
                                  interpret=interpret, block_b=block_b)
        specs = dict(in_specs=(P('data'), P(), P('data'), P('data')),
                     out_specs=(P('data'), P('data'), P('data')))
        try:
            # check_vma off: pallas_call carries no varying-mesh-axis
            # annotations for its outputs
            from jax import shard_map          # jax >= 0.8
            wrapped = shard_map(inner, mesh=mesh, check_vma=False,
                                **specs)
        except ImportError:                    # pragma: no cover
            from jax.experimental.shard_map import shard_map
            wrapped = shard_map(inner, mesh=mesh, check_rep=False,
                                **specs)
        return wrapped(xs, w, h, c)
    return _scan_local(xs, w, h, c, reverse, interpret, block_b)
