"""Pallas TPU kernel: the ENTIRE greedy decode loop in one kernel launch,
weights resident in VMEM across all decoded characters.

This is the declared endgame of the native decode work (ops/
pallas_decode.py runs one fused *step* per launch and still re-reads all
~11MB of weights from HBM every character). Here a batch tile's whole
decode — embedding of the softmax feedback, LSTM layer 1, dense windowed
additive attention, the top attention cell, the weight-tied softmax
readout, argmax/termination bookkeeping — runs inside a single
``pl.pallas_call`` whose ``lax.while_loop`` iterates the characters, so
every weight matrix is fetched from HBM exactly once per tile instead of
once per character. Semantics mirror ``models/seq2seq.py:decode_greedy``
(reference ``decode_batch_greedy``, seq2seq.py:1215-1286): raw softmax
feedback, argmax excluding index 0, per-line newline termination, 2*T
step cap, f32 score accumulation.

Where this wins (measured, see NOTES.md "fused decode loop"): the
small-batch latency regime. At B <= ~64 the XLA per-op path is dominated
by re-streaming the weights every step (~10.6MB bf16 x 2T steps); with
weights resident the kernel pays that once. At production batch
(B >= 256) the XLA path amortizes weight traffic across many lines and
runs its matmuls at full MXU utilization, while a VMEM-resident tile
caps at bt<=32 lines on v5e (16MB VMEM: ~10.6MB weights + per-line
attended/u residency), i.e. 25% MXU sublane utilization — so XLA stays
the production-batch default and the kernel is the small-batch default
(models/api.py FUSED_DECODE_MAX_B).

Requirements: depth 2 (the flagship/pretrained topology), no residual
connections, bfloat16 weights (f32 weights alone exceed VMEM at
production width), and T small enough that a tile fits next to the
weights (see _tile_rows). ``mask_padding`` is honored (padded encoder
rows masked out of the energies like the XLA path). Callers must check
``fused_greedy_supported`` and fall back to ``decode_greedy``.

Output parity vs the XLA path (flagship, measured): byte-equal at
B=16/64/256; 1/1024 lines differs at B=1024 — characterized as
numeric-order noise (the kernel's dense-window softmax sums in a
different order than the XLA shared-window slice), amplified through
the recurrence on an ambiguous token: the paths' distributions already
differ macroscopically at the flip step (p=0.49 'u' vs p=0.78 ' ' on
source 'Well die uht Vernnnft'), i.e. compounded ulp drift, not a
masking/termination bug. The fused path is only dispatched at
B <= FUSED_DECODE_MAX_B, where parity is byte-exact on the golden
fixtures (tests/test_fused_decode.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# largest batch the fused path is dispatched for by default
# (models/api.py). Measured on the flagship d2/w512, T=64,
# chained-timing protocol, across several runs on the unstable remote
# transport: fused/XLA = 2.8x and 2.3x at B=16 (two full runs;
# interleaved A/B rounds swing 0.7-1.6x), parity-within-noise at B=64
# (full runs 1.6x/1.1x/1.1x, interleaved rounds 0.5-1.0x), 0.9-1.0x at
# B=256, <=0.85x at B=1024 — at production batch XLA amortizes the
# per-step weight streaming across lines and wins on MXU utilization,
# exactly as the VMEM roofline predicts (NOTES.md "Performance map").
# Only the B<=16 latency regime is a reliable win on this transport,
# so that is the default bound; raise via s2s.fused_decode_max_b after
# benching on calmer hardware (bench.py records the B=64 ratio each
# round as fused_smallbatch_B64).
FUSED_DECODE_MAX_B = 16

def _weight_bytes(width, voc):
    """bf16 bytes of all decoder weights the kernel keeps resident:
    embedding (V,W), LSTM1 (W,4W)+(W,4W), cell ((2W,4W)+(W,4W)),
    attention W_a (W,W) + v_a (W,1), biases."""
    w, v = width, voc
    mats = v * w + 2 * (w * 4 * w) + (2 * w) * 4 * w + w * 4 * w \
        + w * w + w
    return 2 * (mats + 12 * w + 2)


def _tile_rows(T, width, voc):
    """Batch-tile rows: whatever attended+u residency fits in VMEM next
    to the resident weights. At w512 (~10.6MB weights) that is 16 rows
    for T<=64 (the MXU runs its 8-sublane granularity, hence the small-
    batch-only win); at w128 (~0.8MB weights) tiles reach 128 rows and
    the kernel competes at production batch too."""
    per_line = 2 * T * width * 2
    # 13.5MB working budget of the ~15MB VMEM limit: leaves room for the
    # (bt, T, W) energy intermediate and the state/feedback buffers
    budget = 27 * 512 * 1024 - _weight_bytes(width, voc)
    bt = min(128, budget // max(per_line, 1))
    # sublane alignment; 0 = does not fit (fused_greedy_supported gate)
    return 8 * (bt // 8)


def fused_greedy_supported(params, config, T):
    if config.depth != 2 or config.residual_connections:
        return False
    if config.window_width <= 0:
        return False
    if params['char_embedding']['kernel'].dtype != jnp.bfloat16:
        return False
    if jax.default_backend() not in ('tpu', 'axon'):
        return False
    # sub-lane widths fail Mosaic lowering (measured on w16: the
    # (bt, W) -> (bt, 1, W) broadcast in the energy sum is an
    # "unsupported shape cast" below the 128-lane vector width)
    if config.width % 128 != 0:
        return False
    # the weights plus at least one 8-row attended/u tile must fit VMEM
    return _tile_rows(T, config.width, config.voc_size) >= 8


def _kernel(enc_att_ref, enc_u_ref, h1_ref, c1_ref, h2_ref, c2_ref,
            live_ref, mask_ref, nl_ref,
            e_ref, k1_ref, r1_ref, b1_ref, k2_ref, r2_ref, b2_ref,
            wa_ref, va_ref, buw_ref, bv_ref,
            idx_ref, prob_ref, len_ref, score_ref,
            *, S, ww):
    f32 = jnp.float32
    bt, T, W = enc_u_ref.shape
    V = e_ref.shape[0]
    wdt = e_ref.dtype
    u = enc_u_ref[:]                 # (bt, T, W) resident
    att = enc_att_ref[:]             # (bt, T, W)
    newline = nl_ref[0, 0]

    idx_ref[:] = jnp.zeros_like(idx_ref)
    prob_ref[:] = jnp.zeros_like(prob_ref)

    # iota must be integer-typed on TPU; values are exact small ints
    steps_f = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(f32)

    def mmf(a, w):
        out = jnp.dot(a.astype(wdt), w[:],
                      preferred_element_type=f32)
        return out.astype(wdt)

    def gates(z, c_prev):
        # VPU transcendentals in f32 (Mosaic rejects bf16 sigmoid/tanh);
        # rounded back to the weight dtype at the state boundary like the
        # XLA path's bf16 elementwise ops
        z = z.astype(f32)
        i = jax.nn.sigmoid(z[:, :W])
        f = jax.nn.sigmoid(z[:, W:2 * W])
        g = jnp.tanh(z[:, 2 * W:3 * W])
        o = jax.nn.sigmoid(z[:, 3 * W:])
        c = f * c_prev.astype(f32) + i * g
        return (o * jnp.tanh(c)).astype(wdt), c.astype(wdt)

    def body(carry):
        (t, fb, h1, c1, h2, c2, prev_a, done_i, length, score) = carry
        done = done_i != 0
        # --- embedding + LSTM layer 1 (decoder_lower_stack) ----------
        x = mmf(fb, e_ref)
        z1 = mmf(x, k1_ref) + mmf(h1, r1_ref) + b1_ref[:].astype(wdt)
        h1n, c1n = gates(z1, c1)
        # --- dense windowed additive attention (_attention_step) -----
        w_vec = mmf(h2, wa_ref) + buw_ref[:].astype(wdt)     # (bt, W)
        e_t = jnp.tanh((w_vec[:, None, :] + u).astype(f32)).astype(wdt)
        s_en = (jnp.dot(e_t.reshape(bt * T, W), va_ref[:],
                        preferred_element_type=f32)
                .reshape(bt, T) + bv_ref[0, 0])
        t0 = (jnp.sum(prev_a.astype(f32) * steps_f, axis=1,
                      keepdims=True) + 1.0)                  # (bt, 1)
        keep = (jnp.abs(t0 - steps_f) <= float(ww)) & (mask_ref[:] > 0)
        s_en = jnp.where(keep, s_en, -1e30)
        a = jax.nn.softmax(s_en, axis=1)                     # (bt, T)
        # all-masked rows get ZERO alignment (t0 resets to 1), matching
        # _attention_step (attention.py) — not the uniform alignment a
        # softmax over uniform -1e30 would yield (t0 would jump to ~T/2)
        a = (a * jnp.any(keep, axis=1, keepdims=True)).astype(wdt)
        ctx = jnp.sum(a.astype(f32)[..., None] * att.astype(f32),
                      axis=1)                                # (bt, W) f32
        # --- top attention cell (decoder_top_cell) --------------------
        cell_in = jnp.concatenate([h1n, ctx.astype(wdt)], axis=-1)
        z2 = mmf(cell_in, k2_ref) + mmf(h2, r2_ref) + b2_ref[:].astype(wdt)
        h2n, c2n = gates(z2, c2)
        # --- weight-tied softmax readout ------------------------------
        logits = jnp.dot(h2n, e_ref[:].T, preferred_element_type=f32)
        # (rounding logits to wdt pre-softmax to mirror _output_probs
        # was tried and measured NO closer to the XLA path's scores —
        # the residual per-line score delta (~2e-3 abs on the flagship)
        # is compounded per-step trajectory rounding, not this readout)
        probs = jax.nn.softmax(logits, axis=-1).astype(wdt)  # (bt, V)
        # --- greedy pick: argmax excluding index 0 --------------------
        lane = jax.lax.broadcasted_iota(jnp.int32, (bt, V), 1)
        # argmax spelled as max + first-index-of-max (Mosaic rejects the
        # fused argmax lowering); bf16 -> f32 is exact, same winner, and
        # min-over-iota reproduces argmax's lowest-index tie-breaking
        masked = jnp.where(lane == 0, -1.0, probs.astype(f32))
        p = jnp.max(masked, axis=1)                          # (bt,) f32
        idx = jnp.min(jnp.where(masked == p[:, None], lane, V),
                      axis=1).astype(jnp.int32)              # (bt,)
        active = ~done
        idx_w = jnp.where(active, idx, 0)
        p_w = jnp.where(active, p, 0.0)
        idx_ref[pl.ds(t, 1), :] = idx_w[None, :]
        prob_ref[pl.ds(t, 1), :] = p_w[None, :]
        length = length + active.astype(jnp.int32)
        score = score + jnp.where(
            active, -jnp.log(jnp.maximum(p.astype(f32), 1e-30)), 0.0)
        done = done | (active & (idx == newline))
        return (t + 1, probs, h1n, c1n, h2n, c2n, a,
                done.astype(jnp.int32), length, score)

    def cond(carry):
        t, done_i = carry[0], carry[7]
        return (t < S) & (jnp.min(done_i) == 0)

    carry0 = (jnp.array(0, jnp.int32),
              jnp.zeros((bt, V), wdt),
              h1_ref[:], c1_ref[:], h2_ref[:], c2_ref[:],
              jnp.zeros((bt, T), wdt),
              (live_ref[0, :] == 0).astype(jnp.int32),
              jnp.zeros((bt,), jnp.int32),
              jnp.zeros((bt,), f32))
    out = jax.lax.while_loop(cond, body, carry0)
    len_ref[0, :] = out[8]
    score_ref[0, :] = out[9]


@functools.partial(jax.jit, static_argnames=('config', 'max_steps',
                                             'interpret'))
def decode_greedy_fused(params, config, enc_input, newline_idx,
                        max_steps=None, interpret=False):
    """Whole-loop fused greedy decode. Same contract as
    ``seq2seq.decode_greedy`` minus alignments (returns None there).

    Encodes with the standard XLA encoder (a minor fraction of decode
    time), then runs one kernel launch per batch tile with all decoder
    weights VMEM-resident across the full character loop.
    """
    from ..models.seq2seq import encode, ensure_onehot
    enc_input = ensure_onehot(enc_input, config, params)
    B, T, V = enc_input.shape
    S = 2 * T if max_steps is None else max_steps
    W = config.width
    attended, states, u = encode(params, config, enc_input)
    live = jnp.any(enc_input.reshape(B, -1) != 0, axis=1)
    enc_mask = (jnp.any(enc_input != 0, axis=2).astype(jnp.int32)
                if config.mask_padding else jnp.ones((B, T), jnp.int32))

    # never tile wider than the (8-aligned) batch itself
    bt = min(_tile_rows(T, W, V), max(8, -(-B // 8) * 8))
    pad = (-B) % bt
    if pad:
        z = lambda x: jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
        attended, u, live, enc_mask = (z(attended), z(u), z(live),
                                       z(enc_mask))
        states = [(z(h), z(c)) for h, c in states]
    n_tiles = (B + pad) // bt

    dec = params['decoder']
    top = dec[1]
    weights = (params['char_embedding']['kernel'],
               dec[0]['kernel'], dec[0]['recurrent_kernel'],
               dec[0]['bias'].reshape(1, -1),
               top['cell']['kernel'], top['cell']['recurrent_kernel'],
               top['cell']['bias'].reshape(1, -1),
               top['W_a'], top['v_a'], top['b_UW'].reshape(1, -1),
               # scalar extracts must be 32-bit in Mosaic
               top['b_v'].astype(jnp.float32).reshape(1, 1))
    kern = functools.partial(_kernel, S=S, ww=config.window_width)

    f32 = jnp.float32
    call = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((S, bt), jnp.int32),
                   jax.ShapeDtypeStruct((S, bt), f32),
                   jax.ShapeDtypeStruct((1, bt), jnp.int32),
                   jax.ShapeDtypeStruct((1, bt), f32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
                 + [pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)]
                 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(4)),
        interpret=interpret,
        **({} if interpret else dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=15 * 1024 * 1024))),
    )

    def tile_fn(i):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, i * bt, bt, 0)
        (h1, c1), (h2, c2) = [(sl(h), sl(c)) for h, c in states]
        out_i, out_p, out_l, out_s = call(
            sl(attended), sl(u), h1, c1, h2, c2,
            sl(live).astype(jnp.int32)[None, :], sl(enc_mask),
            jnp.full((1, 1), newline_idx, jnp.int32),
            *weights)
        return out_i.T, out_p.T, out_l[0], out_s[0]

    idx, prob, length, score = jax.lax.map(tile_fn,
                                           jnp.arange(n_tiles))
    merge = lambda x: x.reshape((n_tiles * bt,) + x.shape[2:])[:B]
    idx, prob, length, score = map(merge, (idx, prob, length, score))
    lengths = jnp.maximum(length, 1)
    return idx, prob.astype(attended.dtype), length, score / lengths, None
