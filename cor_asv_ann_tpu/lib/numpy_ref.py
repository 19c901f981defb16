"""Pure-NumPy golden reference of the seq2seq model semantics.

This module re-derives, in plain NumPy, the exact inference math of the
reference Keras model (ocrd_cor_asv_ann/lib/seq2seq.py:190-489 `configure`,
lib/attention.py:440-621 `DenseAnnotationAttention`):

- Keras LSTM cell: gate order (i, f, c~, o), ``recurrent_activation=sigmoid``,
  ``activation=tanh``:  z = x.K + h.R + b;  c = sig(z_f)*c + sig(z_i)*tanh(z_c);
  h = sig(z_o)*tanh(c)
- bidirectional first encoder layer whose *backward* final states initialize
  the decoder (seq2seq.py:277-281),
- additive attention with the state-independent half precomputed
  (u = enc_out.A), energies e = exp(tanh(h.W_a + b_UW + u).v_a + b_v), and the
  "local attention hack": positions with |t0 - i| > window_width are masked,
  where t0 = prev_alignment.arange + 1 (attention.py:544-569),
- weight-tied output projection softmax(h.E^T) (seq2seq.py:369-382),
- greedy batch decoding with the full softmax distribution fed back as the
  next decoder input (seq2seq.py:1215-1286).

It serves two purposes:
1. a *parity oracle* for the JAX/TPU implementation (same params in, the
   decoded bytes must match),
2. the benchmark *baseline denominator*: its per-character host-loop decode
   reproduces the reference's performance structure (one host round trip per
   character, seq2seq.py:1243-1246) without needing TF1.

No code is copied from the reference; everything is re-derived from the
documented layer semantics.
"""

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def lstm_step(x, h, c, kernel, recurrent_kernel, bias):
    """One Keras-semantics LSTM step. Returns (h_new, c_new)."""
    z = x @ kernel + h @ recurrent_kernel + bias
    n = z.shape[-1] // 4
    i = sigmoid(z[..., :n])
    f = sigmoid(z[..., n:2 * n])
    g = np.tanh(z[..., 2 * n:3 * n])
    o = sigmoid(z[..., 3 * n:])
    c_new = f * c + i * g
    h_new = o * np.tanh(c_new)
    return h_new, c_new


def lstm_seq(xs, w, h0=None, c0=None, reverse=False, mask=None):
    """Run an LSTM over (B, T, D) inputs. Returns (outputs(B,T,N), h, c).

    With `mask` (B, T), masked timesteps pass the carry through and emit
    zero outputs (mask_padding mode; see ops/lstm.py)."""
    B, T, _ = xs.shape
    N = w['recurrent_kernel'].shape[0]
    h = np.zeros((B, N), xs.dtype) if h0 is None else h0
    c = np.zeros((B, N), xs.dtype) if c0 is None else c0
    out = np.zeros((B, T, N), xs.dtype)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    for t in steps:
        h_new, c_new = lstm_step(xs[:, t], h, c, w['kernel'],
                                 w['recurrent_kernel'], w['bias'])
        if mask is not None:
            m = mask[:, t][:, None]
            h = np.where(m, h_new, h)
            c = np.where(m, c_new, c)
            out[:, t] = np.where(m, h_new, 0.0)
        else:
            h, c = h_new, c_new
            out[:, t] = h
    return out, h, c


def cross_sum(x):
    """fw/bw cross-summary between deep-bidirectional encoder layers:
    x + flip over the (width, 2) sub-axes (seq2seq.py:246-259)."""
    shape = x.shape
    y = x.reshape(shape[:-1] + (shape[-1] // 2, 2))[..., ::-1]
    return x + y.reshape(shape)


def encode(params, config, enc_input):
    """Run the encoder. Returns (enc_output(B,T,A), init_states, u(B,T,W)).

    `init_states` is a list of (h, c) per decoder layer plus the zero
    initial attention state appended last (a vector of length T per line).
    """
    depth = config['depth']
    deep_bidir = config.get('deep_bidirectional_encoder', False)
    residual = config.get('residual_connections', False)
    mask = (np.any(enc_input != 0, axis=2)
            if config.get('mask_padding') else None)
    x = enc_input @ params['char_embedding']['kernel']
    states = []
    out = x
    for n in range(depth):
        lw = params['encoder'][n]
        if n == 0 or deep_bidir:
            inp = out if n == 0 else cross_sum(out)
            fw_out, fw_h, fw_c = lstm_seq(inp, lw['fw'], mask=mask)
            bw_out, bw_h, bw_c = lstm_seq(inp, lw['bw'], reverse=True,
                                          mask=mask)
            out = np.concatenate([fw_out, bw_out], axis=-1)
            h, c = bw_h, bw_c  # backward final states init the decoder
        else:
            out2, h, c = lstm_seq(out, lw, mask=mask)
            if residual and n >= 2:
                out = out2 + out
            else:
                out = out2
        if config.get('bridge_dense', False):
            bw_ = params['bridge'][n]
            h = np.tanh(h @ bw_['h']['kernel'] + bw_['h']['bias'])
            c = np.tanh(c @ bw_['c']['kernel'] + bw_['c']['bias'])
        states.append((h, c))
    u = out @ params['attention_dense']['kernel']
    attn0 = np.zeros(out.shape[:2], out.dtype)
    return out, states, attn0, u


def attention_step(params_top, h_prev, prev_a, attended, u, window_width=5,
                   mask=None):
    """Local additive attention. Returns (context(B,A), alignment(B,T))."""
    B, T, _ = attended.shape
    w = h_prev @ params_top['W_a'] + params_top['b_UW']          # (B, W)
    s = (np.tanh(w[:, None, :] + u) @ params_top['v_a']
         + params_top['b_v'])[..., 0]                             # (B, T)
    keep = np.ones_like(s, dtype=bool)
    if mask is not None:
        keep &= mask.astype(bool)
    if window_width and window_width > 0:
        steps = np.arange(T, dtype=attended.dtype)
        t0 = prev_a @ steps + 1.0                                 # (B,)
        keep &= np.abs(t0[:, None] - steps[None, :]) <= window_width
    s = np.where(keep, s, -1e30)
    s = s - s.max(axis=1, keepdims=True)
    e = np.exp(s)
    a = e / np.sum(e, axis=1, keepdims=True)
    a = a * np.any(keep, axis=1, keepdims=True)
    ctx = np.einsum('bt,bta->ba', a, attended)
    return ctx, a


def decoder_step(params, config, dec_input, states, attended, u,
                 enc_mask=None):
    """One decoder step over all layers.

    `dec_input` (B, V) is the previous softmax distribution (or one-hot);
    `states` = ([(h, c)] * depth, alignment). Returns (probs, new_states,
    alignment).
    """
    depth = config['depth']
    residual = config.get('residual_connections', False)
    layer_states, prev_a = states
    x = dec_input @ params['char_embedding']['kernel']
    new_states = []
    out = x
    for n in range(depth - 1):
        lw = params['decoder'][n]
        h, c = layer_states[n]
        h, c = lstm_step(out, h, c, lw['kernel'], lw['recurrent_kernel'],
                         lw['bias'])
        new_states.append((h, c))
        if residual and n > 0:
            out = h + out
        else:
            out = h
    top = params['decoder'][depth - 1]
    h, c = layer_states[depth - 1]
    ctx, a = attention_step(top, h, prev_a, attended, u,
                            config.get('window_width', 5), mask=enc_mask)
    cell_in = np.concatenate([out, ctx], axis=-1)
    h, c = lstm_step(cell_in, h, c, top['cell']['kernel'],
                     top['cell']['recurrent_kernel'], top['cell']['bias'])
    new_states.append((h, c))
    if residual and depth > 1:
        out = h + out
    else:
        out = h
    logits = out @ params['char_embedding']['kernel'].T
    logits = logits - logits.max(axis=-1, keepdims=True)
    ez = np.exp(logits)
    probs = ez / ez.sum(axis=-1, keepdims=True)
    return probs, (new_states, a), a


def decode_batch_greedy(params, config, mapping, enc_input, max_steps=None):
    """Greedy batch decoding with softmax feedback (host loop per character).

    Mirrors reference decode_batch_greedy (seq2seq.py:1215-1286): argmax
    excludes index 0, per-line termination on newline, score = mean -log p.
    Returns (texts, probs, scores, alignments).
    """
    B, T, V = enc_input.shape
    attended, states, attn0, u = encode(params, config, enc_input)
    enc_mask = (np.any(enc_input != 0, axis=2)
                if config.get('mask_padding') else None)
    layer_states = list(states)
    dec_state = (layer_states, attn0)
    feedback = np.zeros((B, V), dtype=enc_input.dtype)
    texts = [''] * B
    probs = [[] for _ in range(B)]
    scores = np.zeros(B)
    aligns = [[] for _ in range(B)]
    live = np.any(enc_input.reshape(B, -1), axis=1)
    steps = max_steps or T * 2
    for _ in range(steps):
        p, dec_state, a = decoder_step(params, config, feedback, dec_state,
                                       attended, u, enc_mask=enc_mask)
        idx = np.argmax(p[:, 1:], axis=1) + 1
        feedback = p  # soft/confidence input
        for j in range(B):
            if not live[j] or texts[j].endswith('\n'):
                continue
            texts[j] += mapping.i2c[int(idx[j])]
            probs[j].append(float(p[j, idx[j]]))
            scores[j] += -np.log(p[j, idx[j]])
            aligns[j].append(a[j].copy())
        if all((not live[j]) or texts[j].endswith('\n') for j in range(B)):
            break
    lengths = np.array([max(len(t), 1) for t in texts])
    return texts, probs, (scores / lengths).tolist(), aligns


class _BeamNode:
    """One hypothesis in the beam trie (re-derivation of reference Node,
    seq2seq.py:1546-1608)."""

    __slots__ = ('value', 'parent', 'state', 'cum_cost', 'length', 'length0',
                 'cost0', 'prob', 'scores', 'alignment')

    def __init__(self, state, value, scores, cost, parent=None, prob=1.0,
                 alignment=None, length0=None, cost0=None):
        self.value = value
        self.parent = parent
        self.state = state
        self.cum_cost = (parent.cum_cost + cost) if parent else cost
        self.length = 1 if parent is None else parent.length + 1
        self.length0 = length0 or (parent.length0 if parent else 1)
        self.cost0 = cost0 or (parent.cost0 if parent else 0)
        self.prob = prob
        self.scores = scores
        self.alignment = (parent.alignment if parent else []) \
            if alignment is None else alignment

    def to_sequence(self):
        seq = []
        node = self
        while node:
            seq.insert(0, node)
            node = node.parent
        return seq

    def pro_cost(self):
        return -(self.cum_cost + self.cost0 * np.abs(self.length - self.length0))

    def __lt__(self, other):
        return self.pro_cost() < other.pro_cost()


def decode_sequence_beam(params, config, mapping, source_seq,
                         rejection_threshold=0.3, beam_width_in=15,
                         beam_threshold_in=0.2, beam_width_out=16,
                         batch_size=256, debug_cb=None):
    """Reference-semantics A*-like beam search for ONE line (NumPy).

    Faithful re-derivation of seq2seq.py:1356-1544 including the global
    best-first queue, rejection candidates and successive-max-reset
    feedback. Yields (text, probs, score, alignments) best-first.

    `debug_cb(info_dict)`, if given, is called once per expanded node
    with its rejection-mechanism internals (text, misalignment,
    source_pos, rej char/prob) — used by tools/beam_divergence.py to
    exhibit where flagship-scale divergences sit relative to the
    reference's eligibility bounds.
    """
    from bisect import insort_left
    enc_input = source_seq[None]
    V = enc_input.shape[2]
    attended, states, attn0, u = encode(params, config, enc_input)
    enc_mask = (np.any(enc_input != 0, axis=2)
                if config.get('mask_padding') else None)
    attended_len = attended.shape[1]
    layer_states = list(states)
    next_beam = [_BeamNode(state=(layer_states, attn0), value='',
                           scores=np.zeros(V, np.float32), prob=[], cost=0.0,
                           alignment=[], length0=attended_len, cost0=3.0)]
    final_beam = []
    max_batches = attended_len * 2
    for _ in range(max_batches):
        beam = []
        while next_beam:
            node = next_beam.pop()
            if node.value == '\n':
                insort_left(final_beam, node)
            else:
                beam.append(node)
            if len(beam) >= batch_size:
                break
        if not beam:
            break
        if (len(final_beam) > beam_width_out and
                final_beam[-1].pro_cost() > beam[0].pro_cost()):
            break
        feedback = np.stack([node.scores for node in beam])
        hyp_states = (
            [(np.concatenate([n.state[0][l][0] for n in beam]),
              np.concatenate([n.state[0][l][1] for n in beam]))
             for l in range(config['depth'])],
            np.concatenate([n.state[1] for n in beam]))
        att = np.broadcast_to(attended, (len(beam),) + attended.shape[1:])
        uu = np.broadcast_to(u, (len(beam),) + u.shape[1:])
        probs, (new_layers, a_new), _ = decoder_step(
            params, config, feedback, hyp_states, att, uu,
            enc_mask=np.broadcast_to(enc_mask, (len(beam),) +
                                     enc_mask.shape[1:])
            if enc_mask is not None else None)
        for i, node in enumerate(beam):
            states_i = ([(h[i:i + 1], c[i:i + 1]) for h, c in new_layers],
                        a_new[i:i + 1])
            scores = probs[i].copy()
            alignment = a_new[i:i + 1]
            misalignment = 0.0
            if node.length > 1:
                prev_alignment = node.alignment
                prev_pos = float(prev_alignment @ np.arange(attended_len))
                pos = float(alignment[0] @ np.arange(attended_len))
                misalignment = abs(pos - prev_pos - 1)
                if np.max(prev_alignment) == 1.0:
                    source_pos = int(prev_pos) + 1
                else:
                    source_pos = int(round(pos))
            else:
                source_pos = 0
            source_pos = min(source_pos, attended_len - 1)
            source_scores = source_seq[source_pos]
            eligible = bool(
                rejection_threshold
                and (misalignment < 0.1
                     or (len(np.shape(node.alignment)) and
                         np.max(node.alignment) == 1.0))
                and np.any(source_scores))
            if eligible:
                rej_idx = int(np.nanargmax(source_scores))
                rej_p_raw = float(scores[rej_idx])
                if scores[rej_idx] < rejection_threshold:
                    scores[rej_idx] = rejection_threshold
            else:
                rej_idx = None
                rej_p_raw = None
            if debug_cb is not None:
                debug_cb(dict(
                    text=''.join(n.value for n in node.to_sequence()[1:]),
                    misalignment=float(misalignment),
                    source_pos=int(source_pos), eligible=eligible,
                    rej_idx=rej_idx, rej_p=rej_p_raw,
                    was_rej=bool(np.size(node.alignment) and
                                 np.max(node.alignment) == 1.0)))
            order = np.argsort(scores)
            highest = scores[order[-1]]
            beampos = V - np.searchsorted(scores[order],
                                          highest * beam_threshold_in)
            beampos = min(beampos, beam_width_in)
            pos = 0
            for idx in reversed(order):
                pos += 1
                score = scores[idx]
                logscore = -np.log(score)
                alignment1 = alignment[0]
                if idx == rej_idx:
                    alignment1 = np.eye(attended_len,
                                        dtype=np.float32)[source_pos]
                    rej_idx = None
                elif pos > beampos:
                    if rej_idx:
                        continue
                    else:
                        break
                value = mapping.i2c[int(idx)]
                if np.isnan(logscore) or value == '':
                    continue
                scores1 = scores.copy()
                scores[idx] = 0
                insort_left(next_beam, _BeamNode(
                    parent=node, state=states_i, value=value, scores=scores1,
                    prob=score, cost=logscore, alignment=alignment1))
        if len(next_beam) > max_batches * batch_size:
            next_beam = next_beam[-max_batches * batch_size:]
    while final_beam:
        node = final_beam.pop()
        nodes = node.to_sequence()[1:]
        yield (''.join(n.value for n in nodes),
               [n.prob for n in nodes],
               node.cum_cost / (node.length - 1),
               [n.alignment for n in nodes])
