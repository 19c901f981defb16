"""Fused Pallas decode step vs the jnp windowed decoder step."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cor_asv_ann_tpu.models.config import Seq2SeqConfig, init_params
from cor_asv_ann_tpu.models.beam import beam_decoder_step
from cor_asv_ann_tpu.models.seq2seq import encode
from cor_asv_ann_tpu.ops.pallas_decode import fused_decode_step, pack_weights
from cor_asv_ann_tpu.utils.data import CharMapping

from conftest import make_onehot_batch


def test_fused_step_matches_jnp():
    mapping = CharMapping.from_texts(["abcdefgh .,\n"])
    config = Seq2SeqConfig(width=16, depth=2, voc_size=mapping.voc_size)
    params = init_params(config, seed=4)
    lines = ["abba dig.\n", "hi.\n"] * 4
    enc = make_onehot_batch(mapping, lines, pad_to=16)
    B, T, V = enc.shape
    W = config.width
    WIN = min(2 * config.window_width + 2, T)
    attended, states, u = encode(params, config, enc)
    rng = np.random.default_rng(0)
    fb = rng.uniform(0, 1, (B, V)).astype(np.float32)
    aw = np.zeros((B, 1, WIN), np.float32)
    astart = np.zeros((B, 1), np.int32)
    k_states = [(np.asarray(h)[:, None], np.asarray(c)[:, None])
                for h, c in states]
    probs_ref, layers_ref, a_ref, start_ref, _ = beam_decoder_step(
        params, config, fb[:, None], k_states, aw, astart, attended, u)

    # reproduce the window gathers the fused path performs on the outside
    t0 = np.sum(aw[:, 0] * (astart[:, :1] + np.arange(WIN)), axis=1) + 1.0
    new_start = np.clip(np.floor(t0).astype(np.int32) - config.window_width,
                        0, max(T - WIN, 0))
    win_ix = np.minimum(new_start[:, None] + np.arange(WIN), T - 1)
    u_w = np.asarray(u)[np.arange(B)[:, None], win_ix]
    att_w = np.asarray(attended)[np.arange(B)[:, None], win_ix]
    visible = np.abs(t0[:, None] - win_ix) <= config.window_width

    weights = pack_weights(params, dtype=jnp.float32)
    interpret = jax.default_backend() != 'tpu'
    h1, c1 = k_states[0]
    h2, c2 = k_states[1]
    probs, h1o, c1o, h2o, c2o, align = fused_decode_step(
        fb, h1[:, 0], c1[:, 0], h2[:, 0], c2[:, 0], u_w, att_w, visible,
        weights, interpret=interpret)
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(probs_ref)[:, 0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(align),
                               np.asarray(a_ref)[:, 0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(h1o),
                               np.asarray(layers_ref[0][0])[:, 0],
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(h2o),
                               np.asarray(layers_ref[1][0])[:, 0],
                               atol=2e-5)
