"""Decode roofline profiler (run on the real TPU).

Times encode and greedy decode (dense vs windowed attention) at the
bench configuration with the hardened protocol from bench.py: inputs
pinned on device, iterations chained through a 0-valued data dependency,
one host fetch as the sync point. Plain block_until_ready is NOT a
reliable sync on remote-transport devices (see bench.py docstring).

Findings recorded in NOTES.md ("Performance map"): greedy decode is
HBM-bandwidth-bound (dense attention re-reads u and attended, ~134MB
per step at B=1024 T=64 W=512 bf16); dense and windowed are equal at
T=64 because XLA's row gather runs ~25x slower than streaming reads, so
windowed attention only wins for T greater than roughly 25x the window.
"""

import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
from bench import build, make_lines                      # noqa: E402
from cor_asv_ann_tpu.models import seq2seq               # noqa: E402


def timeit(fn, enc, n=10):
    """Chained timing: n dependent iterations, one final fetch.

    A throwaway chained loop runs first: the chain ops (`e + leaf*0`)
    compile lazily on first use, which costs seconds on the remote
    transport and would otherwise be billed to the measured loop."""
    out = fn(enc)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # warm + sync
    e = enc
    for _ in range(2):  # throwaway: compiles the chain ops
        out = fn(e)
        leaf = jax.tree_util.tree_leaves(out)[0]
        e = e + (leaf.reshape(-1)[0] * 0).astype(e.dtype)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    e = enc
    for _ in range(n):
        out = fn(e)
        leaf = jax.tree_util.tree_leaves(out)[0]
        e = e + (leaf.reshape(-1)[0] * 0).astype(e.dtype)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0) / n


def main():
    config, mapping, params = build()
    batch, length, pad = 1024, 60, 64
    enc = jax.device_put(make_lines(mapping, batch, length, pad))
    newline = mapping.get('\n')
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a).astype(jnp.bfloat16), params)

    t_enc = timeit(jax.jit(lambda e: seq2seq.encode(params, config, e)),
                   enc)
    print('encode: %.2f ms' % (t_enc * 1e3))

    for name, fn in [('dense', seq2seq.decode_greedy),
                     ('windowed', seq2seq.decode_greedy_windowed)]:
        t = timeit(lambda e, f=fn: f(params, config, e, newline), enc)
        print('%s greedy: %.2f ms -> %.0f lines/s'
              % (name, t * 1e3, batch / t))
        t32 = timeit(lambda e, f=fn: f(params, config, e, newline,
                                       max_steps=32), enc)
        t64 = timeit(lambda e, f=fn: f(params, config, e, newline,
                                       max_steps=64), enc)
        step = (t64 - t32) / 32
        # dense attention streams u+attended (B,T,W bf16 each) per step
        traffic = 2 * batch * pad * config.width * 2
        print('  marginal %.1f us/step; implied HBM read %.0f GB/s (dense '
              'traffic model)' % (step * 1e6, traffic / step / 1e9))


if __name__ == '__main__':
    main()
