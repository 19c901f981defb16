import time
import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, '/root/repo')
from bench import build, make_lines
from cor_asv_ann_tpu.models import seq2seq

config, mapping, params = build()
batch, length, pad = 1024, 60, 64
enc = make_lines(mapping, batch, length, pad)
newline = mapping.get('\n')
params = jax.tree_util.tree_map(
    lambda a: jnp.asarray(a).astype(jnp.bfloat16), params)


def timeit(fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


# encode only
enc_t = timeit(jax.jit(lambda e: seq2seq.encode(params, config, e)), enc)
print('encode only: %.2f ms' % (enc_t * 1e3))

# full dense greedy
t = timeit(seq2seq.decode_greedy, params, config, enc, newline)
out = seq2seq.decode_greedy(params, config, enc, newline)
steps = int(np.asarray(out[2]).max())
print('dense greedy: %.2f ms  (max len %d) -> %.1f us/step' %
      (t * 1e3, steps, (t - enc_t) / max(steps + 1, 1) * 1e6))

# windowed greedy
t2 = timeit(seq2seq.decode_greedy_windowed, params, config, enc, newline)
out2 = seq2seq.decode_greedy_windowed(params, config, enc, newline)
steps2 = int(np.asarray(out2[2]).max())
print('windowed greedy: %.2f ms (max len %d) -> %.1f us/step' %
      (t2 * 1e3, steps2, (t2 - enc_t) / max(steps2 + 1, 1) * 1e6))
same = (np.array_equal(np.asarray(out[0]), np.asarray(out2[0])) and
        np.array_equal(np.asarray(out[2]), np.asarray(out2[2])))
print('outputs identical:', same)

# fixed-steps dense decode (no early exit) for clean per-step cost
t3 = timeit(seq2seq.decode_greedy, params, config, enc, newline,
            max_steps=32)
t4 = timeit(seq2seq.decode_greedy, params, config, enc, newline,
            max_steps=64)
print('dense 32 steps: %.2f ms; 64 steps: %.2f ms -> %.1f us/step marginal'
      % (t3 * 1e3, t4 * 1e3, (t4 - t3) / 32 * 1e6))
t5 = timeit(seq2seq.decode_greedy_windowed, params, config, enc, newline,
            max_steps=32)
t6 = timeit(seq2seq.decode_greedy_windowed, params, config, enc, newline,
            max_steps=64)
print('windowed 32: %.2f ms; 64: %.2f ms -> %.1f us/step marginal'
      % (t5 * 1e3, t6 * 1e3, (t6 - t5) / 32 * 1e6))
