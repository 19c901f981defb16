"""Profiling helpers: host cProfile + device (XLA) traces.

The reference exposes OCR-D's --profile/--profile-file (cProfile) on every
processor CLI (README.md:462-463); here the same host profiling is
available plus `jax.profiler` device traces for the TPU side
(SURVEY.md 5: "TPU equivalent: jax.profiler traces + per-phase timing").
"""

import contextlib
import cProfile
import pstats
import sys
import time


@contextlib.contextmanager
def maybe_profile(profile=False, profile_file=None, jax_trace_dir=None,
                  logger=None):
    """Optionally wrap a block in cProfile and/or a jax profiler trace."""
    prof = None
    trace_ctx = contextlib.nullcontext()
    if jax_trace_dir:
        import jax
        trace_ctx = jax.profiler.trace(jax_trace_dir)
    if profile or profile_file:
        prof = cProfile.Profile()
        prof.enable()
    t0 = time.perf_counter()
    with trace_ctx:
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            if prof is not None:
                prof.disable()
                if profile_file:
                    prof.dump_stats(profile_file)
                else:
                    stats = pstats.Stats(prof, stream=sys.stderr)
                    stats.sort_stats('cumulative').print_stats(30)
            if logger is not None:
                logger.info('wall time: %.2fs', dt)


class PhaseTimer:
    """Per-phase wall-clock accounting (encode / decode / align / io)."""

    def __init__(self, logger=None):
        self.logger = logger
        self.totals = {}

    @contextlib.contextmanager
    def phase(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + \
                time.perf_counter() - t0

    def report(self):
        lines = ['phase timing:']
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            lines.append('  %-12s %8.2fs' % (name, total))
        text = '\n'.join(lines)
        if self.logger:
            self.logger.info('%s', text)
        return text
