"""Tracing / profiling utilities.

The reference's observability is wall-clock prints around cuda.synchronize
(train.py:342-343, detect.py:264-269) plus imported-but-unused FLOP counters
(architecture...py:12-13). TPU-native equivalents:

  * trace(): context manager around jax.profiler.trace -> TensorBoard-
    loadable device traces;
  * timed(): block_until_ready wall-clock timing of a jitted callable;
  * cost_analysis(): FLOPs / bytes-accessed from the compiled executable
    (the working replacement for thop/fvcore);
  * throughput_meter(): images/sec accounting used by bench.py and detect.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 10, warmup: int = 1, **kw):
    """Mean wall-clock seconds per call with full pipeline drain."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kw))
    t0 = time.perf_counter()
    outs = [fn(*args, **kw) for _ in range(iters)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / iters


def cost_analysis(fn, *args, **kw) -> dict:
    """FLOPs and bytes accessed of the jitted fn at these args."""
    lowered = jax.jit(fn).lower(*args, **kw)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0] if costs else {}
    return {
        "flops": costs.get("flops"),
        "bytes_accessed": costs.get("bytes accessed"),
        "raw": dict(costs) if costs else {},
    }


class ThroughputMeter:
    def __init__(self):
        self.n = 0
        self.t0 = time.perf_counter()

    def update(self, n: int):
        self.n += n

    @property
    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.n / dt if dt > 0 else 0.0
