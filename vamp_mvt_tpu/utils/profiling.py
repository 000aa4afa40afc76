"""Profiling and timing utilities.

The reference times planner bodies with steady_clock deltas surfaced as
PlanningResult::nanoseconds (SURVEY §5).  The TPU equivalents:

- `device_timer`: wall-clock around a block with block_until_ready, ns result.
- `trace`: jax.profiler trace context writing a TensorBoard-loadable trace.
- `op_breakdown`: parse a trace directory into (total_us, count) per op — the
  tool used to find the planner's hot fusions.
"""

from __future__ import annotations

import collections
import contextlib
import gzip
import json
import os
import time

import jax


@contextlib.contextmanager
def device_timer(result: dict, key: str = "nanoseconds"):
    """Times the block in ns, synchronizing the device at both ends."""
    (jax.device_put(0) + 0).block_until_ready()
    t0 = time.perf_counter_ns()
    yield
    jax.effects_barrier()
    result[key] = time.perf_counter_ns() - t0


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


def op_breakdown(log_dir: str, top: int = 20):
    """Aggregate device-op durations from a profiler trace directory."""
    base = os.path.join(log_dir, "plugins", "profile")
    run = sorted(os.listdir(base))[-1]
    d = os.path.join(base, run)
    fname = [x for x in os.listdir(d) if x.endswith("trace.json.gz")][0]
    with gzip.open(os.path.join(d, fname)) as fh:
        data = json.load(fh)
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and "dur" in e:
            agg[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    return [(name, dur, cnt[name]) for name, dur in agg.most_common(top)]
