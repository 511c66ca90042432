"""Per-stage counters — the rebuild of Vector's internal telemetry
(`emit!(EventsReceived/EventsSent)` per stage, src/topology/builder.rs:
229-246 + the internal_metrics source).

A detached ``MetricsActor`` collects (stage, counter) increments;
``instrument()`` wraps a batch fn so every batch reports rows_in /
rows_out (fire-and-forget remote call — no added latency on the data
path; counts are EVENTUALLY consistent: in-flight increments may still
be queued when the pipeline's consuming call returns, so poll
``snapshot()`` until stable for exact totals).
"""

from __future__ import annotations

from typing import Callable, Dict

import pyarrow as pa

import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counters: Dict[str, int] = {}

    def incr(self, pairs: dict):
        for k, v in pairs.items():
            self.counters[k] = self.counters.get(k, 0) + int(v)

    def snapshot(self) -> dict:
        return dict(self.counters)

    def reset(self):
        self.counters = {}


class Metrics:
    """Driver-side handle: create once per run, pass to instrument()."""

    def __init__(self):
        self.actor = MetricsActor.remote()

    def instrument(self, fn: Callable[[pa.Table], pa.Table], stage: str):
        actor = self.actor

        def wrapped(t: pa.Table) -> pa.Table:
            out = fn(t)
            actor.incr.remote(
                {f"{stage}.rows_in": len(t), f"{stage}.rows_out": len(out),
                 f"{stage}.batches": 1}
            )
            return out

        wrapped.__name__ = f"counted_{stage}"
        return wrapped

    def snapshot(self) -> dict:
        return ray.get(self.actor.snapshot.remote())

    def reset(self):
        ray.get(self.actor.reset.remote())
