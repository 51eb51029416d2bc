"""Per-stage row/byte counters (north_rule 'every partition emits
lineage records plus row/byte counters').

count_stage wraps a map stage so every batch increments a named
counter actor; totals are read on the driver after the run.

Idempotency: each add carries a (task_id, ordinal) token — a Ray task
RETRY (worker death, lineage reconstruction of a spilled block)
re-executes the batch with the SAME task id, so the actor drops the
duplicate instead of double-counting (the content-token pattern from
the cell-index shard adds). Consuming the wrapped dataset twice is two
genuine executions (new task ids) and counts twice — the counters
meter processing, not distinct input rows.
"""

from __future__ import annotations

import pyarrow as pa
import ray

# per-worker-process ordinal of batches within a task execution: a
# retried task restarts its ordinals at 0, reproducing the same tokens
_BATCH_ORDINALS: dict[tuple[str, str], int] = {}


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self._counts: dict[str, dict] = {}
        self._seen: set = set()

    def add(self, stage: str, token, rows: int, nbytes: int):
        if token is not None:
            if token in self._seen:
                return  # task retry replaying a counted batch
            self._seen.add(token)
        c = self._counts.setdefault(stage, {"rows": 0, "bytes": 0, "batches": 0})
        c["rows"] += rows
        c["bytes"] += nbytes
        c["batches"] += 1

    def snapshot(self) -> dict:
        return dict(self._counts)


class Metrics:
    """Driver-side handle. Usage:
        m = Metrics()
        ds = m.count_stage(ds, "after_decode")
        ...consume...
        print(m.snapshot())
    """

    def __init__(self):
        self.actor = MetricsActor.remote()

    def count_stage(self, ds, stage: str):
        actor = self.actor

        def fn(t: pa.Table) -> pa.Table:
            try:
                tid = ray.get_runtime_context().get_task_id()
            except Exception:
                tid = None
            token = None
            if tid:
                # a worker process executes one map task at a time, so
                # entries under OTHER task ids are finished executions:
                # evicting them keeps this dict O(stages) for the life
                # of the worker AND makes a retried task that was
                # rescheduled after intervening work restart its
                # ordinals at 0, reproducing attempt-0 tokens so the
                # actor dedupes the replayed batches. (Known residual:
                # an exception-retry replayed IMMEDIATELY on the same
                # process with no intervening task keeps its ordinals
                # and overcounts the replayed prefix.)
                stale = [k for k in _BATCH_ORDINALS if k[1] != tid]
                for k in stale:
                    del _BATCH_ORDINALS[k]
                key = (stage, tid)
                ordinal = _BATCH_ORDINALS.get(key, 0)
                _BATCH_ORDINALS[key] = ordinal + 1
                token = (stage, tid, ordinal)
            # block on the ack so a driver snapshot after consumption
            # sees every batch (the actor call itself is ~ms)
            ray.get(actor.add.remote(stage, token, t.num_rows, t.nbytes))
            return t

        return ds.map_batches(fn, batch_format="pyarrow")

    def snapshot(self) -> dict:
        return ray.get(self.actor.snapshot.remote())
