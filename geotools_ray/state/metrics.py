"""Per-stage row/byte counters (north_rule 'every partition emits
lineage records plus row/byte counters').

count_stage wraps a map stage so every batch increments a named
counter actor; totals are read on the driver after the run.  The
counter is a detached-free named actor per metrics session.
"""

from __future__ import annotations

import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self._counts: dict[str, dict] = {}

    def add(self, stage: str, rows: int, nbytes: int):
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
            # block on the ack so a driver snapshot after consumption
            # sees every batch (the actor call itself is ~ms)
            ray.get(actor.add.remote(stage, t.num_rows, t.nbytes))
            return t

        return ds.map_batches(fn, batch_format="pyarrow")

    def snapshot(self) -> dict:
        return ray.get(self.actor.snapshot.remote())
