"""Scale rehearsal for the keyed temporal operators (as-of join,
ordered-window analytics).

Synthesizes an events-like table at 1x / 10x / 30x the sf0.1 events
row count — keys ~ Zipf-ish (a few heavy users plus a long tail, the
realistic per-key skew shape), int64 micro timestamps — and times
each operator at every scale in ONE Ray session.

Both operators are one hash shuffle + per-partition vectorized work,
so wall time should grow ~linearly in rows at a fixed key-per-row
distribution; super-linear growth flags a per-key dispatch or a
partition-memory blowup.

Usage: python tools/scale_rehearsal_keyed.py [--scales 1,10,30]
Writes one JSON line per (op, scale) to stdout, prefixed REHEARSAL.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

BASE_ROWS = 100_000  # sf0.1 events row count


def make_events(n: int, seed: int = 11):
    """(left, right) arrow tables: views and clicks over ~n/60 users
    whose activity is skewed (top user ~ n/100 rows)."""
    rng = np.random.RandomState(seed)
    n_users = max(10, n // 60)
    # skewed key draw: mix uniform tail with a hot head
    u = rng.randint(0, n_users, n).astype(np.int64)
    hot = rng.random(n) < 0.01
    u[hot] = rng.randint(0, 3, int(hot.sum()))
    ts = np.sort(rng.randint(0, 3_000_000_000_000, n).astype(np.int64))
    rng.shuffle(ts)  # keep draws deterministic but unordered
    val = rng.standard_normal(n)
    is_view = rng.random(n) < 0.7
    left = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)[is_view]),
            "user_id": pa.array(u[is_view]),
            "ts_us": pa.array(ts[is_view]),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array(u[~is_view]),
            "ts_us": pa.array(ts[~is_view]),
            "r_value": pa.array(val[~is_view]),
        }
    )
    full = pa.table(
        {
            "k": pa.array(u),
            "on": pa.array(ts),
            "eid": pa.array(np.arange(n, dtype=np.int64)),
            "v": pa.array(val),
        }
    )
    return left, right, full


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,10,30")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from geotools_ray.ops.asof import asof_join_multi
    from geotools_ray.ops.window import keyed_window

    for s in scales:
        n = BASE_ROWS * s
        left, right, full = make_events(n)

        t0 = time.time()
        out = asof_join_multi(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right),
            key="user_id",
            on="ts_us",
            right_cols=["r_value"],
            specs=[
                {"direction": "backward", "r_on": "r_b"},
                {"direction": "forward", "r_on": "r_f", "right_cols": []},
            ],
            tie_cols=["r_value"],
        )
        rows = out.count()
        dt = time.time() - t0
        print(
            "REHEARSAL "
            + json.dumps(
                {
                    "op": "asof_join_multi",
                    "scale": s,
                    "rows_in": n,
                    "rows_out": rows,
                    "sec": round(dt, 3),
                    "us_per_row": round(dt / n * 1e6, 3),
                }
            ),
            flush=True,
        )

        for op, kw in (
            (
                "keyed_window",
                {"outputs": ("row_number", "gap", "run_sum", "run_min",
                             "run_max")},
            ),
            (
                "keyed_window_trailing",
                {"outputs": ("trail_count", "trail_sum", "trail_min",
                             "trail_max"),
                 "trail_window": 50_000_000_000},
            ),
        ):
            t0 = time.time()
            out = keyed_window(
                ray.data.from_arrow(full),
                key="k",
                on="on",
                tie_cols=["eid"],
                value_col="v",
                **kw,
            )
            rows = out.count()
            dt = time.time() - t0
            print(
                "REHEARSAL "
                + json.dumps(
                    {
                        "op": op,
                        "scale": s,
                        "rows_in": n,
                        "rows_out": rows,
                        "sec": round(dt, 3),
                        "us_per_row": round(dt / n * 1e6, 3),
                    }
                ),
                flush=True,
            )

    ray.shutdown()


if __name__ == "__main__":
    main()
