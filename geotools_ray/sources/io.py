"""IO helpers: lance-or-parquet tables, CSV source/sink (S9), and
bbox fragment pruning (J7).

Lance is the preferred format per the input_hint; this container has
no lance package, so read_table/write_table fall back to parquet with
the same call shape (import-try, per the environment contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

try:
    import lance  # noqa: F401

    HAVE_LANCE = True
except ImportError:
    HAVE_LANCE = False


def read_table(path: str, columns: list[str] | None = None, **kw) -> ray.data.Dataset:
    if HAVE_LANCE and path.endswith(".lance"):
        return ray.data.read_lance(path, columns=columns, **kw)
    return ray.data.read_parquet(path, columns=columns, **kw)


def write_table(ds: ray.data.Dataset, path: str, **kw):
    if HAVE_LANCE and path.endswith(".lance"):
        return ds.write_lance(path, **kw)
    return ds.write_parquet(path, **kw)


def read_jsonl(path: str, **kw) -> ray.data.Dataset:
    """JSONL source — the common interchange format for text/training
    corpora (one JSON document per line). Ray's read_json handles
    .jsonl line framing natively; one task per file/fragment."""
    return ray.data.read_json(path, **kw)


def write_jsonl(ds: ray.data.Dataset, path: str, **kw):
    """JSONL sink (one file per block, parallel)."""
    return ds.write_json(path, **kw)


def read_csv(path: str, **kw) -> ray.data.Dataset:
    """S9 CSV source (include/csv.hpp:24-60)."""
    return ray.data.read_csv(path, **kw)


def write_csv(ds: ray.data.Dataset, path: str, **kw):
    """S9 CSV sink (seeds/stats/zonal CSV outputs)."""
    return ds.write_csv(path, **kw)


def read_points_bbox(
    path: str,
    minx: float,
    miny: float,
    maxx: float,
    maxy: float,
    x_col: str = "x",
    y_col: str = "y",
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """J7 file/fragment-level pruning: the bbox predicate is pushed to
    the parquet reader, so row groups whose column statistics fall
    outside the box never leave storage (the reference's header-bbox
    prune, src/lasgrid.cpp:197-212 / src/lasclip.cpp:110-134)."""
    expr = (
        (pc.field(x_col) >= minx)
        & (pc.field(x_col) <= maxx)
        & (pc.field(y_col) >= miny)
        & (pc.field(y_col) <= maxy)
    )
    return ray.data.read_parquet(path, columns=columns, filter=expr)


def sort_fragments_spatially(paths: list[str], x_col: str = "x", y_col: str = "y") -> list[str]:
    """O2: order input fragments by a coarse spatial cell of their
    bbox centroid (src/pointstats.cpp:253-272 FileSorter) — improves
    locality of the downstream cell shuffle."""
    import pyarrow.parquet as pq

    keyed = []
    for p in paths:
        md = pq.read_metadata(p)
        schema_names = md.schema.to_arrow_schema().names
        xi = schema_names.index(x_col)
        yi = schema_names.index(y_col)
        stats = [
            (md.row_group(i).column(xi).statistics, md.row_group(i).column(yi).statistics)
            for i in range(md.num_row_groups)
        ]
        # files without row-group statistics (write_statistics=False,
        # or all-null columns) can't be placed — keep them FIRST in
        # input order rather than crashing the whole sort
        vals = [
            (sx.min, sy.min, sx.max, sy.max)
            for sx, sy in stats
            if sx is not None and sy is not None
            and sx.min is not None and sy.min is not None
            and sx.max is not None and sy.max is not None
        ]
        if not vals:
            keyed.append(((-(1 << 62), -(1 << 62)), p))
            continue
        mnx = min(v[0] for v in vals)
        mny = min(v[1] for v in vals)
        mxx = max(v[2] for v in vals)
        mxy = max(v[3] for v in vals)
        cx, cy = (mnx + mxx) / 2, (mny + mxy) / 2
        keyed.append(((int(cy // 100), int(cx // 100)), p))
    return [p for _, p in sorted(keyed)]
