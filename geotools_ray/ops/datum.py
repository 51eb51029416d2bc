"""M6 datum transform as a Ray Data stage (ST1/ST2 pattern): the
NAD83(CSRS) shift grid and Helmert parameter table load ONCE per actor
in __init__; __call__ runs the vectorized transform chain per batch
(mirroring las2csrs' columnar x/y/z arrays, src/las2csrs.cpp:512-600).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data

from ..kernels.transform import ShiftGrid, load_helmert, transform_points

# vendored public datum data (NRCan NAD83v6VG velocity grid + IERS
# ITRF Helmert table) lives in-repo under share/
DEFAULT_SHARE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "share"
)


class DatumTransformStage:
    """map_batches(DatumTransformStage, concurrency=N, batch_size=B,
    fn_constructor_kwargs=dict(frame=..., efrom=..., eto=...,
    from_epsg=..., to_epsg=...)).

    Expects columns x, y, z; replaces them with transformed values.
    """

    def __init__(
        self,
        frame: str,
        efrom: float,
        eto: float,
        from_epsg: int,
        to_epsg: int,
        share_dir: str = DEFAULT_SHARE,
    ):
        self.frame = frame
        self.efrom = efrom
        self.eto = eto
        self.from_epsg = from_epsg
        self.to_epsg = to_epsg
        # once-per-actor state (ST1: grid ~1.5 MB; ST2: helmert row)
        self.helmert = load_helmert(f"{share_dir}/itrf.csv", frame)
        self.shift_grid = (
            ShiftGrid.from_tif(f"{share_dir}/NAD83v6VG.tif") if efrom != eto else None
        )

    def __call__(self, t: pa.Table) -> pa.Table:
        x = t["x"].to_numpy(zero_copy_only=False)
        y = t["y"].to_numpy(zero_copy_only=False)
        z = t["z"].to_numpy(zero_copy_only=False)
        ox, oy, oz = transform_points(
            x, y, z, self.frame, self.efrom, self.eto,
            self.from_epsg, self.to_epsg, self.helmert, self.shift_grid,
        )
        for name, arr in (("x", ox), ("y", oy), ("z", oz)):
            i = t.schema.get_field_index(name)
            t = t.set_column(i, name, pa.array(arr))
        return t


def datum_transform(
    points: ray.data.Dataset,
    frame: str,
    efrom: float,
    eto: float,
    from_epsg: int,
    to_epsg: int,
    concurrency: int = 4,
    batch_size: int = 65536,
    share_dir: str = DEFAULT_SHARE,
) -> ray.data.Dataset:
    return points.map_batches(
        DatumTransformStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        fn_constructor_kwargs=dict(
            frame=frame, efrom=efrom, eto=eto,
            from_epsg=from_epsg, to_epsg=to_epsg, share_dir=share_dir,
        ),
    )
