"""sources/io.py: bbox fragment pruning (J7) and spatial file sort (O2)."""
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _pts(x0, y0, n=50, seed=0):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "x": rng.uniform(x0, x0 + 10, n),
            "y": rng.uniform(y0, y0 + 10, n),
            "z": rng.uniform(0, 5, n),
        }
    )


def test_read_points_bbox_prunes_and_filters(ray_session, tmp_path):
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(_pts(0, 0, seed=1), a)
    pq.write_table(_pts(1000, 1000, seed=2), b)
    from geotools_ray.sources.io import read_points_bbox

    ds = read_points_bbox([a, b], 0, 0, 20, 20)
    df = ds.to_pandas()
    assert len(df) == 50  # far file fully pruned by row-group stats
    assert df["x"].between(0, 20).all() and df["y"].between(0, 20).all()


def test_sort_fragments_spatially_orders_and_survives_missing_stats(tmp_path):
    from geotools_ray.sources.io import sort_fragments_spatially

    paths = []
    for i, (x0, y0) in enumerate([(5000, 5000), (0, 0), (900, 900)]):
        p = str(tmp_path / f"f{i}.parquet")
        pq.write_table(_pts(x0, y0, seed=i), p)
        paths.append(p)
    out = sort_fragments_spatially(paths)
    assert out == [paths[1], paths[2], paths[0]]  # by centroid cell

    # a file written without statistics must not crash the sort
    # (regression: AttributeError on statistics=None); it sorts first
    nostat = str(tmp_path / "nostat.parquet")
    pq.write_table(_pts(100, 100, seed=9), nostat, write_statistics=False)
    out2 = sort_fragments_spatially(paths + [nostat])
    assert set(out2) == set(paths + [nostat])
    assert out2[0] == nostat


def test_jsonl_roundtrip(ray_session, tmp_path):
    """JSONL source/sink: documents-style rows survive the round trip."""
    import pandas as pd
    import ray.data

    from geotools_ray.sources.io import read_jsonl, write_jsonl

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["hello world", "καλημέρα", 'quote " and \\ slash', ""],
            "score": [0.5, 1.25, -3.0, 0.0],
        }
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(ray.data.from_pandas(df), out)
    back = (
        read_jsonl(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back[["doc_id", "text", "score"]], df)


def test_wds_shard_roundtrip(ray_session, tmp_path):
    """WebDataset tar shards: image table -> shards -> identical table
    (input_hint schema), with content-addressed idempotent shard files."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from geotools_ray.sources.images import IMAGE_SCHEMA, make_image_row
    from geotools_ray.sources.wds import read_wds_shards, write_wds_shards

    rows = [make_image_row(i, seed=11) for i in range(60)]
    t = pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)
    out = str(tmp_path / "shards")
    man = write_wds_shards(
        ray.data.from_arrow(t).repartition(3), out, shard_rows=25
    )
    assert man["rows"].to_numpy().sum() == 60
    names = sorted(f for f in os.listdir(out) if f.endswith(".tar"))
    assert names == sorted(man["shard"].to_pylist())

    back = (
        read_wds_shards(out)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    orig = t.to_pandas().sort_values("image_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back[list(orig.columns)], orig)

    # idempotence: re-writing the same blocks overwrites, not duplicates
    man2 = write_wds_shards(
        ray.data.from_arrow(t).repartition(3), out, shard_rows=25
    )
    assert sorted(man2["shard"].to_pylist()) == names
    assert len([f for f in os.listdir(out) if f.endswith(".tar")]) == len(names)


def test_wds_incomplete_group_rejected(ray_session, tmp_path):
    """A shard whose key lacks its image member is refused loudly."""
    import io as _io
    import tarfile

    import pytest

    from geotools_ray.sources.wds import _parse_tar

    buf = _io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        info = tarfile.TarInfo("k1.txt")
        payload = b"caption only"
        info.size = len(payload)
        tf.addfile(info, _io.BytesIO(payload))
    with pytest.raises(ValueError, match="incomplete member groups"):
        _parse_tar(buf.getvalue())


def test_wds_shard_names_hash_payload_not_keys():
    """Two batches with the SAME image_id sequence but different
    payloads must get DIFFERENT shard names — key-only hashing would
    let os.replace silently drop one (the tfrecord prefix-hash bug
    class, flagged for wds in round-4 advice)."""
    import pyarrow as pa

    from geotools_ray.sources.wds import _shard_bytes

    def table(caption):
        return pa.table({
            "image_id": pa.array(["a", "b"], type=pa.string()),
            "bytes": pa.array([b"\x01\x02", b"\x03"], type=pa.binary()),
            "w": pa.array([2, 1], type=pa.int32()),
            "h": pa.array([1, 1], type=pa.int32()),
            "fmt": pa.array(["png", "png"], type=pa.string()),
            "caption": pa.array([caption, "y"], type=pa.string()),
            "phash": pa.array([7, 8], type=pa.int64()),
        })

    n1, d1, _ = _shard_bytes(table("x"))
    n2, d2, _ = _shard_bytes(table("DIFFERENT"))
    assert n1 != n2 and d1 != d2
    # deterministic: same content -> same name (retry idempotence)
    assert _shard_bytes(table("x"))[0] == n1


def test_wds_null_caption_and_null_metadata(ray_session, tmp_path):
    """Null captions write as ABSENT .txt members (webdataset
    convention) and read back as nulls; null w/h/phash are refused
    loudly with the column named."""
    import pyarrow as pa
    import pytest
    import ray.data

    from geotools_ray.sources.wds import (_shard_bytes, read_wds_shards,
                                          write_wds_shards)

    t = pa.table({
        "image_id": pa.array(["a", "b"], type=pa.string()),
        "bytes": pa.array([b"\x01", b"\x02"], type=pa.binary()),
        "w": pa.array([1, 1], type=pa.int32()),
        "h": pa.array([1, 1], type=pa.int32()),
        "fmt": pa.array(["png", "png"], type=pa.string()),
        "caption": pa.array([None, "hello"], type=pa.string()),
        "phash": pa.array([1, 2], type=pa.int64()),
    })
    out = str(tmp_path / "nullcap")
    write_wds_shards(ray.data.from_arrow(t), out, shard_rows=10)
    back = read_wds_shards(out).to_pandas().sort_values("image_id")
    assert back["caption"].tolist()[0] is None or back["caption"].isna().tolist()[0]
    assert back["caption"].tolist()[1] == "hello"

    bad = t.set_column(6, "phash", pa.array([None, 2], type=pa.int64()))
    with pytest.raises(ValueError, match="phash"):
        _shard_bytes(bad)


def test_wds_shards_feed_flagship(ray_session, tmp_path):
    """read_wds_shards output is the input_hint schema, so the full
    flagship pipeline consumes shards directly — same result as the
    parquet path over the same rows."""
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from geotools_ray.ops.imagepipeline import flagship_full
    from geotools_ray.sources.images import IMAGE_SCHEMA, make_image_row
    from geotools_ray.sources.wds import read_wds_shards, write_wds_shards

    rows = [make_image_row(i, seed=5) for i in range(400)]
    t = pa.Table.from_pylist(rows, schema=IMAGE_SCHEMA)
    out = str(tmp_path / "shards")
    write_wds_shards(ray.data.from_arrow(t).repartition(4), out, shard_rows=100)

    def canon(ds):
        return (
            ds.to_pandas()
            .sort_values(["polygon_id", "parent_cell"])
            .reset_index(drop=True)
        )

    via_wds = canon(flagship_full(read_wds_shards(out)))
    via_table = canon(flagship_full(ray.data.from_arrow(t)))
    pd.testing.assert_frame_equal(via_wds, via_table)
    assert len(via_wds) > 0
