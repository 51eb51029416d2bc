"""sources/tfrecord.py: framing, crc32c, Example codec, Ray shards."""
import os

import numpy as np
import pyarrow as pa
import pytest

from geotools_ray.sources import tfrecord as TF


def test_crc32c_known_vectors():
    # RFC 3720 check value + empty + lane-parallel consistency
    assert int(TF.crc32c_many([b"123456789"])[0]) == 0xE3069283
    assert int(TF.crc32c_many([b""])[0]) == 0
    bufs = [b"a" * n for n in (1, 7, 64, 300)] + [bytes(range(256)), b""]
    many = TF.crc32c_many(bufs)
    one_by_one = [int(TF.crc32c_many([b])[0]) for b in bufs]
    assert many.tolist() == one_by_one  # lane path == scalar path


def test_frame_unframe_roundtrip_and_crc_rejection():
    payloads = [b"hello", b"", b"x" * 3000, bytes(range(256))]
    stream = TF.frame_records(payloads)
    assert TF.unframe_records(stream) == payloads
    bad = bytearray(stream)
    bad[14] ^= 1  # corrupt inside the first record body
    with pytest.raises(ValueError, match="CRC|truncated"):
        TF.unframe_records(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        TF.unframe_records(stream[:-2])


def test_example_codec_roundtrip():
    ex = {
        "doc": b"\x00\xff raw",
        "name": "héllo",
        "ids": [1, -5, 2**62, -(2**62)],
        "score": [0.5, -1.25],  # float32-representable
        "empty": [],
    }
    dec = TF.decode_example(TF.encode_example(ex))
    assert dec["doc"] == [b"\x00\xff raw"]
    assert dec["name"][0].decode("utf-8") == "héllo"
    assert dec["ids"] == [1, -5, 2**62, -(2**62)]
    assert dec["score"] == [0.5, -1.25]
    assert dec["empty"] == []


def test_tfrecord_shards_roundtrip(ray_session, tmp_path):
    """Documents-style table -> shards -> identical table (schema
    pinned; floats chosen float32-exact per the FloatList spec)."""
    import pandas as pd
    import ray.data

    schema = pa.schema(
        [("doc_id", pa.int64()), ("text", pa.string()), ("score", pa.float64()),
         ("payload", pa.binary())]
    )
    df = pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "text": [f"doc {i} ü" for i in range(100)],
            "score": (np.arange(100) * 0.25).astype(np.float64),
            "payload": [bytes([i % 256]) * (i % 17) for i in range(100)],
        }
    )
    t = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    out = str(tmp_path / "tfr")
    man = TF.write_tfrecord_shards(
        ray.data.from_arrow(t).repartition(4), out, shard_rows=30
    )
    assert man["rows"].to_numpy().sum() == 100
    files = [f for f in os.listdir(out) if f.endswith(".tfrecord")]
    assert sorted(files) == sorted(man["shard"].to_pylist())

    back = (
        TF.read_tfrecord_shards(out, string_cols=("text",), schema=schema)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back[list(df.columns)], df)

    # idempotence on rewrite (content-addressed shard names)
    man2 = TF.write_tfrecord_shards(
        ray.data.from_arrow(t).repartition(4), out, shard_rows=30
    )
    assert sorted(man2["shard"].to_pylist()) == sorted(files)
    assert len([f for f in os.listdir(out) if f.endswith(".tfrecord")]) == len(files)
