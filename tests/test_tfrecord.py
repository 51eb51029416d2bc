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


def test_decode_example_wire_tolerant():
    """Externally produced but wire-valid Examples parse: non-packed
    repeated Int64List varints, non-packed FloatList fixed32, and
    unknown fields at every nesting level are skipped, not raised on
    (protobuf spec requirement; round-4 advice)."""
    import struct

    def tag(field, wire):
        return TF._varint(field << 3 | wire)

    # Int64List with values [7, -2] in NON-packed encoding, preceded by
    # an unknown varint field inside the Feature message
    i64_body = b"".join(
        tag(1, 0) + TF._varint(v & ((1 << 64) - 1)) for v in (7, -2)
    )
    feat_ints = tag(9, 0) + TF._varint(42) + TF._len_delim(3, i64_body)
    entry_ints = TF._len_delim(1, b"ids") + TF._len_delim(2, feat_ints)

    # FloatList with [1.5, -0.25] in NON-packed fixed32 encoding, plus
    # an unknown fixed32 field appended to the map entry
    f_body = b"".join(tag(1, 5) + struct.pack("<f", v) for v in (1.5, -0.25))
    entry_floats = (
        TF._len_delim(1, b"scores")
        + TF._len_delim(2, TF._len_delim(2, f_body))
        + tag(5, 5) + struct.pack("<I", 1)
    )

    features = TF._len_delim(1, entry_ints) + TF._len_delim(1, entry_floats)
    features += TF._len_delim(2, b"junk")  # unknown field in Features
    buf = TF._len_delim(1, features) + tag(3, 1) + b"\x00" * 8  # unknown in Example

    dec = TF.decode_example(buf)
    assert dec["ids"] == [7, -2]
    assert dec["scores"] == [1.5, -0.25]

    # our own writer still round-trips through the tolerant decoder
    ex = {"k": [1, 2, 3], "s": "x"}
    assert TF.decode_example(TF.encode_example(ex))["k"] == [1, 2, 3]


def test_crc32c_combine_and_big_path():
    """GF(2) combine == direct CRC; the chunk-lanes big path == the
    dense path on multi-MB buffers with odd tails."""
    rng = np.random.RandomState(5)
    a = rng.bytes(1000)
    b = rng.bytes(3333)
    ca = int(TF.crc32c_many([a])[0])
    cb = int(TF.crc32c_many([b])[0])
    cab = int(TF.crc32c_many([a + b])[0])
    assert TF.crc32c_combine(ca, cb, len(b)) == cab
    assert TF.crc32c_combine(ca, int(TF.crc32c_many([b""])[0]), 0) == ca
    for n in ((1 << 20) + 1, (1 << 21) + 12345):
        big = rng.bytes(n)
        # direct check against the small-group kernel on the same bytes
        direct = int(
            (TF._lanes_crc_raw(
                np.frombuffer(big, dtype=np.uint8)[None, :].copy(),
                np.array([n], dtype=np.int64),
                np.array([0xFFFFFFFF], dtype=np.uint32),
            ) ^ np.uint32(0xFFFFFFFF))[0]
        )
        assert TF._crc_big(big) == direct


def test_crc32c_many_mixed_sizes_no_inflation():
    """A 2 MiB outlier among 1 KB records must not inflate the group
    matrix; results equal the one-by-one path."""
    rng = np.random.RandomState(6)
    bufs = [rng.bytes(1000) for _ in range(50)] + [rng.bytes(2 << 20)] + [b""]
    many = TF.crc32c_many(bufs)
    small = [int(TF.crc32c_many([b])[0]) for b in bufs[:50]]
    assert many[:50].tolist() == small
    assert int(many[51]) == 0


def test_shard_names_hash_full_content(ray_session, tmp_path):
    """Constant-leading-feature batches must get DISTINCT shard names
    (prefix-only hashing silently overwrote shards)."""
    import ray.data

    schema = pa.schema([("dataset", pa.string()), ("id", pa.int64())])
    t = pa.table({"dataset": ["train-v2.1-full"] * 200,
                  "id": pa.array(range(200), type=pa.int64())})
    out = str(tmp_path / "tfr")
    man = TF.write_tfrecord_shards(
        ray.data.from_arrow(t).repartition(4), out, shard_rows=50
    )
    names = man["shard"].to_pylist()
    assert len(set(names)) == len(names) == 4
    back = TF.read_tfrecord_shards(out, string_cols=("dataset",), schema=schema)
    assert back.count() == 200


def test_list_columns_and_nulls_roundtrip(ray_session, tmp_path):
    """Length-1 list rows keep their list under a pinned schema; None
    writes as an absent feature and reads back as arrow null; bool
    columns cast back from Int64List."""
    import pandas as pd
    import ray.data

    schema = pa.schema(
        [("doc_id", pa.int64()), ("tokens", pa.list_(pa.int64())),
         ("keep", pa.bool_()), ("note", pa.string())]
    )
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "tokens": pa.array([[1, 2, 3], [7], []], type=pa.list_(pa.int64())),
            "keep": pa.array([True, False, True], type=pa.bool_()),
            "note": pa.array(["a", None, "c"], type=pa.string()),
        }
    )
    out = str(tmp_path / "tfr2")
    TF.write_tfrecord_shards(ray.data.from_arrow(t), out, shard_rows=10)
    back = (
        TF.read_tfrecord_shards(out, string_cols=("note",), schema=schema)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert [list(v) for v in back["tokens"]] == [[1, 2, 3], [7], []]
    assert list(back["keep"]) == [True, False, True]
    assert back["note"][1] is None or pd.isna(back["note"][1])
    assert back["note"][0] == "a" and back["note"][2] == "c"


def test_truncated_varint_raises_valueerror():
    with pytest.raises(ValueError, match="varint"):
        TF.decode_example(b"\x0a\x84")  # varint with continuation bit, then EOF
