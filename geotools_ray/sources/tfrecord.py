"""TFRecord source/sink with a minimal tf.train.Example codec — the
third common training-data interchange format (after parquet/lance and
webdataset), implemented from the PUBLIC format specs with zero
TensorFlow dependency:

- TFRecord framing (tensorflow/core/lib/io/record_writer.h):
    uint64 length (LE) | uint32 masked_crc32c(length) (LE)
    | data[length]     | uint32 masked_crc32c(data) (LE)
  masked_crc = rotr15(crc32c(x)) + 0xa282ead8 (mod 2^32).
- crc32c is the Castagnoli CRC (reflected poly 0x82F63B78) — verified
  against the RFC 3720 check value crc32c("123456789") = 0xE3069283.
- tf.train.Example (example.proto / feature.proto): Example{ Features
  features=1 }, Features{ map<string,Feature> feature=1 }, Feature
  oneof { BytesList=1, FloatList=2, Int64List=3 }; float/int64 lists
  packed. NOTE: FloatList is FLOAT32 by spec, so float columns
  round-trip at float32 precision (format limitation, documented).

The per-record CRC is computed LANE-PARALLEL across the records of a
batch (the jpegwide trick): one table-gather step per byte POSITION
over all records at once, so the byte loop costs O(max_len) numpy
steps per batch instead of O(total_bytes) Python steps.

Ray integration mirrors sources/wds.py: one content-addressed
.tfrecord shard per input block on write (idempotent on task retry),
read_binary_files -> per-shard parse on read.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa
import ray.data


def _make_crc_table() -> np.ndarray:
    poly = np.uint32(0x82F63B78)
    tab = np.empty(256, dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (poly if c & np.uint32(1) else np.uint32(0))
        tab[i] = c
    return tab


_CRC_TABLE = _make_crc_table()
_MASK_DELTA = np.uint32(0xA282EAD8)


def crc32c_many(bufs: list[bytes]) -> np.ndarray:
    """crc32c of each buffer, lane-parallel: one LUT gather per byte
    position across all lanes. Memory is O(n * max_len); callers batch
    records of broadly similar size (shards do)."""
    n = len(bufs)
    if n == 0:
        return np.empty(0, dtype=np.uint32)
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    ml = int(lens.max())
    data = np.zeros((n, ml), dtype=np.uint8)
    for i, b in enumerate(bufs):
        data[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    crc = np.full(n, 0xFFFFFFFF, dtype=np.uint32)
    order = np.argsort(lens)  # retire short lanes early
    data = data[order]
    slens = lens[order]
    live_from = 0
    for pos in range(ml):
        # lanes shorter than pos+1 are frozen; they're a sorted prefix
        live_from = int(np.searchsorted(slens, pos + 1))
        sl = slice(live_from, n)
        c = crc[order[sl]]
        crc[order[sl]] = _CRC_TABLE[(c ^ data[sl, pos]) & np.uint32(0xFF)] ^ (
            c >> np.uint32(8)
        )
    return crc ^ np.uint32(0xFFFFFFFF)


def _masked(crc: np.ndarray) -> np.ndarray:
    rot = (crc >> np.uint32(15)) | (crc << np.uint32(17))
    return (rot + _MASK_DELTA).astype(np.uint32)


# ---------------------------------------------------------------------------
# record framing


def frame_records(payloads: list[bytes]) -> bytes:
    """Concatenated TFRecord frames for a list of serialized messages."""
    lens = [struct.pack("<Q", len(p)) for p in payloads]
    lcrc = _masked(crc32c_many(lens))
    dcrc = _masked(crc32c_many(payloads))
    parts = []
    for i, p in enumerate(payloads):
        parts.append(lens[i])
        parts.append(struct.pack("<I", int(lcrc[i])))
        parts.append(p)
        parts.append(struct.pack("<I", int(dcrc[i])))
    return b"".join(parts)


def unframe_records(data: bytes) -> list[bytes]:
    """Parse a TFRecord stream; verifies both CRCs of every record."""
    out: list[bytes] = []
    lens_b: list[bytes] = []
    lcrcs: list[int] = []
    dcrcs: list[int] = []
    pos, n = 0, len(data)
    while pos < n:
        if n - pos < 12:
            raise ValueError(f"tfrecord: truncated frame header at byte {pos}")
        (length,) = struct.unpack_from("<Q", data, pos)
        (lc,) = struct.unpack_from("<I", data, pos + 8)
        end = pos + 12 + length
        if end + 4 > n:
            raise ValueError(f"tfrecord: truncated record body at byte {pos}")
        (dc,) = struct.unpack_from("<I", data, end)
        lens_b.append(data[pos : pos + 8])
        lcrcs.append(lc)
        dcrcs.append(dc)
        out.append(data[pos + 12 : end])
        pos = end + 4
    want_l = _masked(crc32c_many(lens_b))
    want_d = _masked(crc32c_many(out))
    bad = np.flatnonzero(
        (want_l != np.array(lcrcs, dtype=np.uint32))
        | (want_d != np.array(dcrcs, dtype=np.uint32))
    )
    if len(bad):
        raise ValueError(f"tfrecord: CRC mismatch in records {bad[:5].tolist()}")
    return out


# ---------------------------------------------------------------------------
# minimal tf.train.Example proto codec


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7
        if shift > 70:
            raise ValueError("tfrecord: runaway varint")


def _len_delim(tag_field: int, payload: bytes) -> bytes:
    return _varint(tag_field << 3 | 2) + _varint(len(payload)) + payload


def encode_example(features: dict) -> bytes:
    """dict -> serialized Example. Value kinds: bytes -> BytesList,
    str -> BytesList(utf-8), int -> Int64List, float -> FloatList
    (float32!), and lists thereof."""
    entries = []
    for key in sorted(features):  # sorted: deterministic bytes
        val = features[key]
        vals = val if isinstance(val, (list, tuple, np.ndarray)) else [val]
        vals = list(vals)
        if vals and isinstance(vals[0], (bytes, str)):
            bl = b"".join(
                _len_delim(1, v.encode("utf-8") if isinstance(v, str) else v)
                for v in vals
            )
            feat = _len_delim(1, bl)  # Feature.bytes_list
        elif vals and isinstance(vals[0], (int, np.integer)):
            packed = b"".join(_varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in vals)
            feat = _len_delim(3, _len_delim(1, packed))  # Int64List.value packed
        elif vals and isinstance(vals[0], (float, np.floating)):
            packed = np.asarray(vals, dtype="<f4").tobytes()
            feat = _len_delim(2, _len_delim(1, packed))  # FloatList.value packed
        elif not vals:
            feat = _varint(1 << 3 | 2) + _varint(0)  # empty BytesList
        else:
            raise TypeError(f"tfrecord: unsupported value type for {key!r}")
        kb = key.encode("utf-8")
        entry = _len_delim(1, kb) + _len_delim(2, feat)  # map entry {key, Feature}
        entries.append(_len_delim(1, entry))  # Features.feature
    features_msg = b"".join(entries)
    return _len_delim(1, features_msg)  # Example.features


def decode_example(buf: bytes) -> dict:
    """Serialized Example -> {key: bytes-list | int-list | float-list}
    (scalars stay length-1 lists; callers unwrap per their schema)."""
    out: dict = {}
    # Example -> features (field 1)
    pos = 0
    while pos < len(buf):
        tag, pos = _read_varint(buf, pos)
        if tag >> 3 == 1 and tag & 7 == 2:
            flen, pos = _read_varint(buf, pos)
            fbuf = buf[pos : pos + flen]
            pos += flen
            fpos = 0
            while fpos < len(fbuf):
                etag, fpos = _read_varint(fbuf, fpos)
                elen, fpos = _read_varint(fbuf, fpos)
                entry = fbuf[fpos : fpos + elen]
                fpos += elen
                key, vals = _decode_map_entry(entry)
                out[key] = vals
        else:
            raise ValueError(f"tfrecord: unexpected Example field tag {tag}")
    return out


def _decode_map_entry(entry: bytes):
    pos = 0
    key = None
    vals: list = []
    while pos < len(entry):
        tag, pos = _read_varint(entry, pos)
        ln, pos = _read_varint(entry, pos)
        payload = entry[pos : pos + ln]
        pos += ln
        if tag >> 3 == 1:
            key = payload.decode("utf-8")
        else:  # Feature
            fpos = 0
            ftag, fpos = _read_varint(payload, fpos)
            flen, fpos = _read_varint(payload, fpos)
            body = payload[fpos : fpos + flen]
            kind = ftag >> 3
            if kind == 1:  # BytesList: repeated len-delimited
                bpos = 0
                while bpos < len(body):
                    btag, bpos = _read_varint(body, bpos)
                    blen, bpos = _read_varint(body, bpos)
                    vals.append(body[bpos : bpos + blen])
                    bpos += blen
            elif kind == 3:  # Int64List packed varints
                bpos = 0
                while bpos < len(body):
                    btag, bpos = _read_varint(body, bpos)
                    blen, bpos = _read_varint(body, bpos)
                    vpos = bpos
                    while vpos < bpos + blen:
                        v, vpos = _read_varint(body, vpos)
                        if v >= 1 << 63:
                            v -= 1 << 64  # two's-complement int64
                        vals.append(v)
                    bpos += blen
            elif kind == 2:  # FloatList packed float32
                bpos = 0
                while bpos < len(body):
                    btag, bpos = _read_varint(body, bpos)
                    blen, bpos = _read_varint(body, bpos)
                    vals.extend(
                        float(x)
                        for x in np.frombuffer(body, dtype="<f4", count=blen // 4, offset=bpos)
                    )
                    bpos += blen
            else:
                raise ValueError(f"tfrecord: unknown Feature kind {kind}")
    if key is None:
        raise ValueError("tfrecord: map entry without key")
    return key, vals


# ---------------------------------------------------------------------------
# Ray integration (mirrors sources/wds.py)


def write_tfrecord_shards(
    ds: ray.data.Dataset, out_dir: str, shard_rows: int = 2000
) -> pa.Table:
    """Each row -> one Example (every column a feature); one
    content-addressed .tfrecord shard per batch. Returns the manifest
    (shard, rows, bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(t: pa.Table) -> pa.Table:
        cols = t.schema.names
        pydata = {c: t[c].to_pylist() for c in cols}
        payloads = [
            encode_example({c: pydata[c][i] for c in cols}) for i in range(len(t))
        ]
        data = frame_records(payloads)
        name = (
            "shard-"
            + hashlib.md5(b"".join(p[:32] for p in payloads[:64])).hexdigest()[:16]
            + ".tfrecord"
        )
        tmp = os.path.join(out_dir, f".tmp-{name}-{os.getpid()}")
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({
            "shard": pa.array([name], type=pa.string()),
            "rows": pa.array([len(t)], type=pa.int64()),
            "bytes": pa.array([len(data)], type=pa.int64()),
        })

    manifest = ds.map_batches(
        write_batch, batch_format="pyarrow", batch_size=shard_rows
    )
    return pa.concat_tables(
        list(manifest.iter_batches(batch_format="pyarrow", batch_size=None))
    )


def read_tfrecord_shards(
    shard_dir: str, string_cols: tuple = (), schema: pa.Schema | None = None
) -> ray.data.Dataset:
    """Shard dir -> Dataset. BytesList stays binary unless the column
    is named in string_cols (then utf-8); scalar lists unwrap. Pass
    `schema` to pin arrow types exactly (recommended for empty-shard
    stability and int32/float64 casts)."""
    files = ray.data.read_binary_files(shard_dir, file_extensions=["tfrecord"])
    scols = set(string_cols)

    def parse(t: pa.Table) -> pa.Table:
        rows = []
        for b in t["bytes"]:
            for rec in unframe_records(b.as_py()):
                ex = decode_example(rec)
                row = {}
                for k, vals in ex.items():
                    if vals and isinstance(vals[0], bytes) and k in scols:
                        vals = [v.decode("utf-8") for v in vals]
                    row[k] = vals[0] if len(vals) == 1 else vals
                rows.append(row)
        if schema is not None:
            return pa.Table.from_pylist(rows, schema=schema)
        return pa.Table.from_pylist(rows)

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)
