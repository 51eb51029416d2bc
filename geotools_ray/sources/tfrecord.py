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


def _lanes_crc_raw(data: np.ndarray, lens: np.ndarray, init: np.ndarray) -> np.ndarray:
    """Core lane-parallel CRC register update over a dense (n, max_len)
    byte matrix; `init` is each lane's incoming (inverted) register.
    Lanes are assumed SORTED by length ascending (short lanes retire as
    a prefix). Returns the raw registers (no final inversion)."""
    n, ml = data.shape
    crc = init.copy()
    for pos in range(ml):
        live_from = int(np.searchsorted(lens, pos + 1))
        sl = slice(live_from, n)
        c = crc[sl]
        crc[sl] = _CRC_TABLE[(c ^ data[sl, pos]) & np.uint32(0xFF)] ^ (
            c >> np.uint32(8)
        )
    return crc


# GF(2) combine machinery (zlib's crc32_combine with the CRC-32C poly):
# shift a CRC register past `length` zero bytes via 32x32 bit-matrix
# powers — lets one huge record be CRC'd as equal-length chunk lanes
# (computed IN PARALLEL by the dense kernel) folded with O(chunks)
# cheap matrix-vector products, instead of an O(length) Python loop.


def _gf2_times_vec(mat: np.ndarray, vec: int) -> int:
    out = 0
    i = 0
    while vec:
        if vec & 1:
            out ^= int(mat[i])
        vec >>= 1
        i += 1
    return out


def _gf2_square(mat: np.ndarray) -> np.ndarray:
    return np.array([_gf2_times_vec(mat, int(m)) for m in mat], dtype=np.uint32)


def _shift_operator(length: int) -> np.ndarray:
    """32x32 GF(2) matrix advancing a (reflected CRC-32C) register past
    `length` zero bytes, as zlib's crc32_combine builds it."""
    odd = np.zeros(32, dtype=np.uint32)
    odd[0] = np.uint32(0x82F63B78)  # reflected poly: one-bit shift
    for i in range(1, 32):
        odd[i] = np.uint32(1 << (i - 1))
    even = _gf2_square(odd)   # two bits
    odd = _gf2_square(even)   # four bits
    # now apply len2*8 bit-shifts = length bytes, squaring per bit
    mats = [even, odd]
    op = None
    length = int(length)
    k = 0
    while length:
        mats[k % 2] = _gf2_square(mats[(k + 1) % 2])
        if length & 1:
            m = mats[k % 2]
            op = m if op is None else np.array(
                [_gf2_times_vec(m, int(c)) for c in op], dtype=np.uint32
            )
        length >>= 1
        k += 1
    if op is None:  # length == 0: identity
        op = np.uint32(1) << np.arange(32, dtype=np.uint32)
    return op


def crc32c_combine(crc1: int, crc2: int, len2: int) -> int:
    """crc32c(A || B) from crc32c(A), crc32c(B), len(B) — zlib's
    crc32_combine algorithm with the Castagnoli polynomial."""
    if len2 == 0:
        return crc1
    return _gf2_times_vec(_shift_operator(len2), crc1) ^ crc2


_CHUNK = 1 << 14  # 16 KiB lanes for the big-record path
_LANE_BUDGET = 1 << 23  # max padded elements a small-group matrix may hold


def _crc_big(buf: bytes) -> int:
    """One large buffer: equal-length 16 KiB chunk lanes CRC'd in
    parallel (zero padding waste — the matrix IS the buffer), folded
    left-to-right with one shared shift operator."""
    n = len(buf)
    full = n // _CHUNK
    arr = np.frombuffer(buf, dtype=np.uint8, count=full * _CHUNK).reshape(full, _CHUNK)
    lens = np.full(full, _CHUNK, dtype=np.int64)
    init = np.zeros(full, dtype=np.uint32)  # raw registers: conditioning folded below
    regs = _lanes_crc_raw(arr, lens, init)
    # fold: crc32c(prefix||chunk) = shift(crc_prefix) ^ raw_chunk_reg
    # with standard pre/post inversion handled by starting from the
    # empty-string CRC and treating each chunk as an extension
    op = _shift_operator(_CHUNK)
    total = 0xFFFFFFFF  # inverted register of the empty prefix
    for i in range(full):
        total = _gf2_times_vec(op, total) ^ int(regs[i])
    tail = buf[full * _CHUNK :]
    if tail:
        tl = np.frombuffer(tail, dtype=np.uint8)[None, :]
        total = int(
            _lanes_crc_raw(
                tl.copy(), np.array([len(tail)], dtype=np.int64),
                np.array([total], dtype=np.uint32),
            )[0]
        )
    return total ^ 0xFFFFFFFF


def crc32c_many(bufs: list[bytes]) -> np.ndarray:
    """crc32c of each buffer. Small records run lane-parallel in
    length-sorted groups whose padded matrix stays under ~8M elements
    (one outlier can no longer inflate a whole batch's allocation);
    large records (> 1 MiB) run the chunk-lanes + GF(2)-combine path,
    so memory is O(sum of lengths) regardless of the size mix."""
    n = len(bufs)
    out = np.empty(n, dtype=np.uint32)
    if n == 0:
        return out
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    order = np.argsort(lens, kind="stable")
    start = 0
    while start < n:
        L = int(lens[order[start]])
        if L > (1 << 20):
            i = int(order[start])
            out[i] = _crc_big(bufs[i])
            start += 1
            continue
        # grow the group while the padded matrix stays in budget
        end = start + 1
        while (
            end < n
            and int(lens[order[end]]) <= (1 << 20)
            and (end - start + 1) * int(lens[order[end]]) <= _LANE_BUDGET
        ):
            end += 1
        idx = order[start:end]
        ml = max(1, int(lens[idx].max()))
        data = np.zeros((len(idx), ml), dtype=np.uint8)
        for j, i in enumerate(idx):
            b = bufs[int(i)]
            data[j, : len(b)] = np.frombuffer(b, dtype=np.uint8)
        regs = _lanes_crc_raw(
            data, lens[idx], np.full(len(idx), 0xFFFFFFFF, dtype=np.uint32)
        )
        out[idx] = regs ^ np.uint32(0xFFFFFFFF)
        start = end
    return out


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
        if pos >= len(buf):
            raise ValueError("tfrecord: truncated varint (malformed Example)")
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
        if val is None:
            # TF convention for null: the feature is ABSENT from the
            # Example; schema-pinned reads restore it as arrow null
            continue
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


def _skip_field(buf: bytes, pos: int, wire: int) -> int:
    """Advance past one field's payload given its wire type (the
    protobuf spec requires parsers to SKIP unknown fields, not raise)."""
    if wire == 0:  # varint
        _, pos = _read_varint(buf, pos)
    elif wire == 1:  # fixed64
        pos += 8
    elif wire == 2:  # length-delimited
        ln, pos = _read_varint(buf, pos)
        pos += ln
    elif wire == 5:  # fixed32
        pos += 4
    else:
        raise ValueError(f"tfrecord: unsupported wire type {wire}")
    if pos > len(buf):
        raise ValueError("tfrecord: truncated field payload")
    return pos


def decode_example(buf: bytes) -> dict:
    """Serialized Example -> {key: bytes-list | int-list | float-list}
    (scalars stay length-1 lists; callers unwrap per their schema).

    Wire-tolerant per the protobuf spec: unknown fields are skipped by
    wire type, and repeated scalars are accepted in BOTH packed
    (length-delimited) and non-packed (per-value varint / fixed32)
    encodings, so externally produced TFRecord files parse."""
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
                if etag >> 3 == 1 and etag & 7 == 2:
                    elen, fpos = _read_varint(fbuf, fpos)
                    entry = fbuf[fpos : fpos + elen]
                    fpos += elen
                    key, vals = _decode_map_entry(entry)
                    out[key] = vals
                else:
                    fpos = _skip_field(fbuf, fpos, etag & 7)
        else:
            pos = _skip_field(buf, pos, tag & 7)
    return out


def _decode_list_body(kind: int, body: bytes, vals: list) -> None:
    """Parse one BytesList/FloatList/Int64List message body into vals,
    accepting packed and non-packed repeated encodings."""
    bpos = 0
    while bpos < len(body):
        btag, bpos = _read_varint(body, bpos)
        bfield, bwire = btag >> 3, btag & 7
        if bfield != 1:  # unknown field inside the list message
            bpos = _skip_field(body, bpos, bwire)
            continue
        if kind == 1 and bwire == 2:  # BytesList: repeated len-delimited
            blen, bpos = _read_varint(body, bpos)
            vals.append(body[bpos : bpos + blen])
            bpos += blen
        elif kind == 3 and bwire == 0:  # Int64List non-packed varint
            v, bpos = _read_varint(body, bpos)
            if v >= 1 << 63:
                v -= 1 << 64
            vals.append(v)
        elif kind == 3 and bwire == 2:  # Int64List packed varints
            blen, bpos = _read_varint(body, bpos)
            vpos = bpos
            while vpos < bpos + blen:
                v, vpos = _read_varint(body, vpos)
                if v >= 1 << 63:
                    v -= 1 << 64  # two's-complement int64
                vals.append(v)
            bpos += blen
        elif kind == 2 and bwire == 5:  # FloatList non-packed fixed32
            vals.append(float(np.frombuffer(body, dtype="<f4", count=1, offset=bpos)[0]))
            bpos += 4
        elif kind == 2 and bwire == 2:  # FloatList packed float32
            blen, bpos = _read_varint(body, bpos)
            vals.extend(
                float(x)
                for x in np.frombuffer(body, dtype="<f4", count=blen // 4, offset=bpos)
            )
            bpos += blen
        else:
            bpos = _skip_field(body, bpos, bwire)


def _decode_map_entry(entry: bytes):
    pos = 0
    key = None
    vals: list = []
    while pos < len(entry):
        tag, pos = _read_varint(entry, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:  # key
            ln, pos = _read_varint(entry, pos)
            key = entry[pos : pos + ln].decode("utf-8")
            pos += ln
        elif field == 2 and wire == 2:  # Feature
            ln, pos = _read_varint(entry, pos)
            payload = entry[pos : pos + ln]
            pos += ln
            fpos = 0
            while fpos < len(payload):
                ftag, fpos = _read_varint(payload, fpos)
                kind, fwire = ftag >> 3, ftag & 7
                if kind in (1, 2, 3) and fwire == 2:
                    flen, fpos = _read_varint(payload, fpos)
                    body = payload[fpos : fpos + flen]
                    fpos += flen
                    _decode_list_body(kind, body, vals)
                else:  # unknown Feature field: skip, don't raise
                    fpos = _skip_field(payload, fpos, fwire)
        else:
            pos = _skip_field(entry, pos, wire)
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
        # hash the WHOLE framed stream: prefix-only hashing collided
        # for constant-leading-feature tables (distinct batches ->
        # same name -> silent overwrite); full-content addressing
        # keeps retry-idempotence (same batch -> same bytes -> name)
        name = "shard-" + hashlib.md5(data).hexdigest()[:16] + ".tfrecord"
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
                rows.append(decode_example(rec))
        if schema is not None:
            # schema-DRIVEN decode: list fields keep their list (a
            # length-1 list row must NOT unwrap), scalar fields unwrap,
            # bool fields cast back from Int64List's 0/1, absent
            # features (None values on write) restore as arrow nulls
            cols = []
            for field in schema:
                name, ftype = field.name, field.type
                vals = [r.get(name) for r in rows]
                is_list = pa.types.is_list(ftype) or pa.types.is_large_list(ftype)
                dec = name in scols
                out = []
                for v in vals:
                    if v is None:
                        out.append(None)
                        continue
                    if dec:
                        v = [x.decode("utf-8") if isinstance(x, bytes) else x
                             for x in v]
                    if is_list:
                        out.append(list(v))
                    else:
                        if len(v) != 1:
                            raise ValueError(
                                f"tfrecord: feature {name!r} has {len(v)} "
                                f"values but pinned type {ftype} is scalar"
                            )
                        x = v[0]
                        if pa.types.is_boolean(ftype):
                            x = bool(x)
                        out.append(x)
                cols.append(pa.array(out, type=ftype))
            return pa.Table.from_arrays(cols, schema=schema)
        # no pinned schema: BEST-EFFORT shape — length-1 lists unwrap
        # to scalars (ambiguous for genuinely-list columns whose row
        # holds one element; pass `schema` to disambiguate)
        shaped = []
        for r in rows:
            row = {}
            for k, vals in r.items():
                if vals and isinstance(vals[0], bytes) and k in scols:
                    vals = [v.decode("utf-8") for v in vals]
                row[k] = vals[0] if len(vals) == 1 else vals
            shaped.append(row)
        return pa.Table.from_pylist(shaped)

    return files.map_batches(parse, batch_format="pyarrow", batch_size=1)
