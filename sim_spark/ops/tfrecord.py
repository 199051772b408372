"""TFRecord container + tf.train.Example wire parse (round 14).

TFRecord is the de-facto sharded training-data format: a flat stream
of length-framed records, each integrity-checked with a MASKED
crc32c, conventionally holding a serialized ``tf.train.Example``
protobuf. A 100 TB curation pipeline reads these shards constantly;
this module implements the whole stack dependency-free:

* **crc32c** (Castagnoli polynomial 0x1EDC6F41, reflected table
  driven) and TensorFlow's mask ``((crc >> 15 | crc << 17) +
  0xA282EAD8) & 0xFFFFFFFF`` — applied to BOTH the 8-byte
  little-endian length header and the payload, and VERIFIED on read
  (the WARC-digest stance);
* **record framing**: ``[len u64le][masked_crc(len_bytes) u32le]
  [data][masked_crc(data) u32le]``;
* **protobuf wire format** (the general layer: base-128 varints,
  wire types 0/1/2/5, unknown-field skip by type) and the concrete
  ``tf.train.Example`` message graph — Example{1: Features},
  Features{1: map<string, Feature>} (map entries as nested
  key=1/value=2 messages), Feature as the oneof
  BytesList(1)/FloatList(2)/Int64List(3), with packed AND unpacked
  repeated encodings accepted for the numeric lists (both are legal
  on the wire; the encoder emits packed).

Typed ValueError on every malformed shape: truncated frames, either
CRC mismatching, varint overflow (>10 bytes), truncated
length-delimited fields, a Feature with multiple oneof arms, an
unknown wire type, trailing garbage after the last record.
"""

from __future__ import annotations

import struct

__all__ = [
    "crc32c",
    "masked_crc32c",
    "encode_tfrecord_file",
    "parse_tfrecord_file",
    "encode_example",
    "parse_example",
]

# --- crc32c (Castagnoli), reflected, table-driven ---------------------------


def _make_table() -> list[int]:
    poly = 0x82F63B78  # reflected 0x1EDC6F41
    tab = []
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        tab.append(c)
    return tab


_TAB = _make_table()


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _TAB[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def masked_crc32c(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# --- protobuf wire helpers ---------------------------------------------------


def _varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's-complement 64-bit, the proto convention
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    for i in range(10):
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, pos
        shift += 7
    raise ValueError("varint longer than 10 bytes")


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _ld(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _walk_fields(data: bytes):
    """Yield (field_number, wire_type, value) where value is the raw
    varint int (type 0), 8-byte chunk (1), bytes (2), 4-byte chunk
    (5). Unknown fields are the caller's business — this is the
    generic skip-capable layer."""
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(data, pos)
            yield field, wire, v
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise ValueError(
                    f"truncated length-delimited field {field}"
                )
            yield field, wire, data[pos:pos + ln]
            pos += ln
        elif wire == 5:
            if pos + 4 > len(data):
                raise ValueError(f"truncated fixed32 field {field}")
            yield field, wire, data[pos:pos + 4]
            pos += 4
        elif wire == 1:
            if pos + 8 > len(data):
                raise ValueError(f"truncated fixed64 field {field}")
            yield field, wire, data[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unknown wire type {wire} (field {field})")


# --- tf.train.Example --------------------------------------------------------


def encode_example(features: dict) -> bytes:
    """``features``: name -> list of ints (Int64List), list of floats
    (FloatList), or list of bytes (BytesList). Numeric lists are
    emitted PACKED."""
    entries = b""
    for name in features:
        vals = features[name]
        if all(isinstance(v, bytes) for v in vals) and vals:
            body = b"".join(_ld(1, v) for v in vals)
            feat = _ld(1, body)  # BytesList
        elif all(isinstance(v, int) for v in vals):
            body = _ld(1, b"".join(_varint(v) for v in vals)) if vals else b""
            feat = _ld(3, body)  # Int64List (packed)
        elif all(isinstance(v, float) for v in vals):
            body = _ld(1, b"".join(struct.pack("<f", v) for v in vals))
            feat = _ld(2, body)  # FloatList (packed)
        else:
            raise ValueError(
                f"feature {name!r}: mixed or unsupported value types"
            )
        entry = _ld(1, name.encode("utf-8")) + _ld(2, feat)
        entries += _ld(1, entry)
    return _ld(1, entries)  # Example.features


def _parse_list(kind: int, body: bytes):
    vals = []
    for f, w, v in _walk_fields(body):
        if f != 1:
            continue  # unknown field in the list message: skip
        if kind == 1:  # BytesList: repeated bytes
            if w != 2:
                raise ValueError("BytesList value with non-LD wire type")
            vals.append(v)
        elif kind == 3:  # Int64List: packed or unpacked varints
            if w == 0:
                vals.append(v - (1 << 64) if v >> 63 else v)
            elif w == 2:
                pos = 0
                while pos < len(v):
                    x, pos = _read_varint(v, pos)
                    vals.append(x - (1 << 64) if x >> 63 else x)
            else:
                raise ValueError("Int64List value with bad wire type")
        else:  # FloatList: packed or unpacked fixed32
            if w == 5:
                vals.append(struct.unpack("<f", v)[0])
            elif w == 2:
                if len(v) % 4:
                    raise ValueError("packed FloatList length not 4-aligned")
                vals.extend(
                    struct.unpack(f"<{len(v) // 4}f", v)
                )
            else:
                raise ValueError("FloatList value with bad wire type")
    return vals


def parse_example(data: bytes) -> dict:
    """Serialized Example -> {name: (kind, values)} with kind one of
    'bytes' | 'float' | 'int64'."""
    out: dict = {}
    for f, w, v in _walk_fields(data):
        if f != 1 or w != 2:
            continue  # unknown top-level field: skip
        for f2, w2, entry in _walk_fields(v):
            if f2 != 1 or w2 != 2:
                continue
            name = None
            feat = None
            for f3, w3, v3 in _walk_fields(entry):
                if f3 == 1 and w3 == 2:
                    name = v3.decode("utf-8")
                elif f3 == 2 and w3 == 2:
                    feat = v3
            if name is None or feat is None:
                raise ValueError("map entry missing key or value")
            arms = [(f4, v4) for f4, w4, v4 in _walk_fields(feat)
                    if f4 in (1, 2, 3) and w4 == 2]
            if len(arms) > 1:
                raise ValueError(
                    f"feature {name!r}: multiple oneof arms set"
                )
            if not arms:
                out[name] = ("int64", [])
                continue
            kind_id, body = arms[0]
            kind = {1: "bytes", 2: "float", 3: "int64"}[kind_id]
            out[name] = (kind, _parse_list(kind_id, body))
    return out


# --- record framing ----------------------------------------------------------


def encode_tfrecord_file(records: list[bytes]) -> bytes:
    out = bytearray()
    for rec in records:
        hdr = struct.pack("<Q", len(rec))
        out += hdr
        out += struct.pack("<I", masked_crc32c(hdr))
        out += rec
        out += struct.pack("<I", masked_crc32c(rec))
    return bytes(out)


def parse_tfrecord_file(data: bytes) -> list[bytes]:
    """Frame walk with both CRCs verified per record."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 12 > n:
            raise ValueError(f"truncated record header at offset {pos}")
        hdr = data[pos:pos + 8]
        (length,) = struct.unpack("<Q", hdr)
        (hcrc,) = struct.unpack_from("<I", data, pos + 8)
        if masked_crc32c(hdr) != hcrc:
            raise ValueError(f"length CRC mismatch at offset {pos}")
        pos += 12
        if pos + length + 4 > n:
            raise ValueError(
                f"truncated record body at offset {pos} "
                f"(need {length + 4}, have {n - pos})"
            )
        rec = data[pos:pos + length]
        (dcrc,) = struct.unpack_from("<I", data, pos + length)
        if masked_crc32c(rec) != dcrc:
            raise ValueError(f"data CRC mismatch at offset {pos}")
        pos += length + 4
        out.append(rec)
    return out
