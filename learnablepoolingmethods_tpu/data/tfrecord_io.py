"""TF-free TFRecord + tf.Example/tf.SequenceExample wire-format reader.

The reference ingests via TF queue runners (ref: readers.py#BaseReader.
prepare_reader + tf.TFRecordReader).  The rebuild's inference hot path must
not depend on TensorFlow (SURVEY.md §7 hard parts: "TF-free inference hot
path"), so this module implements, in pure Python over ``struct``:

- the TFRecord framing: ``uint64 length | uint32 masked-crc(length) |
  payload | uint32 masked-crc(payload)`` (CRC verification optional — the
  fixtures' CRCs are validated against TF in tests), and
- a minimal protobuf wire-format decoder for exactly the message shapes the
  YT-8M dataset uses (Example / SequenceExample with bytes/float/int64
  feature lists).

This is also the executable spec for the native C++ batch loader
(``native/tfrecord_reader.cc``), which parallelizes the same decode.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Tuple

import numpy as np

_U64 = struct.Struct("<Q")
_U32 = struct.Struct("<I")

# ---------------------------------------------------------------------------
# TFRecord framing
# ---------------------------------------------------------------------------

# CRC32C (Castagnoli polynomial 0x82F63B78).  The C implementation
# (google_crc32c, ~GB/s) makes large fixture WRITES feasible — the pure-
# Python table (~6 MB/s) throttled the 50k-video ingest rehearsal's
# generator; the table stays as the zero-dependency fallback.
_CRC_TABLE = None

try:
    from google_crc32c import value as _crc32c  # type: ignore
except ImportError:  # pragma: no cover - exercised only without the wheel

    def _crc32c(data: bytes) -> int:
        global _CRC_TABLE
        if _CRC_TABLE is None:
            table = []
            for i in range(256):
                crc = i
                for _ in range(8):
                    crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
                table.append(crc)
            _CRC_TABLE = table
        crc = 0xFFFFFFFF
        for b in data:
            crc = _CRC_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def read_tfrecords(path: str, verify_crc: bool = False) -> Iterator[bytes]:
    """Yield raw serialized records from one TFRecord file."""
    with open(path, "rb") as f:
        while True:
            header = f.read(12)
            if len(header) < 12:
                return
            (length,) = _U64.unpack_from(header, 0)
            (len_crc,) = _U32.unpack_from(header, 8)
            if verify_crc and _masked_crc(header[:8]) != len_crc:
                raise ValueError(f"corrupt TFRecord length CRC in {path}")
            payload = f.read(length)
            if len(payload) < length:
                raise ValueError(f"truncated TFRecord payload in {path}")
            tail = f.read(4)
            if len(tail) < 4:
                raise ValueError(f"truncated TFRecord CRC in {path}")
            if verify_crc:
                (data_crc,) = _U32.unpack(tail)
                if _masked_crc(payload) != data_crc:
                    raise ValueError(f"corrupt TFRecord data CRC in {path}")
            yield payload


def write_tfrecord(f, payload: bytes) -> None:
    """Append one framed record (with valid masked CRCs) to an open file."""
    header = _U64.pack(len(payload))
    f.write(header)
    f.write(_U32.pack(_masked_crc(header)))
    f.write(payload)
    f.write(_U32.pack(_masked_crc(payload)))


# ---------------------------------------------------------------------------
# Protobuf wire format (just enough for Example / SequenceExample)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, object, int]]:
    """Yield (field_number, wire_type, value, end_pos) over a message buffer.

    wire 0 → varint int; wire 2 → bytes (memoryview); wire 5 → 4-byte fixed32
    (returned raw); wire 1 → 8-byte fixed64 (raw).
    """
    pos, n = 0, len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 0x7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            val = buf[pos : pos + 4]
            pos += 4
        elif wire == 1:
            val = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val, pos


class Feature:
    """Decoded tf.train.Feature: at most one of bytes/floats/ints."""

    __slots__ = ("bytes_list", "float_list", "int64_list")

    def __init__(self):
        self.bytes_list: List[bytes] = []
        self.float_list: np.ndarray = None
        self.int64_list: List[int] = []


def _parse_feature(buf: bytes) -> Feature:
    feat = Feature()
    for field, wire, val, _ in _iter_fields(buf):
        if field == 1:  # BytesList
            for f2, w2, v2, _ in _iter_fields(val):
                if f2 == 1:
                    feat.bytes_list.append(bytes(v2))
        elif field == 2:  # FloatList (packed or repeated fixed32)
            floats = []
            for f2, w2, v2, _ in _iter_fields(val):
                if f2 == 1:
                    if w2 == 2:  # packed
                        floats.append(np.frombuffer(v2, dtype="<f4"))
                    else:  # single fixed32
                        floats.append(np.frombuffer(v2, dtype="<f4"))
            feat.float_list = (
                np.concatenate(floats) if floats else np.zeros(0, np.float32)
            )
        elif field == 3:  # Int64List (packed varints or repeated)
            for f2, w2, v2, _ in _iter_fields(val):
                if f2 == 1:
                    if w2 == 2:  # packed varints
                        p = 0
                        while p < len(v2):
                            iv, p = _read_varint(v2, p)
                            feat.int64_list.append(iv)
                    else:
                        feat.int64_list.append(v2)
    return feat


def _parse_features_map(buf: bytes) -> Dict[str, Feature]:
    """tf.train.Features: map<string, Feature> as repeated entry messages."""
    out: Dict[str, Feature] = {}
    for field, _, val, _ in _iter_fields(buf):
        if field == 1:  # map entry
            key, fval = None, None
            for f2, _, v2, _ in _iter_fields(val):
                if f2 == 1:
                    key = bytes(v2).decode("utf-8")
                elif f2 == 2:
                    fval = _parse_feature(v2)
            if key is not None and fval is not None:
                out[key] = fval
    return out


def parse_example(record: bytes) -> Dict[str, Feature]:
    """Decode a serialized tf.train.Example → {name: Feature}."""
    for field, _, val, _ in _iter_fields(record):
        if field == 1:  # features
            return _parse_features_map(val)
    return {}


def parse_sequence_example(
    record: bytes,
) -> Tuple[Dict[str, Feature], Dict[str, List[Feature]]]:
    """Decode a tf.train.SequenceExample → (context map, feature_lists map)."""
    context: Dict[str, Feature] = {}
    feature_lists: Dict[str, List[Feature]] = {}
    for field, _, val, _ in _iter_fields(record):
        if field == 1:  # context: Features
            context = _parse_features_map(val)
        elif field == 2:  # feature_lists: FeatureLists
            for f2, _, v2, _ in _iter_fields(val):
                if f2 == 1:  # map entry
                    key, feats = None, []
                    for f3, _, v3, _ in _iter_fields(v2):
                        if f3 == 1:
                            key = bytes(v3).decode("utf-8")
                        elif f3 == 2:  # FeatureList
                            for f4, _, v4, _ in _iter_fields(v3):
                                if f4 == 1:
                                    feats.append(_parse_feature(v4))
                    if key is not None:
                        feature_lists[key] = feats
    return context, feature_lists
