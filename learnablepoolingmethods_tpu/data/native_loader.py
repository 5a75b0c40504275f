"""ctypes binding for the native C++ TFRecord batch loader.

Compiles ``native/tfrecord_reader.cc`` on first use (g++ -O3 -shared, cached
next to the source) and exposes file-level parse functions returning packed
NumPy arrays.  ctypes releases the GIL for the duration of each C call, so a
``ThreadPoolExecutor`` over files gives real multi-core parsing — the native
replacement for the reference's ``--num_readers`` queue-runner threads
(ref: train.py#get_input_data_tensors).

Falls back cleanly: importing this module never raises — ``is_available()``
reports whether the native path compiled.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "tfrecord_reader.cc")
_SRC_CSV = os.path.join(_REPO_ROOT, "native", "csv_formatter.cc")
_SO = os.path.join(_REPO_ROOT, "native", "libtfrecord_reader.so")

_lib = None
_load_error: Optional[str] = None
ID_WIDTH = 32


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", _SO, _SRC, _SRC_CSV,
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        newest_src = max(os.path.getmtime(_SRC), os.path.getmtime(_SRC_CSV))
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < newest_src:
            _build()
        lib = ctypes.CDLL(_SO)
        lib.lpm_count_records.restype = ctypes.c_int64
        lib.lpm_count_records.argtypes = [ctypes.c_char_p]
        lib.lpm_parse_frame_file.restype = ctypes.c_int64
        lib.lpm_parse_frame_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.c_char_p,
        ]
        lib.lpm_parse_video_file.restype = ctypes.c_int64
        lib.lpm_parse_video_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int32, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_char_p,
        ]
        lib.lpm_parse_frame_file_range.restype = ctypes.c_int64
        lib.lpm_parse_frame_file_range.argtypes = (
            [ctypes.c_char_p, ctypes.c_int64]
            + list(lib.lpm_parse_frame_file.argtypes[1:])
        )
        lib.lpm_parse_video_file_range.restype = ctypes.c_int64
        lib.lpm_parse_video_file_range.argtypes = (
            [ctypes.c_char_p, ctypes.c_int64]
            + list(lib.lpm_parse_video_file.argtypes[1:])
        )
        lib.lpm_chunk_offsets.restype = ctypes.c_int64
        lib.lpm_chunk_offsets.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.lpm_parse_frame_record.restype = ctypes.c_int32
        lib.lpm_parse_frame_record.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.lpm_parse_video_record.restype = ctypes.c_int32
        lib.lpm_parse_video_record.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.lpm_format_csv.restype = ctypes.c_int64
        lib.lpm_format_csv.argtypes = [
            ctypes.c_int64, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p, ctypes.c_int64,
        ]
        _lib = lib
    except Exception as e:  # noqa: BLE001 — degrade to the Python parser
        _load_error = f"{type(e).__name__}: {e}"
    return _lib


def is_available() -> bool:
    return _load() is not None


def load_error() -> Optional[str]:
    _load()
    return _load_error


def _pack_names(names: Sequence[str]) -> bytes:
    return b"".join(n.encode() + b"\0" for n in names)


def count_records(path: str) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    n = lib.lpm_count_records(path.encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    return int(n)


def chunk_offsets(path: str, chunk_records: int) -> List[int]:
    """Byte offsets where every ``chunk_records``-record chunk starts (a
    framing-only fseek walk).  Feed each offset to ``parse_frame_file`` /
    ``parse_video_file`` with ``start_offset=``/``max_records=`` to parse a
    file in bounded-memory chunks."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    cap = 1024
    while True:
        out = (ctypes.c_int64 * cap)()
        n = lib.lpm_chunk_offsets(path.encode(), chunk_records, out, cap)
        if n < 0:
            raise IOError(f"cannot read {path}")
        if n < cap:
            return list(out[: int(n)])
        cap *= 8


def parse_frame_file(
    path: str,
    max_frames: int = 300,
    feature_sizes: Sequence[int] = (1024, 128),
    feature_names: Sequence[str] = ("rgb", "audio"),
    num_classes: int = 3862,
    start_offset: int = 0,
    max_records: Optional[int] = None,
):
    """→ dict(features [N,F,D] uint8, num_frames [N], labels [N,V], video_id list).

    ``start_offset``/``max_records`` select one chunk (offsets from
    ``chunk_offsets``); the default parses the whole file."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    cap = count_records(path) if max_records is None else int(max_records)
    total = sum(feature_sizes)
    frames = np.zeros((cap, max_frames, total), np.uint8)
    num_frames = np.zeros(cap, np.int32)
    labels = np.zeros((cap, num_classes), np.float32)
    vids = ctypes.create_string_buffer(cap * ID_WIDTH)
    sizes = (ctypes.c_int32 * len(feature_sizes))(*feature_sizes)
    n = lib.lpm_parse_frame_file_range(
        path.encode(), start_offset, max_frames, sizes, len(feature_sizes),
        _pack_names(feature_names), num_classes, cap, ID_WIDTH,
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_frames.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vids,
    )
    if n < 0:
        raise IOError(f"native parse failed for {path}")
    n = int(n)
    ids = [
        vids.raw[i * ID_WIDTH : (i + 1) * ID_WIDTH].rstrip(b"\0")
        for i in range(n)
    ]
    return {
        "features": frames[:n],
        "num_frames": num_frames[:n],
        "labels": labels[:n],
        "video_id": ids,
    }


def parse_video_file(
    path: str,
    feature_sizes: Sequence[int] = (1024, 128),
    feature_names: Sequence[str] = ("mean_rgb", "mean_audio"),
    num_classes: int = 3862,
    start_offset: int = 0,
    max_records: Optional[int] = None,
):
    """→ dict(features [N,D] float32, labels [N,V], video_id list)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    cap = count_records(path) if max_records is None else int(max_records)
    total = sum(feature_sizes)
    feats = np.zeros((cap, total), np.float32)
    labels = np.zeros((cap, num_classes), np.float32)
    vids = ctypes.create_string_buffer(cap * ID_WIDTH)
    sizes = (ctypes.c_int32 * len(feature_sizes))(*feature_sizes)
    n = lib.lpm_parse_video_file_range(
        path.encode(), start_offset, sizes, len(feature_sizes),
        _pack_names(feature_names), num_classes, cap, ID_WIDTH,
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vids,
    )
    if n < 0:
        raise IOError(f"native parse failed for {path}")
    n = int(n)
    ids = [
        vids.raw[i * ID_WIDTH : (i + 1) * ID_WIDTH].rstrip(b"\0")
        for i in range(n)
    ]
    return {"features": feats[:n], "labels": labels[:n], "video_id": ids}


def parse_frame_record(
    record: bytes,
    max_frames: int = 300,
    feature_sizes: Sequence[int] = (1024, 128),
    feature_names: Sequence[str] = ("rgb", "audio"),
):
    """One serialized SequenceExample blob → (features [F,D] uint8, nf) —
    the per-record entry point the native serving binary uses on
    HTTP-posted records (native/serving_main.cc)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    total = sum(feature_sizes)
    frames = np.zeros((max_frames, total), np.uint8)
    nf = ctypes.c_int32(0)
    sizes = (ctypes.c_int32 * len(feature_sizes))(*feature_sizes)
    rc = lib.lpm_parse_frame_record(
        record, len(record), max_frames, sizes, len(feature_sizes),
        _pack_names(feature_names),
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(nf),
    )
    if rc != 0:
        raise ValueError("malformed record")
    return frames, int(nf.value)


def parse_video_record(
    record: bytes,
    feature_sizes: Sequence[int] = (1024, 128),
    feature_names: Sequence[str] = ("mean_rgb", "mean_audio"),
):
    """One serialized Example blob → features [D] float32."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    total = sum(feature_sizes)
    feats = np.zeros((total,), np.float32)
    sizes = (ctypes.c_int32 * len(feature_sizes))(*feature_sizes)
    rc = lib.lpm_parse_video_record(
        record, len(record), sizes, len(feature_sizes),
        _pack_names(feature_names),
        feats.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise ValueError("malformed record")
    return feats


def format_csv(video_ids, values, indices) -> bytes:
    """Kaggle CSV lines at C speed (ref: inference.py#format_lines;
    byte-identical output — see native/csv_formatter.cc).

    video_ids: sequence of bytes/str; values [N, k] float; indices [N, k] int.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_error}")
    values = np.ascontiguousarray(values, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    n, k = values.shape
    ids = [v.encode() if isinstance(v, str) else bytes(v) for v in video_ids]
    id_width = max((len(v) for v in ids), default=1) + 1  # +1 keeps NUL pad
    packed = bytearray(n * id_width)
    for i, v in enumerate(ids):
        packed[i * id_width : i * id_width + len(v)] = v
    cap = n * (id_width + 2 + k * 56) + 16
    out = ctypes.create_string_buffer(cap)
    written = lib.lpm_format_csv(
        n, k, bytes(packed), id_width,
        values.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out, cap,
    )
    if written == -2:
        raise ValueError(
            "csv formatter: score magnitude too large to format (>= ~1e32)"
        )
    if written < 0:
        raise RuntimeError("csv formatter buffer overflow")
    return out.raw[:written]


def parse_files_parallel(
    paths: List[str],
    frame_level: bool,
    num_workers: int = 8,
    **kwargs,
) -> Iterator[dict]:
    """Parse many files concurrently (GIL released inside the C calls),
    yielding per-file (or per-chunk) dicts in input order.

    Submission is a BOUNDED window of ``num_workers + 1`` tasks, not the
    whole list: a parsed frame-level file is ~1 GB of padded arrays, and a
    consumer slower than the parsers (e.g. packed_cache.build_cache writing
    its memmap) would otherwise accumulate every completed future in RAM —
    measured 17.9 GB peak RSS on a 50k-video / 16-shard build before the
    window (ingest-scale rehearsal, round 4; 1.1 GB after window+chunking).

    ``chunk_records > 0`` additionally splits every file into fixed-record
    chunks (byte offsets from a framing-only fseek walk, parsed
    independently via the C range entry points), so peak memory is
    ``(num_workers + 1) × chunk_records`` padded rows — independent of BOTH
    dataset and shard size.  Record order is preserved."""
    chunk_records = int(kwargs.pop("chunk_records", 0) or 0)
    fn = parse_frame_file if frame_level else parse_video_file
    from collections import deque

    def tasks() -> Iterator[dict]:
        for p in paths:
            if chunk_records > 0:
                for off in chunk_offsets(p, chunk_records):
                    yield dict(path=p, start_offset=off,
                               max_records=chunk_records, **kwargs)
            else:
                yield dict(path=p, **kwargs)

    with ThreadPoolExecutor(max_workers=num_workers) as pool:
        it = tasks()
        inflight: deque = deque()
        for t in it:
            inflight.append(pool.submit(fn, **t))
            if len(inflight) > num_workers:
                break
        while inflight:
            fut = inflight.popleft()
            nxt = next(it, None)
            if nxt is not None:
                inflight.append(pool.submit(fn, **nxt))
            yield fut.result()
