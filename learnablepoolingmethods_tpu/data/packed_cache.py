"""Packed array cache: TFRecords pre-parsed once into memmappable arrays.

SURVEY.md §7 hard parts: "TF-free inference hot path — TFRecord parse must
not bottleneck 20k videos/sec; pre-parse to packed arrays".  Proto parsing
costs ~ms/video on a host core while the device sustains 80k videos/sec; a
one-time conversion into flat, batch-contiguous arrays turns every later
epoch into pure memcpy:

    features.npy        uint8  [N, max_frames, D]   (memmapped)
    num_frames.npy      int32  [N]
    video_ids.npy       bytes  [N] (fixed-width S)
    label_indices.npy   int32  [nnz]   ┐ CSR multi-hot (the dense [N, V]
    label_offsets.npy   int64  [N+1]   ┘  matrix is materialized per batch)
    meta.json           shapes / feature config / fingerprint

Build offline (``python -m learnablepoolingmethods_tpu.data.packed_cache
--input_pattern ... --output_dir ...``) or on first use via
``--packed_cache_dir`` in the train/eval/inference CLIs.  The builder uses
the native C++ parser when available.

This is the rebuild's analog of array_record/tensorstore ingestion: array
layout on disk, OS page cache doing the work, zero per-record Python.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

_META = "meta.json"


def _fingerprint(files) -> list:
    return [[os.path.basename(f), os.path.getsize(f)] for f in sorted(files)]


def _count_records(files) -> int:
    """Framing-only record count across files (native when available)."""
    from learnablepoolingmethods_tpu.data import native_loader

    if native_loader.is_available():
        return sum(native_loader.count_records(f) for f in files)
    from learnablepoolingmethods_tpu.data.grain_pipeline import build_offset_index

    return sum(len(build_offset_index(f)) for f in files)


def is_fresh(output_dir: str, data_pattern: str) -> bool:
    """True when a complete cache with a matching source fingerprint exists."""
    meta_path = os.path.join(output_dir, _META)
    if not os.path.exists(meta_path):
        return False
    files = sorted(_glob.glob(data_pattern))
    with open(meta_path) as f:
        return json.load(f).get("fingerprint") == _fingerprint(files)


def wait_for_cache(
    output_dir: str, data_pattern: str, timeout_s: float = 1800.0
) -> str:
    """Block until another process finishes building the cache (multi-host:
    only process 0 builds; the rest wait on meta.json — review finding: an
    unguarded concurrent build corrupts the arrays)."""
    import time as _time

    deadline = _time.monotonic() + timeout_s
    while _time.monotonic() < deadline:
        if is_fresh(output_dir, data_pattern):
            return output_dir
        _time.sleep(2.0)
    raise TimeoutError(
        f"packed cache at {output_dir} not built within {timeout_s:.0f}s"
    )


def build_cache(
    data_pattern: str,
    output_dir: str,
    frame_level: bool,
    feature_sizes: Sequence[int] = (1024, 128),
    feature_names: Optional[Sequence[str]] = None,
    num_classes: int = 3862,
    max_frames: int = 300,
    num_workers: int = 8,
) -> str:
    """Parse every record once and write the packed arrays.  Idempotent:
    an existing cache with a matching source fingerprint is reused."""
    from learnablepoolingmethods_tpu.data import pipeline

    files = sorted(_glob.glob(data_pattern))
    if not files:
        raise IOError(f"Unable to find input files. data_pattern='{data_pattern}'")
    meta_path = os.path.join(output_dir, _META)
    fp = _fingerprint(files)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fp:
            return output_dir  # fresh

    if feature_names is None:
        feature_names = ("rgb", "audio") if frame_level else ("mean_rgb", "mean_audio")
    os.makedirs(output_dir, exist_ok=True)

    # two-pass build: count first (cheap framing scan), then STREAM batches
    # straight into a disk-backed memmap — peak RAM stays one batch, not the
    # whole dataset (a 100k-video frame cache is ~35 GB; review finding)
    n_total = _count_records(files)
    total_dim = int(sum(feature_sizes))
    if frame_level:
        feat_shape = (n_total, int(max_frames), total_dim)
        feat_dtype = np.uint8
    else:
        feat_shape = (n_total, total_dim)
        feat_dtype = np.float32
    features = np.lib.format.open_memmap(
        os.path.join(output_dir, "features.npy"),
        mode="w+", dtype=feat_dtype, shape=feat_shape,
    )
    num_frames = np.zeros(n_total, np.int32) if frame_level else None
    ids: list = []
    label_idx, label_off = [], [0]
    row = 0
    # Dirty memmap pages count against this process's RSS until written
    # back; on a 100k-video build that is tens of GB of "resident" pages.
    # Periodically msync (flush) and MADV_DONTNEED the map so peak RSS stays
    # O(reclaim window + one parse batch) — measured by the ingest-scale
    # rehearsal (tests/integration/test_ingest_scale.py).
    import mmap as _mmap_mod

    row_bytes = int(np.prod(feat_shape[1:])) * features.dtype.itemsize
    reclaim_every_rows = max(1, (256 << 20) // max(row_bytes, 1))
    last_reclaim = 0
    for batch in pipeline.native_batch_iterator(
        data_pattern,
        batch_size=256,
        frame_level=frame_level,
        feature_sizes=feature_sizes,
        feature_names=feature_names,
        num_classes=num_classes,
        max_frames=max_frames,
        num_epochs=1,
        shuffle=False,
        num_workers=num_workers,
        pad_final_batch=False,
        # chunked parse: peak RAM is (num_workers+1) × 256 padded rows
        # (~90 MB at 300 frames), independent of shard AND dataset size
        chunk_records=256,
    ):
        b = batch["features"].shape[0]
        features[row : row + b] = batch["features"].astype(feat_dtype)
        if frame_level:
            num_frames[row : row + b] = batch["num_frames"]
        ids.extend(batch["video_id"])
        for lab in batch["labels"]:
            nz = np.nonzero(lab > 0)[0].astype(np.int32)
            label_idx.append(nz)
            label_off.append(label_off[-1] + len(nz))
        row += b
        if row - last_reclaim >= reclaim_every_rows and hasattr(
            features, "_mmap"
        ) and hasattr(features._mmap, "madvise"):
            # No msync needed: DONTNEED on a MAP_SHARED file mapping only
            # zaps this process's PTEs — dirty pages stay in the page cache
            # and kernel writeback persists them (verified: data intact,
            # RSS drops to baseline).
            features._mmap.madvise(_mmap_mod.MADV_DONTNEED)
            last_reclaim = row
    assert row == n_total, f"record count drifted: scanned {n_total}, read {row}"
    features.flush()
    del features

    if frame_level:
        np.save(os.path.join(output_dir, "num_frames.npy"), num_frames)
    width = max((len(v) for v in ids), default=1)
    np.save(
        os.path.join(output_dir, "video_ids.npy"),
        np.array(ids, dtype=f"S{width}"),
    )
    np.save(
        os.path.join(output_dir, "label_indices.npy"),
        np.concatenate(label_idx) if label_idx else np.zeros(0, np.int32),
    )
    np.save(
        os.path.join(output_dir, "label_offsets.npy"),
        np.asarray(label_off, np.int64),
    )
    meta = {
        "fingerprint": fp,
        "num_examples": int(n_total),
        "frame_level": frame_level,
        "num_classes": int(num_classes),
        "feature_sizes": list(feature_sizes),
        "feature_names": list(feature_names),
        "max_frames": int(max_frames),
    }
    # meta.json LAST: its presence (with a matching fingerprint) marks the
    # cache complete — readers and concurrent builders key off it
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return output_dir


class PackedCache:
    """Memmapped view over a built cache."""

    def __init__(self, cache_dir: str):
        with open(os.path.join(cache_dir, _META)) as f:
            self.meta = json.load(f)
        self.features = np.load(
            os.path.join(cache_dir, "features.npy"), mmap_mode="r"
        )
        self.frame_level = bool(self.meta["frame_level"])
        self.num_frames = (
            np.load(os.path.join(cache_dir, "num_frames.npy"))
            if self.frame_level
            else None
        )
        self.video_ids = np.load(os.path.join(cache_dir, "video_ids.npy"))
        self.label_indices = np.load(os.path.join(cache_dir, "label_indices.npy"))
        self.label_offsets = np.load(os.path.join(cache_dir, "label_offsets.npy"))
        self.num_classes = int(self.meta["num_classes"])

    def __len__(self) -> int:
        return int(self.meta["num_examples"])

    def dense_labels(self, sel: np.ndarray) -> np.ndarray:
        """Materialize the multi-hot rows for the selected examples
        (one vectorized scatter, no per-row Python)."""
        off = self.label_offsets
        counts = (off[sel + 1] - off[sel]).astype(np.int64)
        if counts.sum() == 0:
            return np.zeros((len(sel), self.num_classes), np.float32)
        # gather each row's index run: starts repeated per element + ramp
        starts = np.repeat(off[sel], counts)
        ramp = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        cols = self.label_indices[starts + ramp]
        rows = np.repeat(np.arange(len(sel), dtype=np.int64), counts)
        out = np.zeros((len(sel), self.num_classes), np.float32)
        out[rows, cols] = 1.0
        return out


def packed_batch_iterator(
    cache_dir: str,
    batch_size: int,
    num_epochs: Optional[int] = 1,
    shuffle: bool = False,
    seed: int = 0,
    pad_final_batch: bool = True,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Batches straight out of the memmap — the same schema as
    data/pipeline.py iterators.  Sequential order unless ``shuffle`` (a
    per-epoch permutation; random access costs page faults, sequential
    reads are pure page-cache)."""
    cache = PackedCache(cache_dir)
    n = len(cache)
    indices_all = np.arange(n)[shard_index::num_shards]
    rng = np.random.default_rng(seed)

    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        order = rng.permutation(indices_all) if shuffle else indices_all
        for start in range(0, len(order), batch_size):
            sel = order[start : start + batch_size]
            if len(sel) > 1 and bool(np.all(np.diff(sel) == 1)):
                # contiguous ascending run → plain slice (zero-copy view);
                # endpoints alone are NOT sufficient — a permutation like
                # [5, 99, 7] has matching endpoints but is not contiguous
                feats = np.asarray(cache.features[sel[0] : sel[-1] + 1])
            else:
                feats = np.asarray(cache.features[sel])
            ids = [bytes(v) for v in cache.video_ids[sel]]
            labels = cache.dense_labels(sel)
            b = len(sel)
            weights = np.ones(batch_size if pad_final_batch else b, np.float32)
            if pad_final_batch and b < batch_size:
                pad = batch_size - b
                feats = np.concatenate(
                    [feats, np.zeros((pad,) + feats.shape[1:], feats.dtype)]
                )
                labels = np.concatenate(
                    [labels, np.zeros((pad, labels.shape[1]), labels.dtype)]
                )
                ids = ids + [b""] * pad
                weights[b:] = 0.0
            out = {
                "features": feats,
                "labels": labels,
                "weights": weights,
                "video_id": ids,
            }
            if cache.frame_level:
                nf = cache.num_frames[sel]
                if pad_final_batch and b < batch_size:
                    nf = np.concatenate([nf, np.zeros(batch_size - b, np.int32)])
                out["num_frames"] = nf
            yield out
        epoch += 1


def main():
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input_pattern", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--frame_features", action="store_true")
    ap.add_argument("--feature_sizes", default="1024,128")
    ap.add_argument("--feature_names", default="")
    ap.add_argument("--num_classes", type=int, default=3862)
    ap.add_argument("--max_frames", type=int, default=300)
    ap.add_argument("--num_workers", type=int, default=8)
    args = ap.parse_args()
    sizes = tuple(int(x) for x in args.feature_sizes.split(","))
    names = (
        tuple(x for x in args.feature_names.split(",") if x) or None
    )
    out = build_cache(
        args.input_pattern,
        args.output_dir,
        frame_level=args.frame_features,
        feature_sizes=sizes,
        feature_names=names,
        num_classes=args.num_classes,
        max_frames=args.max_frames,
        num_workers=args.num_workers,
    )
    with open(os.path.join(out, _META)) as f:
        print(json.dumps(json.load(f)))


if __name__ == "__main__":
    main()
