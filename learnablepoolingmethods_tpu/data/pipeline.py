"""Host input pipeline: record streams → fixed-shape NumPy batches.

Replaces the reference's queue-runner machinery
(ref: train.py#get_input_data_tensors — string_input_producer +
num_readers × prepare_reader + shuffle_batch_join) with a deterministic
generator: file-order shuffle per epoch + a bounded shuffle buffer +
fixed-size batching.  Every batch has identical shapes (XLA-static); the
final partial batch is zero-padded with a per-example weight mask, mirroring
how the rebuild keeps shapes static instead of dropping remainder.

Frame features stay uint8 through this stage; dequantization happens on
device (see core/step.py).
"""

from __future__ import annotations

import glob as _glob
import random
from typing import Dict, Iterator, Optional

import numpy as np

from learnablepoolingmethods_tpu.data.readers import BaseReader


def _shuffled_records(
    reader: BaseReader,
    files,
    shuffle: bool,
    buffer_size: int,
    rng: random.Random,
) -> Iterator[dict]:
    if not shuffle:
        for path in files:
            yield from reader.read_file(path)
        return
    buf = []
    for path in files:
        for rec in reader.read_file(path):
            buf.append(rec)
            if len(buf) >= buffer_size:
                idx = rng.randrange(len(buf))
                buf[idx], buf[-1] = buf[-1], buf[idx]
                yield buf.pop()
    rng.shuffle(buf)
    yield from buf


def batch_iterator(
    reader: BaseReader,
    data_pattern: str,
    batch_size: int,
    num_epochs: Optional[int] = 1,
    shuffle: bool = False,
    shuffle_buffer: int = 1024,
    seed: int = 0,
    pad_final_batch: bool = True,
    shard_index: int = 0,
    num_shards: int = 1,
) -> Iterator[Dict[str, np.ndarray]]:
    """Yield batches: {video_id, features, labels, (num_frames), weights}.

    ``weights`` is 1.0 for real examples, 0.0 for end-of-data padding rows,
    so losses/metrics can mask them while shapes stay static.
    ``num_epochs=None`` streams forever (ref: train.py epoch-limited
    string_input_producer; eval uses num_epochs=1).

    Multi-host: pass ``shard_index=jax.process_index()`` /
    ``num_shards=jax.process_count()`` — each host reads a disjoint
    file-level shard (the rebuild's replacement for the reference's
    per-worker input split in distributed training).
    """
    files = sorted(_glob.glob(data_pattern))
    if not files:
        raise IOError(f"Unable to find input files. data_pattern='{data_pattern}'")
    if num_shards > 1:
        files = files[shard_index::num_shards]
        if not files:
            raise IOError(
                f"shard {shard_index}/{num_shards} got no files "
                f"(pattern matched fewer files than shards)"
            )
    rng = random.Random(seed)

    epoch = 0
    pending = []
    while num_epochs is None or epoch < num_epochs:
        epoch_files = list(files)
        if shuffle:
            rng.shuffle(epoch_files)
        for rec in _shuffled_records(reader, epoch_files, shuffle, shuffle_buffer, rng):
            pending.append(rec)
            if len(pending) == batch_size:
                yield _collate(pending, pad_to=None)
                pending = []
        epoch += 1

    if pending:
        yield _collate(pending, pad_to=batch_size if pad_final_batch else None)


def native_batch_iterator(
    data_pattern: str,
    batch_size: int,
    frame_level: bool,
    feature_sizes=(1024, 128),
    feature_names=None,
    num_classes: int = 3862,
    max_frames: int = 300,
    num_epochs: Optional[int] = 1,
    shuffle: bool = False,
    seed: int = 0,
    num_workers: int = 8,
    pad_final_batch: bool = True,
    shard_index: int = 0,
    num_shards: int = 1,
    chunk_records: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Batch iterator over the native C++ parser (data/native_loader.py).

    Files are parsed into packed arrays on a thread pool (the C calls release
    the GIL — this is the rebuild's ``--num_readers`` parallelism), then
    batches are sliced out with an optional per-epoch permutation.  Falls
    back to the Python reader automatically if the native library is
    unavailable.

    ``chunk_records > 0`` parses each file in fixed-record chunks (native
    range entry points), bounding peak memory independent of shard size —
    the packed-cache build uses this.  With ``shuffle`` the within-parse
    permutation then covers a chunk instead of a whole file (file order is
    still permuted per epoch); the fallback Python reader ignores it (it
    already streams record-by-record).

    Multi-host: ``shard_index``/``num_shards`` select a disjoint file-level
    shard per process, matching ``batch_iterator`` — without it every host
    would read all files and duplicate examples across DP replicas.
    """
    from learnablepoolingmethods_tpu.data import native_loader

    if feature_names is None:
        feature_names = ("rgb", "audio") if frame_level else ("mean_rgb", "mean_audio")

    if not native_loader.is_available():
        from learnablepoolingmethods_tpu.data.readers import (
            YT8MAggregatedFeatureReader,
            YT8MFrameFeatureReader,
        )

        reader = (
            YT8MFrameFeatureReader(num_classes, feature_sizes, feature_names, max_frames)
            if frame_level
            else YT8MAggregatedFeatureReader(num_classes, feature_sizes, feature_names)
        )
        yield from batch_iterator(
            reader, data_pattern, batch_size, num_epochs, shuffle,
            seed=seed, pad_final_batch=pad_final_batch,
            shard_index=shard_index, num_shards=num_shards,
        )
        return

    files = sorted(_glob.glob(data_pattern))
    if not files:
        raise IOError(f"Unable to find input files. data_pattern='{data_pattern}'")
    if num_shards > 1:
        files = files[shard_index::num_shards]
        if not files:
            raise IOError(
                f"shard {shard_index}/{num_shards} got no files "
                f"(pattern matched fewer files than shards)"
            )
    kwargs = dict(feature_sizes=tuple(feature_sizes), feature_names=tuple(feature_names),
                  num_classes=num_classes)
    if frame_level:
        kwargs["max_frames"] = max_frames
    rng = np.random.default_rng(seed)

    epoch = 0
    pending: list = []
    while num_epochs is None or epoch < num_epochs:
        epoch_files = list(files)
        if shuffle:
            rng.shuffle(epoch_files)
        for out in native_loader.parse_files_parallel(
            epoch_files, frame_level=frame_level, num_workers=num_workers,
            chunk_records=chunk_records, **kwargs
        ):
            n = out["features"].shape[0]
            order = rng.permutation(n) if shuffle else np.arange(n)
            for i in order:
                rec = {
                    "video_id": out["video_id"][i],
                    "features": out["features"][i],
                    "labels": out["labels"][i],
                }
                if frame_level:
                    rec["num_frames"] = out["num_frames"][i]
                pending.append(rec)
                if len(pending) == batch_size:
                    yield _collate(pending, pad_to=None)
                    pending = []
        epoch += 1
    if pending:
        yield _collate(pending, pad_to=batch_size if pad_final_batch else None)


def _collate(records, pad_to: Optional[int]) -> Dict[str, np.ndarray]:
    n = len(records)
    total = pad_to or n
    sample = records[0]

    out: Dict[str, np.ndarray] = {}
    feat = np.stack([r["features"] for r in records])
    labels = np.stack([r["labels"] for r in records])
    weights = np.ones(total, np.float32)
    if total > n:
        feat = np.concatenate(
            [feat, np.zeros((total - n,) + feat.shape[1:], feat.dtype)]
        )
        labels = np.concatenate(
            [labels, np.zeros((total - n,) + labels.shape[1:], labels.dtype)]
        )
        weights[n:] = 0.0
    out["features"] = feat
    out["labels"] = labels
    out["weights"] = weights
    out["video_id"] = [r["video_id"] for r in records] + [b""] * (total - n)
    if "num_frames" in sample:
        nf = np.asarray([r["num_frames"] for r in records], np.int32)
        if total > n:
            nf = np.concatenate([nf, np.zeros(total - n, np.int32)])
        out["num_frames"] = nf
    return out
