"""grain-based input pipeline (SURVEY.md §2.4: the reference's
``--num_readers`` queue-runner parallelism → a grain DataLoader).

Provides a random-access view over TFRecord shards (offset index built with
one framing-only scan per file), wired into ``grain.python.DataLoader`` with
per-epoch shuffling, worker processes, and `ShardByJaxProcess` multi-host
sharding.  This is the checkpointable, deterministic alternative to
``data/pipeline.py``'s streaming iterators; both emit the same batch schema.
"""

from __future__ import annotations

import glob as _glob
import struct
import threading
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from learnablepoolingmethods_tpu.data import tfrecord_io
from learnablepoolingmethods_tpu.data.readers import _get_id, _multi_hot, resize_axis

_U64 = struct.Struct("<Q")


def build_offset_index(path: str) -> List[Tuple[int, int]]:
    """One cheap framing-only pass → [(offset, length), ...] per record."""
    index = []
    with open(path, "rb") as f:
        pos = 0
        while True:
            header = f.read(12)
            if len(header) < 12:
                return index
            (length,) = _U64.unpack_from(header, 0)
            index.append((pos + 12, int(length)))
            pos += 12 + length + 4
            f.seek(pos)


class TFRecordRandomAccessSource:
    """grain RandomAccessDataSource over a set of TFRecord files.

    ``__getitem__`` seeks straight to the record — no sequential re-reads —
    enabling grain's global shuffle and exact mid-epoch checkpointing.
    """

    def __init__(
        self,
        data_pattern: str,
        frame_level: bool,
        feature_sizes: Sequence[int] = (1024, 128),
        feature_names: Optional[Sequence[str]] = None,
        num_classes: int = 3862,
        max_frames: int = 300,
    ):
        files = sorted(_glob.glob(data_pattern))
        if not files:
            raise IOError(f"Unable to find input files. data_pattern='{data_pattern}'")
        self._files = files
        self._frame_level = frame_level
        self._feature_sizes = list(feature_sizes)
        self._feature_names = list(
            feature_names
            or (("rgb", "audio") if frame_level else ("mean_rgb", "mean_audio"))
        )
        self._num_classes = num_classes
        self._max_frames = max_frames
        self._index: List[Tuple[int, int, int]] = []  # (file_idx, offset, length)
        for fi, path in enumerate(files):
            for off, ln in build_offset_index(path):
                self._index.append((fi, off, ln))
        # grain's in-process DataLoader prefetches from a thread pool, so a
        # shared handle's seek→read races between threads (observed: corrupt
        # records / "unsupported wire type").  Handles are per-thread.
        self._local = threading.local()

    def __len__(self) -> int:
        return len(self._index)

    def _read_raw(self, i: int) -> bytes:
        fi, off, ln = self._index[i]
        handles = getattr(self._local, "handles", None)
        if handles is None:
            handles = self._local.handles = {}
        fh = handles.get(fi)
        if fh is None:
            fh = handles[fi] = open(self._files[fi], "rb")
        fh.seek(off)
        return fh.read(ln)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        record = self._read_raw(int(i))
        if self._frame_level:
            context, fl = tfrecord_io.parse_sequence_example(record)
            total = sum(self._feature_sizes)
            frames = np.zeros((self._max_frames, total), np.uint8)
            col = 0
            nf = None
            for name, size in zip(self._feature_names, self._feature_sizes):
                feats = fl.get(name, [])
                mat = (
                    np.stack([np.frombuffer(x.bytes_list[0], np.uint8) for x in feats])
                    if feats
                    else np.zeros((0, size), np.uint8)
                )
                nf = mat.shape[0] if nf is None else min(nf, mat.shape[0])
                frames[:, col : col + size] = resize_axis(mat, 0, self._max_frames)
                col += size
            labels = context.get("labels")
            return {
                "video_id": _get_id(context),
                "features": frames,
                "num_frames": np.int32(min(nf or 0, self._max_frames)),
                "labels": _multi_hot(
                    labels.int64_list if labels else (), self._num_classes
                ),
            }
        fmap = tfrecord_io.parse_example(record)
        parts = [
            np.asarray(fmap[name].float_list, np.float32)
            if name in fmap and fmap[name].float_list is not None
            else np.zeros(size, np.float32)
            for name, size in zip(self._feature_names, self._feature_sizes)
        ]
        labels = fmap.get("labels")
        return {
            "video_id": _get_id(fmap),
            "features": np.concatenate(parts),
            "labels": _multi_hot(labels.int64_list if labels else (), self._num_classes),
        }

    # pickling for grain worker processes: drop the thread-local handles
    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_local", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._local = threading.local()


def grain_batch_iterator(
    data_pattern: str,
    batch_size: int,
    frame_level: bool,
    num_epochs: int = 1,
    shuffle: bool = False,
    seed: int = 0,
    worker_count: int = 0,
    shard_by_process: bool = True,
    **source_kwargs,
):
    """A grain DataLoader yielding the framework batch schema
    {features, labels, (num_frames), weights, video_id}."""
    import grain.python as gp

    source = TFRecordRandomAccessSource(
        data_pattern, frame_level, **source_kwargs
    )
    sharding = (
        gp.ShardByJaxProcess(drop_remainder=False)
        if shard_by_process
        else gp.NoSharding()
    )
    sampler = gp.IndexSampler(
        num_records=len(source),
        num_epochs=num_epochs,
        shard_options=sharding,
        shuffle=shuffle,
        seed=seed,
    )
    loader = gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=False)],
        worker_count=worker_count,
    )
    for batch in loader:
        n = batch["labels"].shape[0]
        out = {
            "features": batch["features"],
            "labels": batch["labels"],
            "weights": np.ones(n, np.float32),
            "video_id": list(batch["video_id"]),
        }
        if frame_level:
            out["num_frames"] = batch["num_frames"]
        yield out
