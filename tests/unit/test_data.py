"""Data ingestion tests: wire-format cross-validation vs TF, resize_axis, pipeline."""

import numpy as np
import pytest

from learnablepoolingmethods_tpu.data import (
    YT8MAggregatedFeatureReader,
    YT8MFrameFeatureReader,
    resize_axis,
)
from learnablepoolingmethods_tpu.data import fixtures, pipeline, tfrecord_io


# ---------- resize_axis (ref: readers.py#resize_axis) ----------

def test_resize_axis_pad_and_truncate():
    a = np.arange(12, dtype=np.uint8).reshape(4, 3)
    padded = resize_axis(a, 0, 6)
    assert padded.shape == (6, 3)
    np.testing.assert_array_equal(padded[:4], a)
    np.testing.assert_array_equal(padded[4:], 0)
    trunc = resize_axis(a, 0, 2)
    np.testing.assert_array_equal(trunc, a[:2])
    same = resize_axis(a, 0, 4)
    np.testing.assert_array_equal(same, a)


# ---------- our writer ↔ TF parser ----------

def test_video_fixture_parses_with_tf(tmp_path):
    import tensorflow as tf

    path = str(tmp_path / "video.tfrecord")
    truth = fixtures.write_video_level_fixture(path, num_videos=5, num_classes=50,
                                               rgb_size=8, audio_size=4)
    ds = list(tf.data.TFRecordDataset(path))
    assert len(ds) == 5
    for rec, t in zip(ds, truth):
        ex = tf.io.parse_single_example(
            rec,
            {
                "id": tf.io.FixedLenFeature([], tf.string),
                "labels": tf.io.VarLenFeature(tf.int64),
                "mean_rgb": tf.io.FixedLenFeature([8], tf.float32),
                "mean_audio": tf.io.FixedLenFeature([4], tf.float32),
            },
        )
        assert ex["id"].numpy() == t["video_id"]
        np.testing.assert_array_equal(
            np.sort(tf.sparse.to_dense(ex["labels"]).numpy()), t["labels"]
        )
        np.testing.assert_allclose(ex["mean_rgb"].numpy(), t["mean_rgb"], rtol=1e-6)


def test_frame_fixture_parses_with_tf(tmp_path):
    import tensorflow as tf

    path = str(tmp_path / "frame.tfrecord")
    truth = fixtures.write_frame_level_fixture(
        path, num_videos=3, num_classes=50, rgb_size=8, audio_size=4, max_frames=20
    )
    for rec, t in zip(tf.data.TFRecordDataset(path), truth):
        context, feats = tf.io.parse_single_sequence_example(
            rec,
            context_features={
                "id": tf.io.FixedLenFeature([], tf.string),
                "labels": tf.io.VarLenFeature(tf.int64),
            },
            sequence_features={
                "rgb": tf.io.FixedLenSequenceFeature([], tf.string),
                "audio": tf.io.FixedLenSequenceFeature([], tf.string),
            },
        )
        assert context["id"].numpy() == t["video_id"]
        rgb = tf.stack(
            [tf.io.decode_raw(r, tf.uint8) for r in feats["rgb"]]
        ).numpy()
        np.testing.assert_array_equal(rgb, t["rgb"])


# ---------- TF writer ↔ our parser ----------

def test_our_parser_reads_tf_written_records(tmp_path):
    import tensorflow as tf

    path = str(tmp_path / "tfwritten.tfrecord")
    rgb = np.random.default_rng(0).integers(0, 256, size=(7, 8), dtype=np.uint8)
    audio = np.random.default_rng(1).integers(0, 256, size=(7, 4), dtype=np.uint8)
    ex = tf.train.SequenceExample(
        context=tf.train.Features(
            feature={
                "id": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[b"tfvid"])
                ),
                "labels": tf.train.Feature(
                    int64_list=tf.train.Int64List(value=[3, 17])
                ),
            }
        ),
        feature_lists=tf.train.FeatureLists(
            feature_list={
                "rgb": tf.train.FeatureList(
                    feature=[
                        tf.train.Feature(
                            bytes_list=tf.train.BytesList(value=[row.tobytes()])
                        )
                        for row in rgb
                    ]
                ),
                "audio": tf.train.FeatureList(
                    feature=[
                        tf.train.Feature(
                            bytes_list=tf.train.BytesList(value=[row.tobytes()])
                        )
                        for row in audio
                    ]
                ),
            }
        ),
    )
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())

    reader = YT8MFrameFeatureReader(
        num_classes=50, feature_sizes=(8, 4), max_frames=10
    )
    recs = list(reader.read_file(path))
    assert len(recs) == 1
    r = recs[0]
    assert r["video_id"] == b"tfvid"
    assert r["num_frames"] == 7
    np.testing.assert_array_equal(r["features"][:7, :8], rgb)
    np.testing.assert_array_equal(r["features"][:7, 8:], audio)
    np.testing.assert_array_equal(r["features"][7:], 0)
    assert r["labels"][3] == 1 and r["labels"][17] == 1 and r["labels"].sum() == 2


def test_crc_verification_roundtrip(tmp_path):
    """Our masked-CRC framing is valid (verify_crc=True on our own file)."""
    path = str(tmp_path / "crc.tfrecord")
    fixtures.write_video_level_fixture(path, num_videos=2, num_classes=10,
                                       rgb_size=4, audio_size=2)
    recs = list(tfrecord_io.read_tfrecords(path, verify_crc=True))
    assert len(recs) == 2
    # corrupt one payload byte → CRC check must fail
    blob = bytearray(open(path, "rb").read())
    blob[20] ^= 0xFF
    bad = str(tmp_path / "bad.tfrecord")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(ValueError):
        list(tfrecord_io.read_tfrecords(bad, verify_crc=True))


# ---------- readers round-trip on own fixtures ----------

def test_video_reader_roundtrip(tmp_path):
    path = str(tmp_path / "v.tfrecord")
    truth = fixtures.write_video_level_fixture(path, num_videos=4, num_classes=30,
                                               rgb_size=8, audio_size=4)
    reader = YT8MAggregatedFeatureReader(num_classes=30, feature_sizes=(8, 4))
    recs = list(reader.read_pattern(str(tmp_path / "*.tfrecord")))
    assert len(recs) == 4
    for r, t in zip(recs, truth):
        assert r["video_id"] == t["video_id"]
        np.testing.assert_allclose(r["features"][:8], t["mean_rgb"], rtol=1e-6)
        np.testing.assert_allclose(r["features"][8:], t["mean_audio"], rtol=1e-6)
        assert set(np.nonzero(r["labels"])[0]) == set(t["labels"])


def test_frame_reader_truncates_to_max_frames(tmp_path):
    path = str(tmp_path / "f.tfrecord")
    fixtures.write_frame_level_fixture(path, num_videos=6, num_classes=20,
                                       rgb_size=8, audio_size=4, max_frames=50, seed=3)
    reader = YT8MFrameFeatureReader(num_classes=20, feature_sizes=(8, 4), max_frames=16)
    for r in reader.read_file(path):
        assert r["features"].shape == (16, 12)
        assert 1 <= r["num_frames"] <= 16


# ---------- pipeline ----------

def test_batch_iterator_shapes_and_padding(tmp_path):
    path = str(tmp_path / "v.tfrecord")
    fixtures.write_video_level_fixture(path, num_videos=10, num_classes=30,
                                       rgb_size=8, audio_size=4)
    reader = YT8MAggregatedFeatureReader(num_classes=30, feature_sizes=(8, 4))
    batches = list(
        pipeline.batch_iterator(reader, path, batch_size=4, num_epochs=1)
    )
    assert len(batches) == 3  # 4 + 4 + padded 2
    for b in batches:
        assert b["features"].shape == (4, 12)
        assert b["labels"].shape == (4, 30)
        assert b["weights"].shape == (4,)
    assert batches[-1]["weights"].tolist() == [1, 1, 0, 0]
    np.testing.assert_array_equal(batches[-1]["features"][2:], 0)


def test_batch_iterator_epochs_and_shuffle_determinism(tmp_path):
    path = str(tmp_path / "v.tfrecord")
    fixtures.write_video_level_fixture(path, num_videos=6, num_classes=10,
                                       rgb_size=4, audio_size=2)
    reader = YT8MAggregatedFeatureReader(num_classes=10, feature_sizes=(4, 2))
    b1 = list(pipeline.batch_iterator(reader, path, 3, num_epochs=2, shuffle=True, seed=7))
    b2 = list(pipeline.batch_iterator(reader, path, 3, num_epochs=2, shuffle=True, seed=7))
    assert len(b1) == 4  # 6*2/3
    for x, y in zip(b1, b2):
        np.testing.assert_array_equal(x["features"], y["features"])
    # different seed → different order
    b3 = list(pipeline.batch_iterator(reader, path, 3, num_epochs=2, shuffle=True, seed=8))
    assert any(
        not np.array_equal(x["features"], y["features"]) for x, y in zip(b1, b3)
    )


def test_missing_pattern_raises():
    reader = YT8MAggregatedFeatureReader()
    with pytest.raises(IOError, match="Unable to find input files"):
        list(pipeline.batch_iterator(reader, "/nonexistent/*.tfrecord", 4))


def test_native_batch_iterator_matches_python(tmp_path):
    """native_batch_iterator ≡ batch_iterator on the same files (no shuffle)."""
    from learnablepoolingmethods_tpu.data import native_loader

    if not native_loader.is_available():
        import pytest

        pytest.skip("native loader unavailable")
    path = str(tmp_path / "f.tfrecord")
    fixtures.write_frame_level_fixture(path, num_videos=9, num_classes=20,
                                       rgb_size=8, audio_size=4, max_frames=12, seed=2)
    reader = YT8MFrameFeatureReader(num_classes=20, feature_sizes=(8, 4), max_frames=12)
    py_batches = list(pipeline.batch_iterator(reader, path, 4, num_epochs=1))
    nat_batches = list(
        pipeline.native_batch_iterator(
            path, 4, frame_level=True, feature_sizes=(8, 4), num_classes=20,
            max_frames=12,
        )
    )
    assert len(py_batches) == len(nat_batches) == 3
    for pb, nb in zip(py_batches, nat_batches):
        np.testing.assert_array_equal(pb["features"], nb["features"])
        np.testing.assert_array_equal(pb["labels"], nb["labels"])
        np.testing.assert_array_equal(pb["num_frames"], nb["num_frames"])
        np.testing.assert_array_equal(pb["weights"], nb["weights"])
        assert pb["video_id"] == nb["video_id"]


def test_grain_pipeline_matches_streaming(tmp_path):
    """grain DataLoader path ≡ streaming reader on the same frame-level file."""
    from learnablepoolingmethods_tpu.data import grain_pipeline

    path = str(tmp_path / "g.tfrecord")
    fixtures.write_frame_level_fixture(path, num_videos=7, num_classes=15,
                                       rgb_size=8, audio_size=4, max_frames=10, seed=6)
    reader = YT8MFrameFeatureReader(num_classes=15, feature_sizes=(8, 4), max_frames=10)
    stream = [r for r in reader.read_file(path)]

    src = grain_pipeline.TFRecordRandomAccessSource(
        path, frame_level=True, feature_sizes=(8, 4), num_classes=15, max_frames=10
    )
    assert len(src) == 7
    for i, want in enumerate(stream):
        got = src[i]
        np.testing.assert_array_equal(got["features"], want["features"])
        assert got["num_frames"] == want["num_frames"]
        np.testing.assert_array_equal(got["labels"], want["labels"])
        assert got["video_id"] == want["video_id"]

    batches = list(
        grain_pipeline.grain_batch_iterator(
            path, batch_size=3, frame_level=True, feature_sizes=(8, 4),
            num_classes=15, max_frames=10, shard_by_process=False,
        )
    )
    assert sum(b["features"].shape[0] for b in batches) == 7
    np.testing.assert_array_equal(batches[0]["features"][0], stream[0]["features"])


def test_grain_pipeline_shuffles_deterministically(tmp_path):
    from learnablepoolingmethods_tpu.data import grain_pipeline

    path = str(tmp_path / "g2.tfrecord")
    fixtures.write_video_level_fixture(path, num_videos=12, num_classes=10,
                                       rgb_size=4, audio_size=2)
    kw = dict(batch_size=4, frame_level=False, feature_sizes=(4, 2),
              num_classes=10, shuffle=True, seed=5, shard_by_process=False)
    a = [b["video_id"] for b in grain_pipeline.grain_batch_iterator(path, **kw)]
    b = [b["video_id"] for b in grain_pipeline.grain_batch_iterator(path, **kw)]
    assert a == b  # same seed → same order
    flat = [v for batch in a for v in batch]
    assert sorted(flat) != flat  # actually shuffled


def test_grain_source_thread_safe(tmp_path, rng):
    """grain's in-process DataLoader prefetches on a thread pool; concurrent
    __getitem__ on a shared file handle raced seek→read and returned corrupt
    bytes (caught as 'unsupported wire type' in the CLI test).  Handles are
    now per-thread — hammer the source from many threads and verify every
    record parses to the same values as a sequential read."""
    from concurrent.futures import ThreadPoolExecutor

    from learnablepoolingmethods_tpu.data.fixtures import write_video_level_fixture
    from learnablepoolingmethods_tpu.data.grain_pipeline import (
        TFRecordRandomAccessSource,
    )

    path = str(tmp_path / "x.tfrecord")
    write_video_level_fixture(path, 32, num_classes=8, rgb_size=6, audio_size=2)
    src = TFRecordRandomAccessSource(
        path, frame_level=False, feature_sizes=(6, 2),
        feature_names=("mean_rgb", "mean_audio"), num_classes=8,
    )
    want = [src[i] for i in range(len(src))]

    def read_all(_):
        return [src[i] for i in range(len(src))]

    with ThreadPoolExecutor(max_workers=8) as pool:
        for got in pool.map(read_all, range(16)):
            for g, w in zip(got, want):
                assert g["video_id"] == w["video_id"]
                np.testing.assert_array_equal(g["features"], w["features"])
                np.testing.assert_array_equal(g["labels"], w["labels"])
