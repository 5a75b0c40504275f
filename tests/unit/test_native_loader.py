"""Native C++ loader: build, parse, and cross-validate vs the Python parser."""

import numpy as np
import pytest

from learnablepoolingmethods_tpu.data import fixtures, native_loader
from learnablepoolingmethods_tpu.data.readers import (
    YT8MAggregatedFeatureReader,
    YT8MFrameFeatureReader,
)

pytestmark = pytest.mark.skipif(
    not native_loader.is_available(),
    reason=f"native loader unavailable: {native_loader.load_error()}",
)


def test_count_records(tmp_path):
    path = str(tmp_path / "v.tfrecord")
    fixtures.write_video_level_fixture(path, num_videos=7, num_classes=10,
                                       rgb_size=4, audio_size=2)
    assert native_loader.count_records(path) == 7


def test_video_parse_matches_python(tmp_path):
    path = str(tmp_path / "v.tfrecord")
    fixtures.write_video_level_fixture(path, num_videos=5, num_classes=30,
                                       rgb_size=8, audio_size=4)
    out = native_loader.parse_video_file(
        path, feature_sizes=(8, 4), num_classes=30
    )
    py = list(
        YT8MAggregatedFeatureReader(num_classes=30, feature_sizes=(8, 4)).read_file(path)
    )
    assert out["features"].shape == (5, 12)
    for i, rec in enumerate(py):
        np.testing.assert_allclose(out["features"][i], rec["features"], rtol=1e-6)
        np.testing.assert_array_equal(out["labels"][i], rec["labels"])
        assert out["video_id"][i] == rec["video_id"]


def test_frame_parse_matches_python(tmp_path):
    path = str(tmp_path / "f.tfrecord")
    fixtures.write_frame_level_fixture(path, num_videos=6, num_classes=25,
                                       rgb_size=8, audio_size=4, max_frames=40, seed=5)
    out = native_loader.parse_frame_file(
        path, max_frames=16, feature_sizes=(8, 4), num_classes=25
    )
    py = list(
        YT8MFrameFeatureReader(
            num_classes=25, feature_sizes=(8, 4), max_frames=16
        ).read_file(path)
    )
    assert out["features"].shape == (6, 16, 12)
    for i, rec in enumerate(py):
        np.testing.assert_array_equal(out["features"][i], rec["features"])
        assert out["num_frames"][i] == rec["num_frames"]
        np.testing.assert_array_equal(out["labels"][i], rec["labels"])
        assert out["video_id"][i] == rec["video_id"]


def test_parse_files_parallel(tmp_path):
    paths = []
    for k in range(3):
        p = str(tmp_path / f"v{k}.tfrecord")
        fixtures.write_video_level_fixture(p, num_videos=4, num_classes=10,
                                           rgb_size=4, audio_size=2, seed=k)
        paths.append(p)
    outs = list(
        native_loader.parse_files_parallel(
            paths, frame_level=False, num_workers=3,
            feature_sizes=(4, 2), num_classes=10,
        )
    )
    assert len(outs) == 3
    assert all(o["features"].shape == (4, 6) for o in outs)


def test_missing_file_raises():
    with pytest.raises(IOError):
        native_loader.count_records("/nonexistent.tfrecord")


def test_native_parses_tf_written_file(tmp_path):
    """Cross-validation #3: TF's writer → native parser."""
    import tensorflow as tf

    path = str(tmp_path / "tfw.tfrecord")
    ex = tf.train.Example(
        features=tf.train.Features(
            feature={
                "id": tf.train.Feature(bytes_list=tf.train.BytesList(value=[b"abc"])),
                "labels": tf.train.Feature(int64_list=tf.train.Int64List(value=[2, 5])),
                "mean_rgb": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[1.0, 2.0, 3.0, 4.0])
                ),
                "mean_audio": tf.train.Feature(
                    float_list=tf.train.FloatList(value=[5.0, 6.0])
                ),
            }
        )
    )
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())
    out = native_loader.parse_video_file(path, feature_sizes=(4, 2), num_classes=10)
    np.testing.assert_allclose(out["features"][0], [1, 2, 3, 4, 5, 6])
    assert out["labels"][0][2] == 1 and out["labels"][0][5] == 1
    assert out["video_id"][0] == b"abc"


def test_native_csv_formatter_byte_identical(rng):
    """native/csv_formatter.cc must emit exactly format_lines' bytes
    (scores %.6f, same int formatting), including negatives and mixed-width
    video ids."""
    from learnablepoolingmethods_tpu.data import native_loader
    from learnablepoolingmethods_tpu.utils.misc import format_lines

    if not native_loader.is_available():
        pytest.skip(f"native loader unavailable: {native_loader.load_error()}")
    vids = [b"a", b"longer_video_id_0123", "strid42", b"x" * 31]
    vals = (rng.random((4, 5)) * 2 - 1).astype(np.float32)
    idxs = rng.integers(0, 4000, size=(4, 5)).astype(np.int32)
    want = "".join(format_lines(vids, vals, idxs)).encode()
    got = native_loader.format_csv(vids, vals, idxs)
    assert got == want


def test_native_csv_formatter_large_values(rng):
    """Memory safety (review finding): big scores must format exactly or be
    rejected cleanly — never truncated with pos advanced past the buffer."""
    from learnablepoolingmethods_tpu.data import native_loader
    from learnablepoolingmethods_tpu.utils.misc import format_lines

    if not native_loader.is_available():
        pytest.skip(f"native loader unavailable: {native_loader.load_error()}")
    vids = [b"v0"]
    vals = np.array([[1e12, -123456.75, 1e20, 0.5, -1e26]], np.float32)
    idxs = np.array([[1, 22, 333, 4444, 55555]], np.int32)
    want = "".join(format_lines(vids, vals, idxs)).encode()
    got = native_loader.format_csv(vids, vals, idxs)
    assert got == want

    # 1e30 still formats exactly (38 chars < the 40-char budget)
    vals = np.array([[1e30]], np.float32)
    got = native_loader.format_csv([b"v0"], vals, np.array([[7]], np.int32))
    want = "".join(format_lines([b"v0"], vals, np.array([[7]]))).encode()
    assert got == want

    with pytest.raises(ValueError, match="too large"):
        native_loader.format_csv(
            [b"v0"], np.array([[1e38]], np.float32), np.array([[0]], np.int32)
        )


def test_absent_modality_num_frames_matches_python(tmp_path):
    """A record missing a CONFIGURED feature list must yield num_frames=0 in
    both stacks (min over all configured features, absent -> 0 — the
    readers.py#YT8MFrameFeatureReader semantic the C++ parser now shares;
    previously the C++ side minned over present lists only)."""
    if not native_loader.is_available():
        pytest.skip(native_loader.load_error())
    path = str(tmp_path / "onemod.tfrecord")
    rgb = np.arange(12, dtype=np.uint8).reshape(3, 4)
    other = np.zeros((3, 2), np.uint8)
    # the record carries lists "rgb" and "unused"; we parse configured
    # ("rgb", "audio") so "audio" is absent
    rec = fixtures.encode_frame_sequence_example(
        b"v0", [1], rgb, other, feature_names=("rgb", "unused")
    )
    with open(path, "wb") as f:
        fixtures.write_tfrecord(f, rec)

    got = native_loader.parse_frame_file(
        path, max_frames=5, feature_sizes=(4, 2),
        feature_names=("rgb", "audio"), num_classes=3,
    )
    reader = YT8MFrameFeatureReader(
        num_classes=3, feature_sizes=(4, 2), feature_names=("rgb", "audio"),
        max_frames=5,
    )
    want = list(reader.read_file(path))[0]
    assert got["num_frames"][0] == want["num_frames"] == 0
    np.testing.assert_array_equal(got["features"][0], want["features"])


# --- per-record parse fuzzing (the lpm_serve HTTP input surface) -----------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_frame_record_fuzz_parity(data):
    """Random well-formed SequenceExamples: the C++ per-record parser must
    match the Python reader exactly (features bytes + num_frames) under
    random frame counts, modality lengths, and max_frames clamping."""
    if not native_loader.is_available():
        pytest.skip(native_loader.load_error())
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    rgb_size = data.draw(st.integers(1, 8))
    aud_size = data.draw(st.integers(1, 4))
    maxf = data.draw(st.integers(1, 6))
    n_rgb = data.draw(st.integers(0, 8))
    n_aud = data.draw(st.integers(0, 8))
    rec = fixtures.encode_frame_sequence_example(
        b"fz", [0],
        rng.integers(0, 256, (n_rgb, rgb_size), dtype=np.uint8),
        rng.integers(0, 256, (n_aud, aud_size), dtype=np.uint8),
    )
    got_f, got_nf = native_loader.parse_frame_record(
        rec, max_frames=maxf, feature_sizes=(rgb_size, aud_size),
        feature_names=("rgb", "audio"),
    )
    # Python oracle: the reader's record-level semantics
    from learnablepoolingmethods_tpu.data import tfrecord_io
    from learnablepoolingmethods_tpu.data.readers import resize_axis

    _, fl = tfrecord_io.parse_sequence_example(rec)
    mats, nf = [], None
    for name, size in (("rgb", rgb_size), ("audio", aud_size)):
        rows = [np.frombuffer(x.bytes_list[0], np.uint8) for x in fl.get(name, [])]
        mat = np.stack(rows) if rows else np.zeros((0, size), np.uint8)
        nf = mat.shape[0] if nf is None else min(nf, mat.shape[0])
        mats.append(resize_axis(mat, 0, maxf))
    want_f = np.concatenate(mats, axis=1)
    want_nf = min(nf, maxf)
    assert got_nf == want_nf
    np.testing.assert_array_equal(got_f, want_f)


@settings(max_examples=60, deadline=None)
@given(blob=st.binary(max_size=200))
def test_record_parsers_never_crash_on_garbage(blob):
    """Arbitrary bytes (the lpm_serve threat model: untrusted HTTP bodies)
    must parse to zeros or raise ValueError — never crash the process."""
    if not native_loader.is_available():
        pytest.skip(native_loader.load_error())
    try:
        f, nf = native_loader.parse_frame_record(
            blob, max_frames=4, feature_sizes=(3, 2),
            feature_names=("rgb", "audio"),
        )
        assert f.shape == (4, 5) and 0 <= nf <= 4
    except ValueError:
        pass
    try:
        v = native_loader.parse_video_record(
            blob, feature_sizes=(3, 2), feature_names=("mean_rgb", "mean_audio")
        )
        assert v.shape == (5,)
    except ValueError:
        pass


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_video_record_fuzz_parity(data):
    if not native_loader.is_available():
        pytest.skip(native_loader.load_error())
    rng = np.random.default_rng(data.draw(st.integers(0, 2**31)))
    rgb_size = data.draw(st.integers(1, 8))
    aud_size = data.draw(st.integers(1, 4))
    rec = fixtures.encode_video_example(
        b"vz", [0],
        rng.normal(size=rgb_size).astype(np.float32),
        rng.normal(size=aud_size).astype(np.float32),
    )
    got = native_loader.parse_video_record(
        rec, feature_sizes=(rgb_size, aud_size),
        feature_names=("mean_rgb", "mean_audio"),
    )
    from learnablepoolingmethods_tpu.data import tfrecord_io

    fmap = tfrecord_io.parse_example(rec)
    want = np.concatenate([
        np.asarray(fmap["mean_rgb"].float_list, np.float32),
        np.asarray(fmap["mean_audio"].float_list, np.float32),
    ])
    np.testing.assert_array_equal(got, want)


def test_chunked_parse_equals_whole_file(tmp_path):
    """Range entry points (the packed-cache build's bounded-memory path):
    chunked parse at any chunk size — including exact-multiple boundaries
    and chunks larger than the file — reassembles to the whole-file parse
    bit-for-bit, in order."""
    paths = fixtures.write_frame_level_shards(
        str(tmp_path), 53, num_shards=2, num_classes=40, rgb_size=16,
        audio_size=4, max_frames=12, min_frames=2, seed=3,
    )
    kw = dict(max_frames=12, feature_sizes=(16, 4),
              feature_names=("rgb", "audio"), num_classes=40)
    p = paths[0]
    n = native_loader.count_records(p)
    whole = native_loader.parse_frame_file(p, **kw)
    for chunk in (1, 7, 9, n, n + 50):
        offs = native_loader.chunk_offsets(p, chunk)
        assert len(offs) == -(-n // chunk), (chunk, len(offs), n)
        parts = [
            native_loader.parse_frame_file(
                p, start_offset=o, max_records=chunk, **kw
            )
            for o in offs
        ]
        np.testing.assert_array_equal(
            np.concatenate([q["features"] for q in parts]), whole["features"]
        )
        np.testing.assert_array_equal(
            np.concatenate([q["labels"] for q in parts]), whole["labels"]
        )
        np.testing.assert_array_equal(
            np.concatenate([q["num_frames"] for q in parts]),
            whole["num_frames"],
        )
        assert sum((q["video_id"] for q in parts), []) == whole["video_id"]

    # chunked + parallel across files == unchunked, same order
    plain = list(native_loader.parse_files_parallel(
        paths, frame_level=True, num_workers=2, **kw))
    chunked = list(native_loader.parse_files_parallel(
        paths, frame_level=True, num_workers=2, chunk_records=5, **kw))
    np.testing.assert_array_equal(
        np.concatenate([q["features"] for q in plain]),
        np.concatenate([q["features"] for q in chunked]),
    )


def test_chunked_parse_video_level(tmp_path):
    path = str(tmp_path / "v.tfrecord")
    fixtures.write_video_level_fixture(
        path, num_videos=11, num_classes=10, rgb_size=6, audio_size=2
    )
    kw = dict(feature_sizes=(6, 2), feature_names=("mean_rgb", "mean_audio"),
              num_classes=10)
    whole = native_loader.parse_video_file(path, **kw)
    offs = native_loader.chunk_offsets(path, 4)
    assert len(offs) == 3
    parts = [
        native_loader.parse_video_file(
            path, start_offset=o, max_records=4, **kw
        )
        for o in offs
    ]
    np.testing.assert_array_equal(
        np.concatenate([q["features"] for q in parts]), whole["features"]
    )
    assert sum((q["video_id"] for q in parts), []) == whole["video_id"]
