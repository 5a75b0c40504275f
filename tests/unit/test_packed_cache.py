"""Packed-array cache (data/packed_cache.py): build → iterate ≡ the
streaming reader; idempotent rebuilds; padding/shuffle semantics."""

import json
import os

import numpy as np
import pytest

from learnablepoolingmethods_tpu.data import packed_cache, pipeline
from learnablepoolingmethods_tpu.data.fixtures import (
    write_frame_level_fixture,
    write_video_level_fixture,
)
from learnablepoolingmethods_tpu.data.readers import (
    YT8MAggregatedFeatureReader,
    YT8MFrameFeatureReader,
)

V, D_RGB, D_AUDIO, MAXF = 10, 6, 2, 7


@pytest.fixture(scope="module")
def frame_setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("packed")
    data = str(d / "f.tfrecord")
    write_frame_level_fixture(
        data, 21, num_classes=V, rgb_size=D_RGB, audio_size=D_AUDIO,
        max_frames=MAXF, seed=5,
    )
    cache = packed_cache.build_cache(
        data, str(d / "cache"), frame_level=True,
        feature_sizes=(D_RGB, D_AUDIO), feature_names=("rgb", "audio"),
        num_classes=V, max_frames=MAXF,
    )
    return data, cache


def test_packed_matches_streaming_reader(frame_setup):
    data, cache = frame_setup
    reader = YT8MFrameFeatureReader(V, (D_RGB, D_AUDIO), ("rgb", "audio"), MAXF)
    want = list(pipeline.batch_iterator(reader, data, 8, num_epochs=1))
    got = list(packed_cache.packed_batch_iterator(cache, 8, num_epochs=1))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g["features"], w["features"])
        np.testing.assert_array_equal(g["labels"], w["labels"])
        np.testing.assert_array_equal(g["num_frames"], w["num_frames"])
        np.testing.assert_array_equal(g["weights"], w["weights"])
        assert g["video_id"] == w["video_id"]


def test_packed_build_idempotent(frame_setup):
    data, cache = frame_setup
    meta = json.load(open(os.path.join(cache, "meta.json")))
    mtime = os.path.getmtime(os.path.join(cache, "features.npy"))
    again = packed_cache.build_cache(
        data, cache, frame_level=True,
        feature_sizes=(D_RGB, D_AUDIO), feature_names=("rgb", "audio"),
        num_classes=V, max_frames=MAXF,
    )
    assert again == cache
    assert os.path.getmtime(os.path.join(cache, "features.npy")) == mtime
    assert meta["num_examples"] == 21


def test_packed_shuffle_is_permutation(frame_setup):
    _, cache = frame_setup
    seq = list(packed_cache.packed_batch_iterator(cache, 21, num_epochs=1))
    shuf = list(
        packed_cache.packed_batch_iterator(cache, 21, num_epochs=1, shuffle=True, seed=3)
    )
    ids_seq = seq[0]["video_id"]
    ids_shuf = shuf[0]["video_id"]
    assert ids_seq != ids_shuf
    assert sorted(ids_seq) == sorted(ids_shuf)
    # deterministic per seed
    shuf2 = list(
        packed_cache.packed_batch_iterator(cache, 21, num_epochs=1, shuffle=True, seed=3)
    )
    assert ids_shuf == shuf2[0]["video_id"]


def test_packed_sharding_disjoint(frame_setup):
    _, cache = frame_setup
    a = list(
        packed_cache.packed_batch_iterator(
            cache, 32, num_epochs=1, shard_index=0, num_shards=2
        )
    )
    b = list(
        packed_cache.packed_batch_iterator(
            cache, 32, num_epochs=1, shard_index=1, num_shards=2
        )
    )
    ids_a = [v for v in a[0]["video_id"] if v]
    ids_b = [v for v in b[0]["video_id"] if v]
    assert not set(ids_a) & set(ids_b)
    assert len(ids_a) + len(ids_b) == 21


def test_packed_video_level(tmp_path):
    data = str(tmp_path / "v.tfrecord")
    write_video_level_fixture(data, 9, num_classes=V, rgb_size=D_RGB, audio_size=D_AUDIO)
    cache = packed_cache.build_cache(
        data, str(tmp_path / "cache"), frame_level=False,
        feature_sizes=(D_RGB, D_AUDIO),
        feature_names=("mean_rgb", "mean_audio"), num_classes=V,
    )
    reader = YT8MAggregatedFeatureReader(V, (D_RGB, D_AUDIO), ("mean_rgb", "mean_audio"))
    want = list(pipeline.batch_iterator(reader, data, 4, num_epochs=1))
    got = list(packed_cache.packed_batch_iterator(cache, 4, num_epochs=1))
    for g, w in zip(got, want):
        np.testing.assert_allclose(g["features"], w["features"], atol=1e-6)
        np.testing.assert_array_equal(g["labels"], w["labels"])


def test_checkpoint_restore_without_abstract_tree(tmp_path):
    """restore() with no abstract tree must rebuild one from checkpoint
    metadata and land arrays on the CURRENT backend's devices (regression:
    orbax replayed the saved topology's shardings — CPU-trained checkpoints
    failed to restore for TPU inference)."""
    import jax
    import jax.numpy as jnp

    from learnablepoolingmethods_tpu.core import checkpoints as ckpt_lib

    tree = {
        "params": {"w": jnp.arange(12.0).reshape(3, 4), "b": jnp.ones(4)},
        "batch_stats": {"bn": {"mean": jnp.zeros(4)}},
    }
    mngr = ckpt_lib.CheckpointManager(str(tmp_path))
    mngr.save(3, tree)
    got = mngr.restore(3)
    mngr.close()
    np.testing.assert_array_equal(
        np.asarray(got["params"]["w"]), np.asarray(tree["params"]["w"])
    )
    (dev,) = got["params"]["w"].devices()
    assert dev == jax.devices()[0]
    # the metadata-derived abstract tree path actually ran (not the fallback)
    mngr2 = ckpt_lib.CheckpointManager(str(tmp_path))
    abs_tree = mngr2._abstract_from_metadata(3)
    mngr2.close()
    assert abs_tree is not None
    assert abs_tree["params"]["w"].shape == (3, 4)


def test_packed_shuffled_rows_stay_aligned(frame_setup):
    """Regression (review finding): the contiguous fast path must not fire
    on permuted windows whose endpoints happen to differ by len-1 — every
    shuffled row's features must belong to its video_id."""
    _, cache = frame_setup
    ref = {}
    for b in packed_cache.packed_batch_iterator(cache, 21, num_epochs=1):
        for i, vid in enumerate(b["video_id"]):
            ref[vid] = (b["features"][i].copy(), b["labels"][i].copy())
    for seed in range(6):
        for b in packed_cache.packed_batch_iterator(
            cache, 3, num_epochs=1, shuffle=True, seed=seed
        ):
            for i, vid in enumerate(b["video_id"]):
                if not vid:
                    continue
                np.testing.assert_array_equal(b["features"][i], ref[vid][0])
                np.testing.assert_array_equal(b["labels"][i], ref[vid][1])
