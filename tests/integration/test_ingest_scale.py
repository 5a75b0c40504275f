"""Ingest-at-scale rehearsal test (round-4 verdict item 4).

The packed-cache build streams parse batches into a disk-backed memmap and
periodically msync + MADV_DONTNEEDs the window (packed_cache.build_cache),
so its peak RSS must stay O(reclaim window + one parse batch) regardless of
dataset size.  This test builds a multi-GB cache (8k videos x 300 frames
x 1152 bytes ~ 2.7 GB of feature rows) in a data-layer-only subprocess and
asserts the sampled peak RSS stays far below the dataset size; an
unbounded build dirties the whole memmap and fails by ~2 GB.

Also sanity-checks one packed-iteration epoch sees every video.

Gated behind LPM_INGEST_SCALE=1 (several minutes on this 1-core host):

    LPM_INGEST_SCALE=1 python -m pytest tests/integration/test_ingest_scale.py -q -s

The full O(50k)-video stage-rate rehearsal is tools/ingest_scale_rehearsal.py;
measured rates are recorded in BASELINE.md ("ingest at scale" rows).
Ref anchor: readers.py#prepare_reader; SURVEY.md SS7 "TFRecord parse must
not bottleneck... measure early".
"""

import importlib.util
import os

import pytest

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

pytestmark = pytest.mark.skipif(
    not os.environ.get("LPM_INGEST_SCALE"),
    reason="multi-GB ingest rehearsal (minutes); set LPM_INGEST_SCALE=1",
)

N_VIDEOS = 8_000
MAX_FRAMES = 300
N_SHARDS = 16
# dataset feature payload ~ N * avg_frames(155) * 1152 B ~ 1.4 GB on disk,
# 2.7 GB as padded memmap rows; the streamed build must stay well under it.
# Expected peak (all terms dataset- AND shard-size independent): chunked
# parse window (num_workers+1 = 3 chunks x 256 records x ~345 KB padded
# ~ 265 MB) + the 256 MB memmap reclaim window + batch copies and
# interpreter baseline; measured 1114 MB (round 4).
RSS_BOUND_MB = 1_300


def _tool():
    spec = importlib.util.spec_from_file_location(
        "ingest_scale_rehearsal",
        os.path.join(REPO, "tools", "ingest_scale_rehearsal.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cache_build_rss_bounded(tmp_path):
    tool = _tool()
    data_dir = str(tmp_path / "data")
    cache_dir = str(tmp_path / "cache")

    gen = tool.generate(
        data_dir, N_VIDEOS, num_shards=N_SHARDS, max_frames=MAX_FRAMES
    )
    assert gen["dataset_gb"] > 1.0, gen  # non-vacuity: the set is really multi-GB

    build = tool.build_with_rss(
        gen["pattern"], cache_dir, MAX_FRAMES, N_VIDEOS, num_workers=2
    )
    assert build["build_peak_rss_mb"] > 0, build
    assert build["build_peak_rss_mb"] < RSS_BOUND_MB, (
        f"packed-cache build RSS not bounded: {build['build_peak_rss_mb']:.0f} MB "
        f"for a {gen['dataset_gb']:.1f} GB dataset (bound {RSS_BOUND_MB} MB)"
    )

    it = tool.iterate_packed(cache_dir)
    assert it["packed_videos"] == N_VIDEOS, it
    print(
        f"\n[ingest-scale] {gen['dataset_gb']:.2f} GB / {N_VIDEOS} videos: "
        f"build {build['build_videos_per_s']:.0f} v/s, "
        f"peak RSS {build['build_peak_rss_mb']:.0f} MB, "
        f"packed iter {it['packed_videos_per_s']:.0f} v/s",
        flush=True,
    )
