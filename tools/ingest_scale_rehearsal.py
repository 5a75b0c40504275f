"""Ingest-scale rehearsal (round-4 verdict item 4).

Host-pipeline rates were previously measured on a 2,048-video synthetic set;
this rehearsal generates an O(50–100k)-video sharded frame-level TFRecord
set (YT-8M wire format; YT-8M itself is ~6M videos), then measures every
host ingest stage at that scale:

1. generation rate (sanity only — not a framework stage);
2. packed-cache BUILD in a subprocess whose peak RSS is sampled from
   /proc (the build is streamed by design — `packed_cache.build_cache`
   msync+MADV_DONTNEEDs its memmap window — so peak RSS must stay bounded
   no matter the dataset size);
3. packed-cache ITERATION (memmap slices) for one epoch;
4. native C++ TFRecord parse (data/native_loader.py) for one epoch;
5. grain iteration (optional).

Run (deletes its data unless --keep):

    python tools/ingest_scale_rehearsal.py --num_videos 50000

Measured results are recorded in BASELINE.md ("ingest at scale" rows); the
suite-gated assertion lives in tests/integration/test_ingest_scale.py
(LPM_INGEST_SCALE=1).  Ref anchor: readers.py#prepare_reader; SURVEY.md §7
"TFRecord parse must not bottleneck... measure early".
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _rss_sampler(pid: int, out: dict, stop: threading.Event):
    peak = 0
    path = f"/proc/{pid}/status"
    while not stop.is_set():
        try:
            with open(path) as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        peak = max(peak, int(line.split()[1]))  # kB
                        break
        except OSError:
            break
        time.sleep(0.05)
    out["peak_rss_mb"] = peak / 1024.0


def generate(out_dir: str, num_videos: int, num_shards: int, max_frames: int):
    from learnablepoolingmethods_tpu.data.fixtures import write_frame_level_shards

    t0 = time.time()
    paths = write_frame_level_shards(
        out_dir, num_videos, num_shards=num_shards, max_frames=max_frames,
        seed=0,
    )
    dt = time.time() - t0
    nbytes = sum(os.path.getsize(p) for p in paths)
    return {
        "gen_videos_per_s": num_videos / dt,
        "gen_seconds": dt,
        "dataset_gb": nbytes / 1e9,
        "pattern": os.path.join(out_dir, "train-*.tfrecord"),
    }


def build_with_rss(pattern: str, cache_dir: str, max_frames: int,
                   num_videos: int, num_workers: int = 2):
    """Build the packed cache in a data-layer-only subprocess; sample its
    peak RSS from the parent (no jax/tf in the measured process)."""
    code = (
        "import sys, time\n"
        "from learnablepoolingmethods_tpu.data import packed_cache\n"
        "t0 = time.time()\n"
        f"packed_cache.build_cache({pattern!r}, {cache_dir!r}, frame_level=True,"
        f" max_frames={max_frames}, num_workers={num_workers})\n"
        "print('BUILD_SECONDS', time.time() - t0, flush=True)\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.Popen(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    rss: dict = {}
    stop = threading.Event()
    t = threading.Thread(target=_rss_sampler, args=(p.pid, rss, stop))
    t.start()
    out, err = p.communicate()
    stop.set()
    t.join()
    if p.returncode != 0:
        raise RuntimeError(f"build failed rc={p.returncode}\n{err[-4000:]}")
    seconds = float(out.split("BUILD_SECONDS")[1].split()[0])
    return {
        "build_videos_per_s": num_videos / seconds,
        "build_seconds": seconds,
        "build_peak_rss_mb": rss.get("peak_rss_mb", -1.0),
    }


def iterate_packed(cache_dir: str, batch: int = 512):
    from learnablepoolingmethods_tpu.data import packed_cache

    t0 = time.time()
    n = 0
    for b in packed_cache.packed_batch_iterator(
        cache_dir, batch, num_epochs=1, shuffle=False, pad_final_batch=False
    ):
        n += b["features"].shape[0]
    dt = time.time() - t0
    return {"packed_videos_per_s": n / dt, "packed_videos": n}


def iterate_native(pattern: str, max_frames: int, batch: int = 512,
                   num_workers: int = 2):
    from learnablepoolingmethods_tpu.data import pipeline

    t0 = time.time()
    n = 0
    for b in pipeline.native_batch_iterator(
        pattern, batch, frame_level=True, max_frames=max_frames,
        num_epochs=1, shuffle=False, num_workers=num_workers,
        pad_final_batch=False,
    ):
        n += b["features"].shape[0]
    dt = time.time() - t0
    return {"native_videos_per_s": n / dt, "native_videos": n}


def iterate_grain(pattern: str, max_frames: int, batch: int = 256):
    from learnablepoolingmethods_tpu.data.grain_pipeline import (
        grain_batch_iterator,
    )

    t0 = time.time()
    n = 0
    for b in grain_batch_iterator(
        pattern, batch, frame_level=True, num_epochs=1, shuffle=False,
        max_frames=max_frames,
    ):
        n += b["features"].shape[0]
    dt = time.time() - t0
    return {"grain_videos_per_s": n / dt, "grain_videos": n}


def record_run(name: str, payload: dict) -> str:
    """Dated, commit-stamped docs/drill_runs/ record (same schema as
    tests/integration/gap_drill_common.record_drill_run — duplicated here so
    the data-layer-only rehearsal never imports the TF-heavy test module)."""
    import datetime

    commit = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True, timeout=30,
    ).stdout.strip()
    out_dir = os.path.join(REPO, "docs", "drill_runs")
    os.makedirs(out_dir, exist_ok=True)
    record = {
        "date_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
        "commit": commit,
        **payload,
    }
    path = os.path.join(out_dir, f"{name}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            record, f, indent=1, sort_keys=True,
            default=lambda o: o.item(),  # numpy scalars
        )
    os.replace(tmp, path)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num_videos", type=int, default=50_000)
    ap.add_argument("--num_shards", type=int, default=16)
    ap.add_argument("--max_frames", type=int, default=300)
    ap.add_argument("--out_dir", default="/tmp/lpm_ingest_scale")
    ap.add_argument("--num_workers", type=int, default=2)
    ap.add_argument("--skip_grain", action="store_true")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument(
        "--record", action="store_true",
        help="write the results as a dated docs/drill_runs/ record",
    )
    args = ap.parse_args()

    data_dir = os.path.join(args.out_dir, "data")
    cache_dir = os.path.join(args.out_dir, "cache")
    results = {"num_videos": args.num_videos, "max_frames": args.max_frames}
    try:
        print(f"[gen] {args.num_videos} videos ...", flush=True)
        results.update(generate(
            data_dir, args.num_videos, args.num_shards, args.max_frames
        ))
        print(f"[gen] {results['gen_videos_per_s']:.0f} videos/s, "
              f"{results['dataset_gb']:.2f} GB", flush=True)
        pattern = results.pop("pattern")

        print("[build] packed cache (RSS-sampled subprocess) ...", flush=True)
        results.update(build_with_rss(
            pattern, cache_dir, args.max_frames, args.num_videos,
            args.num_workers,
        ))
        print(f"[build] {results['build_videos_per_s']:.0f} videos/s, "
              f"peak RSS {results['build_peak_rss_mb']:.0f} MB", flush=True)

        print("[packed] one epoch ...", flush=True)
        results.update(iterate_packed(cache_dir))
        print(f"[packed] {results['packed_videos_per_s']:.0f} videos/s", flush=True)

        print("[native] one epoch ...", flush=True)
        results.update(iterate_native(
            pattern, args.max_frames, num_workers=args.num_workers
        ))
        print(f"[native] {results['native_videos_per_s']:.0f} videos/s", flush=True)

        if not args.skip_grain:
            print("[grain] one epoch ...", flush=True)
            results.update(iterate_grain(pattern, args.max_frames))
            print(f"[grain] {results['grain_videos_per_s']:.0f} videos/s",
                  flush=True)
    finally:
        if not args.keep:
            shutil.rmtree(args.out_dir, ignore_errors=True)
    if args.record:
        print(f"[record] {record_run('ingest_scale_rehearsal', results)}",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
