"""Measure the native serving runtime's request path vs the Python server.

Both stacks serve the SAME exported artifact (identical StableHLO → XLA CPU
math), so the delta isolates the serving overhead: HTTP handling, record
proto parsing, batch assembly, result formatting, and the Python/jax
dispatch layer vs the C++ path.  Run on the CPU host (the native runtime is
PJRT-CPU by design; see docs/ROADMAP.md on TPU plugins).

Prints JSON lines:
  {"metric": "native_serve_http_ms_per_batch", ...}
  {"metric": "python_serve_http_ms_per_batch", ...}
  {"metric": "native_exec_ms_per_batch", ...}   # in-process, no HTTP/parse
"""

import http.client
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

B = 32
V = 3862
MAXF = 300
ITERS = 30


def build_artifact(root):
    from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.data import fixtures
    from learnablepoolingmethods_tpu.export_model import export_model
    from learnablepoolingmethods_tpu.models import create_model

    data_path = os.path.join(root, "data.tfrecord")
    fixtures.write_frame_level_fixture(
        data_path, num_videos=B, num_classes=V, rgb_size=1024, audio_size=128,
        max_frames=MAXF,
    )
    mcfg = ModelConfig(
        vocab_size=V, iterations=30, sample_random_frames=False,
        dbof_cluster_size=1024, dbof_hidden_size=512, moe_num_mixtures=2,
    )
    fcfg = FeatureConfig(("rgb", "audio"), (1024, 128), True, MAXF)
    model = create_model("DbofModel", mcfg)
    example = {
        "features": np.zeros((1, MAXF, 1152), np.uint8),
        "num_frames": np.ones((1,), np.int32),
    }
    params, bs = step_lib.init_model_variables(model, example, True)
    export_dir = os.path.join(root, "export")
    export_model(
        export_dir, "DbofModel", mcfg, fcfg, params, bs, top_k=20,
        with_stablehlo=True, stablehlo_batch_size=B,
    )
    return export_dir, data_path


def time_http(port, body, iters=ITERS):
    def once():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/predict", body=body)
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()

    once()  # warm
    best = 1e9
    t_all = time.perf_counter()
    for _ in range(iters):
        t0 = time.perf_counter()
        once()
        best = min(best, time.perf_counter() - t0)
    mean = (time.perf_counter() - t_all) / iters
    return best, mean


def emit(metric, best, mean):
    print(json.dumps({
        "metric": metric, "value": round(best * 1e3, 2), "unit": "ms/batch",
        "mean_ms": round(mean * 1e3, 2), "batch": B,
    }), flush=True)


CLIENTS = 8
RECS_PER_REQ = 4
POSTS_PER_CLIENT = 12


def warm_concurrent(port, body):
    """Warm the compile/caches OUTSIDE the measured (and statz-delta'd)
    window — the warm-up posts are sequential and would otherwise inflate
    'executes' with never-coalesced solo executions."""
    for _ in range(POSTS_PER_CLIENT):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        conn.request("POST", "/predict", body=body)
        resp = conn.getresponse()
        assert resp.status == 200
        resp.read()


def time_concurrent(port, body):
    """CLIENTS threads × POSTS_PER_CLIENT sequential posts of RECS_PER_REQ
    records each → aggregate rows/s.  This is the shape cross-request
    batching exists for: 8 concurrent 4-record requests fill one 32-row
    execution instead of eight.  Caller warms first (warm_concurrent)."""
    import threading

    def client():
        for _ in range(POSTS_PER_CLIENT):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
            conn.request("POST", "/predict", body=body)
            resp = conn.getresponse()
            assert resp.status == 200
            resp.read()

    threads = [threading.Thread(target=client) for _ in range(CLIENTS)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    rows = CLIENTS * POSTS_PER_CLIENT * RECS_PER_REQ
    return rows / wall


def main():
    from learnablepoolingmethods_tpu import serving
    from learnablepoolingmethods_tpu.core import native_runtime as nr
    from learnablepoolingmethods_tpu.data import tfrecord_io

    root = tempfile.mkdtemp(prefix="lpm_native_bench_")
    export_dir, data_path = build_artifact(root)
    records = list(tfrecord_io.read_tfrecords(data_path))
    body = serving.frame_records(records)

    # --- native binary over HTTP
    binary = nr.build_serving_binary()
    port = 18710 + (os.getpid() % 200)
    proc = subprocess.Popen(
        [binary, f"--export_dir={export_dir}", f"--port={port}"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        while True:
            line = proc.stdout.readline()
            if "serving" in line:
                break
            assert proc.poll() is None, "lpm_serve exited"
        best, mean = time_http(port, body)
        emit("native_serve_http_ms_per_batch", best, mean)

        def statz():
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("GET", "/statz")
            return json.loads(conn.getresponse().read())

        small = serving.frame_records(records[:RECS_PER_REQ])
        warm_concurrent(port, small)
        before = statz()
        rps = time_concurrent(port, small)
        after = statz()
        delta = {k: after[k] - before[k] for k in after}
        print(json.dumps({
            "metric": "native_serve_concurrent_rows_per_s",
            "value": round(rps, 1), "unit": "rows/s",
            "clients": CLIENTS, "recs_per_req": RECS_PER_REQ,
            "statz_delta": delta,
        }), flush=True)
    finally:
        proc.kill()
        proc.wait()

    # --- python server (jax CPU) over HTTP, same artifact, with the
    # BatchingQueue wired exactly as serve_forever does (the dispatch loop
    # may run off-main on CPU)
    model_server = serving.ModelServer(export_dir, B)
    batcher = serving.BatchingQueue(model_server)
    httpd = serving.ThreadingHTTPServer(
        ("127.0.0.1", 0),
        serving.make_handler(model_server, batcher),
    )
    import threading

    threading.Thread(target=batcher.run_forever, daemon=True).start()
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        best, mean = time_http(httpd.server_address[1], body)
        emit("python_serve_http_ms_per_batch", best, mean)
        small = serving.frame_records(records[:RECS_PER_REQ])
        warm_concurrent(httpd.server_address[1], small)
        rps = time_concurrent(httpd.server_address[1], small)
        print(json.dumps({
            "metric": "python_serve_concurrent_rows_per_s",
            "value": round(rps, 1), "unit": "rows/s",
            "clients": CLIENTS, "recs_per_req": RECS_PER_REQ,
        }), flush=True)
    finally:
        httpd.shutdown()

    # --- in-process native exec (no HTTP / proto parse): the PJRT floor
    from learnablepoolingmethods_tpu.export_model import (
        parse_serialized_records,
        _configs_from_meta,
    )

    with open(os.path.join(export_dir, "model_config.json")) as f:
        meta = json.load(f)
    _, fcfg = _configs_from_meta(meta)
    feats, nfs = parse_serialized_records(fcfg, records)
    exe = nr.NativeExecutable.from_export_dir(export_dir)
    exe.run(feats, nfs)  # warm
    best = 1e9
    t_all = time.perf_counter()
    for _ in range(ITERS):
        t0 = time.perf_counter()
        exe.run(feats, nfs)
        best = min(best, time.perf_counter() - t0)
    mean = (time.perf_counter() - t_all) / ITERS
    emit("native_exec_ms_per_batch", best, mean)


if __name__ == "__main__":
    main()
