"""lpm_serve — the fully native C++ serving binary (native/serving_main.cc).

socket → wire-format proto parse (tfrecord_reader.cc) → PJRT CPU execute
(stablehlo_runner.cc) → JSON, with no Python in the process.  The oracle is
the jax-backed ModelServer on the same artifact: classes must match exactly
and scores to the 1e-6 rounding both sides apply.
"""

import http.client
import json
import os
import subprocess
import time

import numpy as np
import pytest

from learnablepoolingmethods_tpu.core import native_runtime as nr

pytestmark = pytest.mark.skipif(
    not nr.is_available(),
    reason=f"native StableHLO runtime unavailable: {nr.load_error()}",
)

V = 18
TOP_K = 5
MAXF = 6
B = 4


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.data import fixtures
    from learnablepoolingmethods_tpu.export_model import export_model
    from learnablepoolingmethods_tpu.models import create_model

    d = tmp_path_factory.mktemp("lpmserve")
    data_path = str(d / "data.tfrecord")
    fixtures.write_frame_level_fixture(
        data_path, num_videos=7, num_classes=V, rgb_size=10, audio_size=2,
        max_frames=MAXF,
    )
    mcfg = ModelConfig(
        vocab_size=V, iterations=MAXF, sample_random_frames=False,
        dbof_cluster_size=16, dbof_hidden_size=8, moe_num_mixtures=2,
    )
    fcfg = FeatureConfig(("rgb", "audio"), (10, 2), True, MAXF)
    model = create_model("DbofModel", mcfg)
    example = {
        "features": np.zeros((1, MAXF, 12), np.uint8),
        "num_frames": np.ones((1,), np.int32),
    }
    params, bs = step_lib.init_model_variables(model, example, True)
    export_dir = str(d / "export")
    export_model(
        export_dir, "DbofModel", mcfg, fcfg, params, bs, top_k=TOP_K,
        with_stablehlo=True, stablehlo_batch_size=B,
    )
    return export_dir, data_path


def test_check_mode(artifact):
    export_dir, _ = artifact
    binary = nr.build_serving_binary()
    proc = subprocess.run(
        [binary, f"--export_dir={export_dir}", "--check"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout)
    assert len(out["predictions"][0]["classes"]) == TOP_K


def test_http_serving_matches_jax(artifact):
    from learnablepoolingmethods_tpu import serving
    from learnablepoolingmethods_tpu.data import tfrecord_io

    export_dir, data_path = artifact
    binary = nr.build_serving_binary()
    port = 18620 + (os.getpid() % 997)
    proc = subprocess.Popen(
        [binary, f"--export_dir={export_dir}", f"--port={port}"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        # readiness: the binary prints its serving line after compile
        line = ""
        deadline = time.time() + 280
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving" in line:
                break
            assert proc.poll() is None, "lpm_serve exited early"
        assert "serving" in line, f"no readiness line: {line!r}"

        records = list(tfrecord_io.read_tfrecords(data_path))
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        assert conn.getresponse().read() == b"ok"

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body=serving.frame_records(records))
        resp = conn.getresponse()
        assert resp.status == 200
        got = json.loads(resp.read())["predictions"]

        # bad framing → 400, server stays alive
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body=b"\xff\xff\xff\xff junk")
        assert conn.getresponse().status == 400

        jax_server = serving.ModelServer(export_dir, B)
        want = jax_server.predict_pairs(records)
        assert len(got) == len(want) == 7
        for g, (wc, ws) in zip(got, want):
            assert g["classes"] == wc
            np.testing.assert_allclose(g["scores"], ws, atol=2e-6)
    finally:
        proc.kill()
        proc.wait()


def test_concurrent_requests_coalesce(artifact):
    """The C++ BatchHub must coalesce concurrent sub-batch requests into
    shared executions (the serving.py#BatchingQueue twin): with a generous
    --linger_ms (1 s — generous against GC/scheduler stalls on the 1-core
    host) and B=4, four simultaneous 1-record posts take at most two
    executions, every response stays correct, and /statz exposes the
    counters."""
    import threading

    from learnablepoolingmethods_tpu import serving
    from learnablepoolingmethods_tpu.data import tfrecord_io

    export_dir, data_path = artifact
    binary = nr.build_serving_binary()
    port = 19620 + (os.getpid() % 997)
    proc = subprocess.Popen(
        [binary, f"--export_dir={export_dir}", f"--port={port}",
         "--linger_ms=1000"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        deadline = time.time() + 280
        line = ""
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving" in line:
                break
            assert proc.poll() is None, "lpm_serve exited early"
        assert "serving" in line

        records = list(tfrecord_io.read_tfrecords(data_path))[:4]
        jax_server = serving.ModelServer(export_dir, B)
        want = jax_server.predict_pairs(records)

        results = [None] * 4
        def post(i):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request(
                "POST", "/predict", body=serving.frame_records([records[i]])
            )
            resp = conn.getresponse()
            results[i] = (resp.status, json.loads(resp.read()))

        threads = [threading.Thread(target=post, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        for i, (status, out) in enumerate(results):
            assert status == 200
            (p,) = out["predictions"]
            assert p["video_index"] == 0  # request-local indexing
            assert p["classes"] == want[i][0]
            np.testing.assert_allclose(p["scores"], want[i][1], atol=2e-6)

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/statz")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests"] == 4
        assert stats["rows"] == 4
        # 1 s linger on a 1-core host: the four 1-record requests must
        # share executions (worst case one straggler → 2; the dense case
        # would be 4)
        assert stats["executes"] <= 2, stats
        assert stats["coalesced"] >= 2, stats
    finally:
        proc.kill()
        proc.wait()


def test_sustained_mixed_load(artifact):
    """6 threads × 8 posts of mixed sizes (1..6 records, including >B=4
    oversized solo-path requests) against the default 2 ms linger: every
    response correct vs the jax oracle, server healthy afterwards."""
    import threading

    from learnablepoolingmethods_tpu import serving
    from learnablepoolingmethods_tpu.data import tfrecord_io

    export_dir, data_path = artifact
    binary = nr.build_serving_binary()
    port = 22620 + (os.getpid() % 997)
    proc = subprocess.Popen(
        [binary, f"--export_dir={export_dir}", f"--port={port}"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        deadline = time.time() + 280
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving" in line:
                break
            assert proc.poll() is None, "lpm_serve exited early"

        records = list(tfrecord_io.read_tfrecords(data_path))  # 7 records
        jax_server = serving.ModelServer(export_dir, B)
        want = jax_server.predict_pairs(records)

        errors = []

        def client(tid):
            try:
                for j in range(8):
                    n = 1 + (tid + j) % 6  # 1..6 records (5,6 are > B)
                    sel = [(tid + j + i) % len(records) for i in range(n)]
                    body = serving.frame_records([records[i] for i in sel])
                    conn = http.client.HTTPConnection(
                        "127.0.0.1", port, timeout=120
                    )
                    conn.request("POST", "/predict", body=body)
                    resp = conn.getresponse()
                    assert resp.status == 200, resp.status
                    preds = json.loads(resp.read())["predictions"]
                    assert len(preds) == n
                    for local_i, rec_i in enumerate(sel):
                        p = preds[local_i]
                        assert p["video_index"] == local_i
                        assert p["classes"] == want[rec_i][0], (tid, j)
                        np.testing.assert_allclose(
                            p["scores"], want[rec_i][1], atol=2e-6
                        )
            except Exception as e:  # noqa: BLE001
                errors.append((tid, repr(e)))

        threads = [threading.Thread(target=client, args=(t,)) for t in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        assert conn.getresponse().read() == b"ok"
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/statz")
        stats = json.loads(conn.getresponse().read())
        assert stats["requests"] == 48
    finally:
        proc.kill()
        proc.wait()


def test_graceful_sigterm(artifact):
    """SIGTERM closes the listen socket and exits 0 after draining —
    container orchestration contract (previously required SIGKILL)."""
    import signal

    export_dir, _ = artifact
    binary = nr.build_serving_binary()
    port = 20620 + (os.getpid() % 997)
    proc = subprocess.Popen(
        [binary, f"--export_dir={export_dir}", f"--port={port}"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        deadline = time.time() + 280
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving" in line:
                break
            assert proc.poll() is None, "lpm_serve exited early"
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/healthz")
        assert conn.getresponse().read() == b"ok"
        proc.send_signal(signal.SIGTERM)
        assert proc.wait(timeout=35) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()


def test_video_level_check_and_http(tmp_path):
    """lpm_serve's video-level branch (Example parse → f32 features, no
    num_frames input): --check plus one HTTP roundtrip vs the jax server."""
    from learnablepoolingmethods_tpu import serving
    from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig
    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.data import fixtures, tfrecord_io
    from learnablepoolingmethods_tpu.export_model import export_model
    from learnablepoolingmethods_tpu.models import create_model

    data_path = str(tmp_path / "vl.tfrecord")
    fixtures.write_video_level_fixture(
        data_path, num_videos=5, num_classes=V, rgb_size=6, audio_size=2
    )
    mcfg = ModelConfig(vocab_size=V, moe_num_mixtures=2)
    fcfg = FeatureConfig(("mean_rgb", "mean_audio"), (6, 2))
    model = create_model("MoeModel", mcfg)
    params, bs = step_lib.init_model_variables(
        model, {"features": np.zeros((1, 8), np.float32)}, False
    )
    export_dir = str(tmp_path / "export_vl")
    export_model(
        export_dir, "MoeModel", mcfg, fcfg, params, bs, top_k=TOP_K,
        with_stablehlo=True, stablehlo_batch_size=3,
    )

    binary = nr.build_serving_binary()
    proc = subprocess.run(
        [binary, f"--export_dir={export_dir}", "--check"],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert len(json.loads(proc.stdout)["predictions"][0]["classes"]) == TOP_K

    port = 18910 + (os.getpid() % 89)
    server = subprocess.Popen(
        [binary, f"--export_dir={export_dir}", f"--port={port}"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        while True:
            line = server.stdout.readline()
            if "serving" in line:
                break
            assert server.poll() is None, "lpm_serve exited early"
        records = list(tfrecord_io.read_tfrecords(data_path))
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/predict", body=serving.frame_records(records))
        resp = conn.getresponse()
        assert resp.status == 200
        got = json.loads(resp.read())["predictions"]
        want = serving.ModelServer(export_dir, 3).predict_pairs(records)
        assert len(got) == len(want) == 5
        for g, (wc, ws) in zip(got, want):
            assert g["classes"] == wc
            np.testing.assert_allclose(g["scores"], ws, atol=2e-6)
    finally:
        server.kill()
        server.wait()
