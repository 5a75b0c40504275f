"""HTTP serving integration: export a model, serve it, query over a socket."""

import http.client
import json
import threading

import jax
import numpy as np
import pytest

from learnablepoolingmethods_tpu import serving
from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.data import fixtures, tfrecord_io
from learnablepoolingmethods_tpu.export_model import export_model
from learnablepoolingmethods_tpu.models import create_model


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve")
    data_path = str(d / "data.tfrecord")
    fixtures.write_video_level_fixture(
        data_path, num_videos=5, num_classes=12, rgb_size=6, audio_size=2
    )
    mcfg = ModelConfig(vocab_size=12)
    fcfg = FeatureConfig(("mean_rgb", "mean_audio"), (6, 2))
    model = create_model("LogisticModel", mcfg)
    example = {"features": np.zeros((1, 8), np.float32)}
    params, bs = step_lib.init_model_variables(model, example, False)
    export_dir = str(d / "export")
    export_model(export_dir, "LogisticModel", mcfg, fcfg, params, bs, top_k=4)

    httpd = serving.ThreadingHTTPServer(
        ("127.0.0.1", 0), serving.make_handler(serving.ModelServer(export_dir, 4))
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    yield httpd.server_address[1], data_path
    httpd.shutdown()


def _post(port, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=body)
    resp = conn.getresponse()
    return resp.status, resp.read()


def test_healthz(served):
    port, _ = served
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/healthz")
    resp = conn.getresponse()
    assert resp.status == 200 and resp.read() == b"ok"


def test_predict_roundtrip(served):
    port, data_path = served
    records = list(tfrecord_io.read_tfrecords(data_path))
    status, body = _post(port, "/predict", serving.frame_records(records))
    assert status == 200, body
    out = json.loads(body)
    preds = out["predictions"]
    assert len(preds) == 5
    for i, p in enumerate(preds):
        assert p["video_index"] == i
        assert len(p["classes"]) == 4 and len(p["scores"]) == 4
        assert all(0.0 <= s <= 1.0 for s in p["scores"])
        # scores sorted descending (top-k order)
        assert p["scores"] == sorted(p["scores"], reverse=True)


def test_predict_bad_body_is_400(served):
    port, _ = served
    status, body = _post(port, "/predict", b"\xff\xff\xff\xff garbage")
    assert status == 400
    assert "error" in json.loads(body)


def test_unknown_route_404(served):
    port, _ = served
    status, _ = _post(port, "/nope", b"")
    assert status == 404


@pytest.fixture(scope="module")
def served_batching(tmp_path_factory):
    """Server in the default (round-2) mode: ThreadingHTTPServer + the
    BatchingQueue dispatch loop on a dedicated thread."""
    d = tmp_path_factory.mktemp("serve_bq")
    data_path = str(d / "data.tfrecord")
    fixtures.write_video_level_fixture(
        data_path, num_videos=6, num_classes=12, rgb_size=6, audio_size=2
    )
    mcfg = ModelConfig(vocab_size=12)
    fcfg = FeatureConfig(("mean_rgb", "mean_audio"), (6, 2))
    model = create_model("LogisticModel", mcfg)
    example = {"features": np.zeros((1, 8), np.float32)}
    params, bs = step_lib.init_model_variables(model, example, False)
    export_dir = str(d / "export")
    export_model(export_dir, "LogisticModel", mcfg, fcfg, params, bs, top_k=4)

    server = serving.ModelServer(export_dir, 4)
    calls = {"n": 0}
    inner = server.predict_pairs

    def counting(records):
        calls["n"] += 1
        return inner(records)

    server.predict_pairs = counting
    batcher = serving.BatchingQueue(server, max_delay_ms=100.0)
    httpd = serving.ThreadingHTTPServer(
        ("127.0.0.1", 0), serving.make_handler(server, batcher)
    )
    accept = threading.Thread(target=httpd.serve_forever, daemon=True)
    accept.start()
    dispatch = threading.Thread(target=batcher.run_forever, daemon=True)
    dispatch.start()
    yield httpd.server_address[1], data_path, calls
    batcher.shutdown()
    httpd.shutdown()


def test_concurrent_requests_coalesce(served_batching):
    """≥2 concurrent requests served correctly through the batching queue
    (VERDICT round-1 item 10), coalescing into fewer device batches."""
    import learnablepoolingmethods_tpu.data.tfrecord_io as tio

    port, data_path, calls = served_batching
    records = list(tio.read_tfrecords(data_path))
    calls["n"] = 0

    results = [None] * 4
    errors = []

    def worker(i):
        try:
            # one record per request, four requests in flight
            status, body = _post(
                port, "/predict", serving.frame_records([records[i]])
            )
            assert status == 200, body
            results[i] = json.loads(body)["predictions"]
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors

    for i, preds in enumerate(results):
        assert preds is not None and len(preds) == 1
        p = preds[0]
        assert p["video_index"] == 0  # per-request indexing
        assert len(p["classes"]) == 4 and len(p["scores"]) == 4
        assert p["scores"] == sorted(p["scores"], reverse=True)

    # 4 single-record requests with a 100 ms linger and batch size 4 must
    # coalesce into fewer device dispatches than requests
    assert calls["n"] < 4, f"no coalescing happened ({calls['n']} dispatches)"

    # GET /statz exposes the queue counters (the lpm_serve contract)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
    conn.request("GET", "/statz")
    stats = json.loads(conn.getresponse().read())
    assert stats["requests"] >= 4 and stats["rows"] >= 4
    assert stats["coalesced"] >= 2
    assert stats["executes"] <= stats["requests"]

    # per-request answers equal the one-shot combined request
    status, body = _post(port, "/predict", serving.frame_records(records[:4]))
    combined = json.loads(body)["predictions"]
    for i in range(4):
        assert results[i][0]["classes"] == combined[i]["classes"]
        np.testing.assert_allclose(
            results[i][0]["scores"], combined[i]["scores"], atol=1e-6
        )


def test_batching_queue_error_isolated(served_batching):
    """A malformed record fails its own request without killing the loop."""
    port, data_path, _ = served_batching
    status, body = _post(port, "/predict", serving.frame_records([b"garbage"]))
    assert status == 400
    # the loop survives: a good request still works
    import learnablepoolingmethods_tpu.data.tfrecord_io as tio

    records = list(tio.read_tfrecords(data_path))
    status, body = _post(port, "/predict", serving.frame_records(records[:1]))
    assert status == 200, body


def test_fast_serve_netvlad(tmp_path):
    """prefer_fast serving: a frame-level NetVLAD export served through the
    BN-folded fused forward (jnp path on CPU) returns valid top-k output and
    actually selects the fast path."""
    from learnablepoolingmethods_tpu import export_model as em

    mcfg = ModelConfig(
        vocab_size=12, netvlad_cluster_size=4, netvlad_hidden_size=8,
        iterations=6, presampled=False,
    )
    fcfg = FeatureConfig(("rgb", "audio"), (1024, 128), frame_features=True,
                         max_frames=6)
    model = create_model("NetVLADModelLF", mcfg)
    example = {
        "features": np.zeros((1, 6, 1152), np.uint8),
        "num_frames": np.ones((1,), np.int32),
    }
    params, bs = step_lib.init_model_variables(model, example, True)
    export_dir = str(tmp_path / "export")
    export_model(export_dir, "NetVLADModelLF", mcfg, fcfg, params, bs, top_k=3)

    # the fast builder is selected for this model/config
    assert em._try_fast_predict(
        "NetVLADModelLF", mcfg,
        {"params": params, "batch_stats": bs}, 3,
    ) is not None

    server = serving.ModelServer(export_dir, 2, fast_serve=True)
    rng = np.random.default_rng(0)
    rec = fixtures.encode_frame_sequence_example(
        b"v0", [1],
        rng.integers(0, 256, size=(6, 1024), dtype=np.uint8),
        rng.integers(0, 256, size=(6, 128), dtype=np.uint8),
        feature_names=("rgb", "audio"),
    )
    out = server.predict([rec, rec])
    assert len(out) == 2
    for row in out:
        assert len(row["classes"]) == 3 and len(row["scores"]) == 3
        assert all(0 <= c < 12 for c in row["classes"])
        assert sorted(row["scores"], reverse=True) == row["scores"]


def test_fast_serve_int8_hidden(tmp_path):
    """--int8_hidden serving: same export served bf16-fast vs int8-fast
    agrees within the quantization envelope; the flag raises (rather than
    silently serving bf16) without --fast_serve or on a non-NetVLAD
    export."""
    from learnablepoolingmethods_tpu import export_model as em

    mcfg = ModelConfig(
        vocab_size=12, netvlad_cluster_size=4, netvlad_hidden_size=8,
        iterations=6, presampled=False,
    )
    fcfg = FeatureConfig(("rgb", "audio"), (1024, 128), frame_features=True,
                         max_frames=6)
    model = create_model("NetVLADModelLF", mcfg)
    example = {
        "features": np.zeros((1, 6, 1152), np.uint8),
        "num_frames": np.ones((1,), np.int32),
    }
    params, bs = step_lib.init_model_variables(model, example, True)
    export_dir = str(tmp_path / "export")
    export_model(export_dir, "NetVLADModelLF", mcfg, fcfg, params, bs, top_k=3)

    rng = np.random.default_rng(0)
    rec = fixtures.encode_frame_sequence_example(
        b"v0", [1],
        rng.integers(0, 256, size=(6, 1024), dtype=np.uint8),
        rng.integers(0, 256, size=(6, 128), dtype=np.uint8),
        feature_names=("rgb", "audio"),
    )
    out_bf16 = serving.ModelServer(export_dir, 2, fast_serve=True).predict(
        [rec, rec]
    )
    out_i8 = serving.ModelServer(
        export_dir, 2, fast_serve=True, int8_hidden=True
    ).predict([rec, rec])
    for row8, row16 in zip(out_i8, out_bf16):
        assert len(row8["classes"]) == 3
        s8 = dict(zip(row8["classes"], row8["scores"]))
        s16 = dict(zip(row16["classes"], row16["scores"]))
        shared = set(s8) & set(s16)
        assert shared  # tiny random model: top-3 sets overlap
        for c in shared:
            assert abs(s8[c] - s16[c]) < 5e-2

    with pytest.raises(ValueError, match="int8_hidden requires"):
        serving.ModelServer(export_dir, 2, fast_serve=False, int8_hidden=True)

    # non-NetVLAD export refuses too
    mcfg_d = ModelConfig(vocab_size=12, dbof_cluster_size=8,
                         dbof_hidden_size=8, iterations=6)
    model_d = create_model("DbofModel", mcfg_d)
    params_d, bs_d = step_lib.init_model_variables(model_d, example, True)
    export_d = str(tmp_path / "export_dbof")
    export_model(export_d, "DbofModel", mcfg_d, fcfg, params_d, bs_d, top_k=3)
    with pytest.raises(ValueError, match="int8_hidden requires"):
        em.load_exported_model(export_d, prefer_fast=True, int8_hidden=True)


@pytest.mark.parametrize(
    "model_name,cfg_kw",
    [
        (
            "TransformerEncoderModel",
            dict(attention_hidden_size=16, attention_heads=2,
                 transformer_layers=1, transformer_ff_size=24),
        ),
        ("NeXtVLADModel", dict(nextvlad_cluster_size=8, nextvlad_hidden_size=16,
                               iterations=6)),
    ],
)
def test_try_fast_predict_covers_new_models(model_name, cfg_kw):
    """export_model._try_fast_predict must select the round-3 fast builders
    (transformer / NeXtVLAD) and their predictions must match the flax
    forward's top-k within fp-tolerance."""
    from learnablepoolingmethods_tpu import export_model as em

    mcfg = ModelConfig(vocab_size=12, presampled=False, **cfg_kw)
    model = create_model(model_name, mcfg)
    rng = np.random.default_rng(0)
    feats = rng.integers(0, 256, size=(2, 6, 1152), dtype=np.uint8)
    nf = np.array([6, 3], np.int32)
    params, bs = step_lib.init_model_variables(
        model, {"features": feats, "num_frames": nf}, True
    )
    fast = em._try_fast_predict(
        model_name, mcfg, {"params": params, "batch_stats": bs}, 3
    )
    assert fast is not None, f"fast builder not selected for {model_name}"
    key = jax.random.key(0)
    vals, idxs = fast(jax.numpy.asarray(feats), jax.numpy.asarray(nf), key)
    assert vals.shape == (2, 3) and idxs.shape == (2, 3)
    v = np.asarray(vals)
    assert np.all(np.diff(v, axis=1) <= 1e-7)  # sorted scores
    assert np.all((v >= 0) & (v <= 1))
    if model_name == "TransformerEncoderModel":
        # no sampling in this model → directly comparable to the flax top-k
        x = step_lib.preprocess_input(jax.numpy.asarray(feats))
        probs = model.apply(
            {"params": params, "batch_stats": bs}, x,
            num_frames=jax.numpy.asarray(nf), training=False,
        )["predictions"]
        want = np.sort(np.asarray(probs), axis=1)[:, ::-1][:, :3]
        np.testing.assert_allclose(v, want, atol=3e-2)  # bf16 fast path


def test_native_serve_matches_jax(tmp_path):
    """--native_serve: the C++ PJRT executor (native/stablehlo_runner.cc)
    serves the same records as the jax-backed ModelServer and must produce
    identical classes and scores (same StableHLO graph, same weights)."""
    from learnablepoolingmethods_tpu.core import native_runtime as nr

    if not nr.is_available():
        pytest.skip(f"native runtime unavailable: {nr.load_error()}")

    d = tmp_path
    data_path = str(d / "data.tfrecord")
    fixtures.write_video_level_fixture(
        data_path, num_videos=5, num_classes=12, rgb_size=6, audio_size=2
    )
    mcfg = ModelConfig(vocab_size=12)
    fcfg = FeatureConfig(("mean_rgb", "mean_audio"), (6, 2))
    model = create_model("LogisticModel", mcfg)
    example = {"features": np.zeros((1, 8), np.float32)}
    params, bs = step_lib.init_model_variables(model, example, False)
    export_dir = str(d / "export")
    export_model(
        export_dir, "LogisticModel", mcfg, fcfg, params, bs, top_k=4,
        with_stablehlo=True, stablehlo_batch_size=4,
    )

    native_server = serving.ModelServer(export_dir, 32, native=True)
    assert native_server.batch_size == 4  # the module's shape wins
    jax_server = serving.ModelServer(export_dir, 4)

    records = list(tfrecord_io.read_tfrecords(data_path))
    got = native_server.predict_pairs(records)
    want = jax_server.predict_pairs(records)
    assert len(got) == len(want) == 5
    for (gc, gs), (wc, ws) in zip(got, want):
        assert gc == wc
        np.testing.assert_allclose(gs, ws, atol=1e-6)

    # exclusive with the fused-path flags
    with pytest.raises(ValueError, match="exclusive"):
        serving.ModelServer(export_dir, 4, native=True, fast_serve=True)


def test_batching_queue_bounded():
    """submit() must raise queue.Full at saturation (the handler maps it
    to 503) instead of buffering without bound — lpm_serve parity."""
    import queue as queue_mod

    import pytest as _pytest

    from learnablepoolingmethods_tpu import serving

    class _Noop:
        batch_size = 4

    q = serving.BatchingQueue(_Noop())  # dispatch loop NOT running
    for _ in range(serving.BatchingQueue.MAX_QUEUED):
        q.submit([b"r"])
    with _pytest.raises(queue_mod.Full):
        q.submit([b"r"])


def test_batching_queue_shutdown_fails_stragglers():
    """Requests queued behind the shutdown sentinel must get a clear
    exception, not a silent 300 s Future timeout."""
    import pytest as _pytest

    from learnablepoolingmethods_tpu import serving

    class _Noop:
        batch_size = 4

    q = serving.BatchingQueue(_Noop())
    q.shutdown()
    fut = q.submit([b"r"])  # straggler behind the sentinel
    q.run_forever()  # consumes SHUTDOWN, then drains + fails stragglers
    with _pytest.raises(RuntimeError, match="shutting down"):
        fut.result(timeout=5)
