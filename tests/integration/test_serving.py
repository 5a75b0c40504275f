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
