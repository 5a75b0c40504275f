"""Model serving (ref: export_model.py#ModelExporter serving_default).

The reference serves through a TF SavedModel signature taking serialized
``tf.Example`` bytes.  The rebuild's deployable equivalent is a small HTTP
server over an exported artifact (export_model.py):

    python -m learnablepoolingmethods_tpu.serving \
        --export_dir=/path/to/export/step_1000 --port=8500

    POST /predict           body: length-framed serialized records
                            (uint32-LE length ‖ record bytes, repeated)
    → {"predictions": [{"video_index": i,
                        "classes": [...k...], "scores": [...k...]}]}
    GET /healthz            → ok

Batches are padded to a fixed serving batch size so the compiled forward
never retraces (XLA static shapes).  The stdlib http.server keeps the
dependency surface zero; production fronting (load balancing, TLS) is
expected upstream, exactly as with TF Serving.
"""

from __future__ import annotations

import json
import struct
from http.server import BaseHTTPRequestHandler, HTTPServer, ThreadingHTTPServer
from typing import List

from absl import app, flags, logging

FLAGS = flags.FLAGS

_U32 = struct.Struct("<I")


def define_flags():
    flags.DEFINE_string("export_dir", "", "Exported model directory.")
    flags.DEFINE_integer("port", 8500, "HTTP port.")
    flags.DEFINE_integer("serving_batch_size", 32, "Fixed compile batch size.")


def frame_records(records: List[bytes]) -> bytes:
    """Client-side helper: length-frame records for the request body."""
    return b"".join(_U32.pack(len(r)) + r for r in records)


def unframe_records(body: bytes) -> List[bytes]:
    records, pos = [], 0
    while pos + 4 <= len(body):
        (ln,) = _U32.unpack_from(body, pos)
        pos += 4
        if pos + ln > len(body):
            raise ValueError("truncated record framing")
        records.append(body[pos : pos + ln])
        pos += ln
    return records


class ModelServer:
    def __init__(self, export_dir: str, serving_batch_size: int = 32):
        from learnablepoolingmethods_tpu.export_model import load_exported_model

        (self.model, self.params, self.batch_stats,
         self.mcfg, self.fcfg, self._serve) = load_exported_model(export_dir)
        self.batch_size = serving_batch_size

    def warmup(self):
        """Trace + compile the forward once at startup (main thread) so the
        first request doesn't pay compile latency — and so backends whose
        dispatch is main-thread-bound (the axon TPU tunnel) are exercised
        before requests arrive."""
        from learnablepoolingmethods_tpu.data import fixtures
        import numpy as np

        fcfg = self.fcfg
        if fcfg.frame_features:
            rec = fixtures.encode_frame_sequence_example(
                b"warmup", [0],
                np.zeros((1, fcfg.feature_sizes[0]), np.uint8),
                np.zeros((1, fcfg.feature_sizes[1]), np.uint8),
                feature_names=fcfg.feature_names,
            )
        else:
            rec = fixtures.encode_video_example(
                b"warmup", [0],
                np.zeros(fcfg.feature_sizes[0], np.float32),
                np.zeros(fcfg.feature_sizes[1], np.float32),
                feature_names=fcfg.feature_names,
            )
        self.predict([rec] * self.batch_size)

    def predict(self, records: List[bytes]):
        import numpy as np

        out = []
        for start in range(0, len(records), self.batch_size):
            chunk = records[start : start + self.batch_size]
            pad = self.batch_size - len(chunk)
            indices, values = self._serve(chunk + [chunk[-1]] * pad)
            for i in range(len(chunk)):
                out.append(
                    {
                        "video_index": start + i,
                        "classes": np.asarray(indices[i]).tolist(),
                        "scores": [round(float(v), 6) for v in np.asarray(values[i])],
                    }
                )
        return out


def make_handler(server: ModelServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # absl logging instead of stderr spam
            logging.info("serving: " + fmt, *args)

        def _send(self, code: int, payload: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, b"ok", "text/plain")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, b"not found", "text/plain")
                return
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length)
            try:
                records = unframe_records(body)
                if not records:
                    raise ValueError("no records in request")
                preds = server.predict(records)
            except Exception as e:  # noqa: BLE001 — report, don't crash the server
                self._send(400, json.dumps({"error": str(e)}).encode())
                return
            self._send(200, json.dumps({"predictions": preds}).encode())

    return Handler


def serve_forever(
    export_dir: str, port: int, serving_batch_size: int = 32, threaded: bool = False
):
    model_server = ModelServer(export_dir, serving_batch_size)
    logging.info("warming up compiled forward ...")
    model_server.warmup()
    # Single-threaded by default: request handling (and therefore jax
    # dispatch) stays on one thread — required on backends whose client is
    # not thread-safe (observed hang dispatching from handler threads on the
    # axon TPU tunnel).  ThreadingHTTPServer is fine for CPU serving.
    server_cls = ThreadingHTTPServer if threaded else HTTPServer
    httpd = server_cls(("0.0.0.0", port), make_handler(model_server))
    logging.info("serving %s on :%d (batch %d)", export_dir, port, serving_batch_size)
    httpd.serve_forever()


def main(unused_argv):
    logging.set_verbosity(logging.INFO)
    if not FLAGS.export_dir:
        raise ValueError("--export_dir is required")
    serve_forever(FLAGS.export_dir, FLAGS.port, FLAGS.serving_batch_size)


define_flags()

if __name__ == "__main__":
    app.run(main)
