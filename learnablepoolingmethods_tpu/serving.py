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
never retraces (XLA static shapes).  Concurrent requests are coalesced by a
``BatchingQueue`` into full device batches behind one dispatch thread
(handler threads never touch jax — the axon TPU client hangs off-main-thread).
The stdlib http.server keeps the dependency surface zero; production fronting
(load balancing, TLS) is expected upstream, exactly as with TF Serving.
"""

from __future__ import annotations

import json
import queue
import struct
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, HTTPServer, ThreadingHTTPServer
from typing import List, Optional

from absl import app, flags, logging

FLAGS = flags.FLAGS

_U32 = struct.Struct("<I")


def define_flags():
    flags.DEFINE_string("export_dir", "", "Exported model directory.")
    flags.DEFINE_integer("port", 8500, "HTTP port.")
    flags.DEFINE_integer("serving_batch_size", 32, "Fixed compile batch size.")
    flags.DEFINE_bool(
        "single_thread",
        False,
        "Serve one request at a time on the main thread (no batching queue).",
    )
    flags.DEFINE_float(
        "batch_linger_ms",
        2.0,
        "How long the batching queue waits to coalesce concurrent requests "
        "into one device batch.",
    )
    flags.DEFINE_bool(
        "native_serve",
        False,
        "Serve through the native C++ PJRT executor "
        "(native/stablehlo_runner.cc): the export's StableHLO module runs "
        "with no Python/JAX in the execution path.  Requires an artifact "
        "exported with with_stablehlo (stablehlo.mlir + native_spec.json); "
        "the module's baked-in batch size overrides --serving_batch_size.",
    )
    flags.DEFINE_bool(
        "fast_serve",
        False,
        "Serve through the BN-folded fused forward when the model has one "
        "(NetVLAD/NetFV/NetRVLAD/SoftDbof LF, DBoF); falls back to the flax "
        "forward otherwise. Frame sampling uses a different (equally "
        "distributed) random stream than the flax path.",
    )
    from learnablepoolingmethods_tpu import flags as lpm_flags

    lpm_flags.define_int8_hidden_flag()


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
    def __init__(self, export_dir: str, serving_batch_size: int = 32,
                 fast_serve: bool = False, int8_hidden: bool = False,
                 native: bool = False):
        if native:
            # the C++ PJRT executor (native/stablehlo_runner.cc): the
            # exported StableHLO module runs with no Python/JAX in the
            # execution path.  Its batch size is baked into the module
            # (XLA static shapes), so it overrides the flag.
            from learnablepoolingmethods_tpu.export_model import (
                load_exported_native,
            )

            if fast_serve or int8_hidden:
                raise ValueError(
                    "--native_serve serves the exported flax graph; it is "
                    "exclusive with --fast_serve/--int8_hidden (re-export "
                    "with the fused path if you need both)"
                )
            self.model = self.params = self.batch_stats = None
            (self.mcfg, self.fcfg, native_batch, self._serve) = (
                load_exported_native(export_dir)
            )
            if serving_batch_size != native_batch:
                logging.info(
                    "native module batch size %d overrides "
                    "--serving_batch_size=%d", native_batch, serving_batch_size,
                )
            self.batch_size = native_batch
            return
        from learnablepoolingmethods_tpu.export_model import load_exported_model

        (self.model, self.params, self.batch_stats,
         self.mcfg, self.fcfg, self._serve) = load_exported_model(
            export_dir, prefer_fast=fast_serve, int8_hidden=int8_hidden
        )
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

    def predict_pairs(self, records: List[bytes]):
        """→ [(classes, scores)] per record; chunks + pads to the fixed
        compile batch size internally."""
        import numpy as np

        out = []
        for start in range(0, len(records), self.batch_size):
            chunk = records[start : start + self.batch_size]
            pad = self.batch_size - len(chunk)
            indices, values = self._serve(chunk + [chunk[-1]] * pad)
            for i in range(len(chunk)):
                out.append(
                    (
                        np.asarray(indices[i]).tolist(),
                        [round(float(v), 6) for v in np.asarray(values[i])],
                    )
                )
        return out

    def predict(self, records: List[bytes]):
        return [
            {"video_index": i, "classes": c, "scores": s}
            for i, (c, s) in enumerate(self.predict_pairs(records))
        ]


class BatchingQueue:
    """Request coalescing behind ONE dispatch thread (ROADMAP item 6).

    Handler threads (ThreadingHTTPServer) never touch jax — they submit
    record lists and block on a Future.  The dispatch loop (run on the
    jax-owning thread; the MAIN thread under the axon TPU tunnel, whose
    client hangs when dispatched from other threads — see CLAUDE.md) drains
    the queue, coalesces concurrent requests up to the compile batch size
    (lingering ``max_delay_ms`` for stragglers), executes one padded device
    batch, and splits the results back per request.
    """

    _SHUTDOWN = object()

    # bounded like lpm_serve's BatchHub: without a cap, a burst of
    # requests (each handler thread holding its record bytes) grows the
    # queue without limit while the dispatch loop drains at device speed
    MAX_QUEUED = 64

    def __init__(self, server: ModelServer, max_delay_ms: float = 2.0):
        self._server = server
        self._q: "queue.Queue" = queue.Queue(maxsize=self.MAX_QUEUED)
        self._linger = max_delay_ms / 1e3
        # counters, written only on the dispatch thread (no lock needed);
        # GET /statz exposes them — same contract as lpm_serve's
        self._stats = {"requests": 0, "executes": 0, "rows": 0,
                       "coalesced": 0}

    def stats(self) -> dict:
        return dict(self._stats)

    def submit(self, records: List[bytes]) -> Future:
        """Raises queue.Full when the server is saturated — the handler
        turns that into a 503 instead of buffering without bound."""
        fut: Future = Future()
        self._q.put_nowait((records, fut))
        return fut

    def shutdown(self):
        self._q.put(self._SHUTDOWN)

    def run_forever(self):
        while self._run_one():
            pass
        # shutdown: nothing consumes the queue anymore — fail any
        # stragglers loudly instead of leaving their handler threads to
        # block the full Future timeout
        while True:
            try:
                nxt = self._q.get_nowait()
            except queue.Empty:
                break
            if nxt is not self._SHUTDOWN:
                nxt[1].set_exception(RuntimeError("server shutting down"))

    def _run_one(self) -> bool:
        item = self._q.get()
        if item is self._SHUTDOWN:
            return False
        stop_after = False
        pending = [item]
        total = len(item[0])
        deadline = time.monotonic() + self._linger
        while total < self._server.batch_size:
            timeout = deadline - time.monotonic()
            if timeout <= 0:
                break
            try:
                nxt = self._q.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is self._SHUTDOWN:
                # don't re-put (the queue is bounded now and could be
                # full, deadlocking the only consumer) — honor it after
                # this batch
                stop_after = True
                break
            pending.append(nxt)
            total += len(nxt[0])
        records = [r for recs, _ in pending for r in recs]
        self._stats["requests"] += len(pending)
        self._stats["rows"] += len(records)
        self._stats["executes"] += max(
            1, -(-len(records) // self._server.batch_size)
        )
        if len(pending) > 1:
            self._stats["coalesced"] += len(pending)
        try:
            pairs = self._server.predict_pairs(records)
        except Exception as e:  # noqa: BLE001 — fail the requests, not the loop
            for _, fut in pending:
                fut.set_exception(e)
            return not stop_after
        pos = 0
        for recs, fut in pending:
            fut.set_result(
                [
                    {"video_index": i, "classes": c, "scores": s}
                    for i, (c, s) in enumerate(pairs[pos : pos + len(recs)])
                ]
            )
            pos += len(recs)
        return not stop_after


def make_handler(server: ModelServer, batcher: Optional[BatchingQueue] = None):
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
            elif self.path == "/statz" and batcher is not None:
                self._send(200, json.dumps(batcher.stats()).encode())
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
                if batcher is not None:
                    preds = batcher.submit(records).result(timeout=300)
                else:
                    preds = server.predict(records)
            except queue.Full:
                self._send(
                    503, json.dumps({"error": "queue full"}).encode()
                )
                return
            except Exception as e:  # noqa: BLE001 — report, don't crash the server
                self._send(400, json.dumps({"error": str(e)}).encode())
                return
            self._send(200, json.dumps({"predictions": preds}).encode())

    return Handler


def serve_forever(
    export_dir: str,
    port: int,
    serving_batch_size: int = 32,
    single_thread: bool = False,
    batch_linger_ms: float = 2.0,
    fast_serve: bool = False,
    int8_hidden: bool = False,
    native: bool = False,
):
    """Default mode: ThreadingHTTPServer accepts concurrent requests, the
    BatchingQueue coalesces them, and the dispatch loop runs on THIS (main)
    thread — all jax dispatch stays main-thread, which the axon TPU tunnel
    requires (CLAUDE.md).  ``single_thread`` restores the round-1 behavior:
    one request at a time, no queue."""
    model_server = ModelServer(export_dir, serving_batch_size,
                               fast_serve=fast_serve,
                               int8_hidden=int8_hidden, native=native)
    logging.info("warming up compiled forward ...")
    model_server.warmup()
    if single_thread:
        httpd = HTTPServer(("0.0.0.0", port), make_handler(model_server))
        logging.info(
            "serving %s on :%d (batch %d, single-thread)",
            export_dir, port, model_server.batch_size,
        )
        httpd.serve_forever()
        return
    batcher = BatchingQueue(model_server, max_delay_ms=batch_linger_ms)
    httpd = ThreadingHTTPServer(
        ("0.0.0.0", port), make_handler(model_server, batcher)
    )
    accept_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    accept_thread.start()
    logging.info(
        "serving %s on :%d (batch %d, batching queue, linger %.1f ms)",
        export_dir, port, model_server.batch_size, batch_linger_ms,
    )
    try:
        batcher.run_forever()  # jax dispatch loop, main thread
    finally:
        httpd.shutdown()


def main(unused_argv):
    logging.set_verbosity(logging.INFO)
    if not FLAGS.export_dir:
        raise ValueError("--export_dir is required")
    serve_forever(
        FLAGS.export_dir,
        FLAGS.port,
        FLAGS.serving_batch_size,
        single_thread=FLAGS.single_thread,
        batch_linger_ms=FLAGS.batch_linger_ms,
        fast_serve=FLAGS.fast_serve,
        int8_hidden=FLAGS.int8_hidden,
        native=FLAGS.native_serve,
    )


define_flags()


def run():
    """Console-script entry point (``lpm-serving``, pyproject [project.scripts]).

    Named lpm-serving (not lpm-serve) to avoid colliding with the native C++
    binary ``native/lpm_serve`` on a shared PATH.
    """
    app.run(main)


if __name__ == "__main__":
    app.run(main)
