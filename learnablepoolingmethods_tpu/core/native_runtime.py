"""ctypes binding for the native C++ StableHLO executor (PJRT CPU).

``native/stablehlo_runner.cc`` compiles an exported StableHLO module with
the XLA PJRT CPU client from the TensorFlow wheel's ``libtensorflow_cc`` and
executes it with no Python/JAX in the hot path — the rebuild's native
serving runtime (the reference served SavedModels through TensorFlow's C++
runtime; ref: export_model.py#ModelExporter, SURVEY.md L7).

Build: on first use, ``g++ -O2 -DNDEBUG -shared`` against the TF wheel's
headers and ``libtensorflow_cc.so.2`` (see the .cc header comment for why
NDEBUG is mandatory and what the mlir_stub include path is).  The link
takes ~1 min once; the .so is cached next to the source.  Importing this
module never raises — ``is_available()`` reports whether the native
runtime built.

Usage::

    exe = NativeExecutable.from_export_dir(export_dir)   # weights preloaded
    values, indices = exe.run(features_u8, num_frames)   # C++/XLA only
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_SRC = os.path.join(_REPO_ROOT, "native", "stablehlo_runner.cc")
_STUB = os.path.join(_REPO_ROOT, "native", "mlir_stub")
_SO = os.path.join(_REPO_ROOT, "native", "libstablehlo_runner.so")

_lib = None
_load_error: Optional[str] = None
_ERR_CAP = 4096

# dtype codes shared with stablehlo_runner.cc
_DTYPE_CODES = {
    "float32": 0,
    "int32": 1,
    "uint8": 2,
    "bfloat16": 3,
    "int8": 4,
    "int64": 5,
    "bool": 6,
    "float64": 7,
}


def _np_dtype(name: str) -> np.dtype:
    if name == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def _tf_root() -> str:
    import tensorflow as tf

    return os.path.dirname(os.path.abspath(tf.__file__))


_STUB_HDR = os.path.join(_STUB, "mlir", "IR", "BuiltinOps.h")


def _gxx_cmd(output: str, sources, shared: bool):
    """The one g++ invocation both native-runtime artifacts share — the
    -DNDEBUG and include/lib set MUST stay identical (see the .cc header
    comment on AsyncValue type-ids)."""
    tf_root = _tf_root()
    inc = os.path.join(tf_root, "include")
    return [
        "g++", "-std=c++17", "-O2", "-w", "-DNDEBUG", "-pthread",
        *(["-shared", "-fPIC"] if shared else []),
        "-o", output, *sources,
        "-I" + _STUB,
        "-I" + inc,
        "-I" + os.path.join(inc, "external", "highwayhash"),
        "-I" + os.path.join(inc, "external", "farmhash_archive", "src"),
        os.path.join(tf_root, "libtensorflow_cc.so.2"),
        os.path.join(tf_root, "libtensorflow_framework.so.2"),
        "-Wl,-rpath," + tf_root,
    ]


def _build() -> None:
    subprocess.run(
        _gxx_cmd(_SO, [_SRC], shared=True), check=True, capture_output=True
    )


def _load():
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    try:
        newest = max(os.path.getmtime(_SRC), os.path.getmtime(_STUB_HDR))
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < newest:
            _build()
        lib = ctypes.CDLL(_SO)
        lib.shr_compile.restype = ctypes.c_void_p
        lib.shr_compile.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
        ptrs = ctypes.POINTER(ctypes.c_void_p)
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.shr_preload.restype = ctypes.c_int32
        lib.shr_preload.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ptrs, i32p, i64p, i32p,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.shr_execute.restype = ctypes.c_int32
        lib.shr_execute.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ptrs, i32p, i64p, i32p,
            ctypes.c_int32, ptrs, i64p, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.shr_destroy.restype = None
        lib.shr_destroy.argtypes = [ctypes.c_void_p]
        lib.shr_selftest.restype = ctypes.c_int32
        lib.shr_selftest.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
    except Exception as e:  # noqa: BLE001 — degrade cleanly
        err = f"{type(e).__name__}: {e}"
        if isinstance(e, subprocess.CalledProcessError) and e.stderr:
            err += " :: " + e.stderr.decode(errors="replace")[-500:]
        _load_error = err
    return _lib


_SERVE_SRC = os.path.join(_REPO_ROOT, "native", "serving_main.cc")
_READER_SRC = os.path.join(_REPO_ROOT, "native", "tfrecord_reader.cc")
_SERVE_BIN = os.path.join(_REPO_ROOT, "native", "lpm_serve")


def build_serving_binary() -> str:
    """Build (or reuse) the fully-native serving binary ``lpm_serve``
    (native/serving_main.cc): socket → wire-format proto parse → PJRT
    execute → JSON, no Python anywhere.  Returns the binary path."""
    srcs = [_SERVE_SRC, _SRC, _READER_SRC]
    newest = max(os.path.getmtime(s) for s in srcs + [_STUB_HDR])
    if os.path.exists(_SERVE_BIN) and os.path.getmtime(_SERVE_BIN) >= newest:
        return _SERVE_BIN
    subprocess.run(
        _gxx_cmd(_SERVE_BIN, srcs, shared=False), check=True,
        capture_output=True,
    )
    return _SERVE_BIN


def is_available() -> bool:
    return _load() is not None


def load_error() -> Optional[str]:
    _load()
    return _load_error


def selftest() -> None:
    """Compile + run the embedded add-module through the full C++ path."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native runtime unavailable: {_load_error}")
    err = ctypes.create_string_buffer(_ERR_CAP)
    if lib.shr_selftest(err, _ERR_CAP) != 0:
        raise RuntimeError(f"selftest failed: {err.value.decode()}")


def _pack_args(arrays: Sequence[np.ndarray]):
    """→ (data ptrs, dtype codes, concatenated dims, ndims) ctypes arrays."""
    n = len(arrays)
    data = (ctypes.c_void_p * n)()
    dtypes = (ctypes.c_int32 * n)()
    ndims = (ctypes.c_int32 * n)()
    all_dims: List[int] = []
    for i, a in enumerate(arrays):
        code = _DTYPE_CODES.get(str(a.dtype))
        if code is None:
            raise ValueError(f"unsupported dtype {a.dtype}")
        data[i] = a.ctypes.data_as(ctypes.c_void_p).value
        dtypes[i] = code
        ndims[i] = a.ndim
        all_dims.extend(a.shape)
    dims = (ctypes.c_int64 * max(len(all_dims), 1))(*all_dims)
    return data, dtypes, dims, ndims


class CompiledModule:
    """One compiled StableHLO module + optional preloaded leading args."""

    def __init__(self, mlir: "str | bytes"):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native runtime unavailable: {_load_error}")
        blob = mlir.encode() if isinstance(mlir, str) else bytes(mlir)
        err = ctypes.create_string_buffer(_ERR_CAP)
        self._handle = lib.shr_compile(blob, len(blob), err, _ERR_CAP)
        if not self._handle:
            raise RuntimeError(f"compile failed: {err.value.decode()}")
        self._lib = lib
        # keep preloaded arrays alive: kImmutableOnlyDuringCall copies, but
        # holding them is free and protects against future semantics changes
        self._pinned: List[np.ndarray] = []

    def preload(self, arrays: Sequence[np.ndarray]) -> None:
        arrays = [np.ascontiguousarray(a) for a in arrays]
        data, dtypes, dims, ndims = _pack_args(arrays)
        err = ctypes.create_string_buffer(_ERR_CAP)
        rc = self._lib.shr_preload(
            self._handle, len(arrays), data, dtypes, dims, ndims, err, _ERR_CAP
        )
        if rc != 0:
            raise RuntimeError(f"preload failed: {err.value.decode()}")
        self._pinned = arrays

    def execute(
        self,
        args: Sequence[np.ndarray],
        out_specs: Sequence[Tuple[Sequence[int], str]],
    ) -> List[np.ndarray]:
        """Run with (preloaded + args); out_specs = [(shape, dtype), ...]."""
        args = [np.ascontiguousarray(a) for a in args]
        data, dtypes, dims, ndims = _pack_args(args)
        outs = [np.empty(shape, dtype=dt) for shape, dt in out_specs]
        optr = (ctypes.c_void_p * len(outs))(
            *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs]
        )
        obytes = (ctypes.c_int64 * len(outs))(*[o.nbytes for o in outs])
        err = ctypes.create_string_buffer(_ERR_CAP)
        rc = self._lib.shr_execute(
            self._handle, len(args), data, dtypes, dims, ndims,
            len(outs), optr, obytes, err, _ERR_CAP,
        )
        if rc != 0:
            raise RuntimeError(f"execute failed: {err.value.decode()}")
        return outs

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.shr_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - gc timing
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass


class NativeExecutable:
    """An exported model artifact running fully in the native runtime.

    Loads ``stablehlo.mlir`` + ``native_spec.json`` from an export dir
    (export_model.py), flattens the weight trees in the exported calling
    convention's order (jax.tree leaves of (params, batch_stats)), uploads
    them once, and serves ``run(features, num_frames)`` → (values, indices)
    like the jit'd predict step — without touching JAX.
    """

    def __init__(self, mlir: str, spec: dict, weights: Sequence[np.ndarray]):
        self.spec = spec
        n_weights = len(weights)
        ins = spec["inputs"]
        if n_weights >= len(ins):
            raise ValueError(
                f"spec lists {len(ins)} inputs but got {n_weights} weights"
            )
        for i, w in enumerate(weights):
            want = ins[i]
            if list(w.shape) != list(want["shape"]) or str(w.dtype) != want["dtype"]:
                raise ValueError(
                    f"weight {i}: got {w.dtype}{list(w.shape)}, export "
                    f"expects {want['dtype']}{want['shape']}"
                )
        self._call_inputs = ins[n_weights:]
        self._out_specs = [
            (tuple(o["shape"]), o["dtype"]) for o in spec["outputs"]
        ]
        self.batch_size = int(spec["batch_size"])
        self.module = CompiledModule(mlir)
        self.module.preload(weights)

    @classmethod
    def from_export_dir(cls, export_dir: str) -> "NativeExecutable":
        from learnablepoolingmethods_tpu import export_model as em

        mlir_path = os.path.join(export_dir, em._MLIR_FILE)
        spec_path = os.path.join(export_dir, em._NATIVE_SPEC_FILE)
        if not (os.path.exists(mlir_path) and os.path.exists(spec_path)):
            raise FileNotFoundError(
                f"{export_dir} has no native artifact — re-export with "
                "--with_stablehlo (export_model.py writes stablehlo.mlir + "
                "native_spec.json)"
            )
        with open(mlir_path) as f:
            mlir = f.read()
        with open(spec_path) as f:
            spec = json.load(f)
        weights = cls._flatten_weights(export_dir)
        return cls(mlir, spec, weights)

    @staticmethod
    def _flatten_weights(export_dir: str) -> List[np.ndarray]:
        """Weight leaves in the exported calling convention's order.

        Reads the raw ``weights.bin`` blob export wrote (already flattened
        in jax.tree leaf order) rather than re-initializing the flax model
        — startup stays JAX-free.  Falls back to the model path for
        artifacts exported before weights.bin existed."""
        import json as _json

        from learnablepoolingmethods_tpu import export_model as em

        blob_path = os.path.join(export_dir, em._WEIGHTS_FILE)
        spec_path = os.path.join(export_dir, em._NATIVE_SPEC_FILE)
        cfg_path = os.path.join(export_dir, em._CONFIG_FILE)
        if os.path.exists(blob_path):
            with open(spec_path) as f:
                spec = _json.load(f)
            with open(cfg_path) as f:
                meta = _json.load(f)
            n_call = 2 if meta["feature_config"]["frame_features"] else 1
            weight_specs = spec["inputs"][:-n_call]
            blob = np.fromfile(blob_path, np.uint8)
            leaves, off = [], 0
            for w in weight_specs:
                dt = _np_dtype(w["dtype"])
                n = int(np.prod(w["shape"], dtype=np.int64)) if w["shape"] else 1
                nbytes = n * dt.itemsize
                leaves.append(
                    blob[off : off + nbytes].view(dt).reshape(w["shape"])
                )
                off += nbytes
            if off != blob.size:
                raise ValueError(
                    f"weights.bin has {blob.size} bytes, spec accounts for "
                    f"{off} — re-export the artifact"
                )
            return leaves
        import jax

        model, params, batch_stats, mcfg, fcfg, _ = em.load_exported_model(
            export_dir
        )
        del model, mcfg, fcfg
        leaves = jax.tree_util.tree_leaves((params, batch_stats))
        return [np.ascontiguousarray(np.asarray(x)) for x in leaves]

    def run(self, features: np.ndarray, num_frames=None):
        """→ (values [B, k] f32, indices [B, k] i32); B must equal the
        exported batch size (serving pads to it)."""
        args = [np.ascontiguousarray(features)]
        if num_frames is not None:
            args.append(np.ascontiguousarray(num_frames, np.int32))
        if len(args) != len(self._call_inputs):
            raise ValueError(
                f"module takes {len(self._call_inputs)} per-call inputs, "
                f"got {len(args)}"
            )
        for a, want in zip(args, self._call_inputs):
            if list(a.shape) != list(want["shape"]) or str(a.dtype) != want["dtype"]:
                raise ValueError(
                    f"input mismatch: got {a.dtype}{list(a.shape)}, export "
                    f"expects {want['dtype']}{want['shape']} — pad the batch "
                    f"to the exported batch size {self.batch_size}"
                )
        outs = self.module.execute(args, self._out_specs)
        return tuple(outs)
