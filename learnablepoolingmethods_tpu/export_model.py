"""Model export / serving artifact (ref: export_model.py#ModelExporter).

The reference periodically writes a TF SavedModel whose serving signature
maps serialized ``tf.Example`` bytes → (class_indexes, predictions).  The
TPU-native artifact is framework-neutral and self-contained:

    export_dir/
      model_config.json     # model class name + full ModelConfig/FeatureConfig
      params.msgpack        # flax-serialized parameters
      batch_stats.msgpack   # BN moving statistics
      stablehlo.bin         # (optional) jax.export'd forward for this platform
      stablehlo.mlir        # (optional) the module as StableHLO text — the
      native_spec.json      #   input to the C++ PJRT executor
                            #   (native/stablehlo_runner.cc), with the
                            #   flattened input/output specs it needs

``load_exported_model`` rebuilds the model + a ``serve(serialized_records)``
callable with the same contract as the reference signature: it takes raw
TFRecord payload bytes (tf.Example / tf.SequenceExample), runs the TF-free
parser, and returns (class_indexes [B, k], predictions [B, k]).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List, Tuple

import jax
import numpy as np
from flax import serialization

from learnablepoolingmethods_tpu.config import FeatureConfig, ModelConfig
from learnablepoolingmethods_tpu.core import step as step_lib
from learnablepoolingmethods_tpu.models import create_model

_CONFIG_FILE = "model_config.json"
_PARAMS_FILE = "params.msgpack"
_STATS_FILE = "batch_stats.msgpack"
_HLO_FILE = "stablehlo.bin"
_MLIR_FILE = "stablehlo.mlir"
_NATIVE_SPEC_FILE = "native_spec.json"


def export_model(
    export_dir: str,
    model_name: str,
    mcfg: ModelConfig,
    fcfg: FeatureConfig,
    params,
    batch_stats,
    top_k: int = 20,
    with_stablehlo: bool = False,
    stablehlo_batch_size: int = 1,
) -> str:
    os.makedirs(export_dir, exist_ok=True)
    meta = {
        "model": model_name,
        "top_k": top_k,
        "model_config": dataclasses.asdict(mcfg),
        "feature_config": dataclasses.asdict(fcfg),
        "framework": "learnablepoolingmethods_tpu",
    }
    with open(os.path.join(export_dir, _CONFIG_FILE), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(export_dir, _PARAMS_FILE), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))
    with open(os.path.join(export_dir, _STATS_FILE), "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(batch_stats)))

    if with_stablehlo:
        try:
            from jax import export as jax_export

            model = create_model(model_name, mcfg)
            predict = step_lib.make_predict_step(
                model, mcfg, fcfg.frame_features, top_k=top_k
            )
            b = stablehlo_batch_size
            if fcfg.frame_features:
                feat_shape = (b, fcfg.max_frames, fcfg.total_size)
                args = (
                    params,
                    batch_stats,
                    jax.ShapeDtypeStruct(feat_shape, np.uint8),
                    jax.ShapeDtypeStruct((b,), np.int32),
                )
            else:
                feat_shape = (b, fcfg.total_size)
                args = (
                    params,
                    batch_stats,
                    jax.ShapeDtypeStruct(feat_shape, np.float32),
                )
            exported = jax_export.export(jax.jit(predict))(*args)
            with open(os.path.join(export_dir, _HLO_FILE), "wb") as f:
                f.write(exported.serialize())
            # the native C++ executor's inputs: StableHLO text + the
            # flattened calling convention (core/native_runtime.py)
            with open(os.path.join(export_dir, _MLIR_FILE), "w") as f:
                f.write(exported.mlir_module())
            spec = {
                "batch_size": b,
                "top_k": top_k,
                "inputs": [
                    {"shape": list(a.shape), "dtype": str(a.dtype)}
                    for a in exported.in_avals
                ],
                "outputs": [
                    {"shape": list(a.shape), "dtype": str(a.dtype)}
                    for a in exported.out_avals
                ],
            }
            with open(os.path.join(export_dir, _NATIVE_SPEC_FILE), "w") as f:
                json.dump(spec, f, indent=2)
            _write_native_manifest(
                export_dir, model_name, fcfg, params, batch_stats, spec
            )
        except Exception as e:  # noqa: BLE001 — export is best-effort extra
            with open(os.path.join(export_dir, "stablehlo_error.txt"), "w") as f:
                f.write(repr(e))
    return export_dir


_MANIFEST_FILE = "native_manifest.txt"
_WEIGHTS_FILE = "weights.bin"
# short dtype tags shared with native/serving_main.cc
_DTYPE_TAGS = {
    "float32": "f32", "int32": "s32", "uint8": "u8", "bfloat16": "bf16",
    "int8": "s8", "int64": "s64", "bool": "pred", "float64": "f64",
}


def _write_native_manifest(export_dir, model_name, fcfg, params, batch_stats,
                           spec) -> None:
    """The fully-native artifact pieces: raw weight blob + a line-based
    manifest the C++ serving binary (native/serving_main.cc) reads without
    a JSON/msgpack parser.  Weight order = the exported calling convention
    (jax.tree leaves of (params, batch_stats)); arrays are dense row-major
    little-endian, concatenated."""
    leaves = [
        np.ascontiguousarray(np.asarray(x))
        for x in jax.tree_util.tree_leaves((params, batch_stats))
    ]
    with open(os.path.join(export_dir, _WEIGHTS_FILE), "wb") as f:
        for a in leaves:
            f.write(a.tobytes())

    def _row(kind, aval):
        tag = _DTYPE_TAGS[str(aval["dtype"])]
        dims = " ".join(str(d) for d in aval["shape"])
        return f"{kind} {tag} {len(aval['shape'])} {dims}".rstrip()

    lines = [
        "lpm_native_manifest 1",
        f"model {model_name}",
        f"batch_size {spec['batch_size']}",
        f"top_k {spec['top_k']}",
        f"frame_features {int(fcfg.frame_features)}",
        f"max_frames {fcfg.max_frames}",
        f"n_features {len(fcfg.feature_names)}",
    ]
    for name, size in zip(fcfg.feature_names, fcfg.feature_sizes):
        lines.append(f"feature {name} {size}")
    call_inputs = spec["inputs"][len(leaves):]
    lines.append(f"n_call_inputs {len(call_inputs)}")
    lines += [_row("call_input", a) for a in call_inputs]
    lines.append(f"n_outputs {len(spec['outputs'])}")
    lines += [_row("output", a) for a in spec["outputs"]]
    lines.append(f"n_weights {len(leaves)}")
    for a in leaves:
        tag = _DTYPE_TAGS[str(a.dtype)]
        dims = " ".join(str(d) for d in a.shape)
        lines.append(f"weight {tag} {a.ndim} {dims}".rstrip())
    with open(os.path.join(export_dir, _MANIFEST_FILE), "w") as f:
        f.write("\n".join(lines) + "\n")


def _configs_from_meta(meta: dict) -> Tuple[ModelConfig, FeatureConfig]:
    mc = dict(meta["model_config"])
    fc = dict(meta["feature_config"])
    fc["feature_names"] = tuple(fc["feature_names"])
    fc["feature_sizes"] = tuple(fc["feature_sizes"])
    return ModelConfig(**mc), FeatureConfig(**fc)


def _try_fast_predict(model_name, mcfg, variables, top_k: int,
                      int8_hidden: bool = False):
    """Build the BN-folded fast forward when one exists for this model and
    config; returns fn(features, num_frames, rng) → (values, indices), or
    None.  Weights are jit ARGUMENTS held on the host side of the closure
    (never traced constants — CLAUDE.md HTTP 413 rule)."""
    import jax as _jax

    if getattr(mcfg, "presampled", False):
        # a presampled-config model consumes the input whole; the fast
        # forwards would re-subsample it — keep the flax path
        return None
    use_pallas = _jax.default_backend() == "tpu"
    from learnablepoolingmethods_tpu.ops.fast_dispatch import get_fast_path

    path = get_fast_path(model_name)
    if path is None:
        return None
    try:
        fp = _jax.device_put(
            path.prepare(variables, mcfg, int8_hidden=int8_hidden)
        )
        fn = path.build(mcfg, top_k=top_k, use_pallas=use_pallas)
    except (ValueError, KeyError):
        # non-default config the fast path doesn't cover (KeyError: a params
        # tree the preparer's layout assumptions don't match, e.g. a custom
        # video-level classifier or a single-modality feature set)
        return None
    jitted = jax.jit(fn, static_argnames=("presampled",))
    return lambda feats, nfs, rng: jitted(fp, feats, nfs, rng)


def load_exported_model(export_dir: str, prefer_fast: bool = False,
                        int8_hidden: bool = False):
    """Rebuild (model, params, batch_stats, mcfg, fcfg, serve_fn).

    ``prefer_fast``: serve through the BN-folded fused forward when the
    model/config has one (every ops/fast_dispatch.py entry: NetVLAD/DBoF/
    NetFV/NetRVLAD/SoftDbof/NeXtVLAD/Transformer/AttentionNetVLAD) —
    1.4–5× the flax throughput; silently falls back when unsupported.
    Off by default because the fast path draws its frame-sampling
    randomness differently than the flax module (same distribution,
    different stream), so sampled-model outputs are not bit-comparable.

    ``int8_hidden``: weight-only int8 hidden FC on the NetVLADModelLF fast
    path (ops/int8_matmul.py) — the low-batch serving regime is exactly
    where the FC is HBM-bound and int8 pays (+14% e2e at B=256, more at
    serving batch sizes; |ΔGAP| ≤ 1e-3).  Unlike unsupported-config
    fallback this is an explicit request, so it RAISES when the model
    can't honor it rather than silently serving bf16."""
    with open(os.path.join(export_dir, _CONFIG_FILE)) as f:
        meta = json.load(f)
    mcfg, fcfg = _configs_from_meta(meta)
    model = create_model(meta["model"], mcfg)

    # Build a template pytree by re-initializing, then overwrite from bytes.
    if fcfg.frame_features:
        example = {
            "features": np.zeros((1, fcfg.max_frames, fcfg.total_size), np.uint8),
            "num_frames": np.ones((1,), np.int32),
        }
    else:
        example = {"features": np.zeros((1, fcfg.total_size), np.float32)}
    params, batch_stats = step_lib.init_model_variables(
        model, example, fcfg.frame_features
    )
    with open(os.path.join(export_dir, _PARAMS_FILE), "rb") as f:
        params = serialization.from_bytes(params, f.read())
    with open(os.path.join(export_dir, _STATS_FILE), "rb") as f:
        batch_stats = serialization.from_bytes(batch_stats, f.read())

    predict = jax.jit(
        step_lib.make_predict_step(
            model, mcfg, fcfg.frame_features, top_k=meta["top_k"]
        )
    )
    if int8_hidden:
        from learnablepoolingmethods_tpu.ops.fast_dispatch import (
            int8_capable_models,
        )

        if (
            not prefer_fast
            or meta["model"] not in int8_capable_models()
            or not fcfg.frame_features
        ):
            raise ValueError(
                "int8_hidden requires the fast path (prefer_fast/"
                "--fast_serve) on a frame-level export of one of "
                f"{int8_capable_models()}"
            )
    fast_predict = None
    if prefer_fast and fcfg.frame_features:
        fast_predict = _try_fast_predict(
            meta["model"], mcfg,
            {"params": params, "batch_stats": batch_stats}, meta["top_k"],
            int8_hidden=int8_hidden,
        )
        if int8_hidden and fast_predict is None:
            raise ValueError(
                "int8_hidden requested but this export's config has no "
                "fast path (non-default pooling config)"
            )

    def serve(serialized_records: List[bytes]):
        """Serving signature: raw record bytes → (class_indexes, predictions).

        (ref: export_model.py#build_prediction_graph serving_default.)
        """
        if fcfg.frame_features:
            feats, nfs = parse_serialized_records(fcfg, serialized_records)
            if fast_predict is not None:
                values, indices = fast_predict(feats, nfs, jax.random.key(0))
            else:
                values, indices = predict(params, batch_stats, feats, nfs)
        else:
            feats, _ = parse_serialized_records(fcfg, serialized_records)
            values, indices = predict(params, batch_stats, feats)
        return np.asarray(indices), np.asarray(values)

    return model, params, batch_stats, mcfg, fcfg, serve


def parse_serialized_records(fcfg: FeatureConfig, serialized_records):
    """Raw record bytes → (features, num_frames | None) — the TF-free
    transcription of the reference serving input stage
    (ref: export_model.py#build_prediction_graph, readers.py)."""
    from learnablepoolingmethods_tpu.data import tfrecord_io
    from learnablepoolingmethods_tpu.data.readers import resize_axis

    if fcfg.frame_features:
        feats, nfs = [], []
        for rec in serialized_records:
            _, fl = tfrecord_io.parse_sequence_example(rec)
            mats = []
            n = None
            for name, size in zip(fcfg.feature_names, fcfg.feature_sizes):
                rows = [
                    np.frombuffer(x.bytes_list[0], np.uint8)
                    for x in fl.get(name, [])
                ]
                mat = np.stack(rows) if rows else np.zeros((0, size), np.uint8)
                n = mat.shape[0] if n is None else min(n, mat.shape[0])
                mats.append(resize_axis(mat, 0, fcfg.max_frames))
            feats.append(np.concatenate(mats, axis=1))
            nfs.append(min(n or 0, fcfg.max_frames))
        return np.stack(feats), np.asarray(nfs, np.int32)
    feats = []
    for rec in serialized_records:
        fmap = tfrecord_io.parse_example(rec)
        parts = [
            np.asarray(fmap[name].float_list, np.float32)
            for name in fcfg.feature_names
        ]
        feats.append(np.concatenate(parts))
    return np.stack(feats), None


def load_exported_native(export_dir: str):
    """Load an export through the native C++ PJRT executor
    (native/stablehlo_runner.cc): no Python/JAX in the execution path.

    → (mcfg, fcfg, batch_size, serve) where ``serve`` has the same record
    contract as ``load_exported_model``'s but a FIXED batch size (the
    exported module's static shape) — callers pad to it.
    """
    from learnablepoolingmethods_tpu.core.native_runtime import (
        NativeExecutable,
    )

    with open(os.path.join(export_dir, _CONFIG_FILE)) as f:
        meta = json.load(f)
    mcfg, fcfg = _configs_from_meta(meta)
    exe = NativeExecutable.from_export_dir(export_dir)

    def serve(serialized_records: List[bytes]):
        feats, nfs = parse_serialized_records(fcfg, serialized_records)
        values, indices = exe.run(feats, nfs)
        return np.asarray(indices), np.asarray(values)

    return mcfg, fcfg, exe.batch_size, serve
