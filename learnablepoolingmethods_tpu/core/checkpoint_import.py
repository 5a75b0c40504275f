"""TF-checkpoint → framework-params importer.

Loads reference-trained TF1-format checkpoints (the reference saves via
``tf.train.Saver`` inside Supervisor — ref: train.py#Trainer.run) and maps
the variables onto this framework's flax param/batch_stats trees, so GAP@20
parity (BASELINE.json#metric, ±1e-3) can be demonstrated with
reference-trained weights the moment real checkpoints/data are available.

Name mapping
------------
The reference mount was empty this round (SURVEY.md provenance note), so the
reference variable names are encoded from the starter-code/Willow lineage
with candidate fallbacks ([M]-confidence names get several candidates).  The
mapping is generated FROM our param tree: every leaf knows its reference
name candidates and its layout transform.  Key transforms:

- slim FC: ``<scope>/weights`` → ``kernel``, ``<scope>/biases`` → ``bias``.
- slim batch_norm: ``gamma``→``scale`` (defaults to ones when absent —
  slim's default is ``scale=False``), ``beta``→``bias``,
  ``moving_mean``→batch_stats ``mean``, ``moving_variance``→``var``.
- MoE head relabeling: the reference stores mixture-major kernels
  ([D, V·(M+1)], reshape(-1, M+1) downstream); ours are vocab-major
  ([D, (M+1)·V], vocab on lanes — see models/video_level.py).  Columns are
  permuted accordingly (the exact inverse of the golden-test mapping in
  tests/golden/test_model_heads.py::test_moe_golden).
- per-modality LOUPE modules: ``NetVLAD_0`` ↔ the reference's video-module
  scope, ``NetVLAD_1`` ↔ the audio scope (Willow lineage: ``video_VLAD`` /
  ``audio_VLAD``).

Round-trip tested against TF1-format checkpoints written from the golden
transcriptions (tests/unit/test_checkpoint_import.py).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Mapping, Tuple

import numpy as np

# Module-scope candidates: our flax submodule name → reference variable_scope
# candidates, [M]-confidence (Willow/LOUPE lineage), first match wins.
_MODULE_SCOPES: Dict[str, List[str]] = {
    "NetVLAD_0": ["video_VLAD", "video_NetVLAD"],
    "NetVLAD_1": ["audio_VLAD", "audio_NetVLAD"],
    "NetRVLAD_0": ["video_RVLAD", "video_VLAD", "video_NetRVLAD"],
    "NetRVLAD_1": ["audio_RVLAD", "audio_VLAD", "audio_NetRVLAD"],
    "NetFV_0": ["video_FV", "video_NetFV"],
    "NetFV_1": ["audio_FV", "audio_NetFV"],
    "SoftDBoW_0": ["video_DBOW", "video_DBoW"],
    "SoftDBoW_1": ["audio_DBOW", "audio_DBoW"],
    # the video-level head builds in the same scope in the reference
    "MoeModel_0": [""],
    "LogisticModel_0": [""],
    # context gating's weights are tf.get_variable calls in the model scope,
    # not a nested variable_scope (our flax submodule is named "gating")
    "gating": [""],
}

# leaf-name → reference suffix candidates (identity transform)
_LEAF_NAMES: Dict[str, List[str]] = {
    "cluster_weights": ["cluster_weights"],
    "cluster_weights2": ["cluster_weights2"],
    "covar_weights": ["covar_weights"],
    "cluster_biases": ["cluster_biases"],
    "hidden1_weights": ["hidden1_weights"],
    "hidden1_biases": ["hidden1_biases"],
    "gating_weights": ["gating_weights", "gating_weights_2"],
    "gating_biases": ["gating_biases"],
}

_BN_PARAM = {"scale": "gamma", "bias": "beta"}
_BN_STATS = {"mean": "moving_mean", "var": "moving_variance"}

# TF BasicLSTMCell fuses all four gates into one [D+H, 4H] kernel in the
# order (i, j=g, f, o); flax OptimizedLSTMCell keeps per-gate Dense modules
# (i-side kernels without bias, h-side with).  Column block per flax gate:
_LSTM_GATE_COL = {"i": 0, "g": 1, "f": 2, "o": 3}
_LSTM_GATE_COL_KEYS = ("ii", "if", "ig", "io", "hi", "hf", "hg", "ho")
# TF adds forget_bias=1.0 to the f pre-activation at runtime; flax has no
# such constant, so the imported hf/bias absorbs it.
_LSTM_FORGET_BIAS = 1.0


def _lstm_scope_candidates(layer: int) -> List[str]:
    """Reference variable scopes for stacked-cell layer ``layer``
    (ref: LstmModel — MultiRNNCell under dynamic_rnn's "rnn" scope)."""
    cell = f"multi_rnn_cell/cell_{layer}/basic_lstm_cell"
    return [f"RNN/rnn/{cell}", f"rnn/{cell}", f"RNN/{cell}", cell]


def _lstm_transform(gate: str, leaf_name: str):
    """ref fused tensor → the flax per-gate slice."""
    side, g = gate[0], gate[1]
    col = _LSTM_GATE_COL[g]

    def fn(ref: np.ndarray) -> np.ndarray:
        h = ref.shape[-1] // 4
        block = ref[..., col * h : (col + 1) * h]
        if leaf_name == "bias":
            out = np.array(block)
            if g == "f":
                out = out + _LSTM_FORGET_BIAS
            return out
        d = ref.shape[0] - h
        out = block[:d] if side == "i" else block[d:]
        return np.array(out)

    return fn


def _moe_gates_from_ref(ref: np.ndarray, vocab: int) -> np.ndarray:
    """[D, V·(M+1)] mixture-major → [D, (M+1)·V] vocab-major."""
    d, cols = ref.shape
    m1 = cols // vocab
    return ref.reshape(d, vocab, m1).transpose(0, 2, 1).reshape(d, m1 * vocab)


def _moe_experts_from_ref(ref: np.ndarray, vocab: int) -> np.ndarray:
    return _moe_gates_from_ref(ref, vocab)


def _moe_bias_from_ref(ref: np.ndarray, vocab: int) -> np.ndarray:
    """[V·M] mixture-major → [M·V] vocab-major."""
    m = ref.shape[0] // vocab
    return ref.reshape(vocab, m).transpose(1, 0).reshape(m * vocab)


def _path_str(path) -> List[str]:
    return [getattr(k, "key", getattr(k, "name", str(k))) for k in path]


def _candidates_for_leaf(
    keys: List[str], is_stats: bool, vocab: int
) -> Tuple[List[str], Callable[[np.ndarray], np.ndarray], bool]:
    """→ (reference-name candidates, transform(ref→ours), optional?).

    ``optional`` marks params the reference may legitimately lack (BN gamma
    when slim's scale=False default was used).
    """
    *scope_keys, leaf = keys
    ident = lambda a: a  # noqa: E731

    # stacked LSTM cells: OptimizedLSTMCell_{l}/{ii,if,ig,io,hi,hf,hg,ho}/...
    if (
        len(scope_keys) >= 2
        and scope_keys[-2].startswith("OptimizedLSTMCell_")
        and scope_keys[-1] in _LSTM_GATE_COL_KEYS
        and leaf in ("kernel", "bias")
    ):
        layer = int(scope_keys[-2].rsplit("_", 1)[1])
        ref_leaf = "kernel" if leaf == "kernel" else "bias"
        names = [s + "/" + ref_leaf for s in _lstm_scope_candidates(layer)]
        return names, _lstm_transform(scope_keys[-1], leaf), False

    # batch-norm leaves live under a "*_bn" flax scope (input_bn, cluster_bn,
    # hidden1_bn, gating_bn); a plain Dense "bias" (e.g. fc/bias) must NOT
    # route here (review finding: it mapped to "fc/beta" instead of
    # "fully_connected/biases")
    is_bn = (
        (leaf in _BN_PARAM or leaf in _BN_STATS)
        and scope_keys
        and scope_keys[-1].endswith("_bn")
    )

    # translate flax submodule scopes to reference variable scopes
    prefixes: List[str] = [""]
    for sk in scope_keys[:-1] if is_bn else scope_keys:
        cands = _MODULE_SCOPES.get(sk, [sk])
        prefixes = [
            (p + c + "/") if c else p for p in prefixes for c in cands
        ]

    if is_bn:
        bn_scope = scope_keys[-1]
        ref_leaf = (_BN_STATS if is_stats else _BN_PARAM)[leaf]
        names = [p + bn_scope + "/" + ref_leaf for p in prefixes]
        # slim batch_norm defaults to scale=False → gamma may be absent
        return names, ident, (leaf == "scale")

    # MoE head (vocab-major relabeling)
    if leaf == "gates_kernel":
        names = [p + "gates/weights" for p in prefixes]
        return names, (lambda a: _moe_gates_from_ref(a, vocab)), False
    if leaf == "experts_kernel":
        names = [p + "experts/weights" for p in prefixes]
        return names, (lambda a: _moe_experts_from_ref(a, vocab)), False
    if leaf == "experts_bias":
        names = [p + "experts/biases" for p in prefixes]
        return names, (lambda a: _moe_bias_from_ref(a, vocab)), False

    # slim fully_connected (LogisticModel / FrameLevelLogisticModel "fc")
    if scope_keys and scope_keys[-1] == "fc":
        base_prefixes: List[str] = [""]
        for sk in scope_keys[:-1]:
            cands = _MODULE_SCOPES.get(sk, [sk])
            base_prefixes = [
                (p + c + "/") if c else p for p in base_prefixes for c in cands
            ]
        ref_leaf = "weights" if leaf == "kernel" else "biases"
        names = [p + "fully_connected/" + ref_leaf for p in base_prefixes]
        return names, ident, False

    # named tf.get_variable leaves (cluster/hidden/gating weights)
    if leaf in _LEAF_NAMES:
        names = [p + cand for p in prefixes for cand in _LEAF_NAMES[leaf]]
        return names, ident, False

    # fall back to the flax path verbatim
    return ["/".join(keys)], ident, False


def load_tf_checkpoint_vars(ckpt_path: str) -> Dict[str, np.ndarray]:
    """Read every variable from a TF checkpoint (TF1 Saver or TF2 format)."""
    import tensorflow as tf  # TF used for checkpoint IO only

    reader = tf.train.load_checkpoint(ckpt_path)
    out = {}
    for name in reader.get_variable_to_shape_map():
        out[name] = np.asarray(reader.get_tensor(name))
    return out


def _normalize_names(raw: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip TF graph noise: ``tower/`` scopes (ref: train.py#build_graph
    builds under variable_scope("tower")), device-suffixes, partitioner
    artifacts."""
    out = {}
    for name, val in raw.items():
        n = name
        if n.endswith("/.ATTRIBUTES/VARIABLE_VALUE"):  # TF2 object-based
            n = n[: -len("/.ATTRIBUTES/VARIABLE_VALUE")]
        for prefix in ("tower/", "tower_0/", "model/"):
            if n.startswith(prefix):
                n = n[len(prefix):]
        out[n] = val
        out.setdefault(name, val)
    return out


def import_reference_checkpoint(
    checkpoint: "str | Mapping[str, np.ndarray]",
    model_name: str,
    mcfg,
    example_batch: Mapping[str, np.ndarray],
    frame_features: bool,
    strict: bool = True,
) -> Tuple[dict, dict]:
    """Map a reference TF checkpoint onto (params, batch_stats).

    Args:
      checkpoint: checkpoint path (TF1/TF2 format) or a {name: array} dict.
      model_name: reference model class name (``--model``).
      mcfg: ModelConfig matching the checkpoint's hyperparameters.
      example_batch: one host batch used to initialize the target tree
        (shapes only; values irrelevant).
      frame_features: whether the model consumes frame-level input.
      strict: raise on any missing non-optional variable; otherwise keep the
        fresh-init value.

    Returns: (params, batch_stats) ready for TrainState / eval / inference.
    """
    import jax

    from learnablepoolingmethods_tpu.core import step as step_lib
    from learnablepoolingmethods_tpu.models import create_model

    if isinstance(checkpoint, str):
        ref_vars = load_tf_checkpoint_vars(checkpoint)
    else:
        ref_vars = dict(checkpoint)
    ref_vars = _normalize_names(ref_vars)

    model = create_model(model_name, mcfg)
    params, batch_stats = step_lib.init_model_variables(
        model, example_batch, frame_features
    )

    used: set = set()
    missing: List[str] = []

    def fill(tree, is_stats: bool):
        flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
        leaves = []
        for path, leaf in flat:
            keys = _path_str(path)
            names, transform, optional = _candidates_for_leaf(
                keys, is_stats, mcfg.vocab_size
            )
            hit = next((n for n in names if n in ref_vars), None)
            if hit is None:
                if not optional:
                    missing.append(f"{'stats' if is_stats else 'params'} "
                                   f"{'/'.join(keys)} (tried {names})")
                leaves.append(leaf)
                continue
            used.add(hit)
            val = transform(np.asarray(ref_vars[hit], np.float32))
            if tuple(val.shape) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch for {'/'.join(keys)} ← {hit}: "
                    f"checkpoint {val.shape} vs model {tuple(leaf.shape)}"
                )
            leaves.append(val.astype(np.asarray(leaf).dtype))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    new_params = fill(params, is_stats=False)
    new_stats = fill(batch_stats, is_stats=True)

    if strict and missing:
        raise KeyError(
            "reference checkpoint is missing variables for:\n  "
            + "\n  ".join(missing)
            + "\navailable (unused) checkpoint variables:\n  "
            + "\n  ".join(sorted(set(ref_vars) - used)[:40])
        )
    return new_params, new_stats


def tree_from_reference_checkpoint(
    checkpoint: "str | Mapping[str, np.ndarray]",
    model_name: str,
    mcfg,
    fcfg,
    strict: bool = True,
) -> dict:
    """CLI bridge: build a {"params", "batch_stats"} tree straight from a
    reference checkpoint, deriving init shapes from the FeatureConfig."""
    if fcfg.frame_features:
        example = {
            "features": np.zeros((1, fcfg.max_frames, fcfg.total_size), np.uint8),
            "num_frames": np.ones((1,), np.int32),
        }
    else:
        example = {"features": np.zeros((1, fcfg.total_size), np.float32)}
    params, batch_stats = import_reference_checkpoint(
        checkpoint, model_name, mcfg, example, fcfg.frame_features, strict=strict
    )
    return {"params": params, "batch_stats": batch_stats}


def export_reference_layout(params, batch_stats, vocab: int) -> Dict[str, np.ndarray]:
    """Inverse mapping: our trees → {reference_name: array}.

    Used by tests to write TF1-format checkpoints with reference names from
    golden-transcription weights, and available for users who need to move
    framework-trained weights back to the TF reference."""
    import jax

    out: Dict[str, np.ndarray] = {}
    lstm_cells: Dict[int, Dict[str, np.ndarray]] = {}

    def dump(tree, is_stats: bool):
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            keys = _path_str(path)
            if (
                len(keys) >= 3
                and keys[-3].startswith("OptimizedLSTMCell_")
                and keys[-2] in _LSTM_GATE_COL_KEYS
            ):
                layer = int(keys[-3].rsplit("_", 1)[1])
                lstm_cells.setdefault(layer, {})[keys[-2] + "/" + keys[-1]] = (
                    np.asarray(leaf, np.float32)
                )
                continue
            names, transform, _ = _candidates_for_leaf(keys, is_stats, vocab)
            val = np.asarray(leaf, np.float32)
            # invert the MoE relabeling (it is its own family of inverses)
            leaf_name = keys[-1]
            if leaf_name == "gates_kernel" or leaf_name == "experts_kernel":
                d, cols = val.shape
                m1 = cols // vocab
                val = val.reshape(d, m1, vocab).transpose(0, 2, 1).reshape(d, cols)
            elif leaf_name == "experts_bias":
                m = val.shape[0] // vocab
                val = val.reshape(m, vocab).transpose(1, 0).reshape(-1)
            out[names[0]] = val

    dump(params, False)
    dump(batch_stats, True)

    # reassemble per-gate LSTM leaves into the TF fused [D+H, 4H] kernel and
    # [4H] bias (inverse of _lstm_transform; forget_bias removed)
    for layer, leaves in lstm_cells.items():
        h = leaves["hi/kernel"].shape[0]
        k_cols, b_parts = [], []
        for g in ("i", "g", "f", "o"):
            k_cols.append(
                np.concatenate(
                    [leaves[f"i{g}/kernel"], leaves[f"h{g}/kernel"]], axis=0
                )
            )
            b = np.array(leaves[f"h{g}/bias"])
            if g == "f":
                b = b - _LSTM_FORGET_BIAS
            b_parts.append(b)
        out[_lstm_scope_candidates(layer)[0] + "/kernel"] = np.concatenate(
            k_cols, axis=1
        )
        out[_lstm_scope_candidates(layer)[0] + "/bias"] = np.concatenate(b_parts)
    return out
