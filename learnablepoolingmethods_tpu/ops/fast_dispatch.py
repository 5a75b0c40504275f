"""Single registry for the per-model fused inference paths.

eval.py (``--fast_forward``), inference.py (``--fast_infer``), and
export_model.py (``prefer_fast`` / ``--fast_serve``) all dispatch the same
model-name → (prepare, build) mapping; before this module each carried its
own copy of the if/elif ladder and they had already drifted.  One entry
per model family:

- ``prepare(variables, mcfg, int8_hidden=False)`` folds BNs / casts
  weights once on host → a flat param pytree (always passed as a jit
  ARGUMENT, never closed over — CLAUDE.md HTTP-413 rule).  Raises
  ``ValueError`` on configs the fast path does not cover.
- ``build(mcfg, top_k=20, use_pallas=True, pallas_interpret=False,
  return_probs=False)`` → ``fn(fp, features, num_frames, rng,
  presampled=False)``.  ``use_pallas`` selects the Mosaic kernels (real
  TPU only; the jnp route is identical math and composes with GSPMD);
  builders without a Pallas kernel accept and ignore it.
- ``supports_int8``: whether ``prepare`` honors the weight-only int8
  hidden FC (ops/int8_matmul.py) — the models with the giant D·K hidden
  FC: NetVLADModelLF, AttentionNetVLADModel, NetFVModelLF,
  NetRVLADModelLF.

Imports are deferred inside each factory so importing this module stays
cheap for CLIs that never take a fast path.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple


# The LOUPE-family models served by ops/fast_lf.py's shared builder.  The
# canonical list lives HERE (fast_lf imports it) so that registry lookups
# and error messages never import the Pallas kernel modules.
FAST_LF_MODELS = (
    "NetFVModelLF",
    "NetRVLADModelLF",
    "SoftDbofModelLF",
    "NeXtVLADModel",
)

_LF_INT8 = ("NetFVModelLF", "NetRVLADModelLF")  # giant-FC LF models


class FastPath(NamedTuple):
    prepare: Callable[..., Dict[str, Any]]
    build: Callable[..., Callable]
    supports_int8: bool


def _reject_int8(model_name: str, int8_hidden: bool) -> None:
    if int8_hidden:
        raise ValueError(
            "int8_hidden is only supported on the models with the giant "
            f"D*K hidden FC ({int8_capable_models()}), not {model_name}"
        )


def int8_capable_models() -> Tuple[str, ...]:
    """Model names whose fast path honors --int8_hidden.  Static: callers
    validate flags / render error messages with it, which must not import
    the kernel modules (the factories defer those imports on purpose);
    test_fast_dispatch pins it against the registry's supports_int8."""
    return (
        "NetVLADModelLF", "AttentionNetVLADModel",
    ) + _LF_INT8


def _netvlad() -> FastPath:
    from learnablepoolingmethods_tpu.ops.fast_infer import (
        build_fast_netvlad_inference,
        prepare_fast_params,
    )

    def prepare(variables, mcfg, int8_hidden=False):
        return prepare_fast_params(variables, mcfg, int8_hidden=int8_hidden)

    def build(mcfg, top_k=20, use_pallas=True, pallas_interpret=False,
              return_probs=False):
        return build_fast_netvlad_inference(
            mcfg, top_k=top_k, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret, return_probs=return_probs,
        )

    return FastPath(prepare, build, supports_int8=True)


def _dbof() -> FastPath:
    from learnablepoolingmethods_tpu.ops.fast_dbof import (
        build_fast_dbof_inference,
        prepare_fast_dbof_params,
    )

    def prepare(variables, mcfg, int8_hidden=False):
        _reject_int8("DbofModel", int8_hidden)
        return prepare_fast_dbof_params(variables, mcfg)

    def build(mcfg, top_k=20, use_pallas=True, pallas_interpret=False,
              return_probs=False):
        # pure-jnp path: no Pallas kernel to select
        return build_fast_dbof_inference(
            mcfg, top_k=top_k, return_probs=return_probs
        )

    return FastPath(prepare, build, supports_int8=False)


def _lf(model_name: str) -> FastPath:
    from learnablepoolingmethods_tpu.ops.fast_lf import (
        build_fast_lf_inference,
        prepare_fast_lf_params,
    )

    def prepare(variables, mcfg, int8_hidden=False):
        if model_name not in _LF_INT8:
            _reject_int8(model_name, int8_hidden)
        return prepare_fast_lf_params(
            variables, mcfg, model_name, int8_hidden=int8_hidden
        )

    def build(mcfg, top_k=20, use_pallas=True, pallas_interpret=False,
              return_probs=False):
        return build_fast_lf_inference(
            mcfg, model_name, top_k=top_k, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret, return_probs=return_probs,
        )

    return FastPath(prepare, build, supports_int8=model_name in _LF_INT8)


def _transformer() -> FastPath:
    from learnablepoolingmethods_tpu.ops.fast_transformer import (
        build_fast_transformer_inference,
        prepare_fast_transformer_params,
    )

    def prepare(variables, mcfg, int8_hidden=False):
        _reject_int8("TransformerEncoderModel", int8_hidden)
        return prepare_fast_transformer_params(variables, mcfg)

    def build(mcfg, top_k=20, use_pallas=True, pallas_interpret=False,
              return_probs=False):
        return build_fast_transformer_inference(
            mcfg, top_k=top_k, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret, return_probs=return_probs,
        )

    return FastPath(prepare, build, supports_int8=False)


def _attn_netvlad() -> FastPath:
    from learnablepoolingmethods_tpu.ops.fast_transformer import (
        build_fast_attn_netvlad_inference,
        prepare_fast_attn_netvlad_params,
    )

    def prepare(variables, mcfg, int8_hidden=False):
        return prepare_fast_attn_netvlad_params(
            variables, mcfg, int8_hidden=int8_hidden
        )

    def build(mcfg, top_k=20, use_pallas=True, pallas_interpret=False,
              return_probs=False):
        return build_fast_attn_netvlad_inference(
            mcfg, top_k=top_k, use_pallas=use_pallas,
            pallas_interpret=pallas_interpret, return_probs=return_probs,
        )

    return FastPath(prepare, build, supports_int8=True)


_REGISTRY: Optional[Dict[str, Callable[[], FastPath]]] = None


def _factories() -> Dict[str, Callable[[], FastPath]]:
    global _REGISTRY
    if _REGISTRY is None:
        reg: Dict[str, Callable[[], FastPath]] = {
            "NetVLADModelLF": _netvlad,
            "DbofModel": _dbof,
            "TransformerEncoderModel": _transformer,
            "AttentionNetVLADModel": _attn_netvlad,
        }
        for name in FAST_LF_MODELS:
            reg[name] = (lambda n: (lambda: _lf(n)))(name)
        _REGISTRY = reg
    return _REGISTRY


def fast_path_models() -> Tuple[str, ...]:
    """Model names with a fused inference path (for error messages)."""
    return tuple(_factories())


def get_fast_path(model_name: str) -> Optional[FastPath]:
    """The (prepare, build, supports_int8) triple, or None if the model
    has no fused path."""
    factory = _factories().get(model_name)
    return factory() if factory is not None else None
