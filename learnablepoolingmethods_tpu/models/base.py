"""Model-zoo contract and string-name registry.

The reference's only stable runtime↔model contract (SURVEY.md §1) is

    create_model(model_input, vocab_size, num_frames, **params)
        -> {"predictions": [B, V], ...}

with models looked up **by class name string** from the ``--model`` flag
(ref: train.py#find_class_by_name → getattr(frame_level_models, FLAGS.model)).

The rebuild preserves both: every zoo model is a flax module registered here
under its reference-compatible class name, and :func:`create_model` returns a
bound apply-able with the same dict output.  Configs are frozen dataclasses
(jit-static) instead of global flags.
"""

from __future__ import annotations

from typing import Dict, Type

import flax.linen as nn

from learnablepoolingmethods_tpu.config import ModelConfig

# name -> flax Module class
_MODEL_REGISTRY: Dict[str, Type[nn.Module]] = {}


def register_model(cls=None, *, name: str = None):
    """Class decorator: register a zoo model under its (reference) class name."""

    def wrap(c):
        _MODEL_REGISTRY[name or c.__name__] = c
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def find_class_by_name(name: str) -> Type[nn.Module]:
    """Flag-string model lookup (ref: train.py#find_class_by_name)."""
    try:
        return _MODEL_REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"Unknown model {name!r}. Registered models: {sorted(_MODEL_REGISTRY)}"
        ) from None


def list_models():
    return sorted(_MODEL_REGISTRY)


def create_model(name: str, cfg: ModelConfig) -> nn.Module:
    """Instantiate a registered model with a frozen config."""
    return find_class_by_name(name)(cfg=cfg)


class BaseModel(nn.Module):
    """Abstract zoo model (ref: models.py#BaseModel).

    Subclasses implement ``__call__(model_input, num_frames=None,
    training=False) -> dict`` with at least a ``"predictions"`` key holding
    post-activation class probabilities ``[batch, vocab_size]``.
    """

    cfg: ModelConfig

    def __call__(self, model_input, num_frames=None, training: bool = False):
        raise NotImplementedError()
