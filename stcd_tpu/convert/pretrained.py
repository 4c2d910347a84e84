"""Pretrained-weight resolution + application.

The reference trains every stage from ImageNet-pretrained encoders
(``encoder_weights="imagenet"`` at ref train_sup.py:303, train_pse_cd.py:426,
train_stcd.py:638; downloaded via ``model_zoo.load_url`` at ref
segmentation_models_pytorch/encoders/__init__.py:85). TPU hosts have no
torch-hub egress, so weights arrive as msgpack checkpoints produced offline
by ``scripts/convert_weights.py`` and are grafted onto the initialized
param pytree here.

Resolution contract (loud — never a silent no-op):
- ``weights=None``            -> random init (the only silent path).
- ``weights=<path>``          -> load that msgpack file; raise if missing.
- ``weights="imagenet"``      -> look for ``{encoder_name}.msgpack`` (or
  ``{encoder_name}_imagenet.msgpack``) under ``$STCD_PRETRAINED_DIR``
  (default ``~/.cache/stcd_tpu/pretrained``); raise FileNotFoundError with
  conversion instructions if absent.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

from stcd_tpu.convert.torch_to_flax import apply_encoder_weights, _merge

_DEFAULT_DIR = os.path.expanduser("~/.cache/stcd_tpu/pretrained")


def pretrained_dir() -> str:
    return os.environ.get("STCD_PRETRAINED_DIR", _DEFAULT_DIR)


def resolve_encoder_weights(weights: Optional[str],
                            encoder_name: Optional[str] = None) -> Optional[str]:
    """Map a ``weights`` argument to a local msgpack path, or raise."""
    if weights is None:
        return None
    if os.path.isfile(weights):
        return weights
    if os.sep in weights or weights.endswith(".msgpack"):
        # Looks like a literal path: never fall back to the pretrained dir
        # (a mistyped/deleted checkpoint path silently becoming stock
        # ImageNet weights is exactly the divergence this contract bans).
        raise FileNotFoundError(
            f"encoder_weights path {weights!r} does not exist. Literal "
            "paths are not searched in $STCD_PRETRAINED_DIR; pass a name "
            "like 'imagenet' for directory resolution.")
    if encoder_name:
        d = pretrained_dir()
        for cand in (os.path.join(d, f"{encoder_name}.msgpack"),
                     os.path.join(d, f"{encoder_name}_{weights}.msgpack")):
            if os.path.isfile(cand):
                return cand
    raise FileNotFoundError(
        f"encoder_weights={weights!r}"
        + (f" for encoder {encoder_name!r}" if encoder_name else "")
        + f" not found (searched the literal path and {pretrained_dir()}). "
        "This host has no network egress; stage the torch .pth and convert "
        "it offline:  python scripts/convert_weights.py "
        f"{encoder_name or '<arch>'} <torch.pth> "
        f"{pretrained_dir()}/{encoder_name or '<arch>'}.msgpack")


def load_payload(path: str) -> dict:
    """Read a converted msgpack checkpoint -> {"params": ..., ["batch_stats"]}."""
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def apply_pretrained(variables: dict, payload: dict,
                     encoder_path: Tuple[str, ...] = ("encoder",)) -> dict:
    """Graft a converted payload into a model's variables.

    Encoder-only payloads (from ``convert_weights.py resnet50`` etc.) are
    grafted at ``encoder_path``; full-model payloads (``segcd_*`` — their
    params already contain an ``encoder`` subtree) are merged at the root.
    """
    p = payload.get("params", payload)
    s = payload.get("batch_stats", {})
    if encoder_path and encoder_path[0] in p:
        # full-model payload: merge at the root
        out = {"params": _merge(variables["params"], p)}
        if "batch_stats" in variables:
            out["batch_stats"] = _merge(variables["batch_stats"], s)
        return out
    return apply_encoder_weights(variables, encoder_path, p, s)


def apply_pretrained_to_state(state, weights: str,
                              encoder_name: Optional[str] = None,
                              encoder_path: Tuple[str, ...] = ("encoder",)):
    """Resolve + load + graft pretrained weights into a TrainState.

    Returns a new state with updated params/batch_stats (optimizer state is
    untouched: grafting happens before training starts, when Adam moments
    are all-zero and shape-compatible)."""
    path = resolve_encoder_weights(weights, encoder_name)
    payload = load_payload(path)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    new_vars = apply_pretrained(variables, payload, encoder_path)
    return state.replace(params=new_vars["params"],
                         batch_stats=new_vars.get("batch_stats",
                                                  state.batch_stats))
