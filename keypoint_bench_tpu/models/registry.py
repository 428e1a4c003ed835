"""String-keyed model registry (replaces the if/elif chain in reference
models/model_interface.py:43-85 with a declarative table)."""
from __future__ import annotations

_REGISTRY: dict[str, object] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_model(name: str):
    if name not in _REGISTRY:
        # import model modules lazily so a single broken model doesn't take
        # down the whole registry
        import importlib
        for mod in ("alike", "alike_s2d", "tiny_s2d", "letnet", "goodpoint",
                    "superpoint", "xfeat", "edgepoint", "keynet", "harris",
                    "disk", "r2d2", "sfd2", "d2net", "lightglue", "orb",
                    "sift"):
            full = f"keypoint_bench_tpu.models.{mod}"
            try:
                importlib.import_module(full)
            except ModuleNotFoundError as e:
                if e.name != full:  # real dependency failure inside the module
                    raise
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def list_models():
    try:
        get_model("__none__")  # force lazy imports
    except KeyError:
        pass
    return sorted(_REGISTRY)
