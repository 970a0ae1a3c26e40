"""Model registry.

Preserves the reference's config-driven contract: a model is selected purely
by ``model_config["architecture"]`` (`/root/reference/main.py:251-259`), is
constructed from the ``model_config`` dict, and its forward returns
``(last_hidden, logits)``.  Unlike the reference's ``import_module`` +
``getattr(module, "Model")`` pattern, registration here is explicit — no
dynamic imports, and typos fail with the list of valid names.

Architecture names accepted (reference config values in parentheses):
  * ``AASIST``            (AASIST.conf, AASIST-L.conf, AASIST2.conf)
  * ``AASIST2``           (alias: AASIST with the Res2Net encoder forced)
  * ``AASIST_Robust``     (AASIST-Robust.conf)
  * ``RawNet2Spoof``      (RawNet2_baseline.conf)
  * ``RawNetGatSpoofST``  (RawGATST_baseline.conf)
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

_REGISTRY: Dict[str, Callable[[Dict[str, Any]], Any]] = {}


def register(name: str):
    def deco(builder):
        _REGISTRY[name] = builder
        return builder
    return deco


def list_architectures() -> List[str]:
    _ensure_populated()
    return sorted(_REGISTRY)


def build_model(model_config: Dict[str, Any]):
    """Instantiate the architecture named in ``model_config``."""
    _ensure_populated()
    arch = model_config["architecture"]
    try:
        builder = _REGISTRY[arch]
    except KeyError:
        raise KeyError(
            f"unknown architecture {arch!r}; valid: {list_architectures()}")
    return builder(model_config)


_populated = False


def _ensure_populated():
    global _populated
    if _populated:
        return

    from aasist_tpu.models.aasist import AasistModel

    @register("AASIST")
    def _aasist(cfg):
        return AasistModel(cfg)

    @register("AASIST2")
    def _aasist2(cfg):
        cfg = dict(cfg)
        cfg.setdefault("encoder", "res2net")
        return AasistModel(cfg)

    # imports are unconditional: an import bug in a model module must fail
    # loudly here, not silently shrink the zoo (a swallowed ImportError
    # would surface later as a misleading "unknown architecture" KeyError)
    from aasist_tpu.models.aasist_robust import AasistRobustModel
    from aasist_tpu.models.rawnet2 import RawNet2Model
    from aasist_tpu.models.rawgat_st import RawGatStModel

    @register("AASIST_Robust")
    def _robust(cfg):
        return AasistRobustModel(cfg)

    @register("RawNet2Spoof")
    def _rawnet2(cfg):
        return RawNet2Model(cfg)

    @register("RawNetGatSpoofST")
    def _rawgat(cfg):
        return RawGatStModel(cfg)

    # only mark populated once every import + registration succeeded, so a
    # transient import failure does not lock in a partial registry
    _populated = True
