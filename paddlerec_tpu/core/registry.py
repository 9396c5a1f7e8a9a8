"""Model registry + loader.

The reference locates model code by ``sys.path`` injection of the config's
directory (`tools/utils/utils_single.py:116-128`). We keep that workflow —
a ``model.py`` next to ``config.yaml`` — but load it safely with importlib,
and additionally keep a registry of built-in models addressable by name
(``rank.deepfm``) so configs can simply say ``runner.model: rank.deepfm``.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
from typing import Any, Dict

_REGISTRY: Dict[str, Any] = {}


def register_model(name: str):
    """Class decorator: register a ModelDef under ``family.name``."""

    def deco(cls):
        _REGISTRY[name] = cls
        cls.registry_name = name
        return cls

    return deco


def get_model_class(name: str):
    """Look up a registered ModelDef class, importing builtins on demand."""
    if name not in _REGISTRY:
        # Built-in models live at paddlerec_tpu.models.<family>.<model>.model
        module_name = f"paddlerec_tpu.models.{name}.model"
        try:
            importlib.import_module(module_name)
        except ModuleNotFoundError as e:
            # Aliases (e.g. rank.logistic_regression → rank.lr) only appear
            # once the owning module registers them; import the whole zoo.
            from paddlerec_tpu import models as _zoo

            _zoo.import_all()
            if name not in _REGISTRY:
                raise KeyError(
                    f"model {name!r} is not registered and {module_name} "
                    f"could not be imported: {e}"
                ) from e
    if name not in _REGISTRY:
        raise KeyError(f"importing {name!r} did not register a model")
    return _REGISTRY[name]


def _load_module_from_path(path: str, module_name: str):
    spec = importlib.util.spec_from_file_location(module_name, path)
    if spec is None or spec.loader is None:
        raise ImportError(f"cannot load module from {path}")
    module = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = module
    spec.loader.exec_module(module)
    return module


def load_model_def(config) -> Any:
    """Instantiate the ModelDef for a config.

    Resolution order:
      1. ``runner.model`` registry name (``rank.deepfm``);
      2. a ``model.py`` file next to the config (defines ``ModelDef``).
    """
    name = config.runner("model")
    if name:
        cls = get_model_class(name)
        return cls(config)
    config_dir = config.get("config_dir", ".")
    model_py = os.path.join(config_dir, "model.py")
    if os.path.exists(model_py):
        mod = _load_module_from_path(model_py, f"user_model_{abs(hash(model_py))}")
        if not hasattr(mod, "ModelDef"):
            raise AttributeError(f"{model_py} must define a ModelDef class")
        return mod.ModelDef(config)
    raise ValueError(
        "config must set runner.model (registry name) or ship a model.py "
        f"next to {config.get('config_path')}"
    )


def list_models():
    """All registered model names (imports the builtin zoo first)."""
    from paddlerec_tpu.models import import_all

    import_all()  # importing the package alone registers nothing
    return sorted(_REGISTRY)
