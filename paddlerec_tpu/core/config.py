"""Config system: YAML + dot-key flattening + CLI overrides.

Behavioral parity with the reference config loader
(`tools/utils/envs.py:29-129,270-298` and `tools/utils/utils_single.py:57-136`):

  * a single YAML file per run with ``runner.*`` and ``hyper_parameters.*``
    sections, flattened to dot-separated keys so configs written for the
    reference work unchanged;
  * ``{workspace}`` substitution in path values (reference
    `envs.py workspace_adapter`);
  * ``-o key=value`` CLI overrides with type coercion (reference
    `tools/trainer.py:55-65`).

The flattened dict is wrapped in :class:`Config`, which offers ``get`` with
defaults and attribute-style access to common groups.
"""

from __future__ import annotations

import ast
import copy
import os
from typing import Any, Dict, List, Optional

import yaml


def _flatten(d: Any, prefix: str, out: Dict[str, Any]) -> None:
    if isinstance(d, dict):
        for k, v in d.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            if isinstance(v, dict):
                _flatten(v, key, out)
            else:
                out[key] = v
    else:
        out[prefix] = d


def flatten_config(nested: Dict[str, Any]) -> Dict[str, Any]:
    """Flatten a nested dict to dot-keys (``runner.train_batch_size``)."""
    out: Dict[str, Any] = {}
    _flatten(nested, "", out)
    return out


def substitute_workspace(flat: Dict[str, Any]) -> Dict[str, Any]:
    """Replace ``{workspace}`` in string values with the workspace path.

    The workspace defaults to the directory containing the config file
    (stored under key ``config_dir``) or an explicit ``workspace`` key.
    """
    ws = flat.get("workspace", flat.get("config_dir", "."))
    out = {}
    for k, v in flat.items():
        if isinstance(v, str) and "{workspace}" in v:
            v = v.replace("{workspace}", str(ws))
        out[k] = v
    return out


def coerce_value(value: str) -> Any:
    """Parse a CLI override string into a typed Python value."""
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        lowered = value.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        return value


def parse_overrides(pairs: Optional[List[str]]) -> Dict[str, Any]:
    """Parse ``-o key=value`` pairs (type-coerced, like trainer.py:55-65)."""
    out: Dict[str, Any] = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise ValueError(f"override must be key=value, got {pair!r}")
        key, value = pair.split("=", 1)
        out[key.strip()] = coerce_value(value.strip())
    return out


class Config:
    """Flattened dot-key config with typed access helpers."""

    def __init__(self, flat: Dict[str, Any]):
        self._flat = dict(flat)

    # -- dict-like ---------------------------------------------------------
    def get(self, key: str, default: Any = None) -> Any:
        return self._flat.get(key, default)

    def __getitem__(self, key: str) -> Any:
        return self._flat[key]

    def __setitem__(self, key: str, value: Any) -> None:
        self._flat[key] = value

    def __contains__(self, key: str) -> bool:
        return key in self._flat

    def keys(self):
        return self._flat.keys()

    def items(self):
        return self._flat.items()

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._flat)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self._flat))

    def update(self, other: Dict[str, Any]) -> None:
        self._flat.update(other)

    # -- convenience -------------------------------------------------------
    def hyper(self, name: str, default: Any = None) -> Any:
        return self.get(f"hyper_parameters.{name}", default)

    def runner(self, name: str, default: Any = None) -> Any:
        return self.get(f"runner.{name}", default)

    def pretty(self) -> str:
        """Pretty-print the env table (reference envs.py:182-218 analog)."""
        width = max((len(k) for k in self._flat), default=10)
        lines = ["{:<{w}}  {}".format("key", "value", w=width)]
        for k in sorted(self._flat):
            lines.append("{:<{w}}  {}".format(k, self._flat[k], w=width))
        return "\n".join(lines)

    def __repr__(self) -> str:
        return f"Config({len(self._flat)} keys)"


def load_config(path: str, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a YAML config file into a flattened :class:`Config`.

    ``config_dir`` is injected so relative data paths resolve against the
    config file's directory, mirroring the reference convention where
    ``train_data_dir`` is relative to the model dir.
    """
    path = os.path.abspath(path)
    with open(path, "r") as f:
        nested = yaml.safe_load(f) or {}
    flat = flatten_config(nested)
    flat["config_dir"] = os.path.dirname(path)
    flat["config_path"] = path
    flat = substitute_workspace(flat)
    if overrides:
        flat.update(overrides)
    return Config(flat)


def resolve_path(cfg: Config, key: str, default: Optional[str] = None) -> Optional[str]:
    """Resolve a possibly-relative path value against the config dir."""
    value = cfg.get(key, default)
    if value is None:
        return None
    if os.path.isabs(value):
        return value
    return os.path.normpath(os.path.join(cfg.get("config_dir", "."), value))
