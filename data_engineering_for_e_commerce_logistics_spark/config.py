"""YAML config with ${ENV} substitution — SURVEY §2.10 O6.

Reference: src/utils/config.py:33-99 — a singleton loading
config/config.yaml, substituting ``${ENV_VAR}`` references, and
exposing dot-path lookups (config.get("api.fake_store.timeout")).
Same surface here, plus a bridge into spark.conf for spark.* keys.
"""

from __future__ import annotations

import os
import re
from typing import Any

try:
    import yaml  # noqa: F401
    _HAVE_YAML = True
except Exception:  # pragma: no cover - yaml is stdlib-adjacent but guard anyway
    _HAVE_YAML = False

_ENV_PATTERN = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")


def _substitute_env(value: Any) -> Any:
    if isinstance(value, str):
        def repl(m: re.Match) -> str:
            return os.environ.get(m.group(1), m.group(2) or "")

        return _ENV_PATTERN.sub(repl, value)
    if isinstance(value, dict):
        return {k: _substitute_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [_substitute_env(v) for v in value]
    return value


class Config:
    """Dot-path config over a nested dict (ref config.py:74-99)."""

    def __init__(self, data: dict | None = None):
        self._data = _substitute_env(data or {})

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        if not _HAVE_YAML:
            raise RuntimeError("pyyaml not available")
        import yaml

        with open(path) as f:
            return cls(yaml.safe_load(f) or {})

    def get(self, dot_path: str, default: Any = None) -> Any:
        node: Any = self._data
        for part in dot_path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def apply_spark_conf(self, spark) -> None:
        """Push every spark.* key into the live session conf."""
        def walk(prefix: str, node: Any) -> None:
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(f"{prefix}.{k}" if prefix else k, v)
            elif prefix.startswith("spark."):
                spark.conf.set(prefix, str(node))

        walk("", self._data)


_singleton: Config | None = None


def get_config(path: str | None = None) -> Config:
    """Process-wide singleton (ref config.py:33-45); reset by passing a
    new path."""
    global _singleton
    if _singleton is None or path is not None:
        if path and os.path.exists(path):
            _singleton = Config.from_yaml(path)
        else:
            _singleton = Config({})
    return _singleton
