"""Pipeline configuration loader.

Reference analog: ``src/utils/config_loader.py:13-36`` — a YAML file
loaded once, values fetched by dotted path with a default, plus a
``spark_conf`` section applied to the session builder. Same surface here,
with two additions: JSON is accepted when PyYAML is absent (import-try —
the engine must not hard-depend on yaml), and loading is lazy + cached.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any


def _parse(text: str, suffix: str) -> dict:
    if suffix in (".yaml", ".yml"):
        try:
            import yaml
        except ImportError as e:  # pragma: no cover - yaml ships in this env
            raise RuntimeError(
                "PyYAML is required for .yaml configs; use a .json config "
                "or install pyyaml"
            ) from e
        return yaml.safe_load(text) or {}
    return json.loads(text)


class PipelineConfig:
    """Dotted-path config access: ``cfg.get("quality.temperature_max", 500)``."""

    def __init__(self, path: str):
        self.path = Path(path)
        self._data: dict | None = None

    def load(self) -> dict:
        if self._data is None:
            self._data = _parse(self.path.read_text(), self.path.suffix)
        return self._data

    def get(self, key: str, default: Any = None) -> Any:
        value: Any = self.load()
        for part in key.split("."):
            if isinstance(value, dict) and part in value:
                value = value[part]
            else:
                return default
        return value

    def spark_conf(self) -> dict[str, str]:
        """The ``spark_conf`` section (reference ``get_spark_config``)."""
        return self.get("spark_conf", {}) or {}
