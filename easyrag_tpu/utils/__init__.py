"""Utilities: config IO, event hooks, structured logging, profiling."""

from typing import Any, Dict

import yaml


def get_yaml_data(path: str) -> Dict[str, Any]:
    """YAML -> dict (``src/easyrag/utils/__init__.py:4-9``)."""
    with open(path, "r", encoding="utf-8") as f:
        return yaml.full_load(f)
