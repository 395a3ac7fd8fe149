"""Config system: 3-document YAML + auto-argparse + CLI override merge.

Parity with the reference config loader
(``models/wide_deep/src/model_utils/config.py:42-129``): a yaml file
holds up to three documents — defaults, per-option help strings, and
per-option choices — from which an argparse parser is generated; CLI
overrides merge onto the yaml defaults.  Access is attribute-style.
"""

from __future__ import annotations

import argparse
import ast
from pathlib import Path

try:
    import yaml
except ImportError:  # pragma: no cover
    yaml = None


class Config:
    """Attribute-style dict (reference ``Config``)."""

    def __init__(self, d: dict):
        for k, v in d.items():
            setattr(self, k, Config(v) if isinstance(v, dict) else v)

    def __repr__(self):
        return "Config(" + ", ".join(f"{k}={v!r}" for k, v in self.__dict__.items()) + ")"

    def to_dict(self) -> dict:
        out = {}
        for k, v in self.__dict__.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out


def parse_yaml(path: str | Path) -> tuple[dict, dict, dict]:
    """Parse a 1-3 document yaml: (defaults, helps, choices)."""
    if yaml is None:
        raise ImportError("pyyaml not available")
    with open(path) as f:
        docs = list(yaml.safe_load_all(f))
    docs = [d or {} for d in docs]
    if len(docs) == 1:
        return docs[0], {}, {}
    if len(docs) == 2:
        return docs[0], docs[1], {}
    if len(docs) == 3:
        return docs[0], docs[1], docs[2]
    raise ValueError("at most 3 yaml documents supported")


def _coerce(value_str: str, default):
    """Parse a CLI string into the type of the default value."""
    if isinstance(default, bool):
        return value_str.lower() in ("1", "true", "yes")
    if isinstance(default, int):
        return int(value_str)
    if isinstance(default, float):
        return float(value_str)
    if isinstance(default, (list, tuple)):
        return ast.literal_eval(value_str)
    return value_str


def parse_cli_to_yaml(defaults: dict, helps: dict, choices: dict, argv=None, description: str = "config"):
    """Generate argparse options from yaml defaults and merge overrides."""
    parser = argparse.ArgumentParser(description=description)
    for key, default in defaults.items():
        parser.add_argument(
            f"--{key}",
            type=str,
            default=None,
            help=str(helps.get(key, "")),
        )
    args, _ = parser.parse_known_args(argv)
    merged = dict(defaults)
    for key, default in defaults.items():
        v = getattr(args, key, None)
        if v is not None:
            v = _coerce(v, default)
            if key in choices and v not in choices[key]:
                raise ValueError(f"{key}={v!r} not in choices {choices[key]}")
            merged[key] = v
    return merged


def get_config(yaml_path: str | Path, argv=None) -> Config:
    """Load defaults from yaml, apply CLI overrides, return Config."""
    defaults, helps, choices = parse_yaml(yaml_path)
    merged = parse_cli_to_yaml(defaults, helps, choices, argv)
    return Config(merged)
