"""Two-tier config system: YAML compose + CLI overrides.

The reference uses Hydra 1.3 + OmegaConf with defaults-list inheritance
(``configs/llava/*.yaml``) and an argparse layer that overrides ~70 fields
(``opadpo_train_custom.py:181-281``).  Neither hydra nor omegaconf is in
the TPU image, so this is a dependency-free reimplementation of the subset
the pipeline needs:

- ``load_config("configs/llava_dpo.yaml")`` — reads YAML, resolves a
  ``defaults:`` list (relative names, later entries win, ``_self_`` marks
  the file's own position);
- dotted-path CLI overrides: ``--training.learning_rate 1e-6`` or
  positional ``key=value`` pairs;
- the composed config re-saves to ``OUTPUT_DIR/config.yaml`` like the
  reference (``opadpo_train.py:574-577``).

Known reference config bugs NOT ported (SURVEY 'known bugs'): the AncPO
override reading ``args.CoPO`` and the ``group_by_length`` inversion.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """dict with attribute access + dotted-path get/set."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return Config(v) if isinstance(v, dict) and not isinstance(v, Config) \
            else v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get_path(self, path: str, default: Any = None) -> Any:
        node: Any = self
        for part in path.split("."):
            if not isinstance(node, dict) or part not in node:
                return default
            node = node[part]
        return node

    def set_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node: Dict = self
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value


def _deep_merge(base: Dict, override: Dict) -> Dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _load_yaml(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def load_config(path: str) -> Config:
    """Load a YAML file, resolving its ``defaults:`` list (Hydra-lite)."""
    raw = _load_yaml(path)
    base_dir = os.path.dirname(os.path.abspath(path))
    defaults: List = raw.pop("defaults", [])
    merged: Dict = {}
    self_seen = False
    for entry in defaults:
        if entry == "_self_":
            merged = _deep_merge(merged, raw)
            self_seen = True
            continue
        if isinstance(entry, dict):
            # config-group entry like {checkpoints: llava-7b-v1.5}
            (group, name), = entry.items()
            group = str(group).replace("override ", "")
            sub = os.path.join(base_dir, group, f"{name}.yaml")
        else:
            sub = os.path.join(base_dir, f"{entry}.yaml")
        merged = _deep_merge(merged, dict(load_config(sub)))
    if not self_seen:
        merged = _deep_merge(merged, raw)
    return Config(merged)


def _parse_value(text: str) -> Any:
    try:
        return yaml.safe_load(text)
    except yaml.YAMLError:
        return text


def apply_overrides(cfg: Config, overrides: List[str]) -> Config:
    """Apply ``key.path=value`` strings (reference override_config role)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, value = ov.split("=", 1)
        cfg.set_path(key.strip().lstrip("-"), _parse_value(value))
    return cfg


def save_config(cfg: Config, output_dir: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "config.yaml"), "w") as f:
        yaml.safe_dump(dict(_plain(cfg)), f, sort_keys=False)


def _plain(node: Any) -> Any:
    if isinstance(node, dict):
        return {k: _plain(v) for k, v in node.items()}
    return node


def env_or(cfg_value: Optional[str], env_key: str,
           default: Optional[str] = None) -> Optional[str]:
    """Env vars carry paths/secrets in the reference (DATA_DIR, IMAGE_DIR,
    OUTPUT_DIR, API_KEY{i} — run/online_generate.sh:66-70)."""
    return cfg_value or os.environ.get(env_key, default)
