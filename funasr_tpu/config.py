"""Config system: YAML + deep-merge, keeping the reference config shape.

The reference has no config object — a flat kwargs dict produced by merging
CLI overrides over a model dir's ``config.yaml`` (reference
funasr/bin/train.py:40, funasr/download/download_model_from_hub.py:8).  We
keep the same *shape* (``model``/``model_conf``/``encoder``/``encoder_conf``/
... keys) so reference configs load unchanged, and add a tiny typed helper
layer on top.
"""

from __future__ import annotations

import copy
import json
import os
from typing import Any, Dict, Mapping, Optional

import yaml


def deep_update(base: Dict[str, Any], new: Mapping[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``new`` into ``base`` (in place), returning ``base``.

    Same semantics as the reference's ``deep_update`` (funasr/utils/misc.py):
    nested dicts merge; everything else overwrites.
    """
    for k, v in new.items():
        # an EMPTY mapping override replaces (clears) the section, matching
        # the reference (misc.py: only non-empty dicts merge recursively)
        if isinstance(v, Mapping) and v and isinstance(base.get(k), dict):
            deep_update(base[k], v)
        else:
            base[k] = copy.deepcopy(v) if isinstance(v, (dict, list)) else v
    return base


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def load_config(
    model_dir_or_yaml: Optional[str] = None, **overrides: Any
) -> Dict[str, Any]:
    """Resolve a model config.

    ``model_dir_or_yaml`` may be a directory containing ``config.yaml`` (model
    hub layout) or a YAML file path.  ``overrides`` deep-merge on top, the way
    hydra ``++key=value`` overrides do in the reference.
    """
    cfg: Dict[str, Any] = {}
    if model_dir_or_yaml is not None:
        path = model_dir_or_yaml
        if os.path.isdir(path):
            yaml_path = os.path.join(path, "config.yaml")
            if os.path.exists(yaml_path):
                cfg = load_yaml(yaml_path)
            cfg["model_path"] = path
            # configuration.json may carry file_path_metas (cmvn, tokens, ...)
            meta_path = os.path.join(path, "configuration.json")
            if os.path.exists(meta_path):
                with open(meta_path, "r", encoding="utf-8") as f:
                    meta = json.load(f)
                for key, rel in (meta.get("file_path_metas") or {}).items():
                    if isinstance(rel, str):
                        cfg[key] = os.path.join(path, rel)
        elif os.path.isfile(path):
            cfg = load_yaml(path)
        else:
            raise FileNotFoundError(f"no such config: {path}")
    deep_update(cfg, overrides)
    return cfg


def component_conf(cfg: Mapping[str, Any], key: str) -> Dict[str, Any]:
    """Return the ``<key>_conf`` dict for a component key (may be empty)."""
    conf = cfg.get(f"{key}_conf") or {}
    return dict(conf)
