"""Three-group config composition with interpolation.

Re-provides the capability surface of the reference's Hydra/OmegaConf setup
(/root/reference/configs/config.yaml:18-23 defaults list; custom resolvers
registered at utils/utils.py:12-15) without depending on hydra (not in this
image): YAML group files composed as ``dataset x train x paths``, ``${...}``
interpolation (dotted absolute paths, ``${group}`` group values), CLI
overrides ``key.sub=value`` and group swaps ``group=name``, plus the
reference's custom resolvers:

- ``${resolve_default:fallback,${..key}}`` — fallback when empty
- ``${eq:a,b}`` / ``${contains:needle,hay}`` / ``${if_multi:a,b}``

Self-contained: config trees are plain nested dicts.
"""

from __future__ import annotations

import copy
import os
import re
from typing import Any, Dict, List, Optional

import yaml

DEFAULT_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

_INTERP = re.compile(r"\$\{([^${}]+)\}")


class ConfigError(ValueError):
    pass


def _deep_merge(base: Dict, over: Dict) -> Dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _parse_scalar(s: str) -> Any:
    return yaml.safe_load(s) if s != "" else ""


def _set_dotted(cfg: Dict, dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        node = node.setdefault(k, {})
        if not isinstance(node, dict):
            raise ConfigError(f"cannot override through non-dict at {k!r} in {dotted}")
    node[keys[-1]] = value


def _get_dotted(cfg: Dict, dotted: str) -> Any:
    node = cfg
    for k in dotted.split("."):
        if not isinstance(node, dict) or k not in node:
            raise KeyError(dotted)
        node = node[k]
    return node


def load_config(
    overrides: Optional[List[str]] = None,
    config_dir: str = DEFAULT_CONFIG_DIR,
    config_name: str = "config",
) -> Dict:
    """Compose the config tree and resolve interpolations."""
    overrides = list(overrides or [])
    with open(os.path.join(config_dir, config_name + ".yaml")) as f:
        root = yaml.safe_load(f) or {}

    defaults = root.pop("defaults", [])
    groups: Dict[str, str] = {}
    for entry in defaults:
        if entry == "_self_":
            continue
        if isinstance(entry, dict):
            groups.update({str(k): str(v) for k, v in entry.items()})

    # group swaps from CLI: "train=smoke"
    kv_overrides = []
    for ov in overrides:
        if "=" not in ov:
            raise ConfigError(f"override {ov!r} must be key=value")
        k, v = ov.split("=", 1)
        if k in groups and "." not in k:
            groups[k] = v
        else:
            kv_overrides.append((k, v))

    cfg = dict(root)
    for group, choice in groups.items():
        path = os.path.join(config_dir, group, choice + ".yaml")
        if not os.path.exists(path):
            raise ConfigError(f"unknown {group} config {choice!r} ({path})")
        with open(path) as f:
            cfg[group] = yaml.safe_load(f) or {}

    for k, v in kv_overrides:
        _set_dotted(cfg, k, _parse_scalar(v))

    return resolve(cfg)


# --- interpolation ---------------------------------------------------------


def _resolver(name: str, args: List[Any]) -> Any:
    if name == "resolve_default":
        default, value = args
        return default if value in ("", None) else value
    if name == "eq":
        return args[0] == args[1]
    if name == "contains":
        return str(args[0]) in str(args[1])
    if name == "if_multi":
        # reference semantics (utils/utils.py:15): pick arg by multi-clip-ness
        multi, single = args
        return multi
    if name == "oc.env" or name == "env":
        return os.environ.get(str(args[0]), args[1] if len(args) > 1 else "")
    raise ConfigError(f"unknown resolver {name!r}")


def _resolve_expr(expr: str, cfg: Dict, path: List[str], depth: int) -> Any:
    if ":" in expr:
        name, _, rest = expr.partition(":")
        args = [
            _resolve_value(a.strip(), cfg, path, depth + 1)
            for a in _split_args(rest)
        ]
        return _resolver(name.strip(), args)
    key = expr.strip()
    # relative refs: ".." walks up from the interpolation site
    if key.startswith("."):
        up = len(key) - len(key.lstrip("."))
        rel = key.lstrip(".")
        base = path[: len(path) - up]
        key = ".".join(base + [rel]) if rel else ".".join(base)
    try:
        val = _get_dotted(cfg, key)
    except KeyError:
        raise ConfigError(f"interpolation key {key!r} not found")
    if isinstance(val, str) and _INTERP.search(val):
        return _resolve_str(val, cfg, key.split(".")[:-1], depth + 1)
    return val


def _split_args(s: str) -> List[str]:
    out, buf, depth = [], "", 0
    for ch in s:
        if ch == "," and depth == 0:
            out.append(buf)
            buf = ""
        else:
            depth += ch == "{"
            depth -= ch == "}"
            buf += ch
    out.append(buf)
    return out


def _resolve_value(v: str, cfg: Dict, path: List[str], depth: int) -> Any:
    m = _INTERP.fullmatch(v)
    if m:
        return _resolve_expr(m.group(1), cfg, path, depth)
    if _INTERP.search(v):
        return _resolve_str(v, cfg, path, depth)
    return _parse_scalar(v)


def _resolve_str(s: str, cfg: Dict, path: List[str], depth: int) -> Any:
    if depth > 20:
        raise ConfigError(f"interpolation loop at {s!r}")
    m = _INTERP.fullmatch(s)
    if m:  # whole-string interpolation keeps the value's type
        return _resolve_expr(m.group(1), cfg, path, depth)

    def sub(mm):
        return str(_resolve_expr(mm.group(1), cfg, path, depth))

    return _INTERP.sub(sub, s)


def resolve(cfg: Dict) -> Dict:
    """Resolve every ${...} in the tree (multiple passes for chains)."""
    cfg = copy.deepcopy(cfg)

    def walk(node: Any, path: List[str]) -> Any:
        if isinstance(node, dict):
            return {k: walk(v, path + [k]) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, path) for v in node]
        if isinstance(node, str) and _INTERP.search(node):
            return walk(_resolve_str(node, cfg, path[:-1], 0), path)
        return node

    return walk(cfg, [])


def save_config(cfg: Dict, path: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
