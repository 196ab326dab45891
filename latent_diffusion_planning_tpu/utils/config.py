"""Self-contained configuration system (no hydra/omegaconf dependency).

Capability parity with the reference's hydra usage (reference: train_bc.py:243-258,
eval_bc.py:264-396) but deliberately simpler and versionable:

- YAML config files with a ``defaults:`` mapping that composes config *groups*
  (``agent/``, ``data/``, ``model/``) into the top-level config.
- ``${a.b.c}`` interpolation and ``${eval:'<python arithmetic>'}`` resolvers
  (parity with the reference's custom ``eval`` resolver, train_bc.py:242).
- Dotted CLI overrides ``a.b=3``, group swaps ``agent=ldp_agent``, additions
  ``+a.b=3``.
- ``_target_``-based instantiation of classes/functions (hydra-style), resolved
  by plain importlib.

Unlike the reference's fragile saved-config "surgery" (eval_bc.py:269-392), a
resolved config is a plain JSON-serializable dict that is checkpointed verbatim
and can be reloaded with no schema reconciliation.
"""

from __future__ import annotations

import ast
import copy
import importlib
import json
import re
from pathlib import Path
from typing import Any, Callable

import yaml

CONFIG_ROOT = Path(__file__).resolve().parent.parent / "configs"

_INTERP_RE = re.compile(r"\$\{([^{}]+)\}")


class ConfigError(Exception):
    pass


class Config(dict):
    """Dict with attribute access and dotted-path get/set."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    # -- dotted path helpers ------------------------------------------------
    def get_path(self, path: str, default: Any = ...) -> Any:
        node: Any = self
        for part in path.split("."):
            if isinstance(node, dict) and part in node:
                node = node[part]
            elif isinstance(node, (list, tuple)) and part.lstrip("-").isdigit():
                node = node[int(part)]
            else:
                if default is ...:
                    raise ConfigError(f"config has no key {path!r} (missing {part!r})")
                return default
        return node

    def set_path(self, path: str, value: Any, allow_new: bool = True) -> None:
        parts = path.split(".")
        node: Any = self
        for part in parts[:-1]:
            if isinstance(node, dict):
                if part not in node:
                    if not allow_new:
                        raise ConfigError(f"unknown config key {path!r}")
                    node[part] = Config()
                node = node[part]
            elif isinstance(node, list) and part.lstrip("-").isdigit():
                node = node[int(part)]
            else:
                raise ConfigError(f"cannot descend into {part!r} of {path!r}")
        last = parts[-1]
        if isinstance(node, list) and last.lstrip("-").isdigit():
            node[int(last)] = value
        else:
            if not allow_new and not (isinstance(node, dict) and last in node):
                raise ConfigError(f"unknown config key {path!r}")
            node[last] = value

    def to_dict(self) -> dict:
        return _plainify(self)

    def copy(self) -> "Config":  # type: ignore[override]
        return _configify(copy.deepcopy(_plainify(self)))


def _configify(obj: Any) -> Any:
    if isinstance(obj, dict):
        return Config({k: _configify(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_configify(v) for v in obj]
    return obj


def _plainify(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _plainify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plainify(v) for v in obj]
    return obj


def _parse_value(text: str) -> Any:
    """Parse an override value with YAML semantics ('null'→None, '1e-4'→float)."""
    try:
        val = yaml.safe_load(text)
    except yaml.YAMLError:
        return text
    if isinstance(val, str):
        # YAML 1.1 misses exponent floats without a dot ('1e-5'); fix that.
        try:
            return int(val)
        except ValueError:
            pass
        try:
            return float(val)
        except ValueError:
            pass
    return val


# ---------------------------------------------------------------------------
# Loading + composition
# ---------------------------------------------------------------------------

def _read_yaml(path: Path) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    if not isinstance(raw, dict):
        raise ConfigError(f"{path} must contain a mapping at top level")
    return _configify(raw)


# groups whose yaml library lives under another group's directory: the
# reference's `mixed_data` group selects from the same per-task data configs
# as `data` (train_mixed_bc_rm_lift.yaml defaults data + mixed_data both to
# data/cfg entries)
GROUP_DIR_ALIASES = {"mixed_data": "data"}


def _group_file(group: str, name: str, root: Path) -> Path:
    gdir = GROUP_DIR_ALIASES.get(group, group)
    p = root / gdir / f"{name}.yaml"
    if not p.exists():
        avail = sorted(x.relative_to(root / gdir).with_suffix("").as_posix()
                       for x in (root / gdir).rglob("*.yaml")) if (root / gdir).exists() else []
        raise ConfigError(f"no config {gdir}/{name}.yaml under {root} (available: {avail})")
    return p


def load_config(
    name: str,
    overrides: list[str] | None = None,
    config_root: str | Path | None = None,
) -> Config:
    """Load ``<root>/<name>.yaml``, compose its defaults groups, apply overrides,
    and resolve interpolations. Returns a fully-resolved plain Config."""
    root = Path(config_root) if config_root is not None else CONFIG_ROOT
    overrides = list(overrides or [])

    if name.endswith((".yaml", ".yml")):
        # direct path to a (typically resolved, run-dir) config — the hydra
        # rerun analogue: `train_bc.py --config experiments/<run>/config.yaml
        # resume=true` relaunches a past experiment verbatim + overrides
        top_path = Path(name)
    else:
        top_path = root / f"{name}.yaml"
    if not top_path.exists():
        raise ConfigError(f"no such config: {top_path}")
    cfg = _read_yaml(top_path)

    defaults: dict[str, str | None] = dict(cfg.pop("defaults", {}) or {})

    # split overrides into group swaps vs value overrides
    value_overrides: list[tuple[str, Any, bool]] = []
    for ov in overrides:
        if "=" not in ov:
            raise ConfigError(f"override {ov!r} must be key=value")
        key, _, val = ov.partition("=")
        additive = key.startswith("+")
        key = key.lstrip("+")
        if key in defaults and "." not in key:
            defaults[key] = val
        else:
            value_overrides.append((key, _parse_value(val), additive))

    # compose groups
    for group, chosen in defaults.items():
        if chosen is None:
            continue
        sub = _read_yaml(_group_file(group, str(chosen), root))
        sub.pop("defaults", None)
        existing = cfg.get(group)
        if isinstance(existing, dict):
            sub = _merge(sub, existing)  # inline keys win over group file
        cfg[group] = sub
        cfg.setdefault("_groups_", Config())[group] = str(chosen)

    # value overrides (after composition so they can reach into groups)
    for key, val, additive in value_overrides:
        cfg.set_path(key, _configify(val), allow_new=True)

    resolve(cfg)
    return cfg


def _merge(base: Config, override: dict) -> Config:
    out = Config(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def merge(base: dict, override: dict) -> Config:
    """Recursive merge; override wins."""
    return _merge(_configify(copy.deepcopy(_plainify(base))), _configify(override))


# ---------------------------------------------------------------------------
# Interpolation resolution
# ---------------------------------------------------------------------------

_MAX_PASSES = 20


def resolve(cfg: Config) -> Config:
    """Resolve ``${...}`` interpolations in-place (iterates to fixpoint)."""
    for _ in range(_MAX_PASSES):
        changed = _resolve_node(cfg, cfg)
        if not changed:
            return cfg
    raise ConfigError("interpolation did not converge (circular reference?)")


def _resolve_node(node: Any, top: Config) -> bool:
    changed = False
    if isinstance(node, dict):
        for k, v in list(node.items()):
            if isinstance(v, str) and _INTERP_RE.search(v):
                new = _resolve_str(v, top)
                if new is not v:
                    node[k] = new
                    changed = True
            else:
                changed |= _resolve_node(v, top)
    elif isinstance(node, list):
        for i, v in enumerate(node):
            if isinstance(v, str) and _INTERP_RE.search(v):
                new = _resolve_str(v, top)
                if new is not v:
                    node[i] = new
                    changed = True
            else:
                changed |= _resolve_node(v, top)
    return changed


def _resolve_str(text: str, top: Config) -> Any:
    m = _INTERP_RE.fullmatch(text.strip())
    if m:  # whole-string interpolation: preserve value type
        return _resolve_expr(m.group(1), top, text)
    # embedded interpolation: substitute as string
    def sub(match: re.Match) -> str:
        val = _resolve_expr(match.group(1), top, text)
        if isinstance(val, str) and _INTERP_RE.search(val):
            raise _Unresolved()
        return str(val)
    try:
        return _INTERP_RE.sub(sub, text)
    except _Unresolved:
        return text


class _Unresolved(Exception):
    pass


_EVAL_ALLOWED = (ast.Expression, ast.BinOp, ast.UnaryOp, ast.Constant,
                 ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod,
                 ast.Pow, ast.USub, ast.UAdd, ast.IfExp, ast.Compare, ast.Eq,
                 ast.NotEq, ast.Lt, ast.LtE, ast.Gt, ast.GtE, ast.BoolOp,
                 ast.And, ast.Or, ast.Not, ast.Call, ast.Name, ast.Load)
_EVAL_FNS: dict[str, Callable] = {"min": min, "max": max, "int": int,
                                  "float": float, "round": round, "abs": abs,
                                  "len": len}


def _safe_eval(expr: str) -> Any:
    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if not isinstance(node, _EVAL_ALLOWED):
            raise ConfigError(f"disallowed construct {type(node).__name__} in eval:{expr!r}")
        if isinstance(node, ast.Name) and node.id not in _EVAL_FNS:
            raise ConfigError(f"unknown name {node.id!r} in eval:{expr!r}")
        if isinstance(node, ast.Call) and not (
                isinstance(node.func, ast.Name) and node.func.id in _EVAL_FNS):
            raise ConfigError(f"disallowed call in eval:{expr!r}")
    return eval(compile(tree, "<cfg-eval>", "eval"), {"__builtins__": {}}, _EVAL_FNS)


def _resolve_expr(expr: str, top: Config, original: str) -> Any:
    expr = expr.strip()
    if expr.startswith("eval:"):
        body = expr[len("eval:"):].strip()
        if (body.startswith("'") and body.endswith("'")) or (
                body.startswith('"') and body.endswith('"')):
            body = body[1:-1]
        if _INTERP_RE.search(body):
            return original  # inner interpolations not yet resolved
        return _safe_eval(body)
    val = top.get_path(expr, default=...)
    if isinstance(val, str) and _INTERP_RE.search(val):
        return original  # target not yet resolved; try next pass
    return copy.deepcopy(val)


# ---------------------------------------------------------------------------
# Instantiation
# ---------------------------------------------------------------------------

def locate(path: str) -> Any:
    """Import ``module.sub.Attr`` and return the attribute."""
    parts = path.split(".")
    for i in range(len(parts) - 1, 0, -1):
        try:
            mod = importlib.import_module(".".join(parts[:i]))
        except ImportError:
            continue
        obj = mod
        try:
            for attr in parts[i:]:
                obj = getattr(obj, attr)
        except AttributeError:
            continue
        return obj
    raise ConfigError(f"cannot locate {path!r}")


def instantiate(cfg: Any, /, *args: Any, **kwargs: Any) -> Any:
    """Instantiate a ``_target_``-bearing config node (recursively).

    ``_partial_: true`` returns ``functools.partial`` instead of calling.
    ``_defer_: true`` leaves the node as a plain config dict (with
    ``_target_`` kept, ``_defer_`` dropped) for the callee to instantiate
    later with extra kwargs — used by agent configs whose network sub-configs
    need runtime dims (input_dim etc.). Extra kwargs override config values.
    """
    import functools

    if isinstance(cfg, (list, tuple)):
        return type(cfg)(instantiate(v) for v in cfg)
    if not isinstance(cfg, dict):
        return cfg
    if "_target_" not in cfg:
        return Config({k: instantiate(v) for k, v in cfg.items()})

    node = dict(cfg)
    if node.pop("_defer_", False) and not kwargs:
        return Config(node)
    target = locate(node.pop("_target_"))
    partial = bool(node.pop("_partial_", False))
    node.pop("_groups_", None)
    call_kwargs = {k: instantiate(v) for k, v in node.items()}
    call_kwargs.update(kwargs)
    if partial:
        return functools.partial(target, *args, **call_kwargs)
    return target(*args, **call_kwargs)


def save_config(cfg: Config, path: str | Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, sort_keys=False)


def config_from_json(text: str) -> Config:
    return _configify(json.loads(text))


def config_to_json(cfg: Config) -> str:
    return json.dumps(cfg.to_dict())


def parse_cli(argv: list[str]) -> tuple[str | None, list[str]]:
    """Split argv into (config-name override, overrides list).

    ``--config NAME`` / ``-c NAME`` selects the top-level config; everything
    else must be ``key=value`` overrides.
    """
    name = None
    overrides: list[str] = []
    it = iter(argv)
    for tok in it:
        if tok in ("--config", "-c"):
            name = next(it)
        elif "=" in tok:
            overrides.append(tok)
        else:
            raise ConfigError(f"unrecognized argument {tok!r}")
    return name, overrides
