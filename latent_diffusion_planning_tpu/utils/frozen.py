"""Hashable frozen mapping for static (non-pytree) agent config.

Agents are flax.struct pytrees whose ``config`` field is static metadata; jit
requires static fields to be hashable and comparable. The reference uses
flax.core.FrozenDict (agent/ldp_agent.py:653); here is a minimal immutable,
hashable mapping with attribute access and no pytree registration.
"""

from __future__ import annotations

from typing import Any, Iterator, Mapping


def _freeze(value: Any) -> Any:
    if isinstance(value, Mapping):
        return FrozenConfig(value)
    if isinstance(value, (list, tuple)):
        return tuple(_freeze(v) for v in value)
    if isinstance(value, (set, frozenset)):
        return frozenset(_freeze(v) for v in value)
    return value


class FrozenConfig(Mapping):
    __slots__ = ("_items", "_hash")

    def __init__(self, data: Mapping | None = None, **kwargs: Any):
        merged = dict(data or {})
        merged.update(kwargs)
        object.__setattr__(self, "_items",
                           tuple(sorted((k, _freeze(v)) for k, v in merged.items())))
        object.__setattr__(self, "_hash", None)

    def __getitem__(self, key: str) -> Any:
        for k, v in self._items:
            if k == key:
                return v
        raise KeyError(key)

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __iter__(self) -> Iterator[str]:
        return (k for k, _ in self._items)

    def __len__(self) -> int:
        return len(self._items)

    def __hash__(self) -> int:
        if self._hash is None:
            object.__setattr__(self, "_hash", hash(self._items))
        return self._hash

    def __eq__(self, other: Any) -> bool:
        if isinstance(other, FrozenConfig):
            return self._items == other._items
        if isinstance(other, Mapping):
            return dict(self) == dict(other)
        return NotImplemented

    def __repr__(self) -> str:
        return f"FrozenConfig({dict(self._items)!r})"

    def replace(self, **kwargs: Any) -> "FrozenConfig":
        data = dict(self._items)
        data.update(kwargs)
        return FrozenConfig(data)

    def to_dict(self) -> dict:
        def thaw(v: Any) -> Any:
            if isinstance(v, FrozenConfig):
                return v.to_dict()
            if isinstance(v, tuple):
                return [thaw(x) for x in v]
            return v
        return {k: thaw(v) for k, v in self._items}
