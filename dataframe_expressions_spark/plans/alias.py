"""Alias registry: capture-time macro expansion.

Re-expresses the reference's alias machinery (reference: ``alias.py`` —
process-global registry of ``(base-pattern, name) → substitution lambda``,
consulted on every attribute access by ``DataFrame.__getattr__``).

Semantics: ``define_alias(base, name, fn)`` registers a macro.  When an
attribute ``name`` is accessed on a node whose *path* matches ``base``,
``fn(node)`` is evaluated at capture time and its result substituted — a
pure front-end feature with zero Spark cost (expansion happens before
lowering).

Pattern language (reference-faithful subset):

* ``"."``      — matches any node (the common usage in the reference is on
                 the root).
* ``".jets"``  — matches nodes reached via a ``jets`` attribute access.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

from .nodes import DataFrame

__all__ = ["define_alias", "clear_aliases", "lookup_alias", "registry_version"]

_registry: List[Tuple[str, str, Callable[[DataFrame], DataFrame]]] = []
_version = 0


def registry_version() -> int:
    """Monotonic counter; bumps on every mutation so node-level attr caches
    invalidate when the registry changes."""
    return _version


def define_alias(base: str, name: str, func: Callable[[DataFrame], DataFrame]) -> None:
    """Register ``name`` so that ``node.name`` expands to ``func(node)`` for
    nodes matching ``base`` (reference: ``alias.py`` ``define_alias``)."""
    global _version
    _registry.append((base, name, func))
    _version += 1


def clear_aliases() -> None:
    """Reset the registry (the reference's tests reset between runs via an
    autouse fixture; we expose it explicitly)."""
    global _version
    _registry.clear()
    _version += 1


def _node_matches(node: DataFrame, base: str) -> bool:
    if base == ".":
        return True
    want = base.lstrip(".")
    return node.op == "attr" and node.args[1] == want


def lookup_alias(node: DataFrame, name: str) -> Optional[DataFrame]:
    """Return the expansion for ``node.name``, or None.  Later definitions
    win (reference behavior: registry is consulted most-recent-first)."""
    for base, alias_name, func in reversed(_registry):
        if alias_name == name and _node_matches(node, base):
            return func(node)
    return None
