"""Expression-capture nodes: the user-facing lazy DSL.

Re-expresses the capture semantics of ``gordonwatts/dataframe_expressions``
(reference: ``DataFrame.py`` — the ``DataFrame``/``Column`` node classes with
``child_expr``/``filter`` links; ``asts.py`` — the ``ast_DataFrame`` /
``ast_Column`` / ``ast_Callable`` leaf wrappers) as a small immutable IR.

Differences from the reference, on purpose (Spark-first design):

* The reference stores fragments of a std-Python ``ast`` tree and leaves all
  meaning to an external backend.  We store a tiny explicit op IR
  (``("attr", parent, name)`` tuples) because our one backend is PySpark and
  the lowering pass (``plans/lowering.py``) maps ops straight onto
  ``pyspark.sql.Column`` trees / higher-order functions.
* Attribute access is memoized per parent node, so ``d.jets`` is the *same*
  node object on every access.  The reference creates fresh nodes and
  recovers sharing later via render-time memoization (reference:
  ``render.py`` — ``render_context._resolved``); object identity at capture
  time gives us the same CSE identity guarantee one step earlier.

Semantics preserved exactly (reference: ``DataFrame.py``):

* every operation returns a NEW immutable node; nothing mutates;
* any attribute name is accepted at capture time (schemaless) except names
  starting with ``_``; resolution errors surface only at lowering;
* comparisons yield boolean ``Column`` nodes; masks combine with ``&``,
  ``|``, ``~`` only — ``and`` / ``or`` / ``not`` raise (truthiness guard,
  reference: ``DataFrame.py`` ``__bool__``);
* ``d[col]`` attaches a filter; callables in ``[]`` are invoked with the
  parent node to produce the mask (reference: ``DataFrame.py``
  ``__getitem__``);
* arbitrary method calls (``.Count()``, ``.map(lambda …)``) are captured
  verbatim, meaning assigned at lowering (reference: ``DataFrame.py``
  ``__getattr__`` + ``__call__``; README ``Count()`` convention);
* numpy ufuncs (``np.sin(d.x)``) are captured via ``__array_ufunc__``
  (NEP-13) instead of eagerly evaluating (reference: ``DataFrame.py``
  numpy-capture block).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

__all__ = ["DataFrame", "Column", "Node"]

_TRUTHINESS_MSG = (
    "A {cls} cannot be used as a python boolean. "
    "Use the operators & (and), | (or), ~ (not) to combine masks."
)


class Node:
    """Base of all capture nodes.

    ``op``   — operation tag (``root``, ``attr``, ``filter``, ``bin``,
               ``cmp``, ``and``/``or``/``not``, ``ufunc``, ``call``,
               ``udf``, ``elemvar``).
    ``args`` — operands; ``Node`` entries are the DAG edges, everything
               else is a literal.
    """

    __slots__ = ("op", "args", "_attr_cache")

    def __init__(self, op: str, *args: Any) -> None:
        object.__setattr__(self, "op", op)
        object.__setattr__(self, "args", tuple(args))
        object.__setattr__(self, "_attr_cache", {})

    def __setattr__(self, name: str, value: Any) -> None:  # immutability
        raise AttributeError(f"{type(self).__name__} nodes are immutable")

    # -- truthiness guard (reference: DataFrame.py __bool__) ------------
    def __bool__(self) -> bool:
        raise TypeError(_TRUTHINESS_MSG.format(cls=type(self).__name__))

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        parts = ", ".join(
            type(a).__name__ if isinstance(a, Node) else repr(a) for a in self.args
        )
        return f"{type(self).__name__}({self.op}: {parts})"


def _as_operand(value: Any) -> Any:
    """Literals pass through; nodes pass through; reject silliness early."""
    if isinstance(value, Node):
        return value
    if isinstance(value, (int, float, str, bool)) or value is None:
        return value
    import datetime

    if isinstance(value, (datetime.date, datetime.datetime)):
        return value
    raise TypeError(f"Unsupported operand type in expression: {type(value)!r}")


class Column(Node):
    """A boolean mask expression (reference: ``DataFrame.py`` ``Column``,
    always ``type=bool`` in practice).  Not attribute-traversable."""

    __slots__ = ()

    # -- mask combinators (reference: DataFrame.py __and__/__or__/__invert__)
    def __and__(self, other: "Column") -> "Column":
        return Column("and", self, _as_operand(other))

    def __rand__(self, other: "Column") -> "Column":
        return Column("and", _as_operand(other), self)

    def __or__(self, other: "Column") -> "Column":
        return Column("or", self, _as_operand(other))

    def __ror__(self, other: "Column") -> "Column":
        return Column("or", _as_operand(other), self)

    def __invert__(self) -> "Column":
        return Column("not", self)


def _cmp(op: str):
    def method(self: "DataFrame", other: Any) -> Column:
        return Column("cmp", op, self, _as_operand(other))

    return method


def _bin(op: str, reverse: bool = False):
    def method(self: "DataFrame", other: Any) -> "DataFrame":
        other = _as_operand(other)
        if reverse:
            return DataFrame("bin", op, other, self)
        return DataFrame("bin", op, self, other)

    return method


class DataFrame(Node):
    """The core lazy node (reference: ``DataFrame.py`` ``DataFrame``).

    Represents the event stream, a nested collection, a per-event scalar or
    a per-element scalar — depth is implicit, resolved at lowering against
    the real Spark schema (the reference resolved it in the backend).
    """

    __slots__ = ()

    def __init__(self, op: str = "root", *args: Any) -> None:
        super().__init__(op, *args)

    # -- attribute projection (reference: DataFrame.py __getattr__) -----
    def __getattr__(self, name: str) -> "DataFrame":
        # underscore names are Python machinery, not data columns —
        # EXCEPT the change feed's `_commit_version` stamp (round 13:
        # the .changes() verb makes the feed a first-class DSL frame,
        # and incremental pipelines filter on the consumer cursor)
        if name.startswith("_") and name != "_commit_version":
            raise AttributeError(name)
        from . import alias  # late import: avoid cycle

        cache_key = (name, alias.registry_version())
        cached = self._attr_cache.get(cache_key)
        if cached is not None:
            return cached
        expansion = alias.lookup_alias(self, name)
        node = expansion if expansion is not None else DataFrame("attr", self, name)
        self._attr_cache[cache_key] = node
        return node

    # -- filter (reference: DataFrame.py __getitem__) --------------------
    def __getitem__(self, mask: Any) -> "DataFrame":
        if callable(mask) and not isinstance(mask, Node):
            mask = mask(self)  # reference invokes callables with the parent
        if isinstance(mask, DataFrame):
            # a bare DataFrame used as mask (e.g. d[d.flag]) — treat as bool
            mask = Column("cmp", "==", mask, True)
        if not isinstance(mask, Column):
            raise TypeError(
                f"DataFrame[...] expects a boolean Column or callable, got {type(mask)!r}"
            )
        return DataFrame("filter", self, mask)

    # -- method-call capture (reference: DataFrame.py __call__) ----------
    def __call__(self, *args: Any, **kwargs: Any) -> "DataFrame":
        if self.op != "attr":
            raise TypeError("Only captured method attributes are callable")
        parent, name = self.args
        return DataFrame("call", parent, name, args, tuple(kwargs.items()))

    # -- comparisons → Column[bool] (reference: DataFrame.py rich cmps) --
    __lt__ = _cmp("<")
    __le__ = _cmp("<=")
    __gt__ = _cmp(">")
    __ge__ = _cmp(">=")
    __eq__ = _cmp("==")  # type: ignore[assignment]
    __ne__ = _cmp("!=")  # type: ignore[assignment]
    __hash__ = object.__hash__  # __eq__ override would otherwise kill hashing

    # -- arithmetic (reference: DataFrame.py BinOp capture) --------------
    __add__ = _bin("+")
    __radd__ = _bin("+", reverse=True)
    __sub__ = _bin("-")
    __rsub__ = _bin("-", reverse=True)
    __mul__ = _bin("*")
    __rmul__ = _bin("*", reverse=True)
    __truediv__ = _bin("/")
    __rtruediv__ = _bin("/", reverse=True)
    __pow__ = _bin("**")
    __rpow__ = _bin("**", reverse=True)
    __mod__ = _bin("%")
    __rmod__ = _bin("%", reverse=True)

    def __neg__(self) -> "DataFrame":
        return DataFrame("bin", "*", self, -1)

    def __abs__(self) -> "DataFrame":
        return DataFrame("ufunc", "abs", self)

    # -- numpy ufunc capture, NEP-13 (reference: DataFrame.py numpy hook)
    def __array_ufunc__(self, ufunc: Any, method: str, *inputs: Any, **kwargs: Any):
        if method != "__call__" or kwargs.get("out") is not None:
            return NotImplemented
        return DataFrame("ufunc", ufunc.__name__, *[_as_operand(i) for i in inputs])
