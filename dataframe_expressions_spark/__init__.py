"""dataframe_expressions_spark — a PySpark-native engine with the
expression-capture capabilities of ``gordonwatts/dataframe_expressions``.

Public surface (mirrors the reference's ``__init__``: DataFrame, Column,
define_alias, user_func, render — reference: dataframe_expressions/__init__.py):

* ``DataFrame`` / ``Column`` — lazy capture nodes (plans/nodes.py)
* ``define_alias`` — capture-time macros (plans/alias.py)
* ``user_func`` — deferred Python functions → vectorized pandas UDFs
* ``Lowerer`` / ``to_spark`` / ``select`` — the render pass, targeting
  Catalyst instead of a Python ``ast`` (plans/lowering.py)
"""

from .plans.nodes import Column, DataFrame
from .plans.alias import clear_aliases, define_alias
from .plans.lowering import (Lowerer, LoweringError, render,
                             render_callable, select, select_from,
                             to_spark, unpersist_points)
from .functions.user import user_func

__all__ = [
    "Column",
    "DataFrame",
    "Lowerer",
    "LoweringError",
    "clear_aliases",
    "define_alias",
    "render",
    "render_callable",
    "select",
    "select_from",
    "to_spark",
    "unpersist_points",
    "user_func",
]

__version__ = "0.1.0"
