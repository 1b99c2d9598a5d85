"""``@user_func``: captured Python functions as deferred UDF call sites.

Reference: ``utils.py`` — the decorated function is never called at capture
time; call sites become placeholder nodes (reference ``asts.py``
``ast_FunctionPlaceholder``) with rendered arguments, and the backend
decides how to execute it.  Type comes from Python annotations.

Spark-first execution choice: the backend is an Arrow-vectorized
``pandas_udf`` (batch transfer, ~10-100× faster than row-at-a-time Python
UDFs), built lazily on first lowering and cached on the wrapper.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, get_type_hints

from pyspark.sql import types as T

from ..plans.nodes import DataFrame, Node

__all__ = ["user_func", "CapturedFunction"]

_PY_TO_SPARK = {
    float: T.DoubleType(),
    int: T.LongType(),
    str: T.StringType(),
    bool: T.BooleanType(),
}


class CapturedFunction:
    """Wrapper for a ``@user_func`` function (reference: utils.py).

    Calling it with capture nodes produces a deferred ``udf`` node; calling
    it with plain Python values executes the original function directly
    (handy for unit-testing the function itself).
    """

    def __init__(self, fn: Callable[..., Any]) -> None:
        functools.update_wrapper(self, fn)
        self.fn = fn
        self._spark_udf = None
        hints = get_type_hints(fn)
        self.return_type = _PY_TO_SPARK.get(hints.get("return"), T.DoubleType())

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        if any(isinstance(a, Node) for a in args):
            return DataFrame("udf", self, args)
        return self.fn(*args, **kwargs)

    def spark_udf(self):
        """Build (once) the vectorized pandas UDF executing ``fn``
        element-wise over Arrow batches."""
        if self._spark_udf is None:
            import inspect

            from pyspark.sql.functions import pandas_udf
            import pandas as pd

            fn = self.fn

            def batch(*series):
                # Vectorized when fn is numpy-compatible; falls back to map.
                try:
                    out = fn(*series)
                    if not isinstance(out, pd.Series):
                        raise TypeError
                    return out
                except Exception:
                    return pd.Series([fn(*vals) for vals in zip(*series)])

            # pandas_udf infers arity from type hints; build a fixed-arity
            # wrapper matching fn's signature.
            nargs = len(inspect.signature(fn).parameters)
            params = ", ".join(f"s{i}" for i in range(nargs))
            ns: dict = {"batch": batch, "pd": pd}
            exec(
                f"def wrapper({params}) -> 'pd.Series':\n"
                f"    return batch({params})\n"
                f"for _p in wrapper.__annotations__: pass\n",
                ns,
            )
            wrapper = ns["wrapper"]
            wrapper.__annotations__ = {
                **{f"s{i}": pd.Series for i in range(nargs)},
                "return": pd.Series,
            }
            self._spark_udf = pandas_udf(wrapper, returnType=self.return_type)
        return self._spark_udf


def user_func(fn: Callable[..., Any]) -> CapturedFunction:
    """Decorator: capture ``fn`` for deferred, vectorized execution
    (reference: utils.py ``user_func``)."""
    return CapturedFunction(fn)
