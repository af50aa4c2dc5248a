"""Python UDF / UDAF loading — directory-scan parity with the reference.

The reference loads Python functions from ``tajo.function.python.code-dir``
(TajoConf.java:303) and runs them in an out-of-process worker speaking a
CSV line protocol (tajo-plan/.../function/python/PythonScriptEngine.java:61,
controller script tajo-core/src/main/resources/python/controller.py);
UDAFs implement partial/final phases (PythonAggFunctionInvoke.java).

Here the same developer surface — drop ``.py`` files in a directory —
registers functions through Spark's Arrow-vectorized ``pandas_udf``
machinery instead of a CSV pipe: batches cross the JVM↔Python boundary
as Arrow record batches (~10-100× the row-at-a-time protocol), and
grouped-agg pandas UDFs get partial application per partition group by
Spark's aggregation planner.

UDF module convention (mirrors the reference's decorator-less scanning,
e.g. ``@output_type('int4')`` in Tajo's python examples):

    # my_udfs.py
    def plus_one(x: int) -> int:          # scalar: registered as
        return x + 1                       # vectorized pandas_udf

    AGGREGATES = {"my_avg": ("double", lambda s: s.mean())}
    # (entries in AGGREGATES become grouped-agg pandas UDFs; everything
    # else with a return annotation becomes a scalar UDF)

Type mapping uses Tajo type names or Python annotations
(int→bigint, float→double, str→string, bool→boolean, bytes→binary).
"""

from __future__ import annotations

import importlib.util
import os
from collections.abc import Callable

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

_PY_TO_SPARK = {
    int: "bigint",
    float: "double",
    str: "string",
    bool: "boolean",
    bytes: "binary",
}

# Tajo type names accepted in annotations-as-strings (DataTypes.proto)
_TAJO_TO_SPARK = {
    "int1": "tinyint",
    "int2": "smallint",
    "int4": "int",
    "int8": "bigint",
    "float4": "float",
    "float8": "double",
    "text": "string",
    "bool": "boolean",
    "boolean": "boolean",
    "blob": "binary",
}


_PY_NAMES_TO_SPARK = {t.__name__: s for t, s in _PY_TO_SPARK.items()}


def _spark_type(ann) -> str:
    if ann in _PY_TO_SPARK:
        return _PY_TO_SPARK[ann]
    if isinstance(ann, str):
        # `from __future__ import annotations` stringizes annotations to
        # their SOURCE text: `-> "int4"` arrives as '"int4"' (quotes
        # included) and `-> int` as 'int' — strip quoting, then try the
        # Tajo names, the python builtin names, and finally raw DDL
        a = ann.strip().strip("'\"").lower()
        return _TAJO_TO_SPARK.get(a) or _PY_NAMES_TO_SPARK.get(a) or a
    raise TypeError(f"unsupported UDF type annotation: {ann!r}")


def _vectorize(fn: Callable, ret_type: str):
    """Wrap a scalar python function into a vectorized pandas UDF.
    The row loop runs inside the Arrow batch (C-speed pandas map) —
    the contract stays 'write a plain function', as in the reference."""

    @pandas_udf(ret_type)
    def wrapped(*cols: pd.Series) -> pd.Series:
        # SQL NULL in an int/float column arrives as NaN in the pandas
        # batch; plain functions expect None (the reference's contract),
        # so normalize before calling — otherwise `x is None` guards
        # never fire and NaN leaks into typed results.
        cols = tuple(c.astype(object).where(c.notna(), None) for c in cols)
        if len(cols) == 1:
            return cols[0].map(fn, na_action=None)
        return pd.Series(map(fn, *cols))

    return wrapped


def _n_params(fn: Callable) -> int:
    import inspect

    return len(inspect.signature(fn).parameters)


def load_python_udfs(
    spark: SparkSession, code_dir: str, prefix: str = ""
) -> list[str]:
    """Scan ``code_dir`` for ``.py`` files and register their functions.

    * top-level callables with return annotations → scalar pandas UDFs
    * ``AGGREGATES = {name: (ret_type, series_fn)}`` → grouped-agg
      pandas UDFs (partial aggregation handled by Spark)
    * top-level classes with an ``eval`` method and a ``RETURNS`` schema
      string → Python UDTFs (table functions; superset — the reference
      has no UDTF flavor at all). Usable as
      ``SELECT * FROM my_udtf(col)`` / LATERAL joins::

          class split_words:
              RETURNS = "word string, pos int"
              def eval(self, text):
                  for i, w in enumerate((text or "").split()):
                      yield (w, i)

    Returns registered names. Idempotent per session.
    """
    registered: list[str] = []
    for fname in sorted(os.listdir(code_dir)):
        if not fname.endswith(".py") or fname.startswith("_"):
            continue
        path = os.path.join(code_dir, fname)
        spec = importlib.util.spec_from_file_location(
            f"tajo_udf_{fname[:-3]}", path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        for name in dir(mod):
            if name.startswith("_"):
                continue
            obj = getattr(mod, name)
            if (
                isinstance(obj, type)
                and obj.__module__ == mod.__name__
                and hasattr(obj, "eval")
                and isinstance(getattr(obj, "RETURNS", None), str)
            ):
                from pyspark.sql.functions import udtf

                spark.udtf.register(
                    prefix + name, udtf(obj, returnType=obj.RETURNS)
                )
                registered.append(prefix + name)
                continue
            if callable(obj) and getattr(obj, "__annotations__", {}).get(
                "return"
            ) is not None and obj.__module__ == mod.__name__:
                ret = _spark_type(obj.__annotations__["return"])
                if _n_params(obj) == 0:
                    # zero-arg (constant) functions can't be Arrow UDFs
                    # (no column to batch over) — plain UDF is fine,
                    # it's evaluated once per row with no data transfer
                    spark.udf.register(prefix + name, obj, ret)
                else:
                    spark.udf.register(prefix + name, _vectorize(obj, ret))
                registered.append(prefix + name)

        for agg_name, (ret, series_fn) in getattr(
            mod, "AGGREGATES", {}
        ).items():

            def make(series_fn):
                # Series → scalar hint marks this as a grouped-agg UDF;
                # the declared `ret` string governs the SQL type.
                @pandas_udf(ret)
                def agg(v: pd.Series) -> float:
                    return series_fn(v)

                return agg

            spark.udf.register(prefix + agg_name, make(series_fn))
            registered.append(prefix + agg_name)
            # record for the zero-arg bridge (agg_fallback)
            from tajo_spark.functions.agg_fallback import LOADED_AGGREGATES

            LOADED_AGGREGATES.add(prefix + agg_name)
    return registered
