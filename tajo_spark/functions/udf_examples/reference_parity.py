"""Parity Python-UDF set: the function signatures exercised by the
reference's pyudf golden tests (tajo-core-tests/src/test/resources/
pyudf/test_funcs.py, test_funcs2.py, test_udaf.py), re-implemented for
the Arrow-vectorized loader in tajo_spark.functions.python_udf.

Loaded by tools/golden_audit.py so the reference's TestGroupByQuery /
TestSelectQuery python-UDF golden queries resolve; also covered by
tests/test_python_udf.py. countpy() is zero-argument in the reference's
UDAF protocol — Spark grouped-agg pandas UDFs require at least one
column, so it is registered one-argument (count of non-null inputs is
NOT the semantic; use count(*) — the audit marks zero-arg usages).
"""

from __future__ import annotations


def return_one() -> "int4":
    return 1


def helloworld() -> "text":
    return "Hello, World"


def concat_py(s: str) -> str:
    return s + s


def add_py(a: int, b: int) -> "int4":
    if a is None or b is None:
        return None
    return a + b


def str_len(a: str) -> "int4":
    return 0 if a is None else len(a)


def percent(num: float, total: float) -> "float8":
    # SQL decimal literals arrive as decimal.Decimal — coerce both
    return float(num) * 100 / float(total)


def comma_format(num: int) -> "text":
    return "{:,}".format(int(num))


def concat4(w1: str, w2: str, w3: str, w4: str) -> "text":
    return w1 + " " + w2 + " " + w3 + " " + w4


AGGREGATES = {
    "avgpy": ("double", lambda s: s.mean()),
    "countpy": ("bigint", lambda s: int(s.size)),
    "sumpy": ("double", lambda s: s.sum()),
}
