"""UDF registry — reflective function loading + registration (SURVEY.md §2.8).

Reference parity:
- U1 reflective UDF loading by class name (`Class.forName(...).newInstance()`)
  so jobs load functions from independent jars —
  FlinkIdeaDemo/src/main/java/NCFlinkDataStreamAPIUDF.java:13-25,
  NCFlinkTableAPIScalarFunction.java:13-17.
- U2 `createTemporarySystemFunction(name, cls)` →
  NCFlinkTableAPIScalarFunction.java:17.
- U3 `createTemporaryView` → NCFlinkTableAPITableFunction.java:37.

Python analog: import by dotted path, register with spark.udf.register.
Registered Python UDFs are the slow path (SURVEY guidance) — the registry also
accepts SQL expression strings, which stay JVM-side and are preferred.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def load_callable(dotted_path: str) -> Callable:
    """U1: 'pkg.module:func' or 'pkg.module.func' → callable."""
    if ":" in dotted_path:
        mod_name, attr = dotted_path.split(":", 1)
    else:
        mod_name, _, attr = dotted_path.rpartition(".")
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr)


def register_udf(spark: SparkSession, name: str, fn: Callable | str,
                 return_type: T.DataType | str = "string") -> None:
    """U2: register a temporary system function usable from SQL.

    `fn` may be a callable or a dotted import path (the reference's
    reflective-loading contract).
    """
    if isinstance(fn, str):
        fn = load_callable(fn)
    spark.udf.register(name, fn, return_type)


def register_sql_macro(spark: SparkSession, name: str, params: list[str],
                       body_sql: str) -> None:
    """JVM-side alternative to a Python scalar UDF: a SQL temporary function
    (Spark 3.1+ CREATE TEMPORARY FUNCTION ... is Hive-UDF-only, so we use
    SQL-standard CREATE TEMPORARY MACRO-style via a generated expression —
    implemented as a SQL function when available, else documented fallback).
    """
    param_list = ", ".join(f"{p} STRING" for p in params)
    spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({param_list}) RETURNS STRING RETURN {body_sql}")


def register_sql_udf(spark: SparkSession, name: str,
                     params: list[tuple[str, str]], returns: str,
                     body_sql: str) -> None:
    """U2 modernized: a TYPED SQL-standard scalar UDF (Spark 4.0
    `CREATE FUNCTION ... RETURNS <type> RETURN <expr>`). Unlike a Python
    UDF, the body is a Catalyst expression — it inlines into
    whole-stage codegen at every call site (zero serialization, full
    pushdown through it), which is the 100-TB-preferred way to ship
    reusable scalar logic. `params` are (name, sql_type) pairs."""
    sig = ", ".join(f"{p} {t}" for p, t in params)
    spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({sig}) "
              f"RETURNS {returns} RETURN {body_sql}")


def register_view(spark: SparkSession, name: str, df: DataFrame) -> None:
    """U3: temporary view registration."""
    df.createOrReplaceTempView(name)
