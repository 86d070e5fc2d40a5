"""Python DataFrame / DB-API-ish shim over the graft Scala library.

Mirrors the reference's Python surface (otterbrix pyconnection:
/root/reference/integration/python/pyconnection/initialize.cpp, tests at
integration/python/tests/fast/dataframe/) — Connection.from_df,
Relation.filter/join/group/fetchall, ColumnExpression / ConstantExpression /
CountExpression — on top of PySpark, with the Scala session layer
(graft.api.GraftSession) reachable through the same JVM via py4j for the
SQL/catalog surface (execute, dynamic tables, constraints).

Usage requires the compiled classes on the driver classpath:

    GRAFT_CLASSES=/root/repo/target/scala-2.13/classes python3 -m pytest \
        python/test_graft_python.py

The shim is OPTIONAL integration glue, like the reference's
integration/python tree: the sbt build does not depend on it.
"""
import os

from pyspark.sql import SparkSession, functions as F
from pyspark.sql import DataFrame as SparkDataFrame


class ColumnExpression:
    """Column reference; optional `side` qualifies a join input
    ("left"/"right"), matching the reference's join tests."""

    def __init__(self, name, conn=None, side=None):
        self.name = name
        self.side = side

    def col(self):
        return F.col(f"{self.side}.{self.name}" if self.side else self.name)

    def __eq__(self, other):  # noqa: E721 — expression DSL, not identity
        return self.col() == _as_col(other)

    def __gt__(self, other):
        return self.col() > _as_col(other)

    def __lt__(self, other):
        return self.col() < _as_col(other)

    def avg(self):
        return AggExpression(F.avg(self.col()).cast("double"),
                             f"avg({self.name})")


class ConstantExpression:
    def __init__(self, value, conn=None):
        self.value = value


class CountExpression:
    """COUNT(*) aggregate."""

    def __init__(self, conn=None):
        self.agg = AggExpression(F.count(F.lit(1)), "count")


class AggExpression:
    def __init__(self, column, label):
        self.column = column.alias(label)
        self.label = label


def _as_col(e):
    if isinstance(e, ColumnExpression):
        return e.col()
    if isinstance(e, ConstantExpression):
        return F.lit(e.value)
    return F.lit(e)


class Relation:
    """Lazy relation + cursor surface (reference cursor.hpp fetchall)."""

    def __init__(self, df: SparkDataFrame):
        self.df = df

    def filter(self, cond):
        return Relation(self.df.filter(cond))

    def join(self, right, cond, how="inner"):
        return Relation(self.df.alias("left")
                        .join(right.df.alias("right"), cond, how))

    def group(self, *exprs):
        keys = [e for e in exprs if isinstance(e, ColumnExpression)]
        aggs = [e.agg if isinstance(e, CountExpression) else e
                for e in exprs
                if isinstance(e, (AggExpression, CountExpression))]
        agg_cols = [a.column for a in aggs]
        if keys:
            grouped = self.df.groupBy(*[k.col() for k in keys])
        else:
            grouped = self.df.groupBy()
        return Relation(grouped.agg(*agg_cols))

    def limit(self, n):
        return Relation(self.df.limit(n))

    def sort(self, *exprs):
        return Relation(self.df.orderBy(*[e.col() for e in exprs]))

    def map_in_pandas(self, func, schema):
        """Arrow-batched per-partition transform (the reference's
        multimodal decode/feature-extract shape: binary columns in,
        typed features out, executed as pandas batches)."""
        return Relation(self.df.mapInPandas(func, schema))

    def select(self, *exprs):
        return Relation(self.df.select(*[e.col() for e in exprs]))

    @property
    def columns(self):
        return list(self.df.columns)

    @property
    def types(self):
        return [f.dataType.simpleString().upper()
                for f in self.df.schema.fields]

    def fetchall(self):
        return [tuple(r) for r in self.df.collect()]


class Connection:
    """The reference's connection object: frame ingest + SQL entry points.

    `execute` routes through the Scala GraftSession (same JVM, py4j), so
    the full router surface — dynamic tables, constraints, RETURNING,
    jsonb rewrite, WITH RECURSIVE — is reachable from Python."""

    def __init__(self, spark: SparkSession, root=None):
        self.spark = spark
        root = root or os.path.join("/tmp", f"graft_py_{os.getpid()}")
        jvm = spark.sparkContext._jvm
        self._jsession = jvm.graft.api.GraftSession.apply(
            spark._jsparkSession, root)
        self._jvm = jvm

    def from_df(self, pdf):
        """Ingest a pandas frame (reference test fixture `conn.from_df`)."""
        return Relation(self.spark.createDataFrame(pdf))

    def execute(self, statement):
        jdf = self._jsession.execute(
            statement,
            self._jvm.PythonUtils.toSeq([]))
        return Relation(SparkDataFrame(jdf, self.spark))

    def sql(self, query):
        jdf = self._jsession.sql(query, self._jvm.PythonUtils.toSeq([]))
        return Relation(SparkDataFrame(jdf, self.spark))


def connect(app_name="graft-python", root=None):
    classes = os.environ.get("GRAFT_CLASSES",
                             "/root/repo/target/scala-2.13/classes")
    spark = (SparkSession.builder
             .master(os.environ.get("GRAFT_MASTER", "local[4]"))
             .appName(app_name)
             .config("spark.driver.extraClassPath", classes)
             .config("spark.executor.extraClassPath", classes)
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    return Connection(spark, root)
