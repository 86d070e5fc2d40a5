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


def apply_pipeline(rel, stages):
    """Mongo-style aggregation pipeline over a Relation — the executable
    mirror of the reference's `to_aggregate` dict DSL
    (/root/reference/integration/python/tests/test_convert.py: $match
    with $eq/$lt/$lte/$gt/$gte/$ne/$regex and implicit AND, $group with
    _id + $sum/$avg/$min/$max, $sort, $limit/$skip). The reference
    converts these dicts to its internal aggregate string; here each
    stage lowers directly onto the DataFrame plan, so the whole pipeline
    is ONE Catalyst plan (filters push down, the group is a normal
    partial/final aggregate)."""
    ops = {"$lt": lambda c, v: c < v, "$lte": lambda c, v: c <= v,
           "$gt": lambda c, v: c > v, "$gte": lambda c, v: c >= v,
           "$ne": lambda c, v: c != v, "$eq": lambda c, v: c == v,
           "$regex": lambda c, v: c.rlike(v)}
    aggs = {"$sum": F.sum, "$avg": F.avg, "$min": F.min, "$max": F.max,
            "$count": lambda c: F.count(F.lit(1))}

    def ref(v):  # "$field" references a column, bare values are literals
        return F.col(v[1:]) if isinstance(v, str) and v.startswith("$") \
            else F.lit(v)

    df = rel.df
    for stage in stages:
        (kind, spec), = stage.items()
        if kind == "$match":
            for field, cond in spec.items():  # implicit AND across keys
                if isinstance(cond, dict):
                    for op, v in cond.items():
                        df = df.filter(ops[op](F.col(field), v))
                else:
                    df = df.filter(F.col(field) == cond)
        elif kind == "$group":
            # "_id": "$f" groups by column f; a bare value is a constant
            # key (one global group) — the reference's parameter form
            keys = [ref(v).alias("_id") for k, v in spec.items()
                    if k == "_id"]
            cols = [aggs[op](ref(v)).alias(name)
                    for name, expr in spec.items() if name != "_id"
                    for op, v in expr.items()]
            df = (df.groupBy(*keys) if keys else df.groupBy()).agg(*cols)
        elif kind == "$sort":
            df = df.orderBy(*[F.col(f).asc() if d >= 0 else F.col(f).desc()
                              for f, d in spec.items()])
        elif kind == "$limit":
            df = df.limit(spec)
        elif kind == "$skip":
            df = df.offset(spec)
        elif kind == "$project":
            # {"f": 1} includes f; {"alias": "$f"} renames
            cols = []
            for name, v in spec.items():
                if isinstance(v, str) and v.startswith("$"):
                    cols.append(F.col(v[1:]).alias(name))
                elif v:
                    cols.append(F.col(name))
            df = df.select(*cols)
        else:
            raise ValueError(f"unsupported pipeline stage {kind}")
    return Relation(df)


class Cursor:
    """PEP 249-shaped cursor over the Scala router — the shim mirror of the
    reference's DB-API cursor surface (otterbrix client.execute returning a
    len()-able, closeable cursor: /root/reference/integration/python/tests/
    test_collection_sql.py). Statements route through GraftSession.execute,
    so DDL/DML/SELECT plus $n parameters all work; results are fetched
    lazily into the cursor on execute()."""

    arraysize = 1

    def __init__(self, conn):
        self._conn = conn
        self._rows = None
        self._rel = None
        self._pos = 0
        self.description = None
        self.rowcount = -1

    def execute(self, statement, params=None):
        rel = self._conn.execute(statement, params)
        self._rel = rel
        df = rel.df
        self.description = [
            (f.name, f.dataType.simpleString().upper(),
             None, None, None, None, f.nullable)
            for f in df.schema.fields]
        self._rows = [tuple(r) for r in df.collect()]
        self._pos = 0
        self.rowcount = len(self._rows)
        return self

    def executemany(self, statement, seq_of_params):
        for params in seq_of_params:
            self.execute(statement, params)
        return self

    def fetchone(self):
        if self._rows is None or self._pos >= len(self._rows):
            return None
        row = self._rows[self._pos]
        self._pos += 1
        return row

    def fetchmany(self, size=None):
        size = self.arraysize if size is None else size
        out = self._rows[self._pos:self._pos + size] if self._rows else []
        self._pos += len(out)
        return out

    def fetchall(self):
        out = self._rows[self._pos:] if self._rows else []
        self._pos = len(self._rows) if self._rows else 0
        return out

    def __iter__(self):
        while True:
            row = self.fetchone()
            if row is None:
                return
            yield row

    def __len__(self):
        return 0 if self._rows is None else len(self._rows)

    def fetch_arrow_table(self):
        """Last result as a `pyarrow.Table`, via the self-describing Arrow
        IPC stream (columnar hand-off, no per-row py4j traffic — the
        DuckDB-cursor `fetch_arrow_table` idiom)."""
        import pyarrow as pa
        if self._rel is None:
            return None
        data = self._conn.to_arrow_stream(self._rel)
        with pa.ipc.open_stream(data) as reader:
            return reader.read_all()

    def fetch_df(self):
        """Last result as a pandas DataFrame (through Arrow)."""
        table = self.fetch_arrow_table()
        return None if table is None else table.to_pandas()

    def close(self):
        self._rows = None
        self._rel = None
        self.description = None


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

    def from_df(self, df):
        """Ingest a dataframe (reference test fixture `conn.from_df`).

        Accepts pandas, and — mirroring the reference's polars ingest
        (integration/python/tests/test_polars_ingest.py, which goes
        through its Arrow export in scan/pandas_arrow_prepare.cpp) — any
        Arrow-native frame: a `pyarrow.Table`, a polars DataFrame (its
        `to_arrow()` is a zero-copy export), or any object speaking the
        Arrow PyCapsule protocol (`__arrow_c_stream__`). Arrow-native
        frames reach Spark as Arrow batches directly; pandas is never in
        that path."""
        import pyarrow as pa
        if not isinstance(df, pa.Table):
            to_arrow = getattr(df, "to_arrow", None)
            if callable(to_arrow):  # polars-style Arrow export
                df = to_arrow()
            elif hasattr(df, "__arrow_c_stream__"):  # PyCapsule protocol
                df = pa.table(df)
        return Relation(self.spark.createDataFrame(df))

    def execute(self, statement, params=None):
        jdf = self._jsession.execute(
            statement,
            self._jvm.PythonUtils.toSeq(params or []))
        return Relation(SparkDataFrame(jdf, self.spark))

    def sql(self, query, params=None):
        jdf = self._jsession.sql(query,
                                 self._jvm.PythonUtils.toSeq(params or []))
        return Relation(SparkDataFrame(jdf, self.spark))

    def cursor(self):
        """DB-API entry point (PEP 249 `Connection.cursor()`)."""
        return Cursor(self)

    def to_arrow_stream(self, relation):
        """Self-describing Arrow IPC stream (schema + batches + EOS) for a
        relation; consumable by stock `pyarrow.ipc.open_stream` with no
        out-of-band schema."""
        jbytes = self._jvm.org.apache.spark.sql.graftarrow.ArrowBridge \
            .toArrowStream(relation.df._jdf)
        return bytes(jbytes)


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
