"""Schema-enforced multi-format table IO.

The reference consumes exactly one wire format (Mongo change-stream
documents); an analytics engine meets its inputs in whatever format the
lake holds. This module is the one place format handling lives:

- ``read_table`` reads parquet / ORC / CSV / JSON-lines with an EXPLICIT
  schema — no ``inferSchema`` anywhere (schema inference triggers an extra
  full scan at 100 TB and silently drifts types between files); CSV/JSON
  run in PERMISSIVE mode with a ``_corrupt_record`` rescue column so one
  malformed row cannot kill a batch (the same per-record error isolation
  the envelope parser gives the CDC stream, reference ST6).
- ``write_table`` writes the same formats, defaulting CSV to a header and
  explicit timestamp formatting so a round-trip is value-stable.

Columnar formats (parquet/ORC) keep predicate pushdown and column pruning;
row formats (CSV/JSON) document their cost: every query scans full rows,
so they are ingest/egress formats, not storage formats, at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_FORMATS = ("parquet", "orc", "csv", "json")
_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
# CSV NULL sentinel, pinned symmetrically on read and write: Spark's
# defaults render both NULL and '' as an empty field, so a round-trip
# silently turns empty strings into NULLs. With the classic \N sentinel
# NULL ↔ \N and '' ↔ "" stay distinct. Residual (documented) limitation:
# a DATA value equal to the literal two characters \N reads back as NULL —
# the univocity parser applies nullValue after unquoting, so no quoting
# scheme can protect it; data that may legitimately contain \N belongs in
# a columnar format.
_CSV_NULL = "\\N"


def _check(fmt: str) -> str:
    f = fmt.lower()
    if f not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    return f


def read_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    fmt: str = "parquet",
    rescue_corrupt: bool = True,
) -> DataFrame:
    """Read ``path`` as ``fmt`` with an enforced schema.

    For CSV/JSON the read is PERMISSIVE: malformed rows land with nulls and
    (when ``rescue_corrupt``) the raw line in ``_corrupt_record`` for a
    quarantine split — never an aborted job. Columnar formats reject
    mismatched types at the footer level instead.
    """
    f = _check(fmt)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if f in ("parquet", "orc"):
        return getattr(spark.read.schema(schema), f)(path)
    if rescue_corrupt:
        schema = T.StructType(
            list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
        )
    reader = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
    )
    if f == "csv":
        # enforceSchema=false validates the header NAMES against the schema
        # instead of binding columns by position — a reordered-column CSV
        # fails loudly rather than silently swapping same-typed columns
        reader = (
            reader.option("header", "true")
            .option("enforceSchema", "false")
            .option("timestampFormat", _TS_FMT)
            .option("nullValue", _CSV_NULL)
            .option("emptyValue", "")
        )
        return reader.csv(path)
    return reader.option("timestampFormat", _TS_FMT).json(path)


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    f = _check(fmt)
    writer = df.write.mode(mode)
    if f == "csv":
        writer = (
            writer.option("header", "true")
            .option("timestampFormat", _TS_FMT)
            .option("nullValue", _CSV_NULL)
            .option("emptyValue", '""')
        )
    elif f == "json":
        # default JSON timestamp rendering truncates to milliseconds —
        # pin the micro format so a round-trip is value-stable
        writer = writer.option("timestampFormat", _TS_FMT)
    getattr(writer, f)(path)
