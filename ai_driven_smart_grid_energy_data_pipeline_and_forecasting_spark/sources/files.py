"""Schema-enforced file sources with malformed-row routing.

The reference ingests only HTTP JSON (``nasa.py``), but an engine
replacing it must also land operator-provided files (CSV/JSON dumps)
under the same discipline the Silver layer applies to values: never
infer schemas in production (inference = a full extra pass + silent
type drift), never drop malformed rows silently. Spark's PERMISSIVE
mode + ``columnNameOfCorruptRecord`` gives per-row error routing —
the file-level analog of ``validation.split_quarantine``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_csv_strict(
    spark: SparkSession, path: str, schema: T.StructType, header: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): rows that parse under the declared schema,
    and raw lines that did not (kept verbatim for replay/debugging —
    the idempotent-reingest contract needs the original bytes)."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
        .cache()  # one scan serves both splits
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad


def read_json_strict(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Same contract over JSON-lines files."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return good, bad
