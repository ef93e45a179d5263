"""Measure the storage + shuffle width of the two int8 code layouts
(r14).

Runs the sf0.1 embeddings table through ``quantize_embeddings`` in
both layouts (``qvec array<int>`` vs ``qcode binary``) and prints:

- parquet bytes (snappy + uncompressed pages): what a persisted
  100 TB code table costs on disk. Parquet dictionary/RLE-encodes the
  int32 lists, so the two layouts land close here — the disk story is
  "packed is not worse".
- ACTUAL shuffle write bytes for a ``repartition(32, id)`` exchange,
  read from the Spark UI REST API after the job: Spark shuffles are
  UnsafeRow-serialized (no columnar encodings), where array<int>
  costs a 16-byte array header + 4 B/element vs binary's raw bytes —
  this is the number that scales with every code-bearing exchange on
  a 1000-executor cluster, and where the packed layout's win is.

Usage: python scripts/measure_code_width.py [sf_dir]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.operators.similarity import (  # noqa: E402
    quantize_embeddings,
)


def _ui_spark():
    """The engine session config but with the UI on — the REST metrics
    endpoint is the only reader of real shuffle-byte counters on
    local[*] (get_spark disables the UI for test throughput)."""
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("measure-code-width")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .getOrCreate()
    )


def _shuffle_write_bytes(spark, fn) -> int:
    """Run ``fn()`` and return the shuffle WRITE bytes its stages
    recorded, via the local Spark UI REST API (the same numbers the
    Stages tab shows) — stage set diffed around the action so only
    ``fn``'s own exchange is counted."""
    import json
    from urllib.request import urlopen

    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages"

    def stages():
        with urlopen(base) as r:
            return {
                s["stageId"]: s.get("shuffleWriteBytes", 0)
                for s in json.load(r)
            }

    before = set(stages())
    fn()
    after = stages()
    return sum(v for k, v in after.items() if k not in before)


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = _ui_spark()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    out = tempfile.mkdtemp(prefix="codewidth_")
    results: dict[str, int] = {}
    try:
        for name, packed in [("array_int", False), ("binary_packed", True)]:
            codes = quantize_embeddings(emb, packed=packed)
            p_snappy = os.path.join(out, f"{name}_parquet")
            codes.write.mode("overwrite").parquet(p_snappy)
            results[f"{name}/parquet_snappy"] = _tree_bytes(p_snappy)
            p_raw = os.path.join(out, f"{name}_raw")

            def write_raw(codes=codes, p_raw=p_raw):
                (
                    codes.repartition(32, "vec_id")  # a real exchange
                    .write.mode("overwrite")
                    .option("compression", "uncompressed")
                    .parquet(p_raw)
                )

            results[f"{name}/shuffle_write"] = _shuffle_write_bytes(
                spark, write_raw
            )
            results[f"{name}/parquet_uncompressed"] = _tree_bytes(p_raw)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    print(f"rows={n} sf_dir={sf_dir}")
    for k, v in results.items():
        print(f"{k}: {v} bytes ({v / n:.1f} B/row)")
    for metric in ("parquet_snappy", "parquet_uncompressed", "shuffle_write"):
        a = results[f"array_int/{metric}"]
        b = results[f"binary_packed/{metric}"]
        print(f"{metric}: packed/array ratio = {b / a:.3f} ({a / b:.2f}x smaller)")
    spark.stop()


if __name__ == "__main__":
    main()
