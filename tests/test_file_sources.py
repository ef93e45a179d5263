"""Schema-enforced CSV/JSON sources: good rows parse, malformed lines
quarantine verbatim, nothing is silently dropped."""

from __future__ import annotations

from pyspark.sql import types as T

from ai_driven_smart_grid_energy_data_pipeline_and_forecasting_spark.sources.files import (
    read_csv_strict,
    read_json_strict,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def test_csv_strict_splits_good_and_corrupt(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        "id,name,score\n"
        "1,alice,2.5\n"
        "not_a_number,bob,3.0\n"  # id fails long parse
        "2,carol,4.25\n"
    )
    good, bad = read_csv_strict(spark, str(p), SCHEMA)
    rows = {r.id: (r.name, r.score) for r in good.collect()}
    assert rows == {1: ("alice", 2.5), 2: ("carol", 4.25)}
    quarantined = [r.raw_line for r in bad.collect()]
    assert quarantined == ["not_a_number,bob,3.0"]


def test_json_strict_splits_good_and_corrupt(spark, tmp_path):
    p = tmp_path / "data.json"
    p.write_text(
        '{"id": 1, "name": "alice", "score": 2.5}\n'
        "this is not json at all\n"
        '{"id": 2, "name": "carol", "score": 4.25}\n'
    )
    good, bad = read_json_strict(spark, str(p), SCHEMA)
    assert good.count() == 2
    quarantined = [r.raw_line for r in bad.collect()]
    assert quarantined == ["this is not json at all"]


def test_nothing_lost(spark, tmp_path):
    p = tmp_path / "d.csv"
    lines = ["id,name,score"] + [f"{i},u{i},{i}.5" for i in range(10)] + ["x,y"]
    p.write_text("\n".join(lines) + "\n")
    good, bad = read_csv_strict(spark, str(p), SCHEMA)
    assert good.count() + bad.count() == 11
