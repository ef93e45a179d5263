"""Skew-hardened aggregation: the salting pattern made a first-class
operator.

AQE's skew-join splitting covers joins, but a groupBy on a hot key
still funnels every row of that key through one reducer. ``salted_agg``
decomposes the aggregate into two phases: phase 1 groups on
(keys, salt) so a hot key fans out across ``n_salt`` reducers; phase 2
combines the partials per key. Only decomposable aggregates are
offered (sum/count/min/max, avg = final sum-of-sums / sum-of-counts) —
exactly the set that re-associates safely.

At 100 TB this is the difference between one straggler task holding a
popular key's billions of rows and ``n_salt`` even tasks; the phase-2
input is just |keys|·n_salt partial rows. (Spark's map-side partial
aggregation already does this *within* each input partition — salting
matters when per-partition partials are still too many rows for one
reducer, i.e. extreme cardinality-1-ish keys.)
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# metric kinds → (phase-1 partial agg, phase-2 combiner)
_DECOMPOSABLE = {"sum", "count", "min", "max", "avg"}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    metrics: Mapping[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregate.

    ``metrics`` maps output column name → (input column, kind) with
    kind ∈ {sum, count, min, max, avg}. The salt is derived from
    ``monotonically_increasing_id`` (cheap, uniform, no RNG state);
    results are salt-invariant because every kind re-associates.
    """
    for name, (_, kind) in metrics.items():
        if kind not in _DECOMPOSABLE:
            raise ValueError(f"{name}: kind {kind!r} is not decomposable")

    salt = F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).alias("_salt")

    partials: list[Column] = []
    finals: list[Column] = []
    for name, (col, kind) in metrics.items():
        if kind == "count":
            partials.append(F.count(col).alias(f"_c_{name}"))
            finals.append(F.sum(f"_c_{name}").alias(name))
        elif kind == "sum":
            partials.append(F.sum(col).alias(f"_s_{name}"))
            finals.append(F.sum(f"_s_{name}").alias(name))
        elif kind == "min":
            partials.append(F.min(col).alias(f"_m_{name}"))
            finals.append(F.min(f"_m_{name}").alias(name))
        elif kind == "max":
            partials.append(F.max(col).alias(f"_x_{name}"))
            finals.append(F.max(f"_x_{name}").alias(name))
        else:  # avg
            partials.append(F.sum(col).alias(f"_as_{name}"))
            partials.append(F.count(col).alias(f"_ac_{name}"))
            finals.append(
                (F.sum(f"_as_{name}") / F.sum(f"_ac_{name}")).alias(name)
            )

    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)
