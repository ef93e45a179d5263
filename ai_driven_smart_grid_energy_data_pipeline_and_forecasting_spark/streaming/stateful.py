"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.8; the one Structured Streaming surface the reference's
batch loop cannot emulate with a keyed merge).

``stream_running_zscore``: per-site online anomaly scoring. State is
the Welford running-moment triple (n, mean, M2) — O(1) per site
regardless of stream length, updated per observation and carried
across micro-batches by the state store. Each observation is emitted
with its z-score against the distribution *so far* (the streaming
semantics a batch window cannot express: the score depends on
everything seen before, not on a bounded frame).

Scale: state size = 3 doubles per site; the state store shuffles by
the group key only. For unbounded keys add a timeout
(``GroupStateTimeout.ProcessingTimeTimeout``) to retire idle sites.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame

OUTPUT_SCHEMA = (
    "site string, ts_utc timestamp, ghi_wm2 double, zscore double, n_seen long"
)
STATE_SCHEMA = "n long, mean double, m2 double"


def running_zscore_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    """Welford update per observation; emits (obs, z-vs-history).
    Module-level (not a closure) so tests can drive it directly."""
    (site,) = key
    if state.exists:
        n, mean, m2 = state.get
    else:
        n, mean, m2 = 0, 0.0, 0.0
    out: list[tuple] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts_utc")
        for ts, x in zip(pdf["ts_utc"], pdf["ghi_wm2"]):
            if x is None or pd.isna(x):
                continue
            x = float(x)
            # z against the distribution BEFORE this observation
            if n > 1:
                var = m2 / (n - 1)
                z = (x - mean) / var**0.5 if var > 0 else 0.0
            else:
                z = 0.0
            n += 1
            d = x - mean
            mean += d / n
            m2 += d * (x - mean)
            out.append((site, ts, x, z, n))
    state.update((n, mean, m2))
    yield pd.DataFrame(out, columns=["site", "ts_utc", "ghi_wm2", "zscore", "n_seen"])


def stream_running_zscore(stream: DataFrame) -> DataFrame:
    """Attach the stateful operator to a streaming bronze-shaped frame."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("site").applyInPandasWithState(
        running_zscore_fn,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
