"""Driver-side NASA POWER HTTP transport (reference
``fastapi/app/etl/nasa.py:29-54``).

Transport is deliberately an *edge* concern: one small HTTP response per
(site, window) is fetched on the driver, and everything after — JSON
parse, shape dispatch, hourly alignment — runs distributed through
``nasa_power.parse_payloads``.  A payload is a few hundred KB; the
corpus-scale work is in the parse/align, never here.  The injectable
``transport`` keeps the function unit-testable without network and lets
a deployment swap in a pooled/retrying session.

Parity with the reference:
- same base URL, parameter list, community=RE, format=JSON,
  time-standard=UTC query assembly (``nasa.py:34-46``)
- 60 s timeout, raise on HTTP error status (``nasa.py:50-54``)
"""

from __future__ import annotations

import json
from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

from .nasa_power import PARAMS

POWER_BASE = "https://power.larc.nasa.gov/api/temporal/hourly/point"
DEFAULT_TIMEOUT_S = 60


def build_power_url(
    lat: float, lon: float, start_yyyymmdd: str, end_yyyymmdd: str
) -> str:
    """Assemble the POWER hourly-point URL (reference ``nasa.py:34-46``:
    insertion-ordered query string, params comma-joined)."""
    query = {
        "parameters": ",".join(PARAMS),
        "community": "RE",
        "longitude": lon,
        "latitude": lat,
        "start": start_yyyymmdd,
        "end": end_yyyymmdd,
        "format": "JSON",
        "time-standard": "UTC",
    }
    query_string = "&".join(f"{key}={query[key]}" for key in query)
    return f"{POWER_BASE}?{query_string}"


def _default_transport(url: str, timeout: float) -> str:
    import requests

    response = requests.get(url, timeout=timeout)
    response.raise_for_status()
    return response.text


def fetch_power(
    lat: float,
    lon: float,
    start_yyyymmdd: str,
    end_yyyymmdd: str,
    timeout: float = DEFAULT_TIMEOUT_S,
    transport: Callable[[str, float], str] | None = None,
) -> str:
    """GET one payload as raw JSON text (reference ``nasa.py:50-54``).

    Returns text, not a parsed dict: the parse belongs to the
    distributed side (``parse_payloads``), and text round-trips into a
    DataFrame column without a driver-side json.loads/dumps cycle.
    """
    url = build_power_url(lat, lon, start_yyyymmdd, end_yyyymmdd)
    return (transport or _default_transport)(url, timeout)


def fetch_payload_rows(
    spark: SparkSession,
    sites: Iterable[tuple[str, float, float]],
    start_yyyymmdd: str,
    end_yyyymmdd: str,
    timeout: float = DEFAULT_TIMEOUT_S,
    transport: Callable[[str, float], str] | None = None,
) -> DataFrame:
    """Fetch one payload per (site, lat, lon) and land them as the
    (site, payload) frame ``parse_payloads`` consumes.

    The site list is driver-sized by nature (ingest windows iterate a
    handful of plants); the returned frame fans out distributed.
    """
    rows = [
        (site, fetch_power(lat, lon, start_yyyymmdd, end_yyyymmdd, timeout, transport))
        for site, lat, lon in sites
    ]
    return spark.createDataFrame(rows, "site string, payload string")
