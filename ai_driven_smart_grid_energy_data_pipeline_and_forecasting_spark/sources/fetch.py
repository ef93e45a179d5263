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
- plus bounded exponential retry on transient failures (timeouts,
  connection drops, 5xx) — the resilience the reference's bare
  ``requests.get`` lacks; 4xx client errors fail immediately.
"""

from __future__ import annotations

import json
import time
from typing import Any, Callable, Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession

from .nasa_power import PARAMS

POWER_BASE = "https://power.larc.nasa.gov/api/temporal/hourly/point"
DEFAULT_TIMEOUT_S = 60
DEFAULT_RETRIES = 4
BACKOFF_BASE_S = 0.5


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


def _is_retryable(exc: BaseException) -> bool:
    """Transient-failure classification: network timeouts/drops and 5xx
    responses retry; 4xx (bad request, auth, rate-key) means the retry
    would send the same wrong thing again, so it fails immediately."""
    try:
        import requests

        if isinstance(exc, (requests.Timeout, requests.ConnectionError)):
            return True
        if isinstance(exc, requests.HTTPError):
            resp = exc.response
            return resp is not None and 500 <= resp.status_code < 600
    except ImportError:
        pass
    return isinstance(exc, (TimeoutError, ConnectionError))


def fetch_power(
    lat: float,
    lon: float,
    start_yyyymmdd: str,
    end_yyyymmdd: str,
    timeout: float = DEFAULT_TIMEOUT_S,
    transport: Callable[[str, float], str] | None = None,
    retries: int = DEFAULT_RETRIES,
    backoff_s: float = BACKOFF_BASE_S,
    sleep: Callable[[float], None] = time.sleep,
) -> str:
    """GET one payload as raw JSON text (reference ``nasa.py:50-54``).

    Returns text, not a parsed dict: the parse belongs to the
    distributed side (``parse_payloads``), and text round-trips into a
    DataFrame column without a driver-side json.loads/dumps cycle.

    Transient failures retry up to ``retries`` times with exponential
    backoff (backoff_s · 2^attempt — deterministic, no jitter RNG; one
    driver-side fetch per (site, window) has no thundering-herd risk).
    The retry wraps whatever ``transport`` is injected, so pooled or
    mock transports inherit it; ``sleep`` is injectable for tests.
    """
    url = build_power_url(lat, lon, start_yyyymmdd, end_yyyymmdd)
    send = transport or _default_transport
    for attempt in range(retries + 1):
        try:
            return send(url, timeout)
        except Exception as exc:
            if attempt >= retries or not _is_retryable(exc):
                raise
            sleep(backoff_s * (2**attempt))
    raise AssertionError("unreachable")  # loop always returns or raises


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
