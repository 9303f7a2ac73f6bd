"""GraphQL paginated ingest source (reference R1/R2 parity).

Reproduces the computation of fetch_country_climbs / fetch_all_climbs
(/root/reference/export.py:84-192) Spark-first:

- page with limit/offset at PAGE_SIZE, stop on a short page
  (export.py:71,149-150);
- retry transient failures (502/503/504/timeout) MAX_RETRIES times with a
  fixed backoff (export.py:92-119);
- per-climb enrichment: a climb missing pathTokens or coordinates
  inherits them from its parent area (export.py:134-146);
- country fanout: fetch the country list, then page per country
  (export.py:160-192).

The transport is injectable so tests run hermetically; the default
transport uses `requests` if available. Ingest lands in a DataFrame with
the explicit CLIMBS_SCHEMA. At real scale the per-country fetches can be
distributed (one country per task via a countries DataFrame +
foreachPartition); the driver-side loop is kept here because the API
boundary — not Spark — is the bottleneck, matching the reference's shape.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_exporter_spark.sources.climbs import ingest_climb_docs

PAGE_SIZE = 500  # reference export.py:71 (stated API maximum)
MAX_RETRIES = 3  # reference export.py:105
BACKOFF_S = 2.0  # reference export.py:111
RETRYABLE_STATUS = {502, 503, 504}


class TransientHTTPError(Exception):
    def __init__(self, status: int):
        super().__init__(f"HTTP {status}")
        self.status = status


# A transport takes (query, variables) and returns the parsed GraphQL
# `data` dict; it raises TransientHTTPError/TimeoutError on retryables.
Transport = Callable[[str, dict], dict]

COUNTRIES_QUERY = "query { countries { isoCode } }"
AREAS_QUERY = """
query ($country: String!, $limit: Int!, $offset: Int!) {
  areas(country: $country, limit: $limit, offset: $offset) {
    uuid areaName pathTokens metadata { lat lng }
    climbs { uuid name fa length boltsCount safety
             grades { yds vscale french }
             type { sport trad bouldering alpine tr }
             metadata { lat lng } content { description } pathTokens }
  }
}
"""


def requests_transport(api_url: str) -> Transport:
    import requests  # gated: not exercised in tests

    def post(query: str, variables: dict) -> dict:
        resp = requests.post(
            api_url, json={"query": query, "variables": variables}, timeout=120
        )
        if resp.status_code in RETRYABLE_STATUS:
            raise TransientHTTPError(resp.status_code)
        resp.raise_for_status()
        body = resp.json()
        if "errors" in body:
            raise RuntimeError(f"GraphQL errors: {body['errors']}")
        return body["data"]

    return post


def _with_retries(call: Callable[[], dict]) -> dict:
    attempts = 0
    while True:
        try:
            return call()
        except (TransientHTTPError, TimeoutError):
            attempts += 1
            if attempts >= MAX_RETRIES:
                raise
            time.sleep(BACKOFF_S)


def _enrich(climb: dict, area: dict) -> dict:
    """Parent-area inheritance for missing pathTokens/coords
    (export.py:134-146)."""
    out = dict(climb)
    if not out.get("pathTokens"):
        out["pathTokens"] = area.get("pathTokens")
    meta = out.get("metadata") or {}
    if meta.get("lat") is None or meta.get("lng") is None:
        out["metadata"] = area.get("metadata")
    return out


def fetch_country_climbs(transport: Transport, country: str) -> list[dict]:
    climbs: list[dict] = []
    offset = 0
    while True:
        data = _with_retries(
            lambda: transport(
                AREAS_QUERY, {"country": country, "limit": PAGE_SIZE, "offset": offset}
            )
        )
        areas = data.get("areas", [])
        for area in areas:
            for climb in area.get("climbs", []):
                climbs.append(_enrich(climb, area))
        if len(areas) < PAGE_SIZE:  # short page -> done (export.py:149-150)
            return climbs
        offset += PAGE_SIZE


def fetch_all_climbs(transport: Transport) -> list[dict]:
    data = _with_retries(lambda: transport(COUNTRIES_QUERY, {}))
    countries = [c["isoCode"] for c in data.get("countries", [])]
    all_climbs: list[dict] = []
    for country in countries:
        all_climbs.extend(fetch_country_climbs(transport, country))
    return all_climbs


def load_climbs(spark: SparkSession, transport: Transport) -> DataFrame:
    docs = fetch_all_climbs(transport)
    return ingest_climb_docs(spark, docs)
