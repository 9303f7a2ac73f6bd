"""GraphQL climbs ingest as a Spark Python DataSource (Spark 4 API).

``sources/graphql.py`` implements the reference's sequential country loop
(/root/reference/export.py:160-192) for API parity; this module is the
scale path: `spark.read.format("graphql_climbs")` plans ONE INPUT PARTITION
PER COUNTRY, so the per-country page loops run in parallel on executors and
ingest throughput scales with the cluster instead of the driver.

The transport is selected by options:

- ``synthetic=true`` (default): a deterministic in-process fake GraphQL
  backend — no network, stable across runs — used by tests and demos. It
  honors limit/offset paging and short-page termination exactly like the
  real API so the paging logic is exercised for real.
- ``api_url=<url>``: the live endpoint via ``requests`` (gated import).

Both paths reuse fetch_country_climbs, so retries/backoff/short-page
semantics are identical to the sequential source.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from parquet_exporter_spark.sources.climbs import CLIMBS_SCHEMA
from parquet_exporter_spark.sources.graphql import (
    PAGE_SIZE,
    Transport,
    fetch_country_climbs,
)

SYNTH_COUNTRIES = ("USA", "CAN", "MEX", "FRA", "ESP")
SYNTH_CLIMBS_PER_COUNTRY = 7


def synthetic_transport(_query: str, variables: dict) -> dict:
    """Deterministic fake GraphQL backend (module-level so it pickles to
    executors). One area per country holding SYNTH_CLIMBS_PER_COUNTRY
    climbs; every odd climb omits coords/pathTokens so parent-area
    enrichment is exercised."""
    if "country" not in variables:
        return {"countries": [{"isoCode": c} for c in SYNTH_COUNTRIES]}
    country = variables["country"]
    if variables.get("offset", 0) >= 1:  # a single (short) page per country
        return {"areas": []}
    idx = SYNTH_COUNTRIES.index(country) if country in SYNTH_COUNTRIES else 99
    climbs = []
    for i in range(SYNTH_CLIMBS_PER_COUNTRY):
        climb = {
            "uuid": f"{country.lower()}-{i:04d}",
            "name": f"Route {country} {i}",
            "fa": None,
            "length": 10 + 3 * i + idx,
            "boltsCount": i % 5,
            "safety": "G" if i % 2 == 0 else None,
            "grades": {"yds": f"5.{8 + (i % 6)}", "vscale": None, "french": None},
            "type": {
                "sport": i % 2 == 0,
                "trad": i % 2 == 1,
                "bouldering": False,
                "alpine": False,
                "tr": False,
            },
            "content": {"description": f"climb {i} in {country}"},
        }
        if i % 2 == 0:
            climb["metadata"] = {"lat": 40.0 + idx, "lng": -100.0 - i}
            climb["pathTokens"] = [country, f"Area {idx}", f"Crag {i}"]
        # odd climbs: no metadata/pathTokens -> inherited from the area
        climbs.append(climb)
    area = {
        "uuid": f"area-{country.lower()}",
        "areaName": f"Area {idx}",
        "pathTokens": [country, f"Area {idx}"],
        "metadata": {"lat": 40.0 + idx, "lng": -100.0},
        "climbs": climbs,
    }
    return {"areas": [area]}


def _struct_to_tuple(value: dict | None, schema: StructType):
    if value is None:
        return None
    out = []
    for field in schema.fields:
        v = value.get(field.name)
        if isinstance(field.dataType, StructType):
            v = _struct_to_tuple(v, field.dataType)
        out.append(v)
    return tuple(out)


class CountryPartition(InputPartition):
    def __init__(self, country: str):
        self.country = country


class GraphQLClimbsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)

    def _transport(self) -> Transport:
        api_url = self.options.get("api_url")
        if api_url:
            from parquet_exporter_spark.sources.graphql import requests_transport

            return requests_transport(api_url)
        return synthetic_transport

    def _countries(self) -> Sequence[str]:
        explicit = self.options.get("countries")
        if explicit:
            return [c.strip() for c in explicit.split(",") if c.strip()]
        data = self._transport()("query { countries { isoCode } }", {})
        return [c["isoCode"] for c in data.get("countries", [])]

    def partitions(self) -> Sequence[CountryPartition]:
        # one partition per country: the paging loop for each country runs
        # as its own task, so ingest parallelism = number of countries
        return [CountryPartition(c) for c in self._countries()]

    def read(self, partition: CountryPartition) -> Iterator[tuple]:
        transport = self._transport()
        for climb in fetch_country_climbs(transport, partition.country):
            yield _struct_to_tuple(climb, CLIMBS_SCHEMA)


class GraphQLClimbsStreamReader(SimpleDataSourceStreamReader):
    """Incremental-ingest form: one country per micro-batch, the offset is
    the index into the (stable) country list. ``readBetweenOffsets``
    replays any committed range deterministically, which is what gives the
    sink exactly-once semantics after a restart."""

    def __init__(self, options: dict):
        self._inner = GraphQLClimbsReader(options)
        self._countries = list(self._inner._countries())

    def initialOffset(self) -> dict:
        return {"next": 0}

    def _rows(self, country: str):
        transport = self._inner._transport()
        for climb in fetch_country_climbs(transport, country):
            yield _struct_to_tuple(climb, CLIMBS_SCHEMA)

    def read(self, start: dict):
        i = start["next"]
        if i >= len(self._countries):
            return iter([]), start  # caught up: no new batch
        # materialized list, not a generator: the engine pickles the
        # prefetched rows into its offset cache
        return list(self._rows(self._countries[i])), {"next": i + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for i in range(start["next"], end["next"]):
            yield from self._rows(self._countries[i])


class GraphQLClimbsDataSource(DataSource):
    """``spark.read.format("graphql_climbs")`` (batch) or
    ``spark.readStream.format("graphql_climbs")`` (incremental) after
    ``spark.dataSource.register(GraphQLClimbsDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "graphql_climbs"

    def schema(self) -> StructType:
        return CLIMBS_SCHEMA

    def reader(self, schema: StructType) -> GraphQLClimbsReader:
        return GraphQLClimbsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> GraphQLClimbsStreamReader:
        return GraphQLClimbsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(GraphQLClimbsDataSource)


_PAGE_SIZE_DOC = PAGE_SIZE  # re-exported for parity docs/tests
