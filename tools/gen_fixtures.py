"""Generate the deterministic nested climbs/areas fixtures (FIXTURES.md
section 11) into fixtures/*.parquet.

The schema mirrors the reference's GraphQL document model
(/root/reference/export.py:28-68, test-export.py:16-30): nested grades/
type/metadata/content structs and a variable-length pathTokens array, with
the edge cases the reference handles — NULL coords/pathTokens (parent
inheritance, export.py:134-146), short pathTokens (1-based element_at past
the end), all-NULL grades (multi-arg COALESCE), mixed type flags.

Run once; the output is committed. Seed fixed -> byte-stable content.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 1337
N_AREAS = 40
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

COUNTRIES = ["USA", "Canada", "Mexico", "Spain", "France"]
STATES = ["Alpha", "Bravo", "Charlie", "Delta"]
GRADES_YDS = ["5.8", "5.9", "5.10a", "5.11c", "5.12d", None]
GRADES_V = ["V0", "V3", "V5", "V8", None]
GRADES_FR = ["6a", "6c", "7a+", "8b", None]


def make_docs():
    rng = random.Random(SEED)
    areas, climbs = [], []
    climb_uid = 0
    for a in range(N_AREAS):
        country = COUNTRIES[a % len(COUNTRIES)]
        state = STATES[a % len(STATES)]
        depth = rng.choice([2, 3, 4, 5])
        path = [country, state, f"Region{a % 7}", f"Area{a}", f"Crag{a}"][:depth]
        area_lat = round(20 + rng.random() * 40 + 0.123, 6)
        area_lng = round(-120 + rng.random() * 100 + 0.456, 6)
        area_climbs = []
        for _ in range(rng.randint(3, 12)):
            climb_uid += 1
            missing_meta = rng.random() < 0.25
            missing_path = rng.random() < 0.2
            all_null_grades = rng.random() < 0.15
            climb = {
                "uuid": f"climb-{climb_uid:05d}",
                "name": f"Route {climb_uid}" if rng.random() > 0.05 else None,
                "fa": f"Climber {rng.randint(1, 50)}" if rng.random() > 0.3 else None,
                "length": rng.randint(5, 60) if rng.random() > 0.2 else None,
                "boltsCount": rng.randint(0, 14) if rng.random() > 0.4 else None,
                "safety": rng.choice(["BOLTED", "TRAD", "MIXED", None]),
                "grades": {
                    "yds": None if all_null_grades else rng.choice(GRADES_YDS),
                    "vscale": None if all_null_grades else rng.choice(GRADES_V),
                    "french": None if all_null_grades else rng.choice(GRADES_FR),
                },
                "type": {
                    "sport": rng.random() < 0.5,
                    "trad": rng.random() < 0.3,
                    "bouldering": rng.random() < 0.2,
                    "alpine": rng.random() < 0.1,
                    "tr": rng.random() < 0.15,
                },
                "metadata": None
                if missing_meta
                else {
                    "lat": round(area_lat + rng.random() * 0.01, 6),
                    "lng": round(area_lng + rng.random() * 0.01, 6),
                },
                "content": {
                    "description": f"A fine line numbered {climb_uid}."
                    if rng.random() > 0.2
                    else None
                },
                "pathTokens": None if missing_path else path,
            }
            climbs.append(climb)
            area_climbs.append(climb)
        areas.append(
            {
                "uuid": f"area-{a:04d}",
                "area_name": f"Area {a}",
                "pathTokens": path,
                "metadata": {"lat": area_lat, "lng": area_lng},
                "climbs": area_climbs,
            }
        )
    return areas, climbs


CLIMB_TYPE = pa.struct(
    [
        ("uuid", pa.string()),
        ("name", pa.string()),
        ("fa", pa.string()),
        ("length", pa.int32()),
        ("boltsCount", pa.int32()),
        ("safety", pa.string()),
        ("grades", pa.struct([("yds", pa.string()), ("vscale", pa.string()), ("french", pa.string())])),
        (
            "type",
            pa.struct(
                [
                    ("sport", pa.bool_()),
                    ("trad", pa.bool_()),
                    ("bouldering", pa.bool_()),
                    ("alpine", pa.bool_()),
                    ("tr", pa.bool_()),
                ]
            ),
        ),
        ("metadata", pa.struct([("lat", pa.float64()), ("lng", pa.float64())])),
        ("content", pa.struct([("description", pa.string())])),
        ("pathTokens", pa.list_(pa.string())),
    ]
)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    areas, climbs = make_docs()
    climbs_tbl = pa.Table.from_pylist(climbs, schema=pa.schema(list(CLIMB_TYPE)))
    pq.write_table(climbs_tbl, os.path.join(OUT_DIR, "climbs.parquet"))
    areas_schema = pa.schema(
        [
            ("uuid", pa.string()),
            ("area_name", pa.string()),
            ("pathTokens", pa.list_(pa.string())),
            ("metadata", pa.struct([("lat", pa.float64()), ("lng", pa.float64())])),
            ("climbs", pa.list_(CLIMB_TYPE)),
        ]
    )
    areas_tbl = pa.Table.from_pylist(areas, schema=areas_schema)
    pq.write_table(areas_tbl, os.path.join(OUT_DIR, "areas.parquet"))
    print(f"wrote {len(climbs)} climbs, {len(areas)} areas to {OUT_DIR}")




def write_flat_forms() -> None:
    """CSV and JSON-lines forms of a flat climbs projection, for the
    csv/json scan operators (deterministic, derived from climbs.parquet)."""
    import csv
    import json as _json

    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT uuid AS climb_id, coalesce(name, '') AS climb_name,
               coalesce(length, 0) AS length_m,
               coalesce(grades.yds, '') AS yds,
               coalesce(metadata.lat, 0.0) AS latitude
        FROM '{os.path.join(OUT_DIR, "climbs.parquet")}'
        ORDER BY climb_id
        """
    ).fetchall()
    with open(os.path.join(OUT_DIR, "climbs_flat.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["climb_id", "climb_name", "length_m", "yds", "latitude"])
        w.writerows(rows)
    with open(os.path.join(OUT_DIR, "climbs_flat.jsonl"), "w") as f:
        for r in rows:
            f.write(
                _json.dumps(
                    {
                        "climb_id": r[0],
                        "climb_name": r[1],
                        "length_m": r[2],
                        "yds": r[3],
                        "latitude": r[4],
                    }
                )
                + "\n"
            )


def write_xml_form() -> None:
    """XML form of the same flat climbs projection, for the native Spark 4
    XML data source scan operator (deterministic, derived from
    climbs_flat.csv so the DuckDB oracle can read the CSV twin)."""
    import csv
    from xml.sax.saxutils import escape

    with open(os.path.join(OUT_DIR, "climbs_flat.csv"), newline="") as f:
        rows = list(csv.DictReader(f))
    with open(os.path.join(OUT_DIR, "climbs_flat.xml"), "w") as f:
        f.write("<climbs>\n")
        for r in rows:
            f.write(
                "  <climb>"
                f"<climb_id>{escape(r['climb_id'])}</climb_id>"
                f"<climb_name>{escape(r['climb_name'])}</climb_name>"
                f"<length_m>{r['length_m']}</length_m>"
                f"<yds>{escape(r['yds'])}</yds>"
                f"<latitude>{r['latitude']}</latitude>"
                "</climb>\n"
            )
        f.write("</climbs>\n")


def write_partitioned_events() -> None:
    """Hive-partitioned copy of the sf0.001 events table (partitioned by
    event_type), for the partition-pruning scan operator. Deterministic:
    derived from the driver's seed-42 testdata; one file per partition."""
    import duckdb

    con = duckdb.connect()
    src = "/root/testdata/sf0.001/events.parquet"
    out = os.path.join(OUT_DIR, "events_partitioned")
    for (et,) in con.sql(
        f"SELECT DISTINCT event_type FROM '{src}' ORDER BY 1"
    ).fetchall():
        d = os.path.join(out, f"event_type={et}")
        os.makedirs(d, exist_ok=True)
        con.sql(
            f"""
            COPY (SELECT event_id, ts, user_id, value, props FROM '{src}'
                  WHERE event_type = '{et}' ORDER BY event_id)
            TO '{os.path.join(d, "part-0.parquet")}' (FORMAT PARQUET)
            """
        )


def write_ranged_events(n_files: int = 8) -> None:
    """Time-range-clustered multi-file copy of the sf0.001 events table
    (sorted by ts, split into n_files contiguous ranges), for the
    manifest/file-stats pruning operator: each file's parquet footer
    carries a tight disjoint [min_ts, max_ts], so a time predicate can
    skip most files from stats alone. Deterministic: derived from the
    driver's seed-42 testdata; ntile split on the total order (ts,
    event_id)."""
    import duckdb

    con = duckdb.connect()
    src = "/root/testdata/sf0.001/events.parquet"
    out = os.path.join(OUT_DIR, "events_ranged")
    os.makedirs(out, exist_ok=True)
    for i in range(1, n_files + 1):
        con.sql(
            f"""
            COPY (
              WITH b AS (
                SELECT *, ntile({n_files}) OVER (ORDER BY ts, event_id) AS bucket
                FROM '{src}'
              )
              SELECT event_id, ts, user_id, event_type, value, props
              FROM b WHERE bucket = {i} ORDER BY ts, event_id
            )
            TO '{os.path.join(out, f"part-{i - 1}.parquet")}' (FORMAT PARQUET)
            """
        )
    # Fail fast if a duplicate ts ever straddles a bucket boundary: the
    # manifest-pruning tests assume strictly disjoint per-file ranges,
    # and ntile splits on row count, not value. Holds for the current
    # seed data (unique microsecond ts); regeneration must re-prove it.
    bounds = con.sql(
        f"""
        SELECT min(ts) AS lo, max(ts) AS hi
        FROM read_parquet('{out}/part-*.parquet', filename = 1)
        GROUP BY filename ORDER BY lo
        """
    ).fetchall()
    for (_, prev_hi), (cur_lo, _) in zip(bounds, bounds[1:]):
        assert prev_hi < cur_lo, (
            f"events_ranged files overlap at {prev_hi}; re-bucket on "
            "distinct ts before committing this fixture"
        )


def write_cdc_changes() -> None:
    """Debezium-style change envelope JSONL (op c/u/d, before/after
    images, ts_ms) over a 20-key account table — the wire format every
    Kafka-CDC ingestion actually receives. Deterministic synthetic
    sequence: create all 20, update the even keys twice, delete every
    fifth — so the parsed stream contains all three op kinds and the
    replayed latest snapshot is hand-checkable."""
    import json as _j

    out = os.path.join(OUT_DIR, "cdc_changes.jsonl")
    rows = []
    ts = 1700000000000
    state = {}
    for k in range(1, 21):
        after = {"id": k, "name": f"acct-{k:03d}", "balance": round(100.0 * k, 2)}
        rows.append({"op": "c", "ts_ms": ts, "before": None, "after": after})
        state[k] = after
        ts += 1000
    for rnd in (1, 2):
        for k in range(2, 21, 2):
            before = dict(state[k])
            after = dict(before)
            after["balance"] = round(before["balance"] + 7.5 * rnd, 2)
            rows.append({"op": "u", "ts_ms": ts, "before": before, "after": after})
            state[k] = after
            ts += 1000
    for k in range(5, 21, 5):
        rows.append({"op": "d", "ts_ms": ts, "before": dict(state[k]), "after": None})
        del state[k]
        ts += 1000
    with open(out, "w") as f:
        for r in rows:
            f.write(_j.dumps(r) + "\n")


def write_rowgrouped_events(rows_per_group: int = 100) -> None:
    """Single-file copy of the sf0.001 events table sorted by VALUE and
    written with tiny row groups (100 rows -> 10 groups), for the
    row-group skipping operator: each group's parquet statistics carry
    a tight disjoint [min_value, max_value], so a narrow value
    predicate must decode only the overlapping groups — the
    WITHIN-file counterpart of events_ranged's file-level pruning.
    Deterministic: derived from the driver's seed-42 testdata."""
    import duckdb
    import pyarrow.parquet as _pq

    con = duckdb.connect()
    src = "/root/testdata/sf0.001/events.parquet"
    tbl = con.sql(
        f"""SELECT event_id, ts, user_id, event_type, value, props
            FROM '{src}' ORDER BY value, event_id"""
    ).arrow()
    out = os.path.join(OUT_DIR, "events_rowgrouped.parquet")
    _pq.write_table(tbl, out, row_group_size=rows_per_group)
    pf = _pq.ParquetFile(out)
    assert pf.num_row_groups >= 8, pf.num_row_groups


def write_highcard_sessions(n_files: int = 8, rows_per_file: int = 1500) -> None:
    """High-cardinality UNCLUSTERED multi-file table for the Bloom
    file-index operator: 12,000 unique session_id strings hash-scattered
    across 8 files (so range stats can NEVER prune an equality lookup —
    every file's [min, max] spans the whole keyspace) while each
    session lives in exactly ONE file (so a per-file Bloom prunes a
    point lookup to ~1 file). Deterministic: ids are md5 of a counter,
    file assignment is a different md5 — no RNG state."""
    import hashlib

    total = n_files * rows_per_file
    rows_by_file: list[list[tuple]] = [[] for _ in range(n_files)]
    for i in range(total):
        sid = hashlib.md5(f"sess:{i}".encode()).hexdigest()
        f = int(hashlib.md5(f"file:{i}".encode()).hexdigest()[:8], 16) % n_files
        rows_by_file[f].append((sid, i, i % 97, round((i % 1000) / 7.0, 4)))
    out = os.path.join(OUT_DIR, "sessions_highcard")
    os.makedirs(out, exist_ok=True)
    for f, rows in enumerate(rows_by_file):
        tbl = pa.table(
            {
                "session_id": [r[0] for r in rows],
                "event_id": pa.array([r[1] for r in rows], pa.int64()),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "amount": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
        pq.write_table(tbl, os.path.join(out, f"part-{f}.parquet"))


def write_evolved_events() -> None:
    """Two-generation copy of the sf0.001 events for the schema-evolution
    scan: generation 0 (first half by event_id) lacks the props column
    and predates the device column entirely; generation 1 (second half)
    carries props plus the added device column. Reading the directory
    demands per-file schema reconciliation — exactly what a long-lived
    lake accumulates as producers upgrade."""
    import duckdb

    con = duckdb.connect()
    src = "/root/testdata/sf0.001/events.parquet"
    out = os.path.join(OUT_DIR, "events_evolved")
    os.makedirs(out, exist_ok=True)
    con.sql(
        f"""
        COPY (SELECT event_id, ts, user_id, event_type, value
              FROM '{src}' WHERE event_id < 500 ORDER BY event_id)
        TO '{os.path.join(out, "gen0.parquet")}' (FORMAT PARQUET)
        """
    )
    con.sql(
        f"""
        COPY (SELECT event_id, ts, user_id, event_type, value, props,
                     'dev-' || CAST(user_id % 3 AS VARCHAR) AS device
              FROM '{src}' WHERE event_id >= 500 ORDER BY event_id)
        TO '{os.path.join(out, "gen1.parquet")}' (FORMAT PARQUET)
        """
    )


def write_malformed_csv() -> None:
    """climbs_flat.csv with planted malformed rows for the quarantine
    scan (scan_csv_quarantine): every 25th data row is replaced by a
    type-error twin (length_m = 'NaNm') and every 40th by an
    extra-column twin — the two corruption kinds Spark PERMISSIVE
    marks corrupt AND DuckDB ignore_errors skips (short rows are NOT
    planted: the engines disagree there — Spark null-pads, DuckDB
    errors). Deterministic, derived from climbs_flat.csv."""
    import csv

    with open(os.path.join(OUT_DIR, "climbs_flat.csv"), newline="") as f:
        rows = list(csv.reader(f))
    header, data = rows[0], rows[1:]
    out = [header]
    for i, r in enumerate(data):
        if i % 25 == 12:
            bad = list(r)
            bad[2] = "NaNm"  # unparseable int
            out.append(bad)
        elif i % 40 == 7:
            out.append(list(r) + ["EXTRA"])  # too many columns
        else:
            out.append(r)
    with open(os.path.join(OUT_DIR, "climbs_malformed.csv"), "w", newline="") as f:
        csv.writer(f).writerows(out)


def write_langid_docs() -> None:
    """Language-labeled documents with GENUINELY distinct character
    distributions (the synthetic documents table's lang label is
    independent of its word-salad text, so nothing can be learned from
    it) — the fit/eval corpus for text_langid_predict's char-bigram
    Naive Bayes. Four languages x 60 docs composed from hand-picked
    high-frequency word pools; doc_id parity is the train/test split
    (even = fit, odd = score). Deterministic, committed."""
    pools = {
        "en": (
            "the and of to in is was for with that on as are this be at "
            "by an have from or had not but what all were when there can "
            "which their said will would about time people into year some"
        ).split(),
        "de": (
            "der die das und ist nicht mit von zu den ein eine sich auf "
            "auch nach wird bei einem durch wenn noch werden schon dass "
            "ueber gegen zwischen immer jahre dann unter sehr ohne mehr"
        ).split(),
        "es": (
            "el la de que y en un ser se no haber por con su para como "
            "estar tener le lo todo pero mas hacer o poder decir este ir "
            "otro ese si porque cuando muy sin sobre tambien hasta donde"
        ).split(),
        "fr": (
            "le la de et les des en un une du que est pas pour qui dans "
            "ce il au sur se plus pouvoir par je avec tout faire son "
            "mettre autre mais nous comme ou si leur bien encore aussi"
        ).split(),
    }
    rng = random.Random(4242)
    rows = []
    doc_id = 0
    for lang in sorted(pools):
        words = pools[lang]
        for _ in range(60):
            n = rng.randint(12, 28)
            text = " ".join(rng.choice(words) for _ in range(n))
            rows.append({"doc_id": doc_id, "text": text, "lang": lang})
            doc_id += 1
    tbl = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("text", pa.string()), ("lang", pa.string())]
        ),
    )
    pq.write_table(tbl, os.path.join(OUT_DIR, "langid_docs.parquet"))
    print(f"wrote {len(rows)} langid docs")


def write_nonascii_docs() -> None:
    """Non-ASCII document fixture for the BYTE-level BPE path: mixed
    scripts (accented Latin, Greek, Cyrillic, CJK) plus digit/symbol
    runs. doc_ids are NEGATIVE so the fixture unions with any sf's
    documents table without collision; source is a fixed 'xlang' pack.
    The byte-level tokenizer must give every one of these a NONZERO
    token count (they vanish entirely from the lowercase [a-z] path),
    with n_bytes > n_chars for every non-ASCII row. Deterministic,
    committed."""
    texts = [
        "caf\u00e9 na\u00efve r\u00e9sum\u00e9 fa\u00e7ade touch\u00e9",
        "\u00fcber stra\u00dfe gr\u00fc\u00dfe sch\u00f6n k\u00e4se",
        "ni\u00f1o ma\u00f1ana se\u00f1or jalape\u00f1o a\u00f1o",
        "\u03b1\u03b2\u03b3 \u03b4\u03bf\u03ba\u03b9\u03bc\u03ae \u03ba\u03cc\u03c3\u03bc\u03bf\u03c2 \u03bb\u03cc\u03b3\u03bf\u03c2",
        "\u043f\u0440\u0438\u0432\u0435\u0442 \u043c\u0438\u0440 \u0442\u0435\u0441\u0442 \u0434\u0430\u043d\u043d\u044b\u0435",
        "\u4f8b\u5b50 \u6570\u636e \u6d4b\u8bd5 \u6587\u6863",
        "\u30c6\u30b9\u30c8 \u30c7\u30fc\u30bf \u4f8b",
        "caf\u00e9 123 !!! \u00e9t\u00e9 2024 #tags",
        "mixed ascii and \u00e9\u00e8\u00ea accents plus plain words",
        "\u00e9 \u00e9 \u00e9 caf\u00e9 caf\u00e9 r\u00e9p\u00e9t\u00e9",
        "price: 42,50\u20ac or 37\u00a3 -- \u00bfqu\u00e9?",
        "all ascii control row for contrast, nothing fancy here",
    ]
    rows = [
        {"doc_id": -(i + 1), "source": "xlang", "text": t}
        for i, t in enumerate(texts)
    ]
    tbl = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("doc_id", pa.int64()), ("source", pa.string()), ("text", pa.string())]
        ),
    )
    pq.write_table(tbl, os.path.join(OUT_DIR, "nonascii_docs.parquet"))
    print(f"wrote {len(rows)} nonascii docs")


if __name__ == "__main__":
    main()
    write_flat_forms()
    write_xml_form()
    write_malformed_csv()
    write_partitioned_events()
    write_ranged_events()
    write_evolved_events()
    write_highcard_sessions()
    write_rowgrouped_events()
    write_cdc_changes()
    write_langid_docs()
    write_nonascii_docs()
