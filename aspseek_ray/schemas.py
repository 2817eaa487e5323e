"""Explicit Arrow schemas for every table the engine touches (SURVEY.md §1.3:
the reference's schemas are implicit C structs + fixed MySQL DDL; here they
are explicit pyarrow constants validated at stage boundaries).

Hash columns are int64 (uint64 bit patterns — see functions/hashing.py) so
they round-trip Arrow/Parquet/DuckDB losslessly.
"""

from __future__ import annotations

import pyarrow as pa

# Input contract — BASELINE.json:input_hint (Common-Crawl-style pages).
PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("s")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SEEDS = pa.schema(
    [
        ("url", pa.string()),
        ("depth", pa.int32()),
        ("discovery_seq", pa.int64()),
    ]
)

ROBOTS = pa.schema(
    [
        ("host", pa.string()),
        ("rules", pa.list_(pa.string())),
        ("crawl_delay_ms", pa.int64()),
    ]
)

# One frontier/candidate row (URL record, SURVEY §1.1 row 1).
FRONTIER = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.int64()),
        ("host", pa.string()),
        ("host_hash", pa.int64()),
        ("depth", pa.int32()),
        ("discovery_seq", pa.int64()),
    ]
)

# One fetched row of the crawl trace (FIXTURES.md §4.1 golden_trace).
TRACE = pa.schema(
    [
        ("fetch_seq", pa.int64()),
        ("round", pa.int32()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("discovery_seq", pa.int64()),
        ("status", pa.int32()),
    ]
)

SEEN = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.int64()),
    ]
)

POSTINGS = pa.schema(
    [
        ("word", pa.string()),
        ("word_bucket", pa.int32()),
        ("doc_seq", pa.int64()),
        ("positions", pa.list_(pa.int32())),
    ]
)

LINKS = pa.schema(
    [
        ("src_url_hash", pa.int64()),
        ("dst_url_hash", pa.int64()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, where: str = "") -> pa.Table:
    """Assert ``table`` carries at least ``schema``'s columns with the exact
    types; returns the table column-ordered per schema (extra columns kept,
    appended after). Cheap — metadata-only."""
    names = set(table.schema.names)
    for field in schema:
        if field.name not in names:
            raise ValueError(f"{where}: missing column {field.name!r}")
        have = table.schema.field(field.name).type
        if have != field.type:
            raise TypeError(
                f"{where}: column {field.name!r} is {have}, expected {field.type}"
            )
    ordered = [f.name for f in schema] + [n for n in table.schema.names if n not in {f.name for f in schema}]
    return table.select(ordered)
