"""PII scrub: real-redaction parity with DuckDB on injected PII (the
driver corpus has no digits, so the registry query only pins the
no-op agreement; this is the positive-case check)."""

import duckdb
import pytest

from s3_sqs_data_ingestion_demo_spark.operators.text import (
    PII_PATTERNS,
    pii_scrub,
)

DOCS = [
    (1, "contact me at jane.doe+x@mail-host.co.uk or j@x.io today"),
    (2, "ssn 123-45-6789 phone 555-123-4567 and 555.987.6543"),
    (3, "server 192.168.0.1 backup 10.0.0.255"),
    (4, "no pii here at all"),
    (5, "edge: 123-45-6789x and a@b.c (tld too short)"),
]


@pytest.fixture(scope="module")
def scrubbed(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r.id: r for r in pii_scrub(df).collect()}


def test_pii_counts(scrubbed):
    assert (scrubbed[1].n_email, scrubbed[1].n_ssn) == (2, 0)
    assert (scrubbed[2].n_ssn, scrubbed[2].n_phone) == (1, 2)
    assert scrubbed[3].n_ipv4 == 2
    assert all(
        getattr(scrubbed[4], f"n_{n}") == 0 for n, _ in PII_PATTERNS
    )
    # a trailing word char kills the \b boundary (9→x is no boundary),
    # and a@b.c has a 1-char tld — neither may match
    assert scrubbed[5].n_ssn == 0
    assert scrubbed[5].n_email == 0


def test_pii_scrub_matches_duckdb(scrubbed):
    con = duckdb.connect()
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{p}'))::BIGINT AS n_{n}"
        for n, p in PII_PATTERNS
    )
    scrub = "text"
    for n, p in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{p}', '<{n.upper()}>', 'g')"
    rows = con.execute(
        f"SELECT doc_id, {counts}, md5({scrub}) AS h FROM (SELECT * FROM ("
        "VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") v(doc_id, text))"
    ).fetchall()
    for row in rows:
        got = scrubbed[row[0]]
        assert tuple(
            getattr(got, f"n_{n}") for n, _ in PII_PATTERNS
        ) == row[1:-1], row[0]
        assert got.scrubbed_hash == row[-1], row[0]
