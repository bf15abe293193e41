"""Differential check of every oracled documents-table query on a
hostile text battery: NULLs, empty/whitespace-only strings, NBSP and
other unicode whitespace, emoji, newlines/tabs, long runs.

The driver's correctness gate runs on clean generated text, so
cross-engine divergences in the NULL/unicode edges are invisible to it.
This battery caught three real oracle-restatement bugs on first run:
md5(NULL) vs the exact-dedup NULL sentinel, NULL text falling through
the language-id CASE to 'zh', and DuckDB's trim() stripping unicode
spaces where Spark's strips only ASCII space (doc_fingerprint NBSP
mismatch).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HOSTILE_TEXTS = [
    None,
    "",
    " ",
    "  ",
    "a  b",
    "tab\there",
    "new\nline",
    "\u00a0nbsp\u00a0sep",  # NBSP: DuckDB default trim strips it, Spark doesn't
    "\u2003em-space\u2003lead",  # unicode whitespace outside Java regex \s
    "trailing space ",
    " leading",
    "\U0001f600 emoji \U0001f600\U0001f600",
    "\u00e9 unicode \u00fc",
    "\u4e2d\u6587 \u6587\u672c",
    "a" * 5000,
    "word " * 50,
    "the and of to in is a",
    "der die und das ist",
    "1 2 3 4.5",
]


@pytest.fixture(scope="module")
def hostile_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile_docs")
    rows = [
        (
            i,
            t,
            ["en", "de", "fr"][i % 3],
            ["web", "book"][i % 2],
            len(t) if t is not None else None,
        )
        for i, t in enumerate(HOSTILE_TEXTS)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def _doc_query_names():
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    return sorted(n for n in entry.queries() if n.startswith("doc_") and n in oracles)


@pytest.mark.parametrize("name", _doc_query_names())
def test_doc_query_matches_oracle_on_hostile_text(spark, hostile_sf_dir, name):
    import duckdb

    import __spark_entry__ as entry
    from check_oracle import frame_to_rows

    sdf = entry.queries()[name](spark, hostile_sf_dir)
    s_norm, s_cols = frame_to_rows([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{hostile_sf_dir}/documents.parquet'"
    )
    res = con.execute(entry.oracle_sql()[name])
    d_norm, d_cols = frame_to_rows(res.fetchall(), [d[0] for d in res.description])
    con.close()

    assert s_cols == d_cols
    assert s_norm == d_norm
