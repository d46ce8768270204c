"""No-split (next-fit) packing: invariant and edge-case tests.

The gate query value-checks the placement against a recursive-CTE SQL
oracle; these tests pin the SEMANTIC invariants that must hold for any
input — no doc straddles a pack, offsets tile contiguously, oversize
docs isolate — plus the report arithmetic."""

import pytest
from pyspark.sql import functions as F

from vldt_spark.functions.packing import pack_nextfit, packing_report


@pytest.fixture(scope="module")
def layout(spark):
    rows = [(i, 100 + (i * 37) % 900) for i in range(200)] + [
        (900, 5000),  # oversize: longer than max_tokens
        (901, 0),     # zero length: excluded
        (902, None),  # null length: excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, n_tok long")
    out = pack_nextfit(docs, max_tokens=1024, buckets=4).collect()
    return {r["doc_id"]: r for r in out}


def test_exclusions_and_coverage(layout):
    assert 901 not in layout and 902 not in layout
    assert len(layout) == 201


def test_no_doc_straddles_and_offsets_tile(layout):
    """Within every (bucket, pack): offsets start at 0 and tile
    contiguously (offset_k+1 = offset_k + len_k), and no NON-OVERSIZE
    pack exceeds max_tokens."""
    packs = {}
    for r in layout.values():
        packs.setdefault((r["bucket"], r["pack_id"]), []).append(r)
    for (_, _), rows in packs.items():
        rows.sort(key=lambda r: r["offset_in_pack"])
        assert rows[0]["offset_in_pack"] == 0
        fill = 0
        for r in rows:
            assert r["offset_in_pack"] == fill
            fill += r["item_len"]
        if len(rows) > 1:
            assert fill <= 1024  # multi-doc packs never overflow


def test_oversize_doc_is_alone_in_its_pack(layout):
    big = layout[900]
    assert big["offset_in_pack"] == 0
    siblings = [
        r for r in layout.values()
        if (r["bucket"], r["pack_id"]) == (big["bucket"], big["pack_id"])
    ]
    assert siblings == [big]


def test_deterministic_across_runs(spark):
    docs = spark.createDataFrame(
        [(i, 100 + i % 500) for i in range(100)], "doc_id long, n_tok long"
    )
    a = sorted(map(tuple, pack_nextfit(docs, max_tokens=512, buckets=3).collect()))
    b = sorted(map(tuple, pack_nextfit(docs, max_tokens=512, buckets=3).collect()))
    assert a == b


def test_report_arithmetic(spark):
    # one bucket -> one sequential stream, layout fully predictable
    docs = spark.createDataFrame(
        [(1, 600), (2, 600), (3, 300), (4, 2000)], "doc_id long, n_tok long"
    )
    layout = pack_nextfit(docs, max_tokens=1000, buckets=1)
    row = packing_report(layout, max_tokens=1000).collect()[0]
    assert row["n_docs"] == 4
    assert row["total_tokens"] == 3500
    assert row["oversize_packs"] == 1
    # pads: every non-oversize pack contributes max-fill; fills depend on
    # hash order, but total pad = n_nonoversize*1000 - (3500 - 2000)
    assert row["pad_tokens"] == (row["n_packs"] - 1) * 1000 - 1500
