"""The driver contract (__spark_entry__.py): entry() runs, queries()
and oracle_sql() are consistent, every oracle is valid DuckDB SQL, and
a sampled subset matches the oracle end-to-end at sf0.001 (the full
gate runs in tools/mini_driver.py at sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


@pytest.fixture(autouse=True)
def _oracle_corpus(sf_dir, monkeypatch):
    """Generated oracles (oracle_gen.py / catalog._independent_bpe)
    train on $SPARK_GRAFT_ORACLE_SF_DIR and REFUSE any other corpus via
    the fingerprint guard — point them at the corpus this module gates
    against (before the guard existed, a mis-trained oracle here was
    silently valid-but-wrong SQL; the guard turned that into the loud
    failure it should be)."""
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)


def test_entry_runs_and_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "source", "lang", "text", "similarity"]


def test_oracle_keys_subset_of_queries():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 30  # the SURVEY §2 surface


def test_all_oracles_are_valid_duckdb(con):
    for name, sql in entrymod.oracle_sql().items():
        try:
            con.sql(sql).fetchall()
        except Exception as exc:  # noqa: BLE001
            pytest.fail(f"oracle for {name} failed in DuckDB: {exc}")


def _canon(v):
    if v is None:
        return "\x00NULL"  # sortable sentinel (rollup rows carry real nulls)
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


# one representative per operator family — the full sweep is
# tools/mini_driver.py (run at sf0.01, the driver's own gate)
SAMPLED = [
    "point_lookup",
    "vector_topk_cosine",
    "find_similar_records",
    "find_similar_by_text",
    "q1_pricing_summary",
    "events_sessionize",
    "dedup_exact_keep_first",
    "token_stats",
    "hybrid_search",
    "orders_asof_event",
    "revenue_rollup",
]


@pytest.mark.parametrize("name", SAMPLED)
def test_query_matches_oracle(spark, sf_dir, con, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    scols = [c.lower() for c in sdf.columns]
    srows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(oracles[name])
    dcols = [c.lower() for c in rel.columns]
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows)
    assert _key(srows, scols) == _key(drows, dcols)


def test_bench_headline_is_subset_of_queries():
    """Every benched name must be a registered query (a rename in the
    catalog must not silently break the bench harness) and the SHARED31
    cross-round subset must stay exactly the first 31 entries."""
    import bench
    from __spark_entry__ import queries

    qs = queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert missing == []
    assert bench.SHARED31 == bench.HEADLINE[:31]
    assert len(bench.SHARED31) == 31


def test_mini_driver_dtype_gate_catches_uncast_hugeint(con):
    """The official driver hashes *pandas* frames; DuckDB types an uncast
    SUM(int) as HUGEINT, which pandas renders float64 — values compare
    equal in Python but the driver hash flips (the r10 q12 red).  The
    mini_driver dtype gate must fail a deliberately uncast fixture."""
    import sys

    sys.path.insert(0, "tools")
    from mini_driver import duck_num_kinds, spark_num_kinds

    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("k", T.StringType()),
        T.StructField("s", T.LongType()),
    ])
    rows = [("a", 3)]
    sk = spark_num_kinds(schema, rows)
    # deliberately uncast: DuckDB -> HUGEINT -> pandas float64
    dk = duck_num_kinds(con.sql(
        "SELECT 'a' AS k, SUM(x) AS s FROM (VALUES (1),(2)) t(x)").df())
    assert sk["s"] == "i" and dk["s"] == "f"  # the gate must see a mismatch
    # the cast form agrees
    dk_ok = duck_num_kinds(con.sql(
        "SELECT 'a' AS k, CAST(SUM(x) AS BIGINT) AS s "
        "FROM (VALUES (1),(2)) t(x)").df())
    assert dk_ok["s"] == "i" == sk["s"]
    # null promotion: an integral Spark column containing nulls lands
    # float64 after arrow->pandas on both engines - not a mismatch
    assert spark_num_kinds(schema, [("a", None)])["s"] == "f"


def test_no_oracle_yields_hugeint_columns(con):
    """Sweep every registered oracle's FINAL relation type signature: a
    HUGEINT/UHUGEINT output column cannot round-trip pandas as an integer
    (no int128 dtype), so the driver-side hash silently floats it.  Every
    integer aggregate in a final select list must be CAST ... AS BIGINT
    (catalog.py convention; q12 was the one escapee)."""
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        try:
            rel = con.sql(sql)
        except Exception:  # noqa: BLE001  validity is tested elsewhere
            continue
        for col, typ in zip(rel.columns, rel.types):
            if "HUGEINT" in str(typ).upper():
                bad.append(f"{name}.{col}")
    assert bad == [], f"uncast int128 aggregate in final select: {bad}"
