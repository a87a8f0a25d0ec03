"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB over the same
parquet, compare row count, column names, and values (order-insensitive,
full precision). Usage:

    python tools/mini_driver.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, ".")

import duckdb

from __spark_entry__ import oracle_sql, queries
from secure_agent_api_vector_search_spark.session import get_session

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def spark_num_kinds(schema, rows) -> dict:
    """Numeric dtype *kind* each Spark column lands on after the official
    driver's pandas conversion: 'i' (integral) or 'f' (floating); non-numeric
    columns are omitted.  An integral column containing nulls is promoted to
    'f' — arrow→pandas coerces int-with-null to float64 on both engines, so
    only genuine schema-type differences surface as mismatches."""
    from pyspark.sql import types as T

    kinds = {}
    for i, f in enumerate(schema.fields):
        dt = f.dataType
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            k = "i"
            if any(r[i] is None for r in rows):
                k = "f"
        elif isinstance(dt, (T.FloatType, T.DoubleType)):
            k = "f"
        else:
            continue
        kinds[f.name.lower()] = k
    return kinds


def duck_num_kinds(pdf) -> dict:
    """Numeric dtype kinds of the DuckDB result after .df() — the same
    pandas frame the official driver hashes.  DuckDB types an uncast
    SUM(int) as HUGEINT, which pandas renders float64: that is the exact
    class of silent value-repr flip (4109 vs 4109.0) this check catches
    (VERDICT r10 task 1 — the q12_shipmode_priority red)."""
    kinds = {}
    for c in pdf.columns:
        k = pdf[c].dtype.kind
        if k in ("i", "u"):
            kinds[c.lower()] = "i"
        elif k == "f":
            kinds[c.lower()] = "f"
    return kinds


def register(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    for t in TABLES:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")


def canon(v):
    if v is None:
        return "\x00NULL"  # sortable sentinel (rollup rows carry real nulls)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # generated oracles (registry callable-oracle seam) must read the
    # same corpus this run gates against
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_session("mini_driver")
    con = duckdb.connect()
    register(con, sf_dir)
    qs, oracles = queries(), oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows, {len(scols)} cols  [{dt:.1f}s] (rows-only)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            n_fail += 1
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = ok_cols and ok_count and rows_key(srows, [c.lower() for c in scols]) == rows_key(drows, dcols)
        # dtype gate: the official driver hashes pandas frames, so an
        # int column on one side that lands float64 on the other
        # (uncast HUGEINT aggregate) is a hash red even when the Python
        # values compare equal.  Re-run the oracle through .df() (cheap
        # at sf0.01) and compare numeric kinds against the Spark schema.
        dtype_bad = []
        if ok_cols:
            try:
                sk = spark_num_kinds(sdf.schema, srows)
                dk = duck_num_kinds(con.sql(oracles[name]).df())
                dtype_bad = [
                    (c, sk[c], dk[c])
                    for c in sorted(set(sk) & set(dk))
                    if sk[c] != dk[c]
                ]
            except Exception:  # noqa: BLE001  dtype probe is best-effort
                dtype_bad = []
        if dtype_bad:
            print(
                f"FAIL  {name}: dtype kind mismatch (driver hashes pandas "
                f"frames): "
                + ", ".join(f"{c}: spark={a} duckdb={b}" for c, a, b in dtype_bad)
            )
            n_fail += 1
            continue
        if ok_cols and ok_count and ok_vals:
            print(f"PASS  {name}: {len(srows)} rows  [{dt:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL  {name}: cols={ok_cols} count={ok_count}({len(srows)}/{len(drows)}) vals={ok_vals}")
            if ok_cols and ok_count and not ok_vals:
                sk = rows_key(srows, [c.lower() for c in scols])
                dk = rows_key(drows, dcols)
                for a, b in zip(sk, dk):
                    if a != b:
                        print(f"      spark : {a}\n      duckdb: {b}")
                        break
            elif not ok_cols:
                print(f"      spark cols : {sorted(scols)}\n      duckdb cols: {sorted(dcols)}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
