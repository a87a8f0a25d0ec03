"""Multi-dimensional data-skipping layout: Z-order clustered writes.

[EXT] scale machinery (SURVEY.md §2.1 scans/sinks family): the
reference delegates physical layout to Postgres heap + one ivfflat
index (sql/05_vector_index.sql:3-5); a 100 TB parquet lake instead
lives or dies by FILE SKIPPING — the reader prunes whole files/row
groups whose min/max stats exclude the predicate, so the layout that
minimizes per-file value ranges on the filter columns is the layout
that minimizes scan bytes.

A linear sort gives perfect skipping on ONE column and none on the
others. Interleaving the bits of several columns' bucket ranks (the
Z-order / Morton curve, as in Delta Lake's OPTIMIZE ZORDER BY and
countless OLAP stores) makes each written file cover a small
hyper-rectangle of the value space, so min/max pruning works on EVERY
clustered column at once — the standard trade: each dimension's
per-file range grows from ~1/n_files to ~(1/n_files)^(1/d), still a
massive cut vs the unclustered ~100% per file.

Numeric columns are bucketed by linear min/max scaling (one aggregate
job; roughly uniform data assumed — swap in quantile ranks for heavy
skew). String columns are bucketed by hash: locality within the curve
is then meaningless for RANGES, but point-equality skipping still
works (equal values land in the same bucket run). All bucket math is
plain codegen expressions — no Python in the write path beyond the
driver-side min/max collect.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "double", "float",
            "date", "timestamp", "decimal")


def _as_double(df: DataFrame, col: str) -> Column | None:
    """``col`` as a double expression for rank math, or None for
    non-numeric types (which hash instead). Dates/timestamps rank by
    epoch seconds — the headline z-order use case is a time column."""
    dt = dict(df.dtypes)[col]
    if not any(dt.startswith(t) for t in _NUMERIC):
        return None
    c = F.col(col)
    if dt.startswith("date") or dt.startswith("timestamp"):
        c = c.cast("timestamp").cast("double")
    return c.cast("double")


def _bucket_col(df: DataFrame, col: str, bits: int, lo, hi) -> Column:
    """Rank ``col`` into [0, 2^bits): linear scaling for numerics
    (driver-known lo/hi, already in double epoch form for time types),
    hash for strings. Nulls land in bucket 0."""
    cap = (1 << bits) - 1
    c = _as_double(df, col)
    if c is not None:
        if lo is None or hi is None:  # all-NULL column: everything bucket 0
            return F.lit(0).cast("long")
        lo_f, hi_f = float(lo), float(hi)
        if hi_f <= lo_f:
            return F.lit(0).cast("long")
        scaled = F.floor((c - F.lit(lo_f)) / F.lit(hi_f - lo_f) * (cap + 1))
        return F.coalesce(
            F.least(F.lit(cap).cast("long"), F.greatest(F.lit(0).cast("long"),
                                                        scaled.cast("long"))),
            F.lit(0).cast("long"),
        )
    return F.coalesce(
        F.pmod(F.xxhash64(F.col(col)), F.lit(cap + 1)).cast("long"),
        F.lit(0).cast("long"),
    )


def _quantile_bucket(df: DataFrame, col: str, bits: int) -> Column:
    """Rank ``col`` into [0, 2^bits) by APPROXIMATE QUANTILE cut points
    (one Greenwald-Khanna sketch pass, driver-held cuts) instead of
    linear min/max scaling — the skew-proof mode: equal ROWS per
    bucket, so a heavy-tailed column (user ids, prices, timestamps
    with bursts) still spreads across the curve instead of collapsing
    most of its mass into a handful of buckets (measured on the events
    table: a 1% user_id range touched 7/8 linearly-scaled files).
    The bucket map is an Arrow-batched searchsorted — Python in the
    WRITE path only, never the read path."""
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    dcol = _as_double(df, col)
    # approxQuantile rejects time types: sketch over the derived double
    cuts = df.select(dcol.alias("_q")).stat.approxQuantile(
        "_q", probs, 1.0 / (4 * n_buckets)
    )
    arr = np.asarray(cuts, dtype=np.float64)
    cap = n_buckets - 1

    @F.pandas_udf("long")
    def bucket(v: pd.Series) -> pd.Series:
        x = v.to_numpy(dtype=np.float64, na_value=np.nan)
        res = np.searchsorted(arr, x, side="right").astype(np.int64)
        res[~np.isfinite(x)] = 0  # nulls/NaN -> bucket 0, like linear mode
        return pd.Series(np.minimum(res, cap))

    return bucket(dcol)


def zorder_key(buckets: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each bucket column into one
    Morton key (static unroll — bits*len(buckets) shift/and/or codegen
    terms, no UDF). len(buckets)*bits must fit in an int64."""
    n = len(buckets)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds the int64 key")
    terms = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + j)
        for i in range(bits)
        for j, c in enumerate(buckets)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    n_files: int = 32,
    rank: str = "linear",
) -> None:
    """Write ``df`` as parquet clustered on the Z-order curve over
    ``cols``: one stats job (min/max aggregate, or a quantile sketch
    for ``rank="quantile"``), then ONE range exchange on the Morton key
    + in-partition sort, so each of the ``n_files`` output files covers
    a compact hyper-rectangle and the reader's min/max pruning bites on
    every clustered column (demonstrated quantitively in
    tests/test_layout.py via the written files' zone maps).

    ``rank="linear"`` buckets numerics by min/max scaling (pure
    codegen, assumes roughly uniform values); ``rank="quantile"``
    buckets by approx-quantile row rank — use it when a clustered
    column is heavy-tailed. String columns hash in both modes."""
    if not cols:
        raise ValueError("need at least one clustering column")
    if rank not in ("linear", "quantile"):
        raise ValueError(f"unknown rank mode {rank!r}")
    for c in cols:
        if "_zkey" == c:
            raise ValueError("'_zkey' is the reserved working column")
    dts = dict(df.dtypes)
    numeric = {
        c for c in cols if any(dts[c].startswith(t) for t in _NUMERIC)
    }
    if rank == "quantile":
        # quantile mode caps at 2^10 cuts: past that the sketch pass
        # costs more than the skipping it buys
        qbits = min(bits, 10)
        buckets = [
            _quantile_bucket(df, c, qbits)
            if c in numeric
            else _bucket_col(df, c, qbits, None, None)
            for c in cols
        ]
        bits = qbits
    else:
        aggs = []
        for c in cols:
            # min/max over the DOUBLE form, so time columns yield epoch
            # scalars the bucket math can consume (not datetimes)
            d = _as_double(df, c)
            if d is not None:
                aggs += [F.min(d).alias(f"_lo_{c}"), F.max(d).alias(f"_hi_{c}")]
        stats = df.agg(*aggs).first() if aggs else {}
        buckets = [
            _bucket_col(
                df, c, bits,
                stats[f"_lo_{c}"] if c in numeric else None,
                stats[f"_hi_{c}"] if c in numeric else None,
            )
            for c in cols
        ]
    (
        df.withColumn("_zkey", zorder_key(buckets, bits))
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    small_frac: float = 0.5,
) -> dict:
    """Bin-pack a flat parquet directory's small files into
    ~``target_file_bytes`` outputs — the maintenance job every
    streaming sink needs: micro-batch appends leave hundreds of tiny
    files whose per-file open/footer cost dominates scans long before
    data volume does.

    No-op (nothing rewritten, no jobs beyond the listing) unless the
    directory holds more files than the target layout AND at least one
    file is under ``small_frac * target_file_bytes``. The rewrite is
    coalesce (merge-only, NO shuffle — small files pack into fewer
    tasks) into a temp sibling.

    Swap discipline — this is PRIMARY data, so no step may delete the
    only copy: the live directory is RENAMED to a backup sibling, the
    rewrite renamed into place, and only then is the backup deleted.
    Each rename is atomic on HDFS-compatible stores; a crash between
    the two renames leaves the data intact at the dot-prefixed backup
    (recoverable by hand, never lost), at the cost of a brief window
    where ``path`` does not resolve — the honest limit of
    swap-by-rename without a transactional metastore. The tmp/backup
    siblings are DOT-prefixed and '='-free, so when ``path`` is one
    ``key=value`` partition directory of a larger table, partition
    discovery over the table root can never mistake them for
    partitions (Spark skips dot/underscore names unless they contain
    '=' — a '..._compact_bak' name WITH '=' would be read as a bogus
    partition, double-counting the whole epoch).

    Returns {files_before, files_after, bytes, rewritten}.
    """
    import posixpath

    from secure_agent_api_vector_search_spark.sources.fsutil import fs_delete

    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    listing = list(fs.listStatus(p))
    names = [st.getPath().getName() for st in listing]
    if "_spark_metadata" in names:
        # native streaming file sink: readers resolve files through the
        # transaction log, NOT the directory listing — a rewrite would
        # leave the log pointing at deleted files and the compacted
        # ones invisible. Only foreachBatch (log-free) sinks compact.
        raise ValueError(
            f"compact_parquet: {path!r} is a streaming file-sink output "
            "(_spark_metadata transaction log present); compacting it "
            "would corrupt the log. Use an epoch-partitioned foreachBatch "
            "sink + compact_partitions instead"
        )
    sizes = [
        (st.getPath().getName(), st.getLen())
        for st in listing
        if st.getPath().getName().endswith(".parquet")
    ]
    total = sum(s for _, s in sizes)
    n_target = max(1, -(-total // target_file_bytes))  # ceil
    needs = len(sizes) > n_target and any(
        s < small_frac * target_file_bytes for _, s in sizes
    )
    out = {"files_before": len(sizes), "bytes": total, "rewritten": bool(needs)}
    if not needs:
        out["files_after"] = len(sizes)
        return out
    parent, base = posixpath.split(path.rstrip("/"))
    safe = base.replace("=", "-")
    tmp = f"{parent}/.{safe}_compact_tmp"
    bak = f"{parent}/.{safe}_compact_bak"
    (
        spark.read.parquet(path)
        .coalesce(int(n_target))
        .write.mode("overwrite")
        .parquet(tmp)
    )
    tmp_p = jvm.org.apache.hadoop.fs.Path(tmp)
    bak_p = jvm.org.apache.hadoop.fs.Path(bak)
    if fs.exists(bak_p):
        fs.delete(bak_p, True)  # stale backup from an older crashed run
    if not fs.rename(p, bak_p):
        raise IOError(f"compact: rename {path!r} -> {bak!r} failed")
    if not fs.rename(tmp_p, p):
        # put the original back rather than leave the path dangling —
        # and if even that fails, say exactly where the data lives
        if not fs.rename(bak_p, p):
            raise IOError(
                f"compact: rename {tmp!r} -> {path!r} failed AND restoring "
                f"the original failed — the primary data is intact at "
                f"{bak!r}; rename it back to {path!r} by hand"
            )
        raise IOError(f"compact: rename {tmp!r} -> {path!r} failed")
    fs_delete(spark, bak)
    out["files_after"] = sum(
        1
        for st in fs.listStatus(p)
        if st.getPath().getName().endswith(".parquet")
    )
    return out


def compact_partitions(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    small_frac: float = 0.5,
) -> dict:
    """:func:`compact_parquet` applied per PARTITION directory
    (``key=value`` subdirs) — the maintenance form for this engine's
    epoch-partitioned streaming sinks. Compaction must stay WITHIN each
    partition: the ``_epoch_id`` layout is the sinks' replay-idempotence
    key (a replayed epoch dynamic-overwrites its own partition), so
    merging files across epochs would turn an exactly-once replay into
    duplication. Partition values live in the directory name, so the
    per-directory rewrite preserves them for outer reads (and the
    swap's tmp/backup siblings are dot-prefixed + '='-free, so root
    readers can never discover them as partitions).

    Returns aggregate stats: {partitions, rewritten, files_before,
    files_after}.
    """
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    parts = [
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isDirectory() and "=" in st.getPath().getName()
    ]
    out = {"partitions": len(parts), "rewritten": 0,
           "files_before": 0, "files_after": 0}
    for name in sorted(parts):
        stats = compact_parquet(
            spark, f"{path}/{name}", target_file_bytes, small_frac
        )
        out["files_before"] += stats["files_before"]
        out["files_after"] += stats["files_after"]
        out["rewritten"] += int(stats["rewritten"])
    return out


def zone_map(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max of ``cols`` for a parquet directory — the same
    footer statistics the reader's skipping consults, surfaced so
    layout quality is measurable: one dict per file with
    {file, n_rows, <col>_min, <col>_max}."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        row = {"file": name, "n_rows": md.num_rows}
        for c in cols:
            lo, hi = None, None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(idx[c]).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            row[f"{c}_min"], row[f"{c}_max"] = lo, hi
        out.append(row)
    return out


def files_touched(zones: list[dict], col: str, lo, hi) -> int:
    """How many files a range predicate ``col BETWEEN lo AND hi`` must
    read given a :func:`zone_map` — the skipping arithmetic the parquet
    reader performs with the same stats."""
    n = 0
    for z in zones:
        zlo, zhi = z[f"{col}_min"], z[f"{col}_max"]
        if zlo is None or (zhi >= lo and zlo <= hi):
            n += 1
    return n
