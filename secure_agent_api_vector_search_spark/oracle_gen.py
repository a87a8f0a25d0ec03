"""Generated-oracle builders for gate entries whose expected output is
only SQL-expressible as a WITNESS: a deterministic fixed-seed algorithm
(k-means clustering, perceptual hashing, greedy screens) replayed
independently at oracle-collection time, with the expected rows — or the
algorithm-chosen candidate/assignment sets — embedded in the SQL as
VALUES tables for DuckDB to check (and, where possible, to re-derive
the final scoring/ranking from the raw parquet itself).

This is the same pattern as catalog._independent_bpe (the registry's
callable-oracle seam, plans/registry.py:27): the generator runs at
``oracle_sql()`` collection time against the gate corpus, reads the
parquet directly through DuckDB (no Spark), and returns a plain SQL
string. Replays here share ONLY the seeded k-means routine
(functions/kmeans.py — pure numpy, deterministic) with the operators;
feature extraction, hashing, greedy screens, and ranking are
re-implemented from the documented fixture/algorithm specs so the
Spark pipeline (Arrow maps, banding joins, encode/decode round-trips)
is checked against a straight-line in-memory derivation.

Corpus guard: every generated oracle embeds a fingerprint (row count +
md5 over the ordered id column) of the corpus it was generated against,
and the SQL itself verifies the gate corpus matches BEFORE returning
rows — a mis-set ``$SPARK_GRAFT_ORACLE_SF_DIR`` fails loudly with a
descriptive error() instead of presenting as a value mismatch
(VERDICT r7 "What's wrong" #1).

Reference note: the reference has none of these operators (its engine
is two SQL templates over pgvector, tools.yaml:22-39); these gate the
[EXT] SURVEY §2.10/§2.3 surface.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np

DEFAULT_SF_DIR = "/root/testdata/sf0.01"

_SQL_CACHE: dict[tuple, str] = {}


def _memo_sql(fn):
    """Memoize a generated-oracle builder per (corpus, call args): the
    k-means/feature replays are deterministic in both, so a driver that
    collects oracle_sql() more than once pays the replay once."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        key = (fn.__name__, oracle_sf_dir(), args, tuple(sorted(kwargs.items())))
        if key not in _SQL_CACHE:
            _SQL_CACHE[key] = fn(*args, **kwargs)
        return _SQL_CACHE[key]

    return wrapped


def oracle_sf_dir() -> str:
    """The corpus the generated oracles train/replay against. The
    external driver gates at sf0.01 (the default); tools/mini_driver.py
    exports its own sf_dir. A mismatch between this and the gate corpus
    is caught loudly by the fingerprint guard below."""
    return os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", DEFAULT_SF_DIR)


# ---------------------------------------------------------------------------
# corpus fingerprint guard
# ---------------------------------------------------------------------------

_FP_CACHE: dict[tuple[str, str], tuple[int, str]] = {}

# CONTENT fingerprint, not just ids: the driver testdata ships the same
# id range (0..499) at sf0.001 and sf0.01 with different text, so an
# id-only digest cannot tell the corpora apart. One md5 over the
# ordered (id, payload) stream per table; payload rendering happens in
# the same DuckDB build on both sides, so it is deterministic.
_FP_EXPR = {
    "documents": (
        "md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || "
        "coalesce(text, ''), '|' ORDER BY doc_id))"
    ),
    "embeddings": (
        "md5(string_agg(CAST(vec_id AS VARCHAR) || ':' || "
        "coalesce(CAST(embedding AS VARCHAR), ''), '|' ORDER BY vec_id))"
    ),
}


def corpus_fingerprint(sf_dir: str, table: str) -> tuple[int, str]:
    """(row count, content md5) of one gate table."""
    key = (sf_dir, table)
    if key not in _FP_CACHE:
        import duckdb

        con = duckdb.connect()
        n, fp = con.sql(
            f"SELECT COUNT(*), {_FP_EXPR[table]} "
            f"FROM '{sf_dir}/{table}.parquet'"
        ).fetchone()
        con.close()
        _FP_CACHE[key] = (int(n), fp)
    return _FP_CACHE[key]


def with_corpus_guard(core_sql: str, table: str, id_col: str, sf_dir: str) -> str:
    """Wrap a generated oracle so it REFUSES to run against a corpus
    other than the one it was generated for: the guard CTE recomputes
    the table's content fingerprint inside the gate's own DuckDB
    session and raises a descriptive error() on mismatch. CASE
    evaluates the error branch lazily, so a matching corpus pays one
    digest aggregate. (``id_col`` kept in the signature for the error
    message only; the digest covers content, see _FP_EXPR.)"""
    n, fp = corpus_fingerprint(sf_dir, table)
    msg = (
        f"generated oracle was built against {sf_dir} ({table}: {n} rows, "
        f"content fingerprint {fp}) but the gate corpus differs; set "
        f"SPARK_GRAFT_ORACLE_SF_DIR to the gate sf_dir so the oracle "
        f"regenerates on the right corpus"
    )
    return f"""
WITH _expected(n, fp) AS (VALUES ({n}, '{fp}')),
_actual AS (SELECT COUNT(*) AS n, {_FP_EXPR[table]} AS fp
            FROM {table}),
_guard AS (SELECT CASE WHEN a.n = e.n AND a.fp = e.fp THEN 1
                       ELSE error('{msg}') END AS ok
           FROM _actual a, _expected e)
SELECT _q.* FROM (
{core_sql}
) AS _q CROSS JOIN _guard WHERE _guard.ok = 1"""


# ---------------------------------------------------------------------------
# parquet loaders (DuckDB, id order == the order Spark's single-file
# scan collects in; ORDER BY the id column makes that explicit)
# ---------------------------------------------------------------------------


def _load_documents(sf_dir: str) -> list[tuple[int, str]]:
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    con.close()
    return [(int(i), t) for i, t in rows]


def _load_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(ids int64, vectors float64 (n × dim)) — float32 parquet values
    widened exactly, matching load_embeddings' array<double> cast."""
    import duckdb

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        f"ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([int(r[0]) for r in rows], dtype=np.int64)
    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, vecs


# ---------------------------------------------------------------------------
# small SQL helpers (duplicated from catalog's formula strings to avoid
# an import cycle — catalog imports this module)
# ---------------------------------------------------------------------------

_E = "CAST(e.embedding AS DOUBLE[])"


def _cos_sql(a: str, b: str) -> str:
    return (
        f"list_dot_product({a}, {b}) / "
        f"(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
    )


def _values_rows(rows: list[str]) -> str:
    return ",\n  ".join(rows)


def _sql_float(x: float) -> str:
    """Exact IEEE-double literal: repr() round-trips through a
    VARCHAR→DOUBLE cast. A BARE numeric literal would NOT round-trip —
    DuckDB parses it as DECIMAL first and the DECIMAL→DOUBLE hop can
    land one ulp off (observed on the video feature means)."""
    return f"CAST('{repr(float(x))}' AS DOUBLE)"


# ---------------------------------------------------------------------------
# image_neardup: perceptual-hash pair replay
# ---------------------------------------------------------------------------


def _image_raster(text: str) -> np.ndarray:
    """The synthetic P5 fixture spec (operators/multimodal.py::
    synthetic_image_payloads): digest-seeded byte pattern, digest-sized
    dimensions — rebuilt directly as the raster array, deliberately
    skipping the netpbm encode/decode the operator path goes through."""
    d = hashlib.sha256((text or "").encode()).digest()
    h, w = 16 + d[0] % 48, 16 + d[1] % 48
    return np.frombuffer(
        (d * ((h * w) // len(d) + 1))[: h * w], dtype=np.uint8
    ).reshape(h, w, 1)


def _ahash64_replay(img: np.ndarray) -> int:
    """Independent average-hash: 8×8 nearest-neighbor thumbnail, mean
    threshold, row-major bit pack, signed-long convention."""
    h, w, _ = img.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    t = img[ys][:, xs].astype(np.float64).mean(axis=2)
    bits = (t > t.mean()).ravel()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


# per-byte popcount table (numpy<2 has no bitwise_count)
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _hamming_block(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(len(a) × len(b)) pairwise Hamming distances over uint64 words:
    XOR, byte view, per-byte table popcount, sum over the 8 bytes."""
    x = a[:, None] ^ b[None, :]
    return _POP8[x.view(np.uint8).reshape(len(a), len(b), 8)].sum(
        axis=2, dtype=np.int64
    )


@_memo_sql
def image_neardup_oracle(max_hamming: int = 3, chunk: int = 1024) -> str:
    """Expected (id_a, id_b, hamming) pair set for catalog.image_neardup:
    every corpus image plus the planted +2-brightness re-encodes of the
    first 20 docs, EXACT all-pairs Hamming ≤ 3 — legitimate as the full
    expected set because at max_hamming=3 the operator's 4-chunk
    pigeonhole banding has guaranteed recall (≤3 differing bits cannot
    touch all four 16-bit chunks), so banded output ≡ the exact set."""
    sf_dir = oracle_sf_dir()
    ids: list[int] = []
    fps: list[int] = []
    for doc_id, text in _load_documents(sf_dir):
        img = _image_raster(text)
        ids.append(doc_id)
        fps.append(_ahash64_replay(img))
        if doc_id < 20:
            shifted = np.clip(img.astype(np.int32) + 2, 0, 255).astype(np.uint8)
            ids.append(doc_id + 700000)
            fps.append(_ahash64_replay(shifted))
    id_arr = np.asarray(ids, dtype=np.int64)
    fp_arr = np.asarray(fps, dtype=np.int64).view(np.uint64)
    pairs: list[str] = []
    n = len(id_arr)
    for s in range(0, n, chunk):
        block = fp_arr[s : s + chunk]
        hams = _hamming_block(block, fp_arr)
        for bi, gj in zip(*np.nonzero(hams <= max_hamming)):
            i = s + int(bi)
            j = int(gj)
            if i < j:  # each unordered pair once; skip self
                a, b = int(id_arr[i]), int(id_arr[j])
                lo, hi = (a, b) if a < b else (b, a)
                pairs.append(f"({lo}, {hi}, {int(hams[bi, gj])})")
    pairs.sort()
    if not pairs:
        core = (
            "SELECT CAST(NULL AS BIGINT) AS id_a, CAST(NULL AS BIGINT) AS id_b, "
            "CAST(NULL AS INT) AS hamming WHERE FALSE"
        )
    else:
        core = f"""
  WITH p(id_a, id_b, hamming) AS (VALUES
  {_values_rows(pairs)})
  SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
         CAST(hamming AS INT) AS hamming
  FROM p"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


def _hamming_components(
    ids: np.ndarray, fps: np.ndarray, max_hamming: int, chunk: int = 1024
) -> dict[int, int]:
    """id -> component root over the EXACT all-pairs Hamming ≤ budget
    graph (union-find; legitimate as the banded operator's expected
    components by the 4-chunk pigeonhole at budget ≤ 3)."""
    parent = {int(i): int(i) for i in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    fp_u = fps.view(np.uint64)
    n = len(ids)
    for s in range(0, n, chunk):
        hams = _hamming_block(fp_u[s : s + chunk], fp_u)
        for bi, gj in zip(*np.nonzero(hams <= max_hamming)):
            i, j = s + int(bi), int(gj)
            if i < j:
                ra, rb = find(int(ids[i])), find(int(ids[j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in parent}


@_memo_sql
def image_dedup_streaming_oracle(max_hamming: int = 3) -> str:
    """Expected admitted corpus for catalog.image_dedup_streaming:
    replay the two delivery epochs (multimodal.py::
    synthetic_image_stream_epochs) with the INDEPENDENT numpy aHash
    (_ahash64_replay) and exact all-pairs Hamming components, applying
    the stream's policy — epoch 1 keeps each component's min id;
    epoch 2 drops nodes whose component touches any admitted image and
    keeps min id among the rest. No operator code runs: decode, hash,
    banding, and the streaming admit policy are all pinned."""
    sf_dir = oracle_sf_dir()
    ep1: list[tuple[int, int]] = []  # (id, fp)
    ep2: list[tuple[int, int]] = []
    for doc_id, text in _load_documents(sf_dir):
        base = _image_raster(text)
        ep1.append((doc_id, _ahash64_replay(base)))
        if doc_id % 7 == 0:
            ep2.append((doc_id + 1_000_000, _ahash64_replay(base)))
        if doc_id % 11 == 0:
            ep2.append((doc_id + 2_000_000, _ahash64_replay(base)))
        if doc_id % 13 == 0:
            d = hashlib.sha256((text or "").encode()).digest()
            h, w = 8 + d[22] % 16, 8 + d[23] % 16
            fresh = np.frombuffer(
                (d[::-1] * ((h * w) // len(d) + 1))[: h * w], dtype=np.uint8
            ).reshape(h, w, 1)
            ep2.append((doc_id + 3_000_000, _ahash64_replay(fresh)))

    # epoch 1: min id per component
    ids1 = np.array([i for i, _ in ep1], dtype=np.int64)
    fps1 = np.array([f for _, f in ep1], dtype=np.int64)
    roots1 = _hamming_components(ids1, fps1, max_hamming)
    keep_min: dict[int, int] = {}
    for i in roots1:
        r = roots1[i]
        keep_min[r] = min(keep_min.get(r, i), i)
    admitted = {keep_min[roots1[int(i)]] for i in ids1}
    fp_of = dict(zip(ids1.tolist(), fps1.tolist()))

    # epoch 2: components over (epoch-2 ∪ admitted) fingerprints
    ids2 = np.array(
        [i for i, _ in ep2] + sorted(admitted), dtype=np.int64
    )
    fps2 = np.array(
        [f for _, f in ep2] + [fp_of[a] for a in sorted(admitted)],
        dtype=np.int64,
    )
    roots2 = _hamming_components(ids2, fps2, max_hamming)
    admitted_roots = {roots2[a] for a in admitted}
    keep2: dict[int, int] = {}
    for i, _ in ep2:
        r = roots2[i]
        if r in admitted_roots:
            continue
        keep2[r] = min(keep2.get(r, i), i)
    for i, f in ep2:
        r = roots2[i]
        if r not in admitted_roots and keep2[r] == i:
            admitted.add(i)
            fp_of[i] = f

    rows = [f"({i}, {fp_of[i]})" for i in sorted(admitted)]
    core = f"""
  WITH a(doc_id, fp) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(fp AS BIGINT) AS fp
  FROM a"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


def _thumb_sha(img: np.ndarray) -> str:
    """Independent 8×8 nearest-neighbor thumbnail digest (the resize
    stage's output, multimodal.py::thumbnail + sha256)."""
    h, w, _ = img.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    return hashlib.sha256(img[ys][:, xs].tobytes()).hexdigest()


def _image_features_core(rasters: list[tuple[int, np.ndarray]]) -> str:
    rows = []
    for doc_id, img in rasters:
        h, w, c = img.shape
        rows.append(
            f"({doc_id}, {w}, {h}, {c}, {_sql_float(img.mean())}, "
            f"'{_thumb_sha(img)}')"
        )
    return f"""
  WITH v(doc_id, width, height, n_channels, mean_luma, thumb_sha256) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(width AS INT) AS width,
         CAST(height AS INT) AS height, CAST(n_channels AS INT) AS n_channels,
         CAST(mean_luma AS DOUBLE) AS mean_luma, thumb_sha256
  FROM v"""


@_memo_sql
def image_decode_features_oracle() -> str:
    """Expected features for catalog.image_decode_features: the netpbm
    fixture raster rebuilt directly (no container), features derived
    straight from it — pins the encode→decode→feature chain."""
    sf_dir = oracle_sf_dir()
    rasters = [(i, _image_raster(t)) for i, t in _load_documents(sf_dir)]
    return with_corpus_guard(
        _image_features_core(rasters), "documents", "doc_id", sf_dir
    )


def _png_raster(text: str) -> np.ndarray:
    """The RGB PNG fixture spec (multimodal.py::synthetic_png_payloads):
    digest indices 2/3 for dimensions, h·w·3 repeated-digest bytes."""
    d = hashlib.sha256((text or "").encode()).digest()
    h, w = 16 + d[2] % 32, 16 + d[3] % 32
    return np.frombuffer(
        (d * ((h * w * 3) // len(d) + 1))[: h * w * 3], dtype=np.uint8
    ).reshape(h, w, 3)


def _gif_raster(text: str) -> np.ndarray:
    """The GIF fixture spec (multimodal.py::synthetic_gif_payloads):
    digest indices 10/11 for dimensions, a 64-entry digest-derived
    palette indexed by the repeated digest stream mod 64."""
    d = hashlib.sha256((text or "").encode()).digest()
    h, w = 16 + d[10] % 32, 16 + d[11] % 32
    pal = np.frombuffer((d * 6)[: 64 * 3], dtype=np.uint8).reshape(64, 3)
    stream = np.frombuffer(
        (d * ((h * w) // len(d) + 1))[: h * w], dtype=np.uint8
    )
    return pal[(stream % 64).reshape(h, w)]


@_memo_sql
def image_decode_gif_oracle() -> str:
    """Expected features for catalog.image_decode_gif: the palettized
    raster rebuilt directly, skipping the LZW-compressed GIF container
    the operator decodes — so the gate pins the REAL codec path
    (variable-width LZW + palette expansion) against a container-free
    derivation. GIF is lossless, so equality is exact."""
    sf_dir = oracle_sf_dir()
    rasters = [(i, _gif_raster(t)) for i, t in _load_documents(sf_dir)]
    return with_corpus_guard(
        _image_features_core(rasters), "documents", "doc_id", sf_dir
    )


def _webp_raster(text: str) -> np.ndarray:
    """The WebP fixture spec (multimodal.py::synthetic_webp_payloads):
    digest indices 18/19 for dimensions, h·w·3 repeated-digest bytes.
    The encode-shape variant (index 20) does not change the raster —
    every VP8L path is lossless."""
    d = hashlib.sha256((text or "").encode()).digest()
    h, w = 8 + d[18] % 16, 8 + d[19] % 16
    return np.frombuffer(
        (d * ((h * w * 3) // len(d) + 1))[: h * w * 3], dtype=np.uint8
    ).reshape(h, w, 3)


@_memo_sql
def image_decode_webp_oracle() -> str:
    """Expected features for catalog.image_decode_webp: the raster
    rebuilt directly, skipping the VP8L container — the gate pins the
    REAL codec paths (prefix decode, LZ77, cache, transforms; the
    fixture mixes five encode shapes) against a container-free
    derivation. Lossless, so equality is exact."""
    sf_dir = oracle_sf_dir()
    rasters = [(i, _webp_raster(t)) for i, t in _load_documents(sf_dir)]
    return with_corpus_guard(
        _image_features_core(rasters), "documents", "doc_id", sf_dir
    )


def _bmp_raster(text: str) -> np.ndarray:
    """The BMP/ICO fixture spec (multimodal.py::synthetic_bmp_payloads):
    digest indices 24/25 for dimensions, variant by index 26 — the
    8-bit grayscale variant decodes to its replicated-RGB form."""
    d = hashlib.sha256((text or "").encode()).digest()
    h, w = 8 + d[24] % 24, 8 + d[25] % 24
    px = np.frombuffer(
        (d * ((h * w * 3) // len(d) + 1))[: h * w * 3], dtype=np.uint8
    ).reshape(h, w, 3)
    if d[26] % 3 == 1:
        px = np.repeat(px[:, :, :1], 3, axis=2)
    return px


@_memo_sql
def image_decode_bmp_oracle() -> str:
    """Expected features for catalog.image_decode_bmp: the raster
    rebuilt directly, skipping the BMP/ICO containers — pins bottom-up
    row order, BGR channel order, palette expansion, stride padding,
    and the ICO directory walk against a container-free derivation."""
    sf_dir = oracle_sf_dir()
    rasters = [(i, _bmp_raster(t)) for i, t in _load_documents(sf_dir)]
    return with_corpus_guard(
        _image_features_core(rasters), "documents", "doc_id", sf_dir
    )


def _tiff_raster(text: str) -> np.ndarray:
    """The TIFF fixture spec (multimodal.py::synthetic_tiff_payloads):
    digest indices 27/28 for dimensions; every encode variant is
    lossless, so the raster is variant-independent."""
    d = hashlib.sha256((text or "").encode()).digest()
    h, w = 8 + d[27] % 24, 8 + d[28] % 24
    return np.frombuffer(
        (d * ((h * w * 3) // len(d) + 1))[: h * w * 3], dtype=np.uint8
    ).reshape(h, w, 3)


@_memo_sql
def image_decode_tiff_oracle() -> str:
    """Expected features for catalog.image_decode_tiff: the raster
    rebuilt directly, skipping the TIFF containers — pins the IFD walk,
    strip assembly, PackBits and early-change LZW decompression, and
    predictor reversal against a container-free derivation."""
    sf_dir = oracle_sf_dir()
    rasters = [(i, _tiff_raster(t)) for i, t in _load_documents(sf_dir)]
    return with_corpus_guard(
        _image_features_core(rasters), "documents", "doc_id", sf_dir
    )


@_memo_sql
def image_decode_png_oracle() -> str:
    """Expected features for catalog.image_decode_png: the RGB raster
    rebuilt directly, skipping the zlib-compressed PNG container the
    operator decodes — so the gate pins the REAL codec path (DEFLATE
    inflate + filter reversal) against a container-free derivation."""
    sf_dir = oracle_sf_dir()
    rasters = [(i, _png_raster(t)) for i, t in _load_documents(sf_dir)]
    return with_corpus_guard(
        _image_features_core(rasters), "documents", "doc_id", sf_dir
    )


def _jpeg_flat_raster(text: str) -> np.ndarray:
    """The block-flat JPEG fixture spec (multimodal.py::
    synthetic_jpeg_payloads): digest bytes 4/5 size the block grid,
    repeated digest bytes fill it, each value spans an 8×8 block. Flat
    blocks decode LOSSLESSLY (zero AC, DC divisible by the default
    quantizer), so this raster IS the expected decoder output — derived
    here with no DCT/Huffman code at all."""
    d = hashlib.sha256((text or "").encode()).digest()
    bh, bw = 2 + d[4] % 4, 2 + d[5] % 4
    vals = np.frombuffer(
        (d * ((bh * bw) // len(d) + 1))[: bh * bw], dtype=np.uint8
    ).reshape(bh, bw)
    return np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:, :, None]


@_memo_sql
def image_decode_jpeg_oracle() -> str:
    """Expected features for catalog.image_decode_jpeg: the block-flat
    raster rebuilt directly (no entropy coding, no transform), features
    derived from it — the gate pins the full Huffman + dequant + IDCT
    decode chain against a derivation that never touches codec code."""
    sf_dir = oracle_sf_dir()
    rasters = [(i, _jpeg_flat_raster(t)) for i, t in _load_documents(sf_dir)]
    return with_corpus_guard(
        _image_features_core(rasters), "documents", "doc_id", sf_dir
    )


def _media_metadata_values(sf_dir: str) -> str:
    """The expected (doc_id, format, codec, width, height, n_frames,
    decodable, profile) rows as a VALUES list — pure digest arithmetic
    replaying multimodal.synthetic_media_payloads' spec, shared by the
    row-level and inventory-level oracles."""
    rows = []
    for doc_id, text in _load_documents(sf_dir):
        d = hashlib.sha256((text or "").encode()).digest()
        kind = d[22] % 6
        if kind == 0:
            h, w = 8 + d[23] % 12, 8 + d[24] % 12
            vals = (doc_id, "'webp'", "'vp8l'", w, h, 1, "TRUE", "NULL")
        elif kind == 1:
            w = 16 + d[23] * 2
            h = 16 + d[24] * 2
            vals = (doc_id, "'webp'", "'vp8'", w, h, 1, "FALSE", "NULL")
        elif kind == 2:
            w_mbs = 1 + d[23] % 40
            h_mbs = 1 + d[24] % 30
            crop = d[25] % 4
            n = 1 + d[26] % 5
            vals = (doc_id, "'mp4'", "'avc1'", 16 * w_mbs - 2 * crop,
                    16 * h_mbs, n, "FALSE", "'66.30'")
        elif kind == 3:
            bh, bw = 1 + d[23] % 3, 1 + d[24] % 3
            n = 2 + d[26] % 3
            vals = (doc_id, "'mp4'", "'jpeg'", 8 * bw, 8 * bh, n,
                    "TRUE", "NULL")
        elif kind == 4:
            # the H.265 conformance-window arithmetic: pic_w − 2·crop
            # (4:2:0 SubWidthC=2), Main profile 1, level 93
            pic_w = 32 + 2 * d[23]
            pic_h = 32 + 2 * d[24]
            crop = d[25] % 4
            n = 1 + d[26] % 5
            vals = (doc_id, "'mp4'", "'hvc1'", pic_w - 2 * crop, pic_h,
                    n, "FALSE", "'1.93'")
        else:
            # AV1 max_frame dims are exact (no crop concept here);
            # profile 0, seq_level_idx 8
            w = 1 + 4 * d[23] + d[25] % 4
            h = 1 + 2 * d[24]
            n = 1 + d[26] % 4
            vals = (doc_id, "'mp4'", "'av01'", w, h, n, "FALSE", "'0.8'")
        rows.append("(" + ", ".join(str(v) for v in vals) + ")")
    return _values_rows(rows)


@_memo_sql
def media_inventory_oracle() -> str:
    """Inventory aggregate over the same digest-spec replay as
    media_metadata_oracle: per (format, codec, decodable) file count,
    frame total, and pixel volume — the 'know what we have' corpus
    scan, checked against the Spark groupBy of the parsed rows."""
    sf_dir = oracle_sf_dir()
    core = f"""
  WITH m(doc_id, format, codec, width, height, n_frames, decodable,
         profile) AS (VALUES
  {_media_metadata_values(sf_dir)})
  SELECT format, codec, CAST(decodable AS BOOLEAN) AS decodable,
         CAST(COUNT(*) AS BIGINT) AS n_files,
         CAST(SUM(n_frames) AS BIGINT) AS total_frames,
         CAST(SUM(CAST(width AS BIGINT) * height) AS BIGINT) AS total_pixels
  FROM m
  GROUP BY format, codec, decodable
  ORDER BY format, codec"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


@_memo_sql
def media_metadata_oracle() -> str:
    """Expected structure rows for catalog.media_metadata, replayed
    from the fixture digest spec (multimodal.py::
    synthetic_media_payloads) with NO parser code: per kind the
    expected dims/codec/frames are pure digest arithmetic — including
    the H.264 crop (16·w_mbs − 2·crop_right_units), so the gate pins
    the whole container-walk + frame-tag + Exp-Golomb-SPS chain."""
    sf_dir = oracle_sf_dir()
    core = f"""
  WITH m(doc_id, format, codec, width, height, n_frames, decodable,
         profile) AS (VALUES
  {_media_metadata_values(sf_dir)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, format, codec,
         CAST(width AS INT) AS width, CAST(height AS INT) AS height,
         CAST(n_frames AS INT) AS n_frames,
         CAST(decodable AS BOOLEAN) AS decodable,
         CAST(profile AS VARCHAR) AS profile
  FROM m ORDER BY doc_id"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


_ADTS_RATES_REPLAY = (96000, 88200, 64000, 48000, 44100, 32000, 24000,
                      22050, 16000, 12000, 11025, 8000, 7350)
_FLAC_RATES_REPLAY = (8000, 16000, 22050, 44100, 48000)
_MP4A_RATES_REPLAY = (8000, 22050, 44100)


@_memo_sql
def audio_metadata_oracle() -> str:
    """Expected structural rows for catalog.audio_metadata, replayed
    from the fixture digest spec (multimodal.py::
    synthetic_audio_payloads) with NO parser code: per kind the
    expected rate/channels/frames are pure digest arithmetic, and
    duration replays the operator's exact int/int division so float
    equality is bit-exact (ADTS §6.2 frame walk, FLAC STREAMINFO
    packing, MP4 mdhd duration/timescale — each pinned against this
    independent derivation)."""
    sf_dir = oracle_sf_dir()
    rows = []
    for doc_id, text in _load_documents(sf_dir):
        d = hashlib.sha256((text or "").encode()).digest()
        kind = d[27] % 5
        if kind == 0:
            n = 256 + 16 * d[28]
            ch = 1 + d[29] % 2
            vals = (doc_id, "'wav'", "'pcm_s16le'", 8000, ch, n,
                    _sql_float(n / 8000), "TRUE")
        elif kind == 1:
            n = 4 + d[28] % 6
            vals = (doc_id, "'mp3'", "'mpeg1-layer3'", 44100, 2, n,
                    _sql_float(n * 1152 / 44100), "FALSE")
        elif kind == 2:
            n = 2 + d[28] % 6
            rate = _ADTS_RATES_REPLAY[3 + d[29] % 6]
            ch = 1 + d[30] % 2
            vals = (doc_id, "'aac'", "'aac-lc'", rate, ch, n,
                    _sql_float(n * 1024 / rate), "FALSE")
        elif kind == 3:
            rate = _FLAC_RATES_REPLAY[d[28] % 5]
            ch = 1 + d[29] % 2
            total = 1000 + 100 * d[30]
            vals = (doc_id, "'flac'", "'flac'", rate, ch, total,
                    _sql_float(total / rate), "FALSE")
        else:
            rate = _MP4A_RATES_REPLAY[d[28] % 3]
            ch = 1 + d[29] % 2
            n = 1 + d[30] % 6
            vals = (doc_id, "'mp4'", "'mp4a'", rate, ch, n,
                    _sql_float(1024 * n / rate), "FALSE")
        rows.append("(" + ", ".join(str(v) for v in vals) + ")")
    core = f"""
  WITH a(doc_id, format, codec, sample_rate, n_channels, n_frames,
         duration_sec, decodable) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, format, codec,
         CAST(sample_rate AS INT) AS sample_rate,
         CAST(n_channels AS INT) AS n_channels,
         CAST(n_frames AS BIGINT) AS n_frames,
         CAST(duration_sec AS DOUBLE) AS duration_sec,
         CAST(decodable AS BOOLEAN) AS decodable
  FROM a ORDER BY doc_id"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


@_memo_sql
def audio_decode_features_oracle(
    rate: int = 8000, window: int = 1024, activity_rms: float = 100.0
) -> str:
    """Expected features for catalog.audio_decode_features: the WAV
    fixture's samples synthesized directly (multimodal.py::
    synthetic_wav_payloads spec — digest-derived sine tone + silent
    tail), features computed with the operator's fast-path formulas
    (reduceat segment sums, squared-threshold activity windows) on the
    per-payload sample array — the RIFF encode→parse round-trip is what
    the gate then checks."""
    sf_dir = oracle_sf_dir()
    thresh_sq = float(activity_rms) ** 2 * window
    rows = []
    for doc_id, text in _load_documents(sf_dir):
        d = hashlib.sha256((text or "").encode()).digest()
        n = 2048 + 256 * (d[2] % 8)
        freq = 100 + 10 * d[3]
        amp = 2000 + 100 * d[4]
        t = np.arange(n) / rate
        tone = (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)
        samples = np.concatenate([tone, np.zeros(1024, dtype=np.int16)])
        mono = samples.astype(np.float64).reshape(-1, 1).mean(axis=1)
        nf = len(mono)
        sq = mono * mono
        rms = float(np.sqrt(np.add.reduceat(sq, np.array([0]))[0] / nf))
        nwin = nf // window
        starts = window * np.arange(nwin, dtype=np.int64)
        if nwin * window < nf:
            starts = np.concatenate([starts, [nwin * window]])
        wsums = np.add.reduceat(sq, starts) if nwin else np.array([])
        active = int((wsums[:nwin] >= thresh_sq).sum()) if nwin else 0
        rows.append(
            f"({doc_id}, {rate}, {nf}, 1, {_sql_float(nf / float(rate))}, "
            f"{_sql_float(rms)}, {active})"
        )
    core = f"""
  WITH a(doc_id, sample_rate, n_samples, n_channels, duration_sec, rms,
         n_active_windows) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(sample_rate AS INT) AS sample_rate,
         CAST(n_samples AS BIGINT) AS n_samples, CAST(n_channels AS INT) AS n_channels,
         CAST(duration_sec AS DOUBLE) AS duration_sec, CAST(rms AS DOUBLE) AS rms,
         CAST(n_active_windows AS INT) AS n_active_windows
  FROM a"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


# the MPEG-1 Layer III bitrate table (kbps) — restated here rather than
# imported so the replay stays independent of operators/mp3.py
_MP3_L3_KBPS = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)


@_memo_sql
def audio_mp3_summary_oracle() -> str:
    """Expected stream summaries for catalog.audio_mp3_summary,
    replayed from the fixture spec (multimodal.py::
    synthetic_mp3_payloads): digest index 12 sizes the frame count,
    bytes 14.. pick each frame's Layer-III bitrate, index 13 gates the
    ID3v2 tag. The replay runs NO parser code — the frame-size
    arithmetic, tag skip, and sync walk are exactly what the gate then
    pins. Float columns reproduce the operator's division order
    (total_samples/rate; sum_bps/n/1000), so equality is bit-exact."""
    sf_dir = oracle_sf_dir()
    rows = []
    for doc_id, text in _load_documents(sf_dir):
        d = hashlib.sha256((text or "").encode()).digest()
        n = 6 + d[12] % 8
        kbps = [_MP3_L3_KBPS[d[(14 + i) % 32] % 14] for i in range(n)]
        duration = (n * 1152) / 44100
        mean_kbps = sum(k * 1000 for k in kbps) / n / 1000.0
        vbr = "TRUE" if len(set(kbps)) > 1 else "FALSE"
        rows.append(
            f"({doc_id}, {n}, {_sql_float(duration)}, 44100, "
            f"{_sql_float(mean_kbps)}, {vbr}, 3, '1')"
        )
    core = f"""
  WITH m(doc_id, n_frames, duration_sec, sample_rate, bitrate_kbps_mean,
         vbr, layer, mpeg_version) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_frames AS INT) AS n_frames,
         CAST(duration_sec AS DOUBLE) AS duration_sec,
         CAST(sample_rate AS INT) AS sample_rate,
         CAST(bitrate_kbps_mean AS DOUBLE) AS bitrate_kbps_mean,
         CAST(vbr AS BOOLEAN) AS vbr, CAST(layer AS INT) AS layer,
         mpeg_version
  FROM m"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


# ---------------------------------------------------------------------------
# video_frame_features: frame-feature replay
# ---------------------------------------------------------------------------


@_memo_sql
def video_frame_features_oracle(
    n_frames: int = 8, sample_every: int = 2, cut_threshold: float = 24.0
) -> str:
    """Expected per-document features for catalog.video_frame_features,
    derived straight from the RAWV fixture spec (multimodal.py::
    synthetic_video_payloads): base raster clipped to [120, 230], +4t
    luminance drift, the planted −100 mid-video cut — computed on the
    in-memory frames WITHOUT the container encode/decode the operator
    exercises, so the oracle pins the whole encode→decode→feature chain."""
    sf_dir = oracle_sf_dir()
    rows: list[str] = []
    for doc_id, text in _load_documents(sf_dir):
        d = hashlib.sha256((text or "").encode()).digest()
        h, w = 8 + d[0] % 16, 8 + d[1] % 16
        base = np.frombuffer(
            (d * ((h * w) // len(d) + 1))[: h * w], dtype=np.uint8
        ).reshape(h, w, 1)
        base = np.clip(base, 120, 230)
        frames = []
        for t in range(n_frames):
            shift = 4 * t - (100 if t >= n_frames // 2 else 0)
            frames.append(np.clip(base.astype(np.int32) + shift, 0, 255).astype(np.uint8))
        lumas = np.array([float(f.mean()) for f in frames])
        cuts = int(np.sum(np.abs(np.diff(lumas)) > cut_threshold))
        sampled = frames[::sample_every]
        digest = hashlib.sha256()
        for f in sampled:
            digest.update(f.tobytes())
        rows.append(
            f"({doc_id}, {n_frames}, {len(sampled)}, {w}, {h}, "
            f"{_sql_float(lumas.mean())}, {cuts}, '{digest.hexdigest()}')"
        )
    core = f"""
  WITH v(doc_id, n_frames, n_sampled, width, height, mean_luma,
         n_scene_cuts, sampled_sha256) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_frames AS INT) AS n_frames,
         CAST(n_sampled AS INT) AS n_sampled, CAST(width AS INT) AS width,
         CAST(height AS INT) AS height, CAST(mean_luma AS DOUBLE) AS mean_luma,
         CAST(n_scene_cuts AS INT) AS n_scene_cuts, sampled_sha256
  FROM v"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


@_memo_sql
def video_frame_features_mjpeg_oracle(
    n_frames: int = 8, sample_every: int = 2, cut_threshold: float = 24.0
) -> str:
    """Expected per-document features for
    catalog.video_frame_features_mjpeg, derived straight from the
    fixture spec (multimodal.py::synthetic_mjpeg_payloads): block-flat
    base raster (digest indices 6/7 size the 8×8-block grid), clip to
    [120, 230], +4t drift, the planted −100 mid-video cut. Flat blocks
    decode LOSSLESSLY through the baseline JPEG tables (AC exactly
    zero, DC always even at q_DC = 2), so this replay — which runs NO
    codec code — is the exact expected output of the operator's full
    per-frame Huffman + dequant + IDCT + restart-marker chain."""
    sf_dir = oracle_sf_dir()
    rows: list[str] = []
    for doc_id, text in _load_documents(sf_dir):
        d = hashlib.sha256((text or "").encode()).digest()
        bh, bw = 2 + d[6] % 3, 2 + d[7] % 3
        vals = np.frombuffer(
            (d * ((bh * bw) // len(d) + 1))[: bh * bw], dtype=np.uint8
        ).reshape(bh, bw)
        base = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:, :, None]
        base = np.clip(base, 120, 230)
        frames = []
        for t in range(n_frames):
            shift = 4 * t - (100 if t >= n_frames // 2 else 0)
            frames.append(
                np.clip(base.astype(np.int32) + shift, 0, 255).astype(np.uint8)
            )
        lumas = np.array([float(f.mean()) for f in frames])
        cuts = int(np.sum(np.abs(np.diff(lumas)) > cut_threshold))
        sampled = frames[::sample_every]
        digest = hashlib.sha256()
        for f in sampled:
            digest.update(f.tobytes())
        rows.append(
            f"({doc_id}, {n_frames}, {len(sampled)}, {8 * bw}, {8 * bh}, "
            f"{_sql_float(lumas.mean())}, {cuts}, '{digest.hexdigest()}')"
        )
    core = f"""
  WITH v(doc_id, n_frames, n_sampled, width, height, mean_luma,
         n_scene_cuts, sampled_sha256) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_frames AS INT) AS n_frames,
         CAST(n_sampled AS INT) AS n_sampled, CAST(width AS INT) AS width,
         CAST(height AS INT) AS height, CAST(mean_luma AS DOUBLE) AS mean_luma,
         CAST(n_scene_cuts AS INT) AS n_scene_cuts, sampled_sha256
  FROM v"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


@_memo_sql
def video_frame_features_mp4_oracle(
    n_frames: int = 8, sample_every: int = 2, cut_threshold: float = 24.0
) -> str:
    """Expected per-document features for
    catalog.video_frame_features_mp4, derived straight from the fixture
    spec (multimodal.py::synthetic_mp4_payloads): block-flat base
    raster sized by digest indices 8/9, clip to [120, 230], +4t drift,
    the planted −100 mid-video cut. Flat blocks decode losslessly
    through the baseline JPEG tables, so this replay — which runs NO
    container or codec code — is the exact expected output of the
    operator's full ISO-BMFF box walk + stsc/stsz/stco sample-table
    expansion + per-sample Huffman + dequant + IDCT chain."""
    sf_dir = oracle_sf_dir()
    rows: list[str] = []
    for doc_id, text in _load_documents(sf_dir):
        d = hashlib.sha256((text or "").encode()).digest()
        bh, bw = 2 + d[8] % 3, 2 + d[9] % 3
        vals = np.frombuffer(
            (d * ((bh * bw) // len(d) + 1))[: bh * bw], dtype=np.uint8
        ).reshape(bh, bw)
        base = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:, :, None]
        base = np.clip(base, 120, 230)
        frames = []
        for t in range(n_frames):
            shift = 4 * t - (100 if t >= n_frames // 2 else 0)
            frames.append(
                np.clip(base.astype(np.int32) + shift, 0, 255).astype(np.uint8)
            )
        lumas = np.array([float(f.mean()) for f in frames])
        cuts = int(np.sum(np.abs(np.diff(lumas)) > cut_threshold))
        sampled = frames[::sample_every]
        digest = hashlib.sha256()
        for f in sampled:
            digest.update(f.tobytes())
        rows.append(
            f"({doc_id}, {n_frames}, {len(sampled)}, {8 * bw}, {8 * bh}, "
            f"{_sql_float(lumas.mean())}, {cuts}, '{digest.hexdigest()}')"
        )
    core = f"""
  WITH v(doc_id, n_frames, n_sampled, width, height, mean_luma,
         n_scene_cuts, sampled_sha256) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_frames AS INT) AS n_frames,
         CAST(n_sampled AS INT) AS n_sampled, CAST(width AS INT) AS width,
         CAST(height AS INT) AS height, CAST(mean_luma AS DOUBLE) AS mean_luma,
         CAST(n_scene_cuts AS INT) AS n_scene_cuts, sampled_sha256
  FROM v"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


@_memo_sql
def video_frame_features_avi_oracle(
    n_frames: int = 8, sample_every: int = 2, cut_threshold: float = 24.0
) -> str:
    """Expected per-document features for
    catalog.video_frame_features_avi, derived straight from the
    fixture spec (multimodal.py::synthetic_avi_payloads, digest
    indices 16/17) with NO container or codec code — pins the RIFF
    chunk walk + per-frame JPEG decode chain, same recipe as the
    MJPEG/MP4 twins."""
    sf_dir = oracle_sf_dir()
    rows: list[str] = []
    for doc_id, text in _load_documents(sf_dir):
        d = hashlib.sha256((text or "").encode()).digest()
        bh, bw = 2 + d[16] % 3, 2 + d[17] % 3
        vals = np.frombuffer(
            (d * ((bh * bw) // len(d) + 1))[: bh * bw], dtype=np.uint8
        ).reshape(bh, bw)
        base = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:, :, None]
        base = np.clip(base, 120, 230)
        frames = []
        for t in range(n_frames):
            shift = 4 * t - (100 if t >= n_frames // 2 else 0)
            frames.append(
                np.clip(base.astype(np.int32) + shift, 0, 255).astype(np.uint8)
            )
        lumas = np.array([float(f.mean()) for f in frames])
        cuts = int(np.sum(np.abs(np.diff(lumas)) > cut_threshold))
        sampled = frames[::sample_every]
        digest = hashlib.sha256()
        for f in sampled:
            digest.update(f.tobytes())
        rows.append(
            f"({doc_id}, {n_frames}, {len(sampled)}, {8 * bw}, {8 * bh}, "
            f"{_sql_float(lumas.mean())}, {cuts}, '{digest.hexdigest()}')"
        )
    core = f"""
  WITH v(doc_id, n_frames, n_sampled, width, height, mean_luma,
         n_scene_cuts, sampled_sha256) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_frames AS INT) AS n_frames,
         CAST(n_sampled AS INT) AS n_sampled, CAST(width AS INT) AS width,
         CAST(height AS INT) AS height, CAST(mean_luma AS DOUBLE) AS mean_luma,
         CAST(n_scene_cuts AS INT) AS n_scene_cuts, sampled_sha256
  FROM v"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


# ---------------------------------------------------------------------------
# corpus_stats_approx: HyperLogLog++ + quantile-summary replay
# ---------------------------------------------------------------------------

# HLL++ linear-counting thresholds, p = 4..18 (Heule et al., "HyperLogLog
# in Practice", appendix) — the same table Spark's HyperLogLogPlusPlusHelper
# switches estimators on.
_HLL_THRESHOLDS = (
    10, 20, 40, 80, 220, 400, 900, 1800, 3100, 6500, 11500, 20000,
    50000, 120000, 350000,
)


def _hll_replay(values: list[str], rsd: float) -> int:
    """Replay Spark's ``approx_count_distinct`` register math exactly
    (catalyst HyperLogLogPlusPlusHelper): xxhash64(seed 42) per value —
    the same pure-Python XXH64 that replays the simhash gates — index =
    top p bits, rho = leading zeros of the remaining bits + 1, then the
    LINEAR-COUNTING estimator (m·ln(m/V), Java Math.round). The gate
    corpora's vocabularies sit far below the p=12 linear threshold
    (3100); a corpus outside that regime would need the paper's bias
    tables, so refuse loudly rather than replay approximately — the
    corpus-fingerprint guard makes this unreachable on a gated run."""
    import math

    p = int(math.ceil(2.0 * math.log(1.106 / rsd) / math.log(2.0)))
    m = 1 << p
    regs = [0] * m
    for v in set(values):
        x = xxh64(v.encode(), 42) & 0xFFFFFFFFFFFFFFFF
        idx = x >> (64 - p)
        w = ((x << p) & 0xFFFFFFFFFFFFFFFF) | (1 << (p - 1))
        rho = 64 - w.bit_length() + 1
        if rho > regs[idx]:
            regs[idx] = rho
    v_zero = regs.count(0)
    if v_zero == 0:
        raise RuntimeError(
            "HLL++ replay: no zero registers — cardinality beyond the "
            "linear-counting regime; this oracle only replays gate-sized "
            "vocabularies"
        )
    h = m * math.log(m / v_zero)
    if h > _HLL_THRESHOLDS[p - 4]:
        raise RuntimeError(
            f"HLL++ replay: linear-counting estimate {h:.1f} above the "
            f"p={p} threshold {_HLL_THRESHOLDS[p - 4]} — the bias-corrected "
            "estimator is not replayed here"
        )
    return int(math.floor(h + 0.5))  # Java Math.round


def _quantile_summary_replay(lens: list[int], qs: tuple[float, ...]) -> list[int]:
    """Replay ``percentile_approx(col, qs, 10000)`` for gate-sized
    inputs: at accuracy 10000 the QuantileSummaries buffer holds every
    observation uncompressed (g=1, delta=0), so the query returns the
    exact order statistic at rank ceil(q·n) — pinned bit-identical to
    Spark at all three testdata scales in tests/test_oracle_gen.py."""
    import math

    s = sorted(lens)
    n = len(s)
    return [s[int(math.ceil(q * n)) - 1] for q in qs]


@_memo_sql
def corpus_stats_approx_oracle(rsd: float = 0.02) -> str:
    """Full-row oracle for catalog.corpus_stats_approx: the exact
    columns (n_docs, total_tokens) recomputed relationally in DuckDB,
    the sketch columns (HLL++ distinct, quantile-summary percentiles)
    replayed register-for-register in pure Python from the same
    public algorithms Spark implements — the same trick that closed
    simhash via the XXH64 replay. Closes the registry's last
    rows-only entry."""
    sf_dir = oracle_sf_dir()
    toks: list[str] = []
    lens: list[int] = []
    for _doc_id, text in _load_documents(sf_dir):
        parts = (text or "").split(" ")
        toks.extend(parts)
        lens.append(len(parts))
    approx_distinct = _hll_replay(toks, rsd)
    p50, p90, p99 = _quantile_summary_replay(lens, (0.5, 0.9, 0.99))
    core = f"""
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
          FROM documents) AS total_tokens,
         CAST({approx_distinct} AS BIGINT) AS approx_distinct_tokens,
         CAST({p50} AS BIGINT) AS tokens_p50,
         CAST({p90} AS BIGINT) AS tokens_p90,
         CAST({p99} AS BIGINT) AS tokens_p99"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


# ---------------------------------------------------------------------------
# shared k-means replay pieces (IVF / PQ / SemDeDup)
# ---------------------------------------------------------------------------


def _fit_centroids_replay(x: np.ndarray, k: int, seed: int) -> np.ndarray:
    """The operators' own driver k-means (functions/kmeans.py::lloyd —
    pure numpy, deterministic for a given input matrix and seed), run on
    the DuckDB-loaded corpus in id order. The identity with the operator
    is STRUCTURAL, not a file-layout accident: ivf._fit_centroids and
    pq.build_pq sort their collected sample by id on the driver before
    fitting (order_col), so the training matrix is id-ordered on any
    corpus — single-file, multi-file, or re-sorted (pinned by the
    repartitioned-corpus test in tests/test_ivf.py)."""
    from secure_agent_api_vector_search_spark.functions.kmeans import lloyd

    return lloyd(x, k, np.random.default_rng(seed), iters=20)


def _assign_replay(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """ivf._nearest_lists_udf's whole-batch assignment math: expanded
    L2², stable first-occurrence argmin (ties → lowest list id)."""
    csq = np.einsum("ij,ij->i", c, c)
    d = np.einsum("ij,ij->i", x, x)[:, None] - 2.0 * (x @ c.T) + csq[None, :]
    return d.argmin(axis=1)


def _rank_lists_replay(c: np.ndarray, q: np.ndarray) -> np.ndarray:
    """ivf._rank_lists: centroid order by (L2 distance, list_id)."""
    d = np.einsum("ij,ij->i", c, c) - 2.0 * (c @ q)
    return np.argsort(d, kind="stable")


@_memo_sql
def ivf_topk_oracle(n_lists: int = 16, nprobe: int = 10, k: int = 10, seed: int = 42) -> str:
    """Oracle for catalog.ivf_topk (nprobe=10 of 16): the k-means fit,
    assignment, and centroid ranking are replayed to derive the PROBED
    candidate id set (the part SQL cannot express — clustering is
    implementation-defined but fixed-seed deterministic); DuckDB then
    independently computes the exact cosine top-k WITHIN those lists
    from the raw parquet vectors, so scoring, ranking, and tiebreaks
    are still recomputed relationally, not copied from the engine."""
    sf_dir = oracle_sf_dir()
    ids, x = _load_embeddings(sf_dir)
    c = _fit_centroids_replay(x, n_lists, seed)
    assign = _assign_replay(x, c)
    q = x[int(np.flatnonzero(ids == 0)[0])]
    probes = set(int(p) for p in _rank_lists_replay(c, q)[:nprobe])
    cand = [int(i) for i, a in zip(ids, assign) if int(a) in probes]
    vals = ",".join(f"({i})" for i in cand)
    cos = _cos_sql(_E, "q.qe")
    core = f"""
  WITH cand(vec_id) AS (VALUES {vals}),
  q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
  SELECT e.vec_id, {cos} AS similarity
  FROM embeddings e JOIN cand USING (vec_id) CROSS JOIN q
  ORDER BY similarity DESC, e.vec_id LIMIT {k}"""
    return with_corpus_guard(core, "embeddings", "vec_id", sf_dir)


@_memo_sql
def pq_topk_rerank_oracle(
    m: int = 16, ksub: int = 32, seed: int = 42, shortlist: int = 100, k: int = 10
) -> str:
    """Oracle for catalog.pq_topk_rerank: codebook training (one shared
    rng across the m sub-quantizers, operators/pq.py::build_pq), code
    assignment, and the ADC scan are replayed to derive the SHORTLIST id
    set; DuckDB recomputes the exact-L2² re-rank over the shortlist from
    the raw vectors (same expression as the pq_rerank_exact_limit gate),
    so the re-rank stage's values/tiebreaks are independently derived."""
    sf_dir = oracle_sf_dir()
    ids, x = _load_embeddings(sf_dir)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    from secure_agent_api_vector_search_spark.functions.kmeans import lloyd

    rng = np.random.default_rng(seed)
    books = [
        np.asarray(
            [[float(v) for v in row] for row in lloyd(x[:, j * dsub:(j + 1) * dsub], ksub, rng)]
        )
        for j in range(m)
    ]
    codes = np.empty((len(x), m), dtype=np.int64)
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        c = books[j]
        d = (sub**2).sum(1)[:, None] - 2.0 * (sub @ c.T) + (c**2).sum(1)[None, :]
        codes[:, j] = d.argmin(axis=1)
    q = x[int(np.flatnonzero(ids == 0)[0])]
    luts = []
    for j in range(m):
        sub = q[j * dsub:(j + 1) * dsub]
        luts.append([float(v) for v in ((books[j] - sub[None, :]) ** 2).sum(axis=1)])
    # the operator's codegen left-fold: 0.0 + lut_0[c_0] + ... in order
    dists = []
    for i in range(len(x)):
        s = 0.0
        for j in range(m):
            s = s + luts[j][codes[i, j]]
        dists.append(s)
    order = sorted(range(len(x)), key=lambda i: (dists[i], int(ids[i])))[:shortlist]
    vals = ",".join(f"({int(ids[i])})" for i in order)
    core = f"""
  WITH sl(vec_id) AS (VALUES {vals}),
  q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
  top AS (
    SELECT e.vec_id,
           list_dot_product(q.qe, q.qe) - 2.0 * list_dot_product({_E}, q.qe)
             + list_dot_product({_E}, {_E}) AS l2sq
    FROM embeddings e JOIN sl USING (vec_id) CROSS JOIN q
    ORDER BY l2sq ASC, e.vec_id LIMIT {k})
  SELECT vec_id, l2sq,
         CAST(ROW_NUMBER() OVER (ORDER BY l2sq ASC, vec_id) AS INT) AS rank
  FROM top ORDER BY rank"""
    return with_corpus_guard(core, "embeddings", "vec_id", sf_dir)


@_memo_sql
def ivfpq_topk_oracle(
    n_lists: int = 16, nprobe: int = 4, m: int = 16, ksub: int = 32,
    seed: int = 42, shortlist: int = 100, k: int = 10,
) -> str:
    """Oracle for catalog.ivfpq_topk — the composed faiss-style tier.
    Both index halves are replayed with the shared seeded k-means
    (functions/kmeans.py::lloyd): the IVF fit + assignment + top-nprobe
    routing picks the probed row set (the knn_join_ivf recipe), the PQ
    codebook + ADC scan — restricted to the probed rows — derives the
    shortlist (the pq_topk_rerank recipe); DuckDB then recomputes the
    exact-L2² re-rank over the embedded shortlist from the raw parquet
    vectors. Exactness of the composition at the probe limit is pinned
    by ivfpq_topk_fullprobe, which reuses the plain-PQ oracle verbatim."""
    sf_dir = oracle_sf_dir()
    ids, x = _load_embeddings(sf_dir)
    # IVF half: routing witness
    c = _fit_centroids_replay(x, n_lists, seed)
    assign = _assign_replay(x, c)
    q = x[int(np.flatnonzero(ids == 0)[0])]
    probes = {int(v) for v in _rank_lists_replay(c, q)[:nprobe]}
    probed = np.array([int(a) in probes for a in assign])
    # PQ half: codebook + ADC over the probed rows only
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    from secure_agent_api_vector_search_spark.functions.kmeans import lloyd

    rng = np.random.default_rng(seed)
    books = [
        np.asarray(
            [[float(v) for v in row]
             for row in lloyd(x[:, j * dsub:(j + 1) * dsub], ksub, rng)]
        )
        for j in range(m)
    ]
    codes = np.empty((len(x), m), dtype=np.int64)
    luts = []
    for j in range(m):
        sub = x[:, j * dsub:(j + 1) * dsub]
        cb = books[j]
        d = (sub**2).sum(1)[:, None] - 2.0 * (sub @ cb.T) + (cb**2).sum(1)[None, :]
        codes[:, j] = d.argmin(axis=1)
        qs = q[j * dsub:(j + 1) * dsub]
        luts.append([float(v) for v in ((cb - qs[None, :]) ** 2).sum(axis=1)])
    dists = {}
    for i in np.flatnonzero(probed):
        s = 0.0  # the operator's codegen left-fold, in subspace order
        for j in range(m):
            s = s + luts[j][codes[i, j]]
        dists[int(i)] = s
    order = sorted(dists, key=lambda i: (dists[i], int(ids[i])))[:shortlist]
    vals = ",".join(f"({int(ids[i])})" for i in order)
    core = f"""
  WITH sl(vec_id) AS (VALUES {vals}),
  q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
  top AS (
    SELECT e.vec_id,
           list_dot_product(q.qe, q.qe) - 2.0 * list_dot_product({_E}, q.qe)
             + list_dot_product({_E}, {_E}) AS l2sq
    FROM embeddings e JOIN sl USING (vec_id) CROSS JOIN q
    ORDER BY l2sq ASC, e.vec_id LIMIT {k})
  SELECT vec_id, l2sq,
         CAST(ROW_NUMBER() OVER (ORDER BY l2sq ASC, vec_id) AS INT) AS rank
  FROM top ORDER BY rank"""
    return with_corpus_guard(core, "embeddings", "vec_id", sf_dir)


# ---------------------------------------------------------------------------
# simhash_near_dup: pure-Python XXH64 + sign-sum fingerprint replay
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1
_XP1, _XP2, _XP3, _XP4, _XP5 = (
    11400714785074694791,
    14029467366897019727,
    1609587929392839161,
    9650029242287828579,
    2870177450012600261,
)


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 (Collet's spec), unsigned — bit-identical to
    Spark's `xxhash64` expression at its default seed 42 (verified
    against the JVM on empty/short/long/multibyte strings in tests).
    Pure Python: used only at oracle-generation time over gate-sized
    corpora."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XP1 + _XP2) & _M64
        v2 = (seed + _XP2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XP1) & _M64
        vs = [v1, v2, v3, v4]
        while i + 32 <= n:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                v = (vs[j] + lane * _XP2) & _M64
                vs[j] = (_rotl64(v, 31) * _XP1) & _M64
            i += 32
        h = (
            _rotl64(vs[0], 1) + _rotl64(vs[1], 7)
            + _rotl64(vs[2], 12) + _rotl64(vs[3], 18)
        ) & _M64
        for v in vs:
            h ^= (_rotl64((v * _XP2) & _M64, 31) * _XP1) & _M64
            h = (h * _XP1 + _XP4) & _M64
    else:
        h = (seed + _XP5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((lane * _XP2) & _M64, 31) * _XP1) & _M64
        h = (_rotl64(h, 27) * _XP1 + _XP4) & _M64
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h ^= (lane * _XP1) & _M64
        h = (_rotl64(h, 23) * _XP2 + _XP3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _XP5) & _M64
        h = (_rotl64(h, 11) * _XP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XP2) & _M64
    h ^= h >> 29
    h = (h * _XP3) & _M64
    h ^= h >> 32
    return h


def _simhash64(text: str, cache: dict) -> int:
    """dedup.simhash_fingerprint replayed: single-space token split
    (empties kept, as Spark's explode keeps them), lowercase, XXH64
    per token, per-bit ±1 sign sums, bit set iff sum > 0. Unsigned.
    ``cache`` memoizes each distinct token's ±1 bit vector (corpus
    vocabularies repeat heavily; one XXH64 per distinct token)."""
    sums = np.zeros(64, dtype=np.int64)
    for tok in (text or "").split(" "):
        v = cache.get(tok)
        if v is None:
            h = xxh64(tok.lower().encode("utf-8"), 42)
            bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            v = 2 * bits.astype(np.int64) - 1
            cache[tok] = v
        sums += v
    fp = 0
    for i in np.flatnonzero(sums > 0):
        fp |= 1 << int(i)
    return fp


@_memo_sql
def simhash_near_dup_oracle(max_hamming: int = 3, chunk: int = 1024) -> str:
    """Expected pair set for catalog.simhash_near_dup: the exact-dup
    fixture (corpus ∪ 50 verbatim copies under id+100000), fingerprints
    replayed through an independent XXH64 + sign-sum implementation,
    EXACT all-pairs Hamming ≤ 3 — the same pigeonhole identity that
    makes the operator's 4-chunk banding loss-free at this budget."""
    sf_dir = oracle_sf_dir()
    ids: list[int] = []
    fps: list[int] = []
    cache: dict = {}
    for doc_id, text in _load_documents(sf_dir):
        fp = _simhash64(text, cache)
        ids.append(doc_id)
        fps.append(fp)
        if doc_id < 50:
            ids.append(doc_id + 100000)
            fps.append(fp)  # verbatim copy → identical fingerprint
    id_arr = np.asarray(ids, dtype=np.int64)
    fp_arr = np.asarray(fps, dtype=np.uint64)
    pairs: list[str] = []
    for s in range(0, len(id_arr), chunk):
        hams = _hamming_block(fp_arr[s : s + chunk], fp_arr)
        for bi, gj in zip(*np.nonzero(hams <= max_hamming)):
            i, j = s + int(bi), int(gj)
            if i < j:
                a, b = int(id_arr[i]), int(id_arr[j])
                lo, hi = (a, b) if a < b else (b, a)
                pairs.append(f"({lo}, {hi}, {int(hams[bi, gj])})")
    pairs.sort()
    core = f"""
  WITH p(id_a, id_b, hamming) AS (VALUES
  {_values_rows(pairs)})
  SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
         CAST(hamming AS INT) AS hamming
  FROM p"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


# ---------------------------------------------------------------------------
# dedup_near_keep_first: exact-pair components witness
# ---------------------------------------------------------------------------


@_memo_sql
def dedup_near_keep_first_oracle(threshold: float = 0.5) -> str:
    """Expected kept-id set for catalog.dedup_near_keep_first: the
    exact normalized byte-5-shingle Jaccard pair set (computed in
    DuckDB at generation time — the same relational form the gated
    minhash_near_dup oracle uses, equality with the banded pipeline
    being that gate's pinned identity), resolved to connected
    components with a union-find, min-id kept per component."""
    import duckdb

    sf_dir = oracle_sf_dir()
    norm = (
        "trim(regexp_replace(regexp_replace(lower({t}), '[^a-z0-9 ]', '', 'g'),"
        " ' +', ' ', 'g'))"
    )
    con = duckdb.connect()
    pair_rows = con.sql(f"""
WITH corpus AS (
  SELECT doc_id, {norm.format(t='text')} AS t
  FROM '{sf_dir}/documents.parquet'
  UNION ALL
  SELECT doc_id + 200000 AS doc_id,
         {norm.format(t="upper(text) || ' !!!'")} AS t
  FROM '{sf_dir}/documents.parquet' WHERE doc_id < 30),
g AS (
  SELECT DISTINCT doc_id, substr(t, i, 5) AS g
  FROM corpus, UNNEST(range(1, GREATEST(len(t) - 4, 0) + 1)) AS u(i)
  WHERE len(t) >= 5),
s AS (SELECT doc_id, COUNT(*) AS sz FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT i.id_a, i.id_b
FROM inter i JOIN s sa ON sa.doc_id = i.id_a JOIN s sb ON sb.doc_id = i.id_b
WHERE CAST(i.n_inter AS DOUBLE) / (sa.sz + sb.sz - i.n_inter) >= {threshold}
""").fetchall()
    all_ids = [i for i, _ in _load_documents(sf_dir)]
    all_ids += [i + 200000 for i in all_ids if i < 30]
    parent = {i: i for i in all_ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_rows:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    kept = sorted(i for i in all_ids if find(i) == i)
    vals = ",".join(f"({i})" for i in kept)
    core = f"""
  SELECT CAST(doc_id AS BIGINT) AS doc_id
  FROM (VALUES {vals}) AS t(doc_id)"""
    return with_corpus_guard(core, "documents", "doc_id", sf_dir)


# ---------------------------------------------------------------------------
# knn_join_ivf: routed-candidate witness, scoring recomputed relationally
# ---------------------------------------------------------------------------


@_memo_sql
def knn_join_ivf_oracle(
    n_lists: int = 16, nprobe: int = 4, k: int = 3, seed: int = 42,
    q_stride: int = 50,
) -> str:
    """Oracle for catalog.knn_join_ivf: the k-means fit + assignment +
    per-query top-nprobe routing replayed (the clustering witness);
    DuckDB recomputes cosine and the per-query rank over exactly the
    routed candidate pairs from the raw parquet vectors."""
    sf_dir = oracle_sf_dir()
    ids, x = _load_embeddings(sf_dir)
    c = _fit_centroids_replay(x, n_lists, seed)
    assign = _assign_replay(x, c)
    lists: dict[int, list[int]] = {}
    for i, a in zip(ids, assign):
        lists.setdefault(int(a), []).append(int(i))
    cand_rows: list[str] = []
    for qi in np.flatnonzero(ids % q_stride == 0):
        q_id = int(ids[qi])
        probes = _rank_lists_replay(c, x[qi])[:nprobe]
        for lid in probes:
            for vid in lists.get(int(lid), ()):
                cand_rows.append(f"({q_id}, {vid})")
    cos = _cos_sql(_E, "CAST(q.embedding AS DOUBLE[])")
    core = f"""
  WITH cand(q_id, vec_id) AS (VALUES
  {_values_rows(cand_rows)})
  SELECT q_id, neighbor_id, similarity, "rank" FROM (
    SELECT cand.q_id, e.vec_id AS neighbor_id, {cos} AS similarity,
           CAST(row_number() OVER (PARTITION BY cand.q_id
                              ORDER BY {cos} DESC, e.vec_id) AS INT) AS "rank"
    FROM cand
    JOIN embeddings e USING (vec_id)
    JOIN embeddings q ON q.vec_id = cand.q_id)
  WHERE "rank" <= {k}"""
    return with_corpus_guard(core, "embeddings", "vec_id", sf_dir)


# ---------------------------------------------------------------------------
# vector_topk_mmr: greedy-rerank witness
# ---------------------------------------------------------------------------


def _fold_dot(a, b) -> float:
    """functions/vector.py's left fold: (0.0 + a0·b0) + a1·b1 + … —
    the association that makes Spark codegen, DuckDB list_dot_product,
    and this replay bit-identical."""
    s = 0.0
    for x, y in zip(a, b):
        s = s + float(x) * float(y)
    return s


@_memo_sql
def vector_topk_mmr_oracle(k: int = 10, fetch_k: int = 50, lam: float = 0.7) -> str:
    """Expected rows for catalog.vector_topk_mmr: the exact top-fetch_k
    over-fetch replayed with the left-fold cosine (bit-matching the
    distributed scan), then operators/topk.py::topk_similar_mmr's
    greedy numpy rerank replayed on the same candidate block. The
    selection, scores, and ranks are embedded as the full witness —
    the λ=1 degenerate case stays SQL-checked via mmr_exact_limit."""
    sf_dir = oracle_sf_dir()
    ids, x = _load_embeddings(sf_dir)
    q = x[int(np.flatnonzero(ids == 0)[0])]
    qn = float(np.sqrt(_fold_dot(q, q)))
    scored = []
    for i in range(len(ids)):
        v = x[i]
        cos = _fold_dot(v, q) / (float(np.sqrt(_fold_dot(v, v))) * qn)
        scored.append((cos, int(ids[i]), i))
    scored.sort(key=lambda t: (-t[0], t[1]))
    cand = scored[:fetch_k]
    sims = np.array([c[0] for c in cand], dtype=np.float64)
    cids = np.array([c[1] for c in cand], dtype=np.int64)
    m = np.stack([x[c[2]] for c in cand])
    norms = np.linalg.norm(m, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        unit = np.where(norms[:, None] > 0, m / norms[:, None], 0.0)
    pair = unit @ unit.T
    selected: list[int] = []
    scores: list[float] = []
    remaining = np.ones(len(cids), dtype=bool)
    for _ in range(min(k, len(cids))):
        penalty = pair[:, selected].max(axis=1) if selected else np.zeros(len(cids))
        mmr = lam * sims - (1.0 - lam) * penalty
        mmr_masked = np.where(remaining, mmr, -np.inf)
        best = np.lexsort((cids, -mmr_masked))[0]
        selected.append(int(best))
        scores.append(float(mmr[best]))
        remaining[best] = False
    rows = [
        f"({int(cids[i])}, {_sql_float(sims[i])}, {_sql_float(scores[j])}, {j})"
        for j, i in enumerate(selected)
    ]
    core = f"""
  WITH w(vec_id, similarity, mmr_score, rank) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(similarity AS DOUBLE) AS similarity,
         CAST(mmr_score AS DOUBLE) AS mmr_score, CAST(rank AS BIGINT) AS rank
  FROM w"""
    return with_corpus_guard(core, "embeddings", "vec_id", sf_dir)


# ---------------------------------------------------------------------------
# semantic_dedup: fixed-seed keep/drop witness
# ---------------------------------------------------------------------------


@_memo_sql
def semantic_dedup_oracle(threshold: float = 0.9, seed: int = 42) -> str:
    """Expected (vec_id, cluster_id, keep, dup_of) witness for
    catalog.semantic_dedup: the planted-near-dup fixture
    (catalog._embeddings_with_near_dups — v + 0.45·rotate(v) copies of
    the first 50 vectors under id+100000), the shared k-means fit, the
    deterministic assignment, and the greedy id-ordered per-cluster
    cosine screen (operators/semdedup.py::_screen_cluster) replayed in
    numpy and embedded as the full expected row set."""
    sf_dir = oracle_sf_dir()
    ids, x = _load_embeddings(sf_dir)
    rot = np.concatenate([x[:, 1:], x[:, :1]], axis=1)
    mask = ids < 50
    dup_ids = ids[mask] + 100000
    dup_x = x[mask] + 0.45 * rot[mask]
    all_ids = np.concatenate([ids, dup_ids])
    all_x = np.vstack([x, dup_x])
    n = len(all_ids)
    n_clusters = max(2, -(-n // 1024))
    c = _fit_centroids_replay(all_x, n_clusters, seed)
    assign = _assign_replay(all_x, c)
    keep = np.ones(n, dtype=bool)
    dup_of: list[int | None] = [None] * n
    for cid in np.unique(assign):
        idx = np.flatnonzero(assign == cid)
        idx = idx[np.argsort(all_ids[idx], kind="stable")]
        m = all_x[idx]
        norms = np.linalg.norm(m, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            unit = np.where(norms[:, None] > 0, m / norms[:, None], 0.0)
        kept_rows: list[int] = [0]
        for j in range(1, len(idx)):
            sims = unit[kept_rows] @ unit[j]
            hits = np.flatnonzero(sims >= threshold)
            if len(hits):
                keep[idx[j]] = False
                dup_of[idx[j]] = int(all_ids[idx[kept_rows[int(hits[0])]]])
            else:
                kept_rows.append(j)
    rows = []
    for i in range(n):
        d = "CAST(NULL AS BIGINT)" if dup_of[i] is None else str(dup_of[i])
        rows.append(
            f"({int(all_ids[i])}, {int(assign[i])}, "
            f"{'TRUE' if keep[i] else 'FALSE'}, {d})"
        )
    core = f"""
  WITH w(vec_id, cluster_id, keep, dup_of) AS (VALUES
  {_values_rows(rows)})
  SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cluster_id AS INT) AS cluster_id,
         keep, CAST(dup_of AS BIGINT) AS dup_of
  FROM w"""
    return with_corpus_guard(core, "embeddings", "vec_id", sf_dir)
