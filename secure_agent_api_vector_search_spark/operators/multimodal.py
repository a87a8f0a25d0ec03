"""Multimodal column plumbing ([EXT], SURVEY.md §2.10).

The reference's only multimodal seam is the `filename` provenance
column (sql/02_schema.sql:12) pointing at source PDFs/HTML. A 100 TB
training-data pipeline carries the payload itself: an opaque
`binary` column plus typed metadata, with decode / feature-extraction
as Arrow-batched `mapInPandas` stages.

The Spark-side plumbing here is REAL and tested — schema, batch
iterator shape, partition-preserving map, feature schema. Decoding has
two tiers:

- REAL decoders, stdlib + numpy only: JPEG (Huffman + DCT,
  operators/jpeg.py — baseline AND progressive, reads standard
  libjpeg files incl. 4:2:0), PNG (stdlib-zlib DEFLATE inflate + full five-filter
  reversal, :func:`decode_png`), binary netpbm images (P5/P6 → numpy
  array), and PCM WAV audio (stdlib ``wave`` → rate, duration, RMS,
  per-window envelope — the frame-sample analog). The image
  feature/dedup stages sniff the magic (:func:`decode_image`) so
  JPEG/PNG/netpbm payloads mix freely in one corpus. All run
  end-to-end in tests and on the hard gate.
- A documented stub seam for everything else (video codecs, exotic
  stills): `decode_stub=True` produces deterministic fake features
  from the bytes; `decode_stub=False` raises NotImplementedError at
  the exact line a real decoder (PIL / av / soundfile) plugs into.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, payload_sha256 string, "
    "width int, height int, n_channels int"
)


def attach_binary_payload(documents: DataFrame, mime: str = "application/octet-stream") -> DataFrame:
    """Materialize an opaque binary payload column + metadata from the
    text body (stand-in for reading real media files; the schema is what
    matters: payload binary, mime string)."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit(mime).alias("mime"),
    )


def extract_features(with_payload: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract each payload via mapInPandas.

    Arrow-batched, partition-preserving (no shuffle); this is exactly
    how a real image-resize / frame-sample / mel-spectrogram stage runs
    at scale — the decoder is per-batch Python, everything around it
    stays in the JVM.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decoding needs an image/audio library; "
                    "plug a decoder in here (PIL.Image.open / av / soundfile)"
                )
            payloads = pdf["payload"]
            digests = payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest())
            n = payloads.map(len)
            # deterministic fake "decode": dimensions derived from the digest
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n,
                    "payload_sha256": digests,
                    "width": digests.map(lambda d: 64 + int(d[:2], 16)),
                    "height": digests.map(lambda d: 64 + int(d[2:4], 16)),
                    "n_channels": 3,
                }
            )

    return with_payload.mapInPandas(op, schema=FEATURE_SCHEMA)


def multimodal_features(documents: DataFrame) -> DataFrame:
    """End-to-end: attach payloads → extract features. Deterministic
    (sha256-derived stub features), so the driver's DuckDB oracle
    recomputes the full row; pytest covers the decode plumbing."""
    return extract_features(attach_binary_payload(documents))


# ---------------------------------------------------------------------------
# Real decoders: binary netpbm (P5/P6) and PCM WAV — stdlib + numpy only.


def _decode_netpbm_consumed(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode one BINARY netpbm image at the start of ``payload`` and
    return (array, bytes consumed) — the single header walk shared by
    :func:`decode_netpbm` and the RAWV frame walk in
    :func:`decode_video`, so the two can never disagree about where a
    frame ends."""
    if not payload[:2] in (b"P5", b"P6"):
        raise ValueError(f"not a binary netpbm payload: {payload[:2]!r}")
    channels = 1 if payload[:2] == b"P5" else 3
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments allowed, then ONE whitespace byte then raster
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        c = payload[i : i + 1]
        if c == b"#":
            i = payload.index(b"\n", i) + 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while not payload[j : j + 1].isspace():
                j += 1
            tokens.append(int(payload[i:j]))
            i = j
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    count = width * height * channels
    raster = np.frombuffer(payload, dtype=np.uint8, count=count, offset=i + 1)
    return raster.reshape(height, width, channels), i + 1 + count


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Decode a BINARY netpbm image (P5 graymap / P6 pixmap, maxval
    <= 255) to a (height, width, channels) uint8 array. Pure
    bytes-parsing + numpy — a real decoder, no image library."""
    return _decode_netpbm_consumed(payload)[0]


def encode_netpbm(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_netpbm` (test fixture + sink side)."""
    h, w, c = img.shape
    magic = b"P5" if c == 1 else b"P6"
    return magic + f"\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# PNG: a REAL compressed-format codec (stdlib zlib DEFLATE + numpy);
# the lossy sibling lives in operators/jpeg.py (baseline Huffman+DCT)
# and both dispatch through decode_image below.
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (3 = palette: 1 index, expanded below)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (grayscale / RGB / palette /
    gray+alpha / RGBA) to an (h, w, channels) uint8 array. A genuine
    decoder for a genuine compressed format: chunk walk + CRC check,
    stdlib-zlib inflate of the IDAT stream, and full reversal of all
    five scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6).
    Palette images expand through PLTE to (h, w, 3).

    Filter reversal is vectorized where the data dependency allows:
    Up is one whole-row add; Sub has only a left dependency, solved as
    a per-channel cumulative sum mod 256; Average/Paeth mix left and
    up dependencies, so those rows walk pixel-by-pixel (rare in
    practice — most encoders emit 0/2 for synthetic content, and this
    module's own encoder writes filter 0)."""
    import zlib

    if payload[: len(PNG_SIG)] != PNG_SIG:
        raise ValueError(f"not a PNG payload: {payload[:8]!r}")
    pos = len(PNG_SIG)
    idat = bytearray()
    plte: bytes | None = None
    width = height = None
    channels = color_type = None
    while pos + 8 <= len(payload):
        size = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        crc = int.from_bytes(payload[pos + 8 + size : pos + 12 + size], "big")
        if zlib.crc32(ctype + data) != crc:
            raise ValueError(f"corrupt PNG: CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            width = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            bit_depth, color_type, _comp, _filt, interlace = data[8:13]
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if interlace != 0:
                raise ValueError("interlaced (Adam7) PNG not supported")
            channels = _PNG_CHANNELS.get(color_type)
            if channels is None:
                raise ValueError(f"unknown PNG color type {color_type}")
        elif ctype == b"PLTE":
            plte = bytes(data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size
    if width is None or not idat:
        raise ValueError("corrupt PNG: missing IHDR or IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("corrupt PNG: inflated size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at bit depth 8
    for y in range(height):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        up = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            rec = cur
        elif ftype == 2:  # Up
            rec = (cur + up) & 0xFF
        elif ftype == 1:  # Sub: recon[x] = cur[x] + recon[x-bpp] — a
            # cumulative sum per pixel-channel lane, mod 256
            lanes = cur.reshape(width, bpp)
            rec = np.cumsum(lanes, axis=0, dtype=np.int64).reshape(stride) & 0xFF
        elif ftype == 3:  # Average: left + up mix → sequential in x
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + ((left + up[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = up[x]
                c = int(out[y - 1, x - bpp]) if (y and x >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"corrupt PNG: unknown filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    img = out.reshape(height, width, channels)
    if color_type == 3:
        if plte is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        if len(plte) % 3 != 0:
            raise ValueError("corrupt PNG: PLTE length not a multiple of 3")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(img[:, :, 0].max()) >= len(pal):
            raise ValueError("corrupt PNG: palette index out of range")
        img = pal[img[:, :, 0]]
    return img


def encode_png(img: np.ndarray) -> bytes:
    """Inverse of :func:`decode_png` for 8-bit images (filter 0 +
    stdlib-zlib DEFLATE) — fixture + sink side; round-trip pinned in
    tests against rasters exercising every filter type on decode."""
    import zlib

    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    body = img.astype(np.uint8).reshape(h, w * c)
    raw = b"".join(b"\x00" + row.tobytes() for row in body)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Format-sniffing image decode — all REAL decoders: JPEG
    (operators/jpeg.py: Huffman + DCT in numpy — baseline AND
    progressive, decodes standard libjpeg files incl. 4:2:0), PNG
    (stdlib-zlib inflate + filter reversal), GIF (operators/gif.py:
    variable-width LZW, interlace, first frame), and binary netpbm.
    Anything else raises at the documented codec seam — plug PIL/av in
    here for further formats / video codecs."""
    if payload[:2] == b"\xff\xd8":
        from secure_agent_api_vector_search_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[: len(PNG_SIG)] == PNG_SIG:
        return decode_png(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from secure_agent_api_vector_search_spark.operators.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from secure_agent_api_vector_search_spark.operators.webp import decode_webp

        return decode_webp(payload)
    if payload[:2] == b"BM":
        from secure_agent_api_vector_search_spark.operators.bmp import decode_bmp

        return decode_bmp(payload)
    if payload[:4] == b"\x00\x00\x01\x00":
        from secure_agent_api_vector_search_spark.operators.bmp import decode_ico

        return decode_ico(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from secure_agent_api_vector_search_spark.operators.tiff import decode_tiff

        return decode_tiff(payload)
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    raise NotImplementedError(
        f"no decoder for image magic {payload[:4]!r}; plug an image "
        "library (PIL.Image.open) in here for formats beyond "
        "JPEG/PNG/GIF/WebP-lossless/TIFF-baseline/BMP/ICO/netpbm"
    )


def decode_image_batch(payloads: list[bytes]) -> list[np.ndarray]:
    """Order-preserving batch decode: JPEG payloads fuse through
    jpeg.decode_jpeg_batch — every restart segment of every image in
    the Arrow batch becomes a lane of ONE vectorized entropy pass (the
    shape the codec-throughput bench measures; 2.9x the per-image
    loop on DRI corpora) — and WebP payloads through
    webp.decode_webp_batch, where each qualifying VP8L image is a lane
    of a vectorized multi-image pixel pass. Other formats decode per
    payload via :func:`decode_image`; below the engines' lane
    thresholds the batch APIs themselves fall back to the serial
    decoders, so small batches cost exactly what the loop did.

    Byte-identical payloads decode ONCE: real crawl corpora carry many
    exact-duplicate images (trackers, logos, re-hosted files), and the
    decode cost is per distinct payload, not per row — duplicates get
    independent array copies (a memcpy, ~1000x cheaper than a decode),
    so callers may mutate results freely."""
    out: list = [None] * len(payloads)
    first: dict[bytes, int] = {}
    dups: list[tuple[int, int]] = []
    uniq: list[int] = []
    for i, pl in enumerate(payloads):
        # bytes(pl) on an exact-bytes payload is a full copy — an Arrow
        # batch of large images transiently doubled executor memory
        # (round-12 ADVICE); key on the object itself when it already
        # IS bytes (dict hashing is by content either way)
        j = first.setdefault(pl if type(pl) is bytes else bytes(pl), i)
        if j == i:
            uniq.append(i)
        else:
            dups.append((i, j))
    jp = [i for i in uniq if payloads[i][:2] == b"\xff\xd8"]
    if jp:
        from secure_agent_api_vector_search_spark.operators.jpeg import (
            decode_jpeg_batch,
        )

        for i, img in zip(jp, decode_jpeg_batch([payloads[i] for i in jp])):
            out[i] = img
    wp = [i for i in uniq
          if payloads[i][:4] == b"RIFF" and payloads[i][8:12] == b"WEBP"]
    if wp:
        from secure_agent_api_vector_search_spark.operators.webp import (
            decode_webp_batch,
        )

        for i, img in zip(wp, decode_webp_batch([payloads[i] for i in wp])):
            out[i] = img
    for i in uniq:
        if out[i] is None:
            out[i] = decode_image(payloads[i])
    for i, j in dups:
        out[i] = out[j].copy()
    return out


def thumbnail(img: np.ndarray, size: int = 8) -> np.ndarray:
    """Nearest-neighbor downsample to (size, size, channels) — the
    resize stage of an image pipeline, pure integer indexing."""
    h, w, _ = img.shape
    ys = (np.arange(size) * h) // size
    xs = (np.arange(size) * w) // size
    return img[ys][:, xs]


IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_channels int, "
    "mean_luma double, thumb_sha256 string"
)


def image_features(with_payload: DataFrame, thumb_size: int = 8) -> DataFrame:
    """REAL image decode → features via mapInPandas: true dimensions,
    mean luminance, and the sha256 of a nearest-neighbor thumbnail
    (the resize stage, digested so the output stays scalar-typed).
    Arrow-batched, partition-preserving, decoder runs per batch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            imgs = decode_image_batch([p if type(p) is bytes else bytes(p)
                                       for p in pdf["payload"]])
            for doc_id, img in zip(pdf["doc_id"], imgs):
                h, w, c = img.shape
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        c,
                        float(img.mean()),
                        hashlib.sha256(
                            thumbnail(img, thumb_size).tobytes()
                        ).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_channels",
                    "mean_luma", "thumb_sha256",
                ],
            )

    return with_payload.mapInPandas(op, schema=IMAGE_FEATURE_SCHEMA)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode PCM WAV bytes to (sample_rate, samples[n, channels])
    via the stdlib ``wave`` reader — a real audio decoder."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        rate = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {width}")
    return rate, np.frombuffer(raw, dtype=dtype).reshape(-1, ch)


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Inverse of :func:`decode_wav` for int16 PCM. Writes the canonical
    44-byte RIFF header directly — byte-identical to the stdlib ``wave``
    writer's output (roundtrip pinned in tests) but without a
    BytesIO+object per call, which matters when a synthesis/transcode
    stage emits payloads per Arrow batch."""
    ch = samples.shape[1]
    data = samples.astype(np.int16).tobytes()
    return b"".join(
        (
            b"RIFF",
            (36 + len(data)).to_bytes(4, "little"),
            b"WAVEfmt ",
            (16).to_bytes(4, "little"),
            (1).to_bytes(2, "little"),            # PCM
            ch.to_bytes(2, "little"),
            rate.to_bytes(4, "little"),
            (rate * ch * 2).to_bytes(4, "little"),  # byte rate
            (ch * 2).to_bytes(2, "little"),         # block align
            (16).to_bytes(2, "little"),             # bits per sample
            b"data",
            len(data).to_bytes(4, "little"),
            data,
        )
    )


def encode_adts(frame_payloads: list[bytes], fs_index: int = 4,
                channels: int = 2, profile: int = 1) -> bytes:
    """ADTS-framed AAC stream fixture (ISO 13818-7 §6.2): each raw
    payload gets a 7-byte protection-absent fixed+variable header with
    the real 13-bit frame length. The payloads are opaque (AAC raw
    data blocks are a decode seam) — the HEADER arithmetic is what
    media_meta.aac_adts_summary then parses."""
    out = bytearray()
    for data in frame_payloads:
        flen = 7 + len(data)
        if flen >= 1 << 13:
            raise ValueError("ADTS frame too large for 13-bit length")
        out += bytes((
            0xFF,
            0xF1,  # MPEG-4, layer 00, protection_absent=1
            ((profile & 3) << 6) | ((fs_index & 0xF) << 2)
            | ((channels >> 2) & 1),
            ((channels & 3) << 6) | (flen >> 11),
            (flen >> 3) & 0xFF,
            ((flen & 7) << 5) | 0x1F,  # buffer fullness hi (VBR)
            0xFC,                       # fullness lo + 1 raw block
        ))
        out += data
    if not out:
        raise ValueError("an ADTS stream needs at least one frame")
    return bytes(out)


def encode_flac_streaminfo(rate: int, channels: int, bits: int,
                           total_samples: int) -> bytes:
    """A FLAC file head fixture: fLaC magic + a last-flagged
    STREAMINFO block (the only metadata a structural scan needs; audio
    frames are a decode seam and omitted)."""
    packed = (
        (rate << 44)
        | ((channels - 1) << 41)
        | ((bits - 1) << 36)
        | (total_samples & ((1 << 36) - 1))
    )
    body = (
        (4096).to_bytes(2, "big") + (4096).to_bytes(2, "big")
        + (0).to_bytes(3, "big") + (0).to_bytes(3, "big")
        + packed.to_bytes(8, "big")
        + b"\x00" * 16  # md5 of unencoded audio (unset)
    )
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def encode_mp4_audio_stub(samples: list[bytes], rate: int = 44100,
                          channels: int = 2,
                          codec: bytes = b"mp4a") -> bytes:
    """A structurally complete audio-only MP4 (ISO 14496-12) whose
    sample data is opaque: ftyp + mdat + moov with a sound-handler
    track, an AudioSampleEntry carrying channelcount/samplerate, and a
    real stts/stsc/stsz/stco table. Duration in mdhd is
    1024·n_samples at ``rate`` timescale (AAC frame granularity)."""
    import struct as _s

    from secure_agent_api_vector_search_spark.operators.mp4 import (
        _box,
        _full_box,
    )

    if not samples:
        raise ValueError("an audio track needs at least one sample")
    sizes = [len(s) for s in samples]
    ftyp = _box(b"ftyp", b"isom" + _s.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(samples))
    off = len(ftyp) + 8
    chunk_offsets = []
    acc = off
    for i, sz in enumerate(sizes):
        if i % 3 == 0:
            chunk_offsets.append(acc)
        acc += sz
    duration = 1024 * len(samples)
    mvhd = _full_box(
        b"mvhd", 0, 0,
        _s.pack(">IIII", 0, 0, rate, duration)
        + _s.pack(">i", 0x00010000) + _s.pack(">h", 0x0100)
        + b"\x00" * 10
        + _s.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + _s.pack(">I", 2),
    )
    tkhd = _full_box(
        b"tkhd", 0, 3,
        _s.pack(">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + _s.pack(">hhhh", 0, 0, 0x0100, 0)
        + _s.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + _s.pack(">II", 0, 0),
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        _s.pack(">IIII", 0, 0, rate, duration) + _s.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        _s.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"SoundHandler\x00",
    )
    smhd = _full_box(b"smhd", 0, 0, _s.pack(">hh", 0, 0))
    dinf = _box(b"dinf", _full_box(
        b"dref", 0, 0, _s.pack(">I", 1) + _full_box(b"url ", 0, 1, b"")))
    sample_entry = _box(
        codec,
        b"\x00" * 6 + _s.pack(">H", 1)       # data_reference_index
        + b"\x00" * 8                          # reserved
        + _s.pack(">HH", channels, 16)        # channelcount, samplesize
        + _s.pack(">HH", 0, 0)                # pre_defined, reserved
        + _s.pack(">I", rate << 16),          # samplerate 16.16
    )
    stsd = _full_box(b"stsd", 0, 0, _s.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0, _s.pack(">III", 1, len(samples), 1024))
    stsc_entries = [(1, min(3, len(sizes)), 1)]
    tail = len(sizes) % 3
    if tail and len(chunk_offsets) > 1:
        stsc_entries.append((len(chunk_offsets), tail, 1))
    stsc = _full_box(
        b"stsc", 0, 0,
        _s.pack(">I", len(stsc_entries))
        + b"".join(_s.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full_box(
        b"stsz", 0, 0,
        _s.pack(">II", 0, len(sizes)) + b"".join(_s.pack(">I", s) for s in sizes),
    )
    stco = _full_box(
        b"stco", 0, 0,
        _s.pack(">I", len(chunk_offsets))
        + b"".join(_s.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", smhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def synthetic_image_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic REAL P5 images derived from each document's text
    (seeded byte pattern sized by the text digest): (doc_id, payload).
    Exists because this container ships no real image corpus — the
    payloads are genuine netpbm bytes, so the decode path downstream is
    the production path, not a fake."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                h, w = 16 + d[0] % 48, 16 + d[1] % 48
                px = np.frombuffer(
                    (d * ((h * w) // len(d) + 1))[: h * w], dtype=np.uint8
                ).reshape(h, w, 1)
                rows.append((doc_id, encode_netpbm(px)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_png_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic REAL RGB PNGs from each document's text (digest-
    seeded byte pattern, digest-sized dimensions — indices 2/3, so the
    rasters differ from the netpbm fixture's): (doc_id, payload). The
    payloads are genuine zlib-compressed PNG bytes, so the downstream
    decode is real inflate + filter reversal, not a fake."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                h, w = 16 + d[2] % 32, 16 + d[3] % 32
                px = np.frombuffer(
                    (d * ((h * w * 3) // len(d) + 1))[: h * w * 3], dtype=np.uint8
                ).reshape(h, w, 3)
                rows.append((doc_id, encode_png(px)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_image_stream_epochs(
    documents: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Two deterministic image-delivery epochs for the streaming
    perceptual-dedup surface: epoch 1 is every document's netpbm
    fixture raster; epoch 2 plants PNG re-encodes (doc_id % 7 == 0,
    ids +1_000_000), GIF copies (doc_id % 11 == 0, ids +2_000_000) —
    both decode to the SAME raster, so they must be dropped against
    the admitted corpus across a format change — plus genuinely new
    rasters (doc_id % 13 == 0, ids +3_000_000, digest indices 22/23)
    that must be admitted. Fully replayable with no codec code
    (oracle_gen.py::image_dedup_streaming_oracle)."""
    from secure_agent_api_vector_search_spark.operators.gif import encode_gif

    def raster(text: str) -> np.ndarray:
        # the same spec as synthetic_image_payloads / oracle_gen's
        # _image_raster — the copies must be perceptual twins of the
        # batch images the other gates already pin
        d = hashlib.sha256((text or "").encode()).digest()
        h, w = 16 + d[0] % 48, 16 + d[1] % 48
        return np.frombuffer(
            (d * ((h * w) // len(d) + 1))[: h * w], dtype=np.uint8
        ).reshape(h, w, 1)

    def op1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (doc_id, encode_netpbm(raster(text)))
                for doc_id, text in zip(pdf["doc_id"], pdf["text"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    def op2(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if doc_id % 7 == 0:
                    rows.append((doc_id + 1_000_000, encode_png(raster(text))))
                if doc_id % 11 == 0:
                    rows.append((doc_id + 2_000_000, encode_gif(raster(text))))
                if doc_id % 13 == 0:
                    d = hashlib.sha256((text or "").encode()).digest()
                    h, w = 8 + d[22] % 16, 8 + d[23] % 16
                    fresh = np.frombuffer(
                        (d[::-1] * ((h * w) // len(d) + 1))[: h * w],
                        dtype=np.uint8,
                    ).reshape(h, w, 1)
                    rows.append((doc_id + 3_000_000, encode_netpbm(fresh)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    base = documents.select("doc_id", "text")
    schema = "doc_id long, payload binary"
    return base.mapInPandas(op1, schema=schema), base.mapInPandas(
        op2, schema=schema
    )


def synthetic_gif_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic REAL GIFs from each document's text: (doc_id,
    payload). Digest indices 10/11 size the raster (distinct from the
    netpbm/PNG/JPEG fixtures); a 64-entry palette and the index map
    both derive from the digest stream, so the raster is exactly
    reconstructible with no codec code (oracle_gen.py::_gif_raster)
    while the payload is genuine variable-width LZW the decoder must
    actually decompress. GIF is lossless by design — no block-flat
    trick needed."""
    from secure_agent_api_vector_search_spark.operators.gif import encode_gif

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                h, w = 16 + d[10] % 32, 16 + d[11] % 32
                pal = np.frombuffer(
                    (d * 6)[: 64 * 3], dtype=np.uint8
                ).reshape(64, 3)
                stream = np.frombuffer(
                    (d * ((h * w) // len(d) + 1))[: h * w], dtype=np.uint8
                )
                rows.append((doc_id, encode_gif(pal[(stream % 64).reshape(h, w)])))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_webp_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic REAL lossless-WebP payloads from each document's
    text: (doc_id, payload). Digest indices 18/19 size the raster
    (distinct from every other fixture's); digest index 20 picks the
    encode shape per document — plain literals, subtract-green,
    LZ77 runs, color cache, or a uniform predictor — so one corpus
    exercises several VP8L decoder paths. WebP-lossless is lossless by
    definition: the raster reconstructs exactly, and the expected
    features derive with no codec code at all (oracle_gen.py)."""
    from secure_agent_api_vector_search_spark.operators.webp import (
        encode_webp_lossless,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                h, w = 8 + d[18] % 16, 8 + d[19] % 16
                px = np.frombuffer(
                    (d * ((h * w * 3) // len(d) + 1))[: h * w * 3], dtype=np.uint8
                ).reshape(h, w, 3)
                variant = d[20] % 5
                if variant == 0:
                    payload = encode_webp_lossless(px)
                elif variant == 1:
                    payload = encode_webp_lossless(px, subtract_green=True)
                elif variant == 2:
                    payload = encode_webp_lossless(px, lz_runs=True)
                elif variant == 3:
                    payload = encode_webp_lossless(px, cache_bits=4)
                else:
                    payload = encode_webp_lossless(px, predictor_mode=d[21] % 14)
                rows.append((doc_id, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_bmp_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic REAL BMP/ICO payloads from each document's text:
    (doc_id, payload). Digest indices 24/25 size the raster; index 26
    picks the container shape — 24-bit BMP, 8-bit palettized grayscale
    BMP, or a classic ICO (headerless DIB + AND mask) — so one corpus
    exercises the bottom-up row flip, BGR ordering, palette expansion,
    stride padding, and the icon-directory walk. All three are
    lossless; the expected raster derives with no codec code
    (oracle_gen.py::_bmp_raster)."""
    from secure_agent_api_vector_search_spark.operators.bmp import (
        encode_bmp,
        encode_ico,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                h, w = 8 + d[24] % 24, 8 + d[25] % 24
                px = np.frombuffer(
                    (d * ((h * w * 3) // len(d) + 1))[: h * w * 3],
                    dtype=np.uint8,
                ).reshape(h, w, 3)
                variant = d[26] % 3
                if variant == 0:
                    payload = encode_bmp(px)
                elif variant == 1:
                    payload = encode_bmp(px[:, :, :1])  # 8-bit grayscale
                else:
                    payload = encode_ico(px)
                rows.append((doc_id, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_tiff_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic REAL baseline-TIFF payloads from each document's
    text: (doc_id, payload). Digest indices 27/28 size the raster;
    index 29 picks the encode shape — uncompressed single-strip,
    PackBits multi-strip, or LZW multi-strip with the horizontal
    predictor — so one corpus exercises the IFD walk, strip assembly,
    both RLE/LZW paths, and the predictor reversal. All lossless; the
    raster derives with no codec code (oracle_gen.py::_tiff_raster)."""
    from secure_agent_api_vector_search_spark.operators.tiff import encode_tiff

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                h, w = 8 + d[27] % 24, 8 + d[28] % 24
                px = np.frombuffer(
                    (d * ((h * w * 3) // len(d) + 1))[: h * w * 3],
                    dtype=np.uint8,
                ).reshape(h, w, 3)
                variant = d[29] % 3
                if variant == 0:
                    payload = encode_tiff(px)
                elif variant == 1:
                    payload = encode_tiff(
                        px, compression="packbits", rows_per_strip=4
                    )
                else:
                    payload = encode_tiff(
                        px, compression="lzw", rows_per_strip=6, predictor=True
                    )
                rows.append((doc_id, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_jpeg_payloads(documents: DataFrame, quality: int = 95) -> DataFrame:
    """Deterministic REAL baseline JPEGs from each document's text:
    (doc_id, payload). Rasters are BLOCK-FLAT grayscale (each 8×8 block
    one digest-derived value, dimensions digest-sized multiples of 8) —
    flat blocks have exactly-zero AC coefficients and a DC the default
    quantizer divides, so the decode is mathematically LOSSLESS and the
    expected output is derivable without running any codec code
    (oracle_gen.py). The payload bytes are genuine entropy-coded JPEG:
    the decode downstream exercises the full Huffman + dequant + IDCT
    path."""
    from secure_agent_api_vector_search_spark.operators.jpeg import encode_jpeg

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                bh, bw = 2 + d[4] % 4, 2 + d[5] % 4  # blocks per side
                vals = np.frombuffer(
                    (d * ((bh * bw) // len(d) + 1))[: bh * bw], dtype=np.uint8
                ).reshape(bh, bw)
                img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:, :, None]
                rows.append((doc_id, encode_jpeg(img, quality=quality)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_wav_payloads(documents: DataFrame, rate: int = 8000) -> DataFrame:
    """Deterministic REAL PCM WAV payloads: a sine tone whose frequency,
    amplitude, and length derive from the text digest, with a silent
    tail (so the activity screen has both regimes)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                n = 2048 + 256 * (d[2] % 8)
                freq = 100 + 10 * d[3]
                amp = 2000 + 100 * d[4]
                t = np.arange(n) / rate
                tone = (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)
                silence = np.zeros(1024, dtype=np.int16)
                samples = np.concatenate([tone, silence])[:, None]
                rows.append((doc_id, encode_wav(samples, rate)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


AUDIO_FEATURE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, n_channels int, "
    "duration_sec double, rms double, n_active_windows int"
)

_PCM_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def _parse_wav_header(payload: bytes) -> tuple[int, int, int, int, int] | None:
    """Cheap RIFF chunk walk (no stdlib ``wave`` object, no frame copy):
    returns (rate, channels, sample_width_bytes, data_offset, data_len)
    for plain PCM, or None when the payload needs the slow-path decoder
    (compressed/extensible formats, truncated headers)."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    rate = ch = width = -1
    pos, n = 12, len(payload)
    data_off = data_len = -1
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        if cid == b"fmt " and size >= 16:
            fmt = int.from_bytes(payload[pos + 8:pos + 10], "little")
            if fmt != 1:  # not plain PCM — let stdlib wave judge it
                return None
            ch = int.from_bytes(payload[pos + 10:pos + 12], "little")
            rate = int.from_bytes(payload[pos + 12:pos + 16], "little")
            width = int.from_bytes(payload[pos + 22:pos + 24], "little") // 8
        elif cid == b"data":
            data_off, data_len = pos + 8, min(size, n - pos - 8)
        pos += 8 + size + (size & 1)
    if min(rate, ch, width, data_off) < 0 or ch == 0 or width not in _PCM_DTYPES:
        return None
    return rate, ch, width, data_off, data_len


def _audio_feature_rows(
    pdf: pd.DataFrame, window: int, activity_rms: float
) -> pd.DataFrame:
    """Whole-batch audio feature pass (the 100 TB hot path): one cheap
    header parse per payload, then ONE concatenated numpy pipeline per
    (dtype, channels) group — squared-sample sums via ``reduceat`` at
    segment boundaries, so RMS and the activity envelope never loop
    per row. Per-segment sums touch only that segment's samples, so
    results don't depend on batch composition. Payloads the fast header
    walk can't classify fall back to the stdlib decoder row-by-row."""
    out_rate = np.zeros(len(pdf), dtype=np.int64)
    out_n = np.zeros(len(pdf), dtype=np.int64)
    out_ch = np.zeros(len(pdf), dtype=np.int64)
    out_rms = np.zeros(len(pdf), dtype=np.float64)
    out_act = np.zeros(len(pdf), dtype=np.int64)

    payloads = [bytes(b) for b in pdf["payload"]]
    groups: dict[tuple[int, int], list[int]] = {}
    headers: list[tuple[int, int, int, int, int] | None] = []
    for i, b in enumerate(payloads):
        h = _parse_wav_header(b)
        headers.append(h)
        if h is None:
            rate, x = decode_wav(b)  # slow path: stdlib wave
            mono = x.astype(np.float64).mean(axis=1)
            nf = len(mono)
            out_rate[i], out_n[i], out_ch[i] = rate, nf, x.shape[1]
            out_rms[i] = float(np.sqrt(np.mean(mono**2))) if nf else 0.0
            nwin = nf // window
            if nwin:
                fr = mono[: nwin * window].reshape(nwin, window)
                out_act[i] = int(
                    (np.sqrt(np.mean(fr**2, axis=1)) >= activity_rms).sum()
                )
        else:
            groups.setdefault((h[2], h[1]), []).append(i)

    thresh_sq = float(activity_rms) ** 2 * window
    for (width, ch), idxs in groups.items():
        dtype = _PCM_DTYPES[width]
        segs = []
        n_frames = np.empty(len(idxs), dtype=np.int64)
        for j, i in enumerate(idxs):
            rate, _ch, _w, off, dlen = headers[i]
            usable = (dlen // (width * ch)) * ch  # whole frames only
            segs.append(
                np.frombuffer(payloads[i], dtype=dtype, count=usable, offset=off)
            )
            n_frames[j] = usable // ch
            out_rate[i], out_n[i], out_ch[i] = rate, n_frames[j], ch
        flat = np.concatenate(segs) if segs else np.empty(0, dtype=dtype)
        # every segment holds whole frames, so the group-wide reshape
        # keeps frame boundaries aligned across segments
        mono = flat.astype(np.float64).reshape(-1, ch).mean(axis=1)
        sq = mono * mono
        starts = np.concatenate(([0], np.cumsum(n_frames)))[:-1]
        nz = n_frames > 0
        if nz.any():
            seg_sums = np.zeros(len(idxs), dtype=np.float64)
            # reduceat needs strictly valid indices: compute on the
            # non-empty segments and scatter back
            valid_starts = starts[nz]
            sums = np.add.reduceat(sq, valid_starts) if len(sq) else np.array([])
            seg_sums[nz] = sums
            for j, i in enumerate(idxs):
                out_rms[i] = (
                    float(np.sqrt(seg_sums[j] / n_frames[j])) if n_frames[j] else 0.0
                )
        # activity windows: one reduceat over the window starts of ALL
        # segments; a sentinel start at each segment's tail keeps the
        # remainder out of the last window
        nwin = n_frames // window
        if nwin.sum() > 0:
            win_starts, owner, is_win = [], [], []
            for j in range(len(idxs)):
                if nwin[j]:
                    ws = starts[j] + window * np.arange(nwin[j], dtype=np.int64)
                    win_starts.append(ws)
                    owner.append(np.full(nwin[j], j, dtype=np.int64))
                    is_win.append(np.ones(nwin[j], dtype=bool))
                    tail = starts[j] + nwin[j] * window
                    if tail < starts[j] + n_frames[j]:
                        win_starts.append(np.array([tail], dtype=np.int64))
                        owner.append(np.array([j], dtype=np.int64))
                        is_win.append(np.array([False]))
                elif n_frames[j]:
                    # frames but no full window: a sentinel at the segment
                    # START terminates the previous segment's last interval,
                    # so these samples never leak into a neighbor's window
                    win_starts.append(np.array([starts[j]], dtype=np.int64))
                    owner.append(np.array([j], dtype=np.int64))
                    is_win.append(np.array([False]))
            ws = np.concatenate(win_starts)
            own = np.concatenate(owner)
            real = np.concatenate(is_win)
            order = np.argsort(ws, kind="stable")
            ws, own, real = ws[order], own[order], real[order]
            wsums = np.add.reduceat(sq, ws)
            active_mask = real & (wsums >= thresh_sq)
            counts = np.bincount(own[active_mask], minlength=len(idxs))
            for j, i in enumerate(idxs):
                out_act[i] = int(counts[j])

    rates = out_rate.astype(np.float64)
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"].to_numpy(),
            "sample_rate": out_rate,
            "n_samples": out_n,
            "n_channels": out_ch,
            "duration_sec": np.divide(
                out_n, rates, out=np.zeros(len(pdf)), where=rates > 0
            ),
            "rms": out_rms,
            "n_active_windows": out_act,
        }
    )


def audio_features(
    with_payload: DataFrame, window: int = 1024, activity_rms: float = 100.0
) -> DataFrame:
    """REAL audio decode → features via mapInPandas: rate/duration/RMS
    plus an energy-envelope frame-sample (count of ``window``-sample
    frames whose RMS clears ``activity_rms`` — the voice-activity
    screen of an audio curation pipeline). PCM payloads take the
    whole-batch vectorized pass (:func:`_audio_feature_rows`); anything
    the cheap header walk can't classify uses the stdlib decoder."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _audio_feature_rows(pdf, window, activity_rms)

    return with_payload.mapInPandas(op, schema=AUDIO_FEATURE_SCHEMA)


MP3_SUMMARY_SCHEMA = (
    "doc_id long, n_frames int, duration_sec double, sample_rate int, "
    "bitrate_kbps_mean double, vbr boolean, layer int, mpeg_version string"
)


def mp3_stream_summary(with_payload: DataFrame) -> DataFrame:
    """Structural MPEG-audio pass over (doc_id, payload): the frame-
    sync walk of operators/mp3.py per payload — frame count, duration,
    sample rate, mean bitrate, VBR flag — the cheap classify-before-
    decode stage a 100 TB audio corpus runs first. Map-only, Arrow-
    batched, no shuffle."""
    from secure_agent_api_vector_search_spark.operators.mp3 import mp3_summary

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = mp3_summary(bytes(payload))
                rows.append((
                    doc_id, s["n_frames"], s["duration_sec"], s["sample_rate"],
                    s["bitrate_kbps_mean"], s["vbr"], s["layer"], s["version"],
                ))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "duration_sec", "sample_rate",
                    "bitrate_kbps_mean", "vbr", "layer", "mpeg_version",
                ],
            )

    return with_payload.mapInPandas(op, schema=MP3_SUMMARY_SCHEMA)


def synthetic_mp3_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic structurally-valid MPEG-1 Layer III streams from
    each document's text: (doc_id, payload). Digest index 12 sizes the
    frame count, successive digest bytes pick each frame's bitrate
    from the Layer-III table and its padding bit, index 13 decides
    whether an ID3v2 tag leads — so the expected summary derives with
    no parser code at all (oracle_gen.py) while the operator runs the
    real tag-skip + frame-sync walk + size arithmetic."""
    from secure_agent_api_vector_search_spark.operators.mp3 import (
        _BITRATES,
        encode_mp3_frames,
    )

    table = _BITRATES[("1", 3)]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                n = 6 + d[12] % 8
                specs = [
                    (table[d[(14 + i) % 32] % 14], d[(14 + i) % 32] >> 7)
                    for i in range(n)
                ]
                rows.append((
                    doc_id,
                    encode_mp3_frames(specs, id3v2_bytes=(d[13] % 2) * 17),
                ))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# video: frame container, REAL decode, frame sampling, scene cuts
# ---------------------------------------------------------------------------

VIDEO_MAGIC = b"RAWV"


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Encode frames as the self-contained RAWV container: magic +
    ascii frame count + newline + concatenated binary netpbm frames.
    A real (if minimal) video container — every frame is independently
    parseable, so the decoder below is genuine bytes-work, not a fake.
    Codec formats (h264/vp9) stay behind the documented stub seam like
    jpeg/mp3 (extract_features decode_stub)."""
    if not frames:
        raise ValueError("a video needs at least one frame")
    return (
        VIDEO_MAGIC
        + f"{len(frames)}\n".encode()
        + b"".join(encode_netpbm(f) for f in frames)
    )


def encode_video_mjpeg(
    frames: list[np.ndarray], quality: int = 95, restart_interval: int = 0
) -> bytes:
    """Encode frames as a Motion-JPEG elementary stream: concatenated
    SOI..EOI baseline JPEGs (the frame layout inside AVI 'MJPG' chunks
    and multipart-HTTP camera streams) — a REAL video codec end to end,
    every frame genuine entropy-coded DCT data (operators/jpeg.py)."""
    from secure_agent_api_vector_search_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("a video needs at least one frame")
    return b"".join(
        encode_jpeg(f, quality=quality, restart_interval=restart_interval)
        for f in frames
    )


def decode_video(payload: bytes) -> list[np.ndarray]:
    """Decode a video payload to its frames ((h, w, c) uint8 arrays),
    sniffing the container: RAWV (netpbm frame walk — each header
    declares its raster size, so the walk is exact with no sentinel
    scanning), Motion-JPEG (SOI magic — each frame's decoder reports
    the bytes it consumed through EOI, so boundaries are exact even
    though 0xFFD9 can occur inside segment bodies), or ISO-BMFF
    MP4/QuickTime (ftyp magic — full box + sample-table walk,
    operators/mp4.py; MJPEG tracks decode for real, compressed codecs
    raise by name). H.264/VP9/AV1 bitstreams remain the stub seam."""
    if len(payload) >= 12 and payload[4:8] == b"ftyp":  # ISO-BMFF container
        from secure_agent_api_vector_search_spark.operators.mp4 import decode_mp4

        return decode_mp4(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":  # AVI container
        from secure_agent_api_vector_search_spark.operators.avi import decode_avi

        return decode_avi(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":  # animated WebP
        from secure_agent_api_vector_search_spark.operators.webp import (
            decode_webp_frames,
        )

        return decode_webp_frames(payload)
    if payload[:2] == b"\xff\xd8":  # Motion-JPEG elementary stream
        from secure_agent_api_vector_search_spark.operators import jpeg as J

        # deferred walk: frame boundaries come from the exact consumed
        # count, entropy decode of ALL frames fuses into lane-engine
        # passes (progressive frames fall back per frame)
        jobs: list[dict] = []
        thunks = []
        i = 0
        while i < len(payload):
            sub: list[dict] = []
            try:
                thunk, consumed = J.decode_jpeg_consumed(
                    payload[i:], _defer_jobs=sub)
            except J._NotBatchable:
                frame, consumed = J.decode_jpeg_consumed(payload[i:])
                thunks.append((lambda f=frame: f))
                i += consumed
                continue
            jobs.extend(sub)
            thunks.append(thunk)
            i += consumed
        if jobs:
            total = sum(len(j["seg_spans"]) for j in jobs)
            if total >= J._LANE_MIN_SEGS:
                group: list[dict] = []
                glanes = 0
                for j in jobs:
                    jl = len(j["seg_spans"])
                    if group and glanes + jl > J._LANE_CHUNK:
                        J._run_lane_jobs(group)
                        group, glanes = [], 0
                    group.append(j)
                    glanes += jl
                if group:
                    J._run_lane_jobs(group)
            else:
                for j in jobs:
                    J._decode_baseline_scalar(j)
        return [t() for t in thunks]
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError(
            f"not a RAWV or MJPEG/MP4/AVI payload: {payload[:4]!r}"
        )
    nl = payload.index(b"\n", 4)
    n = int(payload[4:nl])
    if n < 1:
        # encode_video refuses to produce an empty container, so a
        # zero/negative count is corruption — fail with the module's
        # ValueError contract, not a downstream IndexError mid-task
        raise ValueError(f"corrupt RAWV payload: frame count {n}")
    frames: list[np.ndarray] = []
    i = nl + 1
    for _ in range(n):
        frame, consumed = _decode_netpbm_consumed(payload[i:])
        frames.append(frame)
        i += consumed
    return frames


VIDEO_FEATURE_SCHEMA = (
    "doc_id long, n_frames int, n_sampled int, width int, height int, "
    "mean_luma double, n_scene_cuts int, sampled_sha256 string"
)


def video_features(
    with_payload: DataFrame, sample_every: int = 2, cut_threshold: float = 24.0
) -> DataFrame:
    """REAL video decode → features via mapInPandas: the frame-sample
    stage of a multimodal training pipeline. Per document: frame
    count, every-``sample_every``-th frame retained (the sampled set
    digested to sha256 so output stays scalar), per-video mean
    luminance, and SCENE CUTS — consecutive-frame mean-luminance jumps
    above ``cut_threshold`` (the shot-boundary heuristic real
    pipelines seed keyframe extraction with).

    Arrow-batched and partition-preserving like image/audio_features;
    per-task memory is one video's frames at a time (frames decode
    lazily per payload, never a whole batch of rasters at once)."""
    if sample_every < 1:
        raise ValueError("sample_every must be >= 1")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_video(bytes(payload))
                lumas = np.array([float(f.mean()) for f in frames])
                cuts = int(np.sum(np.abs(np.diff(lumas)) > cut_threshold))
                sampled = frames[::sample_every]
                digest = hashlib.sha256()
                for f in sampled:
                    digest.update(f.tobytes())
                h, w, _c = frames[0].shape
                rows.append(
                    (
                        doc_id,
                        len(frames),
                        len(sampled),
                        w,
                        h,
                        float(lumas.mean()),
                        cuts,
                        digest.hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_sampled", "width", "height",
                    "mean_luma", "n_scene_cuts", "sampled_sha256",
                ],
            )

    return with_payload.mapInPandas(op, schema=VIDEO_FEATURE_SCHEMA)


def synthetic_video_payloads(documents: DataFrame, n_frames: int = 8) -> DataFrame:
    """Deterministic REAL RAWV videos from each document's text:
    (doc_id, payload). Frames drift slowly in luminance except one
    PLANTED SCENE CUT halfway through (a fixed -100 darkening — NOT an
    inversion, whose mean-luma delta |255 - 2*mean| vanishes for
    mid-gray content), so the cut detector downstream has a known
    ground truth per document."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                h, w = 8 + d[0] % 16, 8 + d[1] % 16
                base = np.frombuffer(
                    (d * ((h * w) // len(d) + 1))[: h * w], dtype=np.uint8
                ).reshape(h, w, 1)
                # clamp above the darkening so the cut's mean shift
                # survives the [0,255] clip for any content
                base = np.clip(base, 120, 230)
                frames = []
                for t in range(n_frames):
                    shift = 4 * t - (100 if t >= n_frames // 2 else 0)
                    f = np.clip(base.astype(np.int32) + shift, 0, 255)
                    frames.append(f.astype(np.uint8))
                rows.append((doc_id, encode_video(frames)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_mjpeg_payloads(
    documents: DataFrame, n_frames: int = 8, quality: int = 95,
    restart_interval: int = 2,
) -> DataFrame:
    """Deterministic REAL Motion-JPEG videos from each document's text:
    (doc_id, payload), every frame a genuine entropy-coded baseline
    JPEG (with restart markers, so DRI/RSTn sits on the hard gate).
    Frames are BLOCK-FLAT grayscale — base 8×8-block values from the
    digest (indices 6/7 size the block grid, so the rasters differ
    from the RAWV fixture's), clipped to [120, 230], +4t luminance
    drift, and the planted −100 mid-video scene cut. Uniform shifts of
    flat blocks stay flat, and a flat block's DC is always even while
    AC is exactly zero, so at the default tables (q_DC = 2) EVERY
    frame decodes LOSSLESSLY: the expected features derive with no
    codec code at all (oracle_gen.py), while the operator runs the
    full per-frame Huffman + dequant + IDCT chain."""
    from secure_agent_api_vector_search_spark.operators.jpeg import encode_jpeg

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                bh, bw = 2 + d[6] % 3, 2 + d[7] % 3  # blocks per side
                vals = np.frombuffer(
                    (d * ((bh * bw) // len(d) + 1))[: bh * bw], dtype=np.uint8
                ).reshape(bh, bw)
                base = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:, :, None]
                base = np.clip(base, 120, 230)
                frames = []
                for t in range(n_frames):
                    shift = 4 * t - (100 if t >= n_frames // 2 else 0)
                    f = np.clip(base.astype(np.int32) + shift, 0, 255)
                    frames.append(f.astype(np.uint8))
                rows.append((
                    doc_id,
                    encode_video_mjpeg(
                        frames, quality=quality,
                        restart_interval=restart_interval,
                    ),
                ))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def sps_fixture_bytes(w_mbs: int, h_mbs: int, crop_right_units: int = 0,
                      level_idc: int = 30) -> bytes:
    """A minimal LEGAL baseline-profile H.264 SPS NAL (ITU-T H.264
    §7.3.2.1.1) for the media_metadata fixtures: profile 66, 4:2:0,
    frame_mbs_only, optional right-crop in 2-px units — every field a
    fixed-length or Exp-Golomb descriptor, with emulation-prevention
    bytes inserted per §7.4.1. The decode side (media_meta.h264_sps)
    must recover exactly 16·w_mbs − 2·crop_right_units pixels wide."""
    bits: list[int] = []

    def u(v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    def ue(v: int) -> None:
        k = v + 1
        n = k.bit_length()
        u(0, n - 1)
        u(k, n)

    u(66, 8)      # profile_idc: Baseline (not in the HIGH set)
    u(0, 8)       # constraint flags + reserved
    u(level_idc, 8)
    ue(0)         # seq_parameter_set_id
    ue(0)         # log2_max_frame_num_minus4
    ue(0)         # pic_order_cnt_type 0
    ue(0)         # log2_max_pic_order_cnt_lsb_minus4
    ue(1)         # max_num_ref_frames
    u(0, 1)       # gaps_in_frame_num_value_allowed_flag
    ue(w_mbs - 1)
    ue(h_mbs - 1)
    u(1, 1)       # frame_mbs_only_flag
    u(1, 1)       # direct_8x8_inference_flag
    if crop_right_units:
        u(1, 1)
        ue(0)
        ue(crop_right_units)
        ue(0)
        ue(0)
    else:
        u(0, 1)
    u(0, 1)       # vui_parameters_present_flag
    u(1, 1)       # rbsp_stop_one_bit
    while len(bits) % 8:
        bits.append(0)
    raw = bytes(
        int("".join(map(str, bits[i:i + 8])), 2) for i in range(0, len(bits), 8)
    )
    # emulation prevention (§7.4.1): 00 00 [00-03] -> 00 00 03 xx
    out = bytearray()
    zeros = 0
    for b in raw:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return b"\x67" + bytes(out)  # NAL header: nal_ref_idc=3, type 7


class _BitAcc:
    """MSB-first bit accumulator shared by the HEVC/AV1 fixture
    writers (the same u/ue primitives sps_fixture_bytes inlines)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        k = v + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def bytes_padded(self, pad_bit: int = 0) -> bytes:
        bits = list(self.bits)
        while len(bits) % 8:
            bits.append(pad_bit)
        return bytes(
            int("".join(map(str, bits[i:i + 8])), 2)
            for i in range(0, len(bits), 8)
        )


def h265_sps_fixture_bytes(pic_w: int, pic_h: int,
                           crop_right_units: int = 0,
                           level_idc: int = 93) -> bytes:
    """A minimal LEGAL Main-profile H.265 SPS NAL (ITU-T H.265
    §7.3.2.2.1) for the media_metadata fixtures: 4:2:0, no sub-layers,
    optional right conformance-window crop in SubWidthC (2-px) units.
    media_meta.h265_sps must recover pic_w − 2·crop_right_units."""
    b = _BitAcc()
    b.u(0, 4)      # sps_video_parameter_set_id
    b.u(0, 3)      # sps_max_sub_layers_minus1
    b.u(1, 1)      # sps_temporal_id_nesting_flag
    # profile_tier_level (§7.3.3), Main profile/tier
    b.u(0, 2)      # general_profile_space
    b.u(0, 1)      # general_tier_flag
    b.u(1, 5)      # general_profile_idc: Main
    b.u(1 << 30, 32)  # compatibility flags (profile 1 bit)
    b.u(1, 1)      # general_progressive_source_flag
    b.u(0, 1)      # general_interlaced_source_flag
    b.u(0, 1)      # general_non_packed_constraint_flag
    b.u(1, 1)      # general_frame_only_constraint_flag
    b.u(0, 44)     # reserved 43 + 1
    b.u(level_idc, 8)
    b.ue(0)        # sps_seq_parameter_set_id
    b.ue(1)        # chroma_format_idc 4:2:0
    b.ue(pic_w)
    b.ue(pic_h)
    if crop_right_units:
        b.u(1, 1)  # conformance_window_flag
        b.ue(0)
        b.ue(crop_right_units)
        b.ue(0)
        b.ue(0)
    else:
        b.u(0, 1)
    b.ue(0)        # bit_depth_luma_minus8
    b.ue(0)        # bit_depth_chroma_minus8
    b.u(1, 1)      # rbsp_stop_one_bit (fixture truncates the tail the
    #                parser never reads — legal for a parse fixture)
    raw = b.bytes_padded()
    # emulation prevention (§7.4.2): 00 00 [00-03] → 00 00 03 xx
    out = bytearray()
    zeros = 0
    for byte in raw:
        if zeros >= 2 and byte <= 3:
            out.append(3)
            zeros = 0
        out.append(byte)
        zeros = zeros + 1 if byte == 0 else 0
    # 2-byte NAL header: type 33 (SPS), layer 0, tid+1 = 1
    return bytes([33 << 1, 1]) + bytes(out)


def hvcc_fixture_bytes(sps_nal: bytes, level_idc: int = 93) -> bytes:
    """An hvcC box (ISO 14496-15 §8.3.3.1) wrapping one SPS NAL —
    22-byte record head + one type-33 NAL array."""
    import struct as _s

    rec = bytearray()
    rec.append(1)                      # configurationVersion
    rec.append(0x01)                   # space/tier/profile_idc (Main)
    rec += (1 << 30).to_bytes(4, "big")  # compatibility flags
    rec += b"\x00" * 6                 # constraint flags
    rec.append(level_idc)
    rec += b"\xf0\x00"                 # min_spatial_segmentation_idc
    rec.append(0xFC)                   # parallelismType
    rec.append(0xFD)                   # chromaFormat 4:2:0
    rec.append(0xF8)                   # bitDepthLumaMinus8
    rec.append(0xF8)                   # bitDepthChromaMinus8
    rec += b"\x00\x00"                 # avgFrameRate
    rec.append(0x03)                   # lengthSizeMinusOne=3
    rec.append(1)                      # numOfArrays
    rec.append(0x20 | 33)              # array_completeness=0, NAL type 33
    rec += _s.pack(">H", 1)
    rec += _s.pack(">H", len(sps_nal)) + sps_nal
    return (8 + len(rec)).to_bytes(4, "big") + b"hvcC" + bytes(rec)


def av1_seqhdr_fixture_bytes(w: int, h: int,
                             seq_level_idx: int = 8) -> bytes:
    """A minimal LEGAL AV1 sequence_header_obu payload (AV1 spec §5.5,
    non-reduced path: one operating point, no timing/decoder-model
    blocks) declaring max frame size w×h."""
    b = _BitAcc()
    b.u(0, 3)      # seq_profile: Main
    b.u(0, 1)      # still_picture
    b.u(0, 1)      # reduced_still_picture_header
    b.u(0, 1)      # timing_info_present_flag
    b.u(0, 1)      # initial_display_delay_present_flag
    b.u(0, 5)      # operating_points_cnt_minus_1
    b.u(0, 12)     # operating_point_idc[0]
    b.u(seq_level_idx, 5)
    if seq_level_idx > 7:
        b.u(0, 1)  # seq_tier[0]
    wbits = max(1, (w - 1).bit_length())
    hbits = max(1, (h - 1).bit_length())
    b.u(wbits - 1, 4)
    b.u(hbits - 1, 4)
    b.u(w - 1, wbits)
    b.u(h - 1, hbits)
    b.u(1, 1)      # trailing bit (fixture tail; parser reads no further)
    return b.bytes_padded()


def av1c_fixture_bytes(seq_hdr_payload: bytes,
                       seq_level_idx: int = 8) -> bytes:
    """An av1C box (AOM ISOBMFF binding §2.3) wrapping the sequence
    header as a size-fielded OBU."""
    def leb(v: int) -> bytes:
        out = bytearray()
        while True:
            byte = v & 0x7F
            v >>= 7
            out.append(byte | (0x80 if v else 0))
            if not v:
                return bytes(out)

    obu = bytes([0x0A]) + leb(len(seq_hdr_payload)) + seq_hdr_payload
    body = bytes([0x81, seq_level_idx & 0x1F, 0x0C, 0x00]) + obu
    return (8 + len(body)).to_bytes(4, "big") + b"av1C" + body


def synthetic_media_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic MIXED-media corpus for the media_metadata gate:
    per document, digest index 22 picks one of SIX payload kinds —
    two fully decodable (lossless WebP, Motion-JPEG MP4) and four
    metadata-only boundary codecs (lossy-VP8 WebP, avc1/H.264 MP4
    with a real SPS in its avcC, hvc1/H.265 MP4 with a real SPS in
    its hvcC, av01/AV1 MP4 with a real sequence-header OBU in its
    av1C). A real crawl is MOSTLY the boundary kinds — and
    increasingly HEVC/AV1 (VERDICT r11 missing #1) — so the gated
    scan must yield structure rows for them instead of dying on the
    NotImplementedError decode seam. Expected rows derive from this
    digest spec with no parser code at all (oracle_gen.py)."""
    from secure_agent_api_vector_search_spark.operators.mp4 import (
        encode_mp4_codec_stub,
        encode_mp4_mjpeg,
    )
    from secure_agent_api_vector_search_spark.operators.webp import (
        encode_webp_lossless,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                kind = d[22] % 6
                if kind == 0:
                    h, w = 8 + d[23] % 12, 8 + d[24] % 12
                    px = np.frombuffer(
                        (d * ((h * w * 3) // len(d) + 1))[: h * w * 3],
                        dtype=np.uint8,
                    ).reshape(h, w, 3)
                    payload = encode_webp_lossless(px)
                elif kind == 1:
                    w = 16 + d[23] * 2
                    h = 16 + d[24] * 2
                    tag = (1 << 4) | (0 << 1) | 0  # key frame, show, v0
                    body = (
                        tag.to_bytes(3, "little")
                        + b"\x9d\x01\x2a"
                        + w.to_bytes(2, "little")
                        + h.to_bytes(2, "little")
                        + d[:16]  # opaque arithmetic-coded payload
                    )
                    chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
                    chunk += b"\x00" * (len(body) & 1)
                    payload = (
                        b"RIFF"
                        + (4 + len(chunk)).to_bytes(4, "little")
                        + b"WEBP" + chunk
                    )
                elif kind == 2:
                    w_mbs = 1 + d[23] % 40
                    h_mbs = 1 + d[24] % 30
                    crop = d[25] % 4
                    sps = sps_fixture_bytes(w_mbs, h_mbs, crop)
                    avcc_body = (
                        b"\x01\x42\x00\x1e\xff\xe1"
                        + len(sps).to_bytes(2, "big") + sps
                        + b"\x00"  # zero PPS
                    )
                    avcc = (
                        (8 + len(avcc_body)).to_bytes(4, "big")
                        + b"avcC" + avcc_body
                    )
                    n = 1 + d[26] % 5
                    payload = encode_mp4_codec_stub(
                        b"avc1", 16 * w_mbs - 2 * crop, 16 * h_mbs,
                        [d[:24]] * n, config_box=avcc,
                    )
                elif kind == 3:
                    bh, bw = 1 + d[23] % 3, 1 + d[24] % 3
                    vals = np.frombuffer(
                        (d * ((bh * bw) // len(d) + 1))[: bh * bw],
                        dtype=np.uint8,
                    ).reshape(bh, bw)
                    base = np.repeat(np.repeat(vals, 8, 0), 8, 1)[:, :, None]
                    n = 2 + d[26] % 3
                    payload = encode_mp4_mjpeg([base] * n, quality=95)
                elif kind == 4:
                    pic_w = 32 + 2 * d[23]
                    pic_h = 32 + 2 * d[24]
                    crop = d[25] % 4
                    hvcc = hvcc_fixture_bytes(
                        h265_sps_fixture_bytes(pic_w, pic_h, crop)
                    )
                    n = 1 + d[26] % 5
                    payload = encode_mp4_codec_stub(
                        b"hvc1", pic_w - 2 * crop, pic_h,
                        [d[:24]] * n, config_box=hvcc,
                    )
                else:
                    w = 1 + 4 * d[23] + d[25] % 4
                    h = 1 + 2 * d[24]
                    av1c = av1c_fixture_bytes(av1_seqhdr_fixture_bytes(w, h))
                    n = 1 + d[26] % 4
                    payload = encode_mp4_codec_stub(
                        b"av01", w, h, [d[:20]] * n, config_box=av1c,
                    )
                rows.append((doc_id, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


_FLAC_RATES = (8000, 16000, 22050, 44100, 48000)
_MP4A_RATES = (8000, 22050, 44100)
_MP3_KBPS = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)


def synthetic_audio_payloads(documents: DataFrame) -> DataFrame:
    """Deterministic MIXED-audio corpus for the audio_metadata gate:
    digest index 27 picks one of five payload kinds — PCM WAV (the
    only decodable one) plus the four majority structural boundaries
    a real crawl's audio is made of: MP3 (frame walk), AAC in ADTS
    (ISO 13818-7 headers), FLAC (STREAMINFO), and AAC in MP4
    (AudioSampleEntry + stsz). Expected rows derive from this digest
    spec with no parser code at all (oracle_gen.py)."""
    from secure_agent_api_vector_search_spark.operators.mp3 import (
        encode_mp3_frames,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                kind = d[27] % 5
                if kind == 0:
                    n = 256 + 16 * d[28]
                    ch = 1 + d[29] % 2
                    payload = encode_wav(
                        np.zeros((n, ch), dtype=np.int16), 8000
                    )
                elif kind == 1:
                    n = 4 + d[28] % 6
                    specs = [(_MP3_KBPS[d[(29 + i) % 32] % 14], 0)
                             for i in range(n)]
                    payload = encode_mp3_frames(specs)
                elif kind == 2:
                    n = 2 + d[28] % 6
                    fs_index = 3 + d[29] % 6
                    ch = 1 + d[30] % 2
                    frames = [b"\xaa" * (20 + d[(31 + i) % 32] % 40)
                              for i in range(n)]
                    payload = encode_adts(frames, fs_index=fs_index,
                                          channels=ch)
                elif kind == 3:
                    rate = _FLAC_RATES[d[28] % 5]
                    ch = 1 + d[29] % 2
                    total = 1000 + 100 * d[30]
                    payload = encode_flac_streaminfo(rate, ch, 16, total)
                else:
                    rate = _MP4A_RATES[d[28] % 3]
                    ch = 1 + d[29] % 2
                    n = 1 + d[30] % 6
                    payload = encode_mp4_audio_stub(
                        [b"\xbb" * (50 + d[31] % 100)] * n,
                        rate=rate, channels=ch,
                    )
                rows.append((doc_id, payload))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def audio_metadata_rows(with_payload: DataFrame) -> DataFrame:
    """(doc_id, format, codec, sample_rate, n_channels, n_frames,
    duration_sec, decodable) per payload via
    operators/media_meta.py::audio_metadata — the structural audio
    pass that never raises the decode seam's NotImplementedError."""
    from secure_agent_api_vector_search_spark.operators.media_meta import (
        audio_metadata,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = audio_metadata(bytes(payload))
                rows.append((
                    doc_id, m["format"], m["codec"], m["sample_rate"],
                    m["n_channels"], m["n_frames"], m["duration_sec"],
                    m["decodable"],
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "format", "codec", "sample_rate",
                "n_channels", "n_frames", "duration_sec", "decodable",
            ])

    return with_payload.select("doc_id", "payload").mapInPandas(
        op,
        schema="doc_id long, format string, codec string, "
               "sample_rate int, n_channels int, n_frames bigint, "
               "duration_sec double, decodable boolean",
    )


def media_metadata_rows(with_payload: DataFrame) -> DataFrame:
    """(doc_id, format, codec, width, height, n_frames, decodable,
    profile) per payload via operators/media_meta.py — the structure
    pass that never raises the decode seam's NotImplementedError."""
    from secure_agent_api_vector_search_spark.operators.media_meta import (
        media_metadata,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                m = media_metadata(bytes(payload))
                rows.append((
                    doc_id, m["format"], m["codec"], m["width"],
                    m["height"], m["n_frames"], m["decodable"],
                    m["profile"],
                ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "format", "codec", "width", "height",
                "n_frames", "decodable", "profile",
            ])

    return with_payload.select("doc_id", "payload").mapInPandas(
        op,
        schema="doc_id long, format string, codec string, width int, "
               "height int, n_frames int, decodable boolean, "
               "profile string",
    )


def synthetic_mp4_payloads(
    documents: DataFrame, n_frames: int = 8, quality: int = 95,
    samples_per_chunk: int = 3,
) -> DataFrame:
    """Deterministic REAL MP4 videos from each document's text:
    (doc_id, payload) — a genuine ISO-BMFF container (ftyp + mdat +
    moov with a full stsd/stts/stsc/stsz/stco sample table,
    operators/mp4.py) whose video track's samples are entropy-coded
    baseline JPEGs. Frames are BLOCK-FLAT grayscale like the MJPEG
    fixture but sized from digest indices 8/9 (so the rasters differ
    from both the RAWV and MJPEG fixtures), clipped to [120, 230],
    +4t drift, the planted −100 mid-video scene cut — every frame
    decodes LOSSLESSLY, so the expected features derive with no
    container or codec code at all (oracle_gen.py) while the operator
    runs the full box walk + sample-table expansion + per-sample
    Huffman + dequant + IDCT chain."""
    from secure_agent_api_vector_search_spark.operators.mp4 import encode_mp4_mjpeg

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                bh, bw = 2 + d[8] % 3, 2 + d[9] % 3  # blocks per side
                vals = np.frombuffer(
                    (d * ((bh * bw) // len(d) + 1))[: bh * bw], dtype=np.uint8
                ).reshape(bh, bw)
                base = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:, :, None]
                base = np.clip(base, 120, 230)
                frames = []
                for t in range(n_frames):
                    shift = 4 * t - (100 if t >= n_frames // 2 else 0)
                    f = np.clip(base.astype(np.int32) + shift, 0, 255)
                    frames.append(f.astype(np.uint8))
                rows.append((
                    doc_id,
                    encode_mp4_mjpeg(
                        frames, quality=quality,
                        samples_per_chunk=samples_per_chunk,
                    ),
                ))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


def synthetic_avi_payloads(
    documents: DataFrame, n_frames: int = 8, quality: int = 95,
) -> DataFrame:
    """Deterministic REAL AVI videos from each document's text:
    (doc_id, payload) — a genuine RIFF container (hdrl stream headers,
    movi frame chunks, idx1 index; operators/avi.py) whose 'MJPG'
    frames are entropy-coded baseline JPEGs. Block-flat frames sized
    from digest indices 16/17 (distinct from every other fixture's
    rasters), clipped to [120, 230], +4t drift, the planted −100
    mid-video scene cut — lossless decode, so the expected features
    derive with no container or codec code at all (oracle_gen.py)."""
    from secure_agent_api_vector_search_spark.operators.avi import encode_avi_mjpeg

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = hashlib.sha256((text or "").encode()).digest()
                bh, bw = 2 + d[16] % 3, 2 + d[17] % 3  # blocks per side
                vals = np.frombuffer(
                    (d * ((bh * bw) // len(d) + 1))[: bh * bw], dtype=np.uint8
                ).reshape(bh, bw)
                base = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)[:, :, None]
                base = np.clip(base, 120, 230)
                frames = []
                for t in range(n_frames):
                    shift = 4 * t - (100 if t >= n_frames // 2 else 0)
                    f = np.clip(base.astype(np.int32) + shift, 0, 255)
                    frames.append(f.astype(np.uint8))
                rows.append((doc_id, encode_avi_mjpeg(frames, quality=quality)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        op, schema="doc_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# perceptual image dedup: average-hash fingerprints + Hamming pairs
# ---------------------------------------------------------------------------


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash (aHash): nearest-neighbor 8x8 grayscale
    thumbnail, threshold at its own mean, pack the 64 bits row-major
    into a SIGNED long (the engine's packed-fingerprint convention,
    dedup.py::simhash_fingerprint). The classic perceptual baseline:
    stable under re-encode/noise/small edits, cheap enough for a scan
    stage."""
    t = thumbnail(img, 8).astype(np.float64).mean(axis=2)
    bits = (t > t.mean()).ravel()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def image_ahash(with_payload: DataFrame) -> DataFrame:
    """(doc_id, fp): REAL decode → average-hash per image, Arrow-
    batched mapInPandas — the fingerprint scan stage of image dedup."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # whole-batch decode: JPEG/WebP payloads fuse through the
            # lane engines, byte-identical payloads decode once
            imgs = decode_image_batch([p if type(p) is bytes else bytes(p)
                                       for p in pdf["payload"]])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "fp": [ahash64(im) for im in imgs],
                }
            )

    return with_payload.mapInPandas(op, schema="doc_id long, fp long")


def image_neardup_pairs(with_payload: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Perceptual near-duplicate image pairs: aHash fingerprints →
    the shared Hamming banding core (dedup.py::hamming_neardup_pairs —
    chunk-bucket candidates, vectorized XOR+popcount verify). The
    default ``max_hamming=3`` keeps the pigeonhole recall GUARANTEE
    (≤3 differing bits cannot touch all 4 chunks); larger budgets
    trade guaranteed recall for looser matching, same as the text
    SimHash analysis. Re-encodes, noise, and small overlays land
    within a few bits of the original; unrelated images sit near the
    32-bit expected distance. Output: (id_a, id_b, hamming)."""
    from secure_agent_api_vector_search_spark.operators.dedup import (
        hamming_neardup_pairs,
    )

    return hamming_neardup_pairs(
        image_ahash(with_payload), id_col="doc_id", max_hamming=max_hamming
    )


def perturbed_image_copies(with_payload: DataFrame, id_offset: int) -> DataFrame:
    """Re-encode analog for dedup fixtures: each image re-emitted under
    ``doc_id + id_offset`` with a +2 brightness shift (clipped) — a
    byte-DIFFERENT payload (exact/sha dedup misses it) that stays
    perceptually near-identical (aHash thresholds at the image's own
    mean, so a uniform shift flips at most the few bits the clip
    distorts)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            imgs = decode_image_batch([p if type(p) is bytes else bytes(p)
                                       for p in pdf["payload"]])
            rows = []
            for doc_id, img in zip(pdf["doc_id"], imgs):
                shifted = np.clip(img.astype(np.int32) + 2, 0, 255).astype(np.uint8)
                rows.append((int(doc_id) + id_offset, encode_netpbm(shifted)))
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return with_payload.mapInPandas(op, schema="doc_id long, payload binary")
