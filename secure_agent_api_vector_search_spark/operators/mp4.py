"""ISO base media file format (MP4/QuickTime) container — pure stdlib.

The reference stores multimodal payloads as opaque bytes behind a
``filename`` column (sql/02_schema.sql:12); a real corpus's video is
overwhelmingly ISO-BMFF (``.mp4``/``.mov``). This module implements the
container layer for real: a full box walk (ISO/IEC 14496-12 §4.2 —
32-bit sizes, 64-bit ``largesize``, size-0 "to end of file"), the
sample-table machinery (``stsd``/``stts``/``stsc``/``stsz``/``stco``/
``co64`` → per-sample byte ranges), and per-sample decode through the
from-scratch JPEG codec (operators/jpeg.py) when the track's sample
format is Motion-JPEG. Compressed inter-frame codecs (``avc1``/
``hvc1``/``vp09``/``av01``/``mp4v``) remain the documented stub seam —
they are rejected DESCRIPTIVELY, never decoded as garbage.

Writer and reader are independent enough to be a real test pair: the
writer emits ``mdat`` before ``moov`` (the classic non-faststart
layout, so ``stco`` offsets are absolute and known at write time) and
splits samples across multiple chunks, so the reader's ``stsc``
chunk-to-sample expansion is genuinely exercised rather than a 1:1
walk.

Spark-side: payloads flow through the same Arrow-batched
``mapInPandas`` stages as every other binary format
(multimodal.video_features); `decode_video` sniffs the ``ftyp`` magic.
"""
from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_mp4_mjpeg",
    "decode_mp4",
    "mp4_track_summary",
]

# Track sample formats we can actually decode: Motion-JPEG inside MP4/
# QuickTime ('jpeg' is the QT MJPEG-A/B base fourcc; 'mjpa' the Apple
# variant whose samples are still SOI..EOI JPEG streams).
_JPEG_FORMATS = {b"jpeg", b"mjpa", b"mjpb", b"MJPG"}
# Real-world compressed codecs: a documented seam, rejected by name.
_KNOWN_COMPRESSED = {b"avc1", b"avc3", b"hvc1", b"hev1", b"vp08", b"vp09",
                     b"av01", b"mp4v", b"s263"}


# ---------------------------------------------------------------------------
# box plumbing
# ---------------------------------------------------------------------------


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for each box in
    buf[start:end], honoring 64-bit largesize and size==0 (ISO 14496-12
    §4.2). Truncated or self-overlapping sizes raise ValueError."""
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("corrupt MP4: truncated box header")
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        fourcc = buf[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the fourcc
            if body + 8 > end:
                raise ValueError("corrupt MP4: truncated largesize")
            size = struct.unpack(">Q", buf[body : body + 8])[0]
            body += 8
            if size < 16:
                raise ValueError(f"corrupt MP4: largesize {size} < 16")
        elif size == 0:  # box extends to end of the enclosing scope
            size = end - pos
        elif size < 8:
            raise ValueError(f"corrupt MP4: box size {size} < 8")
        box_end = pos + size
        if box_end > end:
            raise ValueError(
                f"corrupt MP4: box {fourcc!r} overruns its container"
            )
        yield fourcc, body, box_end
        pos = box_end


def _find_box(buf: bytes, start: int, end: int, fourcc: bytes):
    """(payload_start, payload_end) of the FIRST child box with the
    given fourcc, or None."""
    for fc, s, e in _walk_boxes(buf, start, end):
        if fc == fourcc:
            return s, e
    return None


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full_box(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


# ---------------------------------------------------------------------------
# writer — minimal valid non-faststart MP4 with an MJPEG video track
# ---------------------------------------------------------------------------


def encode_mp4_mjpeg(
    frames: list[np.ndarray],
    quality: int = 95,
    fps: int = 10,
    samples_per_chunk: int = 3,
    restart_interval: int = 0,
) -> bytes:
    """Write frames as a single-video-track MP4 whose samples are
    baseline JPEGs ('jpeg' sample format). ``mdat`` precedes ``moov``
    so chunk offsets are exact absolute file offsets; samples are
    grouped ``samples_per_chunk`` per chunk (last chunk ragged) so the
    reader's stsc expansion has real work to do."""
    from secure_agent_api_vector_search_spark.operators.jpeg import encode_jpeg

    if not frames:
        raise ValueError("a video needs at least one frame")
    h, w = frames[0].shape[0], frames[0].shape[1]
    if samples_per_chunk < 1:
        raise ValueError("samples_per_chunk must be >= 1")
    samples = [
        encode_jpeg(f, quality=quality, restart_interval=restart_interval)
        for f in frames
    ]
    sizes = [len(s) for s in samples]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(samples))
    # absolute offset of each chunk's first sample inside the file:
    # ftyp, then mdat header (8 bytes), then the concatenated samples
    mdat_payload_off = len(ftyp) + 8
    chunk_offsets: list[int] = []
    acc = mdat_payload_off
    for i, sz in enumerate(sizes):
        if i % samples_per_chunk == 0:
            chunk_offsets.append(acc)
        acc += sz

    timescale = 1000
    delta = timescale // fps
    duration = delta * len(samples)

    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)  # ctime mtime ts dur
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)      # volume 1.0
        + b"\x00" * 10                    # reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24                    # pre_defined
        + struct.pack(">I", 2),           # next_track_ID
    )
    tkhd = _full_box(
        b"tkhd", 0, 3,  # flags: enabled | in movie
        struct.pack(">IIIII", 0, 0, 1, 0, duration)  # ctime mtime id rsvd dur
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)  # layer group volume rsvd
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und', pre_defined
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full_box(
        b"dref", 0, 0,
        struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b""),
    )
    dinf = _box(b"dinf", dref)
    # VisualSampleEntry (14496-12 §12.1.3): 78 bytes after the header
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved, dref index
        + struct.pack(">HHII", 0, 0, 0, 0) + b"\x00" * 4  # pre/reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)     # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                       # frame count
        + b"\x00" * 32                               # compressor name
        + struct.pack(">Hh", 24, -1),                # depth, pre_defined
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full_box(
        b"stts", 0, 0, struct.pack(">III", 1, len(samples), delta)
    )
    # stsc in its run-length form: one entry per distinct
    # samples-per-chunk value (a ragged tail adds a second entry)
    stsc_entries = [(1, min(samples_per_chunk, len(sizes)), 1)]
    tail = len(sizes) % samples_per_chunk
    if tail and len(chunk_offsets) > 1:
        stsc_entries.append((len(chunk_offsets), tail, 1))
    stsc = _full_box(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(sizes))
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full_box(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_mp4_codec_stub(
    codec: bytes,
    w: int,
    h: int,
    samples: list[bytes],
    config_box: bytes = b"",
    fps: int = 10,
) -> bytes:
    """Write a structurally complete single-video-track MP4 whose
    sample DATA is opaque (a compressed codec this package does not
    pixel-decode — the media_metadata fixture shape). The container is
    as real as encode_mp4_mjpeg's: full stsd/stts/stsc/stsz/stco,
    mdat-before-moov absolute offsets; ``codec`` is the sample-entry
    fourcc (e.g. b"avc1") and ``config_box`` an optional codec
    configuration box (e.g. an avcC) appended to the 78-byte
    VisualSampleEntry body per ISO 14496-15."""
    if not samples:
        raise ValueError("a video needs at least one sample")
    sizes = [len(s) for s in samples]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(samples))
    off = len(ftyp) + 8
    chunk_offsets = []
    acc = off
    for i, sz in enumerate(sizes):
        if i % 3 == 0:
            chunk_offsets.append(acc)
        acc += sz
    timescale = 1000
    delta = timescale // fps
    duration = delta * len(samples)
    mvhd = _full_box(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">i", 0x00010000) + struct.pack(">h", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = _full_box(
        b"tkhd", 0, 3,
        struct.pack(">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full_box(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full_box(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    vmhd = _full_box(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dinf = _box(b"dinf", _full_box(
        b"dref", 0, 0, struct.pack(">I", 1) + _full_box(b"url ", 0, 1, b"")))
    sample_entry = _box(
        codec,
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HHII", 0, 0, 0, 0) + b"\x00" * 4
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x480000, 0x480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
        + config_box,
    )
    stsd = _full_box(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full_box(b"stts", 0, 0, struct.pack(">III", 1, len(samples), delta))
    stsc_entries = [(1, min(3, len(sizes)), 1)]
    tail = len(sizes) % 3
    if tail and len(chunk_offsets) > 1:
        stsc_entries.append((len(chunk_offsets), tail, 1))
    stsc = _full_box(
        b"stsc", 0, 0,
        struct.pack(">I", len(stsc_entries))
        + b"".join(struct.pack(">III", *e) for e in stsc_entries),
    )
    stsz = _full_box(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(sizes))
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    stco = _full_box(
        b"stco", 0, 0,
        struct.pack(">I", len(chunk_offsets))
        + b"".join(struct.pack(">I", o) for o in chunk_offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# reader — sample-table walk + per-sample JPEG decode
# ---------------------------------------------------------------------------


def _parse_stbl(buf: bytes, s: int, e: int) -> tuple[bytes, list[tuple[int, int]]]:
    """(sample_format, [(offset, size) per sample in decode order])
    from one stbl box — the full stsz/stsc/stco(co64) expansion of
    ISO 14496-12 §8.7. A corrupt table whose declared counts overrun
    the box raises ValueError like every parser in the package."""
    try:
        return _parse_stbl_inner(buf, s, e)
    except struct.error:
        raise ValueError(
            "corrupt MP4: sample table truncated (declared count "
            "overruns its box)"
        ) from None


def _parse_stbl_inner(
    buf: bytes, s: int, e: int
) -> tuple[bytes, list[tuple[int, int]]]:
    stsd = _find_box(buf, s, e, b"stsd")
    if stsd is None:
        raise ValueError("corrupt MP4: stbl without stsd")
    sd_s, sd_e = stsd
    n_entries = struct.unpack(">I", buf[sd_s + 4 : sd_s + 8])[0]
    if n_entries < 1:
        raise ValueError("corrupt MP4: empty stsd")
    fmt = next(_walk_boxes(buf, sd_s + 8, sd_e))[0]

    stsz = _find_box(buf, s, e, b"stsz")
    if stsz is None:
        raise ValueError("corrupt MP4: stbl without stsz")
    z_s, _ = stsz
    uniform, n_samples = struct.unpack(">II", buf[z_s + 4 : z_s + 12])
    if uniform:
        sizes = [uniform] * n_samples
    else:
        sizes = list(
            struct.unpack(f">{n_samples}I", buf[z_s + 12 : z_s + 12 + 4 * n_samples])
        )

    co = _find_box(buf, s, e, b"stco")
    if co is not None:
        c_s, _ = co
        n_chunks = struct.unpack(">I", buf[c_s + 4 : c_s + 8])[0]
        offsets = list(
            struct.unpack(f">{n_chunks}I", buf[c_s + 8 : c_s + 8 + 4 * n_chunks])
        )
    else:
        co64 = _find_box(buf, s, e, b"co64")
        if co64 is None:
            raise ValueError("corrupt MP4: stbl without stco/co64")
        c_s, _ = co64
        n_chunks = struct.unpack(">I", buf[c_s + 4 : c_s + 8])[0]
        offsets = list(
            struct.unpack(f">{n_chunks}Q", buf[c_s + 8 : c_s + 8 + 8 * n_chunks])
        )

    stsc = _find_box(buf, s, e, b"stsc")
    if stsc is None:
        raise ValueError("corrupt MP4: stbl without stsc")
    sc_s, _ = stsc
    n_sc = struct.unpack(">I", buf[sc_s + 4 : sc_s + 8])[0]
    sc = [
        struct.unpack(">III", buf[sc_s + 8 + 12 * i : sc_s + 20 + 12 * i])
        for i in range(n_sc)
    ]
    if not sc or sc[0][0] != 1:
        raise ValueError("corrupt MP4: stsc must start at chunk 1")

    # expand the run-length stsc table: entry i applies to chunks
    # [first_chunk_i, first_chunk_{i+1})
    spans: list[tuple[int, int]] = []
    sample_i = 0
    for i, (first_chunk, per_chunk, _sdi) in enumerate(sc):
        last_chunk = sc[i + 1][0] - 1 if i + 1 < len(sc) else len(offsets)
        if per_chunk < 1 or first_chunk > last_chunk:
            raise ValueError("corrupt MP4: non-monotone stsc table")
        for chunk in range(first_chunk, last_chunk + 1):
            off = offsets[chunk - 1]
            for _ in range(per_chunk):
                if sample_i >= n_samples:
                    break  # trailing chunk capacity beyond sample count
                spans.append((off, sizes[sample_i]))
                off += sizes[sample_i]
                sample_i += 1
    if sample_i != n_samples:
        raise ValueError(
            f"corrupt MP4: stsc/stco cover {sample_i} of {n_samples} samples"
        )
    return fmt, spans


def _video_stbl(payload: bytes) -> tuple[bytes, list[tuple[int, int]]]:
    moov = _find_box(payload, 0, len(payload), b"moov")
    if moov is None:
        raise ValueError("corrupt MP4: no moov box")
    for fc, t_s, t_e in _walk_boxes(payload, *moov):
        if fc != b"trak":
            continue
        mdia = _find_box(payload, t_s, t_e, b"mdia")
        if mdia is None:
            continue
        hdlr = _find_box(payload, *mdia, b"hdlr")
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        minf = _find_box(payload, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _find_box(payload, *minf, b"stbl")
        if stbl is None:
            continue
        return _parse_stbl(payload, *stbl)
    raise ValueError("MP4 has no video track")


def decode_mp4(payload: bytes) -> list[np.ndarray]:
    """Decode an MP4/QuickTime file's video track to its frames.

    Motion-JPEG sample formats decode for real (operators/jpeg.py per
    sample); compressed codecs raise NotImplementedError by name — the
    documented seam, matching extract_features' decode_stub contract."""
    from secure_agent_api_vector_search_spark.operators.jpeg import (
        decode_jpeg_batch,
    )

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (no ftyp)")
    fmt, spans = _video_stbl(payload)
    if fmt in _KNOWN_COMPRESSED:
        raise NotImplementedError(
            f"MP4 video codec {fmt.decode('latin1')!r} decode not implemented "
            "(documented seam: only Motion-JPEG tracks decode)"
        )
    if fmt not in _JPEG_FORMATS:
        raise ValueError(f"corrupt MP4: unknown sample format {fmt!r}")
    samples = []
    for off, size in spans:
        if off + size > len(payload):
            raise ValueError("corrupt MP4: sample range beyond file end")
        samples.append(payload[off : off + size])
    if not samples:
        raise ValueError("corrupt MP4: video track has no samples")
    # every sample's restart segments become lanes of ONE vectorized
    # entropy pass (jpeg._lane_engine); DRI-free tracks fall back to
    # the serial per-sample decoder inside the batch API
    return decode_jpeg_batch(samples)


def mp4_track_summary(payload: bytes) -> dict:
    """Container-level metadata without decoding samples: sample
    format, sample count, total sample bytes — the cheap first pass a
    100 TB corpus scan runs before deciding what to decode."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (no ftyp)")
    fmt, spans = _video_stbl(payload)
    return {
        "sample_format": fmt.decode("latin1"),
        "n_samples": len(spans),
        "sample_bytes": int(sum(sz for _, sz in spans)),
        "decodable": fmt in _JPEG_FORMATS,
    }
