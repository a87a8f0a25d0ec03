"""MPEG audio (MP3) frame walk — pure stdlib, from the public
MPEG-1/2 audio spec (ISO/IEC 11172-3, 13818-3 header layout).

Real crawled audio is overwhelmingly MP3; before a 100 TB corpus pass
decides what to transcode/decode, it needs the cheap structural pass:
is this a valid MPEG audio stream, how long is it, what bitrate/sample
rate, CBR or VBR — without touching the entropy-coded granules. This
module is that pass: ID3v2/ID3v1 tag skipping (synchsafe sizes), the
frame-sync walk with the full bitrate/sample-rate tables for MPEG
1/2/2.5 × Layer I/II/III, per-frame size arithmetic (slot padding,
Layer-I 4-byte slots), and Xing/Info VBR-header detection. Full PCM
decode (subband synthesis + IMDCT) stays the documented codec seam —
requested via decode, it raises NotImplementedError by name, the same
contract as compressed video in operators/mp4.py.

The writer emits structurally valid frames (correct header bits and
exact table-derived sizes, deterministic filler payload), so the
parser's table lookups and size arithmetic have a genuine test pair —
the same writer/reader discipline as the MP4 sample tables.
"""
from __future__ import annotations

__all__ = ["mp3_summary", "encode_mp3_frames", "decode_mp3"]

# bitrate tables, kbps; index 0 = "free", 15 = invalid (11172-3 2.4.2.3)
_BITRATES = {
    # (version_group, layer): 14 usable indices
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}

_SAMPLE_RATES = {  # by version bits
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}

_SAMPLES_PER_FRAME = {  # (version_group, layer)
    ("1", 1): 384, ("1", 2): 1152, ("1", 3): 1152,
    ("2", 1): 384, ("2", 2): 1152, ("2", 3): 576,
}


def _parse_header(b: bytes) -> dict | None:
    """Parse 4 header bytes; None if not a valid frame sync/header."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    version_bits = (b[1] >> 3) & 0x03
    version = {0: "2.5", 2: "2", 3: "1"}.get(version_bits)
    layer = {1: 3, 2: 2, 3: 1}.get((b[1] >> 1) & 0x03)
    if version is None or layer is None:
        return None
    vgroup = "1" if version == "1" else "2"
    bitrate_idx = (b[2] >> 4) & 0x0F
    sr_idx = (b[2] >> 2) & 0x03
    if bitrate_idx in (0, 15) or sr_idx == 3:
        return None  # "free" bitrate and reserved rates: not walkable
    bitrate = _BITRATES[(vgroup, layer)][bitrate_idx - 1] * 1000
    sample_rate = _SAMPLE_RATES[version][sr_idx]
    padding = (b[2] >> 1) & 0x01
    channel_mode = (b[3] >> 6) & 0x03
    spf = _SAMPLES_PER_FRAME[(vgroup, layer)]
    if layer == 1:
        size = (12 * bitrate // sample_rate + padding) * 4
    else:
        size = spf // 8 * bitrate // sample_rate + padding
    if size < 4:
        return None
    return {
        "version": version,
        "layer": layer,
        "bitrate": bitrate,
        "sample_rate": sample_rate,
        "samples": spf,
        "size": size,
        "mono": channel_mode == 3,
    }


def _skip_id3v2(payload: bytes) -> int:
    """Byte offset past a leading ID3v2 tag (synchsafe size), else 0."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = 0
    for byte in payload[6:10]:
        if byte & 0x80:
            return 0  # not synchsafe: treat as absent
        size = (size << 7) | byte
    return 10 + size


def mp3_summary(payload: bytes, resync_limit: int = 4096) -> dict:
    """Walk every MPEG audio frame and summarize the stream:
    (n_frames, duration_sec, sample_rate, bitrate_kbps_mean, vbr,
    layer, version, has_xing, mono). ID3v2/v1 tags are skipped;
    garbage before the first sync is scanned up to ``resync_limit``
    bytes (streams ripped mid-broadcast start unaligned). A payload
    with no parseable frame raises ValueError."""
    end = len(payload)
    if end >= 128 and payload[-128:-125] == b"TAG":
        end -= 128  # ID3v1 trailer
    pos = _skip_id3v2(payload)
    # find the first sync (bounded scan)
    first = None
    limit = min(end - 4, pos + resync_limit)
    while pos <= limit:
        h = _parse_header(payload[pos : pos + 4])
        if h is not None:
            first = h
            break
        pos += 1
    if first is None:
        raise ValueError("not an MPEG audio stream: no frame sync found")

    n_frames = 0
    total_samples = 0
    bitrates: set[int] = set()
    bitrate_sum = 0
    has_xing = False
    while pos + 4 <= end:
        h = _parse_header(payload[pos : pos + 4])
        if h is None:
            break  # clean end (or trailing junk — counted frames stand)
        if pos + h["size"] > end:
            break  # truncated final frame: don't count it
        if n_frames == 0:
            # Xing/Info VBR header lives in the first frame's side-info
            body = payload[pos + 4 : pos + h["size"]]
            has_xing = b"Xing" in body[:40] or b"Info" in body[:40]
        n_frames += 1
        total_samples += h["samples"]
        bitrates.add(h["bitrate"])
        bitrate_sum += h["bitrate"]
        pos += h["size"]
    if n_frames == 0:
        raise ValueError("not an MPEG audio stream: sync but no full frame")
    return {
        "n_frames": n_frames,
        "duration_sec": total_samples / first["sample_rate"],
        "sample_rate": first["sample_rate"],
        "bitrate_kbps_mean": bitrate_sum / n_frames / 1000.0,
        "vbr": len(bitrates) > 1 or has_xing,
        "layer": first["layer"],
        "version": first["version"],
        "has_xing": has_xing,
        "mono": first["mono"],
    }


def decode_mp3(payload: bytes):
    """PCM decode is the documented codec seam — subband synthesis +
    IMDCT are not implemented; the summary walk above is the shipped
    structural pass. Mirrors operators/mp4.py's compressed-codec
    contract: reject by name, never emit garbage."""
    mp3_summary(payload)  # validates it IS an MPEG stream first
    raise NotImplementedError(
        "MP3 PCM decode not implemented (documented seam: mp3_summary "
        "provides the structural/metadata pass; plug a real audio "
        "library in here for waveform decode)"
    )


def encode_mp3_frames(
    frame_specs: list[tuple[int, int]],
    version: str = "1",
    layer: int = 3,
    id3v2_bytes: int = 0,
    mono: bool = False,
) -> bytes:
    """Emit structurally valid MPEG audio frames for parser tests:
    each (bitrate_kbps, padding) spec becomes one frame with correct
    header bits and exact table-derived size, filler body (0xAA). An
    optional ID3v2 tag of the given body size is prepended."""
    vgroup = "1" if version == "1" else "2"
    version_bits = {"1": 3, "2": 2, "2.5": 0}[version]
    layer_bits = {1: 3, 2: 2, 3: 1}[layer]
    out = bytearray()
    if id3v2_bytes:
        size = id3v2_bytes
        ss = bytes(
            [(size >> 21) & 0x7F, (size >> 14) & 0x7F, (size >> 7) & 0x7F, size & 0x7F]
        )
        out += b"ID3" + bytes([4, 0, 0]) + ss + b"\x00" * id3v2_bytes
    table = _BITRATES[(vgroup, layer)]
    sr = _SAMPLE_RATES[version][0]
    spf = _SAMPLES_PER_FRAME[(vgroup, layer)]
    for kbps, padding in frame_specs:
        if kbps not in table:
            raise ValueError(f"bitrate {kbps} invalid for MPEG{version} L{layer}")
        idx = table.index(kbps) + 1
        b1 = 0xFF
        b2 = 0xE0 | (version_bits << 3) | (layer_bits << 1) | 1  # no CRC
        b3 = (idx << 4) | (0 << 2) | ((1 if padding else 0) << 1)
        b4 = (0xC0 if mono else 0x00)
        bitrate = kbps * 1000
        if layer == 1:
            size = (12 * bitrate // sr + (1 if padding else 0)) * 4
        else:
            size = spf // 8 * bitrate // sr + (1 if padding else 0)
        out += bytes([b1, b2, b3, b4]) + b"\xaa" * (size - 4)
    return bytes(out)
