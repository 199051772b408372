"""MPEG-1 Layer III frame-header / container parser (r12).

The r11 verdict's multimodal scope note stands: decoding MP3 *samples*
has no lawful cross-engine oracle (psychoacoustic output) and no codec
library exists in this environment. But everything a CURATION pipeline
needs from an MP3 — duration, bitrate profile, sample rate, channel
mode, VBR (Xing) header consistency — is integer-exact frame-HEADER
arithmetic, fully oracle-able. This module synthesizes spec-shaped
MPEG-1 Layer III streams (sync-worded headers, correct frame-length
arithmetic incl. padding, a Xing VBR tag in the first frame, varying
per-frame bitrates) and walks them back, validating every field.

Header layout (ISO 11172-3): AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
  A sync (11 x 1), B version (11 = MPEG-1), C layer (01 = III),
  D protection, E bitrate index, F sample-rate index, G padding,
  H private, I channel mode, J mode extension, K copyright,
  L original, M emphasis.
Frame length (Layer III): 144 * bitrate / sample_rate + padding.
"""

from __future__ import annotations

import struct

__all__ = [
    "BITRATES_V1L3",
    "SAMPLE_RATES_V1",
    "encode_mp3_stream",
    "parse_mp3",
    "formula_mp3_params",
    "gen_mp3_payload",
]

# index 1..14 are valid; 0 = free-format, 15 = forbidden (kbps)
BITRATES_V1L3 = [
    0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1
]
SAMPLE_RATES_V1 = [44100, 48000, 32000, -1]
SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def _frame_len(kbps: int, sr: int, padding: int) -> int:
    return 144 * kbps * 1000 // sr + padding


def _header(br_idx: int, sr_idx: int, padding: int, mode: int) -> bytes:
    b0 = 0xFF
    b1 = 0b11100000 | (0b11 << 3) | (0b01 << 1) | 1  # sync, MPEG-1, L3, no CRC
    b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
    b3 = (mode << 6)  # mode ext / copyright / original / emphasis zero
    return bytes([b0, b1, b2, b3])


def encode_mp3_stream(
    sr_idx: int,
    mode: int,
    frames: list[tuple[int, int]],
    body_byte,
    xing: bool = True,
) -> bytes:
    """Build a stream of ``frames`` = [(bitrate_index, padding), ...].
    Frame 0 carries a Xing VBR tag (frame count + byte count over the
    whole stream) after the Layer III side-info block, as real VBR
    encoders emit; later frames' bodies are filled with
    ``body_byte(frame_no, j)``."""
    sr = SAMPLE_RATES_V1[sr_idx]
    sizes = [_frame_len(BITRATES_V1L3[bi], sr, p) for bi, p in frames]
    total = sum(sizes)
    out = bytearray()
    for i, ((bi, pad), size) in enumerate(zip(frames, sizes)):
        out += _header(bi, sr_idx, pad, mode)
        body = bytearray(size - 4)
        if i == 0 and xing:
            side = 17 if mode == 3 else 32  # mono vs stereo side info
            tag = b"Xing" + struct.pack(">I", 0x3) + struct.pack(
                ">II", len(frames), total
            )
            body[side : side + len(tag)] = tag
        else:
            for j in range(len(body)):
                body[j] = body_byte(i, j)
        out += body
    return bytes(out)


def parse_mp3(payload: bytes) -> dict:
    """Walk every frame header; returns the container profile:
    n_frames, sample_rate, mode, total_bytes, kbps values per frame,
    duration_us (exact integer micro-seconds: n*1152*1e6 div sr),
    xing_frames / xing_bytes (-1 when absent), and head16_sum — the
    byte checksum of each non-Xing frame body's first 16 bytes (pins
    the frame-length arithmetic: an off-by-one padding bug lands the
    walk mid-body and the checksum explodes or the sync check fires).

    Typed errors on every malformed shape: lost sync, reserved
    version/layer/bitrate/sample-rate codes, truncated final frame.
    """
    pos = 0
    n = len(payload)
    sr_expect = mode_expect = None
    kbps_sum = 0
    n_frames = 0
    head16 = 0
    xing_frames = xing_bytes = -1
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated MP3 frame header")
        b0, b1, b2, b3 = payload[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise ValueError(f"lost frame sync at byte {pos}")
        version = (b1 >> 3) & 0b11
        layer = (b1 >> 1) & 0b11
        if version != 0b11 or layer != 0b01:
            raise NotImplementedError(
                "only MPEG-1 Layer III headers supported"
            )
        br_idx = b2 >> 4
        sr_idx = (b2 >> 2) & 0b11
        padding = (b2 >> 1) & 1
        mode = b3 >> 6
        if br_idx in (0, 15):
            raise ValueError("free-format/forbidden bitrate index")
        if sr_idx == 3:
            raise ValueError("reserved sample-rate index")
        sr = SAMPLE_RATES_V1[sr_idx]
        if sr_expect is None:
            sr_expect, mode_expect = sr, mode
        elif sr != sr_expect or mode != mode_expect:
            raise ValueError("sample rate / mode change mid-stream")
        kbps = BITRATES_V1L3[br_idx]
        size = _frame_len(kbps, sr, padding)
        if pos + size > n:
            raise ValueError("truncated MP3 frame body")
        body = payload[pos + 4 : pos + size]
        if n_frames == 0:
            side = 17 if mode == 3 else 32
            if body[side : side + 4] in (b"Xing", b"Info"):
                flags = struct.unpack(">I", body[side + 4 : side + 8])[0]
                off = side + 8
                if flags & 0x1:
                    xing_frames = struct.unpack(">I", body[off : off + 4])[0]
                    off += 4
                if flags & 0x2:
                    xing_bytes = struct.unpack(">I", body[off : off + 4])[0]
        else:
            head16 += sum(body[:16])
        kbps_sum += kbps
        n_frames += 1
        pos += size
    if n_frames == 0:
        raise ValueError("empty MP3 stream")
    # VBR-tag consistency: a stream whose Xing header disagrees with the
    # walked frame/byte counts is truncated or spliced — the exact
    # corruption class a curation pipeline must flag, and what turns
    # every frame-boundary truncation into a typed error here.
    if xing_frames >= 0 and xing_frames != n_frames:
        raise ValueError(
            f"Xing frame count {xing_frames} != walked frames {n_frames}"
        )
    if xing_bytes >= 0 and xing_bytes != n:
        raise ValueError(f"Xing byte count {xing_bytes} != stream bytes {n}")
    return dict(
        n_frames=n_frames,
        sample_rate=sr_expect,
        mode=mode_expect,
        total_bytes=n,
        kbps_sum=kbps_sum,
        duration_us=n_frames * SAMPLES_PER_FRAME * 1_000_000 // sr_expect,
        xing_frames=xing_frames,
        xing_bytes=xing_bytes,
        head16_sum=head16,
    )


# --- deterministic fixture (integer arithmetic => SQL oracle) ---------------


def formula_mp3_params(doc_id: int):
    """(sr_idx, mode, [(bitrate_index, padding)]) — VBR profile the
    DuckDB oracle recomputes: 3 + doc%6 frames, per-frame bitrate index
    1 + (doc + 3i) % 14, padding (doc + i) % 2, sample rate cycling
    44.1/48/32 kHz, channel mode doc % 4 (3 = mono changes the Xing
    side-info offset)."""
    sr_idx = doc_id % 3
    mode = doc_id % 4
    nf = 3 + doc_id % 6
    frames = [(1 + (doc_id + 3 * i) % 14, (doc_id + i) % 2) for i in range(nf)]
    return sr_idx, mode, frames


def gen_mp3_payload(doc_id: int) -> bytes:
    sr_idx, mode, frames = formula_mp3_params(doc_id)
    return encode_mp3_stream(
        sr_idx,
        mode,
        frames,
        body_byte=lambda i, j: (doc_id + 17 * i + j) % 256,
    )
