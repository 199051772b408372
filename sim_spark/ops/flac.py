"""FLAC codec — dependency-free, mono 16-bit, real (round 11).

The lossless complement to ops/jpeg.py: rice/Golomb residual coding is
genuine entropy coding, and because FLAC is lossless the WHOLE pipeline
(synthesize samples -> encode -> container bytes -> decode -> samples)
is exactly invertible, so the decoded-sample features hash-match a
DuckDB recomputation from the doc_id formula end-to-end — no split
oracle needed. MP3 stays behind the NotImplementedError fence (its
polyphase filterbank + IMDCT + dozens of Huffman tables are a
qualitatively larger project, and lossy psychoacoustic output has no
lawful cross-engine oracle).

Implemented subset (a spec-conformant stream any FLAC decoder reads):

- container: "fLaC" magic, STREAMINFO metadata block (blocksizes,
  sample rate, channels, bps, total samples, REAL MD5 of the unencoded
  little-endian sample stream — verified on decode),
- frames: sync code 0b11111111111110 + blocking strategy, coded block
  size / sample rate / channel / bps fields, UTF-8-coded frame number,
  CRC-8 header checksum and CRC-16 frame checksum (both computed and
  VERIFIED),
- subframes: CONSTANT, VERBATIM, and FIXED orders 0..2 with rice-coded
  residuals (4-bit parameter, partition order 0; zigzag mapping;
  escape code 0b1111 -> verbatim residuals). The encoder picks the
  cheapest of constant/fixed-0/1/2 per frame like a real encoder.

The decoder validates CRC-8, CRC-16, and the STREAMINFO MD5, so a
single corrupted bit anywhere in the stream is caught — tested.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


def _make_crc8_table() -> list[int]:
    t = []
    for b in range(256):
        crc = b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
        t.append(crc)
    return t


def _make_crc16_table() -> list[int]:
    t = []
    for b in range(256):
        crc = b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
        t.append(crc)
    return t


_CRC8_T = _make_crc8_table()
_CRC16_T = _make_crc16_table()


def _crc8(data: bytes) -> int:
    """CRC-8 poly x^8+x^2+x+1 (0x07), init 0 — FLAC frame header CRC.
    Table-driven (the bit-loop version was the encode profile's top
    line at 29% of frame cost)."""
    crc = 0
    t = _CRC8_T
    for b in data:
        crc = t[crc ^ b]
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 poly x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frame CRC."""
    crc = 0
    t = _CRC16_T
    for b in data:
        crc = ((crc << 8) & 0xFF00) ^ t[(crc >> 8) ^ b]
    return crc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        if nbits:
            self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
            self._n += nbits
            while self._n >= 8:
                self._n -= 8
                self.out.append((self._acc >> self._n) & 0xFF)
            self._acc &= (1 << self._n) - 1

    def unary(self, q: int) -> None:
        """q zero bits then a one bit (FLAC rice quotient)."""
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)

    def pad_to_byte(self) -> None:
        if self._n:
            self.put(0, 8 - self._n)


class _BitReader:
    """Byte-buffered MSB-first reader. The rice hot loop reads one
    unary quotient + k remainder bits per sample; the accumulator keeps
    that O(1)-ish per call (leading-zero counting via bit_length)
    instead of one Python call per bit — ~6x on the sf1 decode bench."""

    __slots__ = ("data", "byte_pos", "_acc", "_n")

    def __init__(self, data: bytes, byte_pos: int = 0) -> None:
        self.data = data
        self.byte_pos = byte_pos
        self._acc = 0  # low self._n bits are unread, MSB-first
        self._n = 0

    @property
    def bitpos(self) -> int:
        return self.byte_pos * 8 - self._n

    def bits(self, n: int) -> int:
        acc, have = self._acc, self._n
        data, bp = self.data, self.byte_pos
        while have < n:
            acc = (acc << 8) | data[bp]
            bp += 1
            have += 8
        have -= n
        self.byte_pos = bp
        self._n = have
        v = (acc >> have) & ((1 << n) - 1)
        self._acc = acc & ((1 << have) - 1)
        return v

    def bit(self) -> int:
        return self.bits(1)

    def unary(self) -> int:
        q = 0
        while True:
            if self._n == 0:
                self._acc = self.data[self.byte_pos]
                self.byte_pos += 1
                self._n = 8
            v = self._acc
            if v == 0:  # all remaining buffered bits are zeros
                q += self._n
                self._n = 0
                continue
            lead = self._n - v.bit_length()  # zeros before the first 1
            q += lead
            self._n -= lead + 1  # consume the zeros and the 1
            self._acc = v - (1 << (v.bit_length() - 1))
            return q

    def align(self) -> None:
        self._n = 0
        self._acc = 0


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (values < 2^31)."""
    if n < 0x80:
        return bytes([n])
    out = []
    if n < 0x800:
        lead, nbytes = 0xC0, 2
    elif n < 0x10000:
        lead, nbytes = 0xE0, 3
    elif n < 0x200000:
        lead, nbytes = 0xF0, 4
    else:
        lead, nbytes = 0xF8, 5
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    out.append(lead | n)
    return bytes(reversed(out))


def _read_utf8_coded(r: _BitReader) -> int:
    first = r.bits(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x80
    while first & mask:
        nbytes += 1
        mask >>= 1
    val = first & (mask - 1)
    for _ in range(nbytes - 1):
        cont = r.bits(8)
        if cont >> 6 != 0b10:
            raise ValueError("bad UTF-8 continuation in frame number")
        val = (val << 6) | (cont & 0x3F)
    return val


_BLOCKSIZE = 256  # fixed encode blocksize; last frame may be shorter


def _zigzag(res: np.ndarray) -> np.ndarray:
    return np.where(res >= 0, res * 2, -res * 2 - 1).astype(np.int64)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _fixed_residual(samples: np.ndarray, order: int) -> np.ndarray:
    """FLAC fixed-predictor residuals (finite differences of `order`)."""
    res = samples.astype(np.int64)
    for _ in range(order):
        res = np.diff(res)
    return res


_K_RANGE = np.arange(15, dtype=np.int64)[:, None]


def _best_rice_k(zz: np.ndarray) -> tuple[int, int]:
    """(cheapest 4-bit rice parameter, its bit cost) for zigzagged
    residuals — one vectorized pass over all 15 candidate k."""
    costs = (zz[None, :] >> _K_RANGE).sum(axis=1) + zz.size * (_K_RANGE[:, 0] + 1)
    k = int(costs.argmin())
    return k, int(costs[k])


def _rice_cost(samples: np.ndarray, order: int) -> int:
    _k, cost = _best_rice_k(_zigzag(_fixed_residual(samples, order)))
    return cost + order * 16


def encode_flac(samples: np.ndarray, sample_rate: int) -> bytes:
    """Mono int16 samples -> FLAC stream (STREAMINFO + frames)."""
    s = np.asarray(samples, dtype=np.int64)
    assert s.size and np.all((s >= -32768) & (s <= 32767))
    n = s.size
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    # STREAMINFO: last-metadata-block flag set, type 0, length 34
    si = _BitWriter()
    last_bs = n % _BLOCKSIZE or min(n, _BLOCKSIZE)
    si.put(min(_BLOCKSIZE, n) if n >= _BLOCKSIZE else n, 16)  # min blocksize
    si.put(min(_BLOCKSIZE, n), 16)  # max blocksize
    si.put(0, 24)  # min frame size unknown
    si.put(0, 24)  # max frame size unknown
    si.put(sample_rate, 20)
    si.put(0, 3)  # channels - 1
    si.put(15, 5)  # bps - 1
    si.put(n, 36)
    out += b"\x80" + (34).to_bytes(3, "big") + bytes(si.out) + md5
    del last_bs

    for frame_no, start in enumerate(range(0, n, _BLOCKSIZE)):
        blk = s[start : start + _BLOCKSIZE]
        out += _encode_frame(blk, frame_no, sample_rate)
    return bytes(out)


def _encode_frame(blk: np.ndarray, frame_no: int, sample_rate: int) -> bytes:
    bs = blk.size
    w = _BitWriter()
    w.put(0b11111111111110, 14)  # sync
    w.put(0, 1)  # reserved
    w.put(0, 1)  # fixed-blocksize stream
    # block size code: 0b0110 = get 8-bit from end, 0b0111 = 16-bit
    if bs == 256:
        w.put(0b1000, 4)  # 256 exactly
        bs_tail = b""
    else:
        w.put(0b0111, 4)
        bs_tail = struct.pack(">H", bs - 1)
    w.put(0b0000, 4)  # sample rate: from STREAMINFO
    w.put(0b0000, 4)  # channels: mono
    w.put(0b100, 3)  # bps: 16
    w.put(0, 1)  # reserved
    header = bytes(w.out) + _utf8_coded(frame_no) + bs_tail
    header += bytes([_crc8(header)])

    # choose subframe: constant if flat, else cheapest fixed order 0..2
    body = _BitWriter()
    if np.all(blk == blk[0]):
        body.put(0, 1)  # zero padding bit
        body.put(0b000000, 6)  # CONSTANT
        body.put(0, 1)  # no wasted bits
        body.put(int(blk[0]) & 0xFFFF, 16)
    else:
        order = min(range(3), key=lambda o: _rice_cost(blk, o))
        body.put(0, 1)
        body.put(0b001000 | order, 6)  # FIXED, order
        body.put(0, 1)
        for v in blk[:order]:  # warm-up samples, verbatim bps bits
            body.put(int(v) & 0xFFFF, 16)
        res = _fixed_residual(blk, order)
        zz = _zigzag(res)
        k, _cost = _best_rice_k(zz)
        body.put(0b00, 2)  # residual method: rice, 4-bit parameter
        body.put(0, 4)  # partition order 0
        body.put(k, 4)
        # one put per sample: the unary quotient, stop bit, and k-bit
        # remainder concatenate to (1 << k) | rem over (q + 1 + k) bits
        kmask = (1 << k) - 1
        put = body.put
        stop = 1 << k
        for u in zz.tolist():
            put(stop | (u & kmask), (u >> k) + 1 + k)
    body.pad_to_byte()
    payload = header + bytes(body.out)
    return payload + struct.pack(">H", _crc16(payload))


def decode_flac(payload: bytes):
    """FLAC stream -> (sample_rate, int16 samples). Verifies frame
    CRC-8/CRC-16 and the STREAMINFO MD5 of the decoded stream."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    sample_rate = None
    total = None
    md5_expect = None
    while True:  # metadata blocks
        hdr = payload[pos]
        btype, last = hdr & 0x7F, bool(hdr & 0x80)
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:  # STREAMINFO
            r = _BitReader(body)
            r.bits(16)
            r.bits(16)
            r.bits(24)
            r.bits(24)
            sample_rate = r.bits(20)
            nch = r.bits(3) + 1
            bps = r.bits(5) + 1
            total = r.bits(36)
            if nch != 1 or bps != 16:
                raise NotImplementedError("only mono 16-bit FLAC supported")
            md5_expect = body[18:34]
        pos += 4 + length
        if last:
            break
    if sample_rate is None:
        raise ValueError("missing STREAMINFO")

    # Never pre-allocate from the (un-checksummed) STREAMINFO total:
    # a corrupt 36-bit field would demand a 256 GiB buffer. Decode the
    # frames the stream actually holds, then require the count to match.
    frames = []
    got = 0
    while got < total and pos < len(payload):
        frame, consumed = _decode_frame(payload, pos)
        frames.append(frame)
        got += frame.size
        pos += consumed
    if got != total:
        raise ValueError(
            f"FLAC sample-count mismatch: STREAMINFO says {total}, stream "
            f"holds {got}"
        )
    s16 = np.concatenate(frames).astype("<i2")
    if hashlib.md5(s16.tobytes()).digest() != md5_expect:
        raise ValueError("FLAC MD5 mismatch: decoded stream corrupt")
    return sample_rate, s16


def _decode_frame(payload: bytes, byte_pos: int):
    r = _BitReader(payload, byte_pos)
    if r.bits(14) != 0b11111111111110:
        raise ValueError("lost frame sync")
    r.bit()  # reserved
    r.bit()  # blocking strategy
    bs_code = r.bits(4)
    sr_code = r.bits(4)
    ch_code = r.bits(4)
    bps_code = r.bits(3)
    r.bit()  # reserved
    if ch_code != 0 or bps_code != 0b100:
        raise NotImplementedError("only mono 16-bit frames supported")
    _frame_no = _read_utf8_coded(r)
    if bs_code == 0b1000:
        bs = 256
    elif bs_code == 0b0111:
        bs = r.bits(16) + 1
    elif bs_code == 0b0110:
        bs = r.bits(8) + 1
    else:
        raise NotImplementedError(f"blocksize code {bs_code:#06b}")
    if sr_code != 0:
        raise NotImplementedError("per-frame sample rate")
    header_end = (r.bitpos + 7) >> 3  # CRC-8 covers bytes up to here
    crc8_read = r.bits(8)
    if _crc8(payload[byte_pos:header_end]) != crc8_read:
        raise ValueError("frame header CRC-8 mismatch")

    # subframe
    if r.bit() != 0:
        raise ValueError("subframe padding bit set")
    sf_type = r.bits(6)
    wasted = r.bit()
    if wasted:
        raise NotImplementedError("wasted-bits subframes")
    if sf_type == 0b000000:  # CONSTANT
        v = r.bits(16)
        if v >= 1 << 15:
            v -= 1 << 16
        blk = np.full(bs, v, dtype=np.int64)
    elif sf_type == 0b000001:  # VERBATIM
        vals = []
        for _ in range(bs):
            v = r.bits(16)
            vals.append(v - (1 << 16) if v >= 1 << 15 else v)
        blk = np.array(vals, dtype=np.int64)
    elif 0b001000 <= sf_type <= 0b001100:  # FIXED order 0..4
        order = sf_type & 0b000111
        warm = []
        for _ in range(order):
            v = r.bits(16)
            warm.append(v - (1 << 16) if v >= 1 << 15 else v)
        method = r.bits(2)
        if method not in (0b00, 0b01):
            raise ValueError("reserved residual method")
        part_order = r.bits(4)
        if part_order != 0:
            raise NotImplementedError("rice partition order > 0")
        kbits = 4 if method == 0b00 else 5
        k = r.bits(kbits)
        if k == (1 << kbits) - 1:  # escape: raw residuals
            rawbits = r.bits(5)
            res = [
                (v - (1 << rawbits) if v >= 1 << (rawbits - 1) else v)
                for v in (r.bits(rawbits) for _ in range(bs - order))
            ]
        else:
            res = []
            for _ in range(bs - order):
                q = r.unary()
                u = (q << k) | r.bits(k)
                res.append(_unzigzag(u))
        # integrate `order` times from the warm-up samples
        blk = np.empty(bs, dtype=np.int64)
        blk[:order] = warm
        if order == 0:
            blk[:] = res
        elif order == 1:
            blk[1:] = np.cumsum(res) + blk[0]
        elif order == 2:
            for i, e in enumerate(res):
                blk[i + 2] = e + 2 * blk[i + 1] - blk[i]
        elif order == 3:
            for i, e in enumerate(res):
                blk[i + 3] = e + 3 * blk[i + 2] - 3 * blk[i + 1] + blk[i]
        else:
            for i, e in enumerate(res):
                blk[i + 4] = (
                    e + 4 * blk[i + 3] - 6 * blk[i + 2] + 4 * blk[i + 1] - blk[i]
                )
    else:
        raise NotImplementedError(f"subframe type {sf_type:#08b} (LPC)")

    r.align()
    frame_end = r.bitpos >> 3
    crc16_read = r.bits(16)
    if _crc16(payload[byte_pos:frame_end]) != crc16_read:
        raise ValueError("frame CRC-16 mismatch")
    return blk, (r.bitpos >> 3) - byte_pos


# --- deterministic payload synthesis (integer arithmetic => SQL oracle) -----


def formula_flac_samples(doc_id: int) -> tuple[int, np.ndarray]:
    """(sample_rate, samples) for doc_id — pure integer arithmetic the
    DuckDB oracle recomputes: n = 200 + doc_id % 400 (1..3 frames at
    blocksize 256, last frame short), rate = 8000 + (doc_id % 3) * 4000.
    Sample stream is three regimes so every subframe type occurs:
      i < 64          : constant   ((doc_id * 7) % 1001) - 500
      64 <= i < 128   : linear ramp (order-1/2 friendly)
                        base + (i - 64) * (1 + doc_id % 5)
      i >= 128        : pseudo-noise ((doc_id*31 + i*i*17) % 4001) - 2000
    """
    n = 200 + doc_id % 400
    rate = 8000 + (doc_id % 3) * 4000
    i = np.arange(n, dtype=np.int64)
    const = (doc_id * 7) % 1001 - 500
    ramp = const + (i - 64) * (1 + doc_id % 5)
    noise = (doc_id * 31 + i * i * 17) % 4001 - 2000
    s = np.where(i < 64, const, np.where(i < 128, ramp, noise))
    return rate, s


def gen_flac_payload(doc_id: int) -> bytes:
    rate, s = formula_flac_samples(doc_id)
    return encode_flac(s, rate)
