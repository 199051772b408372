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
- subframes: CONSTANT, VERBATIM, FIXED orders 0..4 (encode picks the
  cheapest of constant/fixed-0..2 per frame like a real encoder), and
  — decode-side — LPC orders 1..32 (QLP precision/shift/coefficient
  parse + integer prediction), because real-world FLAC files
  overwhelmingly use LPC; round-trip-tested via the LPC test writer.
  Residuals are rice-coded (4/5-bit parameter, partition order 0,
  zigzag, escape to raw).
- stereo: per-frame channel decorrelation (independent, left/side,
  right/side, mid/side with the exact (mid<<1)|(side&1) inverse),
  chosen by cost like a real encoder; MD5 over the interleaved stream.

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


_PLAN_MISS = object()
# Thread-local (ADVICE r14): the memo is scoped to one encode_flac*
# stream — a module-global dict cleared at entry points was correct only
# by convention and unsafe if two encodes ever interleave in one process
# (driver-side threaded callers exist since scale_ops r14). Each thread
# sees its own dict; entry points still reset it per stream.
_PLAN_TLS = __import__("threading").local()


def _plan_memo() -> dict:
    memo = getattr(_PLAN_TLS, "memo", None)
    if memo is None:
        memo = _PLAN_TLS.memo = {}
    return memo


def _plan_memo_reset() -> None:
    _PLAN_TLS.memo = {}


def _partition_plan(zz: np.ndarray, bs: int, order: int):
    """(partition_order, [k per partition], total residual-section bits)
    — the real-encoder decision (r12): try every partition order whose
    2^po partitions divide the blocksize and leave the first partition
    its `order` warm-up deficit, pick per-partition rice parameters,
    keep the cheapest. Mixed-regime blocks (constant head, noisy tail)
    are exactly where per-partition k beats a single k.

    r14 shape: instead of a (15, n+1) quotient-bit prefix table per
    call, pad the warm-up deficit with zeros (quotient bits of 0 are 0
    at every k, so sums are unchanged), reshape-sum the (15, bs)
    quotient matrix once at the DEEPEST valid partition order, and
    derive every coarser order by pairwise halving — the same integer
    per-partition costs, ~3x less numpy per call on the ~256-sample
    blocks these fixtures emit. Ties across orders resolve to the
    LOWEST po exactly as the old ascending scan did (descending loop,
    <=). A pure-function memo keyed on the residuals removes the
    search/emit and stereo cost/emit recomputes of the same block
    (plan is a deterministic function of (zz, order); zz.size + order
    recovers bs, so the key is complete). The memo is scoped to ONE
    encode_flac*/stream call — each entry point clears it — so nothing
    is reused across rows, runs, or bench iterations; only the
    cost-pass/emit-pass repeats within a single stream hit."""
    memo = _plan_memo()
    key = (zz.tobytes(), order)
    hit = memo.get(key, _PLAN_MISS)
    if hit is not _PLAN_MISS:
        return hit
    # deepest po passing the same validity scan the ascending loop ran
    po_max = -1
    po = 0
    while po <= 6:
        nparts = 1 << po
        if bs % nparts or (bs >> po) <= order or nparts > zz.size + order:
            break
        po_max = po
        po += 1
    best = None
    if po_max >= 0:
        zp = np.concatenate([np.zeros(order, dtype=np.int64), zz]) if order else zz
        q = zp[None, :] >> _K_RANGE  # (15, bs)
        kk1 = _K_RANGE[:, 0] + 1  # (15,)
        nparts = 1 << po_max
        qs = q.reshape(15, nparts, bs >> po_max).sum(axis=2)  # (15, nparts)
        for po in range(po_max, -1, -1):
            nparts = 1 << po
            step = bs >> po
            lens = np.full(nparts, step, dtype=np.int64)
            lens[0] = step - order
            costs = qs + kk1[:, None] * lens[None, :]
            ks = costs.argmin(axis=0)
            bits = 2 + 4 + 4 * nparts + int(costs[ks, np.arange(nparts)].sum())
            if best is None or bits <= best[2]:
                best = (po, ks.tolist(), bits)
            if po:
                qs = qs.reshape(15, nparts >> 1, 2).sum(axis=2)
    memo[key] = best
    return best


def _wasted_shift(blk: np.ndarray, bps: int) -> int:
    """Common trailing zero bits across the block (the FLAC wasted-bits
    field): trailing zeros of the OR of all samples — valid in two's
    complement, capped so at least one significant bit remains."""
    orv = int(np.bitwise_or.reduce(blk))
    if orv == 0:
        return 0
    w = (orv & -orv).bit_length() - 1
    return min(w, bps - 2)


def _rice_cost(samples: np.ndarray, order: int, bps: int = 16) -> int:
    plan = _partition_plan(
        _zigzag(_fixed_residual(samples, order)), samples.size, order
    )
    cost = plan[2] if plan else 1 << 30
    return cost + order * bps  # residual bits + verbatim warm-up


_BPS_CODE = {8: 0b001, 12: 0b010, 16: 0b100, 20: 0b101, 24: 0b110}
_BPS_FROM_CODE = {v: k for k, v in _BPS_CODE.items()}


def _pack_samples(arr: np.ndarray, bps: int) -> bytes:
    """Little-endian ceil(bps/8)-byte packing of the sample stream —
    what the STREAMINFO MD5 is computed over, per spec (r12: the codec
    handles 8/12/16/20/24-bit depths, retiring the 16-bit fence)."""
    if bps <= 8:
        return arr.astype("<i1").tobytes()
    if bps <= 16:
        return arr.astype("<i2").tobytes()
    # 17..24: three bytes per sample, two's complement little-endian
    return (
        arr.astype("<i4").view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
    )


def encode_flac(
    samples: np.ndarray, sample_rate: int, bps: int = 16
) -> bytes:
    """Mono samples -> FLAC stream (STREAMINFO + frames) at any
    supported depth (8/12/16/20/24 bits, r12)."""
    _plan_memo_reset()  # memo lives for this one stream only
    assert bps in _BPS_CODE, bps
    s = np.asarray(samples, dtype=np.int64)
    lim = 1 << (bps - 1)
    assert s.size and np.all((s >= -lim) & (s <= lim - 1))
    n = s.size
    md5 = hashlib.md5(_pack_samples(s, bps)).digest()

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
    si.put(bps - 1, 5)
    si.put(n, 36)
    out += b"\x80" + (34).to_bytes(3, "big") + bytes(si.out) + md5
    del last_bs

    for frame_no, start in enumerate(range(0, n, _BLOCKSIZE)):
        blk = s[start : start + _BLOCKSIZE]
        out += _encode_frame(blk, frame_no, sample_rate, bps)
    return bytes(out)


def _frame_header(bs: int, frame_no: int, ch_code: int, bps: int = 16) -> bytes:
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
    w.put(ch_code, 4)  # 0 = mono; 1 = L/R; 8/9/10 = LS/RS/MS
    w.put(_BPS_CODE[bps], 3)
    w.put(0, 1)  # reserved
    header = bytes(w.out) + _utf8_coded(frame_no) + bs_tail
    return header + bytes([_crc8(header)])


def _subframe_cost(blk: np.ndarray, bps: int) -> int:
    """Bits the cheapest supported subframe would take for `blk`."""
    if np.all(blk == blk[0]):
        return 8 + bps
    return 8 + min(_rice_cost(blk, o, bps) for o in range(3))


def _write_residuals(
    body: _BitWriter, zz: np.ndarray, bs: int, order: int
) -> None:
    """Coded-residual section with the cheapest partition order (r12):
    2^po partitions, each with its own 4-bit rice parameter — the shape
    real encoders emit almost universally."""
    po, ks, _bits = _partition_plan(zz, bs, order)
    body.put(0b00, 2)  # residual method: rice, 4-bit parameter
    body.put(po, 4)
    put = body.put
    lo = 0
    for pn, k in enumerate(ks):
        cnt = (bs >> po) - (order if pn == 0 else 0)
        put(k, 4)
        # one put per sample: the unary quotient, stop bit, and k-bit
        # remainder concatenate to (1 << k) | rem over (q + 1 + k) bits
        # (r14: a per-partition numpy scatter-pack was tried and is
        # SLOWER — high-po blocks split into 4-sample partitions where
        # fixed numpy overhead swamps the per-sample loop)
        kmask = (1 << k) - 1
        stop = 1 << k
        for u in zz[lo : lo + cnt].tolist():
            put(stop | (u & kmask), (u >> k) + 1 + k)
        lo += cnt


def _encode_subframe(body: _BitWriter, blk: np.ndarray, bps: int) -> None:
    """Cheapest of CONSTANT / FIXED order 0..2; wasted-bits stripping
    and per-partition rice parameters like a real encoder (r12)."""
    if np.all(blk == blk[0]):
        body.put(0, 1)  # zero padding bit
        body.put(0b000000, 6)  # CONSTANT
        body.put(0, 1)  # no wasted bits
        body.put(int(blk[0]) & ((1 << bps) - 1), bps)
        return
    wasted = _wasted_shift(blk, bps)
    sub = blk >> wasted
    ebps = bps - wasted
    order = min(range(3), key=lambda o: _rice_cost(sub, o, ebps))
    body.put(0, 1)
    body.put(0b001000 | order, 6)  # FIXED, order
    if wasted:
        body.put(1, 1)
        body.unary(wasted - 1)  # spec: unary-coded (wasted - 1)
    else:
        body.put(0, 1)
    for v in sub[:order]:  # warm-up samples, verbatim ebps bits
        body.put(int(v) & ((1 << ebps) - 1), ebps)
    _write_residuals(body, _zigzag(_fixed_residual(sub, order)), blk.size, order)


def _encode_frame(
    blk: np.ndarray, frame_no: int, sample_rate: int, bps: int = 16
) -> bytes:
    header = _frame_header(blk.size, frame_no, 0, bps)
    body = _BitWriter()
    _encode_subframe(body, blk, bps)
    body.pad_to_byte()
    payload = header + bytes(body.out)
    return payload + struct.pack(">H", _crc16(payload))


def _encode_frame_stereo(
    left: np.ndarray, right: np.ndarray, frame_no: int,
    force_code: int | None = None,
) -> bytes:
    """Per-frame channel-assignment choice, like a real encoder: cost
    out independent L/R, left/side, right/side, and mid/side (side =
    L - R at bps+1; mid = (L + R) >> 1) and emit the cheapest."""
    side = left - right
    mid = (left + right) >> 1
    c_l = _subframe_cost(left, 16)
    c_r = _subframe_cost(right, 16)
    c_s = _subframe_cost(side, 17)
    c_m = _subframe_cost(mid, 16)
    options = {
        0b0001: (c_l + c_r, (left, 16), (right, 16)),
        0b1000: (c_l + c_s, (left, 16), (side, 17)),
        0b1001: (c_s + c_r, (side, 17), (right, 16)),
        0b1010: (c_m + c_s, (mid, 16), (side, 17)),
    }
    ch_code = force_code if force_code is not None else min(
        options, key=lambda c: options[c][0]
    )
    _, ch1, ch2 = options[ch_code]
    header = _frame_header(left.size, frame_no, ch_code)
    body = _BitWriter()
    _encode_subframe(body, ch1[0], ch1[1])
    _encode_subframe(body, ch2[0], ch2[1])
    body.pad_to_byte()
    payload = header + bytes(body.out)
    return payload + struct.pack(">H", _crc16(payload))


def encode_flac_stereo(
    left: np.ndarray, right: np.ndarray, sample_rate: int
) -> bytes:
    """Stereo int16 -> FLAC stream with per-frame decorrelation."""
    _plan_memo_reset()  # memo lives for this one stream only
    lft = np.asarray(left, dtype=np.int64)
    rgt = np.asarray(right, dtype=np.int64)
    assert lft.size == rgt.size and lft.size
    for s in (lft, rgt):
        assert np.all((s >= -32768) & (s <= 32767))
    n = lft.size
    inter = np.empty(2 * n, dtype="<i2")
    inter[0::2] = lft.astype("<i2")
    inter[1::2] = rgt.astype("<i2")
    md5 = hashlib.md5(inter.tobytes()).digest()

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.put(min(_BLOCKSIZE, n) if n >= _BLOCKSIZE else n, 16)
    si.put(min(_BLOCKSIZE, n), 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(1, 3)  # channels - 1
    si.put(15, 5)  # bps - 1
    si.put(n, 36)
    out += b"\x80" + (34).to_bytes(3, "big") + bytes(si.out) + md5
    for frame_no, start in enumerate(range(0, n, _BLOCKSIZE)):
        out += _encode_frame_stereo(
            lft[start : start + _BLOCKSIZE],
            rgt[start : start + _BLOCKSIZE],
            frame_no,
        )
    return bytes(out)


def _decode_stream(payload: bytes, want_channels: int):
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
            if bps not in _BPS_CODE:
                raise NotImplementedError(f"unsupported FLAC bit depth {bps}")
            if nch != want_channels:
                raise NotImplementedError(
                    f"stream has {nch} channel(s); use "
                    f"{'decode_flac' if nch == 1 else 'decode_flac_stereo'}"
                )
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
        frame, consumed = _decode_frame(payload, pos, bps)
        if (frame.ndim == 2) != (want_channels == 2):
            raise ValueError("frame channel layout contradicts STREAMINFO")
        frames.append(frame)
        got += frame.shape[-1]
        pos += consumed
    if got != total:
        raise ValueError(
            f"FLAC sample-count mismatch: STREAMINFO says {total}, stream "
            f"holds {got}"
        )
    return sample_rate, frames, md5_expect, bps


def decode_flac(payload: bytes):
    """Mono FLAC stream -> (sample_rate, int16 samples). Verifies frame
    CRC-8/CRC-16 and the STREAMINFO MD5 of the decoded stream."""
    try:
        sample_rate, frames, md5_expect, bps = _decode_stream(payload, 1)
    except (IndexError, struct.error) as e:  # truncated / corrupt stream
        raise ValueError(f"truncated or corrupt FLAC: {e!r}") from e
    arr = np.concatenate(frames)
    if hashlib.md5(_pack_samples(arr, bps)).digest() != md5_expect:
        raise ValueError("FLAC MD5 mismatch: decoded stream corrupt")
    return sample_rate, arr.astype("<i2") if bps <= 16 else arr.astype("<i4")


def decode_flac_stereo(payload: bytes):
    """Stereo FLAC -> (sample_rate, left int16, right int16). Undoes the
    per-frame channel decorrelation (independent / left-side /
    right-side / mid-side) and verifies all three checksums — the MD5 is
    computed over the interleaved L,R stream exactly as the spec says,
    so a decorrelation-mode or reconstruction bug cannot pass."""
    try:
        sample_rate, frames, md5_expect, bps = _decode_stream(payload, 2)
    except (IndexError, struct.error) as e:  # truncated / corrupt stream
        raise ValueError(f"truncated or corrupt FLAC: {e!r}") from e
    lr = np.concatenate(frames, axis=1)
    inter = np.empty(2 * lr.shape[1], dtype=np.int64)
    inter[0::2] = lr[0]
    inter[1::2] = lr[1]
    if hashlib.md5(_pack_samples(inter, bps)).digest() != md5_expect:
        raise ValueError("FLAC MD5 mismatch: decoded stream corrupt")
    dt = "<i2" if bps <= 16 else "<i4"
    return sample_rate, lr[0].astype(dt), lr[1].astype(dt)


def _decode_frame(payload: bytes, byte_pos: int, stream_bps: int = 16):
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
    if ch_code not in (0b0000, 0b0001, 0b1000, 0b1001, 0b1010):
        raise NotImplementedError(f"channel assignment {ch_code:#06b}")
    bps = _BPS_FROM_CODE.get(bps_code)
    if bps is None:
        raise NotImplementedError(f"bit-depth code {bps_code:#05b}")
    if bps != stream_bps:
        raise ValueError("frame bit depth contradicts STREAMINFO")
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

    if ch_code == 0b0000:
        frame = _decode_subframe(r, bs, bps)
    else:
        bps1 = bps + 1 if ch_code == 0b1001 else bps  # RS: ch1 is the side
        bps2 = bps + 1 if ch_code in (0b1000, 0b1010) else bps  # LS/MS side
        ch1 = _decode_subframe(r, bs, bps1)
        ch2 = _decode_subframe(r, bs, bps2)
        if ch_code == 0b0001:  # independent L, R
            left, right = ch1, ch2
        elif ch_code == 0b1000:  # left/side: side = L - R
            left, right = ch1, ch1 - ch2
        elif ch_code == 0b1001:  # side/right
            left, right = ch1 + ch2, ch2
        else:  # mid/side: mid = (L + R) >> 1, side = L - R
            mid2 = (ch1 << 1) | (ch2 & 1)
            left = (mid2 + ch2) >> 1
            right = (mid2 - ch2) >> 1
        frame = np.stack([left, right])

    r.align()
    frame_end = r.bitpos >> 3
    crc16_read = r.bits(16)
    if _crc16(payload[byte_pos:frame_end]) != crc16_read:
        raise ValueError("frame CRC-16 mismatch")
    return frame, (r.bitpos >> 3) - byte_pos


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> np.ndarray:
    if r.bit() != 0:
        raise ValueError("subframe padding bit set")
    sf_type = r.bits(6)
    wasted = 0
    if r.bit():  # r12: wasted-bits field — flag then unary(count - 1)
        wasted = r.unary() + 1
        if wasted >= bps:
            raise ValueError("wasted bits exhaust the sample width")
    bps -= wasted  # decode at the reduced width, shift back at the end
    sign = 1 << (bps - 1)
    full = 1 << bps
    if sf_type == 0b000000:  # CONSTANT
        v = r.bits(bps)
        if v >= sign:
            v -= full
        blk = np.full(bs, v, dtype=np.int64)
    elif sf_type == 0b000001:  # VERBATIM
        vals = []
        for _ in range(bs):
            v = r.bits(bps)
            vals.append(v - full if v >= sign else v)
        blk = np.array(vals, dtype=np.int64)
    elif 0b001000 <= sf_type <= 0b001100:  # FIXED order 0..4
        order = sf_type & 0b000111
        warm = []
        for _ in range(order):
            v = r.bits(bps)
            warm.append(v - full if v >= sign else v)
        res = _read_residuals(r, bs, order)
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
    elif sf_type >= 0b100000:  # LPC order 1..32 — what real files use
        order = (sf_type & 0b011111) + 1
        warm = []
        for _ in range(order):
            v = r.bits(bps)
            warm.append(v - full if v >= sign else v)
        precision = r.bits(4) + 1
        if precision == 16:  # coded 0b1111 is invalid per spec
            raise ValueError("invalid QLP precision escape")
        shift = r.bits(5)  # signed per spec but negative is forbidden
        if shift >= 16:
            raise ValueError("negative QLP shift")
        psign = 1 << (precision - 1)
        pfull = 1 << precision
        coefs = []
        for _ in range(order):
            c = r.bits(precision)
            coefs.append(c - pfull if c >= psign else c)
        res = _read_residuals(r, bs, order)
        blk = np.empty(bs, dtype=np.int64)
        blk[:order] = warm
        for i, e in enumerate(res):
            pred = 0
            base = i + order
            for j, c in enumerate(coefs):
                pred += c * int(blk[base - 1 - j])
            blk[base] = e + (pred >> shift)
    else:
        raise NotImplementedError(f"subframe type {sf_type:#08b}")
    return blk << wasted if wasted else blk


def _read_residuals(r: _BitReader, bs: int, order: int) -> list[int]:
    """Coded-residual section shared by FIXED and LPC subframes: rice
    (4- or 5-bit parameter) with the escape to raw, any partition order
    0..15 (r12 — real encoders emit partitioned rice almost
    universally). 2^po partitions; the first is short by the predictor
    order; each carries its own parameter."""
    method = r.bits(2)
    if method not in (0b00, 0b01):
        raise ValueError("reserved residual method")
    part_order = r.bits(4)
    nparts = 1 << part_order
    if bs % nparts:
        raise ValueError("partition count does not divide blocksize")
    if (bs >> part_order) <= order and part_order:
        raise ValueError("first partition shorter than predictor order")
    kbits = 4 if method == 0b00 else 5
    escape = (1 << kbits) - 1
    res: list[int] = []
    for pn in range(nparts):
        count = (bs >> part_order) - (order if pn == 0 else 0)
        k = r.bits(kbits)
        if k == escape:  # escape: raw residuals at a fixed width
            rawbits = r.bits(5)
            if rawbits == 0:
                res.extend([0] * count)
            else:
                res.extend(
                    v - (1 << rawbits) if v >= 1 << (rawbits - 1) else v
                    for v in (r.bits(rawbits) for _ in range(count))
                )
            continue
        # r14: the unary+remainder+unzigzag hot loop runs with the
        # reader state in locals — one Python frame per SAMPLE instead
        # of three method calls (unary, bits, _unzigzag); semantics are
        # byte-for-byte those of the _BitReader methods.
        data, bp, acc, n = r.data, r.byte_pos, r._acc, r._n
        kmask = (1 << k) - 1
        append = res.append
        for _ in range(count):
            q = 0
            while True:
                if n == 0:
                    acc = data[bp]
                    bp += 1
                    n = 8
                if acc == 0:
                    q += n
                    n = 0
                    continue
                bl = acc.bit_length()
                q += n - bl
                n = bl - 1
                acc -= 1 << n
                break
            while n < k:
                acc = (acc << 8) | data[bp]
                bp += 1
                n += 8
            n -= k
            u = (q << k) | ((acc >> n) & kmask)
            acc &= (1 << n) - 1
            append((u >> 1) if (u & 1) == 0 else -((u + 1) >> 1))
        r.byte_pos, r._acc, r._n = bp, acc, n
    return res


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


def formula_flac_stereo_samples(doc_id: int):
    """(sample_rate, left, right) — integer arithmetic the DuckDB oracle
    recomputes. L is pseudo-noise throughout; R tracks L with a small
    wobble for i < n//2 (side channel tiny -> mid/side or left/side
    wins the per-frame cost-out) and is independent noise after (the
    independent L/R assignment wins), so a single payload exercises
    multiple decorrelation modes across its frames:
      n = 200 + doc_id % 300, rate = 8000 + (doc_id % 3) * 4000
      L(i) = (doc_id * 31 + i * i * 13) % 3001 - 1500
      R(i) = L(i) + ((doc_id + i) % 21) - 10          for i < n // 2
             (doc_id * 17 + i * i * 29) % 12001 - 6000 otherwise
    (the wider independent range makes c(L)+c(R) beat mid/side there,
    so both the decorrelated and independent reconstructions are
    exercised under the hash oracle)
    """
    n = 200 + doc_id % 300
    rate = 8000 + (doc_id % 3) * 4000
    i = np.arange(n, dtype=np.int64)
    left = (doc_id * 31 + i * i * 13) % 3001 - 1500
    wobble = left + (doc_id + i) % 21 - 10
    indep = (doc_id * 17 + i * i * 29) % 12001 - 6000
    right = np.where(i < n // 2, wobble, indep)
    return rate, left, right


def gen_flac_stereo_payload(doc_id: int) -> bytes:
    rate, left, right = formula_flac_stereo_samples(doc_id)
    return encode_flac_stereo(left, right, rate)


def _encode_subframe_lpc(
    body: _BitWriter,
    blk: np.ndarray,
    bps: int,
    coefs: list[int],
    precision: int,
    shift: int,
) -> None:
    """LPC subframe encoder (test/interop aid: the oracle keys emit
    FIXED subframes, but the decoder supports LPC because real-world
    FLAC files overwhelmingly use it — this writer exists so that
    support is round-trip-TESTED, not merely claimed). Residuals use
    the same integer prediction the decoder inverts:
    e[i] = x[i] - ((sum c[j]*x[i-1-j]) >> shift)."""
    order = len(coefs)
    assert 1 <= order <= 32 and 1 <= precision <= 15 and 0 <= shift <= 15
    psign = 1 << (precision - 1)
    assert all(-psign <= c < psign for c in coefs)
    body.put(0, 1)
    body.put(0b100000 | (order - 1), 6)
    body.put(0, 1)  # no wasted bits
    for v in blk[:order]:
        body.put(int(v) & ((1 << bps) - 1), bps)
    body.put(precision - 1, 4)
    body.put(shift, 5)
    for c in coefs:
        body.put(c & ((1 << precision) - 1), precision)
    res = []
    x = blk.astype(np.int64)
    for i in range(order, blk.size):
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * int(x[i - 1 - j])
        res.append(int(x[i]) - (pred >> shift))
    zz = _zigzag(np.array(res, dtype=np.int64)) if res else np.array([], dtype=np.int64)
    _write_residuals(body, zz, blk.size, order)  # r12: partitioned rice


def encode_flac_lpc(
    samples: np.ndarray,
    sample_rate: int,
    coefs: list[int],
    precision: int,
    shift: int,
) -> bytes:
    """Mono int16 samples -> FLAC stream whose every frame carries an
    LPC subframe with the given quantized predictor (order = len(coefs),
    warm-up = the first `order` samples of each frame). Exists so the
    decoder's LPC path is exercised END TO END — container, frame
    headers, CRCs, MD5 — under the multimodal_flac_lpc_decode hash
    oracle, not just at frame level in unit tests."""
    _plan_memo_reset()  # memo lives for this one stream only
    s = np.asarray(samples, dtype=np.int64)
    assert s.size > len(coefs) and np.all((s >= -32768) & (s <= 32767))
    n = s.size
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.put(min(_BLOCKSIZE, n) if n >= _BLOCKSIZE else n, 16)
    si.put(min(_BLOCKSIZE, n), 16)
    si.put(0, 24)
    si.put(0, 24)
    si.put(sample_rate, 20)
    si.put(0, 3)
    si.put(15, 5)
    si.put(n, 36)
    out += b"\x80" + (34).to_bytes(3, "big") + bytes(si.out) + md5
    for frame_no, start in enumerate(range(0, n, _BLOCKSIZE)):
        blk = s[start : start + _BLOCKSIZE]
        header = _frame_header(blk.size, frame_no, 0)
        body = _BitWriter()
        if blk.size > len(coefs):
            _encode_subframe_lpc(body, blk, 16, coefs, precision, shift)
        else:
            # a tail frame shorter than the predictor order cannot carry
            # its warm-up — per-frame subframe freedom lets it go FIXED
            _encode_subframe(body, blk, 16)
        body.pad_to_byte()
        payload = header + bytes(body.out)
        out += payload + struct.pack(">H", _crc16(payload))
    return bytes(out)


def formula_flac_lpc(doc_id: int):
    """(rate, samples, coefs, precision, shift) — the LPC key's fixture.
    Samples are a slow random walk (LPC-friendly); the quantized
    predictor itself varies per doc: order 1 + doc_id % 3 with
    c[j] = 16 + ((doc_id + 7 j) % 17) at precision 8, shift 5 — taps in
    [0.5, 1.03] of unity, so residuals stay small but nonzero and the
    rice parameter ranges across docs."""
    n = 180 + doc_id % 200
    rate = 8000 + (doc_id % 3) * 4000
    i = np.arange(n, dtype=np.int64)
    step = (doc_id * 13 + i * i * 7) % 41 - 20
    s = np.cumsum(step) + (doc_id % 500)
    order = 1 + doc_id % 3
    coefs = [16 + (doc_id + 7 * j) % 17 for j in range(order)]
    return rate, s, coefs, 8, 5


def formula_flac_depth(doc_id: int):
    """(rate, bps, samples) for the bit-depth key (r12): depth cycles
    8/16/24 by doc_id %% 3, sample magnitudes scale with the depth —
    constant head (subframe variety) then quadratic-hash noise, all
    integer arithmetic the DuckDB oracle recomputes:
      bps 8:  C=121,   M=241      (|s| <= 120)
      bps 16: C=1001,  M=4001     (|s| <= 2000)
      bps 24: C=100001, M=1000001 (|s| <= 500000)
      s(i) = (doc*7) %% C - C div 2            for i < 64
             (doc*31 + i*i*17) %% M - M div 2  otherwise
      n = 200 + doc %% 300, rate = 8000 + (doc %% 3) * 4000."""
    bps = (8, 16, 24)[doc_id % 3]
    C = {8: 121, 16: 1001, 24: 100001}[bps]
    M = {8: 241, 16: 4001, 24: 1000001}[bps]
    n = 200 + doc_id % 300
    rate = 8000 + (doc_id % 3) * 4000
    i = np.arange(n, dtype=np.int64)
    const = (doc_id * 7) % C - C // 2
    noise = (doc_id * 31 + i * i * 17) % M - M // 2
    return rate, bps, np.where(i < 64, const, noise)


def gen_flac_depth_payload(doc_id: int) -> bytes:
    rate, bps, s = formula_flac_depth(doc_id)
    return encode_flac(s, rate, bps=bps)


def formula_flac_wasted(doc_id: int) -> tuple[int, np.ndarray]:
    """(rate, samples) for the wasted-bits key (r12): the three-regime
    mono formula scaled by 2^(doc_id % 4) — three quarters of docs
    share 1..3 trailing zero bits across every sample, so the encoder's
    wasted-bits stripping (and the decoder's shift-back) runs under the
    hash oracle; the %4==0 quarter keeps the plain path as contrast.
    Max |sample| 2000·8 = 16000, comfortably int16."""
    rate, s = formula_flac_samples(doc_id)
    return rate, s << (doc_id % 4)


def gen_flac_wasted_payload(doc_id: int) -> bytes:
    rate, s = formula_flac_wasted(doc_id)
    return encode_flac(s, rate)


def gen_flac_lpc_payload(doc_id: int) -> bytes:
    rate, s, coefs, precision, shift = formula_flac_lpc(doc_id)
    return encode_flac_lpc(s, rate, coefs, precision, shift)
