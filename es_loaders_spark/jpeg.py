"""Baseline JPEG (JFIF) codec — pure numpy + stdlib, no codec libs.

Real decode for the third image format the media pipeline carries
(VERDICT r02 #8 follow-up: PPM and PNG are already real; this removes
JPEG from the compressed-image stub, leaving video only).

Scope (the baseline profile that covers the vast majority of web JPEGs):

- decode: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS parsing, 8-bit baseline
  sequential, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling,
  restart markers, byte-stuffing; Huffman → dequant → de-zigzag → IDCT
  (separable 8x8 DCT-III matrix, one einsum over ALL blocks) → upsample
  → YCbCr→RGB.
- encode: 4:4:4 (or grayscale) baseline with the Annex K quantization
  tables (quality-scaled, IJG curve) and Annex K Huffman tables — used
  to synthesize REAL test payloads and by ``resize_images`` re-encode.

Performance shape: the per-symbol Huffman walk is a Python loop (it is
inherently sequential bit-serial state), but everything after symbol
decode — dequantization, IDCT, level shift, chroma upsampling, color
transform — is vectorized over all MCUs at once. Inside the engine this
runs per-row in ``mapInPandas`` (multimodal.py), so media parallelism
comes from Spark partitions, not from this kernel.

Reference behavior modeled on the public JPEG spec (ITU-T T.81) only;
the reference repo (shahcompbio/es-loaders) has no media path — this is
part of the LLM-data-pipeline surface the brief adds on top.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of the 64-length stream → (row, col) in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(_ZIGZAG)  # (row*8+col) → stream index

# ITU-T T.81 Annex K.1 — luminance / chrominance quantization tables
_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 — typical Huffman tables: (bits[1..16], huffval)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# separable DCT basis: C[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_DCT = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """(bits, huffval) → {symbol: (code, length)} canonical Huffman codes."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(bits, huffval) → {(length, code): symbol} for the bit-serial walk."""
    return {
        (ln, code): sym for sym, (code, ln) in _canonical_codes(bits, huffval).items()
    }


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment.

    Byte stuffing (FF 00 → FF) and restart markers (FF D0-D7) are
    handled here; any other marker ends the stream.
    """

    __slots__ = ("data", "pos", "acc", "nbits", "marker")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:  # stuffed FF
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: consumed by caller
                self.marker = nxt
                raise _RestartMarker
            else:  # EOI / next segment
                self.marker = nxt
                raise _EndOfScan
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        val = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return val

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Consume a restart marker and realign to the next byte."""
        # drop buffered bits (they are padding before the marker)
        self.acc = 0
        self.nbits = 0
        # pos sits on the FF of the marker
        self.pos += 2
        self.marker = None


class _RestartMarker(Exception):
    pass


class _EndOfScan(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """JPEG signed magnitude extension (T.81 F.2.2.1)."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes → HxWxC uint8 (C = 1 gray, 3 RGB).

    Malformed/truncated headers raise ValueError (like the PNG/PPM
    decoders), so a corrupt media row fails its document, not the task.
    """
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error, KeyError, ZeroDivisionError) as e:
        # truncated stream, dangling table selector, zeroed sampling byte —
        # every corrupt-header shape surfaces as the one contract error
        raise ValueError(f"malformed JPEG stream: {e!r}") from e


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    n = len(payload)
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, comps) ; comps = [(cid, hsamp, vsamp, tq)]
    restart_interval = 0
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        while payload[pos + 1] == 0xFF:  # optional fill bytes before marker
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported (baseline)")
                qtables[tq] = np.frombuffer(
                    body, dtype=np.uint8, count=64, offset=i + 1
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                nsym = sum(bits)
                huffval = list(body[i + 17 : i + 17 + nsym])
                htables[(tc, th)] = _decode_table(bits, huffval)
                i += 17 + nsym
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_tables = {}
            for c in range(ns):
                cid, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan_tables[cid] = (tdta >> 4, tdta & 0x0F)
            return _decode_scan(
                payload, pos + seglen, frame, qtables, htables, scan_tables,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS segment in JPEG stream")


def _decode_scan(data, pos, frame, qtables, htables, scan_tables, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y

    reader = _BitReader(data, pos)
    # per component: coefficient tensor (n_blocks, 64) in zigzag order
    coef = {
        cid: np.zeros((n_mcus * hs * vs, 64), dtype=np.int64)
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, *_ in comps}
    mcu = 0
    try:
        while mcu < n_mcus:
            if restart_interval and mcu and mcu % restart_interval == 0:
                # skip to the restart marker if bits remain, then resync
                try:
                    while True:
                        reader.bits(1)
                except _RestartMarker:
                    reader.sync_restart()
                pred = {cid: 0 for cid, *_ in comps}
            for cid, hs, vs, _tq in comps:
                td, ta = scan_tables[cid]
                dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]
                for b in range(hs * vs):
                    block = coef[cid][mcu * hs * vs + b]
                    t = reader.huff(dc_tab)
                    diff = _extend(reader.bits(t), t) if t else 0
                    pred[cid] += diff
                    block[0] = pred[cid]
                    k = 1
                    while k < 64:
                        rs = reader.huff(ac_tab)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflows block")
                        block[k] = _extend(reader.bits(s), s)
                        k += 1
            mcu += 1
    except (_EndOfScan, _RestartMarker, IndexError):
        pass  # truncated stream: decode what we have (remaining blocks zero)

    # vectorized tail: dequant → de-zigzag → IDCT for ALL blocks at once
    planes = {}
    for cid, hs, vs, tq in comps:
        q = qtables[tq]
        blocks = (coef[cid] * q)[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        pix = np.einsum("ux,nuv,vy->nxy", _DCT, blocks, _DCT) + 128.0
        # scatter blocks into the component plane (MCU-major, then block row)
        pw, ph = mcus_x * hs * 8, mcus_y * vs * 8
        plane = np.zeros((ph, pw), dtype=np.float64)
        idx = 0
        for m in range(n_mcus):
            my, mx = divmod(m, mcus_x)
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = pix[idx]
                    idx += 1
        # upsample to full resolution (sample replication)
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1)
        planes[cid] = plane[:h, :w]

    if len(comps) == 1:
        gray = np.clip(np.round(planes[comps[0][0]]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    y, cb, cr = (planes[c[0]] for c in comps)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder (4:4:4 / grayscale, Annex K tables) ----------------------------


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 50 → table as-is, 100 → all ones."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255)


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _encode_block(writer, block_zz, pred, dc_codes, ac_codes):
    """One 8x8 quantized block (zigzag order) → bits. Returns new DC pred."""
    dc = int(block_zz[0])
    diff = dc - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, ln = dc_codes[t]
    writer.write(code, ln)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    nz = np.nonzero(block_zz[1:])[0]
    last = nz[-1] + 1 if nz.size else 0
    for k in range(1, last + 1):
        v = int(block_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """HxW (gray) or HxWx3 (RGB) uint8 → baseline JFIF bytes.

    ``subsampling``: "444" (no chroma subsampling) or "420" (2x2 box
    chroma downsample — the common web-JPEG MCU shape: 4 Y + Cb + Cr
    blocks per MCU). ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (exercises the decoder's restart resync path).
    """
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2 or pixels.shape[2] == 1
    if pixels.ndim == 3 and pixels.shape[2] == 1:
        pixels = pixels[:, :, 0]
    h, w = pixels.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    y_samp = (2, 2) if (subsampling == "420" and not gray) else (1, 1)

    qy = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)

    # planes: (pixels, qtab, quant-table-id, (hs, vs))
    if gray:
        planes = [(pixels.astype(np.float64), qy, 0, (1, 1))]
    else:
        rgb = pixels.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [(y, qy, 0, y_samp), (cb, qc, 1, (1, 1)), (cr, qc, 1, (1, 1))]

    hmax = max(p[3][0] for p in planes)
    vmax = max(p[3][1] for p in planes)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per component: downsample, pad to the MCU grid by edge replication,
    # forward DCT over ALL blocks in one einsum, quantize, zigzag; keep a
    # (block_row, block_col, 64) grid for MCU-ordered emission
    comp_grids = []
    for plane, qtab, _tq, (hs, vs) in planes:
        if hs != hmax or vs != vmax:  # chroma downsample (box average)
            fy, fx = vmax // vs, hmax // hs
            ph0 = -(-plane.shape[0] // fy) * fy
            pw0 = -(-plane.shape[1] // fx) * fx
            plane = np.pad(
                plane, ((0, ph0 - plane.shape[0]), (0, pw0 - plane.shape[1])),
                mode="edge",
            )
            plane = plane.reshape(ph0 // fy, fy, pw0 // fx, fx).mean(axis=(1, 3))
        ph, pw = mcus_y * vs * 8, mcus_x * hs * 8
        padded = np.pad(
            plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge"
        ) - 128.0
        blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3)
        co = np.einsum("ux,nxy,vy->nuv", _DCT, blocks.reshape(-1, 8, 8), _DCT)
        # qtab is natural (raster) order, matching the reshaped coefficients
        qz = np.round(co.reshape(-1, 64) / qtab).astype(np.int64)
        comp_grids.append(qz[:, _ZIGZAG].reshape(ph // 8, pw // 8, 64))

    dc_y = _canonical_codes(*_DC_LUMA)
    ac_y = _canonical_codes(*_AC_LUMA)
    dc_c = _canonical_codes(*_DC_CHROMA)
    ac_c = _canonical_codes(*_AC_CHROMA)
    writer = _BitWriter()
    preds = [0] * len(planes)
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            writer.flush()  # pad to byte alignment
            writer.out += bytes([0xFF, 0xD0 + (m // restart_interval - 1) % 8])
            preds = [0] * len(planes)
        my, mx = divmod(m, mcus_x)
        for ci, (_pl, _qt, _tq, (hs, vs)) in enumerate(planes):
            dc_t, ac_t = (dc_y, ac_y) if ci == 0 else (dc_c, ac_c)
            for by in range(vs):
                for bx in range(hs):
                    block = comp_grids[ci][my * vs + by, mx * hs + bx]
                    preds[ci] = _encode_block(writer, block, preds[ci], dc_t, ac_t)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + bytes(qy[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qc[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (_pl, _qt, tq, (hs, vs)) in enumerate(planes):
        sof += bytes([ci + 1, (hs << 4) | vs, tq])
    out += seg(0xC0, sof)

    def dht(tc: int, th: int, table) -> bytes:
        bits, huffval = table
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(huffval))

    out += dht(0, 0, _DC_LUMA) + dht(1, 0, _AC_LUMA)
    if not gray:
        out += dht(0, 1, _DC_CHROMA) + dht(1, 1, _AC_CHROMA)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += seg(0xDA, sos)
    out += writer.out
    out += b"\xFF\xD9"
    return bytes(out)
