"""Baseline-sequential JPEG (JFIF) codec — pure numpy + stdlib, no
image library, built from the PUBLIC spec (ITU-T T.81 / ISO 10918-1):
marker-segment parse, canonical Huffman reconstruction from DHT,
entropy decode with byte-unstuffing, dequantize + inverse zigzag,
separable 8×8 IDCT as two matrix products, level shift, and JFIF
YCbCr→RGB for 3-component 4:4:4 scans.  The sibling encoder exists as
the test/oracle twin (same role as ``multimodal.encode_png`` /
``encode_bmp``): it emits valid baseline streams with canonical
Huffman tables built from the data's own symbol set, so the decoder's
DHT walk is exercised by construction, not by a hardcoded-table
shortcut.

Deliberate scope (loud rejects, not silent wrong answers): baseline
DCT sequential only (SOF0), 8-bit precision, 1 or 3 components,
4:4:4 sampling (every component 1×1), no progressive (SOF2), no
restart markers, no arithmetic coding.  That is the decode matrix the
synthetic corpus needs; WebP stays out of scope per round-7 review.

Reference parity: the reference pipeline has no media handling at
all (reference src/finance_etl/*); this extends the multimodal
column layer the same way decode_png did in round 6.
"""

from __future__ import annotations

import numpy as np

# ------------------------------------------------------------ constants

#: zigzag scan order: ZIGZAG[i] = (row, col) linear index of the i-th
#: coefficient in scan order (T.81 Figure 5)
_ZZ_ORDER = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
ZIGZAG = np.array(_ZZ_ORDER, dtype=np.int64)


def _dct_basis() -> np.ndarray:
    """A[u, x] = 0.5 · C(u) · cos((2x+1)uπ/16) — the orthonormal 8×8
    DCT-II basis in T.81's normalization: forward F = A·s·Aᵀ, inverse
    s = Aᵀ·F·A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_A = _dct_basis()


# ------------------------------------------------------- bit-level IO


class _BitWriter:
    """MSB-first bit accumulator with JPEG byte stuffing (a 0xFF data
    byte is followed by 0x00 so it can never read as a marker)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.put(0xFF, 8 - self.nbits)  # pad with 1s (spec F.1.2.3)
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment: un-stuffs
    FF00, stops AT any real marker (the caller resumes segment-level
    parsing there)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            raise ValueError("JPEG entropy data truncated")
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1] if self.pos + 1 < len(self.buf) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed data byte
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside entropy data "
                    "(restart intervals are out of scope)"
                    if nxt is not None
                    else "JPEG entropy data truncated at 0xFF"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        b = (self.acc >> self.nbits) & 1
        # keep only the live low bits: without this mask the
        # accumulator grows by 8 bits per byte for the whole entropy
        # segment, making every shift a progressively larger bignum —
        # quadratic decode time on non-tiny scans
        self.acc &= (1 << self.nbits) - 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def marker_pos(self) -> int:
        """Byte position of the next segment (discarding pad bits)."""
        return self.pos


# --------------------------------------------------- canonical huffman


def _canonical_codes(bits: list[int], values: list[int]) -> dict:
    """(code, length) per symbol from a DHT's BITS/HUFFVAL — the
    canonical assignment of T.81 Annex C: codes of each length are
    consecutive, starting from (previous + 1) << 1."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[values[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Length-indexed canonical decode (T.81 F.2.2.3): for each code
    length keep [min_code, max_code] and the index of the first value;
    reading proceeds bit by bit — at most 16 iterations per symbol."""

    def __init__(self, bits: list[int], values: list[int]):
        self.values = values
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.max_code[ln] = code - 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | r.bit()
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                if code >= self.min_code[ln]:
                    return self.values[
                        self.val_ptr[ln] + code - self.min_code[ln]
                    ]
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    """T.81 F.12: a ``size``-bit amplitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _size_cat(v: int) -> int:
    """Amplitude size category: minimal bits to hold |v|."""
    return int(v).bit_length() if v else 0


def _amp_bits(v: int, size: int) -> int:
    """Encoder inverse of ``_extend``."""
    return v if v >= 0 else v + (1 << size) - 1


# -------------------------------------------------------------- encoder


def _build_table(symbols: set[int]) -> tuple[list[int], list[int]]:
    """A valid Huffman table covering exactly ``symbols``: every code
    gets the same length L = ceil(log2(n+1)) — same-length codes are
    prefix-free by construction, and the +1 keeps the all-ones code
    unassigned (T.81 reserves it as a prefix of the impossible
    code).  Compression is deliberately not the goal; DHT-walk
    generality in the decoder is."""
    vals = sorted(symbols)
    ln = max(1, (len(vals) + 1 - 1).bit_length())
    if len(vals) + 1 > (1 << ln):
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = len(vals)
    return bits, vals


def _encode_block_syms(coeffs_zz: np.ndarray, prev_dc: int):
    """One quantized block (zigzag order) → (dc_sym, dc_amp), list of
    (ac_sym, ac_amp, ac_size), new prev_dc."""
    dc = int(coeffs_zz[0])
    diff = dc - prev_dc
    dsize = _size_cat(diff)
    acs = []
    run = 0
    nz = np.nonzero(coeffs_zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(coeffs_zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            acs.append((0xF0, 0, 0))  # ZRL: 16 zeros
            run -= 16
        s = _size_cat(v)
        acs.append(((run << 4) | s, _amp_bits(v, s), s))
        run = 0
    if last < 63:
        acs.append((0x00, 0, 0))  # EOB
    return (dsize, _amp_bits(diff, dsize)), acs, dc


def _dqt_segment(qt: np.ndarray, tid: int) -> bytes:
    body = bytes([tid]) + bytes(
        int(qt.reshape(64)[ZIGZAG][i]) for i in range(64)
    )
    return b"\xff\xdb" + (len(body) + 2).to_bytes(2, "big") + body


def _dht_segment(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + (len(body) + 2).to_bytes(2, "big") + body


def encode_jpeg(planes: list[np.ndarray], quant: np.ndarray | None = None) -> bytes:
    """A valid baseline-sequential JFIF stream from 1 (grayscale) or 3
    (YCbCr, 4:4:4) uint8 planes of equal (h, w).  One quant table
    (default all-ones — lossless-after-rounding for smooth content,
    bit-exact for constant blocks), canonical Huffman tables built
    from the emitted symbol sets, no subsampling, no restarts."""
    if len(planes) not in (1, 3):
        raise ValueError("encode_jpeg takes 1 or 3 planes")
    h, w = planes[0].shape
    if any(p.shape != (h, w) for p in planes):
        raise ValueError("all planes must share one shape")
    qt = np.ones((8, 8), dtype=np.int64) if quant is None else quant
    bh, bw = -(-h // 8), -(-w // 8)

    # forward DCT + quantize every block of every plane
    blocks_per_plane = []
    for p in planes:
        padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
        padded[:h, :w] = p.astype(np.float64)
        padded[h:, :w] = padded[h - 1 : h, :w]  # edge-replicate pad
        padded[:, w:] = padded[:, w - 1 : w]
        shifted = padded - 128.0
        blocks = []
        for by in range(bh):
            for bx in range(bw):
                s = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                f = _A @ s @ _A.T
                q = np.rint(f / qt).astype(np.int64)
                blocks.append(q.reshape(64)[ZIGZAG])
        blocks_per_plane.append(blocks)

    # symbol census → canonical tables (separate DC/AC, shared by all
    # components — ids 0/0, legal for baseline)
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    for blocks in blocks_per_plane:
        prev = 0
        for zz in blocks:
            (dsize, _), acs, prev = _encode_block_syms(zz, prev)
            dc_syms.add(dsize)
            ac_syms.update(sym for sym, _, _ in acs)
    dc_bits, dc_vals = _build_table(dc_syms)
    ac_bits, ac_vals = _build_table(ac_syms)
    dc_codes = _canonical_codes(dc_bits, dc_vals)
    ac_codes = _canonical_codes(ac_bits, ac_vals)

    # entropy-coded segment: MCU = one block per component (4:4:4)
    wtr = _BitWriter()
    prev_dc = [0] * len(planes)
    for mcu in range(bh * bw):
        for ci, blocks in enumerate(blocks_per_plane):
            (dsize, damp), acs, prev_dc[ci] = _encode_block_syms(
                blocks[mcu], prev_dc[ci]
            )
            code, ln = dc_codes[dsize]
            wtr.put(code, ln)
            wtr.put(damp, dsize)
            for sym, amp, size in acs:
                code, ln = ac_codes[sym]
                wtr.put(code, ln)
                wtr.put(amp, size)

    ncomp = len(planes)
    sof_comps = b"".join(
        bytes([i + 1, 0x11, 0]) for i in range(ncomp)  # 1×1 sampling, qt 0
    )
    sof = (
        b"\xff\xc0"
        + (8 + 3 * ncomp).to_bytes(2, "big")
        + bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([ncomp])
        + sof_comps
    )
    sos_comps = b"".join(bytes([i + 1, 0x00]) for i in range(ncomp))
    sos = (
        b"\xff\xda"
        + (6 + 2 * ncomp).to_bytes(2, "big")
        + bytes([ncomp])
        + sos_comps
        + bytes([0, 63, 0])  # full spectral selection, no approximation
    )
    app0 = (
        b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00"
        + bytes([1, 1, 0]) + (1).to_bytes(2, "big") + (1).to_bytes(2, "big")
        + bytes([0, 0])
    )
    return (
        b"\xff\xd8"
        + app0
        + _dqt_segment(qt, 0)
        + sof
        + _dht_segment(0, 0, dc_bits, dc_vals)
        + _dht_segment(1, 0, ac_bits, ac_vals)
        + sos
        + wtr.flush()
        + b"\xff\xd9"
    )


def encode_jpeg_rgb(rgb: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → baseline 4:4:4 color JPEG via the JFIF
    YCbCr forward transform (rounded to uint8 planes)."""
    r = rgb[:, :, 0].astype(np.float64)
    g = rgb[:, :, 1].astype(np.float64)
    b = rgb[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    planes = [
        np.clip(np.rint(p), 0, 255).astype(np.uint8) for p in (y, cb, cr)
    ]
    return encode_jpeg(planes)


# -------------------------------------------------------------- decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential JFIF decode → uint8 (h, w) grayscale or
    (h, w, 3) RGB.  Every unsupported shape (progressive SOF2, 12-bit
    precision, subsampling, arithmetic coding, restarts) raises with
    the feature named — never a silently wrong image."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (h, w, [(comp_id, qt_id)])
    rgb_out = None

    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        seg_len = int.from_bytes(payload[pos : pos + 2], "big")
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(
                    seg[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qt = np.zeros(64, dtype=np.int64)
                qt[ZIGZAG] = zz
                qtables[tq] = qt.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                huff[(cls, tid)] = _HuffDecoder(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0: baseline sequential
            prec = seg[0]
            if prec != 8:
                raise ValueError(f"{prec}-bit precision unsupported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG unsupported")
            comps = []
            for c in range(ncomp):
                cid, samp, qid = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only); "
                        f"component {cid} has sampling 0x{samp:02X}"
                    )
                comps.append((cid, qid))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF marker 0xFF{marker:02X} unsupported (baseline "
                "sequential SOF0 only — progressive/lossless/arithmetic "
                "out of scope)"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) unsupported")
        elif marker == 0xDA:  # SOS → entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            h, w, comps = frame
            ns = seg[0]
            tsel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                tsel[cid] = (tt >> 4, tt & 0xF)
            rdr = _BitReader(payload, pos + seg_len)
            bh, bw = -(-h // 8), -(-w // 8)
            planes = [
                np.empty((bh * 8, bw * 8), dtype=np.uint8) for _ in comps
            ]
            prev_dc = [0] * len(comps)
            for by in range(bh):
                for bx in range(bw):
                    for ci, (cid, qid) in enumerate(comps):
                        dc_t = huff[(0, tsel[cid][0])]
                        ac_t = huff[(1, tsel[cid][1])]
                        zz = np.zeros(64, dtype=np.int64)
                        size = dc_t.decode(rdr)
                        prev_dc[ci] += _extend(rdr.bits(size), size)
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            sym = ac_t.decode(rdr)
                            if sym == 0x00:  # EOB
                                break
                            run, s = sym >> 4, sym & 0xF
                            if s == 0:
                                if run != 15:
                                    raise ValueError(
                                        f"bad AC symbol 0x{sym:02X}"
                                    )
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(rdr.bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.int64)
                        coef[ZIGZAG] = zz
                        f = coef.reshape(8, 8) * qtables[qid]
                        s8 = _A.T @ f.astype(np.float64) @ _A
                        planes[ci][
                            by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                        ] = np.clip(np.rint(s8 + 128.0), 0, 255).astype(
                            np.uint8
                        )
            planes = [p[:h, :w] for p in planes]
            if len(planes) == 1:
                rgb_out = planes[0]
            else:
                y = planes[0].astype(np.float64)
                cb = planes[1].astype(np.float64) - 128.0
                cr = planes[2].astype(np.float64) - 128.0
                r = y + 1.402 * cr
                g = y - 0.344136 * cb - 0.714136 * cr
                b = y + 1.772 * cb
                rgb_out = np.stack(
                    [
                        np.clip(np.rint(ch), 0, 255).astype(np.uint8)
                        for ch in (r, g, b)
                    ],
                    axis=2,
                )
            pos = rdr.marker_pos()
            continue
        pos += seg_len
    if rgb_out is None:
        raise ValueError("JPEG stream has no scan")
    return rgb_out
