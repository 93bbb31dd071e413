"""Baseline sequential JPEG decoder — pure python/numpy, no external libs.

Supports the common web-JPEG shape: baseline DCT (SOF0), Huffman coding,
8-bit samples, grayscale or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 chroma
subsampling, restart markers. Progressive (SOF2), arithmetic coding and
12-bit raise NotImplementedError.

Decode pipeline (ITU-T T.81): entropy-decode MCU blocks -> dequantize ->
level-shifted 2-D IDCT (separable, float64) -> nearest-neighbor chroma
upsample -> YCbCr->RGB (JFIF full-range matrix).

Exactness: the spec allows IDCT implementations to differ by small integer
amounts; parity with libjpeg-backed decoders (javax.imageio differential
test in tests/test_ops.py) is asserted within a +/-2 per-sample tolerance,
the conventional conformance bound.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# separable IDCT basis: B[u, x] = C(u)/2 * cos((2x+1) u pi / 16)
_IDCT_B = np.array([
    [(np.sqrt(0.5) if u == 0 else 1.0) / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
])


def _idct2(block: np.ndarray) -> np.ndarray:
    """8x8 frequency block -> spatial (float)."""
    return _IDCT_B.T @ block @ _IDCT_B


class _HuffTable:
    """Canonical JPEG Huffman table with a flat (code-length, code) lookup."""

    def __init__(self, counts: list[int], symbols: bytes) -> None:
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing
    and restart-marker awareness."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller via sync()
                    break
                else:  # EOI or other marker: pad with zero bits (spec behavior)
                    b = 0
                    self.pos = len(self.data)
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 0
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker, reset bit state."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _upsample2(p: np.ndarray, axis: int) -> np.ndarray:
    """2x triangular upsample along one axis (libjpeg "fancy" filter):
    out[2i] = (3*p[i] + p[i-1]) / 4, out[2i+1] = (3*p[i] + p[i+1]) / 4,
    edges clamped. Operates on float planes; rounding happens once at the
    final RGB conversion."""
    if axis == 1:
        return _upsample2(p.T, axis=0).T
    prev = np.vstack([p[:1], p[:-1]])
    nxt = np.vstack([p[1:], p[-1:]])
    out = np.empty((p.shape[0] * 2, p.shape[1]), dtype=p.dtype)
    out[0::2] = (3.0 * p + prev) / 4.0
    out[1::2] = (3.0 * p + nxt) / 4.0
    return out


def _extend(v: int, n: int) -> int:
    """T.81 F.2.2.1 sign extension of an n-bit magnitude."""
    return v - (1 << n) + 1 if n and v < (1 << (n - 1)) else v


def decode_jpeg(blob: bytes) -> np.ndarray:
    """JPEG bytes -> (h, w, 3) RGB or (h, w, 1) grayscale uint8."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG blob")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", blob, pos)[0]
        seg = blob[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qt[tid] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0xF
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                syms = seg[p + 17 : p + 17 + n]
                (huff_dc if cls == 0 else huff_ac)[tid] = _HuffTable(counts, syms)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("12-bit JPEG")
            comps = []
            for i in range(nc):
                cid, samp, qtid = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "hs": samp >> 4, "vs": samp & 0xF, "qt": qtid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cid, tids = struct.unpack_from(">BB", seg, 1 + 2 * i)
                scomps.append({"id": cid, "dc": tids >> 4, "ac": tids & 0xF})
            scan = (scomps, blob[pos + seg_len :])
            break
        pos += seg_len
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")

    scomps, ecs = scan
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for sc in scomps:
        by_id[sc["id"]].update(sc)
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (frame["w"] + 8 * hmax - 1) // (8 * hmax)
    mcuy = (frame["h"] + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["vs"] * 8, mcux * c["hs"] * 8)) for c in comps
    }
    reader = _BitReader(ecs)
    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = {c["id"]: 0 for c in comps}
            for c in comps:
                dct = huff_dc[c["dc"]]
                act = huff_ac[c["ac"]]
                q = qt[c["qt"]]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        coeffs = np.zeros(64, dtype=np.int32)
                        t = reader.decode_huff(dct)
                        diff = _extend(reader.receive(t), t)
                        pred[c["id"]] += diff
                        coeffs[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(act)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                break
                            coeffs[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.int32)
                        block[ZIGZAG] = coeffs
                        spatial = _idct2(block.reshape(8, 8) * q) + 128.0
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1

    h, w = frame["h"], frame["w"]
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        # triangular ("fancy") upsampling, matching libjpeg's default filter
        # for the standard 2:1 ratios; other ratios fall back to replication
        while ry > 1 or rx > 1:
            if ry % 2 == 0:
                p = _upsample2(p, axis=0)
                ry //= 2
            elif ry > 1:
                p = np.repeat(p, ry, axis=0)
                ry = 1
            if rx % 2 == 0:
                p = _upsample2(p, axis=1)
                rx //= 2
            elif rx > 1:
                p = np.repeat(p, rx, axis=1)
                rx = 1
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        y = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
