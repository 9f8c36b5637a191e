"""Minimal pure-Python FLAC *encoder*, used only as a test oracle for the
native C++ decoder (native/audioload.cpp). FLAC is lossless, so an
encode->decode roundtrip must reproduce the input bit-exactly; by generating
streams that exercise every subframe type (constant / verbatim / fixed /
LPC), rice + rice2 residual coding incl. escape partitions, wasted bits, and
all stereo decorrelation modes, the decoder is validated against the format
spec without any third-party codec in the image.

This is NOT a production encoder — no codec heuristics, no seektable.
"""
from __future__ import annotations

import numpy as np

__all__ = ["write_flac"]


class BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):  # MSB-first
        if n == 0:
            return
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_signed(self, v: int, n: int):
        self.write(v & ((1 << n) - 1), n)

    def write_unary(self, q: int):
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned"
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    nbytes = 2
    while bits > 6 * (nbytes - 1) + (7 - nbytes) and nbytes < 7:
        nbytes += 1
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    shift = 6 * (nbytes - 1)
    out.append(lead_mask | (n >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


_FIXED_COEFS = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _rice_param_for(res) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.mean(np.abs(np.asarray(res, dtype=np.float64)))) + 1.0
    return int(max(0, min(14, int(np.ceil(np.log2(mean))))))


def _write_residual(bw: BitWriter, res, *, force_escape=False, rice2=False,
                    porder: int = 0, blocksize: int = 0, order: int = 0):
    method = 1 if rice2 else 0
    plen = 5 if rice2 else 4
    escape = 0x1F if rice2 else 0xF
    bw.write(method, 2)
    bw.write(porder, 4)
    partitions = 1 << porder
    part_samples = blocksize >> porder
    idx = 0
    for p in range(partitions):
        count = part_samples - (order if p == 0 else 0)
        chunk = res[idx: idx + count]
        idx += count
        if force_escape:
            rawbits = int(max((int(v).bit_length() + 1 for v in chunk), default=1))
            rawbits = min(rawbits, 31)
            bw.write(escape, plen)
            bw.write(rawbits, 5)
            for v in chunk:
                bw.write_signed(int(v), rawbits)
        else:
            param = _rice_param_for(chunk)
            bw.write(param, plen)
            for v in chunk:
                v = int(v)
                u = (v << 1) if v >= 0 else ((-v) << 1) - 1
                bw.write_unary(u >> param)
                bw.write(u & ((1 << param) - 1), param)
    assert idx == len(res)


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, kind: str, *,
                    wasted: int = 0, force_escape=False, rice2=False,
                    porder: int = 0, lpc_order: int = 2):
    n = len(x)
    x = np.asarray(x, dtype=np.int64)
    if wasted:
        assert np.all(x % (1 << wasted) == 0), "wasted-bit samples must be multiples"
        x = x >> wasted
    ebps = bps - wasted

    bw.write(0, 1)  # pad
    if kind == "constant":
        assert np.all(x == x[0])
        bw.write(0b000000, 6)
        _write_wasted(bw, wasted)
        bw.write_signed(int(x[0]), ebps)
    elif kind == "verbatim":
        bw.write(0b000001, 6)
        _write_wasted(bw, wasted)
        for v in x:
            bw.write_signed(int(v), ebps)
    elif kind == "fixed":
        best, best_res = None, None
        for order in range(0, min(5, n + 1)):
            res = x.copy()
            for _ in range(order):
                res = np.diff(res)
            cost = np.sum(np.abs(res))
            if best is None or cost < best[1]:
                best, best_res = (order, cost), res
        order = best[0]
        bw.write(0b001000 | order, 6)
        _write_wasted(bw, wasted)
        for v in x[:order]:
            bw.write_signed(int(v), ebps)
        _write_residual(bw, list(best_res), force_escape=force_escape,
                        rice2=rice2, porder=porder, blocksize=n, order=order)
    elif kind == "lpc":
        order = lpc_order
        assert n > order
        # arbitrary-but-valid quantized predictor; the decoder must
        # reconstruct exactly from (coefs, shift, residual)
        coefs = [13, -7, 2, -1][:order]
        precision = 5
        shift = 3
        preds = np.zeros(n - order, dtype=np.int64)
        for i in range(order, n):
            acc = 0
            for j in range(order):
                acc += coefs[j] * int(x[i - 1 - j])
            preds[i - order] = acc >> shift
        res = x[order:] - preds
        bw.write(0b100000 | (order - 1), 6)
        _write_wasted(bw, wasted)
        for v in x[:order]:
            bw.write_signed(int(v), ebps)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        _write_residual(bw, list(res), force_escape=force_escape, rice2=rice2,
                        porder=porder, blocksize=n, order=order)
    else:
        raise ValueError(kind)


def _write_wasted(bw: BitWriter, wasted: int):
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


_BPS_CODE = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def write_flac(path, samples, sample_rate: int, *, bps: int = 16,
               blocksize: int = 1152, subframe: str = "fixed",
               stereo_mode: str = "independent", wasted: int = 0,
               force_escape: bool = False, rice2: bool = False,
               porder: int = 0, lpc_order: int = 2):
    """samples: int array (T,) or (C, T) with values in [-2^(bps-1), 2^(bps-1))."""
    samples = np.asarray(samples, dtype=np.int64)
    if samples.ndim == 1:
        samples = samples[None]
    nch, total = samples.shape
    assert nch <= 8

    bw = BitWriter()
    bw.buf += b"fLaC"
    # STREAMINFO (last metadata block)
    bw.write(0x80, 8)
    bw.write(34, 24)
    bw.write(blocksize, 16)
    bw.write(blocksize, 16)
    bw.write(0, 24)
    bw.write(0, 24)
    bw.write(sample_rate, 20)
    bw.write(nch - 1, 3)
    bw.write(bps - 1, 5)
    bw.write(total & ((1 << 36) - 1), 36)
    for _ in range(16):
        bw.write(0, 8)

    frame_idx = 0
    pos = 0
    while pos < total:
        n = min(blocksize, total - pos)
        block = samples[:, pos: pos + n]
        hdr = BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed-blocksize strategy
        hdr.write(7, 4)  # blocksize: 16-bit field follows
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        if stereo_mode == "independent" or nch != 2:
            ch_asgn = nch - 1
        else:
            ch_asgn = {"left_side": 8, "right_side": 9, "mid_side": 10}[stereo_mode]
        hdr.write(ch_asgn, 4)
        hdr.write(_BPS_CODE.get(bps, 0), 3)
        hdr.write(0, 1)  # reserved
        for b in _utf8_number(frame_idx):
            hdr.write(b, 8)
        hdr.write(n - 1, 16)
        header_bytes = hdr.getvalue()
        frame = BitWriter()
        frame.buf += header_bytes
        frame.write(_crc8(header_bytes), 8)

        if ch_asgn < 8:
            subs = [(block[c], bps) for c in range(nch)]
        else:
            left, right = block[0], block[1]
            side = left - right
            if ch_asgn == 8:
                subs = [(left, bps), (side, bps + 1)]
            elif ch_asgn == 9:
                subs = [(side, bps + 1), (right, bps)]
            else:
                mid = (left + right) >> 1
                subs = [(mid, bps), (side, bps + 1)]
        for x, sub_bps in subs:
            kind = subframe
            if kind == "constant" and not np.all(x == x[0]):
                kind = "verbatim"
            _write_subframe(frame, x, sub_bps, kind, wasted=wasted,
                            force_escape=force_escape, rice2=rice2,
                            porder=porder, lpc_order=lpc_order)
        frame.align()
        body = frame.getvalue()
        frame.write(_crc16(body), 16)
        bw.buf += frame.getvalue()
        pos += n
        frame_idx += 1

    with open(path, "wb") as f:
        f.write(bw.getvalue())
