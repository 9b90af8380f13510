"""PNG palette (PLTE/tRNS, 1/2/4/8-bit) + Adam7 de-interlace (r10
verdict item 7). Fixtures are built chunk-by-chunk in the test with an
INDEPENDENT pass/packing constructor (not the package's encode_png),
and the expected rasters are hand-computed."""

from __future__ import annotations

import struct
import zlib

import pytest

from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
    MediaFormatError,
    decode_png,
)

SIG = b"\x89PNG\r\n\x1a\n"
ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _png(w, h, depth, color, interlace, idat_raw, plte=b"", trns=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    out = SIG + _chunk(b"IHDR", ihdr)
    if plte:
        out += _chunk(b"PLTE", plte)
    if trns:
        out += _chunk(b"tRNS", trns)
    return out + _chunk(b"IDAT", zlib.compress(idat_raw)) + _chunk(b"IEND", b"")


def _pack_indexes(indexes, depth):
    """MSB-first bit packing of one row of palette indexes."""
    stride = (len(indexes) * depth + 7) // 8
    row = bytearray(stride)
    for i, idx in enumerate(indexes):
        bit = i * depth
        row[bit >> 3] |= idx << (8 - depth - (bit & 7))
    return bytes(row)


PAL = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red, green, blue


def test_palette8_with_filters_hand_computed():
    # 2x2, indexes [[0,1],[2,0]]; row0 Sub-filtered, row1 Up-filtered
    raw = bytes([1, 0, 1]) + bytes([2, 2, 255])
    w, h, ch, px = decode_png(_png(2, 2, 8, 3, 0, raw, plte=PAL))
    assert (w, h, ch) == (2, 2, 3)
    assert px == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 0, 0])


def test_palette2_bit_packing_with_padding():
    # 5 pixels at 2 bits: indexes [0,1,2,1,0] -> bytes 0b00_01_10_01,
    # 0b00_000000 (3 padding positions + pad bits)
    raw = bytes([0, 0b00011001, 0b00000000])
    w, h, ch, px = decode_png(_png(5, 1, 2, 3, 0, raw, plte=PAL))
    assert (w, h, ch) == (5, 1, 3)
    assert px == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 0, 255, 0, 0]
    )


def test_palette1_bit():
    # 10x1 at 1 bit: pattern 1010101010 -> 0b10101010, 0b10_000000
    raw = bytes([0, 0b10101010, 0b10000000])
    w, h, ch, px = decode_png(
        _png(10, 1, 1, 3, 0, raw, plte=PAL[:6])
    )
    assert (w, h, ch) == (10, 1, 3)
    want = (bytes([0, 255, 0]) + bytes([255, 0, 0])) * 5
    assert px == want


def test_trns_alpha_expands_to_rgba():
    # alpha only for index 0 (64); indexes 1/2 default to opaque
    raw = bytes([0, 0, 1, 2])
    w, h, ch, px = decode_png(
        _png(3, 1, 8, 3, 0, raw, plte=PAL, trns=bytes([64]))
    )
    assert (w, h, ch) == (3, 1, 4)
    assert px == bytes(
        [255, 0, 0, 64, 0, 255, 0, 255, 0, 0, 255, 255]
    )


def _adam7_truecolor_idat(raster, w, h, ch):
    """Independent Adam7 constructor: filter-0 rows per pass."""
    out = bytearray()
    for x0, y0, dx, dy in ADAM7:
        wp = max(0, (w - x0 + dx - 1) // dx)
        hp = max(0, (h - y0 + dy - 1) // dy)
        if not wp or not hp:
            continue
        for r in range(hp):
            out.append(0)
            py = y0 + r * dy
            for i in range(wp):
                px = x0 + i * dx
                out += raster[(py * w + px) * ch : (py * w + px) * ch + ch]
    return bytes(out)


@pytest.mark.parametrize("w,h", [(8, 8), (5, 3), (1, 1), (2, 9), (16, 16)])
def test_adam7_truecolor_roundtrip(w, h):
    raster = bytes((i * 7 + 3) % 256 for i in range(w * h * 3))
    idat = _adam7_truecolor_idat(raster, w, h, 3)
    ww, hh, ch, px = decode_png(_png(w, h, 8, 2, 1, idat))
    assert (ww, hh, ch) == (w, h, 3)
    assert px == raster


def test_adam7_gray_with_sub_filter_in_pass():
    # 8x8 gray gradient; pass 7 rows (width 8) get a Sub filter to
    # prove per-pass filtering is independent of other passes
    w = h = 8
    raster = bytes(r * 16 + c for r in range(h) for c in range(w))
    out = bytearray()
    for x0, y0, dx, dy in ADAM7:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        for r in range(hp):
            py = y0 + r * dy
            vals = [raster[py * w + x0 + i * dx] for i in range(wp)]
            if (x0, y0, dx, dy) == (0, 1, 1, 2):
                out.append(1)  # Sub
                prev = 0
                for v in vals:
                    out.append((v - prev) & 0xFF)
                    prev = v
            else:
                out.append(0)
                out += bytes(vals)
    ww, hh, ch, px = decode_png(_png(w, h, 8, 0, 1, bytes(out)))
    assert (ww, hh, ch) == (8, 8, 1)
    assert px == raster


def test_adam7_palette4_combined():
    # 5x3 indexes at 4-bit depth through the interlace
    w, h = 5, 3
    idx = [(r * 5 + c) % 3 for r in range(h) for c in range(w)]
    out = bytearray()
    for x0, y0, dx, dy in ADAM7:
        wp = max(0, (w - x0 + dx - 1) // dx)
        hp = max(0, (h - y0 + dy - 1) // dy)
        if not wp or not hp:
            continue
        for r in range(hp):
            py = y0 + r * dy
            vals = [idx[py * w + x0 + i * dx] for i in range(wp)]
            out.append(0)
            out += _pack_indexes(vals, 4)
    ww, hh, ch, px = decode_png(_png(w, h, 4, 3, 1, bytes(out), plte=PAL))
    assert (ww, hh, ch) == (5, 3, 3)
    want = b"".join(PAL[i * 3 : i * 3 + 3] for i in idx)
    assert px == want


def test_refusals_stay_loud():
    with pytest.raises(MediaFormatError, match="only 8-bit"):
        decode_png(_png(1, 1, 16, 2, 0, bytes([0, 1, 2, 3, 4, 5, 6])))
    with pytest.raises(MediaFormatError, match="alpha-gray"):
        decode_png(_png(1, 1, 8, 4, 0, bytes([0, 1, 2])))
    with pytest.raises(MediaFormatError, match="PLTE"):
        decode_png(_png(1, 1, 8, 3, 0, bytes([0, 0])))
    with pytest.raises(MediaFormatError, match="outside PLTE"):
        decode_png(_png(1, 1, 8, 3, 0, bytes([0, 9]), plte=PAL))
    with pytest.raises(MediaFormatError, match="invalid palette"):
        decode_png(_png(1, 1, 16, 3, 0, bytes([0, 0]), plte=PAL))


def test_decode_media_dispatches_palette_png():
    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        decode_media,
    )

    raw = bytes([0, 0, 1, 2])
    meta = decode_media(_png(3, 1, 8, 3, 0, raw, plte=PAL))
    assert meta[:3] == (3, 1, 3)
