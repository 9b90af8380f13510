"""Pure-Python BMP / netpbm codec: hand-verifiable byte-level cases
plus encode->decode round-trip properties. The conformance query
``multimodal_real_decode`` proves the round trip at corpus scale; these
tests pin the FORMAT details against independently constructed bytes
(spec-derived, not produced by our own encoder) so encoder and decoder
can't be wrong in the same way."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
    MediaFormatError,
    decode_bmp,
    decode_media,
    decode_ppm,
    encode_bmp,
    encode_ppm,
)


def _bmp_bytes(width, height, rows_bottom_up_bgr, bpp=24, compression=0):
    """Spec-constructed BMP: 14-byte file header + 40-byte info header
    + caller-supplied padded rows (bottom-up, BGR)."""
    body = b"".join(rows_bottom_up_bgr)
    offset = 54
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bpp, compression,
        len(body), 2835, 2835, 0, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", offset + len(body), 0, 0, offset)
    return head + info + body


def test_bmp_decode_known_pixels_with_padding():
    """3x2 image, row stride 9 -> padded to 12. Raster-order RGB:
    row0 = R,G,B pure pixels; row1 = white, black, mid-gray.
    BMP stores row1 FIRST (bottom-up) and channels as BGR."""
    row_top = b"".join(
        bytes(p) for p in [(0, 0, 255), (0, 255, 0), (255, 0, 0)]
    ) + b"\x00\x00\x00"  # BGR of red,green,blue + 3 pad bytes
    row_bottom = b"".join(
        bytes(p) for p in [(255, 255, 255), (0, 0, 0), (128, 128, 128)]
    ) + b"\x00\x00\x00"
    data = _bmp_bytes(3, 2, [row_bottom, row_top])
    w, h, ch, px = decode_bmp(data)
    assert (w, h, ch) == (3, 2, 3)
    assert px == bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255,        # row 0: R G B
         255, 255, 255, 0, 0, 0, 128, 128, 128]  # row 1
    )


def test_bmp_decode_top_down_negative_height():
    """Negative height = top-down row order (no flip)."""
    row0 = bytes([3, 2, 1]) + b"\x00"  # 1px wide: BGR=3,2,1 + 1 pad byte
    row1 = bytes([6, 5, 4]) + b"\x00"
    data = _bmp_bytes(1, -2, [row0, row1])
    w, h, ch, px = decode_bmp(data)
    assert (w, h, ch) == (1, 2, 3)
    assert px == bytes([1, 2, 3, 4, 5, 6])


def test_bmp_rejects_unsupported():
    row = bytes([0, 0, 0, 0])
    with pytest.raises(MediaFormatError, match="24bpp"):
        decode_bmp(_bmp_bytes(1, 1, [row], bpp=8))
    with pytest.raises(MediaFormatError, match="24bpp"):
        decode_bmp(_bmp_bytes(1, 1, [row], compression=1))
    with pytest.raises(MediaFormatError, match="not a BMP"):
        decode_bmp(b"XX" + bytes(60))
    with pytest.raises(MediaFormatError, match="truncated"):
        decode_bmp(_bmp_bytes(4, 4, [bytes(12)]))  # body too short


def test_ppm_decode_header_comments_and_p5():
    raster = bytes(range(12))
    data = b"P6 # comment\n# another\n 2\n2 # w h\n255\n" + raster
    w, h, ch, px = decode_ppm(data)
    assert (w, h, ch, px) == (2, 2, 3, raster)
    gray = bytes([9, 8, 7, 6])
    w, h, ch, px = decode_ppm(b"P5\n2 2\n255\n" + gray)
    assert (w, h, ch, px) == (2, 2, 1, gray)


def test_ppm_rejects_malformed():
    with pytest.raises(MediaFormatError, match="16-bit"):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))
    with pytest.raises(MediaFormatError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n" + bytes(5))
    with pytest.raises(MediaFormatError, match="not a binary"):
        decode_ppm(b"P3\n1 1\n255\n0 0 0")  # ASCII variant unsupported


def test_decode_media_dispatch():
    px = bytes(range(27))
    w, h, ch, out = decode_media(encode_bmp(px, 3, 3))
    assert (w, h, ch, out) == (3, 3, 3, px)
    w, h, ch, out = decode_media(encode_ppm(px, 3, 3))
    assert (w, h, ch, out) == (3, 3, 3, px)
    with pytest.raises(MediaFormatError, match="magic"):
        decode_media(b"\xff\xd8\xff\xe0jpegish")


def test_real_decode_uses_pure_python_path():
    """real_decode must succeed WITHOUT PIL for BMP/netpbm payloads
    (the r7 'weak' finding), and still raise NotImplementedError for
    formats only PIL could handle."""
    from duckdb_extension_clickhouse_native_spark.functions.multimodal import (
        _pil,
        real_decode,
    )

    px = bytes([10, 20, 30] * 4)
    out = real_decode(encode_bmp(px, 2, 2))
    assert out["width"] == 2 and out["height"] == 2 and out["channels"] == 3
    assert out["mean_pixel"] == pytest.approx(sum(px) / len(px))
    if _pil() is None:
        with pytest.raises(NotImplementedError):
            real_decode(b"\x89PNG\r\n\x1a\n" + bytes(64))


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.binary(min_size=1, max_size=16),
)
@settings(deadline=None, max_examples=60)
def test_bmp_round_trip(width, height, seed):
    px = bytes(seed[i % len(seed)] for i in range(width * height * 3))
    assert decode_bmp(encode_bmp(px, width, height)) == (width, height, 3, px)


@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.binary(min_size=1, max_size=16),
)
@settings(deadline=None, max_examples=60)
def test_ppm_round_trip(width, height, seed):
    px = bytes(seed[i % len(seed)] for i in range(width * height * 3))
    assert decode_ppm(encode_ppm(px, width, height)) == (width, height, 3, px)


# -- PNG --------------------------------------------------------------------


def test_png_roundtrip_rgb_and_gray_and_rgba():
    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        decode_media,
        decode_png,
        encode_png,
    )

    for ch in (1, 3, 4):
        px = bytes((i * 37 + ch) % 256 for i in range(5 * 4 * ch))
        data = encode_png(px, 5, 4, channels=ch)
        w, h, c, raster = decode_png(data)
        assert (w, h, c, raster) == (5, 4, ch, px)
        # dispatch recognizes the signature
        assert decode_media(data) == (5, 4, ch, px)


def test_png_all_filter_types_hand_built():
    """Hand-build one IDAT with each filter type (the encoder only
    emits filter 0) and check against an independently-computed
    expected raster: Sub/Up/Average/Paeth reconstruction by hand."""
    import struct
    import zlib

    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        decode_png,
    )

    # 3x4 grayscale, one row per filter type 0..3 then verify Paeth
    # on a 2x2 RGB separately
    rows_raw = [
        (0, bytes([10, 20, 30])),  # none -> 10,20,30
        (1, bytes([5, 5, 5])),  # sub -> 5,10,15
        (2, bytes([1, 2, 3])),  # up (prev 5,10,15) -> 6,12,18
        (3, bytes([4, 4, 4])),  # average: left/prev mix
    ]
    # average row: prev = 6,12,18; out[0] = 4 + ((0+6)>>1) = 7;
    # out[1] = 4 + ((7+12)>>1) = 13; out[2] = 4 + ((13+18)>>1) = 19
    expected = bytes([10, 20, 30, 5, 10, 15, 6, 12, 18, 7, 13, 19])

    def chunk(ctype, body):
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 3, 4, 8, 0, 0, 0, 0)
    raster = b"".join(bytes([f]) + b for f, b in rows_raw)
    data = sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raster)) + chunk(b"IEND", b"")
    w, h, c, out = decode_png(data)
    assert (w, h, c) == (3, 4, 1)
    assert out == expected

    # Paeth on 2x1 RGB second row: prev row known, left/up-left exercise
    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    raster2 = bytes([0]) + bytes([10, 20, 30, 40, 50, 60]) + bytes([4]) + bytes([1, 1, 1, 1, 1, 1])
    data2 = sig + chunk(b"IHDR", ihdr2) + chunk(b"IDAT", zlib.compress(raster2)) + chunk(b"IEND", b"")
    w2, h2, c2, out2 = decode_png(data2)
    # row2 paeth: first pixel: left=0, up=(10,20,30), upleft=0 ->
    # paeth predicts up -> 11,21,31; second pixel: left=(11,21,31),
    # up=(40,50,60), upleft=(10,20,30): p=a+b-c per byte ->
    # 41,51,61; |p-a|=30 |p-b|=1 |p-c|=31 -> b wins -> 41,51,61
    assert out2 == bytes([10, 20, 30, 40, 50, 60, 11, 21, 31, 41, 51, 61])


def test_png_rejects_unsupported_variants():
    import struct
    import zlib

    import pytest

    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        MediaFormatError,
        decode_png,
        encode_png,
    )

    good = encode_png(bytes(4), 2, 2, channels=1)

    def mutate_ihdr(**kw):
        sig = good[:8]
        vals = dict(zip("whdcmfi", struct.unpack(">IIBBBBB", good[16:29])))
        vals.update(kw)
        ihdr = struct.pack(
            ">IIBBBBB",
            vals["w"], vals["h"], vals["d"], vals["c"], vals["m"],
            vals["f"], vals["i"],
        )
        crc = zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        return (
            sig + struct.pack(">I", 13) + b"IHDR" + ihdr
            + struct.pack(">I", crc) + good[33:]
        )

    with pytest.raises(MediaFormatError, match="8-bit"):
        decode_png(mutate_ihdr(d=16))
    with pytest.raises(MediaFormatError, match="color type"):
        decode_png(mutate_ihdr(c=4))  # gray+alpha stays refused
    with pytest.raises(MediaFormatError, match="PLTE"):
        decode_png(mutate_ihdr(c=3))  # palette now decodes, needs PLTE
    with pytest.raises(MediaFormatError, match="not a PNG"):
        decode_png(b"JUNKJUNKJUNK")
    # Adam7 now decodes (r11): the same gray fixture survives the
    # interlace flag because a 2x2 image stores passes 1/6/7 only —
    # full coverage in tests/test_png_palette_adam7.py
    # (this fixture's IDAT is non-interlaced, so flipping the flag
    # makes the raster short: the decoder must say so, not crash)
    with pytest.raises(MediaFormatError, match="truncated"):
        decode_png(mutate_ihdr(i=1))


# -- GIF --------------------------------------------------------------------


def test_gif_roundtrip_and_dispatch():
    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        decode_gif,
        decode_media,
        encode_gif,
    )

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2])  # 4x3
    data = encode_gif(idx, 4, 3, pal)
    w, h, c, rgb = decode_gif(data)
    assert (w, h, c) == (4, 3, 3)
    exp = b"".join(pal[i * 3 : i * 3 + 3] for i in idx)
    assert rgb == exp
    assert decode_media(data) == (4, 3, 3, exp)


def test_gif_large_image_exercises_clear_codes():
    """enough literal codes to force the encoder's CLEAR-reset path
    (and the decoder's table reset) several times."""
    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        decode_gif,
        encode_gif,
    )

    pal = bytes(range(48))  # 16 colors
    idx = bytes((i * 7) % 16 for i in range(64 * 32))
    data = encode_gif(idx, 64, 32, pal)
    w, h, c, rgb = decode_gif(data)
    assert (w, h) == (64, 32)
    assert rgb == b"".join(pal[i * 3 : i * 3 + 3] for i in idx)


def test_gif_kwkwk_corner_hand_built():
    """Hand-built LZW stream hitting the KwKwK case: codes
    CLEAR, 0, <next_code> decode to A, A, A (the referenced entry is
    the one being defined). min_code=2: clear=4, end=5, width=3."""
    import struct

    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        decode_gif,
    )

    # bitstream (LSB-first, width 3): 4 (100), 0 (000), 6 (110), 5 (101)
    # bits in order: 001 000 011 101 -> bytes: 0b01000100? compute:
    acc = 0
    nbits = 0
    out = bytearray()
    for code in (4, 0, 6, 5):
        acc |= code << nbits
        nbits += 3
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    pal = bytes([9, 9, 9, 1, 2, 3, 0, 0, 0, 0, 0, 0])
    head = b"GIF89a" + struct.pack("<HHBBB", 3, 1, 0x80 | 1, 0, 0)
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, 3, 1, 0)
    body = bytes([2, len(out)]) + bytes(out) + b"\x00"
    data = head + pal + desc + body + b"\x3b"
    w, h, c, rgb = decode_gif(data)
    assert (w, h) == (3, 1)
    assert rgb == bytes([9, 9, 9] * 3)  # A A A


def test_gif_interlaced_rows_reordered():
    """Interlace flag set: the decoder must route pass-ordered rows to
    0,8?.. for h=4 the passes hit rows 0 (pass1), 2 (pass3), 1,3
    (pass4) — build a one-color-per-row image and verify order."""
    import struct

    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        decode_gif,
        encode_gif,
    )

    pal = bytes([0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3])
    # natural (deinterlaced) rows: 0,1,2,3 with colors 0,1,2,3
    # interlace storage order for h=4: row0 (pass1), row2 (pass3),
    # row1, row3 (pass4) -> stored color order 0,2,1,3
    stored = bytes([0] * 2 + [2] * 2 + [1] * 2 + [3] * 2)
    plain = encode_gif(stored, 2, 4, pal)
    # flip the interlace bit in the image descriptor (offset: header
    # 13 + gct 12? gct = 4 colors x3 = 12 -> descriptor starts at 25;
    # flags byte at 25+9)
    buf = bytearray(plain)
    # find 0x2c (first frame) then flags byte 9 later
    j = buf.index(0x2C)
    buf[j + 9] |= 0x40
    w, h, c, rgb = decode_gif(bytes(buf))
    rows = [rgb[r * 6 : r * 6 + 3] for r in range(4)]
    assert rows == [bytes([i] * 3) for i in (0, 1, 2, 3)]


def test_gif_rejects_garbage_and_no_frame():
    import pytest

    from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
        MediaFormatError,
        decode_gif,
    )

    with pytest.raises(MediaFormatError, match="not a GIF"):
        decode_gif(b"NOPE")
    import struct

    head = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0, 0, 0) + b"\x3b"
    with pytest.raises(MediaFormatError, match="no image frame"):
        decode_gif(head)
