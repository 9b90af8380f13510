"""WAV codec: hypothesis round trips, chunk walking, malformed input."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings, strategies as st

from duckdb_extension_clickhouse_native_spark.functions.audiocodec import (
    decode_wav,
    encode_wav,
)
from duckdb_extension_clickhouse_native_spark.functions.imagecodec import (
    MediaFormatError,
)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=200),
    st.sampled_from([8000, 16000, 44100]),
    st.integers(1, 2),
)
def test_roundtrip(samples, rate, nch):
    if len(samples) % nch:
        samples = samples[: len(samples) - len(samples) % nch]
    rate2, nch2, out = decode_wav(encode_wav(samples, rate, nch))
    assert (rate2, nch2, out) == (rate, nch, samples)


def test_decoder_skips_unknown_chunks():
    """A LIST chunk between fmt and data (common in real files) must
    not derail the walk; odd-length chunks are word-aligned."""
    wav = encode_wav([1, -2, 3], 8000)
    # splice an odd-length junk chunk right after the WAVE magic
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    spliced = wav[:12] + junk + wav[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav(spliced) == (8000, 1, [1, -2, 3])


def test_decoder_rejects_malformed():
    wav = encode_wav([0, 1], 8000)
    with pytest.raises(MediaFormatError):
        decode_wav(b"RIFX" + wav[4:])  # bad magic
    with pytest.raises(MediaFormatError):
        decode_wav(wav[:20])  # truncated
    # non-PCM format tag
    bad = bytearray(wav)
    fmt_off = wav.index(b"fmt ") + 8
    bad[fmt_off : fmt_off + 2] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(MediaFormatError):
        decode_wav(bytes(bad))
    with pytest.raises(MediaFormatError):
        encode_wav([40000], 8000)  # sample out of int16 range
    with pytest.raises(MediaFormatError):
        encode_wav([1, 2, 3], 8000, n_channels=2)  # odd interleave
