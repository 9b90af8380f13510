"""Bloom-filter skip index for the stats sidecars — the ClickHouse
``bloom_filter`` data-skipping index analogue (reference surface: the
host engine's MergeTree skip indexes; the reference repo itself reads
files, lib.rs:240-366, and delegates pruning to its host).

Min/max sidecar stats prune RANGE predicates but are blind to point
lookups on scattered values: a part holding {'u17', 'u83091'} has
min='u17', max='u83091' and every equality probe lands inside the
range. A per-part bloom filter over the column's distinct values
proves definite ABSENCE for `col = v` / `col IN (...)`, which is the
pruning that matters for high-cardinality lookups (URLs, UUIDs, doc
ids) over hash-scattered layouts at 100 TB.

Wire format (inside ``_<part>.stats.json``): a top-level ``"bloom"``
map ``{column: {"m": bits, "k": hashes, "b64": bitset}}``. Hashing is
double-hashing over blake2b-128 (h1 + i*h2 mod m) on a type-tagged
byte encoding — int and string columns only (float equality pruning
is a footgun; bool/None never index). False positives only ever KEEP
a file — pruning stays conservative by construction.
"""

from __future__ import annotations

import base64
import math
import re
from typing import Iterable, Optional

# ~1% false-positive rate at 10 bits/value with k=7 (standard curve)
_BITS_PER_VALUE = 10
_K = 7
# bitset cap: 2 Mbit = 256 KiB (~341 KB base64 in the sidecar). A part
# holding a fully-unique 65k-row block column needs 650 Kbit; real
# parts of a few hundred thousand distinct values stay under the cap
# at the 1% design point, and a saturated (capped) filter only RAISES
# the fp rate — it still never mis-prunes, so we keep building past
# the design density instead of dropping
_MAX_BITS = 1 << 21
# memory/write-cost bound on the per-part distinct-set accumulation;
# beyond this the capped filter is ~25x over design density (fp -> 1,
# prunes nothing) — drop the index, never mis-prune
MAX_DISTINCT = 1_000_000


def value_bytes(v) -> Optional[bytes]:
    """Type-tagged canonical encoding; None for unsupported types
    (callers treat unsupported as 'cannot prove absence')."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, int):
        return b"i" + str(v).encode()
    if isinstance(v, str):
        return b"s" + v.encode("utf-8")
    return None


def _hashes(data: bytes, k: int, m: int):
    import hashlib

    d = hashlib.blake2b(data, digest_size=16).digest()
    h1 = int.from_bytes(d[:8], "little")
    h2 = int.from_bytes(d[8:], "little") | 1  # odd: full-period stride
    for i in range(k):
        yield (h1 + i * h2) % m


def build_bloom(distinct_encoded: Iterable[bytes]) -> Optional[dict]:
    """Bloom dict from the column's DISTINCT type-tagged values
    (already encoded via :func:`value_bytes`); None when empty or
    past the accumulation cap (a filter that dense prunes nothing)."""
    vals = list(distinct_encoded)
    if not vals or len(vals) > MAX_DISTINCT:
        return None
    m = min(_MAX_BITS, max(64, _BITS_PER_VALUE * len(vals)))
    # round up to a byte multiple so the b64 payload is clean
    m = ((m + 7) // 8) * 8
    bits = bytearray(m // 8)
    for b in vals:
        for h in _hashes(b, _K, m):
            bits[h >> 3] |= 1 << (h & 7)
    return {"m": m, "k": _K, "b64": base64.b64encode(bytes(bits)).decode()}


NGRAM_N = 3  # ClickHouse ngrambf_v1's customary gram size


def string_ngrams(s: str, n: int = NGRAM_N) -> set:
    """Encoded codepoint n-grams of ``s`` (empty for short strings).
    Both the writer (over column values) and the reader (over the
    probe needle) use this — a needle gram absent from the part's
    union proves no value CONTAINS the needle."""
    return {value_bytes(s[i : i + n]) for i in range(len(s) - n + 1)}


def bloom_maybe_contains(bloom: dict, v) -> bool:
    """False ONLY when the filter proves ``v`` absent. Malformed
    entries and unsupported types answer True (never prune)."""
    b = value_bytes(v)
    if b is None:
        return True
    try:
        m = int(bloom["m"])
        k = int(bloom["k"])
        bits = base64.b64decode(bloom["b64"])
        if m <= 0 or k <= 0 or len(bits) * 8 < m:
            return True
    except (KeyError, TypeError, ValueError):
        return True
    return all(bits[h >> 3] & (1 << (h & 7)) for h in _hashes(b, k, m))


# tokenbf_v1's tokenizer splits on non-alphanumeric characters; this
# variant is "maximal \w+ runs" (unicode letters/digits/underscore) —
# documented difference: ClickHouse is ASCII-alnum-based, \w keeps
# unicode words indexable. Both sides (writer over values, reader over
# needles) share the rule, so pruning stays sound.
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def string_tokens(s: str) -> set:
    """Encoded token set of ``s`` — the tokenbf_v1 accumulation unit."""
    return {value_bytes(t) for t in _TOKEN_RE.findall(s)}


def tokenbf_may_match(
    bloom: dict,
    needle: str,
    *,
    anchored_left: bool = False,
    anchored_right: bool = False,
) -> bool:
    """False ONLY when some PROVABLE token of ``needle`` is absent
    from the column's token union (hasToken semantics generalized to
    the pushable string predicates):

    * a token strictly inside the needle (non-word chars on both
      sides) is always a complete token of any containing value;
    * a token touching the needle's left/right edge is complete only
      when that edge is anchored to the value boundary — equality
      anchors both sides, startsWith the left, endsWith the right.

    Needles with no provable token answer True (no pruning)."""
    if not isinstance(needle, str):
        return True
    for m in _TOKEN_RE.finditer(needle):
        left_complete = m.start() > 0 or anchored_left
        right_complete = m.end() < len(needle) or anchored_right
        if (
            left_complete
            and right_complete
            and not bloom_maybe_contains(bloom, m.group(0))
        ):
            return False
    return True


def ngrambf_may_match_substring(bloom: dict, needle: str) -> bool:
    """False ONLY when some n-gram of ``needle`` is provably absent
    from the column's gram union — then no value contains the needle
    (StringContains / LIKE '%needle%' matches zero rows). Needles
    shorter than the gram size answer True (no gram to probe)."""
    if not isinstance(needle, str) or len(needle) < NGRAM_N:
        return True
    for i in range(len(needle) - NGRAM_N + 1):
        gram = needle[i : i + NGRAM_N]
        if not bloom_maybe_contains(bloom, gram):
            return False
    return True
