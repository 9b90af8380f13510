"""ClickHouse ``formatDateTime`` %-pattern support.

ClickHouse formats timestamps with MySQL-style ``%`` specifiers
(``formatDateTime(ts, '%Y-%m-%d')``); Spark's ``date_format`` speaks
Java ``DateTimeFormatter`` patterns — and Spark 3+ REMOVED the
week-based patterns (``YYYY``/``ww``/``u``) from it entirely.
:func:`format_datetime_expr` therefore compiles a %-pattern into a
``CONCAT`` of ``date_format`` chunks plus computed expressions for
the ISO-week family (%G week-year via the Thursday rule, %V ISO week
via ``weekofyear``, %u ISO day-of-week via the ``dayofweek``
rotation). The oracle side (DuckDB ``strftime``) consumes %-patterns
natively, which keeps the twin formulations structurally independent
by construction.

Unsupported specifiers raise rather than silently mis-format.
Literal text is escaped per Java pattern rules inside the
``date_format`` chunks.
"""

from __future__ import annotations

# %-specifier -> Java DateTimeFormatter pattern (the subset
# date_format still supports in Spark 3+)
_JAVA_SPEC = {
    "Y": "yyyy",
    "y": "yy",
    "m": "MM",
    "d": "dd",
    "H": "HH",
    "I": "hh",
    "M": "mm",
    "S": "ss",
    "j": "DDD",
    "F": "yyyy-MM-dd",
    "D": "MM/dd/yy",
    "T": "HH:mm:ss",
    "R": "HH:mm",
    "p": "a",
}

# ISO day-of-week 1..7 (Mon..Sun): Spark dayofweek is 1..7 Sun..Sat
_ISO_DOW = "(((dayofweek({ts}) + 5) % 7) + 1)"


def _computed(spec: str, ts: str) -> str:
    """Spark SQL expression for the specifiers date_format lost."""
    if spec == "e":
        # ClickHouse %e (like strftime %e) is SPACE-padded to width 2
        # (' 2'); Java 'd' is unpadded — computed lpad instead
        # (r10 ADVICE)
        return f"lpad(CAST(day({ts}) AS STRING), 2, ' ')"
    if spec == "u":
        return f"CAST({_ISO_DOW.format(ts=ts)} AS STRING)"
    if spec == "V":
        return f"lpad(CAST(weekofyear({ts}) AS STRING), 2, '0')"
    if spec == "G":
        # ISO week-year, Thursday rule: the week's Thursday decides the
        # year; 4 - isodow days from any day lands on its Thursday
        iso = _ISO_DOW.format(ts=ts)
        return (
            f"CAST(year(date_add(CAST({ts} AS DATE), 4 - {iso})) AS STRING)"
        )
    raise AssertionError(spec)


_COMPUTED = {"u", "V", "G", "e"}


def format_datetime_expr(ts: str, fmt: str) -> str:
    """Spark SQL expression string equal to ClickHouse
    ``formatDateTime(ts, fmt)`` for the documented specifier subset."""
    pieces: list[str] = []  # SQL expressions to CONCAT
    java: list[str] = []  # pending date_format pattern chunks
    lit: list[str] = []  # pending literal text (goes into java)

    def flush_lit_into_java() -> None:
        if lit:
            java.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    def flush_java() -> None:
        flush_lit_into_java()
        if java:
            pat = "".join(java).replace("'", "\\'")
            pieces.append(f"date_format({ts}, '{pat}')")
            java.clear()

    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                raise ValueError(f"dangling %% at end of format {fmt!r}")
            spec = fmt[i + 1]
            if spec == "%":
                lit.append("%")
            elif spec in _JAVA_SPEC:
                flush_lit_into_java()
                java.append(_JAVA_SPEC[spec])
            elif spec in _COMPUTED:
                flush_java()
                pieces.append(_computed(spec, ts))
            else:
                raise ValueError(
                    f"unsupported formatDateTime specifier %{spec} in {fmt!r}"
                )
            i += 2
            continue
        lit.append(c)
        i += 1
    flush_java()
    if not pieces:
        return "''"
    if len(pieces) == 1:
        return pieces[0]
    return "CONCAT(" + ", ".join(pieces) + ")"


def parse_datetime_expr(col: str, fmt: str) -> str:
    """Spark SQL expression equal to ClickHouse
    ``parseDateTime(col, fmt)`` (MySQL-style %-pattern). Only plain
    field specifiers are parseable — the computed ISO-week family and
    %j have no Spark parse path and raise."""
    java: list[str] = []
    lit: list[str] = []
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c == "%":
            if i + 1 >= len(fmt):
                raise ValueError(f"dangling %% at end of format {fmt!r}")
            spec = fmt[i + 1]
            if spec == "%":
                lit.append("%")
            elif spec in _JAVA_SPEC and spec != "j":
                if lit:
                    java.append("'" + "".join(lit).replace("'", "''") + "'")
                    lit.clear()
                java.append(_JAVA_SPEC[spec])
            else:
                raise ValueError(
                    f"unparseable parseDateTime specifier %{spec} in {fmt!r}"
                )
            i += 2
            continue
        lit.append(c)
        i += 1
    if lit:
        java.append("'" + "".join(lit).replace("'", "''") + "'")
    pat = "".join(java).replace("'", "\\'")
    return f"to_timestamp({col}, '{pat}')"
