"""Clean-room ClickHouse Native format codec (no ClickHouse code used)."""

from .codec import (
    Block,
    BlockColumn,
    iter_blocks,
    read_block,
    read_file_schema,
    read_str,
    read_varuint,
    scan_block_offsets,
    write_block,
    write_str,
    write_varuint,
)
from .types import CHType, UnsupportedTypeError, from_arrow, parse_enum_values, parse_type, to_arrow
from .writer import write_native_file, arrow_to_native_bytes

__all__ = [
    "Block",
    "BlockColumn",
    "CHType",
    "UnsupportedTypeError",
    "arrow_to_native_bytes",
    "from_arrow",
    "iter_blocks",
    "parse_enum_values",
    "parse_type",
    "read_block",
    "read_file_schema",
    "read_str",
    "read_varuint",
    "scan_block_offsets",
    "to_arrow",
    "write_block",
    "write_native_file",
    "write_str",
    "write_varuint",
]
