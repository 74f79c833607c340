"""Bitstream container: big-endian u32 framing around rANS payloads.

Same wire layout as the reference's writer (/root/reference/dmc/test.py:38-56)
so files remain comparable: per coded unit, (shape_h, shape_w, n_strings) as
>u32, then for each string its byte length as >u32 followed by the raw bytes.
This module adds the matching reader (the reference never decodes from disk).
"""

from __future__ import annotations

import struct
from typing import BinaryIO, List, Sequence, Tuple


def write_uints(fd: BinaryIO, values: Sequence[int]) -> int:
    fd.write(struct.pack(f">{len(values)}I", *values))
    return 4 * len(values)


def read_uints(fd: BinaryIO, n: int) -> Tuple[int, ...]:
    data = fd.read(4 * n)
    if len(data) != 4 * n:
        raise EOFError("truncated bitstream")
    return struct.unpack(f">{n}I", data)


def write_body(
    fd: BinaryIO, shape: Tuple[int, int], strings: Sequence[bytes]
) -> int:
    """One coded unit: latent shape + its entropy-coded streams."""
    count = write_uints(fd, (shape[0], shape[1], len(strings)))
    for s in strings:
        count += write_uints(fd, (len(s),))
        fd.write(s)
        count += len(s)
    return count


def try_read_body(
    fd: BinaryIO,
) -> Tuple[Tuple[int, int], List[bytes]] | None:
    """Like read_body, but returns None at a clean end-of-file.

    A partial header (some but not 12 bytes) still raises EOFError — that
    is a truncated file, not a frame boundary.
    """
    header = fd.read(12)
    if not header:
        return None
    if len(header) != 12:
        raise EOFError("truncated bitstream")
    h, w, n = struct.unpack(">3I", header)
    strings = []
    for _ in range(n):
        (length,) = read_uints(fd, 1)
        data = fd.read(length)
        if len(data) != length:
            raise EOFError("truncated bitstream")
        strings.append(data)
    return (h, w), strings


def read_body(fd: BinaryIO) -> Tuple[Tuple[int, int], List[bytes]]:
    h, w, n = read_uints(fd, 3)
    strings = []
    for _ in range(n):
        (length,) = read_uints(fd, 1)
        data = fd.read(length)
        if len(data) != length:
            raise EOFError("truncated bitstream")
        strings.append(data)
    return (h, w), strings
