"""Bitstream container round-trip tests (pure host code, fast)."""

import io

import pytest

from deepvideocodec_tpu.eval.bitstream import (
    write_body,
    read_body,
    write_uints,
    read_uints,
)


def test_uints_roundtrip():
    buf = io.BytesIO()
    write_uints(buf, (1, 2, 70000))
    buf.seek(0)
    assert read_uints(buf, 3) == (1, 2, 70000)


def test_body_roundtrip():
    buf = io.BytesIO()
    strings = [b"hello", b"", b"\x00\xff" * 10]
    n = write_body(buf, (17, 33), strings)
    assert n == buf.tell()
    buf.seek(0)
    shape, out = read_body(buf)
    assert shape == (17, 33)
    assert out == strings


def test_multiple_units_stream():
    buf = io.BytesIO()
    write_body(buf, (4, 4), [b"aa", b"bb"])
    write_body(buf, (8, 8), [b"cc"])
    buf.seek(0)
    s1, u1 = read_body(buf)
    s2, u2 = read_body(buf)
    assert s1 == (4, 4) and u1 == [b"aa", b"bb"]
    assert s2 == (8, 8) and u2 == [b"cc"]


def test_truncated_raises():
    buf = io.BytesIO()
    write_body(buf, (4, 4), [b"aabb"])
    data = buf.getvalue()[:-2]
    with pytest.raises(EOFError):
        read_body(io.BytesIO(data))
