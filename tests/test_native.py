"""Tests for the native (C++) LZ4-frame codec.

The reference saves episode logs as LZ4 frames via python-lz4
(reference foundation/utils.py:18-43); our codec must produce
spec-conformant frames that any LZ4 implementation can read. Since
python-lz4 isn't installed here, conformance is checked against an
independent pure-Python decoder written directly from the published
LZ4 block/frame specs (shares nothing with the C++ code but the spec).
"""

import os
import struct

import pytest

from ai_economist_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain to build native codec"
)


# ---------------------------------------------------------------------------
# Independent pure-Python LZ4 decoder (from the spec, for cross-checking).
# ---------------------------------------------------------------------------


def _py_decode_block(src, out):
    i = 0
    while i < len(src):
        token = src[i]
        i += 1
        litlen = token >> 4
        if litlen == 15:
            while True:
                b = src[i]
                i += 1
                litlen += b
                if b != 255:
                    break
        out.extend(src[i : i + litlen])
        i += litlen
        if i >= len(src):
            break
        offset = struct.unpack_from("<H", src, i)[0]
        i += 2
        assert offset > 0, "zero offset is invalid"
        mlen = token & 0x0F
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        assert start >= 0, "match reaches before output start"
        for k in range(mlen):  # byte-wise: overlapping matches
            out.append(out[start + k])


def py_decode_frame(data):
    magic = struct.unpack_from("<I", data, 0)[0]
    assert magic == 0x184D2204
    flg, bd = data[4], data[5]
    assert flg >> 6 == 1, "frame version"
    assert bd & 0x8F == 0, "BD reserved bits"
    pos = 6
    content_size = None
    if flg & 0x08:
        content_size = struct.unpack_from("<Q", data, pos)[0]
        pos += 8
    if flg & 0x01:
        pos += 4  # dict id
    # header checksum byte: (xxh32(descriptor) >> 8) & 0xFF
    hc = data[pos]
    assert hc == (native.xxh32(data[4:pos]) >> 8) & 0xFF, "header checksum"
    pos += 1
    out = bytearray()
    while True:
        bsize = struct.unpack_from("<I", data, pos)[0]
        pos += 4
        if bsize == 0:
            break
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        blk = data[pos : pos + bsize]
        pos += bsize
        if stored:
            out.extend(blk)
        else:
            _py_decode_block(blk, out)
        if flg & 0x10:
            pos += 4  # block checksum
    if flg & 0x04:
        (cchk,) = struct.unpack_from("<I", data, pos)
        assert cchk == native.xxh32(bytes(out))
    if content_size is not None:
        assert content_size == len(out)
    return bytes(out)


# ---------------------------------------------------------------------------


def test_xxh32_spec_vectors():
    # Published xxHash32 test vectors.
    assert native.xxh32(b"", 0) == 0x02CC5D05
    assert native.xxh32(b"", 0x9E3779B1) == 0x36B78AE7


CASES = [
    b"",
    b"a",
    b"abcd",
    b"the quick brown fox " * 3,
    b"x" * 100_000,  # max-compressible: long match runs
    bytes(range(256)) * 400,  # cyclic
    os.urandom(70_000),  # incompressible: stored blocks
    (b"ab" * 9) + os.urandom(64) + (b"ab" * 999),  # overlapping matches
    os.urandom(1000) * 5000,  # 5 MB: multi-block frame
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_roundtrip_and_spec_conformance(i):
    data = CASES[i]
    frame = native.lz4_compress(data)
    # our decoder
    assert native.lz4_decompress(frame) == data
    # independent spec decoder
    assert py_decode_frame(frame) == data


def test_decompress_rejects_garbage():
    with pytest.raises(ValueError):
        native.lz4_decompress(b"not an lz4 frame at all")


def test_logs_use_native_lz4(tmp_path):
    from ai_economist_tpu.utils import logs

    assert logs.HAVE_LZ4
    log = {"states": [{"coin": 3.5}], "actions": [None], "rewards": [[0.1, 0.2]]}
    path = logs.save_episode_log(log, str(tmp_path / "ep.lz4"))
    assert path.endswith(".lz4")
    assert logs.load_episode_log(path) == log
