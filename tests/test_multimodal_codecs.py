"""Unit tests for the REAL uncompressed-format decoders
(operators/multimodal.py): PPM header tolerance and WAV chunk-walking
— the parsing paths the analytic oracles (q156/q157) can't vary.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ooh_etl_spark.operators.multimodal import (
    decode_ppm,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
)


def test_ppm_roundtrip():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_ppm_header_comments_and_whitespace():
    px = np.full((2, 2, 3), 7, dtype=np.uint8)
    payload = b"P6\n# a comment\n  2\t2 # trailing\n255\n" + px.tobytes()
    assert np.array_equal(decode_ppm(payload), px)


def test_ppm_rejects_wrong_magic_and_maxval():
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00")


def test_wav_roundtrip():
    s = np.array([0, 1, -1, 32767, -32768, 123], dtype=np.int16)
    decoded, sr = decode_wav_pcm16(encode_wav_pcm16(s, 44100))
    assert sr == 44100
    assert np.array_equal(decoded, s)


def test_wav_tolerates_extra_chunk_before_data():
    s = np.array([5, -5, 9], dtype=np.int16)
    base = encode_wav_pcm16(s, 8000)
    # splice a LIST chunk (odd-sized body → word-aligned pad) between
    # fmt and data
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    payload = base[:fmt_end] + extra + base[fmt_end:]
    decoded, sr = decode_wav_pcm16(payload)
    assert sr == 8000
    assert np.array_equal(decoded, s)


def test_wav_rejects_stereo():
    s = np.array([1, 2], dtype=np.int16)
    base = bytearray(encode_wav_pcm16(s, 8000))
    base[12 + 8 + 2 : 12 + 8 + 4] = struct.pack("<H", 2)  # channels = 2
    with pytest.raises(ValueError):
        decode_wav_pcm16(bytes(base))
