"""Round-trip + validation tests for the pure-stdlib media codecs.

These are the kernels behind ``media_features``/``resize_payloads``
(VERDICT r1 #8): a spec-valid zlib PNG writer/parser, ``wave`` 16-bit
PCM, and the explicit RAWV video container.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from hive_2_spark.llm import media_codec as codec


def test_png_roundtrip_exact_pixels():
    pixels = bytes((x * 7 + 3) & 0xFF for x in range(15 * 9))
    payload = codec.encode_png_gray(15, 9, pixels)
    w, h, out = codec.decode_png(payload)
    assert (w, h) == (15, 9)
    assert out == pixels


def test_png_decoder_reverses_sub_and_up_filters():
    """The decoder must handle filters a generic encoder emits, not just
    our writer's None filter — build Sub/Up-filtered scanlines by hand."""
    width, height = 4, 2
    row0 = bytes([10, 20, 30, 40])
    row1 = bytes([15, 25, 35, 45])
    # Sub filter on row0: raw[x] - raw[x-1]; Up filter on row1: raw - prev
    sub = bytes([row0[0]]) + bytes((row0[x] - row0[x - 1]) & 0xFF for x in range(1, 4))
    up = bytes((row1[x] - row0[x]) & 0xFF for x in range(4))
    raw = b"\x01" + sub + b"\x02" + up
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    payload = (
        codec.PNG_SIG
        + codec._png_chunk(b"IHDR", ihdr)
        + codec._png_chunk(b"IDAT", zlib.compress(raw))
        + codec._png_chunk(b"IEND", b"")
    )
    w, h, out = codec.decode_png(payload)
    assert out == row0 + row1


def test_png_rejects_bad_signature_and_crc():
    payload = codec.encode_png(8, 8, seed=1)
    with pytest.raises(ValueError):
        codec.decode_png(b"JUNK" + payload[4:])
    corrupted = bytearray(payload)
    corrupted[35] ^= 0x01  # flip a bit inside IHDR/IDAT region
    with pytest.raises(ValueError):
        codec.decode_png(bytes(corrupted))


def test_wav_roundtrip():
    payload = codec.encode_wav(321, seed=9)
    rate, samples = codec.decode_wav(payload)
    assert rate == codec.WAV_RATE
    assert len(samples) == 321
    assert all(-32768 <= s <= 32767 for s in samples)
    # re-encode from samples is byte-identical (same params)
    assert codec.encode_wav_from_samples(rate, samples) == payload


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        codec.decode_wav(b"RIFFxxxxWAVEbroken")


def test_rawv_roundtrip():
    payload = codec.encode_rawv(6, 4, 3, seed=2)
    w, h, frames = codec.decode_rawv(payload)
    assert (w, h, len(frames)) == (6, 4, 3)
    assert all(len(f) == 24 for f in frames)
    assert codec.encode_rawv_frames(w, h, frames) == payload


def test_rawv_rejects_bad_magic_and_length():
    payload = codec.encode_rawv(6, 4, 3, seed=2)
    with pytest.raises(ValueError):
        codec.decode_rawv(b"XXXX" + payload[4:])
    # header claims more frames than the blob carries
    hdr = codec.RAWV_MAGIC + struct.pack(">III", 99, 6, 4)
    with pytest.raises(ValueError):
        codec.decode_rawv(hdr + payload[16:])


def test_resample_gray_nearest_neighbor():
    # 2x2 checker upsampled to 4x4 keeps quadrant structure
    px = bytes([0, 255, 255, 0])
    out = codec.resample_gray(px, 2, 2, 4, 4)
    assert out[0] == 0 and out[3] == 255 and out[12] == 255 and out[15] == 0
    # downsample is exact corner sampling
    assert codec.resample_gray(out, 4, 4, 2, 2) == px


def test_encoders_deterministic():
    assert codec.encode_png(10, 7, 42) == codec.encode_png(10, 7, 42)
    assert codec.encode_wav(100, 42) == codec.encode_wav(100, 42)
    assert codec.encode_rawv(5, 5, 2, 42) == codec.encode_rawv(5, 5, 2, 42)


# ---------------------------------------------------- property tests
from hypothesis import given, settings, strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(w, h, seed):
    """encode -> decode is identity for any dims/seed."""
    payload = codec.encode_png(w, h, seed)
    dw, dh, px = codec.decode_png(payload)
    assert (dw, dh) == (w, h) and len(px) == w * h


@settings(max_examples=30, deadline=None)
@given(
    pixels=st.binary(min_size=1, max_size=400),
    tw=st.integers(min_value=1, max_value=20),
    th=st.integers(min_value=1, max_value=20),
)
def test_resample_outputs_only_input_pixels(pixels, tw, th):
    """Nearest-neighbor output contains only source pixel values and has
    exactly tw*th bytes, for ANY source shape factorization."""
    w = len(pixels)
    out = codec.resample_gray(pixels, w, 1, tw, th)
    assert len(out) == tw * th
    assert set(out) <= set(pixels)


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=500),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, seed):
    rate, samples = codec.decode_wav(codec.encode_wav(n, seed))
    assert rate == codec.WAV_RATE and len(samples) == n
    assert all(-32768 <= s <= 32767 for s in samples)
