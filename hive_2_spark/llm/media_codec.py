"""Pure-stdlib media codecs for the multimodal pipeline (VERDICT r1 #8).

Real binary encode/decode with zero external dependencies, so
``media_features`` exercises a genuine bytes -> parse -> pixels/samples
-> features pipeline instead of a stub:

- **PNG** (``struct`` + ``zlib``): writer emits a spec-valid 8-bit
  grayscale PNG (signature, IHDR/IDAT/IEND chunks, CRC-32 per chunk,
  scanline filter bytes); reader validates the signature and every chunk
  CRC, inflates IDAT, and reverses scanline filters None(0)/Sub(1)/Up(2)
  — the ones grayscale encoders emit. A PIL/libvips swap-in changes one
  function, not the pipeline.
- **WAV** (``wave`` module): 16-bit mono PCM; reader returns framerate
  and decoded ``int16`` samples (``struct.unpack``, no audioop — it is
  removed in Python 3.13).
- **RAWV** (custom container): video has no stdlib format, so frames
  ride in an explicit deterministic container — magic ``RAWV``, header
  ``(n_frames, width, height)``, zlib-deflated concatenated grayscale
  frames. The reader is a real parser (magic + length validation +
  inflate), which is exactly what a production frame-extractor does
  around ffmpeg.

Everything is integer math — bit-for-bit deterministic across runs and
partitions, which the rows-only driver check depends on.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"
RAWV_MAGIC = b"RAWV"


# ------------------------------------------------------------------ PNG
def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Spec-valid 8-bit grayscale PNG from a row-major pixel buffer."""
    if len(pixels) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00"  # filter type None per scanline
        + pixels[y * width : (y + 1) * width]
        for y in range(height)
    )
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png(width: int, height: int, seed: int) -> bytes:
    """Deterministic synthesized PNG: a seeded pixel ramp."""
    pixels = bytes(
        ((x * 31 + y * 17 + seed) & 0xFF)
        for y in range(height)
        for x in range(width)
    )
    return encode_png_gray(width, height, pixels)


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Parse a grayscale PNG -> (width, height, pixel bytes row-major).

    Validates signature and per-chunk CRC; reverses filters 0/1/2.
    Raises ``ValueError`` on anything malformed — decode_ok=False path.
    """
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, idat = 8, -1, -1, b""
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        if pos + 12 + length > len(payload):
            raise ValueError("chunk length exceeds payload")
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            width, height, depth, color = struct.unpack_from(">IIBB", data)
            if (depth, color) != (8, 0):
                raise ValueError("only 8-bit grayscale supported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width < 0 or not idat:
        raise ValueError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as exc:
        raise ValueError(f"bad IDAT deflate stream: {exc}") from exc
    stride = width + 1
    if len(raw) != stride * height:
        raise ValueError("bad decompressed length")
    out = bytearray()
    prev = bytes(width)
    for y in range(height):
        ftype = raw[y * stride]
        line = bytearray(raw[y * stride + 1 : (y + 1) * stride])
        if ftype == 1:  # Sub
            for x in range(1, width):
                line[x] = (line[x] + line[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(width):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        out += line
        prev = line
    return width, height, bytes(out)


def resample_gray(
    pixels: bytes, w: int, h: int, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample of a row-major grayscale buffer."""
    return bytes(
        pixels[(y * h // th) * w + (x * w // tw)]
        for y in range(th)
        for x in range(tw)
    )


# ------------------------------------------------------------------ WAV
WAV_RATE = 8000


def encode_wav(n_samples: int, seed: int) -> bytes:
    """16-bit mono PCM WAV; deterministic integer triangle wave."""
    period = (seed % 37) + 8
    samples = bytearray()
    for i in range(n_samples):
        phase = (i + seed) % (2 * period)
        tri = phase if phase < period else 2 * period - phase
        val = (tri * 2000 // period - 1000) * 16  # well inside int16
        samples += struct.pack("<h", val)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        w.writeframes(bytes(samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, list[int]]:
    """Parse WAV -> (framerate, int16 samples). ValueError if malformed."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                raise ValueError("only 16-bit mono supported")
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    except wave.Error as exc:
        raise ValueError(f"bad WAV: {exc}") from exc
    return rate, list(struct.unpack(f"<{len(frames) // 2}h", frames))


def encode_wav_from_samples(rate: int, samples: list[int]) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


# ----------------------------------------------------------------- RAWV
def encode_rawv_frames(width: int, height: int, frames: list[bytes]) -> bytes:
    """RAWV container from explicit grayscale frame buffers."""
    blob = b"".join(frames)
    if len(blob) != width * height * len(frames):
        raise ValueError("frame buffers do not match dimensions")
    return (
        RAWV_MAGIC
        + struct.pack(">III", len(frames), width, height)
        + zlib.compress(blob, 6)
    )


def encode_rawv(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic video container: RAWV magic, dims header, deflated
    concatenated grayscale frames (each frame a shifted pixel ramp)."""
    frames = [
        bytes(
            ((x * 13 + y * 7 + f * 29 + seed) & 0xFF)
            for y in range(height)
            for x in range(width)
        )
        for f in range(n_frames)
    ]
    return encode_rawv_frames(width, height, frames)


def decode_rawv(payload: bytes) -> tuple[int, int, list[bytes]]:
    """Parse RAWV -> (width, height, frames). ValueError if malformed."""
    if payload[:4] != RAWV_MAGIC:
        raise ValueError("not RAWV (bad magic)")
    if len(payload) < 16:
        raise ValueError("truncated RAWV header")
    n_frames, width, height = struct.unpack_from(">III", payload, 4)
    try:
        raw = zlib.decompress(payload[16:])
    except zlib.error as exc:
        raise ValueError(f"bad RAWV deflate stream: {exc}") from exc
    fsize = width * height
    if len(raw) != fsize * n_frames:
        raise ValueError("frame payload length mismatch")
    return width, height, [raw[i * fsize : (i + 1) * fsize] for i in range(n_frames)]
