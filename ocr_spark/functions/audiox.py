"""Real audio-container header codec (WAV/RIFF) — pure stdlib.

Companion to ``imagex.py`` for the audio modality: PCM sample decode
would need an audio library, but the metadata curation pipelines key on
— codec, channel count, sample rate, duration — lives in the RIFF
container header, a fully specified public format (RIFF 1991 spec /
WAVEFORMATEX) parseable with struct alone:

- RIFF header:  'RIFF' <u32le size> 'WAVE'
- chunk stream: 4-byte id + u32le size (+ pad byte when size is odd)
- 'fmt ' chunk: u16le format tag (1 = PCM), channels, u32le sample
  rate, u32le byte rate, u16le block align, u16le bits/sample
- 'data' chunk: size → sample count = size / block_align

``parse_wav_meta`` walks the chunk stream (tolerating unknown chunks
before/after 'fmt ', as real encoders emit LIST/INFO/fact chunks) and
never raises on truncated or corrupt payloads.  ``make_wav``
synthesizes deterministic REAL files — correct sizes, a junk 'LIST'
chunk ahead of 'fmt ' to exercise the walk, and a zero-sample payload —
so the Spark plumbing runs on genuine bytes with no audio libs
installed.
"""

from __future__ import annotations

import struct


def parse_wav_meta(b: bytes) -> tuple[str, int, int, int] | None:
    """(codec, channels, sample_rate, n_samples) from a RIFF/WAVE
    payload, or None when the payload is not recognizable WAV.  Corrupt
    and truncated inputs return None, never raise — the caller maps
    None to codec='unknown' instead of a task failure."""
    try:
        if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        pos = 12
        fmt = None
        data_size = None
        while pos + 8 <= len(b):
            cid = b[pos:pos + 4]
            (csize,) = struct.unpack("<I", b[pos + 4:pos + 8])
            body = b[pos + 8:pos + 8 + csize]
            if cid == b"fmt " and csize >= 16 and len(body) >= 16:
                tag, ch, sr, _br, ba, bits = struct.unpack(
                    "<HHIIHH", body[:16])
                fmt = (tag, ch, sr, ba, bits)
            elif cid == b"data":
                data_size = csize
            pos += 8 + csize + (csize & 1)  # odd sizes carry a pad byte
        if fmt is None or data_size is None:
            return None
        tag, ch, sr, ba, bits = fmt
        if tag != 1 or ch <= 0 or sr <= 0 or ba <= 0:
            return None
        return ("pcm", ch, sr, data_size // ba)
    except Exception:
        return None


def make_wav(channels: int, sample_rate: int, n_samples: int,
             bits: int = 16) -> bytes:
    """A real, spec-valid PCM WAV file with ``n_samples`` zero samples
    and a junk LIST chunk before 'fmt ' (real encoders emit metadata
    chunks there — the parser must walk, not hardcode offsets)."""
    block_align = channels * bits // 8
    byte_rate = sample_rate * block_align
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      block_align, bits)
    junk = b"INFOocr_spark_wav"  # arbitrary LIST payload
    chunks = (
        b"LIST" + struct.pack("<I", len(junk)) + junk
        + (b"\x00" if len(junk) & 1 else b"")
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
