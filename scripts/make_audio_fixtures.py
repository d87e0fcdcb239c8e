"""Generate the committed deterministic WAV (RIFF/PCM16LE) fixtures.

Run once from the repo root; outputs fixtures/audio/au_*.wav.
The canonical 44-byte RIFF header + PCM16 little-endian data chunk is
the simplest real CONTAINER format (magic chunks + little-endian
binary fields), which makes the audio decode path a genuine container
parser — chunk validation + typed field extraction + signed sample
reinterpretation — with zero external libraries, and lets the DuckDB
oracle replay the full parse from read_blob hex arithmetic.

Samples are a deterministic per-index formula so the files never need
regeneration; if they are regenerated, byte-identical output is
guaranteed.
"""

from __future__ import annotations

import os
import struct

OUT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "fixtures", "audio")
)

# (sample_rate, channels, n_frames) per fixture — varied rates and
# channel counts, including a 1-frame edge case.
SPECS = [(8000, 1, 480), (16000, 2, 320), (44100, 1, 1000), (22050, 2, 1)]


def sample(i: int, k: int) -> int:
    """Deterministic int16 sample for fixture ``i``, stream index ``k``."""
    return ((k * 37 + i * 11) % 4096) - 2048


def wav_bytes(i: int, rate: int, channels: int, n_frames: int) -> bytes:
    n_samples = n_frames * channels
    data = b"".join(
        struct.pack("<h", sample(i, k)) for k in range(n_samples)
    )
    byte_rate = rate * channels * 2
    block_align = channels * 2
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, byte_rate, block_align, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    assert len(hdr) == 44
    return hdr + data


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for i, (rate, ch, nf) in enumerate(SPECS):
        path = os.path.join(OUT_DIR, f"au_{i}.wav")
        with open(path, "wb") as f:
            f.write(wav_bytes(i, rate, ch, nf))
        print(f"wrote {path} ({rate} Hz, {ch} ch, {nf} frames, "
              f"{os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
