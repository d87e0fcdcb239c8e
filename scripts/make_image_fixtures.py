"""Generate the committed deterministic PPM (P6) image fixtures.

Run once from the repo root; outputs fixtures/images/img_*.ppm.
Binary PPM is the simplest real raster format (ASCII header + raw RGB
bytes), which lets the image decode path be a genuine codec — header
tokenization + typed pixel plane — with zero external libraries, and
lets the DuckDB oracle replay the full parse from read_blob bytes.

Pixels are a deterministic per-coordinate formula so the files never
need regeneration; if they are regenerated, byte-identical output is
guaranteed.
"""

from __future__ import annotations

import os

OUT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "fixtures", "images")
)

# (width, height) per fixture image — small, varied aspect ratios,
# including a 1x1 edge case.
DIMS = [(8, 6), (16, 9), (5, 7), (1, 1)]


def pixel(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 7 + y * 3) % 256, (x * 5 + y * 11) % 256, (x * 13 + y) % 256)


def ppm_bytes(w: int, h: int) -> bytes:
    header = f"P6\n{w} {h}\n255\n".encode("ascii")
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px.extend(pixel(x, y))
    return header + bytes(px)


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for i, (w, h) in enumerate(DIMS):
        path = os.path.join(OUT_DIR, f"img_{i}.ppm")
        with open(path, "wb") as f:
            f.write(ppm_bytes(w, h))
        print(f"wrote {path} ({w}x{h}, {os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
