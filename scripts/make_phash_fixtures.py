"""Generate the committed perceptual-hash dedup fixture corpus.

Outputs fixtures/images_phash/ph_*.ppm — TEN 16x16 binary-PPM (P6)
images: base patterns plus deterministic near-duplicate variants, laid
out so the aHash near-dup query (q_dedup_image_phash) and its recall
audit (q_dedup_image_phash_recall) have honest, non-trivial readings:

  ph_a         base pattern A
  ph_a_bright  A with a uniform +16 brightness shift on every channel
               -> aHash-IDENTICAL (the hash compares each cell sum to
               the global mean, so a clip-free uniform shift cancels
               exactly) but OUTSIDE the pixel-distance truth: the
               classic precision<1 reading of perceptual hashing.
  ph_a_noise   A with small sparse noise -> hamming <= 3 (detected)
               and inside pixel truth (a true positive).
  ph_b         base pattern B
  ph_b_noise   B with moderate noise -> hamming in 4..12 (MISSED at
               the lossless-3 threshold) but inside pixel truth: the
               recall<1 reading.
  ph_c         base pattern C
  ph_c_heavy   C with its left half replaced -> far in both metrics
               (a true negative for both).
  ph_d/e/f     distinct fillers (no dups).

All pixel values stay <= 239 so the +16 shift never clips (clipping
would break the exact invariance the bright variant demonstrates).
The generator recomputes the aHash and the exact gray distance for
every engineered pair and ASSERTS the properties above, so the
committed corpus can never drift out of the story the queries tell.

Constants here (SIDE, luma weights, TRUTH_SUM) are pinned by the
query module flink_pipeline_spark/plans/image_dedup.py — keep in sync.
"""

from __future__ import annotations

import os

OUT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "fixtures", "images_phash")
)

SIDE = 16  # all phash fixtures are SIDE x SIDE
GRID = 8  # aHash grid (64 bits)
LUMA = (299, 587, 114)  # integer ITU-R 601 luma weights (x1000)
TRUTH_SUM = 2_000_000  # near-dup truth: sum |gray_a - gray_b| <= this

Pattern = "callable"


def pat_a(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 13 + y * 7) % 200, (x * 3 + y * 17) % 200, (x * 11 + y * 5) % 200)


def pat_b(x: int, y: int) -> tuple[int, int, int]:
    return ((x * x + y * 19) % 200, (x * 7 + y * y) % 200, (x * 23 + y * 29) % 200)


def pat_c(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 31 + y * 3) % 200, (x * 5 + y * 37) % 200, ((x + y) * 41) % 200)


def pat_d(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 43 + y * 47) % 200, (x * 53 + y * 59) % 200, (x * 61 + y * 67) % 200)


def pat_e(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 71 + y * 73) % 200, (x * 79 + y * 83) % 200, (x * 89 + y * 97) % 200)


def pat_f(x: int, y: int) -> tuple[int, int, int]:
    return ((x * 101 + y * 103) % 200, (x * 107 + y * 109) % 200, (x * 113 + y * 127) % 200)


def render(pat) -> list[list[tuple[int, int, int]]]:
    return [[pat(x, y) for x in range(SIDE)] for y in range(SIDE)]


def shift(img, delta: int):
    return [[tuple(min(255, c + delta) for c in px) for px in row] for row in img]


def replace_left_half(img, pat):
    return [
        [pat(x + 5, y + 9) if x < SIDE // 2 else img[y][x] for x in range(SIDE)]
        for y in range(SIDE)
    ]


def boundary_noise(img, n_cells: int, max_delta: int = 60):
    """Deterministic 'noise' that actually moves the perceptual hash:
    pick the ``n_cells`` aHash cells whose luma sum sits closest to the
    global-mean decision boundary and nudge their green channel (the
    heaviest luma weight) just across it. Real image noise flips
    exactly these near-mean cells first — far-from-mean cells are why
    aHash is noise-robust at all — so targeting them is the honest way
    to engineer a fixed flip count without blasting the whole image.

    Returns the perturbed image; edits are clamped to [0, 255] and a
    cell needing more than ``max_delta`` per pixel is skipped (it is
    not 'near' the boundary)."""
    out = [list(row) for row in img]
    flipped = 0
    while flipped < n_cells:
        g = gray(out)
        cells = [0] * (GRID * GRID)
        for y in range(SIDE):
            for x in range(SIDE):
                cells[(y * GRID // SIDE) * GRID + (x * GRID // SIDE)] += g[y][x]
        total = sum(cells)
        base_bits = ahash_bits(img)
        margins = sorted(
            (abs(cells[c] * (GRID * GRID) - total), c)
            for c in range(GRID * GRID)
            if (1 if cells[c] * (GRID * GRID) > total else 0) == base_bits[c]
        )
        moved = False
        for margin, c in margins:
            # per-pixel green delta needed to push cell*64 past total
            # (the cell edit also moves total by 64x less — covered by
            # the +2 slack and the recompute-per-iteration loop)
            need = margin // (GRID * GRID) + 2
            d = need // (4 * LUMA[1]) + 1
            if d > max_delta:
                continue
            sign = -1 if base_bits[c] else 1
            cy, cx = divmod(c, GRID)
            span = SIDE // GRID
            ok = True
            for yy in range(cy * span, (cy + 1) * span):
                for xx in range(cx * span, (cx + 1) * span):
                    v = out[yy][xx][1] + sign * d
                    if not 0 <= v <= 255:
                        ok = False
            if not ok:
                continue
            for yy in range(cy * span, (cy + 1) * span):
                for xx in range(cx * span, (cx + 1) * span):
                    px = list(out[yy][xx])
                    px[1] += sign * d
                    out[yy][xx] = tuple(px)
            if hamming(ahash_bits(img), ahash_bits(out)) > flipped:
                flipped = hamming(ahash_bits(img), ahash_bits(out))
                moved = True
                break
        if not moved:
            raise SystemExit(
                f"could not flip {n_cells} cells within max_delta={max_delta}"
            )
    return out


def gray(img):
    return [
        [sum(w * c for w, c in zip(LUMA, px)) for px in row] for row in img
    ]


def ahash_bits(img) -> list[int]:
    """64 bits: cell c (row-major 8x8 of 2x2 pixel blocks) is 1 iff
    cell_luma_sum * 64 > total_luma_sum (strict; exact integers)."""
    g = gray(img)
    cells = [0] * (GRID * GRID)
    for y in range(SIDE):
        for x in range(SIDE):
            cells[(y * GRID // SIDE) * GRID + (x * GRID // SIDE)] += g[y][x]
    total = sum(cells)
    return [1 if c * (GRID * GRID) > total else 0 for c in cells]


def hamming(b1, b2) -> int:
    return sum(a != b for a, b in zip(b1, b2))


def gray_dist(i1, i2) -> int:
    g1, g2 = gray(i1), gray(i2)
    return sum(
        abs(g1[y][x] - g2[y][x]) for y in range(SIDE) for x in range(SIDE)
    )


def ppm_bytes(img) -> bytes:
    header = f"P6\n{SIDE} {SIDE}\n255\n".encode("ascii")
    px = bytearray()
    for row in img:
        for p in row:
            px.extend(p)
    return header + bytes(px)


def main() -> None:
    a = render(pat_a)
    b = render(pat_b)
    c = render(pat_c)
    images = {
        "ph_a": a,
        "ph_a_bright": shift(a, 16),
        "ph_a_noise": boundary_noise(a, 2),
        "ph_b": b,
        "ph_b_noise": boundary_noise(b, 5),
        "ph_c": c,
        "ph_c_heavy": replace_left_half(c, pat_f),
        "ph_d": render(pat_d),
        "ph_e": render(pat_e),
        "ph_f": render(pat_f),
    }

    # No engineered clip: the bright variant must shift EVERY pixel by
    # exactly +16 or the hash-invariance story is wrong.
    assert all(cc <= 239 for row in a for px in row for cc in px)

    h = {k: ahash_bits(v) for k, v in images.items()}
    checks = {
        "bright hash-invariant": hamming(h["ph_a"], h["ph_a_bright"]) == 0,
        "small noise detected (1..3)": 1
        <= hamming(h["ph_a"], h["ph_a_noise"])
        <= 3,
        "moderate noise missed (4..12)": 4
        <= hamming(h["ph_b"], h["ph_b_noise"])
        <= 12,
        "heavy corruption far (>12)": hamming(h["ph_c"], h["ph_c_heavy"]) > 12,
        "truth holds a/a_noise": gray_dist(images["ph_a"], images["ph_a_noise"])
        <= TRUTH_SUM,
        "truth holds b/b_noise": gray_dist(images["ph_b"], images["ph_b_noise"])
        <= TRUTH_SUM,
        "truth rejects a/a_bright": gray_dist(
            images["ph_a"], images["ph_a_bright"]
        )
        > TRUTH_SUM,
        "truth rejects c/c_heavy": gray_dist(
            images["ph_c"], images["ph_c_heavy"]
        )
        > TRUTH_SUM,
    }
    for name, ok in checks.items():
        print(("OK  " if ok else "FAIL") + " " + name)
    print(
        "hammings: a/bright=%d a/noise=%d b/noise=%d c/heavy=%d"
        % (
            hamming(h["ph_a"], h["ph_a_bright"]),
            hamming(h["ph_a"], h["ph_a_noise"]),
            hamming(h["ph_b"], h["ph_b_noise"]),
            hamming(h["ph_c"], h["ph_c_heavy"]),
        )
    )
    print(
        "gray dists: a/bright=%d a/noise=%d b/noise=%d c/heavy=%d"
        % (
            gray_dist(images["ph_a"], images["ph_a_bright"]),
            gray_dist(images["ph_a"], images["ph_a_noise"]),
            gray_dist(images["ph_b"], images["ph_b_noise"]),
            gray_dist(images["ph_c"], images["ph_c_heavy"]),
        )
    )
    if not all(checks.values()):
        raise SystemExit("fixture properties not met — tune the noise tables")

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, img in images.items():
        path = os.path.join(OUT_DIR, f"{name}.ppm")
        with open(path, "wb") as f:
            f.write(ppm_bytes(img))
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
