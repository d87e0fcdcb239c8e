"""Generate the committed video near-dup fixture corpus.

Outputs fixtures/video/vd_*.fvid — ELEVEN tiny FVID containers
(fixed-width ASCII header "FV01 0016 0016 NNNN\\n" + concatenated raw
16x16 RGB frames; see operators/multimodal.py _parse_fvid), laid out
so the frame-fingerprint dedup query (q_dedup_video_fp) and its
recall audit (q_dedup_video_fp_recall) have honest, non-trivial
readings at keyframe stride 2 (keyframes = frames 0, 2, 4, 6):

  vd_a          base asset A, 8 distinct frames
  vd_a_bright   A with a uniform +16 shift on every channel of every
                frame -> per-frame dHash IDENTICAL (gradient hashes
                are exactly brightness-invariant) so the frame-fp SET
                matches 4/4, but every frame is OUTSIDE the per-frame
                pixel truth: the image family's precision<1 reading
                on the frame dimension.
  vd_a_clip     frames 2..7 of A plus two new tail frames — a re-cut:
                its keyframes are A's frames {2, 4, 6} plus one new,
                so fp containment is 3/4 (detected at the 0.5 gate)
                and pixel truth agrees: the true-positive CLIP case
                containment exists for (Jaccard under-scores it).
  vd_a_noise    A with +1 green on a fixed half of each 2x2 cell of
                every frame — every cell's sum moves EQUALLY, so no
                gradient order relation flips: fp-identical (4/4) and
                inside pixel truth (true positive, hash robust).
  vd_b          base asset B
  vd_b_rot      B rotated by two frames (b[2..7] + b[0..1]) — a
                re-cut preserving keyframe parity: the keyframe SET
                is identical, so set semantics score 4/4 where any
                order-sensitive signature would fail (the reading
                that motivates frame-fp SETS).
  vd_b_jitter   B with per-keyframe boundary noise engineered to flip
                >= 1 dHash bit on EVERY keyframe while staying inside
                pixel truth -> exact-fp matching finds NOTHING: the
                recall<1 reading that prices exact-fp's trade (the
                image family's hamming tolerance was given up for
                set-join scalability).
  vd_c          base asset C
  vd_c_heavy    C with every frame's left half replaced -> far in
                both metrics (true negative).
  vd_d, vd_e    distinct fillers (no dups).

The generator recomputes every keyframe dHash and per-frame gray
distance and ASSERTS the properties above, so the committed corpus
can never drift out of the story the queries tell. Constants (SIDE,
luma weights, FRAME_TRUTH, stride, containment gate) are pinned by
flink_pipeline_spark/plans/video_dedup.py — keep in sync.
"""

from __future__ import annotations

import os

OUT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "fixtures", "video")
)

SIDE = 16
GRID = 8
LUMA = (299, 587, 114)
N_FRAMES = 8
STRIDE = 2  # keyframe stride (VID_KEY_STRIDE)
FRAME_TRUTH = 2_000_000  # per-frame truth: sum |gray_a - gray_b| <= this
CONT_GATE = 0.5  # fp-set containment decision gate


def pat(seed: int, i: int):
    """Frame ``i`` of the asset family ``seed`` — smooth per-frame
    pattern, values <= 200 so +16 never clips."""

    def px(x: int, y: int):
        return (
            (x * (13 + seed) + y * 7 + i * 31) % 200,
            (x * 3 + y * (17 + 2 * seed) + i * 53) % 200,
            (x * 11 + y * 5 + i * (59 + seed)) % 200,
        )

    return [[px(x, y) for x in range(SIDE)] for y in range(SIDE)]


def gray(img):
    return [
        [sum(w * c for w, c in zip(LUMA, px)) for px in row] for row in img
    ]


def cell_sums(img):
    g = gray(img)
    cells = [0] * (GRID * GRID)
    for y in range(SIDE):
        for x in range(SIDE):
            cells[(y * GRID // SIDE) * GRID + (x * GRID // SIDE)] += g[y][x]
    return cells


def dhash_bits(img):
    """64 bits: bit (r, k) = 1 iff cell[r][k] > cell[r][(k+1) % 8] —
    operators/multimodal.dhash_bands' exact rule."""
    c = cell_sums(img)
    out = []
    for r in range(GRID):
        for k in range(GRID):
            out.append(
                1 if c[r * GRID + k] > c[r * GRID + (k + 1) % GRID] else 0
            )
    return out


def gray_dist(i1, i2):
    g1, g2 = gray(i1), gray(i2)
    return sum(
        abs(g1[y][x] - g2[y][x]) for y in range(SIDE) for x in range(SIDE)
    )


def shift(img, delta):
    return [
        [tuple(min(255, c + delta) for c in px) for px in row] for row in img
    ]


def replace_left_half(img, seed, i):
    alt = pat(seed + 7, i + 3)
    return [
        [alt[y][x] if x < SIDE // 2 else img[y][x] for x in range(SIDE)]
        for y in range(SIDE)
    ]


def uniform_cell_noise(img):
    """+1 green on the top row of every 2x2 cell: every cell's luma
    sum moves by exactly 2 * 587, so no gradient order flips."""
    out = [list(row) for row in img]
    for y in range(0, SIDE, 2):
        for x in range(SIDE):
            r, g, b = out[y][x]
            out[y][x] = (r, min(255, g + 1), b)
    return out


def dhash_jitter(img, max_delta=60):
    """Flip >= 1 dHash bit: push the closest same-row cell pair across
    its order boundary via the green channel (the boundary_noise idea
    of make_phash_fixtures.py, applied to the GRADIENT rule)."""
    base = dhash_bits(img)
    out = [list(row) for row in img]
    cells = cell_sums(out)
    margins = []
    for r in range(GRID):
        for k in range(GRID):
            c, rn = r * GRID + k, r * GRID + (k + 1) % GRID
            margins.append((abs(cells[c] - cells[rn]), c))
    span = SIDE // GRID
    for margin, c in sorted(margins):
        d = margin // (span * span * LUMA[1]) + 1
        if d > max_delta:
            continue
        sign = -1 if dhash_bits(out)[c] else 1
        cy, cx = divmod(c, GRID)
        ok = True
        trial = [list(row) for row in out]
        for yy in range(cy * span, (cy + 1) * span):
            for xx in range(cx * span, (cx + 1) * span):
                r_, g_, b_ = trial[yy][xx]
                g2 = g_ + sign * d
                if not 0 <= g2 <= 255:
                    ok = False
                trial[yy][xx] = (r_, g2, b_)
        if not ok:
            continue
        if dhash_bits(trial) != base:
            return trial
    raise SystemExit("could not flip a dHash bit within max_delta")


def fvid_bytes(frames):
    hdr = f"FV01 {SIDE:04d} {SIDE:04d} {len(frames):04d}\n".encode("ascii")
    px = bytearray()
    for img in frames:
        for row in img:
            for p in row:
                px.extend(p)
    return hdr + bytes(px)


def keyframes(frames):
    return [frames[i] for i in range(0, len(frames), STRIDE)]


def fp(img):
    return tuple(dhash_bits(img))


def fpset(frames):
    return {fp(f) for f in keyframes(frames)}


def containment(fa, fb):
    sa, sb = fpset(fa), fpset(fb)
    return len(sa & sb) / min(len(sa), len(sb))


def truth_containment(fa, fb):
    """Fraction of A's keyframes with a pixel-close match in B's."""
    ka, kb = keyframes(fa), keyframes(fb)
    hit = sum(
        1
        for f1 in ka
        if any(gray_dist(f1, f2) <= FRAME_TRUTH for f2 in kb)
    )
    return hit / len(ka)


def main() -> None:
    a = [pat(0, i) for i in range(N_FRAMES)]
    b = [pat(1, i) for i in range(N_FRAMES)]
    c = [pat(2, i) for i in range(N_FRAMES)]
    assets = {
        "vd_a": a,
        "vd_a_bright": [shift(f, 16) for f in a],
        "vd_a_clip": a[2:] + [pat(0, 100), pat(0, 101)],
        "vd_a_noise": [uniform_cell_noise(f) for f in a],
        "vd_b": b,
        "vd_b_rot": b[2:] + b[:2],
        "vd_b_jitter": [
            dhash_jitter(f) if i % STRIDE == 0 else f
            for i, f in enumerate(b)
        ],
        "vd_c": c,
        "vd_c_heavy": [
            replace_left_half(f, 2, i) for i, f in enumerate(c)
        ],
        "vd_d": [pat(3, i) for i in range(N_FRAMES)],
        "vd_e": [pat(4, i) for i in range(N_FRAMES)],
    }

    # --- assert the engineered story ---------------------------------
    # brightness: fp-identical, pixel-far
    assert containment(assets["vd_a"], assets["vd_a_bright"]) == 1.0
    assert truth_containment(assets["vd_a"], assets["vd_a_bright"]) == 0.0
    # clip: 3 of 4 keyframes shared, truth agrees
    assert containment(assets["vd_a"], assets["vd_a_clip"]) == 0.75
    assert truth_containment(assets["vd_a_clip"], assets["vd_a"]) >= CONT_GATE
    # noise: no gradient flip anywhere, pixel-close
    assert containment(assets["vd_a"], assets["vd_a_noise"]) == 1.0
    assert truth_containment(assets["vd_a"], assets["vd_a_noise"]) == 1.0
    # rotation: identical keyframe SET
    assert fpset(assets["vd_b"]) == fpset(assets["vd_b_rot"])
    assert truth_containment(assets["vd_b"], assets["vd_b_rot"]) == 1.0
    # jitter: EVERY keyframe fp flipped, yet pixel-close
    assert not fpset(assets["vd_b"]) & fpset(assets["vd_b_jitter"])
    assert truth_containment(assets["vd_b"], assets["vd_b_jitter"]) == 1.0
    # heavy: far in both metrics
    assert containment(assets["vd_c"], assets["vd_c_heavy"]) < CONT_GATE
    assert truth_containment(assets["vd_c"], assets["vd_c_heavy"]) == 0.0
    # fillers share nothing with anything
    for f in ("vd_d", "vd_e"):
        for other, fr in assets.items():
            if other != f:
                assert not fpset(assets[f]) & fpset(fr), (f, other)

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, frames in sorted(assets.items()):
        path = os.path.join(OUT_DIR, f"{name}.fvid")
        with open(path, "wb") as fh:
            fh.write(fvid_bytes(frames))
        print(f"wrote {path} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
