"""Generate the committed audio-fingerprint dedup fixture corpus.

Outputs fixtures/audio_fp/afp_*.wav — NINE mono 8000 Hz PCM16 WAVs of
exactly 4096 samples (64 energy windows x 64 samples), engineered so
the audio near-dup query (q_dedup_audio_fp) and its recall audit
(q_dedup_audio_fp_recall) have honest, non-trivial readings — the
audio twin of make_phash_fixtures.py:

  afp_a        base signal A
  afp_a_gain   A with every sample EXACTLY doubled (clip-free) ->
               fingerprint-IDENTICAL (the energy-gradient hash
               compares window energies to each other, and uniform
               gain scales all energies together) but OUTSIDE the
               sample-distance truth: the precision<1 reading — gain
               invariance is the point of an audio fingerprint.
  afp_a_noise  A with small boundary-targeted noise -> hamming <= 3
               (detected) and inside sample truth (a true positive).
  afp_b        base signal B
  afp_b_noise  B with moderate noise -> hamming in 4..12 (MISSED at
               the lossless-3 threshold) but inside sample truth:
               the recall<1 reading.
  afp_c        base signal C
  afp_c_heavy  C with its first half replaced -> far in both metrics.
  afp_d/e      distinct fillers (no dups).

The fingerprint replicated here (keep in sync with
operators/multimodal.audio_fp_bands and plans/audio_dedup.py): split
the mono stream into 64 equal windows, window energy = exact integer
sum of |sample|, bit w = 1 iff e[w] > e[(w+1) % 64] (temporal energy
gradient with wraparound — the dHash rule on the time axis), packed
16 bits per band into 4 band keys.

The generator recomputes the fingerprint and the exact sample
distance for every engineered pair and ASSERTS the properties above,
so the committed corpus can never drift out of the story the queries
tell.
"""

from __future__ import annotations

import os
import struct

OUT_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "fixtures", "audio_fp")
)

N = 4096          # samples per fixture (mono)
WINDOWS = 64      # fingerprint windows (=> 64 samples per window)
RATE = 8000
TRUTH_SUM = 200_000  # near-dup truth: sum |a_k - b_k| <= this


def sig_a(k: int) -> int:
    return ((k * 13 + 7) % 97) * 21 - 1000


def sig_b(k: int) -> int:
    return ((k * 29 + 3) % 89) * 23 - 1010


def sig_c(k: int) -> int:
    return ((k * 41 + 11) % 83) * 24 - 980


def sig_d(k: int) -> int:
    return ((k * 53 + 17) % 79) * 25 - 975


def sig_e(k: int) -> int:
    return ((k * 61 + 23) % 73) * 27 - 970


def sig_f(k: int) -> int:
    return ((k * 71 + 31) % 67) * 29 - 950


def render(sig) -> list[int]:
    return [sig(k) for k in range(N)]


def energies(s: list[int]) -> list[int]:
    w = N // WINDOWS
    return [
        sum(abs(v) for v in s[i * w : (i + 1) * w]) for i in range(WINDOWS)
    ]


def fp_bits(s: list[int]) -> list[int]:
    e = energies(s)
    return [
        1 if e[w] > e[(w + 1) % WINDOWS] else 0 for w in range(WINDOWS)
    ]


def hamming(b1, b2) -> int:
    return sum(a != b for a, b in zip(b1, b2))


def dist(s1, s2) -> int:
    return sum(abs(a - b) for a, b in zip(s1, s2))


def gain(s: list[int], factor: int = 2) -> list[int]:
    out = [v * factor for v in s]
    assert all(-32768 <= v <= 32767 for v in out), "gain clipped"
    return out


def replace_first_half(s: list[int], sig) -> list[int]:
    return [sig(k) if k < N // 2 else s[k] for k in range(N)]


def boundary_noise(s: list[int], n_flips: int, max_delta: int = 40) -> list[int]:
    """Deterministic noise that actually moves the fingerprint: find
    the gradient comparison with the smallest energy margin among
    bits still matching the base, and nudge that window's energy just
    across it by growing every sample's |value| by the same d (sign-
    preserving, so |s|+d exactly adds 64*d to the window energy and
    64*d to the sample distance). Real audio noise flips exactly
    these near-tie windows first — far-apart windows are why energy
    fingerprints are noise-robust at all."""
    out = list(s)
    base = fp_bits(s)
    w = N // WINDOWS
    while hamming(base, fp_bits(out)) < n_flips:
        e = energies(out)
        cur = fp_bits(out)
        margins = sorted(
            (abs(e[i] - e[(i + 1) % WINDOWS]), i)
            for i in range(WINDOWS)
            if cur[i] == base[i]
        )
        moved = False
        for margin, i in margins:
            d = margin // w + 1
            if d > max_delta:
                continue
            # flip bit i by growing e[i] (if currently 0) or growing
            # e[i+1] (if currently 1)
            tgt = i if cur[i] == 0 else (i + 1) % WINDOWS
            cand = list(out)
            for k in range(tgt * w, (tgt + 1) * w):
                v = cand[k]
                nv = v + d if v >= 0 else v - d
                if not -32768 <= nv <= 32767:
                    break
                cand[k] = nv
            else:
                if hamming(base, fp_bits(cand)) > hamming(
                    base, fp_bits(out)
                ):
                    out = cand
                    moved = True
                    break
        if not moved:
            raise SystemExit(
                f"could not reach {n_flips} flips within "
                f"max_delta={max_delta}"
            )
    return out


def wav_bytes(samples: list[int]) -> bytes:
    data = b"".join(struct.pack("<h", v) for v in samples)
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, RATE, RATE * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    assert len(hdr) == 44
    return hdr + data


def main() -> None:
    a, b, c = render(sig_a), render(sig_b), render(sig_c)
    sounds = {
        "afp_a": a,
        "afp_a_gain": gain(a, 2),
        "afp_a_noise": boundary_noise(a, 2),
        "afp_b": b,
        "afp_b_noise": boundary_noise(b, 5),
        "afp_c": c,
        "afp_c_heavy": replace_first_half(c, sig_f),
        "afp_d": render(sig_d),
        "afp_e": render(sig_e),
    }
    h = {k: fp_bits(v) for k, v in sounds.items()}
    checks = {
        "gain fp-invariant": hamming(h["afp_a"], h["afp_a_gain"]) == 0,
        "small noise detected (1..3)": 1
        <= hamming(h["afp_a"], h["afp_a_noise"])
        <= 3,
        "moderate noise missed (4..12)": 4
        <= hamming(h["afp_b"], h["afp_b_noise"])
        <= 12,
        "heavy corruption far (>12)": hamming(h["afp_c"], h["afp_c_heavy"])
        > 12,
        "truth holds a/a_noise": dist(sounds["afp_a"], sounds["afp_a_noise"])
        <= TRUTH_SUM,
        "truth holds b/b_noise": dist(sounds["afp_b"], sounds["afp_b_noise"])
        <= TRUTH_SUM,
        "truth rejects a/a_gain": dist(sounds["afp_a"], sounds["afp_a_gain"])
        > TRUTH_SUM,
        "truth rejects c/c_heavy": dist(
            sounds["afp_c"], sounds["afp_c_heavy"]
        )
        > TRUTH_SUM,
    }
    for name, ok in checks.items():
        print(("OK  " if ok else "FAIL") + " " + name)
    print(
        "hammings: a/gain=%d a/noise=%d b/noise=%d c/heavy=%d"
        % (
            hamming(h["afp_a"], h["afp_a_gain"]),
            hamming(h["afp_a"], h["afp_a_noise"]),
            hamming(h["afp_b"], h["afp_b_noise"]),
            hamming(h["afp_c"], h["afp_c_heavy"]),
        )
    )
    print(
        "dists: a/gain=%d a/noise=%d b/noise=%d c/heavy=%d"
        % (
            dist(sounds["afp_a"], sounds["afp_a_gain"]),
            dist(sounds["afp_a"], sounds["afp_a_noise"]),
            dist(sounds["afp_b"], sounds["afp_b_noise"]),
            dist(sounds["afp_c"], sounds["afp_c_heavy"]),
        )
    )
    if not all(checks.values()):
        raise SystemExit("fixture properties not met — tune the noise")

    os.makedirs(OUT_DIR, exist_ok=True)
    for name, s in sounds.items():
        path = os.path.join(OUT_DIR, f"{name}.wav")
        with open(path, "wb") as f:
            f.write(wav_bytes(s))
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    main()
