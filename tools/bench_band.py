#!/usr/bin/env python3
"""Regenerate bench_noise_band.csv from bench_history.csv.

Per query: cross-round median +/- max(3*MAD, 20% of median). The MAD
term tracks genuine run-to-run variance once enough rounds exist; the
20% floor absorbs JIT/disk-cache jitter that dominates sub-second
queries (see the round-6 variance diagnosis in SCALING.md). A new
round's time is a suspected regression only above band_hi_s, and a
claimed improvement only below band_lo_s.
"""
import csv
import statistics
import sys


def main(hist="bench_history.csv", out="bench_noise_band.csv"):
    rows = list(csv.DictReader(open(hist)))
    byq = {}
    for r in rows:
        byq.setdefault(r["query"], []).append(float(r["seconds"]))
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["query", "n_rounds", "median_s", "mad_s",
                    "band_lo_s", "band_hi_s"])
        for q, vals in sorted(byq.items()):
            med = statistics.median(vals)
            mad = statistics.median(abs(v - med) for v in vals)
            band = max(3 * mad, 0.2 * med)
            w.writerow([q, len(vals), round(med, 3), round(mad, 3),
                        round(med - band, 3), round(med + band, 3)])
    print(f"{out}: {len(byq)} queries")


if __name__ == "__main__":
    main(*sys.argv[1:])
