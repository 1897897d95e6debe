"""Paired drift check (round-5 verdict item 3): dedup_simhash_pairs,
text_corpus_select and sim_cosine_topk drifted +29–35% between BENCH_r04
and BENCH_r05 on code the round-5 diff never touched (verified: text.py
and dedup.py are byte-identical since before round 5, and
cosine_topk/_dot/_norm/_emb are function-identical — the r4 binary IS the
HEAD binary for these paths, so an r4-tag-vs-HEAD A/B would run the same
code on both sides). What CAN differ is the measurement window
(co-tenancy; the band in BENCH/BASELINE.md swings ±2x) — so the pairing
method here is the REALISTIC.md one: many INTERLEAVED reps of all three
queries in ONE session/window, giving the within-window noise band each
recorded round value is judged against.

Usage: python tools/bench_drift.py [sf_dir] [reps] [query ...]  →
markdown for BENCH/DRIFT.md. With explicit query names (round-6 verdict
item 4: the CC-based rows needed a band) the recorded-round columns are
filled from RECORDED when available and '-' otherwise — the output is
then a within-window band for future rounds to judge their draws
against.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

RECORDED = {
    # BENCH_r04 / BENCH_r05 values at sf0.1 (the drift under test)
    "dedup_simhash_pairs": (2.556, 3.408),
    "text_corpus_select": (0.840, 1.133),
    "sim_cosine_topk": (0.496, 0.642),
}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    names = sys.argv[3:] or list(RECORDED)

    import __spark_entry__ as entry
    from manuscript_ocr_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", app_name="bench-drift")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()

    # same warm-up the bench harness does
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for n in names:  # one untimed warm pass each (JIT/codegen/footers)
        queries[n](spark, sf_dir).count()

    times: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):            # interleaved ABCABC… — one window
        for n in names:
            t0 = time.time()
            queries[n](spark, sf_dir).count()
            times[n].append(time.time() - t0)

    print(f"| query | reps | min | median | max | r4 | r5 | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for n in names:
        ts = times[n]
        lo, med, hi = min(ts), statistics.median(ts), max(ts)
        # generous window-noise band: the harness values include plan
        # build + first-action overhead under a concurrently-loaded box,
        # so judge them against [0.8*min, 1.3*max] of this window's band
        band_lo, band_hi = 0.8 * lo, 1.3 * hi
        if n in RECORDED:
            r4, r5 = RECORDED[n]
            inside = band_lo <= r4 <= band_hi and band_lo <= r5 <= band_hi
            v = ("both in band → window noise" if inside
                 else "OUTSIDE band → investigate")
            rec = f"{r4:.3f} | {r5:.3f}"
        else:
            rec = "- | -"
            v = f"band [{band_lo:.2f}, {band_hi:.2f}] recorded"
        print(f"| {n} | {len(ts)} | {lo:.3f} | {med:.3f} | {hi:.3f} "
              f"| {rec} | {v} |")
    spark.stop()


if __name__ == "__main__":
    main()
