"""Two-parallelism scaling evidence (BASELINE.json north_rule substitute):
run the identical extraction job on identical input at local[8] (N) and
local[32] (4N) on this 32-core host, report docs/sec at both and
efficiency = throughput(4N) / (4 × throughput(N)), target ≥ 0.8.
Writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [tier]
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, "/root/repo")


def run_at(cpus: int, tier: str):
    from manuscript_ocr_spark.session import get_spark
    from bench import run_extraction

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name=f"msocr-scaling-{cpus}",
        shuffle_partitions=max(32, cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/Arrow paths with a tiny run so the measured run isn't
    # paying one-time initialization
    run_extraction(spark, "sf-small")
    sec, n_docs = run_extraction(spark, tier)
    spark.stop()
    return sec, n_docs


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "sf-bench"
    n_small, n_big = 8, 32

    sec_n, docs = run_at(n_small, tier)
    thr_n = docs / sec_n
    print(f"local[{n_small}]: {sec_n:.1f}s, {thr_n:.1f} docs/sec")

    sec_4n, _ = run_at(n_big, tier)
    thr_4n = docs / sec_4n
    print(f"local[{n_big}]: {sec_4n:.1f}s, {thr_4n:.1f} docs/sec")

    eff = thr_4n / (4 * thr_n)
    print(f"efficiency: {eff:.3f}")

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    stamp = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — scaling efficiency evidence

{stamp} — identical extraction job (detect + recognize + span-reassemble +
parquet sink) on identical input ({tier}: {docs} interleaved docs, 600
distinct pages) at two parallelism levels on the 32-core host, per the
sandbox substitution for the north_rule's two-cluster-size criterion
(SURVEY.md §6).

| parallelism | wall time | throughput |
|---|---|---|
| local[{n_small}] (N) | {sec_n:.1f} s | {thr_n:.1f} docs/sec |
| local[{n_big}] (4N) | {sec_4n:.1f} s | {thr_4n:.1f} docs/sec |

**Scaling efficiency = throughput(4N) / (4 × throughput(N)) = {eff:.3f}**
(target ≥ 0.8).

Reference single-node point of comparison: the reference detector alone
averages 0.604 s/image on a Colab-class GPU (BASELINE.md); this engine's
full detect+recognize+reassemble pipeline processes {docs / sec_4n:.0f}
docs/sec end-to-end at local[32] on CPU.
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
