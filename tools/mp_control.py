"""Paired no-Spark scaling control for BENCH/BASELINE.md: the same
page_to_line_texts kernel over the same bench pages via a plain mp.Pool,
at N and 4N workers — run in the SAME window as tools/bench_scaling.py so
the two jobs see the same co-tenant load. If the zero-overhead control hits
the same N→4N efficiency ceiling as the Spark pipeline, the ceiling is host
saturation, not the plan (the round-2 finding this keeps reproducible).

Usage: python tools/mp_control.py [tier] [trials]
       python tools/mp_control.py realistic [trials]   (model-realistic
       per-page cost: stand-in kernel + calibrated real-EAST numpy burn,
       paired with `bench_scaling.py realistic`)
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, "/root/repo")

for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(var, "1")

_CTX = {}


def _init(tier_dir: str, realistic: bool = False):
    import pyarrow.parquet as pq

    from manuscript_ocr_spark.fixtures import PAGE_SIZE
    from manuscript_ocr_spark.models.east_tiny import DetectorConfig
    from manuscript_ocr_spark.models.glyphs import build_weights

    if realistic:
        from manuscript_ocr_spark.models.numpy_twins import build_realistic_weights

        _CTX["weights"] = build_realistic_weights()
    else:
        _CTX["weights"] = build_weights()
    _CTX["cfg"] = DetectorConfig(target_size=PAGE_SIZE)
    _CTX["media"] = pq.read_table(f"{tier_dir}/media.parquet")


def _ocr_rows(args):
    lo, hi = args
    from manuscript_ocr_spark.oracle import decode_media, page_to_line_texts

    tbl = _CTX["media"].slice(lo, hi - lo).to_pylist()
    out = 0
    for m in tbl:
        img = decode_media(m["pixels"], m["height"], m["width"], m["channels"])
        out += len(page_to_line_texts(img, _CTX["weights"], _CTX["cfg"]))
    return out


def run_at(workers: int, tier_dir: str, n_pages: int, trials: int,
           realistic: bool = False):
    chunks = [
        (i, min(i + 8, n_pages)) for i in range(0, n_pages, 8)
    ]  # 8-page chunks ≈ the parquet row-group granularity the Spark scan uses
    times = []
    with mp.Pool(workers, initializer=_init,
                 initargs=(tier_dir, realistic)) as pool:
        pool.map(_ocr_rows, chunks[: max(4, workers)])  # warm
        for _ in range(trials):
            t = time.time()
            pool.map(_ocr_rows, chunks, chunksize=1)
            times.append(time.time() - t)
    return min(times), times


def main():
    tier = sys.argv[1] if len(sys.argv) > 1 else "sf-bench"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    realistic = tier == "realistic"
    if realistic:
        tier = "sf-realistic"

    import pyarrow.parquet as pq

    from manuscript_ocr_spark.fixtures import ensure_tier

    tier_dir = ensure_tier(tier)
    n_pages = pq.ParquetFile(f"{tier_dir}/media.parquet").metadata.num_rows

    results = {}
    levels = (2, 8, 4, 16, 32) if realistic else (8, 32)
    for workers in levels:
        best, times = run_at(workers, tier_dir, n_pages, trials,
                             realistic=realistic)
        results[workers] = best
        print(
            f"mp.Pool[{workers}]: best {best:.1f}s of "
            f"{['%.1f' % t for t in times]} → {n_pages / best:.1f} pages/sec",
            flush=True,
        )
    pairs = [(2, 8), (4, 16), (8, 32)] if realistic else [(8, 32)]
    for n, n4 in pairs:
        if n in results and n4 in results:
            eff = (n_pages / results[n4]) / (4 * (n_pages / results[n]))
            print(f"mp control {n}→{n4} efficiency: {eff:.3f}")


if __name__ == "__main__":
    main()
