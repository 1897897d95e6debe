"""Time a subset of registry queries (and optionally the cold builds) with
bench.py's methodology — warm session, builder(spark, sf_dir).count() —
without touching the frozen bench.py. Usage:

    python tools/bench_subset.py [--builds] <query> [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    args = sys.argv[1:]
    do_builds = "--builds" in args
    names = [a for a in args if not a.startswith("--")]

    import __spark_entry__ as entry
    from manuscript_ocr_spark.session import get_spark

    spark = get_spark(master=f"local[{cpus}]", app_name="msocr-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # session warm

    out = {}
    if do_builds:
        from manuscript_ocr_spark.functions import similarity as _sim
        from manuscript_ocr_spark.functions import text as _text

        for bname, builder, idx in (
            ("sim_ivfpq_build", _sim.ivfpq_build, _sim._ivfpq_index_dir(sf_dir)),
            ("sim_ivf_kmeans_build", _sim.ivf_kmeans_build,
             _sim._ivfkm_index_dir(sf_dir)),
            ("text_bpe_build", _text.bpe_build,
             _sim._ann_index_dir(
                 sf_dir, f"bpe-{_text.BPE_INDEX_VERSION}-N{_text.BPE_MERGES}",
                 data_file="documents.parquet")),
        ):
            shutil.rmtree(idx, ignore_errors=True)
            spark.sparkContext.setJobDescription(bname)
            t0 = time.time()
            builder(spark, sf_dir)
            out[bname] = round(time.time() - t0, 3)
    for name in names:
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        queries[name](spark, sf_dir).count()
        out[name] = round(time.time() - t0, 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
