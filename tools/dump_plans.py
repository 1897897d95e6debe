"""Dump .explain('formatted') for named registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <tag> <suffix> <query> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt. Queries whose builders execute
jobs while building (loop operators) still dump the plan of the RETURNED
frame; their evidence is bench seconds + job counts, recorded in the
round's OPTIMIZATION notes.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")


def main():
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from manuscript_ocr_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
