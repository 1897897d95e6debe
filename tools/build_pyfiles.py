"""Build the spark-submit --py-files artifact (north_rule shipping story):
a zip of the manuscript_ocr_spark package importable on executors.

Usage: python tools/build_pyfiles.py [out_zip]
"""

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_zip=None):
    out_zip = out_zip or os.path.join(ROOT, "dist", "manuscript_ocr_spark.zip")
    os.makedirs(os.path.dirname(out_zip), exist_ok=True)
    pkg = os.path.join(ROOT, "manuscript_ocr_spark")
    with zipfile.ZipFile(out_zip, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    return out_zip


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
