"""Build the --py-files artifact for spark-submit (north_rule launch mode).

    python tools/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files medalforge_lakehouse_data_spark.zip \\
        --master spark://... your_job.py
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "medalforge_lakehouse_data_spark"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(os.path.join(ROOT, PKG)):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    abs_p = os.path.join(dirpath, fn)
                    z.write(abs_p, os.path.relpath(abs_p, ROOT))
    print(out)


if __name__ == "__main__":
    main()
