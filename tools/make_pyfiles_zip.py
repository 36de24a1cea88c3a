"""Build dist/rust_timeseries_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out_dir = os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "rust_timeseries_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(ROOT, "rust_timeseries_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                # .c: native/kernels.c ships in the zip so executors can
                # compile the fast-path kernels on first import (pure-
                # Python fallback if the node has no compiler)
                if fn.endswith((".py", ".c")):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, ROOT))
    print(out)


if __name__ == "__main__":
    main()
    sys.exit(0)
