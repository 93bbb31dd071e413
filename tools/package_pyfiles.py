"""Build the --py-files artifact for spark-submit deployment.

north_rule: "run via spark-submit --py-files on a multi-executor cluster".
The engine is a pure-python package, so deployment is one zip:

    python tools/package_pyfiles.py                 # -> dist/fia_own_map_spark.zip
    spark-submit --py-files dist/fia_own_map_spark.zip \\
        jobs/run_er.py --input s3://bucket/pages --output s3://bucket/er \\
        --checkpoints s3://bucket/ckpt --mode similarity

The zip is importable from executors via zipimport (verified by
tests/test_packaging.py, which imports the engine from the zip in a clean
subprocess)."""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "fia_own_map_spark.zip")
    pkg_root = os.path.join(REPO, "fia_own_map_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return out


if __name__ == "__main__":
    print(build())
