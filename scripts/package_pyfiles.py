"""Build the --py-files artifact: engine.zip containing the package.

Usage:  python scripts/package_pyfiles.py [out.zip]
Then:   spark-submit --py-files out.zip scripts/submit_smoke.py ...
"""

from __future__ import annotations

import os
import sys
import zipfile

PKG = "ccdb_data_pipeline_spark"


def build(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirs, files in os.walk(os.path.join(root, PKG)):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(files):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    print(build(out))
