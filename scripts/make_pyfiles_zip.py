#!/usr/bin/env python
"""Build dist/recsplit_spark.zip for spark-submit --py-files."""

import os
import zipfile


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "recsplit_spark")
    out_dir = os.path.join(repo, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "recsplit_spark.zip")
    with zipfile.ZipFile(out, "w") as zf:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, repo))
    print(out)


if __name__ == "__main__":
    main()
