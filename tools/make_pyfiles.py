"""Package the engine for ``spark-submit --py-files``.

Zips the ``information_extraction_from_biographies_spark`` package (sources only,
no __pycache__) into ``dist/engine.zip`` — the artifact a cluster launch
ships to every executor:

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/engine.zip \
        tools/run_pipeline.py --transcripts <parquet> --warehouse <dir>

Deterministic output (fixed timestamps, sorted entries) so repeated builds
of identical sources are byte-identical — re-submits don't re-upload.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "information_extraction_from_biographies_spark"


def build(out_path: str | None = None) -> str:
    out_path = out_path or os.path.join(REPO, "dist", "engine.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    entries = []
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        if "__pycache__" in root:
            continue
        for name in sorted(files):
            if not name.endswith(".py"):
                continue
            full = os.path.join(root, name)
            entries.append((os.path.relpath(full, REPO), full))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for arcname, full in sorted(entries):
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
            info.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(info, data)
    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else None))
