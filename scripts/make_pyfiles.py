#!/usr/bin/env python3
"""Build dist/xjs.zip for spark-submit --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    dist = REPO / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "xjs.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pat in ("*.py", "*.pkl"):  # .pkl: package-data model artifacts
            for p in sorted((REPO / "xjs").rglob(pat)):
                z.write(p, p.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
