"""Package ocr_lib_spark into dist/ocr_lib_spark.zip for --py-files."""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> Path:
    dist = ROOT / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "ocr_lib_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for p in sorted((ROOT / "ocr_lib_spark").rglob("*.py")):
            z.write(p, p.relative_to(ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
