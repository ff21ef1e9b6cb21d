"""Package docling_rag_spark for spark-submit --py-files.

Usage: python tools/make_pyfiles.py [out.zip]   (default dist/docling_rag_spark.zip)

Then: spark-submit --py-files dist/docling_rag_spark.zip jobs/extract_job.py \
        --input <corpus> --output <dir>
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "docling_rag_spark.zip"
    out.parent.mkdir(parents=True, exist_ok=True)
    pkg = REPO / "docling_rag_spark"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(pkg.rglob("*.py")):
            z.write(f, f.relative_to(REPO))
    print(out)


if __name__ == "__main__":
    main()
