"""Build the --py-files zip and print the spark-submit command line
(the reference's `entalator` installer equivalent: packaging for a
multi-executor deployment).

Usage: python scripts/package.py [out.zip]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lopez_spark.session import _package_zip  # noqa: E402


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "lopez_spark.zip"
    built = _package_zip()
    if os.path.abspath(built) != os.path.abspath(out):
        import shutil

        shutil.copy(built, out)
    print(f"built {out}")
    print(
        "submit with:\n"
        f"  spark-submit --master <cluster> --py-files {out} \\\n"
        "    --conf spark.sql.adaptive.enabled=true \\\n"
        "    --conf spark.sql.shuffle.partitions=<4x total cores> \\\n"
        "    your_crawl_job.py"
    )


if __name__ == "__main__":
    main()
