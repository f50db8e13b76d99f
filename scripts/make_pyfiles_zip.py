"""Build the --py-files archive for cluster submission.

Usage::

    python scripts/make_pyfiles_zip.py [out_dir]

then::

    spark-submit --master <cluster> \
        --py-files <out_dir>/doc_parser_spark.zip \
        scripts/run_job.py --input ... --output ...

Verified locally (this sandbox has no cluster manager)::

    spark-submit --master 'local[8]' \
        --py-files /tmp/doc_parser_spark.zip \
        scripts/run_job.py --synthetic 200 --output /tmp/job_out
"""

from __future__ import annotations

import os
import shutil
import sys


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = shutil.make_archive(
        os.path.join(out_dir, "doc_parser_spark"), "zip", repo, "doc_parser_spark"
    )
    print(path)


if __name__ == "__main__":
    main()
