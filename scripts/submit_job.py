"""spark-submit driver script.

    python scripts/build_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/dataqualityassistant_spark.zip \
        scripts/submit_job.py filter --input <pages> --output <scored> \
        --metrics <m> --lineage <l> --checkpoint <c> --run-id <id>

The zip on --py-files lands on every executor's PYTHONPATH; this script
only needs the library importable on the driver (also provided by the zip).
"""

import sys

from dataqualityassistant_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
