#!/usr/bin/env python
"""spark-submit entry script.

Use THIS file (repo root) as the spark-submit target, not
sketchlib/cli.py: spark-submit puts the script's directory at
sys.path[0], and the package directory contains module names that
would shadow stdlib modules (tokenize, ...) during pyspark startup.

    spark-submit --master ... --py-files sketchlib.zip submit.py \
        count --parquet /data/transcripts -w 1048576 -H 7 -n 4 -c \
        -o sketch.bin
"""

import sys

from sketchlib.cli import main

if __name__ == "__main__":
    sys.exit(main())
