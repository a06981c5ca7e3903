#!/usr/bin/env python
"""spark-submit driver script.

    spark-submit --master <cluster> --py-files dist/wrangler_spark.zip \
        scripts/replay_job.py replay --events ... --table ... --checkpoint ...

The zip (built by `python -m wrangler_spark package`) carries the whole
engine; this script is the only file shipped outside it.
"""
import sys

from wrangler_spark.cli import main

sys.exit(main())
