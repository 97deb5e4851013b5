"""spark-submit launcher for the maintenance CLI.

spark-submit takes a SCRIPT, not a module (-m is not a spark-submit
flag), so cluster submissions go through this file:

    zip -r dlq.zip datalakequality_spark
    spark-submit --py-files dlq.zip scripts/dlq_cli.py \
        rewrite --table hdfs://.../seqs --method hilbert --gate

The zip on --py-files lands on sys.path for the driver and every
executor; all logic lives in datalakequality_spark.cli.
"""

import sys

from datalakequality_spark.cli import main

if __name__ == "__main__":
    main(sys.argv[1:])
