"""Sweep shuffle.partitions x bin width for the flagship binned join at sf0.1.

Usage: python tools/tune_flagship.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import __spark_entry__ as entry
from sequila_native_spark.operators.interval_join import overlap_join, clear_bin_width_cache

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .appName("tune-flagship")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "24g")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1000).count()

reads = entry._reads(spark, sf_dir, with_id=False)
targets = entry._targets(spark, sf_dir)

results = []
for parts in (32, 64, 128):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    for width in ("auto", 1000, 2000, 5000, 10000):
        clear_bin_width_cache()
        times = []
        for _ in range(2):
            t0 = time.time()
            oj = overlap_join(reads, targets, on="contig",
                              left_start="r_start", left_end="r_end",
                              right_start="t_start", right_end="t_end",
                              algorithm="binning",
                              bin_width=None if width == "auto" else width)
            df = oj.groupBy("contig").agg(F.count(F.lit(1)).alias("n_pairs"))
            df.write.mode("overwrite").format("noop").save()
            times.append(time.time() - t0)
        best = min(times)
        results.append((parts, width, best))
        print(f"parts={parts} width={width}: {best:.2f}s  (runs: {['%.2f' % t for t in times]})", flush=True)

print("\nbest:", min(results, key=lambda r: r[2]))
spark.stop()
