"""One-off: verify lucene_spark.util.spark_hash matches Spark's F.hash."""

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from lucene_spark.util.spark_hash import spark_hash_str

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "4g")
    .appName("hashcheck")
    .getOrCreate()
)
strs = [
    "",
    "a",
    "hello world",
    "https://site1.example/p/1",
    "café",
    "中文",
    "x" * 100,
    "İstanbul",
    "ÿ",
    "abc",
    "abcd",
    "abcde",
]
df = spark.createDataFrame([(s,) for s in strs], ["s"]).select(
    "s", F.hash("s").alias("h")
)
ok = True
for r in df.collect():
    mine = spark_hash_str(r["s"])
    if mine != r["h"]:
        ok = False
        print("MISMATCH", repr(r["s"]), r["h"], mine)
print("HASH MATCH" if ok else "HASH FAIL")
spark.stop()
