import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from unstract_spark.operators import dedup
from unstract_spark.session import get_spark

spark = get_spark("prof")
spark.range(10).count()
d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

sh = dedup.char_shingles(d)
for i in range(2):
    t0 = time.time()
    n = sh.count()
    print(f"shingles run{i}: {n} rows {time.time()-t0:.2f}s")

t0 = time.time()
sh.select(F.md5("shingle").alias("h")).agg(F.max("h")).collect()
print(f"one-md5 pass: {time.time()-t0:.2f}s")

sigs = dedup.minhash_signatures(sh)
for i in range(2):
    t0 = time.time()
    sigs.count()
    print(f"sigs run{i}: {time.time()-t0:.2f}s")
