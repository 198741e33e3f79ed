
import sys, time
sys.path.insert(0, '/root/repo')
from pyspark.sql import functions as F
from barefoot_spark.session import build_session
spark = build_session(app="p", master="local[1]", shuffle_partitions=1)
spark.sparkContext.setLogLevel("ERROR")
n = 8_000_000
pts = (spark.range(0, n, 1, 2)
       .withColumn("lat", (F.col("id") % 9973)/9973.0)
       .withColumn("lon", ((F.col("id")*7919) % 9973)/9973.0))
def passthrough(batches):
    for rb in batches: yield rb
pts.limit(100_000).mapInArrow(passthrough, pts.schema).agg(F.count("*")).collect()
t0=time.time(); pts.mapInArrow(passthrough, pts.schema).agg(F.count("*")).collect()
print(n/(time.time()-t0))
spark.stop()
