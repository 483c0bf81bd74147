import time
from supersonic_spark.session import get_spark, load_tables
from supersonic_spark.pipeline import dedup
spark = get_spark("diag3"); spark.sparkContext.setLogLevel("ERROR")
docs = load_tables(spark, "/tmp/ss_bench_opt_tmp_supersonic_scale_sf30")["documents"]
print("npart(docs scan):", docs.rdd.getNumPartitions(), flush=True)
t0=time.time()
out = dedup.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5, verify="estimate")
out.write.format("noop").mode("overwrite").save()
print("estimate sf30:", round(time.time()-t0,1), flush=True)
