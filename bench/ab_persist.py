import sys, time, tempfile, shutil, os
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from pyspark import StorageLevel

variant = sys.argv[1]
n_pages = int(sys.argv[2])
from es_loaders_spark.session import get_spark
from es_loaders_spark.analyze import SPLIT_RE_JAVA
from es_loaders_spark.build import assign_doc_ids, build_index
from es_loaders_spark.corpus import synthesize_web_pages
from es_loaders_spark.extract import with_extracted_text, _tag_strip, _named_entity_chain

spark = get_spark(f"ab-{variant}", cores=32)
spark.sparkContext.setLogLevel("ERROR")
idx = tempfile.mkdtemp(prefix=f"ab_{variant}_"); shutil.rmtree(idx, ignore_errors=True)
t0 = time.time()
pages = synthesize_web_pages(spark, n_pages, seed=42)
if variant == "mem":
    pages = pages.persist()
elif variant == "disk":
    pages = pages.persist(StorageLevel.DISK_ONLY)
# "nopersist": union recomputes the (deterministic) synth per branch
ids = assign_doc_ids(pages.select("url"))
joined = pages.join(F.broadcast(ids), "url")
if variant == "nounion":
    ext = joined.withColumn("text", _named_entity_chain(_tag_strip(F.col("html"))))
else:
    ext = with_extracted_text(joined)
docs = ext.withColumn("dl", F.size(F.filter(F.split(F.lower(F.col("text")), SPLIT_RE_JAVA), lambda t: t != F.lit("")))).select("doc_id", "text", "dl")
ingest = os.path.join(idx, "ingest")
docs.write.mode("overwrite").parquet(ingest)
spark.catalog.clearCache()
build_index(spark, spark.read.parquet(ingest), idx, n_shards=max(64, n_pages // 3000), positions=False)
print(f"RESULT {variant} {time.time()-t0:.1f}")
shutil.rmtree(idx, ignore_errors=True)
