"""Drive the engine end-to-end through its public API (verification).

Build an index over the deterministic fixture corpus with Spark, then
run real queries through Searcher — the same interface a user has.
"""

import shutil
import sys
import tempfile

from pyspark.sql import SparkSession

from lucene_spark.analysis.analyzer import ENGLISH
from lucene_spark.fixtures import make_pages
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search.searcher import Searcher

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "6g")
    .appName("drive")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

d = tempfile.mkdtemp(prefix="ls_index_")
corpus = make_pages(600)
df = spark.createDataFrame([(r["url"], r["text"]) for r in corpus], ["url", "text"])
commit = build_index(spark, df, d, IndexConfig(num_segments=4, analyzer=ENGLISH))
print(
    f"COMMIT gen={commit['generation']} segments={commit['num_segments']} "
    f"docs={commit['doc_count']} sum_tf={commit['sum_total_tf']}"
)
for s in commit["segments"]:
    print(
        f"  seg {s['segment_id']} docs={s['num_docs']} terms={s['num_terms']} "
        f"postings={s['num_postings']} bytes={s['postings_bytes']} status={s['status']}"
    )

searcher = Searcher(spark, d)
queries = [
    "w0042",
    "w0042 AND w0100",
    "w0042 OR w0999 OR w3500",
    '"w0007 w0042"',
    '"w0100 of w0200"',  # stopword-gap phrase
    "w0042 OR w010*",  # BM25 term + constant-score prefix leaf
    "w0042~1",  # fuzzy
    "fn:maxgaps(4 fn:ordered(w0007 w0042))",  # interval function syntax
]
for q in queries:
    rows = searcher.search(q, k=5).collect()
    print(f"QUERY {q!r} -> {len(rows)} hits")
    for r in rows:
        print(f"    doc={r['doc_id']} score={r['score']:.6f} url={r['url']}")
    print(f"  count = {searcher.count(q)}")

# interval query (API-only, like the reference): saturation-scored
# maxgaps-ordered pair through the same pruned kernels
from lucene_spark.search import ast as ast_mod
from lucene_spark.search import intervals as iv

q_iv = ast_mod.IntervalQuery(
    "", iv.maxgaps(4, iv.ordered(iv.term("w0007"), iv.term("w0042")))
)
rows = searcher.search(q_iv, k=5).collect()
print(f"QUERY intervals(maxgaps(4, ordered(w0007, w0042))) -> {len(rows)} hits")
for r in rows:
    print(f"    doc={r['doc_id']} score={r['score']:.6f} url={r['url']}")

# --- probes ---
print("PROBE zero-hit term:", searcher.search("zzznothing", k=5).collect())
print("PROBE stopword-only query:", searcher.search("the of and", k=5).collect())
try:
    searcher.search('"unbalanced', k=5)
    print("PROBE unbalanced quote: NO ERROR (check)")
except Exception as e:
    print(f"PROBE unbalanced quote -> {type(e).__name__}: {e}")
try:
    searcher.search("w0001 AND", k=5).collect()
    print("PROBE trailing AND: NO ERROR (check)")
except Exception as e:
    print(f"PROBE trailing AND -> {type(e).__name__}: {e}")
print("PROBE k=0:", searcher.search("w0042", k=0).collect())
print("PROBE k=100000:", len(searcher.search("w0042", k=100000).collect()), "rows")
top = searcher.search("w0042 OR w0100", k=1).collect()[0]
ex = searcher.explain("w0042 OR w0100", top["doc_id"])
ok = abs(ex["value"] - top["score"]) < 1e-6
print(
    f"PROBE explain doc={top['doc_id']}: value={ex['value']:.6f} "
    f"(matches search score: {ok}); {len(ex['details'])} clause details"
)
# round-5 surfaces through the same public API: suggest / searchAfter /
# MLT / function-score / index-resident KNN
import pyspark.sql.functions as F

print("SUGGEST w00*:", searcher.suggest("w00", k=3).collect())
p1 = searcher.search("w0042", k=5, dtype="f64").collect()
p2 = searcher.search_after(
    "w0042", (p1[-1]["score"], p1[-1]["doc_id"]), k=5, dtype="f64"
).collect()
print(f"PAGE2 after cursor: {len(p2)} rows, top={p2[0]['doc_id'] if p2 else None}")
mlt = searcher.more_like_this(corpus[7]["text"], k=3).collect()
print("MLT top:", [(r["doc_id"], round(r["score"], 3)) for r in mlt])
vals = searcher.docmap.select(
    "doc_id", (F.col("doc_id") % 5 + 1).cast("double").alias("value")
)
fs = searcher.function_score_df("w0042", vals, k=3).collect()
print("FUNCTION-SCORE top:", [(r["doc_id"], round(r["score"], 3)) for r in fs])

import numpy as np

kd = tempfile.mkdtemp(prefix="ls_knn_")
rng = np.random.default_rng(5)
kdf = spark.createDataFrame(
    [(r["url"], r["text"], [float(x) for x in rng.normal(size=8)])
     for r in corpus[:200]],
    "url string, text string, emb array<double>",
)
build_index(
    spark, kdf, kd,
    IndexConfig(num_segments=3, analyzer=ENGLISH, knn_vector_col="emb"),
)
ks = Searcher(spark, kd)
hits = ks.knn([1.0] * 8, k=3, ef_search=200).collect()
print("KNN top:", [(r["doc_id"], round(r["score"], 4)) for r in hits])
shutil.rmtree(kd)

# plan inspection: pushdown + no wide shuffle before the kernel
import pyspark.sql.functions as F

plan = (
    searcher.postings.where(F.col("term").isin(["w0042"]))
    ._jdf.queryExecution()
    .executedPlan()
    .toString()
)
print("PLAN pushdown line:", [l for l in plan.splitlines() if "PushedFilters" in l][:1])

shutil.rmtree(d)
spark.stop()
print("DONE")
