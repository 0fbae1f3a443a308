"""Training-pipeline ops: Spark result == DuckDB oracle (bitwise, incl.
float64 columns) on a tiny deterministic corpus — the in-repo replica
of the driver's correctness gate for the ops layer."""

import math

import duckdb
import pytest

from lucene_spark.ops import ann, dedup, media, text
from lucene_spark.ops.dialect import DUCK, SPARK

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
    (2, "pack my box with five dozen liquor jugs"),
    (3, "pack my box with five dozen liquor jugs extra tail words here"),
    (4, "sphinx of black quartz judge my vow"),
    (5, "a an and of to"),  # stopwords only
    (6, "short"),
    (7, "numbers 123 mixed 456 tokens 789 galore"),
]

VECS = [
    (0, [1.0, 0.0, 0.5, 0.25]),
    (1, [0.9, 0.1, 0.4, 0.2]),
    (2, [0.0, 1.0, 0.0, 0.0]),
    (3, [0.1, 0.9, 0.1, 0.0]),
    (4, [0.5, 0.5, 0.5, 0.5]),
    (5, [1.0, 0.0, 0.5, 0.25]),
]


@pytest.fixture(scope="module")
def views(spark):
    spark.createDataFrame(DOCS, "doc_id long, text string").createOrReplaceTempView(
        "documents"
    )
    spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS],
        "vec_id long, embedding array<float>",
    ).createOrReplaceTempView("embeddings")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in DOCS)
        + ") AS t(doc_id, text)"
    )
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {[float(x) for x in v]}::FLOAT[])" for i, v in VECS
        )
        + ") AS t(vec_id, embedding)"
    )
    return spark, con


def _compare(spark, con, spark_sql, duck_sql):
    sdf = spark.sql(spark_sql)
    scols = sorted(sdf.columns)
    srows = sorted(
        tuple(r[c] for c in scols) for r in sdf.collect()
    )
    res = con.execute(duck_sql)
    ocols = sorted(d[0] for d in res.description)
    rows = res.fetchall()
    name_idx = {d[0]: i for i, d in enumerate(res.description)}
    orows = sorted(tuple(r[name_idx[c]] for c in ocols) for r in rows)
    assert scols == ocols
    assert len(srows) == len(orows)
    for a, b in zip(srows, orows):
        for x, y in zip(a, b):
            if isinstance(x, float):
                assert (x == y) or (math.isnan(x) and math.isnan(y)), (a, b)
            else:
                assert x == y, (a, b)


@pytest.mark.parametrize(
    "builder",
    [
        text.token_count_sql,
        text.quality_sql,
        text.lang_id_sql,
        text.fingerprint_sql,
        dedup.exact_groups_sql,
        lambda d: dedup.jaccard_pairs_sql(d, threshold=0.5),
        dedup.minhash_bands_sql,
        dedup.minhash_pairs_sql,
        dedup.simhash_sql,
    ],
    ids=[
        "token_count", "quality", "lang_id", "fingerprint", "exact_dups",
        "jaccard", "minhash_bands", "minhash_pairs", "simhash",
    ],
)
def test_text_dedup_ops(views, builder):
    spark, con = views
    _compare(spark, con, builder(SPARK), builder(DUCK))


def test_spark_optimized_dedup_variants(views):
    """The Spark-optimized (explode+aggregate) formulations must equal
    the portable array-lambda form."""
    spark, con = views
    _compare(spark, con, dedup.minhash_bands_spark_sql(par=2), dedup.minhash_bands_sql(DUCK))
    _compare(spark, con, dedup.minhash_pairs_spark_sql(par=2), dedup.minhash_pairs_sql(DUCK))
    _compare(spark, con, dedup.simhash_spark_sql(par=2), dedup.simhash_sql(DUCK))


def test_ann_ops(views):
    spark, con = views
    q = [float(x) for x in VECS[0][1]]
    cents = [[float(x) for x in v] for _, v in VECS[:2]]
    _compare(
        spark, con,
        ann.cosine_topk_sql(SPARK, q, k=4, dim=4),
        ann.cosine_topk_sql(DUCK, q, k=4, dim=4),
    )
    _compare(
        spark, con,
        ann.ivf_assign_sql(SPARK, cents, dim=4),
        ann.ivf_assign_sql(DUCK, cents, dim=4),
    )
    _compare(
        spark, con,
        ann.ivf_topk_sql(SPARK, q, cents, k=3, dim=4),
        ann.ivf_topk_sql(DUCK, q, cents, k=3, dim=4),
    )


def test_media_features(views):
    spark, con = views
    docs = spark.table("documents")
    sdf = media.media_features_df(spark, docs)
    srows = {r["doc_id"]: r for r in sdf.collect()}
    orows = con.execute(media.media_features_oracle_sql()).fetchall()
    cols = [d[0] for d in con.execute(media.media_features_oracle_sql()).description]
    assert len(srows) == len(orows)
    for row in orows:
        d = dict(zip(cols, row))
        s = srows[d["doc_id"]]
        for c in cols:
            assert s[c] == d[c], (c, s[c], d[c])


def test_media_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        media.decode_image(b"\x89PNG...")


def test_kmeans_distributed_matches_numpy_mirror(spark):
    """train_df (distributed Lloyd's) and train_np (the gate's mirror)
    agree: same init, same argmin tie-break; float64 centroid coords may
    differ in last ulps (distributed sum reassociation), so the
    ASSIGNMENTS are the contract."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_spark.ops import kmeans

    sf = "/root/testdata/sf0.001"
    df = spark.read.parquet(sf + "/embeddings.parquet")
    t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist())
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    vecs = vecs[np.argsort(ids, kind="stable")]

    c_np = kmeans.train_np(vecs, 8, iters=3)
    c_df = kmeans.train_df(spark, df, 8, iters=3)
    a_np = kmeans.assign_np(vecs, c_np)
    a_df = kmeans.assign_np(vecs, c_df)
    agree = float((a_np == a_df).mean())
    assert agree >= 0.995, agree
    # centroid coordinates near-identical
    assert np.allclose(np.asarray(c_np), np.asarray(c_df), rtol=1e-9, atol=1e-9)
    # training reduces inertia vs the untrained first-C placeholder
    def inertia(cents):
        d2 = ((vecs[:, None, :] - np.asarray(cents)[None, :, :]) ** 2).sum(axis=2)
        return float(d2.min(axis=1).sum())

    assert inertia(c_np) < inertia(vecs[:8]) * 0.95


def test_ivf_recall_improves_with_nprobe(spark):
    """IVF with trained centroids: recall@10 vs brute force grows with
    nprobe and hits 1.0 at nprobe=C."""
    import numpy as np
    import pyarrow.parquet as pq

    from lucene_spark.ops import ann, kmeans

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(sf + "/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist())
    vecs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids, kind="stable")
    ids, vecs = ids[order], vecs[order]
    cents = kmeans.train_np(vecs, 8, iters=3)
    assign = kmeans.assign_np(vecs, cents)

    def brute_topk(q, k=10):
        cos = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
        return set(ids[np.argsort(-cos, kind="stable")[:k]])

    def ivf_topk(q, k=10, nprobe=1):
        probes = set(ann.py_probe(list(q), cents, nprobe))
        sel = np.isin(assign, list(probes))
        cos = (vecs[sel] @ q) / (
            np.linalg.norm(vecs[sel], axis=1) * np.linalg.norm(q)
        )
        return set(ids[sel][np.argsort(-cos, kind="stable")[:k]])

    recalls = []
    for nprobe in (1, 2, 8):
        r = []
        for qi in range(5):
            b = brute_topk(vecs[qi])
            g = ivf_topk(vecs[qi], nprobe=nprobe)
            r.append(len(b & g) / len(b))
        recalls.append(sum(r) / len(r))
    assert recalls[0] <= recalls[1] <= recalls[2]
    assert recalls[2] == 1.0


def test_ivf_join_form_scales_in_c(spark):
    """The broadcast-join IVF shape: (a) assignments bitwise-match the
    numpy argmin at C=64, (b) the PLAN does not grow with C (centroids
    are data, not plan literals — the old literal-column form exploded
    O(C*dim) and would not compile at production C)."""
    import numpy as np

    from lucene_spark.ops import ann, kmeans

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(300, 8)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    f32 = vecs.astype(np.float32).astype(np.float64)  # engine reads float32
    plans = {}
    for c in (8, 64):
        cents = kmeans.train_np(f32, c, iters=2)
        got = kmeans.ivf_assign_join_df(spark, df, cents).collect()
        want = kmeans.assign_np(f32, cents)
        assert [int(r["centroid_id"]) for r in got] == [int(x) for x in want]
        plans[c] = kmeans.ivf_assign_join_df(spark, df, cents)._jdf.queryExecution().optimizedPlan().toString()
    # join-form plan is O(1) in C: allow only trivial size drift
    assert len(plans[64]) < len(plans[8]) * 2, (len(plans[8]), len(plans[64]))


def test_ivf_topk_df_matches_sql(views):
    """ivf_topk_df (array-native join form) == ivf_topk_sql (both
    dialects) on the tiny corpus — same rows, same float64 cos."""
    spark, con = views
    from lucene_spark.ops import ann

    q = [0.95, 0.05, 0.45, 0.2]
    cents = [list(v) for _, v in VECS[:3]]
    df = spark.table("embeddings")
    got = ann.ivf_topk_df(spark, df, q, cents, k=3, nprobe=2).collect()
    want = con.execute(ann.ivf_topk_sql(DUCK, q, cents, k=3, dim=4, nprobe=2)).fetchall()
    assert [(int(r["vec_id"]), r["cos"]) for r in got] == [
        (int(a), b) for a, b in want
    ]
