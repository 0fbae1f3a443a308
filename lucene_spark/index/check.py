"""Index integrity verification — the ``CheckIndex`` analog
(``lucene/core/src/java/org/apache/lucene/index/CheckIndex.java:1107``
testPostings and friends): cross-checks terms <-> postings <-> norms <->
stats for every live segment of a commit.

Runs distributed: one task per segment via the same term-pruned scan
scaffolding the searcher uses, emitting a per-segment report row; any
violation raises inside the task (fail fast, like CheckIndex's exorcise
mode being off)."""

from __future__ import annotations

import os

import numpy as np

from lucene_spark.index.builder import read_latest_commit


def _check_segment(index_dir: str, segment_id: str, seg_meta: dict, pdf) -> dict:
    """All invariants for one segment. Returns counters."""
    import pyarrow.parquet as pq

    from lucene_spark.codec import blocks as blk
    from lucene_spark.similarity import bm25

    from lucene_spark.search.ast import field_of

    nt = pq.read_table(
        os.path.join(index_dir, "norms", f"segment_id={segment_id}", "data.parquet")
    )
    # one row per field ('' = default)
    norms_by_field = {
        f.as_py(): np.frombuffer(b.as_py(), dtype=np.uint8)
        for f, b in zip(nt["field"], nt["norms_bin"])
    }
    field_sum_tf = {
        f.as_py(): int(s.as_py()) for f, s in zip(nt["field"], nt["sum_total_tf"])
    }
    num_docs = int(nt["num_docs"][0].as_py())
    for fld, arr in norms_by_field.items():
        assert arr.size == num_docs, f"field {fld!r}: norms length != num_docs"
    assert num_docs == int(seg_meta["num_docs"]), "manifest num_docs mismatch"

    # a fresh segment has one data.parquet; a merged segment has salted
    # data_<salt>.parquet shards — read the directory either way
    st = pq.read_table(
        os.path.join(index_dir, "term_stats", f"segment_id={segment_id}")
    )
    stats = {
        t: (int(df_), int(ttf))
        for t, df_, ttf in zip(
            st["term"].to_pylist(),
            st["doc_freq"].to_pylist(),
            st["total_tf"].to_pylist(),
        )
    }

    n_terms = n_blocks = n_postings = 0
    sum_tf_by_field: dict = {}
    scorer = bm25.BM25Scorer.build(1.0, 10.0)  # any scorer: bounds are per-impact
    for term, grp in pdf.groupby("term", sort=True):
        norms = norms_by_field[field_of(term)]
        grp = grp.sort_values("block_id")
        assert list(grp["block_id"]) == list(range(len(grp))), (
            f"{term}: block ids not dense/ordered"
        )
        df_seen = 0
        tf_seen = 0
        prev_last = -1
        for r in grp.itertuples(index=False):
            docs = blk.decode_docs(int(r.first_doc), r.docs_bin)
            tfs = blk.decode_tfs(r.tfs_bin)
            assert docs.size == int(r.num_docs), f"{term}: block size mismatch"
            assert tfs.size == docs.size, f"{term}: tf count mismatch"
            assert (tfs >= 1).all(), f"{term}: tf < 1"
            assert docs[0] == int(r.first_doc) and docs[-1] == int(r.last_doc), (
                f"{term}: skip bounds wrong"
            )
            assert (np.diff(docs) > 0).all(), f"{term}: docs not strictly increasing"
            assert docs[0] > prev_last, f"{term}: blocks overlap"
            assert 0 <= docs[0] and docs[-1] < num_docs, f"{term}: doc out of range"
            prev_last = int(docs[-1])
            # positions: counts match tfs, strictly increasing per doc
            if len(r.pos_bin):
                pos = blk.decode_positions(r.pos_bin, tfs)
                bounds = np.concatenate(([0], np.cumsum(tfs)))
                for j in range(docs.size):
                    p = pos[bounds[j] : bounds[j + 1]]
                    assert (np.diff(p) > 0).all() and (p >= 0).all(), (
                        f"{term}: positions not increasing"
                    )
            # payload streams (when indexed) align 1:1 with positions
            pay = getattr(r, "pay_bin", b"") or b""
            if pay:
                pls = blk.unpack_payloads(pay)
                assert len(pls) == int(tfs.sum()), (
                    f"{term}: payload count != position count"
                )
            # offset streams (when indexed): aligned, sane spans,
            # starts non-decreasing within each doc
            off = getattr(r, "off_bin", b"") or b""
            if off:
                ost, oen = blk.unpack_offsets(off, tfs)
                assert ost.size == int(tfs.sum()), (
                    f"{term}: offset count != position count"
                )
                assert (oen >= ost).all() and (ost >= 0).all(), (
                    f"{term}: bad offset spans"
                )
                obounds = np.concatenate(([0], np.cumsum(tfs)))
                for j in range(docs.size):
                    s = ost[obounds[j] : obounds[j + 1]]
                    assert (np.diff(s) >= 0).all(), (
                        f"{term}: offsets not non-decreasing in doc"
                    )
            # impacts are rank-safe upper bounds for this block
            itfs = np.asarray(list(r.impact_tfs), dtype=np.int64)
            inorms = np.asarray(list(r.impact_norms), dtype=np.uint8)
            assert itfs.size > 0, f"{term}: empty impacts"
            bound = float(scorer.score(itfs, inorms).max())
            true_max = float(scorer.score(tfs, norms[docs]).max())
            assert bound >= true_max - 1e-7, f"{term}: impact bound too low"
            df_seen += docs.size
            tf_seen += int(tfs.sum())
            n_blocks += 1
        assert term in stats, f"{term}: missing from term_stats"
        assert stats[term] == (df_seen, tf_seen), f"{term}: stats mismatch"
        n_terms += 1
        n_postings += df_seen
        fld = field_of(term)
        sum_tf_by_field[fld] = sum_tf_by_field.get(fld, 0) + tf_seen
    assert n_terms == len(stats), "term_stats has terms absent from postings"
    for fld, tfs_total in sum_tf_by_field.items():
        assert tfs_total == field_sum_tf[fld], (
            f"field {fld!r}: segment sum_total_tf wrong"
        )
    return {
        "segment_id": segment_id,
        "n_terms": n_terms,
        "n_blocks": n_blocks,
        "n_postings": n_postings,
        "sum_tf": int(sum(sum_tf_by_field.values())),
    }


def check_index(spark, index_dir: str) -> dict:
    """Verify every live segment; returns totals. Raises on violation."""
    import pyspark.sql.functions as F

    commit = read_latest_commit(index_dir)
    metas = {s["segment_id"]: s for s in commit["segments"]}
    live = list(metas)
    posts = spark.read.parquet(os.path.join(index_dir, "postings")).where(
        F.col("segment_id").isin(live)
    )

    def kernel(key, pdf):
        import pandas as pd

        sid = str(key[0])
        rep = _check_segment(index_dir, sid, metas[sid], pdf)
        return pd.DataFrame([rep])

    rows = (
        posts.repartition(len(live), "segment_id")
        .groupBy("segment_id")
        .applyInPandas(
            kernel,
            schema="segment_id string, n_terms long, n_blocks long, "
                   "n_postings long, sum_tf long",
        )
        .collect()
    )
    assert {r["segment_id"] for r in rows} == set(live), "segment missing postings"
    totals = {
        "segments": len(rows),
        "terms": int(sum(r["n_terms"] for r in rows)),
        "blocks": int(sum(r["n_blocks"] for r in rows)),
        "postings": int(sum(r["n_postings"] for r in rows)),
    }
    doc_total = sum(m["num_docs"] for m in metas.values())
    assert doc_total == commit["doc_count"], "commit doc_count mismatch"
    # doc-base ranges must partition the id space without overlap
    segs = sorted(metas.values(), key=lambda s: s["doc_base"])
    for a, b in zip(segs, segs[1:]):
        assert a["doc_base"] + a["num_docs"] <= b["doc_base"], "doc ranges overlap"
    # docmap: exactly one url per live doc id, ids inside segment range
    dm = (
        spark.read.parquet(os.path.join(index_dir, "docmap"))
        .where(F.col("segment_id").isin(live))
        .groupBy("segment_id")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
        )
        .collect()
    )
    assert {r["segment_id"] for r in dm} == set(live), "segment missing docmap"
    for r in dm:
        m = metas[r["segment_id"]]
        assert r["n"] == r["nd"] == m["num_docs"], (
            f"docmap row count wrong for {r['segment_id']}"
        )
        assert r["lo"] >= m["doc_base"], "docmap id below doc_base"
        assert r["hi"] < m["doc_base"] + m["num_docs"], "docmap id past range"
    # stored fields (CheckIndex testStoredFields analog), when present:
    # one row per doc, ids exactly the segment's range
    stored_dir = os.path.join(index_dir, "stored")
    if os.path.isdir(stored_dir):
        sf = (
            spark.read.parquet(stored_dir)
            .where(F.col("segment_id").isin(live))
            .groupBy("segment_id")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("doc_id").alias("nd"),
                F.min("doc_id").alias("lo"),
                F.max("doc_id").alias("hi"),
            )
            .collect()
        )
        assert {r["segment_id"] for r in sf} == set(live), (
            "segment missing stored fields"
        )
        for r in sf:
            m = metas[r["segment_id"]]
            assert r["n"] == r["nd"] == m["num_docs"], (
                f"stored row count wrong for {r['segment_id']}"
            )
            assert (
                r["lo"] == m["doc_base"]
                and r["hi"] == m["doc_base"] + m["num_docs"] - 1
            ), f"stored doc_id range wrong for {r['segment_id']}"
        totals["stored_docs"] = int(sum(r["n"] for r in sf))
    # term vectors (CheckIndex testTermVectors analog), when present:
    # at most one row per (doc, field), ids inside the segment range,
    # arrays aligned, positions strictly increasing (one token per
    # position), token char spans ordered and non-overlapping
    vec_dir = os.path.join(index_dir, "vectors")
    if os.path.isdir(vec_dir):
        vdf = spark.read.parquet(vec_dir).where(F.col("segment_id").isin(live))
        va = (
            vdf.groupBy("segment_id", "field")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("doc_id").alias("nd"),
                F.min("doc_id").alias("lo"),
                F.max("doc_id").alias("hi"),
            )
            .collect()
        )
        for r in va:
            m = metas[r["segment_id"]]
            assert r["n"] == r["nd"], (
                f"duplicate vector rows in {r['segment_id']}/{r['field']}"
            )
            assert r["n"] <= m["num_docs"], "more vectors than docs"
            assert r["lo"] >= m["doc_base"], "vector id below doc_base"
            assert r["hi"] < m["doc_base"] + m["num_docs"], "vector id past range"

        def vkernel(iterator):
            import pandas as pd

            bad = 0
            n = 0
            for pdf in iterator:
                for r in pdf.itertuples(index=False):
                    n += 1
                    t, p = list(r.terms), np.asarray(r.positions, np.int64)
                    s = np.asarray(r.starts, np.int64)
                    e = np.asarray(r.ends, np.int64)
                    ok = (
                        len(t) == p.size == s.size == e.size
                        and p.size > 0
                        and p[0] >= 0
                        and (np.diff(p) > 0).all()
                        and s[0] >= 0
                        and (e > s).all()
                        and (s[1:] >= e[:-1]).all()
                        and all(isinstance(x, str) and x for x in t)
                    )
                    if not ok:
                        bad += 1
            yield pd.DataFrame({"n": [n], "bad": [bad]})

        vrows = vdf.select(
            "terms", "positions", "starts", "ends"
        ).mapInPandas(vkernel, "n long, bad long").collect()
        assert sum(r["bad"] for r in vrows) == 0, "malformed term vector rows"
        totals["vector_rows"] = int(sum(r["n"] for r in vrows))

    # KNN vector store (CheckIndex testVectors/KnnVectorsReader analog),
    # when present: exactly one graph node per doc, ids inside the
    # segment range, neighbor ids point at nodes of the SAME segment,
    # layer lists sized level+1, degree caps respected (M=16 default:
    # 2M at layer 0, M above)
    knn_dir = os.path.join(index_dir, "knn")
    if os.path.isdir(knn_dir):
        kdf = spark.read.parquet(knn_dir).where(F.col("segment_id").isin(live))
        ka = (
            kdf.groupBy("segment_id")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("vec_id").alias("nd"),
                F.min("vec_id").alias("lo"),
                F.max("vec_id").alias("hi"),
            )
            .collect()
        )
        for r in ka:
            m = metas[r["segment_id"]]
            assert r["n"] == r["nd"], f"duplicate knn nodes in {r['segment_id']}"
            assert r["n"] == m["num_docs"], "knn node count != docs"
            assert r["lo"] >= m["doc_base"], "knn id below doc_base"
            assert r["hi"] < m["doc_base"] + m["num_docs"], "knn id past range"

        def kkernel(key, pdf):
            import pandas as pd

            ids = set(pdf["vec_id"].tolist())
            bad = 0
            for r in pdf.itertuples(index=False):
                layers = list(r.nbr_ids)
                ok = len(layers) == int(r.level) + 1
                for lc, layer in enumerate(layers):
                    cap = 32 if lc == 0 else 16
                    lay = list(layer)
                    ok = ok and len(lay) <= cap and all(
                        x in ids and x != r.vec_id for x in lay
                    )
                if not ok:
                    bad += 1
            return pd.DataFrame(
                {"segment_id": [str(key[0])], "bad": [bad]}
            )

        krows = (
            kdf.groupBy("segment_id")
            .applyInPandas(kkernel, "segment_id string, bad long")
            .collect()
        )
        assert sum(r["bad"] for r in krows) == 0, "malformed knn graph rows"
        totals["knn_nodes"] = int(sum(r["n"] for r in ka))
    return totals
