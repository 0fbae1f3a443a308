"""Distributed inverted-index build: DataFrame -> immutable segments.

The Spark translation of SURVEY.md §3.1: one shuffle
(``groupBy(pid = pmod(hash(url), P))``) then an embarrassingly parallel
per-group segment build — each group plays the role of one Lucene DWPT
(``index/DocumentsWriterPerThread.java``): analyze, invert, block-encode
postings, write one immutable segment, emit a manifest row. Commit =
write ``commits/gen_N.json`` listing all segments (the ``segments_N``
analog, ``index/SegmentInfos.java:55-106``).

Scale design (10^12 docs):
- The only shuffle is the hash repartition; P (num_segments) is chosen so
  one segment's docs fit a task (e.g. 2-8M web pages / 1-4 GB text).
- Doc IDs are deterministic: ``doc_id = doc_base(pid) + rank(url within
  segment)`` — reproducible builds, reproducible tie-breaks.
- Resume: each task first checks its segment manifest; if present with a
  matching input hash it returns the recorded metrics without rebuilding
  (idempotent re-run after failure = only missing segments rebuild).
- Lineage + metrics per segment: input hash, doc/term/postings counts,
  encoded bytes (the north rule's checkpoint/lineage/metrics contract).

Segment layout under ``index_dir`` (hive-partitioned so Spark reads get
a ``segment_id`` column and partition pruning):
    postings/segment_id=<sid>/data.parquet   sorted by term (min/max
        row-group stats give term pruning — the .tip/FST analog)
    term_stats/segment_id=<sid>/data.parquet (term, doc_freq, total_tf)
    norms/segment_id=<sid>/data.parquet      one row: packed norm bytes
        (the .nvd analog) + doc_base + counts
    docmap/segment_id=<sid>/data.parquet     (doc_id, url)
    manifest/segment_<sid>.json              lineage + metrics
    commits/gen_<N>.json                     commit point
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import dataclass, field

import numpy as np

from lucene_spark.analysis.analyzer import Analyzer, ENGLISH

POSTINGS_ROW_GROUP = 4096  # small row groups -> effective term min/max pruning


@dataclass(frozen=True)
class IndexConfig:
    key_col: str = "url"
    text_col: str = "text"
    # multi-field documents (FieldInfos per-field accretion,
    # ``index/FieldInfos.java``; TextField-per-column mapping of SURVEY
    # §1.3): ((field_name, source_col), ...). Field name '' is the
    # DEFAULT field (bare term keys — single-field indexes are the
    # special case fields=()). Every field gets its own postings
    # namespace, norms blob and collection stats.
    fields: tuple = ()
    # per-field analyzer overrides (PerFieldAnalyzerWrapper analog);
    # fields absent from the dict use ``analyzer``
    field_analyzers: "tuple | None" = None  # ((field_name, Analyzer), ...)
    num_segments: int = 8
    analyzer: Analyzer = field(default_factory=lambda: ENGLISH)
    store_positions: bool = True
    # StoredFieldsFormat analog (``codecs/lucene90/
    # Lucene90StoredFieldsFormat.java`` role, columnar parquet layout):
    # source columns persisted per doc in stored/segment_id=<sid>/ for
    # retrieval + highlighting. Unlike the reference's row-stride blobs
    # the columnar layout gives free column pruning; doc_id row-group
    # stats make top-k fetches k-sized reads, never scans.
    stored_cols: tuple = ()
    # TermVectorsFormat analog (``codecs/lucene90/
    # Lucene90CompressingTermVectorsFormat.java`` role, columnar
    # layout): indexed FIELD NAMES whose per-doc analyzed token stream
    # (term, position, char start, char end) is persisted doc-major in
    # vectors/segment_id=<sid>/ — one row per (doc, field), arrays
    # aligned in stream order. Consumed by the highlighter as the
    # TERM_VECTORS offset source (no query-time re-analysis; the win is
    # long documents) and by the ``term_vectors`` reader APIs. Like the
    # reference, vectors are per-field opt-in (FieldType.storeTermVectors
    # + ...Positions + ...Offsets, ``document/FieldType.java``).
    vector_fields: tuple = ()
    # 4th IndexOptions level (``index/IndexOptions.java:29-50``
    # DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS): persist each
    # position's character span in the postings as per-block
    # ``off_bin`` streams (FieldType.storeOffsets). Opt-in: offset
    # builds take the scalar per-term encoder (the same extra-stream
    # trade the reference's postings writer makes). Consumed by the
    # Matches API's "postings" offset source — match offsets without
    # stored text or re-analysis.
    store_offsets: bool = False
    # KnnVectorsFormat role (``document/KnnFloatVectorField.java`` +
    # ``codecs/lucene99/Lucene99HnswVectorsFormat.java``): name of an
    # array<float> input column stored per doc with a PER-SEGMENT HNSW
    # graph built at flush (ops/hnsw.build_np, deterministic). Opt-in;
    # merges REBUILD the merged segment's graph from surviving vectors
    # (``KnnVectorsWriter#mergeOneField`` semantics) and deletes apply
    # at search as the acceptOrds mask.
    knn_vector_col: "str | None" = None
    generation: int = 1
    # Optional SQL expression for the segment-assignment column. Default
    # (None) = hash(key) scatter (uniform load). A range expression (e.g.
    # "int(cast(url as bigint) / 128)") keeps doc-id order aligned with
    # key order — used where reproducible global ordering matters more
    # than perfect balance.
    pid_expr: str | None = None
    # doc_base assignment: "counted" = dense global ids via a pre-pass
    # count per segment (one extra scan); "strided" = doc_base =
    # pid * doc_stride with NO pre-pass (ids sparse but still globally
    # ordered by (pid, key) — identical tie-break order, one less job;
    # the production default for throughput-critical builds).
    doc_base_mode: str = "counted"
    doc_stride: int = 1 << 33


def _segment_id(generation: int, pid: int) -> str:
    return f"g{generation:04d}p{pid:05d}"


def _input_hash(urls, texts) -> str:
    h = hashlib.sha256()
    for u, t in zip(urls, texts):
        h.update(u.encode("utf-8"))
        h.update(b"\x00")
        h.update(hashlib.sha1((t or "").encode("utf-8")).digest())
        h.update(b"\n")
    return h.hexdigest()


def _input_hash_fields(urls, texts_by_field) -> str:
    """Resume fingerprint over every indexed field (single default
    field keeps the legacy hash so existing manifests stay valid)."""
    if len(texts_by_field) == 1 and texts_by_field[0][0] == "":
        return _input_hash(urls, texts_by_field[0][1])
    h = hashlib.sha256()
    for fname, texts in texts_by_field:
        h.update(fname.encode("utf-8"))
        h.update(b"\x1f")
        h.update(_input_hash(urls, texts).encode("ascii"))
        h.update(b"\n")
    return h.hexdigest()


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def invert_field(
    field: str, texts, analyzer: Analyzer, store_positions: bool = True,
    coded=None, store_offsets: bool = False,
):
    """Pure function: one segment's one FIELD (docs url-sorted) ->
    encoded postings under the fielded term namespace.

    Returns (block_rows, term_stat_rows, norms uint8[ndocs],
    sum_total_tf, field_doc_count) where field_doc_count is the number
    of docs with >=1 token of this field (Terms.getDocCount semantics).
    All heavy lifting is vectorized numpy over the batch tokenization
    (the IndexingChain.processDocument/invert analog, SURVEY §2.1).

    ``coded``: optional precomputed ``tokenize_batch_coded``-shaped
    tuple (doc_idx, codes, uniq, positions, counts) — the single-pass
    vector-field build tokenizes once with offsets and shares the
    stream here instead of re-tokenizing.
    """
    from lucene_spark.codec.blocks import encode_partition
    from lucene_spark.search.ast import fielded
    from lucene_spark.util.smallfloat import int_to_byte4_np

    if coded is None and getattr(analyzer, "has_payloads", False):
        return _invert_field_payloads(
            field, texts, analyzer, store_positions,
            store_offsets=store_offsets,
        )
    if store_offsets:
        coded7 = (
            coded
            if coded is not None and len(coded) == 7
            else analyzer.tokenize_batch_coded_offsets(texts)
        )
        return _invert_field_offsets(field, coded7, store_positions)
    if coded is not None and len(coded) == 7:
        coded = coded[:5]
    doc_idx, codes, uniq, positions, counts = (
        coded if coded is not None else analyzer.tokenize_batch_coded(texts)
    )
    norms = int_to_byte4_np(counts)
    block_rows: list = []
    term_stats: list = []
    if codes.size:
        # sort tokens by (term, doc, position): FreqProxTermsWriter.flush
        # (int term codes — no object-string comparisons on the hot path)
        order = np.lexsort((positions, doc_idx, codes))
        codes_s = codes[order]
        docs_s = doc_idx[order].astype(np.int64)
        pos_s = positions[order].astype(np.int64)
        # collapse the token stream to postings (one row per (term, doc))
        p_change = np.concatenate(
            ([True], (codes_s[1:] != codes_s[:-1]) | (docs_s[1:] != docs_s[:-1]))
        )
        p_start = np.flatnonzero(p_change)
        p_codes = codes_s[p_start]
        p_docs = docs_s[p_start]
        p_tfs = np.diff(np.concatenate((p_start, [codes_s.size])))
        fielded_terms = np.array(
            [fielded(field, str(t)) for t in uniq], dtype=object
        )
        # one vectorized batch encode for EVERY term (codec/blocks.py
        # encode_partition): no per-term Python loop on the hot path
        block_rows = encode_partition(
            p_codes, p_docs, p_tfs, pos_s, norms, fielded_terms,
            with_positions=store_positions,
        )
        df_per_code = np.bincount(p_codes, minlength=uniq.size)
        ttf_per_code = np.bincount(
            p_codes, weights=p_tfs.astype(np.float64), minlength=uniq.size
        ).astype(np.int64)
        term_stats = [
            {
                "term": str(fielded_terms[ti]),
                "doc_freq": int(df_per_code[ti]),
                "total_tf": int(ttf_per_code[ti]),
            }
            for ti in range(uniq.size)
        ]
    return (
        block_rows,
        term_stats,
        norms,
        int(counts.sum()),
        int(np.count_nonzero(counts)),
    )


def _invert_field_offsets(field: str, coded7, store_positions: bool):
    """Offsets-in-postings invert (the 4th IndexOptions level): same
    (term, doc, position) lexsort as :func:`invert_field` with the
    per-token character spans carried through to per-position
    ``off_bin`` streams.  Tokenization is the single-pass
    ``tokenize_batch_coded_offsets`` stream (shared with term vectors
    when both are on); encoding runs the scalar per-term
    ``encode_term_postings`` — the documented opt-in trade."""
    from lucene_spark.codec.blocks import encode_term_postings
    from lucene_spark.search.ast import fielded
    from lucene_spark.util.smallfloat import int_to_byte4_np

    doc_idx, codes, uniq, positions, counts, starts, ends = coded7
    norms = int_to_byte4_np(counts)
    block_rows: list = []
    term_stats: list = []
    if codes.size:
        doc_idx = np.asarray(doc_idx, dtype=np.int64)
        positions = np.asarray(positions, dtype=np.int64)
        order = np.lexsort((positions, doc_idx, codes))
        codes_s = codes[order]
        docs_s = doc_idx[order]
        pos_s = positions[order]
        st_s = np.asarray(starts, dtype=np.int64)[order]
        en_s = np.asarray(ends, dtype=np.int64)[order]
        bounds = np.searchsorted(codes_s, np.arange(uniq.size + 1))
        for ti in range(uniq.size):
            ts0, ts1 = int(bounds[ti]), int(bounds[ti + 1])
            d = docs_s[ts0:ts1]
            docs_u, tfs = np.unique(d, return_counts=True)
            key = fielded(field, str(uniq[ti]))
            rows = encode_term_postings(
                docs_u,
                tfs.astype(np.int64),
                pos_s[ts0:ts1],
                norms,
                with_positions=store_positions,
                offsets_flat=(st_s[ts0:ts1], en_s[ts0:ts1]),
            )
            for r in rows:
                r["term"] = key
            block_rows.extend(rows)
            term_stats.append(
                {
                    "term": key,
                    "doc_freq": int(docs_u.size),
                    "total_tf": int(ts1 - ts0),
                }
            )
    return (
        block_rows,
        term_stats,
        norms,
        int(counts.sum()),
        int(np.count_nonzero(counts)),
    )


def _invert_field_payloads(
    field: str, texts, analyzer, store_positions: bool,
    store_offsets: bool = False,
):
    """Payload-aware invert (the 4th posting plane,
    ``index/IndexOptions.java`` + the ``.pay`` stream of
    ``Lucene104PostingsWriter.java``): same (term, doc, position)
    lexsort as :func:`invert_field` with the per-token payload bytes
    carried through to per-position ``pay_bin`` streams.  Opt-in via a
    payload-producing analyzer (``analysis/payloads.py``); the
    non-payload hot path is untouched.  Per-term encode runs the
    scalar ``encode_term_postings`` (payload builds trade the batched
    encoder for the extra stream — the same trade the reference makes
    wiring payloads through the postings writer).  Not supported
    together with ``vector_fields`` single-pass offsets."""
    from lucene_spark.codec.blocks import encode_term_postings
    from lucene_spark.search.ast import fielded
    from lucene_spark.util.smallfloat import int_to_byte4_np

    ndocs = len(texts)
    counts = np.zeros(ndocs, dtype=np.int64)
    doc_idx_l: list = []
    terms_l: list = []
    pos_l: list = []
    pay_l: list = []
    st_l: list = []
    en_l: list = []
    for di, text in enumerate(texts):
        ts, ps, pays = analyzer.tokenize_one_payloads(text or "")
        counts[di] = len(ts)
        doc_idx_l.extend([di] * len(ts))
        terms_l.extend(ts)
        pos_l.extend(ps)
        pay_l.extend(pays)
        if store_offsets:
            # same whitespace token order as tokenize_one_payloads
            _, _, st, en = analyzer.tokenize_offsets(text or "")
            st_l.extend(st)
            en_l.extend(en)
    norms = int_to_byte4_np(counts)
    block_rows: list = []
    term_stats: list = []
    if terms_l:
        uniq, codes = np.unique(np.array(terms_l, dtype=object), return_inverse=True)
        doc_idx = np.asarray(doc_idx_l, dtype=np.int64)
        positions = np.asarray(pos_l, dtype=np.int64)
        payloads = np.array(pay_l, dtype=object)
        order = np.lexsort((positions, doc_idx, codes))
        codes_s = codes[order]
        docs_s = doc_idx[order]
        pos_s = positions[order]
        pay_s = payloads[order]
        st_s = en_s = None
        if store_offsets:
            st_s = np.asarray(st_l, dtype=np.int64)[order]
            en_s = np.asarray(en_l, dtype=np.int64)[order]
        bounds = np.searchsorted(codes_s, np.arange(uniq.size + 1))
        for ti in range(uniq.size):
            ts0, ts1 = int(bounds[ti]), int(bounds[ti + 1])
            d = docs_s[ts0:ts1]
            docs_u, tfs = np.unique(d, return_counts=True)
            key = fielded(field, str(uniq[ti]))
            rows = encode_term_postings(
                docs_u,
                tfs.astype(np.int64),
                pos_s[ts0:ts1],
                norms,
                with_positions=store_positions,
                payloads_flat=pay_s[ts0:ts1],
                offsets_flat=(
                    (st_s[ts0:ts1], en_s[ts0:ts1]) if store_offsets else None
                ),
            )
            for r in rows:
                r["term"] = key
            block_rows.extend(rows)
            term_stats.append(
                {
                    "term": key,
                    "doc_freq": int(docs_u.size),
                    "total_tf": int(ts1 - ts0),
                }
            )
    return (
        block_rows,
        term_stats,
        norms,
        int(counts.sum()),
        int(np.count_nonzero(counts)),
    )


def invert_partition(urls, texts, analyzer: Analyzer, store_positions: bool = True):
    """Single-default-field wrapper around ``invert_field`` (the legacy
    shape used by LocalIndex and the codec tests).

    Returns (block_rows, term_stat_rows, norms_bytes, sum_total_tf)."""
    block_rows, term_stats, norms, sum_tf, _ = invert_field(
        "", texts, analyzer, store_positions
    )
    return block_rows, term_stats, norms.tobytes(), sum_tf


def field_specs_of(config: "IndexConfig") -> tuple:
    """((field_name, source_col), ...) with the single-field default."""
    return config.fields or (("", config.text_col),)


def analyzer_for(config: "IndexConfig", field: str) -> Analyzer:
    if config.field_analyzers:
        for f, a in config.field_analyzers:
            if f == field:
                return a
    return config.analyzer


def _write_segment_files(
    index_dir: str,
    sid: str,
    block_rows: list,
    term_stats: list,
    norms_rows: list,
    doc_base: int,
    urls: list,
    stored: "dict | None" = None,
    vectors: "list | None" = None,
    knn_graph=None,
) -> dict:
    """Write one segment's parquet files (tmp dir + atomic rename).

    ``norms_rows``: one dict per field — {"field", "norms_bin",
    "sum_total_tf", "field_doc_count"} (the per-field .nvd blobs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp_root = os.path.join(index_dir, "_tmp", sid)
    os.makedirs(tmp_root, exist_ok=True)

    def commit_dir(kind: str) -> str:
        final = os.path.join(index_dir, kind, f"segment_id={sid}")
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = os.path.join(tmp_root, kind)
        if os.path.exists(final):
            import shutil

            shutil.rmtree(final)
        os.replace(tmp, final)
        return final

    post_cols = {
            "term": pa.array([r["term"] for r in block_rows], pa.string()),
            "block_id": pa.array([r["block_id"] for r in block_rows], pa.int32()),
            "num_docs": pa.array([r["num_docs"] for r in block_rows], pa.int32()),
            "first_doc": pa.array([r["first_doc"] for r in block_rows], pa.int64()),
            "last_doc": pa.array([r["last_doc"] for r in block_rows], pa.int64()),
            "docs_bin": pa.array([r["docs_bin"] for r in block_rows], pa.binary()),
            "tfs_bin": pa.array([r["tfs_bin"] for r in block_rows], pa.binary()),
            "pos_bin": pa.array([r["pos_bin"] for r in block_rows], pa.binary()),
            "impact_tfs": pa.array(
                [r["impact_tfs"] for r in block_rows], pa.list_(pa.int32())
            ),
            "impact_norms": pa.array(
                [r["impact_norms"] for r in block_rows], pa.list_(pa.int32())
            ),
    }
    if any("pay_bin" in r for r in block_rows):
        # payload-enabled field in the segment: every block row gets the
        # stream (empty for payload-free terms/fields of the same doc)
        post_cols["pay_bin"] = pa.array(
            [r.get("pay_bin", b"") for r in block_rows], pa.binary()
        )
    if any("off_bin" in r for r in block_rows):
        post_cols["off_bin"] = pa.array(
            [r.get("off_bin", b"") for r in block_rows], pa.binary()
        )
    post_tbl = pa.table(post_cols)
    os.makedirs(os.path.join(tmp_root, "postings"), exist_ok=True)
    pq.write_table(
        post_tbl,
        os.path.join(tmp_root, "postings", "data.parquet"),
        row_group_size=POSTINGS_ROW_GROUP,
    )
    ts_tbl = pa.table(
        {
            "term": pa.array([r["term"] for r in term_stats], pa.string()),
            "doc_freq": pa.array([r["doc_freq"] for r in term_stats], pa.int64()),
            "total_tf": pa.array([r["total_tf"] for r in term_stats], pa.int64()),
        }
    )
    os.makedirs(os.path.join(tmp_root, "term_stats"), exist_ok=True)
    pq.write_table(ts_tbl, os.path.join(tmp_root, "term_stats", "data.parquet"))
    norms_tbl = pa.table(
        {
            "field": pa.array([r["field"] for r in norms_rows], pa.string()),
            "doc_base": pa.array([doc_base] * len(norms_rows), pa.int64()),
            "num_docs": pa.array([len(urls)] * len(norms_rows), pa.int64()),
            "field_doc_count": pa.array(
                [r["field_doc_count"] for r in norms_rows], pa.int64()
            ),
            "sum_total_tf": pa.array(
                [r["sum_total_tf"] for r in norms_rows], pa.int64()
            ),
            "norms_bin": pa.array([r["norms_bin"] for r in norms_rows], pa.binary()),
        }
    )
    os.makedirs(os.path.join(tmp_root, "norms"), exist_ok=True)
    pq.write_table(norms_tbl, os.path.join(tmp_root, "norms", "data.parquet"))
    docmap_tbl = pa.table(
        {
            "doc_id": pa.array(
                (doc_base + np.arange(len(urls))).tolist(), pa.int64()
            ),
            "url": pa.array(urls, pa.string()),
        }
    )
    os.makedirs(os.path.join(tmp_root, "docmap"), exist_ok=True)
    pq.write_table(docmap_tbl, os.path.join(tmp_root, "docmap", "data.parquet"))

    kinds = ["postings", "term_stats", "norms", "docmap"]
    if stored:
        stored_tbl = pa.table(
            {
                "doc_id": pa.array(
                    (doc_base + np.arange(len(urls))).tolist(), pa.int64()
                ),
                "url": pa.array(urls, pa.string()),
                **{
                    col: pa.array(vals, pa.string())
                    for col, vals in stored.items()
                },
            }
        )
        os.makedirs(os.path.join(tmp_root, "stored"), exist_ok=True)
        pq.write_table(
            stored_tbl,
            os.path.join(tmp_root, "stored", "data.parquet"),
            row_group_size=1024,  # doc_id min/max stats keep fetches k-sized
        )
        kinds.append("stored")

    if vectors:
        # doc-major term vectors: one row per (doc, field); rows arrive
        # doc_id-sorted (callers iterate docs in segment order) so the
        # 1024-doc row groups give the same k-sized top-k fetches as
        # stored fields
        vec_tbl = pa.table(
            {
                "doc_id": pa.array([r["doc_id"] for r in vectors], pa.int64()),
                "url": pa.array([r["url"] for r in vectors], pa.string()),
                "field": pa.array([r["field"] for r in vectors], pa.string()),
                "terms": pa.array(
                    [r["terms"] for r in vectors], pa.list_(pa.string())
                ),
                "positions": pa.array(
                    [r["positions"] for r in vectors], pa.list_(pa.int32())
                ),
                "starts": pa.array(
                    [r["starts"] for r in vectors], pa.list_(pa.int32())
                ),
                "ends": pa.array(
                    [r["ends"] for r in vectors], pa.list_(pa.int32())
                ),
            }
        )
        os.makedirs(os.path.join(tmp_root, "vectors"), exist_ok=True)
        pq.write_table(
            vec_tbl,
            os.path.join(tmp_root, "vectors", "data.parquet"),
            row_group_size=1024,
        )
        kinds.append("vectors")

    if knn_graph is not None:
        # per-segment HNSW graph + raw vectors (KnnVectorsFormat role):
        # vec_id == global doc_id, nbr_ids per layer
        knn_tbl = pa.Table.from_pandas(knn_graph, preserve_index=False)
        os.makedirs(os.path.join(tmp_root, "knn"), exist_ok=True)
        pq.write_table(knn_tbl, os.path.join(tmp_root, "knn", "data.parquet"))
        kinds.append("knn")

    postings_bytes = sum(
        len(r["docs_bin"]) + len(r["tfs_bin"]) + len(r["pos_bin"])
        for r in block_rows
    )
    for kind in kinds:
        commit_dir(kind)
    try:
        os.rmdir(tmp_root)
    except OSError:
        pass
    return {"postings_bytes": int(postings_bytes)}


def build_segment_pdf(
    pdf,
    index_dir: str,
    config: IndexConfig,
    doc_base_map: dict,
):
    """The applyInPandas body: one pandas group (== one segment) in, one
    manifest row out. Checks the segment manifest first (resume)."""
    import pandas as pd

    pid = int(pdf["__pid"].iloc[0])
    sid = _segment_id(config.generation, pid)
    pdf = pdf.sort_values(config.key_col, kind="mergesort")
    urls = pdf[config.key_col].astype(str).tolist()
    specs = field_specs_of(config)
    texts_by_field = [
        (fname, pdf[src].fillna("").astype(str).tolist()) for fname, src in specs
    ]
    ih = _input_hash_fields(urls, texts_by_field)
    manifest_dir = os.path.join(index_dir, "manifest")
    os.makedirs(manifest_dir, exist_ok=True)
    manifest_path = os.path.join(manifest_dir, f"segment_{sid}.json")
    doc_base = int(doc_base_map[pid])

    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("input_hash") == ih and m.get("doc_base") == doc_base:
            m["status"] = "resumed"
            return pd.DataFrame([_manifest_row(m)])

    t0 = time.time()
    block_rows: list = []
    term_stats: list = []
    norms_rows: list = []
    field_stats: dict = {}
    vectors: list = []
    vec_fields = set(config.vector_fields or ())
    unknown = vec_fields - {fname for fname, _ in specs}
    if unknown:
        raise KeyError(
            f"vector field {sorted(unknown)[0]!r} is not an indexed field"
        )
    for fname, texts in texts_by_field:
        an = analyzer_for(config, fname)
        coded = None
        if fname in vec_fields:
            # SINGLE-PASS offsets tokenization: the same stream feeds
            # the inverted index (as the coded tuple) and the term
            # vectors (terms/positions/char spans) — no second
            # tokenization per vector field
            di, codes, uniq, poss, cnts, st, en = (
                an.tokenize_batch_coded_offsets(texts)
            )
            # 7-tuple: invert_field slices off the spans unless the
            # index also stores offsets-in-postings (then it shares
            # this same single-pass stream)
            coded = (di, codes, uniq, poss, cnts, st, en)
            if codes.size:
                terms_t = uniq[codes]
                bounds = np.searchsorted(di, np.arange(len(texts) + 1))
                for i in range(len(texts)):
                    a, b = int(bounds[i]), int(bounds[i + 1])
                    if a == b:
                        continue  # empty stream: no row (reader: empty)
                    vectors.append(
                        {
                            "doc_id": doc_base + i,
                            "url": urls[i],
                            "field": fname,
                            "terms": [str(t) for t in terms_t[a:b]],
                            "positions": poss[a:b].tolist(),
                            "starts": st[a:b].tolist(),
                            "ends": en[a:b].tolist(),
                        }
                    )
        br, ts, norms, stf, fdc = invert_field(
            fname, texts, an, config.store_positions, coded=coded,
            store_offsets=config.store_offsets,
        )
        block_rows.extend(br)
        term_stats.extend(ts)
        norms_rows.append(
            {
                "field": fname,
                "norms_bin": norms.tobytes(),
                "sum_total_tf": stf,
                "field_doc_count": fdc,
            }
        )
        field_stats[fname] = {"doc_count": fdc, "sum_total_tf": stf}
    if len(texts_by_field) > 1:
        # per-field outputs are term-sorted; the parquet file must be
        # GLOBALLY term-sorted for row-group min/max pruning
        block_rows.sort(key=lambda r: (r["term"], r["block_id"]))
        term_stats.sort(key=lambda r: r["term"])
    sum_tf = norms_rows[0]["sum_total_tf"]  # default (first) field
    stored = (
        {
            col: pdf[col].fillna("").astype(str).tolist()
            for col in config.stored_cols
        }
        if config.stored_cols
        else None
    )
    knn_graph = None
    if config.knn_vector_col:
        from lucene_spark.ops import hnsw

        vecs = np.asarray(
            pdf[config.knn_vector_col].tolist(), dtype=np.float64
        )
        g = hnsw.build_np(doc_base + np.arange(len(urls)), vecs)
        knn_graph = hnsw._graph_rows(pid, g).drop(columns=["shard"])
    extra = _write_segment_files(
        index_dir, sid, block_rows, term_stats, norms_rows, doc_base, urls,
        stored=stored, vectors=vectors, knn_graph=knn_graph,
    )
    m = {
        "segment_id": sid,
        "pid": pid,
        "generation": config.generation,
        "doc_base": doc_base,
        "num_docs": len(urls),
        "num_terms": len(term_stats),
        "num_postings": int(sum(r["num_docs"] for r in block_rows)),
        "sum_total_tf": sum_tf,
        "field_stats": field_stats,
        "postings_bytes": extra["postings_bytes"],
        "input_hash": ih,
        "build_secs": round(time.time() - t0, 3),
        "status": "built",
    }
    _atomic_write_json(manifest_path, m)
    return pd.DataFrame([_manifest_row(m)])


_MANIFEST_SCHEMA = (
    "segment_id string, pid int, doc_base long, num_docs long, num_terms long, "
    "num_postings long, sum_total_tf long, postings_bytes long, "
    "input_hash string, status string, field_stats string"
)


def _manifest_row(m: dict) -> dict:
    return {
        "segment_id": m["segment_id"],
        "pid": int(m["pid"]),
        "doc_base": int(m["doc_base"]),
        "num_docs": int(m["num_docs"]),
        "num_terms": int(m["num_terms"]),
        "num_postings": int(m["num_postings"]),
        "sum_total_tf": int(m["sum_total_tf"]),
        "postings_bytes": int(m["postings_bytes"]),
        "input_hash": m["input_hash"],
        "status": m["status"],
        "field_stats": json.dumps(m.get("field_stats") or {}),
    }


def build_index(
    spark,
    df,
    index_dir: str,
    config: IndexConfig | None = None,
    doc_base_offset: int = 0,
    write_commit: bool = True,
) -> dict:
    """Build (or resume) an index over ``df`` and commit it.

    df must contain ``config.key_col`` (unique) and ``config.text_col``.
    ``doc_base_offset`` shifts all assigned doc ids (streaming appends
    continue the dense global id space — see streaming/nrt.py).
    ``write_commit=False`` builds the segments but does NOT publish a
    commit point (the caller splices segments into a larger commit and
    publishes that one atomically — see streaming/nrt.py append_batch).
    Returns the commit dict (also written to ``commits/gen_N.json``
    unless ``write_commit=False``).
    """
    import pyspark.sql.functions as F

    config = config or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    p = config.num_segments
    src_cols = list(
        dict.fromkeys(
            [src for _, src in field_specs_of(config)]
            + list(config.stored_cols)
            + ([config.knn_vector_col] if config.knn_vector_col else [])
        )
    )
    keyed = df.select(
        F.col(config.key_col).cast("string").alias(config.key_col),
        *[F.col(c) for c in src_cols],
    )
    if config.pid_expr:
        keyed = keyed.withColumn("__pid", F.expr(config.pid_expr).cast("int"))
    else:
        keyed = keyed.withColumn(
            "__pid", F.pmod(F.hash(F.col(config.key_col)), F.lit(p))
        )

    if config.doc_base_mode == "strided":
        doc_base_map = {
            pid: int(doc_base_offset) + pid * config.doc_stride for pid in range(p)
        }
    else:
        # tiny aggregation: docs per segment -> deterministic dense doc_base
        counts = {r["__pid"]: r["cnt"] for r in keyed.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()}
        doc_base_map = {}
        base = int(doc_base_offset)
        for pid in sorted(counts):
            doc_base_map[pid] = base
            base += counts[pid]

    cfg = config
    idx_dir = index_dir

    def fn(pdf):
        return build_segment_pdf(pdf, idx_dir, cfg, doc_base_map)

    # explicit-count repartition (REPARTITION_BY_NUM): one task per
    # segment. Without it AQE coalesces the pre-applyInPandas shuffle to
    # ~data/64MB partitions, capping build parallelism at a handful of
    # tasks no matter how many cores the cluster has.
    manifest_df = (
        keyed.repartition(p, "__pid")
        .groupBy("__pid")
        .applyInPandas(fn, schema=_MANIFEST_SCHEMA)
    )
    rows = [r.asDict() for r in manifest_df.collect()]
    rows.sort(key=lambda r: r["pid"])
    fields_agg: dict = {}
    for r in rows:
        for f, st in json.loads(r.get("field_stats") or "{}").items():
            cur = fields_agg.setdefault(f, {"doc_count": 0, "sum_total_tf": 0})
            cur["doc_count"] += int(st["doc_count"])
            cur["sum_total_tf"] += int(st["sum_total_tf"])
    commit = {
        "generation": config.generation,
        "segments": rows,
        "doc_count": int(sum(r["num_docs"] for r in rows)),
        "sum_total_tf": int(sum(r["sum_total_tf"] for r in rows)),
        "fields": fields_agg,
        "field_specs": [list(fs) for fs in field_specs_of(config)],
        "num_segments": len(rows),
        "key_col": config.key_col,
        "text_col": config.text_col,
        "stopwords": sorted(config.analyzer.stopwords),
        # per-field analyzer config (at least the stopword sets) so
        # Searcher/LocalSearcher reconstruct the same query-time
        # analysis chain a PerFieldAnalyzerWrapper index was built with
        "field_stopwords": {
            fname: sorted(analyzer_for(config, fname).stopwords)
            for fname, _ in (config.field_analyzers or ())
        },
        "store_positions": config.store_positions,
        "stored_cols": list(config.stored_cols),
        "vector_fields": list(config.vector_fields),
        "knn_vector_col": config.knn_vector_col,
    }
    if write_commit:
        os.makedirs(os.path.join(index_dir, "commits"), exist_ok=True)
        _atomic_write_json(
            os.path.join(index_dir, "commits", f"gen_{config.generation:06d}.json"),
            commit,
        )
    return commit


def read_latest_commit(index_dir: str) -> dict:
    cdir = os.path.join(index_dir, "commits")
    gens = sorted(f for f in os.listdir(cdir) if f.startswith("gen_"))
    if not gens:
        raise FileNotFoundError(f"no commits under {cdir}")
    with open(os.path.join(cdir, gens[-1])) as f:
        return json.load(f)
