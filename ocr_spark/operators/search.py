"""Corpus retrieval: distributed BM25 scoring.

A training-data platform needs targeted retrieval over the corpus it
curates — "find the documents about X" for auditing, eval-set
construction, and topical subset extraction. BM25 (Robertson/Spärck
Jones; the Lucene default) is the standard lexical ranker.

Spark-first shape: term statistics (tf, df, doc length) come from ONE
word-explode aggregate each; the query term set is a literal filter
pushed before every aggregate, so at 100 TB the plan touches only
postings of the queried terms (plus the one corpus pass for document
lengths, shared/cacheable across queries).

Cross-engine exactness (DuckDB oracle in `__spark_entry__`): the
Lucene idf ``ln(1 + (N - df + 0.5)/(df + 0.5))`` is pinned to the
integer micro-nat grid; each per-term score is computed in ONE fixed
IEEE expression and pinned to the micro grid BEFORE the per-document
sum, so document scores are BIGINT sums — no summation-order freedom.
The k1/b literals are written identically on both engines (both parse
to the same nearest double).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

MICRO = 1_000_000
WS_SPLIT = r"\s+"


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, word) explode — the shared tokenization of the one-shot
    ranker and the incremental indexer (they MUST agree or the
    incremental == batch equality breaks)."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), WS_SPLIT))
        .alias("word"),
    ).filter(F.length("word") > 0)


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag of query terms under BM25.

    Returns (doc_id, score_micro, rank): score_micro is the BIGINT sum
    of per-term micro-pinned scores; rank breaks ties by doc_id
    ascending. Documents matching no term do not appear.
    """
    toks = _tokens(docs, id_col, text_col)
    dl = toks.groupBy("id").agg(F.count("*").alias("dl"))
    # term filter BEFORE the tf aggregate: only queried postings shuffle
    tf = (
        toks.filter(F.col("word").isin(list(query_terms)))
        .groupBy("id", "word")
        .agg(F.count("*").alias("tf"))
    )
    return bm25_score_topk(tf, dl, query_terms, k=k, k1=k1, b=b)


def bm25_score_topk(
    tf: DataFrame,
    dl: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranking from term statistics: ``tf`` (id, word, tf) and
    ``dl`` (id, dl). The stats can come from a one-pass tokenize
    (bm25_topk) or from the incrementally maintained index tables
    (bm25_index_topk) — the scoring arithmetic is this ONE function, so
    the two paths are equal by construction, not by parallel
    implementations. ``tf`` may carry all words or only the queried
    ones; the term filter here re-applies either way (a no-op on the
    pre-filtered path, predicate-pushdown on the index-read path).
    """
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    ).collect()[0]
    n_docs = int(stats[0])
    if n_docs == 0:
        # checked before touching the sum: an empty corpus yields a
        # NULL total and int(None) would mask this error as a TypeError
        raise ValueError("bm25: empty corpus (no doc-length rows)")
    total_tokens = int(stats[1])
    avgdl = total_tokens / n_docs  # one IEEE division, both engines

    tf = tf.filter(F.col("word").isin(list(query_terms)))
    dfw = tf.groupBy("word").agg(F.count("*").alias("df"))
    idf = dfw.select(
        "word",
        F.floor(
            F.log(
                1.0
                + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            )
            * F.lit(MICRO)
            + F.lit(0.5)
        ).cast("long").alias("idf_micro"),
    )
    term_score = F.floor(
        F.col("idf_micro").cast("double")
        * (F.col("tf") * (k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (1.0 - b + F.lit(b) * F.col("dl") / F.lit(avgdl))
        )
        + F.lit(0.5)
    ).cast("long")
    scored = (
        tf.join(F.broadcast(idf), "word")
        .join(dl, "id")
        .select("id", term_score.alias("s"))
        .groupBy("id")
        .agg(F.sum("s").alias("score_micro"))
    )
    # orderBy+limit plans as TakeOrdered (per-partition top-k, then a
    # k-row merge on the driver) — no global sort of the scored set;
    # the row_number window then runs over k rows only.
    top = scored.orderBy(
        F.col("score_micro").desc(), F.col("id").asc()
    ).limit(k)
    w = W.orderBy(F.col("score_micro").desc(), F.col("id").asc())
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(F.col("id").alias("doc_id"), "score_micro", "rank")


def index_commit(
    docs: DataFrame,
    postings,
    doclens,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[int, int]:
    """Commit a batch of documents into the incrementally maintained
    retrieval index: ``postings`` (SnapshotTable keyed by ``pkey`` =
    word<TAB>id, columns id/word/tf) and ``doclens`` (SnapshotTable
    keyed by ``id``, column dl). The pattern is the KMV-sketch one
    (functions/sketches.py): per-commit MERGE of mergeable per-batch
    statistics, so corpus-lifetime retrieval never rescans committed
    text — at 100 TB the index update touches one ingest cycle, and
    queries touch only the (bucketed, column-pruned, word-pushed-down)
    index tables.

    Corpus semantics are append-only immutable documents (this repo's
    standing assumption): a doc_id is committed once, so MERGE replays
    (crash/retry) overwrite identical rows — idempotent — and no
    postings ever need deletion. The TAB separator in pkey cannot occur
    in either component (words are whitespace-split; ids with literal
    tabs are rejected loudly rather than silently miskeyed).

    Returns (postings_version, doclens_version).
    """
    toks = _tokens(docs, id_col, text_col)
    tf = (
        toks.groupBy("id", "word")
        .agg(F.count("*").alias("tf"))
        .withColumn("pkey", F.concat_ws("\t", "word", "id"))
    )
    bad = docs.filter(F.col(id_col).contains("\t")).limit(1).count()
    if bad:
        raise ValueError("index_commit: doc ids must not contain tabs")
    pv = postings.merge_upsert(tf)
    dl = toks.groupBy("id").agg(F.count("*").alias("dl"))
    dv = doclens.merge_upsert(dl)
    return pv, dv


def bm25_index_topk(
    spark,
    postings,
    doclens,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k served FROM the incremental index (no corpus scan):
    reads the two index tables and routes through the same
    bm25_score_topk arithmetic as the one-shot ranker, so
    ``bm25_index_topk(after N commits) == bm25_topk(union of all N
    batches)`` exactly (pytest-pinned). The query-term filter lands on
    the postings read as a parquet predicate on ``word``; doclens is
    read in full (one slim (id, dl) column pair — the corpus-size
    denominator genuinely needs every document)."""
    tf = postings.read(spark).select("id", "word", "tf")
    dl = doclens.read(spark).select("id", "dl")
    return bm25_score_topk(tf, dl, query_terms, k=k, k1=k1, b=b)
