"""Model-based document scoring: hashed-feature multinomial Naive Bayes.

The FineWeb-Edu / DCLM curation pattern at 100 TB scale: an expensive
judge (an LLM, a human rubric, or — here — the corpus quality heuristic)
labels documents, a CHEAP linear model is trained on those labels over
hashing-trick token features, and the cheap model then scores the whole
corpus. Naive Bayes is the distributed-training sweet spot: training is
ONE counting aggregate (map-side combined), the model is 2 x num_buckets
rows (broadcastable at any corpus size), and scoring is a
broadcast-join + BIGINT dot product.

The hashing trick (Weinberger et al. 2009) bounds the feature space:
bucket = md5_60(token) mod num_buckets — engine-neutral, so the DuckDB
oracle reproduces features exactly, and vocabulary growth at web scale
never grows the model.

Cross-engine exactness: counts are integers; every log is pinned to the
integer micro-nat grid (``floor(ln(x) * 1e6 + 0.5)``, the lm.py
convention) the moment it is taken, so scores are BIGINT sums of
BIGINT products — associative-exact on any engine, no rounding
tolerance in the oracle comparison.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..session import checkpoint_truncate
from .lm import _micro_ln  # one micro-nat grid for the whole repo

WS_SPLIT = r"\s+"


def hashed_token_features(
    docs: DataFrame, id_col: str, text_col: str, num_buckets: int = 64,
) -> DataFrame:
    """(id, bucket, cnt): hashing-trick bag-of-words. Empty/whitespace
    docs produce no rows. One shuffle (groupBy id+bucket, map-side
    combined); the token explode never materializes beyond the
    aggregate's partial buffers."""
    toks = docs.filter(F.length(F.trim(text_col)) > 0).select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), WS_SPLIT)).alias("t"),
    )
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
        % num_buckets
    )
    return (
        toks.select("id", bucket.alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def nb_train_score(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    num_buckets: int = 64,
) -> DataFrame:
    """Train add-one-smoothed multinomial NB on (docs, 0/1 `label_col`)
    and score every training document. Returns (id, label, score1,
    score0, pred) — scores are BIGINT micro-nat log-posteriors,
    pred = 1 iff score1 >= score0 (ties to the positive class, matching
    the oracle's CASE).

    Scale shape: feature counting is the only corpus-sized shuffle.
    Class-conditional counts aggregate those (id, bucket, cnt) rows down
    to <= 2 x num_buckets rows; the smoothed log-prob table and the
    2-row prior are built with a generate-range cross join so
    zero-count buckets get their +1 mass, then BROADCAST back. Scoring
    reuses the feature table's (id, bucket) partitioning: broadcast
    hash join, no second corpus shuffle; the final per-doc aggregate
    combines map-side. The judge labels would normally come from a
    separate (expensive) pass over a small sample; here the label is a
    column so the query stays one job."""
    # Materialize the LABEL table (id + int: ~16 bytes/doc, 2-3 orders
    # of magnitude narrower than the text it derives from). The label
    # column is typically an expensive judge expression (here: the
    # quality regex over the full text); without materialization, the
    # classes check, n_all, the prior, the model branch, the scoring
    # join and the output join each re-evaluate it — measured 13 s ->
    # 5 s on the 8x bench corpus. Checkpoint, NOT persist: the
    # returned plan references this table, so the function cannot
    # unpersist it and the caller has no handle to — a CacheManager
    # entry would pin one label table per call for the session's life.
    # Checkpoint blocks instead release via the ContextCleaner as soon
    # as the caller drops the result (at 10^12 docs the ~16 TB label
    # table spills to disk; it must not OOM either way).
    # (The corpus-sized FEATURE table stays unmaterialized on purpose —
    # that was the round-3 review fix; its two consumers are the
    # documented two scans.)
    labels = checkpoint_truncate(
        docs.filter(F.length(F.trim(text_col)) > 0).select(
            F.col(id_col).alias("id"),
            F.col(label_col).cast("int").alias("y"),
        )
    )
    classes = {r["y"] for r in labels.select("y").distinct().collect()}
    if classes != {0, 1}:
        # a single-class (or empty) corpus would produce null scores for
        # the missing class and every pred would silently fall to 0;
        # sort via str so a NULL label cannot crash the diagnostic
        # (nothing is returned on this path — the checkpoint blocks are
        # released by the next GC once `labels` goes out of scope)
        raise ValueError(
            "nb_train_score: need both labels 0 and 1, got "
            f"{sorted(classes, key=str)}"
        )
    feats = hashed_token_features(docs, id_col, text_col, num_buckets)
    # no persist: the feature table is corpus-sized, and its two
    # consumers split naturally — the class-count branch collapses into
    # the tiny broadcast model (built once), and the scoring branch is
    # the one full pass. Two scans, zero cached state that a caller
    # would have to release; callers with cheap memory can persist the
    # input df themselves.
    feats = feats.join(labels, "id")

    cls_counts = (
        feats.groupBy("y", "bucket").agg(F.sum("cnt").alias("c"))
    )
    grid = (
        labels.select("y").distinct()
        .crossJoin(
            feats.sparkSession.range(num_buckets)
            .select(F.col("id").alias("bucket"))
        )
    )
    cls_tot = cls_counts.groupBy("y").agg(
        (F.sum("c") + num_buckets).alias("tot"))
    logp = (
        grid.join(cls_counts, ["y", "bucket"], "left")
        .join(cls_tot, "y")
        .select(
            "y", "bucket",
            _micro_ln(
                (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                / F.col("tot")
            ).alias("lp"),
        )
    )
    n_all = labels.count()
    prior = labels.groupBy("y").agg(
        _micro_ln(F.count("*").cast("double") / n_all).alias("prior"))

    scored = (
        feats.select("id", "bucket", "cnt")
        .join(F.broadcast(logp.withColumnRenamed("y", "cls")), "bucket")
        .groupBy("id", "cls")
        .agg(F.sum(F.col("cnt") * F.col("lp")).alias("s"))
        .join(F.broadcast(prior.withColumnRenamed("y", "cls")), "cls")
        .select("id", "cls", (F.col("s") + F.col("prior")).alias("s"))
        .groupBy("id")
        .agg(
            F.max(F.when(F.col("cls") == 1, F.col("s"))).alias("score1"),
            F.max(F.when(F.col("cls") == 0, F.col("s"))).alias("score0"),
        )
    )
    out = (
        scored.join(labels, "id")
        .select(
            "id",
            F.col("y").alias("label"),
            "score1",
            "score0",
            F.when(F.col("score1") >= F.col("score0"), F.lit(1))
            .otherwise(F.lit(0)).alias("pred"),
        )
    )
    return out
