"""Hashed-feature Naive Bayes: planted-signal learnability, partition
invariance of the BIGINT scores, smoothing grid coverage."""

from __future__ import annotations

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.operators.classifier import (  # noqa: E402
    hashed_token_features,
    nb_train_score,
)


def _planted_docs(spark, n=120, seed=5):
    """Two disjoint vocabularies -> lexically separable classes."""
    rng = random.Random(seed)
    pos_vocab = [f"alpha{i}" for i in range(12)]
    neg_vocab = [f"beta{i}" for i in range(12)]
    rows = []
    for i in range(n):
        y = i % 2
        vocab = pos_vocab if y else neg_vocab
        words = [rng.choice(vocab) for _ in range(30)]
        rows.append((i, " ".join(words), y))
    rows.append((n, "   ", 1))  # whitespace-only doc must be excluded
    return spark.createDataFrame(rows, ["doc_id", "text", "y"])


def test_nb_learns_planted_lexical_signal(spark):
    docs = _planted_docs(spark)
    out = nb_train_score(docs, "doc_id", "text", "y",
                         num_buckets=32).collect()
    assert len(out) == 120  # the empty doc produced no row
    acc = sum(r["pred"] == r["label"] for r in out) / len(out)
    assert acc == 1.0
    # scores separate: positive docs favor class 1 strictly
    for r in out:
        if r["label"] == 1:
            assert r["score1"] > r["score0"]


def test_nb_scores_partition_invariant(spark):
    """Micro-nat BIGINT scores are exact integer sums: repartitioning
    the input must reproduce them bit-for-bit."""
    docs = _planted_docs(spark, n=60)
    a = sorted(map(tuple, nb_train_score(
        docs, "doc_id", "text", "y", num_buckets=16).collect()))
    b = sorted(map(tuple, nb_train_score(
        docs.repartition(7), "doc_id", "text", "y",
        num_buckets=16).collect()))
    assert a == b


def test_hashed_features_sum_to_token_count(spark):
    docs = _planted_docs(spark, n=10)
    feats = hashed_token_features(docs, "doc_id", "text", 8).collect()
    per_doc = {}
    for r in feats:
        assert 0 <= r["bucket"] < 8
        per_doc[r["id"]] = per_doc.get(r["id"], 0) + r["cnt"]
    assert all(v == 30 for v in per_doc.values())
    assert len(per_doc) == 10


def test_nb_rejects_single_class_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "a b c", 1), (2, "d e f", 1)], ["doc_id", "text", "y"])
    import pytest

    with pytest.raises(ValueError, match="both labels"):
        nb_train_score(docs, "doc_id", "text", "y", num_buckets=8)
