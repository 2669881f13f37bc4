"""Integer-arithmetic PageRank: hand-computed ranks, dangling-mass
redistribution, partitioning invariance."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocr_spark.operators.graph import UNIT, pagerank  # noqa: E402


def _ref_pagerank(nodes, edges, iters):
    """Driver-side integer reference, same contract as the docstring."""
    n = len(nodes)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = {v: UNIT for v in nodes}
    t = 15 * UNIT // 100
    for _ in range(iters):
        dang = sum(rv for v, rv in r.items() if v not in out)
        in_sum = {}
        for s, d in edges:
            in_sum[d] = in_sum.get(d, 0) + r[s] // out[s]
        r = {
            v: t + (85 * (in_sum.get(v, 0) + dang // n)) // 100
            for v in nodes
        }
    return r


def test_pagerank_matches_integer_reference(spark):
    """3-node chain with a dangling sink plus a hub: Spark ranks equal
    the driver-side integer reference exactly (no tolerance)."""
    nodes = [1, 2, 3, 4]
    edges = [(1, 2), (1, 3), (2, 3), (4, 3)]  # 3 is dangling
    ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank_nano"]
           for r in pagerank(ndf, edf, iters=4).collect()}
    assert got == _ref_pagerank(nodes, edges, 4)
    # the sink accumulated the most mass, the hub the least of the rest
    assert got[3] == max(got.values())


def test_pagerank_partitioning_invariance(spark):
    """Integer sums are associative: any input partitioning produces
    identical ranks (THE property the nano-unit design buys — float
    PageRank would differ in low bits across partitionings)."""
    import random

    rng = random.Random(3)
    nodes = list(range(30))
    edges = list({(rng.randrange(30), rng.randrange(30))
                  for _ in range(120)})
    edges = [(s, d) for s, d in edges if s != d]
    ndf = spark.createDataFrame([(v,) for v in nodes], ["node"])
    edf = spark.createDataFrame(edges, ["src", "dst"])
    a = sorted(map(tuple, pagerank(ndf, edf, iters=3).collect()))
    b = sorted(map(tuple, pagerank(
        ndf.repartition(7), edf.repartition(5), iters=3).collect()))
    assert a == b
    ref = _ref_pagerank(nodes, edges, 3)
    assert dict(a) == ref


def test_pagerank_all_dangling_is_uniform(spark):
    """No edges at all: every node keeps the uniform teleport+dangling
    rank, and all ranks are equal."""
    ndf = spark.createDataFrame([(v,) for v in range(5)], ["node"])
    edf = spark.createDataFrame([], "src long, dst long")
    got = [r["rank_nano"] for r in pagerank(ndf, edf, iters=2).collect()]
    assert len(set(got)) == 1 and len(got) == 5
