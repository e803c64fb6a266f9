"""Unit semantics for the integer PageRank / TextRank operators (oracle
parity is covered by the textrank_keywords gate rehearsal)."""

from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.operators import graph


def test_pagerank_star_graph_hand_computed(spark):
    """Star a-{b,c,d}: after ONE iteration the exact nano-unit ranks are
    center = 150e6 + 3*(1e9*850//1000) and each leaf = 150e6 +
    (1e9*850)//(1000*3); the symmetric pair graph is a fixed point."""
    edges = spark.createDataFrame(
        [("a", x, 1) for x in "bcd"]
        + [(x, "a", 1) for x in "bcd"],
        "u string, v string, w long",
    )
    r1 = {r["token"]: r["r"] for r in graph.pagerank(edges, iters=1).collect()}
    assert r1["a"] == 150_000_000 + 3 * ((10**9 * 850 * 1) // (1000 * 1))
    leaf = 150_000_000 + (10**9 * 850 * 1) // (1000 * 3)
    assert r1["b"] == r1["c"] == r1["d"] == leaf

    pair = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1)], "u string, v string, w long"
    )
    r10 = {r["token"]: r["r"] for r in graph.pagerank(pair, iters=10).collect()}
    assert r10 == {"a": 10**9, "b": 10**9}  # fixed point, zero drift

    # center keeps its lead after the full run, deterministically
    r10s = {r["token"]: r["r"] for r in graph.pagerank(edges, iters=10).collect()}
    assert r10s["a"] > r10s["b"] == r10s["c"] == r10s["d"]


def test_token_graph_normalizes_and_drops_self_loops(spark):
    """'The the' produces no self-edge; case/whitespace fold into the
    engine-wide lower/trim convention; weights count adjacencies."""
    docs = spark.createDataFrame(
        [(1, "  The the QUICK fox "), (2, "quick fox")],
        "doc_id long, text string",
    )
    edges = {
        (r["u"], r["v"]): r["w"]
        for r in graph.token_cooccurrence_edges(docs).collect()
    }
    assert ("the", "the") not in edges
    assert edges[("quick", "fox")] == 2  # both docs
    assert edges[("fox", "quick")] == 2  # symmetrized
    assert edges[("the", "quick")] == 1


def test_textrank_hub_token_wins(spark):
    """A token adjacent to everything outranks peripheral tokens."""
    docs = spark.createDataFrame(
        [(1, "hub alpha"), (2, "hub beta"), (3, "hub gamma"), (4, "hub delta")],
        "doc_id long, text string",
    )
    top = graph.textrank_topk(docs, k=1, iters=10).collect()
    assert top[0]["token"] == "hub"
