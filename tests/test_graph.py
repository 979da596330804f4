"""Entity-graph analytics: PageRank dataflow vs a sequential reference
implementation, dangling-mass convention, degree stats."""

from pyspark.sql import functions as F

from ner_extractor_spark.operators.graph import degree_stats, pagerank

EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]
# 'e' appears only as a dst -> dangling node (no out-edges)
EDGES_D = EDGES + [("c", "e")]


def _reference_pagerank(edges, n_iter=5, d=0.85):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    out = {}
    for u, _ in set(edges):
        out[u] = out.get(u, 0) + 1
    import math

    def r8(x):
        return math.floor(x * 1e8 + 0.5) / 1e8   # SQL HALF_UP rounding

    rank = {v: r8(1.0 / n) for v in nodes}
    for _ in range(n_iter):
        contrib = {v: 0.0 for v in nodes}
        for u, v in set(edges):
            contrib[v] += rank[u] / out[u]
        rank = {v: r8((1.0 - d) / n + d * contrib[v]) for v in nodes}
    return rank


def test_pagerank_matches_reference_and_is_partition_invariant(spark):
    df = spark.createDataFrame(EDGES_D, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    want = _reference_pagerank(EDGES_D, n_iter=5)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    # the hub 'c' (3 in-edges) outranks everything
    assert got["c"] == max(got.values())
    # dangling 'e' receives rank but redistributes none (mass dropped)
    assert got["e"] > 0 and sum(got.values()) < 1.0
    again = {r["node"]: r["rank"]
             for r in pagerank(df.repartition(7), n_iter=5).collect()}
    assert again == got


def test_degree_stats(spark):
    df = spark.createDataFrame(EDGES_D + [("a", "b")],  # dup edge dropped
                               "src string, dst string")
    got = {r["node"]: (r["out_deg"], r["in_deg"])
           for r in degree_stats(df).collect()}
    assert got["a"] == (2, 1)
    assert got["c"] == (2, 3)
    assert got["e"] == (0, 1)
    assert got["d"] == (1, 0)


def test_pagerank_uniform_on_cycle(spark):
    cyc = [("x", "y"), ("y", "z"), ("z", "x")]
    df = spark.createDataFrame(cyc, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=5).collect()}
    vals = set(got.values())
    assert len(vals) == 1                      # symmetry preserved
    assert abs(next(iter(vals)) - 1.0 / 3) < 1e-8


def test_pagerank_plan_checkpointed_per_iteration(spark):
    # rank is consumed twice per round; the operator must not rebuild
    # the whole lineage per use (smoke: 10 rounds finish fast on 100s
    # of edges — exponential re-eval would not)
    edges = [(i % 37, (i * 7 + 1) % 37) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, n_iter=10)
    assert out.count() == 37
    s = out.agg(F.sum("rank")).first()[0]
    assert 0.5 < s <= 1.000001


def test_triangle_count_known_graph(spark):
    from ner_extractor_spark.operators.graph import triangle_count
    # K4 on {1,2,3,4} (4 triangles, each node in 3) + a pendant edge +
    # a self-loop + a reversed duplicate edge (must not double count)
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (5, 5), (2, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}       # node 5: no triangle
    # global count = sum / 3
    assert sum(got.values()) // 3 == 4


def _reference_label_prop(edges, n_iter):
    """Sequential replay of the synchronous mode-label rounds."""
    und = set()
    for u, v in edges:
        if u != v and u is not None and v is not None:
            und.add((u, v))
            und.add((v, u))
    nodes = sorted({u for u, _ in und})
    labels = {v: v for v in nodes}
    for _ in range(n_iter):
        nxt = {}
        for v in nodes:
            counts = {}
            for a, b in und:
                if a == v:
                    lb = labels[b]
                    counts[lb] = counts.get(lb, 0) + 1
            nxt[v] = min(counts, key=lambda l: (-counts[l], l))
        labels = nxt
    return labels


def test_label_propagation_matches_sequential_replay(spark):
    from ner_extractor_spark.operators.graph import label_propagation
    # two cliques bridged by one edge + a self-loop + reversed dup
    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"),
             ("c", "x"), ("a", "a"), ("b", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["community"]
           for r in label_propagation(df, n_iter=4).collect()}
    assert got == _reference_label_prop(edges, 4)


def test_label_propagation_separates_disconnected_cliques(spark):
    from ner_extractor_spark.operators.graph import label_propagation
    edges = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["community"]
           for r in label_propagation(df, n_iter=4).collect()}
    left = {got[n] for n in "abc"}
    right = {got[n] for n in "xyz"}
    assert left == {"a"} and right == {"x"}


def test_label_propagation_argmax_is_aggregate_not_window(spark):
    from ner_extractor_spark.operators.graph import label_propagation
    edges = [("a", "b"), ("b", "c"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    plan = label_propagation(df, n_iter=2)._jdf.queryExecution() \
        .executedPlan().toString()
    # the per-node mode label is min(struct(-n, label)) — a plain
    # aggregate; a Window-based rank here would re-sort every node's
    # candidate labels each round
    assert "Window" not in plan


def test_khop_shortest_hop_and_no_reexpand(spark):
    from ner_extractor_spark.operators.graph import khop_neighborhood
    # path a-b-c-d plus shortcut a-c: c must report hop 1 via the
    # shortcut, never 2 via b; d is hop 2; e-f is a disconnected
    # component and must not appear
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("e", "f")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["hop"]
           for r in khop_neighborhood(df, k=3, seed="a").collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_khop_default_seed_is_top_degree_hub(spark):
    from ner_extractor_spark.operators.graph import khop_neighborhood
    # degrees (symmetrized): h=3, everything else <= 2 -> seed h
    edges = [("h", "x"), ("h", "y"), ("h", "z"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["hop"]
           for r in khop_neighborhood(df, k=1).collect()}
    assert got == {"h": 0, "x": 1, "y": 1, "z": 1}


def test_khop_max_degree_caps_traversal_not_seed_choice(spark):
    from ner_extractor_spark.operators.graph import khop_neighborhood
    # hub h has neighbors a..d; cap 2 keeps the two SMALLEST ids, so
    # c and d become unreachable at hop 1 — and stay unreachable
    # (nothing else links them); the seed is still h (true degree 4)
    edges = [("h", "a"), ("h", "b"), ("h", "c"), ("h", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["hop"]
           for r in khop_neighborhood(df, k=2, max_degree=2).collect()}
    assert got == {"h": 0, "a": 1, "b": 1}
    # uncapped: all four neighbors at hop 1
    full = {r["node"]: r["hop"]
            for r in khop_neighborhood(df, k=2).collect()}
    assert full == {"h": 0, "a": 1, "b": 1, "c": 1, "d": 1}


def test_khop_hop_k_bound(spark):
    from ner_extractor_spark.operators.graph import khop_neighborhood
    # chain a-b-c-d-e: k=2 from a stops at c
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["hop"]
           for r in khop_neighborhood(df, k=2, seed="a").collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_induced_subgraph_both_endpoints_required(spark):
    from ner_extractor_spark.operators.graph import (induced_subgraph,
                                                     khop_neighborhood)
    # neighborhood of a (k=1): {a,b,c}; edge c->d leaves it, d->e is
    # fully outside — only a-b, a-c, b-c survive, with endpoint hops
    edges = [("a", "b", 5), ("a", "c", 2), ("b", "c", 1),
             ("c", "d", 9), ("d", "e", 3)]
    df = spark.createDataFrame(edges, "src string, dst string, n long")
    hood = khop_neighborhood(df.select("src", "dst"), k=1, seed="a")
    got = {(r["src"], r["dst"]): (r["n"], r["src_hop"], r["dst_hop"])
           for r in induced_subgraph(df, hood).collect()}
    assert got == {("a", "b"): (5, 0, 1),
                   ("a", "c"): (2, 0, 1),
                   ("b", "c"): (1, 1, 1)}


def test_induced_subgraph_broadcast_plan(spark):
    from ner_extractor_spark.operators.graph import (induced_subgraph,
                                                     khop_neighborhood)
    edges = [("a", "b", 1), ("b", "c", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, n long")
    hood = khop_neighborhood(df.select("src", "dst"), k=2, seed="a")
    plan = (induced_subgraph(df, hood)
            ._jdf.queryExecution().executedPlan().toString())
    # membership joins broadcast; the edge table is never exchanged
    assert "BroadcastHashJoin" in plan
