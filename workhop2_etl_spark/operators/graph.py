"""Connected components — transitive closure of a pair relation.

Near-dup detection emits PAIRS (dedup_text.near_dup_pairs); corpus
dedup needs CLUSTERS: if A~B and B~C, one canonical doc should
survive for {A,B,C} even though (A,C) was never emitted. That closure
is a connected-components problem over the similarity graph.

Spark-first formulation: iterative min-label propagation as DataFrame
joins (no RDDs, no driver-side graph).  Each round every node takes
the min component id over itself and its neighbors; a pointer-jumping
step (node → its label's label) then halves remaining path lengths,
giving O(log diameter)-ish convergence instead of O(diameter).
``localCheckpoint`` after every round truncates the plan lineage —
without it the iterated join tree grows exponentially and Catalyst
chokes long before the data does.

At 100 TB this is the same dataflow the large-star/small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond") runs; each round is one shuffle by node id, and the
similarity graphs dedup produces are short-diameter (duplicate
clusters are near-cliques), so the loop terminates in a handful of
rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through ``edges`` (undirected) with
    its component id = the minimum node id in the component.

    Returns ``(node, component)`` — one row per distinct node that
    appears in the edge list. Raises if the loop hits ``max_iter``
    without converging (pathological diameter — at that point the
    caller should switch to a star-contraction variant).
    """
    # checkpoint the directed projection FIRST: the upstream pipeline
    # (often a full LSH run) executes once, not once per direction
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .localCheckpoint()
    )
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct().localCheckpoint()
    labels = (
        und.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # 1. neighbor-min: comp(n) ← min(comp(n), min comp over neighbors)
        nbr = (
            und.join(labels.select(F.col("node").alias("b"), "comp"), "b")
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            labels.join(nbr, labels.node == nbr.a, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            )
        )
        # 2. pointer jumping: comp(n) ← comp(comp(n)) (labels are node
        # ids, so the label's own label is one hop closer to the root)
        jumped = (
            stepped.alias("s")
            .join(
                stepped.select(F.col("node").alias("comp"), F.col("comp").alias("comp2")).alias(
                    "t"
                ),
                "comp",
                "left",
            )
            .select(F.col("s.node").alias("node"), F.coalesce("comp2", "comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
        )
        done = changed.isEmpty()
        labels = jumped
        if done:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the
    weighted-iterative sibling of connected_components (quality/
    authority scoring over link or citation graphs, a standard
    training-data curation signal).

    Returns ``(node, rank)`` for every node appearing as src or dst.
    Semantics (mirrored exactly by the SQL oracle): uniform init
    1/N; per iteration rank = (1-d)/N + d·Σ in-contributions, where a
    node's out-contribution is rank/out_degree; dangling-node mass is
    NOT redistributed (the simple variant — documented so the oracle
    can unroll it as plain join+aggregate rounds).

    Scale shape: ranks is a node-sized DataFrame re-joined to the
    edge list each round — one shuffle by node id per iteration, the
    same dataflow as the classic MapReduce formulation. The plan is
    lineage-cut every ``checkpoint_every`` rounds (iterated joins
    otherwise grow the plan exponentially); a fixed small ``iters``
    keeps the whole computation deterministic.
    """
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()  # bounded driver action: one scalar
    if n_nodes == 0:
        # empty graph → empty (node, rank), like connected_components
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for i in range(iters):
        # string-aliased column refs: after round 1 every input shares
        # lineage with `e`, and attribute refs (e["dst"]) would be
        # ambiguous self-join references
        contrib = (
            ranks.alias("r")
            .join(deg.alias("g"), F.col("r.node") == F.col("g.src"))
            .join(e.alias("t"), F.col("r.node") == F.col("t.src"))
            .groupBy(F.col("t.dst").alias("node"))
            .agg(F.sum(F.col("r.rank") / F.col("g.out_deg")).alias("in_mass"))
        )
        ranks = (
            nodes.alias("n")
            .join(contrib.alias("c"), F.col("n.node") == F.col("c.node"), "left")
            .select(
                F.col("n.node").alias("node"),
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.coalesce(F.col("c.in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
    return ranks


def triangle_count(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list —
    the standard local-clustering / community-density signal over
    similarity and co-occurrence graphs (e.g. how clique-like a
    near-dup cluster is before collapsing it).

    Returns ``(node, n_triangles)`` for every node that closes at
    least one triangle. Self-loops and duplicate/reversed edges are
    cleaned first, so the input may be a raw pair emission.

    Scale shape — the classic degree-oriented edge algorithm (the
    MapReduce formulation of Suri & Vassilvitskii's "Counting
    Triangles and the Curse of the Last Reducer"): orient every
    undirected edge from its lower-(degree, id) endpoint to the
    higher one, so each node's out-neighborhood is bounded by
    O(sqrt(m)) regardless of raw degree; wedges are then an
    equi-join of the oriented list with itself on the wedge center,
    and each wedge closes by one more equi-join against the oriented
    list. Every step is a shuffle on a node/edge key — no cartesian,
    no driver-side adjacency. Triangle counts are orientation-
    invariant, so a plain SQL restatement (id-oriented) verifies the
    degree-oriented plan's output exactly.
    """
    # localCheckpoint: `canon` is consumed three times (degree count,
    # orientation join, closing-edge probe) and its upstream may be an
    # arbitrarily heavy pipeline (g7 feeds it a 4-table fact join) —
    # without the lineage cut the plan re-executes that upstream once
    # per consumer (PLAN_r05 measured 133 shuffles vs ≤13 elsewhere).
    canon = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
        )
        .distinct()
        .localCheckpoint()
    )
    # undirected degree per node → the orientation key (deg, id)
    deg = (
        canon.select(F.col("a").alias("node"))
        .union(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ranked = (
        canon.join(deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
            )
            .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
            .alias("e")
        )
        .select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
        # consumed twice by the wedge self-join — cut lineage so the
        # degree join above runs once, not once per self-join side
        .localCheckpoint()
    )
    # wedges centered at `lo` (the low-order endpoint): two out-edges
    # (lo→x, lo→y); the triangle closes iff (x,y) is itself an
    # oriented edge in either direction — checked with ONE probe by
    # canonicalizing the closing pair back to (min, max) id order,
    # which is exactly `canon`'s key.
    wedges = (
        ranked.alias("l")
        .join(ranked.alias("r"), F.col("l.lo") == F.col("r.lo"))
        .filter(F.col("l.hi") < F.col("r.hi"))
        .select(
            F.col("l.lo").alias("apex"),
            # l.hi < r.hi is already min/max id order — canon's key
            F.col("l.hi").alias("ca"),
            F.col("r.hi").alias("cb"),
        )
    )
    tri = wedges.join(
        canon.select(F.col("a").alias("ca"), F.col("b").alias("cb")),
        ["ca", "cb"],
    )
    # one explode, not a 3-way union of projections: the union form
    # instantiates the whole wedge-join subtree three times; explode
    # keeps a single subtree feeding one aggregate
    return (
        tri.select(F.explode(F.array("apex", "ca", "cb")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def label_propagation(
    edges: DataFrame, iters: int = 2, weight_col: str | None = None
) -> DataFrame:
    """Synchronous (weighted) label propagation over an undirected
    view of ``edges (src, dst [, weight_col])``: every node starts
    labeled with its own id; each round it adopts the label carrying
    the greatest total neighbor weight (ties → smallest label). Fully
    deterministic — synchronous rounds plus the (weight desc, label
    asc) tiebreak remove LPA's usual order-dependence, so a fixed
    ``iters`` unrolls to a SQL-expressible chain of join+argmax
    rounds (the g8 oracle replays it).

    Scale shape per round: one equi-join of the label table onto the
    neighbor list, one (node, label) hash aggregate, one per-node
    argmax window — all keyed by node, no all-pairs step. The label
    table is node-sized; ``localCheckpoint`` after every round cuts
    the re-execution lineage exactly as in ``connected_components``.
    """
    w = F.col(weight_col) if weight_col else F.lit(1)
    nbrs = (
        edges.select(
            F.col("src").alias("node"), F.col("dst").alias("nbr"), w.alias("w")
        )
        .unionByName(
            edges.select(
                F.col("dst").alias("node"), F.col("src").alias("nbr"), w.alias("w")
            )
        )
        .localCheckpoint()
    )
    labels = nbrs.select("node").distinct().withColumn("label", F.col("node"))
    win = Window.partitionBy("node").orderBy(F.desc("wt"), F.asc("label"))
    for _ in range(iters):
        scored = (
            nbrs.join(
                labels.select(F.col("node").alias("nbr"), "label"), "nbr"
            )
            .groupBy("node", "label")
            .agg(F.sum("w").alias("wt"))
        )
        labels = (
            scored.withColumn("rk", F.row_number().over(win))
            .filter(F.col("rk") == 1)
            .select("node", "label")
            .localCheckpoint()
        )
    return labels
