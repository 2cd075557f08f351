"""Distributed graph clustering for the dedup pipeline (SURVEY §2.11).

Near-duplicate candidate generation (MinHash / SimHash banding) emits PAIRS;
a training-data pipeline needs GROUPS so it can keep one representative per
duplicate cluster. The bridge is connected components over the pair graph.
The reference engine has no graph stage (its duplicate handling is per-file
identity, reference processor.py duplicate policies) — this is a §2.11
training-data-pipeline extension.

Algorithm: iterative min-label propagation. Every node starts labelled with
its own id; each round, a node adopts the minimum label among itself and its
neighbours; at fixpoint each component carries the minimum node id in the
component as its label. Duplicate clusters are near-cliques, so the graph
diameter — and therefore the round count — is tiny (2-4) even when the
corpus is enormous.

100 TB shape:
  - one round = one shuffle (edge-label join on ``dst`` + min-aggregate on
    ``src``); no global structure, no driver-side graph;
  - lineage is cut per round with ``localCheckpoint`` so the plan stays O(1)
    deep regardless of iteration count (on a cluster with an HDFS checkpoint
    dir, ``checkpoint`` gives the same truncation with storage durability);
  - convergence is detected with a LIMIT-1 scan of the (new, old) label
    pair carried through the round's aggregate — no join against the
    previous frame and no full count;
  - only nodes that appear in an edge are labelled — in a dedup flow the
    pair set is collision-bounded by banding, so the label frame is orders
    of magnitude smaller than the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType


def connected_components(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum node id
    reachable from it. Returns ``(node, component)``.

    Node ids may be any numeric type (normalized to long, component = min
    long id) or strings (component = lexicographic-min id). The type is
    taken from the DECLARED schema — never from a data-dependent cast,
    which would silently NULL non-numeric ids and merge unrelated nodes.

    ``max_iter`` bounds the worst case (a path graph); label propagation
    needs ``diameter`` rounds and duplicate clusters have tiny diameters.
    """
    numeric = isinstance(edges.schema[a].dataType, NumericType) and isinstance(
        edges.schema[b].dataType, NumericType
    )
    node_t = "long" if numeric else "string"
    # Checkpoint the DIRECTED edge frame before symmetrizing: the union has
    # two branches over the same subtree, and edge frames arrive here as
    # full candidate pipelines (MinHash banding + Jaccard verify) — without
    # the cut, that whole pipeline would execute twice just to build sym.
    directed = edges.select(
        F.col(a).cast(node_t).alias("src"), F.col(b).cast(node_t).alias("dst")
    ).localCheckpoint(eager=True)  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    # Round 14: materialize the symmetrized frame ONCE, redistributed on
    # dst (the per-round join key) at full shuffle width. Note what this
    # does NOT buy: localCheckpoint's LogicalRDD reports
    # UnknownPartitioning under AQE, so every round still pays its own
    # exchange of sym. The measured win (−11% median on the CC rows,
    # visibly stabler) comes from (a) not re-running the union projection
    # per round and (b) feeding each round's exchange a balanced 32-way
    # input instead of the AQE-coalesced narrow one (same starvation
    # mechanism as the round-13 coalesce-floor fix).
    sym = directed.union(
        directed.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).repartition("dst").localCheckpoint(eager=False)  # lc-ok: pure compute; executor loss fails the query, rerun recomputes

    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    )

    converged = False
    for _ in range(max_iter):
        # One aggregate produces BOTH the new label and the previous one
        # (each node has exactly one self row, so the conditional max IS the
        # old label): convergence is then a scan of the checkpointed result,
        # not an extra join against the previous frame.
        self_rows = labels.select(
            "node", "lbl", F.lit(True).alias("is_self")
        )
        neighbour = sym.join(
            labels, sym["dst"] == labels["node"], "inner"
        ).select(
            sym["src"].alias("node"),
            F.col("lbl"),
            F.lit(False).alias("is_self"),
        )
        # LAZY checkpoint + FULL convergence count (round 13): the eager
        # form ran TWO jobs per round (materialize, then a limit-1 count).
        # The full count computes every partition, which is exactly the
        # materialization the checkpoint needs — one job per round, same
        # total work (eager materialization also computed every
        # partition), half the driver round-trips on this driver-latency-
        # bound loop.
        new_labels = (
            self_rows.union(neighbour)
            .groupBy("node")
            .agg(
                F.min("lbl").alias("lbl"),
                F.max(F.when(F.col("is_self"), F.col("lbl"))).alias("old_lbl"),
            )
            .localCheckpoint(eager=False)  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
        )
        changed = new_labels.where(F.col("lbl") != F.col("old_lbl")).count()
        labels = new_labels.select("node", "lbl")
        if changed == 0:
            converged = True
            break

    if not converged:
        # a silently split component would poison every downstream keep-one
        # decision — fail loudly instead
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "rounds (graph diameter exceeds the bound); raise max_iter"
        )

    return labels.select(F.col("node"), F.col("lbl").alias("component"))


def canonical_edges(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Undirected edge set canonicalized to (u < v), self-loops dropped,
    deduplicated. One shuffle (the distinct)."""
    return (
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_count(
    edges: DataFrame, a: str = "a", b: str = "b",
    broadcast_closure: bool = False,
    broadcast_degrees: bool = False,
    canonical: bool = False,
) -> DataFrame:
    """Global triangle count via DEGREE-ORDERED edge orientation (the
    compact-forward algorithm): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, build wedges by joining
    out-edges on their source, close wedges against the oriented edge set.

    Why not the naive 3-way self-join on canonical (u < v) edges (the
    oracle's formulation): its wedge step fans out by the square of the
    MAX degree — one celebrity node with 1M neighbours yields 10^12 wedge
    rows. Degree ordering bounds every node's OUT-degree by O(sqrt(m))
    regardless of skew (a node of degree d only points to >=d-degree
    neighbours, and there are at most 2m/d of those), so the wedge fanout
    is O(m^1.5) worst case and the hot key disappears. Three shuffles
    total: degree agg, wedge join, closure join — each a plain hash
    exchange that AQE can further split.

    Round-7 audit knobs (the edge build paid avoidable shuffles):
    ``broadcast_degrees=True`` ships the node-sized degree table to both
    orientation joins instead of shuffling the edge set twice — correct
    whenever the NODE set is bounded (the degree table has one row per
    node; at unbounded node counts keep the default shuffled joins).
    With broadcast orientation the forward frame is two cheap map-side
    joins over the checkpointed edges, so its own checkpoint is dropped.
    ``canonical=True`` promises the input is already (a < b)-oriented,
    self-loop-free and distinct (e.g. a groupBy(a, b) output with an
    a < b predicate), skipping canonical_edges' full-edge-set shuffle.

    Returns a 1-row frame: (n_edges, n_triangles).
    """
    e = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        if canonical
        else canonical_edges(edges, a, b)
    ).localCheckpoint()  # lc-ok: pure compute; executor loss fails the query, rerun recomputes (reused 4x below)
    deg = (
        e.select(F.col("u").alias("n")).unionAll(e.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("deg"))
    )
    # orientation key: (degree, id) totally orders nodes deterministically
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    if broadcast_degrees:
        du, dv = F.broadcast(du), F.broadcast(dv)
    ranked = e.join(du, "u").join(dv, "v")
    # checkpoint: BOTH wedge branches (w1, w2) read fwd — without the cut
    # the whole degree-join subtree executes twice (seen in the plan)
    fwd = ranked.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("t")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("t")))
        .alias("e")
    ).select("e.s", "e.t")
    if not broadcast_degrees:
        fwd = fwd.localCheckpoint()  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    w1 = fwd.select(F.col("s"), F.col("t").alias("x"))
    w2 = fwd.select(F.col("s"), F.col("t").alias("y"))
    if broadcast_closure:
        # round 14: w2 is the SAME m-row oriented edge set the closure
        # branch already broadcasts, so under the broadcast_closure
        # contract (edge set fits a broadcast) the wedge join can be
        # map-side too — the wedge enumeration then runs with no exchange
        # of fwd at all. Measured on the bounded-cohort suite row:
        # med 2.32 -> 2.00 s, rows identical.
        w2 = F.broadcast(w2)
    wedges = w1.join(w2, "s").where(F.col("x") < F.col("y"))
    # a wedge (x, y) closes iff the oriented edge x->y or y->x exists; the
    # canonical frame already stores it exactly once as unordered (min, max)
    closure = e.select(F.col("u").alias("x"), F.col("v").alias("y"))
    if broadcast_closure:
        # wedges are O(m^1.5) rows vs m closure edges — when the EDGE set
        # fits in a broadcast, shipping it beats shuffling the wedge set by
        # the same m^0.5 factor. Caller's call: at true scale edges may not
        # fit, and the default shuffled semi join stays correct.
        closure = F.broadcast(closure)
    tri = wedges.join(closure, ["x", "y"], "left_semi")
    return tri.agg(F.count("*").alias("n_triangles")).join(
        F.broadcast(e.agg(F.count("*").alias("n_edges")))
    ).select("n_edges", "n_triangles")


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    a: str = "a",
    b: str = "b",
    broadcast_ranks: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank over an UNDIRECTED edge set (each edge
    contributes both directions, so no dangling nodes exist by
    construction). Per iteration: one join of the rank frame onto the
    out-edge list and one destination-keyed sum — the textbook
    power-iteration as two hash exchanges, with the rank frame
    localCheckpointed so lineage stays flat across iterations.

    Determinism follows the suite convention for iterative float
    algorithms: ranks round to 9 decimals after every iteration (the
    same chain points the unrolled SQL oracle rounds), so the
    destination-sum's float ordering noise (~1e-13) never crosses a
    rounding boundary in practice. Returns (node, rank) with the
    UNNORMALIZED 0.15 + d*sum form (ranks sum to ~N).

    ``broadcast_ranks=True`` ships the rank frame (one row per node) to
    the per-iteration join instead of shuffling the out-edge frame —
    each iteration then runs ONE exchange (the destination sum) instead
    of two. Same bounded-node-set contract as triangle_count's
    ``broadcast_degrees``: only enable when the node count is bounded
    (a cohort); at open-world node counts keep the default shuffled
    join."""
    both = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionAll(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    ).localCheckpoint()  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    deg = both.groupBy("src").agg(F.count("*").alias("deg"))
    out = both.join(deg, "src").localCheckpoint()  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(1.0).alias("rank")
    ).localCheckpoint()  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    base = 1.0 - damping
    for _ in range(max(1, iters)):
        r = ranks.select(F.col("node").alias("src"), F.col("rank"))
        if broadcast_ranks:
            r = F.broadcast(r)
        contrib = (
            out.join(r, "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * F.sum(F.col("rank") / F.col("deg")),
                    9,
                ).alias("rank")
            )
        )
        # lazy (round 13): each ranks frame has exactly ONE consumer (the
        # next iteration's join), so the eager materialization job per
        # iteration bought nothing — lineage is still cut, and the final
        # action executes all iterations in one job with shuffle reuse
        ranks = contrib.localCheckpoint(eager=False)  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    return ranks


def label_propagation(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    iters: int = 2,
) -> DataFrame:
    """Synchronous majority-label propagation (Raghavan et al. 2007)
    community detection with DETERMINISTIC tie-breaks: every node starts
    labelled with its own id; each round every node simultaneously adopts
    the most frequent label among its neighbours, ties broken by the
    smallest label. The classic async/random-order LPA is
    nondeterministic; the synchronous + pinned-tie form is reproducible
    on any engine, so a fixed iteration count is fully oracle-able
    (the unrolled-CTE pattern shared with pagerank/kmeans).

    Distinct from connected_components: CC converges to one label per
    connected component (min-id); majority-LPA finds DENSER-than-
    surroundings substructure inside a component.

    Per round: ONE edge-label join + a (dst, label) count + a dst-keyed
    argmax — two shuffles, both keyed, no global structure; lineage cut
    per round. Labels must be numeric (the argmax packs (count, -label)
    into a struct max so majority-then-min-label is a single aggregate).
    Returns (node, label).
    """
    # Round 14: redistribute on src (the per-round join key) at full
    # shuffle width before the lineage cut — same rationale as
    # connected_components (see the note there: the win is a balanced
    # materialize-once input to each round's exchange, NOT exchange
    # reuse; LogicalRDD partitioning is unknown under AQE). Measured
    # −18% median on graph_label_propagation.
    dirs = (
        edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .repartition("src")
        .localCheckpoint(eager=False)  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    )
    labels = (
        dirs.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(iters):
        nb = (
            dirs.join(labels.withColumnRenamed("node", "src"), "src")
            .groupBy("dst", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            nb.groupBy("dst")
            .agg(
                F.max(
                    F.struct(F.col("c"), (-F.col("label")).alias("nl"))
                ).alias("m")
            )
            .select(
                F.col("dst").alias("node"), (-F.col("m.nl")).alias("label")
            )
            .localCheckpoint(eager=False)  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
        )
    return labels


def jaccard_similarity(
    edges: DataFrame,
    a: str = "a",
    b: str = "b",
    broadcast_degrees: bool = False,
    broadcast_adjacency: bool = False,
    canonical: bool = False,
    max_center_degree: int | None = None,
    unbounded: bool = False,
) -> DataFrame:
    """Common-neighbor Jaccard node similarity — the classic link-
    prediction / entity-resolution score: for every node pair sharing at
    least one neighbor, ``|N(u) & N(v)| / |N(u) | N(v)|``. Pairs need NOT
    be edges themselves (that is the point of link prediction).

    Plan: wedge enumeration — both-direction adjacency joined on the
    CENTER node, spokes paired once (x < y), counted per pair; union size
    by inclusion-exclusion from the degree table (deg_x + deg_y - common),
    so neighbor SETS are never materialized per pair. Unlike triangle
    counting, wedge-per-pair counting cannot be degree-ordered away (both
    spokes of every center are needed), so the center fanout is
    deg(center)^2 — the standard hub control at open-world scale is
    ``max_center_degree``: centers above the cap are excluded, which
    LOWERS common counts for hub-mediated pairs only (documented
    approximation, exact when the graph's max degree is under the cap).

    A hub policy is REQUIRED (round 9, same spirit as the bounded-frame
    window guard): pass ``max_center_degree=<cap>`` or acknowledge the
    quadratic default with ``unbounded=True`` — an open-world caller must
    not be able to OOM on one hub by omission. ``unbounded=True`` is the
    right call exactly when the caller has already bounded the graph
    (a cohort, a pre-capped edge list).
    ``broadcast_degrees`` ships the node-sized degree table to the two
    enrichment joins (right whenever the node set is bounded).
    ``broadcast_adjacency`` additionally checkpoints the adjacency and
    broadcasts it as the wedge join's build side — the wedge enumeration
    then runs map-side with partial aggregation before the single (u, v)
    exchange (measured ~2x on the bounded-cohort suite row); only correct
    to enable when the EDGE set is broadcast-sized.

    Returns (u, v, common_neighbors, jaccard) with u < v, exact rational
    jaccard evaluated in double.
    """
    if max_center_degree is None and not unbounded:
        raise ValueError(
            "jaccard_similarity enumerates deg(center)^2 wedges per center"
            " — one hub node can explode the plan. Pass"
            " max_center_degree=<cap> (documented approximation) or"
            " unbounded=True if the graph is already bounded."
        )
    e = (
        edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
        if canonical
        else canonical_edges(edges, a, b)
    )
    adj = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).select(
        F.col("u").alias("c"), F.col("v").alias("s")
    )
    if broadcast_adjacency:
        # materialize once; both wedge sides and the degree agg reuse it
        adj = adj.localCheckpoint()  # lc-ok: pure compute; executor loss fails the query, rerun recomputes
    deg = adj.groupBy("c").agg(F.count(F.lit(1)).alias("d")).select(
        F.col("c").alias("n"), "d"
    )
    centers = adj
    if max_center_degree is not None:
        keep = deg.where(F.col("d") <= max_center_degree).select(
            F.col("n").alias("c")
        )
        centers = adj.join(keep, "c", "left_semi")
    l = centers.alias("l")
    r = (F.broadcast(centers) if broadcast_adjacency else centers).alias("r")
    wedges = (
        l.join(r, "c")
        .where(F.col("l.s") < F.col("r.s"))
        .groupBy(F.col("l.s").alias("u"), F.col("r.s").alias("v"))
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
    )
    dl = F.broadcast(deg) if broadcast_degrees else deg
    out = (
        wedges.join(dl.select(F.col("n").alias("u"), F.col("d").alias("du")), "u")
        .join(dl.select(F.col("n").alias("v"), F.col("d").alias("dv")), "v")
        .withColumn(
            "jaccard",
            F.col("common_neighbors").cast("double")
            / (F.col("du") + F.col("dv") - F.col("common_neighbors")).cast(
                "double"
            ),
        )
    )
    return out.select("u", "v", "common_neighbors", "jaccard")
