"""Graph centrality over relationally-derived edge sets.

Web-scale training pipelines rank crawl frontiers and weight documents by
link centrality (the CommonCrawl-style harmonic/PageRank prioritization);
this module is that primitive expressed Spark-first: the graph is two
columns (src, dst), every iteration is one equi-join + one partial-
aggregated reduce, and the only driver-side state is a single dangling-mass
scalar per iteration (1-row aggregate — bounded by construction).

Scale design:
- Edges are repartitioned by src ONCE and localCheckpoint'd; each
  iteration's rank join shuffles only the (node, rank) table — at 100 TB
  the edge table dominates and never re-shuffles (Exchange reuse).
- Contributions aggregate map-side before the dst-key shuffle.
- localCheckpoint per iteration truncates the lineage (the BPE learner's
  pattern) so the plan doesn't grow with iteration count.
- Convergence (``tol``) costs one extra 1-row aggregate per iteration
  (the L1 delta between consecutive rank vectors) — a scalar collect,
  bounded like the dangling mass; the iteration loop is driver-side
  control flow either way, so early stop saves whole join+agg rounds.
- Double arithmetic: rank mass is a sum of shuffled partials, so results
  are reproducible to ~1e-12 but not bit-stable across partitionings —
  the catalog entry is rows-only and correctness is pinned by an exact
  numpy power-iteration reference in tests (same formula, allclose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tracked_checkpoint(df: DataFrame) -> tuple[DataFrame, list]:
    """``localCheckpoint(eager=True)`` plus the ids of the RDD blocks it
    pinned. Checkpoint storage is NEVER freed by ``DataFrame.unpersist``
    or by GC (measured, r14 review), so an iterative loop that checkpoints
    per round must release the superseded round's blocks itself through
    the JVM handle (``_free_checkpoints``) — otherwise every round's copy
    of the iteration state stays pinned for the whole session. The
    before/after id diff assumes no concurrent checkpointing from other
    driver threads — true for these single-threaded loops."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    cp = df.localCheckpoint(eager=True)
    after = sc._jsc.getPersistentRDDs().keySet().toArray()
    return cp, [i for i in after if i not in before]


def _free_checkpoints(spark, rdd_ids: list) -> None:
    """Release a SUPERSEDED tracked checkpoint's blocks. A checkpoint has
    no lineage left to recompute from, so this must only run on frames
    nothing will ever read again (the loop's previous iteration state)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in rdd_ids:
        jrdd = jmap.get(i)
        if jrdd is not None:
            jrdd.unpersist(False)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    tol: float | None = None,
) -> DataFrame:
    """Power-iteration PageRank with uniform teleport and proper dangling
    handling (nodes without out-edges redistribute their mass uniformly —
    skipping this silently leaks rank out of the system each step).
    Returns (node, rank) for every node; ranks sum to 1.

    ``weight`` names an optional positive edge-weight column: each node
    spreads its rank proportionally to weight / sum-of-its-out-weights
    (the unweighted case is all-ones weights). ``tol`` enables early
    stopping: iteration ends once the L1 delta between consecutive rank
    vectors drops below it (one extra 1-row aggregate per iteration);
    ``n_iter`` stays the hard cap either way."""
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        (F.col(weight).cast("double") if weight else F.lit(1.0)).alias("w"),
    )
    # Zero/NULL-weight guard: an edge with w <= 0 (or NULL) spreads nothing,
    # and a node with NO positive out-weight has nowhere to spread — it is
    # treated as DANGLING (excluded from out_nodes below, so its mass
    # redistributes uniformly) instead of evaluating rank·0/0, which under
    # this repo's ANSI sessions raises DIVIDE_BY_ZERO and kills the job
    # (r11 review; the similarity cosine fixed the same class with
    # try_divide in r10 — here the dangling term is the SEMANTICALLY right
    # destination for that mass, not NULL). deg MUST be summed over the
    # same filtered edge set the spread uses: summing raw weights let a
    # mixed-sign node (w = [2, -1] → deg 1) spread 2/1 > 1 of its rank,
    # inflating total mass every iteration (r12 / ADVICE). NaN weights are
    # excluded EXPLICITLY: Spark orders NaN above every numeric, so a NaN
    # weight passes `w > 0` and one such edge would poison deg — and from
    # there every reachable rank — to NaN with no error (r14 review).
    pos = e.where((F.col("w") > 0) & ~F.isnan("w"))
    deg = pos.groupBy("src").agg(F.sum("w").alias("deg"))
    ed = (
        pos.join(deg, "src")
        .repartition("src")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        # Empty edge set → empty ranking, not a driver ZeroDivisionError
        # (a filtered-to-empty graph partition is a normal pipeline input).
        return nodes.select("node", F.lit(1.0).alias("rank"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    # Checkpointed like `ed`: the dangling-mass anti-join consumes this
    # every iteration, and without the checkpoint each iteration replayed
    # the full edge scan + deg aggregation from the raw input — n_iter
    # extra edge-table passes, against this module's own "the edge table
    # never re-shuffles" design (r9 review).
    # deg is summed over w>0 edges only, so every row is strictly positive:
    # deg's key set IS the non-dangling node set, no filter needed.
    out_nodes = (
        deg.select(F.col("src").alias("node"))
        .localCheckpoint(eager=True)
    )
    # Storage discipline for the iteration state (r14 review): checkpoint
    # blocks are NEVER freed by DataFrame.unpersist or GC (measured), so
    # the old bare per-iteration checkpoint pinned n_iter rank-vector
    # copies in executor storage for the whole session. The per-iteration
    # checkpoint itself stays — each round's plan references the previous
    # state, so truncation per round is what keeps analysis time linear —
    # but the SUPERSEDED round's blocks are now explicitly released
    # through the tracked JVM handle once the new state is materialized
    # and the old one can never be read again. Peak storage: 2 rank
    # vectors + the 3 setup checkpoints, independent of n_iter; the final
    # vector stays pinned for the caller.
    prev_ids: list = []
    for _ in range(n_iter):
        # Dangling mass: total rank parked on nodes with no out-edges.
        # 1-row aggregate -> scalar; bounded regardless of graph size.
        dang = (
            ranks.join(out_nodes, "node", "left_anti")
            .agg(F.sum("rank").alias("m"))
            .collect()[0]["m"]
            or 0.0
        )
        contribs = (
            ed.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") * F.col("w") / F.col("deg")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_rank"))
        )
        base = (1.0 - damping) / n + damping * dang / n
        new_ranks, new_ids = _tracked_checkpoint(
            nodes.join(contribs, "node", "left").select(
                "node",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if tol is not None:
            # Consumes the PREVIOUS vector's blocks — freed only after.
            delta = (
                new_ranks.join(
                    ranks.withColumnRenamed("rank", "prev"), "node"
                )
                .agg(F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("d"))
                .collect()[0]["d"]
            )
        else:
            delta = None
        _free_checkpoints(edges.sparkSession, prev_ids)
        prev_ids = new_ids
        ranks = new_ranks
        if tol is not None and delta is not None and delta < tol:
            break
    return ranks


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
    strict: bool = True,
) -> DataFrame:
    """Connected components via alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the O(log n)-round generic path next to the min-label
    propagation in operators/dedup.py::dedup_clusters, whose round count
    is O(diameter): fine for near-dup cliques, hopeless for chain-shaped
    graphs (a 1M-hop path would take 1M rounds; star contraction takes
    ~20). Returns (node, component) for every node, component = minimum
    member id.

    Each round is two phases over the canonical (hi, lo) edge set:
    large-star hangs every bigger-than-center neighbor under the
    neighborhood minimum; small-star re-hangs the smaller neighbors. Both
    are one groupBy-min + one equi-join — partial-aggregated shuffles on
    the node key, no driver-side graph state. Convergence is detected by
    edge-set fixpoint (two scalar counts per round); ``localCheckpoint``
    truncates lineage so round N never replays rounds 1..N-1. ``stats``
    (optional dict) is purely observational: it receives {"rounds": n,
    "converged": bool}. Error policy is the separate ``strict`` flag:
    exhausting ``max_iter`` without reaching the fixpoint RAISES when
    strict=True (the default) — a truncated forest can emit duplicate node
    rows with conflicting labels, which must never pass silently — and
    returns the partially-contracted labeling when strict=False (callers
    who opt out should inspect stats["converged"])."""
    a, b = F.col("a"), F.col("b")
    e, e_ids = _tracked_checkpoint(
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .where(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b")
        )
        .distinct()
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    rounds = 0
    converged = False
    # Same storage discipline as pagerank (r14 review): the per-round
    # checkpoint stays — each round references the edge set SEVERAL times
    # (bi doubles it, large/small reuse bi/e1), so without per-round plan
    # truncation the logical tree grows multiplicatively per round — but
    # the superseded round's blocks are explicitly released once the
    # fixpoint counts have consumed them. Peak storage: 2 edge-set copies
    # + the nodes checkpoint, independent of round count; the converged
    # set stays pinned for the final labeling.
    for _ in range(max_iter):
        rounds += 1
        # Large-star: full neighborhood (both directions); each node u's
        # strictly-larger neighbors re-hang under m = min(N(u) ∪ {u}).
        bi = e.unionByName(e.select(b.alias("a"), a.alias("b")))
        mins = bi.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        large = (
            bi.join(mins, "a")
            .where(b > a)
            .select(b.alias("x"), F.col("m").alias("y"))
        )
        e1 = (
            large.where(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b"))
            .distinct()
        )
        # Small-star: smaller-neighbor orientation only; u and its smaller
        # neighbors all hang under m = min(N⁻(u) ∪ {u}) (= min(N⁻) since
        # every member of N⁻ is < u).
        smins = e1.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            e1.join(smins, "a")
            .select(b.alias("x"), F.col("m").alias("y"))
            .unionByName(smins.select(a.alias("x"), F.col("m").alias("y")))
        )
        e2, e2_ids = _tracked_checkpoint(
            small.where(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("a"), F.least("x", "y").alias("b"))
            .distinct()
        )
        # Fixpoint probe: the edge set is monotonically contracting, so
        # equal counts + empty difference == converged (two scalar counts;
        # they consume the superseded e, which is freed right after).
        done = e2.count() == e.count() and e2.exceptAll(e).count() == 0
        _free_checkpoints(edges.sparkSession, e_ids)
        e, e_ids = e2, e2_ids
        if done:
            converged = True
            break
    if stats is not None:
        stats["rounds"] = rounds
        stats["converged"] = converged
    if strict and not converged:
        raise RuntimeError(
            f"connected_components did not reach the edge-set fixpoint in "
            f"{max_iter} rounds; the labeling may be a truncated forest "
            f"(raise max_iter, or pass strict=False to accept converged=False)"
        )
    # At fixpoint every edge is (member, root); roots/isolated nodes label
    # themselves.
    return (
        nodes.join(e.select(a.alias("node"), b.alias("root")), "node", "left")
        .select("node", F.coalesce("root", "node").alias("component"))
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """SYNCHRONOUS label propagation (community detection; Raghavan et al.
    2007, made deterministic): every node starts labeled with its own id;
    each round, every node adopts the most frequent label among its
    NEIGHBORS' previous-round labels, breaking frequency ties by the
    SMALLEST label. The classic algorithm's random tie-break and random
    update order make it non-reproducible — this variant is a pure
    function of (edge set, iters), so the same communities come out of
    every run, every partitioning, and a SQL re-implementation (the
    catalog entry hash-compares it against DuckDB). A FIXED round count
    (not convergence) is the contract: synchronous LPA can oscillate
    between two labelings on bipartite structures, so "run to fixpoint"
    is not well-defined for it; k rounds means every label has propagated
    k hops, which is the useful notion of community at bounded cost.

    Returns (node, label) for every node with at least one edge.

    Scale shape: per round, ONE equi-join of the (node, label) table
    against the bidirected edge list + two partial-aggregated groupBys
    ((node, label) counts, then the per-node argmax via min(struct)) —
    all shuffles on the node key, state is one row per node, never a
    per-node neighbor list in memory. The edge list is reused by every
    round, so it is localCheckpoint'd lazily once (the PageRank/BPE
    lineage-truncation pattern)."""
    bi = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col("s") != F.col("d"))
    )
    bi = (
        bi.union(bi.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    # Node set from the RAW edges (the connected_components discipline),
    # not from bi: a node whose only edges are self-loops has an edge —
    # the documented return contract — but the s != d filter removes it
    # from bi, and deriving the label table from bi silently dropped its
    # row (r14 review).
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("node", F.col("node").alias("label"))
    for i in range(iters):
        counts = (
            bi.join(labels, bi.d == labels.node)
            .groupBy(bi.s.alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        # argmax by (count DESC, label ASC) as one order-insensitive
        # aggregate: min over struct(-c, label). Nodes with no non-self
        # neighbor (self-loop-only) have no counts row and KEEP their own
        # label via the left join below.
        adopted = counts.groupBy("node").agg(
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("label").alias("l")))[
                "l"
            ].alias("adopted")
        )
        labels = nodes.join(adopted, "node", "left").select(
            "node", F.coalesce("adopted", "node").alias("label")
        )
        # LAZY per-round lineage truncation (pagerank/BPE discipline, r11
        # review): without it the labels plan nests one join + two aggs
        # DEEPER per round — invisible at iters=3, a superlinear
        # analysis-time blowup at iters=30. eager=False keeps the whole
        # thing a zero-driver-action lazy plan; the final round's output
        # is the returned frame, so it stays un-truncated for the caller.
        if i < iters - 1:
            labels = labels.localCheckpoint(eager=False)
    return labels


def triangle_stats(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count + global clustering coefficient, via
    DEGREE-ORIENTED wedge counting (the MapReduce-standard trick): every
    undirected edge is directed from its (degree, id)-smaller endpoint to
    the larger, which makes the orientation acyclic — each triangle then
    has exactly ONE node whose two directed edges span it, so joining
    wedges (u→v, u→w) against the edge set counts each triangle once,
    and per-node wedge fan-out is bounded by the graph's arboricity
    instead of its max degree (the hub node's star never becomes a
    quadratic wedge set — at web scale this is the difference between
    hours and forever). Returns ONE row: n_nodes, n_edges, n_wedges
    (= Σ C(deg,2), orientation-independent), n_triangles, and the global
    clustering coefficient 3·triangles/wedges (one double division of
    exact bigints)."""
    e = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .where(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    bi = e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    # Checkpointed like `e`: deg feeds THREE independent actions (n_nodes,
    # the wedge-total aggregate, and the orientation joins under the final
    # triangle count) — without it each re-ran the doubled-edge groupBy
    # over the full edge set (r14 review).
    deg = (
        bi.groupBy("a")
        .agg(F.count("*").alias("deg"))
        .withColumnRenamed("a", "node")
        .localCheckpoint(eager=True)
    )
    n_nodes = deg.count()
    n_edges = e.count()
    # Integer DIV keeps the wedge total exact at any scale (deg·(deg−1) is
    # always even); a double division summed in floating point would lose
    # exactness once the total nears 2^53 on hub-heavy graphs.
    wedge_total = deg.agg(
        F.sum(F.expr("CAST(deg * (deg - 1) DIV 2 AS BIGINT)")).alias("w")
    ).collect()[0]["w"] or 0
    # Orient each edge by (deg, id): small -> large.
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    keyed = e.join(da, "a").join(db, "b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    directed = keyed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("v"),
    )
    d1 = directed
    d2 = directed.select(F.col("u"), F.col("v").alias("w"))
    wedges = d1.join(d2, "u").where(F.col("v") < F.col("w"))
    closed = wedges.join(
        e.select(F.col("a").alias("__wa"), F.col("b").alias("__wb")),
        (F.least("v", "w") == F.col("__wa")) & (F.greatest("v", "w") == F.col("__wb")),
        "left_semi",
    )
    n_tri = closed.count()
    spark = edges.sparkSession
    cc = (3.0 * n_tri / wedge_total) if wedge_total else 0.0
    return spark.createDataFrame(
        [(n_nodes, n_edges, int(wedge_total), n_tri, float(cc))],
        "n_nodes long, n_edges long, n_wedges long, n_triangles long, clustering double",
    )


def top_ranked(ranks: DataFrame, k: int = 20) -> DataFrame:
    """Deterministically-tied top-k by rank (TakeOrderedAndProject — no
    global sort)."""
    return ranks.orderBy(F.col("rank").desc(), F.col("node")).limit(k).select(
        "node", "rank", F.row_number().over(
            Window.orderBy(F.col("rank").desc(), F.col("node"))
        ).cast("long").alias("pos"),
    )
