"""Graph operators: connected components over candidate-pair edges.

Beyond-reference capability: dedup pipelines emit *pairs* (MinHash/LSH
candidates); materializing duplicate *clusters* (pick one survivor per
cluster) is a connected-components problem. The reference engine has no
iterative operator at all — this is the one place the engine loops on
the driver, with each iteration a pure DataFrame job.

Scale design: iterative min-label propagation (Pregel-lite). Each
iteration = one shuffle-join of labels against edges + a min-aggregate;
lineage is truncated every iteration via ``localCheckpoint`` so plan
depth stays O(1) rather than O(iterations) (classic iterative-Spark
trap: an uncheckpointed loop re-executes the whole history each pass
and the plan eventually overwhelms the optimizer). Iteration count is
bounded by the label-propagation diameter of the largest component —
for dedup clusters (near-cliques from LSH banding) that is 2-4. For
adversarial long-chain graphs the operator AUTO-SELECTS the
large-star/small-star variant (Kiveris et al., "Connected Components
in MapReduce and Beyond", O(log n) rounds on any shape) once simple
propagation hasn't converged by round ``star_fallback_after``; the
simple variant stays the first choice because dedup graphs are shallow
and its per-round cost is half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mirror(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Both orientations of every edge in ONE pass over the input.

    A union of two opposite selects references the edge lineage twice,
    and Catalyst does NOT reuse the exchange across the two
    differently-canonicalized branches — so when the input is an
    unmaterialized candidate-pair pipeline (the normal case: LSH
    banding feeding components/pagerank), the materializing checkpoint
    job executed the whole banding pipeline TWICE (verified on
    ``dedup_best_by_centrality``: 2 parquet scans / 6 exchanges / 0
    ReusedExchange in the executed bi plan).  Exploding a 2-element
    array of (a,b)/(b,a) structs emits the same multiset of rows from
    a single evaluation.
    """
    return edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("a"), F.col(dst).alias("b")),
                F.struct(F.col(dst).alias("a"), F.col(src).alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")


def _propagate_round(both: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label propagation round, materialized.

    The convergence signal (``__changed``) is folded into the SAME
    label-update projection, so the caller's convergence probe never
    needs the old labels again — reading it is a scan of the
    checkpointed output, not another join job.
    """
    # neighbor minimum: for each node, the smallest label adjacent to
    # it this round (map-side partial min before the shuffle)
    nbr = (
        both.join(labels, both["a"] == labels["node"])
        .select(F.col("b").alias("node"), "label")
        .groupBy("node")
        .agg(F.min("label").alias("nbr_label"))
    )
    return (
        labels.join(nbr, "node", "left")
        .select(
            "node",
            F.least("label", F.coalesce("nbr_label", "label")).alias(
                "label"
            ),
            (F.coalesce("nbr_label", "label") < F.col("label")).alias(
                "__changed"
            ),
        )
        .localCheckpoint()  # truncate lineage: O(1) plan depth
    )


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    assume_distinct: bool = False,
    star_fallback_after: int | None = 6,
    prebidirected: DataFrame | None = None,
) -> DataFrame:
    """(node, component) for every node in ``edges``; ``component`` is
    the minimum node id reachable from it (a canonical, deterministic
    cluster id any engine reproduces).

    Undirected semantics: each edge propagates labels both ways.

    ``assume_distinct``: candidate-pair producers (LSH banding) emit
    each undirected edge once with ``src < dst`` — the mirrored union
    then has no duplicates and the edge-dedup shuffle is pure cost.
    Duplicate edges never change the min-label result, only row volume,
    so this is a safe fast path, not a semantics switch.

    ``star_fallback_after``: min-label propagation needs O(diameter)
    rounds — right for dedup near-cliques (2-4), wrong for chain-shaped
    components whose diameter can be millions at 100 TB.  After this
    many unconverged rounds the operator AUTO-SELECTS the O(log n)
    large-star/small-star variant, seeding it with the original edges
    PLUS the (node → current-label) shortcut edges already earned —
    every label is a reachable node by induction, so the shortcut
    union has exactly the original components while collapsing the
    distance already propagated.  ``None`` disables the fallback and
    restores the raise-on-nonconvergence behavior.

    ``prebidirected``: the caller already holds the MATERIALIZED
    mirrored edge list (both directions, distinct) — e.g. it also
    feeds :func:`pagerank` over the same graph.  Passing it avoids a
    second materialization of the identical frame (r12:
    ``dedup_best_by_centrality`` checkpointed the same bidirected
    edges twice, once per consumer).
    """
    if prebidirected is not None:
        both = prebidirected.select(
            F.col(src).alias("a"), F.col(dst).alias("b")
        )
    else:
        # explode-mirror, not union-of-selects: one evaluation of the
        # (typically expensive, unmaterialized) edge pipeline inside
        # the checkpoint job instead of two (see _mirror)
        both = _mirror(edges, src, dst)
        if not assume_distinct:
            both = both.distinct()
        both = both.localCheckpoint()
    # Fused round 1: with identity labels the first propagation round's
    # join degenerates to the edge list itself, so seed each node with
    # min(self, min(neighbors)) in ONE aggregation — same result as the
    # round-1 join+agg+join at a third of the shuffles.
    labels = (
        both.groupBy(F.col("a").alias("node"))
        .agg(F.least(F.first("a"), F.min("b")).alias("label"))
        .localCheckpoint()
    )
    converged = False
    rounds = 1  # the fused seed above is round 1
    for _ in range(max_iter - 1):
        new_labels = _propagate_round(both, labels)
        # the probe is a filter-scan of the just-materialized
        # checkpoint blocks (short-circuits at the first changed
        # partition) — no join, no shuffle; the round-1 version paid a
        # full join-per-round job here
        converged = new_labels.filter(F.col("__changed")).isEmpty()
        labels = new_labels.drop("__changed")
        rounds += 1
        if converged:
            break
        if star_fallback_after is not None and rounds >= star_fallback_after:
            # diameter is outrunning the round budget: switch to the
            # O(log n) star algorithm, carrying the distance already
            # collapsed as (node → label) shortcut edges
            shortcuts = labels.filter(
                F.col("node") != F.col("label")
            ).select(F.col("node").alias("a"), F.col("label").alias("b"))
            # <= keeps self-loop edges so their nodes stay in the star
            # variant's node universe (it maps them to themselves)
            seeded = both.filter(F.col("a") <= F.col("b")).union(shortcuts)
            return connected_components_star(seeded, src="a", dst="b")
    if not converged:
        # the fused seed counts as round 1, so a loop that never ran
        # (max_iter=1) or exhausted may still hold final labels — probe
        # once before declaring failure
        probe = _propagate_round(both, labels)
        converged = probe.filter(F.col("__changed")).isEmpty()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(label-propagation diameter exceeds max_iter); raise "
            "max_iter, enable star_fallback_after, or call "
            "connected_components_star directly (O(log n) rounds)"
        )
    return labels.select("node", F.col("label").alias("component"))


def _star_min(pairs: DataFrame) -> DataFrame:
    """(u, m) where m = min(N(u) ∪ {u}) over the neighbor pairs."""
    return pairs.groupBy("u").agg(
        F.least(F.min("v"), F.first("u")).alias("m")
    )


def connected_components_star(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 40,
) -> DataFrame:
    """Alternating large-star/small-star connected components —
    O(log n) rounds on ANY graph shape (Kiveris et al., "Connected
    Components in MapReduce and Beyond", the public two-phase
    algorithm), vs the simple min-label variant's O(diameter). Use
    this when components can be long chains (linked page graphs,
    session stitching); for dedup near-cliques the simple variant's
    cheaper rounds win.

    Each round is two shuffle-join-free passes: a groupBy-min per
    node plus an emit-join, then edge dedup; lineage truncated per
    round (localCheckpoint) exactly like the simple variant. Returns
    (node, component) with component = min node id, identical to
    :func:`connected_components`.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    all_nodes = (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # -- large-star: for every neighbor v > u, link (v, m) --------
        # explode-mirror: ONE scan of the checkpointed edge blocks per
        # round instead of two (see _mirror; same multiset as the
        # union-of-selects this replaces)
        nbrs = _mirror(e, "a", "b").select(
            F.col("a").alias("u"), F.col("b").alias("v")
        )
        mins = _star_min(nbrs)
        large = (
            nbrs.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("a"), F.col("m").alias("b"))
            .distinct()
        )
        # -- small-star on the large-star output: ONE join emits both
        # orientations (v→m and u→m) via explode — the r02 version
        # joined directed⋈mins2 twice
        directed = large.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins2 = _star_min(directed)
        emit = (
            directed.join(mins2, "u")
            .select(
                F.explode(F.array("v", "u")).alias("a"),
                F.col("m").alias("b"),
            )
            .filter(F.col("a") != F.col("b"))
        )
        # the edge-dedup shuffle doubles as the fixpoint probe: tag new
        # vs old rows and group ONCE — __mx=0 marks a removed edge,
        # __mn=1 an added one; a stable star forest has neither. The
        # probe is then a filter-scan of the checkpointed blocks,
        # replacing the r02 version's two exceptAll join jobs per round.
        status = (
            emit.select("a", "b", F.lit(1).alias("__new"))
            .union(e.select("a", "b", F.lit(0).alias("__new")))
            .groupBy("a", "b")
            .agg(F.min("__new").alias("__mn"), F.max("__new").alias("__mx"))
            .localCheckpoint()
        )
        converged = (
            status.filter((F.col("__mn") == 1) | (F.col("__mx") == 0))
            .limit(1)
            .isEmpty()
        )
        e = status.filter(F.col("__mx") == 1).select("a", "b")
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds"
        )
    roots = e.select(F.col("a").alias("node"), F.col("b").alias("component"))
    return all_nodes.join(roots, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def pagerank(
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    prebidirected: DataFrame | None = None,
) -> DataFrame:
    """PageRank over an undirected pair graph — centrality-weighted
    curation: in a near-dup/similarity graph, high-rank documents sit
    at the center of dense duplication neighborhoods (syndication hubs,
    template sources), a signal both for survivor choice and for
    down-weighting scraped hubs.  Fully deterministic and
    oracle-replayable, like ``similarity.kmeans_lloyd``: no RNG, ranks
    rounded to 9 decimals at every update on both engines so
    distributed-summation ulps never compound across iterations.

    Per iteration: ONE shuffle-join of ranks against the bidirected
    edge list + one sum-aggregate (map-side combined), then the rank
    frame is rebuilt off the materialized degree frame — the previous
    rank frame is referenced exactly once per round, so the lineage
    grows LINEARLY and short loops run as one job with zero per-round
    materializations (long loops truncate via localCheckpoint every 4
    rounds to bound plan depth).  The node count is read ONCE from the materialized degree
    frame and embedded as a literal (metadata-sized driver read — one
    long — the documented acceptable class; r12: the r11 broadcast-
    1-row-frame formulation rebuilt the broadcast and paid an extra
    join inside every per-iteration checkpoint job, ~n_iter extra
    jobs per call for a value that never changes).

    ``prebidirected``: pass the already-materialized mirrored edge
    list to share it with a connected-components pass over the same
    graph (see :func:`connected_components`).

    Returns (node, pagerank) for every node incident to an edge,
    pagerank rounded to 6.  Dangling nodes cannot exist (the
    bidirected edge set gives every node out-degree >= 1), so rank
    mass is conserved up to rounding.
    """
    if prebidirected is not None:
        bi = prebidirected.select(
            F.col(src_col).alias("a"), F.col(dst_col).alias("b")
        )
    else:
        # the bidirected edge list is re-joined EVERY iteration, so
        # whatever lineage produced `edges` — typically the whole LSH
        # banding pipeline — would re-execute per iteration without
        # this materialization; 2|E| rows, far smaller than the corpus.
        # explode-mirror so the checkpoint job evaluates that pipeline
        # once, not twice (see _mirror)
        bi = _mirror(edges, src_col, dst_col).localCheckpoint()
    deg = (
        bi.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(F.col("a").alias("id"), "deg")
        .localCheckpoint()
    )
    n = deg.count()  # metadata-sized: ONE long off the materialized frame
    if n == 0:
        # empty edge frame → no nodes: return the (empty) result frame
        # instead of letting the 1/n init literal divide by zero while
        # the plan is still being BUILT (r13 review)
        return deg.select(
            F.col("id").alias("node"), F.lit(0.0).alias("pagerank")
        )
    pr = deg.select("id", "deg", F.round(F.lit(1.0) / n, 9).alias("pr"))
    for i in range(n_iter):
        contrib = (
            bi.join(pr, bi["a"] == pr["id"])
            .select(
                F.col("b").alias("id"),
                (F.col("pr") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        # rebuild the rank frame FROM THE CHECKPOINTED deg (row-set
        # identical to pr: both carry every distinct `a` of bi), not by
        # re-joining pr — so pr is referenced exactly once per round,
        # the lineage stays LINEAR in n_iter, and short loops need no
        # per-round materialization at all (r13; the r12 shape paid one
        # localCheckpoint job + a full rank-frame materialization per
        # iteration).  Long loops still truncate on a cadence so plan
        # depth/analysis cost stays bounded.
        pr = deg.join(contrib, "id", "left").select(
            "id",
            "deg",
            F.round(
                F.lit((1.0 - damping) / n)
                + damping * F.coalesce(F.col("s"), F.lit(0.0)),
                9,
            ).alias("pr"),
        )
        if (i + 1) % 4 == 0 and (i + 1) < n_iter:
            pr = pr.localCheckpoint()
    return pr.select(
        F.col("id").alias("node"), F.round("pr", 6).alias("pagerank")
    )
