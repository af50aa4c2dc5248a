"""Similarity search over embedding columns (array<float>).

Beyond-reference capability (BASELINE.json north star):

* ``cosine_topk`` — brute-force exact top-k: broadcast the query
  vector, per-row dot product with built-in higher-order functions
  (zip_with + aggregate — JVM-side, no Python), TakeOrderedAndProject
  for the k. At 100 TB this is a single scan with no shuffle: the
  broadcast side is one row and the top-k is partial per partition then
  merged on the driver (Spark's TakeOrdered).
* ``lsh_bucket_topk`` — the scale path: sign-LSH bucketing on a fixed
  set of coordinates partitions the corpus into 2^b buckets; candidate
  generation only scans the query's bucket (b=4 → 16× less data per
  probe; real deployments use learned IVF centroids, same plan shape).
  Bucket ids are deterministic expressions so the oracle reproduces them.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LSH_DIMS = (0, 1, 2, 3)  # coordinates whose signs form the bucket id


def _index_frame(spark, path: str) -> DataFrame:
    """Plan-memoized read of a persisted, immutable index directory.

    Every probe call re-derived the identical ``spark.read.parquet``
    plan — one directory-listing + partition-schema-inference Spark job
    per call (r13, visible as a dedicated 'parquet at
    NativeMethodAccessorImpl' job in the probe's job trace).  The memo
    caches the unexecuted plan only; index builders that rewrite the
    directory call ``catalog.invalidate(path)`` first (the enforced
    contract added with :func:`tajo_spark.catalog.load_parquet`)."""
    from tajo_spark import catalog

    return catalog.load_parquet(spark, path)


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _nonempty_or_raise(arr: str, msg: str) -> Column:
    """In-plan guard for the collected seed/centroid arrays: pass the
    array through when non-empty, raise inside the job otherwise.

    Replaces the r11 driver-side ``corpus.filter(id < n).isEmpty()``
    preconditions, each of which cost a whole extra Spark job on the
    corpus per call (the only real movers in BENCH_r11: sim_ann_join_ivf
    1.38x, dedup_semantic* — VERDICT r11 #3).  The emptiness signal is
    already present for free in the one-row collect_list aggregate every
    caller materializes; an empty seed set now fails the job with the
    same actionable message instead of a pre-job ValueError."""
    return F.when(F.size(F.col(arr)) > 0, F.col(arr)).otherwise(
        F.raise_error(F.lit(msg))
    )


def dot(a: Column, b: Column) -> Column:
    """Vector dot product as a zip_with+aggregate fold.

    Measured note (don't "optimize" this back): unrolling the fold into
    a static sum of 64 ``element_at`` terms — the textbook move from
    CodegenFallback HOFs to whole-stage-codegen arithmetic — is ~4x
    SLOWER here (0.49 s vs 0.12 s per 2k x 64 norm pass): the fold
    interpreter runs one tight loop over the array, while the unrolled
    tree pays per-node dispatch x dim. The profitable lever is avoiding
    per-pair array allocation instead (cast/normalize ONCE before a
    pair join, never inside it) — see semantic_dedup."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL when either vector has zero norm — matching SQL division
    semantics (DuckDB 0.0/0.0 → NULL); an unguarded 0/0 would produce
    NaN on Spark, which sorts ABOVE every real similarity in desc
    order and corrupts top-k results."""
    a, b = _as_double(a), _as_double(b)
    denom = F.sqrt(dot(a, a)) * F.sqrt(dot(b, b))
    return F.when(denom != 0, dot(a, b) / denom)


def sign_bucket(vec: Column, dims: tuple[int, ...] = LSH_DIMS) -> Column:
    """Sign-LSH bucket id: bit i set iff vec[dims[i]] >= 0."""
    out = None
    for i, d in enumerate(dims):
        bit = F.when(F.element_at(vec, d + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out.cast("int")


def cosine_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, round_to: int = 4
) -> DataFrame:
    """Exact top-k neighbors of ``query_vec_id`` by cosine similarity."""
    q = emb.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    scored = (
        emb.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), round_to).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), "vec_id").limit(k)


def lsh_bucket_topk(
    emb: DataFrame, query_vec_id: int, k: int = 10, round_to: int = 4
) -> DataFrame:
    """Approximate top-k: only candidates sharing the query's sign-LSH
    bucket are scored. Returns (vec_id, bucket, cos_sim)."""
    with_bucket = emb.select(
        "vec_id", "embedding", sign_bucket(F.col("embedding")).alias("bucket")
    )
    q = with_bucket.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    scored = (
        with_bucket.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            "bucket",
            F.round(cosine(F.col("embedding"), F.col("qv")), round_to).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), "vec_id").limit(k)


def pairwise_similar(
    emb: DataFrame, threshold: float = 0.95, round_to: int = 4
) -> DataFrame:
    """All near-duplicate embedding pairs above ``threshold``, restricted to
    same sign-LSH bucket (the embedding-cosine near-dup operator).
    Plan: bucket equi-join (hash shuffle on small bucket keys) instead of
    a full cross join — the quadratic term only applies within buckets."""
    # cast + norm ONCE per side before the join (the pair score is then
    # a single dot fold with the same sqrt(dot)*sqrt(dot) denominator
    # values cosine() would compute — FP-identical, 3 folds -> 1)
    with_bucket = emb.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("embedding"),
        sign_bucket(F.col("embedding")).alias("bucket"),
    ).withColumn("__n", F.sqrt(dot(F.col("embedding"), F.col("embedding"))))
    # materialize before the self-join: exchanges are not reused across
    # join branches, so without this the scan + cast/bucket/norm
    # pipeline runs TWICE (the same lesson semantic_dedup pins below;
    # r11 review)
    with_bucket = with_bucket.localCheckpoint()
    a = with_bucket.alias("a")
    b = with_bucket.alias("b")
    denom = F.col("a.__n") * F.col("b.__n")
    pair_cos = F.when(
        denom != 0,
        dot(F.col("a.embedding"), F.col("b.embedding")) / denom,
    )
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(pair_cos, round_to).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the learned-centroid scale path
# --------------------------------------------------------------------------


def l2_normalize(vec: Column) -> Column:
    """Unit-normalize (zero vectors guarded): after normalization,
    Euclidean nearest-centroid ordering agrees with cosine ordering —
    required for a cosine-consistent IVF index.

    Shape matters (r11 review): ``transform(v, x / norm)`` re-evaluates
    the norm's O(d) aggregate fold PER ELEMENT — O(d²) per row, and a
    two-step select doesn't help because CollapseProject re-inlines the
    alias into the lambda (verified on the optimized plan). zip_with
    against ``array_repeat(norm, d)`` evaluates the norm ONCE per row
    (array_repeat materializes its argument), then divides element-wise
    — same doubles bit-for-bit, O(d)."""
    v = _as_double(vec)
    norm = F.greatest(F.sqrt(dot(v, v)), F.lit(1e-12))
    return F.zip_with(v, F.array_repeat(norm, F.size(v)), lambda x, n: x / n)


def ivf_assign(emb: DataFrame, n_centroids: int = 16, seed: int = 42,
               max_iter: int = 5):
    """Train KMeans centroids (distributed fit, fixed seed) on
    L2-normalized vectors and assign each vector to its nearest
    centroid: the IVF index build. Normalizing first makes L2 cluster
    geometry match the cosine ranking used at probe time (spherical
    KMeans shape). Returns (assigned_df with ``centroid_id``, model).
    At 100 TB the fit runs on a sample and assignment is a map-only
    scan — the index is just a partitioning column, ideally persisted
    via ``write.partitionBy("centroid_id")`` so probes prune at the
    source."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # materialize the feature projection before the fit: KMeans is
    # iterative and re-evaluates its input per pass — unchecked, every
    # iteration re-reads parquet + renormalizes (measured 9 s → 0.9 s
    # for the whole fit at sf0.1). At 100 TB the fit runs on a sample
    # (docstring below) and this materializes the sample, which is the
    # standard cache-before-ML contract.
    feat = emb.select(
        "vec_id",
        "embedding",
        array_to_vector(l2_normalize(F.col("embedding"))).alias("features"),
    ).localCheckpoint()
    # (init stays k-means||: random init matched its training cost at
    # sf0.1 but broke the nprobe=2 recall contract at sf0.01 — the
    # init quality matters more as corpus/centroid ratios shrink)
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feat)
    assigned = (
        model.transform(feat)
        .withColumnRenamed("prediction", "centroid_id")
        .drop("features")
    )
    return assigned, model


def ivf_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
             n_centroids: int = 16, nprobe: int = 2,
             round_to: int = 4, index=None) -> DataFrame:
    """IVF probe: score only vectors in the ``nprobe`` centroids nearest
    the query (cosine-consistent: centroids live on the unit sphere, the
    query is normalized before the centroid distance test). Centroids
    are model metadata (n_centroids × dim floats) — choosing probe
    targets driver-side is O(centroids), not a data collect; candidates
    never leave the executors.

    Pass ``index=(assigned, model)`` from :func:`ivf_assign` to amortize
    the index build across probes (the production shape — per-call fit
    is only for one-shot exploration).
    """
    import numpy as np

    qrow = (
        emb.filter(F.col("vec_id") == query_vec_id).select("embedding").first()
    )
    if qrow is None:  # unknown query id → empty result, like cosine_topk
        # check BEFORE touching the index: with index=None the old
        # order trained a full KMeans fit just to return an empty
        # frame (r11 review); the empty branch only needs a schema
        return emb.select(
            "vec_id",
            F.lit(0).cast("int").alias("centroid_id"),
            F.lit(0.0).alias("cos_sim"),
        ).limit(0)
    assigned, model = index if index is not None else ivf_assign(
        emb, n_centroids=n_centroids
    )
    qv = np.asarray(qrow.embedding, dtype="float64")
    qn = qv / max(float(np.linalg.norm(qv)), 1e-12)
    centers = model.clusterCenters()
    order = np.argsort([float(np.linalg.norm(c - qn)) for c in centers])
    probe = [int(i) for i in order[:nprobe]]
    # broadcast side built from the already-collected query row — a
    # filter on emb here would re-scan the table once per probe
    q = emb.sparkSession.createDataFrame(
        [([float(x) for x in qrow.embedding],)], "qv ARRAY<DOUBLE>"
    )
    return (
        assigned.filter(
            F.col("centroid_id").isin(probe)
            & (F.col("vec_id") != query_vec_id)
        )
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "centroid_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), round_to).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


def ivf_persist_index(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    seed: int = 42,
):
    """Materialize the IVF index as a parquet table partitioned by
    ``centroid_id`` — the production index layout: a probe then reads
    ONLY its ``nprobe`` partition directories (source-level pruning,
    no scan of the other centroids' vectors). This is the scale
    difference between "filter after reading everything" and an index:
    at 100 TB with 4096 centroids and nprobe=8, a probe touches 0.2 %
    of the files. Returns the fitted model (centroids are the only
    state a prober needs besides the path).
    """
    from tajo_spark import catalog

    assigned, model = ivf_assign(emb, n_centroids=n_centroids, seed=seed)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    # the writer owns invalidation (a rebuild at a previously probed
    # path must drop the memoized pre-rebuild file listing) — call
    # sites no longer need to remember the contract
    catalog.invalidate(path)
    return model


def ivf_probe_persisted(
    spark,
    path: str,
    model,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Top-k over a persisted IVF index: choose the ``nprobe`` nearest
    centroids driver-side (model metadata, O(centroids)), then scan
    only those partitions — the ``centroid_id IN (...)`` filter prunes
    at the directory level before any file is opened."""
    import numpy as np

    qv = np.asarray(query_vec, dtype="float64")
    qn = qv / max(float(np.linalg.norm(qv)), 1e-12)
    centers = model.clusterCenters()
    order = np.argsort([float(np.linalg.norm(c - qn)) for c in centers])
    probe = [int(i) for i in order[:nprobe]]
    q = spark.createDataFrame(
        [([float(x) for x in query_vec],)], "qv ARRAY<DOUBLE>"
    )
    return (
        _index_frame(spark, path)
        .filter(F.col("centroid_id").isin(probe))
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "centroid_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), round_to).alias(
                "cos_sim"
            ),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


# --------------------------------------------------------------------------
# SemDeDup — semantic dedup on embedding clusters
# --------------------------------------------------------------------------


def seeded_cluster_assign(
    emb: DataFrame, n_seeds: int = 16, id_col: str = "vec_id"
) -> DataFrame:
    """Assign every vector to its max-cosine *seed vector* — the
    cluster step of SemDeDup-style semantic dedup, with deterministic
    seeds (the ``n_seeds`` lowest-id vectors) instead of trained KMeans
    centroids so an SQL oracle reproduces the exact partition.

    Scale design: the seeds collapse into ONE broadcast row (a
    ``collect_list`` aggregate — the metadata-sized broadcast-scalar
    pattern, never a driver collect), and the argmax over seeds is a
    per-row JVM fold (``aggregate`` over the sorted seed array): the
    whole assignment is a zero-shuffle map-only scan, same plan shape
    as IVF assignment. Production uses ~|corpus|/target_cluster_size
    seeds; cluster count bounds the downstream quadratic pair step.

    Ties (equal rounded cosine) go to the lowest seed_id, matching the
    oracle's ``ORDER BY round(cos,6) DESC, seed_id``.

    Precondition: ids dense from 0 — the seed rule is ``id < n_seeds``
    (deterministic AND reproducible by a plain SQL WHERE, which a
    lowest-n TakeOrdered would not be without window functions).  A
    corpus whose ids don't start at 0 raises here instead of silently
    assigning every row a NULL cluster (r11 review: the NULL cluster_id
    then made semantic_dedup keep EVERYTHING with no error).
    The guard is folded into the one-row seed aggregate the assignment
    already pays for — an empty collected seed list raises inside the
    plan — instead of a separate ``isEmpty`` pre-job scanning the
    corpus (r12: the pre-job was a whole extra Spark job per call and
    the r11 bench's only real mover).
    """
    seeds_row = (
        emb.filter(F.col(id_col) < n_seeds)
        .select(
            F.col(id_col).alias("seed_id"),
            _as_double(F.col("embedding")).alias("sv"),
        )
        .withColumn("sn", F.sqrt(dot(F.col("sv"), F.col("sv"))))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("seed_id", "sv", "sn"))
            ).alias("__seeds")
        )
        .select(
            _nonempty_or_raise(
                "__seeds",
                f"no vectors with {id_col} < n_seeds={n_seeds}: the "
                "deterministic seed rule requires ids dense from 0 - "
                "renumber upstream (row_number) or pass a smaller corpus",
            ).alias("__seeds")
        )
    )
    v = _as_double(F.col("embedding"))
    # one cosine per seed (transform), then array_max over
    # (rounded-cos, -seed_id) structs: struct ordering gives max cosine
    # with ties to the lowest seed_id — the fold alternative evaluates
    # each seed's cosine twice (condition + selection) per step, which
    # doubled the hot interpreted-HOF loop. Norms are computed ONCE per
    # row (__vn) and per seed (in the broadcast struct) instead of
    # per (row, seed) inside cosine() — same sqrt(dot)*sqrt(dot) values,
    # FP-identical scores, 3 array folds per seed down to 1 (measured
    # ~3x on the assignment scan). Zero-norm cosines (NULL) coalesce to
    # -2 so they lose to every real similarity.
    scores = F.transform(
        F.col("__seeds"),
        lambda s: F.struct(
            F.coalesce(
                F.round(
                    F.when(
                        F.col("__vn") * s.sn != 0,
                        dot(v, s.sv) / (F.col("__vn") * s.sn),
                    ),
                    6,
                ),
                F.lit(-2.0),
            ).alias("cos"),
            (-s.seed_id).alias("neg_id"),
        ),
    )
    return (
        emb.withColumn("__vn", F.sqrt(dot(v, v)))
        .join(F.broadcast(seeds_row))
        .withColumn("__best", F.array_max(scores))
        .select(
            id_col,
            "embedding",
            (-F.col("__best.neg_id")).cast("long").alias("cluster_id"),
            F.round(F.col("__best.cos"), 4).alias("seed_cos"),
        )
    )


# Above this many clusters the build side of the SemDeDup pair join is
# no longer "a few clusters of the corpus" but effectively the corpus
# itself — broadcast flips from a parallelism win to an executor OOM,
# so the join shuffles on cluster_id instead.
BROADCAST_MAX_CLUSTERS = 64

# Flat assignment scores every seed per row: O(|corpus| * n_seeds)
# cosines.  Production SemDeDup scales seeds WITH the corpus
# (|corpus|/target_cluster_size), which turns flat assignment into the
# pipeline's quadratic term — the measured scaling ladder
# (tools/scaling_ladder.py --emb, SCALE.md) shows 16x corpus + 16x
# seeds = ~126x wall-clock.  From this seed count semantic_dedup
# switches to the two-level coarse-quantized assignment (O(n * sqrt(k)));
# 64 is the measured crossover of the ASSIGNMENT term (8.5x at 64 seeds
# on 4x corpus; the pair scan downstream is identical either way), set
# as the default because below it the exact flat argmax is cheap enough
# to prefer over the nprobe=1 approximation.
COARSE_MIN_SEEDS = 64

# The two-level group join's build side holds ALL n_seeds vectors
# (grouped into ~sqrt(k) rows).  Past this count that side is too big
# to broadcast (1M x 768-dim doubles ~ 6 GB), so the group join
# shuffles on coarse_id instead — same gate shape as the pair join.
BROADCAST_MAX_SEED_VECTORS = 4096


def seeded_cluster_assign_two_level(
    emb: DataFrame,
    n_seeds: int = 256,
    id_col: str = "vec_id",
    n_coarse: int | None = None,
) -> DataFrame:
    """Two-level (IVF-style) variant of :func:`seeded_cluster_assign`
    for production seed counts.

    The k seeds are themselves assigned to ``n_coarse`` (default
    ceil(sqrt(k))) *coarse* seeds — the k lowest-id vectors quantized
    against the ``n_coarse`` lowest-id vectors, with each coarse seed
    forced into its OWN group so every group is non-empty.  A corpus
    row then scores only the coarse seeds (one broadcast row, map-only)
    and the seeds of its winning group (an equi-join on ``coarse_id``),
    for O(sqrt(k) + k/sqrt(k)) cosines per row instead of O(k).

    Approximation contract (standard IVF nprobe=1): the winning seed is
    the argmax *within the chosen coarse group*, which can differ from
    the global argmax near group boundaries.  Assignment is still fully
    deterministic (round-6 cosine, ties to the lowest id at both
    levels) so a SQL oracle reproduces it exactly.

    Scale shape: coarse scoring is the same zero-shuffle broadcast-
    scalar pattern as the flat path (sqrt(k) vectors broadcast —
    ~10^3 rows even at 10^6 seeds); the group join broadcasts under
    ``BROADCAST_MAX_SEED_VECTORS`` total seed vectors and otherwise
    shuffles the corpus ONCE on ``coarse_id`` (AQE skew-join splits hot
    groups).  Per-row and per-seed norms are computed once — the
    per-pair score is one dot fold, arithmetically identical to
    ``cosine`` (same sqrt(dot)*sqrt(dot) denominator values).
    """
    c = n_coarse if n_coarse is not None else math.isqrt(max(n_seeds - 1, 0)) + 1
    seeds = emb.filter(F.col(id_col) < n_seeds).select(
        F.col(id_col).alias("seed_id"),
        _as_double(F.col("embedding")).alias("sv"),
    ).withColumn("sn", F.sqrt(dot(F.col("sv"), F.col("sv"))))
    coarse_row = (
        seeds.filter(F.col("seed_id") < c)
        .select(
            F.col("seed_id").alias("coarse_id"),
            F.col("sv").alias("cv"),
            F.col("sn").alias("cn"),
        )
        .agg(
            F.sort_array(
                F.collect_list(F.struct("coarse_id", "cv", "cn"))
            ).alias("__coarse")
        )
        # dense-id precondition, loud (r11 review: empty coarse seeds
        # would inner-join to an EMPTY assignment with no error) —
        # folded into this one-row aggregate instead of a separate
        # isEmpty pre-job on the corpus (r12)
        .select(
            _nonempty_or_raise(
                "__coarse",
                f"no vectors with {id_col} < n_coarse={c}: deterministic "
                "seeds require ids dense from 0",
            ).alias("__coarse")
        )
    )

    def _best_coarse(vec: Column, vnorm: Column) -> Column:
        # argmax over the broadcast coarse array: (round-6 cos, -id)
        # structs, array_max → max cosine, ties to lowest coarse_id;
        # zero-norm cosines (NULL) coalesce to -2 so they always lose
        scores = F.transform(
            F.col("__coarse"),
            lambda s: F.struct(
                F.coalesce(
                    F.round(
                        F.when(
                            vnorm * s.cn != 0,
                            dot(vec, s.cv) / (vnorm * s.cn),
                        ),
                        6,
                    ),
                    F.lit(-2.0),
                ).alias("cos"),
                (-s.coarse_id).alias("neg_id"),
            ),
        )
        return (-F.array_max(scores).neg_id).cast("long")

    # seed -> coarse group (k-row metadata-sized job); a coarse seed is
    # ALWAYS its own group's member — without the forced self row a
    # duplicate-vector tie could leave a group empty, and a corpus row
    # whose coarse winner is that group would have no seeds to score
    seed_groups = (
        seeds.join(F.broadcast(coarse_row))
        .withColumn(
            "coarse_id",
            F.when(F.col("seed_id") < c, F.col("seed_id")).otherwise(
                _best_coarse(F.col("sv"), F.col("sn"))
            ),
        )
        .groupBy("coarse_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("seed_id", "sv", "sn"))
            ).alias("__grp")
        )
    )

    v = _as_double(F.col("embedding"))
    pts = (
        emb.withColumn("__vn", F.sqrt(dot(v, v)))
        .join(F.broadcast(coarse_row))
        .withColumn("coarse_id", _best_coarse(v, F.col("__vn")))
        .drop("__coarse")
    )
    grp = (
        F.broadcast(seed_groups)
        if n_seeds <= BROADCAST_MAX_SEED_VECTORS
        else seed_groups.hint("shuffle_hash")
    )
    fine_scores = F.transform(
        F.col("__grp"),
        lambda s: F.struct(
            F.coalesce(
                F.round(
                    F.when(
                        F.col("__vn") * s.sn != 0,
                        dot(v, s.sv) / (F.col("__vn") * s.sn),
                    ),
                    6,
                ),
                F.lit(-2.0),
            ).alias("cos"),
            (-s.seed_id).alias("neg_id"),
        ),
    )
    return (
        pts.join(grp, "coarse_id")
        .withColumn("__best", F.array_max(fine_scores))
        .select(
            id_col,
            "embedding",
            (-F.col("__best.neg_id")).cast("long").alias("cluster_id"),
            F.round(F.col("__best.cos"), 4).alias("seed_cos"),
        )
    )


def semantic_dedup(
    emb: DataFrame,
    n_seeds: int = 16,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    two_level: bool | None = None,
) -> DataFrame:
    """SemDeDup: mark a vector removed when it is ≥``threshold`` cosine
    to any LOWER-id vector in its cluster (greedy keep-lowest-id, the
    deterministic form of the paper's keep-one-per-near-dup-group).

    The quadratic term is bounded per cluster (seeds scale with corpus
    size). Pair-scan economics: each vector's norm is computed ONCE
    before the join — the same `sqrt(dot(v,v))` value per row, so the
    pair cosine `dot/(norm_a*norm_b)` is arithmetically identical to
    the oracle's per-pair formula but does one array fold per pair
    instead of three (the folds are the hot loop).

    Join strategy branches on cluster count (``broadcast_max_clusters``):
    at demo seed counts a ``cluster_id``-shuffled join would cap
    parallelism at ``n_seeds`` active partitions, so the probe side is
    hash-repartitioned and the build side broadcast; at production seed
    counts (|corpus|/cluster_size → thousands of clusters) the build
    side IS the corpus — broadcasting it would OOM every executor — so
    the pair join shuffles on ``cluster_id`` (shuffle-hash hinted, same
    plan shape as the LSH bucket join; AQE skew-join splits oversized
    clusters).
    Assignment branches on seed count too: at production seed counts
    (``two_level`` defaults on from ``COARSE_MIN_SEEDS``) the flat
    O(n*k) per-row argmax is replaced by the two-level coarse-quantized
    assignment (:func:`seeded_cluster_assign_two_level`, O(n*sqrt(k))) —
    the measured flat-assignment ladder is quadratic when seeds scale
    with the corpus (SCALE.md).

    Output: (vec_id, cluster_id, is_kept).
    """
    if two_level is None:
        two_level = n_seeds >= COARSE_MIN_SEEDS
    assign = (
        seeded_cluster_assign_two_level if two_level else seeded_cluster_assign
    )
    assigned = assign(emb, n_seeds=n_seeds, id_col=id_col)
    v = _as_double(F.col("embedding"))
    # materialize the assignment once: a self-join would otherwise
    # re-evaluate the whole seed-scoring pipeline on BOTH sides
    # (exchanges are not reused across join branches — same lesson as
    # the minhash one-scan pin); at production scale this is the
    # persisted assignment table between pipeline stages. The embedding
    # is double-cast HERE, before the checkpoint: casting inside the
    # pair join would allocate a fresh converted array per pair side
    # (measured 2x on the pair scan; the join must see plain column
    # references, nothing per-row).
    withn = (
        assigned.withColumn("embedding", v)
        .withColumn(
            "__norm", F.sqrt(dot(F.col("embedding"), F.col("embedding")))
        )
        .localCheckpoint()
    )
    if n_seeds <= BROADCAST_MAX_CLUSTERS:
        par = emb.sparkSession.sparkContext.defaultParallelism
        a = withn.repartition(par, id_col).alias("a")
        b = F.broadcast(withn.alias("b"))
    else:
        a = withn.alias("a")
        b = withn.alias("b").hint("shuffle_hash")
    denom = F.col("a.__norm") * F.col("b.__norm")
    pair_cos = F.when(
        denom != 0,
        dot(F.col("a.embedding"), F.col("b.embedding")) / denom,
    )
    removed = (
        a.join(
            b,
            (F.col("a.cluster_id") == F.col("b.cluster_id"))
            & (F.col(f"a.{id_col}") > F.col(f"b.{id_col}")),
        )
        .filter(F.round(pair_cos, 4) >= threshold)
        .select(F.col(f"a.{id_col}").alias(id_col))
        .distinct()
        .withColumn("__rm", F.lit(True))
    )
    return (
        withn.select(id_col, "cluster_id")
        .join(removed, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("__rm"), F.lit(True)).alias("is_kept"),
        )
    )


# The batched ANN join broadcasts the query side (scored against one
# corpus scan).  Past this many query vectors the broadcast no longer
# fits an executor — both sides shuffle on centroid_id instead (the
# IVF variant; the exact variant refuses, it has no join key).
BROADCAST_MAX_QUERY_VECTORS = 100_000


def ann_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id_col: str = "q_id",
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Exact batched top-k join: every query row gets its ``k``
    max-cosine corpus rows — the retrieval / cross-dataset-dedup shape
    (N queries at once, unlike the single-vector ``cosine_topk``).

    Plan: the query side collapses to ONE broadcast row of (id, vec,
    norm) structs; each corpus row computes one dot fold per query
    (norms hoisted — same arithmetic as ``cosine``), explodes to
    skinny (q_id, vec_id, cos) triples, and a single window shuffle on
    ``query_id`` ranks them.  The corpus is scanned once and never
    shuffled wide: the exchange carries |corpus| x |queries| x ~24-byte
    rows, which bounds this exact variant to modest query batches —
    production batches at 100 TB route through :func:`ann_join_ivf`,
    which scores only nprobe buckets per query.

    Ranking is deterministic: round-6 cosine desc, corpus id asc.
    Output: (query_id, rank, vec_id-named id, cos).
    """
    qrow = (
        queries.select(
            F.col(query_id_col).alias("q_id"),
            _as_double(F.col("embedding")).alias("qv"),
        )
        .withColumn("qn", F.sqrt(dot(F.col("qv"), F.col("qv"))))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("q_id", "qv", "qn"))
            ).alias("__qs")
        )
    )
    v = _as_double(F.col("embedding"))
    scored = F.transform(
        F.col("__qs"),
        lambda q: F.struct(
            q.q_id.alias("q_id"),
            F.coalesce(
                F.round(
                    F.when(
                        F.col("__vn") * q.qn != 0,
                        dot(v, q.qv) / (F.col("__vn") * q.qn),
                    ),
                    6,
                ),
                F.lit(-2.0),
            ).alias("cos"),
        ),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos"), F.col(id_col).asc()
    )
    return (
        corpus.withColumn("__vn", F.sqrt(dot(v, v)))
        .join(F.broadcast(qrow))
        .select(id_col, F.explode(scored).alias("__s"))
        .select(
            F.col("__s.q_id").alias("q_id"),
            id_col,
            F.col("__s.cos").alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", id_col, F.round("cos", round_to).alias("cos"))
    )


def ann_join_ivf(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    query_id_col: str = "q_id",
    id_col: str = "vec_id",
    round_to: int = 4,
    broadcast_queries: bool = True,
) -> DataFrame:
    """IVF-bucketed batched ANN join — the 100 TB shape of
    :func:`ann_join`.

    ``broadcast_queries``: the query batch size is data-dependent, so
    the caller declares the strategy — True (default) broadcasts the
    exploded query side and the corpus scans once unshuffled; set
    False past ~``BROADCAST_MAX_QUERY_VECTORS`` vectors, shuffling
    both sides on ``centroid_id`` (AQE skew-join splits hot buckets).

    Deterministic coarse quantizer (the ``n_centroids`` lowest-id
    corpus vectors, same convention as the two-level seed assignment,
    so a SQL oracle reproduces every step): the corpus assigns to ONE
    centroid via a broadcast-scalar argmax (map-only, zero shuffle —
    at scale this column is the persisted ``partitionBy`` layout);
    each query explodes to its ``nprobe`` nearest centroids.  The
    candidate join is then a plain equi-join on ``centroid_id`` —
    query side broadcast under ``BROADCAST_MAX_QUERY_VECTORS``
    (corpus scans once, unshuffled), shuffle-hash on ``centroid_id``
    above it — and only |corpus| * nprobe/n_centroids pairs are scored
    per query on average, not the whole corpus.  One window shuffle of
    skinny (q_id, id, cos) rows ranks survivors; recall follows the
    standard IVF nprobe dial (nprobe=n_centroids degrades to exact).

    Output: (q_id, rank, <id_col>, cos).

    Same dense-id precondition as `seeded_cluster_assign` (centroids
    are the ``id < n_centroids`` vectors); raises rather than silently
    producing an empty candidate set — in-plan, folded into the one-row
    centroid aggregate (r12: the r11 isEmpty pre-job was a whole extra
    corpus job and this query's 1.38x bench mover).
    """
    cents_row = (
        corpus.filter(F.col(id_col) < n_centroids)
        .select(
            F.col(id_col).alias("centroid_id"),
            _as_double(F.col("embedding")).alias("cv"),
        )
        .withColumn("cn", F.sqrt(dot(F.col("cv"), F.col("cv"))))
        .agg(
            F.sort_array(
                F.collect_list(F.struct("centroid_id", "cv", "cn"))
            ).alias("__cents")
        )
        .select(
            _nonempty_or_raise(
                "__cents",
                f"no vectors with {id_col} < n_centroids={n_centroids}: "
                "deterministic centroids require ids dense from 0",
            ).alias("__cents")
        )
    )

    def _cent_scores(vec: Column, vnorm: Column) -> Column:
        return F.transform(
            F.col("__cents"),
            lambda s: F.struct(
                F.coalesce(
                    F.round(
                        F.when(
                            vnorm * s.cn != 0,
                            dot(vec, s.cv) / (vnorm * s.cn),
                        ),
                        6,
                    ),
                    F.lit(-2.0),
                ).alias("cos"),
                (-s.centroid_id).alias("neg_id"),
            ),
        )

    v = _as_double(F.col("embedding"))
    corp = (
        corpus.withColumn("__vn", F.sqrt(dot(v, v)))
        .join(F.broadcast(cents_row))
        .withColumn(
            "centroid_id",
            (-F.array_max(_cent_scores(v, F.col("__vn"))).neg_id).cast(
                "long"
            ),
        )
        .drop("__cents")
    )
    # query -> nprobe nearest centroids: sort the scored structs desc
    # ((cos, -id) structs sort ties to the LOWEST centroid first when
    # reversed), slice nprobe, explode
    qv = _as_double(F.col("embedding"))
    probes = F.slice(
        F.reverse(F.array_sort(_cent_scores(qv, F.col("__qn")))),
        1,
        nprobe,
    )
    q = (
        queries.withColumn("__qn", F.sqrt(dot(qv, qv)))
        .join(F.broadcast(cents_row))
        .select(
            F.col(query_id_col).alias("q_id"),
            _as_double(F.col("embedding")).alias("qv"),
            F.col("__qn").alias("qn"),
            F.explode(probes).alias("__p"),
        )
        .select(
            "q_id", "qv", "qn",
            (-F.col("__p.neg_id")).cast("long").alias("centroid_id"),
        )
    )
    qside = (
        F.broadcast(q) if broadcast_queries else q.hint("shuffle_hash")
    )
    pair_cos = F.coalesce(
        F.round(
            F.when(
                F.col("__vn") * F.col("qn") != 0,
                dot(F.col("embedding"), F.col("qv"))
                / (F.col("__vn") * F.col("qn")),
            ),
            6,
        ),
        F.lit(-2.0),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos"), F.col(id_col).asc()
    )
    return (
        corp.join(qside, "centroid_id")
        .select("q_id", id_col, pair_cos.alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", id_col, F.round("cos", round_to).alias("cos"))
    )


def semantic_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    round_to: int = 4,
) -> DataFrame:
    """Embedding-level benchmark decontamination — the semantic twin of
    the n-gram ``text_contamination`` check: flag every corpus vector
    whose max cosine to ANY benchmark vector reaches ``threshold``
    (an eval example paraphrased into the training set shares no
    shingles but sits next to it in embedding space).

    Scale shape mirrors the shingle variant: benchmark/eval sets are
    tiny by construction, so the benchmark side collapses to ONE
    broadcast row of (vec, norm) structs and the corpus is a single
    map-only scan — per row one dot fold per benchmark vector, an
    ``array_max``, zero shuffle, nothing collected.  For benchmark
    sets past broadcast size, route through :func:`ann_join_ivf` and
    threshold its ``cos`` instead.

    Output: (id, bench_cos, is_contaminated).
    """
    brow = (
        benchmark.select(
            _as_double(F.col("embedding")).alias("bv"),
        )
        .withColumn("bn", F.sqrt(dot(F.col("bv"), F.col("bv"))))
        .agg(F.collect_list(F.struct("bv", "bn")).alias("__bench"))
    )
    v = _as_double(F.col("embedding"))
    scores = F.transform(
        F.col("__bench"),
        lambda b: F.coalesce(
            F.round(
                F.when(
                    F.col("__vn") * b.bn != 0,
                    dot(v, b.bv) / (F.col("__vn") * b.bn),
                ),
                6,
            ),
            F.lit(-2.0),
        ),
    )
    return (
        corpus.withColumn("__vn", F.sqrt(dot(v, v)))
        .join(F.broadcast(brow))
        .withColumn("__mx", F.array_max(scores))
        .select(
            id_col,
            F.round(F.col("__mx"), round_to).alias("bench_cos"),
            # empty benchmark → array_max([]) is NULL → flag must be
            # FALSE, not a tri-state NULL leaking into boolean
            # consumers (r11 review); bench_cos stays NULL, honestly
            # "no benchmark to score against"
            F.coalesce(
                F.col("__mx") >= threshold, F.lit(False)
            ).alias("is_contaminated"),
        )
    )


def quantize_int8(vec: Column) -> Column:
    """Scalar int8 quantization: per-vector max-abs scale, symmetric
    round-to-nearest — the standard 4x memory compression for ANN
    indexes (a 100 TB float32 embedding store becomes 25 TB, and SIMD
    int8 dot products beat float on modern CPUs; here the win modeled
    is the storage/shuffle volume).  Cosine needs no dequantization:
    the per-vector scale cancels in the ratio, so similarity error
    comes only from rounding (bounded by ~1/127 per dimension)."""
    v = _as_double(vec)
    mx = F.array_max(F.transform(v, F.abs))
    s = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))
    # zip_with + array_repeat so the max-abs fold evaluates ONCE per
    # row, not per element — the l2_normalize O(d²) lambda-fold rule
    # (SCALE.md r11); identical ints, this is the hot expression of
    # every q8 index build and ingest append
    return F.zip_with(
        v,
        F.array_repeat(s, F.size(v)),
        lambda x, sc: F.round(x / sc).cast("int"),
    )


def quantized_scores(
    emb: DataFrame, query_vec_id: int, round_to: int = 4
) -> DataFrame:
    """One scan scoring every candidate against the query vector with
    BOTH the exact float cosine and the int8-quantized cosine —
    (vec_id, cos_sim, cos_sim_q).  Broadcast 1-row query side, zero
    shuffle; the quantized index path and its accuracy contract come
    from the same pass."""
    with_q = emb.select(
        "vec_id", "embedding", quantize_int8(F.col("embedding")).alias("qv8")
    )
    q = with_q.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb"), F.col("qv8").alias("q_q8")
    )
    return (
        with_q.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                cosine(F.col("embedding"), F.col("q_emb")), round_to
            ).alias("cos_sim"),
            F.round(
                cosine(F.col("qv8"), F.col("q_q8")), round_to
            ).alias("cos_sim_q"),
        )
    )


def ivf_persist_index_q8(
    emb: DataFrame,
    path: str,
    n_centroids: int = 16,
    seed: int = 42,
):
    """Materialize a QUANTIZED IVF index: (vec_id, q8) partitioned by
    ``centroid_id`` — int8 rows are ~4x smaller than float32, so the
    probe's pruned-partition scan moves a quarter of the bytes.  Full-
    precision vectors stay in the base table; the probe reranks its
    shortlist there (the IVF+refine layout).  Returns the fitted
    KMeans model."""
    from tajo_spark import catalog

    assigned, model = ivf_assign(emb, n_centroids=n_centroids, seed=seed)
    (
        assigned.select(
            "vec_id",
            quantize_int8(F.col("embedding")).alias("q8"),
            "centroid_id",
        )
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    # writer-owned invalidation (see ivf_persist_index)
    catalog.invalidate(path)
    return model


def ivf_q8_shortlist(
    spark,
    path: str,
    model,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    expand: int = 4,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """Stage-1 candidate shortlist over the quantized index: scan only
    the ``nprobe`` nearest centroid partitions (directory pruning —
    plan-pinned), score int8 cosine, TakeOrdered ``k*expand``."""
    import numpy as np

    qv = np.asarray(query_vec, dtype="float64")
    qn = qv / max(float(np.linalg.norm(qv)), 1e-12)
    centers = model.clusterCenters()
    order = np.argsort([float(np.linalg.norm(c - qn)) for c in centers])
    probe = [int(i) for i in order[:nprobe]]
    scale = max(float(np.max(np.abs(qv))), 1e-300) / 127.0
    # HALF_UP (round half away from zero) to match quantize_int8's
    # Spark-side F.round — Python's builtin round() is HALF_EVEN, so
    # e.g. 62.5 quantized differently here vs ann_join_q8_persisted's
    # batch path for the identical query (r11 review)
    qq8 = [
        float(math.floor(abs(x / scale) + 0.5)) * (1.0 if x >= 0 else -1.0)
        for x in qv
    ]
    # sequential sum matches the Spark-side fold order bit-for-bit
    # (numpy's pairwise summation can differ in the last ulp)
    acc = 0.0
    for x in qq8:
        acc += x * x
    qn8 = float(acc) ** 0.5
    qdf = spark.createDataFrame([(qq8, qn8)], "qq8 ARRAY<DOUBLE>, qn8 DOUBLE")
    # norm-hoisted scoring (the semantic_dedup lesson, measured in the
    # --pq ladder): cast + candidate norm are computed ONCE per index
    # row before the join — cosine() inline would re-fold both norms
    # per (candidate, query) pair, tripling the per-pair work.
    idx = (
        (index_df if index_df is not None else _index_frame(spark, path))
        .filter(F.col("centroid_id").isin(probe))
        .select("vec_id", _as_double(F.col("q8")).alias("__cv"))
        .withColumn("__cn", F.sqrt(dot(F.col("__cv"), F.col("__cv"))))
    )
    return (
        idx.join(F.broadcast(qdf))
        .select(
            "vec_id",
            F.when(
                F.col("__cn") * F.col("qn8") != 0,
                dot(F.col("__cv"), F.col("qq8"))
                / (F.col("__cn") * F.col("qn8")),
            ).alias("__q8_cos"),
        )
        .orderBy(F.desc("__q8_cos"), "vec_id")
        .limit(k * expand)
    )


_Q8_CENTS_MEMO: dict = {}
_CENTS_MEMO_MAX = 8  # distinct live models per session; oldest evicted


def _q8_cents_frame(spark, model):
    """One-row collected-centroids frame for the persisted-q8 probe —
    pure model metadata, memoized per (session, model object) so a
    probe call doesn't rebuild the py4j createDataFrame + aggregate
    plan every time (r12). Strong model reference pins the id key."""
    key = (spark.sparkContext.applicationId, id(model))
    hit = _Q8_CENTS_MEMO.get(key)
    if hit is not None and hit[0] is model:
        return hit[1]
    # drop entries from stopped sessions so superseded models don't
    # accumulate for the life of the process (ADVICE r12; mirrors
    # catalog.load_table's stale-app prune)
    for k in [k for k in _Q8_CENTS_MEMO if k[0] != key[0]]:
        del _Q8_CENTS_MEMO[k]
    centers = model.clusterCenters()
    # single pre-built row, not an agg over a k-row frame: the
    # collect_list aggregate re-ran as a tiny Spark job inside every
    # broadcast build of the probe plan (r13); structurally the same
    # one-row (centroid_id, cv) struct list, in the same enumerate
    # order (downstream ranking is order-independent anyway:
    # array_sort with a full (negd, neg_id) tiebreak)
    df = spark.createDataFrame(
        [([(i, [float(x) for x in c]) for i, c in enumerate(centers)],)],
        "__cents ARRAY<STRUCT<centroid_id: INT, cv: ARRAY<DOUBLE>>>",
    )
    _Q8_CENTS_MEMO[key] = (model, df)
    # same-session bound: retrained models are new objects → new keys,
    # so a long serving session would otherwise accumulate one strong
    # (model, frame) pair per retrain (r13 review; the app-id prune
    # above only helps across sessions).  Evict oldest-inserted first.
    while len(_Q8_CENTS_MEMO) > _CENTS_MEMO_MAX:
        del _Q8_CENTS_MEMO[next(iter(_Q8_CENTS_MEMO))]
    return df


def ann_join_q8_persisted(
    spark,
    path: str,
    model,
    queries: DataFrame,
    base: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    expand: int = 4,
    query_id_col: str = "q_id",
    round_to: int = 4,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """Batch retrieval against the PERSISTED quantized IVF index — the
    production serving shape: N query vectors probe the
    ``partitionBy(centroid_id)`` index built by
    :func:`ivf_persist_index_q8`, touching only the union of their
    ``nprobe`` nearest centroid directories.

    Stages (the corpus-scaled work is all distributed; the only
    driver-side read is the request batch itself):

    1. each query ranks the model's centroid metadata (c × dim floats,
       shipped as one literal broadcast row) and explodes to its
       ``nprobe`` probe targets; that request-bounded frame
       (n_queries × nprobe rows) is evaluated ONCE and read back to
       the driver, where it seeds the probe list and the broadcast
       sides as local relations;
    2. the index scan is filtered to the UNION of probed centroids — a
       driver-side list of at most ``n_centroids`` ints (metadata-
       sized), so parquet directory pruning applies statically — and
       equi-joins the broadcast probes on ``centroid_id``, scoring
       int8 cosine only for (query, candidate) pairs that share a
       probed bucket;
    3. a window keeps ``k*expand`` candidates per query, the base
       table broadcast-joins the candidate-bounded shortlist (base is
       never shuffled), and the exact float rerank + final top-k
       window run on the joined (query, candidate) rows.

    Output: (q_id, rank, vec_id, cos) — same contract as
    :func:`ann_join`, with recall following the nprobe/expand dials.
    """
    from pyspark.sql import Window

    cents = _q8_cents_frame(spark, model)

    # rank centers by L2 distance to the NORMALIZED query — the same
    # rule the single-query probes use (centers live on the unit
    # sphere, so L2 order == cosine order)
    d2 = lambda s: F.aggregate(  # noqa: E731
        F.zip_with(F.col("__qn"), s.cv, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    probes_arr = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    F.col("__cents"),
                    lambda s: F.struct(
                        (-F.round(d2(s), 9)).alias("negd"),
                        (-s.centroid_id).alias("neg_id"),
                    ),
                )
            )
        ),
        1,
        nprobe,
    )
    qplan = (
        queries.select(
            F.col(query_id_col).alias("q_id"),
            _as_double(F.col("embedding")).alias("qv"),
        )
        .withColumn("__qn", l2_normalize(F.col("qv")))
        .join(F.broadcast(cents))
        .select(
            "q_id", "qv",
            F.explode(probes_arr).alias("__p"),
        )
        .select(
            "q_id", "qv",
            (-F.col("__p.neg_id")).cast("int").alias("centroid_id"),
        )
    )
    # ONE evaluation of the query-side subtree + ONE metadata-sized
    # driver read (r13; VERDICT r12 #1).  Previously: localCheckpoint
    # (job 1) + centroid distinct-collect (job 2) + two broadcast
    # builds re-reading the checkpoint (jobs 3-4).  The collect is
    # bounded by n_queries × nprobe rows — the serving REQUEST batch,
    # not the corpus — and the rebuilt local frame makes every
    # downstream broadcast a driver-local LocalTableScan.  Values
    # round-trip bit-exactly (IEEE doubles through collect /
    # createDataFrame), and the quantization below still runs through
    # the same Spark expressions, so results are unchanged.
    qrows = qplan.collect()
    q = spark.createDataFrame(qrows, qplan.schema)
    probed = sorted({int(r.centroid_id) for r in qrows})
    # norm-hoisted quantized scoring (measured in the --pq ladder:
    # cosine() inline re-folds BOTH norms per (candidate, query) pair —
    # 3 array folds where 1 suffices; at 16x corpus the un-hoisted
    # probe measured 97.7 s vs the PQ probe's 9.2 s): cast + norm run
    # once per index row and once per query row, the pair join folds
    # only the dot.
    qq8 = q.select(
        "q_id",
        "centroid_id",
        _as_double(quantize_int8(F.col("qv"))).alias("__qv8"),
    ).withColumn("__qn8", F.sqrt(dot(F.col("__qv8"), F.col("__qv8"))))
    idx = (
        (index_df if index_df is not None else _index_frame(spark, path))
        .filter(F.col("centroid_id").isin(probed))
        .select(
            "centroid_id", "vec_id", _as_double(F.col("q8")).alias("__cv")
        )
        .withColumn("__cn", F.sqrt(dot(F.col("__cv"), F.col("__cv"))))
    )
    w1 = Window.partitionBy("q_id").orderBy(
        F.desc("__q8_cos"), F.col("vec_id").asc()
    )
    shortlist = (
        idx.join(F.broadcast(qq8), "centroid_id")
        .select(
            "q_id",
            "vec_id",
            F.when(
                F.col("__cn") * F.col("__qn8") != 0,
                dot(F.col("__cv"), F.col("__qv8"))
                / (F.col("__cn") * F.col("__qn8")),
            ).alias("__q8_cos"),
        )
        .withColumn("__rn", F.row_number().over(w1))
        .filter(F.col("__rn") <= k * expand)
        .select("q_id", "vec_id")
    )
    # exact rerank: ONE broadcast hash join attaches the shortlist to
    # the base table (r13; was base ⋉ distinct(shortlist.vec_id) then
    # a re-join of shortlist — two evaluations of the windowed
    # shortlist subtree and an extra distinct exchange for an
    # identical row multiset: the semi-join restricted base to
    # shortlist ids, the re-join fanned them back out per q_id, which
    # is exactly what the inner join on vec_id produces directly).
    # The shortlist is candidate-bounded (≤ n_queries·k·expand rows),
    # so the broadcast is metadata-sized and base is never shuffled.
    cand = base.select(
        "vec_id", _as_double(F.col("embedding")).alias("cv8")
    )
    # distinct (q_id, qv) computed from the already-collected rows —
    # qv is identical across a q_id's nprobe rows by construction, so
    # first-seen-per-q_id == Spark-side distinct; avoids an aggregate
    # job inside the broadcast build
    seen: dict = {}
    for r in qrows:
        if r.q_id not in seen:
            seen[r.q_id] = r.qv
    qfull = spark.createDataFrame(
        [(qid, qv) for qid, qv in seen.items()],
        qplan.select("q_id", "qv").schema,
    )
    w2 = Window.partitionBy("q_id").orderBy(
        F.desc("cos"), F.col("vec_id").asc()
    )
    return (
        cand.join(F.broadcast(shortlist), "vec_id")
        .join(F.broadcast(qfull), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("cv8"), F.col("qv")), 6).alias("cos"),
        )
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", "vec_id", F.round("cos", round_to).alias("cos"))
    )


def ivf_probe_persisted_q8(
    spark,
    path: str,
    model,
    query_vec: list[float],
    emb: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    expand: int = 4,
    round_to: int = 4,
    index_df: DataFrame | None = None,
) -> DataFrame:
    """Two-stage probe over the quantized index: (1) scan only the
    ``nprobe`` nearest centroid partitions (directory pruning), score
    int8 cosine, keep a ``k*expand`` shortlist; (2) rerank the
    shortlist with exact float cosine against the base table and
    return the top-k.  The shortlist id set is metadata-sized
    (k*expand rows), so driver-side collection is correct — the base-
    table fetch becomes an IN-filter that parquet row-group stats can
    skip on (pair with the key-clustered CREATE INDEX layout for
    point-lookup behavior at 100 TB)."""
    shortlist = ivf_q8_shortlist(
        spark, path, model, query_vec, k=k, nprobe=nprobe, expand=expand,
        index_df=index_df,
    )
    ids = [int(r.vec_id) for r in shortlist.collect()]  # metadata-sized
    qfull = spark.createDataFrame(
        [([float(x) for x in query_vec],)], "qv ARRAY<DOUBLE>"
    )
    return (
        emb.filter(F.col("vec_id").isin(ids))
        .join(F.broadcast(qfull))
        .select(
            "vec_id",
            F.round(
                cosine(F.col("embedding"), F.col("qv")), round_to
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


RRF_K = 60


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k: int = 10,
    depth: int = 50,
    k_rrf: int = RRF_K,
) -> DataFrame:
    """Hybrid retrieval: fuse the sparse (BM25) and dense (cosine)
    rankings with reciprocal-rank fusion (Cormack et al. 2009) —
    ``score(d) = Σ 1/(k_rrf + rank_i(d))`` over the rankings that
    contain d.  RRF is THE standard hybrid because it needs no score
    calibration between a log-scaled lexical score and a bounded
    cosine; only ranks matter.

    Returns ``(doc_id, lex_rank, dense_rank, rrf)`` — null rank =
    absent from that ranking's top ``depth``.

    Scale shape: each leg is its already-pinned retrieval operator
    (one-scan BM25, broadcast-query cosine) truncated to ``depth``
    rows; fusion is a full-outer join of two depth-row frames with
    rank windows over those tiny frames (single-partition by
    construction — depth rows, not corpus rows), then TakeOrdered.
    """
    from pyspark.sql import Window as W

    from tajo_spark.operators.text import bm25_topk

    lex = bm25_topk(docs, query_terms, k=depth).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.desc("bm25"), "doc_id"))
        .alias("lex_rank"),
    )
    dense = cosine_topk(emb, query_vec_id, k=depth).select(
        F.col("vec_id").alias("doc_id"),
        F.row_number()
        .over(W.orderBy(F.desc("cos_sim"), "vec_id"))
        .alias("dense_rank"),
    )
    fused = (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round(
                F.coalesce(1.0 / (F.lit(k_rrf) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(
                    1.0 / (F.lit(k_rrf) + F.col("dense_rank")), F.lit(0.0)
                ),
                6,
            ).alias("rrf"),
        )
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(k)


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Deterministic distributed Lloyd k-means expressed entirely in
    DataFrame ops — the fully-reproducible twin of :func:`ivf_assign`
    (which delegates to MLlib and is only contract-checkable).  Every
    step here is pure relational algebra, so a SQL oracle can replay
    the whole trajectory exactly:

    * init: the ``k`` lowest-``id_col`` vectors, numbered 1..k in id
      order (no RNG — reproducible on any engine),
    * assignment: squared-L2 against every centroid via JVM
      ``zip_with``/``aggregate`` (no Python), argmin with a
      ``(dist, cid)`` lexicographic struct-min tie-break,
    * update: per-dimension mean — ``posexplode`` to
      (cid, dim, val), ONE aggregate keyed on cid x dim (<= k*d
      groups, map-side combined), reassembled with an ordered
      struct sort, each coordinate ROUNDed to 9 decimals.  The
      rounding is load-bearing for reproducibility: distributed
      partial aggregation sums in a partition-dependent order, so an
      unrounded mean can differ from a serial engine's by an ulp and
      flip the argmin for near-equidistant vectors; 9 decimals is
      ~1e6 x the double ulp at unit scale, erasing order effects
      while perturbing centroids immaterially.  Clusters that lose
      all members drop out, exactly as the oracle's GROUP BY drops
      them.

    Per iteration the data-sized work is one broadcast k-way candidate
    expansion + one bounded aggregate; centroids stay a k-row
    DataFrame end to end (zero driver collects), so at 100 TB each
    Lloyd pass is a single scan with an O(k*d)-group shuffle — the
    canonical distributed-iteration shape, like
    ``text.train_quality_classifier``'s GD loop.

    Returns ``(assigned, centroids)``: assigned has (id_col, v, cid,
    sq_dist) for the FINAL centroids; centroids has (cid, c).
    """
    # materialize the cast input once: every Lloyd pass (and the final
    # assignment) re-reads it, so without this the parquet scan + cast
    # replay n_iter+1 times — the same fix round 3 measured 4.6x on
    # the IVF fit (sim_ivf_q8_topk 9.3 -> 2.0 s). Executor-storage
    # backed (memory + spill), the canonical Spark iterative-input
    # pattern; values are bit-identical, only materialization changes.
    e = emb.select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("v"),
    ).localCheckpoint()
    from pyspark.sql import Window as W

    # TakeOrdered(k) first, then number the k survivors — the window
    # runs on k rows, never on the corpus
    cent = (
        e.orderBy(id_col)
        .limit(k)
        .select(
            F.row_number().over(W.orderBy(id_col)).cast("int").alias("cid"),
            F.col("v").alias("c"),
        )
    )

    def _assign(cent_df: DataFrame) -> DataFrame:
        # MAP-ONLY argmin (r10 — was the 5.2x-at-10x leg): the k
        # centroids fold into ONE array row, broadcast, and each
        # vector takes array_min over per-centroid (sq_dist, cid)
        # structs — bit-identical to the previous
        # groupBy(id, v).min(struct) (same zip_with/aggregate distance
        # expression, same lexicographic struct ordering, and
        # array_min is element-order-independent) but the per-
        # iteration k*N-row shuffle WITH THE VECTOR IN THE KEY is
        # gone: each Lloyd pass is now one scan + the bounded
        # (cid x dim) update aggregate.
        cent_arr = cent_df.agg(
            F.collect_list(F.struct("cid", "c")).alias("__cents")
        )
        best = e.crossJoin(F.broadcast(cent_arr)).select(
            id_col,
            "v",
            F.array_min(
                F.transform(
                    "__cents",
                    lambda s: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.col("v"),
                                s["c"],
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("sq_dist"),
                        s["cid"].alias("cid"),
                    ),
                )
            ).alias("b"),
        )
        return best.select(
            id_col, "v", F.col("b.cid").alias("cid"),
            F.col("b.sq_dist").alias("sq_dist"),
        )

    for _ in range(n_iter):
        assigned = _assign(cent)
        cent = (
            assigned.select("cid", F.posexplode("v").alias("d", "val"))
            .groupBy("cid", "d")
            .agg(F.round(F.avg("val"), 9).alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("pm"))
            .select(
                "cid", F.transform("pm", lambda s: s["m"]).alias("c")
            )
            # truncate lineage each pass (graph.py/bpe.py pattern):
            # cent is k rows, so the checkpoint is O(k*d) bytes; without
            # it every downstream action replays the whole trajectory
            # and re-scans the corpus n_iter+1 times per action.
            .localCheckpoint()
        )

    assigned = _assign(cent)
    return assigned, cent


def label_centroid_cosines(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label embedding centroids + pairwise cosine between them —
    the embedding-space drift signal between corpus slices (sources,
    snapshots, languages): diverging centroids flag coverage shift
    before a model trains on it.

    Hash-exactness design: cosine(centroid_a, centroid_b) equals
    cosine of the per-label component SUMS (the 1/n factors cancel),
    so elements are integer-scaled at 1e6 and every aggregate is an
    exact integer (decimal(38,0) products) — the only float op is the
    final division of identical integers on both engines.

    Scale shape: posexplode is the data-sized projection; ONE
    two-phase groupBy folds it to |labels| x dims aggregate rows;
    everything after (self-join on pos, norms, division) runs on that
    metadata-sized domain.
    """
    s = centroid_component_sums(emb, label_col, vec_col)
    return centroid_cosines_from_sums(s)


def centroid_component_sums(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """(label, pos, sv): exact integer component sums (elements scaled
    1e6) — the MERGEABLE state behind centroid cosines (cell-wise
    addition composes batches, the property the streaming maintenance
    twin exploits)."""
    e = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("pos", "val"),
    )
    return e.groupBy("label", "pos").agg(
        F.sum(
            F.round(F.col("val").cast("double") * 1000000).cast("long")
        ).alias("sv")
    )


def centroid_cosines_from_sums(s: DataFrame) -> DataFrame:
    """Pairwise label cosines from the (label, pos, sv) sum table —
    cosine(centroid_a, centroid_b) == cosine(sums) since the 1/n
    factors cancel; all math on the metadata-sized aggregate domain."""
    dec = "decimal(38,0)"
    a = s.select(
        F.col("label").alias("label_a"), "pos", F.col("sv").alias("sa")
    )
    b = s.select(
        F.col("label").alias("label_b"), "pos", F.col("sv").alias("sb")
    )
    dot = (
        a.join(b, ["pos"])
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("sa").cast(dec) * F.col("sb").cast(dec)).alias(
                "num"
            )
        )
    )
    nrm = s.groupBy("label").agg(
        F.sum(F.col("sv").cast(dec) * F.col("sv").cast(dec)).alias("d")
    )
    na = nrm.select(F.col("label").alias("label_a"), F.col("d").alias("da"))
    nb = nrm.select(F.col("label").alias("label_b"), F.col("d").alias("db"))
    return (
        dot.join(na, "label_a")
        .join(nb, "label_b")
        .select(
            "label_a",
            "label_b",
            # zero-norm guard (r11 review): an all-zero component-sum
            # label would make this 0/0 → NaN on Spark doubles where
            # the oracle yields NULL — the exact hazard cosine()'s
            # docstring pins; NULL is the contract
            F.round(
                F.when(
                    F.col("da").cast("double") * F.col("db").cast("double")
                    != 0,
                    F.col("num").cast("double")
                    / F.sqrt(
                        F.col("da").cast("double")
                        * F.col("db").cast("double")
                    ),
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy("label_a", "label_b")
    )
