"""Pipeline attrition ledger — "where did my data go".

A composed curation pipeline drops documents at many stages; at 100 TB
the first operational question about any run is the attrition profile
(which stage dropped how many documents and tokens), and computing it
by re-running the pipeline once per stage is corpus-scaled waste. This
operator charges every document to the FIRST stage that would drop it
— pipeline order, exactly the greedy semantics of running the stages
sequentially — in ONE pass:

* per-row rules (Gopher quality gates, language gates, length gates)
  are plain boolean projections on the scan — zero shuffle;
* set-valued stages (exact/near dedup, blocklists, decontamination)
  arrive as drop-id frames and join in — drop sets are
  duplicate-population-sized, so Spark broadcasts the small ones and
  AQE handles the rest;
* the first-match fold is one nested CASE column, and the ledger is a
  groupBy over ≤ |stages|+1 values with map-side partials.

Beyond-reference capability (the reference has no pipeline layer at
all); the spiritual twin of RefinedWeb's "removal rate per stage"
table (Penedo et al. 2023, public paper) as a first-class operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_drop_attrition(
    df: DataFrame,
    stages: list[tuple[str, object]],
    id_col: str = "doc_id",
    token_col: str | None = None,
) -> DataFrame:
    """Charge each row to the first stage (in ``stages`` order) that
    would drop it.

    ``stages``: ordered ``(name, spec)`` pairs — ``spec`` is either a
    boolean Column (True = this stage drops the row) or a DataFrame
    whose ``id_col`` rows are the stage's drop set. ``token_col``
    (optional) is an already-computed per-row token count to aggregate
    alongside document counts.

    Returns ``(stage_pos, stage, n_docs, n_tokens?, frac_docs,
    frac_tokens?)`` with a terminal ``kept`` row; fractions are of the
    INPUT corpus, rounded to 6, so the column sums to 1 and the table
    reads as a funnel.
    """
    names = [name for name, _ in stages]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stage names: {sorted(names)}")
    markers: list[tuple[str, str]] = []
    for i, (name, spec) in enumerate(stages):
        # positional marker names: a raw f"__drop_{name}" collided on
        # duplicate stage names (silently mischarging rows) and broke
        # column resolution for dotted names (r10 review)
        col = f"__drop_{i}"
        if isinstance(spec, DataFrame):
            hits = (
                spec.select(F.col(id_col))
                .dropDuplicates([id_col])
                .withColumn(col, F.lit(True))
            )
            df = df.join(hits, id_col, "left")
        else:
            df = df.withColumn(col, spec)
        df = df.withColumn(col, F.coalesce(F.col(col), F.lit(False)))
        markers.append((name, col))

    stage_expr = F.lit("kept")
    pos_expr = F.lit(len(markers))
    for i in range(len(markers) - 1, -1, -1):
        name, col = markers[i]
        stage_expr = F.when(F.col(col), F.lit(name)).otherwise(stage_expr)
        pos_expr = F.when(F.col(col), F.lit(i)).otherwise(pos_expr)

    toks = (
        F.coalesce(F.col(token_col), F.lit(0)).cast("long")
        if token_col
        else F.lit(0).cast("long")
    )
    ledger = (
        df.select(
            pos_expr.cast("int").alias("stage_pos"),
            stage_expr.alias("stage"),
            toks.alias("__t"),
        )
        .groupBy("stage_pos", "stage")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
        )
    )
    # totals over the ≤ |stages|+1-row ledger — bounded window
    w = Window.partitionBy()
    out = ledger.select(
        "stage_pos",
        "stage",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6).alias(
            "frac_docs"
        ),
        F.round(
            F.col("n_tokens")
            / F.greatest(F.sum("n_tokens").over(w), F.lit(1)),
            6,
        ).alias("frac_tokens"),
    )
    if not token_col:
        out = out.drop("n_tokens", "frac_tokens")
    return out.orderBy("stage_pos")
