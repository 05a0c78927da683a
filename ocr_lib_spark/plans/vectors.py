"""Similarity-search queries over ``embeddings`` (array<float>, dim 64).

Brute-force exact cosine is the baseline (broadcast nested-loop argmax —
check-matching-fn core.clj:1020-1069 lifted to vectors); sign-bucket LSH
is the corpus-scale path. Cosine values are rounded to 6 decimals on
both sides to absorb summation-order ulps; ranks are computed on the
unrounded values with a pinned (cosine DESC, neighbor_id ASC) tie-break.
"""

from __future__ import annotations

from pyspark.sql import functions as F



from ocr_lib_spark.operators.dedup import _sign_bucket
from ocr_lib_spark.operators.similarity import brute_force_topk, knn_label_vote
from ocr_lib_spark.plans import QueryDef, load

N_QUERIES = 8  # vec_id < 8 are the query vectors
TOP_K = 10
LSH_BITS = 8


def _emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def _cosine_topk(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < N_QUERIES)
    out = brute_force_topk(e, q, k=TOP_K)
    return out.select(
        "query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine_r6")
    )


_O_COSINE = f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
              * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id,
       round(cosine, 6) AS cosine_r6
FROM ranked WHERE rank <= {TOP_K}
"""


def _lsh_buckets(spark, sf_dir):
    e = _emb(spark, sf_dir)
    return (
        e.select(_sign_bucket(F.col("embedding"), LSH_BITS).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


_O_LSH_BUCKETS = f"""
SELECT ({" + ".join(f"(CASE WHEN embedding[{i + 1}] > 0 THEN {2**i} ELSE 0 END)" for i in range(LSH_BITS))})::INT AS bucket,
       COUNT(*) AS n
FROM embeddings GROUP BY 1
"""


def _knn_vote(spark, sf_dir):
    e = _emb(spark, sf_dir)
    q = e.where(F.col("vec_id") < N_QUERIES)
    return knn_label_vote(e, q, k=5)


_O_KNN = f"""
WITH pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS nlabel,
         list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[])
           / (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[]))
              * sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id),
topk AS (
  SELECT query_id, nlabel FROM (
    SELECT query_id, nlabel, cosine, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
    FROM pairs) WHERE rank <= 5),
votes AS (
  SELECT query_id, nlabel, COUNT(*) AS n FROM topk GROUP BY query_id, nlabel)
SELECT query_id, nlabel AS pred_label, n AS votes FROM (
  SELECT query_id, nlabel, n,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY n DESC, nlabel ASC) AS r
  FROM votes) WHERE r = 1
"""


NEAR_DUP_T = 0.30  # synthetic embeddings have no true near-dups (max
# in-bucket cosine ≈ 0.43); the threshold exercises the semantics on
# a non-trivial pair set. Production default stays 0.95.


def _near_dup(spark, sf_dir):
    from ocr_lib_spark.operators.dedup import embedding_near_dup

    return embedding_near_dup(
        _emb(spark, sf_dir),
        threshold=NEAR_DUP_T,
        n_lsh_bits=LSH_BITS,
        round_decimals=6,
    )


_O_NEAR_DUP = f"""
WITH wb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         ({" + ".join(f"(CASE WHEN embedding[{i + 1}] > 0 THEN {2**i} ELSE 0 END)" for i in range(LSH_BITS))})::INT AS bucket
  FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM wb a JOIN wb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= {NEAR_DUP_T}
"""


# --- IVF top-k: coarse quantizer -> inverted-list equi-join -> exact rank ----
# The corpus-scale ANN path beyond sign-bucket LSH: assignment and probe
# both join against a small broadcast centroid set; the candidate join is
# an equi-join on centroid_id (the inverted list), never a cross join.
# Centroid choice is a deterministic data rule (vec_id % 64 == 1) so the
# DuckDB twin reproduces it exactly — a trained k-means quantizer would
# slot into the same plan as a broadcast table.

IVF_NPROBE = 2
IVF_K = 5


def _cos(a, b):
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def _assign_centroids_arrow(e, cent_rows):
    """Nearest-centroid assignment as a zero-shuffle Arrow kernel: the
    (tiny, bounded) centroid matrix rides a broadcast/closure and every
    batch scores all its vectors against all centroids in numpy.

    Bit-identity contract with the Catalyst/DuckDB twins: dot products
    and squared norms accumulate in the SAME left-to-right element
    order as the `aggregate` fold (a Python loop over dims issuing one
    vectorized add per dim — sequential per element, C-speed across
    rows), so cosines are IEEE-identical and the argmax tie-break
    (score DESC, centroid_id ASC — centroids pre-sorted ascending,
    np.argmax keeps the first max) matches max_by(struct(score, -id)).

    vs the relational twin (crossJoin → max_by): no n×k row
    materialization, no interpreted higher-order functions — the same
    reduction BLAS-shaped (one fused loop instead of 390k array rows at
    sf0.1)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cent_rows = sorted(cent_rows, key=lambda r: r[0])
    cids = np.array([c for c, _ in cent_rows], dtype=np.int64)
    C = np.array([v for _, v in cent_rows], dtype=np.float64)  # k × dim
    k, dim = C.shape
    cn_sq = np.zeros(k)
    for d in range(dim):  # sequential order == the aggregate fold
        cn_sq = cn_sq + C[:, d] * C[:, d]
    cnorm = np.sqrt(cn_sq)

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = pdf["v"].tolist()
            # fail fast on malformed vectors instead of silently dropping
            # the whole Arrow batch (which would diverge from the
            # per-row relational twin)
            bad = [i for i, r in enumerate(rows) if r is None or len(r) != dim or any(x is None for x in r)]
            if bad:
                raise ValueError(
                    f"null/ragged embedding vectors at batch rows {bad[:5]} "
                    f"(expected non-null dim={dim}); clean upstream"
                )
            V = np.array(rows, dtype=np.float64)  # n × dim
            S = np.zeros((len(V), k))
            vn_sq = np.zeros(len(V))
            for d in range(dim):
                S = S + V[:, d, None] * C[None, :, d]
                vn_sq = vn_sq + V[:, d] * V[:, d]
            cos = S / (np.sqrt(vn_sq)[:, None] * cnorm[None, :])
            best = cids[np.argmax(cos, axis=1)]
            out = pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "v": pdf["v"].values}
            )
            out["centroid_id"] = best
            yield out

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("centroid_id", T.LongType()),
        ]
    )
    from ocr_lib_spark.partitioning import spread_small

    # spread: the n x k scoring kernel is CPU-dense; a small
    # single-row-group scan feeds it one task (no-op at scale)
    return spread_small(e.select("vec_id", "v"), probe=e).mapInPandas(
        run, schema=schema
    )


def _lloyd_partial_stats_arrow(e, cent_rows):
    """One Lloyd step's sufficient statistics as MAP-SIDE PARTIALS: the
    same nearest-centroid Arrow assignment as ``_assign_centroids_arrow``
    (identical pinned fold order, identical argmax tie-break), fused
    with the per-(centroid, dim) integer-scaled sums INSIDE the kernel.
    Each task emits at most k x dim partial rows instead of n x dim
    posexploded element rows — the shuffle feeding the stats groupBy
    shrinks from corpus-size to (tasks x codebook)-size. Bit-identical
    by construction: elements enter fixed point as floor(v * 1e6)
    BEFORE summation (the TRAIN_SCALE contract), and int64 addition is
    associative, so partial-then-final sums equal the flat sum."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    cent_rows = sorted(cent_rows, key=lambda r: r[0])
    cids = np.array([c for c, _ in cent_rows], dtype=np.int64)
    C = np.array([v for _, v in cent_rows], dtype=np.float64)
    k, dim = C.shape
    cn_sq = np.zeros(k)
    for d in range(dim):  # sequential order == the aggregate fold
        cn_sq = cn_sq + C[:, d] * C[:, d]
    cnorm = np.sqrt(cn_sq)

    def run(batches):
        sums = np.zeros((k, dim), dtype=np.int64)
        ns = np.zeros(k, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            rows = pdf["v"].tolist()
            bad = [
                i
                for i, r in enumerate(rows)
                if r is None or len(r) != dim or any(x is None for x in r)
            ]
            if bad:
                raise ValueError(
                    f"null/ragged embedding vectors at batch rows {bad[:5]} "
                    f"(expected non-null dim={dim}); clean upstream"
                )
            V = np.array(rows, dtype=np.float64)
            S = np.zeros((len(V), k))
            vn_sq = np.zeros(len(V))
            for d in range(dim):
                S = S + V[:, d, None] * C[None, :, d]
                vn_sq = vn_sq + V[:, d] * V[:, d]
            cos = S / (np.sqrt(vn_sq)[:, None] * cnorm[None, :])
            best = np.argmax(cos, axis=1)
            VI = np.floor(V * TRAIN_SCALE).astype(np.int64)
            np.add.at(sums, best, VI)
            np.add.at(ns, best, 1)
        mask = ns > 0
        if mask.any():
            nm = int(mask.sum())
            yield pd.DataFrame(
                {
                    "centroid_id": np.repeat(cids[mask], dim),
                    "dim": np.tile(np.arange(dim, dtype=np.int32), nm),
                    "sum_scaled": sums[mask].ravel(),
                    "n": np.repeat(ns[mask], dim),
                }
            )

    schema = T.StructType(
        [
            T.StructField("centroid_id", T.LongType()),
            T.StructField("dim", T.IntegerType()),
            T.StructField("sum_scaled", T.LongType()),
            T.StructField("n", T.LongType()),
        ]
    )
    from ocr_lib_spark.partitioning import spread_small

    # spread: same CPU-dense scoring as _assign_centroids_arrow; the
    # integer partial sums are partitioning-invariant by construction
    return spread_small(e.select("vec_id", "v"), probe=e).mapInPandas(
        run, schema=schema
    )


def _codebook_values_df(spark, cent_rows):
    """Driver-side codebook -> LocalRelation (SQL VALUES literal with
    array() + exact repr double literals — see relational._values_df for
    why not createDataFrame: a python-list DataFrame is Scan ExistingRDD
    and re-runs a python stage per action). repr() round-trips IEEE-754,
    so the literals parse back to the identical doubles."""
    if not cent_rows:
        # an empty VALUES list is a SQL parse error, not an empty result
        # (ADVICE r4); reachable via a tiny input with no seed-rule hit
        # or every centroid losing its members across Lloyd iterations
        raise ValueError(
            "empty codebook: no centroids survive for this input; "
            "IVF needs at least one centroid (check the seed rule / corpus size)"
        )
    rows = ", ".join(
        f"({cid}L, array({', '.join(f'CAST({x!r} AS DOUBLE)' for x in vec)}))"
        for cid, vec in cent_rows
    )
    return spark.sql(f"SELECT * FROM VALUES {rows} AS t(centroid_id, cv)")


def _ivf_topk(
    spark,
    sf_dir,
    vectorized_assign: bool = True,
    trained: bool = False,
    nprobe: int | None = None,
):
    nprobe = IVF_NPROBE if nprobe is None else nprobe
    from pyspark.sql import Window

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if trained:
        # production shape: the codebook is the k-means training output
        # (a bounded k×dim table, trained once per input snapshot and
        # memoized), shipped as a LocalRelation + broadcast
        codebook = _trained_codebook_cached(spark, sf_dir, IVF_TRAIN_ITERS)
        cent_plain = _codebook_values_df(spark, codebook)
    else:
        # seed-rule codebook (untrained stand-in; kept as the cheap twin)
        cent_plain = e.where(F.col("vec_id") % 64 == 1).select(
            F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
        )
    # keep the broadcast hint OFF the plan we .collect() (a hinted
    # non-join plan logs HintErrorLogger warnings); hint only the copy
    # that actually joins
    cent = F.broadcast(cent_plain)
    if vectorized_assign:
        # the quantizer is a small bounded table (a trained k-means
        # codebook at production scale) — score in Arrow. In the
        # trained branch the codebook list is already driver-side
        # (repr literals round-trip IEEE-754, so re-collecting the
        # VALUES plan would yield the identical rows — skip the job).
        if trained:
            cent_rows = [(cid, list(vec)) for cid, vec in codebook]
        else:
            cent_rows = [
                (r["centroid_id"], list(r["cv"])) for r in cent_plain.collect()
            ]
        assign = _assign_centroids_arrow(e, cent_rows)
    else:
        # relational twin: assignment via max_by aggregation, not a
        # window sort — map-side combinable, shuffle carries one row per
        # vector, never the (vector × centroid) cross product. Tie order
        # pinned via the (score, -centroid_id) struct.
        assign = (
            e.crossJoin(cent)
            .withColumn("acos", _cos(F.col("v"), F.col("cv")))
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "centroid_id",
                    F.struct(F.col("acos"), (-F.col("centroid_id")).alias("nid")),
                ).alias("centroid_id"),
                F.first("v").alias("v"),
            )
            .select("vec_id", "v", "centroid_id")
        )
    # probes: NPROBE nearest centroids per query vector
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("pcos"), F.asc("centroid_id"))
    probes = (
        q.crossJoin(cent)
        .withColumn("pcos", _cos(F.col("qv"), F.col("cv")))
        .withColumn("rn", F.row_number().over(wp))
        .where(f"rn <= {nprobe}")
        .select("query_id", "qv", "centroid_id")
    )
    # inverted-list candidates: equi-join on centroid_id, exact rerank.
    # Rank via the two-phase local-then-merge top-k — a hot inverted
    # list (skewed quantizer cell) never lands in one ranking task.
    from ocr_lib_spark.operators.similarity import _topk_two_phase

    cand = (
        probes.join(assign, "centroid_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos(F.col("qv"), F.col("v")).alias("cosine"),
        )
    )
    return _topk_two_phase(cand, IVF_K).select(
        "query_id",
        F.col("rank").cast("int").alias("rank"),
        "neighbor_id",
        F.round("cosine", 6).alias("cosine_r6"),
    )


_DD_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)

_O_IVF = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 64 = 1),
assign AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_DD_COS.format(a="e.v", b="cent.cv")} DESC, cent.centroid_id) AS rn
    FROM e CROSS JOIN cent) WHERE rn = 1),
probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT e.vec_id AS query_id, e.v AS qv, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_DD_COS.format(a="e.v", b="cent.cv")} DESC, cent.centroid_id) AS rn
    FROM e CROSS JOIN cent WHERE e.vec_id < {N_QUERIES}) WHERE rn <= {IVF_NPROBE}),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_DD_COS.format(a="p.qv", b="a.v")} AS cosine
  FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(cosine, 6) AS cosine_r6
FROM (SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS rank
      FROM cand)
WHERE rank <= {IVF_K}
"""


# --- IVF codebook training: one distributed Lloyd step -----------------------
# The index-BUILDING path production ANN needs (ivf_topk consumes a
# trained codebook; this is how it trains at corpus scale): assign every
# vector to its nearest current centroid (broadcast codebook, one pass),
# then reduce per-(centroid, dim) sufficient statistics of the new
# means. Statistics are emitted as INTEGER-SCALED sums + counts — each
# element is floor(v*1e6) BEFORE summation, so the sum is
# order-independent and bit-identical across engines, partitionings and
# cluster sizes (float sums are not: summation order drifts ulps). The
# new mean is sum_scaled/(n*1e6) downstream; iterate to convergence.

TRAIN_SCALE = 1_000_000


def _ivf_train_step(spark, sf_dir):
    """One distributed Lloyd step off the seed-rule codebook, via the
    fused Arrow assignment+partial-stats kernel (see ``_lloyd_stats``).
    The previous relational shape (crossJoin + max_by assignment, then
    posexplode + groupBy over n x dim element rows) computes the same
    values — the Arrow kernel's pinned fold order and (cos DESC, cid
    ASC) argmax are the documented bit-identity contract with the
    max_by(struct(acos, -cid)) twin — but shuffled the whole exploded
    corpus where the kernel ships bounded codebook-sized partials."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return _lloyd_stats(e, _seed_codebook(e))


_O_IVF_TRAIN = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 64 = 1),
assign AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, cent.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_DD_COS.format(a="e.v", b="cent.cv")} DESC, cent.centroid_id) AS rn
    FROM e CROSS JOIN cent) WHERE rn = 1),
ex AS (
  SELECT a.centroid_id, d.i::INT AS dim,
         FLOOR(a.v[d.i + 1] * {TRAIN_SCALE})::BIGINT AS scaled
  FROM assign a CROSS JOIN (SELECT unnest(range(len((SELECT v FROM e LIMIT 1)))) AS i) d)
SELECT centroid_id, dim, SUM(scaled)::BIGINT AS sum_scaled, COUNT(*)::BIGINT AS n
FROM ex GROUP BY centroid_id, dim
"""


# --- full k-means training loop + trained-codebook IVF search ----------------
# Round 4 (VERDICT item #5): iterate the Lloyd step to a FIXED number of
# iterations and feed the trained codebook into ivf_topk, replacing the
# vec_id % 64 seed-rule stand-in. Between iterations the codebook (a
# bounded k×dim table — the one legitimately driver-sized object in the
# ANN path) is collected and re-broadcast; all per-vector work stays
# distributed. Determinism across engines:
#   * per-(centroid, dim) statistics are integer-scaled sums
#     (floor(v*1e6) summed as BIGINT — order-independent),
#   * the new mean is sum_scaled / (n * 1e6): both operands are exactly
#     representable doubles (< 2^53), so the correctly-rounded IEEE
#     quotient is bit-identical in Python, Spark, and DuckDB,
#   * assignment cosine uses the pinned sequential fold order
#     (_assign_centroids_arrow contract), tie-break (cos DESC, cid ASC),
#   * a centroid that loses all members simply drops out of the next
#     round's codebook in BOTH engines (no rows -> no centroid).
# A fixed iteration count (not an epsilon test) keeps the DuckDB twin
# expressible as an unrolled CTE chain.

IVF_TRAIN_ITERS = 3


def _lloyd_stats(e, cent_rows):
    """One Lloyd step given a driver-side codebook: the fused Arrow
    assignment+partial-stats kernel (``_lloyd_partial_stats_arrow``),
    then one tiny groupBy over (tasks x k x dim) partial rows. The
    previous shape (per-row assignment -> posexplode -> groupBy)
    shuffled n x dim element rows; the fused kernel shuffles bounded
    codebook-sized partials — same integer-exact sums."""
    part = _lloyd_partial_stats_arrow(e, cent_rows)
    return (
        part.groupBy("centroid_id", "dim")
        .agg(
            F.sum("sum_scaled").cast("long").alias("sum_scaled"),
            F.sum("n").cast("long").alias("n"),
        )
        .select("centroid_id", "dim", "sum_scaled", "n")
    )


def _rebuild_codebook(stat_rows):
    """stats rows -> [(centroid_id, mean_vector)] with the exact
    sum_scaled/(n*SCALE) division both engines reproduce."""
    by_cid: dict[int, dict[int, float]] = {}
    for r in stat_rows:
        by_cid.setdefault(r["centroid_id"], {})[r["dim"]] = r["sum_scaled"] / (
            r["n"] * TRAIN_SCALE
        )
    return sorted(
        (cid, [dims[d] for d in sorted(dims)]) for cid, dims in by_cid.items()
    )


def _seed_codebook(e):
    rows = (
        e.where(F.col("vec_id") % 64 == 1)
        .select(F.col("vec_id").alias("centroid_id"), "v")
        .collect()
    )
    return sorted((r["centroid_id"], list(r["v"])) for r in rows)


def _train_codebook(e, iters: int):
    """Run ``iters`` Lloyd iterations; returns (codebook, last_stats_df).
    The collect between rounds is the k×dim codebook only — never
    per-vector data."""
    cent_rows = _seed_codebook(e)
    stats = None
    for it in range(iters):
        stats = _lloyd_stats(e, cent_rows)
        if it == iters - 1:
            # truncate the final iteration's lineage so the codebook
            # collect below AND the caller's materialization of the
            # returned frame share ONE assignment job (without this the
            # most expensive iteration runs twice)
            stats = stats.localCheckpoint(eager=False)
        cent_rows = _rebuild_codebook(stats.collect())
    return cent_rows, stats


#: trained-codebook memo, keyed by (content-addressed input snapshot,
#: iters) — train once, search many (the production relationship
#: between ivf_train_loop and ivf_topk_trained). Bounded: one k×dim
#: float list per distinct input snapshot per session.
_CODEBOOK_MEMO: dict = {}


def _trained_codebook_cached(spark, sf_dir, iters: int):
    from ocr_lib_spark.sources.lineage import parquet_snapshot_id

    key = (parquet_snapshot_id(f"{sf_dir}"), iters)
    if key not in _CODEBOOK_MEMO:
        e = _emb(spark, sf_dir).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        _CODEBOOK_MEMO[key] = _train_codebook(e, iters)[0]
    return _CODEBOOK_MEMO[key]


def _ivf_train_loop(spark, sf_dir):
    from ocr_lib_spark.sources.lineage import parquet_snapshot_id

    e = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    codebook, stats = _train_codebook(e, IVF_TRAIN_ITERS)
    # seed the train-once/search-many memo (ivf_topk_trained consumes it)
    _CODEBOOK_MEMO[(parquet_snapshot_id(sf_dir), IVF_TRAIN_ITERS)] = codebook
    return stats


def _train_cte_chain(iters: int) -> str:
    """Unrolled DuckDB twin of the training loop: cent0 = seed rule,
    then assign{i} -> stats{i} -> cent{i} per iteration."""
    sql = (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),\n"
        "cent0 AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id % 64 = 1)"
    )
    for i in range(1, iters + 1):
        sql += f""",
assign{i} AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_DD_COS.format(a="e.v", b="c.cv")} DESC, c.centroid_id) AS rn
    FROM e CROSS JOIN cent{i - 1} c) WHERE rn = 1),
stats{i} AS (
  SELECT a.centroid_id, d.i::INT AS dim,
         SUM(FLOOR(a.v[d.i + 1] * {TRAIN_SCALE})::BIGINT)::BIGINT AS sum_scaled,
         COUNT(*)::BIGINT AS n
  FROM assign{i} a
  CROSS JOIN (SELECT unnest(range(len((SELECT v FROM e LIMIT 1)))) AS i) d
  GROUP BY a.centroid_id, d.i),
cent{i} AS (
  SELECT centroid_id,
         list(sum_scaled::DOUBLE / (n::DOUBLE * {TRAIN_SCALE}) ORDER BY dim) AS cv
  FROM stats{i} GROUP BY centroid_id)"""
    return sql


_O_IVF_TRAIN_LOOP = (
    _train_cte_chain(IVF_TRAIN_ITERS)
    + f"\nSELECT centroid_id, dim, sum_scaled, n FROM stats{IVF_TRAIN_ITERS}"
)


def _ivf_search_sql(cent: str) -> str:
    """Probe/assign/rerank tail of the IVF oracle against centroid CTE
    ``cent`` (shared by the seed-rule and trained-codebook twins)."""
    return f""",
s_assign AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_DD_COS.format(a="e.v", b="c.cv")} DESC, c.centroid_id) AS rn
    FROM e CROSS JOIN {cent} c) WHERE rn = 1),
s_probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT e.vec_id AS query_id, e.v AS qv, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_DD_COS.format(a="e.v", b="c.cv")} DESC, c.centroid_id) AS rn
    FROM e CROSS JOIN {cent} c WHERE e.vec_id < {N_QUERIES}) WHERE rn <= {IVF_NPROBE}),
s_cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         {_DD_COS.format(a="p.qv", b="a.v")} AS cosine
  FROM s_probes p JOIN s_assign a ON a.centroid_id = p.centroid_id
  WHERE a.vec_id <> p.query_id)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(cosine, 6) AS cosine_r6
FROM (SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS rank
      FROM s_cand)
WHERE rank <= {IVF_K}"""


_O_IVF_TRAINED = _train_cte_chain(IVF_TRAIN_ITERS) + _ivf_search_sql(
    f"cent{IVF_TRAIN_ITERS}"
)


# --- gated IVF retrieval quality (VERDICT r05 item 5) -------------------------
# ivf_topk/_trained are exactness-gated against their own plans; the
# REASON to train a codebook is recall vs brute force. This query puts
# the recall table (previously BENCH/BASELINE.md evidence only,
# tools/ivf_recall.py) under the external gate: n_hit is computed
# EXACTLY in both engines (pair-set intersection with the brute-force
# truth), and recall_within_bounds is pinned TRUE by the oracle, so a
# codebook/quantizer regression that drops recall below the floor fails
# CORRECTNESS, not just a doc table.

#: recall_ppm floors, keyed by (variant, nprobe). Measured tri-scale
#: (sf0.001 / 0.01 / 0.1, 2026-08-17):
#:   seed@2    550000 / 500000 / 350000
#:   seed@4    825000 / 625000 / 550000
#:   trained@2 600000 / 525000 / 375000
#:   trained@4 775000 / 850000 / 525000
#: floor = observed minimum - 50_000 ppm (= 2 truth neighbors on the
#: 40-pair fixture): a regression that loses 3+ neighbors below the
#: worst observed scale fails the external gate. (trained@4 is NOT
#: uniformly >= seed@4 across scales — sf0.001/0.1 flip it — so no
#: cross-variant ordering is pinned, only per-variant floors.)
IVF_RECALL_FLOOR_PPM: dict = {
    ("seed", 2): 300_000,
    ("seed", 4): 500_000,
    ("trained", 2): 325_000,
    ("trained", 4): 475_000,
}


def _recall_variants():
    return (
        ("seed", False, IVF_NPROBE),
        ("seed", False, 4),
        ("trained", True, IVF_NPROBE),
        ("trained", True, 4),
    )


def _ivf_recall(spark, sf_dir):
    """Recall table for the four (codebook, nprobe) variants. The two
    nprobe settings of one codebook share the SAME nearest-centroid
    assignment of the corpus and the SAME probe ranking (nprobe only
    truncates the rank list), so each is computed once per codebook
    (lazy localCheckpoint) instead of once per variant — the r9 profile
    showed four full Arrow assignment passes where two suffice. Values
    are identical by construction: the nprobe=2 candidate set is the
    rn<=2 prefix of the shared rn<=4 ranking."""
    from pyspark.sql import Window

    from ocr_lib_spark.operators.similarity import _topk_two_phase

    e = _emb(spark, sf_dir)
    truth = (
        brute_force_topk(e, e.where(F.col("vec_id") < N_QUERIES), k=IVF_K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    ev = _emb(spark, sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = ev.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    variants = _recall_variants()
    got_by_variant: dict = {}
    for trained in (False, True):
        nprobes = [np for _, tr, np in variants if tr == trained]
        vname = next(v for v, tr, _ in variants if tr == trained)
        if trained:
            codebook = _trained_codebook_cached(spark, sf_dir, IVF_TRAIN_ITERS)
            cent_rows = [(cid, list(vec)) for cid, vec in codebook]
        else:
            cent_plain = ev.where(F.col("vec_id") % 64 == 1).select(
                F.col("vec_id").alias("centroid_id"), F.col("v").alias("cv")
            )
            cent_rows = [
                (r["centroid_id"], list(r["cv"])) for r in cent_plain.collect()
            ]
        # the literal codebook round-trips IEEE-754 (repr doubles), so
        # joining against the VALUES frame is bit-identical to joining
        # the scan-side centroid rows (_codebook_values_df contract)
        cent = F.broadcast(_codebook_values_df(spark, cent_rows))
        assign = _assign_centroids_arrow(ev, cent_rows).localCheckpoint(eager=False)
        wp = Window.partitionBy("query_id").orderBy(
            F.desc("pcos"), F.asc("centroid_id")
        )
        probes_all = (
            q.crossJoin(cent)
            .withColumn("pcos", _cos(F.col("qv"), F.col("cv")))
            .withColumn("rn", F.row_number().over(wp))
            .where(F.col("rn") <= max(nprobes))
            .select("query_id", "qv", "centroid_id", "rn")
        )
        # candidate join + cosine rerank scoring runs ONCE per codebook
        # at max(nprobe), with the probe rank carried through: a
        # (query, neighbor) pair reaches the candidate set via exactly
        # one centroid (assignment is unique), so each pair has one rn
        # and the nprobe=2 candidate set is exactly the rn<=2 subset —
        # the smaller variant's scoring pass is a filter, not a second
        # join (previously: join + cosine per VARIANT, 4 passes).
        cand_all = (
            probes_all.join(assign, "centroid_id")
            .where(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                "rn",
                F.col("vec_id").alias("neighbor_id"),
                _cos(F.col("qv"), F.col("v")).alias("cosine"),
            )
            .localCheckpoint(eager=False)
        )
        for nprobe in nprobes:
            got_by_variant[(vname, nprobe)] = _topk_two_phase(
                cand_all.where(F.col("rn") <= nprobe).drop("rn"), IVF_K
            ).select("query_id", "neighbor_id")
    # one summary aggregation instead of four (agg + crossJoin + agg)
    # chains: tag each variant's truth-hit rows with its (variant,
    # nprobe) literals, union, count by tag, and left-join onto the
    # 4-row variants literal so a zero-hit variant still yields its row.
    hits = None
    for variant, trained, nprobe in variants:
        h = truth.join(
            got_by_variant[(variant, nprobe)],
            ["query_id", "neighbor_id"],
            "left_semi",
        ).select(
            F.lit(variant).alias("variant"),
            F.lit(nprobe).cast("int").alias("nprobe"),
        )
        hits = h if hits is None else hits.unionAll(h)
    hit_counts = hits.groupBy("variant", "nprobe").agg(
        F.count("*").alias("n_hit_nn")
    )
    vdf = spark.createDataFrame(
        [(v, np, IVF_RECALL_FLOOR_PPM.get((v, np), 0)) for v, _, np in variants],
        "variant string, nprobe int, floor_ppm bigint",
    )
    return (
        vdf.join(hit_counts, ["variant", "nprobe"], "left")
        .crossJoin(truth.agg(F.count("*").alias("n_truth")))
        .select(
            "variant",
            "nprobe",
            "n_truth",
            F.coalesce("n_hit_nn", F.lit(0)).cast("long").alias("n_hit"),
            F.expr(
                "coalesce(n_hit_nn, 0L) * 1000000 DIV n_truth"
            ).alias("recall_ppm"),
            (
                F.expr("coalesce(n_hit_nn, 0L) * 1000000 DIV n_truth")
                >= F.col("floor_ppm")
            ).alias("recall_within_bounds"),
        )
    )


def _search_pairs_cte(cent: str, nprobe: int, tag: str) -> str:
    """Top-IVF_K (query_id, neighbor_id) pairs for codebook CTE ``cent``
    at ``nprobe``, as a CTE named ``{tag}_pairs`` (composable variant of
    _ivf_search_sql for multi-codebook statements)."""
    return f""",
{tag}_assign AS (
  SELECT vec_id, v, centroid_id FROM (
    SELECT e.vec_id, e.v, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_DD_COS.format(a="e.v", b="c.cv")} DESC, c.centroid_id) AS rn
    FROM e CROSS JOIN {cent} c) WHERE rn = 1),
{tag}_probes AS (
  SELECT query_id, qv, centroid_id FROM (
    SELECT e.vec_id AS query_id, e.v AS qv, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
             ORDER BY {_DD_COS.format(a="e.v", b="c.cv")} DESC, c.centroid_id) AS rn
    FROM e CROSS JOIN {cent} c WHERE e.vec_id < {N_QUERIES}) WHERE rn <= {nprobe}),
{tag}_pairs AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cosine DESC, neighbor_id) AS rank
    FROM (SELECT p.query_id, a.vec_id AS neighbor_id,
                 {_DD_COS.format(a="p.qv", b="a.v")} AS cosine
          FROM {tag}_probes p JOIN {tag}_assign a ON a.centroid_id = p.centroid_id
          WHERE a.vec_id <> p.query_id))
  WHERE rank <= {IVF_K})"""


def _ivf_recall_oracle() -> str:
    sql = _train_cte_chain(IVF_TRAIN_ITERS)
    sql += f""",
truth AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
             ORDER BY {_DD_COS.format(a="q.v", b="c.v")} DESC, c.vec_id) AS rank
    FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id)
  WHERE rank <= {IVF_K})"""
    selects = []
    for variant, trained, nprobe in _recall_variants():
        cent = f"cent{IVF_TRAIN_ITERS}" if trained else "cent0"
        tag = f"{variant}{nprobe}"
        sql += _search_pairs_cte(cent, nprobe, tag)
        selects.append(
            f"""SELECT '{variant}' AS variant, {nprobe}::INT AS nprobe,
       (SELECT COUNT(*) FROM truth)::BIGINT AS n_truth,
       (SELECT COUNT(*) FROM (SELECT * FROM {tag}_pairs INTERSECT SELECT * FROM truth))::BIGINT AS n_hit,
       ((SELECT COUNT(*) FROM (SELECT * FROM {tag}_pairs INTERSECT SELECT * FROM truth))::BIGINT * 1000000
          // (SELECT COUNT(*) FROM truth)::BIGINT)::BIGINT AS recall_ppm,
       TRUE AS recall_within_bounds"""
        )
    return sql + "\n" + "\nUNION ALL\n".join(selects)


# --- int8 symmetric quantization (embedding storage/IO compression) ---------
# At 100 TB the embedding column dominates storage and shuffle width:
# int8 quantization cuts it 4-8x before ANN indexing. The contract is
# integer-exact end-to-end so a DuckDB oracle pins every code: elements
# enter fixed point as floor(v * 1e6) (TRAIN_SCALE, the k-means
# convention), the per-vector scale is max|vi|, codes are
# q = sign(vi) * ((|vi| * 127) DIV max|vi|) in [-127, 127] — sign-split
# so only NON-NEGATIVE integer division runs on either engine (Spark
# DIV and DuckDB // both truncate toward zero, but why rely on it) —
# and the per-vector summary pins the whole code vector through a
# position-weighted linear checksum (sum (dim+1)*q) plus reconstruction
# error stats, all scalars.

QUANT_LEVELS = 127


def _q_embedding_quantize(spark, sf_dir):
    """Per-vector int8 quantization summary. Scale shape: posexplode ->
    ONE combinable groupBy for the scale -> equi-join back on vec_id
    (64 rows per key, skew-free by construction) -> ONE combinable
    groupBy for the summary. No window, no collect, no UDF."""
    e = _emb(spark, sf_dir).select(
        "vec_id", F.posexplode("embedding").alias("dim0", "val")
    )
    vi = e.select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("val").cast("double") * TRAIN_SCALE).cast("long").alias("vi"),
    ).localCheckpoint(eager=False)
    scale = vi.groupBy("vec_id").agg(F.max(F.abs("vi")).cast("long").alias("maxabs"))
    q = vi.join(scale, "vec_id").select(
        "vec_id",
        "dim",
        "vi",
        "maxabs",
        F.when(F.col("maxabs") == 0, F.lit(0))
        .otherwise(
            F.signum("vi").cast("long")
            * F.expr(f"(abs(vi) * {QUANT_LEVELS}) DIV maxabs")
        )
        .cast("long")
        .alias("q"),
    )
    recon = F.when(F.col("maxabs") == 0, F.lit(0)).otherwise(
        F.signum("q").cast("long")
        * F.expr(f"(abs(q) * maxabs) DIV {QUANT_LEVELS}")
    )
    return (
        q.withColumn("err", F.abs(F.col("vi") - recon))
        .groupBy("vec_id")
        .agg(
            F.max("maxabs").cast("long").alias("maxabs"),
            F.min("q").cast("long").alias("q_min"),
            F.max("q").cast("long").alias("q_max"),
            F.sum(F.col("dim") * F.col("q")).cast("long").alias("q_dot"),
            F.sum((F.abs("q") == QUANT_LEVELS).cast("int"))
            .cast("long")
            .alias("n_saturated"),
            F.sum("err").cast("long").alias("err_sum"),
            F.max("err").cast("long").alias("err_max"),
        )
    )


_O_QUANT = f"""
WITH vi AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         floor(unnest(embedding::DOUBLE[]) * {TRAIN_SCALE})::BIGINT AS vi
  FROM embeddings),
s AS (SELECT vec_id, MAX(abs(vi))::BIGINT AS maxabs FROM vi GROUP BY vec_id),
q AS (
  SELECT vi.vec_id, dim, vi, maxabs,
         CASE WHEN maxabs = 0 THEN 0
              ELSE sign(vi)::BIGINT * ((abs(vi) * {QUANT_LEVELS}) // maxabs)
         END::BIGINT AS q
  FROM vi JOIN s ON vi.vec_id = s.vec_id),
e AS (
  SELECT *, abs(vi - CASE WHEN maxabs = 0 THEN 0
                          ELSE sign(q)::BIGINT * ((abs(q) * maxabs) // {QUANT_LEVELS})
                     END) AS err
  FROM q)
SELECT vec_id, MAX(maxabs)::BIGINT AS maxabs,
       MIN(q)::BIGINT AS q_min, MAX(q)::BIGINT AS q_max,
       SUM(dim * q)::BIGINT AS q_dot,
       SUM((abs(q) = {QUANT_LEVELS})::INT)::BIGINT AS n_saturated,
       SUM(err)::BIGINT AS err_sum, MAX(err)::BIGINT AS err_max
FROM e GROUP BY vec_id
"""


QUERIES = {
    "cosine_topk": QueryDef(_cosine_topk, _O_COSINE, "exact brute-force cosine top-k (broadcast argmax)"),
    "embedding_quantize": QueryDef(
        _q_embedding_quantize,
        _O_QUANT,
        "int8 symmetric embedding quantization, integer-exact codes + reconstruction-error summary",
    ),
    "ivf_topk": QueryDef(_ivf_topk, _O_IVF, "IVF ANN: coarse quantize -> inverted-list join -> exact rerank"),
    "ivf_train_loop": QueryDef(
        lambda spark, sf_dir: _ivf_train_loop(spark, sf_dir),
        _O_IVF_TRAIN_LOOP,
        f"{IVF_TRAIN_ITERS}-iteration distributed k-means (integer-scaled stats; unrolled CTE oracle)",
    ),
    "ivf_topk_trained": QueryDef(
        lambda spark, sf_dir: _ivf_topk(spark, sf_dir, trained=True),
        _O_IVF_TRAINED,
        "IVF ANN over the TRAINED codebook (k-means output as LocalRelation broadcast)",
    ),
    "ivf_train_step": QueryDef(
        _ivf_train_step,
        _O_IVF_TRAIN,
        "one distributed Lloyd step: assign + integer-scaled per-(centroid,dim) mean statistics",
    ),
    "ivf_recall": QueryDef(
        _ivf_recall,
        _ivf_recall_oracle(),
        "recall@k vs brute force for seed/trained codebooks at nprobe 2 and 4; floors oracle-pinned",
    ),
    "ann_lsh_buckets": QueryDef(_lsh_buckets, _O_LSH_BUCKETS, "sign-bucket LSH histogram (ANN scale path)"),
    "knn_label_vote": QueryDef(_knn_vote, _O_KNN, "kNN majority-vote classification, pinned ties"),
    "embedding_near_dup": QueryDef(_near_dup, _O_NEAR_DUP, "LSH-bucketed cosine near-dup (bucket prune + exact verify)"),
}
