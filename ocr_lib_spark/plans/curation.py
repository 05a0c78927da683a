"""Corpus-curation planning queries (round 6): n-gram novelty,
mix rebalancing, quality curriculum.

The steps a pretraining-data pipeline runs AFTER cleaning and BEFORE
packing: how much of each document is new to the corpus (novelty),
what per-source sampling rates hit a target mix (rebalance), and how
documents stratify into quality deciles for curriculum ordering. All
integer-exact (ppm floor division, md5-prefix hashing, histogram-based
order statistics) per the repo determinism contract; every query has a
bit-exact DuckDB twin.

Scale notes are per query; the common discipline: shuffles keyed on
well-distributed hashes, dimension tables broadcast, and the one
ordered scan (the decile histogram) bounded by CONSTRUCTION at
score-domain size, never corpus size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_lib_spark.plans import QueryDef, load

#: word-K-gram window shared with the decontamination gate
#: (plans/textops.py DECON_K) — same definition of "an n-gram"
NOVELTY_K = 8

#: ppm resolution shared by every rate/score in this module
_PPM = 1_000_000


def _docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def _gram_hash_pairs(d):
    """Distinct (doc_id, gram_hash) pairs over word NOVELTY_K-grams.

    Grams are hashed to 60-bit ints with the repo's md5-prefix twin
    BEFORE the shuffle: at corpus scale the shuffle carries 8 bytes per
    gram instead of the ~50-byte gram string. Both engines apply the
    SAME hash, so a (astronomically unlikely) 60-bit collision merges
    the same two grams on both sides — cross-engine exactness is
    unconditional; novelty itself degrades by at most the collision
    count."""
    toks = F.split(F.trim("text"), " ")
    grams = F.expr(
        f"CASE WHEN size(t) >= {NOVELTY_K} THEN "
        f"transform(sequence(0, cast(size(t) as int) - {NOVELTY_K}), "
        f"i -> concat_ws(' ', slice(t, i + 1, {NOVELTY_K}))) "
        f"ELSE cast(array() as array<string>) END"
    )
    return (
        d.select("doc_id", toks.alias("t"))
        .select("doc_id", F.explode(grams).alias("g"))
        .select(
            "doc_id",
            F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long").alias("gh"),
        )
        .distinct()
    )


def _q_ngram_novelty(spark, sf_dir):
    """Per-document novelty vs the corpus: of a doc's distinct word
    8-grams, how many FIRST appear in this doc (corpus-wide minimum
    doc_id owns the gram — the deterministic arrival order a dated
    crawl has). The novelty curve is the standard dedup-adjacent signal
    for crawl snapshots: a doc whose grams all appeared earlier is a
    re-crawl even when no single near-dup pair fires.

    Shape: distinct (doc, gram-hash) pairs -> groupBy(gh).min(doc_id)
    -> hash join back on gh (both sides partitioned by the same key
    from the same exchange — exchange reuse, no second scan) ->
    groupBy(doc). Two gram-keyed shuffles, both map-side combinable,
    keys md5-uniform (no skew); docs with < K tokens surface with
    zeros via the left join from the doc scan."""
    d = _docs(spark, sf_dir)
    pairs = _gram_hash_pairs(d).localCheckpoint(eager=False)
    firsts = pairs.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        pairs.join(firsts, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams_distinct"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_first_here"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams_distinct", F.lit(0)).cast("long").alias(
                "n_grams_distinct"
            ),
            F.coalesce("n_first_here", F.lit(0)).cast("long").alias("n_first_here"),
            F.when(
                F.coalesce("n_grams_distinct", F.lit(0)) > 0,
                F.expr(f"n_first_here * {_PPM} DIV n_grams_distinct"),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("novelty_ppm"),
        )
    )


_O_NGRAM_NOVELTY = f"""
WITH t AS (
  SELECT doc_id, string_split(trim(text), ' ') AS t FROM documents),
pairs AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(unnest(list_transform(range(len(t) - {NOVELTY_K} + 1),
                i -> array_to_string(list_slice(t, i + 1, i + {NOVELTY_K}), ' ')))), 1, 15))::BIGINT AS gh
  FROM t WHERE len(t) >= {NOVELTY_K}),
firsts AS (SELECT gh, MIN(doc_id) AS first_doc FROM pairs GROUP BY gh),
per_doc AS (
  SELECT p.doc_id,
         COUNT(*)::BIGINT AS n_grams_distinct,
         SUM(CASE WHEN f.first_doc = p.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_first_here
  FROM pairs p JOIN firsts f ON p.gh = f.gh
  GROUP BY p.doc_id)
SELECT d.doc_id,
       COALESCE(n_grams_distinct, 0)::BIGINT AS n_grams_distinct,
       COALESCE(n_first_here, 0)::BIGINT AS n_first_here,
       CASE WHEN COALESCE(n_grams_distinct, 0) > 0
            THEN (n_first_here * {_PPM}) // n_grams_distinct
            ELSE 0 END::BIGINT AS novelty_ppm
FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""


def _q_mix_rebalance(spark, sf_dir):
    """Source-mix rebalancing plan + deterministic application: compute
    per-source sampling rates that equalize the mix at the largest
    uniform size the smallest source supports (keep_n = min stratum
    size for every source), then APPLY the rate with the content-hash
    rule (md5-prefix bucket < rate_ppm — the stratified_sample
    primitive), reporting how many docs each source actually keeps.
    Deterministic across engines, runs, and cluster sizes: no RNG.

    Shape: one groupBy(source) for the census; the 20-row rate table
    broadcast-joins back onto the scan; one more groupBy(source) for
    the applied counts. n_kept tracks rate_ppm * n_docs only in
    expectation (the hash is uniform, not stratified-exact) — both
    numbers are emitted so the plan/apply gap is visible."""
    d = _docs(spark, sf_dir).select(
        "source",
        (F.conv(F.substring(F.md5("text"), 1, 15), 16, 10).cast("long") % _PPM).alias(
            "h"
        ),
    )
    census = d.groupBy("source").agg(F.count("*").cast("long").alias("n_docs"))
    rates = census.crossJoin(
        census.agg(F.min("n_docs").alias("keep_n"))
    ).select(
        "source",
        "n_docs",
        F.col("keep_n").cast("long").alias("keep_n"),
        F.expr(f"keep_n * {_PPM} DIV n_docs").cast("long").alias("rate_ppm"),
    )
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.first("keep_n").alias("keep_n"),
            F.first("rate_ppm").alias("rate_ppm"),
            F.sum(F.when(F.col("h") < F.col("rate_ppm"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
        )
    )


_O_MIX_REBALANCE = f"""
WITH d AS (
  SELECT source, ('0x' || substr(md5(text), 1, 15))::BIGINT % {_PPM} AS h
  FROM documents),
census AS (SELECT source, COUNT(*)::BIGINT AS n_docs FROM d GROUP BY source),
rates AS (
  SELECT source, n_docs,
         (SELECT MIN(n_docs) FROM census)::BIGINT AS keep_n,
         ((SELECT MIN(n_docs) FROM census) * {_PPM} // n_docs)::BIGINT AS rate_ppm
  FROM census)
SELECT r.source, r.n_docs, r.keep_n, r.rate_ppm,
       SUM(CASE WHEN d.h < r.rate_ppm THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM d JOIN rates r ON d.source = r.source
GROUP BY r.source, r.n_docs, r.keep_n, r.rate_ppm
"""

#: curriculum decile count
_N_BUCKETS = 10


def _q_quality_curriculum(spark, sf_dir):
    """Quality-decile curriculum: stratify documents by an integer
    lexical-diversity score (distinct tokens per token, ppm) into 10
    buckets cut at exact order statistics, and report each bucket's
    census — the ordering step of curriculum training (low-diversity
    boilerplate early / high-diversity text late, or the reverse).

    Exactness: cut k (k=1..9) is the score at 1-based rank
    ((N-1)*k)//10 + 1 under ORDER BY score — the repo's pinned
    no-interpolation percentile semantics. Bucket of a doc = number of
    cuts <= its score (ties collapse into one bucket deterministically
    on both engines).

    Scale shape: NO corpus-wide window/sort. The score domain is ppm
    integers — at most 1e6+1 distinct values REGARDLESS of corpus size —
    so cuts come from a cumulative walk over the score HISTOGRAM
    (groupBy score, map-side combinable; the single-task ordered walk
    is bounded by the domain, the same bounded-by-construction argument
    as percentile_pick's final stage). The 9 cuts collapse to one
    broadcast array row; bucketing is a pure map."""
    score = F.expr(
        "CASE WHEN n_tokens > 0 THEN "
        f"n_distinct * {_PPM} DIV n_tokens ELSE 0 END"
    )
    toks = F.split(F.trim("text"), " ")
    d = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        )
        .select("doc_id", score.cast("long").alias("score_ppm"))
        .localCheckpoint(eager=False)
    )
    hist = d.groupBy("score_ppm").agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    # ordered walk over the HISTOGRAM (<= 1e6+1 rows by construction)
    cum = hist.select(
        "score_ppm",
        F.sum("c").over(Window.orderBy("score_ppm")).alias("cum"),
    ).crossJoin(F.broadcast(hist.agg(F.sum("c").alias("n"))))
    ranks = spark.sql(
        "SELECT explode(sequence(1, {k})) AS k".format(k=_N_BUCKETS - 1)
    )
    cuts = (
        cum.crossJoin(F.broadcast(ranks))
        .where(F.col("cum") >= F.expr(f"(n - 1) * k DIV {_N_BUCKETS} + 1"))
        .groupBy("k")
        .agg(F.min("score_ppm").alias("cut"))
        .agg(F.sort_array(F.collect_list("cut")).alias("cuts"))
    )
    bucketed = d.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "score_ppm",
        F.expr("size(filter(cuts, c -> c <= score_ppm))").cast("int").alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("score_ppm").cast("long").alias("min_score"),
        F.max("score_ppm").cast("long").alias("max_score"),
    )


_O_QUALITY_CURRICULUM = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN len(string_split(trim(text), ' ')) > 0
              THEN (len(list_distinct(string_split(trim(text), ' '))) * {_PPM})
                   // len(string_split(trim(text), ' '))
              ELSE 0 END::BIGINT AS score_ppm
  FROM documents),
hist AS (SELECT score_ppm, COUNT(*) AS c FROM d GROUP BY score_ppm),
cum AS (
  SELECT score_ppm,
         SUM(c) OVER (ORDER BY score_ppm) AS cum,
         SUM(c) OVER () AS n
  FROM hist),
cuts AS (
  SELECT k, MIN(score_ppm) AS cut
  FROM cum CROSS JOIN range(1, {_N_BUCKETS}) AS r(k)
  WHERE cum >= (n - 1) * k // {_N_BUCKETS} + 1
  GROUP BY k),
bucketed AS (
  SELECT doc_id, score_ppm,
         (SELECT COUNT(*) FROM cuts WHERE cut <= d.score_ppm)::INT AS bucket
  FROM d)
SELECT bucket, COUNT(*)::BIGINT AS n_docs,
       MIN(score_ppm)::BIGINT AS min_score,
       MAX(score_ppm)::BIGINT AS max_score
FROM bucketed GROUP BY bucket
"""


QUERIES = {
    "ngram_novelty": QueryDef(
        _q_ngram_novelty,
        _O_NGRAM_NOVELTY,
        "per-doc word-8-gram novelty vs corpus first-occurrence (crawl-snapshot dedup signal)",
    ),
    "mix_rebalance": QueryDef(
        _q_mix_rebalance,
        _O_MIX_REBALANCE,
        "per-source uniform-mix sampling rates + deterministic hash-rule application",
    ),
    "quality_curriculum": QueryDef(
        _q_quality_curriculum,
        _O_QUALITY_CURRICULUM,
        "exact quality-decile census via histogram order statistics (no global sort)",
    ),
}
