"""Deduplication operators for training-data pipelines.

The reference's collections are sets — every insert is an implicit
DISTINCT (SURVEY.md §2.3) and Jaccard |∩|/|∪| is its matching kernel
(check-matching-fn core.clj:1020-1069). These operators lift exactly
those primitives to corpus scale:

  exact_duplicates      hash-groupBy (one shuffle on the digest)
  ngram_jaccard         shingle-set Jaccard between candidate pairs
  minhash_signatures    k independent min-hashes over shingle sets
  lsh_candidate_pairs   banded LSH bucketing -> same-bucket pair join
  simhash64             bitwise majority fingerprint over token hashes
  embedding_near_dup    cosine-threshold near-dup over vector columns

Scale notes (100 TB): every operator shuffles once on a bounded-width
key (digest / band hash / bucket); candidate-pair joins never go
quadratic — LSH bands bound the comparison set, the exact-Jaccard
verifier runs only on candidates. AQE skew-join splits hot buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_lib_spark.functions.text import char_shingles, stable_hash64
from ocr_lib_spark.partitioning import spread_small


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content digest: one map-side-combinable groupBy.
    Returns one row per distinct content: (digest, n_docs, keep_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("keep_id"))
    )


def shingle_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    return df.select(F.col(id_col), char_shingles(F.col(text_col), k).alias("shingles"))


def ngram_jaccard_pairs(
    pairs: DataFrame, k: int = 5, left_text: str = "text_a", right_text: str = "text_b"
) -> DataFrame:
    """Exact shingle-set Jaccard for pre-selected candidate pairs —
    the verification stage after LSH candidate generation. Pure array
    functions (array_intersect/array_union = clojure.set intersection/
    union, SURVEY.md §2.6)."""
    a = char_shingles(F.col(left_text), k)
    b = char_shingles(F.col(right_text), k)
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return pairs.withColumn(
        "jaccard", (inter / F.greatest(union, F.lit(1))).cast("double")
    )


#: Affine minhash family constants (Kirsch-Mitzenmacher style): one
#: expensive base hash per shingle, n cheap affine recombinations
#: h_i = (A_i·x_lo + B_i·x_hi + C_i) mod P. Products stay < 2^60 so the
#: arithmetic is exact int64 in both Spark and the DuckDB oracle (which
#: errors on overflow — the constants are sized for that contract).
MINHASH_A = [788455883, 894818247, 153204545, 410930883, 511101823, 626284755, 969583393, 142946401]
MINHASH_B = [308201859, 587225963, 252971131, 931847323, 823367797, 676943273, 394840923, 556851369]
MINHASH_C = [601313247, 980529077, 140441297, 813843031, 434687933, 297594491, 722395633, 188136679]
MINHASH_P = (1 << 61) - 1  # Mersenne prime 2^61-1
_M30 = (1 << 30) - 1


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    k: int = 5,
    vectorized: bool = True,
    spread: bool = True,
) -> DataFrame:
    """k-min-hash signature per document.

    One md5-prefix base hash per shingle (cross-engine deterministic),
    then n_hashes affine recombinations over its 30-bit halves —
    8× fewer digest computations than hashing (shingle, i) pairs, same
    minhash guarantees (pairwise-independent family mod 2^61-1).

    Default path (``vectorized=True``): signatures computed per row in
    an Arrow-batched ``mapInPandas`` — ZERO shuffles (a signature needs
    only its own document) and measured 1.7× faster than the relational
    build. ``vectorized=False`` keeps the pure-Catalyst twin
    (explode → map-side-combinable min aggregate; one narrow shuffle of
    n_docs × n_hashes longs); both are bit-identical to the DuckDB
    oracle."""
    if n_hashes > len(MINHASH_A):
        raise ValueError(f"n_hashes > {len(MINHASH_A)} needs more family constants")
    if vectorized:
        return _minhash_vectorized(df, text_col, id_col, n_hashes, k, spread)
    # NULL-text docs are dropped (both paths): char_shingles(NULL) is
    # [NULL], which would otherwise survive as an all-NULL signature row
    sh = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(char_shingles(F.col(text_col), k)).alias("sh")
    )
    x = stable_hash64(F.col("sh"))
    x_lo = x.bitwiseAND(F.lit(_M30))
    x_hi = F.shiftright(x, 30)
    aggs = [
        F.min(
            (F.lit(MINHASH_A[i]) * x_lo + F.lit(MINHASH_B[i]) * x_hi + F.lit(MINHASH_C[i]))
            % F.lit(MINHASH_P)
        ).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def _md5_prefix60(s: str) -> int:
    """First 15 hex digits of md5 as int64 — identical to
    ``int(hexdigest()[:15], 16)`` and DuckDB's
    ``('0x'||substr(md5(x),1,15))::BIGINT``, but via the raw digest
    bytes (no hex-string round trip: measured ~2x on shingle workloads)."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big") >> 4


def _md5_prefix64(s: str) -> int:
    """First 64 bits of md5 as a SIGNED int64 (two's complement) — the
    full production hash width, with bit 63 (the int64 sign bit) live.
    DuckDB twin: 60-bit prefix + 16th-nibble recombination (a hex
    literal >= 2^63 can't cast to BIGINT directly; see
    ``_simhash_near_dup_oracle(n_bits=64)``)."""
    import hashlib

    v = int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def _minhash_vectorized(df, text_col, id_col, n_hashes, k, spread=True) -> DataFrame:
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from ocr_lib_spark.operators.shingling import batch_minhash

    A = np.array(MINHASH_A[:n_hashes], dtype=np.int64)
    B = np.array(MINHASH_B[:n_hashes], dtype=np.int64)
    C = np.array(MINHASH_C[:n_hashes], dtype=np.int64)

    def run(batches):
        for pdf in batches:
            # NULL-text docs are DROPPED, matching the relational twin
            # (explode of a null shingle array emits no row); empty-string
            # docs keep their single '' shingle in both paths.
            #
            # Shingling + batch-global dedup + per-doc minima run as
            # numpy over packed byte windows (operators/shingling.py);
            # each UNIQUE shingle is md5'd once per batch. Bit-identical
            # to the per-row Python-set path (min over a multiset == min
            # over its distinct values), ~3x faster per batch.
            col = pdf[text_col].astype(object)
            keep = np.fromiter(
                (isinstance(t, str) for t in col), dtype=bool, count=len(col)
            )
            texts = [t for t in col if isinstance(t, str)]
            mins = batch_minhash(texts, A, B, C, k, MINHASH_P, _M30)
            out = pd.DataFrame(
                mins, columns=[f"h{i}" for i in range(n_hashes)]
            )
            out.insert(0, id_col, pdf[id_col].values[keep])
            yield out

    id_field = df.schema[id_col]
    schema = T.StructType(
        [T.StructField(id_col, id_field.dataType)]
        + [T.StructField(f"h{i}", T.LongType()) for i in range(n_hashes)]
    )
    src = df.select(id_col, text_col)
    if spread:
        src = spread_small(src)
    return src.mapInPandas(run, schema=schema)


def lsh_band_table(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_rows: int = 2,
) -> DataFrame:
    """Unpivot minhash signatures into the banded-LSH shuffle table
    ``(id, band_idx, band_hash)`` — the shared front half of every LSH
    join shape (self-join in ``lsh_candidate_pairs``; asymmetric
    new-batch × old-corpus join in ``plans/curation.incremental_dedup``).

    Every band comes from ONE pass over the signatures (a per-band
    union would re-run the whole signature computation once per band —
    measured 16 shuffles vs 6 for the full candidate query)."""
    n_bands = n_hashes // band_rows
    band_structs = []
    for b in range(n_bands):
        cols = [F.col(f"h{b * band_rows + r}").cast("string") for r in range(band_rows)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_hash"),
            )
        )
    return signatures.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("band")
    ).select(
        id_col,
        F.col("band.band_idx").alias("band_idx"),
        F.col("band.band_hash").alias("band_hash"),
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 8,
    band_rows: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded LSH: docs sharing any band signature become a candidate
    pair. Shuffle key = (band_idx, band_hash); within-bucket self-join
    is bounded by bucket size (near-dup clusters), never corpus size.

    ``max_bucket_size`` drops hot buckets entirely — the standard
    corpus-scale skew control: a bucket holding B docs yields B²/2
    pairs, and template/boilerplate-driven mega-buckets (measured here:
    one bucket holding 57% of the corpus → 7M+ candidate pairs from a
    5000-doc table) are degenerate "everything matches" signals better
    handled by exact dedup upstream. Deterministic and reproduced
    exactly by the SQL oracle (a count over the bucket key)."""
    allb = lsh_band_table(signatures, id_col=id_col, n_hashes=n_hashes, band_rows=band_rows)
    if max_bucket_size is not None:
        # bucket sizes via groupBy + semi join, NOT a count-over-window:
        # a window partition materializes its whole bucket in one task,
        # and the very mega-buckets this cap exists to drop (57% of the
        # corpus in one bucket, measured) would blow that task up first.
        # groupBy partial-aggregates map-side; the semi join never
        # multiplies rows (heavy keys simply probe and drop). The
        # banding frame is lazily checkpointed first: the size agg, the
        # semi probe, and the downstream self-join sides all read the
        # materialized narrow blocks, so the signature UDF runs ONCE
        # (without it, the diverging exchanges defeat Spark's
        # exchange-reuse and the kernel runs per branch — measured 2x).
        # On a real cluster point sparkContext.setCheckpointDir at
        # durable storage and use .checkpoint() for executor-loss
        # resilience.
        allb = allb.localCheckpoint(eager=False)
        kept = (
            allb.groupBy("band_idx", "band_hash")
            .agg(F.count("*").alias("__bsz"))
            .where(F.col("__bsz") <= max_bucket_size)
            .select("band_idx", "band_hash")
        )
        allb = allb.join(kept, ["band_idx", "band_hash"], "left_semi")
    a = allb.alias("a")
    b_ = allb.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def simhash_bits(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_bits: int = 60,
    spread: bool = True,
) -> DataFrame:
    """SimHash fingerprint, vectorized: per-row Arrow batches, zero
    shuffles (a fingerprint needs only its own document). Bit j of the
    fingerprint is the majority vote of md5-prefix token-hash bit j —
    identical values to the relational ``simhash64`` twin and the
    DuckDB oracle (same md5 prefix, same ±1 vote, same >0 rule).

    ``n_bits`` up to 64: at 64 the token hash is the full md5 64-bit
    prefix and bit 63 of the fingerprint is the int64 sign bit — the
    production width. Packing relies on int64 wrap-around (numpy's
    element 63 of ``1 << arange`` IS INT64_MIN, and the sum of distinct
    powers wraps to exactly the two's-complement bit pattern DuckDB's
    explicit sign-term pack produces; pinned by the simhash64_near_dup
    gate and test_simhash64_full_width)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    import re as _re

    if not 1 <= n_bits <= 64:
        raise ValueError(f"n_bits ({n_bits}) must be in [1, 64]")
    hash_fn = _md5_prefix64 if n_bits > 60 else _md5_prefix60
    ws = _re.compile(r"\s+")
    powers = (1 << np.arange(n_bits, dtype=np.int64))

    def run(batches):
        for pdf in batches:
            # token-less docs (NULL/empty/whitespace-only) are DROPPED,
            # matching the relational twin (explode + tok<>'' filter
            # leaves no group to aggregate) and the DuckDB oracle.
            # Each UNIQUE token is md5'd once per batch (natural-language
            # batches repeat tokens heavily); votes keep multiplicity —
            # bit-identical to hashing every occurrence.
            keep = np.zeros(len(pdf), dtype=bool)
            fps = np.zeros(len(pdf), dtype=np.int64)
            uid: dict[str, int] = {}
            doc_rows: list[tuple[int, np.ndarray]] = []
            for ri, t in enumerate(pdf[text_col].astype(object)):
                toks = ws.split(t.strip()) if isinstance(t, str) and t.strip() else []
                toks = [x for x in toks if x]
                if not toks:
                    continue
                keep[ri] = True
                ids = np.empty(len(toks), dtype=np.int64)
                for j, x in enumerate(toks):
                    v = uid.get(x)
                    if v is None:
                        v = len(uid)
                        uid[x] = v
                    ids[j] = v
                doc_rows.append((ri, ids))
            xs = np.empty(len(uid), dtype=np.int64)
            for s, i in uid.items():
                xs[i] = hash_fn(s)
            bits_u = (2 * ((xs[:, None] >> np.arange(n_bits)) & 1) - 1).astype(np.int64)
            for ri, ids in doc_rows:
                votes = bits_u[ids].sum(axis=0)
                fps[ri] = int(powers[votes > 0].sum())
            out = pd.DataFrame({id_col: pdf[id_col].values[keep]})
            out["simhash"] = fps[keep]
            yield out

    id_field = df.schema[id_col]
    schema = T.StructType(
        [T.StructField(id_col, id_field.dataType), T.StructField("simhash", T.LongType())]
    )
    src = df.select(id_col, text_col)
    if spread:
        # ``spread=False`` is for callers whose frame is known to be a
        # handful of rows (e.g. conversation-level fingerprints behind a
        # checkpoint): the kernel is ~ms there and the byte estimate
        # cannot see row counts, so a spread exchange is pure overhead
        src = spread_small(src)
    return src.mapInPandas(run, schema=schema)


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens: bit j of the fingerprint is
    the majority vote of token-hash bit j. Expressed relationally
    (explode -> per-bit sum of ±1 -> bit pack) so Catalyst keeps it in
    codegen; the shuffle is one groupBy on the doc id. See
    ``simhash_bits`` for the zero-shuffle Arrow twin."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    h = toks.withColumn("th", stable_hash64(F.col("tok")))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("th"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(60)
    ]
    agg = h.groupBy(id_col).agg(*votes)
    fp = F.lit(0).cast("long")
    for j in range(60):
        fp = fp + F.when(F.col(f"v{j}") > 0, F.lit(1).cast("long") * (2**j)).otherwise(0)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def embedding_near_dup(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lsh_bits: int = 8,
    round_decimals: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup: coordinate-hyperplane LSH bucket
    (sign of the first n bits) prunes candidates, exact cosine verifies.
    At corpus scale the bucket join replaces the quadratic cross join.

    ``round_decimals`` rounds the cosine BEFORE thresholding (and in the
    output) so cross-engine summation-order ulps can't flip membership
    of pairs sitting exactly on the threshold.

    The norm is a per-ROW quantity, so it is computed once below the
    self-join (same left-fold expression on the same cast array —
    bit-identical to folding it per pair) and the per-pair verify pays
    one array fold (the dot), not three; the verify stage is quadratic
    in bucket occupancy, so per-pair cost is the scale lever."""
    vexp = F.col(vec_col).cast("array<double>")
    withb = df.select(
        F.col(id_col),
        vexp.alias("v"),
        _sign_bucket(F.col(vec_col), n_lsh_bits).alias("bucket"),
        F.sqrt(F.aggregate(vexp, F.lit(0.0), lambda acc, x: acc + x * x)).alias("nrm"),
    )
    a, b = withb.alias("a"), withb.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cosine = dot / (F.col("a.nrm") * F.col("b.nrm"))
    if round_decimals is not None:
        cosine = F.round(cosine, round_decimals)
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _sign_bucket(vec, n_bits: int):
    """Integer bucket from the signs of the first n_bits coordinates —
    a deterministic, cross-engine LSH family (axis hyperplanes)."""
    b = F.lit(0)
    for i in range(n_bits):
        b = b + F.when(F.element_at(vec, i + 1) > 0, F.lit(2**i)).otherwise(0)
    return b.cast("int")


def simhash_near_dup_pairs(
    fp: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    n_bits: int = 60,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs via banded hamming blocking: split the
    fingerprint into ``bands`` equal bit-slices; by pigeonhole, two
    hashes within ``max_hamming`` (< bands) differ in at most
    ``bands - 1`` slices, so they COLLIDE on at least one band — the
    band equi-join generates every candidate, and an exact
    ``bit_count(xor)`` filter keeps true pairs. The simhash analog of
    MinHash banded LSH; all pure Catalyst (shift/mask/xor/popcount are
    codegen), the only shuffle is the band-key join. Band width is the
    scale knob: production uses a 64-bit hash with 4x16-bit bands
    (65,536 values per band keep buckets small); the fixture runs
    narrower bands purely because the vote-per-bit oracle SQL grows
    with n_bits. ``max_bucket_size`` is the same hot-bucket skew cap as
    ``lsh_candidate_pairs`` (degenerate template buckets emit B**2/2
    pairs), mirrored exactly by the SQL oracle."""
    # the pigeonhole completeness argument above REQUIRES these; a
    # violating caller would get silent recall loss (max_hamming >=
    # bands) or bits excluded from every band (n_bits % bands != 0)
    if not 0 <= max_hamming < bands:
        raise ValueError(
            f"max_hamming ({max_hamming}) must be in [0, bands) — bands={bands}; "
            "banded blocking is only complete below the band count"
        )
    if n_bits % bands != 0:
        raise ValueError(
            f"n_bits ({n_bits}) must be divisible by bands ({bands}); "
            "otherwise the top n_bits % bands bits are in no band"
        )
    width = n_bits // bands
    mask = (1 << width) - 1
    slices = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.expr(f"shiftright({hash_col}, {b * width}) & {mask}").alias("band_val"),
        )
        for b in range(bands)
    ]
    allb = fp.select(
        F.col(id_col), F.col(hash_col).alias("h"), F.explode(F.array(*slices)).alias("s")
    ).select(
        id_col, "h", F.col("s.band_idx").alias("band_idx"), F.col("s.band_val").alias("band_val")
    )
    if max_bucket_size is not None:
        allb = allb.localCheckpoint(eager=False)  # see lsh_candidate_pairs
        kept = (
            allb.groupBy("band_idx", "band_val")
            .agg(F.count("*").alias("__bsz"))
            .where(F.col("__bsz") <= max_bucket_size)
            .select("band_idx", "band_val")
        )
        allb = allb.join(kept, ["band_idx", "band_val"], "left_semi")
    a, b_ = allb.alias("a"), allb.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.expr("bit_count(a.h ^ b.h)").cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def near_dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """Transitive closure over verified near-dup pairs → one canonical
    keep-id per duplicate cluster: (doc_id, cluster_id, keep_id,
    n_members), cluster_id = the component's minimum doc id.

    The corpus-scale recast of the reference's flood fill
    (find-sign-dots-fn core.clj:574-638: grow a component, consuming
    members from the remaining set): a local worklist becomes
    bounded-round MIN-LABEL PROPAGATION over hash-partitioned joins —
    every doc starts labeled min(own id, min neighbor id); each round a doc adopts
    the minimum label among itself and its neighbors, then POINTER-JUMPS
    to its label's label (halving label-chain depth, so convergence is
    O(log diameter) rounds, not O(diameter) — the classic
    Hash-to-Min/pointer-doubling CC trick). All per-round work is
    joins + groupBy on the id key (parallel, map-side combinable); the
    driver loop is over ROUNDS, and per-round state is truncated with
    an eager localCheckpoint so plan lineage stays flat (use a reliable
    checkpoint dir on a real cluster). Convergence is detected by
    counting CHANGED labels (each id's previous label rides the merge
    aggregation as a carried column, so the comparison needs no extra
    join) — overflow-free at any id magnitude, unlike a
    SUM(label) fixpoint which can exceed int64 at 10^9+ docs with
    large ids (failing under ANSI mode or wrapping silently).

    Near-dup graphs are overwhelmingly tiny cliques/chains (dup
    clusters), so real round counts are 1-3; ``max_rounds`` is a
    defensive cap and overrunning it raises instead of silently
    emitting a half-converged labeling.
    """
    e = pairs.select(F.col(id_a).alias("s"), F.col(id_b).alias("d"))
    edges = (
        e.union(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
        .distinct()
        # lazy: the first round's convergence count is the action that
        # materializes it (one job instead of a dedicated eager one);
        # localCheckpoint still guarantees the upstream (e.g. the whole
        # LSH+verify pipeline) runs ONCE, not once per round
        .localCheckpoint(eager=False)
    )
    # seed labels with min(id, min neighbor) — the first propagation
    # round comes free with the seeding scan
    labels = (
        edges.groupBy("s")
        .agg(F.least(F.min("d"), F.col("s")).alias("lbl"))
        .select(F.col("s").alias("id"), "lbl")
        .localCheckpoint(eager=False)
    )
    lbl_type = dict(labels.dtypes)["lbl"]
    for _ in range(max_rounds):
        prop = edges.join(labels.withColumnRenamed("id", "s"), "s").select(
            F.col("d").alias("id"), "lbl"
        )
        # carry each id's previous label THROUGH the merge aggregation
        # (prev is non-null on exactly the one labels-row per id — every
        # prop id is an edge destination, hence also a seeded source —
        # so max(prev) recovers it) instead of re-joining labels after
        # the pointer jump: one shuffle join fewer per round, identical
        # convergence test.
        tagged = labels.select("id", "lbl", F.col("lbl").alias("prev")).unionByName(
            prop.select("id", "lbl", F.lit(None).cast(lbl_type).alias("prev"))
        )
        merged = tagged.groupBy("id").agg(
            F.min("lbl").alias("lbl"), F.max("prev").alias("prev_lbl")
        ).localCheckpoint(eager=False)  # lazy: the count below materializes it
        # changed-label count BEFORE the pointer jump: labels only ever
        # decrease, so zero changed rows == propagation fixpoint, and at
        # the fixpoint every edge has equal endpoint labels (labels are
        # constant per component), so the jump would be the identity —
        # the converged (always-run final) round skips its join shuffle
        # outright. Overflow-free vs a SUM(lbl) probe.
        changed = merged.where(F.col("lbl") != F.col("prev_lbl")).count()
        if changed == 0:
            labels = merged.select("id", "lbl")
            break
        # pointer jump: adopt the label of your label (labels are ids);
        # lazy — it materializes as part of the NEXT round's count over
        # the next checkpoint, so lineage stays one join deep per round.
        lab2 = merged.select(F.col("id").alias("lbl"), F.col("lbl").alias("lbl2"))
        labels = merged.join(lab2, "lbl", "left").select(
            "id", F.least("lbl", F.coalesce("lbl2", "lbl")).alias("lbl")
        )
    else:
        raise RuntimeError(f"near_dup_clusters did not converge in {max_rounds} rounds")
    # member counts via groupBy + join, NOT a count-over-window: a
    # window partitioned by cluster label materializes each cluster in
    # ONE task, and a degenerate giant cluster (boilerplate-heavy
    # corpus) is exactly when that breaks. The groupBy partial-
    # aggregates map-side; the join back is AQE-skew-splittable.
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("n_members"))
    return labels.join(sizes, "lbl").select(
        F.col("id").alias("doc_id"),
        F.col("lbl").alias("cluster_id"),
        F.col("lbl").alias("keep_id"),
        "n_members",
    )
