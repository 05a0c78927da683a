"""Benchmark harness.

Prints the full record (per-query dict, per-level per-pair samples) to
a sidecar file + a first stdout line, then ONE COMPACT JSON line LAST,
hard-capped under 1 KB so it survives the harness's bounded (~2000
char) stdout-tail capture at ANY battery size (see main()):
  {"metric": "total_bench_seconds", "value": <sum of headline query secs>,
   "unit": "sec", "queries_timed": <n>, "slowest": {name: sec, x5},
   "sf": <sf>,
   "extraction": {"turns": N,
                  "turns_per_sec_low": ..., "turns_per_sec_high": ...,
                  "scaling_efficiency": thr(4N) / (4 * thr(N)),
                  "detail": "BENCH/last_run_full.json"}}

The extraction scaling run is the BASELINE.json north-rule evidence:
the same corpus extracted at local[N] and local[4N] (sandbox proxy for
N vs 4N executors), each in a fresh JVM (subprocess), throughput and
efficiency reported. Headline queries run once at $SPARK_GRAFT_CPUS.

Levels default to 2 and 8 on this 32-core box: single-host N-vs-4N
is only a fair proxy for N-vs-4N *clusters* when both levels see the
same per-core hardware (clock, L3, DRAM bandwidth) and neither level
contends with the JVM's service threads (GC, shuffle, Netty, Arrow
writers). At 16+ active cores this box derates per-core memory
bandwidth/turbo, so higher pairs measure host saturation, not pipeline
scalability (all pairs' numbers and the full diagnosis are in
BENCH/BASELINE.md).
Each level reports best-of-OCR_BENCH_REPS steady-state runs (python
workers + codegen pre-warmed), for both the no-shuffle path (balanced
input, production default) and the forced salted-repartition path
(skewed-input mode). Round 4: the auto path is sized for EQUAL SECONDS
per level (the higher level processes level-ratio× the turns in one
plan), the pair count is FIXED (no adaptive stopping), and every
per-pair throughput sample is recorded in the output.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), OCR_BENCH_REPLICATION (default 200),
     OCR_BENCH_LEVELS (default "2,8"), OCR_BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
#: replication for the scaling corpus — sized so extraction compute
#: dominates fixed job overhead. Raised 200 -> 600 (3M turns) mid
#: round 2: the unique-block/payload memoization made the kernel ~3x
#: faster, and at 1M turns the 8-core job finished in ~2.3s where
#: ~0.3s of scheduling/scan setup ate 13% of the ratio — the bigger
#: corpus keeps the efficiency measurement about the pipeline, not
#: the harness
REPLICATION = int(os.environ.get("OCR_BENCH_REPLICATION", "600"))
LEVELS = [int(x) for x in os.environ.get("OCR_BENCH_LEVELS", "2,8").split(",")]
#: 2 in-process reps x 2 interleaved JVMs = 4 samples per (level, path);
#: the JVM dimension matters more than the rep dimension (see main())
REPS = int(os.environ.get("OCR_BENCH_REPS", "2"))

HEADLINE = [
    "extract_text",
    "conv_assembly",
    "q1_scan_agg",
    "bbox_minmax",
    "top1_argmax",
    "gap_sessionize",
    "range_band_join",
    "region_revenue",
    "window_agg_5min",
    "text_stats",
    "lang_quality",
    "exact_dedup",
    "adjacent_jaccard",
    "minhash_sigs",
    "simhash",
    "cosine_topk",
    "ann_lsh_buckets",
    "asof_join",
    "rollup_revenue",
    "salted_heavy_hitter",
    "percentile_pick",
    "token_fingerprints",
    "embedding_near_dup",
    "ivf_topk",
    "conv_dedup",
    "session_window_agg",
    "near_dup_verified",
    "token_packing",
    "stratified_sample",
    "near_dup_clusters",  # added round 3 (pairs -> transitive-closure clusters)
    "training_mix",  # added round 3 (composed dedup->quality->sample->pack)
    "doc_repetition",  # added round 3 (Gopher-style repetition metrics)
    "decontaminate",  # added round 3 (8-gram overlap vs holdout set)
    "ivf_train_step",  # added round 3 (distributed Lloyd step, integer stats)
    "simhash_near_dup",  # added round 3 (banded hamming blocking + popcount)
    "pii_scrub",  # added round 3 (email/phone redaction + audit counts)
    "ivf_train_loop",  # added round 4 (3-iteration k-means, codebook collect between rounds)
    "ivf_topk_trained",  # added round 4 (IVF search over the trained codebook)
    # (stream_* queries are gated for correctness but not in the timed
    # battery, matching stream_extract_text/conv_assembly/exact_dedup)
    "segment_dedup",  # added round 4 (sub-document exact dedup, first-occurrence keeps)
    "gopher_quality_bits",  # added round 4 (integer rule-bit quality gate)
    "conv_near_dup",  # added round 4 (extract -> assemble -> conversation-level simhash pairs)
    "loss_mask_spans",  # added round 4 (SFT loss-mask char spans of assistant turns)
    "simhash64_near_dup",  # added round 5 (production-width 64-bit simhash, sign bit live)
    "vocab_topk",  # added round 5 (two-phase corpus vocabulary rank)
    "rare_token_ratio",  # added round 5 (integer unigram-rarity score, skew-immune join)
    "source_mix",  # added round 5 ((source, lang) composition report)
    "conv_turn_stats",  # added round 5 (per-conversation role/alternation hygiene)
    "conv_quality_bits",  # added round 5 (conversation-level Gopher gate, composed plan)
    "conv_packing",  # added round 5 (SFT packing of assembled conversations)
    "conv_training_mix",  # added round 5 (conv-level hygiene+quality+dedup+pack, one plan)
    "prototype_stats",  # added round 6 (taught-alphabet stats + size-gate envelope)
    "ivf_recall",  # added round 6 (recall@k within oracle-pinned bounds)
    "conv_decontaminate",  # added round 6 (8-gram decontamination over assembled convs)
    "ngram_novelty",  # added round 6 (per-doc first-occurrence gram share)
    "mix_rebalance",  # added round 6 (uniform source mix + hash keep rule)
    "temperature_mix",  # added round 6 (alpha=0.5 mix via exact integer sqrt)
    "quality_curriculum",  # added round 6 (decile census via score histogram)
    "dedup_keep_best",  # added round 6 (cluster collapse, keep-highest-quality)
    "incremental_dedup",  # added round 6 (new-batch x old-corpus digest+LSH tiers)
    "segment_scrub",  # added round 6 (segment dedup with document reconstruction)
    "shard_manifest",  # added round 6 (per-shard census + XOR content checksum)
    "semantic_decontaminate",  # added round 6 (embedding-cosine eval decontamination)
    "compaction_plan",  # added round 6 (cumulative-quota small-shard merge groups)
    "unigram_surprisal",  # added round 6 (integer perplexity proxy, frequency-split join)
    "turn_response_dedup",  # added round 6 (cross-conversation assistant-response dedup)
    "conv_loop_detect",  # added round 6 (agent retry-loop runs per conversation)
    "dsir_select",  # added round 6 (DSIR importance selection, broadcast bucket model)
    "curation_funnel",  # added round 6 (first-failing-stage drop attribution)
    "normalized_dedup",  # added round 6 (near-exact tier: normalized-digest census)
    "leakage_safe_split",  # added round 6 (cluster-atomic train/val/test assignment)
    "bpe_merge_step",  # added round 6 (BPE vocab-induction step, zero-shuffle merge count)
    "conv_prefix_dedup",  # added round 6 (branched-session prefix dedup, K-bounded state)
    "chunk_overlap",  # added round 6 (sliding-window chunking, closed-form zero-shuffle)
    "substring_scrub",  # added round 7 (unaligned repeated-substring removal, Lee et al. class)
    "multimodal_decode_census",  # added round 7 (decoder-cascade fallback rate, oracle-pinned)
    "bpe_merge_loop",  # added round 7 (3-round vocab induction, plan-side argmax between rounds)
    "bpe_apply_merges",  # added round 7 (tokenize with induced merges, per-doc budgets)
    "decontaminate_spans",  # added round 7 (char-span provenance per contamination hit)
    "tool_call_bigrams",  # added round 7 (agent tool-flow transition census, START state)
    "tool_output_stats",  # added round 7 (tool-output census over real extraction)
    "ctx_truncate",  # added round 7 (longest-suffix context-window truncation)
    "tfidf_topk",  # added round 7 (integer-exact TF-IDF, two-phase per-term top-k)
    "inverted_index_stats",  # added round 7 (posting shard census, XOR checksums)
    "heaps_law_curve",  # added round 7 (vocabulary growth via first-occurrence histogram)
    "embedding_quantize",  # added round 7 (int8 codes + reconstruction-error summary)
    "containment_dedup",  # added round 7 (Broder containment tier on LSH candidates)
    "link_census",  # added round 7 (corpus href census, boilerplate share)
    "doc_length_histogram",  # added round 7 (power-of-two length histogram)
    "event_funnel",  # added round 7 (sequential conversion funnel, chained min-after aggs)
    "dedup_cluster_census",  # added round 7 (cluster-size histogram over the closure)
    "json_tool_parse",  # added round 7 (JSON-path tool-wrapper parse + malformed census)
    "role_token_share",  # added round 7 (per-conversation role token mix, bp)
    "tokenizer_fertility",  # added round 7 (BPE per ws word, exact ppm per lang)
]


def corpus_path(replication: int, n_files: int) -> str:
    # n_files is part of the cache key: a corpus with the wrong file
    # count has the wrong per-batch duplicate density (see build_corpus)
    # and silently reusing it would skew the scaling ratio
    tag = Path(SF_DIR).name
    return f"/tmp/ocr_bench_corpus_{tag}_x{replication}_f{n_files}"


def build_corpus(spark, replication: int, n_files: int) -> str:
    """Deterministic bench corpus: the document-derived transcripts
    replicated ``replication``× with distinct conv ids (pure Catalyst —
    explode a sequence; no driver-side data).

    ``n_files`` MUST scale with ``replication`` (the equal-seconds
    corpora use replication×R, files×R): the round-robin repartition
    then lands the same ~replication/n_files copies of each turn in
    every partition, so per-Arrow-batch payload-duplicate density — and
    with it the kernel's memoization hit rate, i.e. the WORK PER TURN —
    is identical across corpus sizes. (The first equal-seconds attempt
    inflated in-plan with explode, which put the R copies ADJACENT in
    each scan batch; the 4× memo hit rate made level-8 turns ~4×
    cheaper and the 2→8 ratio came out super-linear at 1.29 — wrong in
    the flattering direction. On-disk same-recipe corpora keep the
    per-turn workload constant; the 1.29 run was discarded, not
    reported.)"""
    from pyspark.sql import functions as F

    from ocr_lib_spark.sources.synth import transcripts_from_documents

    path = corpus_path(replication, n_files)
    if Path(path, "_SUCCESS").exists():
        return path
    tr = transcripts_from_documents(spark, SF_DIR)
    big = (
        tr.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replication - 1))))
        .withColumn("conv_id", F.concat_ws("-", "conv_id", F.col("rep").cast("string")))
        .drop("rep")
    )
    big.repartition(n_files).write.mode("overwrite").parquet(path)
    return path


def extraction_worker(cores: int, corpus: str) -> None:
    """Child process: fresh JVM at local[cores]; time the steady-state
    extraction job (python workers + codegen warmed on a 2% sample so
    the measurement is throughput, not process-spawn latency). Reports
    best-of-REPS for both the balanced-input path (no shuffle) and the
    skewed-input path (forced salted repartition).

    ``corpus`` = equal-seconds-per-level sizing (round 4): level L
    reads a corpus replicated (L/min_level)× ON DISK with the same
    recipe (see build_corpus — same per-batch duplicate density, same
    work per turn), so every level's timed job runs comparable wall
    seconds. Without it the higher level's job is levels-ratio×
    shorter and the ~0.6s fixed per-job cost (scan planning, job
    scheduling, result fetch) compresses its throughput ~8-11% while
    costing the low level ~4% — the r03 recorded auto efficiency of
    0.697 vs a ~0.96 steady-state ratio was mostly this measurement
    artifact (decomposition in BENCH/BASELINE.md). tps stays honest:
    turns actually processed / seconds of that same job.

    Round 5: BOTH paths read the SAME equal-seconds corpus (the r04
    protocol kept the salted path on the base corpus at every level,
    so its level-8 job was 4× shorter and its recorded 0.748
    efficiency carried the fixed-cost compression the auto path was
    cured of — measurement asymmetry, not an engine property)."""
    from pyspark.sql import functions as F

    from ocr_lib_spark.pipeline import extract_turns
    from ocr_lib_spark.session import get_spark

    # 12g pre-touched heap — measured optimum for BOTH paths at BOTH
    # levels. A round-5 heap sweep on the 12M-turn corpus found bigger
    # pre-touched heaps strictly slower on this box: salted local[8]
    # 12g -> 450-499k tps, 16g -> 242-348k, 24g -> 279-399k; auto
    # local[32] 12g -> 748-856k vs 24g -> 371k. (The initial round-5
    # protocol shipped 24g on the "bigger shuffle needs bigger heap"
    # theory — wrong on this host; the hypothesized 12g GC cliff for
    # the 12M shuffle does not reproduce.) Pre-touch at 12g keeps the
    # steady state out of the kernel; startup cost ~2s, untimed.
    spark = get_spark(
        app=f"bench-extract-{cores}",
        cores=cores,
        shuffle_partitions=cores,
        driver_memory="12g",
    )
    big = spark.read.parquet(corpus)
    extract_turns(big.sample(0.02, seed=1), partitions=cores).agg(
        F.count("*")
    ).collect()  # warm-up: spawn python workers, JIT codegen, shuffle machinery
    # warm the corpus' page cache (reads the data pages, not just
    # footers): the higher level's corpus is levels-ratio× larger, so
    # without this its first timed rep pays proportionally more cold
    # disk I/O — a cache asymmetry, not a scaling property. The timed
    # region measures steady-state extraction throughput.
    big.agg(F.sum(F.length("text"))).collect()

    def timed(src, repartition) -> tuple[int, float]:
        best, n = None, 0
        for _ in range(REPS):
            t0 = time.monotonic()
            res = extract_turns(src, partitions=cores, repartition=repartition).agg(
                F.count("*").alias("n"), F.sum("n_blocks").alias("nb")
            ).collect()[0]
            secs = time.monotonic() - t0
            n = res["n"]
            best = secs if best is None else min(best, secs)
        return n, best

    n, secs = timed(big, "auto")
    n_salt, secs_shuffle = timed(big, True)
    print(
        json.dumps(
            {
                "turns": n,
                "secs": secs,
                "tps": n / secs,
                "turns_salted": n_salt,
                "secs_salted_shuffle": secs_shuffle,
                "tps_salted_shuffle": n_salt / secs_shuffle,
            }
        )
    )
    spark.stop()


def run_headline(spark) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    from pyspark.sql import functions as F

    from ocr_lib_spark.pipeline import extract_turns
    from ocr_lib_spark.sources.synth import transcripts_from_documents

    # warm ALL python workers (one per core -> repartition the warm-up
    # input across every core) so the first pandas-UDF query isn't
    # charged the spawn cost
    extract_turns(
        transcripts_from_documents(spark, SF_DIR).repartition(CPUS),
        repartition=False,
    ).agg(F.count("*")).collect()

    qs = entry_mod.queries()
    # Battery warm-up (round 7, VERDICT r6 item 2): the position-0
    # entry used to absorb the remaining session/registry spin-up
    # (table reads beyond `documents`, first codegen, registry import)
    # and read 1.3-1.9x in paired runs while the dedicated harness
    # showed it faster. One untimed full execution of the first
    # battery query before the timed loop puts position 0 on the same
    # steady-state footing as every later entry.
    qs[HEADLINE[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    for name in HEADLINE:
        # Best-of-2, escalating to best-of-4 while the running best
        # stays >2s (VERDICT r7 item 2: a roaming host window wrote
        # dedup_keep_best at 14.86s into the permanent driver record
        # when paired-control runs the same day measured 2.9-3.6s —
        # with both base samples inside one bad window, best-of-2
        # can't see out of it). The estimator stays MIN (the repo's
        # fixed one-sided-noise convention: contention/JIT/GC only
        # ever slow a run down), samples just keep coming while the
        # evidence says we may still be inside a slow window.
        best = None
        for i in range(4):
            if i >= 2 and best is not None and best <= 2.0:
                break
            t0 = time.monotonic()
            df = qs[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            secs = time.monotonic() - t0
            best = secs if best is None else min(best, secs)
        out[name] = round(best, 3)
    return out


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--extract-worker":
        extraction_worker(int(sys.argv[2]), sys.argv[3])
        return

    from ocr_lib_spark.session import get_spark

    spark = get_spark(app="bench-main", cores=CPUS, shuffle_partitions=CPUS)
    base = min(LEVELS)
    base_path = build_corpus(spark, REPLICATION, 64)
    # equal-seconds corpora: replication AND file count scale together
    # so per-batch duplicate density (=> work per turn) stays constant
    auto_paths = {
        cores: (
            build_corpus(spark, REPLICATION * (cores // base), 64 * (cores // base))
            if cores // base > 1
            else base_path
        )
        for cores in LEVELS
    }
    queries = run_headline(spark)
    spark.stop()

    # Per level: best-of-JVMS fresh processes (each internally best-of-
    # REPS runs). Two noise terms dominate on this host: process-level
    # luck (JIT/heap layout — a badly-placed JVM stays ~10% slow for all
    # its reps) and slow host-state drift (frequency/thermal across
    # minutes). Best-of-JVMS absorbs the first; INTERLEAVING the levels
    # (2, 8, 2, 8 — not 2, 2, 8, 8) makes both levels sample the same
    # host states so drift cancels out of the ratio instead of landing
    # entirely on one level.
    # FIXED pair count (round 4, advisor): the round-3 adaptive
    # resampling ("run extra pairs only while the ratio is < 0.90") was
    # an optional-stopping rule on the headline metric — one-sided
    # selection even with the pair count disclosed. Now every run
    # executes exactly OCR_BENCH_JVMS interleaved pairs (default 4,
    # the r03 effective sample size), records EVERY per-pair sample
    # (extraction.levels[L].samples_tps*), and the estimator —
    # best-observed steady-state per level, applied symmetrically to
    # both levels and both paths — is fixed before the data arrives.
    jvms = int(os.environ.get("OCR_BENCH_JVMS", "4"))
    levels: dict[str, dict] = {}

    def run_pair() -> None:
        """One interleaved pass over LEVELS (a fresh JVM per level),
        merged into the per-level best. The estimator is best-observed
        steady-state throughput per level: host noise is one-sided
        (contention/JIT/GC only ever slow a run down), so more samples
        only move each level TOWARD its true capability."""
        for cores in LEVELS:
            r = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--extract-worker",
                    str(cores),
                    auto_paths[cores],
                ],
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                timeout=3600,
            )
            line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
            run = json.loads(line)
            best = levels.get(str(cores))
            if best is None:
                run["samples_tps"] = [round(run["tps"], 1)]
                run["samples_tps_salted"] = [round(run["tps_salted_shuffle"], 1)]
                levels[str(cores)] = run
            else:
                best["samples_tps"].append(round(run["tps"], 1))
                best["samples_tps_salted"].append(round(run["tps_salted_shuffle"], 1))
                for tps_key, secs_key in (
                    ("tps", "secs"),
                    ("tps_salted_shuffle", "secs_salted_shuffle"),
                ):
                    if run[tps_key] > best[tps_key]:
                        best[tps_key] = run[tps_key]
                        best[secs_key] = run[secs_key]

    for _ in range(jvms):
        run_pair()
    pairs_used = jvms

    lo, hi = str(min(LEVELS)), str(max(LEVELS))
    ratio = max(LEVELS) / min(LEVELS)

    eff_auto = (
        levels[hi]["tps"] / (ratio * levels[lo]["tps"]) if len(LEVELS) > 1 else None
    )
    eff_shuffle = (
        levels[hi]["tps_salted_shuffle"] / (ratio * levels[lo]["tps_salted_shuffle"])
        if len(LEVELS) > 1
        else None
    )
    # Headline efficiency = the AUTO path (production default on this
    # balanced layout): one reproducible run configuration, per-level.
    # best-path efficiency (max of the two strategies per level) is
    # reported alongside, explicitly labeled — it is a composite no
    # single execution achieves and is NOT the headline.
    best = {
        k: max(levels[k]["tps"], levels[k]["tps_salted_shuffle"]) for k in (lo, hi)
    }
    eff_best = best[hi] / (ratio * best[lo]) if len(LEVELS) > 1 else None
    ext_summary = {
        "turns": levels[hi]["turns"],
        "jvm_pairs": pairs_used,
        "headline_path": "auto (conditional repartition; production default)",
        "turns_per_sec_low": round(levels[lo]["tps"], 1),
        "turns_per_sec_high": round(levels[hi]["tps"], 1),
        "parallelism_low": min(LEVELS),
        "parallelism_high": max(LEVELS),
        "scaling_efficiency": round(eff_auto, 3) if eff_auto is not None else None,
        "scaling_efficiency_salted_shuffle": (
            round(eff_shuffle, 3) if eff_shuffle is not None else None
        ),
        "scaling_efficiency_best_path": (
            round(eff_best, 3) if eff_best is not None else None
        ),
    }
    result = {
        "metric": "total_bench_seconds",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "sf": Path(SF_DIR).name,
        "extraction": {**ext_summary, "levels": levels},
    }
    # Emission protocol (round 7; supersedes rounds 4/5): the external
    # harness records a FIXED-SIZE (~2000 char) TAIL of stdout and
    # parses the last JSON line. r04's single fat line (per-pair sample
    # arrays) and r06's "compact" line (a per-query dict that grows
    # with the battery — ~72 entries put the line past the tail window,
    # truncating the capture mid-record) BOTH came back `parsed: null`.
    # The prior fix assumed a fixed battery size; this one does not:
    # the LAST line is hard-capped under 1 KB regardless of battery
    # growth — battery total + query count + the 5 slowest entries
    # only. The full per-query dict and per-level extraction detail
    # live in the sidecar file and the preceding stdout line.
    sidecar = Path(__file__).resolve().parent / "BENCH" / "last_run_full.json"
    sidecar.parent.mkdir(exist_ok=True)
    sidecar.write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))
    slowest = dict(
        sorted(
            ((k, round(v, 2)) for k, v in queries.items()),
            key=lambda kv: -kv[1],
        )[:5]
    )
    compact = {
        "metric": "total_bench_seconds",
        "value": round(sum(queries.values()), 2),
        "unit": "sec",
        "queries_timed": len(queries),
        "slowest": slowest,
        "sf": Path(SF_DIR).name,
        "extraction": {**ext_summary, "detail": "BENCH/last_run_full.json"},
        "per_query_detail": "BENCH/last_run_full.json (queries dict)",
    }
    line = json.dumps(compact)
    if len(line) > 1000:  # belt-and-braces: never outgrow the tail again
        compact.pop("slowest", None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
