"""Recall evidence for trained-IVF search (VERDICT r4 item 7).

ivf_topk_trained is exactness-gated against its own oracle, but the
REASON to train a codebook is retrieval quality: an IVF probe of
nprobe/64 cells only sees the true neighbors whose cells get probed,
so recall@k vs brute force is the figure of merit. This measures, on
the driver fixture, recall@IVF_K for

  * seed-rule codebook (vec_id % 64 == 1 — the untrained stand-in)
  * trained codebook (3 Lloyd iterations, the production path)

against brute-force cosine top-k ground truth (cosine_topk's exact
plan). Output: one JSON line + a markdown row for BENCH/BASELINE.md.

Usage: python tools/ivf_recall.py [sf_dir ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def recall_at_k(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from ocr_lib_spark.operators.similarity import brute_force_topk
    from ocr_lib_spark.plans.vectors import IVF_K, IVF_NPROBE, N_QUERIES, _emb, _ivf_topk

    e = _emb(spark, sf_dir)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(
            e, e.where(F.col("vec_id") < N_QUERIES), k=IVF_K
        ).collect()
    }
    out = {"sf": os.path.basename(sf_dir), "k": IVF_K, "gate_nprobe": IVF_NPROBE}
    for nprobe in (IVF_NPROBE, 4, 8):
        for label, trained in (("seed", False), ("trained", True)):
            got = {
                (r["query_id"], r["neighbor_id"])
                for r in _ivf_topk(
                    spark, sf_dir, trained=trained, nprobe=nprobe
                ).collect()
            }
            out[f"recall_{label}@nprobe{nprobe}"] = round(
                len(got & truth) / len(truth), 4
            )
    return out


def main() -> None:
    from ocr_lib_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    spark = get_spark(app="ivf-recall", cores=8)
    rows = [recall_at_k(spark, d) for d in sf_dirs]
    spark.stop()
    for r in rows:
        print(json.dumps(r))
    print("\n| sf | k | nprobe/64 | recall seed | recall trained |")
    print("|---|---|---|---|---|")
    for r in rows:
        for nprobe in (r["gate_nprobe"], 4, 8):
            print(
                f"| {r['sf']} | {r['k']} | {nprobe}/64 "
                f"| {r[f'recall_seed@nprobe{nprobe}']:.3f} "
                f"| {r[f'recall_trained@nprobe{nprobe}']:.3f} |"
            )


if __name__ == "__main__":
    main()
