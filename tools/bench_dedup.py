#!/usr/bin/env python
"""LSH-vs-all-pairs dedup crossover study (round-5 verdict item 3).

Two corpora through BOTH plans, interleaved A/B (host-throttle protocol:
min-of-k per arm, arms alternated):

  * driver  — the driver's ``documents`` table at $SPARK_GRAFT_SF_DIR
    (pathologically self-similar: most within-block pairs pass 0.5, so
    candidate pruning CANNOT win there by construction);
  * realistic — fixtures/gen.gen_realistic_docs at ``--n-docs`` (default
    20k): ~6% near-dups, everything else pairwise dissimilar — the shape
    real crawls have.

Plans:
  * allpairs — exhaustive within-block token-set Jaccard
    (textops/dedup.jaccard_pairs: block self-join, per-pair intersect);
  * lsh      — banded MinHash candidates + exact verify on candidates
    only (lsh_jaccard_pairs; same output contract).

Also reports the candidate-set sizes: block all-pairs count vs distinct
LSH candidate pairs (the pruning factor that becomes the 100 TB story).
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=6000)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--skip-driver", action="store_true",
                    help="realistic corpus only (crossover size sweep)")
    args = ap.parse_args()

    from ner_spark.session import get_spark
    from ner_spark.fixtures.gen import gen_realistic_docs
    from ner_spark.textops.dedup import jaccard_pairs, lsh_jaccard_pairs

    spark = get_spark("bench_dedup")
    driver_docs = spark.read.parquet(
        os.path.join(args.sf_dir, "documents.parquet")).cache()
    rd = spark.createDataFrame(gen_realistic_docs(args.n_docs)) \
        .repartition(32).cache()
    n_driver = driver_docs.count()
    n_real = rd.count()

    def timed(fn):
        t0 = time.perf_counter()
        n = fn().count()
        dt = time.perf_counter() - t0
        print(f"  arm done: {dt:.1f}s n={n}", file=sys.stderr, flush=True)
        return dt, n

    corpora = {"driver": driver_docs, "realistic": rd}
    if args.skip_driver:
        corpora = {"realistic": rd}
    out = {"n_driver_docs": n_driver, "n_realistic_docs": n_real,
           "trials": args.trials}
    for name, df in corpora.items():
        # candidate-set statistic (plan-shape, not timing)
        blocks = df.groupBy("source").count() \
            .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)) \
            .collect()[0][0]
        cand = lsh_jaccard_pairs(df, block_col="source", threshold=0.5,
                                 candidates_only=True).count()
        res = {"allpairs_pairs": int(blocks), "lsh_candidates": int(cand),
               "pruning_factor": round(blocks / max(cand, 1), 1)}
        t_ap, t_lsh = [], []
        n_ap = n_lsh = None
        for _ in range(args.trials):  # interleaved arms
            t, n_ap = timed(lambda: jaccard_pairs(df, "source", 0.5))
            t_ap.append(t)
            t, n_lsh = timed(lambda: lsh_jaccard_pairs(
                df, block_col="source", threshold=0.5))
            t_lsh.append(t)
        assert n_ap == n_lsh, (name, n_ap, n_lsh)  # identical results
        res.update({"result_pairs": n_ap,
                    "allpairs_sec": round(min(t_ap), 2),
                    "lsh_sec": round(min(t_lsh), 2),
                    "lsh_speedup": round(min(t_ap) / min(t_lsh), 2)})
        out[name] = res
    print(json.dumps(out))


if __name__ == "__main__":
    main()
