#!/usr/bin/env python
"""spark-submit entry point for the KG-construction pipeline (north rule:
"runs via spark-submit --py-files at N and 4N executors").

    python tools/package.py                       # → build/ner_spark.zip
    spark-submit --py-files build/ner_spark.zip \\
        tools/run_job.py --pages <parquet> --kb <KB.tsv> --out <dir> \\
        [--buckets 64] [--find-names] [--lowercase] [--deaccent]

With no --kb the synthetic fixture KB is compiled (useful for smoke runs).
The job writes the canonicalized triple table with per-bucket lineage
(resumable: re-running with the same --out skips completed buckets) and
prints a one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="parquet dir with url/text cols")
    ap.add_argument("--kb", default=None, help="KB.tsv path (default: synthetic)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--find-names", action="store_true")
    ap.add_argument("--lowercase", action="store_true")
    ap.add_argument("--deaccent", action="store_true")
    ap.add_argument("--lang", default="en",
                    help="language module for namelist build + scan rules")
    ap.add_argument("--tagged-inflections", default=None, metavar="TSV",
                    help="namegen tagged-inflections TSV (cs only, "
                         "create_cedar.sh:369)")
    ap.add_argument("--materialize-mentions", action="store_true",
                    help="checkpoint mentions (compute-level resume)")
    ap.add_argument("--resume-waves", type=int, default=1, metavar="N",
                    help="split mention extraction into N sequentially "
                         "committed waves (incremental checkpointing: a "
                         "mid-run loss preserves completed waves; costs "
                         "one extra column-pruned pages scan per wave)")
    ap.add_argument("--kb-artifact", default=None, metavar="DIR",
                    help="prebuilt-KB artifact dir (the production form: "
                         "the reference ships a compiled .dct and never "
                         "recompiles per job). Loads DIR if it exists, "
                         "else compiles once and saves it there.")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ner_spark.io.catalog import resumable_write
    from ner_spark.io.kbtsv import read_kb_tsv
    from ner_spark.kb.build import compile_kb, load_kb_artifact, save_kb_artifact
    from ner_spark.pipeline.ner import extract_mentions
    from ner_spark.pipeline.triples import build_triples

    # under spark-submit the session/master comes from the launcher config
    spark = SparkSession.builder.appName("ner-spark-kgc").getOrCreate()
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    if spark.conf.get("spark.sql.shuffle.partitions") == "200":
        # launcher didn't size the shuffles — default to cluster parallelism
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(spark.sparkContext.defaultParallelism))

    art_dir = args.kb_artifact
    have_artifact = art_dir and os.path.exists(
        os.path.join(art_dir, "MANIFEST.json"))

    kb_rows = tagged = None
    if not have_artifact:
        if args.kb:
            with open(args.kb) as fh:
                _, _, kb_rows = read_kb_tsv(fh)
        else:
            from ner_spark.fixtures.gen import gen_kb_rows
            kb_rows = gen_kb_rows()
        if args.tagged_inflections:
            with open(args.tagged_inflections) as fh:
                tagged = fh.read().splitlines()

    t0 = time.time()
    if have_artifact:
        art = load_kb_artifact(spark, art_dir)
    else:
        art = compile_kb(spark, kb_rows, lowercase=args.lowercase,
                         deaccent=args.deaccent, lang=args.lang,
                         tagged_inflections=tagged)
        if art_dir:
            save_kb_artifact(art, art_dir)
    pages = spark.read.parquet(args.pages)
    kw = dict(url_col=args.url_col, text_col=args.text_col,
              lowercase=args.lowercase, deaccent=args.deaccent,
              find_names=args.find_names, lang=args.lang)
    if args.materialize_mentions:
        from ner_spark.pipeline.run import extract_mentions_resumable
        mentions = extract_mentions_resumable(
            spark, pages, art, os.path.join(args.out, "mentions"),
            n_buckets=args.buckets, waves=args.resume_waves, **kw)
    else:
        mentions = extract_mentions(pages, art, **kw).persist()
    triples = build_triples(mentions, art.kb_df)
    manifest = resumable_write(triples, os.path.join(args.out, "triples"),
                               key="subj", n_buckets=args.buckets)
    n = spark.read.parquet(os.path.join(args.out, "triples")).count()
    dt = time.time() - t0
    print(json.dumps({
        "n_triples": n, "sec": round(dt, 2),
        "triples_per_sec": round(n / dt, 1),
        "buckets_completed": len(manifest["completed"]),
        "buckets_resumed": len(manifest["skipped_resume"]),
        "kb": "artifact" if have_artifact else "compiled",
        "out": args.out,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
