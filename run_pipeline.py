"""spark-submit entry point for the near-duplicate pipeline.

Usage (cluster):
    spark-submit --py-files tsn.zip run_pipeline.py \
        --input  <path or iceberg table of clips> \
        --warehouse <checkpoint warehouse> \
        --run-id run42 --threshold 0.8 --ngram 3

Usage (sandbox smoke):
    python run_pipeline.py --synthetic 1000 --warehouse /tmp/tsn_wh

The same job is what bench.py times at two parallelism levels for the
N-vs-4N scaling evidence (BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="near-duplicate detection pipeline")
    p.add_argument("--input", help="parquet path (or iceberg table) of clips")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic clips instead of reading --input")
    p.add_argument("--warehouse", required=True, help="checkpoint warehouse dir")
    p.add_argument("--output", help="optional parquet path for clusters")
    p.add_argument("--run-id", default="run0")
    p.add_argument("--threshold", type=float, default=0.8)
    p.add_argument("--ngram", type=int, default=3)
    p.add_argument("--minhash-k", type=int, default=128)
    p.add_argument("--bands", type=int, default=32)
    p.add_argument("--rows", type=int, default=4)
    p.add_argument("--fingerprint-cap", type=int, default=64,
                   help="containment-tier boilerplate cap (docs per "
                        "winnowed fingerprint; drops are metered)")
    p.add_argument("--cores", type=int, default=None)
    args = p.parse_args(argv)

    from text_similarity_node_spark.config import PipelineConfig
    from text_similarity_node_spark.plans.pipeline import NearDupPipeline
    from text_similarity_node_spark.session import get_spark

    spark = get_spark(app_name=f"tsn-pipeline-{args.run_id}", cores=args.cores)

    if args.synthetic:
        from text_similarity_node_spark.sources.clips import ClipsSpec, generate_clips

        clips, _truth = generate_clips(spark, ClipsSpec(n_clips=args.synthetic))
    elif args.input:
        clips = spark.read.parquet(args.input)
    else:
        p.error("one of --input / --synthetic is required")

    cfg = PipelineConfig(
        ngram_size=args.ngram,
        minhash_k=args.minhash_k,
        lsh_bands=args.bands,
        lsh_rows=args.rows,
        fingerprint_cap=args.fingerprint_cap,
        verify_threshold=args.threshold,
        run_id=args.run_id,
    )
    t0 = time.time()
    res = NearDupPipeline(spark, cfg, args.warehouse).run(clips)
    n_clips = clips.count()
    n_pairs = res.verified_pairs.count()
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    if args.output:
        res.clusters.write.mode("overwrite").parquet(args.output)
    elapsed = time.time() - t0
    print(json.dumps({
        "run_id": args.run_id,
        "config_hash": cfg.config_hash(),
        "clips": n_clips,
        "verified_pairs": n_pairs,
        "clusters": n_clusters,
        "seconds": round(elapsed, 2),
        "clips_per_sec": round(n_clips / elapsed, 1),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
