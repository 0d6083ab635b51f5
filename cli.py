"""CLI mirroring the reference's ``bin/cli.js`` command surface
(``/root/reference/bin/cli.js:135-415``): similarity / distance / batch /
algorithms, with plain or JSON output.

    python cli.py similarity "hello" "hallo" -a levenshtein
    python cli.py distance "kitten" "sitting" -a levenshtein --json
    python cli.py similarity "night" "nacht" -a jaccard -p ngram -n 2
    python cli.py batch pairs.json -a jaro_winkler        # [["a","b"], ...]
    python cli.py batch pairs.json --spark                # distributed batch
    python cli.py algorithms
"""

from __future__ import annotations

import argparse
import json
import sys

from text_similarity_node_spark import (
    Algorithm,
    AlgorithmConfig,
    Preprocessing,
    get_supported_algorithms,
    parse_algorithm,
)
from text_similarity_node_spark.functions import kernels


def _config(args) -> AlgorithmConfig:
    kw = dict(
        algorithm=parse_algorithm(args.algorithm),
        case_sensitive=not args.ignore_case,
        ngram_size=args.ngram_size,
    )
    if args.preprocessing:
        kw["preprocessing"] = Preprocessing(args.preprocessing)
    for name in ("threshold", "alpha", "beta", "prefix_weight"):
        v = getattr(args, name)
        if v is not None:
            kw[name] = v
    return AlgorithmConfig(**kw)


def _emit(args, payload: dict):
    if args.json:
        print(json.dumps(payload))
    else:
        print(payload["result"])


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="text-similarity-spark")
    sub = p.add_subparsers(dest="command", required=True)

    def add_common(sp):
        sp.add_argument("-a", "--algorithm", default="levenshtein")
        sp.add_argument("-p", "--preprocessing",
                        choices=[m.value for m in Preprocessing], default=None)
        sp.add_argument("-n", "--ngram-size", type=int, default=2)
        sp.add_argument("-i", "--ignore-case", action="store_true")
        sp.add_argument("--threshold", type=float)
        sp.add_argument("--alpha", type=float)
        sp.add_argument("--beta", type=float)
        sp.add_argument("--prefix-weight", type=float)
        sp.add_argument("--json", action="store_true")

    for cmd in ("similarity", "distance"):
        sp = sub.add_parser(cmd)
        sp.add_argument("string1")
        sp.add_argument("string2")
        add_common(sp)

    bp = sub.add_parser("batch")
    bp.add_argument("file", help="JSON file: [[s1, s2], ...]")
    add_common(bp)
    bp.add_argument("--distance", action="store_true")
    bp.add_argument("--spark", action="store_true",
                    help="run distributed (Arrow-batched UDF) instead of in-process")

    sub.add_parser("algorithms")

    args = p.parse_args(argv)

    if args.command == "algorithms":
        for name in get_supported_algorithms():
            print(name)
        return 0

    if args.command in ("similarity", "distance"):
        cfg = _config(args)
        try:
            fn = kernels.similarity if args.command == "similarity" else kernels.distance
            result = fn(args.string1, args.string2, cfg)
        except Exception as exc:  # error contract: {success:false, error}
            print(json.dumps({"success": False, "error": str(exc)}))
            return 1
        _emit(args, {"success": True, "result": result,
                     "algorithm": cfg.algorithm.value})
        return 0

    # batch
    cfg = _config(args)
    with open(args.file) as f:
        pairs = json.load(f)
    if args.spark:
        from text_similarity_node_spark.engine import SimilarityEngine
        from text_similarity_node_spark.session import get_spark

        spark = get_spark(app_name="tsn-cli-batch")
        engine = SimilarityEngine(spark, cfg)
        df = spark.createDataFrame(pairs, "s1 string, s2 string")
        out_df = (engine.distance_batch_df(df) if args.distance
                  else engine.similarity_batch_df(df))
        col = "distance" if args.distance else "similarity"
        results = [r[col] for r in out_df.collect()]
        spark.stop()
    else:
        results = []
        for s1, s2 in pairs:
            try:
                results.append(
                    kernels.distance(s1, s2, cfg) if args.distance
                    else kernels.similarity(s1, s2, cfg)
                )
            except Exception:
                results.append(None)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
