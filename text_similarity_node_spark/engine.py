"""SimilarityEngine — the reference's engine API surface, Spark-backed.

Mirrors ``/root/reference/src/engine/similarity_engine.cpp`` +
``index.js`` exports so a user of the reference can switch:

| reference                         | here                                   |
|-----------------------------------|----------------------------------------|
| calculateSimilarity(s1,s2,a,cfg)  | similarity(s1,s2,algo,**cfg) (scalar)  |
| calculateDistance                 | distance(...)                          |
| calculateSimilarityBatch(pairs)   | similarity_batch(pairs) -> list        |
| calculateSimilarityBatchAsync     | similarity_batch_df(df) -> DataFrame   |
| setGlobalConfiguration            | engine.configure(**kw) (returns NEW    |
|                                   | engine — config is immutable here)     |
| getSupportedAlgorithms            | get_supported_algorithms()             |
| parseAlgorithmType                | parse_algorithm()                      |
| result cache / getMemoryUsage     | not replicated: Spark dedups work via  |
|                                   | dropDuplicates + checkpoint tables     |
|                                   | (similarity_engine.cpp:486-558 is a    |
|                                   | single-process memo, wrong layer here) |

Scalar calls run the pure kernels (no Spark session needed); batch calls
accept either a list of (s1, s2) pairs or a DataFrame with two string
columns and compute through the same kernels as an Arrow-batched UDF, or
through the JVM fast path when one exists and parity allows.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import parse_algorithm
from .config import Algorithm, AlgorithmConfig
from .functions import kernels


class SimilarityEngine:
    def __init__(self, spark: Optional[SparkSession] = None,
                 config: Optional[AlgorithmConfig] = None):
        self.spark = spark
        self.config = config or AlgorithmConfig()

    # -- configuration (immutable; mirrors set/getGlobalConfiguration) -------

    def configure(self, **kw) -> "SimilarityEngine":
        if "algorithm" in kw:
            kw["algorithm"] = parse_algorithm(kw["algorithm"])
        cfg = replace(self.config, **kw)
        cfg.validate()
        return SimilarityEngine(self.spark, cfg)

    def get_configuration(self) -> AlgorithmConfig:
        return self.config

    # -- scalar (entry point 1) ----------------------------------------------

    def _cfg(self, algorithm=None, **overrides) -> AlgorithmConfig:
        cfg = self.config
        if algorithm is not None:
            cfg = replace(cfg, algorithm=parse_algorithm(algorithm))
        if overrides:
            cfg = replace(cfg, **overrides)
        return cfg

    def similarity(self, s1: str, s2: str, algorithm=None, **overrides) -> float:
        return kernels.similarity(s1, s2, self._cfg(algorithm, **overrides))

    def distance(self, s1: str, s2: str, algorithm=None, **overrides) -> int:
        return kernels.distance(s1, s2, self._cfg(algorithm, **overrides))

    # -- batch (entry point 2: the DataFrame IS the batch) --------------------

    def similarity_batch(
        self, pairs: Sequence[tuple[str, str]], algorithm=None, **overrides
    ) -> list[Optional[float]]:
        """Positional results like calculateSimilarityBatch; errors become
        None (the Result<T> error channel)."""
        cfg = self._cfg(algorithm, **overrides)
        out: list[Optional[float]] = []
        for s1, s2 in pairs:
            try:
                out.append(kernels.similarity(s1, s2, cfg))
            except Exception:
                out.append(None)
        return out

    def similarity_batch_df(
        self,
        df: DataFrame,
        col1: str = "s1",
        col2: str = "s2",
        algorithm=None,
        out_col: str = "similarity",
        **overrides,
    ) -> DataFrame:
        """Distributed batch: the async/batch entry points of the reference
        map to one Arrow-batched column computation."""
        from .functions.spark_udfs import similarity_udf

        cfg = self._cfg(algorithm, **overrides)
        udf = similarity_udf(cfg)
        return df.withColumn(out_col, udf(F.col(col1), F.col(col2)))

    def distance_batch_df(
        self, df: DataFrame, col1: str = "s1", col2: str = "s2",
        algorithm=None, out_col: str = "distance", **overrides,
    ) -> DataFrame:
        from .functions.spark_udfs import distance_udf

        cfg = self._cfg(algorithm, **overrides)
        udf = distance_udf(cfg)
        return df.withColumn(out_col, udf(F.col(col1), F.col(col2)))


# -- convenience wrappers mirroring index.js similarity.* ---------------------

_DEFAULT_ENGINE = SimilarityEngine()


def levenshtein(s1: str, s2: str, case_sensitive: bool = True) -> float:
    return _DEFAULT_ENGINE.similarity(
        s1, s2, Algorithm.LEVENSHTEIN, case_sensitive=case_sensitive
    )


def jaccard(s1: str, s2: str, use_words: bool = False, case_sensitive: bool = True,
            ngram_size: int = 2) -> float:
    from .config import Preprocessing

    return _DEFAULT_ENGINE.similarity(
        s1, s2, Algorithm.JACCARD,
        preprocessing=Preprocessing.WORD if use_words else Preprocessing.NGRAM,
        case_sensitive=case_sensitive, ngram_size=ngram_size,
    )


def dice(s1: str, s2: str, use_words: bool = False, case_sensitive: bool = True,
         ngram_size: int = 2) -> float:
    from .config import Preprocessing

    return _DEFAULT_ENGINE.similarity(
        s1, s2, Algorithm.SORENSEN_DICE,
        preprocessing=Preprocessing.WORD if use_words else Preprocessing.NGRAM,
        case_sensitive=case_sensitive, ngram_size=ngram_size,
    )


def cosine(s1: str, s2: str, use_words: bool = False, case_sensitive: bool = True,
           ngram_size: int = 2) -> float:
    from .config import Preprocessing

    return _DEFAULT_ENGINE.similarity(
        s1, s2, Algorithm.COSINE,
        preprocessing=Preprocessing.WORD if use_words else Preprocessing.NGRAM,
        case_sensitive=case_sensitive, ngram_size=ngram_size,
    )


def jaro_winkler(s1: str, s2: str, case_sensitive: bool = True,
                 prefix_weight: float = 0.1) -> float:
    return _DEFAULT_ENGINE.similarity(
        s1, s2, Algorithm.JARO_WINKLER,
        case_sensitive=case_sensitive, prefix_weight=prefix_weight,
    )


def tversky(s1: str, s2: str, alpha: float, beta: float, use_words: bool = False,
            case_sensitive: bool = True, ngram_size: int = 2) -> float:
    from .config import Preprocessing

    return _DEFAULT_ENGINE.similarity(
        s1, s2, Algorithm.TVERSKY, alpha=alpha, beta=beta,
        preprocessing=Preprocessing.WORD if use_words else Preprocessing.NGRAM,
        case_sensitive=case_sensitive, ngram_size=ngram_size,
    )


def register_sql_functions(
    spark: SparkSession, prefix: str = "tsn", **config_overrides
) -> list[str]:
    """Register every reference kernel as a SQL-callable function —
    ``tsn_sim_jaccard(s1, s2)``, ``tsn_dist_levenshtein(s1, s2)``, … —
    so the reference's programmatic API (index.js ``similarity(s1, s2,
    config)``) is reachable from plain ``spark.sql`` strings, views,
    and BI tools, not only from the DataFrame API.  One Arrow-batched
    pandas UDF per (kernel, channel); kernel semantics and edge rules
    are the same scalar functions the DataFrame path uses
    (functions/kernels.py), so SQL and DataFrame callers cannot
    diverge.  ``config_overrides`` fix the AlgorithmConfig for every
    registered function (e.g. ``ngram_size=2, case_sensitive=False``);
    register twice with different prefixes for different configs.

    Returns the registered function names.  Scale note: these are the
    slow-path per-pair kernels — for joins over corpora, use the
    candidate-generation operators; this surface exists for ad-hoc SQL
    and for verifying small candidate sets in SQL pipelines."""
    from .config import Algorithm
    from .functions.spark_udfs import distance_udf, similarity_udf

    names: list[str] = []
    for algo in Algorithm:
        cfg_kw = dict(config_overrides)
        if algo is Algorithm.TVERSKY and "alpha" not in cfg_kw:
            cfg_kw.update(alpha=0.5, beta=0.5)  # reference's symmetric default
        cfg = AlgorithmConfig(algorithm=algo, **cfg_kw)
        key = algo.name.lower()
        sim_name = f"{prefix}_sim_{key}"
        spark.udf.register(sim_name, similarity_udf(cfg))
        names.append(sim_name)
        dist_name = f"{prefix}_dist_{key}"
        spark.udf.register(dist_name, distance_udf(cfg))
        names.append(dist_name)
    from .functions.sql_udtf import register_sql_udtfs

    names.extend(register_sql_udtfs(spark, prefix=prefix))
    return names
