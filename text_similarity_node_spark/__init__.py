"""text_similarity_node_spark — a PySpark-native near-duplicate detection
and clustering engine with the similarity semantics of
``piotrmaciejbednarski/text-similarity-node``.

The reference is a single-node C++ kernel library (string pair in, number
out).  This engine re-expresses those kernels as vectorized Arrow/pandas UDFs
and built-in Spark SQL expressions, and adds the distributed machinery the
reference lacks: shingling, MinHash/LSH and SimHash candidate generation with
salted skew-aware joins, an exact prefix-filter similarity join, suffix-based
containment, connected-components clustering, lineage/metrics, and
checkpoint-based resume — designed for an Iceberg/Parquet table of audio
clip + transcript pairs at web scale.

Public API surface (mirrors the reference exports, index.js / index.d.ts):

>>> from text_similarity_node_spark import similarity, distance, AlgorithmConfig
>>> similarity("hello", "hallo", AlgorithmConfig())   # 0.8
"""

from .config import (  # noqa: F401
    ALGORITHM_IDS,
    Algorithm,
    AlgorithmConfig,
    PipelineConfig,
    Preprocessing,
)
from .functions import distance, fold_string, ngrams, similarity, tokenize, words  # noqa: F401

__version__ = "0.1.0"


def get_supported_algorithms() -> list[str]:
    """Registry enumeration, mirroring ``getSupportedAlgorithms``
    (``/root/reference/src/core/algorithm_factory.cpp:30-47``)."""
    return [a.value for a in Algorithm]


def parse_algorithm(name_or_id) -> Algorithm:
    """Name/id -> Algorithm, mirroring ``parseAlgorithmType``
    (``/root/reference/src/bindings/node_bindings.cpp:729-820``)."""
    if isinstance(name_or_id, Algorithm):
        return name_or_id
    if isinstance(name_or_id, int):
        for algo, i in ALGORITHM_IDS.items():
            if i == name_or_id:
                return algo
        raise ValueError(f"unknown algorithm id {name_or_id}")
    key = str(name_or_id).strip().lower().replace("-", "_").replace(" ", "_")
    aliases = {
        "damerau": Algorithm.DAMERAU_LEVENSHTEIN,
        "dice": Algorithm.SORENSEN_DICE,
        "jarowinkler": Algorithm.JARO_WINKLER,
    }
    if key in aliases:
        return aliases[key]
    return Algorithm(key)
