"""SQL-callable table function for the reference tokenizers.

Completes the pure-SQL surface (engine.register_sql_functions gives scalar
kernels; this gives the row-generating half): ``tsn_tokenize(text, mode, n,
case_sensitive)`` explodes a string into its reference-semantics tokens with
positions, usable in LATERAL position from any ``spark.sql`` string:

    SELECT d.doc_id, t.pos, t.token
    FROM docs d, LATERAL tsn_tokenize(d.text, 'ngram', 3, true) t

Token semantics are the same functions the DataFrame path uses
(functions/tokenize.py — reference base_algorithm.cpp:128-205 rules,
including the len<n whole-string shingle rule and the ASCII word-boundary
class), so the SQL spelling cannot drift from engine semantics.

Arrow-optimized (useArrow=True): batch transfer, not per-row pickling.
Scale note: a UDTF runs where the row lives — no shuffle is introduced;
output cardinality is the token count, the same as the DataFrame
explode(shingles(...)) path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from ..config import AlgorithmConfig, Preprocessing
from .tokenize import tokenize

_MODES = {
    "character": Preprocessing.CHARACTER,
    "word": Preprocessing.WORD,
    "ngram": Preprocessing.NGRAM,
    "none": Preprocessing.NONE,
}


@udtf(returnType="pos int, token string", useArrow=True)
class TsnTokenize:
    def eval(self, text: str, mode: str = "word", n: int = 2,
             case_sensitive: bool = True):
        if text is None:
            return
        try:
            prep = _MODES[mode.lower()]
        except KeyError:
            raise ValueError(
                f"tsn_tokenize: unknown mode {mode!r} (one of {sorted(_MODES)})"
            ) from None
        cfg = AlgorithmConfig(
            preprocessing=prep, ngram_size=n, case_sensitive=case_sensitive
        )
        for i, tok in enumerate(tokenize(text, cfg)):
            yield i, tok


def register_sql_udtfs(spark, prefix: str = "tsn") -> list[str]:
    name = f"{prefix}_tokenize"
    spark.udtf.register(name, TsnTokenize)
    return [name]
