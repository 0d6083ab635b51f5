"""Ed-Join-style prefix-filtered edit-distance join: exactness (recall 1.0
by construction) against brute-force Levenshtein, including the short-string
pool (records whose q-gram multiset can be wiped out by max_dist edits) and
grouped (per-lang) runs."""

import itertools
import random

from text_similarity_node_spark.operators.simjoin import prefix_filter_editdist_join


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute(rows, d, group_idx=None):
    out = {}
    for r1, r2 in itertools.combinations(rows, 2):
        if group_idx is not None and r1[group_idx] != r2[group_idx]:
            continue
        dist = _lev(r1[1], r2[1])
        if dist <= d:
            i1, i2 = sorted((r1[0], r2[0]))
            out[(i1, i2)] = dist
    return out


def _mutate(s: str, n_ops: int, rng: random.Random) -> str:
    alpha = "abcdefgh "
    for _ in range(n_ops):
        if not s:
            s = rng.choice(alpha)
            continue
        op = rng.randrange(3)
        pos = rng.randrange(len(s))
        if op == 0:
            s = s[:pos] + rng.choice(alpha) + s[pos:]
        elif op == 1:
            s = s[:pos] + s[pos + 1:]
        else:
            s = s[:pos] + rng.choice(alpha) + s[pos + 1:]
    return s


def _run(spark, rows, d, groups=None):
    schema = "rid int, txt string" + (", lang string" if groups else "")
    df = spark.createDataFrame(rows, schema)
    got = {
        (r.id1, r.id2): r.dist
        for r in prefix_filter_editdist_join(
            df, "rid", "txt", max_dist=d, group_cols=groups
        ).collect()
    }
    want = _brute(rows, d, group_idx=2 if groups else None)
    assert got == want


def test_exact_recall_planted_variants(spark):
    rng = random.Random(11)
    alpha = "abcdefgh "
    rows = []
    for i in range(80):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(30, 90)))
        rows.append((i, base))
        if rng.random() < 0.6:  # planted variant within/at/past the band
            rows.append((i + 1000, _mutate(base, rng.choice([1, 3, 5, 6, 9]), rng)))
    _run(spark, rows, d=5)


def test_short_string_pool_is_lossless(spark):
    # strings short enough that 4 edits can rewrite every trigram occurrence
    # (len - 2 <= 3*4): the prefix join alone could miss these; the pool
    # must catch them — including len < q (zero-gram) records.
    rows = [
        (0, "ab"),            # zero trigrams
        (1, "abcd"),          # 2 occurrences
        (2, "abxd"),          # dist 1 from rid 1
        (3, "zzzzzzzzzz"),    # len 10, 8 occurrences
        (4, "zzzyzzzzzz"),    # dist 1 from rid 3
        (5, "qqqq"),
        (6, ""),              # empty string
        (7, "abce"),
    ]
    _run(spark, rows, d=4)


def test_grouped_pairs_never_cross_groups(spark):
    rng = random.Random(23)
    alpha = "abcdefgh "
    rows = []
    for i in range(60):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(25, 60)))
        lang = rng.choice(["en", "de"])
        rows.append((i, base, lang))
        if rng.random() < 0.5:
            # same text planted in the OTHER group: must not pair
            rows.append((i + 1000, _mutate(base, 2, rng),
                         lang if rng.random() < 0.5 else ("de" if lang == "en" else "en")))
    _run(spark, rows, d=4, groups=["lang"])


def test_identical_and_boundary_distances(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # dist 0
        (2, "the quick brown fox jumped over the lazy dog"),  # dist 2
        (3, "a completely different sentence altogether!!"),
    ]
    got = _run(spark, rows, d=2)
