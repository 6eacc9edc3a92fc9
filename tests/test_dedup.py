"""Dedup-operator guarantees that the DuckDB oracle can't express:
exact recall of the pigeonhole-blocked SimHash Hamming join, on both a
synthetic clustered fingerprint set and the real documents fixture.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from meta_iterative_mapreduce_spark.operators.dedup import (
    _SIMHASH_BITS,
    _SIMHASH_MAX_HAMMING,
    q_dedup_simhash,
    q_dedup_simhash_pairs_cert,
    simhash_fingerprints,
    simhash_hamming_pairs,
)


def _brute_force_pairs(fps: list[tuple[int, int]], max_d: int) -> set:
    out = set()
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            (id_a, fp_a), (id_b, fp_b) = fps[i], fps[j]
            if bin(fp_a ^ fp_b).count("1") <= max_d:
                lo, hi = min(id_a, id_b), max(id_a, id_b)
                out.add((lo, hi))
    return out


def test_simhash_pairs_exact_recall_synthetic(spark):
    """Clustered synthetic fingerprints: 30 base values, each with 6
    perturbations flipping 0-5 random bits — the blocked join must find
    EXACTLY the brute-force Hamming<=3 pair set (flips of 4-5 bits give
    must-NOT-match pairs; the old 2-half-block scheme missed 2+1 splits).
    """
    rng = random.Random(42)
    fps: list[tuple[int, int]] = []
    doc_id = 0
    for _ in range(30):
        base = rng.getrandbits(_SIMHASH_BITS)
        fps.append((doc_id, base))
        doc_id += 1
        for _ in range(6):
            v = base
            for bit in rng.sample(range(_SIMHASH_BITS), rng.randint(0, 5)):
                v ^= 1 << bit
            fps.append((doc_id, v))
            doc_id += 1

    expected = _brute_force_pairs(fps, _SIMHASH_MAX_HAMMING)
    df = spark.createDataFrame(fps, "doc_id long, simhash long")
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_hamming_pairs(df).collect()
    }
    assert got == expected
    assert expected, "fixture must exercise at least one matching pair"


def test_simhash_pairs_exact_recall_on_documents(spark, sf_dir):
    """End-to-end on the real fixture: the FULL-corpus blocked pair
    set equals brute force over the actual document fingerprints
    (the _cert twin certifies the same property on a budget-bounded
    sample — assert its flags too)."""
    from meta_iterative_mapreduce_spark.io import load_table

    fp_df = simhash_fingerprints(load_table(spark, sf_dir, "documents"))
    fps = [(r.doc_id, r.simhash) for r in fp_df.collect()]
    expected = _brute_force_pairs(fps, _SIMHASH_MAX_HAMMING)
    got = {
        (r.doc_a, r.doc_b)
        for r in simhash_hamming_pairs(fp_df).collect()
    }
    assert got == expected
    cert = q_dedup_simhash_pairs_cert(spark, sf_dir).collect()[0]
    assert cert["blocking_exact_on_sample"] is True
    assert cert["fingerprints_in_range"] is True
    assert cert["n_docs"] == len(fps)


def test_simhash_cert_sample_modulus_tracks_pair_budget():
    """VERDICT r13 item 2: the certification sample modulus must be
    DERIVED from the pair budget — C(ceil(n/mod), 2) stays within ~2×
    of the budget at any corpus size (the old constant mod 37 made
    the brute-force arm O(n²) in fixture growth)."""
    from meta_iterative_mapreduce_spark.operators.dedup import (
        _SIMHASH_CERT_PAIR_BUDGET,
        simhash_cert_mod,
    )

    for n in (10, 500, 5_000, 50_000, 5_000_000, 500_000_000):
        mod = simhash_cert_mod(n)
        sample = -(-n // mod)  # ceil
        pairs = sample * (sample - 1) // 2
        assert pairs <= 2 * _SIMHASH_CERT_PAIR_BUDGET, (n, mod, pairs)


def test_simhash_mutation_certification_flags(spark, sf_dir):
    """The registered q_dedup_simhash (hash-oracled in r14, VERDICT
    r13 item 4) pins two exact theorems on a budget-bounded sample:
    duplicate-token clones keep the fingerprint identical, and a
    one-token substitution flips only bits whose original |vote| ≤ 2."""
    row = q_dedup_simhash(spark, sf_dir).collect()[0]
    assert row["fingerprints_in_range"] is True
    assert row["clone_fp_identical"] is True
    assert row["mutation_within_margin"] is True
    assert 0 < row["n_sample_docs"] <= row["n_docs"]


def test_simhash_pairs_hamming_column_is_true_distance(spark):
    fps = [(1, 0b1011), (2, 0b1010), (3, 0b1011 ^ (1 << (_SIMHASH_BITS - 1)))]
    df = spark.createDataFrame(fps, "doc_id long, simhash long")
    rows = {(r.doc_a, r.doc_b): r.hamming for r in simhash_hamming_pairs(df).collect()}
    assert rows[(1, 2)] == 1
    assert rows[(1, 3)] == 1
    assert rows[(2, 3)] == 2


# --- fuzzy edit-distance-1 entity resolution (deletion neighborhoods) ---


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fuzzy_ed1_pairs_exact_recall_synthetic(spark):
    """Random short strings plus planted substitution / insertion /
    deletion / equality neighbors: the deletion-neighborhood join must
    find EXACTLY the brute-force Levenshtein<=1 pair set (including
    must-NOT-match pairs at distance 2)."""
    from meta_iterative_mapreduce_spark.operators.dedup import fuzzy_ed1_pairs

    rng = random.Random(7)
    alpha = "abcde"
    names: list[str] = []
    for _ in range(40):
        base = "".join(rng.choice(alpha) for _ in range(rng.randint(3, 8)))
        names.append(base)
        p = rng.randrange(len(base))
        names.append(base[:p] + rng.choice(alpha) + base[p + 1 :])  # subst
        names.append(base[:p] + base[p + 1 :])  # deletion
        names.append(base[:p] + rng.choice(alpha) + base[p:])  # insertion
        names.append(base)  # exact duplicate
    rows = list(enumerate(names))
    expect = {
        (i, j)
        for i, a in rows
        for j, b in rows
        if i < j and _levenshtein(a, b) <= 1
    }
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r.id_a, r.id_b)
        for r in fuzzy_ed1_pairs(df, "id", "name").collect()
    }
    assert got == expect and len(expect) > 40


def test_containment_finds_planted_subset(spark, tmp_path):
    """A document fully contained in a longer one must score
    containment exactly 1.0 (10000 e4) — the subset-duplicate case
    Jaccard under-scores (here J = 10/20 = 0.5) — and unrelated docs
    must produce no pair."""
    import pyspark.sql.functions as F

    from meta_iterative_mapreduce_spark import registry

    toks_a = " ".join(f"rare{i}" for i in range(10))
    toks_b = toks_a + " " + " ".join(f"extra{i}" for i in range(10))
    toks_c = " ".join(f"other{i}" for i in range(10))
    df = spark.createDataFrame(
        [
            (1, toks_a, "en", "s", len(toks_a)),
            (2, toks_b, "en", "s", len(toks_b)),
            (3, toks_c, "en", "s", len(toks_c)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "mini")
    df.write.mode("overwrite").parquet(sf + "/documents.parquet")
    rows = {
        (r["doc_a"], r["doc_b"]): r["containment_e4"]
        for r in registry.queries()["q_dedup_containment"](spark, sf).collect()
    }
    assert rows == {(1, 2): 10000}


def test_incremental_dedup_equals_full_recompute(spark, sf_dir):
    """The q_dedup_incremental pair-set contract (its registered form
    is a flag-bearing summary over these pairs):
    corpus-internal pairs + batch-incremental pairs == the full-corpus
    recompute, EXACTLY. Unrounded estimates compared — every value is
    n_agree/32, an exact binary fraction (Spark's HALF_UP and Python's
    banker's rounding disagree on true midpoints like 29/32)."""
    from meta_iterative_mapreduce_spark.io import load_table
    from meta_iterative_mapreduce_spark.operators.dedup import (
        band_rows,
        incremental_band_pairs,
        minhash_band_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 4 != 0)
    batch = docs.filter(F.col("doc_id") % 4 == 0)

    def pairset(df):
        return {
            (r["doc_a"], r["doc_b"], r["jaccard_est"]) for r in df.collect()
        }

    full = pairset(minhash_band_pairs(minhash_signatures(docs).persist()))
    base_pairs = pairset(
        minhash_band_pairs(minhash_signatures(base).persist())
    )
    inc = pairset(
        incremental_band_pairs(
            band_rows(minhash_signatures(batch)).persist(),
            band_rows(minhash_signatures(base)),
        )
    )
    assert base_pairs | inc == full
    assert not (base_pairs & inc)  # incremental never re-finds corpus pairs
    assert inc  # the batch genuinely contributes pairs at this sf
