"""incremental (wave-proportional) LSH dedupe against a persisted index."""

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.textdedup import (
    band_buckets,
    incremental_lsh_dups,
    minhash_lsh_dups,
    minhash_signatures,
    shingles,
)

BASE = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "one two three four five six seven eight nine ten"),
    (3, "red orange yellow green blue indigo violet pink brown black"),
    (4, "red orange yellow green blue indigo violet pink brown black"),  # old-old dup
    (5, "north south east west up down left right in out"),
]
NEW = [
    (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 1
    (102, "totally fresh content nothing like anything else here now"),
    (103, "one two three four five six seven eight nine ten"),  # dup of 2
    (104, "totally fresh content nothing like anything else here now"),  # dup of 102
]


@pytest.fixture(scope="module")
def frames(spark):
    old = spark.createDataFrame(BASE, ["doc_id", "text"])
    new = spark.createDataFrame(NEW, ["doc_id", "text"])
    return old, new


def test_incremental_pairs(spark, frames):
    old, new = frames
    got = {
        (r.ia, r.ib)
        for r in incremental_lsh_dups(old, new, n=3, tau=0.9).collect()
    }
    # old-new dups + new-new dup; the old-old pair (3,4) must NOT appear
    assert got == {(1, 101), (2, 103), (102, 104)}


def test_matches_full_rerun_filtered(spark, frames):
    old, new = frames
    inc = {
        (r.ia, r.ib, r.jaccard)
        for r in incremental_lsh_dups(old, new, n=3, tau=0.9).collect()
    }
    new_ids = {r[0] for r in NEW}
    full = {
        (r.ia, r.ib, r.jaccard)
        for r in minhash_lsh_dups(old.unionByName(new), n=3, tau=0.9).collect()
        if r.ia in new_ids or r.ib in new_ids
    }
    assert inc == full


def test_persisted_index_path_equal(spark, frames):
    old, new = frames
    idx = band_buckets(minhash_signatures(shingles(old, 3), 32))
    via_idx = {
        tuple(r)
        for r in incremental_lsh_dups(
            old, new, n=3, tau=0.9, old_buckets=idx
        ).collect()
    }
    recomputed = {
        tuple(r) for r in incremental_lsh_dups(old, new, n=3, tau=0.9).collect()
    }
    assert via_idx == recomputed


def test_wave_invariant(spark, frames):
    """old_dups(old) ∪ incremental(old, new) == full_dups(old ∪ new)."""
    old, new = frames
    old_pairs = {
        tuple(r) for r in minhash_lsh_dups(old, n=3, tau=0.9).collect()
    }
    inc_pairs = {
        tuple(r)
        for r in incremental_lsh_dups(old, new, n=3, tau=0.9).collect()
    }
    full = {
        tuple(r)
        for r in minhash_lsh_dups(old.unionByName(new), n=3, tau=0.9).collect()
    }
    assert old_pairs | inc_pairs == full


def test_new_side_scan_excludes_uncollided_old(spark, frames):
    """The verify step's old-corpus touch is candidate-bounded: an old
    doc with no band collision never reaches the shingle join (checked
    through the row count of the semi-joined scan)."""
    old, new = frames
    new_sh = shingles(new, 3)
    new_bk = band_buckets(minhash_signatures(new_sh, 32))
    old_bk = band_buckets(minhash_signatures(shingles(old, 3), 32))
    collided = (
        old_bk.join(
            new_bk.select("band", "bucket").distinct(), ["band", "bucket"]
        )
        .select("doc_id")
        .distinct()
        .collect()
    )
    ids = {r.doc_id for r in collided}
    assert 5 not in ids  # unique old doc never collides
    assert {1, 2} <= ids
