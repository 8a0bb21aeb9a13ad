"""end-to-end curation plan: normalize -> gates -> dedupe -> pack."""

import pytest
from pyspark.sql import functions as F

from tspider_spark.plans.curate import curate_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and that is the "
    "whole story of his day because with every jump he learns more "
    "about the field and the fence and the farmer who waits at the "
    "gate for the evening feed which is the best part of the day "
    "for all of them in the end they rest"
)  # > 50 words, stopword-rich, mean word length in range


@pytest.fixture(scope="module")
def corpus(spark):
    near = GOOD.replace("farmer", "rancher")
    rows = [
        (1, GOOD),
        (2, "too short to pass the gopher gate"),
        (3, GOOD.replace("fox", "hare").replace("dog", "cat")
            .replace("farmer", "keeper").replace("jump", "leap")
            .replace("field", "meadow").replace("fence", "hedge")
            .replace("gate", "door").replace("evening", "morning")
            .replace("day", "week").replace("story", "tale")
            .replace("road", "path").replace("rest", "sleep")),
        (4, GOOD),          # exact copy of 1 -> dropped at exact dedupe
        (5, near),          # near copy of 1 -> dropped at near dedupe
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_pipeline_stages(spark, corpus):
    from tspider_spark.operators.classify import md5_stub_weights

    stages = curate_corpus(
        corpus,
        weights=md5_stub_weights(spark, 64),
        n_buckets=64,
        quality_threshold=0.0,  # model gate exercised, nothing dropped
        dedupe_tau=0.8,
        seq_tokens=32,
    )
    assert {r.doc_id for r in stages["rule_pass"].collect()} == {1, 3, 4, 5}
    assert {r.doc_id for r in stages["kept_quality"].collect()} == {1, 3, 4, 5}
    assert {r.doc_id for r in stages["exact_kept"].collect()} == {1, 3, 5}
    assert {r.doc_id for r in stages["deduped"].collect()} == {1, 3}

    packed = sorted(stages["packed"].collect(), key=lambda r: r.doc_id)
    assert [r.doc_id for r in packed] == [1, 3]
    # packing covers every surviving doc contiguously in id order
    assert packed[0].start_tok == 0
    toks = {
        r.doc_id: r.n_tokens
        for r in stages["deduped"]
        .withColumn("n_tokens", F.size(F.split(F.trim("text"), r"\s+")))
        .collect()
    }
    assert packed[1].start_tok == toks[1]
    assert packed[0].seq_first == 0


def test_pipeline_without_model_gate(spark, corpus):
    stages = curate_corpus(corpus, weights=None, dedupe_tau=0.8, seq_tokens=32)
    assert "quality" not in stages
    assert {r.doc_id for r in stages["deduped"].collect()} == {1, 3}
