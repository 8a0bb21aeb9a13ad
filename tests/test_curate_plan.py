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


def test_pipeline_with_holdout_split(spark, corpus):
    stages = curate_corpus(
        corpus, weights=None, dedupe_tau=0.8, seq_tokens=32,
        split_weights={"train": 14, "valid": 1, "test": 1},
    )
    split_rows = stages["split"].collect()
    # the split stage covers exactly the deduped survivors
    assert {r.doc_id for r in split_rows} == {1, 3}
    assert all(r.split in ("train", "valid", "test") for r in split_rows)
    train_ids = {r.doc_id for r in split_rows if r.split == "train"}
    # only the training split is packed; eval docs stay documents
    assert {r.doc_id for r in stages["packed"].collect()} == train_ids


# ---------------------------------------------------------------------------
# interleaved front-end (OBELICS shape): span gate -> media-seq dedupe
# -> captions -> flatten -> text pipeline


def test_interleaved_pipeline(spark):
    from tspider_spark.plans.curate import curate_interleaved_corpus

    far = (
        GOOD.replace("fox", "hare").replace("dog", "cat")
        .replace("farmer", "keeper").replace("jump", "leap")
        .replace("field", "meadow").replace("fence", "hedge")
        .replace("gate", "door").replace("evening", "morning")
        .replace("day", "week").replace("story", "tale")
        .replace("rest", "sleep")
    )
    half = len(GOOD.split()) // 2
    g1 = " ".join(GOOD.split()[:half])
    g2 = " ".join(GOOD.split()[half:])

    def doc(doc_id, *spans):
        return (
            doc_id,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": i}
                for i, (k, t, m) in enumerate(spans)
            ],
        )

    t = lambda x: ("text", x, None)
    img = lambda r: ("media", None, r)
    docs = spark.createDataFrame(
        [
            # 1: GOOD split across two text spans, media m1/m2 captioned
            doc(1, t(g1), img("m1"), t(g2), img("m2"), t("fin")),
            # 2: image wall (run of 3) -> span gate drops it
            doc(2, t(g1), img("m1"), img("m2"), img("m3"), t(g2)),
            # 3: same ordered media sequence as 1 -> seq dedupe drops it
            doc(3, t(far + " extra"), img("m1"), t("mid"), img("m2")),
            # 4: different media, but flattens to 1's exact text
            doc(4, t(g1 + " " + g2), img("m9"), t("fin")),
            # 5: text-only doc (min_media=0 keeps it)
            doc(5, t(far)),
        ],
        "doc_id long, spans array<struct<"
        "kind string, text string, media_ref string, offset int>>",
    )

    stages = curate_interleaved_corpus(docs, dedupe_tau=0.8, seq_tokens=32)
    gate = {r.doc_id: r.keep for r in stages["span_gate"].collect()}
    assert gate == {1: True, 2: False, 3: True, 4: True, 5: True}
    assert {r.doc_id for r in stages["seq_deduped"].collect()} == {1, 4, 5}

    caps = stages["captions"].collect()
    assert {(r.doc_id, r.media_ref) for r in caps} == {
        (1, "m1"), (1, "m2"), (4, "m9")
    }
    assert all(r.caption is not None for r in caps)

    flat = {r.doc_id: r.text for r in stages["flattened"].collect()}
    assert flat[1] == GOOD + " fin"
    assert flat[4] == GOOD + " fin"  # the planted exact-text copy
    # exact dedupe keeps min id of the 1/4 pair; 5 is far enough to stay
    assert {r.doc_id for r in stages["deduped"].collect()} == {1, 5}
    assert {r.doc_id for r in stages["packed"].collect()} == {1, 5}


def test_interleaved_pipeline_furniture_cuts(spark):
    """The opt-in furniture stages run BEFORE the gate: a sitewide
    logo (media in every doc) no longer counts as an image wall, and
    a repeated nav text span no longer contributes text mass."""
    from tspider_spark.plans.curate import curate_interleaved_corpus

    def doc(doc_id, *spans):
        return (
            doc_id,
            [
                {"kind": k, "text": t, "media_ref": m, "offset": i}
                for i, (k, t, m) in enumerate(spans)
            ],
        )

    t = lambda x: ("text", x, None)
    img = lambda r: ("media", None, r)
    def prose(i):
        return ("a genuinely long body of unique prose for document %d " % i) * 3

    docs = spark.createDataFrame(
        [
            # logo + banner + content image = run of 3 (gate would drop
            # it) but logo/banner are sitewide furniture
            doc(1, t("nav bar"), img("logo"), img("banner"), img("m1"),
                t(prose(1))),
            doc(2, t("nav bar"), img("logo"), img("banner"), t(prose(2))),
            doc(3, t("nav bar"), img("logo"), img("banner"), t(prose(3))),
        ],
        "doc_id long, spans array<struct<"
        "kind string, text string, media_ref string, offset int>>",
    )
    docs = docs.withColumn("host", F.lit("h"))
    stages = curate_interleaved_corpus(
        docs.select("doc_id", "spans", "host"),
        media_max_doc_freq=2,
        boilerplate_group_col="host",
        dedupe_tau=0.8, seq_tokens=32, min_words=5,
    )
    gate = {r.doc_id: r.keep for r in stages["span_gate"].collect()}
    assert gate == {1: True, 2: True, 3: True}
    flat = {r.doc_id: r.text for r in stages["flattened"].collect()}
    assert all("nav bar" not in x for x in flat.values())
    caps = {(r.doc_id, r.media_ref)
            for r in stages["captions"].collect()}
    assert caps == {(1, "m1")}  # logo/banner never reach captioning
    # without the cuts, doc 1 is an image wall and every doc carries nav
    plain = curate_interleaved_corpus(
        docs.select("doc_id", "spans"), dedupe_tau=0.8, seq_tokens=32,
        min_words=5,
    )
    pgate = {r.doc_id: r.keep for r in plain["span_gate"].collect()}
    assert pgate[1] is False
