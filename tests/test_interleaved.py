"""Interleaved text+media curation (operators/interleaved.py): span
profile stats, MMC4-style caption assignment, media-sequence dedupe,
and the OBELICS gate — over hand-built span docs AND the real
generated corpus (the engine's fetch-join table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.interleaved import (
    caption_candidates,
    interleave_gate,
    interleave_stats,
    media_sequence_dedup,
    media_sequence_fingerprint,
)

SPAN_SCHEMA = (
    "doc_id string, spans array<struct<"
    "kind string, text string, media_ref string, offset int>>"
)


def _doc(doc_id, *spans):
    return (
        doc_id,
        [
            {"kind": k, "text": t, "media_ref": m, "offset": i}
            for i, (k, t, m) in enumerate(spans)
        ],
    )


def t(text):
    return ("text", text, None)


def img(ref):
    return ("media", None, ref)


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            # text, img, text, img, img, text  — run of 2, all captioned
            _doc("a", t("hello world"), img("i1"), t("mid"), img("i2"),
                 img("i3"), t("tail")),
            # trailing image -> uncaptioned; leading image
            _doc("b", img("i1"), t("x"), img("i9")),
            # no media at all (text mass >= 20 so only no_media fires)
            _doc("c", t("only text here, quite a lot of it")),
            # same ordered media sequence as doc a (text differs)
            _doc("d", t("zzz"), img("i1"), img("i2"), img("i3")),
        ],
        SPAN_SCHEMA,
    )


def test_interleave_stats(docs):
    rows = {r["doc_id"]: r for r in interleave_stats(docs).collect()}
    a = rows["a"]
    assert (a["n_spans"], a["n_text"], a["n_media"]) == (6, 3, 3)
    assert a["n_media_distinct"] == 3
    assert a["text_chars"] == len("hello world") + len("mid") + len("tail")
    assert rows["c"]["text_chars"] == len("only text here, quite a lot of it")
    assert a["media_share"] == pytest.approx(0.5)
    assert a["max_media_run"] == 2
    assert not a["media_leading"]
    b = rows["b"]
    assert b["media_leading"] and b["max_media_run"] == 1
    c = rows["c"]
    assert c["n_media"] == 0 and c["media_share"] == 0.0
    assert c["max_media_run"] == 0 and not c["media_leading"]


def test_caption_candidates(docs):
    got = {
        (r["doc_id"], r["media_ref"]): r
        for r in caption_candidates(docs).collect()
    }
    assert got[("a", "i1")]["caption"] == "mid"
    assert got[("a", "i1")]["caption_gap"] == 1
    # i2 and i3 are consecutive; both caption to the SAME following text
    assert got[("a", "i2")]["caption"] == "tail"
    assert got[("a", "i2")]["caption_gap"] == 2
    assert got[("a", "i3")]["caption"] == "tail"
    # trailing media has a NULL caption row (kept, not dropped)
    assert got[("b", "i9")]["caption"] is None
    assert got[("b", "i9")]["caption_gap"] is None
    # doc c contributes no rows
    assert not any(k[0] == "c" for k in got)


def test_media_sequence_dedup(docs):
    fp = {
        r["doc_id"]: r
        for r in media_sequence_fingerprint(docs).collect()
    }
    assert fp["a"]["media_seq_key"] == fp["d"]["media_seq_key"]
    assert fp["c"]["media_seq_key"] is None
    groups = media_sequence_dedup(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["keeper"] == "a" and g["n_docs"] == 2 and g["n_media"] == 3


def test_interleave_gate_reasons(docs):
    rows = {r["doc_id"]: r for r in interleave_gate(docs).collect()}
    assert rows["c"]["fail_reasons"] == "no_media"
    # doc d: media_share 0.75 > 0.5, run of 3 > 2, text 3 chars < 20
    assert rows["d"]["fail_reasons"] == (
        "media_heavy|media_wall|too_little_text"
    )
    assert not rows["d"]["keep"]
    # doc a: share exactly 0.5 (not >), run 2 (not >2), text 18 < 20
    assert rows["a"]["fail_reasons"] == "too_little_text"


def lnk(url):
    return ("link", url, None)


def test_anchor_candidates(spark):
    from tspider_spark.operators.interleaved import anchor_candidates

    docs = spark.createDataFrame(
        [
            # leading link (no preceding text) -> NULL anchor;
            # two links after the same text share its anchor; the
            # second text span wins for the last link (NEAREST wins)
            _doc(
                "a",
                lnk("http://h1.com/p/0"),
                t("intro"),
                lnk("http://h1.com/p/1"),
                lnk("http://h2.com/p/2"),
                t("later"),
                lnk("http://h2.com/p/3"),
            ),
            # no links at all -> contributes no rows
            _doc("b", t("just text")),
        ],
        SPAN_SCHEMA,
    )
    got = {
        (r["doc_id"], r["target"]): r
        for r in anchor_candidates(docs).collect()
    }
    assert len(got) == 4
    assert got[("a", "http://h1.com/p/0")]["anchor"] is None
    assert got[("a", "http://h1.com/p/0")]["anchor_gap"] is None
    assert got[("a", "http://h1.com/p/1")]["anchor"] == "intro"
    assert got[("a", "http://h1.com/p/1")]["anchor_gap"] == 1
    assert got[("a", "http://h2.com/p/2")]["anchor"] == "intro"
    assert got[("a", "http://h2.com/p/2")]["anchor_gap"] == 2
    # nearest PRECEDING text, not the first one in the doc
    assert got[("a", "http://h2.com/p/3")]["anchor"] == "later"
    assert not any(k[0] == "b" for k in got)


def test_anchor_profiles(spark):
    from tspider_spark.operators.interleaved import (
        anchor_candidates,
        anchor_profiles,
    )

    docs = spark.createDataFrame(
        [
            _doc(
                "a",
                lnk("http://h1.com/p/0"),  # unanchored
                t("buy"),
                lnk("http://h1.com/p/1"),
                lnk("http://h1.com/p/2"),
                t("ads"),
                lnk("http://h1.com/p/3"),
            ),
            _doc("b", t("ads"), lnk("http://h1.com/p/9"),
                 t("zz"), lnk("http://h2.com/p/0")),
        ],
        SPAN_SCHEMA,
    )
    rows = {
        r["host"]: r
        for r in anchor_profiles(anchor_candidates(docs)).collect()
    }
    h1 = rows["h1.com"]
    assert h1["n_links"] == 5
    assert h1["n_docs"] == 2
    assert h1["n_anchored"] == 4  # the leading link is unanchored
    assert h1["n_distinct_anchors"] == 2
    # 'ads' (2) vs 'buy' (2): tie broken by anchor text ascending
    assert h1["top_anchor"] == "ads"
    assert h1["top_anchor_n"] == 2
    assert h1["anchored_frac"] == 0.8
    h2 = rows["h2.com"]
    assert h2["n_links"] == 1 and h2["top_anchor"] == "zz"


def test_anchor_authority_scores_rank_diverse_over_farmed(spark):
    """The anchor→authority bridge: a host with diverse referrer text
    outranks a link farm (one anchor repeated) and a bare-link host,
    end-to-end through schedule.rank_hosts_by_score."""
    from tspider_spark.operators.interleaved import (
        anchor_authority_scores,
        anchor_candidates,
        anchor_profiles,
    )
    from tspider_spark.operators.schedule import rank_hosts_by_score

    def doc(i, host, anchors):
        spans = []
        for j, a in enumerate(anchors):
            if a is not None:
                spans.append(t(a))
            spans.append(lnk(f"http://{host}/p/{i}-{j}"))
        return _doc(f"d{host}{i}", *spans)

    docs = spark.createDataFrame(
        [
            # diverse.com: 3 links, 3 distinct anchors
            doc(0, "diverse.com", ["alpha", "beta", "gamma"]),
            # farm.com: 3 links, one repeated anchor
            doc(0, "farm.com", ["spam", "spam", "spam"]),
            # bare.com: 3 links, never anchored (leading links only)
            doc(0, "bare.com", [None, None, None]),
        ],
        SPAN_SCHEMA,
    )
    scores = anchor_authority_scores(
        anchor_profiles(anchor_candidates(docs))
    )
    by_host = {r["hostname"]: r["score"] for r in scores.collect()}
    assert by_host["diverse.com"] > by_host["farm.com"] > by_host["bare.com"]
    assert by_host["bare.com"] == 0.0
    pr = {
        r["hostname"]: r["priority"]
        for r in rank_hosts_by_score(scores).collect()
    }
    assert pr["diverse.com"] < pr["farm.com"] < pr["bare.com"]


def test_media_frequency_filter(docs):
    """i1 appears in 3 docs (site furniture at cap 2) and is cut
    everywhere; i2/i3 (2 docs) and i9 (1 doc) survive; text spans and
    media-free docs are untouched."""
    from tspider_spark.operators.interleaved import (
        media_doc_frequency,
        media_frequency_filter,
    )

    df = {r["media_ref"]: r["doc_freq"]
          for r in media_doc_frequency(docs).collect()}
    assert df == {"i1": 3, "i2": 2, "i3": 2, "i9": 1}
    out = {r["doc_id"]: r for r in media_frequency_filter(docs, 2).collect()}
    refs = {
        k: [s["media_ref"] for s in v["spans"] if s["kind"] == "media"]
        for k, v in out.items()
    }
    assert refs == {"a": ["i2", "i3"], "b": ["i9"], "c": [],
                    "d": ["i2", "i3"]}
    assert (out["a"]["n_media_before"], out["a"]["n_media_dropped"]) == (3, 1)
    assert (out["c"]["n_media_before"], out["c"]["n_media_dropped"]) == (0, 0)
    # text spans untouched, original offsets preserved
    a_text = [(s["text"], s["offset"]) for s in out["a"]["spans"]
              if s["kind"] == "text"]
    assert a_text == [("hello world", 0), ("mid", 2), ("tail", 5)]


def test_boilerplate_text_filter(spark):
    """'nav' recurs in 3 of host A's 3 docs (>= ceil(0.5*3)=2 and
    >= min_docs) and is cut from all of them; unique prose survives;
    host B's single doc is protected by the min_docs floor even though
    any text there trivially hits 100% frequency."""
    from tspider_spark.operators.interleaved import boilerplate_text_filter

    rows = [
        _doc("a1", t("nav"), t("unique one"), img("i1")),
        _doc("a2", t("nav"), t("other prose")),
        _doc("a3", t("nav"), t("third body"), t("unique one")),
        _doc("b1", t("nav"), t("solo page")),
    ]
    df = spark.createDataFrame(rows, SPAN_SCHEMA).withColumn(
        "host", F.substring("doc_id", 1, 1)
    )
    out = {r["doc_id"]: r for r in
           boilerplate_text_filter(df, "host", min_docs=2, min_frac=0.5)
           .collect()}
    texts = {
        k: [s["text"] for s in v["spans"] if s["kind"] == "text"]
        for k, v in out.items()
    }
    # 'unique one' is in 2 of 3 host-a docs = ceil(0.5*3)=2 -> also cut
    assert texts == {
        "a1": [], "a2": ["other prose"], "a3": ["third body"],
        "b1": ["nav", "solo page"],
    }
    assert (out["a1"]["n_text_before"], out["a1"]["n_text_dropped"]) == (2, 2)
    # media spans untouched
    assert [s["media_ref"] for s in out["a1"]["spans"]] == ["i1"]


def test_interleaved_over_generated_corpus(spark):
    """The operators run over the REAL corpus table (the same frame
    the crawl fetch join reads): stats cover every doc, captions
    reference only genuine media spans, and the gate's keep column
    is consistent with the stats."""
    from tspider_spark.sources.corpus import (
        CorpusSpec,
        corpus_to_spark,
        generate_corpus,
    )

    docs_py, _ = generate_corpus(CorpusSpec(seed=7, n_domains=3))
    docs = corpus_to_spark(spark, docs_py)
    n_docs = docs.count()

    st = interleave_stats(docs)
    assert st.count() == n_docs
    bad = st.filter(
        (F.col("n_text") + F.col("n_media") > F.col("n_spans"))
        | (F.col("media_share") < 0)
        | (F.col("media_share") > 1)
        | (F.col("max_media_run") > F.col("n_media"))
    )
    assert bad.count() == 0

    caps = caption_candidates(docs)
    n_media_total = st.agg(F.sum("n_media")).collect()[0][0]
    assert caps.count() == n_media_total  # one row per media span

    gate = interleave_gate(docs)
    disagree = gate.filter(
        (F.col("keep") & (F.col("fail_reasons") != ""))
        | (~F.col("keep") & (F.col("fail_reasons") == ""))
    )
    assert disagree.count() == 0

    # anchor plumbing over the REAL corpus: one row per link span, and
    # every link is anchored (each generated page opens with a text
    # span, so no link lacks a preceding text)
    from tspider_spark.operators.interleaved import (
        anchor_candidates,
        anchor_profiles,
    )

    anchors = anchor_candidates(docs)
    n_links_total = docs.select(
        F.explode("spans").alias("s")
    ).filter(F.col("s.kind") == "link").count()
    assert anchors.count() == n_links_total
    assert anchors.filter(F.col("anchor").isNull()).count() == 0
    prof = anchor_profiles(anchors)
    assert prof.filter(
        (F.col("host") == "") | (F.col("n_anchored") != F.col("n_links"))
    ).count() == 0


def test_pack_sequences_string_ids(spark):
    """The crawl corpus keys docs by URL (string ids): the cumsum
    bucketing must fall back to the order-preserving prefix bucket and
    produce the same layout as a manual cumulative sum in id order."""
    from tspider_spark.operators.curate import pack_sequences

    rows = [
        (f"http://site{i % 3}.com/p/{i:04d}", "all", 10 + (i * 7) % 30)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id string, lang string, n_tokens int")
    got = {
        r["doc_id"]: r["start_tok"]
        for r in pack_sequences(df, 64, stratum_col="lang").collect()
    }
    cum = 0
    for doc_id, _, n in sorted(rows):
        assert got[doc_id] == cum
        cum += n
