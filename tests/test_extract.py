"""Milestone-1 gate: per-row span invariant (BASELINE.json input_hint).

The Spark extraction plan (explode + codegen exprs + one window) must
produce, for every document, exactly the record sequence the
sequential reference-style extractor produces: same (method, url,
postdata, type) tuples, same order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.extract import extract_candidates
from tspider_spark.plans.oracle import extract_records
from tspider_spark.sources.corpus import CorpusSpec, corpus_to_spark, generate_corpus


@pytest.fixture(scope="module")
def corpus():
    return generate_corpus(CorpusSpec(seed=42, n_domains=4, hosts_per_domain=2))


def test_corpus_deterministic():
    a, seeds_a = generate_corpus(CorpusSpec(seed=7, n_domains=2))
    b, seeds_b = generate_corpus(CorpusSpec(seed=7, n_domains=2))
    assert a == b and seeds_a == seeds_b
    c, _ = generate_corpus(CorpusSpec(seed=8, n_domains=2))
    assert a != c


def test_corpus_has_edge_cases(corpus):
    docs, _ = corpus
    all_text = [t for _, spans in docs for k, t, m, o in spans if t]
    assert any(t.startswith("javascript:") for t in all_text)
    assert any(t.startswith("//") for t in all_text)
    assert any(len(t) >= 1024 for t in all_text)
    assert any("??css" in t for t in all_text)
    assert any(".css" in t for t in all_text)
    assert any("hm.baidu.com" in t for t in all_text)
    kinds = {k for _, spans in docs for k, t, m, o in spans}
    assert kinds == {"text", "link", "form", "media", "request"}


def test_span_sequence_invariant(spark, corpus):
    docs, _ = corpus
    sdf = corpus_to_spark(spark, docs)
    fetched = sdf.select(
        F.col("doc_id").alias("task_url"),
        F.lit(0).alias("depth"),
        F.monotonically_increasing_id().alias("task_rank"),
        "doc_id",
        "spans",
    )
    out = (
        extract_candidates(fetched)
        .select("task_url", "seq", "method", "url", "postdata", "type")
        .collect()
    )
    got: dict = {}
    for r in out:
        got.setdefault(r["task_url"], []).append(
            (r["seq"], r["method"], r["url"], r["postdata"], r["type"])
        )
    for k in got:
        got[k] = [t[1:] for t in sorted(got[k])]

    checked = 0
    nonempty = 0
    for doc_id, spans in docs:
        expected = extract_records(doc_id, spans)
        assert got.get(doc_id, []) == expected, f"mismatch for {doc_id}"
        checked += 1
        nonempty += bool(expected)
    assert checked == len(docs) and nonempty > 0


def test_extraction_edge_doc(spark):
    """Hand-built doc covering every extraction rule at once."""
    spans = [
        ("text", "hello world", None, 0),
        ("link", "http://a.com/x.php#frag", None, 1),     # fragment stripped
        ("link", "//a.com/proto.php", None, 2),            # protocol-relative
        ("link", "javascript:void(0)", None, 3),           # never emitted
        ("link", "relative/x.php", None, 4),               # no scheme: skipped
        ("link", "http://a.com/" + "x" * 1100, None, 5),   # >=1024: skipped
        ("link", "http://a.com/x.php", None, 6),           # dup of 1 post-normalize
        ("media", "http://cdn.a.com/i.jpg", "http://cdn.a.com/i.jpg", 7),
        ("form", "POST http://a.com/login.php?u=x&p=y", None, 8),
        ("form", "GET http://a.com/search.php?", None, 9),  # empty qs: skipped
        ("request", "http://a.com/x.php", None, 10),        # wins fingerprint
        ("request", "http://a.com/ajax.php?id=1", None, 11),
    ]
    expected = [
        # requested section first
        ("GET", "http://a.com/x.php", "", "request"),
        ("GET", "http://a.com/ajax.php?id=1", "", "request"),
        # static section: link at offset 1 deduped against the request fp
        ("GET", "http://a.com/proto.php", "", "static"),
        ("GET", "http://cdn.a.com/i.jpg", "", "static"),
        ("POST", "http://a.com/login.php", "u=x&p=y", "static"),
    ]
    assert extract_records("http://a.com/", spans) == expected

    from tspider_spark.sources.corpus import corpus_to_spark

    sdf = corpus_to_spark(spark, [("http://a.com/", spans)])
    fetched = sdf.select(
        F.col("doc_id").alias("task_url"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("task_rank"),
        "doc_id",
        "spans",
    )
    rows = sorted(
        extract_candidates(fetched)
        .select("seq", "method", "url", "postdata", "type")
        .collect()
    )
    assert [(r["method"], r["url"], r["postdata"], r["type"]) for r in rows] == expected
    # Referer header on static records, empty on requests
    hdr = {
        r["url"]: r["headers"]
        for r in extract_candidates(fetched).select("url", "headers").collect()
    }
    assert hdr["http://a.com/proto.php"] == {"Referer": "http://a.com/"}
    assert hdr["http://a.com/ajax.php?id=1"] == {}
