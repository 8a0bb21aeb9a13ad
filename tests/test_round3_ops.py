"""Round-3 operators: HITS host authority, interpolated bigram LM,
DSIR Gumbel-top-m resampling, URL-pattern trap detection, and int8
scalar-quantized ANN."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tspider_spark.operators.filters import detect_pattern_traps
from tspider_spark.operators.graph import hits
from tspider_spark.operators.quality import bigram_logprob, dsir_resample
from tspider_spark.operators.similarity import (
    brute_force_topk,
    pq_codebooks,
    pq_topk,
    sq_topk,
)


# ---------------------------------------------------------------------------
# HITS


def test_hits_star_graph(spark):
    # hubs h1..h3 all point at authority a; a points nowhere.
    edges = spark.createDataFrame(
        [("h1", "a"), ("h2", "a"), ("h3", "a")], "src string, dst string"
    )
    rows = {r["node"]: r for r in hits(edges, iters=5).collect()}
    assert rows["a"]["authority"] == pytest.approx(1.0)
    assert rows["a"]["hub"] == 0.0
    for h in ("h1", "h2", "h3"):
        assert rows[h]["hub"] == pytest.approx(1 / 3, abs=1e-6)
        assert rows[h]["authority"] == 0.0


def test_hits_scores_sum_to_one(spark):
    edges = spark.createDataFrame(
        [(f"n{i % 7}", f"n{(i * 3 + 1) % 7}") for i in range(30)],
        "src string, dst string",
    ).filter(F.col("src") != F.col("dst"))
    out = hits(edges, iters=10)
    sums = out.agg(F.sum("hub").alias("h"), F.sum("authority").alias("a")).first()
    assert sums["h"] == pytest.approx(1.0, abs=1e-4)
    assert sums["a"] == pytest.approx(1.0, abs=1e-4)


def test_hits_distinguishes_hub_from_authority(spark):
    # d is a directory linking to c1..c3; c1..c3 also link to each
    # other's target c1 -> d has max hub, c1 max authority.
    edges = spark.createDataFrame(
        [("d", "c1"), ("d", "c2"), ("d", "c3"), ("c2", "c1"), ("c3", "c1")],
        "src string, dst string",
    )
    rows = {r["node"]: r for r in hits(edges, iters=10).collect()}
    assert rows["d"]["hub"] == max(r["hub"] for r in rows.values())
    assert rows["c1"]["authority"] == max(r["authority"] for r in rows.values())


# ---------------------------------------------------------------------------
# bigram LM


def test_bigram_logprob_hand_computed(spark):
    # corpus: "a b", "a b", "a c" -> bigrams: (a,b) x2, (a,c) x1
    # cnt_prev(a)=3; unigrams: a:3 b:2 c:1, total=6, vocab=3
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_logprob(docs, lam=0.7).collect()}
    p_ab = 0.7 * (2 / 3) + 0.3 * ((2 + 1) / (6 + 3))
    p_ac = 0.7 * (1 / 3) + 0.3 * ((1 + 1) / (6 + 3))
    assert out[1]["n_bigrams"] == 1
    assert out[1]["bits_per_token"] == pytest.approx(-math.log2(p_ab), abs=1e-6)
    assert out[3]["bits_per_token"] == pytest.approx(-math.log2(p_ac), abs=1e-6)
    # repeated common bigram scores lower (more likely) than the rare one
    assert out[1]["bits_per_token"] < out[3]["bits_per_token"]


def test_bigram_logprob_skips_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    ids = {r["doc_id"] for r in bigram_logprob(docs).collect()}
    assert ids == {3}


# ---------------------------------------------------------------------------
# DSIR resampling


@pytest.fixture(scope="module")
def dsir_pool(spark):
    rows = [(i, ("target words " if i % 3 == 0 else "raw noise ") * 5)
            for i in range(60)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_resample_deterministic_and_sized(spark, dsir_pool):
    tgt = spark.createDataFrame(
        [(1000, "target words target words")], "doc_id long, text string"
    )
    a = dsir_resample(dsir_pool, tgt, m=10).collect()
    b = dsir_resample(dsir_pool, tgt, m=10).collect()
    assert len(a) == 10
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dsir_resample_biased_toward_target(spark, dsir_pool):
    tgt = spark.createDataFrame(
        [(1000, "target words target words")], "doc_id long, text string"
    )
    sel = dsir_resample(dsir_pool, tgt, m=20).collect()
    n_targetlike = sum(1 for r in sel if r["doc_id"] % 3 == 0)
    # 1/3 of the pool is target-like but should dominate the draw
    assert n_targetlike > 10


# ---------------------------------------------------------------------------
# trap detection


def test_detect_pattern_traps(spark):
    rows = []
    # trap.com: every URL its own pattern (session ids the digit
    # normalization can't collapse)
    for i in range(30):
        rows.append(("trap.com", f"http://trap.com/s/x{i}y", f"http://trap.com/s/x{{d}}y{i}"))
    # ok.com: 30 urls collapsing to 2 patterns
    for i in range(30):
        rows.append(("ok.com", f"http://ok.com/p/{i}", f"http://ok.com/p/{{digit}}-{i % 2}"))
    df = spark.createDataFrame(rows, "hostname string, url string, pattern string")
    out = {r["hostname"]: r for r in detect_pattern_traps(
        df, min_urls=20, max_patterns_per_url=0.5).collect()}
    assert out["trap.com"]["is_trap"] is True
    assert out["trap.com"]["n_patterns"] == 30
    assert out["ok.com"]["is_trap"] is False
    assert out["ok.com"]["patterns_per_url"] == pytest.approx(2 / 30, abs=1e-6)
    # below min_urls never flags
    small = detect_pattern_traps(df, min_urls=100, max_patterns_per_url=0.5)
    assert all(not r["is_trap"] for r in small.collect())


# ---------------------------------------------------------------------------
# feature-hashed doc vectors


def test_hashed_doc_vectors_properties(spark):
    from tspider_spark.operators.textstats import hashed_doc_vectors

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),   # exact dup
         (3, "completely different words about spark shuffles here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["vec"] for r in hashed_doc_vectors(df, dim=16).collect()}
    assert len(out[1]) == 16
    assert out[1] == out[2]                      # deterministic
    assert out[1] != out[3]
    for v in out.values():                       # L2-normalized
        assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-9)


def test_hashed_vectors_feed_embedding_ops(spark):
    # the text->vector bridge composes with the embedding dedupe family
    from tspider_spark.operators.similarity import cosine_dup_pairs_lsh
    from tspider_spark.operators.textstats import hashed_doc_vectors

    rows = [(i, f"doc number {chr(97 + i)} with its own unique words w{i} x{i}")
            for i in range(10)]
    rows += [(100 + i, rows[i][1]) for i in range(3)]  # 3 exact dups
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vecs = hashed_doc_vectors(df, dim=32).withColumnRenamed("vec", "embedding")
    vecs = vecs.withColumnRenamed("doc_id", "vec_id")
    pairs = {(r["ia"], r["ib"])
             for r in cosine_dup_pairs_lsh(vecs, tau=0.999, dim=32).collect()}
    assert {(i, 100 + i) for i in range(3)} <= pairs


# ---------------------------------------------------------------------------
# containment


def test_containment_catches_embedded_doc(spark):
    from tspider_spark.operators.textdedup import containment_pairs, ngram_jaccard_dups

    big = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lam mu nu xi omicron pi rho sigma tau upsilon")
    small = "gamma delta epsilon zeta eta theta"  # embedded verbatim
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, other)], "doc_id long, text string"
    )
    got = {(r["ia"], r["ib"]): r["containment"]
           for r in containment_pairs(df, n=3, tau=0.9).collect()}
    # the small doc is fully contained in the big one (directed!)
    assert got == {(2, 1): 1.0}
    # symmetric Jaccard misses it at the same threshold
    assert ngram_jaccard_dups(df, n=3, tau=0.9).collect() == []


def test_containment_direction_and_threshold(spark):
    from tspider_spark.operators.textdedup import containment_pairs

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f g h i j k l m n o p")],
        "doc_id long, text string",
    )
    rows = {(r["ia"], r["ib"]): r["containment"]
            for r in containment_pairs(df, n=3, tau=0.5).collect()}
    assert rows[(1, 2)] == 1.0        # all of 1's shingles appear in 2
    assert (2, 1) not in rows         # 2 is not mostly contained in 1


# ---------------------------------------------------------------------------
# sample packing


def test_pack_sequences_hand_computed(spark):
    from tspider_spark.operators.curate import pack_sequences

    rows = [(1, "en", 100), (2, "en", 300), (3, "en", 250), (4, "en", 0),
            (5, "de", 600)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    out = {r["doc_id"]: r for r in pack_sequences(df, seq_tokens=256).collect()}
    # en: starts 0, 100, 400, 650
    assert (out[1]["start_tok"], out[1]["seq_first"], out[1]["seq_last"],
            out[1]["seq_offset"]) == (0, 0, 0, 0)
    assert (out[2]["start_tok"], out[2]["seq_first"], out[2]["seq_last"],
            out[2]["seq_offset"]) == (100, 0, 1, 100)  # spans the boundary
    assert (out[3]["start_tok"], out[3]["seq_first"], out[3]["seq_last"]) == (
        400, 1, 2)
    # empty doc: degenerate single-sequence placement
    assert out[4]["seq_first"] == out[4]["seq_last"] == 650 // 256
    # strata are independent
    assert (out[5]["start_tok"], out[5]["seq_first"], out[5]["seq_last"]) == (
        0, 0, 2)


def test_pack_sequences_matches_single_window(spark):
    # the two-level cumsum (super_shift=2 -> many buckets) must equal
    # the naive global-window layout
    from pyspark.sql import Window

    from tspider_spark.operators.curate import pack_sequences

    rows = [(i, "s" if i % 3 else "t", (i * 37) % 90) for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    got = {
        r["doc_id"]: (r["start_tok"], r["seq_first"], r["seq_last"], r["seq_offset"])
        for r in pack_sequences(df, seq_tokens=64, super_shift=2).collect()
    }
    w = (
        Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = df.withColumn("st", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    for r in naive.collect():
        st, n = r["st"], r["n_tokens"]
        assert got[r["doc_id"]] == (
            st, st // 64, (st + max(n, 1) - 1) // 64, st % 64
        )


# ---------------------------------------------------------------------------
# engine-wired trap detection (CrawlConfig.trap_min_urls)


def _trap_corpus():
    """ok.com's 30 links collapse to one {digit} pattern; trap.com's 30
    links each mint a distinct letter pattern (a session-id-style trap)
    and each trap page links one level deeper."""
    def link(i, url):
        return ("link", url, None, i)

    docs = []
    docs.append((
        "http://ok.com/",
        [link(i, f"http://ok.com/item/{i}") for i in range(30)],
    ))
    trap_children = [f"http://trap.com/s/x{chr(97 + i)}{chr(97 + j)}"
                     for i in range(5) for j in range(6)]
    docs.append((
        "http://trap.com/",
        [link(i, u) for i, u in enumerate(trap_children)],
    ))
    for u in trap_children:
        docs.append((u, [link(0, u.replace("/s/", "/deeper/") + "z")]))
    docs.append((
        "http://ok.com/item/0",
        [link(0, "http://ok.com/leaf")],
    ))
    return docs


def test_engine_trap_detection_blocks_trap_host(spark, tmp_path):
    from tspider_spark.config import CrawlConfig
    from tspider_spark.plans.crawl import CrawlEngine
    from tspider_spark.sources.corpus import corpus_to_spark

    cfg = CrawlConfig(trap_min_urls=20, trap_max_patterns_per_url=0.5)
    engine = CrawlEngine(
        spark,
        corpus_to_spark(spark, _trap_corpus()),
        str(tmp_path / "trapstate"),
        cfg,
    )
    engine.seed(["http://ok.com/", "http://trap.com/"])
    engine.run()

    # the trap host was auto-blocklisted and persisted (resume-safe)
    assert "trap.com" in engine.cfg.blocklist
    assert "trap.com" in engine.store.meta()["config"]["blocklist"]
    assert "ok.com" not in engine.cfg.blocklist

    # its queued wave-1 tasks were dropped by the re-check (recorded
    # for remove_blocklist), so nothing below /s/ was ever fetched
    blocked = engine.store.read("blocked_tasks").collect()
    assert blocked and all(r["hostname"] == "trap.com" for r in blocked)
    frontier_urls = [r["url"] for r in engine.store.read("frontier").collect()]
    assert not any("/deeper/" in u for u in frontier_urls)
    # ok.com was crawled normally past depth 1
    assert any("ok.com/leaf" in u for u in frontier_urls)

    # stats table accumulated and the ratio split is as constructed
    stats = {
        r["hostname"]: r
        for r in engine.store.read("host_pattern_stats").collect()
    }
    assert stats["trap.com"]["n_patterns"] == 30
    assert stats["ok.com"]["n_patterns"] <= 3  # {digit} collapse (+leaf)


def test_trap_report_tool(spark, tmp_path):
    from tspider_spark.config import CrawlConfig
    from tspider_spark.plans.crawl import CrawlEngine
    from tspider_spark.sources.corpus import corpus_to_spark

    cfg = CrawlConfig(trap_min_urls=20, trap_max_patterns_per_url=0.5)
    engine = CrawlEngine(
        spark, corpus_to_spark(spark, _trap_corpus()),
        str(tmp_path / "trapreport"), cfg,
    )
    engine.seed(["http://ok.com/", "http://trap.com/"])
    engine.run()

    import tools.trap_report as tr

    flagged = tr.main([str(tmp_path / "trapreport")], spark=spark)
    assert flagged == ["trap.com"]


def test_trap_detection_off_by_default_keeps_parity(spark, tmp_path):
    # default config never touches the blocklist or writes stats
    from tspider_spark.config import CrawlConfig
    from tspider_spark.plans.crawl import CrawlEngine
    from tspider_spark.sources.corpus import corpus_to_spark

    cfg = CrawlConfig()
    engine = CrawlEngine(
        spark, corpus_to_spark(spark, _trap_corpus()),
        str(tmp_path / "nostate"), cfg,
    )
    engine.seed(["http://trap.com/"])
    engine.run()
    assert engine.cfg.blocklist == []
    assert engine.store.read("host_pattern_stats").isEmpty()


# ---------------------------------------------------------------------------
# scalar-quantized ANN


def test_sq_topk_matches_brute_force(spark):
    import random

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(80)]
    # planted near-dups so top-1 is unambiguous for low ids
    vecs = [(i, v) for i, v in enumerate(base)]
    vecs += [(1000 + i, [x + rng.gauss(0, 0.01) for x in base[i]]) for i in range(5)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 5)
    got = set(
        map(tuple, sq_topk(q, df, k=3, rescore_factor=4)
            .select("query_id", "rank", "neighbor_id").collect())
    )
    exp = set(
        map(tuple, brute_force_topk(q, df, k=3)
            .select("query_id", "rank", "neighbor_id").collect())
    )
    assert got == exp
    # the planted copy is every low query's top-1
    top1 = {g[0]: g[2] for g in got if g[1] == 1}
    assert top1 == {i: 1000 + i for i in range(5)}


def test_sq_topk_candidate_cut_is_integer(spark):
    # quantized codes are ints in [-127, 127]: pin the property that
    # the approximate stage never leaves integer arithmetic by checking
    # reproducibility under repartitioning (float-sum-order ties would
    # break this)
    import random

    rng = random.Random(11)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") < 4)
    a = sq_topk(q, df, k=5).select("query_id", "rank", "neighbor_id").collect()
    b = (
        sq_topk(q.repartition(7), df.repartition(13), k=5)
        .select("query_id", "rank", "neighbor_id")
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# URL keyword gate


def test_url_keyword_score_strict_soft_clean(spark):
    from tspider_spark.operators.filters import url_keyword_score

    df = spark.createDataFrame(
        [
            ("http://a.com/casino/bonus",),      # whole word -> strict
            ("http://b.com/?ref=webcams",),      # substring only -> soft
            ("http://c.com/pokerxxx",),          # two substrings -> drop
            ("http://d.com/plain/page",),        # clean
            ("http://CASINO.example/x",),        # case-folded strict
        ],
        "url string",
    )
    got = {
        r["url"]: (r["strict_hits"], r["soft_hits"], r["url_score"], r["keep"])
        for r in url_keyword_score(df).collect()
    }
    assert got["http://a.com/casino/bonus"] == (1, 0, 2, False)
    assert got["http://b.com/?ref=webcams"] == (0, 1, 1, True)
    assert got["http://c.com/pokerxxx"] == (0, 2, 2, False)
    assert got["http://d.com/plain/page"] == (0, 0, 0, True)
    assert got["http://CASINO.example/x"] == (1, 0, 2, False)


def test_engine_url_keyword_gate(spark, tmp_path):
    """With url_block_keywords set, keyword-scoring URLs are never
    scheduled; with the default empty tuple the crawl is reference
    parity (the gate is absent from the plan)."""
    from tspider_spark.config import CrawlConfig
    from tspider_spark.plans.crawl import CrawlEngine
    from tspider_spark.sources.corpus import corpus_to_spark

    docs = [
        ("http://ok.com/", [
            ("link", "http://ok.com/casino/promo", None, 0),
            ("link", "http://ok.com/plain", None, 1),
        ]),
        ("http://ok.com/plain", []),
        ("http://ok.com/casino/promo", []),
    ]
    cfg = CrawlConfig(
        tld=True, max_per_host=10, url_block_keywords=("casino",),
    )
    eng = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "s1"), cfg
    )
    eng.seed(["http://ok.com/"])
    eng.run()
    scheduled = {r["url"] for r in eng.crawl_order().collect()}
    assert "http://ok.com/plain" in scheduled
    assert not any("casino" in u for u in scheduled)
    # off by default: same corpus schedules the keyword URL
    eng2 = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "s2"),
        CrawlConfig(tld=True, max_per_host=10),
    )
    eng2.seed(["http://ok.com/"])
    eng2.run()
    assert "http://ok.com/casino/promo" in {
        r["url"] for r in eng2.crawl_order().collect()
    }
    # meta round-trip keeps the gate on resume
    assert CrawlConfig.from_meta(cfg.to_meta()).url_block_keywords == (
        "casino",
    )


def test_strip_tracking_params_edges(spark):
    from tspider_spark.functions.urlfuncs import strip_tracking_params

    cases = [
        ("http://a.com/p?utm_source=x&id=3&fbclid=z", "http://a.com/p?id=3"),
        ("http://a.com/p?UTM_Campaign=x", "http://a.com/p"),  # key case-folds
        ("http://a.com/p?id=3#frag", "http://a.com/p?id=3"),
        ("http://a.com/p", "http://a.com/p"),
        ("http://a.com/p?", "http://a.com/p?"),  # empty qs preserved
        ("http://a.com/p?a=1&b=2", "http://a.com/p?a=1&b=2"),  # order kept
        ("http://a.com/p?ref=tw", "http://a.com/p"),
        ("http://a.com/p?REFER=x", "http://a.com/p?REFER=x"),  # not 'ref'
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["out"]
           for r in df.select("url", strip_tracking_params("url").alias("out"))
           .collect()}
    for u, want in cases:
        assert got[u] == want, (u, got[u], want)


def test_engine_strip_tracking(spark, tmp_path):
    """With strip_tracking on, a utm-decorated link collapses to the
    canonical URL (which then fetches and yields children); off keeps
    reference parity (the decorated URL is scheduled verbatim)."""
    from tspider_spark.config import CrawlConfig
    from tspider_spark.plans.crawl import CrawlEngine
    from tspider_spark.sources.corpus import corpus_to_spark

    docs = [
        ("http://ok.com/", [
            ("link", "http://ok.com/page?utm_source=feed&utm_medium=rss",
             None, 0),
        ]),
        ("http://ok.com/page", [
            ("link", "http://ok.com/deep", None, 0),
        ]),
        ("http://ok.com/deep", []),
    ]
    on = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "on"),
        CrawlConfig(tld=True, max_per_host=10, strip_tracking=True),
    )
    on.seed(["http://ok.com/"])
    on.run()
    sched_on = {r["url"] for r in on.crawl_order().collect()}
    assert "http://ok.com/page" in sched_on
    assert "http://ok.com/deep" in sched_on  # canonical URL fetched
    assert not any("utm_" in u for u in sched_on)

    off = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "off"),
        CrawlConfig(tld=True, max_per_host=10),
    )
    off.seed(["http://ok.com/"])
    off.run()
    sched_off = {r["url"] for r in off.crawl_order().collect()}
    assert "http://ok.com/page?utm_source=feed&utm_medium=rss" in sched_off
    assert "http://ok.com/deep" not in sched_off  # decorated URL 404s
    assert CrawlConfig.from_meta(
        CrawlConfig(strip_tracking=True).to_meta()
    ).strip_tracking is True


def test_submit_cli_strip_tracking_and_keywords(spark, tmp_path):
    """CLI flags reach the config: --strip-tracking collapses the
    decorated link; --url-block-keywords with no values enables the
    default list."""
    from tspider_spark.sources.corpus import corpus_to_spark
    from tspider_spark.submit_crawl import main

    docs = [
        ("http://ok.com/", [
            ("link", "http://ok.com/page?utm_source=feed", None, 0),
            ("link", "http://ok.com/casino/promo", None, 1),
        ]),
        ("http://ok.com/page", []),
        ("http://ok.com/casino/promo", []),
    ]
    dpath = str(tmp_path / "docs")
    corpus_to_spark(spark, docs).write.parquet(dpath)
    state = str(tmp_path / "state")
    main(["--documents", dpath, "--state", state, "--tld",
          "--strip-tracking", "--url-block-keywords",
          "--seeds", "http://ok.com/"],
         stop_session=False)
    from tspider_spark.config import CrawlConfig
    from tspider_spark.plans.crawl import CrawlEngine
    from tspider_spark.sources.state import StateStore

    meta_cfg = CrawlConfig.from_meta(
        StateStore(spark, state).meta()["config"]
    )
    assert meta_cfg.strip_tracking is True
    assert "casino" in meta_cfg.url_block_keywords
    eng = CrawlEngine(
        spark, spark.read.parquet(dpath), state, meta_cfg
    )
    sched = {r["url"] for r in eng.crawl_order().collect()}
    assert "http://ok.com/page" in sched      # canonicalized
    assert not any("utm_" in u or "casino" in u for u in sched)


# ---------------------------------------------------------------------------
# product-quantized ANN


def _pq_fixture(spark):
    import random

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(80)]
    vecs = [(i, v) for i, v in enumerate(base)]
    vecs += [
        (1000 + i, [x + rng.gauss(0, 0.01) for x in base[i]]) for i in range(5)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    return df, df.filter(F.col("vec_id") < 5)


def test_pq_codebooks_shape(spark):
    df, _ = _pq_fixture(spark)
    rows = pq_codebooks(df, m=4, ksub=16, dim=16).collect()
    # <= m*ksub codebook rows (emptied codes vanish), dsub-wide each
    assert len(rows) <= 64
    assert {r["s"] for r in rows} == {0, 1, 2, 3}
    assert all(len(r["cv"]) == 4 for r in rows)


def test_pq_topk_exact_when_candidates_cover_corpus(spark):
    # with k*rescore_factor >= corpus size the candidate set is the
    # whole corpus, so the exact-rescore stage must reproduce brute
    # force verbatim — pins the rescore machinery independent of how
    # lossy the codes are
    df, q = _pq_fixture(spark)
    got = sorted(
        map(tuple, pq_topk(q, df, k=3, m=4, ksub=16, dim=16, rescore_factor=40)
            .select("query_id", "rank", "neighbor_id").collect())
    )
    exp = sorted(
        map(tuple, brute_force_topk(q, df, k=3)
            .select("query_id", "rank", "neighbor_id").collect())
    )
    assert got == exp


def test_pq_topk_recalls_planted_near_dups(spark):
    # at the real rescore budget (4x) the 2-byte codes still put the
    # planted near-identical copy at rank 1 for every query
    df, q = _pq_fixture(spark)
    out = pq_topk(q, df, k=3, m=4, ksub=16, dim=16, rescore_factor=4)
    top1 = {r["query_id"]: r["neighbor_id"] for r in out.collect() if r["rank"] == 1}
    assert top1 == {i: 1000 + i for i in range(5)}


def test_pq_topk_deterministic_under_repartition(spark):
    # ADC sums are rounded before ranking and ties break by neighbor
    # id, so partitioning must not change the candidate cut
    df, q = _pq_fixture(spark)
    a = pq_topk(q, df, k=5, m=4, ksub=16, dim=16).select(
        "query_id", "rank", "neighbor_id"
    ).collect()
    b = pq_topk(
        q.repartition(7), df.repartition(13), k=5, m=4, ksub=16, dim=16
    ).select("query_id", "rank", "neighbor_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# CCNet perplexity buckets


def _seeded_docs(spark, n):
    # deterministic word-salad docs over a small vocabulary so the
    # bigram LM spreads scores; lengths vary so ties are rare but the
    # rank tie-break (doc_id) still gets exercised via duplicates
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    for i in range(n):
        words = [vocab[(i * 7 + j * 3) % 5] for j in range(3 + i % 6)]
        rows.append((i, " ".join(words)))
    # exact duplicate texts -> identical bits_per_token, tie on doc_id
    rows.append((n, rows[0][1]))
    rows.append((n + 1, rows[1][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("n", [1, 2, 3, 7, 40])
def test_perplexity_buckets_match_single_window_ntile(spark, n):
    from pyspark.sql.window import Window

    from tspider_spark.operators.quality import bigram_logprob, perplexity_buckets

    docs = _seeded_docs(spark, n)
    got = {
        r["doc_id"]: r["bucket"]
        for r in perplexity_buckets(docs).collect()
    }
    scored = bigram_logprob(docs)
    w = Window.orderBy("bits_per_token", "doc_id")
    names = {1: "head", 2: "middle", 3: "tail"}
    want = {
        r["doc_id"]: names[r["b"]]
        for r in scored.withColumn("b", F.ntile(3).over(w)).collect()
    }
    assert got == want


def test_perplexity_buckets_sizes_are_balanced(spark):
    from tspider_spark.operators.quality import perplexity_buckets

    docs = _seeded_docs(spark, 40)  # 42 docs total
    sizes = {
        r["bucket"]: r["n"]
        for r in perplexity_buckets(docs).groupBy("bucket").agg(
            F.count("*").alias("n")
        ).collect()
    }
    assert sum(sizes.values()) == 42
    assert max(sizes.values()) - min(sizes.values()) <= 1


# ---------------------------------------------------------------------------
# recrawl scheduling (Cho & Garcia-Molina change-rate estimation)


def test_recrawl_priority_hand_computed(spark):
    import datetime as dt

    from tspider_spark.operators.recrawl import recrawl_priority

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # url A: 4 fetches, one change interval (v0,v0,v1,v1)
        ("A", t0, "v0"),
        ("A", t0 + dt.timedelta(seconds=10), "v0"),
        ("A", t0 + dt.timedelta(seconds=20), "v1"),
        ("A", t0 + dt.timedelta(seconds=30), "v1"),
        # url B: single fetch -> no rate information, excluded
        ("B", t0, "v0"),
        # url C: two fetches at the same instant -> zero span, excluded
        ("C", t0, "v0"),
        ("C", t0, "v1"),
    ]
    obs = spark.createDataFrame(
        rows, "url string, fetched_at timestamp, fingerprint string"
    )
    as_of = t0.replace(tzinfo=dt.timezone.utc).timestamp() + 40
    got = {r["url"]: r for r in recrawl_priority(obs, as_of).collect()}
    assert set(got) == {"A"}
    a = got["A"]
    assert (a["n_obs"], a["n_changes"]) == (4, 1)
    # r_hat = -ln((3-1+0.5)/3.5) = ln(1.4); lam = r_hat*3/30 per sec
    r_hat = math.log(1.4)
    assert a["change_rate_per_day"] == pytest.approx(
        r_hat * 3 / 30 * 86400, abs=1e-5
    )
    # since = 10s after the last fetch -> lam*since = ln(1.4) exactly
    assert a["p_stale"] == pytest.approx(1 - 1 / 1.4, abs=1e-6)


def test_recrawl_rate_orders_by_change_frequency(spark):
    # a page that changes every fetch must out-rate one that never does
    import datetime as dt

    from tspider_spark.operators.recrawl import recrawl_priority

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(10):
        rows.append(("busy", t0 + dt.timedelta(hours=i), f"v{i}"))
        rows.append(("calm", t0 + dt.timedelta(hours=i), "v0"))
    obs = spark.createDataFrame(
        rows, "url string, fetched_at timestamp, fingerprint string"
    )
    as_of = t0.replace(tzinfo=dt.timezone.utc).timestamp() + 86400
    got = {r["url"]: r for r in recrawl_priority(obs, as_of).collect()}
    assert got["busy"]["change_rate_per_day"] > got["calm"]["change_rate_per_day"]
    assert got["busy"]["p_stale"] > got["calm"]["p_stale"]
    # zero observed changes -> the +0.5-corrected MLE is exactly 0
    assert got["calm"]["n_changes"] == 0
    assert got["calm"]["change_rate_per_day"] == 0.0
    assert got["calm"]["p_stale"] == 0.0


# ---------------------------------------------------------------------------
# script stats + quality-aware dedup keeper


def test_script_stats_mixed_scripts(spark):
    from tspider_spark.operators.textstats import script_stats

    docs = spark.createDataFrame(
        [
            (1, "hello world 123"),
            (2, "привет мир"),  # russian
            (3, "abc 你好 αβ"),  # latin + cjk + greek
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in script_stats(docs).collect()}
    assert got[1]["latin"] == 10 and got[1]["digit"] == 3
    assert got[1]["dominant"] == "latin"
    assert got[2]["cyrillic"] == 9 and got[2]["dominant"] == "cyrillic"
    assert got[3]["cjk"] == 2 and got[3]["greek"] == 2
    assert got[3]["dominant"] == "latin"  # 3 latin chars beat 2+2
    assert got[4]["known_ratio"] == 0.0 and got[4]["dominant"] == "none"
    # russian text: every non-space char is known
    assert got[2]["known_ratio"] == pytest.approx(9 / 10, abs=1e-6)


def test_keep_best_prefers_high_score_then_min_id(spark):
    from tspider_spark.operators.textdedup import keep_best

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7), (9, 9)],
        "doc_id long, cluster_id long",
    )
    scores = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (7, 5), (8, 5), (9, 1)],
        "doc_id long, score long",
    )
    got = {
        r["doc_id"]: r["keep"] for r in keep_best(clusters, scores).collect()
    }
    # cluster 1: 2 and 3 tie at 30 -> min id 2 wins; cluster 7: tie -> 7
    assert got == {1: False, 2: True, 3: False, 7: True, 8: False, 9: True}


def test_keep_best_plan_has_no_window_sort(spark):
    # hot-cluster safety is the point: argmax via map-side partial
    # min(struct), never a per-cluster window sort
    from tspider_spark.operators.textdedup import keep_best

    clusters = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).alias("cluster_id")
    )
    scores = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 13).alias("score")
    )
    plan = (
        keep_best(clusters, scores)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan, plan
    assert "partial_min" in plan or "min(" in plan


def test_recrawl_priority_single_url_exchange(spark):
    # the lag window and the per-url aggregation must share ONE hash
    # exchange on url (the scale claim in the module docstring)
    import datetime as dt

    from tspider_spark.operators.recrawl import recrawl_priority

    t0 = dt.datetime(2024, 1, 1)
    obs = spark.createDataFrame(
        [(f"u{i % 7}", t0 + dt.timedelta(hours=i), f"v{i % 3}")
         for i in range(50)],
        "url string, fetched_at timestamp, fingerprint string",
    )
    plan = (
        recrawl_priority(obs, 1706745600.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
