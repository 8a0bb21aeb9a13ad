"""Milestone-5 gate: robots disallow + crawl-delay politeness
(north_rule extension; empty table == reference parity)."""

from __future__ import annotations

from tspider_spark.config import CrawlConfig
from tspider_spark.operators.robots import ROBOTS_SCHEMA
from tspider_spark.plans.crawl import CrawlEngine
from tspider_spark.plans.oracle import ReferenceOracle
from tspider_spark.sources.corpus import CorpusSpec, corpus_to_spark, generate_corpus


def test_robots_disallow_and_delay_parity(spark, tmp_path):
    docs, seeds = generate_corpus(CorpusSpec(seed=21, n_domains=3, hosts_per_domain=2))
    hosts = sorted({d.split("/")[2] for d, _ in docs})
    rhost = hosts[0]
    robots_rows = [(rhost, ["/item/", "/cat.php"], 500)]

    cfg = CrawlConfig(tld=True, max_per_host=10, robots_enabled=True)
    oracle = ReferenceOracle(
        docs, cfg, robots={h: (p, d) for h, p, d in robots_rows}
    ).run(seeds)
    # robots actually bit: no disallowed path of rhost was scheduled
    assert all(
        not (u.startswith(f"http://{rhost}/item/") or u.startswith(f"http://{rhost}/cat.php"))
        for u, _, _ in oracle.crawl_order
    )

    robots_df = spark.createDataFrame(robots_rows, ROBOTS_SCHEMA)
    engine = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "state"), cfg,
        robots=robots_df,
    )
    engine.seed(seeds)
    engine.run()

    got = [(r["url"], r["depth"], r["rank"]) for r in engine.crawl_order().collect()]
    assert got == oracle.crawl_order

    # crawl-delay pacing: k-th same-host task planned at (k-1)*delay
    f = engine.store.read("frontier").filter(f"hostname = '{rhost}'").collect()
    if f:
        per_wave = {}
        for r in f:
            per_wave.setdefault(r["depth"], []).append(
                (r["slot"], r["planned_offset_ms"])
            )
        for rows in per_wave.values():
            for slot, off in rows:
                assert off == (slot - 1) * 500


def test_empty_robots_is_reference_parity(spark, tmp_path):
    docs, seeds = generate_corpus(CorpusSpec(seed=21, n_domains=2))
    cfg_off = CrawlConfig(tld=True, max_per_host=8)
    cfg_on = CrawlConfig(tld=True, max_per_host=8, robots_enabled=True)
    base = ReferenceOracle(docs, cfg_off).run(seeds)
    with_empty = ReferenceOracle(docs, cfg_on, robots={}).run(seeds)
    assert base.crawl_order == with_empty.crawl_order


def test_parse_robots_groups_and_edges(spark):
    """Declarative robots.txt parse: comment stripping, CRLF, case-
    insensitive directives, multi-UA groups, specific-agent groups
    ignored, prefix merge across * groups, min crawl-delay, empty
    Disallow dropped, rule-before-any-UA dropped."""
    from tspider_spark.operators.robots import parse_robots

    body_a = (
        "Disallow: /orphan\r\n"          # before any UA group: invalid
        "# header comment\r\n"
        "User-agent: googlebot\r\n"
        "Disallow: /private\r\n"
        "\r\n"
        "USER-AGENT: *\r\n"
        "Disallow: /b # trailing comment\r\n"
        "disallow: /a\r\n"
        "Disallow:\r\n"                   # empty value: allow-all, no prefix
        "Crawl-Delay: 2\r\n"
        "\r\n"
        "User-agent: otherbot\r\n"
        "User-agent: *\r\n"               # multi-UA group includes *
        "Disallow: /c\r\n"
        "Crawl-delay: 5\r\n"
    )
    body_b = "User-agent: googlebot\nDisallow: /x\n"  # no * group
    df = spark.createDataFrame(
        [("a.com", body_a), ("b.com", body_b)], "host string, body string"
    )
    rows = {r["host"]: r for r in parse_robots(df).collect()}
    assert set(rows) == {"a.com"}
    assert rows["a.com"]["disallow_prefixes"] == ["/a", "/b", "/c"]
    assert rows["a.com"]["crawl_delay_ms"] == 2000


def test_parse_robots_feeds_filter(spark):
    """parse_robots output plugs straight into robots_filter."""
    from tspider_spark.operators.robots import parse_robots, robots_filter

    rules = parse_robots(spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /no\n")], "host string, body string"
    ))
    cands = spark.createDataFrame(
        [("h.com", "/no/page"), ("h.com", "/yes/page"), ("other.com", "/no")],
        "hostname string, path string",
    )
    kept = {(r["hostname"], r["path"])
            for r in robots_filter(cands, rules, path_col="path").collect()}
    assert kept == {("h.com", "/yes/page"), ("other.com", "/no")}


def test_parse_sitemap_formats(spark):
    """XML urlset (entities, CDATA, whitespace in <loc>), sitemapindex
    flagging, and plain-text one-URL-per-line with CRLF + junk."""
    from tspider_spark.operators.robots import parse_sitemap

    xml = (
        '<?xml version="1.0"?>\n<urlset>\n'
        " <url><loc>http://a.com/p?x=1&amp;y=2</loc></url>\n"
        " <url><loc>\n   http://a.com/q</loc></url>\n"
        " <url><loc><![CDATA[http://a.com/r]]></loc></url>\n</urlset>"
    )
    idx = ("<sitemapindex><sitemap><loc>http://a.com/sitemap2.xml</loc>"
           "</sitemap></sitemapindex>")
    txt = "http://b.com/1\r\nnot-a-url\n  http://b.com/2  \n"
    df = spark.createDataFrame(
        [("a.com", xml), ("a.com", idx), ("b.com", txt)],
        "host string, body string",
    )
    got = {(r["host"], r["url"], r["is_index"])
           for r in parse_sitemap(df).collect()}
    assert got == {
        ("a.com", "http://a.com/p?x=1&y=2", False),
        ("a.com", "http://a.com/q", False),
        ("a.com", "http://a.com/r", False),
        ("a.com", "http://a.com/sitemap2.xml", True),
        ("b.com", "http://b.com/1", False),
        ("b.com", "http://b.com/2", False),
    }


def test_robots_allow_precedence(spark):
    """RFC 9309 §2.2.2: longest matching prefix wins, Allow beats
    Disallow at equal length, no match = allowed, host without rules
    = allowed."""
    from tspider_spark.operators.robots import (
        parse_robots_rules,
        robots_filter_precedence,
    )

    body = ("User-agent: *\nDisallow: /d\nAllow: /d/ok\n"
            "Disallow: /d/ok/sub\n"
            "Allow: /tie\nDisallow: /tie\n"  # equal length -> allow
            "User-agent: otherbot\nDisallow: /\n")
    bodies = spark.createDataFrame([("a.com", body)], "host string, body string")
    rules = parse_robots_rules(bodies)
    got = {(r["prefix"], r["allow"]) for r in rules.collect()}
    assert got == {("/d", False), ("/d/ok", True), ("/d/ok/sub", False),
                   ("/tie", True), ("/tie", False)}

    cands = spark.createDataFrame(
        [("a.com", "/d/ok/page"), ("a.com", "/d/other"), ("a.com", "/free"),
         ("a.com", "/d/ok/sub/x"), ("a.com", "/tiebreak"),
         ("b.com", "/d/other")],
        "hostname string, path string",
    )
    kept = {(r["hostname"], r["path"]) for r in robots_filter_precedence(
        cands, rules, host_col="hostname", path_col="path").collect()}
    assert kept == {
        ("a.com", "/d/ok/page"),   # Allow /d/ok beats Disallow /d
        ("a.com", "/free"),        # no matching rule
        ("a.com", "/tiebreak"),    # equal-length tie -> allow
        ("b.com", "/d/other"),     # no rules for host
    }


def test_robots_sitemap_urls_edges(spark):
    """Sitemap: directives parse independent of groups and key case,
    tolerate trailing comments, drop relative URLs, and dedupe exact
    repeats; hosts without a directive are absent."""
    from tspider_spark.operators.robots import robots_sitemap_urls

    body_a = (
        "# header\nUser-agent: googlebot\nDisallow: /private\n"
        "sitemap: http://a.com/sitemap.xml # primary\n"
        "User-agent: *\nDisallow: /x\n"
        "SITEMAP: http://a.com/sitemap.xml\n"
        "Sitemap: https://cdn.a.com/maps/s2.xml\n"
        "Sitemap: /relative-invalid.xml\n"
    )
    body_b = "User-agent: *\nDisallow: /y\n"
    df = spark.createDataFrame(
        [("a.com", body_a), ("b.com", body_b)], "host string, body string"
    )
    got = {(r["host"], r["sitemap_url"])
           for r in robots_sitemap_urls(df).collect()}
    assert got == {
        ("a.com", "http://a.com/sitemap.xml"),
        ("a.com", "https://cdn.a.com/maps/s2.xml"),
    }


def test_discover_sitemaps_gates_seed_extension(spark, tmp_path):
    """--discover-sitemaps: only sitemaps a host's robots.txt declares
    contribute seeds; undeclared sitemap bodies are ignored."""
    from tspider_spark.submit_crawl import main

    docs, seeds = generate_corpus(
        CorpusSpec(seed=33, n_domains=3, hosts_per_domain=2)
    )
    hosts = sorted({d.split("/")[2] for d, _ in docs})
    declared, undeclared = hosts[0], hosts[1]
    rb, sb = str(tmp_path / "rb"), str(tmp_path / "sb")
    spark.createDataFrame(
        [(declared,
          f"User-agent: *\nDisallow:\nSitemap: http://{declared}/sm.xml\n")],
        "host string, body string",
    ).write.parquet(rb)
    sm = "<urlset><url><loc>http://{h}/</loc></url></urlset>"
    spark.createDataFrame(
        [(declared, sm.format(h=declared)),
         (undeclared, sm.format(h=undeclared))],
        "host string, body string",
    ).write.parquet(sb)

    docs_path = str(tmp_path / "docs")
    corpus_to_spark(spark, docs).write.parquet(docs_path)
    # seed only with the first corpus seed so sitemap extension shows
    base = [seeds[0]]
    state = str(tmp_path / "state")
    main(["--documents", docs_path, "--state", state, "--tld",
          "--max-per-host", "10", "--max-waves", "0",
          "--robots-bodies", rb, "--sitemap-bodies", sb,
          "--discover-sitemaps", "--seeds"] + base,
         stop_session=False)
    eng = CrawlEngine(
        spark, spark.read.parquet(docs_path), state,
        CrawlConfig(tld=True, max_per_host=10, robots_enabled=True),
    )
    seeded = {r["url"] for r in eng.crawl_order().collect()}
    assert f"http://{declared}/" in seeded
    assert f"http://{undeclared}/" not in seeded


def test_submit_cli_robots_and_sitemap_bodies(spark, tmp_path):
    """--robots-bodies / --sitemap-bodies: raw bodies parse inside the
    CLI, sitemap <loc>s extend the seed list, robots rules are
    enforced — exact vs the oracle fed the equivalent parsed inputs."""
    from tspider_spark.operators.robots import parse_robots, parse_sitemap
    from tspider_spark.submit_crawl import main

    docs, seeds = generate_corpus(
        CorpusSpec(seed=21, n_domains=3, hosts_per_domain=2)
    )
    hosts = sorted({d.split("/")[2] for d, _ in docs})
    rhost, shost = hosts[0], hosts[1]
    robots_body = ("User-agent: *\nDisallow: /item/\n"
                   "Disallow: /cat.php\nCrawl-delay: 0.5\n")
    # sitemap adds an extra seed for shost beyond the corpus seeds
    sm_body = f"<urlset><url><loc>http://{shost}/</loc></url></urlset>"
    rb = str(tmp_path / "rb")
    sb = str(tmp_path / "sb")
    spark.createDataFrame([(rhost, robots_body)], "host string, body string"
                          ).write.parquet(rb)
    spark.createDataFrame([(shost, sm_body)], "host string, body string"
                          ).write.parquet(sb)

    # oracle: equivalent parsed rules + the extended seed list
    parsed = {r["host"]: (list(r["disallow_prefixes"]), r["crawl_delay_ms"])
              for r in parse_robots(spark.read.parquet(rb)).collect()}
    assert parsed == {rhost: (["/cat.php", "/item/"], 500)}
    extra = sorted(
        r["url"] for r in parse_sitemap(spark.read.parquet(sb))
        .filter("not is_index").collect()
    )
    all_seeds = list(seeds) + [u for u in extra if u not in set(seeds)]
    cfg = CrawlConfig(tld=True, max_per_host=10, robots_enabled=True)
    oracle = ReferenceOracle(docs, cfg, robots=parsed).run(all_seeds)

    docs_path = str(tmp_path / "docs")
    corpus_to_spark(spark, docs).write.parquet(docs_path)
    state = str(tmp_path / "state")
    main(["--documents", docs_path, "--state", state, "--tld",
          "--max-per-host", "10", "--robots-bodies", rb,
          "--sitemap-bodies", sb, "--seeds"] + seeds,
         stop_session=False)

    eng = CrawlEngine(
        spark, spark.read.parquet(docs_path), state, cfg,
        robots=parse_robots(spark.read.parquet(rb)),
    )
    got = [(r["url"], r["depth"], r["rank"])
           for r in eng.crawl_order().collect()]
    assert got == oracle.crawl_order


# --- wildcard matching (RFC 9309 §2.2.3) ------------------------------------


def test_wildcard_filter_rfc_examples(spark):
    from tspider_spark.operators.robots import (
        parse_robots_rules,
        robots_filter_wildcard,
    )

    bodies = spark.createDataFrame(
        [
            ("h1", "User-agent: *\nDisallow: /fish*\nAllow: /fish/ok\n"),
            ("h2", "User-agent: *\nDisallow: /*.php$\n"),
            ("h3", "User-agent: *\nDisallow: /p\nAllow: /p*d$\n"),
        ],
        "host string, body string",
    )
    rules = parse_robots_rules(bodies)
    cands = spark.createDataFrame(
        [
            ("h1", "/fishheads"),      # /fish* stretches -> drop
            ("h1", "/fish/ok/x"),      # longer Allow wins -> keep
            ("h1", "/other"),          # no match -> keep
            ("h2", "/index.php"),      # $ anchored hit -> drop
            ("h2", "/index.php?x=1"),  # anchor fails past .php -> keep
            ("h3", "/pad"),            # Allow /p*d$ (5) beats /p (2)
            ("h3", "/pax"),            # only Disallow /p -> drop
            ("h4", "/anything"),       # host with no rules -> keep
        ],
        "hostname string, path string",
    )
    kept = sorted(
        (r["hostname"], r["path"])
        for r in robots_filter_wildcard(cands, rules).collect()
    )
    assert kept == [
        ("h1", "/fish/ok/x"), ("h1", "/other"),
        ("h2", "/index.php?x=1"),
        ("h3", "/pad"),
        ("h4", "/anything"),
    ]


def test_wildcard_regex_escapes_metacharacters(spark):
    from pyspark.sql import functions as F

    from tspider_spark.operators.robots import rule_regex

    rows = spark.createDataFrame(
        [("/a.b",), ("/q?x=(1)",), ("/m$id",), ("/w*e$",), ("/b\\k",)],
        "prefix string",
    ).select("prefix", rule_regex("prefix").alias("rx")).collect()
    rx = {r["prefix"]: r["rx"] for r in rows}
    assert rx["/a.b"] == "^/a\\.b"            # '.' is literal
    assert rx["/q?x=(1)"] == "^/q\\?x=\\(1\\)"
    assert rx["/m$id"] == "^/m\\$id"          # mid-$ literal
    assert rx["/w*e$"] == "^/w.*e$"           # trailing $ anchors
    assert rx["/b\\k"] == "^/b\\\\k"


def test_engine_wildcard_rules_supersede_prefix_summary(spark, tmp_path):
    """robots_rules wiring: an Allow hole inside a Disallow (invisible
    to the disallow-prefix summary) admits its URLs, and a $-anchored
    wildcard blocks exactly its matches — end-to-end through seed+run."""
    from tspider_spark.operators.robots import parse_robots_rules

    docs, seeds = generate_corpus(
        CorpusSpec(seed=21, n_domains=3, hosts_per_domain=2)
    )
    # pick a host with a real depth-1 pathful URL to carve the hole for
    cfg = CrawlConfig(tld=True, max_per_host=10, robots_enabled=True)
    base = ReferenceOracle(docs, cfg).run(seeds)
    depth1 = sorted(
        (u.split("/")[2], "/" + u.split("/", 3)[3])
        for u, d, _ in base.crawl_order
        if d == 1 and len(u.split("/", 3)) > 3 and u.split("/", 3)[3]
    )
    assert depth1, "corpus must schedule a pathful depth-1 URL"
    rhost, hole = depth1[0]
    body = (
        "User-agent: *\n"
        "Disallow: /\n"             # blanket block...
        "Allow: /$\n"               # ...except the root itself ($-anchored)
        f"Allow: {hole.split('?')[0]}*\n"  # ...and the hole
    )
    bodies = spark.createDataFrame([(rhost, body)], "host string, body string")
    rules = parse_robots_rules(bodies)

    engine = CrawlEngine(
        spark, corpus_to_spark(spark, docs), str(tmp_path / "s"), cfg,
        robots_rules=rules,
    )
    engine.seed(seeds)
    engine.run()
    got = [u for u, _, _ in
           ((r["url"], r["depth"], r["rank"])
            for r in engine.crawl_order().collect())]
    rhost_urls = [u for u in got if u.startswith(f"http://{rhost}/")]
    allow_prefix = f"http://{rhost}" + hole.split("?")[0]
    # everything scheduled for rhost is the root (Allow /$ hole) or
    # inside the wildcard Allow hole — the blanket Disallow ate the rest
    assert all(
        u == f"http://{rhost}/" or u.startswith(allow_prefix)
        for u in rhost_urls
    )
    # and the hole is not empty — the wildcard Allow really admitted it
    assert any(u.startswith(allow_prefix) for u in rhost_urls)
    # other hosts unaffected
    assert any(not u.startswith(f"http://{rhost}/") for u in got)


def test_parse_sitemap_entries_defaults_and_decode(spark):
    from tspider_spark.operators.robots import parse_sitemap_entries

    body = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc>http://a.example/p?x=1&amp;y=2</loc>"
        "<priority>0.8</priority><lastmod>2026-01-15</lastmod></url>"
        "<url><loc>http://a.example/bare</loc></url>"
        "<url><priority>0.9</priority></url>"  # no loc -> dropped
        "</urlset>"
    )
    bodies = spark.createDataFrame(
        [("a.example", body)], "host string, body string"
    )
    rows = {r["url"]: r for r in parse_sitemap_entries(bodies).collect()}
    assert set(rows) == {"http://a.example/p?x=1&y=2", "http://a.example/bare"}
    full = rows["http://a.example/p?x=1&y=2"]
    assert full["priority"] == 0.8
    assert str(full["lastmod"]) == "2026-01-15"
    bare = rows["http://a.example/bare"]
    assert bare["priority"] == 0.5      # sitemaps.org default
    assert bare["lastmod"] is None


def test_sitemap_seed_rank_orders_and_caps(spark):
    from tspider_spark.operators.robots import sitemap_seed_rank

    entries = spark.createDataFrame(
        [
            # fresh + high priority wins
            ("h", "http://h/a", 0.9, "2026-01-30"),
            # same priority, staler -> lower
            ("h", "http://h/b", 0.9, "2025-06-01"),
            # undated ages to the cap
            ("h", "http://h/c", 1.0, None),
            # future lastmod clamps to age 0 (not negative)
            ("h", "http://h/d", 0.4, "2026-03-01"),
            ("h", "http://h/e", 0.1, "2026-01-30"),
        ],
        "host string, url string, priority double, lastmod string",
    ).selectExpr("host", "url", "priority", "cast(lastmod as date) lastmod")
    out = sitemap_seed_rank(
        entries, ref_date="2026-02-01", half_life_days=30.0,
        age_cap_days=365, top_k=3,
    ).collect()
    assert [r["url"] for r in sorted(out, key=lambda r: r["seed_rank"])] == [
        "http://h/a",   # 0.9/(1+2/30)
        "http://h/d",   # 0.4/(1+0/30) = 0.4 (future clamped)
        "http://h/b",   # 0.9/(1+245/30) ~ 0.098
    ]                   # c: 1.0/(1+365/30) ~ 0.076, e: ~0.094 -> cut at k=3
    d = {r["url"]: r for r in out}
    assert d["http://h/d"]["age_days"] == 0
    assert all(r["seed_rank"] <= 3 for r in out)


def test_submit_cli_sitemap_priority_ranked_seeding(spark, tmp_path):
    """--sitemap-rank-date orders sitemap seeds by priority damped
    with staleness: high-priority fresh URLs get the earliest
    discovery ranks, after the explicit --seeds list."""
    from tspider_spark.submit_crawl import main

    docs, seeds = generate_corpus(
        CorpusSpec(seed=23, n_domains=2, hosts_per_domain=1)
    )
    hosts = sorted({d.split("/")[2] for d, _ in docs})
    shost = hosts[1]
    # score order (ref 2026-02-01, half-life 30d) is pz > pa > pm,
    # which differs from lexicographic pa < pm < pz:
    #   /pz: 0.9/(1+2/30)  ~ 0.844   (high priority, fresh)
    #   /pa: 0.5/(1+0/30)  = 0.5     (no <priority> -> default, today)
    #   /pm: 0.9/(1+300/30) ~ 0.082  (high priority, stale)
    sm_body = (
        "<urlset>"
        f"<url><loc>http://{shost}/pz</loc><priority>0.9</priority>"
        "<lastmod>2026-01-30</lastmod></url>"
        f"<url><loc>http://{shost}/pa</loc>"
        "<lastmod>2026-02-01</lastmod></url>"
        f"<url><loc>http://{shost}/pm</loc><priority>0.9</priority>"
        "<lastmod>2025-04-07</lastmod></url>"
        "</urlset>"
    )
    sb = str(tmp_path / "sb")
    spark.createDataFrame(
        [(shost, sm_body)], "host string, body string"
    ).write.parquet(sb)

    docs_path = str(tmp_path / "docs")
    corpus_to_spark(spark, docs).write.parquet(docs_path)
    state = str(tmp_path / "state")
    main(["--documents", docs_path, "--state", state, "--tld",
          "--max-waves", "1", "--sitemap-bodies", sb,
          "--sitemap-rank-date", "2026-02-01",
          "--seeds", seeds[0]],
         stop_session=False)

    eng = CrawlEngine(
        spark, spark.read.parquet(docs_path), state,
        CrawlConfig(tld=True),
    )
    depth0 = [r["url"] for r in eng.crawl_order().collect()
              if r["depth"] == 0]
    want_tail = [f"http://{shost}/pz", f"http://{shost}/pa",
                 f"http://{shost}/pm"]
    assert depth0[-3:] == want_tail
    assert depth0[0].startswith("http://" + hosts[0].replace("www.", "www."))
