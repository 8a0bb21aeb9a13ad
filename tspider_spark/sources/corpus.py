"""Deterministic synthetic web corpus (FIXTURES.md §A1).

The corpus is the Spark-side stand-in for "the web": a table of
interleaved text+media documents
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
where ``doc_id`` is the page's canonical URL and the spans encode, in
document order, exactly what the reference crawler would observe on
that page (static links core.js:305-331, forms core.js:239-286, media
src crawler.js:126-130, intercepted dynamic requests
casper_crawler.js:89-101).

Everything is generated from a seeded ``random.Random`` — no
wall-clock, no network — so the same spec always yields the same
corpus, which the golden-oracle tests and the benchmark rely on.
"""

from __future__ import annotations

import random
import zlib
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("media_ref", StringType()),
        StructField("offset", IntegerType()),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_SCHEMA), False),
    ]
)

SEEDS_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("seed_order", IntegerType(), False),
    ]
)

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu"
).split()


@dataclass
class CorpusSpec:
    seed: int = 42
    n_domains: int = 6
    hosts_per_domain: int = 3
    pages_per_host: tuple = (8, 30)
    links_per_page: tuple = (3, 12)
    # one "hot" host gets this many distinct-pattern pages so the
    # per-host budget cap triggers (F9)
    hot_host_pages: int = 40
    tlds: tuple = ("com", "org", "co.uk", "com.cn", "net", "io")
    edge_cases: bool = True
    extra_hot_hosts: int = 0  # additional hot hosts for skew benchmarks


def _domains(spec: CorpusSpec) -> list:
    return [
        "site{}.{}".format(i, spec.tlds[i % len(spec.tlds)])
        for i in range(spec.n_domains)
    ]


def _hosts(spec: CorpusSpec) -> list:
    subs = ["www", "app", "a.b.c.d", "m", "static", "api"]
    hosts = []
    for d in _domains(spec):
        for j in range(spec.hosts_per_domain):
            hosts.append("{}.{}".format(subs[j % len(subs)], d))
    return hosts


def _letter_path(i: int) -> str:
    # digit-free path so every page has a distinct {digit}-pattern
    s = ""
    i += 1
    while i:
        s = chr(ord("a") + (i % 26)) + s
        i //= 26
    return s


def generate_corpus(spec: CorpusSpec | None = None):
    """Return (docs, seeds) where docs is a list of
    (doc_id, [(kind, text, media_ref, offset), ...]) and seeds a list
    of raw seed URL strings (possibly non-canonical, per A2)."""
    spec = spec or CorpusSpec()
    rng = random.Random(spec.seed)
    hosts = _hosts(spec)
    hot_hosts = [hosts[0]] + hosts[1 : 1 + spec.extra_hot_hosts]

    # --- page inventory per host ------------------------------------
    pages: dict = {}
    for h in hosts:
        n = (
            spec.hot_host_pages
            if h in hot_hosts
            else rng.randint(*spec.pages_per_host)
        )
        urls = ["http://{}/".format(h)]
        for i in range(n):
            style = i % 4
            if style == 0:
                urls.append("http://{}/p/{}.php".format(h, _letter_path(i)))
            elif style == 1:
                urls.append("http://{}/item/{}".format(h, i))  # digit dup patterns
            elif style == 2:
                urls.append(
                    "http://{}/cat.php?page={}&sort={}".format(
                        h, i, _WORDS[i % len(_WORDS)]
                    )
                )
            else:
                urls.append("http://{}/d/{}/view.php".format(h, _letter_path(i)))
        pages[h] = urls

    all_urls = [u for us in pages.values() for u in us]

    def rnd_text(r):
        return " ".join(r.choice(_WORDS) for _ in range(r.randint(4, 12)))

    docs = []
    for h in hosts:
        same_domain = [
            x for x in hosts if x.endswith(h.split(".", 1)[1]) and x != h
        ]
        for u in pages[h]:
            # per-page RNG keyed by a *stable* hash (str hash is
            # process-randomized; crc32 is not)
            r = random.Random(zlib.crc32("{}|{}".format(spec.seed, u).encode()))
            spans = []

            def add(kind, text, media_ref=None):
                spans.append((kind, text, media_ref, len(spans)))

            add("text", rnd_text(r))
            # intra-host links (the crawl graph)
            n_links = r.randint(*spec.links_per_page)
            for _ in range(n_links):
                add("link", r.choice(pages[h]))
            # same-domain + cross-domain links
            if same_domain and r.random() < 0.7:
                oh = r.choice(same_domain)
                add("link", r.choice(pages[oh]))
            if r.random() < 0.5:
                add("link", r.choice(all_urls))
            if r.random() < 0.3:
                add("link", "http://external{}.example/x.php".format(r.randint(0, 5)))
            add("text", rnd_text(r))
            # media spans (interleaved media payload)
            for _ in range(r.randint(0, 3)):
                m = "http://static.{}/img/{}.jpg".format(
                    h.split(".", 1)[1], r.randint(0, 999)
                )
                add("media", m, m)
            # dynamic requests (intercepted XHR)
            for _ in range(r.randint(0, 2)):
                add(
                    "request",
                    "http://{}/ajax/load.php?id={}&cb={}".format(
                        h, r.randint(0, 30), r.randint(1000, 9999)
                    ),
                )
            # forms
            if r.random() < 0.4:
                add(
                    "form",
                    "GET http://{}/search.php?q={}&submit=ok".format(
                        h, r.choice(_WORDS)
                    ),
                )
            if r.random() < 0.2:
                add(
                    "form",
                    "POST http://{}/login.php?user=mazafaka&password=Passw0rd!%40%23".format(h),
                )

            if spec.edge_cases and r.random() < 0.5:
                # the FIXTURES.md §A1 edge-case menagerie
                pick = r.sample(range(12), 4)
                if 0 in pick:
                    add("link", "http://{}/style/main.css".format(h))  # F1 ext
                if 1 in pick:
                    add("link", "//{}/proto/rel.php".format(h))  # protocol-relative
                if 2 in pick:
                    add("link", "javascript:void(0)")  # F6 — never emitted
                if 3 in pick:
                    add("link", "javascript:doStuff(1)")  # event, never emitted
                if 4 in pick:
                    add("link", "relative/path.php")  # no scheme — skipped
                if 5 in pick:
                    add("link", "http://{}/long/{}".format(h, "x" * 1100))  # F5
                if 6 in pick:
                    add(
                        "link",
                        "http://m.alicdn.com/n/4.0.18/??css/a.css,b.css",  # F7
                    )
                if 7 in pick:
                    add("link", "http://hm.baidu.com/hm.js?k={}".format(r.randint(0, 9)))
                if 8 in pick:
                    add("link", "http://mirrors.aliyun.com/pkg/x.rpm")  # F3
                if 9 in pick:
                    add("link", "http://{}/cat.php?sort={}&page={}".format(
                        h, _WORDS[0], r.randint(0, 5)))  # query-perm dup pattern
                if 10 in pick:
                    add("request", "http://{}/Common/common/captcha?0.610851539997384".format(h))
                if 11 in pick:
                    # duplicate of an earlier span (in-page dedupe E7/E8)
                    link_spans = [s for s in spans if s[0] == "link"]
                    if link_spans:
                        add("link", link_spans[0][1])
            add("text", rnd_text(r))
            docs.append((u, spans))

    # seeds (A2): one per domain's www host; first one non-canonical
    # (bare host) to exercise T1 at seed time.
    seeds = []
    for i, d in enumerate(_domains(spec)):
        h = "www.{}".format(d)
        if h not in pages:
            continue
        seeds.append(h if i == 0 else "http://{}/".format(h))
    return docs, seeds


def corpus_to_spark(spark: SparkSession, docs) -> DataFrame:
    rows = [
        (doc_id, [{"kind": k, "text": t, "media_ref": m, "offset": o} for k, t, m, o in spans])
        for doc_id, spans in docs
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA)


def write_bucketed_documents(
    spark: SparkSession, docs: DataFrame, table: str, buckets: int = 8
) -> DataFrame:
    """Persist the documents table bucketed + sorted by ``doc_id`` and
    return the bucketed scan — the 10^10-scale storage layout for the
    crawl fetch join (plans/crawl.py shuffle boundary (1)): the join
    key equals the bucket key, so the scan already satisfies the
    join's required hash partitioning and ONLY the (small) frontier
    side exchanges; the 100 TB documents side is never shuffled. On a
    real deployment this is the Iceberg table's ``bucket(N, doc_id)``
    partition transform (storage-partitioned join); the builtin
    ``bucketBy`` table is the jar-less sandbox equivalent with the
    same plan shape (pinned by tests/test_bucketed_fetch.py).
    """
    (
        docs.write.mode("overwrite")
        .bucketBy(buckets, "doc_id")
        .sortBy("doc_id")
        .format("parquet")
        .saveAsTable(table)
    )
    return spark.table(table)


def seeds_to_spark(spark: SparkSession, seeds) -> DataFrame:
    return spark.createDataFrame(
        [(s, i) for i, s in enumerate(seeds)], SEEDS_SCHEMA
    )


def write_corpus(spark: SparkSession, path: str, spec: CorpusSpec | None = None):
    docs, seeds = generate_corpus(spec)
    corpus_to_spark(spark, docs).write.mode("overwrite").parquet(f"{path}/documents")
    seeds_to_spark(spark, seeds).write.mode("overwrite").parquet(f"{path}/seeds")
    return docs, seeds
