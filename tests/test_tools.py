"""Smoke tests for the CLI tool wrappers (reference tools/ parity)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from tspider_spark.sources.state import SCHEMAS, StateStore


def _store_with_results(spark, path):
    store = StateStore(spark, str(path))
    rows = [
        ("GET", "http://h1.com/a?x=1", None, {}, "link",
         "http://h1.com/a?x", "h1.com", "h1.com", True, 0, 0),
        ("GET", "http://h1.com/a?x=2", None, {}, "link",
         "http://h1.com/a?x", "h1.com", "h1.com", True, 0, 1),
        ("POST", "http://h2.com/f", "a=1", {}, "form",
         "http://h2.com/f", "h2.com", "h2.com", True, 1, 2),
    ]
    store.commit(appends={"results": spark.createDataFrame(rows, SCHEMAS["results"])})
    return store


def test_block_domain_tool(spark, tmp_path):
    import block_domain

    store = StateStore(spark, str(tmp_path / "s"))
    store.commit(meta={"config": {"blocklist": ["old.com"]}})
    added = block_domain.main(
        [str(tmp_path / "s"), "evil.com", "old.com"], spark=spark
    )
    assert added == ["evil.com"]
    assert store.meta()["config"]["blocklist"] == ["old.com", "evil.com"]
    # the engine picks the new blocklist up on resume
    from tspider_spark.config import CrawlConfig

    assert CrawlConfig.from_meta(store.meta()["config"]).blocklist == [
        "old.com", "evil.com",
    ]


def test_export_results_tool(spark, tmp_path):
    import export_results

    _store_with_results(spark, tmp_path / "s")
    urls = export_results.main([str(tmp_path / "s"), "urls"], spark=spark)
    assert urls == [
        "http://h1.com/a?x=1", "http://h1.com/a?x=2", "http://h2.com/f",
    ]
    fields = export_results.main(
        [str(tmp_path / "s"), "fields", "--fields", "method,url"], spark=spark
    )
    assert fields[0] == "GET\thttp://h1.com/a?x=1"
    poc = export_results.main([str(tmp_path / "s"), "pocsuite"], spark=spark)
    assert sorted(poc) == [
        "h1.com\thttp://h1.com/a?x\thttp://h1.com/a?x=1",
        "h2.com\thttp://h2.com/f\thttp://h2.com/f",
    ]
    out = tmp_path / "urls.txt"
    export_results.main(
        [str(tmp_path / "s"), "urls", "--out", str(out)], spark=spark
    )
    assert out.read_text().splitlines() == urls


def test_rebuild_seen_cache_tool(spark, tmp_path):
    import rebuild_seen_cache

    store = _store_with_results(spark, tmp_path / "s")
    n = rebuild_seen_cache.main([str(tmp_path / "s")], spark=spark)
    assert n == 2
    keys = {r["saved_key"] for r in store.read("seen_saved").collect()}
    assert keys == {"GET-http://h1.com/a?x", "POST-http://h2.com/f"}


def test_score_hosts_tool_feeds_authority_mode(spark, tmp_path):
    """Close the authority loop: documents -> score_hosts (real
    extraction -> host graph -> pagerank/trustrank -> dense ranks) ->
    parquet consumable by submit_crawl --host-priorities."""
    import score_hosts

    from tspider_spark.sources.corpus import (
        CorpusSpec,
        corpus_to_spark,
        generate_corpus,
    )

    docs, _ = generate_corpus(
        CorpusSpec(seed=11, n_domains=3, hosts_per_domain=2, hot_host_pages=10)
    )
    dpath = str(tmp_path / "docs")
    corpus_to_spark(spark, docs).write.parquet(dpath)

    out = str(tmp_path / "prio")
    n = score_hosts.main(
        ["--documents", dpath, "--out", out, "--algo", "pagerank",
         "--iters", "5"],
        spark=spark,
    )
    pr = spark.read.parquet(out)
    assert set(pr.columns) == {"hostname", "priority"}
    rows = {r["hostname"]: r["priority"] for r in pr.collect()}
    assert n == len(rows) > 3
    assert sorted(rows.values()) == list(range(len(rows)))  # dense ranks

    # trustrank variant with a real corpus host as seed
    seed_host = sorted(rows)[0]
    n2 = score_hosts.main(
        ["--documents", dpath, "--out", str(tmp_path / "prio2"),
         "--algo", "trustrank", "--iters", "5", "--seeds", seed_host],
        spark=spark,
    )
    pr2 = spark.read.parquet(str(tmp_path / "prio2"))
    assert n2 == pr2.count() == len(rows)


def test_run_curate_tool(spark, tmp_path):
    """CLI face of the curation plan: text mode writes the requested
    stage tables; interleaved mode runs the OBELICS front-end with the
    furniture cuts."""
    import run_curate

    good = ("the quick brown fox jumps over the lazy dog while the "
            "patient farmer watches the field and counts the hours "
            "of the long day before the rest of the evening ")
    far = ("a silver river winds between the tall mountains carrying "
           "cold water toward the distant villages where children of "
           "the valley gather wood and old sailors mend their nets ")
    rows = [(0, good), (1, far), (99, good)]  # 99 = exact dup of 0
    corpus = str(tmp_path / "corpus")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        corpus
    )
    out = str(tmp_path / "out")
    counts = run_curate.main(
        [corpus, out, "--min-words", "10", "--stages", "rule_pass,deduped"],
        spark=spark, stop_session=False,
    )
    assert counts["rule_pass"] == 3
    assert counts["deduped"] == 2  # the exact dup is gone, far stays
    assert (Path(out) / "deduped").exists()

    spans = [
        (1, [{"kind": "text", "text": good, "media_ref": None, "offset": 0},
             {"kind": "media", "text": None, "media_ref": "logo",
              "offset": 1}], "h"),
        (2, [{"kind": "text", "text": far, "media_ref": None,
              "offset": 0},
             {"kind": "media", "text": None, "media_ref": "logo",
              "offset": 1}], "h"),
    ]
    inter = str(tmp_path / "inter")
    spark.createDataFrame(
        spans,
        "doc_id long, spans array<struct<kind string, text string, "
        "media_ref string, offset int>>, host string",
    ).write.parquet(inter)
    out2 = str(tmp_path / "out2")
    counts2 = run_curate.main(
        [inter, out2, "--interleaved", "--min-words", "10",
         "--media-max-doc-freq", "1", "--stages", "media_filtered,packed"],
        spark=spark, stop_session=False,
    )
    assert counts2["media_filtered"] == 2
    # the logo (doc_freq 2 > 1) was cut from the spans of both docs
    mf = spark.read.parquet(str(Path(out2) / "media_filtered")).collect()
    assert all(
        s["kind"] != "media" for r in mf for s in r["spans"]
    )
    assert counts2["packed"] == 2

    # holdout split flag: split stage covers the deduped survivors,
    # packed covers only the training split
    out3 = str(tmp_path / "out3")
    counts3 = run_curate.main(
        [corpus, out3, "--min-words", "10",
         "--split", "train=14,valid=1,test=1",
         "--stages", "split,packed"],
        spark=spark, stop_session=False,
    )
    assert counts3["split"] == 2
    sp = spark.read.parquet(str(Path(out3) / "split")).collect()
    n_train = sum(1 for r in sp if r["split"] == "train")
    assert counts3["packed"] == n_train


def test_frontier_stats_tool(spark, tmp_path, capsys):
    """Sketch dashboard over the seen-set: HLL per-host cardinality and
    count-min hot digit-folded patterns, read through the StateStore
    (so snapshots/time-travel apply)."""
    import json

    import frontier_stats

    store = StateStore(spark, str(tmp_path / "s"))
    rows = (
        [("big.com", f"http://big.com/item/{i}?id") for i in range(40)]
        + [("small.com", "http://small.com/a")]
        + [("small.com", "http://small.com/b")]
    )
    store.commit(
        appends={
            "seen_scanned": spark.createDataFrame(
                rows, SCHEMAS["seen_scanned"]
            )
        }
    )
    rc = frontier_stats.main(
        ["--state", str(tmp_path / "s"), "--top", "3", "--b", "6"],
        spark=spark,
    )
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("FRONTIER_STATS ")
    ][-1]
    out = json.loads(line[len("FRONTIER_STATS "):])
    assert out["table"] == "seen_scanned"
    hosts = {h["hostname"]: h["n_hll"] for h in out["hosts"]}
    # HLL at b=6 is approximate but must rank big.com first and land
    # within its coarse error envelope
    assert list(out["hosts"])[0]["hostname"] == "big.com"
    assert 20 <= hosts["big.com"] <= 80
    assert 1 <= hosts["small.com"] <= 4
    # the 40 /item/{i} keys fold to one hot pattern; CMS never
    # undercounts
    top = out["hot_patterns"][0]
    assert top["pattern"] == "http://big.com/item/{d}?id"
    assert top["n_exact"] == 40
    assert top["n_cms"] >= 40


def test_frontier_stats_reads_streamed_sketch(spark, tmp_path, capsys):
    """--table host_hll finalizes the streamed register table without
    touching the raw key space (b read from commit meta)."""
    import json

    import frontier_stats

    from tspider_spark.operators.sketch import hll_registers
    from pyspark.sql import functions as F

    store = StateStore(spark, str(tmp_path / "s"))
    rows = [("big.com", f"http://big.com/p{i}") for i in range(50)]
    regs = hll_registers(
        spark.createDataFrame(rows, "hostname string, url string"),
        "hostname", "url", b=5,
    ).select(F.col("grp").alias("hostname"), "reg", "rho")
    store.commit(replaces={"host_hll": regs}, meta={"hll_b": 5})

    rc = frontier_stats.main(
        ["--state", str(tmp_path / "s"), "--table", "host_hll"], spark=spark
    )
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("FRONTIER_STATS ")
    ][-1]
    out = json.loads(line[len("FRONTIER_STATS "):])
    assert out["hosts"][0]["hostname"] == "big.com"
    assert 30 <= out["hosts"][0]["n_hll"] <= 80
    assert out["hot_patterns"] == []


def test_state_diff_tool(spark, tmp_path, capsys):
    """Snapshot diff between committed versions: appends show up as
    `added`, replaces as added+removed, defaults diff the last commit."""
    import json

    import state_diff

    store = StateStore(spark, str(tmp_path / "s"))
    mk = lambda rows: spark.createDataFrame(rows, SCHEMAS["seen_scanned"])
    store.commit(appends={"seen_scanned": mk([("h1", "k1"), ("h1", "k2")])})
    store.commit(
        appends={"seen_scanned": mk([("h2", "k3")])},
        replaces={
            "host_budget": spark.createDataFrame(
                [("h1", 2)], SCHEMAS["host_budget"]
            )
        },
    )
    rc = state_diff.main([str(tmp_path / "s")], spark=spark)
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("STATE_DIFF ")
    ][-1]
    out = json.loads(line[len("STATE_DIFF "):])
    assert (out["from"], out["to"]) == (1, 2)
    ss = out["tables"]["seen_scanned"]
    assert (ss["rows_from"], ss["rows_to"]) == (2, 3)
    assert ss["added"] == 1 and ss["removed"] == 0
    hb = out["tables"]["host_budget"]
    assert hb["rows_from"] == 0 and hb["rows_to"] == 1 and hb["added"] == 1
    # explicit range: full history diff from the empty v0
    state_diff.main(
        [str(tmp_path / "s"), "--from", "0", "--to", "2",
         "--table", "seen_scanned", "--sample", "0"],
        spark=spark,
    )
    out2 = json.loads(
        [ln for ln in capsys.readouterr().out.splitlines()
         if ln.startswith("STATE_DIFF ")][-1][len("STATE_DIFF "):]
    )
    assert out2["tables"]["seen_scanned"]["added"] == 3


def test_export_shards_tool(spark, tmp_path, capsys):
    """Sharded JSONL sink over a packed curation stage: rows land in
    shard=N dirs by seq_first // shards_per_file, content round-trips."""
    import json as _json

    import export_shards

    from tspider_spark.operators.curate import pack_sequences

    docs = spark.createDataFrame(
        [(i, "en", 40) for i in range(20)],
        "doc_id long, lang string, n_tokens int",
    )
    packed = pack_sequences(docs, seq_tokens=100, stratum_col="lang")
    packed.write.parquet(str(tmp_path / "out" / "packed"))

    rc = export_shards.main(
        [str(tmp_path / "out"), str(tmp_path / "shards"),
         "--shards-per-file", "4", "--columns", "doc_id,lang"],
        spark=spark,
    )
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("EXPORT_SHARDS ")
    ][-1]
    stats = _json.loads(line[len("EXPORT_SHARDS "):])
    assert stats["rows"] == 20
    # 20 docs x 40 tokens = 800 tokens -> seq_first 0..7 -> shards 0,1
    assert stats["shards"] == 2
    shard_dirs = sorted(
        p.name for p in (tmp_path / "shards").iterdir() if p.is_dir()
    )
    assert shard_dirs == ["shard=0", "shard=1"]
    rows = []
    for f in (tmp_path / "shards").rglob("*.json"):
        rows += [_json.loads(ln) for ln in f.read_text().splitlines()]
    assert len(rows) == 20
    assert {r["doc_id"] for r in rows} == set(range(20))
    assert all(set(r) == {"doc_id", "lang", "seq_first"} for r in rows)
