"""Corpus-quality curation operators (Gopher repetition, C4 line
filter, n-gram decontamination) — value pins + physical-plan shape."""

from __future__ import annotations

from tspider_spark.operators.quality import (
    c4_line_filter,
    decontam_flags,
    repetition_stats,
)


def test_repetition_stats_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b c"), (2, "x y z w v u t s"), (3, "q q q q")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    # doc 1: "a b" occurs 3x, len 3, doc len 13 -> 9/13
    assert rows[1]["top2_gram"] == "a b"
    assert abs(rows[1]["top2_frac"] - round(9 / 13, 6)) < 1e-9
    # overlapping occurrences cap at 1.0 ("q q" 3x in 7 chars)
    assert rows[3]["top2_frac"] == 1.0
    # unique grams tie-break by gram text ascending
    assert rows[2]["top2_gram"] == "t s"
    # 4-gram column present when requested
    r4 = {r["doc_id"]: r for r in repetition_stats(df, ns=(2, 4)).collect()}
    assert r4[3]["top4_gram"] == "q q q q"


def test_repetition_stats_short_doc_no_global_window(spark):
    df = spark.createDataFrame([(1, "one"), (2, "a b")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(df, ns=(2, 3)).collect()}
    # 1-word doc: no 2-grams at all -> absent entirely
    assert 1 not in rows
    # 2-word doc: has a 2-gram, no 3-gram -> null 3-columns
    assert rows[2]["top2_gram"] == "a b" and rows[2]["top3_gram"] is None
    # the ranking window is partitioned (doc_id, n) — never global
    import re

    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    assert re.search(r"windowspecdefinition\(doc_id#\d+L?, n#", plan)


def test_c4_line_filter_rules(spark):
    text = (
        "Good line with punctuation.\n"
        "short.\n"
        "no terminal punct here\n"
        "Another fine sentence!\n"
        "this line has javascript inside.\n"
        "lorem ipsum dolor sit amet.\n"
        'He said "stop".\n'
        "code line { x = 1; } done."
    )
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = c4_line_filter(df).collect()[0]
    assert row["n_lines"] == 8
    assert row["n_kept"] == 3
    assert row["clean_text"].split("\n") == [
        "Good line with punctuation.",
        "Another fine sentence!",
        'He said "stop".',
    ]


def test_decontam_flags_broadcasts_eval_side(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j"), (3, "c d e f g")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(99, "b c d e f")], "doc_id long, text string")
    got = {r["doc_id"]: r["n_contaminated_grams"]
           for r in decontam_flags(docs, ev, n=3).collect()}
    # doc1 shares 'b c d'+'c d e'; doc3 shares 'c d e'+'d e f'; doc2 none
    assert got == {1: 2, 3: 2}
    plan = (
        decontam_flags(docs, ev, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles to join


def test_paragraph_dedupe_keep_first_and_rebuild(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta\n\ngamma delta\n\nalpha beta"),
            (2, "gamma delta\n\nepsilon zeta"),
        ],
        "doc_id long, text string",
    )
    from tspider_spark.operators.quality import paragraph_dedupe

    rows = {r["doc_id"]: r for r in paragraph_dedupe(df).collect()}
    # doc1: in-doc repeat of 'alpha beta' dropped (pos 0 wins)
    assert rows[1]["clean_text"] == "alpha beta\n\ngamma delta"
    assert rows[1]["n_paras"] == 3 and rows[1]["n_kept"] == 2
    # doc2: 'gamma delta' already owned by doc1
    assert rows[2]["clean_text"] == "epsilon zeta"
    assert rows[2]["n_kept"] == 1
    # keep-first is an aggregation (partial-agg skew-safe), not a
    # per-paragraph window sort
    plan = paragraph_dedupe(df)._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(para" not in plan


def test_paragraph_dedupe_fully_duplicate_doc_is_emptied(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    from tspider_spark.operators.quality import paragraph_dedupe

    rows = {r["doc_id"]: r for r in paragraph_dedupe(df).collect()}
    assert rows[2]["clean_text"] == "" and rows[2]["n_kept"] == 0


def test_recipe_rates_mixture_and_no_upsampling(spark):
    from tspider_spark.operators.curate import recipe_rates, sample_by_hash

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", "w " * 10) for i in range(200)],
        "doc_id long, lang string, text string",
    )
    rates = recipe_rates(df, {"en": 0.5, "de": 0.25}, stratum_col="lang")
    got = {r["lang"]: r for r in rates.collect()}
    # en: 1000 tokens / 0.5 = 2000; de: 1000 / 0.25 = 4000 -> en binds
    assert got["en"]["rate"] == 1.0
    assert got["de"]["rate"] == 0.5  # 0.25 * 2000 / 1000
    assert got["en"]["expected_weight"] == 1000.0
    assert got["de"]["expected_weight"] == 500.0
    # unlisted stratum absent; rates feed sample_by_hash directly
    kept = sample_by_hash(
        df, {r["lang"]: r["rate"] for r in rates.collect()},
        stratum_col="lang",
    )
    en, de = (
        kept.filter(kept.lang == "en").count(),
        kept.filter(kept.lang == "de").count(),
    )
    assert en == 100  # rate 1 keeps everything
    assert 30 <= de <= 70  # deterministic hash draw near 50


def test_substring_dedupe_cuts_duplicated_windows(spark):
    from tspider_spark.operators.quality import substring_dedupe

    # doc 1 and doc 2 share the 4-token window "p q r s" mid-document;
    # doc 1 (first by id) keeps it, doc 2 loses exactly those 4 tokens.
    df = spark.createDataFrame(
        [
            (1, "a b p q r s c d"),
            (2, "x y p q r s z w"),
            (3, "all unique tokens here live alone"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in substring_dedupe(df, length=4).collect()}
    assert rows[1]["clean_text"] == "a b p q r s c d"
    assert rows[1]["n_dup_tokens"] == 0
    assert rows[2]["clean_text"] == "x y z w"
    assert rows[2]["n_tokens"] == 8 and rows[2]["n_dup_tokens"] == 4
    assert rows[3]["n_dup_tokens"] == 0


def test_substring_dedupe_self_overlap_keeps_uncovered_prefix(spark):
    from tspider_spark.operators.quality import substring_dedupe

    # "a a a a a" with length=2: windows at 0..3 are all "a a"; winner
    # is start 0, dups at 1,2,3 cover positions 1..4 -> only token 0
    # survives (the documented position-set semantics).
    df = spark.createDataFrame([(1, "a a a a a")], "doc_id long, text string")
    r = substring_dedupe(df, length=2).collect()[0]
    assert r["clean_text"] == "a" and r["n_dup_tokens"] == 4
    # an exact whole-doc copy is fully cut
    df2 = spark.createDataFrame(
        [(1, "m n o p q r"), (2, "m n o p q r")], "doc_id long, text string"
    )
    rows = {x["doc_id"]: x for x in substring_dedupe(df2, length=3).collect()}
    assert rows[1]["clean_text"] == "m n o p q r"
    assert rows[2]["clean_text"] == "" and rows[2]["n_dup_tokens"] == 6


def test_substring_dedupe_short_docs_untouched(spark):
    from tspider_spark.operators.quality import substring_dedupe

    # docs shorter than the window length produce no windows at all,
    # even when they are exact duplicates of each other
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    rows = {x["doc_id"]: x for x in substring_dedupe(df, length=8).collect()}
    assert rows[1]["clean_text"] == "tiny doc"
    assert rows[2]["clean_text"] == "tiny doc"


def test_unigram_logprob_hand_values(spark):
    import math

    from tspider_spark.operators.quality import unigram_logprob

    # corpus: tokens a a a b -> p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert rows[1]["n_tokens"] == 3
    assert abs(rows[1]["bits_per_token"] - round(math.log2(4 / 3), 6)) < 1e-9
    assert abs(rows[2]["bits_per_token"] - 2.0) < 1e-9


def test_unigram_logprob_no_python_udfs(spark):
    from tspider_spark.operators.quality import unigram_logprob

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = unigram_logprob(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_dup_line_stats_values(spark):
    from tspider_spark.operators.quality import dup_line_stats

    df = spark.createDataFrame(
        [
            (1, "aa\nbb\naa\ncc"),        # 'aa' x2 of 4 lines
            (2, "x\ny\nz"),               # no dups
            (3, "same\nsame\nsame"),      # all dup
            (4, "long line here\nshort\nlong line here\n\n  "),  # empties ignored
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dup_line_stats(df).collect()}
    assert rows[1]["n_lines"] == 4
    assert abs(rows[1]["dup_line_frac"] - 0.5) < 1e-9
    # chars: aa(2)+aa(2) dup of aa,bb,aa,cc = 4/8
    assert abs(rows[1]["dup_line_char_frac"] - 0.5) < 1e-9
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[3]["dup_line_frac"] == 1.0
    # doc 4: 3 non-empty lines; "long line here" (14 ch) x2 + "short" (5)
    assert rows[4]["n_lines"] == 3
    assert abs(rows[4]["dup_line_frac"] - round(2 / 3, 6)) < 1e-9
    assert abs(rows[4]["dup_line_char_frac"] - round(28 / 33, 6)) < 1e-9


def test_dup_ngram_stats_values(spark):
    from tspider_spark.operators.quality import dup_ngram_stats

    df = spark.createDataFrame(
        [
            (1, "a b c d e a b c d e"),  # "a b c d e" 5-gram occurs 2x
            (2, "x x x x x x"),          # self-overlap caps at 1.0
            (3, "a b c"),                # too short for any n -> no row
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dup_ngram_stats(df, ns=(5, 6, 7)).collect()}
    assert set(rows) == {1, 2}
    # doc 1: dup 5-gram chars 2 x 9 = 18 of 19; 6-/7-grams all unique
    assert abs(rows[1]["dup5_frac"] - round(18 / 19, 6)) < 1e-9
    assert rows[1]["dup6_frac"] == 0.0
    assert rows[1]["dup7_frac"] == 0.0
    # doc 2: "x x x x x" occurs 2x, 2 x 9 = 18 > 11 chars -> capped
    assert rows[2]["dup5_frac"] == 1.0
    # single 6-gram occurrence is not a duplicate
    assert rows[2]["dup6_frac"] == 0.0
    # no 7-grams at all -> NULL column, row still present via n=5/6
    assert rows[2]["dup7_frac"] is None


def test_split_assign_group_coherent_and_deterministic(spark):
    from tspider_spark.operators.curate import split_assign

    df = spark.createDataFrame(
        [(i, f"site{i % 40}") for i in range(400)],
        "doc_id long, source string",
    )
    w = {"train": 14, "valid": 1, "test": 1}
    a = split_assign(df, w, group_col="source")
    b = split_assign(df, w, group_col="source")
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect()))  # deterministic
    # every group lands in exactly ONE split (leakage-safety)
    from pyspark.sql import functions as F

    per_group = a.groupBy("source").agg(
        F.countDistinct("split").alias("k")
    )
    assert per_group.filter(F.col("k") != 1).count() == 0
    # all three splits are populated at 40 groups and the majority
    # lands in train (14/16 weight)
    counts = {r["split"]: r["n"] for r in
              a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts.get("train", 0) > counts.get("valid", 0)
    assert counts.get("train", 0) > counts.get("test", 0)
    # adding docs to a site never moves the site's split
    extra = spark.createDataFrame(
        [(9999, "site3")], "doc_id long, source string"
    )
    s_new = split_assign(extra, w, group_col="source").collect()[0]["split"]
    s_old = a.filter(F.col("source") == "site3").select("split").first()["split"]
    assert s_new == s_old


def test_pack_shards_matches_sequential_walk(spark):
    from pyspark.sql import functions as F

    from tspider_spark.operators.curate import pack_shards

    # irregular ids (gaps) across two strata; shift=2 -> 4-id buckets
    rows = [
        (i, "en" if i % 3 else "de", (i * 37) % 90 + 10) for i in range(0, 40, 3)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens long")
    got = {
        r["doc_id"]: r["shard_id"]
        for r in pack_shards(df, shard_tokens=100, super_shift=2).collect()
    }
    # sequential truth: exclusive cumsum per stratum in id order
    expect = {}
    for lang in ("en", "de"):
        acc = 0
        for i, lg, t in sorted(rows):
            if lg != lang:
                continue
            expect[i] = acc // 100
            acc += t
    assert got == expect
    # shard totals stay within one doc of the budget: every shard
    # except the stratum's last starts within the budget boundary
    out = pack_shards(df, shard_tokens=100, super_shift=2)
    sums = out.groupBy("lang", "shard_id").agg(
        F.sum("n_tokens").alias("s")
    ).collect()
    assert all(r["s"] > 0 for r in sums)


def test_new_ops_plan_shapes_no_global_window(spark):
    """Every window in the new curation operators must carry a
    partition spec — a bare windowspecdefinition(ORDER...) means the
    single-partition WindowExec scale-killer."""
    import re

    from pyspark.sql import functions as F

    from tspider_spark.operators.curate import pack_shards
    from tspider_spark.operators.quality import substring_dedupe, unigram_logprob

    docs = spark.createDataFrame(
        [(i, "en", "alpha beta gamma delta epsilon zeta") for i in range(8)],
        "doc_id long, lang string, text string",
    )
    toks = docs.select("doc_id", "lang", F.lit(10).alias("n_tokens"))
    for df in (
        substring_dedupe(docs.select("doc_id", "text"), length=3),
        unigram_logprob(docs.select("doc_id", "text")),
        pack_shards(toks, shard_tokens=25, super_shift=2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # windowspecdefinition's first arg must be a column, not a
        # sort spec (global windows start with "col ASC/DESC")
        for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
            first = m.group(1).split(",")[0]
            assert " ASC" not in first and " DESC" not in first, m.group(0)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_r3_ops_plan_shapes(spark):
    """Round-3 additions stay JVM-side and shuffle-lean: split_assign
    is a pure projection (zero exchanges); dup_ngram_stats and the
    anchor operators use hash aggs only — no Window, no Python."""
    from pyspark.sql import functions as F

    from tspider_spark.operators.curate import split_assign
    from tspider_spark.operators.interleaved import (
        anchor_candidates,
        anchor_profiles,
    )
    from tspider_spark.operators.quality import dup_ngram_stats

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", "alpha beta gamma delta epsilon zeta eta theta")
         for i in range(8)],
        "doc_id long, source string, text string",
    )
    sp = docs.select(
        "doc_id",
        F.array(
            F.struct(F.lit("text").alias("kind"), F.lit("hi").alias("text"),
                     F.lit(None).cast("string").alias("media_ref"),
                     F.lit(0).alias("offset")),
            F.struct(F.lit("link").alias("kind"),
                     F.lit("http://a.com/x").alias("text"),
                     F.lit(None).cast("string").alias("media_ref"),
                     F.lit(1).alias("offset")),
        ).alias("spans"),
    )

    plan = split_assign(
        docs, {"train": 14, "valid": 1, "test": 1}, group_col="source"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Window" not in plan

    for df in (
        dup_ngram_stats(docs.select("doc_id", "text"), ns=(3, 4)),
        anchor_profiles(anchor_candidates(sp)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pii_redact_semantics(spark):
    """Dolma-style PII: placeholder tokens, disjoint sequential counts
    (a redacted email's digits never recount as a phone), boundary
    edges (999.x not an IP, 5-octet runs rejected, 1-letter TLD not
    an email). Shuffle-free, no Python eval in the plan."""
    from tspider_spark.operators.quality import pii_redact

    rows = [
        (1, "mail bob.smith+x@ex-ample.co.uk or call (555) 867-5309"),
        (2, "server 10.0.200.7 and 255.255.255.255 but 999.1.1.1 no"),
        (3, "a@b.io c%d@e.org and 123.456.7890 plus 555-111-2222"),
        (4, "no pii here at all 1234"),
        (5, "edge 1.2.3.4567 and x@y.z"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pii_redact(df)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    assert got[1]["clean_text"] == "mail |||EMAIL||| or call |||PHONE|||"
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (1, 0, 1)
    assert got[2]["clean_text"] == "server |||IP||| and |||IP||| but 999.1.1.1 no"
    assert got[2]["n_ips"] == 2
    assert (got[3]["n_emails"], got[3]["n_phones"]) == (2, 2)
    assert got[4]["clean_text"] == "no pii here at all 1234"
    assert got[5]["clean_text"] == "edge 1.2.3.4567 and x@y.z"

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_normalize_text_matches_duckdb(spark):
    """NFC + cleanup pipeline is byte-identical to the DuckDB oracle
    on decomposed accents, control chars, runs and outer whitespace."""
    import duckdb
    import pandas as pd

    from tspider_spark.operators.quality import (
        normalize_text, normalize_text_oracle_sql,
    )

    rows = [
        (1, "plain text"),
        (2, "a\u0301 combining\tand\ttabs"),
        (3, "  outer   runs  \n\n\n\n\nmany blanks \n mid \n"),
        (4, "ctrl\x07here\x1fand\x0bthere"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_chars_raw"], r["n_chars"])
           for r in normalize_text(df).collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = {r[0]: (r[1], r[2], r[3])
           for r in con.execute(normalize_text_oracle_sql()).fetchall()}
    assert got == exp
    assert got[2][0] == "\u00e1 combining and tabs"   # NFC recombined
    assert got[3][0] == "outer runs\n\nmany blanks\nmid"


def test_dsir_weights_direction(spark):
    """Importance weights point toward the target: a doc made of
    target-distribution tokens outweighs one of raw-only tokens, and
    weights are finite under add-1 smoothing even for words the
    target never saw."""
    from tspider_spark.operators.quality import dsir_weights

    raw = spark.createDataFrame(
        [(1, "code code code loop loop"),
         (2, "poetry verse rhyme meter"),
         (3, "code loop poetry verse")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "poetry verse rhyme rhyme meter poetry")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["log2_weight"] for r in dsir_weights(raw, target).collect()}
    assert set(got) == {1, 2, 3}
    assert got[2] > got[3] > got[1]  # target-like > mixed > raw-only
    assert all(abs(v) < 100 for v in got.values())


def test_gopher_filter_rules(spark):
    """Each Gopher rule fires on a crafted offender and a clean doc
    passes; reasons are ordered and disjoint per construction."""
    from tspider_spark.operators.quality import gopher_filter

    clean = ("the quick brown fox and the lazy dog have been seen with "
             "many of their friends that wander to town. " * 5)
    rows = [
        (1, clean),
        (2, "short words only"),                         # word_count+
        (3, " ".join(["####"] * 60)),                    # symbols, no alpha
        (4, "\n".join(["- " + clean[:40]] * 20)),        # bullets + dups
        (5, " ".join(["supercalifragilistic"] * 60)),    # mean_word_length
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["passes"], list(r["fail_reasons"]))
           for r in gopher_filter(df).collect()}
    assert got[1] == (True, [])
    assert got[2][0] is False and "word_count" in got[2][1]
    assert "symbol_ratio" in got[3][1] and "alpha_words" in got[3][1]
    assert "bullet_lines" in got[4][1] and "dup_lines" in got[4][1]
    assert "mean_word_length" in got[5][1] and "stopwords" in got[5][1]


def test_normalize_and_pii_random_properties(spark):
    """Property batch over 300 seeded random messy strings:
    (a) normalize_text is idempotent; (b) Spark == DuckDB on the whole
    batch; (c) pii_redact leaves no residual pattern matches when PII
    atoms are delimited (the single-pass pipeline is pinned: gluing a
    bare IP directly onto a phone number only exposes the IP's word
    boundary after the phone is redacted, so undelimited
    concatenations can legitimately leave one residual)."""
    import random

    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from tspider_spark.operators.quality import (
        PII_PATTERNS, normalize_text, normalize_text_oracle_sql, pii_redact,
    )

    rng = random.Random(1234)
    alphabet = (
        list("abcdefghij .#!?\t\n") + ["́", "é", "\x07", "\x1f"]
        + ["@", "0", "5", "(", ")", "-", "...", "  ", "\n\n\n"]
        + [" bob@x.io ", " 10.0.0.1 ", " 555-123-4567 ", " 999.1.2.3 "]
    )
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60))))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = normalize_text(df).cache()
    # (a) idempotence
    again = normalize_text(
        out.select("doc_id", F.col("clean_text").alias("text"))
    )
    j = out.select("doc_id", "clean_text").join(
        again.select("doc_id", F.col("clean_text").alias("c2")), "doc_id"
    )
    diffs = j.filter(F.col("clean_text") != F.col("c2")).count()
    assert diffs == 0
    # (b) engine agreement on the random batch
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    exp = dict(con.execute(
        "select doc_id, clean_text from (" +
        normalize_text_oracle_sql() + ")").fetchall())
    assert got == exp
    # (c) no residual PII matches after redaction
    red = pii_redact(df)
    residual = red
    for name, pat, _tok in PII_PATTERNS:
        residual = residual.withColumn(
            f"_left_{name}", F.regexp_count("clean_text", F.lit(pat))
        )
    bad = residual.filter(
        sum(F.col(f"_left_{n}") for n, _, _ in PII_PATTERNS) > 0
    ).count()
    assert bad == 0


def test_gram_novelty_semantics(spark):
    from tspider_spark.operators.quality import gram_novelty

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # grams abc, bcd unique
            (2, "alpha beta gamma other"),   # shares 'alpha beta gamma'
            (3, "wholly unrelated text here"),
            (4, "ab"),                       # < 3 words: no grams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gram_novelty(docs, n=3).collect()}
    assert set(out) == {1, 2, 3}  # doc 4 has no grams -> no row
    # doc 1: grams {a b g, b g d}; 'a b g' shared with doc 2 -> 1/2
    assert out[1]["n_grams"] == 2 and out[1]["n_novel"] == 1
    assert out[1]["novelty"] == 0.5
    assert out[2]["novelty"] == 0.5
    # doc 3: all grams unique
    assert out[3]["novelty"] == 1.0


def test_gram_novelty_exact_copies_score_zero(spark):
    from tspider_spark.operators.quality import gram_novelty

    docs = spark.createDataFrame(
        [(1, "one two three four five"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    out = gram_novelty(docs, n=3).collect()
    assert all(r["novelty"] == 0.0 for r in out)


def test_kn_bigram_matches_python_replica(spark):
    import math
    from collections import Counter
    from tspider_spark.operators.quality import kn_bigram_logprob

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the cat ate the fish"),
        (3, "a dog sat on a log"),
        (4, "one"),                      # single token -> no bigrams, dropped
    ]
    D = 0.75
    # python replica of interpolated KN over the same corpus
    toks = {i: t.lower().split() for i, t in docs}
    pairs = [(w[j], w[j + 1]) for w in toks.values() for j in range(len(w) - 1)]
    cbi = Counter(pairs)
    cprev = Counter()
    n1p_prev = Counter()
    n1p_cur = Counter()
    for (v, w), c in cbi.items():
        cprev[v] += c
        n1p_prev[v] += 1
        n1p_cur[w] += 1
    n_types = len(cbi)

    def p(v, w):
        return max(cbi[(v, w)] - D, 0.0) / cprev[v] + (
            D * n1p_prev[v] / cprev[v]
        ) * (n1p_cur[w] / n_types)

    # KN invariant: P(.|v) sums to 1 over the full continuation vocab
    vocab = set(n1p_cur)
    for v in cprev:
        assert abs(sum(p(v, w) for w in vocab) - 1.0) < 1e-9

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in kn_bigram_logprob(df, discount=D).collect()}
    assert set(got) == {1, 2, 3}        # doc 4 has no bigrams
    for i in (1, 2, 3):
        w = toks[i]
        bits = [-math.log2(p(w[j], w[j + 1])) for j in range(len(w) - 1)]
        assert got[i]["n_bigrams"] == len(bits)
        assert abs(got[i]["bits_per_token"] - sum(bits) / len(bits)) < 1e-5
