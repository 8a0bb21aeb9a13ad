"""Distributed BPE tokenizer training: canonical merge semantics
(greedy left-to-right, non-overlapping — the lookaround-free replace
trick), deterministic tie-breaks, early stop, and vocab weighting."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from tspider_spark.operators.bpe import (
    bpe_oracle_sql,
    bpe_train,
    bpe_vocab,
    merges_df,
    word_freq_table,
)


def _docs(spark, *texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _syms(wtab):
    return {r["sym"]: r["freq"] for r in wtab.collect()}


def test_merge_is_canonical_greedy_nonoverlapping(spark):
    # "aaaa": pair (a,a) occurs at 3 positions (overlap counted, like
    # Sennrich get_stats) but merges at (0,1) and (2,3) only.
    merges, wtab = bpe_train(_docs(spark, "aaaa aaa"), n_merges=1)
    assert merges == [
        {"round": 0, "lhs": "a", "rhs": "a", "merged": "aa", "n": 5}
    ]
    assert _syms(wtab) == {"aa aa": 1, "aa a": 1}


def test_merge_handles_adjacent_occurrences(spark):
    # "ababab": (a,b) wins 3-2 over (b,a); consecutive occurrences
    # share no symbols, so ALL of them merge in one round — the case
    # a naive space-delimited replace gets wrong.
    merges, wtab = bpe_train(_docs(spark, "ababab"), n_merges=1)
    assert merges[0]["lhs"] == "a" and merges[0]["rhs"] == "b"
    assert merges[0]["n"] == 3
    assert _syms(wtab) == {"ab ab ab": 1}


def test_tie_break_is_total_and_lexicographic(spark):
    # (u,v) and (x,y) both count 1 -> smallest lhs wins round 0.
    merges, _ = bpe_train(_docs(spark, "xy uv"), n_merges=2)
    assert (merges[0]["lhs"], merges[0]["rhs"]) == ("u", "v")
    assert (merges[1]["lhs"], merges[1]["rhs"]) == ("x", "y")


def test_early_stop_when_no_pairs_remain(spark):
    # single-char words only: nothing to merge, train returns fewer
    # rounds than asked and the word table is untouched
    merges, wtab = bpe_train(_docs(spark, "a b c a"), n_merges=3)
    assert merges == []
    assert _syms(wtab) == {"a": 2, "b": 1, "c": 1}


def test_word_freqs_and_vocab_weighting(spark):
    wtab = word_freq_table(_docs(spark, "aa b", "aa AA b7c"))
    # lowercased, [a-z]+ runs: aa x3, b x2 (the b of b7c), c x1
    assert _syms(wtab) == {"a a": 3, "b": 2, "c": 1}
    v = {r["symbol"]: r["n_tokens"] for r in bpe_vocab(wtab).collect()}
    assert v == {"a": 6, "b": 2, "c": 1}
    # top_k orders by count desc then symbol asc
    top = [r["symbol"] for r in bpe_vocab(wtab, top_k=2).collect()]
    assert top == ["a", "b"]


def test_merges_df_schema_and_rows(spark):
    merges, _ = bpe_train(_docs(spark, "abab abab"), n_merges=2)
    mdf = merges_df(spark, merges)
    assert [f.name for f in mdf.schema.fields] == [
        "round", "lhs", "rhs", "merged", "n",
    ]
    rows = {r["round"]: r["merged"] for r in mdf.collect()}
    assert rows[0] == "ab" and rows[1] == "abab"


def test_oracle_replays_training_bit_for_bit(spark, tmp_path):
    # 4 rounds on adversarial words (runs, adjacent occurrences, ties)
    texts = ["aaaa ababab banana", "aaa abab banana bandana", "nan ban"]
    _docs(spark, *texts).write.parquet(str(tmp_path / "d"))
    docs = spark.read.parquet(str(tmp_path / "d"))
    merges, wtab = bpe_train(docs, n_merges=4)
    con = duckdb.connect()
    con.execute(
        f"create view src as select * from '{tmp_path / 'd'}/*.parquet'"
    )
    cte = "docs as (select text from src)"
    om = con.execute(bpe_oracle_sql(cte, 4, "merges")).fetchall()
    assert sorted(map(tuple, merges_df(spark, merges).collect())) == sorted(om)
    ov = con.execute(bpe_oracle_sql(cte, 4, "vocab", top_k=40)).fetchall()
    assert sorted(map(tuple, bpe_vocab(wtab, 40).collect())) == sorted(ov)


def test_merge_plan_is_join_free(spark):
    # the collected winner folds back as a LITERAL: each round's word
    # table is a map over the previous one — no join, no second corpus
    # scan, lineage linear in rounds
    _, wtab = bpe_train(_docs(spark, "abab aabb"), n_merges=2)
    plan = wtab._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_encode_counts_and_fertility(spark):
    from tspider_spark.operators.bpe import bpe_encode

    docs = _docs(spark, "abab cd abab", "zz zz", "7 42 !")
    docs = docs.withColumn("doc_id", F.monotonically_increasing_id())
    _, wtab = bpe_train(docs, n_merges=2)  # learns ab, abab
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility"])
        for r in bpe_encode(docs, wtab).collect()
    }
    ids = sorted(out)
    # doc0: abab(1 tok) x2 + cd(2 toks) -> 3 words, 4 tokens
    assert out[ids[0]] == (3, 4, round(4 / 3, 6))
    # doc1: zz -> 2 symbols each (no merge learned for z z at rank<=2)
    assert out[ids[1]] == (2, 4, 2.0)
    # doc2: no [a-z]+ words at all -> no row
    assert len(out) == 2


def test_encode_oracle_parity(spark, tmp_path):
    from tspider_spark.operators.bpe import bpe_encode, bpe_encode_oracle_sql

    texts = ["banana bandana", "nan ban banana", "a aa aaa aaaa"]
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "d"))
    docs = spark.read.parquet(str(tmp_path / "d"))
    _, wtab = bpe_train(docs, n_merges=3)
    got = sorted(map(tuple, bpe_encode(docs, wtab).collect()))
    con = duckdb.connect()
    sql = bpe_encode_oracle_sql(
        f"docs as (select doc_id, text from '{tmp_path / 'd'}/*.parquet')", 3
    )
    assert got == sorted(con.execute(sql).fetchall())
