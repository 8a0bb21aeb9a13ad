"""Suffix-array prefix doubling vs a brute-force Python sort."""

from pyspark.sql import functions as F


def _brute(docs, max_doc_chars=120, prefix_len=64):
    import re

    parts = []
    spans = []  # (doc_id, off, gpos)
    g = 0
    for doc_id, text in sorted(docs):
        s = re.sub("[^A-Za-z0-9 ]+", "", text).lower()[:max_doc_chars] + "\x01"
        parts.append(s)
        for off in range(len(s)):
            spans.append((doc_id, off, g + off))
        g += len(s)
    big = "".join(parts)
    order = sorted(
        range(len(big)), key=lambda i: (big[i : i + prefix_len], i)
    )
    return big, {gp: (doc_id, off) for doc_id, off, gp in spans}, order


def test_suffix_array_matches_brute(spark):
    from tspider_spark.operators.suffixarray import suffix_array

    docs = [
        (1, "banana band BANANA!"),
        (2, "an apple and a banana"),
        (7, "aa" * 90),            # long repeat, exercises deep doubling
        (9, "zebra?  zebra."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["sa_rank"]: (r["gpos"], r["doc_id"], r["off"])
        for r in suffix_array(df, prefix_len=64, top_k=10_000).collect()
    }
    big, span_of, order = _brute(docs)
    assert len(got) == len(big)
    for rank0, gp in enumerate(order):
        doc_id, off = span_of[gp]
        assert got[rank0 + 1] == (gp, doc_id, off), (
            f"rank {rank0 + 1}: expected gpos {gp} "
            f"({big[gp:gp + 12]!r}...), got {got[rank0 + 1]}"
        )


def test_suffix_array_prefix_bound_ties_break_by_position(spark):
    # two docs identical for >8 chars: with prefix_len=8 their
    # suffixes tie on content and must order by global position
    from tspider_spark.operators.suffixarray import suffix_array

    df = spark.createDataFrame(
        [(1, "samesame tail-a"), (2, "samesame tail-b")],
        "doc_id long, text string",
    )
    rows = suffix_array(df, prefix_len=8, top_k=10_000).collect()
    big, span_of, order = _brute(
        [(1, "samesame tail-a"), (2, "samesame tail-b")], prefix_len=8
    )
    got_order = [
        r["gpos"] for r in sorted(rows, key=lambda r: r["sa_rank"])
    ]
    assert got_order == order


def test_longest_repeats_finds_planted_repeat(spark):
    from tspider_spark.operators.suffixarray import longest_repeats

    phrase = "the quick brown fox jumps over it"   # 33 chars, planted twice
    docs = [
        (1, f"AAA {phrase} BBB"),
        (2, f"CCC {phrase} DDD"),
        (3, "unrelated filler text with no long repeats at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = longest_repeats(df, min_len=8, top_k=50).collect()
    assert rows, "planted repeat not found"
    top = max(rows, key=lambda r: r["lcp"])
    # the maximal repeat is the shared phrase plus the shared spaces
    # around it ('AAA_..._BBB' vs 'CCC_..._DDD' share '_<phrase>_');
    # cleaned text is lowercase, offsets index into it
    assert {top["doc_a"], top["doc_b"]} == {1, 2}
    assert top["lcp"] >= len(phrase)
    off = top["off_a"] if top["doc_a"] == 1 else top["off_b"]
    got_a = docs[0][1].lower()[off : off + top["lcp"]]
    assert phrase in got_a


def test_longest_repeats_never_crosses_doc_sentinels(spark):
    from tspider_spark.operators.suffixarray import longest_repeats

    # identical docs: the whole text repeats, but the sentinel caps
    # the LCP at the doc length (a cross-boundary "repeat" would be
    # an artifact of concatenation)
    t = "abcdefgh ijklmnop"
    df = spark.createDataFrame(
        [(1, t), (2, t)], "doc_id long, text string"
    )
    rows = longest_repeats(df, min_len=8, top_k=10).collect()
    assert rows and max(r["lcp"] for r in rows) == len(t)


def test_longest_repeats_caps_at_prefix_len(spark):
    from tspider_spark.operators.suffixarray import longest_repeats

    # a repeat LONGER than the bounded context must report exactly
    # prefix_len, never more (regression: the binary-lifting descent
    # kept adding past a full-rank match — pairs that start at
    # prefix_len still rank-match at deeper probes when the repeat
    # extends, reaching up to 2*prefix_len-1 before the cap)
    phrase = "zq ".join(str(i) for i in range(12))  # ~40 chars, no ties
    docs = [(1, f"AA {phrase} BB"), (2, f"CC {phrase} DD")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = longest_repeats(df, prefix_len=16, min_len=8, top_k=50).collect()
    assert rows
    assert max(r["lcp"] for r in rows) == 16
