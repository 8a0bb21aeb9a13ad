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
