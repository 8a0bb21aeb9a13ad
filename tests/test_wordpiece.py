"""WordPiece MaxMatch encode vs a pure-Python replica."""

import re
from collections import Counter


def _replica(texts, min_df=3, max_word=16, max_piece=6):
    words = Counter()
    for t in texts:
        words.update(re.findall("[a-z]+", t.lower()))
    enc = [w for w in words if len(w) <= max_word]
    start_df, cont_df = Counter(), Counter()
    for w in enc:
        for l in range(1, min(max_piece, len(w)) + 1):
            start_df[w[:l]] += 1
        seen = set()
        for p in range(1, len(w)):
            for l in range(1, min(max_piece, len(w) - p) + 1):
                seen.add(w[p : p + l])
        cont_df.update(seen)
    vocab_s = {p for p, d in start_df.items() if d >= min_df or len(p) == 1}
    vocab_c = {p for p, d in cont_df.items() if d >= min_df or len(p) == 1}

    out = {}
    for w, cnt in words.items():
        if len(w) > max_word:
            out[w] = (cnt, 1, "[UNK]")
            continue
        pos, pieces = 0, []
        while pos < len(w):
            voc = vocab_s if pos == 0 else vocab_c
            for l in range(min(max_piece, len(w) - pos), 0, -1):
                if w[pos : pos + l] in voc:
                    pieces.append(
                        w[pos : pos + l] if pos == 0 else "##" + w[pos : pos + l]
                    )
                    pos += l
                    break
        out[w] = (cnt, len(pieces), " ".join(pieces))
    return out


def test_wordpiece_matches_replica(spark):
    from tspider_spark.operators.wordpiece import wordpiece_top_words

    texts = [
        "the cat catalog catapult cater caters",
        "the theory theorem there then than that",
        "unbelievable unbelievably believable believer believes",
        "supercalifragilisticexpialidocious is long",   # > 16 chars -> UNK
        "cat cat cat dog dogs dogged doggedly",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {
        r["word"]: (r["n_occ"], r["n_pieces"], r["pieces"])
        for r in wordpiece_top_words(df, min_df=3, top_k=1000).collect()
    }
    exp = _replica(texts)
    assert got == exp
    assert got["supercalifragilisticexpialidocious"][2] == "[UNK]"
    # continuation pieces carry the ## marker
    multi = [v[2] for v in got.values() if v[1] > 1 and v[2] != "[UNK]"]
    assert multi and all(
        all(p.startswith("##") for p in m.split(" ")[1:]) for m in multi
    )
