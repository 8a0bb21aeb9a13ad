"""Run the end-to-end curation plan over a parquet corpus.

The CLI face of plans/curate.py — what a production deployment would
submit via spark-submit --py-files: reads a text corpus
``(doc_id, text[, stratum])`` or an interleaved corpus
``(doc_id, spans)``, runs normalize -> rule gate -> (optional model
gate) -> exact + MinHash-LSH dedupe -> GPT-style packing, writes each
requested stage as its own parquet table (the stage dict IS the table
boundaries a 100 TB run materializes), and prints one JSON summary
line with per-stage row counts.

Usage:
  python tools/run_curate.py CORPUS_PARQUET OUT_DIR
      [--interleaved] [--weights PARQUET] [--stratum-col COL]
      [--stages packed,deduped,...] [--media-max-doc-freq N]
      [--boilerplate-group-col COL] [--min-words N]
      [--dedupe-tau F] [--seq-tokens N]
      [--split train=14,valid=1,test=1] [--split-group-col COL]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_STAGES = "rule_pass,deduped,packed"


def main(argv=None, spark=None, stop_session=True):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("corpus")
    ap.add_argument("out")
    ap.add_argument("--interleaved", action="store_true",
                    help="corpus is (doc_id, spans) — run the OBELICS "
                         "front-end (gate, seq dedupe, captions, "
                         "flatten) before the text pipeline")
    ap.add_argument("--weights", default=None,
                    help="parquet (bucket, weight) classifier table "
                         "enabling the model gate")
    ap.add_argument("--stratum-col", default=None)
    ap.add_argument("--stages", default=DEFAULT_STAGES,
                    help="comma list of stage keys to write "
                         f"(default {DEFAULT_STAGES}; 'all' writes "
                         "every stage the plan exposes)")
    ap.add_argument("--media-max-doc-freq", type=int, default=None)
    ap.add_argument("--boilerplate-group-col", default=None)
    ap.add_argument("--min-words", type=int, default=50)
    ap.add_argument("--dedupe-tau", type=float, default=0.9)
    ap.add_argument("--seq-tokens", type=int, default=2048)
    ap.add_argument("--split", default=None,
                    help="leakage-safe holdout weights, e.g. "
                         "'train=14,valid=1,test=1' (first name is "
                         "the packed training split)")
    ap.add_argument("--split-group-col", default=None,
                    help="group key for split assignment (site/"
                         "source); defaults to the doc id")
    args = ap.parse_args(argv)

    split_weights = None
    if args.split:
        split_weights = {}
        for part in args.split.split(","):
            name, _, w = part.partition("=")
            split_weights[name.strip()] = float(w)

    from tspider_spark.plans.curate import (
        curate_corpus,
        curate_interleaved_corpus,
    )
    from tspider_spark.session import get_spark

    spark = spark or get_spark("curate")
    docs = spark.read.parquet(args.corpus)
    weights = (
        spark.read.parquet(args.weights) if args.weights else None
    )
    common = dict(
        weights=weights,
        stratum_col=args.stratum_col,
        min_words=args.min_words,
        dedupe_tau=args.dedupe_tau,
        seq_tokens=args.seq_tokens,
        split_weights=split_weights,
        split_group_col=args.split_group_col,
    )
    if args.interleaved:
        stages = curate_interleaved_corpus(
            docs,
            media_max_doc_freq=args.media_max_doc_freq,
            boilerplate_group_col=args.boilerplate_group_col,
            **common,
        )
    else:
        stages = curate_corpus(docs, **common)

    wanted = (
        list(stages) if args.stages == "all"
        else [s.strip() for s in args.stages.split(",") if s.strip()]
    )
    unknown = [s for s in wanted if s not in stages]
    if unknown:
        raise SystemExit(
            f"unknown stage(s) {unknown}; available: {sorted(stages)}"
        )

    counts = {}
    for name in wanted:
        path = str(Path(args.out) / name)
        stages[name].write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()
    print("CURATE_RESULT " + json.dumps(
        {"corpus": args.corpus, "out": args.out, "stages": counts}
    ))
    if stop_session:
        spark.stop()
    return counts


if __name__ == "__main__":
    main()
