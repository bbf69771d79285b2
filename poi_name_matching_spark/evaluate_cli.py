"""Evaluation CLI — the reference's post-scoring loop as one command.

``baseline.py:31-89`` ends every run by thresholding scores, printing
P/R/F1/MCC per threshold (``evaluation_metrics.py:36-63``), displaying
the confusion matrix, saving figure PNGs, and exporting FP/FN audit
sheets. This module packages the distributed equivalents behind
``python -m poi_name_matching_spark.evaluate_cli``:

* one-pass :func:`threshold_sweep` over the labeled scores (labels
  2/3 dropped per ``baseline.py:124-125``) → ``metrics.json``;
* confusion-matrix SVG at the chosen operating threshold (S8);
* metric-bar SVG per threshold (S8; group = the score kernel name);
* FP/FN audit CSV at the operating threshold (S7).

Inputs are parquet (a scores table that already carries the label
column, or a separate labels table joined on the pair key); every
output is derived from driver-bounded aggregates except the audit CSV,
which is written distributed."""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main(argv: list[str] | None = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m poi_name_matching_spark.evaluate_cli"
    )
    p.add_argument("--scores", required=True,
                   help="parquet of scored pairs (left_id, right_id, "
                        "<score-col>[, <label-col>])")
    p.add_argument("--labels", default=None,
                   help="optional parquet with (left_id, right_id, "
                        "<label-col>) when labels are separate")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--score-col", default="score")
    p.add_argument("--label-col", default="match")
    p.add_argument("--kernel-name", default="score",
                   help="legend/group name for the figures")
    p.add_argument("--thresholds", default="0.3,0.35,0.4,0.425,0.45,0.5",
                   help="comma-separated sweep thresholds")
    p.add_argument("--threshold", type=float, default=None,
                   help="operating threshold for the confusion matrix "
                        "and FP/FN audit (default: best-F1 from the sweep)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = SparkSession.builder.appName("poi-name-matching-evaluate")
    if args.master:
        builder = builder.master(args.master)
    spark = builder.getOrCreate()

    from poi_name_matching_spark.operators.evaluation import (
        classify_scores,
        confusion_counts,
        drop_unusable_labels,
        false_negatives,
        false_positives,
        threshold_sweep,
    )
    from poi_name_matching_spark.sources.plots import (
        confusion_matrix_svg,
        metric_bars_svg,
    )

    scored = spark.read.parquet(args.scores)
    if args.labels:
        labels = spark.read.parquet(args.labels).select(
            "left_id", "right_id", args.label_col
        )
        if args.label_col in scored.columns:
            # the external labels win; keeping both columns would make
            # every later F.col(label_col) ambiguous
            scored = scored.drop(args.label_col)
        scored = scored.join(labels, ["left_id", "right_id"])
    scored = drop_unusable_labels(scored, args.label_col)

    thresholds = [float(t) for t in args.thresholds.split(",") if t]
    sweep = threshold_sweep(
        scored, thresholds, label_col=args.label_col, score_col=args.score_col
    ).cache()
    rows = [r.asDict() for r in sweep.orderBy("threshold").collect()]
    if not rows or all(r["tp"] + r["fp"] + r["fn"] + r["tn"] == 0 for r in rows):
        p.error(
            "no usable labeled pairs after dropping labels 2/3 — check "
            "--label-col and (with --labels) that the pair keys join"
        )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "metrics.json").write_text(json.dumps(rows, indent=1))

    for metric in ("f1", "precision", "recall"):
        metric_bars_svg(
            [{**r, "sim_func": args.kernel_name} for r in rows],
            metric,
            str(out / f"sweep_{metric}.svg"),
        )

    operating = (
        args.threshold
        if args.threshold is not None
        else max(rows, key=lambda r: (r["f1"], -r["threshold"]))["threshold"]
    )
    pred = classify_scores(
        scored, operating, score_col=args.score_col
    )
    confusion_matrix_svg(
        confusion_counts(pred, label_col=args.label_col),
        str(out / "confusion_matrix.svg"),
    )
    # S7 audit export (reference writes FP/FN sheets for hand review)
    fp = false_positives(
        scored, operating, label_col=args.label_col, score_col=args.score_col
    )
    fn = false_negatives(
        scored, operating, label_col=args.label_col, score_col=args.score_col
    )
    fp.withColumn("kind", F.lit("fp")).unionByName(
        fn.withColumn("kind", F.lit("fn"))
    ).coalesce(1).write.mode("overwrite").option("header", True).csv(
        str(out / "fp_fn_audit")
    )
    summary = {
        "operating_threshold": operating,
        "sweep": {str(r["threshold"]): round(r["f1"], 5) for r in rows},
        "outputs": sorted(p.name for p in out.iterdir()),
    }
    print(json.dumps(summary))
    sweep.unpersist()
    return 0


if __name__ == "__main__":
    sys.exit(main())
