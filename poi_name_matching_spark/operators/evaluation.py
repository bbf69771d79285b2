"""Evaluation: threshold classification + P/R/F1/MCC from confusion counts.

Reference: ``load_data/evaluation_metrics.py``.

* ``classify_scores`` (:11-34): ``pred = 1 if score >= threshold else 0``
  — the reference mutates the score column in place (an anti-pattern,
  SURVEY.md §4.2); we emit a separate ``pred`` column.
* ``get_metrics`` (:36-63): sklearn precision/recall/F1/MCC. We compute
  the identical formulas from one distributed confusion aggregate
  (``groupBy().agg(sum(when(...)))`` — partial+final hash agg) so no
  label vector is ever collected.
* Label domain (``load_data/edit_label.py:42``): 0 no-match, 1 match,
  2 unclear, 3 not-a-POI; every evaluation first drops 2 and 3
  (``load_data/baseline.py:124-125``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_unusable_labels(df: DataFrame, label_col: str = "match") -> DataFrame:
    """Drop labels 3 then 2 (``baseline.py:124-125``; ``drop_label.py:24-41``)."""
    return df.filter(~F.col(label_col).isin(2, 3))


def classify_scores(
    df: DataFrame, threshold: float, score_col: str = "score", pred_col: str = "pred"
) -> DataFrame:
    return df.withColumn(
        pred_col, (F.col(score_col) >= F.lit(float(threshold))).cast("int")
    )


def confusion_counts(
    df: DataFrame, label_col: str = "match", pred_col: str = "pred"
) -> DataFrame:
    """One-row DataFrame (tp, fp, fn, tn) — single partial+final agg."""
    y, p = F.col(label_col), F.col(pred_col)
    one = F.lit(1)
    return df.agg(
        F.coalesce(F.sum(F.when((y == 1) & (p == 1), one)), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(F.when((y == 0) & (p == 1), one)), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(F.when((y == 1) & (p == 0), one)), F.lit(0)).alias("fn"),
        F.coalesce(F.sum(F.when((y == 0) & (p == 0), one)), F.lit(0)).alias("tn"),
    )


@dataclass(frozen=True)
class Metrics:
    tp: int
    fp: int
    fn: int
    tn: int
    precision: float
    recall: float
    f1: float
    mcc: float

    def as_dict(self) -> dict:
        return dict(self.__dict__)


def metrics_from_counts(tp: int, fp: int, fn: int, tn: int) -> Metrics:
    """sklearn-identical formulas (zero_division → 0.0)."""
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    recall = tp / (tp + fn) if (tp + fn) else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    denom = math.sqrt(
        float(tp + fp) * float(tp + fn) * float(tn + fp) * float(tn + fn)
    )
    mcc = ((tp * tn) - (fp * fn)) / denom if denom else 0.0
    return Metrics(tp, fp, fn, tn, precision, recall, f1, mcc)


def evaluate(
    df: DataFrame,
    threshold: float,
    label_col: str = "match",
    score_col: str = "score",
) -> Metrics:
    """End-to-end: drop labels 2/3, threshold, aggregate, score."""
    clean = drop_unusable_labels(df, label_col)
    preds = classify_scores(clean, threshold, score_col=score_col)
    row = confusion_counts(preds, label_col=label_col).first()
    return metrics_from_counts(row["tp"], row["fp"], row["fn"], row["tn"])


def false_positives(
    df: DataFrame, threshold: float, label_col: str = "match", score_col: str = "score"
) -> DataFrame:
    """FP audit scan (``baseline.py:66-74``)."""
    return df.filter(
        (F.col(label_col) == 0) & (F.col(score_col) >= F.lit(float(threshold)))
    )


def false_negatives(
    df: DataFrame, threshold: float, label_col: str = "match", score_col: str = "score"
) -> DataFrame:
    """FN audit scan (``baseline.py:75-82``)."""
    return df.filter(
        (F.col(label_col) == 1) & (F.col(score_col) < F.lit(float(threshold)))
    )


def threshold_sweep(
    df: DataFrame,
    thresholds: list[float],
    label_col: str = "match",
    score_col: str = "score",
) -> DataFrame:
    """A8 distributed: P/R/F1 per threshold in ONE pass — the reference's
    threshold loop (``baseline.py:31-89`` re-scores per threshold; here
    scores are computed once and the sweep is a broadcast join + single
    grouped aggregate). Returns (threshold, tp, fp, fn, tn, precision,
    recall, f1, mcc) — the full ``get_metrics`` column set
    (``evaluation_metrics.py:36-63`` reports MCC alongside P/R/F1)."""
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(float(t),) for t in thresholds], "threshold double"
    )
    y = F.col(label_col)
    p = (F.col(score_col) >= F.col("threshold")).cast("int")
    joined = drop_unusable_labels(df, label_col).crossJoin(F.broadcast(thr))
    counts = joined.groupBy("threshold").agg(
        F.coalesce(F.sum(F.when((y == 1) & (p == 1), 1)), F.lit(0)).alias("tp"),
        F.coalesce(F.sum(F.when((y == 0) & (p == 1), 1)), F.lit(0)).alias("fp"),
        F.coalesce(F.sum(F.when((y == 1) & (p == 0), 1)), F.lit(0)).alias("fn"),
        F.coalesce(F.sum(F.when((y == 0) & (p == 0), 1)), F.lit(0)).alias("tn"),
    )
    precision = F.when(
        F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))
    ).otherwise(F.lit(0.0))
    recall = F.when(
        F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))
    ).otherwise(F.lit(0.0))
    mcc_denom = F.sqrt(
        (F.col("tp") + F.col("fp")).cast("double")
        * (F.col("tp") + F.col("fn"))
        * (F.col("tn") + F.col("fp"))
        * (F.col("tn") + F.col("fn"))
    )
    return (
        counts.withColumn("precision", precision)
        .withColumn("recall", recall)
        .withColumn(
            "f1",
            F.when(
                F.col("precision") + F.col("recall") > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "mcc",
            # double products: tp*tn in long overflows past ~3e9 counts
            # (ANSI mode would fail the job at web scale)
            F.when(
                mcc_denom > 0,
                (
                    F.col("tp").cast("double") * F.col("tn")
                    - F.col("fp").cast("double") * F.col("fn")
                )
                / mcc_denom,
            ).otherwise(F.lit(0.0)),
        )
    )


def pairwise_cluster_f1(pred_components: DataFrame, truth: DataFrame) -> Metrics:
    """Pairwise F1 of predicted components vs planted truth clusters.

    Counts same-cluster pairs via the sum-of-C(n,2) identity per label —
    three tiny aggregates, no pair materialization:
      tp = Σ C(n_ij,2) over the (pred, truth) contingency cells,
      pred_pairs = Σ C(n_i·,2), truth_pairs = Σ C(n_·j,2).
    """
    joined = pred_components.join(truth, "conv_id")

    def _pairs(df: DataFrame, cols: list[str]) -> int:
        cnt = df.groupBy(*cols).agg(F.count("*").alias("n"))
        row = cnt.agg(
            F.coalesce(
                F.sum(F.col("n") * (F.col("n") - 1) / 2), F.lit(0.0)
            ).alias("p")
        ).first()
        return int(row["p"])

    tp = _pairs(joined, ["component_id", "entity_id"])
    pred_pairs = _pairs(joined, ["component_id"])
    truth_pairs = _pairs(joined, ["entity_id"])
    fp = pred_pairs - tp
    fn = truth_pairs - tp
    return metrics_from_counts(tp, fp, fn, 0)
