"""ML ensemble over the similarity feature matrix (SURVEY.md §2.9).

Reference: ``load_data/ml_similarity_metrics.py:567-647`` trains
RandomForest(n_estimators=300, criterion=entropy, seed=0), XGB, and an
MLP on the per-pair kernel features with 5-fold CV. Here: the spark.ml
equivalent on our ``scores`` stage output — RandomForestClassifier with
the same forest size/seed, features assembled from the kernel columns,
stratified-ish train/test split by deterministic hash (reproducible on
any partitioning, unlike randomSplit).

The threshold classifier remains the primary operating point; this is
the optional ensemble path, trained distributed (no sklearn)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_FEATURES = [
    "levenshtein",
    "jaro",
    "jaro_winkler",
    "jaccard",
    "cosine",
    "tfidf",
    "softtfidf",
    "emb_cosine",
]


def hash_split(df: DataFrame, key_cols: list[str], test_fraction: float = 0.2):
    """Deterministic train/test split: pmod(xxhash64(keys), 100) —
    stable across runs and partitionings (reference uses
    train_test_split(seed=0), ml_similarity_metrics.py:644)."""
    bucket = F.pmod(F.xxhash64(*key_cols), F.lit(100))
    test = df.filter(bucket < int(test_fraction * 100))
    train = df.filter(bucket >= int(test_fraction * 100))
    return train, test


def train_random_forest(
    labeled_scores: DataFrame,
    feature_cols: list[str] | None = None,
    label_col: str = "match",
    n_trees: int = 300,
    seed: int = 0,
):
    """Returns (model, test_predictions DataFrame). ``labeled_scores``
    is the scores stage output joined with labels (labels 2/3 already
    dropped per baseline.py:124-125)."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    feature_cols = feature_cols or [
        c for c in DEFAULT_FEATURES if c in labeled_scores.columns
    ]
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="features", handleInvalid="keep"
    )
    train, test = hash_split(labeled_scores, ["left_id", "right_id"])
    rf = RandomForestClassifier(
        numTrees=n_trees,
        impurity="entropy",
        labelCol=label_col,
        featuresCol="features",
        seed=seed,
    )
    model = rf.fit(assembler.transform(train))
    preds = model.transform(assembler.transform(test)).select(
        "left_id",
        "right_id",
        label_col,
        F.col("prediction").cast("int").alias("pred"),
    )
    return model, preds


def cross_validate(
    labeled_scores: DataFrame,
    feature_cols: list[str] | None = None,
    label_col: str = "match",
    n_folds: int = 5,
    n_trees: int = 300,
    seed: int = 0,
) -> list[dict]:
    """k-fold CV (reference ``validateModel``, ml_similarity_metrics.py:
    76-154): deterministic hash folds, per-fold P/R/F1/MCC from the
    distributed confusion aggregate. Returns one metrics dict per fold."""
    from pyspark.ml.classification import RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    from .evaluation import confusion_counts, metrics_from_counts

    feature_cols = feature_cols or [
        c for c in DEFAULT_FEATURES if c in labeled_scores.columns
    ]
    assembler = VectorAssembler(
        inputCols=feature_cols, outputCol="features", handleInvalid="keep"
    )
    fold = F.pmod(F.xxhash64("left_id", "right_id"), F.lit(n_folds))
    data = assembler.transform(labeled_scores.withColumn("_fold", fold)).cache()
    out = []
    for k in range(n_folds):
        train = data.filter(F.col("_fold") != k)
        test = data.filter(F.col("_fold") == k)
        rf = RandomForestClassifier(
            numTrees=n_trees,
            impurity="entropy",
            labelCol=label_col,
            featuresCol="features",
            seed=seed,
        )
        model = rf.fit(train)
        preds = model.transform(test).withColumn(
            "pred", F.col("prediction").cast("int")
        )
        row = confusion_counts(preds, label_col=label_col).first()
        out.append(
            {"fold": k, **metrics_from_counts(
                row["tp"], row["fp"], row["fn"], row["tn"]
            ).as_dict()}
        )
    data.unpersist()
    return out
