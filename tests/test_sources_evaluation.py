"""Source readers (S2-S4 shapes) + evaluation operator + ML ensemble."""

import json

import pytest
from pyspark.sql import functions as F

from poi_name_matching_spark.operators import evaluation
from poi_name_matching_spark.sources.readers import (
    read_csv_entities,
    read_json_entities,
    read_nested_json_entities,
)


def test_read_json_entities(spark, tmp_path):
    """S2: JSON-lines scan + drop + state filter (load_yelp.py:4-13)."""
    p = tmp_path / "biz.json"
    rows = [
        {"name": "A", "state": "MA", "stars": 4.0, "attributes": {"x": 1}},
        {"name": "B", "state": "NC", "stars": 3.0, "attributes": {"x": 2}},
        {"name": "C", "state": "MA", "stars": 5.0, "attributes": {"x": 3}},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_json_entities(
        spark, str(p), drop_columns=["attributes"], state_filter="MA"
    )
    got = sorted(r["name"] for r in df.collect())
    assert got == ["A", "C"]
    assert "attributes" not in df.columns


def test_read_csv_entities_point_split(spark, tmp_path):
    """S3 + K19: ';'-CSV with 'lat, lon' point column (load_gov_NC.py)."""
    p = tmp_path / "poi.csv"
    p.write_text("name;geo_point_2d\nLib A;35.78, -78.64\nLib B;35.90, -78.80\n")
    df = read_csv_entities(spark, str(p))
    rows = {r["name"]: (r["latitude"], r["longitude"]) for r in df.collect()}
    assert rows["Lib A"] == (35.78, -78.64)


def test_read_nested_json_entities(spark, tmp_path):
    """S4: nested fields.geom.coordinates, [lon, lat] reversed order
    (load_vancouver_data.py)."""
    p = tmp_path / "van.json"
    rows = [
        {"name": "Hall", "fields": {"geom": {"coordinates": [-123.1, 49.28]}}},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_nested_json_entities(spark, str(p))
    r = df.collect()[0]
    assert (r["latitude"], r["longitude"]) == (49.28, -123.1)


@pytest.fixture(scope="module")
def labeled_scores(spark):
    # (match, score) rows with known confusion at threshold 0.5:
    rows = [
        (1, 0.9),  # tp
        (1, 0.6),  # tp
        (1, 0.2),  # fn
        (0, 0.7),  # fp
        (0, 0.1),  # tn
        (0, 0.3),  # tn
        (2, 0.99),  # dropped
        (3, 0.99),  # dropped
    ]
    return spark.createDataFrame(rows, "match int, score double")


def test_evaluate_counts_and_metrics(spark, labeled_scores):
    m = evaluation.evaluate(labeled_scores, threshold=0.5)
    assert (m.tp, m.fp, m.fn, m.tn) == (2, 1, 1, 2)
    assert m.precision == pytest.approx(2 / 3)
    assert m.recall == pytest.approx(2 / 3)
    assert m.f1 == pytest.approx(2 / 3)
    # MCC by hand: (tp*tn - fp*fn)/sqrt((tp+fp)(tp+fn)(tn+fp)(tn+fn))
    import math

    assert m.mcc == pytest.approx((4 - 1) / math.sqrt(3 * 3 * 3 * 3))


def test_audit_scans(spark, labeled_scores):
    clean = evaluation.drop_unusable_labels(labeled_scores)
    fps = evaluation.false_positives(clean, 0.5).collect()
    fns = evaluation.false_negatives(clean, 0.5).collect()
    assert [r["score"] for r in fps] == [0.7]
    assert [r["score"] for r in fns] == [0.2]


def test_classify_does_not_mutate_score(spark, labeled_scores):
    out = evaluation.classify_scores(labeled_scores, 0.5)
    assert "score" in out.columns and "pred" in out.columns
    r = {round(x["score"], 2): x["pred"] for x in out.collect()}
    assert r[0.9] == 1 and r[0.1] == 0


def test_random_forest_ensemble(spark):
    """spark.ml RF on a separable synthetic feature matrix
    (ml_similarity_metrics.py:645-647 analog)."""
    import random

    from poi_name_matching_spark.operators.ml import train_random_forest

    rng = random.Random(0)
    rows = []
    for i in range(400):
        match = i % 2
        base = 0.8 if match else 0.2
        rows.append(
            (
                f"l{i}",
                f"r{i}",
                match,
                min(max(base + rng.gauss(0, 0.08), 0.0), 1.0),  # levenshtein
                min(max(base + rng.gauss(0, 0.08), 0.0), 1.0),  # jaro_winkler
                min(max(base + rng.gauss(0, 0.08), 0.0), 1.0),  # tfidf
            )
        )
    df = spark.createDataFrame(
        rows,
        "left_id string, right_id string, match int, "
        "levenshtein double, jaro_winkler double, tfidf double",
    )
    model, preds = train_random_forest(df, n_trees=20)
    agg = preds.agg(
        F.sum((F.col("pred") == F.col("match")).cast("int")).alias("ok"),
        F.count("*").alias("n"),
    ).first()
    assert agg["n"] > 0
    assert agg["ok"] / agg["n"] >= 0.95


def test_cross_validate_folds(spark):
    import random

    from poi_name_matching_spark.operators.ml import cross_validate

    rng = random.Random(1)
    rows = []
    for i in range(300):
        match = i % 2
        base = 0.85 if match else 0.15
        rows.append(
            (
                f"l{i}",
                f"r{i}",
                match,
                min(max(base + rng.gauss(0, 0.05), 0.0), 1.0),
                min(max(base + rng.gauss(0, 0.05), 0.0), 1.0),
            )
        )
    df = spark.createDataFrame(
        rows, "left_id string, right_id string, match int, "
        "levenshtein double, tfidf double"
    )
    folds = cross_validate(df, n_folds=3, n_trees=10)
    assert len(folds) == 3
    for f in folds:
        assert f["f1"] >= 0.9, f


def _separable_scores(spark, n=300, seed=2):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        match = i % 2
        base = 0.85 if match else 0.15
        rows.append(
            (
                f"l{i}", f"r{i}", match,
                min(max(base + rng.gauss(0, 0.05), 0.0), 1.0),
                min(max(base + rng.gauss(0, 0.05), 0.0), 1.0),
            )
        )
    return spark.createDataFrame(
        rows, "left_id string, right_id string, match int, "
        "levenshtein double, tfidf double"
    )


def test_ensemble_all_three_model_types(spark):
    """RF + GBT + MLP (the reference's RF/XGB/MLP trio,
    ml_similarity_metrics.py:645-647) all separate the synthetic matrix."""
    from poi_name_matching_spark.operators.ml import MODEL_KINDS, cross_validate

    df = _separable_scores(spark)
    for kind in MODEL_KINDS:
        kwargs = {"n_trees": 10} if kind == "rf" else (
            {"gbt_iters": 10} if kind == "gbt" else {}
        )
        folds = cross_validate(df, n_folds=2, kind=kind, **kwargs)
        assert len(folds) == 2
        for f in folds:
            assert f["model"] == kind
            assert f["f1"] >= 0.9, (kind, f)


def test_assemble_features_reference_matrix(spark):
    """tlen_l/tlen_r/tlen_ratio + emb_delta assemble into the trainable
    matrix (reference add_tokencount_to_df / add_we_to_df)."""
    from poi_name_matching_spark.functions.embedding import HashEmbedder
    from poi_name_matching_spark.operators.ml import assemble_features, train_model
    from poi_name_matching_spark.operators.scoring import attach_embeddings

    scores = _separable_scores(spark, n=200, seed=3)
    # signatures for both sides of every pair, token length correlated
    # with nothing (pure plumbing check)
    sig_rows = []
    for i in range(200):
        sig_rows.append((f"l{i}", ["alpha", "beta"] + ["x"] * (i % 3)))
        sig_rows.append((f"r{i}", ["alpha", "gamma"]))
    sigs = spark.createDataFrame(sig_rows, "conv_id string, tokens array<string>")
    sigs = attach_embeddings(sigs, HashEmbedder(dim=8, seed=1))
    out, feats = assemble_features(scores, sigs)
    assert {"tlen_l", "tlen_r", "tlen_ratio", "emb_delta"} <= set(feats)
    row = out.filter(F.col("left_id") == "l1").first()
    assert row["tlen_l"] == 3 and row["tlen_r"] == 2
    assert row["tlen_ratio"] == 1.5
    assert len(row["emb_delta"]) == 8
    # end-to-end: the extended matrix trains
    model, preds = train_model(out, kind="rf", feature_cols=feats, n_trees=5)
    assert preds.count() > 0


def test_read_osm_named_nodes(spark, tmp_path):
    """S1 literal: .osm XML scan keeps only name-tagged NODES with
    lat/lon + full tag list (reference load_osm.py tag_inventory2)."""
    osm = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6" generator="test">
 <bounds minlat="42.0" minlon="-71.5" maxlat="42.5" maxlon="-71.0"/>
 <node id="1001" lat="42.3601" lon="-71.0589" version="2" timestamp="2021-01-01T00:00:00Z">
  <tag k="name" v="Joe&amp;s Pizza"/>
  <tag k="amenity" v="restaurant"/>
 </node>
 <node id="1002" lat="42.3610" lon="-71.0600"/>
 <node id="1003" lat="42.3620" lon="-71.0610" version="1">
  <tag k="highway" v="crossing"/>
 </node>
 <node id="1004" lat="-42.99" lon="-71.07">
  <tag k="name" v="Cedar Fork School"/>
 </node>
 <way id="2001">
  <nd ref="1001"/>
  <tag k="name" v="WAY NAME MUST BE IGNORED"/>
 </way>
</osm>
"""
    p = tmp_path / "sample.osm"
    p.write_text(osm)
    from poi_name_matching_spark.sources.readers import read_osm_named_nodes

    rows = {r["name"]: r for r in read_osm_named_nodes(spark, str(p)).collect()}
    assert set(rows) == {"Joe&s Pizza", "Cedar Fork School"}
    joe = rows["Joe&s Pizza"]
    assert joe["type"] == "node"
    assert joe["latitude"] == pytest.approx(42.3601)
    assert joe["longitude"] == pytest.approx(-71.0589)
    assert joe["len_tags"] == 2
    assert ("amenity", "restaurant") in [(t["k"], t["v"]) for t in joe["tags"]]
    cedar = rows["Cedar Fork School"]
    assert cedar["latitude"] == pytest.approx(-42.99)
    assert cedar["len_tags"] == 1
