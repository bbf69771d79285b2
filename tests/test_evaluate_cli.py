"""Evaluation CLI: sweep → metrics.json + SVG figures + FP/FN audit in
one command (the reference's baseline.py post-scoring loop)."""

import json
import xml.etree.ElementTree as ET

from poi_name_matching_spark.evaluate_cli import main


def test_evaluate_cli_end_to_end(spark, tmp_path, capsys):
    scored = spark.createDataFrame(
        [
            ("a", "b", 0.9, 1),
            ("a", "c", 0.8, 1),
            ("b", "c", 0.45, 0),
            ("d", "e", 0.42, 1),
            ("d", "f", 0.1, 0),
            ("e", "f", 0.05, 0),
            ("x", "y", 0.5, 2),  # unusable label — must be dropped
        ],
        "left_id string, right_id string, score double, match int",
    )
    scores_path = str(tmp_path / "scores")
    scored.write.parquet(scores_path)
    out = tmp_path / "eval"
    rc = main([
        "--scores", scores_path,
        "--out", str(out),
        "--thresholds", "0.3,0.425,0.6",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    metrics = json.loads((out / "metrics.json").read_text())
    assert [m["threshold"] for m in metrics] == [0.3, 0.425, 0.6]
    by_t = {m["threshold"]: m for m in metrics}
    # at 0.3: tp=3 fp=1 fn=0 tn=2 (label-2 row excluded everywhere)
    assert (by_t[0.3]["tp"], by_t[0.3]["fp"]) == (3, 1)
    # best F1 (0.857) is at 0.3 → picked as the operating threshold
    assert summary["operating_threshold"] == 0.3

    for name in ("sweep_f1.svg", "sweep_precision.svg", "sweep_recall.svg",
                 "confusion_matrix.svg"):
        root = ET.parse(out / name).getroot()
        assert root.tag.endswith("svg")

    # confusion matrix at 0.3: tn=2 fp=1 fn=0 tp=3 rendered as cells
    texts = [
        t.text
        for t in ET.parse(out / "confusion_matrix.svg").getroot().iter(
            "{http://www.w3.org/2000/svg}text"
        )
    ]
    for c in ("2", "1", "0", "3"):
        assert c in texts

    # FP/FN audit: exactly the one borderline non-match above threshold
    import glob

    rows = []
    for f in glob.glob(str(out / "fp_fn_audit" / "*.csv")):
        with open(f) as fh:
            header = fh.readline().strip().split(",")
            for line in fh:
                rows.append(dict(zip(header, line.strip().split(","))))
    kinds = sorted((r["kind"], r["left_id"]) for r in rows)
    assert kinds == [("fp", "b")]
