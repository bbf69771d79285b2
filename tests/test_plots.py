"""S8 plot sink: the SVG figures mirror the reference's matplotlib
evaluation plots (``load_data/evaluation_metrics.py:81-216``) —
confusion-matrix display and grouped metric bars — structurally
verified by parsing the XML back."""

import xml.etree.ElementTree as ET

import pytest
from pyspark.sql import functions as F

from poi_name_matching_spark.operators.evaluation import (
    confusion_counts,
    threshold_sweep,
)
from poi_name_matching_spark.sources.plots import (
    confusion_matrix_svg,
    metric_bars_svg,
)

NS = {"svg": "http://www.w3.org/2000/svg"}


def _parse(svg: str) -> ET.Element:
    return ET.fromstring(svg)


def _texts(root: ET.Element) -> list[str]:
    return [t.text for t in root.iter("{http://www.w3.org/2000/svg}text")]


class TestConfusionMatrixSVG:
    def test_cells_and_labels_from_spark_counts(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, 1), (1, 1), (1, 0), (0, 1), (0, 0), (0, 0), (0, 0)],
            "match int, pred int",
        )
        path = str(tmp_path / "cm.svg")
        svg = confusion_matrix_svg(confusion_counts(df), path)
        root = _parse(svg)
        texts = _texts(root)
        # tp=2 fp=1 fn=1 tn=3, sklearn layout [[tn, fp], [fn, tp]]
        for count in ("3", "1", "1", "2"):
            assert count in texts
        assert "Predicted label" in texts and "True label" in texts
        # four shaded cells + written file parses identically
        rects = root.findall(".//svg:rect", NS)
        assert len(rects) == 4
        with open(path, encoding="utf-8") as f:
            assert f.read() == svg

    def test_shading_tracks_counts(self):
        svg = confusion_matrix_svg({"tp": 10, "fp": 0, "fn": 0, "tn": 5})
        root = _parse(svg)
        fills = [r.get("fill") for r in root.findall(".//svg:rect", NS)]
        # max count (tp=10) gets the darkest fill, zero the lightest
        def lum(f):
            return int(f[4:].split(",")[0])
        tn_f, fp_f, fn_f, tp_f = fills
        assert lum(tp_f) < lum(tn_f) < lum(fp_f) == lum(fn_f)

    def test_deterministic_bytes(self):
        counts = {"tp": 4, "fp": 2, "fn": 1, "tn": 8}
        assert confusion_matrix_svg(counts) == confusion_matrix_svg(counts)


class TestMetricBarsSVG:
    @pytest.fixture(scope="class")
    def sweep(self, spark):
        """Two 'similarity functions' swept over two thresholds — the
        reference's sim_funcs figure input shape."""
        scored = spark.createDataFrame(
            [(1, 0.9), (1, 0.6), (0, 0.55), (0, 0.2)], "match int, score double"
        )
        out = []
        for fn in ("jaro_winkler", "tfidf"):
            out.append(
                threshold_sweep(scored, [0.5, 0.7]).withColumn(
                    "sim_func", F.lit(fn)
                )
            )
        return out[0].unionByName(out[1])

    def test_bar_heights_proportional_to_metric(self, sweep, tmp_path):
        rows = {
            (r["sim_func"], r["threshold"]): r["precision"]
            for r in sweep.collect()
        }
        path = str(tmp_path / "bars.svg")
        svg = metric_bars_svg(sweep, "precision", path)
        root = _parse(svg)
        # bars carry fill-opacity 0.7 (legend swatches too) — separate them
        rects = [
            r for r in root.findall(".//svg:rect", NS)
            if r.get("fill-opacity") == "0.7"
        ]
        bars = [r for r in rects if float(r.get("width")) > 20]
        assert len(bars) == 4  # 2 funcs × 2 thresholds
        heights = sorted(float(r.get("height")) for r in bars)
        expect = sorted(v * 320 for v in rows.values())
        for got, want in zip(heights, expect):
            assert got == pytest.approx(want, abs=0.02)

    def test_reference_figure_furniture(self, sweep):
        svg = metric_bars_svg(sweep, "f1")
        texts = _texts(_parse(svg))
        # fixed 0.0-1.0 ticks (evaluation_metrics.py:145-147)
        for tick in [f"{k/10:.1f}" for k in range(11)]:
            assert tick in texts
        assert "Threshold" in texts          # legend title
        assert "F1" in texts                 # metric axis label, to_string()
        assert "jaro_winkler" in texts and "tfidf" in texts
        # value labels above bars, rounded to 3 decimals
        assert any(t and t.startswith("0.") and len(t) <= 5 for t in texts)

    def test_empty_sweep_raises(self):
        with pytest.raises(ValueError):
            metric_bars_svg([], "f1")
