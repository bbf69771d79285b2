"""S8 — plot sink, dependency-free.

The reference renders evaluation figures with matplotlib and saves
PNGs: a confusion-matrix display (``load_data/evaluation_metrics.py:81-98``,
``display_confusion_matrix`` → ``confusion_metrics_<ts>.png``) and
grouped bar charts of one metric per similarity-function × threshold
(``evaluation_metrics.py:99-216``, ``plot_evaluation_graph_sim_funcs`` /
``_cosine_word_embeddings`` → ``sim_funcs_<metric>_<ts>.png``).

matplotlib is not a dependency of this engine, so the sink emits SVG —
plain XML text, deterministic byte-for-byte for a given input (no
timestamps, fixed float formatting), viewable in any browser and easy
to assert on in tests. The Spark-side contract is the same as every
other sink here: the figure data arrives as a (tiny, already
aggregated) DataFrame — confusion counts are ONE row, a threshold
sweep is thresholds × functions rows — so the driver-side collect is
bounded by construction no matter the corpus size.

Parity with the reference figure semantics:

* confusion matrix: 2×2 grid with display labels ``[0, 1]``, one count
  per cell, cells shaded by count / max-count (what
  ``ConfusionMatrixDisplay`` does), axes "Predicted label" / "True
  label".
* metric bars: x groups = similarity functions (or embedding names),
  one bar per threshold within a group, a numeric value label above
  each bar rounded to 3 decimals, y ticks fixed at 0.0–1.0 step 0.1,
  horizontal y grid, legend titled "Threshold"
  (``evaluation_metrics.py:130-152``).
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

# own color cycle (reference cycles 10 RGBA bar colors, get_colors();
# the *cycle* is the parity contract, not the pixels)
_COLORS = [
    "#c23b3b", "#78ab45", "#edc900", "#7094db", "#ed7521",
    "#5e2e78", "#36dbc9", "#541a8c", "#999999", "#2e2e2e",
]


def _fmt(x: float) -> str:
    """Fixed, locale-free coordinate formatting → deterministic bytes."""
    return f"{x:.2f}".rstrip("0").rstrip(".")


def _svg(width: int, height: int, body: list[str]) -> str:
    head = (
        '<svg xmlns="http://www.w3.org/2000/svg" '
        f'width="{width}" height="{height}" '
        f'viewBox="0 0 {width} {height}" font-family="sans-serif">'
    )
    return "\n".join([head, *body, "</svg>"]) + "\n"


def _text(x: float, y: float, s: str, size: int = 12, anchor: str = "middle",
          extra: str = "") -> str:
    return (
        f'<text x="{_fmt(x)}" y="{_fmt(y)}" font-size="{size}" '
        f'text-anchor="{anchor}"{extra}>{escape(str(s))}</text>'
    )


def _rect(x: float, y: float, w: float, h: float, fill: str,
          extra: str = "") -> str:
    return (
        f'<rect x="{_fmt(x)}" y="{_fmt(y)}" width="{_fmt(w)}" '
        f'height="{_fmt(h)}" fill="{fill}"{extra}/>'
    )


def confusion_matrix_svg(
    counts: DataFrame | Mapping[str, int],
    path: str | None = None,
    labels: Sequence[object] = (0, 1),
) -> str:
    """Render the 2×2 confusion matrix the reference displays
    (``evaluation_metrics.py:81-98``) as an SVG string; optionally write
    it to ``path``.

    ``counts`` is the one-row (tp, fp, fn, tn) DataFrame from
    :func:`~poi_name_matching_spark.operators.evaluation.confusion_counts`
    (a single bounded collect — the sink's input is already an
    aggregate), or an equivalent mapping. Cell layout follows
    sklearn's ``confusion_matrix`` row=true/col=pred convention the
    reference feeds to ``ConfusionMatrixDisplay``:
    ``[[tn, fp], [fn, tp]]`` for labels ``[0, 1]``.
    """
    if isinstance(counts, DataFrame):
        row = counts.collect()[0].asDict()
    else:
        row = dict(counts)
    grid = [[int(row["tn"]), int(row["fp"])], [int(row["fn"]), int(row["tp"])]]
    vmax = max(max(r) for r in grid) or 1

    cell, pad_l, pad_t = 120, 90, 40
    w, h = pad_l + 2 * cell + 40, pad_t + 2 * cell + 70
    body: list[str] = []
    for i in range(2):          # true label (row)
        for j in range(2):      # predicted label (col)
            v = grid[i][j]
            # viridis-ish two-tone ramp: dark for high counts
            shade = int(235 - 180 * (v / vmax))
            fill = f"rgb({shade},{shade},255)"
            x, y = pad_l + j * cell, pad_t + i * cell
            body.append(_rect(x, y, cell, cell, fill,
                              ' stroke="#444" stroke-width="1"'))
            body.append(_text(x + cell / 2, y + cell / 2 + 5, v, size=18))
    for j, lab in enumerate(labels):
        body.append(_text(pad_l + j * cell + cell / 2,
                          pad_t + 2 * cell + 22, lab))
    for i, lab in enumerate(labels):
        body.append(_text(pad_l - 18, pad_t + i * cell + cell / 2 + 4, lab))
    body.append(_text(pad_l + cell, pad_t + 2 * cell + 48,
                      "Predicted label", size=13))
    body.append(_text(16, pad_t + cell, "True label", size=13,
                      extra=f' transform="rotate(-90 16 {pad_t + cell})"'))
    svg = _svg(w, h, body)
    if path is not None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(svg)
    return svg


def metric_bars_svg(
    sweep: DataFrame | Iterable[Mapping[str, object]],
    metric: str,
    path: str | None = None,
    group_col: str = "sim_func",
    threshold_col: str = "threshold",
) -> str:
    """Grouped-bar figure of one evaluation metric per similarity
    function × threshold — the reference's
    ``plot_evaluation_graph_sim_funcs`` / ``_cosine_word_embeddings``
    (``evaluation_metrics.py:99-216``): x groups are the functions (or
    embedding names), one bar per threshold inside each group, a value
    label rounded to 3 decimals above each bar, fixed y ticks 0.0–1.0
    step 0.1 with a light y grid, and a legend titled "Threshold".

    ``sweep`` is a DataFrame with ``(group_col, threshold_col,
    <metric>)`` — e.g. a union of
    :func:`~poi_name_matching_spark.operators.evaluation.threshold_sweep`
    outputs tagged with the kernel name — or an equivalent iterable of
    mappings. It is an aggregate (functions × thresholds rows), so the
    collect is bounded.
    """
    if isinstance(sweep, DataFrame):
        rows = [r.asDict() for r in sweep.collect()]
    else:
        rows = [dict(r) for r in sweep]
    if not rows:
        raise ValueError("metric_bars_svg: empty sweep")
    groups = sorted({str(r[group_col]) for r in rows})
    thresholds = sorted({float(r[threshold_col]) for r in rows})
    val = {
        (str(r[group_col]), float(r[threshold_col])): float(r[metric])
        for r in rows
    }

    bar_w, gap, group_pad = 26, 4, 48
    group_w = len(thresholds) * (bar_w + gap) - gap
    pad_l, pad_t, pad_b, legend_w = 64, 36, 64, 140
    plot_h = 320
    w = pad_l + len(groups) * (group_w + group_pad) + legend_w
    h = pad_t + plot_h + pad_b
    y0 = pad_t + plot_h

    body: list[str] = []
    # y axis: fixed 0.0–1.0 ticks + grid (evaluation_metrics.py:145-147)
    for k in range(11):
        yv = k / 10
        y = y0 - yv * plot_h
        body.append(
            f'<line x1="{pad_l}" y1="{_fmt(y)}" '
            f'x2="{_fmt(w - legend_w)}" y2="{_fmt(y)}" '
            'stroke="#cccccc" stroke-width="0.5" opacity="0.6"/>'
        )
        body.append(_text(pad_l - 10, y + 4, f"{yv:.1f}", size=11,
                          anchor="end"))
    for gi, g in enumerate(groups):
        gx = pad_l + gi * (group_w + group_pad) + group_pad / 2
        for ti, t in enumerate(thresholds):
            v = val.get((g, t))
            if v is None:
                continue
            bh = max(0.0, min(1.0, v)) * plot_h
            x = gx + ti * (bar_w + gap)
            body.append(_rect(x, y0 - bh, bar_w, bh,
                              _COLORS[ti % len(_COLORS)],
                              ' fill-opacity="0.7"'))
            body.append(_text(x + bar_w / 2, y0 - bh - 4,
                              f"{round(v, 3)}", size=9))
        body.append(_text(gx + group_w / 2, y0 + 20, g, size=12))
    # axis titles (x label mirrors the sim-funcs variant)
    body.append(_text((pad_l + w - legend_w) / 2, h - 16,
                      "Similarity Function", size=13))
    title = metric.capitalize().replace("_", " ")
    body.append(_text(18, pad_t + plot_h / 2, title, size=13,
                      extra=f' transform="rotate(-90 18 {pad_t + plot_h / 2})"'))
    # legend, one swatch per threshold, titled "Threshold"
    lx = w - legend_w + 16
    body.append(_text(lx + 8, pad_t + 4, "Threshold", size=12,
                      anchor="start"))
    for ti, t in enumerate(thresholds):
        ly = pad_t + 18 + ti * 20
        body.append(_rect(lx, ly, 14, 14, _COLORS[ti % len(_COLORS)],
                          ' fill-opacity="0.7"'))
        body.append(_text(lx + 20, ly + 11, f"{t:g}", size=11,
                          anchor="start"))
    svg = _svg(int(w), int(h), body)
    if path is not None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(svg)
    return svg


def importance_bars_svg(
    importances: Iterable[Mapping[str, object]],
    path: str | None = None,
    feature_col: str = "feature",
    value_col: str = "importance",
) -> str:
    """Horizontal feature-importance bar figure — the SVG twin of the
    reference's ``shap.summary_plot(plot_type="bar")`` audits for its
    RF / GBT / MLP models (``ml_similarity_metrics.py:209-321``): one
    bar per feature, sorted by importance descending (largest on top),
    value label at each bar end.

    ``importances`` is the output of
    :func:`~poi_name_matching_spark.operators.ml.tree_feature_importances`
    or :func:`~poi_name_matching_spark.operators.ml.permutation_importance`
    (n_features rows — driver-side by construction).
    """
    rows = sorted(
        (dict(r) for r in importances),
        key=lambda r: (-float(r[value_col]), str(r[feature_col])),
    )
    if not rows:
        raise ValueError("importance_bars_svg: empty importance list")
    vmax = max(abs(float(r[value_col])) for r in rows) or 1.0

    bar_h, gap, pad_l, pad_t = 22, 8, 150, 36
    plot_w = 420
    w = pad_l + plot_w + 90
    h = pad_t + len(rows) * (bar_h + gap) + 40
    body: list[str] = []
    body.append(
        f'<line x1="{pad_l}" y1="{pad_t - 8}" x2="{pad_l}" '
        f'y2="{_fmt(pad_t + len(rows) * (bar_h + gap))}" '
        'stroke="#444" stroke-width="1"/>'
    )
    for i, r in enumerate(rows):
        v = float(r[value_col])
        y = pad_t + i * (bar_h + gap)
        bw = abs(v) / vmax * plot_w
        fill = _COLORS[3] if v >= 0 else _COLORS[0]
        body.append(_rect(pad_l, y, bw, bar_h, fill, ' fill-opacity="0.7"'))
        body.append(_text(pad_l - 8, y + bar_h - 6, str(r[feature_col]),
                          size=11, anchor="end"))
        body.append(_text(pad_l + bw + 6, y + bar_h - 6, f"{round(v, 4)}",
                          size=10, anchor="start"))
    body.append(_text(pad_l + plot_w / 2, h - 10, "Importance", size=13))
    svg = _svg(int(w), int(h), body)
    if path is not None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(svg)
    return svg
