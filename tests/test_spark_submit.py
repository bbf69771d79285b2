"""spark-submit --py-files integration (north-rule deployment clause).

BASELINE.json's north rule requires the pipeline to "run via
spark-submit --py-files on a multi-executor cluster". This test
exercises that deployment path for real: the package is zipped exactly
as the documented cluster workflow (``zip -r pkg.zip
poi_name_matching_spark`` — see ``poi_name_matching_spark/__main__.py``)
and launched through the actual ``spark-submit`` binary in a subprocess
whose environment cannot resolve the repo checkout (PYTHONPATH
stripped, cwd a temp dir) — so the driver import AND every
executor-side pandas UDF must load the package from the shipped zip.

Asserts the five-stage pipeline completes end-to-end under that
deployment and the emitted clusters hit the e2e F1 bar on planted
truth (same corpus/kernels as tests/test_pipeline_e2e.py).
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
PKG = REPO / "poi_name_matching_spark"
N = 250
SEED = 21


def _find_spark_submit() -> str | None:
    # prefer the pyspark wheel's own launcher: guaranteed to match the
    # library version the executors' python workers import
    import pyspark

    cand = Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    return shutil.which("spark-submit")


def _zip_package(dest: Path) -> Path:
    zpath = dest / "pkg.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for f in sorted(PKG.rglob("*.py")):
            if "__pycache__" in f.parts:
                continue
            z.write(f, f.relative_to(REPO))
    return zpath


@pytest.mark.skipif(
    _find_spark_submit() is None, reason="no spark-submit binary available"
)
def test_spark_submit_py_files_end_to_end(spark, tmp_path):
    zpath = _zip_package(tmp_path)
    out = tmp_path / "ckpt"

    # thin driver: everything it imports must come from the --py-files zip
    runner = tmp_path / "runner.py"
    runner.write_text(
        "import sys\n"
        "from poi_name_matching_spark.__main__ import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable

    proc = subprocess.run(
        [
            _find_spark_submit(),
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.ui.showConsoleProgress=false",
            "--py-files", str(zpath),
            str(runner),
            "--n-convs", str(N),
            "--seed", str(SEED),
            "--output", str(out),
            "--kernels", "levenshtein,jaccard,tfidf,softtfidf",
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # the runner prints one JSON summary line (stage stats) on success
    summary = None
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            summary = json.loads(line)
            break
        except json.JSONDecodeError:
            continue
    assert summary is not None, proc.stdout[-2000:]
    assert summary["n_components"] > 0
    assert summary["n_candidate_pairs"] > 0

    # clusters written by the submitted run hit the e2e truth bar
    from poi_name_matching_spark.data import truth_df
    from poi_name_matching_spark.operators.evaluation import pairwise_cluster_f1
    from poi_name_matching_spark.sources.checkpoint import StageCheckpoint

    comps = StageCheckpoint(out).load(spark, "components")
    m = pairwise_cluster_f1(comps, truth_df(spark, n_convs=N, seed=SEED))
    assert m.f1 >= 0.95, m
