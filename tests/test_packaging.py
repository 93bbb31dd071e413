"""--py-files deployment artifact: the engine must import from the zip alone
(zipimport), exactly as Spark executors receive it."""

import os
import subprocess
import sys


def test_pyfiles_zip_importable(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import package_pyfiles

    out = package_pyfiles.build(str(tmp_path))
    assert os.path.exists(out)
    # clean subprocess: only the zip on sys.path (cwd=/ so the repo checkout
    # cannot shadow it) — mirrors an executor unpacking --py-files
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import fia_own_map_spark.functions.stemmer as st; "
        "import fia_own_map_spark.functions.similarity as sim; "
        "import fia_own_map_spark.operators.dedup, fia_own_map_spark.plans.pipeline; "
        "assert st.porter_stem('holdings') == 'hold'; "
        "print('zip-import-ok', fia_own_map_spark.operators.dedup.__file__)"
        % out
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/"
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "zip-import-ok" in r.stdout and out in r.stdout


def test_run_er_smoke(tmp_path):
    """Drive the spark-submit entrypoint end to end on a tiny corpus, with
    the engine provided ONLY via the --py-files zip (PYTHONPATH=zip is how
    spark-submit exposes it to the driver process)."""
    import pandas as pd

    from fia_own_map_spark.sources.webpages import generate_web_pages

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import package_pyfiles

    zip_path = package_pyfiles.build(str(tmp_path))
    pages, _ = generate_web_pages(n_pages=300, seed=7)
    pages["warc_ts"] = pages["warc_ts"].astype("datetime64[us]")
    src = tmp_path / "pages.parquet"
    pages.to_parquet(src, index=False)
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ, PYTHONPATH=zip_path)
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "run_er.py"),
            "--input", str(src), "--output", str(tmp_path / "out"),
            "--checkpoints", str(tmp_path / "ckpt"), "--local", "4",
        ],
        capture_output=True, text=True, cwd=str(tmp_path), env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = pd.read_parquet(tmp_path / "out")
    assert len(out) == 300 and {"url", "cluster_id"} <= set(out.columns)
