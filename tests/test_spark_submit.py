"""North-rule ship path: `spark-submit --py-files qs_spark.zip jobs/extract_job.py`.

The north rule says jobs ship via spark-submit --py-files to a cluster; every
other test imports qs_spark from the repo checkout, which never exercises
that path (a missing data file in the zip, an import that only resolves via
the repo layout, or a driver/executor sys.path mismatch would all pass pytest
and fail the real submit).  This test runs the REAL binary from a NEUTRAL
working directory containing only a copy of jobs/extract_job.py — the
`qs_spark` package is resolvable exclusively through the --py-files zip, on
the driver and in the Python workers.

It also drills the north-rule resume contract end-to-end through that path:
run 1 crashes mid-table after one committed wave (--fail-after-waves), run 2
(same warehouse, fresh run_id) must finish the remaining buckets WITHOUT
re-processing run 1's — asserted from the lineage table itself (run 1's
buckets keep run 1's run_id).

One spark-submit is a cold JVM (~30 s); the whole test runs two, so it is the
slowest test in the suite by design — it replaces a cluster smoke.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import zipfile

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


def _zip_package(dest: str) -> str:
    """Zip qs_spark exactly as the documented ship command does
    (`zip -r qs_spark.zip qs_spark`): every non-pycache file, including the
    golden/ data files, so the zip IS the deployable artifact."""
    zpath = os.path.join(dest, "qs_spark.zip")
    pkg = os.path.join(REPO, "qs_spark")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirs, files in os.walk(pkg):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return zpath


def _submit(cwd: str, zpath: str, *job_args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # the repo must NOT leak in via PYTHONPATH — the zip is the only route
    env.pop("PYTHONPATH", None)
    return subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zpath,
            os.path.join(cwd, "jobs", "extract_job.py"),
            *job_args,
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not present"
)
def test_spark_submit_py_files_ship_and_resume(tmp_path):
    staging = str(tmp_path / "staging")
    os.makedirs(os.path.join(staging, "jobs"))
    shutil.copy(
        os.path.join(REPO, "jobs", "extract_job.py"),
        os.path.join(staging, "jobs", "extract_job.py"),
    )
    # neutral cwd: the job script's repo-root sys.path insert points at the
    # staging dir, which contains no qs_spark — only --py-files can satisfy it
    assert not os.path.exists(os.path.join(staging, "qs_spark"))
    zpath = _zip_package(staging)
    out = str(tmp_path / "warehouse")
    corpus = str(tmp_path / "corpus.parquet")

    # run 1: commits exactly one wave (4 of 8 buckets), then crashes
    r1 = _submit(
        staging,
        zpath,
        "--synthetic",
        "300",
        "--corpus-path",
        corpus,
        "--output",
        out,
        "--run-id",
        "ship1",
        "--n-buckets",
        "8",
        "--buckets-per-wave",
        "4",
        "--fail-after-waves",
        "1",
    )
    assert r1.returncode != 0, r1.stdout + r1.stderr
    # spark-submit's PythonRunner merges the Python driver's stderr into
    # stdout (redirectErrorStream), so search the combined streams
    assert "injected failure before wave 1" in (r1.stdout + r1.stderr)

    ckpt = os.path.join(out, "checkpoints")
    con = duckdb.connect()
    committed = con.execute(
        f"SELECT bucket, run_id FROM read_parquet('{ckpt}/**/*.parquet') "
        "WHERE status = 'committed' ORDER BY bucket"
    ).fetchall()
    assert len(committed) == 4  # one wave survived the crash
    assert {r[1] for r in committed} == {"ship1"}

    # run 2: same warehouse, fresh run_id — must resume past ship1's buckets
    r2 = _submit(
        staging,
        zpath,
        "--synthetic",
        "300",
        "--corpus-path",
        corpus,
        "--output",
        out,
        "--run-id",
        "ship2",
        "--n-buckets",
        "8",
        "--buckets-per-wave",
        "4",
    )
    assert r2.returncode == 0, r2.stdout + r2.stderr
    m = re.search(r"run ship2: (\d+) spans", r2.stdout + r2.stderr)
    assert m, r2.stdout + r2.stderr
    n_spans = int(m.group(1))
    assert n_spans > 0

    lineage = con.execute(
        f"SELECT run_id, count(*) FROM read_parquet('{ckpt}/**/*.parquet') "
        "WHERE status = 'committed' GROUP BY run_id ORDER BY run_id"
    ).fetchall()
    # resume proof: ship1's 4 buckets were NOT re-processed (their lineage
    # rows keep run_id ship1); ship2 added exactly the missing 4
    assert lineage == [("ship1", 4), ("ship2", 4)]

    spans = os.path.join(out, "spans_extracted")
    cnt, dup = con.execute(
        f"SELECT count(*), count(*) - count(DISTINCT (doc_id, \"order\", kind)) "
        f"FROM read_parquet('{spans}/**/*.parquet')"
    ).fetchone()
    assert cnt == n_spans  # the job's reported count is the stored count
    assert dup == 0  # crash + resume introduced no duplicate spans
