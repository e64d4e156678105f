"""Worker-side package resolution must not depend on the driver's
cwd (round-9 verdict item 3): Arrow kernels are module-level
functions that cloudpickle imports by NAME inside the Python worker,
so before ``session._ship_package`` the engine only worked when the
driver happened to be launched from the repo root (cwd rode onto the
worker's sys.path).  This drives the exact repro — verify_local from
/tmp on the two queries that failed — in a subprocess."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

#: the two queries whose Arrow kernels failed with
#: ModuleNotFoundError when the driver cwd was outside the repo
_AFFECTED = ["media_ahash_neardup", "portable_qdigest_quantiles"]


def test_verify_local_passes_from_foreign_cwd(tmp_path):
    env = dict(os.environ)
    # simulate a clean launch: no repo-root cwd, no PYTHONPATH help
    # beyond what verify_local itself sets up via sys.path.insert
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "verify_local.py"),
            "/root/testdata/sf0.001",
            *_AFFECTED,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    assert '"n_fail": 0' in out.stdout, out.stdout[-3000:]


def test_ship_package_zip_contains_kernels(spark):
    """The shipped zip must carry every package module (a partial zip
    would push the ModuleNotFoundError to whichever kernel was left
    out), and tune() must have registered it on this session."""
    import zipfile

    from fxblue_etl_spark import session as s

    s.tune(spark)
    assert s._PYFILES_ZIP is not None and os.path.exists(s._PYFILES_ZIP)
    names = set(zipfile.ZipFile(s._PYFILES_ZIP).namelist())
    pkg = REPO / "fxblue_etl_spark"
    want = {
        f"fxblue_etl_spark/{p.relative_to(pkg)}" for p in pkg.rglob("*.py")
    }
    assert want <= names, sorted(want - names)[:5]
    assert spark.sparkContext.applicationId in s._PYFILES_SENT
