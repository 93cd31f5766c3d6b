"""CLI round-trip — parity with the reference's frocket/cli.py command set:
register → list → info → run → unregister → config, driven in-process
through main(argv) (getOrCreate reuses the test SparkSession)."""

import json

from funnel_rocket_spark import cli

SF_EVENTS = "/root/testdata/sf0.001/events.parquet"


def _run(capsys, *argv) -> tuple[int, str]:
    rc = cli.main(list(argv))
    return rc, capsys.readouterr().out


def test_cli_roundtrip(spark, tmp_path, capsys):
    catalog = str(tmp_path / "catalog")

    rc, out = _run(capsys, "--catalog", catalog, "register", "ev",
                   SF_EVENTS, "user_id", "ts")
    assert rc == 0
    assert json.loads(out)["rows"] == 1000

    rc, out = _run(capsys, "--catalog", catalog, "list")
    assert rc == 0 and out.startswith("ev\t")

    rc, out = _run(capsys, "--catalog", catalog, "info", "ev")
    assert rc == 0
    meta = json.loads(out)
    assert meta["name"] == "ev" and "columns" not in meta

    rc, out = _run(capsys, "--catalog", catalog, "info", "ev", "--full")
    assert rc == 0 and "columns" in json.loads(out)

    rc, out = _run(capsys, "--catalog", catalog, "run", "ev", "--empty")
    assert rc == 0
    assert json.loads(out)["query"]["matchingGroupRows"] == 1000

    q = json.dumps({"query": {"conditions": [
        {"filter": ["event_type", "==", "purchase"],
         "target": ["count", ">=", 3]}]}})
    rc, out = _run(capsys, "--catalog", catalog, "run", "ev", "--string", q)
    assert rc == 0
    assert json.loads(out)["query"]["matchingGroups"] == 15

    # just queried → the in-use guard refuses without --force
    rc, out = _run(capsys, "--catalog", catalog, "unregister", "ev")
    assert rc == 1 and json.loads(out)["success"] is False

    rc, out = _run(capsys, "--catalog", catalog, "unregister", "ev", "--force")
    assert rc == 0
    body = json.loads(out)
    assert body["success"] and body["removed"] and body["force"]
    assert body["datasetLastUsed"] is not None

    rc, out = _run(capsys, "--catalog", catalog, "list")
    assert rc == 0 and out == ""

    # idempotent-but-signalled: unregistering a missing dataset exits 2
    rc, out = _run(capsys, "--catalog", catalog, "unregister", "ev")
    assert rc == 2 and json.loads(out)["removed"] is False


def test_cli_config(capsys):
    rc, out = _run(capsys, "config")
    assert rc == 0
    conf = json.loads(out)
    assert conf["spark.sql.adaptive.enabled"] is True
    assert "catalog.dir" in conf


def test_packaging_installed_entry_point(tmp_path):
    """Installability parity with the reference's pip distribution
    (/root/reference/setup.py:13): install into a CLEAN venv and drive the
    console entry point end-to-end — register a dataset, run the empty
    query, all through the installed `funnel-rocket-spark` script, not the
    checkout. Uses `setup.py install` because this sandbox lacks the
    `wheel` package PEP 517 builds require; with wheel present,
    `pip install .` resolves through pyproject.toml identically."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    venv = tmp_path / "venv"
    subprocess.run([sys.executable, "-m", "venv", "--system-site-packages",
                    str(venv)], check=True)
    py = str(venv / "bin" / "python")
    subprocess.run([py, "setup.py", "-q", "install"], cwd=repo, check=True,
                   capture_output=True)
    exe = str(venv / "bin" / "funnel-rocket-spark")
    assert os.path.exists(exe)
    assert os.path.exists(str(venv / "bin" / "funnel-rocket-spark-api"))

    # import resolves from site-packages, not the checkout (cwd=tmp_path)
    mod = subprocess.run(
        [py, "-c", "import funnel_rocket_spark as f; print(f.__file__)"],
        cwd=str(tmp_path), check=True, capture_output=True, text=True)
    assert str(venv) in mod.stdout

    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    out = subprocess.run([exe, "config"], cwd=str(tmp_path), check=True,
                         capture_output=True, text=True, env=env)
    cfg = json.loads(out.stdout)
    assert cfg["spark.master"] == "local[4]"

    catalog = str(tmp_path / "catalog")
    subprocess.run(
        [exe, "--catalog", catalog, "register", "ev",
         "/root/testdata/sf0.001/events.parquet", "user_id", "ts"],
        cwd=str(tmp_path), check=True, capture_output=True, env=env,
        timeout=300)
    run = subprocess.run(
        [exe, "--catalog", catalog, "run", "ev", "--empty"],
        cwd=str(tmp_path), check=True, capture_output=True, text=True,
        env=env, timeout=300)
    assert json.loads(run.stdout)["query"]["matchingGroupRows"] == 1000
