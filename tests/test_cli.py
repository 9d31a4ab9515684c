"""CLI entry points (the reference binary's surface: validate / test /
rm — the Spark-session commands run/page-rank are exercised in the
verify drives and engine tests)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LCD = """
seed "https://h22.example.test/img-00000000";
allow "^https://h\\\\d+\\\\.example\\\\.test/";
set quota = 10;
select html { caption: first(text); }
"""


def run_cli(*args):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "lopez_spark", *args],
        capture_output=True,
        text=True,
        env=env,
        timeout=120,
    )


def test_validate(tmp_path):
    lcd = tmp_path / "a.lcd"
    lcd.write_text(LCD)
    r = run_cli("validate", str(lcd))
    assert r.returncode == 0, r.stderr
    assert "1 rule sets" in r.stdout and "caption: string" in r.stdout


def test_validate_rejects_bad(tmp_path):
    lcd = tmp_path / "bad.lcd"
    lcd.write_text("select a { x: sum(text); }")
    r = run_cli("validate", str(lcd))
    assert r.returncode != 0


def test_test_url(tmp_path):
    lcd = tmp_path / "a.lcd"
    lcd.write_text(LCD)
    r = run_cli("test", str(lcd), "https://h22.example.test/img-00000000", "--corpus", "300")
    assert r.returncode == 0, r.stderr
    rep = json.loads(r.stdout)
    assert rep["report"] == "Crawled" and rep["status_code"] == 200
    assert rep["analyses"]["caption"].startswith("a photo of ")


def test_rm_missing_is_noop(tmp_path):
    r = run_cli("rm", "nonexistent", "--store", str(tmp_path))
    assert r.returncode == 0


def test_status_and_expire_on_missing_store(tmp_path):
    r = run_cli("status", "nope", "--store", str(tmp_path))
    assert r.returncode == 1
    assert "no committed waves" in r.stdout


def test_status_reads_manifests(tmp_path):
    # fabricate a 2-wave store: manifests only (status never needs Spark)
    import json as _json

    for k, batch in enumerate((3, 5)):
        wdir = tmp_path / "s" / f"w{k:05d}"
        wdir.mkdir(parents=True)
        (wdir / "manifest.json").write_text(
            _json.dumps(
                {
                    "wave": k,
                    "processed_total": 8,
                    "metrics": {
                        "n_batch": batch,
                        "n_closed": batch,
                        "n_error": 0,
                        "n_new": 1,
                        "n_links": 2,
                        "n_dup": 1,
                        "wall_s": 1.5,
                    },
                    "lineage": {"0": batch},
                }
            )
        )
    r = run_cli("status", "s", "--store", str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "waves 0..1" in r.stdout
    assert "processed_total: 8" in r.stdout
    lines = [ln for ln in r.stdout.splitlines() if ln.strip().startswith(("0 ", "1 "))]
    assert len(lines) == 2
