"""End-to-end `spark-submit --py-files` deployment check (the north
rule's run mode): the package zip built by scripts/package.py is the
ONLY source of lopez_spark for both driver and executors — the job
runs a real mini-crawl on a 2-executor local-cluster and prints its
wave summary.
"""

import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

JOB = """
import sys, tempfile
from pyspark.sql import SparkSession

from lopez_spark import fixtures as fx
from lopez_spark.catalog import WaveStore
from lopez_spark.crawler.config import Boundaries, CrawlConfig
from lopez_spark.crawler.wave import CrawlEngine
from lopez_spark.crawler.web import SyntheticWeb
import lopez_spark
assert ".zip" in lopez_spark.__file__, lopez_spark.__file__  # from the zip

spark = (SparkSession.builder.appName("submit-smoke")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

N = 200
cfg = CrawlConfig(
    seeds=tuple(fx.seeds(N)),
    boundaries=Boundaries(allowed=(r"^https://h\\d+\\.example\\.test/",)),
    quota=60, max_depth=4, batch_size=32, partitions=4,
    hot_origin_threshold=16, max_salts=2,
)
store = WaveStore(tempfile.mkdtemp(), "submit_demo")
summary = CrawlEngine(spark, cfg, SyntheticWeb(N), store).crawl()
print(f"SUBMIT_OK waves={summary.waves} processed={summary.processed}")
spark.stop()
"""


def test_spark_submit_py_files_on_local_cluster(tmp_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(shutil.which("pyspark") or "")), "bin", "spark-submit"
    )
    if not spark_submit or not os.path.exists(spark_submit):
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit launcher not found"

    zip_path = str(tmp_path / "lopez_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "package.py"), zip_path],
        check=True,
        cwd=str(tmp_path),  # NOT the repo: the zip must be self-contained
        capture_output=True,
    )
    assert os.path.exists(zip_path)

    job = str(tmp_path / "job.py")
    with open(job, "w") as f:
        f.write(JOB)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip is the only package source
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local-cluster[2,1,1024]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.adaptive.enabled=true",
            job,
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=560,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    marker = [l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_OK")]
    assert marker, proc.stdout[-2000:] + proc.stderr[-2000:]
    fields = dict(kv.split("=") for kv in marker[0].split()[1:])
    assert int(fields["processed"]) >= 60  # hit the quota
    assert int(fields["waves"]) >= 2
