"""Crash-recovery face of the custom Python DataSource's streaming
reader (round-9 verdict item 8): unlike test_pysource's graceful
q.stop() restart, this KILLS the whole JVM mid-stream (SIGKILL, no
shutdown hooks) after the offset has advanced well past the first few
batches, restarts from the same checkpoint in a fresh process, and
asserts exactly-once delivery — ids contiguous and unique across the
crash. The file sink's _spark_metadata manifest is what de-dupes files
committed by the killed run, so the validation read MUST go through
Spark (raw parquet listing would double-count uncommitted files)."""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_RUNNER = r"""
import sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from hive_2_spark.core.pysource import _FORMAT, _register

spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
_register(spark)
q = (spark.readStream.format(_FORMAT)
     .option("batchSize", 64)
     .load()
     .writeStream.format("parquet")
     .option("path", {out!r})
     .option("checkpointLocation", {ckpt!r})
     .trigger(processingTime="150 milliseconds")
     .start())
mode = {mode!r}
deadline = time.time() + 240
while time.time() < deadline:
    if q.exception() is not None:
        print("QUERY-DIED", q.exception(), flush=True)
        sys.exit(3)
    try:
        n = spark.read.parquet({out!r}).count()
    except Exception:
        n = 0
    print(f"ROWS {{n}}", flush=True)
    if mode == "resume" and n >= {target}:
        q.stop()
        ids = sorted(r.id for r in
                     spark.read.parquet({out!r}).select("id").collect())
        dupes = len(ids) - len(set(ids))
        contiguous = ids == list(range(len(ids)))
        print(f"FINAL n={{len(ids)}} dupes={{dupes}}"
              f" contiguous={{contiguous}}", flush=True)
        spark.stop()
        sys.exit(0)
    time.sleep(0.3)
sys.exit(4)  # never reached the target
"""


def _launch(tmp_path: Path, mode: str, target: int) -> subprocess.Popen:
    code = _RUNNER.format(
        repo=str(REPO),
        out=str(tmp_path / "out"),
        ckpt=str(tmp_path / "ckpt"),
        mode=mode,
        target=target,
    )
    return subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def test_streaming_source_survives_sigkill(tmp_path):
    # Phase 1: run until the committed offset is "large" (>= 320 rows =
    # 5+ micro-batches), then SIGKILL the whole JVM mid-flight.
    p1 = _launch(tmp_path, mode="kill", target=10**9)
    killed_at = None
    deadline = time.time() + 240
    try:
        while time.time() < deadline:
            line = p1.stdout.readline()
            if not line:
                break
            if line.startswith("QUERY-DIED"):
                raise AssertionError(line)
            if line.startswith("ROWS "):
                n = int(line.split()[1])
                if n >= 320:
                    killed_at = n
                    os.kill(p1.pid, signal.SIGKILL)
                    break
    finally:
        if p1.poll() is None and killed_at is None:
            p1.kill()
        p1.wait()
    assert killed_at is not None and killed_at >= 320, killed_at

    # Phase 2: fresh process, same checkpoint — must resume past the
    # crash point and stay exactly-once (no dupes, ids contiguous).
    target = killed_at + 128
    p2 = _launch(tmp_path, mode="resume", target=target)
    out, _ = p2.communicate(timeout=300)
    assert p2.returncode == 0, out[-2000:]
    final = [ln for ln in out.splitlines() if ln.startswith("FINAL")]
    assert final, out[-2000:]
    parts = dict(kv.split("=") for kv in final[0].split()[1:])
    assert int(parts["n"]) >= target
    assert parts["dupes"] == "0"
    assert parts["contiguous"] == "True"
