"""Standalone-daemon cluster smoke: real ``spark://`` master + workers.

``local-cluster[2,8,4096]`` exercises Spark's multi-process scheduler
but launches the executor JVMs itself; the one remaining deployment
delta is the STANDALONE cluster manager — separate master/worker
daemon processes with their own launch path (daemon classpath/env,
worker-side executor spawning, ``addPyFile`` staging through the
master). This wrapper:

1. starts a Master (``org.apache.spark.deploy.master.Master``) and
   N Worker daemons via ``spark-class`` (the pip wheel ships no
   sbin start scripts, but the classes and launcher are present),
2. waits for the workers to register,
3. runs ``tools/cluster_smoke.py`` as a subprocess with
   ``SMOKE_MASTER=spark://127.0.0.1:7077`` (all stages: oracle
   parity, streaming TWS gate, pgwire fan-out, fault-retry),
4. tears the daemons down, and exits with the smoke's status.

Usage (must be the only Spark JVM user on the box):
    python tools/standalone_smoke.py            # 2 workers x 8 cores
    SMOKE_QUERIES=all python tools/standalone_smoke.py
"""

from __future__ import annotations

import os
import signal
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MASTER_PORT = int(os.environ.get("SA_MASTER_PORT", "7077"))
N_WORKERS = int(os.environ.get("SA_WORKERS", "2"))


def _spark_bin() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin")


def _port_open(port: int, timeout_s: float = 60.0) -> bool:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        with socket.socket() as s:
            s.settimeout(1)
            try:
                s.connect(("127.0.0.1", port))
                return True
            except OSError:
                time.sleep(0.5)
    return False


def _wait_registered(log_path: str, timeout_s: float = 60.0) -> bool:
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        try:
            with open(log_path) as fh:
                if "Successfully registered with master" in fh.read():
                    return True
        except FileNotFoundError:
            pass
        time.sleep(0.5)
    return False


def main() -> int:
    spark_class = os.path.join(_spark_bin(), "spark-class")
    logdir = tempfile.mkdtemp(prefix="sa_smoke_")
    env = {**os.environ, "SPARK_NO_DAEMONIZE": "1"}
    procs: list[subprocess.Popen] = []

    def spawn(args: list[str], log: str) -> subprocess.Popen:
        fh = open(os.path.join(logdir, log), "w")
        return subprocess.Popen(
            args, stdout=fh, stderr=subprocess.STDOUT, env=env,
            start_new_session=True,
        )

    try:
        procs.append(
            spawn(
                [spark_class, "org.apache.spark.deploy.master.Master",
                 "--host", "127.0.0.1", "--port", str(MASTER_PORT),
                 "--webui-port", "0"],
                "master.log",
            )
        )
        if not _port_open(MASTER_PORT):
            print("FAIL: master never opened its port")
            return 1
        for i in range(N_WORKERS):
            procs.append(
                spawn(
                    [spark_class, "org.apache.spark.deploy.worker.Worker",
                     f"spark://127.0.0.1:{MASTER_PORT}",
                     "--cores", "8", "--memory", "4g",
                     "--webui-port", "0",
                     "--work-dir", os.path.join(logdir, f"work{i}")],
                    f"worker{i}.log",
                )
            )
        for i in range(N_WORKERS):
            if not _wait_registered(os.path.join(logdir, f"worker{i}.log")):
                print(f"FAIL: worker {i} never registered")
                return 1
        print(
            f"standalone cluster up: master :{MASTER_PORT}, "
            f"{N_WORKERS} worker daemons",
            flush=True,
        )
        smoke = subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "cluster_smoke.py")],
            env={
                **os.environ,
                "SMOKE_MASTER": f"spark://127.0.0.1:{MASTER_PORT}",
            },
            cwd=REPO,
        )
        return smoke.returncode
    finally:
        for p in procs:
            try:
                os.killpg(os.getpgid(p.pid), signal.SIGTERM)
            except ProcessLookupError:
                pass
        time.sleep(1)
        for p in procs:
            if p.poll() is None:
                try:
                    os.killpg(os.getpgid(p.pid), signal.SIGKILL)
                except ProcessLookupError:
                    pass


if __name__ == "__main__":
    sys.exit(main())
