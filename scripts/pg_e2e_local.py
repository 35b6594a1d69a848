"""Run the live-Postgres e2e (tests/test_postgres_e2e.py) against a
REAL local PostgreSQL server — no container needed when the box ships
the server binaries (this build environment does: /usr/local/bin/
postgres + pg_ctl + psql, while forbidding pip installs — hence
sources/minipg.py as the stdlib driver fallback).

What it does, all inside one scratch directory:
  1. ``initdb -A trust -U postgres`` into <scratch>/data (trust auth on
     the unix socket — the minipg-supported method);
  2. start ``postgres`` with ``listen_addresses=''`` (SOCKET-ONLY — the
     server is never reachable from the network) on an off-default
     port under <scratch>/sock;
  3. ``CREATE DATABASE project3`` (the reference's database name,
     reference config/sink-passangers_per_route.json:9);
  4. run ``pytest tests/test_postgres_e2e.py`` with SPARK_GRAFT_PG_DSN
     pointing at the socket;
  5. stop the server and remove the scratch directory, succeeding or
     failing with pytest's exit code.

Usage: python scripts/pg_e2e_local.py   (exit 0 = e2e green)
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
PORT = 54329


def _have_psycopg2() -> bool:
    try:
        import psycopg2  # noqa: F401
        return True
    except ImportError:
        return False


def _server_cmd(args: list[str]) -> list[str]:
    """Postgres refuses to run as root; when we ARE root (this build
    environment), run the server-side commands as the stock `postgres`
    system user via runuser. Unprivileged callers run them directly."""
    if os.geteuid() == 0:
        return ["runuser", "-u", "postgres", "--"] + args
    return args


def main() -> int:
    for exe in ("initdb", "postgres", "pg_ctl"):
        if shutil.which(exe) is None:
            print(f"SKIP: {exe} not on PATH — no local Postgres server")
            return 0
    scratch = tempfile.mkdtemp(prefix="pg_e2e_")
    data = os.path.join(scratch, "data")
    sock = os.path.join(scratch, "sock")
    log = os.path.join(scratch, "server.log")
    os.makedirs(sock)
    if os.geteuid() == 0:
        shutil.chown(scratch, user="postgres")
        shutil.chown(sock, user="postgres")
    try:
        subprocess.run(
            _server_cmd(["initdb", "-D", data, "-A", "trust",
                         "-U", "postgres"]),
            check=True, capture_output=True)
        subprocess.run(
            _server_cmd(["pg_ctl", "-D", data, "-l", log, "-w", "-o",
                         f"-p {PORT} -k {sock} -c listen_addresses=''",
                         "start"]),
            check=True, capture_output=True)
        try:
            dsn_pg = f"host={sock} port={PORT} user=postgres"
            sys.path.insert(0, REPO)
            from kafkastreams_tp3_is_spark.sources import minipg
            con = minipg.connect(dsn_pg + " dbname=postgres")
            # CREATE DATABASE cannot run inside a transaction block —
            # commit the implicit BEGIN first, then send it bare
            con.commit()
            con._simple("CREATE DATABASE project3")
            con.close()
            env = dict(os.environ)
            env["SPARK_GRAFT_PG_DSN"] = dsn_pg + " dbname=project3"
            proc = subprocess.run(
                [sys.executable, "-m", "pytest",
                 "tests/test_postgres_e2e.py", "-v", "--no-header"],
                cwd=REPO, env=env, capture_output=True, text=True)
            print(proc.stdout[-2000:], proc.stderr[-500:])
            # committed evidence that the opt-in e2e RAN against a real
            # server (the per-round artifact discipline): stamp + the
            # per-test lines + the server version
            import json

            from _stamp import git_stamp
            ver = subprocess.run(["postgres", "--version"],
                                 capture_output=True, text=True)
            payload = {
                "metric": "pg_e2e_local",
                **git_stamp(),
                "server": ver.stdout.strip(),
                "driver": ("psycopg2" if _have_psycopg2()
                           else "sources/minipg.py (stdlib fallback)"),
                "exit_code": proc.returncode,
                "tests": [ln.strip() for ln in proc.stdout.splitlines()
                          if "::" in ln and ("PASSED" in ln
                                             or "FAILED" in ln)],
            }
            with open(os.path.join(REPO, "PG_E2E.json"), "w") as f:
                json.dump(payload, f, indent=1)
            return proc.returncode
        finally:
            subprocess.run(
                _server_cmd(["pg_ctl", "-D", data, "-m", "fast", "stop"]),
                capture_output=True)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
