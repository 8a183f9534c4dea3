#!/usr/bin/env python3
"""Array-job runner — the native replacement for kaldi ``run.pl``.

Same CLI contract as the reference's L0 job layer (SURVEY.md §2.9):

    run_jobs.py [--max-jobs-run N] [JOB=1:N] <logfile> <command...>

Substitutes ``JOB`` in the command and logfile, runs the shards as local
subprocesses (bounded parallelism), tees output to per-shard logs, and
exits nonzero if any shard fails — re-enterable from staged run.sh scripts
exactly like run.pl.
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os
import re
import subprocess
import sys


def main():
    argv = sys.argv[1:]
    max_jobs = os.cpu_count() or 8
    if argv and argv[0] == "--max-jobs-run":
        max_jobs = int(argv[1])
        argv = argv[2:]

    job_range = None
    if argv and re.fullmatch(r"\w+=\d+:\d+", argv[0]):
        name, rng = argv[0].split("=")
        lo, hi = map(int, rng.split(":"))
        job_range = (name, lo, hi)
        argv = argv[1:]

    if len(argv) < 2:
        print(__doc__)
        sys.exit(1)
    logfile, cmd = argv[0], argv[1:]

    def run_one(job_id):
        if job_range:
            name = job_range[0]
            sub = lambda s: s.replace(name, str(job_id))
        else:
            sub = lambda s: s
        log = sub(logfile)
        os.makedirs(os.path.dirname(log) or ".", exist_ok=True)
        shard_cmd = " ".join(sub(c) for c in cmd)
        with open(log, "w") as f:
            f.write(f"# {shard_cmd}\n# Started at {os.popen('date').read()}\n")
            f.flush()
            ret = subprocess.run(
                ["bash", "-c", shard_cmd], stdout=f, stderr=subprocess.STDOUT
            ).returncode
            f.write(f"# Ended (code {ret}) at {os.popen('date').read()}\n")
        return job_id, ret

    if job_range:
        name, lo, hi = job_range
        jobs = range(lo, hi + 1)
        with concurrent.futures.ThreadPoolExecutor(max_workers=max_jobs) as ex:
            results = list(ex.map(run_one, jobs))
        failed = [j for j, r in results if r != 0]
        if failed:
            print(
                f"run_jobs.py: {len(failed)} / {len(results)} jobs failed: {failed} "
                f"(see {logfile})",
                file=sys.stderr,
            )
            sys.exit(1)
    else:
        _, ret = run_one(1)
        if ret != 0:
            print(f"run_jobs.py: job failed (see {logfile})", file=sys.stderr)
            sys.exit(ret)


if __name__ == "__main__":
    main()
