#!/usr/bin/env python3
"""Array-job runner — the native replacement for kaldi ``run.pl`` and its
cluster siblings ``queue.pl`` / ``slurm.pl`` (SURVEY.md §2.9).

Same CLI contract as the reference's L0 job layer:

    run_jobs.py [--backend local|slurm|sge] [--max-jobs-run N] \
                [JOB=1:N] <logfile> <command...>

Substitutes ``JOB`` in the command and logfile and runs the shards:

- ``local`` (default, = run.pl): bounded-parallel local subprocesses.
- ``slurm`` (= slurm.pl): ONE ``sbatch --wait`` array job (tasks lo-hi,
  throttled by ``--max-jobs-run``); per-shard logs land in the same files.
- ``sge`` (= queue.pl): ``qsub -sync y -t lo-hi`` array job.

The backend can also be set via the ``S2S_JOB_BACKEND`` environment
variable (recipes keep ``train_cmd="python3 utils/run_jobs.py"`` and pick
the cluster in the environment, like kaldi's cmd.sh). Extra scheduler
flags pass through ``S2S_SBATCH_OPTS`` / ``S2S_QSUB_OPTS``. Exits nonzero
if any shard fails — re-enterable from staged run.sh scripts.
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os
import re
import shlex
import subprocess
import sys
import tempfile


def _parse_argv(argv):
    backend = os.environ.get("S2S_JOB_BACKEND", "local")
    max_jobs = os.cpu_count() or 8
    while argv:
        if argv[0] == "--backend":
            backend = argv[1]
            argv = argv[2:]
        elif argv[0] == "--max-jobs-run":
            max_jobs = int(argv[1])
            argv = argv[2:]
        else:
            break

    job_range = None
    if argv and re.fullmatch(r"\w+=\d+:\d+", argv[0]):
        name, rng = argv[0].split("=")
        lo, hi = map(int, rng.split(":"))
        job_range = (name, lo, hi)
        argv = argv[1:]

    if len(argv) < 2:
        print(__doc__)
        sys.exit(1)
    return backend, max_jobs, job_range, argv[0], argv[1:]


# ------------------------------------------------------------------- local
def _run_local(max_jobs, job_range, logfile, cmd):
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
        _, lo, hi = job_range
        with concurrent.futures.ThreadPoolExecutor(max_workers=max_jobs) as ex:
            results = list(ex.map(run_one, range(lo, hi + 1)))
        failed = [j for j, r in results if r != 0]
        if failed:
            print(
                f"run_jobs.py: {len(failed)} / {len(results)} jobs failed: "
                f"{failed} (see {logfile})",
                file=sys.stderr,
            )
            sys.exit(1)
    else:
        _, ret = run_one(1)
        if ret != 0:
            print(f"run_jobs.py: job failed (see {logfile})", file=sys.stderr)
            sys.exit(ret)


# ----------------------------------------------------------------- cluster
def _array_script(job_range, logfile, cmd, task_var):
    """Batch script: substitute JOB with the scheduler's task id at run
    time, tee into the per-shard log, propagate the exit code."""
    name = job_range[0] if job_range else "JOB"
    shard_cmd = " ".join(cmd).replace(name, f"${{{task_var}}}")
    log = logfile.replace(name, f"${{{task_var}}}")
    return "\n".join(
        [
            "#!/usr/bin/env bash",
            f'log="{log}"',
            'mkdir -p "$(dirname "$log")"',
            f'echo "# {shard_cmd}" > "$log"',
            f'echo "# Started at $(date)" >> "$log"',
            f'bash -c {shlex.quote(shard_cmd)} >> "$log" 2>&1',
            "ret=$?",
            'echo "# Ended (code $ret) at $(date)" >> "$log"',
            "exit $ret",
            "",
        ]
    )


def _run_cluster(backend, max_jobs, job_range, logfile, cmd):
    lo, hi = (job_range[1], job_range[2]) if job_range else (1, 1)
    task_var = "SLURM_ARRAY_TASK_ID" if backend == "slurm" else "SGE_TASK_ID"
    script = _array_script(job_range, logfile, cmd, task_var)
    with tempfile.NamedTemporaryFile(
        "w", suffix=".sh", prefix="run_jobs_", delete=False
    ) as f:
        f.write(script)
        path = f.name
    os.chmod(path, 0o755)

    if backend == "slurm":
        submit = (
            ["sbatch", "--wait", f"--array={lo}-{hi}%{max_jobs}",
             "--output=/dev/null", "--error=/dev/null"]
            + shlex.split(os.environ.get("S2S_SBATCH_OPTS", ""))
            + [path]
        )
    elif backend == "sge":
        submit = (
            ["qsub", "-sync", "y", "-t", f"{lo}-{hi}", "-tc", str(max_jobs),
             "-o", "/dev/null", "-e", "/dev/null", "-cwd"]
            + shlex.split(os.environ.get("S2S_QSUB_OPTS", ""))
            + [path]
        )
    else:
        raise ValueError(f"unknown backend {backend!r}")

    try:
        ret = subprocess.run(submit).returncode
    except FileNotFoundError:
        print(
            f"run_jobs.py: {submit[0]!r} not found — backend {backend!r} "
            "needs the cluster CLI on PATH (use --backend local otherwise)",
            file=sys.stderr,
        )
        sys.exit(127)
    finally:
        try:
            os.unlink(path)
        except OSError:
            pass
    if ret != 0:
        print(
            f"run_jobs.py: {backend} array job failed (code {ret}, "
            f"see {logfile})",
            file=sys.stderr,
        )
        sys.exit(1)


def main():
    backend, max_jobs, job_range, logfile, cmd = _parse_argv(sys.argv[1:])
    if backend == "local":
        _run_local(max_jobs, job_range, logfile, cmd)
    else:
        _run_cluster(backend, max_jobs, job_range, logfile, cmd)


if __name__ == "__main__":
    main()
