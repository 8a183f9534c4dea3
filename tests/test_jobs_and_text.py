"""Job-layer and text-frontend tests."""

import os
import subprocess
import sys

import numpy as np
import pytest

from seq2seq_vc_tpu.text import (
    CharTokenizer,
    TextCleaner,
    TokenIDConverter,
    WordTokenizer,
    build_tokenizer,
)
from seq2seq_vc_tpu.text.cleaner import custom_english_cleaners

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_run_jobs_array(tmp_path):
    out = tmp_path / "shard.JOB.txt"
    log = tmp_path / "log.JOB.log"
    ret = subprocess.run(
        [sys.executable, f"{REPO}/utils/run_jobs.py", "JOB=1:3", str(log),
         f"echo shard JOB > {out}"],
        capture_output=True, text=True,
    )
    assert ret.returncode == 0, ret.stderr
    for i in (1, 2, 3):
        assert (tmp_path / f"shard.{i}.txt").read_text().strip() == f"shard {i}"
        assert (tmp_path / f"log.{i}.log").exists()


def test_run_jobs_propagates_failure(tmp_path):
    log = tmp_path / "f.JOB.log"
    ret = subprocess.run(
        [sys.executable, f"{REPO}/utils/run_jobs.py", "JOB=1:2", str(log),
         "test JOB -eq 1"],
        capture_output=True, text=True,
    )
    assert ret.returncode != 0
    assert "failed" in ret.stderr


def _fake_scheduler(tmp_path, name, task_var, array_flag_parser):
    """A stand-in sbatch/qsub on PATH: runs every array task locally with
    the scheduler's task-id env var set, returns nonzero if any fails —
    the contract run_jobs.py's cluster backends rely on."""
    bindir = tmp_path / "bin"
    bindir.mkdir(exist_ok=True)
    script = bindir / name
    script.write_text(
        "#!/usr/bin/env python3\n"
        "import os, subprocess, sys\n"
        "args = sys.argv[1:]\n"
        f"lo, hi = {array_flag_parser}\n"
        "path = args[-1]\n"
        "rc = 0\n"
        "for t in range(lo, hi + 1):\n"
        "    env = dict(os.environ)\n"
        f"    env['{task_var}'] = str(t)\n"
        "    r = subprocess.run(['bash', path], env=env).returncode\n"
        "    rc = rc or r\n"
        "sys.exit(rc)\n"
    )
    script.chmod(0o755)
    return bindir


def test_run_jobs_slurm_backend(tmp_path):
    """--backend slurm submits ONE sbatch --wait array job whose tasks
    substitute JOB from SLURM_ARRAY_TASK_ID (= slurm.pl semantics)."""
    import os

    bindir = _fake_scheduler(
        tmp_path, "sbatch", "SLURM_ARRAY_TASK_ID",
        "[int(x) for x in next(a for a in args if a.startswith('--array='))"
        ".split('=')[1].split('%')[0].split('-')]",
    )
    out = tmp_path / "shard.JOB.txt"
    log = tmp_path / "log.JOB.log"
    env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}")
    ret = subprocess.run(
        [sys.executable, f"{REPO}/utils/run_jobs.py", "--backend", "slurm",
         "JOB=1:3", str(log), f"echo shard JOB > {out}"],
        capture_output=True, text=True, env=env,
    )
    assert ret.returncode == 0, ret.stderr
    for i in (1, 2, 3):
        assert (tmp_path / f"shard.{i}.txt").read_text().strip() == f"shard {i}"
        assert (tmp_path / f"log.{i}.log").exists()


def test_run_jobs_sge_backend_and_failure(tmp_path):
    import os

    bindir = _fake_scheduler(
        tmp_path, "qsub", "SGE_TASK_ID",
        "[int(x) for x in args[args.index('-t') + 1].split('-')]",
    )
    log = tmp_path / "f.JOB.log"
    env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}",
               S2S_JOB_BACKEND="sge")
    ret = subprocess.run(
        [sys.executable, f"{REPO}/utils/run_jobs.py", "JOB=1:2", str(log),
         "test JOB -eq 1"],
        capture_output=True, text=True, env=env,
    )
    assert ret.returncode != 0
    assert "failed" in ret.stderr
    # shard 1 succeeded and its log recorded code 0
    assert "code 0" in (tmp_path / "f.1.log").read_text()
    assert "code 1" in (tmp_path / "f.2.log").read_text()


def test_run_jobs_cluster_backend_missing_cli(tmp_path):
    log = tmp_path / "x.log"
    ret = subprocess.run(
        [sys.executable, f"{REPO}/utils/run_jobs.py", "--backend", "slurm",
         str(log), "true"],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root"},
    )
    assert ret.returncode == 127
    assert "sbatch" in ret.stderr


def test_split_scp(tmp_path):
    scp = tmp_path / "wav.scp"
    scp.write_text("".join(f"utt{i} /x/{i}.wav\n" for i in range(7)))
    ret = subprocess.run(
        [sys.executable, f"{REPO}/utils/split_scp.py", "--n", "3",
         "--prefix", str(tmp_path / "shard"), str(scp)],
        capture_output=True, text=True,
    )
    assert ret.returncode == 0, ret.stderr
    sizes = [len((tmp_path / f"shard.{i}.scp").read_text().splitlines()) for i in (1, 2, 3)]
    assert sizes == [3, 2, 2]


def test_subset_and_combine(tmp_path):
    src = tmp_path / "data"
    os.makedirs(src)
    (src / "wav.scp").write_text("".join(f"u{i} /w/{i}.wav\n" for i in range(6)))
    (src / "text").write_text("".join(f"u{i} hello {i}\n" for i in range(6)))
    dst = tmp_path / "subset"
    subprocess.run(
        [sys.executable, f"{REPO}/utils/subset_data.py", str(src), str(dst),
         "--num-utts", "3"],
        check=True,
    )
    assert len((dst / "wav.scp").read_text().splitlines()) == 3
    assert len((dst / "text").read_text().splitlines()) == 3

    comb = tmp_path / "comb"
    subprocess.run(
        [sys.executable, f"{REPO}/utils/combine_data.py", str(comb), str(src), str(dst)],
        check=True,
    )
    assert len((comb / "wav.scp").read_text().splitlines()) == 6  # dedup


def test_parse_options(tmp_path):
    script = tmp_path / "s.sh"
    script.write_text(
        "#!/usr/bin/env bash\nset -e\nstage=0\nstop_stage=10\n"
        f". {REPO}/utils/parse_options.sh\n"
        'echo "$stage $stop_stage"\n'
    )
    script.chmod(0o755)
    out = subprocess.run(
        ["bash", str(script), "--stage", "3", "--stop-stage", "5"],
        capture_output=True, text=True,
    )
    assert out.stdout.strip() == "3 5", out.stderr
    bad = subprocess.run(
        ["bash", str(script), "--nope", "1"], capture_output=True, text=True
    )
    assert bad.returncode != 0


def test_char_tokenizer_roundtrip():
    tok = CharTokenizer()
    tokens = tok.text2tokens("AB C")
    assert tokens == ["A", "B", "<space>", "C"]
    assert tok.tokens2text(tokens) == "AB C"


def test_cleaner_tacotron():
    out = custom_english_cleaners("Dr. Smith bought 2 apples, Mr. Jones!")
    assert "DOCTOR SMITH" in out
    assert "TWO APPLES" in out
    assert "MISTER JONES" in out
    cleaner = TextCleaner("tacotron")
    assert cleaner("hello  world") == "HELLO WORLD"


def test_number_expansion():
    assert custom_english_cleaners("101") == "ONE HUNDRED ONE"
    assert custom_english_cleaners("1,250") == "ONE THOUSAND TWO HUNDRED FIFTY"


def test_token_id_converter():
    conv = TokenIDConverter(["<blank>", "<unk>", "A", "B", "<sos/eos>"])
    assert conv.tokens2ids(["A", "B", "Z"]) == [2, 3, 1]
    assert conv.ids2tokens([2, 3]) == ["A", "B"]
    assert conv.get_num_vocabulary_size() == 5


def test_build_tokenizer_word():
    tok = build_tokenizer("word")
    assert isinstance(tok, WordTokenizer)
    assert tok.text2tokens("a b c") == ["a", "b", "c"]


def test_parse_textgrid(tmp_path):
    """Praat long-format TextGrid -> kaldi segments (silence trim)."""
    import subprocess
    import sys

    tg = '''File type = "ooTextFile"
Object class = "TextGrid"

xmin = 0
xmax = 3.0
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 3.0
        intervals: size = 4
        intervals [1]:
            xmin = 0
            xmax = 0.35
            text = ""
        intervals [2]:
            xmin = 0.35
            xmax = 1.2
            text = "AH"
        intervals [3]:
            xmin = 1.2
            xmax = 2.5
            text = "K"
        intervals [4]:
            xmin = 2.5
            xmax = 3.0
            text = ""
'''
    (tmp_path / "arctic_a0001.TextGrid").write_text(tg)
    out = tmp_path / "segments"
    subprocess.run(
        [sys.executable, "utils/parse_textgrid.py",
         "--textgrid_dir", str(tmp_path), "--output", str(out)],
        check=True, cwd="/root/repo",
    )
    assert out.read_text().strip() == "arctic_a0001 arctic_a0001 0.35 2.5"
