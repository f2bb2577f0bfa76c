"""Flag-coherence preflights of the spark-submit job scripts.

Each refusal below must fire from the parsed flags alone, BEFORE a
SparkSession exists and before any stateful append/commit — the review
failure mode was a SystemExit at stage 3+ leaving committed state with
the metrics line never printed. These tests call main() with bad argv
and expect the refusal without ever spinning up a JVM (ingest_job's
richer preflights are covered in test_ingest_job.py).
"""

import importlib.util
import os
import sys

import pytest


def _load(name):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        f"{name}_under_test", os.path.join(here, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _expect_exit(monkeypatch, job, argv, match):
    monkeypatch.setattr(sys, "argv", ["job"] + argv)
    with pytest.raises(SystemExit, match=match):
        job.main()


def test_sketch_job_refuses_global_only_flags_per_group(monkeypatch):
    job = _load("sketch_job")
    base = ["--input", "x.parquet", "--col", "c", "--sketch", "hll"]
    _expect_exit(monkeypatch, job,
                 base + ["--group-by", "k", "--state-out", "/tmp/s.bin"],
                 "state-out is global-mode only")
    _expect_exit(monkeypatch, job,
                 base + ["--group-by", "k", "--checkpoint", "/tmp/ck"],
                 "checkpoint is global-mode only")
    _expect_exit(monkeypatch, job,
                 ["--input", "x.parquet", "--col", "c", "--sketch", "kll",
                  "--group-by", "k", "--quantiles", "0.9"],
                 "quantiles is global-mode only")


def test_incremental_job_preflights(monkeypatch):
    job = _load("incremental_job")
    base = ["--path", "/tmp/p", "--keys", "k", "--spec", "d=hll:c"]
    # --forget-refold without --forget-files would silently append
    _expect_exit(monkeypatch, job,
                 ["--source", "x"] + base + ["--forget-refold"],
                 "forget-refold only applies")
    # delta analytics need a theta spec; checkable before the session
    _expect_exit(monkeypatch, job,
                 ["--source", "x"] + base + ["--delta-from", "1"],
                 "at least one theta spec")
    # malformed spec string
    _expect_exit(monkeypatch, job,
                 ["--source", "x", "--path", "/tmp/p", "--keys", "k",
                  "--spec", "bad"],
                 "want name=kind")
    # exactly one of source/files/forget-files
    _expect_exit(monkeypatch, job, base,
                 "exactly one of")


def test_ann_serve_job_preflights(monkeypatch):
    job = _load("ann_serve_job")
    base = ["--store", "/tmp/st", "--queries", "q.parquet",
            "--out", "/tmp/o"]
    _expect_exit(monkeypatch, job, base + ["--batch-size", "-5"],
                 "batch-size must be positive")
    _expect_exit(monkeypatch, job, base + ["--batch-size", "0"],
                 "batch-size must be positive")
    _expect_exit(monkeypatch, job, base + ["--k", "0"],
                 "k must be positive")
    _expect_exit(monkeypatch, job, base + ["--rerank", "-1"],
                 "rerank must be")
