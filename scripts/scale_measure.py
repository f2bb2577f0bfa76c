#!/usr/bin/env python
"""Round-4 controlled scale measurements (healthy-window-gated).

Each task first waits for a healthy host-bandwidth window (the probe
discipline from bench.py / BASELINE.md: par8_ms <= 3000), then measures
with probe brackets so the sample carries its own evidence. One JSON line
per task is appended to --out.

  python scripts/scale_measure.py --task eval1e9  [--n 1000000000]
  python scripts/scale_measure.py --task ivffit   [--n 1000000] [--k 1000]
  python scripts/scale_measure.py --task dedup01
  python scripts/scale_measure.py --task ngramscale [--n 100000] --cores 2
  python scripts/scale_measure.py --task pqscale|opqscale|sq8scale|residualscale [--n 1000000]
  python scripts/scale_measure.py --task bpescale|dsirscale [--n 200000]
  python scripts/scale_measure.py --task incmphf|incdedup|semdedup [--gens 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import DEGRADED_PAR8_MS, host_probe_ms, wait_for_healthy_probe  # noqa: E402


def wait_healthy(max_wait_s: float, sleep_s: float = 240.0) -> dict:
    """Probe until healthy or the deadline (bench's canonical policy loop;
    a still-degraded sample proceeds but says so)."""
    r = wait_for_healthy_probe(sleep_s=sleep_s, max_wait_s=max_wait_s)
    return {
        "probe": r["probe"],
        "degraded": r["degraded"],
        "attempts_par8_ms": r["policy"]["attempts_par8_ms"],
        "waited_s": r["policy"]["waited_s"],
    }


def task_eval1e9(n: int, path: str, cores: int) -> dict:
    """Blocked build at n keys, then the full-bijection cogroup verify —
    the judge r3 #4 re-measure of the round-2 315.6 s verify with the
    round-3 Arrow walk (target <= ~180 s at 10^9 in a healthy window)."""
    import pyspark.sql.functions as F

    from recsplit_spark.blocked import BlockedMPHFBuilder
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-eval1e9", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    keys = spark.range(0, n, 1, cores * 8).select(F.xxhash64("id").alias("key"))

    probe_build = host_probe_ms()
    t0 = time.time()
    bm = BlockedMPHFBuilder(
        leaf_size=8,
        avg_bucket_size=128,
        block_log2=10,
        checkpoint_waves=4,
    ).build(keys, "key", path, n=n)
    build_s = time.time() - t0

    probe_before = host_probe_ms()
    t0 = time.time()
    # in-kernel per-block bijection check (same rationale as verify1e9):
    # the countDistinct verify re-shuffles all n evaluated indices into a
    # hash agg whose spill blew local disk at 10^9 (ENOSPC, 69 GB free)
    res = bm.verify_bijection(keys, "key")
    verify_s = time.time() - t0
    probe_after = host_probe_ms()
    assert res["ok"] and res["n_keys"] == n, res
    out = {
        "task": "eval1e9",
        "n": n,
        "build_sec": round(build_s, 1),
        "build_keys_per_sec": round(n / build_s, 1),
        "verify_sec": round(verify_s, 1),
        "verify_keys_per_sec": round(n / verify_s, 1),
        "bits_per_key": round(bm.bits_per_key, 4),
        "verified_bijection": True,
        "probe_build": probe_build,
        "probe_before_verify": probe_before,
        "probe_after_verify": probe_after,
        "cores": cores,
    }
    spark.stop()
    return out


def task_verify1e9(n: int, path: str, cores: int, reps: int = 2) -> dict:
    """Verify-only re-measure over an ALREADY-BUILT blocked function at
    ``path`` (the build survives on disk) — isolates the cogroup-eval
    timing from the 25-minute build so a healthy window can be used
    end-to-end, and repeats best-of-N per the measurement discipline."""
    import pyspark.sql.functions as F

    from recsplit_spark.blocked import BlockedMPHF
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-verify1e9", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    bm = BlockedMPHF.load(spark, path)
    keys = spark.range(0, n, 1, cores * 8).select(F.xxhash64("id").alias("key"))

    samples = []
    for _ in range(reps):
        pb = host_probe_ms()
        t0 = time.time()
        # in-kernel per-block bijection check: the countDistinct verify
        # re-shuffles all n evaluated indices into a hash agg whose spill
        # blew local disk at 10^9 (ENOSPC with 69 GB free); this path's
        # only exchange is the eval cogroup itself
        res = bm.verify_bijection(keys, "key")
        wall = time.time() - t0
        pa_ = host_probe_ms()
        assert res["ok"] and res["n_keys"] == n, res
        samples.append(
            {"verify_sec": round(wall, 1), "probe_before": pb, "probe_after": pa_}
        )
    best = min(s["verify_sec"] for s in samples)
    out = {
        "task": "verify1e9",
        "n": n,
        "verify_sec_best": best,
        "verify_keys_per_sec": round(n / best, 1),
        "verified_bijection": True,
        "samples": samples,
        "cores": cores,
    }
    spark.stop()
    return out


def task_ivffit(n: int, k: int, dim: int, cores: int) -> dict:
    """Distributed IVF fit wall time at n vectors (judge r3 #1 done
    criterion: a BASELINE.md row for distributed-fit at 10^6+ vectors).
    Vectors are generated deterministically executor-side (seeded per
    Arrow batch from the first id) — no driver materialization anywhere."""
    import numpy as np
    import pyarrow as pa

    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-ivffit", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def _gen(batches):
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 17)
            x = rng.standard_normal((len(ids), dim)).astype(np.float32)
            yield pa.record_batch(
                [pa.array(list(x), type=pa.list_(pa.float32()))],
                names=["embedding"],
            )

    vec = (
        spark.range(0, n, 1, cores * 2)
        .mapInArrow(_gen, schema="embedding array<float>")
        .persist()
    )
    n_rows = vec.count()
    probe_before = host_probe_ms()
    t0 = time.time()
    idx = IVFIndex(n_centroids=k, iters=5).fit(
        vec, "embedding", sample_size=n, mode="distributed"
    )
    fit_s = time.time() - t0
    probe_after = host_probe_ms()
    assert idx.centroids.shape == (k, dim)
    # index usability: assign a slice and count buckets
    t0 = time.time()
    nb = (
        idx.assign(vec.limit(100_000), "embedding")
        .select("centroid_id")
        .distinct()
        .count()
    )
    assign_s = time.time() - t0
    out = {
        "task": "ivffit",
        "n_vectors": n_rows,
        "dim": dim,
        "k": k,
        "iters": 5,
        "fit_sec": round(fit_s, 1),
        "assign_100k_sec": round(assign_s, 1),
        "buckets_touched_100k": nb,
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }
    vec.unpersist()
    spark.stop()
    return out


def task_ngramscale(n_docs: int, cores: int, ngram: int = 5) -> dict:
    """Tokens-axis sketch-scaling rung: one fused profile pass (HLL
    distinct n-grams + CMS n-gram frequencies, the north-rule sketch
    surface) over a deterministic ``sequences`` corpus. Run at two
    ``--cores`` values on the SAME corpus; the N->4N efficiency is
    (windows_per_sec_4N / windows_per_sec_N) / 4. Unlike the MPHF build
    ladder this path has NO row shuffle — one scan emitting per-partition
    states plus a states-only reduce — so it isolates the sketch
    pipeline's scaling from the build's exchange."""
    import pyspark.sql.functions as F

    from recsplit_spark.data import sequences
    from recsplit_spark.session import get_spark, ship_package
    from recsplit_spark.sketches import (
        CountMinSketch,
        HyperLogLog,
        SketchSpec,
        profile,
    )

    spark = get_spark(app_name=f"scale-ngram-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    df = sequences(spark, n_docs, partitions=max(cores * 2, 8)).persist()
    windows = int(
        df.select(
            F.sum(F.greatest(F.col("n_tok") - (ngram - 1), F.lit(0))).alias("w")
        ).collect()[0]["w"]
    )
    specs = [
        SketchSpec("grams", HyperLogLog(p=14), "tokens", ngram=ngram),
        SketchSpec(
            "freq", CountMinSketch(eps=0.0005, delta=0.01), "tokens", ngram=ngram
        ),
    ]
    samples = []
    for _ in range(2):  # best-of-2 per the measurement discipline
        pb = host_probe_ms()
        t0 = time.time()
        states = profile(df, specs)
        wall = time.time() - t0
        pa_ = host_probe_ms()
        hll_est = HyperLogLog(p=14).estimate(states["grams"])
        samples.append(
            {"wall_sec": round(wall, 1), "probe_before": pb, "probe_after": pa_}
        )
    best = min(s["wall_sec"] for s in samples)
    out = {
        "task": "ngramscale",
        "n_docs": n_docs,
        "ngram": ngram,
        "windows": windows,
        "profile_sec_best": best,
        "windows_per_sec": round(windows / best, 1),
        "hll_distinct_grams": round(hll_est, 1),
        "samples": samples,
        "cores": cores,
    }
    df.unpersist()
    spark.stop()
    return out


def task_smallrungs(n_keys: int, reps: int = 2) -> dict:
    """Healthy-window re-measure of the low-core scaling rungs (2 and 8
    cores, 16M-key MPHF build — bench's --scaling-child job). The round-4
    ladder's 2-core rung sat in a degraded window (136.0 s vs round-3's
    healthy 82.8 s), which made the reported 2->8 efficiency superlinear
    (1.52) — an honest sample needs both rungs probe-bracketed healthy.
    Each rep is accepted only if its before AND after probes are healthy;
    degraded reps are recorded but flagged."""
    import subprocess

    bench_py = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    points: dict[str, dict] = {}
    samples = []
    for cores in (2, 8):
        best = None
        clean_reps = 0
        attempts = 0
        while clean_reps < reps and attempts < reps * 3:
            attempts += 1
            before = host_probe_ms()
            out = subprocess.run(
                [sys.executable, bench_py, "--scaling-child",
                 "--cores", str(cores), "--n", str(n_keys)],
                capture_output=True, text=True, check=True,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            after = host_probe_ms()
            clean = (before["par8_ms"] <= DEGRADED_PAR8_MS
                     and after["par8_ms"] <= DEGRADED_PAR8_MS)
            samples.append({**r, "probe_before": before, "probe_after": after,
                            "bracket_clean": clean})
            if clean:
                clean_reps += 1
                if best is None or r["mphf_build_keys_per_sec"] > best["mphf_build_keys_per_sec"]:
                    best = {**r, "bracket_clean": True}
            else:
                # wait out the window before retrying
                wait_for_healthy_probe(sleep_s=180.0, max_wait_s=3600.0)
        if best is None:  # never caught a clean bracket: best-of-degraded
            best = max(
                (s for s in samples if s["cores"] == cores),
                key=lambda s: s["mphf_build_keys_per_sec"],
            )
            best = {k: best[k] for k in best if not k.startswith("probe")}
            best["bracket_clean"] = False
        points[str(cores)] = best
    r2, r8 = (points["2"]["mphf_build_keys_per_sec"],
              points["8"]["mphf_build_keys_per_sec"])
    return {
        "task": "smallrungs",
        "n_keys": n_keys,
        "efficiency_2_to_8": round((r8 / r2) / 4.0, 3),
        "points": points,
        "samples": samples,
    }


def task_dedup01(cores: int) -> dict:
    """dedup_corpus on sf0.1 documents under the NEW threshold-derived
    banding default (judge r3 #3 done criterion: re-measured row; round-3
    row was 41.5 s under recall-first r=2 banding)."""
    from recsplit_spark.pipeline.dedup import dedup_corpus
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-dedup01", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    n_docs = docs.count()
    probe_before = host_probe_ms()
    t0 = time.time()
    kept = dedup_corpus(docs, "doc_id", "text").count()
    derived_s = time.time() - t0
    t0 = time.time()
    kept_rf = dedup_corpus(docs, "doc_id", "text", num_hashes=64, bands=32).count()
    rf_s = time.time() - t0
    probe_after = host_probe_ms()
    out = {
        "task": "dedup01",
        "n_docs": n_docs,
        "kept_derived_banding": kept,
        "wall_derived_banding_sec": round(derived_s, 1),
        "kept_recall_first": kept_rf,
        "wall_recall_first_sec": round(rf_s, 1),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }
    spark.stop()
    return out


def task_incdedup(gens: int, cores: int) -> dict:
    """Incremental near-dedup at sf0.1: documents arrive as ``gens``
    id-ordered batches; each ``IncrementalDedup.append`` dedups the batch
    against the persisted kept-state (band + sig tables) plus itself —
    old text is never rescanned. Recorded against BOTH alternatives: the
    one-shot backfill (``dedup_corpus`` once over everything) and the
    naive nightly (re-running ``dedup_corpus`` over the full prefix per
    batch — the rescan cost incremental exists to delete). Default
    threshold-derived banding on all three, so the comparison is config-
    identical."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from recsplit_spark.pipeline.dedup import dedup_corpus
    from recsplit_spark.pipeline.incremental_dedup import IncrementalDedup
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-incdedup", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").cache()
    n_docs = docs.count()
    lo, hi = docs.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    cuts = [lo + (hi + 1 - lo) * i // gens for i in range(gens)] + [hi + 1]

    probe_before = host_probe_ms()
    t0 = time.time()
    oneshot = dedup_corpus(docs, "doc_id", "text")
    oneshot_kept = sorted(r["doc_id"] for r in oneshot.select("doc_id").collect())
    oneshot_s = time.time() - t0

    appends = []
    tmp = tempfile.mkdtemp(dir="/root/repo/.scale_tmp")
    try:
        inc = IncrementalDedup(f"{tmp}/dd", threshold=0.8)
        t_inc = time.time()
        for i in range(gens):
            b = docs.filter(
                (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
            )
            _, m = inc.append(b, "doc_id", "text")
            appends.append(
                {"gen": m["gen"], "n_in": m["n_in"], "n_kept": m["n_kept"],
                 "n_matched_old": m["n_matched_old"],
                 "wall_s": round(m["wall_s"], 1)}
            )
        inc_total_s = time.time() - t_inc
        inc_kept = sorted(r["id"] for r in inc.kept_ids(spark).collect())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    naive_s = []
    for i in range(gens):  # the nightly rescan this module replaces
        prefix = docs.filter(F.col("doc_id") < cuts[i + 1])
        t0 = time.time()
        dedup_corpus(prefix, "doc_id", "text").count()
        naive_s.append(round(time.time() - t0, 1))
    probe_after = host_probe_ms()

    out = {
        "task": "incdedup",
        "n_docs": n_docs,
        "gens": gens,
        "appends": appends,
        "incremental_total_sec": round(inc_total_s, 1),
        "incremental_kept": len(inc_kept),
        "oneshot_sec": round(oneshot_s, 1),
        "oneshot_kept": len(oneshot_kept),
        "kept_sets_equal": inc_kept == oneshot_kept,
        "naive_prefix_rescan_sec": naive_s,
        "naive_total_sec": round(sum(naive_s), 1),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }
    spark.stop()
    return out


def task_incdedup_tokens(n_docs: int, gens: int, cores: int) -> dict:
    """Incremental-dedup COST crossover on the token payload: ``n_docs``
    deterministic sequences (mostly unique — the honest worst case for
    state growth, since nearly everything is kept) arrive as ``gens``
    hash-partitioned batches. Incremental total (one signature pass per
    batch + state joins) vs the naive nightly (token_dedup_corpus re-run
    over the FULL prefix per batch — O(G*N) doc scans vs incremental's
    O(N)); at 1000-doc batches (task incdedup) the per-append fixed cost
    hides this, at 50k-doc batches the rescan volume dominates."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from recsplit_spark.data import sequences
    from recsplit_spark.pipeline.dedup import token_dedup_corpus
    from recsplit_spark.pipeline.incremental_dedup import IncrementalDedup
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-incdedup-tok", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    df = (
        sequences(spark, n_docs, partitions=max(cores * 2, 8))
        .withColumn("id", F.xxhash64("doc_id"))
        .withColumn("part", F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(gens)))
        .persist()
    )
    df.count()

    probe_before = host_probe_ms()
    appends = []
    tmp = tempfile.mkdtemp(dir="/root/repo/.scale_tmp")
    try:
        inc = IncrementalDedup(f"{tmp}/dd", threshold=0.8, mode="tokens")
        t_inc = time.time()
        for i in range(gens):
            _, m = inc.append(
                df.filter(F.col("part") == i), "id", "tokens"
            )
            appends.append(
                {"gen": m["gen"], "n_in": m["n_in"], "n_kept": m["n_kept"],
                 "wall_s": round(m["wall_s"], 1)}
            )
        inc_total_s = time.time() - t_inc
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    naive_s = []
    for i in range(gens):
        prefix = df.filter(F.col("part") <= i)
        t0 = time.time()
        token_dedup_corpus(prefix, "id", "tokens").count()
        naive_s.append(round(time.time() - t0, 1))
    probe_after = host_probe_ms()
    df.unpersist()

    out = {
        "task": "incdedup_tokens",
        "n_docs": n_docs,
        "gens": gens,
        "appends": appends,
        "incremental_total_sec": round(inc_total_s, 1),
        "naive_prefix_rescan_sec": naive_s,
        "naive_total_sec": round(sum(naive_s), 1),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }
    spark.stop()
    return out


def task_semdedup(n_vec: int, gens: int, cores: int, dim: int = 64) -> dict:
    """Semantic dedup at scale: ``n_vec`` synthetic vectors (5% planted
    near-dups of earlier vectors, the rest gaussian) arrive as ``gens``
    batches through ``IncrementalANN.append_dedup`` at the IVF operating
    point k=sqrt(n). Records per-append wall + detected dup counts; the
    comparison point is the brute-force bill this replaces (each batch
    vector against every kept vector = O(n^2/gens) cosines per batch vs
    the store's ~probes/k partition-pruned scan)."""
    import shutil
    import tempfile

    import numpy as np
    import pyarrow as pa

    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.incremental_ann import IncrementalANN
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-semdedup", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def _gen(batches):
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 31)
            x = rng.standard_normal((len(ids), dim)).astype(np.float32)
            # 5% planted near-dups: copy an earlier id's vector + noise
            dup = ids % 20 == 7
            src = (ids[dup] * 7) % np.maximum(ids[dup], 1)
            for row, s in zip(np.flatnonzero(dup), src):
                r2 = np.random.default_rng(int(s) + 31_000_000)
                x[row] = r2.standard_normal(dim).astype(np.float32)
                x[row] += 0.01 * rng.standard_normal(dim).astype(np.float32)
            yield pa.record_batch(
                [b.column(0),
                 pa.array(list(x), type=pa.list_(pa.float32()))],
                names=["vec_id", "embedding"],
            )

    vec = (
        spark.range(0, n_vec, 1, cores * 2)
        .mapInArrow(_gen, schema="vec_id long, embedding array<float>")
        .persist()
    )
    vec.count()
    k = max(64, int(n_vec ** 0.5))
    probe_before = host_probe_ms()
    t0 = time.time()
    idx = IVFIndex(n_centroids=k, nprobe=4, iters=5).fit(
        vec, "embedding", sample_size=min(n_vec, 40 * k), mode="auto"
    )
    fit_s = time.time() - t0

    import pyspark.sql.functions as F

    appends = []
    tmp = tempfile.mkdtemp(dir="/root/repo/.scale_tmp")
    try:
        store = IncrementalANN(f"{tmp}/sd", index=idx)
        t_all = time.time()
        for i in range(gens):
            lo = n_vec * i // gens
            hi = n_vec * (i + 1) // gens
            _, m = store.append_dedup(
                vec.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
                "vec_id", "embedding", threshold=0.9,
            )
            appends.append(
                {"gen": m["gen"], "n_in": m["n_in"], "n_kept": m["n_kept"],
                 "n_matched_old": m["n_matched_old"],
                 "wall_s": round(m["wall_s"], 1)}
            )
        total_s = time.time() - t_all
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    probe_after = host_probe_ms()
    vec.unpersist()
    out = {
        "task": "semdedup",
        "n_vectors": n_vec,
        "dim": dim,
        "k": k,
        "gens": gens,
        "fit_sec": round(fit_s, 1),
        "appends": appends,
        "dedup_total_sec": round(total_s, 1),
        "vectors_per_sec": round(n_vec / total_s, 1),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }
    spark.stop()
    return out


def task_incmphf(n_per_gen: int, gens: int, cores: int, reps: int = 2) -> dict:
    """Generational MPHF at scale: ``gens`` appends of ``n_per_gen``
    string keys each, then best-of-N route (unknown generation:
    fingerprint probe + exception join) and generation-aware evaluate
    over the full union. Also records the cross-generation exception
    counts vs their 2^-fp_bits expectation and the end-state bits/key."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from recsplit_spark.incremental_mphf import IncrementalMPHF
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-incmphf", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def batch(g):
        return spark.range(
            g * n_per_gen, (g + 1) * n_per_gen, 1, cores * 4
        ).select(F.concat(F.lit("doc-"), F.col("id")).alias("k"))

    tmp = tempfile.mkdtemp(prefix="incmphf_")
    try:
        inc = IncrementalMPHF(f"{tmp}/inc")
        appends = []
        probe_before = host_probe_ms()
        for g in range(gens):
            m = inc.append(batch(g), "k")
            appends.append(
                {
                    "gen": m["gen"],
                    "n": m["n"],
                    "wall_s": round(m["wall_s"], 2),
                    "n_exceptions": m["n_exceptions"],
                    "expected_fp": round(m["expected_fp"], 1),
                }
            )
        union = None
        for g in range(gens):
            t = batch(g).withColumn("g", F.lit(g))
            union = t if union is None else union.unionByName(t)
        union = union.cache()
        n_total = union.count()

        route_walls, eval_walls = [], []
        for _ in range(reps):
            t0 = time.time()
            n_null = (
                inc.route(union, "k")
                .filter("mphf_index IS NULL")
                .count()
            )
            route_walls.append(time.time() - t0)
            assert n_null == 0, n_null
            t0 = time.time()
            n_null = (
                inc.evaluate(union, "k", "g")
                .filter("mphf_index IS NULL")
                .count()
            )
            eval_walls.append(time.time() - t0)
            assert n_null == 0, n_null
        v = inc.verify_bijection(union, "k", "g")
        probe_after = host_probe_ms()
        assert v["ok"], v
        out = {
            "task": "incmphf",
            "n_per_gen": n_per_gen,
            "gens": gens,
            "n_total": n_total,
            "appends": appends,
            "route_sec_best": round(min(route_walls), 2),
            "route_keys_per_sec": round(n_total / min(route_walls), 1),
            "eval_sec_best": round(min(eval_walls), 2),
            "eval_keys_per_sec": round(n_total / min(eval_walls), 1),
            "bits_per_key": round(inc.bits_per_key(spark), 4),
            "verified_bijection": True,
            "probe_before": probe_before,
            "probe_after": probe_after,
            "cores": cores,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return out


def task_incmphf_compact(n_per_gen: int, gens: int, cores: int,
                         reps: int = 2) -> dict:
    """Compaction at scale: build ``gens`` generations, then time the
    planned re-key — ``compact()`` (validation scan + one distributed
    rebuild of the whole universe) plus remap materialization — and
    contrast unknown-generation route throughput before (``gens`` filter
    probes + exception join) vs after (single probe, no exceptions)."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from recsplit_spark.incremental_mphf import IncrementalMPHF
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-incmphf-compact", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def batch(g):
        return spark.range(
            g * n_per_gen, (g + 1) * n_per_gen, 1, cores * 4
        ).select(F.concat(F.lit("doc-"), F.col("id")).alias("k"))

    tmp = tempfile.mkdtemp(prefix="incmphf_compact_")
    try:
        inc = IncrementalMPHF(f"{tmp}/inc")
        for g in range(gens):
            inc.append(batch(g), "k")
        union = None
        for g in range(gens):
            t = batch(g).withColumn("g", F.lit(g))
            union = t if union is None else union.unionByName(t)
        union = union.cache()
        n_total = union.count()

        probe_before = host_probe_ms()

        def best_route(handle):
            walls = []
            for _ in range(reps):
                t0 = time.time()
                n_null = (
                    handle.route(union, "k")
                    .filter("mphf_index IS NULL")
                    .count()
                )
                walls.append(time.time() - t0)
                assert n_null == 0, n_null
            return min(walls)

        route_old = best_route(inc)

        t0 = time.time()
        new, remap = inc.compact(union, "k", f"{tmp}/compacted", gen_col="g")
        n_remap = remap.count()
        compact_s = time.time() - t0
        assert n_remap == n_total, (n_remap, n_total)

        route_new = best_route(new)
        v = new.verify_bijection(union.withColumn("g", F.lit(0)), "k", "g")
        probe_after = host_probe_ms()
        assert v["ok"], v
        out = {
            "task": "incmphf_compact",
            "n_per_gen": n_per_gen,
            "gens": gens,
            "n_total": n_total,
            "compact_sec": round(compact_s, 2),
            "compact_keys_per_sec": round(n_total / compact_s, 1),
            "route_gens_sec_best": round(route_old, 2),
            "route_compacted_sec_best": round(route_new, 2),
            "route_speedup": round(route_old / route_new, 2),
            "bits_per_key_before": round(inc.bits_per_key(spark), 4),
            "bits_per_key_after": round(new.bits_per_key(spark), 4),
            "n_exceptions_after": sum(
                g["n_exceptions"] for g in new.generations(spark)
            ),
            "verified_bijection": True,
            "probe_before": probe_before,
            "probe_after": probe_after,
            "cores": cores,
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()
    return out


def _clustered_vec_df(spark, n_vec: int, cores: int, dim: int):
    """Deterministic clustered vectors (256 seed directions + batch-seeded
    noise), generated executor-side — the SHARED ANN-codec fixture, so
    the pqscale / residualscale / sq8scale rows are comparable by
    construction (one definition, not three copies)."""
    import numpy as np
    import pyarrow as pa

    def _gen(batches):
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 11)
            cid = ids % 256
            cents = np.random.default_rng(5).standard_normal((256, dim))
            x = (cents[cid] + 0.3 * rng.standard_normal((len(ids), dim))).astype(
                np.float32
            )
            flat = pa.array(x.reshape(-1), type=pa.float32())
            offs = pa.array(
                np.arange(0, (len(ids) + 1) * dim, dim, dtype=np.int32)
            )
            yield pa.record_batch(
                [b.column(0), pa.ListArray.from_arrays(offs, flat)],
                names=["vec_id", "embedding"],
            )

    return spark.range(0, n_vec, 1, cores * 2).mapInArrow(
        _gen, schema="vec_id long, embedding array<float>"
    )


def task_pqscale(n_vec: int, cores: int, dim: int = 64, m: int = 8,
                 ks: int = 256, reps: int = 2) -> dict:
    """PQ codec at scale: fit on a 20k-vector gather, then the two scans
    that matter at 10^12 vectors — encode (float read -> byte codes) and
    ADC search (byte read -> scores -> top-k). Best-of-``reps``; the
    comparison point is the exact brute-force cosine scan over the same
    vectors (what the byte scan replaces)."""
    import numpy as np
    import pyarrow as pa
    import pyspark.sql.functions as F

    from recsplit_spark.pipeline.ann import brute_force_topk
    from recsplit_spark.pipeline.pq import PQCodec
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-pq", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    vec = _clustered_vec_df(spark, n_vec, cores, dim).persist()
    vec.count()
    probe_before = host_probe_ms()
    t0 = time.time()
    codec = PQCodec(m=m, ks=ks, seed=7).fit(vec, "embedding")
    fit_s = time.time() - t0
    enc_best = adc_best = bf_best = float("inf")
    enc = codec.encode(vec, "embedding").persist()
    for _ in range(reps):
        t0 = time.time()
        codec.encode(vec, "embedding").agg(
            F.sum(F.length("pq_code"))
        ).collect()
        enc_best = min(enc_best, time.time() - t0)
    enc.count()  # materialize the persisted codes for the ADC reps
    q = np.random.default_rng(5).standard_normal(dim)
    for _ in range(reps):
        t0 = time.time()
        codec.search(enc, q, k=10).collect()
        adc_best = min(adc_best, time.time() - t0)
        t0 = time.time()
        brute_force_topk(vec, "embedding", q, 10).collect()
        bf_best = min(bf_best, time.time() - t0)
    # serving shape: 64 queries amortized over ONE scan (search_many)
    q64 = np.random.default_rng(6).standard_normal((64, dim))
    many_best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        codec.search_many(enc, list(q64), k=10).collect()
        many_best = min(many_best, time.time() - t0)
    probe_after = host_probe_ms()
    enc.unpersist()
    vec.unpersist()
    spark.stop()
    return {
        "task": "pqscale",
        "n_vec": n_vec,
        "dim": dim,
        "m": m,
        "ks": ks,
        "compression_x": dim * 4 / m,
        "fit_sec": round(fit_s, 2),
        "encode_sec_best": round(enc_best, 2),
        "encode_vecs_per_sec": round(n_vec / enc_best, 1),
        "adc_search_sec_best": round(adc_best, 2),
        "bruteforce_search_sec_best": round(bf_best, 2),
        "adc_vs_bruteforce": round(bf_best / adc_best, 2),
        "search_many_64q_sec_best": round(many_best, 2),
        "search_many_ms_per_query": round(many_best / 64 * 1000, 2),
        "batch_amortization_x": round(adc_best * 64 / many_best, 1),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }


def task_residualscale(n_vec: int, cores: int, dim: int = 64, m: int = 8,
                       ks: int = 256, n_cent: int = 256, nprobe: int = 16,
                       reps: int = 2) -> dict:
    """Residual vs raw PQ at scale on CLUSTERED vectors (the regime
    residual encoding exists for): same (m, ks) byte budget, same IVF
    funnel (nprobe/n_cent pruning), measuring (a) the assign+encode
    ingest scan, (b) ADC error vs exact cosine for both codecs over a
    sampled subset, (c) recall@10 vs brute force through the identical
    funnel, (d) the batched 64-query serving scan."""
    import numpy as np
    import pyarrow as pa
    import pyspark.sql.functions as F

    from recsplit_spark.pipeline.ann import (
        IVFIndex,
        _cosine_expr,
        brute_force_topk,
    )
    from recsplit_spark.pipeline.pq import (
        PQCodec,
        ResidualPQ,
        ivfadc_search,
        ivfadc_search_many,
    )
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-residual", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    vec = _clustered_vec_df(spark, n_vec, cores, dim).persist()
    vec.count()
    probe_before = host_probe_ms()
    t0 = time.time()
    idx = IVFIndex(n_centroids=n_cent, nprobe=nprobe, seed=7).fit(
        vec, "embedding"
    )
    res = ResidualPQ(idx, m=m, ks=ks, seed=7).fit(vec, "embedding")
    raw = PQCodec(m=m, ks=ks, seed=7).fit(vec, "embedding")
    fit_s = time.time() - t0

    # the ingest scan: assign + residual-encode in one pass
    ingest_best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        res.encode(idx.assign(vec, "embedding"), "embedding").agg(
            F.sum(F.length("pq_code"))
        ).collect()
        ingest_best = min(ingest_best, time.time() - t0)
    enc = raw.encode(
        res.encode(idx.assign(vec, "embedding"), "embedding"),
        "embedding",
        out_col="raw_code",
    ).persist()
    enc.count()

    # ADC error vs exact cosine, sampled subset (one scan per query)
    q = np.random.default_rng(5).standard_normal(dim)
    sub = enc.filter(F.col("vec_id") % 97 == 0)
    errs = (
        res.score(raw.score(sub, q, code_col="raw_code", out_col="raw_score"), q)
        .withColumn("cosine", _cosine_expr("embedding", q))
        .agg(
            F.avg(F.abs(F.col("pq_score") - F.col("cosine"))).alias("res"),
            F.avg(F.abs(F.col("raw_score") - F.col("cosine"))).alias("raw"),
        )
        .collect()[0]
    )

    # recall@10 through the identical rerank funnel (the serving config:
    # k*8 ADC candidates refined by exact cosine), queries drawn from the
    # corpus itself — a random off-manifold direction's true top-10 is
    # tail noise spread across many buckets, which measures the fixture,
    # not the codec. Single-query ADC latency timed on the rerank=0 leg.
    # NOTE on recall@10 here: every cluster holds ~n_vec/256 members at
    # near-identical cosine to a member query (spread << the 8-byte
    # codec's resolution), so exact-neighbor recall measures tie-breaking
    # among ~4k near-duplicates — intrinsically ~rerank_width/cluster_size
    # for ANY 32x-compressed codec. same_cluster_frac is the metric that
    # matters in this regime: does the funnel land in the right cluster.
    hits_res = hits_raw = total = 0
    same_res = same_raw = 0
    adc_best = float("inf")
    raw_enc = enc.drop("pq_code").withColumnRenamed("raw_code", "pq_code")
    for qid in (3, 50_000, n_vec - 7):
        qq = np.array(
            vec.filter(F.col("vec_id") == qid)
            .select("embedding")
            .collect()[0][0],
            dtype=np.float64,
        )
        exact = {
            r["vec_id"]
            for r in brute_force_topk(vec, "embedding", qq, 10).collect()
        }
        t0 = time.time()
        ivfadc_search(idx, res, enc, qq, k=10).collect()
        adc_best = min(adc_best, time.time() - t0)
        got_res = {
            r["vec_id"]
            for r in ivfadc_search(
                idx, res, enc, qq, k=10, rerank=8,
                vec_col="embedding", id_col="vec_id",
            ).collect()
        }
        got_raw = {
            r["vec_id"]
            for r in ivfadc_search(
                idx, raw, raw_enc, qq, k=10, rerank=8,
                vec_col="embedding", id_col="vec_id",
            ).collect()
        }
        hits_res += len(exact & got_res)
        hits_raw += len(exact & got_raw)
        same_res += sum(1 for v in got_res if v % 256 == qid % 256)
        same_raw += sum(1 for v in got_raw if v % 256 == qid % 256)
        total += 10

    # batched serving: 64 queries in one union-probe scan
    q64 = list(np.random.default_rng(6).standard_normal((64, dim)))
    many_best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        ivfadc_search_many(idx, res, enc, q64, k=10).collect()
        many_best = min(many_best, time.time() - t0)
    probe_after = host_probe_ms()
    enc.unpersist()
    vec.unpersist()
    spark.stop()
    return {
        "task": "residualscale",
        "n_vec": n_vec,
        "dim": dim,
        "m": m,
        "ks": ks,
        "n_centroids": n_cent,
        "nprobe": nprobe,
        "fit_sec": round(fit_s, 2),
        "ingest_sec_best": round(ingest_best, 2),
        "ingest_vecs_per_sec": round(n_vec / ingest_best, 1),
        "adc_mae_residual": round(float(errs["res"]), 5),
        "adc_mae_raw": round(float(errs["raw"]), 5),
        "mae_ratio_raw_over_residual": round(
            float(errs["raw"]) / max(float(errs["res"]), 1e-12), 2
        ),
        "recall10_residual": round(hits_res / total, 3),
        "recall10_raw": round(hits_raw / total, 3),
        "same_cluster_frac_residual": round(same_res / total, 3),
        "same_cluster_frac_raw": round(same_raw / total, 3),
        "ivfadc_search_sec_best": round(adc_best, 2),
        "search_many_64q_sec_best": round(many_best, 2),
        "search_many_ms_per_query": round(many_best / 64 * 1000, 2),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }


def task_opqscale(n_vec: int, cores: int, dim: int = 64, m: int = 8,
                  ks: int = 256, reps: int = 2) -> dict:
    """OPQ vs raw PQ at scale on ANISOTROPIC vectors (geometric variance
    ladder + a fixed dense mixing rotation — the regime the learned
    rotation exists for): fit both at the same (m, ks) byte budget,
    measure the rotate+encode scan and the ADC error of each against
    the exact cosine over a sampled subset."""
    import numpy as np
    import pyarrow as pa
    import pyspark.sql.functions as F

    from recsplit_spark.pipeline.ann import _cosine_expr
    from recsplit_spark.pipeline.pq import OPQCodec, PQCodec
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-opq", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def _gen(batches):
        scales = 2.0 ** (-np.arange(dim) / 4.0)
        mix, _ = np.linalg.qr(
            np.random.default_rng(9).standard_normal((dim, dim))
        )
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 11)
            x = (
                (rng.standard_normal((len(ids), dim)) * scales) @ mix
            ).astype(np.float32)
            flat = pa.array(x.reshape(-1), type=pa.float32())
            offs = pa.array(
                np.arange(0, (len(ids) + 1) * dim, dim, dtype=np.int32)
            )
            yield pa.record_batch(
                [b.column(0), pa.ListArray.from_arrays(offs, flat)],
                names=["vec_id", "embedding"],
            )

    vec = (
        spark.range(0, n_vec, 1, cores * 2)
        .mapInArrow(_gen, schema="vec_id long, embedding array<float>")
        .persist()
    )
    vec.count()
    probe_before = host_probe_ms()
    t0 = time.time()
    opq = OPQCodec(m=m, ks=ks, seed=7).fit(vec, "embedding")
    raw = PQCodec(m=m, ks=ks, seed=7).fit(vec, "embedding")
    fit_s = time.time() - t0
    enc_best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        opq.encode(vec, "embedding").agg(
            F.sum(F.length("pq_code"))
        ).collect()
        enc_best = min(enc_best, time.time() - t0)
    enc = opq.encode(
        raw.encode(vec, "embedding", out_col="raw_code"), "embedding"
    ).persist()
    enc.count()
    q = np.random.default_rng(5).standard_normal(dim)
    errs = (
        opq.score(raw.score(
            enc.filter(F.col("vec_id") % 97 == 0),
            q, code_col="raw_code", out_col="raw_score",
        ), q)
        .withColumn("cosine", _cosine_expr("embedding", q))
        .agg(
            F.avg(F.abs(F.col("pq_score") - F.col("cosine"))).alias("o"),
            F.avg(F.abs(F.col("raw_score") - F.col("cosine"))).alias("r"),
        )
        .collect()[0]
    )
    probe_after = host_probe_ms()
    enc.unpersist()
    vec.unpersist()
    spark.stop()
    return {
        "task": "opqscale",
        "n_vec": n_vec,
        "dim": dim,
        "m": m,
        "ks": ks,
        "fit_sec": round(fit_s, 2),
        "encode_sec_best": round(enc_best, 2),
        "encode_vecs_per_sec": round(n_vec / enc_best, 1),
        "adc_mae_opq": round(float(errs["o"]), 5),
        "adc_mae_raw": round(float(errs["r"]), 5),
        "mae_ratio_raw_over_opq": round(
            float(errs["r"]) / max(float(errs["o"]), 1e-12), 2
        ),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }


def task_sq8scale(n_vec: int, cores: int, dim: int = 64,
                  reps: int = 2) -> dict:
    """SQ8 at scale: the 4x/near-exact codec point — encode scan
    throughput (the O(n*d) affine-rounding kernel vs PQ's O(n*d*ks)
    argmin), ADC top-10 latency vs brute force, and the worst-case
    ADC-vs-exact-cosine error over a sampled subset."""
    import numpy as np
    import pyarrow as pa
    import pyspark.sql.functions as F

    from recsplit_spark.pipeline.ann import _cosine_expr, brute_force_topk
    from recsplit_spark.pipeline.pq import SQ8Codec
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-sq8", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    vec = _clustered_vec_df(spark, n_vec, cores, dim).persist()
    vec.count()
    probe_before = host_probe_ms()
    t0 = time.time()
    sq = SQ8Codec(seed=7).fit(vec, "embedding")
    fit_s = time.time() - t0
    enc_best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        sq.encode(vec, "embedding").agg(
            F.sum(F.length("pq_code"))
        ).collect()
        enc_best = min(enc_best, time.time() - t0)
    enc = sq.encode(vec, "embedding").persist()
    enc.count()
    q = np.random.default_rng(5).standard_normal(dim)
    adc_best = bf_best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        sq.search(enc, q, k=10).collect()
        adc_best = min(adc_best, time.time() - t0)
        t0 = time.time()
        brute_force_topk(vec, "embedding", q, 10).collect()
        bf_best = min(bf_best, time.time() - t0)
    max_err = float(
        sq.score(enc.filter(F.col("vec_id") % 97 == 0), q)
        .withColumn("cosine", _cosine_expr("embedding", q))
        .agg(F.max(F.abs(F.col("pq_score") - F.col("cosine"))))
        .collect()[0][0]
    )
    probe_after = host_probe_ms()
    enc.unpersist()
    vec.unpersist()
    spark.stop()
    return {
        "task": "sq8scale",
        "n_vec": n_vec,
        "dim": dim,
        "compression_x": 4.0,
        "fit_sec": round(fit_s, 2),
        "encode_sec_best": round(enc_best, 2),
        "encode_vecs_per_sec": round(n_vec / enc_best, 1),
        "adc_search_sec_best": round(adc_best, 2),
        "bruteforce_search_sec_best": round(bf_best, 2),
        "adc_vs_bruteforce": round(bf_best / adc_best, 2),
        "adc_max_abs_err_sampled": round(max_err, 5),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }


def task_dsirscale(n_docs: int, cores: int, buckets: int = 65_536,
                   n: int = 2, reps: int = 2) -> dict:
    """DSIR at scale over the deterministic sequences table: histogram
    scan (mapInArrow bincount partials + B-row reduce) and the
    zero-shuffle scoring scan, reported in windows/s."""
    import pyspark.sql.functions as F

    from recsplit_spark.data import sequences
    from recsplit_spark.pipeline import dsir
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-dsir", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    seq = sequences(spark, n_docs, partitions=cores * 2).persist()
    win = F.sum(F.greatest(F.size("tokens") - (n - 1), F.lit(0)))
    n_windows = seq.agg(win).collect()[0][0]
    marked = F.pmod(F.xxhash64(F.lit(2), F.col("doc_id")), F.lit(5)) == 0
    n_marked_w = seq.filter(marked).agg(win).collect()[0][0]
    probe_before = host_probe_ms()
    hist_best = score_best = float("inf")
    lr = None
    for _ in range(reps):
        t0 = time.time()
        tc = dsir.hashed_window_counts(
            seq.filter(marked), "tokens", buckets=buckets, n=n
        )
        rc = dsir.hashed_window_counts(seq, "tokens", buckets=buckets, n=n)
        lr = dsir.feature_logratio_micro(tc, rc, buckets=buckets)
        hist_best = min(hist_best, time.time() - t0)
    for _ in range(reps):
        t0 = time.time()
        dsir.importance_scores(seq, "tokens", lr, n=n).agg(
            F.sum("dsir_score_micro")
        ).collect()
        score_best = min(score_best, time.time() - t0)
    probe_after = host_probe_ms()
    seq.unpersist()
    spark.stop()
    return {
        "task": "dsirscale",
        "n_docs": n_docs,
        "n_windows": int(n_windows),
        "buckets": buckets,
        "ngram": n,
        "hist_sec_best": round(hist_best, 2),
        # the two histogram scans touch raw + marked-slice windows
        "hist_windows_per_sec": round((n_windows + n_marked_w) / hist_best, 1),
        "score_sec_best": round(score_best, 2),
        "score_windows_per_sec": round(n_windows / score_best, 1),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }


def task_bpescale(n_docs: int, cores: int, vocab_size: int = 1024,
                  n_words: int = 10_000, reps: int = 2) -> dict:
    """BPE at scale: zipf-sampled synthetic corpus over a ``n_words``
    vocabulary (realistic distinct-pre-token count), measuring the three
    cost centers separately — the word-count shuffle, the driver merge
    loop (corpus-size-independent), and the encode scan (MB/s is the
    100 TB-relevant number)."""
    import numpy as np
    import pyarrow as pa
    import pyspark.sql.functions as F

    from recsplit_spark.pipeline.bpe import BPETokenizer
    from recsplit_spark.pipeline.text import BPE_TOKEN_PATTERN
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-bpe", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    # vocabulary: letter n-grams with zipf-ish lengths, deterministic
    vrng = np.random.default_rng(3)
    letters = np.array(list("etaoinshrdlcum"))
    vocab = [
        "".join(vrng.choice(letters, size=int(ln)))
        for ln in np.clip(vrng.zipf(1.7, n_words), 2, 12)
    ]

    def _gen(batches):
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            out = []
            for i in ids:
                rng = np.random.default_rng(int(i) + 17)
                w = rng.zipf(1.3, 200) % n_words
                out.append(" ".join(vocab[j] for j in w))
            yield pa.record_batch(
                [b.column(0), pa.array(out, type=pa.string())],
                names=["doc_id", "text"],
            )

    docs = (
        spark.range(0, n_docs, 1, cores * 2)
        .mapInArrow(_gen, schema="doc_id long, text string")
        .persist()
    )
    n_bytes = docs.agg(F.sum(F.octet_length("text"))).collect()[0][0]
    probe_before = host_probe_ms()

    # word-count leg alone (the only corpus-scale training cost)
    wc_best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_PATTERN), 0)
            ).alias("w")
        ).groupBy("w").agg(F.count("*")).count()
        wc_best = min(wc_best, time.time() - t0)

    t0 = time.time()
    tok = BPETokenizer.train(docs, "text", vocab_size=vocab_size)
    train_s = time.time() - t0

    enc_best = float("inf")
    n_tokens = 0
    for _ in range(reps):
        t0 = time.time()
        n_tokens = tok.encode(docs, "text").agg(
            F.sum(F.size("tokens"))
        ).collect()[0][0]
        enc_best = min(enc_best, time.time() - t0)
    probe_after = host_probe_ms()
    docs.unpersist()
    spark.stop()
    return {
        "task": "bpescale",
        "n_docs": n_docs,
        "corpus_mb": round(n_bytes / 1e6, 1),
        "vocab_size": int(tok.vocab_size),
        "n_merges": int(len(tok.merges)),
        "wordcount_sec_best": round(wc_best, 2),
        "train_sec": round(train_s, 2),
        "merge_loop_sec": round(train_s - wc_best, 2),
        "encode_sec_best": round(enc_best, 2),
        "n_tokens": int(n_tokens),
        "encode_mb_per_sec": round(n_bytes / 1e6 / enc_best, 1),
        "encode_tokens_per_sec": round(n_tokens / enc_best, 1),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }


def task_shardscale(n_docs: int, cores: int, n_shards: int = 64,
                    reps: int = 2) -> dict:
    """Training-shard output + epoch ordering at scale over the
    deterministic sequences table (~1 KB/row of int32 tokens):
    value-defined shard write (one exchange + hive-partitioned
    parquet), the GLOBAL epoch permutation (the range-sort shuffle —
    noop sink so Catalyst can't drop the sort), and the zero-exchange
    shard-scope permutation over the shard-partitioned read."""
    import shutil
    import tempfile

    import pyspark.sql.functions as F

    from recsplit_spark.data import sequences
    from recsplit_spark.pipeline import shards
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-shards", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    seq = sequences(spark, n_docs, partitions=cores * 2).persist()
    n_tok = int(seq.agg(F.sum("n_tok")).collect()[0][0])
    root = tempfile.mkdtemp(prefix="shardscale_")
    probe_before = host_probe_ms()
    w_best = g_best = s_best = float("inf")
    try:
        for r in range(reps):
            t0 = time.time()
            shards.write_training_shards(
                seq, f"{root}/sh{r}", "doc_id", n_shards
            )
            w_best = min(w_best, time.time() - t0)
        back = shards.read_training_shards(spark, f"{root}/sh0")
        for _ in range(reps):
            t0 = time.time()
            shards.epoch_order(seq, "doc_id", 1).write.format(
                "noop"
            ).mode("overwrite").save()
            g_best = min(g_best, time.time() - t0)
        for _ in range(reps):
            t0 = time.time()
            shards.epoch_order(
                back, "doc_id", 1, scope="shard"
            ).write.format("noop").mode("overwrite").save()
            s_best = min(s_best, time.time() - t0)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    probe_after = host_probe_ms()
    seq.unpersist()
    spark.stop()
    return {
        "task": "shardscale",
        "n_docs": n_docs,
        "n_tokens": n_tok,
        "n_shards": n_shards,
        "write_sec_best": round(w_best, 2),
        "write_docs_per_sec": round(n_docs / w_best, 1),
        "epoch_global_sec_best": round(g_best, 2),
        "epoch_global_docs_per_sec": round(n_docs / g_best, 1),
        "epoch_shard_sec_best": round(s_best, 2),
        "epoch_shard_docs_per_sec": round(n_docs / s_best, 1),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }


def task_prefilterscale(n_rows: int, cores: int, match_mod: int = 200,
                        reps: int = 2) -> dict:
    """Membership-filter semi-join reduction in its operating regime:
    row-broadcast joins DISABLED (simulating a dim past the broadcast
    threshold, where a real cluster must sort-merge), so the plain
    inner/anti joins shuffle all n_rows while the prefiltered paths
    shuffle only might-contain survivors (match fraction + 2^-8).
    dim = every ``match_mod``-th key -> ~0.5% true-match selectivity.
    Fact rows carry a 128-char incompressible-ish payload (sha2 hex —
    document-shaped rows, not bare keys): the operator's win IS the
    payload bytes that never enter the shuffle, and on a real cluster
    those bytes cross the network twice."""
    import pyspark.sql.functions as F

    from recsplit_spark.filters import (
        XorFilter, prefiltered_anti_join, prefiltered_join,
        semi_join_prefilter,
    )
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-prefilter", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    big = spark.range(n_rows).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 512).alias("payload"),
    ).persist()
    dim = spark.range(n_rows // match_mod).select(
        (F.col("id") * match_mod).alias("k"), (F.col("id") + 7).alias("w")
    ).persist()
    n_match = big.count() // match_mod  # keys 0, mod, 2*mod, ...
    dim.count()
    t0 = time.time()
    filt = XorFilter.build(dim, "k")
    build_sec = time.time() - t0
    probe_before = host_probe_ms()

    def _noop(df):
        # keep EVERY column through the plan (count() would let Catalyst
        # prune the payload before the shuffle and void the comparison)
        df.write.format("noop").mode("overwrite").save()

    plain_j = pre_j = plain_a = pre_a = float("inf")
    for _ in range(reps):
        t0 = time.time()
        _noop(big.join(dim, ["k"]))
        plain_j = min(plain_j, time.time() - t0)
        t0 = time.time()
        _noop(prefiltered_join(big, dim, "k", filt=filt))
        pre_j = min(pre_j, time.time() - t0)
        t0 = time.time()
        _noop(big.join(dim.select("k"), ["k"], "left_anti"))
        plain_a = min(plain_a, time.time() - t0)
        t0 = time.time()
        _noop(prefiltered_anti_join(big, dim.select("k"), "k", filt=filt))
        pre_a = min(pre_a, time.time() - t0)
    n_plain = big.join(dim, ["k"]).count()
    n_pre = prefiltered_join(big, dim, "k", filt=filt).count()
    a_plain = big.join(dim.select("k"), ["k"], "left_anti").count()
    a_pre = prefiltered_anti_join(big, dim.select("k"), "k", filt=filt).count()
    assert n_plain == n_pre == n_match, (n_plain, n_pre, n_match)
    assert a_plain == a_pre == n_rows - n_match, (a_plain, a_pre)
    survivors, _ = semi_join_prefilter(big, dim, "k", filt=filt)
    n_surv = survivors.count()
    probe_after = host_probe_ms()
    big.unpersist(); dim.unpersist()
    spark.stop()
    return {
        "task": "prefilterscale",
        "n_rows": n_rows,
        "n_dim_keys": n_rows // match_mod,
        "n_match_rows": int(n_match),
        "n_shuffled_prefiltered": int(n_surv),
        "shuffle_reduction_x": round(n_rows / n_surv, 1),
        "filter_build_sec": round(build_sec, 2),
        "filter_bits_per_key": round(filt.bits_per_key, 2),
        "join_plain_sec_best": round(plain_j, 2),
        "join_prefiltered_sec_best": round(pre_j, 2),
        "join_speedup_x": round(plain_j / pre_j, 2),
        "anti_plain_sec_best": round(plain_a, 2),
        "anti_prefiltered_sec_best": round(pre_a, 2),
        "anti_speedup_x": round(plain_a / pre_a, 2),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }


def task_classifierscale(n_rows: int, cores: int, d: int = 8,
                         reps: int = 2) -> dict:
    """Learned quality classifier at scale: IRLS fit (one mapInArrow
    partial-sum scan per Newton iteration, driver holds only the
    (d+1)^2 normal matrix) and the pure-Column scoring scan, over
    deterministic xxhash64-uniform features with labels from a known
    rule."""
    import numpy as np
    import pyspark.sql.functions as F

    from recsplit_spark.pipeline.classifier import LogisticQualityModel
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-classifier", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    cols = [
        (F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(1 << 20))
         / F.lit(float(1 << 20))).alias(f"u{i}")
        for i in range(d)
    ]
    df = spark.range(n_rows).select("id", *cols)
    rng = np.random.default_rng(7)
    tw = rng.normal(size=d).round(3)
    eta = F.lit(-0.2)
    for i in range(d):
        eta = eta + F.lit(float(tw[i])) * F.col(f"u{i}")
    df = df.withColumn("label", (eta > 0).cast("int")).persist()
    df.count()
    feature_cols = [f"u{i}" for i in range(d)]
    probe_before = host_probe_ms()
    fit_best = score_best = float("inf")
    m = None
    iters = 0
    for _ in range(reps):
        t0 = time.time()
        m = LogisticQualityModel.fit(df, feature_cols, "label", ridge=1e-3)
        fit_best = min(fit_best, time.time() - t0)
        iters = len(m.loss_history) - 1
    for _ in range(reps):
        t0 = time.time()
        m.with_score(df).agg(F.sum("quality_score")).collect()
        score_best = min(score_best, time.time() - t0)
    raw_w = m.weights / m.sd
    cos = float(raw_w @ tw / (np.linalg.norm(raw_w) * np.linalg.norm(tw)))
    probe_after = host_probe_ms()
    df.unpersist()
    spark.stop()
    return {
        "task": "classifierscale",
        "n_rows": n_rows,
        "d": d,
        "newton_iters": iters,
        "fit_sec_best": round(fit_best, 2),
        "fit_rows_per_sec_per_iter": round(n_rows * iters / fit_best, 1),
        "score_sec_best": round(score_best, 2),
        "score_rows_per_sec": round(n_rows / score_best, 1),
        "weight_cosine": round(cos, 4),
        "probe_before": probe_before,
        "probe_after": probe_after,
        "cores": cores,
    }


def task_gen3space(n: int, cores: int, bucket: int = 512) -> dict:
    """Round-5 extreme-space rule (generation 3, space_priority='max'):
    build + full bijection at n keys, leaf 14 / bucket ``bucket`` — the
    reference's RandomizedTest.java:207 operating point (1.614 b/k)."""
    from pyspark.sql import functions as F

    from recsplit_spark.mphf import MPHFDescriptor, RecSplitBuilder
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-gen3", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    keys = (
        spark.range(0, n, 1, cores * 4)
        .select(F.xxhash64("id").alias("key"))
        .cache()
    )
    keys.count()
    pb = host_probe_ms()
    t0 = time.time()
    desc = RecSplitBuilder(
        leaf_size=14, avg_bucket_size=bucket, space_priority="max"
    ).build(keys, "key", n=n)
    build_s = time.time() - t0
    blob = desc.to_bytes()
    rt = MPHFDescriptor.from_bytes(blob)
    t1 = time.time()
    agg = (
        rt.evaluate(keys, "key")
        .agg(F.count("*").alias("n"), F.countDistinct("mphf_index").alias("d"))
        .collect()[0]
    )
    eval_s = time.time() - t1
    pa = host_probe_ms()
    spark.stop()
    return {
        "task": "gen3space", "n": n, "bucket": bucket,
        "build_sec": round(build_s, 1),
        "build_keys_per_sec": round(n / build_s, 1),
        "bits_per_key": round(len(blob) * 8 / n, 4),
        "eval_sec": round(eval_s, 1),
        "bijection": bool(agg["n"] == n and agg["d"] == n),
        "rule_gen": rt.rule_gen,
        "probe_before": pb, "probe_after": pa, "cores": cores,
    }


def task_substrscale(n_docs: int, cores: int, doc_len: int = 200,
                     alpha: int = 32, n: int = 5, cap: int = 1 << 22) -> dict:
    """Round-5 ExactSubstr at >= 10^7 duplicated windows THROUGH THE
    SPILLED LOCATE PATH (driver_cap forces pmod(h1, W) wave slices; the
    VERDICT r4 #2 scale evidence). Small token alphabet => dense window
    reuse: 300K docs x 200 tokens over alpha=32 at n=5 yields ~1.8e7
    distinct duplicated windows (~0.5 x alpha^n)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from recsplit_spark.pipeline.substring_dedup import (
        dedup_substrings, duplicate_windows,
    )
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-substr", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def _gen(batches):
        for pdf in batches:
            for _, row in pdf.iterrows():
                lo, hi = int(row["lo"]), int(row["hi"])
                rng = np.random.default_rng(900_000 + lo)
                m = hi - lo
                toks = rng.integers(0, alpha, size=(m, doc_len), dtype=np.int32)
                yield pd.DataFrame(
                    {
                        "doc_id": [f"d{j:09d}" for j in range(lo, hi)],
                        "tokens": list(toks),
                    }
                )

    parts = cores * 4
    step = (n_docs + parts - 1) // parts
    bounds = spark.createDataFrame(
        [(i, min(i + step, n_docs)) for i in range(0, n_docs, step)],
        "lo long, hi long",
    ).repartition(parts, "lo")
    docs = bounds.mapInPandas(
        _gen, schema="doc_id string, tokens array<int>"
    ).cache()
    docs.count()
    n_dups = duplicate_windows(docs, "tokens", n=n).count()
    pb = host_probe_ms()
    t0 = time.time()
    out = dedup_substrings(
        docs, "doc_id", "tokens", n=n, driver_cap=cap,
        spill_dir="/root/repo/.scale_tmp/substr_spill",
    )
    agg = out.agg(
        F.count("*").alias("rows"), F.sum("removed_tok").alias("removed")
    ).collect()[0]
    wall = time.time() - t0
    pa = host_probe_ms()
    spark.stop()
    import shutil

    shutil.rmtree("/root/repo/.scale_tmp/substr_spill", ignore_errors=True)
    return {
        "task": "substrscale", "n_docs": n_docs, "doc_len": doc_len,
        "alpha": alpha, "ngram": n, "driver_cap": cap,
        "n_dup_windows": int(n_dups),
        "waves": -(-int(n_dups) // cap),
        "dedup_wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "rows_out": int(agg["rows"]), "removed_tok": int(agg["removed"]),
        "probe_before": pb, "probe_after": pa, "cores": cores,
    }


def task_gendepth(n_total: int, gens: int, cores: int, dim: int = 32) -> dict:
    """Round-5 generation-depth consolidation parity (VERDICT r4 #6):
    drive IncrementalANN and IncrementalDedup to ``gens`` generations
    with small appends, record the early-vs-late append/search walls,
    then consolidate (ANN: compact; dedup: consolidate) and measure the
    same operations against the single-generation store — the small-files
    story, measured the way compact cadence was for the MPHF."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyspark.sql.functions as F

    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.incremental_ann import IncrementalANN
    from recsplit_spark.pipeline.incremental_dedup import IncrementalDedup
    from recsplit_spark.session import get_spark, ship_package

    spark = get_spark(app_name="scale-gendepth", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    os.makedirs("/root/repo/.scale_tmp", exist_ok=True)
    probe_before = host_probe_ms()

    # ---- ANN side --------------------------------------------------------
    def _vecs(batches):
        for b in batches:
            ids = b.column(0).to_numpy(zero_copy_only=False)
            rng = np.random.default_rng(int(ids[0]) + 77)
            x = rng.standard_normal((len(ids), dim)).astype(np.float32)
            yield pa.record_batch(
                [b.column(0), pa.array(list(x), type=pa.list_(pa.float32()))],
                names=["vec_id", "embedding"],
            )

    vec = (
        spark.range(0, n_total, 1, cores * 2)
        .mapInArrow(_vecs, schema="vec_id long, embedding array<float>")
        .persist()
    )
    vec.count()
    k = max(64, int(n_total ** 0.5))
    idx = IVFIndex(n_centroids=k, nprobe=4, iters=5).fit(
        vec, "embedding", sample_size=min(n_total, 40 * k), mode="auto"
    )
    q = [r["embedding"] for r in vec.limit(8).collect()]
    ann_appends = []
    tmp = tempfile.mkdtemp(dir="/root/repo/.scale_tmp")
    try:
        store = IncrementalANN(f"{tmp}/ann", index=idx)
        for i in range(gens):
            lo, hi = n_total * i // gens, n_total * (i + 1) // gens
            m = store.append(
                vec.filter((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)),
                "vec_id", "embedding",
            )
            ann_appends.append(round(m["wall_s"], 2))

        def _search_wall(handle, reps=3):
            walls = []
            for _ in range(reps):
                t0 = time.time()
                for qv in q:
                    handle.search(spark, qv, k=10).collect()
                walls.append(time.time() - t0)
            return round(min(walls) / len(q), 3)

        search_deep = _search_wall(store)
        t0 = time.time()
        compacted, _cm = store.compact(spark, f"{tmp}/ann_c")
        ann_compact_s = round(time.time() - t0, 1)
        search_flat = _search_wall(compacted)
        t0 = time.time()
        m = compacted.append(
            vec.filter(F.col("vec_id") < n_total // gens), "vec_id",
            "embedding",
        )
        ann_append_flat = round(m["wall_s"], 2)

        # ---- dedup side --------------------------------------------------
        n_docs = n_total // 4
        vocab = [f"w{i:04d}" for i in range(4000)]

        def _docs(batches):
            for pdf in batches:
                ids = pdf["id"].to_numpy()
                rng = np.random.default_rng(int(ids[0]) + 991)
                rows = []
                for i in ids:
                    r = np.random.default_rng(int(i) * 13 + 5)
                    words = [vocab[j] for j in r.integers(0, len(vocab), 40)]
                    if i % 10 == 7 and i >= 100:  # near-dup of an earlier doc
                        r2 = np.random.default_rng(int(i - 100) * 13 + 5)
                        words = [
                            vocab[j] for j in r2.integers(0, len(vocab), 40)
                        ]
                        words[rng.integers(0, 40)] = vocab[
                            rng.integers(0, len(vocab))
                        ]
                    rows.append((f"d{i:09d}", " ".join(words)))
                yield pd.DataFrame(rows, columns=["doc_id", "text"])

        docs = (
            spark.range(0, n_docs, 1, cores * 2)
            .mapInPandas(_docs, schema="doc_id string, text string")
            .withColumn("__id_num", F.expr("CAST(substring(doc_id, 2, 9) AS LONG)"))
            .persist()
        )
        docs.count()
        dd = IncrementalDedup(f"{tmp}/dd", threshold=0.8, num_hashes=64)
        dd_appends = []
        for i in range(gens):
            lo, hi = n_docs * i // gens, n_docs * (i + 1) // gens
            _, m = dd.append(
                docs.filter(
                    (F.col("__id_num") >= lo) & (F.col("__id_num") < hi)
                ).drop("__id_num"),
                "doc_id", "text",
            )
            dd_appends.append(round(m["wall_s"], 2))
        t0 = time.time()
        ddc = dd.consolidate(spark, f"{tmp}/dd_c")
        dd_consolidate_s = round(time.time() - t0, 1)
        _, m = ddc.append(
            docs.filter(F.col("__id_num") < n_docs // gens).drop("__id_num"),
            "doc_id", "text",
        )
        dd_append_flat = round(m["wall_s"], 2)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    probe_after = host_probe_ms()
    vec.unpersist()
    docs.unpersist()
    spark.stop()

    def _tail_mean(xs, k=5):
        return round(sum(xs[-k:]) / min(k, len(xs)), 2)

    return {
        "task": "gendepth", "gens": gens, "n_vectors": n_total,
        "n_docs": n_total // 4, "dim": dim, "k": k,
        "ann_append_first5_mean_s": _tail_mean(ann_appends[:5]),
        "ann_append_last5_mean_s": _tail_mean(ann_appends),
        "ann_search_deep_s_per_q": search_deep,
        "ann_compact_sec": ann_compact_s,
        "ann_search_flat_s_per_q": search_flat,
        "ann_append_flat_s": ann_append_flat,
        "dd_append_first5_mean_s": _tail_mean(dd_appends[:5]),
        "dd_append_last5_mean_s": _tail_mean(dd_appends),
        "dd_consolidate_sec": dd_consolidate_s,
        "dd_append_flat_s": dd_append_flat,
        "probe_before": probe_before, "probe_after": probe_after,
        "cores": cores,
    }


def task_ingestscale10x(n_per_batch: int, cores: int, emb_dim: int = 16,
                        planted_frac: float = 0.05) -> dict:
    """Round-5 compose-at-scale rehearsal (VERDICT r4 #4): the full
    ingest_job composition (PII scrub -> learned quality gate ->
    incremental near-dedup -> stable ids -> SQ8 ANN append -> profile
    fold -> BPE packing) at 10x the round-4 measured 100K docs/batch,
    driven through the REAL deploy shape: spark-submit --py-files of
    dist/recsplit_spark.zip, one submit per nightly batch plus a replay
    of batch 2. Batch 2 plants ``planted_frac`` exact copies of batch-1
    texts under new ids (cross-batch dedup hits against persisted
    state)."""
    import shutil
    import subprocess
    import tempfile

    import numpy as np
    import pandas as pd

    from recsplit_spark.session import get_spark, ship_package

    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    os.makedirs(os.path.join(repo, ".scale_tmp"), exist_ok=True)
    root = tempfile.mkdtemp(dir=os.path.join(repo, ".scale_tmp"),
                            prefix="ingest10x_")
    vocab = [f"term{v:04d}" for v in range(2000)]

    def _mk_rows(ids, copy_of=None):
        """Deterministic doc text + embedding per id; text is a pure
        function of ``copy_of`` (the source id), so a planted copy is an
        exact near-dup while independent ids are Jaccard-disjoint with
        overwhelming probability (40-100 words from a 2000-word vocab)."""
        out_t, out_e = [], []
        for i, src in zip(ids, copy_of if copy_of is not None else ids):
            r = np.random.default_rng(int(src) * 9176 + 11)
            n = 40 + int(r.integers(0, 60))
            words = [vocab[j] for j in r.integers(0, len(vocab), n)]
            if src % 3 == 0:
                words[0] = words[0].upper()
            sep = ". " if src % 4 == 0 else " "
            out_t.append(sep.join(words) + ("." if src % 2 == 0 else ""))
            out_e.append(np.array(
                [(((i * 31 + j * 17) % 97) - 48) / 48.0 for j in range(emb_dim)],
                dtype=np.float32,
            ))
        return out_t, out_e

    spark = get_spark(app_name="scale-ingest10x-prep", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)

    def _batch_pdf_iter(lo_base, plant_from=None):
        def _gen(batches):
            for pdf in batches:
                for _, row in pdf.iterrows():
                    lo, hi = int(row["lo"]), int(row["hi"])
                    ids = np.arange(lo, hi)
                    src = ids.copy()
                    if plant_from is not None:
                        planted = ids % int(1 / planted_frac) == 3
                        src[planted] = plant_from + (ids[planted] % n_per_batch)
                    texts, embs = _mk_rows(ids, src)
                    yield pd.DataFrame({
                        "doc_id": ids,
                        "text": texts,
                        "source": [f"src{int(i) % 3}" for i in ids],
                        "embedding": embs,
                    })
        return _gen

    schema = "doc_id long, text string, source string, embedding array<float>"
    parts = cores * 4
    step = (n_per_batch + parts - 1) // parts

    def _write_batch(name, lo_base, plant_from=None):
        bounds = spark.createDataFrame(
            [(lo_base + i, lo_base + min(i + step, n_per_batch))
             for i in range(0, n_per_batch, step)],
            "lo long, hi long",
        ).repartition(parts, "lo")
        bounds.mapInPandas(
            _batch_pdf_iter(lo_base, plant_from), schema=schema
        ).write.parquet(f"{root}/{name}")

    t0 = time.time()
    _write_batch("batch1", 0)
    _write_batch("batch2", 10_000_000, plant_from=0)
    b1 = spark.read.parquet(f"{root}/batch1")

    from recsplit_spark.pipeline.ann import IVFIndex
    from recsplit_spark.pipeline.bpe import BPETokenizer
    from recsplit_spark.pipeline.classifier import LogisticQualityModel
    from recsplit_spark.pipeline.text import with_quality_stats

    import pyspark.sql.functions as F

    sample = b1.limit(40_000).cache()
    tok = BPETokenizer.train(sample, "text", vocab_size=280)
    open(f"{root}/bpe.blob", "wb").write(tok.to_bytes())
    feats = with_quality_stats(sample, "text").withColumn(
        "label", (F.length("text") > 500).cast("int")  # mid-distribution
    )
    model = LogisticQualityModel.fit(
        feats, ["n_tokens", "avg_token_len", "punct_ratio"], "label",
        max_iter=6,
    )
    open(f"{root}/quality.blob", "wb").write(model.to_bytes())
    k = max(256, int((2 * n_per_batch) ** 0.5))
    idx = IVFIndex(n_centroids=k, nprobe=4, iters=5).fit(
        b1, "embedding", sample_size=min(n_per_batch, 40 * k), mode="auto"
    )
    idx.save(spark, f"{root}/ivf_index")
    prep_s = round(time.time() - t0, 1)
    spark.stop()

    subprocess.run(
        [sys.executable, os.path.join(here, "make_pyfiles_zip.py")],
        check=True, cwd=repo, capture_output=True,
    )

    def _submit(batch, batch_id):
        argv = [
            "spark-submit", "--driver-memory", "48g",
            "--master", f"local[{cores}]",
            "--py-files", os.path.join(repo, "dist", "recsplit_spark.zip"),
            os.path.join(here, "ingest_job.py"),
            "--input", f"{root}/{batch}",
            "--root", f"{root}/lake", "--out", f"{root}/clean",
            "--id-col", "doc_id", "--text-col", "text", "--mode", "text",
            "--batch-id", str(batch_id),
            "--scrub-pii",
            "--quality-model", f"{root}/quality.blob",
            "--quality-threshold", "0.2",
            "--vec-col", "embedding", "--ann-index", f"{root}/ivf_index",
            "--pq", "sq8",
            "--profile-spec", "docs=hll:doc_id",
            "--profile-keys", "source",
            "--pack-capacity", "256",
            "--tokenizer", f"{root}/bpe.blob",
            "--packed-out", f"{root}/packed",
        ]
        t0 = time.time()
        r = subprocess.run(argv, capture_output=True, text=True, cwd=repo)
        wall = time.time() - t0
        if r.returncode != 0:
            raise RuntimeError(
                f"ingest_job {batch} failed rc={r.returncode}:\n"
                f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}"
            )
        line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
        return json.loads(line), round(wall, 1)

    probe_before = host_probe_ms()
    m1, wall1 = _submit("batch1", 1)
    m2, wall2 = _submit("batch2", 2)
    mr, wallr = _submit("batch2", 2)  # replay: stage-level no-op
    probe_after = host_probe_ms()
    shutil.rmtree(root, ignore_errors=True)
    return {
        "task": "ingestscale10x", "n_docs_per_batch": n_per_batch,
        "batches": 2, "emb_dim": emb_dim, "k_centroids": k,
        "prep_sec": prep_s,
        "wall_b1_s": wall1, "wall_b2_s": wall2, "wall_replay_s": wallr,
        "job_b1": m1, "job_b2": m2, "job_replay": mr,
        "docs_per_sec_two_batches": round(2 * n_per_batch / (wall1 + wall2), 1),
        "probe_before": probe_before, "probe_after": probe_after,
        "cores": cores,
    }


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--task", required=True,
        choices=["eval1e9", "verify1e9", "ivffit", "dedup01", "ngramscale",
                 "smallrungs", "incmphf", "incmphf_compact", "incdedup",
                 "incdedup_tokens", "semdedup", "pqscale", "residualscale",
                 "opqscale", "sq8scale", "dsirscale", "bpescale",
                 "shardscale", "prefilterscale", "classifierscale",
                 "gen3space", "substrscale", "gendepth", "ingestscale10x"],
    )
    ap.add_argument("--n", type=int, default=None)
    ap.add_argument("--gens", type=int, default=3)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--dim", type=int, default=None)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    # append-only per-round measurement file (VERDICT r4 #7: every
    # BASELINE.md citation must resolve in the artifact it cites)
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE_r05.jsonl"))
    ap.add_argument("--path", default="/root/repo/.scale_tmp/blocked_1e9")
    ap.add_argument("--max-wait-s", type=float, default=10800.0)
    args = ap.parse_args()

    gate = wait_healthy(args.max_wait_s)
    if args.task == "eval1e9":
        res = task_eval1e9(args.n or 1_000_000_000, args.path, args.cores)
    elif args.task == "verify1e9":
        res = task_verify1e9(args.n or 1_000_000_000, args.path, args.cores)
    elif args.task == "ivffit":
        res = task_ivffit(args.n or 1_000_000, args.k, args.dim or 64, args.cores)
    elif args.task == "ngramscale":
        res = task_ngramscale(args.n or 100_000, args.cores)
    elif args.task == "smallrungs":
        res = task_smallrungs(args.n or 16_000_000)
    elif args.task == "incmphf":
        res = task_incmphf(args.n or 2_000_000, args.gens, args.cores)
    elif args.task == "incmphf_compact":
        res = task_incmphf_compact(args.n or 2_000_000, args.gens, args.cores)
    elif args.task == "incdedup":
        res = task_incdedup(args.gens, args.cores)
    elif args.task == "incdedup_tokens":
        res = task_incdedup_tokens(args.n or 200_000, args.gens, args.cores)
    elif args.task == "semdedup":
        res = task_semdedup(args.n or 400_000, args.gens, args.cores)
    elif args.task == "pqscale":
        res = task_pqscale(args.n or 1_000_000, args.cores, dim=args.dim or 64)
    elif args.task == "residualscale":
        res = task_residualscale(args.n or 1_000_000, args.cores, dim=args.dim or 64)
    elif args.task == "opqscale":
        res = task_opqscale(args.n or 1_000_000, args.cores, dim=args.dim or 64)
    elif args.task == "sq8scale":
        res = task_sq8scale(args.n or 1_000_000, args.cores, dim=args.dim or 64)
    elif args.task == "dsirscale":
        res = task_dsirscale(args.n or 500_000, args.cores)
    elif args.task == "bpescale":
        res = task_bpescale(args.n or 200_000, args.cores)
    elif args.task == "shardscale":
        res = task_shardscale(args.n or 1_000_000, args.cores)
    elif args.task == "prefilterscale":
        res = task_prefilterscale(args.n or 20_000_000, args.cores)
    elif args.task == "classifierscale":
        res = task_classifierscale(args.n or 10_000_000, args.cores, d=args.dim or 8)
    elif args.task == "gen3space":
        res = task_gen3space(args.n or 1_000_000, args.cores, bucket=args.bucket)
    elif args.task == "substrscale":
        res = task_substrscale(args.n or 300_000, args.cores)
    elif args.task == "gendepth":
        res = task_gendepth(args.n or 200_000, args.gens, args.cores)
    elif args.task == "ingestscale10x":
        res = task_ingestscale10x(args.n or 1_000_000, args.cores)
    else:
        res = task_dedup01(args.cores)
    res["gate"] = gate
    line = json.dumps(res)
    with open(args.out, "a") as f:
        f.write(line + "\n")
    print(line)
