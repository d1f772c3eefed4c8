"""Larger-SF scaling spot-probe (round-16, VERDICT item 9).

The r15 scaling block was a dead instrument: at sf0.1 every 8-vs-32
core ratio sat at ~1 (the whole suite is per-job driver/AQE-overhead
bound locally), so local core scaling said nothing about 100 TB
behavior.  This probe synthesizes a COPIES× corpus from sf0.1
(deterministic, generated once, env-pointed per the bench contract)
and times the heavy-tail queries via the unchanged ``bench.py --only``
protocol at 32 and 8 cores — the parallelises-vs-driver-bound signal
the plan gates can't give.

Synthesis (all deterministic, no randomness):
  - customer/supplier/part/orders/lineitem: union of COPIES key-shifted
    copies (every primary and foreign key shifted by i·(max_key+1), so
    join fan-outs stay exactly 1:1 per copy — the corpus grows, the
    join SHAPE doesn't);
  - documents: doc_id shifted; text consonant-ROTATED per copy
    (scale_drive's idiom) so each copy carries its own realistic
    dup-family structure instead of 5× cross-copy duplicates;
  - embeddings: vec_id shifted; vector ROLLED by i positions per copy
    (norm-preserving) so LSH/IVF buckets decorrelate across copies
    instead of every copy colliding in every band;
  - region/nation/events: raw file copy (tiny dims; events keeps its
    TIMESTAMP(NANOS) physical type, which a Spark rewrite would lose).

Run: ``PYTHONPATH=/root/repo python tools/sf_probe.py [copies] [out]``
(default 5 copies under /tmp/sf_probe_data).  Prints one JSON line per
core count plus a combined summary; writes nothing under the repo.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = os.environ.get("SF_PROBE_SRC", "/root/testdata/sf0.1")

# 20 chars -> 19 distinct NON-identity rotations (scale_drive.ROTS)
ROTS = "bcdfghjklmnpqrstvwxz"

# heavy-tail probe set: this round's targets + the standing top-10
PROBE_QUERIES = [
    "qx26_curate_full",
    "qx07_setsim_incremental",
    "qx48_bfs_reach",
    "qx56_assoc_rules",
    "qx06_curate_report",
    "qx64_weighted_median",
    "q90_bloom_decontaminate",
    "qx02_setsim_join",
    "q78_ann_ivf",
    "q84_pq_ann",
    "q40_ann_lsh",
    "q85_boilerplate",
    "qx29_pagerank",
    "q11_pricing_summary",
    "qx61_ols_regression",
    "qx09_bpe_tokenize",
]

# (table, [key columns shifted by i*(max(first key)+1)])
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
}
# FK -> the table whose PK stride it must reuse
FK_STRIDE = {
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
}


def _strides(spark: SparkSession) -> dict[str, int]:
    out = {}
    for t, keys in KEYED.items():
        pk = keys[0]
        out[t] = (
            spark.read.parquet(f"{SRC}/{t}.parquet")
            .agg(F.max(pk))
            .collect()[0][0]
            + 1
        )
    for t in ("documents", "embeddings"):
        pk = "doc_id" if t == "documents" else "vec_id"
        out[t] = (
            spark.read.parquet(f"{SRC}/{t}.parquet")
            .agg(F.max(pk))
            .collect()[0][0]
            + 1
        )
    return out


def _shifted_union(df: DataFrame, shifts: dict[str, int], copies: int,
                   extra=None) -> DataFrame:
    cols = df.columns
    parts = []
    for i in range(copies):
        c = df
        for col, stride in shifts.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * stride))
        if extra is not None:
            c = extra(c, i)
        parts.append(c.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def synthesize(spark: SparkSession, out_dir: str, copies: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    strides = _strides(spark)
    for t, keys in KEYED.items():
        shifts = {
            k: strides[FK_STRIDE.get(k, t)] for k in keys
        }
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        _shifted_union(df, shifts, copies).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )

    def rot_text(c: DataFrame, i: int) -> DataFrame:
        if i == 0:
            return c
        r = i % len(ROTS)
        return c.withColumn(
            "text", F.translate("text", ROTS, ROTS[r:] + ROTS[:r])
        )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    _shifted_union(
        docs, {"doc_id": strides["documents"]}, copies, extra=rot_text
    ).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    def roll_vec(c: DataFrame, i: int) -> DataFrame:
        if i == 0:
            return c
        dim = 64
        r = i % dim
        return c.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", r + 1, dim - r),
                F.slice("embedding", 1, r),
            ),
        )

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    _shifted_union(
        emb, {"vec_id": strides["embeddings"]}, copies, extra=roll_vec
    ).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    for t in ("region", "nation", "events"):
        dst = f"{out_dir}/{t}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copyfile(f"{SRC}/{t}.parquet", dst)


def run_bench(data_dir: str, cpus: int, runs: int = 2) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=data_dir,
        SPARK_GRAFT_CPUS=str(cpus),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "bench.py"),
            "--only",
            ",".join(PROBE_QUERIES),
            "--runs",
            str(runs),
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=7200,
    )
    line = [
        ln for ln in proc.stdout.strip().splitlines()
        if ln.startswith("{")
    ][0]
    return json.loads(line)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_probe_data"
    marker = os.path.join(out_dir, f".synth_{copies}x_done")
    if not os.path.exists(marker):
        spark = (
            SparkSession.builder.master("local[32]")
            .appName("sf-probe-synth")
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "16g")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        synthesize(spark, out_dir, copies)
        spark.stop()
        open(marker, "w").close()
    results = {}
    for cpus in (32, 8):
        r = run_bench(out_dir, cpus)
        results[str(cpus)] = r["queries"]
        print(json.dumps({"cpus": cpus, **r}), flush=True)
    q32, q8 = results["32"], results["8"]
    ratios = {
        k: round(q8[k] / q32[k], 2)
        for k in PROBE_QUERIES
        if k in q32 and k in q8 and q32[k] > 0
    }
    print(
        json.dumps(
            {
                "metric": "sf_probe_8c_over_32c",
                "copies": copies,
                "ratios": ratios,
                "t32": q32,
                "t8": q8,
            }
        )
    )


if __name__ == "__main__":
    main()
