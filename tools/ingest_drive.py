"""100x ingest-slope drive (round-9): prove the O(increment) claim of
the incremental setsim ingest + streaming labels at one more decade
than the 20x drive.

Synthesizes ``copies`` copies of sf0.1 documents (default 100 — ~500k
docs with planted exact/near-dup families), ingests them as
``n_super`` equal super-batches through ``setsim_ingest_batch`` (the
same path the streaming sink drives), and times EACH super-batch.
The claim under test: per-batch wall time stays ~FLAT while the
stored base grows ~10x from the first batch to the last — because the
probe is (new x base-touched) u (new x new), the label merge is
increment-sized, and the stats-bootstrapped snapshot merge prunes
files from birth.  Super-linear growth in the curve is the failure
signature (an O(corpus)-per-batch regression).

End checks are the stage-8 invariants at 100x: ledger reconciles, no
exact-dup text survives, labels cover every doc exactly once, every
dropped doc's component holds a published canonical.

Run: ``PYTHONPATH=/root/repo python tools/ingest_drive.py [copies]
[n_super]`` (defaults 100, 10; prints ONE JSON line).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tools.scale_drive import synthesize


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_super = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    if copies % n_super:
        raise SystemExit("copies must divide by n_super")
    sf_dir = "/root/testdata/sf0.1"
    work = tempfile.mkdtemp(prefix="ingest_drive_")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        from ros_sql_spark.operators.dedup import setsim_join  # noqa: F401
        from ros_sql_spark.streaming.dedup import (
            setsim_corpus_read,
            setsim_ingest_batch,
            setsim_labels_read,
        )

        t0 = time.time()
        synthesize(spark, sf_dir, work, copies)
        synth_sec = round(time.time() - t0, 2)
        docs = spark.read.parquet(f"{work}/documents")
        n_docs = docs.count()

        store = f"{work}/store"
        per = copies // n_super
        per_batch: list[float] = []
        kept = dropped = seen = 0
        for b in range(n_super):
            lo = b * per * 1_000_000
            hi = (b + 1) * per * 1_000_000
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).select("doc_id", "text")
            t0 = time.time()
            st = setsim_ingest_batch(batch, b, store, threshold=0.5, k=5)
            per_batch.append(round(time.time() - t0, 2))
            kept += st["n_kept"]
            dropped += st["n_dropped"]
            seen += st["n_batch"]

        checks: dict[str, bool] = {}
        checks["ledger_reconciles"] = (
            seen == n_docs and kept + dropped == n_docs
        )
        checks["dropped_something"] = dropped > 0
        corpus = setsim_corpus_read(spark, store)
        dup = (
            corpus.groupBy(F.md5(F.col("text").cast("binary")))
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        checks["no_exact_dup_survives"] = dup == 0
        checks["corpus_matches_ledger"] = corpus.count() == kept
        lbl = setsim_labels_read(spark, store)
        n_lbl = lbl.count()
        checks["labels_cover_all_once"] = (
            n_lbl == n_docs
            and lbl.select("doc_id").distinct().count() == n_docs
        )
        kept_comps = (
            lbl.join(corpus.select("doc_id"), "doc_id", "left_semi")
            .select("component")
            .distinct()
        )
        orphans = (
            lbl.join(corpus.select("doc_id"), "doc_id", "left_anti")
            .join(kept_comps, "component", "left_anti")
            .count()
        )
        checks["dropped_have_published_canonical"] = orphans == 0
        # the slope check itself: the mean of the last 3 batches vs the
        # mean of batches 2-4 (batch 1 excluded: empty-base fast path +
        # JIT warmup).  2x headroom on a ~flat claim absorbs host noise
        # while still failing any O(corpus) component, which would read
        # ~(base_last/base_early) = ~4-8x here.
        early = sum(per_batch[1:4]) / 3
        late = sum(per_batch[-3:]) / 3
        checks["per_batch_flat_within_2x"] = late <= 2 * early
        out = {
            "metric": "ingest_drive",
            "copies": copies,
            "n_super": n_super,
            "docs": n_docs,
            "kept": kept,
            "synth_sec": synth_sec,
            "per_batch_sec": per_batch,
            "checks": checks,
        }
        print(json.dumps(out))
        return 0 if all(checks.values()) else 1
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
