#!/usr/bin/env python
"""Generate an sf1 fixture (~10x sf0.1) for the scale rehearsal.

/root/testdata is read-only and ships no sf1, so the rehearsal data is
derived: every non-dimension table is replicated ``COPIES`` times with
key-domain-consistent offsets (o_custkey and c_custkey shift by the
SAME custkey offset, so referential integrity survives), written to
$OUT (default /tmp/sf1). region/nation stay fixed — facts reference
nationkeys 0-24, exactly like TPC-H's constant dims.

Document text is made copy-distinct by suffixing every word with the
copy id (copy 0 keeps the original text): plain replication would make
every doc an exact 10-way duplicate and near-dup candidate pairs would
grow quadratically in COPIES — a property of the synthetic replication,
not of the operators being measured. Within-copy dup/near-dup structure
(the thing the dedup operators are measured on) is preserved exactly.

Embedding vectors are replicated as-is under offset vec_ids (ANN bench
measures scan/score cost, which depends on row count, not vector
values); query vec_ids < 5 keep pointing at copy-0 rows.

Deterministic: pure column arithmetic, no RNG.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SRC = os.environ.get("SPARK_GRAFT_SF_SRC", "/root/testdata/sf0.1")
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = int(os.environ.get("SPARK_GRAFT_SF1_COPIES", "10"))

# key domain -> (table, column) members; every member shifts by the
# same per-domain offset so cross-table joins keep matching
DOMAINS = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    "docid": [("documents", "doc_id")],
    "vecid": [("embeddings", "vec_id")],
}

FIXED = ["region", "nation"]
SCALED = [
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
]


def main() -> None:
    from dbt_maxcompute_spark.session import apply_session_defaults, get_spark

    spark = get_spark(app_name="make_sf1")
    apply_session_defaults(spark)

    # per-domain offsets from the max key in the domain's member tables
    offsets: dict[str, int] = {}
    for dom, members in DOMAINS.items():
        mx = 0
        for tbl, col in members:
            df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
            mx = max(mx, df.agg(F.max(col)).collect()[0][0] or 0)
        offsets[dom] = int(mx) + 1

    shift_of = {
        (tbl, col): offsets[dom]
        for dom, members in DOMAINS.items()
        for tbl, col in members
    }

    def write_single_file(df, tbl: str) -> None:
        # match the driver fixture layout exactly: ONE parquet FILE per
        # table (the streaming suites symlink `<tbl>.parquet` as a file
        # into their source dirs), but with ~8 MB ROW GROUPS so Spark's
        # file-range splitting still parallelizes the scan — a
        # single-row-group 6M-row file pins every scan stage to one
        # task, and a "growth exponent" then measures the serialization
        # artifact, not the operator (a real 100 TB table has thousands
        # of splits)
        import shutil

        stage = f"{OUT}/.stage_{tbl}"
        (
            df.coalesce(1)
            .write.mode("overwrite")
            .option("parquet.block.size", 8 * 1024 * 1024)
            .parquet(stage)
        )
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        dst = f"{OUT}/{tbl}.parquet"
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        os.replace(os.path.join(stage, part), dst)
        shutil.rmtree(stage, ignore_errors=True)

    os.makedirs(OUT, exist_ok=True)
    for tbl in FIXED:
        write_single_file(spark.read.parquet(f"{SRC}/{tbl}.parquet"), tbl)
        print(f"{tbl}: copied (fixed dim)")

    for tbl in SCALED:
        base = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        # one pass: explode a copy-index array, shift keys by i*offset
        copies = base.select(
            F.explode(F.array(*[F.lit(i) for i in range(COPIES)])).alias("__i"), "*"
        )
        out = copies
        for col in base.columns:
            off = shift_of.get((tbl, col))
            if off is not None:
                out = out.withColumn(
                    col, F.col(col) + F.col("__i").cast("long") * F.lit(off)
                )
        if tbl == "embeddings":
            # label is a BLOCKING key (bounded-size block stand-in for
            # an LSH bucket in the blocked self-join operators); keep
            # blocks copy-local so block SIZE stays constant under the
            # scale-up — identical labels across copies would grow
            # every block 10x and quadratic pair growth would measure
            # the replication artifact, not the operator
            out = out.withColumn(
                "label", F.col("label") + F.col("__i") * F.lit(1000)
            )
        if tbl == "documents":
            # copy-distinct text: suffix every word with the copy id
            # (copy 0 untouched) — kills cross-copy shingle overlap
            out = out.withColumn(
                "text",
                F.when(F.col("__i") == 0, F.col("text")).otherwise(
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), " "),
                            lambda w: F.concat(
                                w, F.lit("_"), F.col("__i").cast("string")
                            ),
                        ),
                        " ",
                    )
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        out = out.drop("__i")
        write_single_file(out, tbl)
        n = spark.read.parquet(f"{OUT}/{tbl}.parquet").count()
        print(f"{tbl}: {n} rows")


if __name__ == "__main__":
    main()
