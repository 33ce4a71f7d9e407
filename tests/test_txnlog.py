"""Transaction-log tables: atomic commits, snapshot isolation, time
travel, checkpoints, conflict detection, vacuum."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_maxcompute_spark.txnlog import CommitConflict, TxnTable


@pytest.fixture()
def t(spark, tmp_path):
    return TxnTable(spark, str(tmp_path / "txn"))


def _r(spark, lo, hi, mult=2):
    return spark.range(lo, hi).select(F.col("id"), (F.col("id") * mult).alias("v"))


def test_create_append_overwrite_time_travel(spark, t):
    assert t.create(_r(spark, 0, 100)) == 0
    assert t.append(_r(spark, 100, 150)) == 1
    assert t.overwrite(_r(spark, 0, 10)) == 2
    assert t.read().count() == 10  # latest
    assert t.read(version=0).count() == 100
    assert t.read(version=1).count() == 150
    assert sorted(r.id for r in t.read(1).collect()) == list(range(150))


def test_delete_where_null_semantics(spark, t):
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 50)], "id bigint, v bigint"
    )
    t.create(df)
    t.delete_where("v > 10")
    got = sorted(r.id for r in t.read().collect())
    assert got == [1, 2]  # NULL-condition row survives


def test_commit_conflict_raises(spark, t):
    t.create(_r(spark, 0, 10))
    # a second writer racing to the same table dir loses exactly once
    other = TxnTable(spark, t.path)
    other.append(_r(spark, 10, 20))  # wins version 1
    snap = t.snapshot(version=0)
    files = [{"add": f} for f in snap.files]
    with pytest.raises(CommitConflict):
        t._commit(1, files, None)  # stale expected version
    assert t.latest_version() == 1


def test_readers_never_list_data_dir(spark, t):
    t.create(_r(spark, 0, 100))
    # an orphan parquet dropped into the dir must stay invisible
    _r(spark, 900, 1000).limit(50).toPandas().to_parquet(
        os.path.join(t.path, "part-orphan.parquet")
    )
    assert t.read().count() == 100


def test_checkpoint_collapses_replay(spark, t):
    t.create(_r(spark, 0, 10))
    for i in range(1, 13):
        t.append(_r(spark, 10 * i, 10 * i + 10))
    # version 10 wrote a checkpoint
    assert os.path.exists(t._checkpoint_path(10))
    assert t.read().count() == 130
    assert t.read(version=5).count() == 60  # pre-checkpoint time travel intact


def test_vacuum_drops_dead_files_keeps_live(spark, t):
    t.create(_r(spark, 0, 100))
    t.overwrite(_r(spark, 0, 5))
    n_files_before = sum(
        f.endswith(".parquet") for f in os.listdir(t.path)
    )
    # freshly-written files are inside the age guard: default vacuum is a no-op
    assert t.vacuum(retain_versions=1) == []
    removed = t.vacuum(retain_versions=1, retention_seconds=0)
    assert removed  # v0's files are dead
    assert t.read().count() == 5
    n_files_after = sum(f.endswith(".parquet") for f in os.listdir(t.path))
    assert n_files_after == n_files_before - len(removed)
    with pytest.raises(Exception):
        t.read(version=0).count()  # time travel beyond retention is gone


def test_stray_tmp_entry_does_not_break_log(spark, t):
    """A crashed writer's staged .tmp-*.json (or one observed mid-commit)
    must be invisible to _versions/snapshot/read (ADVICE r3)."""
    t.create(_r(spark, 0, 10))
    t.append(_r(spark, 10, 20))
    with open(os.path.join(t.log_path, ".tmp-deadbeef.json"), "w") as fh:
        fh.write("{}")
    with open(os.path.join(t.log_path, "notes.json"), "w") as fh:
        fh.write("{}")
    assert t.latest_version() == 1
    assert t.read().count() == 20
    assert [h["version"] for h in t.history()] == [0, 1]


def test_empty_overwrite_keeps_schema(spark, t):
    t.create(_r(spark, 0, 10))
    t.overwrite(_r(spark, 0, 0))
    got = t.read()
    assert got.count() == 0
    assert set(got.columns) == {"id", "v"}


# ---------------------------------------------------------------------------
# round-4: file-statistics data skipping (Delta-paper §data skipping)
# ---------------------------------------------------------------------------


def test_data_skipping_prunes_files_by_logged_stats(spark, tmp_path):
    """Four appends with disjoint id ranges -> a selective predicate
    reads ONLY the matching append's files, proven via files_scanned()
    AND the executed plan's input file list; results are identical to
    the unpruned filter (skipping is an optimization, never semantics)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    for lo in (0, 100, 200, 300):
        df = spark.range(lo, lo + 100, numPartitions=1).select(
            F.col("id"), (F.col("id") % 7).alias("v")
        )
        t.create(df) if lo == 0 else t.append(df)

    all_files = t.snapshot().files
    assert len(all_files) == 4

    where = [("id", ">=", 350)]
    scanned = t.files_scanned(where)
    assert len(scanned) == 1  # only the [300, 400) file

    got = t.read(where=where)
    # the Spark scan itself only touches the pruned list
    assert {f.split("/")[-1] for f in got.inputFiles()} == set(scanned)
    assert sorted(r["id"] for r in got.collect()) == list(range(350, 400))

    # equality + range ops prune; conservative cases scan
    assert len(t.files_scanned([("id", "=", 150)])) == 1
    assert len(t.files_scanned([("id", "<", 150)])) == 2
    assert len(t.files_scanned([("v", ">=", 0)])) == 4  # v spans all files
    assert len(t.files_scanned([("nosuchcol", "=", 1)])) == 4  # unknown: scan


def test_data_skipping_survives_checkpoint_and_overwrite(spark, tmp_path):
    """Stats ride checkpoints (snapshot resolution collapses the log
    prefix) and disappear with removed files on overwrite."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.range(0, 50, numPartitions=1).select(F.col("id")))
    # push past CHECKPOINT_EVERY so resolution goes through a checkpoint
    for i in range(1, 12):
        t.append(
            spark.range(i * 50, (i + 1) * 50, numPartitions=1).select(F.col("id"))
        )
    assert t.latest_version() == 11
    snap = t.snapshot()
    assert len(snap.stats) == len(snap.files) == 12
    assert len(t.files_scanned([("id", ">=", 560)])) == 1

    t.overwrite(spark.range(1000, 1100, numPartitions=1).select(F.col("id")))
    assert t.files_scanned([("id", "<", 1000)]) == []
    assert t.read(where=[("id", "<", 1000)]).count() == 0
    assert t.read(where=[("id", ">=", 1050)]).count() == 50


def test_data_skipping_timestamp_iso_strings(spark, tmp_path):
    """Timestamp stats are stored as ISO strings; ISO string predicates
    prune correctly (lexicographic == temporal order)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    jan = spark.sql(
        "SELECT timestamp'2024-01-15 12:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts, id FROM range(10)"
    ).coalesce(1)
    jul = spark.sql(
        "SELECT timestamp'2024-07-15 12:00:00' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS ts, id FROM range(10)"
    ).coalesce(1)
    t.create(jan)
    t.append(jul)
    assert len(t.snapshot().files) == 2
    scanned = t.files_scanned([("ts", ">=", "2024-06-01T00:00:00")])
    assert len(scanned) == 1
    assert t.read(where=[("ts", ">=", "2024-06-01T00:00:00")]).count() == 10


# ---------------------------------------------------------------------------
# round-4: model-based property test — random op sequences vs an
# in-memory model; every version's snapshot read must replay exactly
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ROWS = st.lists(
    st.tuples(st.integers(0, 100), st.integers(-50, 50)),
    min_size=0,
    max_size=6,
)


@st.composite
def _op_sequences(draw):
    ops = [("create", draw(_ROWS))]
    for _ in range(draw(st.integers(1, 5))):
        kind = draw(
            st.sampled_from(
                ["append", "overwrite", "delete", "delete_dv", "upsert_dv", "optimize"]
            )
        )
        if kind in ("delete", "delete_dv"):
            ops.append((kind, draw(st.integers(0, 120))))
        elif kind == "upsert_dv":
            rows = draw(_ROWS)
            dedup = list({r[0]: r for r in rows}.values())  # unique keys required
            ops.append((kind, dedup))
        elif kind == "optimize":
            # round-10: incremental bin-pack anywhere in the sequence —
            # content-preserving at every version, may be a metadata
            # no-op (no commit)
            ops.append((kind, draw(st.integers(1, 6))))
        else:
            ops.append((kind, draw(_ROWS)))
    return ops


@given(ops=_op_sequences())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_log_replay_equals_model_at_every_version(
    spark, tmp_path_factory, ops
):
    """Multiset equality between every snapshot read and an in-memory
    model after an arbitrary create/append/overwrite/delete sequence —
    the log IS the table, at every version, not just the latest."""
    t = TxnTable(spark, str(tmp_path_factory.mktemp("txn") / "t"))
    model: list[list[tuple]] = []

    def df_of(rows):
        return spark.createDataFrame(rows, "id bigint, v bigint")

    for kind, arg in ops:
        if kind == "create":
            t.create(df_of(arg))
            model.append(list(arg))
        elif kind == "append":
            t.append(df_of(arg))
            model.append(model[-1] + list(arg))
        elif kind == "overwrite":
            t.overwrite(df_of(arg))
            model.append(list(arg))
        elif kind == "delete":  # COW delete id < arg
            t.delete_where(f"id < {arg}")
            model.append([r for r in model[-1] if not (r[0] < arg)])
        elif kind == "delete_dv":  # deletion-vector delete, same semantics
            t.delete_where_dv(f"id < {arg}")
            model.append([r for r in model[-1] if not (r[0] < arg)])
        elif kind == "optimize":  # incremental compaction: content fixed
            v_before = t.latest_version()
            v_after = t.optimize(target_rows=arg)
            if v_after > v_before:
                model.append(list(model[-1]))
            else:
                assert v_after == v_before  # metadata no-op, no commit
        else:  # upsert_dv: DV out matched keys + append source
            t.delete_insert_dv(df_of(arg), ["id"])
            keys = {r[0] for r in arg}
            model.append([r for r in model[-1] if r[0] not in keys] + list(arg))

    assert t.latest_version() == len(model) - 1
    for v, expect in enumerate(model):
        got = sorted((r["id"], r["v"]) for r in t.read(v).collect())
        assert got == sorted(expect), f"version {v}"

    # history bookkeeping: every op is exactly one commit
    hist = t.history()
    assert [h["version"] for h in hist] == list(range(len(model)))


def test_optimize_clusters_for_data_skipping(spark, tmp_path):
    """Organic appends interleave the key range, so min/max stats prune
    NOTHING; OPTIMIZE cluster_by rewrites range-partitioned + sorted in
    one commit, after which per-file key ranges are disjoint and a
    selective predicate prunes to O(1) files. Old snapshots still read
    the pre-optimize layout (time travel untouched)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    # 4 appends, each spanning the FULL key range (id % 4 slices)
    for m in range(4):
        df = (
            spark.range(0, 4000)
            .filter(F.col("id") % 4 == m)
            .select("id", (F.col("id") * 3).alias("v"))
            .coalesce(1)
        )
        t.create(df) if m == 0 else t.append(df)

    where = [("id", ">=", 3600)]
    assert len(t.files_scanned(where)) == 4  # every file spans the range
    pre_rows = sorted(r["id"] for r in t.read(where=where).collect())

    v = t.optimize(cluster_by=["id"], target_files=8)
    assert v == 4  # one commit

    scanned = t.files_scanned(where)
    assert len(t.snapshot().files) == 8
    assert len(scanned) == 1  # disjoint ranges: top decile lives in one file
    assert sorted(r["id"] for r in t.read(where=where).collect()) == pre_rows
    assert t.read().count() == 4000

    # time travel: version 3 still resolves the pre-optimize files
    assert len(t.snapshot(3).files) == 4
    assert t.read(3).count() == 4000


def test_optimize_without_cluster_compacts(spark, tmp_path):
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.range(0, 100).repartition(16).select("id"))
    assert len(t.snapshot().files) == 16
    t.optimize(target_files=2)
    assert len(t.snapshot().files) <= 2
    assert t.read().count() == 100


def _sha(path: str) -> str:
    import hashlib

    with open(path, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def test_optimize_incremental_keeps_wellsized_files_byte_identical(
    spark, tmp_path
):
    """Round-10 (verdict item 2): bare OPTIMIZE is INCREMENTAL — only
    under-sized files (per the LOGGED footer stats) are compacted;
    well-sized files' log entries AND bytes on disk stay identical, so
    routine compaction of a 100 TB table costs O(small-file bytes)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    # two well-sized files (500 rows each) + six tiny appends (10 rows)
    t.create(_r(spark, 0, 1000).repartition(2))
    for i in range(6):
        t.append(_r(spark, 1000 + i * 10, 1000 + (i + 1) * 10).coalesce(1))
    snap0 = t.snapshot()
    assert len(snap0.files) == 8
    big = [f for f in snap0.files if snap0.stats[f]["numRecords"] > 400]
    assert len(big) == 2
    big_sha = {f: _sha(os.path.join(t.path, f)) for f in big}
    pre = sorted((r.id, r.v) for r in t.read().collect())

    # total=1060, target_files=4 -> target_rows=265: the 500-row files
    # are well-sized, the 10-row files are candidates
    v = t.optimize(target_files=4)
    assert v == snap0.version + 1  # exactly one commit
    after = t.snapshot()
    for f in big:  # untouched: same log entry, same bytes
        assert f in after.files
        assert _sha(os.path.join(t.path, f)) == big_sha[f]
        assert after.stats[f] == snap0.stats[f]
    small_after = [f for f in after.files if f not in big]
    assert len(small_after) == 1  # 60 rows pack into one file
    assert sorted((r.id, r.v) for r in t.read().collect()) == pre


def test_optimize_target_bytes_candidacy_on_skewed_row_widths(
    spark, tmp_path
):
    """Round-11 (round-10 verdict "What's wrong" #3): ``target_bytes``
    bin-packs on ON-DISK BYTES like Delta. A wide-row file (few rows,
    100 KB-ish texts) is row-small but byte-huge — row-based candidacy
    would misclassify it as compactable; byte-based candidacy keeps it
    byte-identical and repacks only the byte-tiny files."""
    from pyspark.sql import functions as F

    t = TxnTable(spark, str(tmp_path / "t"))
    # wide-row file: 20 rows x ~50 KB of incompressible-ish text
    wide = spark.range(0, 20).select(
        "id",
        F.concat_ws(
            "", F.transform(
                F.sequence(F.lit(1), F.lit(2000)),
                lambda i: F.sha2((F.col("id") * 10000 + i).cast("string"), 256),
            )
        ).alias("v"),
    )
    t.create(wide.coalesce(1))
    # byte-tiny appends: many rows, short strings
    for i in range(4):
        t.append(
            spark.range(100 + i * 50, 100 + (i + 1) * 50)
            .select("id", F.lit("x").alias("v"))
            .coalesce(1)
        )
    snap0 = t.snapshot()
    assert len(snap0.files) == 5
    wide_f = max(snap0.files, key=lambda f: snap0.stats[f]["sizeBytes"])
    assert snap0.stats[wide_f]["numRecords"] == 20  # row-small
    wide_sha = _sha(os.path.join(t.path, wide_f))
    pre = sorted((r.id, r.v) for r in t.read().collect())

    # row-based candidacy WOULD have flagged the wide file (20 < any
    # sane row target); byte-based keeps it: 1 MB threshold is far
    # under the wide file's ~1.2 MB and far over the tiny files'
    wide_bytes = snap0.stats[wide_f]["sizeBytes"]
    assert wide_bytes > 1024 * 1024
    v = t.optimize(target_bytes=1024 * 1024)
    assert v == snap0.version + 1
    after = t.snapshot()
    assert wide_f in after.files
    assert _sha(os.path.join(t.path, wide_f)) == wide_sha  # byte-identical
    assert after.stats[wide_f] == snap0.stats[wide_f]
    assert len(after.files) == 2  # 4 tiny files packed into 1
    assert sorted((r.id, r.v) for r in t.read().collect()) == pre

    # nothing under a 1-byte target -> zero candidates -> no-op that
    # preserves the version (same guard discipline as the row path)
    assert t.optimize(target_bytes=1) == after.version


def test_optimize_target_bytes_stat_fallback_for_presize_logs(
    spark, tmp_path
):
    """Log entries committed before the ``sizeBytes`` stat existed
    fall back to a driver-side stat() at decision time — byte-based
    candidacy still routes correctly on an old log."""
    import json as _json

    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(_r(spark, 0, 1000).repartition(2))
    for i in range(3):
        t.append(_r(spark, 1000 + i * 10, 1000 + (i + 1) * 10).coalesce(1))
    # simulate a pre-field log: strip sizeBytes from every entry
    for name in os.listdir(t.log_path):
        if not name.endswith(".json") or name.startswith("."):
            continue
        p = os.path.join(t.log_path, name)
        with open(p) as fh:
            entry = _json.load(fh)
        for a in entry.get("actions", []):
            if isinstance(a.get("stats"), dict):
                a["stats"].pop("sizeBytes", None)
        with open(p, "w") as fh:
            _json.dump(entry, fh)
    snap0 = t.snapshot()
    assert all("sizeBytes" not in s for s in snap0.stats.values())
    big = [f for f in snap0.files if snap0.stats[f]["numRecords"] > 400]
    # target between the tiny and big sizes: tiny files are candidates
    # AND pack into one output (cand_bytes / target rounds up to 1)
    target = min(
        os.path.getsize(os.path.join(t.path, f)) for f in big
    )
    pre = sorted((r.id, r.v) for r in t.read().collect())
    t.optimize(target_bytes=target)
    after = t.snapshot()
    for f in big:
        assert f in after.files  # byte-huge: untouched via stat fallback
    assert len(after.files) == len(big) + 1  # tiny files packed
    assert sorted((r.id, r.v) for r in t.read().collect()) == pre


def test_optimize_incremental_noop_runs_zero_jobs(spark, tmp_path):
    """Candidate selection routes on logged stats only: when nothing is
    under-sized (or packing would not shrink the file count) OPTIMIZE
    returns the current version without running ANY Spark job and
    without committing."""
    from tests.test_sqldml import _job_executions_after, _last_exec_id

    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(_r(spark, 0, 1000).repartition(4))  # 4 x 250 rows
    t2 = TxnTable(spark, str(tmp_path / "t2"))
    t2.create(_r(spark, 0, 450).repartition(2))
    v0 = t.snapshot().version
    v2 = t2.snapshot().version
    floor = _last_exec_id(spark)
    # target_rows=250: every file is exactly target-sized -> no-op
    assert t.optimize(target_files=4) == v0
    # two files at 0.9x target: packing would not shrink -> no-op
    assert t2.optimize(target_rows=250) == v2
    assert _job_executions_after(spark, floor) == []
    assert t.snapshot().version == v0


def test_optimize_incremental_keeps_dv_for_untouched_files(spark, tmp_path):
    """Incremental OPTIMIZE materializes row-level deletes ONLY for the
    files it rewrites; the deletion vector is kept so untouched files'
    deletes stay invisible, and clears only on a full rewrite."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(_r(spark, 0, 1000).repartition(2))  # well-sized
    for i in range(4):
        t.append(_r(spark, 1000 + i * 10, 1000 + (i + 1) * 10).coalesce(1))
    t.delete_where_dv("id % 100 = 1")  # hits big AND small files
    pre = sorted(r.id for r in t.read().collect())
    assert t.snapshot().dv_file is not None

    t.optimize(target_files=4)
    after = t.snapshot()
    assert after.dv_file is not None  # untouched files still carry DV rows
    assert sorted(r.id for r in t.read().collect()) == pre
    # the rewritten small files materialized their deletes: a full
    # optimize afterwards clears the vector and content is unchanged
    t.optimize(full=True, target_files=2)
    assert t.snapshot().dv_file is None
    assert sorted(r.id for r in t.read().collect()) == pre


def test_optimize_cluster_defaults_full_and_incremental_cluster_opt_in(
    spark, tmp_path
):
    """cluster_by defaults to the whole-table rewrite (clustering is a
    layout-defining op); full=False with cluster_by clusters only the
    touched small files and leaves well-sized files byte-identical."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(_r(spark, 0, 1000).repartition(2))
    for i in range(4):
        t.append(_r(spark, 1000 + i * 10, 1000 + (i + 1) * 10).coalesce(1))
    snap0 = t.snapshot()
    big = [f for f in snap0.files if snap0.stats[f]["numRecords"] > 400]
    pre = sorted(r.id for r in t.read().collect())

    t.optimize(cluster_by=["id"], full=False, target_files=4)
    after = t.snapshot()
    assert all(f in after.files for f in big)  # untouched
    assert sorted(r.id for r in t.read().collect()) == pre

    t.optimize(cluster_by=["id"], target_files=4)  # default: full
    assert all(f not in t.snapshot().files for f in big)  # rewritten
    assert sorted(r.id for r in t.read().collect()) == pre


def test_schema_evolution_add_column_backfills_null(spark, tmp_path):
    """A column added by a later commit backfills NULL for pre-evolution
    files (the committed schema governs the read — Delta semantics);
    time travel to the pre-evolution version still shows the old
    schema."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, "a")], "id bigint, v string"))
    t.append(
        spark.createDataFrame([(2, "b", 9.5)], "id bigint, v string, score double")
    )
    cur = t.read().orderBy("id")
    assert cur.columns == ["id", "v", "score"]
    rows = cur.collect()
    assert rows[0]["score"] is None and rows[1]["score"] == 9.5

    old = t.read(0)
    assert old.columns == ["id", "v"]
    assert old.count() == 1


def test_optimize_zorder_prunes_both_dimensions(spark, tmp_path):
    # 64x64 grid: appended files span the full range of both keys, so
    # nothing prunes. Lexicographic clustering on (x, y) prunes x but
    # can never prune y; the Z-curve layout must prune BOTH.
    grid = spark.range(4096).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") / 64).cast("long") % 64).alias("y"),
        (F.col("id") * 3).alias("payload"),
    )
    zt = TxnTable(spark, str(tmp_path / "zt"))
    zt.create(grid.repartition(4))
    zt.optimize(cluster_by=["x", "y"], zorder=True, target_files=16, zorder_bits=6)

    lt = TxnTable(spark, str(tmp_path / "lt"))
    lt.create(grid.repartition(4))
    lt.optimize(cluster_by=["x", "y"], target_files=16)

    zfiles = zt.snapshot().files
    sx = zt.files_scanned([("x", "=", 5)])
    sy = zt.files_scanned([("y", "=", 9)])
    assert len(sx) < len(zfiles), "z-order must prune on the leading column"
    assert len(sy) < len(zfiles), "z-order must prune on the SECOND column"

    # lexicographic layout: every file spans the full y range
    sy_linear = lt.files_scanned([("y", "=", 9)])
    assert len(sy) < len(sy_linear), "z-order must beat lexicographic on y"

    # the rewrite is a pure layout change: same multiset of rows
    a = sorted((r.x, r.y, r.payload) for r in zt.read().collect())
    b = sorted((r.x, r.y, r.payload) for r in grid.collect())
    assert a == b
    # skipping stays an optimization, not a filter: reads agree
    assert zt.read(where=[("y", "=", 9)]).count() == 64


def test_idempotent_append_ledger(spark, t):
    t.create(_r(spark, 0, 10))
    assert t.last_batch("app") is None
    assert t.idempotent_append(_r(spark, 10, 20), "app", 0) is True
    assert t.idempotent_append(_r(spark, 10, 20), "app", 0) is False  # replay: no-op
    assert t.read().count() == 20
    assert t.last_batch("app") == 0
    # an older batch id is also a replay
    assert t.idempotent_append(_r(spark, 90, 95), "app", 0) is False
    # a NEW batch id lands; other app ids have independent ledgers
    assert t.idempotent_append(_r(spark, 20, 25), "app", 1) is True
    assert t.idempotent_append(_r(spark, 25, 30), "other", 0) is True
    assert t.read().count() == 30
    assert t.last_batch("app") == 1 and t.last_batch("other") == 0


def test_app_versions_survive_checkpoint_collapse(spark, t):
    # drive past CHECKPOINT_EVERY commits, then delete the pre-checkpoint
    # log entries: the ledger must still answer from the checkpoint
    from dbt_maxcompute_spark.txnlog import CHECKPOINT_EVERY

    t.create(_r(spark, 0, 5))
    for b in range(CHECKPOINT_EVERY + 2):
        t.idempotent_append(_r(spark, 100 + b, 101 + b), "ingest", b)
    snap = t.snapshot()
    assert snap.app_versions["ingest"] == CHECKPOINT_EVERY + 1
    cp = t._checkpoint_path(CHECKPOINT_EVERY)
    assert os.path.exists(cp)
    for v in range(CHECKPOINT_EVERY):
        os.unlink(t._entry_path(v))
    assert t.last_batch("ingest") == CHECKPOINT_EVERY + 1
    assert t.idempotent_append(_r(spark, 0, 1), "ingest", 3) is False


def test_deletion_vectors_row_level_delete(spark, t):
    t.create(_r(spark, 0, 100).coalesce(2))
    files_before = sorted(t.snapshot().files)
    v1 = t.delete_where_dv("v >= 100")  # ids 50..99 (v = id*2)
    assert sorted(r.id for r in t.read().collect()) == list(range(50))
    # NO data file was rewritten: same file set, the commit only set a DV
    assert sorted(t.snapshot().files) == files_before
    hist = t.history()
    assert hist[-1]["n_add"] == 0 and hist[-1]["n_remove"] == 0
    # time travel: the pre-delete snapshot still sees every row
    assert t.read(version=v1 - 1).count() == 100
    # second DV delete unions with the first
    t.delete_where_dv("id < 10")
    assert sorted(r.id for r in t.read().collect()) == list(range(10, 50))
    # deleting already-deleted rows is a no-op on the visible set
    t.delete_where_dv("id >= 40")
    assert sorted(r.id for r in t.read().collect()) == list(range(10, 40))


def test_deletion_vectors_null_condition_keeps_row(spark, t):
    df = spark.createDataFrame([(1, 5), (2, None), (3, 50)], "id bigint, v bigint")
    t.create(df)
    t.delete_where_dv("v > 10")
    assert sorted(r.id for r in t.read().collect()) == [1, 2]


def test_optimize_materializes_dv_and_vacuum_reclaims(spark, t):
    t.create(_r(spark, 0, 60).coalesce(3))
    t.delete_where_dv("id % 2 = 1")
    snap = t.snapshot()
    assert snap.dv_file is not None
    t.optimize(target_files=2)
    after = t.snapshot()
    assert after.dv_file is None  # deletions materialized
    assert sorted(r.id for r in t.read().collect()) == list(range(0, 60, 2))
    # superseded DV store is reclaimable once out of retention
    removed = t.vacuum(retain_versions=1, retention_seconds=0.0)
    assert any(d.startswith("dv-") for d in removed)
    # and the live table still reads
    assert t.read().count() == 30


def test_dv_with_data_skipping_where(spark, t):
    # skipping stays an optimization with a DV active: where-reads agree
    t.create(_r(spark, 0, 100).coalesce(4))
    t.delete_where_dv("id >= 90")
    got = sorted(r.id for r in t.read(where=[("id", ">=", 80)]).collect())
    assert got == list(range(80, 90))


def test_delete_insert_dv_upsert(spark, t):
    t.create(_r(spark, 0, 50).coalesce(2))
    files_before = set(t.snapshot().files)
    src = spark.createDataFrame(
        [(10, 999), (20, 888), (100, 111)], "id bigint, v bigint"
    )
    t.delete_insert_dv(src, ["id"])
    got = {r.id: r.v for r in t.read().collect()}
    assert got[10] == 999 and got[20] == 888 and got[100] == 111
    assert got[0] == 0 and got[30] == 60  # untouched rows intact
    assert len(got) == 51
    # no pre-existing file was removed
    assert files_before <= set(t.snapshot().files)
    assert t.history()[-1]["n_remove"] == 0
    # duplicate source keys rejected
    import pytest as _pytest

    dup = spark.createDataFrame([(1, 1), (1, 2)], "id bigint, v bigint")
    with _pytest.raises(ValueError):
        t.delete_insert_dv(dup, ["id"])
    # a second upsert touching already-upserted keys stays correct
    t.delete_insert_dv(
        spark.createDataFrame([(10, 1000)], "id bigint, v bigint"), ["id"]
    )
    got2 = {r.id: r.v for r in t.read().collect()}
    assert got2[10] == 1000 and len(got2) == 51


def test_delete_insert_dv_guard_adds_no_job(spark, t):
    """Round-9 (verdict item 4): the duplicate-key guard rides the
    committed job as an in-plan window-count + raise_error — an upsert
    WITH the guard runs exactly as many job-running executions as one
    explicitly opted out of it (no separate groupBy-count pass)."""
    from tests.test_sqldml import _job_executions_after, _last_exec_id

    t.create(_r(spark, 0, 50).coalesce(2))
    floor = _last_exec_id(spark)
    t.delete_insert_dv(
        spark.createDataFrame([(1, 10), (2, 20)], "id bigint, v bigint"), ["id"]
    )
    n_guarded = len(_job_executions_after(spark, floor))
    floor = _last_exec_id(spark)
    t.delete_insert_dv(
        spark.createDataFrame([(3, 30), (4, 40)], "id bigint, v bigint"),
        ["id"],
        allow_duplicate_keys=True,
    )
    n_unguarded = len(_job_executions_after(spark, floor))
    assert n_guarded == n_unguarded, (n_guarded, n_unguarded)
    # a failed duplicate batch commits nothing and the table stays usable
    import pytest as _pytest

    v_before = t.latest_version()
    dup = spark.createDataFrame([(7, 1), (7, 2)], "id bigint, v bigint")
    with _pytest.raises(ValueError, match="duplicate key"):
        t.delete_insert_dv(dup, ["id"])
    assert t.latest_version() == v_before
    t.delete_insert_dv(
        spark.createDataFrame([(7, 70)], "id bigint, v bigint"), ["id"]
    )
    got = {r.id: r.v for r in t.read().collect()}
    assert got[7] == 70 and got[1] == 10 and len(got) == 50


def test_concurrent_writers_all_land_versions_dense(spark, t):
    """True concurrency (round-4 verdict item 7): N barrier-started
    writer threads x M appends each, every append retried through the
    optimistic loop. All N*M commits must land, versions must be dense
    0..N*M, and the final row count must equal the sum of all appends —
    no lost update, no double-land."""
    import threading

    t.create(_r(spark, 0, 10))
    n_writers, n_appends = 4, 3
    barrier = threading.Barrier(n_writers)
    errors: list[Exception] = []

    def writer(wid: int) -> None:
        try:
            barrier.wait(timeout=30)
            for j in range(n_appends):
                lo = 1000 * (wid + 1) + 10 * j
                df = _r(spark, lo, lo + 10)
                for _ in range(64):  # optimistic retry loop
                    try:
                        t.append(df)
                        break
                    except CommitConflict:
                        continue
                else:
                    raise RuntimeError(f"writer {wid} starved")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    total = n_writers * n_appends
    assert t.latest_version() == total
    versions = sorted(
        int(f.split(".")[0]) for f in os.listdir(t.log_path)
        if f.endswith(".json") and not f.startswith(".") and "checkpoint" not in f
    )
    assert versions == list(range(total + 1))  # dense, no gaps
    assert t.read().count() == 10 + total * 10


def test_concurrent_idempotent_append_lands_exactly_once(spark, t):
    """The round-4 advisor TOCTOU: two threads replaying the SAME
    (app_id, batch_id) concurrently must land the batch exactly once —
    the commit is pinned to the snapshot the ledger check used, so the
    loser's retry re-reads the ledger and skips."""
    import threading

    t.create(_r(spark, 0, 10))
    barrier = threading.Barrier(2)
    outcomes: list[bool] = []
    errors: list[Exception] = []

    def replayer() -> None:
        try:
            barrier.wait(timeout=30)
            outcomes.append(
                t.idempotent_append(_r(spark, 100, 110), "appA", batch_id=1)
            )
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=replayer) for _ in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert not errors, errors
    assert sorted(outcomes) == [False, True]  # exactly one appended
    assert t.read().count() == 20
    assert t.last_batch("appA") == 1


def test_concurrent_dv_upserts_converge(spark, t):
    """Racing DV upserts on disjoint key ranges, each retried through
    the conflict loop: both commits land and the final visible state
    reflects BOTH upserts (DV + adds are atomic per commit)."""
    import threading

    t.create(_r(spark, 0, 40))
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def upserter(lo: int) -> None:
        try:
            barrier.wait(timeout=30)
            df = _r(spark, lo, lo + 10, mult=100)
            for _ in range(32):
                try:
                    t.delete_insert_dv(df, ["id"])
                    return
                except CommitConflict:
                    continue
            raise RuntimeError("starved")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=upserter, args=(lo,)) for lo in (0, 20)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    rows = {r.id: r.v for r in t.read().collect()}
    assert len(rows) == 40
    for i in list(range(0, 10)) + list(range(20, 30)):
        assert rows[i] == i * 100, (i, rows[i])
    for i in list(range(10, 20)) + list(range(30, 40)):
        assert rows[i] == i * 2, (i, rows[i])


def test_change_feed_append_only_fast_path(spark, t):
    """Append-only interval: the feed scans ONLY the added files —
    no exceptAll, no shuffle, no from-snapshot read."""
    t.create(_r(spark, 0, 100))
    t.append(_r(spark, 100, 150))
    t.append(_r(spark, 150, 170))
    feed = t.change_feed(0)
    rows = sorted(r.id for r in feed.collect())
    assert rows == list(range(100, 170))
    assert feed.filter(F.col("_change_type") != "insert").count() == 0
    # plan fact: only the 2 appended commits' files are in the scan
    files = {f.split("/")[-1] for f in feed.inputFiles()}
    v0_files = set(t.snapshot(0).files)
    assert not (files & v0_files)
    # no shuffle in the fast path
    plan = feed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_change_feed_general_path_with_dv_delete(spark, t):
    t.create(_r(spark, 0, 50))
    t.delete_where_dv("id < 10")
    t.append(_r(spark, 100, 110))
    feed = t.change_feed(0)
    by_type = {
        k: sorted(r["id"] for r in g)
        for k, g in __import__("itertools").groupby(
            sorted(feed.collect(), key=lambda r: r["_change_type"]),
            key=lambda r: r["_change_type"],
        )
    }
    assert by_type["delete"] == list(range(0, 10))
    assert by_type["insert"] == list(range(100, 110))


def test_change_feed_update_is_delete_plus_insert(spark, t):
    t.create(_r(spark, 0, 20))
    t.delete_insert_dv(_r(spark, 5, 8, mult=100), ["id"])
    feed = t.change_feed(0, 1)
    got = sorted((r.id, r.v, r._change_type) for r in feed.collect())
    want = sorted(
        [(i, i * 2, "delete") for i in (5, 6, 7)]
        + [(i, i * 100, "insert") for i in (5, 6, 7)]
    )
    assert got == want


def test_delete_dv_after_empty_commits_regression(spark, tmp_path):
    """Pinned round-6 regression (judge's falsifying example): an empty
    create + an empty-source upsert poisoned the table for every later
    conditional DELETE — the snapshot carried zero-row data files, the
    DV write planned zero tasks, and the in-plan count crashed. Fixed
    two ways: _stage_files never commits zero-row files, and the count
    now comes from DV parquet footers (no Observation to lose)."""

    def df_of(rows):
        return spark.createDataFrame(rows, "id bigint, v bigint")

    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(df_of([]))
    t.delete_insert_dv(df_of([]), ["id"])
    v, n = t.delete_where_dv("id < 5", return_count=True)
    assert (v, n) == (2, 0)
    assert t.read().count() == 0

    # judge's exact shrunk sequence: create([]) → append([(0,0)]) →
    # upsert_dv([]) → delete_dv(0)
    t2 = TxnTable(spark, str(tmp_path / "t2"))
    t2.create(df_of([]))
    t2.append(df_of([(0, 0)]))
    t2.delete_insert_dv(df_of([]), ["id"])
    v, n = t2.delete_where_dv("id < 0", return_count=True)
    assert n == 0
    assert sorted((r.id, r.v) for r in t2.read().collect()) == [(0, 0)]
    v, n = t2.delete_where_dv("id >= 0", return_count=True)
    assert n == 1
    assert t2.read().count() == 0


def test_delete_dv_footer_count_with_prior_dv(spark, tmp_path):
    """Affected-row counts stay exact across chained DV deletes (the
    footer-difference count must subtract the carried-over store)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(_r(spark, 0, 10))
    assert t.delete_where_dv("id < 3", return_count=True)[1] == 3
    assert t.delete_where_dv("id < 5", return_count=True)[1] == 2
    assert t.delete_where_dv("id < 5", return_count=True)[1] == 0
    assert sorted(r.id for r in t.read().collect()) == [5, 6, 7, 8, 9]


def test_stage_files_drops_zero_row_files(spark, tmp_path):
    """No committed snapshot ever names a zero-row data file."""
    t = TxnTable(spark, str(tmp_path / "t"))
    # many empty partitions: the writer may emit empty part files
    t.create(spark.range(0, 4).repartition(8).select("id"))
    t.append(spark.createDataFrame([], "id bigint"))
    for ver in (0, 1):
        snap = t.snapshot(ver)
        for f in snap.files:
            assert (snap.stats.get(f) or {}).get("numRecords", 1) > 0


# -- round-7: DV-reconstructed change feed -----------------------------------


def _feed_rows(df):
    return sorted(
        (r["id"], r["v"], r["_change_type"]) for r in df.collect()
    )


def _expected_feed(t, v0, v1):
    """General-path semantics computed directly: multiset diff of the
    two snapshot reads."""
    new, old = t.read(v1), t.read(v0)
    ins = new.exceptAll(old).collect()
    dele = old.exceptAll(new).collect()
    return sorted(
        [(r["id"], r["v"], "insert") for r in ins]
        + [(r["id"], r["v"], "delete") for r in dele]
    )


def test_change_feed_dv_fast_path_matches_general_semantics(spark, t):
    """An adds+DV interval (upsert + delete, the everyday CDC case)
    takes the reconstruction path and produces EXACTLY the general
    path's multiset feed — including a same-interval add-then-delete
    landing in neither list."""
    t.create(_r(spark, 0, 20))
    v0 = t.latest_version()
    t.delete_where_dv("id < 3")                      # 3 deletes
    t.delete_insert_dv(_r(spark, 5, 8, mult=7), ["id"])  # upsert 5,6,7
    t.append(_r(spark, 100, 103))                    # 3 inserts
    t.delete_where_dv("id = 101")                    # added then deleted
    v1 = t.latest_version()
    feed = t.change_feed(v0, v1, strategy="dv")
    assert _feed_rows(feed) == _expected_feed(t, v0, v1)
    got = {(r[0], r[2]) for r in _feed_rows(feed)}
    assert (101, "insert") not in got and (101, "delete") not in got
    assert (5, "insert") in got and (5, "delete") in got  # upsert pair


def test_change_feed_dv_scan_is_pruned_to_affected_files(spark, tmp_path):
    """The DV interval's delete reconstruction scans ONLY files the DV
    delta names — on a many-file table the untouched files never enter
    the plan (the 100 TB contract of the fast path)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    # 8 appends, one file each, disjoint id ranges
    for m in range(8):
        df = _r(spark, m * 10, m * 10 + 10).coalesce(1)
        t.create(df) if m == 0 else t.append(df)
    v0 = t.latest_version()
    t.delete_where_dv("id = 5")  # touches exactly ONE data file
    feed = t.change_feed(v0, strategy="dv")
    assert _feed_rows(feed) == _expected_feed(t, v0, t.latest_version())
    data_files = {
        f for f in (feed.inputFiles() or []) if "/dv-" not in f
    }
    assert len(data_files) == 1, data_files


def test_change_feed_auto_routing_is_metadata_only(spark, t):
    """`auto` routes on logged stats without Spark jobs: a toy table
    (churn ~ table) takes the general path; the same log with a huge
    claimed base would take the DV path; a no-op interval short-
    circuits to an empty feed."""
    t.create(_r(spark, 0, 20))
    v0 = t.latest_version()
    t.delete_where_dv("id < 3")
    f_snap, t_snap = t.snapshot(v0), t.snapshot()
    adds = []  # the DV delete added no files
    assert t._dv_feed_pays(f_snap, t_snap, adds) is False  # 20-row base
    # same shapes, big base: pretend every base file holds 1M rows
    from dataclasses import replace as _dc_replace

    big = {f: {**(f_snap.stats.get(f) or {}), "numRecords": 1_000_000}
           for f in f_snap.files}
    f_big = _dc_replace(f_snap, stats={**f_snap.stats, **big})
    t_big = _dc_replace(t_snap, stats={**t_snap.stats, **big})
    assert t._dv_feed_pays(f_big, t_big, adds) is True
    # unknown stats (foreign log) choose the scale-safe DV path
    nostats = _dc_replace(f_snap, stats={})
    assert t._dv_feed_pays(nostats, t_snap, adds) is True
    # no-op interval: empty feed
    v1 = t.latest_version()
    assert t.change_feed(v1, v1).count() == 0


def test_change_feed_rewrite_interval_uses_general_path(spark, t):
    """An interval containing a file rewrite (overwrite / COW delete)
    still nets correctly through the general path."""
    t.create(_r(spark, 0, 10))
    v0 = t.latest_version()
    t.delete_where_dv("id < 2")
    t.overwrite(_r(spark, 5, 12, mult=3))
    v1 = t.latest_version()
    assert _feed_rows(t.change_feed(v0, v1)) == _expected_feed(t, v0, v1)


from hypothesis import given as _given  # noqa: E402
from hypothesis import settings as _settings  # noqa: E402


@_given(ops=_op_sequences())
@_settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_change_feed_equals_snapshot_diff_for_any_dml(
    spark, tmp_path_factory, ops
):
    """For ANY DML sequence and ANY version interval, the feed equals
    the multiset snapshot diff — whichever path (append-only, DV
    reconstruction, general) the log routes it to."""
    t = TxnTable(spark, str(tmp_path_factory.mktemp("cf") / "t"))

    def df_of(rows):
        return spark.createDataFrame(rows, "id bigint, v bigint")

    n_ops = 0
    for kind, arg in ops:
        n_ops += 1
        if kind == "create":
            t.create(df_of(arg))
        elif kind == "append":
            t.append(df_of(arg))
        elif kind == "overwrite":
            t.overwrite(df_of(arg))
        elif kind == "delete":
            t.delete_where(f"id < {arg}")
        elif kind == "delete_dv":
            t.delete_where_dv(f"id < {arg}")
        elif kind == "optimize":
            # round-10: a content-neutral compaction commit in the
            # interval — the feed must net the rewrite to zero changes
            t.optimize(target_rows=arg)
        else:
            t.delete_insert_dv(df_of(arg), ["id"])
        if n_ops == 2:
            # fold a DV UPDATE into every long-enough sequence: its
            # adds+set_dv commit shape must feed-reconstruct too
            t.update_where_dv({"v": "v + 1000"}, "id % 2 = 1")
    latest = t.latest_version()
    for v0 in {0, latest // 2, max(0, latest - 1)}:
        want = _expected_feed(t, v0, latest)
        for strat in ("auto", "dv"):
            assert (
                _feed_rows(t.change_feed(v0, latest, strategy=strat)) == want
            ), f"interval ({v0}, {latest}] strategy={strat}"


# -- round-7: keyed change feed (Delta CDF four-type form) --------------------


def test_change_feed_keyed_classifies_updates(spark, t):
    """A key present at both endpoints with a DIFFERENT value emits its
    update_preimage/postimage pair; unchanged keys emit nothing; pure
    adds/removes classify as insert/delete."""
    t.create(_r(spark, 0, 10))           # ids 0..9, v = 2*id
    v0 = t.latest_version()
    t.delete_insert_dv(_r(spark, 3, 5, mult=9), ["id"])   # update 3,4
    t.delete_insert_dv(_r(spark, 5, 6, mult=2), ["id"])   # no-op upsert of 5
    t.delete_where_dv("id = 0")                           # delete 0
    t.append(_r(spark, 100, 102))                         # insert 100,101
    rows = {
        (r["id"], r["v"], r["_change_type"])
        for r in t.change_feed_keyed(["id"], v0).collect()
    }
    assert rows == {
        (3, 6, "update_preimage"), (3, 27, "update_postimage"),
        (4, 8, "update_preimage"), (4, 36, "update_postimage"),
        (0, 0, "delete"),
        (100, 200, "insert"), (101, 202, "insert"),
    }


def test_change_feed_keyed_raises_on_duplicate_keys(spark, t):
    t.create(spark.createDataFrame([(1, 10), (1, 20)], "id long, v long"))
    v0 = t.latest_version()
    t.delete_where_dv("id = 1")  # feed: TWO deletes for key 1
    import pytest as _pytest

    with _pytest.raises(Exception, match="not unique"):
        t.change_feed_keyed(["id"], v0).collect()


def test_change_feed_keyed_matches_endpoint_join(spark, t):
    """Oracle form: classify by full-outer-joining the endpoint
    snapshots on the key; keyed feed must agree for a mixed interval
    including a rewrite (general path)."""
    t.create(_r(spark, 0, 30))
    v0 = t.latest_version()
    t.delete_where_dv("id % 7 = 0")
    t.overwrite(_r(spark, 10, 40, mult=5))
    old, new = t.read(v0).alias("o"), t.read().alias("n")
    j = old.join(new, ["id"], "full_outer").select(
        "id", F.col("o.v").alias("ov"), F.col("n.v").alias("nv")
    )
    want = set()
    for r in j.collect():
        if r["ov"] is None:
            want.add((r["id"], r["nv"], "insert"))
        elif r["nv"] is None:
            want.add((r["id"], r["ov"], "delete"))
        elif r["ov"] != r["nv"]:
            want.add((r["id"], r["ov"], "update_preimage"))
            want.add((r["id"], r["nv"], "update_postimage"))
    got = {
        (r["id"], r["v"], r["_change_type"])
        for r in t.change_feed_keyed(["id"], v0).collect()
    }
    assert got == want


# -- round-7: DV-based UPDATE -------------------------------------------------


def test_update_where_dv_rewrites_only_matched(spark, t):
    t.create(_r(spark, 0, 10))          # v = 2*id
    v0 = t.latest_version()
    v, affected = t.update_where_dv({"v": "v + 100"}, "id < 3", return_count=True)
    assert affected == 3 and v == v0 + 1
    got = {r["id"]: r["v"] for r in t.read().collect()}
    assert got[0] == 100 and got[2] == 104 and got[5] == 10
    # time travel: pre-update snapshot intact
    old = {r["id"]: r["v"] for r in t.read(v0).collect()}
    assert old[0] == 0
    # the commit is adds + set_dv (DV-reconstructable history: the
    # change feed classifies it as update pairs)
    feed = {
        (r["id"], r["_change_type"])
        for r in t.change_feed_keyed(["id"], v0).collect()
    }
    assert (0, "update_preimage") in feed and (0, "update_postimage") in feed
    assert not any(k == 5 for k, _ in feed)


def test_update_where_dv_no_match_is_noop_version(spark, t):
    t.create(_r(spark, 0, 10))
    snap0 = t.snapshot()
    v, affected = t.update_where_dv({"v": "0"}, "id = 999", return_count=True)
    assert affected == 0 and v == snap0.version + 1
    assert t.snapshot().dv_file == snap0.dv_file
    assert t.read().count() == 10


def test_update_where_dv_set_sees_pre_update_row(spark, t):
    """Chained SETs must both read the PRE-update row (SQL UPDATE
    semantics), not each other's outputs."""
    df = spark.createDataFrame([(1, 10, 100)], "id long, a long, b long")
    t.create(df)
    t.update_where_dv({"a": "b", "b": "a"}, "id = 1")
    r = t.read().collect()[0]
    assert (r["a"], r["b"]) == (100, 10)  # swapped, not b,b


def test_change_feed_keyed_key_only_table(spark, t):
    """All columns are keys: updates are impossible (same key = same
    row, which nets out), classification is pure insert/delete."""
    t.create(spark.range(5).select("id"))
    v0 = t.latest_version()
    t.delete_where_dv("id >= 3")
    t.append(spark.range(10, 12).select("id"))
    rows = sorted(
        (r["id"], r["_change_type"])
        for r in t.change_feed_keyed(["id"], v0).collect()
    )
    assert rows == [(3, "delete"), (4, "delete"), (10, "insert"), (11, "insert")]


# -- round-8: RESTORE (rollback-as-a-commit) ---------------------------------

def test_restore_rolls_back_metadata_only(spark, t):
    """RESTORE commits a NEW version equal to the target snapshot —
    no data moves, history preserved, change feed nets it out."""
    t.create(_r(spark, 0, 100))                       # v0
    t.delete_where_dv("id < 20")                      # v1 (DV)
    t.append(_r(spark, 100, 120))                     # v2
    assert t.read().count() == 100  # 80 + 20 appended
    new_v = t.restore(0)
    assert new_v == 3                                  # a commit, not a rewind
    assert t.read().count() == 100
    assert sorted(r.id for r in t.read().collect()) == list(range(100))
    # the rolled-back interval still time-travels
    assert t.read(version=2).count() == 100
    assert sorted(r.id for r in t.read(2).collect()) == list(range(20, 120))
    # change feed across the restore nets to zero vs v0
    feed = t.change_feed(0)
    assert feed.count() == 0
    # restore FORWARD to v2 works too (files still on disk)
    t.restore(2)
    assert sorted(r.id for r in t.read().collect()) == list(range(20, 120))
    # restoring to the already-current state commits nothing
    v_before = t.latest_version()
    assert t.restore(2) == v_before


def test_restore_preserves_idempotence_ledger(spark, t):
    t.create(_r(spark, 0, 10))
    assert t.idempotent_append(_r(spark, 10, 20), "appA", 7) is True
    t.restore(0)
    # the streaming cursor survives the rollback (Delta txn semantics):
    # a replay of batch 7 must still be a no-op
    assert t.last_batch("appA") == 7
    assert t.idempotent_append(_r(spark, 10, 20), "appA", 7) is False
    assert t.read().count() == 10


def test_restore_blocked_after_vacuum(spark, t):
    t.create(_r(spark, 0, 50))                        # v0
    t.overwrite(_r(spark, 0, 5))                      # v1 (v0 files dead)
    t.vacuum(retain_versions=1, retention_seconds=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        t.restore(0)
    # table unchanged: nothing was committed
    assert t.read().count() == 5


def test_sql_restore_statement(spark, tmp_path):
    from dbt_maxcompute_spark.catalog import EngineCatalog

    cat = EngineCatalog(spark, str(tmp_path / "wh_restore"))
    df = spark.range(30).select(F.col("id"), (F.col("id") * 2).alias("v"))
    cat.create_table("rt", df, transactional=True, primary_keys=["id"])
    cat.execute("DELETE FROM rt WHERE id >= 10")
    hist = {e["version"]: e["committed_at"] for e in cat.txn("rt").history()}
    assert cat.read("rt").count() == 10
    out = cat.execute("RESTORE TABLE rt TO VERSION AS OF 0").collect()[0]
    assert out.operation == "RESTORE"
    assert cat.read("rt").count() == 30
    # timestamp form: resolve to the post-delete snapshot. Use EXACTLY
    # version 1's commit instant (AS-OF is at-or-before, so it resolves
    # v1) — any synthetic offset past it can overshoot the restore
    # commit when the host is slow between commits (observed flake)
    from datetime import datetime, timezone

    ts = datetime.fromtimestamp(hist[1], timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%S.%f+00:00"
    )
    cat.execute(f"RESTORE TABLE rt TO TIMESTAMP AS OF '{ts}'")
    assert cat.read("rt").count() == 10
    # non-transactional target raises
    cat.create_table("plain_rt", spark.range(3).selectExpr("id"))
    with pytest.raises(ValueError, match="transactional"):
        cat.execute("RESTORE TABLE plain_rt TO VERSION AS OF 0")


def test_footer_stats_tolerate_decimal_columns(spark, tmp_path):
    """pyarrow cannot extract min/max statistics for DECIMAL parquet
    columns (ArrowNotImplementedError on Statistics.min) — a txn table
    with a decimal column must still stage, commit, and skip on its
    OTHER columns rather than crash the stats job (round-10: surfaced
    by the type-literal parity row)."""
    t = TxnTable(spark, str(tmp_path / "t"))
    df = spark.sql(
        "SELECT id, CAST(id AS DECIMAL(12,2)) AS amt FROM range(100)"
    ).coalesce(1)
    t.create(df)
    t.append(
        spark.sql(
            "SELECT id, CAST(id AS DECIMAL(12,2)) AS amt "
            "FROM range(100, 200)"
        ).coalesce(1)
    )
    snap = t.snapshot()
    for f in snap.files:
        st = snap.stats[f]
        assert st["numRecords"] == 100
        assert "amt" not in st["min"]  # decimal: no min/max, never prunes
        assert "id" in st["min"]  # other columns still skip
    assert len(t.files_scanned([("id", ">=", 150)])) == 1
    assert t.read(where=[("amt", ">=", 0)]).count() == 200  # conservative scan


def test_optimize_target_bytes_counts_known_zero_sizes_as_zero(
    spark, tmp_path
):
    """Round-11 advisory: a logged sizeBytes of 0 must contribute 0 to
    cand_bytes — `sizes[f] or target` treated known-zero like UNKNOWN
    (a full target-size bin each), so enough zero-logged files inflated
    k past len(candidates) and the compaction silently no-opped."""
    import json as _json

    t = TxnTable(spark, str(tmp_path / "t"))
    t.create(spark.range(0, 10).coalesce(1))
    for i in range(4):
        t.append(spark.range(10 + i * 5, 15 + i * 5).coalesce(1))
    # rewrite the log so every append's sizeBytes reads 0 (a writer
    # that logged zero sizes); content on disk is untouched
    for name in sorted(os.listdir(t.log_path)):
        if not name.endswith(".json") or name.startswith("."):
            continue
        p = os.path.join(t.log_path, name)
        with open(p) as fh:
            entry = _json.load(fh)
        if entry["version"] == 0:
            continue
        for a in entry["actions"]:
            if "add" in a and a.get("stats"):
                a["stats"]["sizeBytes"] = 0
        os.chmod(p, 0o644)
        with open(p, "w") as fh:
            _json.dump(entry, fh)
    snap0 = t.snapshot()
    pre = sorted(r.id for r in t.read().collect())
    zeroed = [f for f in snap0.files if snap0.stats[f]["sizeBytes"] == 0]
    assert len(zeroed) == 4
    # target above the create file's real size: EVERY file a candidate;
    # with the fix cand_bytes = create_size + 0*4 -> k=1 < 5 -> packs.
    # With the `or` bug cand_bytes = create_size + 4*target -> k=5 ->
    # no-op.
    big = max(snap0.stats[f]["sizeBytes"] for f in snap0.files)
    v = t.optimize(target_bytes=big + 1)
    assert v == snap0.version + 1, "zero-size files must still pack"
    after = t.snapshot()
    assert len(after.files) < len(snap0.files)
    assert sorted(r.id for r in t.read().collect()) == pre


def test_commit_timestamp_microsecond_roundtrip(spark, tmp_path):
    """Round-12 verdict item 2: committed_at is stored PRE-QUANTIZED to
    integer microseconds, so a timestamp literal copied from any
    commit's own timestamp (the datetime.fromtimestamp + '%f' path a
    user naturally takes from history()) ALWAYS resolves that commit —
    never the previous one by a 1 µs rounding disagreement."""
    from datetime import datetime, timezone

    from dbt_maxcompute_spark.catalog import EngineCatalog
    from dbt_maxcompute_spark.plans.sqldml import _us, _version_at_timestamp
    from dbt_maxcompute_spark.txnlog import _quantized_now

    # pure property first, over adversarial sub-µs fractions: the
    # stored float must round-trip exactly through BOTH consumers
    for frac in (0.0, 0.4999995e-6, 0.5000005e-6, 0.9999994e-6):
        base = 1_767_225_600.123456  # 2026-01-01-ish epoch
        q = int(round((base + frac) * 1_000_000)) / 1_000_000
        assert _us(q) == int(round(q * 1_000_000))
        dt = datetime.fromtimestamp(q, timezone.utc)
        assert _us(dt.timestamp()) == _us(q)
    q = _quantized_now()
    assert q == int(round(q * 1_000_000)) / 1_000_000

    cat = EngineCatalog(spark, str(tmp_path / "wh_usrt"))
    df = spark.range(5).select(F.col("id"), (F.col("id") * 2).alias("v"))
    cat.create_table("usrt", df, transactional=True, primary_keys=["id"])
    for i in range(4):
        cat.execute(f"DELETE FROM usrt WHERE id = {i}")
    for e in cat.txn("usrt").history():
        at = e["committed_at"]
        # stored representation IS µs-quantized
        assert at == int(round(at * 1_000_000)) / 1_000_000
        lit = datetime.fromtimestamp(at, timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S.%f+00:00"
        )
        assert _version_at_timestamp(cat, "usrt", lit) == e["version"]


def test_dv_probe_staged_and_feed_paths_agree(spark, tmp_path, monkeypatch):
    """r13 §12: the upsert's broadcast key probe now reads the staged
    insert files back instead of re-executing the feed plan. Both paths
    must produce identical visible rows, identical DV row counts, and
    the same duplicate-key rejection — on a feed whose plan is NOT a
    trivial literal frame (agg + join), so the staged readback is
    genuinely exercised."""
    import pytest as _pytest

    def feed(mult):
        # aggregated + self-joined feed: an expensive plan shape
        base = spark.range(0, 40).select(
            (F.col("id") % 10).alias("id"), (F.col("id") * mult).alias("x")
        )
        agg = base.groupBy("id").agg(F.sum("x").alias("v"))
        dim = spark.range(0, 10).select(F.col("id"), (F.col("id") + 1).alias("w"))
        return agg.join(dim, "id").select("id", (F.col("v") * F.col("w")).alias("v"))

    got = {}
    for mode in ("staged", "feed"):
        monkeypatch.setenv("SPARK_GRAFT_DV_PROBE", mode)
        t = TxnTable(spark, str(tmp_path / f"probe_{mode}"))
        t.create(_r(spark, 0, 30).coalesce(2))
        t.delete_insert_dv(feed(3), ["id"])
        t.delete_insert_dv(feed(5), ["id"])  # second upsert: old-DV union path
        snap = t.snapshot()
        dv_rows = t._dv_rows(snap.dv_file) if snap.dv_file else 0
        got[mode] = (
            sorted((r.id, r.v) for r in t.read().collect()),
            dv_rows,
            snap.version,
        )
        # duplicate keys still rejected before anything commits
        dup = spark.createDataFrame([(1, 1), (1, 2)], "id bigint, v bigint")
        with _pytest.raises(ValueError, match="duplicate key"):
            t.delete_insert_dv(dup, ["id"])
        assert t.snapshot().version == snap.version
    assert got["staged"] == got["feed"]
    assert got["staged"][1] == 20  # 10 keys matched per upsert, twice
