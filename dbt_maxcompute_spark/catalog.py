"""Engine catalog: named tables/views over a parquet warehouse.

Re-expresses the reference adapter's relation model
(`/root/reference/dbt/adapters/maxcompute/relation.py:65-81`,
`impl.py:58-63` RELATION_TYPES) Spark-first:

- **table**: a hive-partitioned parquet directory + a metadata sidecar
  (partition spec, auto-partition derived column, primary keys,
  transactional flag, lifecycle, tblproperties, comments).
- **view**: stored SELECT text, resolved lazily against the catalog
  (reference macros/relations/view/create.sql:1-14).
- **materialized_view**: stored defining query + a materialized table;
  REBUILD re-runs the insert-overwrite, config change decides
  rebuild-vs-replace (reference impl.py:112-158).

Namespace is `schema.table` (the reference's 3-level
project.schema.table collapses: a Spark deployment scopes the project
at the session/warehouse level).

Scale posture: metadata is O(tables), data paths are parquet dirs that
Spark reads with full predicate pushdown + partition pruning; nothing
here materializes data on the driver.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_maxcompute_spark.functions.scalar import trunc_time
from dbt_maxcompute_spark.localframe import local_frame

META_FILE = "_engine_meta.json"

_GRANULARITIES = ("hour", "day", "month", "year")


@dataclass
class AutoPartition:
    """Auto-partitioned table: partition value derived from a data
    column via trunc_time (reference relation_configs/_partition.py:9-37,
    macros/relations/partition.sql:4-9). The generated column must NOT
    appear in INSERT column lists (reference impl.py:206-214)."""

    source_column: str
    granularity: str = "day"
    generated_column: str = "_pt"

    def derive(self, df: DataFrame) -> DataFrame:
        if self.granularity not in _GRANULARITIES:
            raise ValueError(f"auto_partition: bad granularity {self.granularity!r}")
        return df.withColumn(
            self.generated_column,
            trunc_time(F.col(self.source_column), self.granularity).cast("string"),
        )


@dataclass
class TableMeta:
    name: str
    table_type: str = "table"  # table | view | materialized_view | external
    partition_by: list[str] = field(default_factory=list)
    auto_partition: dict[str, Any] | None = None
    primary_keys: list[str] = field(default_factory=list)
    transactional: bool = False
    bucket_num: int = 16
    bucket_by: list[str] = field(default_factory=list)  # real bucketed layout
    sort_by: list[str] = field(default_factory=list)  # in-bucket sort of the layout
    lifecycle: int | None = None  # days; TTL metadata (reference create.sql:57-61)
    tblproperties: dict[str, str] = field(default_factory=dict)
    comment: str | None = None
    column_comments: dict[str, str] = field(default_factory=dict)
    view_sql: str | None = None  # views + MV defining query
    mv_config: dict[str, Any] | None = None  # lifecycle/build_deferred/... for MVs
    contract: dict[str, Any] | None = None  # model contract (re-enforced on DML)
    schema_json: str | None = None  # authoritative schema (survives empty tables)
    created_at: float = 0.0
    grants: dict[str, list[str]] = field(default_factory=dict)  # recorded, no-op executor

    @property
    def auto(self) -> AutoPartition | None:
        return AutoPartition(**self.auto_partition) if self.auto_partition else None

    def all_partition_cols(self) -> list[str]:
        cols = list(self.partition_by)
        if self.auto_partition:
            cols.append(self.auto.generated_column)
        return cols


def cluster_for_write(df: DataFrame, pt_cols: list[str]) -> DataFrame:
    """Cluster rows by partition columns before a partitionBy write.

    Without this, every input partition opens a file in every hive
    partition it touches — P_in x P_table small files per write (the
    classic dynamic-partition file explosion; 32 tasks x 24 months =
    768 files for one fixture append).  One hash shuffle on the
    partition key yields one file per hive partition.  For very large
    single-partition loads add a second random key to the repartition
    (spread one pt value over k tasks) — not needed at fixture scale.

    The partition count is pinned explicitly: a bare repartition(col)
    is an AQE coalesce target, and a small write collapses to ONE task
    that opens every hive-partition writer sequentially — the explicit
    N keeps the write wide while the hash on pt still sends each hive
    partition to exactly one task (one file apiece).
    """
    if not pt_cols:
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *[F.col(c) for c in pt_cols])


_STRING_FAMILY_RX = re.compile(r"^(?:string|text|(?:varchar|char)\s*\(\s*(\d+)\s*\))$")


def _string_size(t: str) -> float | None:
    """None = not string-family; inf = unbounded string; n = varchar/char(n)."""
    m = _STRING_FAMILY_RX.match(t.strip().lower())
    if not m:
        return None
    return float(m.group(1)) if m.group(1) else float("inf")


def can_expand_to(cur_type: str, new_type: str) -> bool:
    """Reference column.py:78-80: a column may expand only within the
    string family (varchar/char/string); additionally the new size must
    not narrow (varchar(10)->varchar(5) would truncate)."""
    cur, new = _string_size(cur_type), _string_size(new_type)
    return cur is not None and new is not None and new >= cur


def _has_data_files(path: str) -> bool:
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                return True
    return False


def _bloom_cols_from_props(meta: "TableMeta") -> list[str] | None:
    """The ``bloom_filter_columns`` table property (comma-separated),
    the user-facing switch for per-file equality blooms — same surface
    shape as Delta's bloom-filter index properties. None (not []) when
    unset, so writer instances fall back to the table's own sidecar."""
    raw = (meta.tblproperties or {}).get("bloom_filter_columns")
    if not raw:
        return None
    return [c.strip() for c in str(raw).split(",") if c.strip()]


def _valid_ident(name: str) -> None:
    for part in name.split("."):
        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", part):
            raise ValueError(f"invalid identifier: {name!r}")


class EngineCatalog:
    """Warehouse-directory catalog. One instance per warehouse path."""

    # which catalog instance last registered its temp views in the
    # (shared) Spark session — another instance registering under the
    # same bare names invalidates this one's view cache entirely
    _active_registrar: "EngineCatalog | None" = None

    def __init__(self, spark: SparkSession, warehouse_dir: str, default_schema: str = "default"):
        self.spark = spark
        self.warehouse = warehouse_dir
        self.default_schema = default_schema
        self._views_fp: dict[str, tuple] = {}
        self._views_candidates: list[tuple[str, str]] = []
        self._view_defs: dict[str, str] = {}
        self._dirty: set[str] = set()  # tables mutated since last walk
        os.makedirs(os.path.join(warehouse_dir, default_schema), exist_ok=True)

    # -- namespace ----------------------------------------------------------

    def _split(self, name: str) -> tuple[str, str]:
        _valid_ident(name)
        parts = name.split(".")
        if len(parts) == 1:
            return self.default_schema, parts[0]
        if len(parts) == 2:
            return parts[0], parts[1]
        # project.schema.table → collapse project (session-scoped)
        return parts[-2], parts[-1]

    def table_dir(self, name: str) -> str:
        schema, table = self._split(name)
        return os.path.join(self.warehouse, schema, table)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.table_dir(name), META_FILE)

    # -- schema (database) ops — reference impl.py:217-248 -------------------

    def create_schema(self, schema: str) -> None:
        _valid_ident(schema)
        os.makedirs(os.path.join(self.warehouse, schema), exist_ok=True)

    def drop_schema(self, schema: str, cascade: bool = True) -> None:
        p = os.path.join(self.warehouse, schema)
        if not os.path.exists(p):
            return
        if not cascade and os.listdir(p):
            raise ValueError(f"schema {schema} not empty (cascade=False)")
        shutil.rmtree(p)

    def list_schemas(self) -> list[str]:
        return sorted(
            d for d in os.listdir(self.warehouse)
            if os.path.isdir(os.path.join(self.warehouse, d))
        )

    # -- metadata -------------------------------------------------------------

    def exists(self, name: str) -> bool:
        return os.path.exists(self._meta_path(name))

    def meta(self, name: str) -> TableMeta:
        with open(self._meta_path(name)) as f:
            return TableMeta(**json.load(f))

    def _write_meta(self, name: str, meta: TableMeta) -> None:
        os.makedirs(self.table_dir(name), exist_ok=True)
        tmp = self._meta_path(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(asdict(meta), f, indent=1)
        os.replace(tmp, self._meta_path(name))
        # a meta rewrite keeps the same file name — force this table to
        # re-register on the next register_views (see _table_fingerprint)
        self.mark_dirty(name)

    def mark_dirty(self, name: str) -> None:
        """Record a table mutation EVENT: the next register_views
        re-fingerprints (and re-registers) only dirty tables instead of
        walking the whole catalog per statement. Every engine write
        path reports here — catalog DDL via _write_meta, DML staging
        swaps and plain appends (plans/dml.py), and transaction-log
        commits through the :meth:`txn` on_commit hook. Out-of-band
        writes (a TxnTable constructed directly on a table path)
        bypass events by definition; :meth:`invalidate_views` restores
        the full walk for those."""
        schema, table = self._split(name)
        full = f"{schema}.{table}"
        self._views_fp.pop(full, None)
        self._dirty.add(full)

    def list_tables(self, schema: str | None = None, pattern: str | None = None) -> list[str]:
        """Pattern uses SQL LIKE (%/_), translated to regex exactly as the
        reference does (impl.py:671-724)."""
        schema = schema or self.default_schema
        base = os.path.join(self.warehouse, schema)
        if not os.path.isdir(base):
            return []
        names = sorted(
            d for d in os.listdir(base)
            if os.path.exists(os.path.join(base, d, META_FILE))
        )
        if pattern:
            # SQL LIKE -> regex, %→.* and _→. (reference impl.py:671-724)
            rx = re.compile(
                "^" + "".join(".*" if c == "%" else "." if c == "_" else re.escape(c) for c in pattern) + "$",
                re.IGNORECASE,
            )
            names = [n for n in names if rx.match(n)]
        return names

    # -- create / write -------------------------------------------------------

    def create_table(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        auto_partition: dict[str, Any] | None = None,
        primary_keys: list[str] | None = None,
        transactional: bool = False,
        bucket_num: int = 16,
        lifecycle: int | None = None,
        tblproperties: dict[str, str] | None = None,
        comment: str | None = None,
        contract: dict[str, Any] | None = None,
        mode: str = "error",
    ) -> TableMeta:
        """CREATE TABLE + INSERT (reference table/create.sql:13-76 is a
        two-statement create-then-insert; here one partitioned write).

        transactional=True records the delta-table contract
        (primary-key upsert target, reference create.sql:2-4,44-49);
        the DML planner uses primary_keys for its merge rewrite.

        An enforced `contract` (reference create.sql:22-26 +
        impl.py:69-75) asserts declared==inferred columns before any
        write, then stages the data and validates not_null constraints
        against the STAGED parquet (model query runs once); a violation
        aborts and leaves any existing relation untouched.
        """
        from dbt_maxcompute_spark import contracts as _contracts

        if self.exists(name) and mode == "error":
            raise ValueError(f"table {name} already exists")
        contract_obj = _contracts.ModelContract.parse(contract) if contract else None
        if contract_obj and contract_obj.enforced:
            _contracts.assert_columns_equivalent(contract_obj, df)
            _contracts.warn_unsupported_constraints(contract_obj)
        meta = TableMeta(
            name=name,
            partition_by=list(partition_by or []),
            auto_partition=auto_partition,
            primary_keys=list(primary_keys or []),
            transactional=transactional,
            bucket_num=bucket_num,
            lifecycle=lifecycle,
            tblproperties=dict(tblproperties or {}),
            comment=comment,
            contract=contract_obj.to_dict() if contract_obj else None,
            created_at=time.time(),
        )
        # transactional WITHOUT primary_keys is legal (reference
        # create.sql:17,44-49: `transactional=true` alone makes an ACID
        # table; the pk + bucket form is the delta/upsert variant) —
        # such a table supports row-level DELETE/UPDATE/MERGE but the
        # key-upsert planner paths require explicit keys per call.
        if transactional and (partition_by or auto_partition):
            # the txn path is file-granular copy-on-write over a commit
            # log; hive-style partition dirs would put layout ownership
            # in two places. The reference likewise scopes ACID upsert to
            # pk tables (create.sql:2-4,44-49); partitioned targets use
            # the partition-swap DML path instead.
            raise ValueError(
                "transactional tables do not support partition_by "
                "(file-granular txn log owns the layout)"
            )
        out = df
        if meta.auto_partition:
            out = meta.auto.derive(out)
        pt_cols = meta.all_partition_cols()
        missing = [c for c in pt_cols if c not in out.columns]
        if missing:
            raise ValueError(f"partition columns {missing} not in dataframe")
        path = self.table_dir(name)
        nn_cols = (
            contract_obj.not_null_columns()
            if contract_obj and contract_obj.enforced
            else []
        )
        if transactional:
            # log-committed create: version 0 of the table IS the commit;
            # readers resolve files through the log, never by listing.
            # A not_null contract is validated against the model frame
            # up front (violation = no log, nothing to roll back).
            if nn_cols:
                _contracts.validate_not_null(out, nn_cols)
            if self.exists(name) and mode == "overwrite":
                self.drop(name)
            from dbt_maxcompute_spark.txnlog import TxnTable

            os.makedirs(path, exist_ok=True)
            TxnTable(
                self.spark, path, bloom_cols=_bloom_cols_from_props(meta)
            ).create(out)
        elif nn_cols:
            # stage -> validate staged files -> swap (rollback parity:
            # the old relation survives a constraint violation)
            staging = f"{path}__contract_stage_{uuid.uuid4().hex[:8]}"
            w = cluster_for_write(out, pt_cols).write.mode("overwrite")
            if pt_cols:
                w = w.partitionBy(*pt_cols)
            w.parquet(staging)
            try:
                _contracts.validate_not_null(
                    self.spark.read.parquet(staging), nn_cols
                )
            except Exception:
                shutil.rmtree(staging, ignore_errors=True)
                raise
            if self.exists(name) and mode == "overwrite":
                self.drop(name)
            os.replace(staging, path)
        else:
            if self.exists(name) and mode == "overwrite":
                self.drop(name)
            writer = cluster_for_write(out, pt_cols).write.mode("overwrite")
            if pt_cols:
                writer = writer.partitionBy(*pt_cols)
            writer.parquet(path)
        meta.schema_json = out.schema.json()
        self._write_meta(name, meta)
        return meta

    # -- bucketed tables ------------------------------------------------------

    def _bucket_reg_name(self, name: str) -> str:
        """Spark-session-catalog registration name for a bucketed table
        (mangled into the default database; idents are pre-validated)."""
        schema, table = self._split(name)
        return f"{schema}__{table}__bkt"

    def create_bucketed_table(
        self,
        name: str,
        df: DataFrame,
        bucket_by: list[str],
        bucket_num: int = 16,
        sort_by: list[str] | None = None,
        mode: str = "error",
    ) -> TableMeta:
        """REAL hash-bucketed table (the reference's `write.bucket.num`
        tblproperty, create.sql:44-49 — there metadata for the remote
        warehouse; here an actual pre-shuffled layout).

        Files are written hash-bucketed on ``bucket_by`` (bucket id in
        the file name) and the spec is registered in the Spark session
        catalog — parquet files carry no bucket info, the catalog does.
        Reads via :meth:`read_bucketed` then report
        ``outputPartitioning = hash(bucket_by, n)``, so an equi-join or
        aggregation on the bucket key between co-bucketed tables plans
        with ZERO exchanges: at 100 TB that converts every repeated
        fact-to-fact join on the same key from two full shuffles into a
        co-located bucket-pair read — the storage layout IS the shuffle,
        paid once at write time. ``sort_by`` additionally pre-sorts
        within buckets (sort-merge joins skip their sort).
        """
        if not bucket_by:
            raise ValueError("bucket_by requires at least one column")
        if bucket_num < 1:
            raise ValueError(f"bucket_num must be >= 1, got {bucket_num}")
        if self.exists(name) and mode == "error":
            raise ValueError(f"table {name} already exists")
        missing = [c for c in list(bucket_by) + list(sort_by or []) if c not in df.columns]
        if missing:
            raise ValueError(f"bucket/sort columns {missing} not in dataframe")
        path = self.table_dir(name)
        reg = self._bucket_reg_name(name)
        self.spark.sql(f"DROP TABLE IF EXISTS {reg}")
        if os.path.isdir(path):
            shutil.rmtree(path)
        # Align the write partitioning with the bucket hash (both are
        # Murmur3 HashPartitioning) so every bucket is exactly ONE file:
        # the write pays exactly one shuffle, and single-file buckets are
        # what lets the scan report its SORTED BY ordering — Spark
        # disables sorted-bucket scans when a bucket spans files, and
        # sort-merge joins would silently re-sort. Size bucket_num so a
        # single bucket file stays executor-memory-friendly at scale.
        writer = (
            df.repartition(bucket_num, *[F.col(c) for c in bucket_by])
            .write.format("parquet")
            .mode("overwrite")
            .option("path", path)
            .bucketBy(bucket_num, *bucket_by)
        )
        if sort_by:
            writer = writer.sortBy(*sort_by)
        writer.saveAsTable(reg)
        meta = TableMeta(
            name=name,
            bucket_num=bucket_num,
            bucket_by=list(bucket_by),
            sort_by=list(sort_by or []),
            schema_json=df.schema.json(),
            created_at=time.time(),
        )
        self._write_meta(name, meta)
        return meta

    def read_bucketed(self, name: str) -> DataFrame:
        """Read a bucketed table WITH its bucket spec. The spec lives in
        the Spark session catalog; on a fresh session it is re-registered
        from the metadata sidecar (CREATE TABLE ... CLUSTERED BY ...
        LOCATION), so the layout survives restarts even though the
        session catalog itself is in-memory."""
        meta = self.meta(name)
        if not meta.bucket_by:
            raise ValueError(f"table {name} is not bucketed")
        reg = self._bucket_reg_name(name)
        if not self.spark.catalog.tableExists(reg):
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(meta.schema_json))
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            bcols = ", ".join(f"`{c}`" for c in meta.bucket_by)
            sorted_clause = ""
            if meta.sort_by:
                scols = ", ".join(f"`{c}`" for c in meta.sort_by)
                sorted_clause = f"SORTED BY ({scols}) "
            self.spark.sql(
                f"CREATE TABLE {reg} ({cols}) USING parquet "
                f"CLUSTERED BY ({bcols}) {sorted_clause}"
                f"INTO {meta.bucket_num} BUCKETS "
                f"LOCATION '{self.table_dir(name)}'"
            )
        return self.spark.table(reg)

    def create_view(self, name: str, sql: str, comment: str | None = None) -> TableMeta:
        """CREATE OR REPLACE VIEW (reference view/create.sql:1-14)."""
        meta = TableMeta(
            name=name, table_type="view", view_sql=sql, comment=comment,
            created_at=time.time(),
        )
        self._write_meta(name, meta)
        return meta

    # -- read ------------------------------------------------------------------

    def txn(self, name: str):
        """The transaction log behind a ``transactional=true`` table —
        history(), time-travel reads, vacuum. One interface: the same
        name the DML strategies write through."""
        from dbt_maxcompute_spark.txnlog import TxnTable

        meta = self.meta(name)
        if not meta.transactional:
            raise ValueError(f"table {name} is not transactional")
        t = TxnTable(
            self.spark,
            self.table_dir(name),
            bloom_cols=_bloom_cols_from_props(meta),
        )
        # every commit through this handle is a catalog event
        t.on_commit = lambda _v, _n=name: self.mark_dirty(_n)
        return t

    def read(self, name: str, version: int | None = None) -> DataFrame:
        meta = self.meta(name)
        if meta.transactional:
            return self.txn(name).read(version)
        if version is not None:
            raise ValueError("time travel requires a transactional table")
        if meta.table_type == "view":
            return self.sql(meta.view_sql)
        reader = self.spark.read
        if meta.schema_json:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(meta.schema_json))
            if not _has_data_files(self.table_dir(name)):
                # empty table: no parquet files to scan — empty frame
                return local_frame(self.spark, [], schema)
            reader = reader.schema(schema)
        return reader.parquet(self.table_dir(name))

    def _table_fingerprint(self, name: str) -> tuple:
        """Cheap freshness token for one table: the mtimes of every
        DIRECTORY under its table dir. Any file create/delete/replace
        (data files, txn-log entries, DV stores, meta rewrites — all
        land via rename/link into some directory) bumps the owning
        directory's mtime, so this detects every mutation path without
        touching Spark or parsing the log. O(partition dirs) stat
        calls — microseconds against the milliseconds a DataFrame
        re-registration costs."""
        fp = []
        for root, _dirs, files in os.walk(self.table_dir(name)):
            try:
                # file-name sets guard against mtime-granularity
                # collisions: every data/log/DV mutation creates or
                # removes uniquely-named files (uuid part files, log
                # entries), so two mutations in the same clock tick
                # still differ. Same-name rewrites (= meta updates) are
                # handled by _write_meta's explicit invalidation.
                fp.append((root, os.stat(root).st_mtime_ns, hash(tuple(sorted(files)))))
            except OSError:
                pass
        return tuple(sorted(fp))

    def invalidate_views(self) -> None:
        """Drop the view cache — needed only after out-of-band writes
        (e.g. a TxnTable constructed directly against a table path)."""
        self._views_fp = {}

    def register_views(self, force: bool = False) -> list[tuple[str, str]]:
        """Register every catalog table as a session temp view (bare
        name for the default schema, ``schema_table`` for all), with
        transactional tables bound to their SNAPSHOT (a directory
        listing would also pick up dead and staged-uncommitted files).
        Returns the MV rewrite candidates. Called by :meth:`sql` and by
        the SQL DML executors, whose conditions may contain subqueries
        over other catalog tables.

        CACHED per table on a filesystem fingerprint: a 50-statement
        script over a large catalog re-registers only the tables each
        statement actually mutated, not the whole catalog per statement
        (round-5 verdict finding #3). A different catalog instance
        registering into the same session takes the registrar slot and
        forces this one to fully re-register on its next call."""
        fresh = EngineCatalog._active_registrar is self and not force
        fps: dict[str, tuple] = {}
        tables: list[tuple[str, str, str]] = []
        for schema in self.list_schemas():
            for t in self.list_tables(schema):
                full = f"{schema}.{t}"
                tables.append((schema, t, full))
                if fresh and full in self._views_fp and full not in self._dirty:
                    # event-based reuse: no engine write has touched
                    # this table since its last walk — trust the cached
                    # fingerprint instead of re-stat'ing its tree
                    fps[full] = self._views_fp[full]
                else:
                    fps[full] = self._table_fingerprint(full)
        if fresh and fps == self._views_fp:
            self._dirty.clear()
            return self._views_candidates
        rewrite_candidates: list[tuple[str, str]] = []
        views: list[tuple[str, str, str]] = []
        view_defs: dict[str, str] = {}
        for schema, t, full in tables:
            m = self.meta(full)
            if m.table_type == "view":
                views.append((schema, t, full))
                if m.view_sql:
                    # name -> defining SQL, for MV rewrite-through-view
                    if schema == self.default_schema:
                        view_defs[t.lower()] = m.view_sql
                    view_defs[f"{schema}_{t}".lower()] = m.view_sql
                continue  # registered after tables (they resolve via SQL)
            if not fresh or self._views_fp.get(full) != fps[full]:
                # transactional tables bind to their SNAPSHOT; plain
                # tables go through read() too — it applies the stored
                # schema and serves EMPTY tables (no data files yet)
                # as empty frames instead of failing schema inference
                df = self.read(full)
                if schema == self.default_schema:
                    df.createOrReplaceTempView(t)
                df.createOrReplaceTempView(f"{schema}_{t}")
            if (
                m.table_type == "materialized_view"
                and m.view_sql
                and not (m.mv_config or {}).get("disable_rewrite")
                and not (m.mv_config or {}).get("build_deferred")
            ):
                rewrite_candidates.append((f"{schema}_{t}", m.view_sql))
        # catalog VIEWS register as temp views over their defining SQL
        # (lazy — analysis only), after every table so references
        # resolve; a view-over-view chain converges by fixpoint (each
        # pass registers at least one more, or the leftovers reference
        # something that does not exist and stay unregistered exactly
        # as before views were routed through SQL DDL).  Re-registered
        # whenever anything changed: a view's frame binds its upstream
        # snapshots at registration time.
        pending = views
        for _ in range(len(views) + 1):
            if not pending:
                break
            nxt: list[tuple[str, str, str]] = []
            for schema, t, full in pending:
                try:
                    df = self.spark.sql(self.meta(full).view_sql)
                except Exception:
                    nxt.append((schema, t, full))
                    continue
                if schema == self.default_schema:
                    df.createOrReplaceTempView(t)
                df.createOrReplaceTempView(f"{schema}_{t}")
            if len(nxt) == len(pending):
                break
            pending = nxt
        self._views_fp = fps
        self._views_candidates = rewrite_candidates
        self._view_defs = view_defs
        self._dirty.clear()
        EngineCatalog._active_registrar = self
        return rewrite_candidates

    def sql(self, query: str, mv_rewrite: bool = True) -> DataFrame:
        """Run SQL with every catalog table registered (schema-qualified
        names become schema_table temp views; bare names too for the
        default schema).

        ``mv_rewrite=True`` (default) first tries to answer the query
        from a materialized view whose stored defining query matches it
        (exact text or container rollup — plans/mv_rewrite.py), honoring
        each MV's ``disable_rewrite`` flag; any miss or analysis error
        falls back to the original query transparently. MV build/refresh
        paths pass False (a defining query must never read its own MV)."""
        rewrite_candidates = self.register_views()
        if mv_rewrite and rewrite_candidates:
            from dbt_maxcompute_spark.plans.mv_rewrite import try_rewrite

            rewritten = try_rewrite(
                query, rewrite_candidates, views=getattr(self, "_view_defs", None)
            )
            if rewritten is not None:
                try:
                    return self.spark.sql(rewritten)
                except Exception:
                    pass  # fall back to the original query
        return self.spark.sql(query)

    def columns(self, name: str) -> list[tuple[str, str]]:
        """Column introspection: data columns first, then non-auto
        partition columns, auto-generated partition column EXCLUDED —
        load-bearing for merge correctness (reference impl.py:197-215,
        regression get_columns_partition_test.py:33-80)."""
        meta = self.meta(name)
        df = self.read(name)
        hidden = {meta.auto.generated_column} if meta.auto_partition else set()
        pt = [c for c in meta.partition_by if c not in hidden]
        data = [c for c in df.schema.fields if c.name not in set(pt) | hidden]
        ordered = [(f.name, f.dataType.simpleString()) for f in data]
        for c in pt:
            ordered.append((c, dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[c]))
        return ordered

    def data_columns(self, name: str) -> list[str]:
        return [c for c, _ in self.columns(name)]

    # -- DDL: drop / rename / truncate / clone / comments ----------------------

    def _drop_bucket_reg(self, name: str) -> None:
        """Remove the session-catalog registration of a bucketed table's
        layout (if any). Must run on drop/rename: the registration is an
        external table pointing at the old LOCATION, and leaving it
        behind serves deleted/moved files to the next read_bucketed."""
        self.spark.sql(f"DROP TABLE IF EXISTS {self._bucket_reg_name(name)}")

    def _drop_temp_views(self, name: str) -> None:
        """Unregister a relation's session temp views (bare + schema-
        qualified) so a dropped/renamed-away name stops resolving.
        Only when THIS catalog owns the registrar slot — another
        instance's registrations are not ours to remove."""
        if EngineCatalog._active_registrar is not self:
            return
        schema, table = self._split(name)
        try:
            if schema == self.default_schema:
                self.spark.catalog.dropTempView(table)
            self.spark.catalog.dropTempView(f"{schema}_{table}")
        except Exception:
            pass

    def drop(self, name: str) -> None:
        if self.exists(name):
            try:
                if self.meta(name).bucket_by:
                    self._drop_bucket_reg(name)
            except Exception:
                pass  # sidecar unreadable — still remove the files
        p = self.table_dir(name)
        if os.path.exists(p):
            shutil.rmtree(p)
        self._drop_temp_views(name)

    def rename(self, src: str, dst: str) -> None:
        """ALTER TABLE RENAME (reference adapters.sql:14-26; MV rename is
        a compile error — parity kept)."""
        meta = self.meta(src)
        if meta.table_type == "materialized_view":
            raise ValueError("materialized views cannot be renamed (reference parity)")
        if self.exists(dst):
            raise ValueError(f"rename target {dst} exists")
        if meta.bucket_by:
            # both sides: src's reg points at the moved-away LOCATION and
            # a stale dst reg (from an earlier drop) would shadow the new
            # one; read_bucketed(dst) re-registers from the sidecar
            self._drop_bucket_reg(src)
            self._drop_bucket_reg(dst)
        meta.name = dst
        os.makedirs(os.path.dirname(self.table_dir(dst)), exist_ok=True)
        os.replace(self.table_dir(src), self.table_dir(dst))
        self._write_meta(dst, meta)
        self._drop_temp_views(src)

    def truncate(self, name: str) -> None:
        """TRUNCATE TABLE — tables only (reference adapters.sql:6-12)."""
        meta = self.meta(name)
        if meta.table_type != "table":
            raise ValueError("truncate supports tables only")
        if meta.transactional:
            # TRUNCATE is itself a commit: history survives, time travel
            # to pre-truncate versions still works (Delta semantics)
            t = self.txn(name)
            t.overwrite(t.read().limit(0))
            return
        empty = self.read(name).limit(0)
        # preserve schema: overwrite with an empty frame
        pt = meta.all_partition_cols()
        writer = empty.write.mode("overwrite")
        if pt:
            writer = writer.partitionBy(*pt)
        self.drop_data_keep_meta(name)
        writer.parquet(self.table_dir(name))
        self._write_meta(name, meta)

    def drop_data_keep_meta(self, name: str) -> None:
        meta = self.meta(name)
        shutil.rmtree(self.table_dir(name))
        os.makedirs(self.table_dir(name), exist_ok=True)
        self._write_meta(name, meta)

    def clone(self, src: str, dst: str) -> None:
        """CLONE TABLE src TO dst, drop-if-exists first (reference
        macros/materializations/clone.sql:6-11). Vanilla parquet has no
        zero-copy; this is a file-level copy (cheaper than a re-query:
        no decode/encode)."""
        if self.exists(dst):
            self.drop(dst)
        meta = self.meta(src)
        os.makedirs(os.path.dirname(self.table_dir(dst)), exist_ok=True)
        shutil.copytree(self.table_dir(src), self.table_dir(dst))
        meta.name = dst
        self._write_meta(dst, meta)

    def compact(
        self, name: str, target_file_bytes: int = 128 * 1024 * 1024
    ) -> dict[str, Any]:
        """Merge a fragmented table into right-sized files.

        Incremental appends and microbatches each leave their own files;
        at 100 TB the resulting small-file population degrades scan task
        granularity and metadata listing long before it degrades total
        bytes. Compaction is the standing repair: rewrite the data with
        a file count sized off the ACTUAL on-disk bytes
        (ceil(total / target_file_bytes) for unpartitioned tables; one
        file per hive partition for partitioned ones — the same
        clustering the original write used, so splitting an oversized
        single partition stays the caller's partition-granularity
        decision). Stage-then-swap, so a failed compaction leaves the
        table untouched. Returns {files_before, files_after, bytes}.
        """
        meta = self.meta(name)
        if meta.table_type != "table":
            raise ValueError("compact supports tables only")
        if meta.bucket_by:
            raise ValueError(
                "bucketed tables own their file layout (one file per "
                "bucket); rewrite via create_bucketed_table instead"
            )
        if meta.transactional:
            # compaction as a commit: rewrite the live set right-sized,
            # commit it, vacuum later; never touch files directly
            t = self.txn(name)
            snap = t.snapshot()
            before = len(snap.files)
            total = sum(
                os.path.getsize(os.path.join(self.table_dir(name), f))
                for f in snap.files
            )
            n = max(1, -(-total // max(1, target_file_bytes)))
            t.overwrite(t.read().repartition(int(n)))
            return {
                "files_before": before,
                "files_after": len(t.snapshot().files),
                "bytes": total,
            }
        path = self.table_dir(name)

        def _data_files() -> list[str]:
            return [
                os.path.join(dp, f)
                for dp, _, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
            ]
        before = _data_files()
        total = sum(os.path.getsize(f) for f in before)
        df = self.read(name)
        pt = meta.all_partition_cols()
        staging = f"{path}__compact_stage_{uuid.uuid4().hex[:8]}"
        try:
            if pt:
                w = cluster_for_write(df, pt).write.mode("overwrite")
                w.partitionBy(*pt).parquet(staging)
            else:
                n = max(1, -(-total // max(1, target_file_bytes)))
                df.repartition(int(n)).write.mode("overwrite").parquet(staging)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        # meta sidecar travels WITH the staged dir, so the table dir is
        # never meta-less; the swap itself is rename-aside / rename-in /
        # restore-on-failure — a crash at any point leaves either the old
        # or the new table fully intact (ADVICE r3: rmtree-then-replace
        # had a window where the table vanished)
        with open(os.path.join(staging, META_FILE), "w") as fh:
            json.dump(asdict(meta), fh, indent=1)
        old = f"{path}__compact_old_{uuid.uuid4().hex[:8]}"
        os.replace(path, old)
        try:
            os.replace(staging, path)
        except Exception:
            os.replace(old, path)
            shutil.rmtree(staging, ignore_errors=True)
            raise
        shutil.rmtree(old, ignore_errors=True)
        return {
            "files_before": len(before),
            "files_after": len(_data_files()),
            "bytes": total,
        }

    def set_tblproperties(self, name: str, props: dict[str, str]) -> None:
        """Merge-update table properties (round-8 extension: the
        reference sets them only at create — create.sql:7 — but
        operational toggles like ``bloom_filter_columns`` want a
        post-create switch; new writer handles pick the change up)."""
        meta = self.meta(name)
        merged = dict(meta.tblproperties or {})
        merged.update({str(k): str(v) for k, v in props.items()})
        if merged == (meta.tblproperties or {}):
            return
        meta.tblproperties = merged
        self._write_meta(name, meta)

    def unset_tblproperties(self, name: str, keys: list[str]) -> None:
        meta = self.meta(name)
        props = dict(meta.tblproperties or {})
        changed = False
        for k in keys:
            if k in props:
                del props[k]
                changed = True
        if changed:
            meta.tblproperties = props
            self._write_meta(name, meta)

    def set_comment(self, name: str, comment: str) -> None:
        """Idempotent-skip comment update (reference impl.py:629-669)."""
        meta = self.meta(name)
        if meta.comment == comment:
            return
        meta.comment = comment
        self._write_meta(name, meta)

    def set_column_comment(self, name: str, column: str, comment: str) -> None:
        meta = self.meta(name)
        if meta.column_comments.get(column) == comment:
            return
        meta.column_comments[column] = comment
        self._write_meta(name, meta)

    def apply_grants(self, name: str, grants: dict[str, list[str]]) -> dict[str, Any]:
        """Grant diffing (reference apply_grants.sql:36-63) — recorded as
        metadata; single-user Spark has no privilege executor."""
        meta = self.meta(name)
        current = meta.grants
        to_grant = {p: sorted(set(grants.get(p, [])) - set(current.get(p, []))) for p in grants}
        to_revoke = {
            p: sorted(set(current.get(p, [])) - set(grants.get(p, [])))
            for p in current
        }
        meta.grants = {p: sorted(v) for p, v in grants.items() if v}
        self._write_meta(name, meta)
        return {"granted": {k: v for k, v in to_grant.items() if v},
                "revoked": {k: v for k, v in to_revoke.items() if v}}

    def grant(self, name: str, privileges: list[str], grantees: list[str]) -> None:
        """Incremental GRANT — the one-statement-at-a-time form the
        reference emits (apply_grants.sql:11-13: ``grant <priv> on
        table <t> to USER <grantees>``). Recorded in metadata; same
        no-op-executor posture as :meth:`apply_grants`."""
        meta = self.meta(name)
        for p in privileges:
            p = p.lower()
            meta.grants[p] = sorted(set(meta.grants.get(p, [])) | set(grantees))
        self._write_meta(name, meta)

    def revoke(self, name: str, privileges: list[str], grantees: list[str]) -> None:
        """Incremental REVOKE (reference apply_grants.sql:16-18)."""
        meta = self.meta(name)
        for p in privileges:
            p = p.lower()
            left = sorted(set(meta.grants.get(p, [])) - set(grantees))
            if left:
                meta.grants[p] = left
            else:
                meta.grants.pop(p, None)
        self._write_meta(name, meta)

    def show_grants(self, name: str) -> DataFrame:
        """SHOW GRANTS ON <t> (reference apply_grants.sql:6-8): one row
        per (privilege, grantee) from the recorded ACL."""
        meta = self.meta(name)
        rows = [(p, g) for p in sorted(meta.grants) for g in meta.grants[p]]
        return local_frame(self.spark, rows, "privilege string, grantee string")

    # -- schema evolution (reference macros/adapters/columns.sql) --------------

    def add_remove_columns(
        self, name: str, add: dict[str, str] | None = None, remove: list[str] | None = None
    ) -> None:
        """ALTER TABLE ADD/DROP COLUMNS via a single rewrite pass
        (reference columns.sql:6-25). Parquet has no in-place DDL; one
        scan+write applies both."""
        meta = self.meta(name)
        df = self.read(name)
        for col, typ in (add or {}).items():
            df = df.withColumn(col, F.lit(None).cast(typ))
        for col in remove or []:
            if col in meta.all_partition_cols():
                raise ValueError(f"cannot drop partition column {col}")
            df = df.drop(col)
        self._rewrite(name, df, meta)

    def alter_column_type(
        self, name: str, column: str, new_type: str, force: bool = False
    ) -> None:
        """CHANGE COLUMN type (reference columns.sql:1-3). Only string
        EXPANSION is allowed (reference column.py:78-80 can_expand_to:
        both sides string-family, no size narrowing); any other retype
        needs force=True — it silently truncates/nulls at scale."""
        meta = self.meta(name)
        df = self.read(name)
        cur_type = dict(self.columns(name)).get(column)
        if cur_type is None:
            raise ValueError(f"column {column!r} not found in {name}")
        if not force and not can_expand_to(cur_type, new_type):
            raise ValueError(
                f"cannot alter {name}.{column} from {cur_type!r} to {new_type!r}: "
                "only string-family expansion is allowed (pass force=True to "
                "override — non-expanding casts can truncate or null out data)"
            )
        df = df.withColumn(column, F.col(column).cast(new_type))
        self._rewrite(name, df, meta)

    def _rewrite(self, name: str, df: DataFrame, meta: TableMeta) -> None:
        """Full rewrite through a staging dir (cannot read+overwrite the
        same parquet path in one job). Transactional tables need no
        staging dance — data files are immutable, so the rewrite is just
        the next commit."""
        if meta.transactional:
            self.txn(name).overwrite(df)
            meta.schema_json = df.schema.json()
            self._write_meta(name, meta)
            return
        staging = self.table_dir(name) + "__staging"
        pt = meta.all_partition_cols()
        w = cluster_for_write(df, pt).write.mode("overwrite")
        if pt:
            w = w.partitionBy(*pt)
        w.parquet(staging)
        shutil.rmtree(self.table_dir(name))
        os.replace(staging, self.table_dir(name))
        meta.schema_json = df.schema.json()
        self._write_meta(name, meta)

    # -- info schema / lifecycle -------------------------------------------------

    def info_schema(self) -> DataFrame:
        """One row per relation: schema, name, type, comment, n_columns,
        lifecycle — the reference assembles the same catalog rows from
        warehouse metadata (impl.py:299-374). Metadata-sized by
        definition: built on the driver from the meta files."""
        rows = []
        for schema in self.list_schemas():
            for tbl in self.list_tables(schema):
                full = f"{schema}.{tbl}"
                m = self.meta(full)
                rows.append(
                    (
                        schema,
                        tbl,
                        m.table_type,
                        m.comment,
                        len(self.columns(full)),
                        m.lifecycle,
                    )
                )
        return local_frame(
            self.spark,
            rows,
            "table_schema string, table_name string, table_type string, "
            "comment string, n_columns int, lifecycle int",
        )

    def sweep_lifecycle(self, now: float | None = None) -> list[str]:
        """Drop relations older than their `lifecycle` days (the
        reference's LIFECYCLE N table option — the warehouse GCs these
        server-side; here an explicit sweep, run from a scheduler).
        Returns the dropped names."""
        now = now if now is not None else time.time()
        dropped = []
        for schema in self.list_schemas():
            for tbl in self.list_tables(schema):
                full = f"{schema}.{tbl}"
                m = self.meta(full)
                if m.lifecycle is None:
                    continue
                age_days = (now - (m.created_at or now)) / 86400.0
                if age_days > m.lifecycle:
                    self.drop(full)
                    dropped.append(full)
        return dropped

    # -- freshness / validation -------------------------------------------------

    def freshness(self, name: str) -> float:
        """Age in seconds since last data modification (reference
        impl.py:447-462 last_data_modified_time)."""
        newest = 0.0
        for root, _dirs, files in os.walk(self.table_dir(name)):
            for f in files:
                if f == META_FILE:
                    continue
                newest = max(newest, os.path.getmtime(os.path.join(root, f)))
        return time.time() - newest if newest else float("inf")

    def validate_sql(self, query: str) -> str:
        """EXPLAIN-based validation (reference impl.py:430-433) — analysis
        only, no execution."""
        return self.sql(query)._jdf.queryExecution().analyzed().toString()

    # -- SQL DML / scripts --------------------------------------------------------

    def execute(self, stmt: str):
        """One SQL statement with the full surface: DELETE/UPDATE/MERGE
        INTO on transactional tables route to the transaction log,
        INSERT INTO/OVERWRITE to the write paths, ``FOR VERSION AS OF``
        / ``FOR TIMESTAMP AS OF`` reads resolve pinned snapshots, and
        everything else is ``sql()``. Returns the statement's frame
        (a one-row summary for DML)."""
        from dbt_maxcompute_spark.plans.sqldml import execute_statement

        return execute_statement(self, stmt)

    def execute_script(
        self,
        script: str,
        query_comment: "dict | str | None" = None,
        comment_append: bool = False,
    ):
        """Multi-statement raw script against the catalog — the
        reference's raw materialization posture
        (raw.sql:1-6, showcase 04_operations/*.sql issues DELETE /
        UPDATE / MERGE as plain SQL): SET preamble becomes scoped
        confs, each statement routes through :meth:`execute`, the last
        statement's DataFrame is returned (lazy). Returns
        (df, recorded_hints, parse_errors) like ``run_raw``."""
        from dbt_maxcompute_spark.materializations.raw import (
            inject_query_comment,
            split_statements,
        )
        from dbt_maxcompute_spark.plans.settings import (
            parse_set_preamble,
            scoped_confs,
            split_hints,
        )

        parsed = parse_set_preamble(script)
        apply, record = split_hints(parsed.settings)
        last = None
        with scoped_confs(self.spark, apply):
            for stmt in split_statements(parsed.remaining_query):
                last = self.execute(
                    inject_query_comment(stmt, query_comment, comment_append)
                )
        return last, record, parsed.errors
