"""SQL entry shape for the lakehouse: route Delta-style DML text to
``VersionedTable``.

The reference's lakehouse notebooks speak SQL, not a Python API —
``DESCRIBE HISTORY`` (``update_versioning.py:17-19``), ``UPDATE … SET …
WHERE`` (``update_versioning.py:40-44``), time travel ``table@v4``
(``update_versioning.py:58-67``), ``RESTORE TABLE … TO VERSION AS OF``
(``update_versioning.py:76-79``), ``CONVERT TO DELTA``
(``delta_lake.py:17-30``) and ``OPTIMIZE … ZORDER BY``
(``delta_lake.py:54-67``). Vanilla Spark SQL has no parser rules for
these statements (they live in the delta-spark extension, which is not
installable here), so this module provides the thin router that makes
those notebooks port verbatim: recognize the handful of lakehouse
statement shapes with anchored regexes, dispatch to the corresponding
``VersionedTable`` method, and fall everything else through to
``spark.sql`` with registered tables (and ``@vN`` time-travel refs)
bound as temp views.

Deliberately a ROUTER, not a SQL dialect: expressions inside the
statements — SET right-hand sides, WHERE predicates, MERGE conditions —
are never interpreted here; they pass through to Spark's own parser via
``F.expr``. Only the statement skeleton is matched, so anything Spark
can evaluate is legal in the expression positions.

Scale note: routing is pure metadata work on the driver; every data
plan produced is the same one the Python API builds (file-granular
UPDATE/DELETE, by-reference RESTORE, partial OPTIMIZE), so the 100 TB
story is unchanged by the SQL surface.
"""

from __future__ import annotations

import re
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_with_spark_spark.lake.versioned import (
    VersionedTable,
    WhenMatched,
    WhenNotMatched,
    lift_skip_predicates,
)

_I = re.IGNORECASE | re.DOTALL

_HISTORY_RE = re.compile(r"^\s*DESCRIBE\s+HISTORY\s+(?P<tbl>[\w.`]+)\s*;?\s*$", _I)
_DETAIL_RE = re.compile(r"^\s*DESCRIBE\s+DETAIL\s+(?P<tbl>[\w.`]+)\s*;?\s*$", _I)
_DESCRIBE_RE = re.compile(r"^\s*DESCRIBE\s+(?:TABLE\s+)?(?P<tbl>[\w.`]+)\s*;?\s*$", _I)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<tbl>[\w.`]+)\s+SET\s+(?P<set>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    _I,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<tbl>[\w.`]+)(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$", _I
)
_RESTORE_RE = re.compile(
    r"^\s*RESTORE\s+TABLE\s+(?P<tbl>[\w.`]+)\s+TO\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)"
    r"\s*;?\s*$",
    _I,
)
_CONVERT_RE = re.compile(
    r"^\s*CONVERT\s+TO\s+DELTA\s+(?P<tbl>[\w.`]+)"
    r"(?:\s+PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\))?\s*;?\s*$",
    _I,
)
_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<tbl>[\w.`]+)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+ZORDER\s+BY\s*\(?(?P<zorder>[^();]+?)\)?)?\s*;?\s*$",
    _I,
)
# The two RETAIN clauses are accepted in EITHER order (r8 advice: the
# fixed order silently rejected "RETAIN 48 HOURS RETAIN 2 VERSIONS").
# A repeated alternation group keeps the last capture per branch, so
# each clause still binds its own named group regardless of position.
_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+(?P<tbl>[\w.`]+)"
    r"(?:\s+RETAIN\s+(?:(?P<n>\d+)\s+VERSIONS|(?P<hours>\d+(?:\.\d+)?)\s+HOURS)){0,2}"
    r"(?:\s+(?P<dry>DRY\s+RUN))?\s*;?\s*$",
    _I,
)
_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<tbl>[\w.`]+)(?:\s+AS)?(?:\s+(?P<talias>\w+))?"
    r"\s+USING\s+(?P<src>[\w.`]+)(?:\s+AS)?(?:\s+(?P<salias>\w+))?"
    r"\s+ON\s+(?P<on>.+?)(?P<clauses>\s+WHEN\s+.+?)\s*;?\s*$",
    _I,
)
_WHEN_RE = re.compile(
    r"WHEN\s+(?P<not>NOT\s+)?MATCHED(?:\s+AND\s+(?P<cond>.+?))?\s+THEN\s+"
    r"(?P<action>UPDATE\s+SET\s+.+?|DELETE|INSERT\s+.+?)"
    r"(?=\s+WHEN\s+|$)",
    _I,
)
_SET_PROPS_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.`]+)\s+SET\s+TBLPROPERTIES\s*"
    r"\((?P<props>.+)\)\s*;?\s*$",
    _I,
)
_REORG_RE = re.compile(
    r"^\s*REORG\s+TABLE\s+(?P<tbl>[\w.`]+)\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$", _I
)
_CLUSTER_BY_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.`]+)\s+CLUSTER\s+BY\s*"
    r"\((?P<cols>[^)]+)\)\s*;?\s*$",
    _I,
)
_RENAME_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.`]+)\s+RENAME\s+COLUMN\s+"
    r"`?(?P<old>\w+)`?\s+TO\s+`?(?P<new>\w+)`?\s*;?\s*$",
    _I,
)
_ADD_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.`]+)\s+ADD\s+COLUMN\s+"
    r"`?(?P<col>\w+)`?\s+(?P<type>.+?)\s*;?\s*$",
    _I,
)
_ADD_COLS_LIST_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.`]+)\s+ADD\s+COLUMNS\s*"
    r"\((?P<cols>.+)\)\s*;?\s*$",
    _I,
)
_DROP_COL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.`]+)\s+DROP\s+COLUMN\s+"
    r"`?(?P<col>\w+)`?\s*;?\s*$",
    _I,
)
_ADD_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.`]+)\s+ADD\s+CONSTRAINT\s+"
    r"`?(?P<name>\w+)`?\s+CHECK\s*\((?P<expr>.+)\)\s*;?\s*$",
    _I,
)
_DROP_CONSTRAINT_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.`]+)\s+DROP\s+CONSTRAINT\s+"
    r"`?(?P<name>\w+)`?\s*;?\s*$",
    _I,
)
_NOT_NULL_RE = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<tbl>[\w.`]+)\s+ALTER\s+COLUMN\s+"
    r"`?(?P<col>\w+)`?\s+(?P<verb>SET|DROP)\s+NOT\s+NULL\s*;?\s*$",
    _I,
)
_CLONE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<tgt>[\w.`]+)\s+SHALLOW\s+CLONE\s+"
    r"(?P<src>[\w.`]+)(?:\s+VERSION\s+AS\s+OF\s+(?P<v>\d+))?\s*;?\s*$",
    _I,
)
_CREATE_MV_RE = re.compile(
    r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?P<name>[\w.`]+)\s+AS\s+"
    r"SELECT\s+(?P<select>.+?)\s+FROM\s+(?P<tbl>[\w.`]+)\s+"
    r"GROUP\s+BY\s+(?P<groupby>[\w`,\s]+?)\s*;?\s*$",
    _I | re.DOTALL,
)
_REFRESH_MV_RE = re.compile(
    r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<name>[\w.`]+)\s*;?\s*$", _I
)
# select-list item shapes the incremental maintainer supports
_MV_ITEM_RES = {
    "key": re.compile(r"^`?(?P<col>\w+)`?$"),
    "sum": re.compile(r"^sum\s*\(\s*`?(?P<col>\w+)`?\s*\)(?:\s+AS\s+`?(?P<alias>\w+)`?)?$", _I),
    "min": re.compile(r"^min\s*\(\s*`?(?P<col>\w+)`?\s*\)(?:\s+AS\s+`?(?P<alias>\w+)`?)?$", _I),
    "max": re.compile(r"^max\s*\(\s*`?(?P<col>\w+)`?\s*\)(?:\s+AS\s+`?(?P<alias>\w+)`?)?$", _I),
    "count": re.compile(r"^count\s*\(\s*\*\s*\)(?:\s+AS\s+`?(?P<alias>\w+)`?)?$", _I),
}
_TIME_TRAVEL_RE = re.compile(r"(?P<tbl>[A-Za-z_][\w.]*)@v(?P<v>\d+)")

# Segments of a SQL statement that table-name rewriting must never touch:
# single-quoted string literals (with '' escapes), backtick-quoted
# identifiers, and comments. _SQL_STRINGS_RE omits backticks — used when
# rewriting a backtick-quoted reference itself, which must still skip
# literals and comments.
_SQL_OPAQUE_RE = re.compile(r"'(?:[^']|'')*'|`[^`]*`|--[^\n]*|/\*.*?\*/", re.DOTALL)
_SQL_STRINGS_RE = re.compile(r"'(?:[^']|'')*'|--[^\n]*|/\*.*?\*/", re.DOTALL)


def _sub_outside_literals(
    sql: str, pattern: re.Pattern, repl, opaque: re.Pattern = _SQL_OPAQUE_RE
) -> str:
    """Apply ``pattern.sub(repl, …)`` only to the parts of ``sql`` that
    are not string literals / quoted identifiers / comments, so a table
    named ``orders`` is never rewritten inside '…orders…' text."""
    out, pos = [], 0
    for m in opaque.finditer(sql):
        out.append(pattern.sub(repl, sql[pos : m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(pattern.sub(repl, sql[pos:]))
    return "".join(out)


def _search_outside_literals(
    sql: str, pattern: re.Pattern, opaque: re.Pattern = _SQL_OPAQUE_RE
) -> bool:
    pos = 0
    for m in opaque.finditer(sql):
        if pattern.search(sql, pos, m.start()):
            return True
        pos = m.end()
    return bool(pattern.search(sql, pos))


def _norm(name: str) -> str:
    return name.replace("`", "").strip()


def _view_name(name: str, version: int | None = None) -> str:
    base = name.replace(".", "__")
    return base if version is None else f"__{base}_at_v{version}"


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on ``sep`` outside parens and single-quoted strings, so
    ``SET a = f(x, y), b = 'p,q'`` yields two assignments."""
    parts, depth, in_str, cur = [], 0, False, []
    for ch in text:
        if in_str:
            cur.append(ch)
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _parse_assignments(text: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for item in _split_top_level(text):
        col, eq, expr = item.partition("=")
        if not eq or not col.strip() or not expr.strip():
            raise ValueError(f"cannot parse SET assignment {item!r}")
        out[_norm(col)] = expr.strip()
    return out


class LakehouseSQL:
    """Name → ``VersionedTable`` catalog plus the ``sql()`` router.

    ``workspace`` is where CONVERT TO DELTA materializes new table
    roots (one directory per dotted table name). Unconverted parquet
    locations register via ``register_parquet`` and are only queryable
    after CONVERT — mirroring the reference flow, where the curated
    parquet table exists first and gains Delta features on conversion.
    """

    def __init__(self, spark: SparkSession, workspace: str):
        self.spark = spark
        self.workspace = Path(workspace)
        self._tables: dict[str, VersionedTable] = {}
        self._parquet: dict[str, str] = {}
        self._matviews: dict[str, object] = {}

    # ------------------------------------------------------------ catalog
    def register_parquet(self, name: str, path: str) -> None:
        self._parquet[_norm(name)] = path

    def register_table(self, name: str, table: VersionedTable) -> None:
        self._tables[_norm(name)] = table

    def table(self, name: str, allow_matview: bool = False) -> VersionedTable:
        """Resolve a registered table. A materialized view's backing
        table resolves only for read-shaped routes (history/detail/
        describe, and SELECT via passthrough): DML or maintenance
        against it would desync the view from its CDF watermark and
        permanently corrupt every later refresh, so those routes keep
        the default ``allow_matview=False`` and are rejected here."""
        key = _norm(name)
        if key in self._matviews and not allow_matview:
            raise ValueError(
                f"{name!r} is a materialized view: it is maintained by "
                "REFRESH MATERIALIZED VIEW; direct DML/maintenance on it "
                "is not allowed"
            )
        try:
            return self._tables[key]
        except KeyError:
            raise KeyError(
                f"no versioned table {name!r}; registered: "
                f"{sorted(self._tables)} (parquet-only: {sorted(self._parquet)})"
            ) from None

    # ------------------------------------------------------------- router
    def sql(self, statement: str) -> DataFrame:
        for matcher, handler in (
            (_HISTORY_RE, self._history),
            (_DETAIL_RE, self._detail),
            (_UPDATE_RE, self._update),
            (_DELETE_RE, self._delete),
            (_RESTORE_RE, self._restore),
            (_CONVERT_RE, self._convert),
            (_OPTIMIZE_RE, self._optimize),
            (_VACUUM_RE, self._vacuum),
            (_MERGE_RE, self._merge),
            (_REORG_RE, self._reorg),
            (_SET_PROPS_RE, self._set_properties),
            (_CLUSTER_BY_RE, self._cluster_by),
            (_RENAME_COL_RE, self._rename_column),
            (_ADD_COL_RE, self._add_column),
            (_ADD_COLS_LIST_RE, self._add_columns_list),
            (_DROP_COL_RE, self._drop_column),
            (_ADD_CONSTRAINT_RE, self._add_constraint),
            (_DROP_CONSTRAINT_RE, self._drop_constraint),
            (_NOT_NULL_RE, self._alter_not_null),
            (_CLONE_RE, self._shallow_clone),
            (_CREATE_MV_RE, self._create_matview),
            (_REFRESH_MV_RE, self._refresh_matview),
            (_DESCRIBE_RE, self._describe),  # after HISTORY/DETAIL
        ):
            m = matcher.match(statement)
            if m:
                return handler(m)
        return self._passthrough(statement)

    # ----------------------------------------------------------- handlers
    def _history(self, m: re.Match) -> DataFrame:
        rows = self.table(m.group("tbl"), allow_matview=True).history()
        return self.spark.createDataFrame(
            [
                (r["version"], float(r["timestamp"]), r["operation"], repr(r["params"]))
                for r in rows
            ],
            "version bigint, timestamp double, operation string, operationParameters string",
        )

    def _detail(self, m: re.Match) -> DataFrame:
        d = self.table(m.group("tbl"), allow_matview=True).detail()
        return self.spark.createDataFrame(
            [
                (
                    d["location"],
                    d["format"],
                    d["version"],
                    d["num_files"],
                    d["size_bytes"],
                    list(d["partition_columns"]),
                )
            ],
            "location string, format string, version bigint, num_files bigint,"
            " size_bytes bigint, partition_columns array<string>",
        )

    def _describe(self, m: re.Match) -> DataFrame:
        pairs = self.table(m.group("tbl"), allow_matview=True).describe()
        return self.spark.createDataFrame(pairs, "col_name string, data_type string")

    def _update(self, m: re.Match) -> DataFrame:
        vt = self.table(m.group("tbl"))
        where = (m.group("where") or "true").strip()
        vt.update(where, _parse_assignments(m.group("set")))
        # num_affected_rows is observed during the DML's own write pass
        # (VersionedTable records it in the commit) — no pre-scan here.
        return self._dml_result("UPDATE", vt)

    def _delete(self, m: re.Match) -> DataFrame:
        vt = self.table(m.group("tbl"))
        where = (m.group("where") or "true").strip()
        vt.delete(where)
        return self._dml_result("DELETE", vt)

    def _restore(self, m: re.Match) -> DataFrame:
        vt = self.table(m.group("tbl"))
        vt.restore(int(m.group("v")))
        return self.spark.createDataFrame(
            [(int(m.group("v")), vt._latest().version)],
            "restored_to_version bigint, new_version bigint",
        )

    def _convert(self, m: re.Match) -> DataFrame:
        name = _norm(m.group("tbl"))
        if name in self._tables:
            raise ValueError(f"{name} is already a versioned table")
        try:
            src = self._parquet.pop(name)
        except KeyError:
            raise KeyError(
                f"no registered parquet location for {name!r}; call "
                "register_parquet first"
            ) from None
        root = self.workspace / _view_name(name)
        vt = VersionedTable.convert_from_parquet(self.spark, src, str(root))
        self._tables[name] = vt
        return self.spark.createDataFrame(
            [(name, src, str(root))], "table string, source string, location string"
        )

    def _cluster_by(self, m: re.Match) -> DataFrame:
        """ALTER TABLE … CLUSTER BY (cols): declare liquid-style
        clustering columns; later plain OPTIMIZE calls re-cluster
        incrementally (new/overlapping files only)."""
        vt = self.table(m.group("tbl"))
        cols = [c.strip(" `") for c in m.group("cols").split(",")]
        vt.cluster_by(cols)
        return self.spark.createDataFrame(
            [(",".join(cols), vt._latest().version)],
            "cluster_by string, new_version bigint",
        )

    def _optimize(self, m: re.Match) -> DataFrame:
        # content-preserving: rewrites files, same logical rows — safe
        # (and useful) on a frequently-merged matview backing table
        vt = self.table(m.group("tbl"), allow_matview=True)
        zorder = (
            [c.strip(" `") for c in m.group("zorder").split(",")]
            if m.group("zorder")
            else None
        )
        if not m.group("where") and not zorder and vt.clustering_columns():
            # Delta liquid semantics: OPTIMIZE on a clustered table is
            # an incremental re-cluster, not a full rewrite.
            before = vt._latest().version
            vt.optimize_incremental()
            latest = vt._latest()
            params = latest.params if latest.version != before else {}
            return self.spark.createDataFrame(
                [
                    (
                        latest.version,
                        int(params.get("rewritten_files", 0)),
                        int(params.get("carried_files", 0)),
                    )
                ],
                "new_version bigint, rewritten_files bigint, carried_files bigint",
            )
        if m.group("where"):
            preds = lift_skip_predicates(m.group("where"))
            if preds is None:
                raise ValueError(
                    "OPTIMIZE WHERE supports AND-ed col-op-literal terms only, "
                    f"got {m.group('where')!r}"
                )
            vt.optimize_where(preds, zorder_by=zorder)
        else:
            vt.optimize(zorder_by=zorder)
        params = vt._latest().params
        return self.spark.createDataFrame(
            [
                (
                    vt._latest().version,
                    int(params.get("rewritten_files", -1)),
                    int(params.get("carried_files", 0)),
                )
            ],
            "new_version bigint, rewritten_files bigint, carried_files bigint",
        )

    def _vacuum(self, m: re.Match) -> DataFrame:
        # RETAIN <h> HOURS is Delta's vacuum retention clause: it bounds
        # both how young a never-committed orphan dir may be (in-flight
        # writer guard) and how recently a dir may have been superseded
        # (concurrent-reader guard) and still be collected; version
        # retention stays RETAIN <n> VERSIONS.
        # The {0,2} repetition in _VACUUM_RE would also match the SAME
        # clause twice ("RETAIN 1 VERSIONS RETAIN 5 VERSIONS"), silently
        # binding the last occurrence (r9 advice) — reject duplicates
        # post-match so the statement errs loudly instead.
        kinds = [
            k.upper()
            for k in re.findall(
                r"RETAIN\s+\d+(?:\.\d+)?\s+(VERSIONS|HOURS)", m.string, _I
            )
        ]
        for kind in ("VERSIONS", "HOURS"):
            if kinds.count(kind) > 1:
                raise ValueError(
                    f"VACUUM: RETAIN ... {kind} specified more than once"
                )
        hours = m.group("hours")
        removed = self.table(m.group("tbl"), allow_matview=True).vacuum(
            keep_versions=int(m.group("n") or 1),
            dry_run=bool(m.group("dry")),
            orphan_retention_seconds=(
                None if hours is None else float(hours) * 3600.0
            ),
        )
        return self.spark.createDataFrame(
            [(p,) for p in removed] or [], "removed_path string"
        )

    def _merge(self, m: re.Match) -> DataFrame:
        vt = self.table(m.group("tbl"))
        talias = m.group("talias") or "t"
        salias = m.group("salias") or "s"
        if talias == salias:
            raise ValueError(f"MERGE target and source share the alias {talias!r}")
        # Single-pass rewrite: both aliases map simultaneously, so
        # swapped aliases (MERGE INTO tgt AS s USING src AS t) cannot
        # cross — a sequential talias→t then salias→s substitution
        # would fold `s.v + t.v` into `s.v + s.v`.
        scope = {talias: "t.", salias: "s."}

        # Alias rewriting must skip quoted literals and comments (same
        # discipline as the passthrough rewriter): with USING src AS u,
        # a literal like 'call u. soon' in a SET value must NOT become
        # 's.' (r5 ADVICE). _SQL_STRINGS_RE (not the default opaque set)
        # so backticked identifiers still rescope.
        alias_re = re.compile(rf"\b(?:{re.escape(talias)}|{re.escape(salias)})\.")

        def rescope(expr: str) -> str:
            return _sub_outside_literals(
                expr,
                alias_re,
                lambda am: scope[am.group(0)[:-1]],
                opaque=_SQL_STRINGS_RE,
            )

        keys = []
        for term in re.split(r"\s+AND\s+", m.group("on"), flags=re.IGNORECASE):
            km = re.match(
                r"^\s*(\w+)\.`?(\w+)`?\s*=\s*(\w+)\.`?(\w+)`?\s*$", term.strip()
            )
            if not km or {km.group(1), km.group(3)} != {talias, salias} or (
                km.group(2) != km.group(4)
            ):
                raise ValueError(
                    f"MERGE ON must be AND-ed {talias}.k = {salias}.k equalities, "
                    f"got {term.strip()!r}"
                )
            keys.append(km.group(2))

        matched: list[WhenMatched] = []
        not_matched: list[WhenNotMatched] = []
        clause_text = m.group("clauses")
        for cm in _WHEN_RE.finditer(clause_text):
            cond = rescope(cm.group("cond").strip()) if cm.group("cond") else None
            action = cm.group("action").strip()
            if cm.group("not"):
                im = re.match(
                    r"INSERT\s+(?:\*|\((?P<cols>[^)]+)\)\s+VALUES\s*\((?P<vals>.+)\))$",
                    action,
                    _I,
                )
                if not im:
                    raise ValueError(f"cannot parse MERGE clause {action!r}")
                ins = None
                if im.group("cols"):
                    cols = [c.strip(" `") for c in im.group("cols").split(",")]
                    vals = [rescope(v) for v in _split_top_level(im.group("vals"))]
                    if len(cols) != len(vals):
                        raise ValueError("INSERT column/value count mismatch")
                    ins = dict(zip(cols, vals))
                not_matched.append(WhenNotMatched(insert=ins, condition=cond))
            elif re.match(r"DELETE$", action, _I):
                matched.append(WhenMatched(delete=True, condition=cond))
            else:
                um = re.match(r"UPDATE\s+SET\s+(?P<set>\*|.+)$", action, _I)
                if not um:
                    raise ValueError(f"cannot parse MERGE clause {action!r}")
                upd = (
                    None
                    if um.group("set").strip() == "*"
                    else {
                        c: rescope(e)
                        for c, e in _parse_assignments(um.group("set")).items()
                    }
                )
                matched.append(WhenMatched(update=upd, condition=cond))

        source = self._resolve_frame(m.group("src"))
        vt.merge(source, keys, matched=matched or None, not_matched=not_matched or None)
        # Rows updated + deleted + inserted, observed during the merge's
        # own write pass — Delta's metric, not a snapshot delta (which
        # can be negative and costs two extra counts).
        return self._dml_result("MERGE", vt)

    def _set_properties(self, m: re.Match) -> DataFrame:
        """ALTER TABLE … SET TBLPROPERTIES ('k' = 'v', …): the Delta
        entry shape for table features (e.g. enabling deletion
        vectors); values pass through as strings."""
        vt = self.table(m.group("tbl"))
        props: dict[str, str] = {}
        for item in _split_top_level(m.group("props")):
            key, eq, val = item.partition("=")
            if not eq:
                raise ValueError(f"cannot parse TBLPROPERTIES item {item!r}")
            props[_norm(key).strip("'\"")] = _norm(val).strip("'\"")
        vt.set_properties(props)
        return self.spark.createDataFrame(
            [(repr(props), vt._latest().version)],
            "properties string, new_version bigint",
        )

    def _reorg(self, m: re.Match) -> DataFrame:
        """REORG TABLE … APPLY (PURGE): fold deletion vectors into a
        physical rewrite of only the DV-affected files."""
        vt = self.table(m.group("tbl"))
        vt.purge_deletion_vectors()
        params = vt._latest().params
        return self.spark.createDataFrame(
            [
                (
                    vt._latest().version,
                    int(params.get("rewritten_files", 0)),
                    int(params.get("carried_files", 0)),
                )
            ],
            "new_version bigint, rewritten_files bigint, carried_files bigint",
        )

    def _rename_column(self, m: re.Match) -> DataFrame:
        """ALTER TABLE … RENAME COLUMN … TO … — metadata-only commit
        via Delta-style column mapping (data files never rewritten)."""
        vt = self.table(m.group("tbl"))
        vt.rename_column(m.group("old"), m.group("new"))
        return self.spark.createDataFrame(
            [(m.group("old"), m.group("new"), vt._latest().version)],
            "old_name string, new_name string, new_version bigint",
        )

    def _add_column(self, m: re.Match) -> DataFrame:
        vt = self.table(m.group("tbl"))
        vt.add_column(m.group("col"), m.group("type").strip())
        return self.spark.createDataFrame(
            [(m.group("col"), m.group("type").strip(), vt._latest().version)],
            "column string, type string, new_version bigint",
        )

    def _add_columns_list(self, m: re.Match) -> DataFrame:
        """ALTER TABLE … ADD COLUMNS (a int, b string, …): each entry
        is one metadata-only add; the split respects parens so
        decimal(10,2) and nested types survive."""
        vt = self.table(m.group("tbl"))
        added = []
        for item in _split_top_level(m.group("cols")):
            col, _, dtype = item.strip().partition(" ")
            if not dtype.strip():
                raise ValueError(f"cannot parse ADD COLUMNS item {item!r}")
            vt.add_column(col.strip(" `"), dtype.strip())
            added.append((col.strip(" `"), dtype.strip(), vt._latest().version))
        return self.spark.createDataFrame(
            added, "column string, type string, new_version bigint"
        )

    def _drop_column(self, m: re.Match) -> DataFrame:
        vt = self.table(m.group("tbl"))
        vt.drop_column(m.group("col"))
        return self.spark.createDataFrame(
            [(m.group("col"), vt._latest().version)],
            "column string, new_version bigint",
        )

    def _add_constraint(self, m: re.Match) -> DataFrame:
        vt = self.table(m.group("tbl"))
        vt.add_constraint(m.group("name"), m.group("expr").strip())
        return self.spark.createDataFrame(
            [(m.group("name"), vt._latest().version)],
            "constraint string, new_version bigint",
        )

    def _drop_constraint(self, m: re.Match) -> DataFrame:
        vt = self.table(m.group("tbl"))
        vt.drop_constraint(m.group("name"))
        return self.spark.createDataFrame(
            [(m.group("name"), vt._latest().version)],
            "constraint string, new_version bigint",
        )

    def _shallow_clone(self, m: re.Match) -> DataFrame:
        """CREATE TABLE tgt SHALLOW CLONE src [VERSION AS OF n] — the
        SQL face of ``VersionedTable.clone_from``: zero bytes copied,
        the clone's v0 references the source snapshot's files, and the
        new table registers under ``tgt`` for every other route."""
        tgt = _norm(m.group("tgt"))
        if tgt in self._tables or tgt in self._parquet or tgt in self._matviews:
            raise ValueError(f"name {tgt!r} already registered")
        src = self.table(m.group("src"), allow_matview=True)
        version = int(m.group("v")) if m.group("v") else None
        clone = VersionedTable.clone_from(
            src,
            str(self.workspace / tgt.replace(".", "__")),
            version=version,
        )
        self.register_table(tgt, clone)
        return self.spark.createDataFrame(
            [(tgt, _norm(m.group("src")), clone._latest().version)],
            "cloned string, source string, new_version bigint",
        )

    def _create_matview(self, m: re.Match) -> DataFrame:
        """CREATE MATERIALIZED VIEW name AS SELECT <keys, sum/min/max/
        count(*)> FROM <registered table> GROUP BY <keys> — builds an
        incrementally-maintained ``IncrementalAggView``. The select list
        is restricted to what the CDF maintainer can keep exact (the
        whole point of a matview here); anything else raises with the
        supported grammar. Aliases, when given, must be the maintained
        canonical names (sum_<col>/min_<col>/max_<col>/n_rows) so
        SELECTs against the view read what they declared."""
        from data_pipeline_with_spark_spark.lake.matview import IncrementalAggView

        name = _norm(m.group("name"))
        if name in self._matviews or name in self._tables or name in self._parquet:
            raise ValueError(f"name {name!r} already registered")
        base = self.table(m.group("tbl"))
        keys = [k.strip().strip("`") for k in m.group("groupby").split(",")]
        sum_cols: list[str] = []
        minmax: list[str] = []
        seen_keys: list[str] = []
        out_names: set[str] = set()

        def claim(out_name: str) -> None:
            # a duplicate select item would create a view whose schema
            # repeats a column name — every later reference ambiguous
            if out_name in out_names:
                raise ValueError(f"duplicate select item for {out_name!r}")
            out_names.add(out_name)

        for raw in _split_top_level(m.group("select")):
            item = raw.strip()
            for kind, rex in _MV_ITEM_RES.items():
                mi = rex.match(item)
                if not mi:
                    continue
                if kind == "key":
                    claim(mi.group("col"))
                    seen_keys.append(mi.group("col"))
                elif kind in ("sum", "min", "max"):
                    col = mi.group("col")
                    want = f"{kind}_{col}"
                    alias = mi.group("alias")
                    if alias and alias != want:
                        raise ValueError(
                            f"alias {alias!r} must be the maintained name {want!r}"
                        )
                    claim(want)
                    (sum_cols if kind == "sum" else minmax).append(col)
                else:  # count(*)
                    alias = mi.group("alias")
                    if alias and alias != "n_rows":
                        raise ValueError("count(*) alias must be n_rows")
                    claim("n_rows")
                break
            else:
                raise ValueError(
                    f"unsupported select item {item!r}: materialized views "
                    "maintain key columns, sum(col), min(col), max(col), "
                    "count(*) only"
                )
        if sorted(seen_keys) != sorted(keys):
            raise ValueError(
                f"select keys {seen_keys} must equal GROUP BY keys {keys}"
            )
        mv = IncrementalAggView(
            self.spark,
            base,
            str(self.workspace / "_matviews" / name.replace(".", "__")),
            keys=keys,
            sum_cols=sum_cols,
            # min and max are maintained together per column
            minmax_cols=sorted(set(minmax)),
        ).build()
        self._matviews[name] = mv
        # the view's backing table registers under the view name, so
        # SELECT / DESCRIBE HISTORY / time travel work on it directly
        self.register_table(name, mv.view)
        return self.spark.createDataFrame(
            [(name, mv.last_synced_version())],
            "materialized_view string, source_version bigint",
        )

    def _refresh_matview(self, m: re.Match) -> DataFrame:
        name = _norm(m.group("name"))
        if name not in self._matviews:
            raise KeyError(f"no materialized view {name!r}")
        stats = self._matviews[name].refresh()
        return self.spark.createDataFrame(
            [(name, stats["from_version"], stats["to_version"], stats["changed_keys"])],
            "materialized_view string, from_version bigint, to_version bigint, changed_keys bigint",
        )

    def _alter_not_null(self, m: re.Match) -> DataFrame:
        vt = self.table(m.group("tbl"))
        if m.group("verb").upper() == "SET":
            vt.set_not_null(m.group("col"))
        else:
            vt.drop_not_null(m.group("col"))
        return self.spark.createDataFrame(
            [(m.group("col"), vt._latest().version)],
            "column string, new_version bigint",
        )

    # ------------------------------------------------- SELECT passthrough
    def _resolve_frame(self, name: str) -> DataFrame:
        name = _norm(name)
        if name in self._tables:
            return self._tables[name].read()
        return self.spark.table(name)

    def _passthrough(self, statement: str) -> DataFrame:
        """Bind ``table@vN`` time-travel refs and registered table names
        as temp views, then hand the statement to Spark's parser."""
        sql = statement

        def tt_sub(m: re.Match) -> str:
            name = _norm(m.group("tbl"))
            if name not in self._tables:
                return m.group(0)
            view = _view_name(name, int(m.group("v")))
            self._tables[name].read(version=int(m.group("v"))).createOrReplaceTempView(
                view
            )
            return view

        sql = _sub_outside_literals(sql, _TIME_TRAVEL_RE, tt_sub)
        for name, vt in self._tables.items():
            # (?<![.\w]) keeps qualified refs (x.name) and larger
            # identifiers intact; _sub_outside_literals keeps string
            # literals, backticked identifiers and comments intact.
            pattern = re.compile(rf"(?<![.\w]){re.escape(name)}\b(?!@)")
            # a backtick-quoted reference is one whole identifier — the
            # opaque-segment rule protects string literals from rewriting
            # but `name` must still resolve, so match it exactly
            backticked = re.compile(re.escape(f"`{name}`"))
            if _search_outside_literals(sql, pattern) or _search_outside_literals(
                sql, backticked, opaque=_SQL_STRINGS_RE
            ):
                view = _view_name(name)
                vt.read().createOrReplaceTempView(view)
                sql = _sub_outside_literals(
                    sql, backticked, f"`{view}`", opaque=_SQL_STRINGS_RE
                )
                sql = _sub_outside_literals(sql, pattern, view)
        return self.spark.sql(sql)

    def _dml_result(self, op: str, vt: VersionedTable) -> DataFrame:
        latest = vt._latest()
        return self.spark.createDataFrame(
            [(op, int(latest.params.get("num_affected_rows", -1)), latest.version)],
            "operation string, num_affected_rows bigint, new_version bigint",
        )
