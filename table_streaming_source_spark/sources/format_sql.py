"""SQL-text DML router for the table format — the mutation half of the
SQL front door (reads and change feeds are already SQL-reachable via
``CREATE TEMPORARY VIEW ... USING table_format`` /
``format_changes``; see ``sources/format_batch.py``).  The reference's
contract is SQL-explorable tables (`TableStreamingSource.java:66-69`);
this router extends that surface to writes: a SQL user can now MERGE /
UPDATE / DELETE / INSERT / OPTIMIZE / VACUUM / DESCRIBE HISTORY a
format table from SQL text alone, without importing the Python API.

It is deliberately a THIN ROUTER, not a SQL engine: statement SHAPE is
recognized with anchored patterns, while every expression inside it —
SET right-hand sides, WHERE predicates, the USING subquery — passes
through VERBATIM to Spark SQL (``F.expr`` / ``spark.sql``), so the
expression language is exactly Spark's.  Catalyst still does all the
work; the router only picks which commit function publishes the result.

Supported statements (the documented subset)::

    SELECT ... / WITH ...        (reads: every tables= key is
        registered as a temp view over its table root — branch= maps
        to the ref option, expected_version= pins a version — and the
        text runs verbatim through Spark SQL)
    MERGE INTO t [AS a] USING src|(subquery) [AS b] ON a.k = b.k
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
        | WHEN MATCHED THEN UPDATE SET *       (strict: unmatched no-op)
        | WHEN NOT MATCHED THEN INSERT *       (strict: matched kept)
        | WHEN MATCHED THEN DELETE             (strict: unmatched no-op)
        | WHEN MATCHED AND cond THEN DELETE    (the CDC delete-flag
          WHEN MATCHED THEN UPDATE SET *        shape; cond evaluates
          [WHEN NOT MATCHED THEN INSERT *]      on the SOURCE row)
        | ... WHEN NOT MATCHED BY SOURCE THEN DELETE
        | ... WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c = e [, ...]
          (the Delta full-sync shape: target rows whose key the source
          lacks are deleted / updated — exprs evaluate on the TARGET
          row; composes with the clauses above)
    UPDATE t SET col = expr [, ...] WHERE pred
    DELETE FROM t WHERE pred
    INSERT INTO t SELECT ...
    SELECT ... FROM t VERSION AS OF n   (Delta-style time travel —
        rewritten onto a version-pinned view; mixes freely with
        head reads of other roots in the same statement)
    CREATE TABLE t AS SELECT ...        (CTAS: materializes the query
        into a NEW root mapped by tables=; numeric/date columns get
        manifest stats automatically)
    ALTER TABLE t RENAME COLUMN old TO new
    ALTER TABLE t ALTER COLUMN c TYPE newtype   (safe widening)
    DESCRIBE HISTORY t
    OPTIMIZE t
    VACUUM t [RETAIN n VERSIONS]

Routing targets are the existing commit functions — ``commit_merge``
(stats+bloom-targeted copy-on-write), ``commit_update_where`` (pruned
candidate rewrite with CDC sidecars), ``positions_where`` +
``commit_delete_positions`` (merge-on-read deletion vectors: a DELETE
writes a tiny DV file, never rewrites data), ``commit_append``,
``compact_binpack``, ``vacuum`` and ``read_history`` — so every scale
property those functions guarantee (manifest pruning, O(change) I/O,
conflict detection) holds identically when invoked from SQL.

``MERGE ... UPDATE SET * / INSERT *`` uses ``commit_merge``'s upsert
mode; the one shape the single-op-tag mapping cannot express —
``WHEN MATCHED THEN DELETE`` combined with other WHEN clauses — raises
with a message naming the Python API that can.
"""

from __future__ import annotations

import math
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from table_streaming_source_spark import table_format as TF

_OP_COL = "__sql_op"

_SELECT = re.compile(r"^\s*(?:SELECT|WITH)\b", re.IGNORECASE)

#: Delta-style SQL time travel inside the SELECT route:
#: ``FROM t VERSION AS OF 3`` — rewritten onto a version-pinned view.
_VERSION_AS_OF = re.compile(
    r"\b(?P<t>[A-Za-z_]\w*)\s+VERSION\s+AS\s+OF\s+(?P<v>\d+)\b",
    re.IGNORECASE,
)

_CTAS = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<t>[A-Za-z_]\w*)\s+AS\s+"
    r"(?P<sel>(?:SELECT|WITH)\b.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_MERGE_HEAD = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<t>[A-Za-z_]\w*)"
    r"(?:\s+(?:AS\s+)?(?P<ta>[A-Za-z_]\w*))?"
    r"\s+USING\s+",
    re.IGNORECASE | re.DOTALL,
)
_MERGE_TAIL = re.compile(
    r"^(?:\s+(?:AS\s+)?(?P<sa>[A-Za-z_]\w*))?"
    r"\s+ON\s+(?P<on>.+?)\s+(?P<when>WHEN\s+.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SRC_IDENT = re.compile(r"\s*(?P<src>[A-Za-z_][\w.]*)")
_ON_EQ = re.compile(
    r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", re.DOTALL
)
_W_UPD = re.compile(
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*", re.IGNORECASE
)
_W_DEL = re.compile(r"WHEN\s+MATCHED\s+THEN\s+DELETE", re.IGNORECASE)
_W_DEL_COND = re.compile(
    r"WHEN\s+MATCHED\s+AND\s+(?P<cond>.+?)\s+THEN\s+DELETE",
    re.IGNORECASE | re.DOTALL,
)
_W_INS = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*", re.IGNORECASE
)
_W_NMBS_DEL = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE",
    re.IGNORECASE,
)
_W_NMBS_UPD = re.compile(
    r"WHEN\s+NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+UPDATE\s+SET\s+"
    r"(?P<set>.+?)(?=\s+WHEN\s+|\s*;?\s*$)",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+(?P<t>[A-Za-z_]\w*)\s+SET\s+(?P<set>.+?)"
    r"\s+WHERE\s+(?P<where>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<t>[A-Za-z_]\w*)\s+WHERE\s+"
    r"(?P<where>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<t>[A-Za-z_]\w*)\s+(?P<sel>SELECT\s+.+?)"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_ALTER_RENAME = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<t>[A-Za-z_]\w*)\s+RENAME\s+COLUMN\s+"
    r"(?P<old>[A-Za-z_]\w*)\s+TO\s+(?P<new>[A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_WIDEN = re.compile(
    r"^\s*ALTER\s+TABLE\s+(?P<t>[A-Za-z_]\w*)\s+ALTER\s+COLUMN\s+"
    r"(?P<col>[A-Za-z_]\w*)\s+TYPE\s+(?P<ty>[A-Za-z_]\w*(?:\(\s*\d+"
    r"(?:\s*,\s*\d+)?\s*\))?)\s*;?\s*$",
    re.IGNORECASE,
)
_HISTORY = re.compile(
    r"^\s*DESCRIBE\s+HISTORY\s+(?P<t>[A-Za-z_]\w*)\s*;?\s*$",
    re.IGNORECASE,
)
_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+(?P<t>[A-Za-z_]\w*)\s*;?\s*$", re.IGNORECASE
)
_VACUUM = re.compile(
    r"^\s*VACUUM\s+(?P<t>[A-Za-z_]\w*)"
    r"(?:\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS)?\s*;?\s*$",
    re.IGNORECASE,
)


def _split_top_level(text: str) -> list[str]:
    """Split on commas at paren/quote depth 0 — SET lists whose
    right-hand sides contain function calls or string literals with
    commas must not split inside them."""
    out, buf, depth, quote = [], [], 0, None
    for ch in text:
        if quote is not None:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    if buf:
        out.append("".join(buf))
    return [s.strip() for s in out if s.strip()]


def _balanced_paren_end(text: str, start: int) -> int:
    """Index one past the ``)`` matching ``text[start] == '('`` —
    quote-aware depth count, never regex backtracking (a USING
    subquery whose ON/WHEN text also contains ``)`` must not depend
    on greedy-match luck)."""
    depth, quote = 0, None
    for i in range(start, len(text)):
        ch = text[i]
        if quote is not None:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError(
        "format_sql: unbalanced parentheses in the USING source"
    )


def _mask_quoted(text: str) -> str:
    """Replace every quoted literal (including its quotes) with ``?``
    so later token scans can never read literal CONTENT as SQL — the
    guard that keeps WHERE-text range extraction lossless when a
    string literal contains ``AND``/``BETWEEN``/``OR`` text."""
    out: list[str] = []
    quote = None
    for ch in text:
        if quote is not None:
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            out.append("?")
            continue
        out.append(ch)
    return "".join(out)


def _mask_quoted_keep_len(text: str) -> str:
    """Like :func:`_mask_quoted` but LENGTH-PRESERVING (every literal
    character becomes ``?``), so regex spans found on the mask can be
    applied to the original text."""
    out: list[str] = []
    quote = None
    for ch in text:
        if quote is not None:
            out.append("?")
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            out.append("?")
        else:
            out.append(ch)
    return "".join(out)


def _tf_log_dir(path: str) -> str:
    return TF._log_dir(path)


def _table_path(name: str, tables: dict[str, str]) -> str:
    try:
        return tables[name]
    except KeyError:
        raise ValueError(
            f"format_sql: unknown table {name!r} — pass its root in "
            f"tables= (known: {sorted(tables)})"
        ) from None


def _stat_cols(path: str) -> list[str]:
    """Stat columns for the new manifest entries: keep whatever the
    current snapshot already tracks (the SQL user never names them),
    under their CURRENT logical names — pre-rename files record stats
    under physical names, and a rewrite's fresh files carry the
    current spelling."""
    v = TF.latest_version(path)
    pairs, any_ops = TF._walk_files_renamed(path, v)
    return sorted({
        c
        for f, ch in pairs
        for c in (
            TF._translate_entry_stats(f, ch) if any_ops else f
        ).get("stats", {})
    })


_BOUND = re.compile(
    r"^\s*(\w+)\s*(>=|<=|=|>|<)\s*(-?\d+(?:\.\d+)?)\s*$"
)
_BETWEEN = re.compile(
    r"\b(\w+)\s+BETWEEN\s+(-?\d+(?:\.\d+)?)\s+AND\s+"
    r"(-?\d+(?:\.\d+)?)",
    re.IGNORECASE,
)


def _extract_prune(
    where: str, stat_cols: list[str]
) -> tuple[str, float, float] | None:
    """Best-effort range extraction from the WHERE text so SQL UPDATE /
    DELETE get MANIFEST FILE PRUNING for free — the property that makes
    a predicate-scoped mutation O(files the range can touch) at 100 TB
    instead of O(table).  Only top-level AND conjuncts of the form
    ``col <op> literal`` / ``col BETWEEN a AND b`` on a stat column
    tighten the range; anything else is ignored (never lossy — pruning
    only SKIPS files the bounds prove disjoint, and the full predicate
    still evaluates per row on the files that remain)."""
    # scan a QUOTE-MASKED copy only: literal content must never be
    # read as conjuncts (a literal like 'x AND k <= 5' would otherwise
    # fabricate a bound and make the prune lossy); the masked copy is
    # used solely for extraction — execution gets the original text
    where = _mask_quoted(where)
    # pruning from text is only sound for pure AND-conjunctions: any
    # OR/NOT could widen the matching set beyond the extracted range
    if re.search(r"\b(OR|NOT)\b", where, flags=re.IGNORECASE):
        return None
    bounds: dict[str, list[float]] = {}
    # consume BETWEEN spans FIRST — their internal AND must not split
    def _take_between(m: re.Match) -> str:
        col, lo, hi = m[1], float(m[2]), float(m[3])
        if col in stat_cols:
            b = bounds.setdefault(col, [-math.inf, math.inf])
            b[0], b[1] = max(b[0], lo), min(b[1], hi)
        return " 1=1 "

    where = _BETWEEN.sub(_take_between, where)
    for conj in re.split(r"\s+AND\s+", where, flags=re.IGNORECASE):
        m = _BOUND.match(conj)
        if not m:
            continue
        col, op, lit = m[1], m[2], float(m[3])
        if col not in stat_cols:
            continue
        b = bounds.setdefault(col, [-math.inf, math.inf])
        if op in (">=", ">"):
            b[0] = max(b[0], lit)
        elif op in ("<=", "<"):
            b[1] = min(b[1], lit)
        else:  # =
            b[0], b[1] = max(b[0], lit), min(b[1], lit)
    for col, (lo, hi) in bounds.items():
        if lo != -math.inf or hi != math.inf:
            return col, lo, hi
    return None


def _result(
    spark: SparkSession, operation: str, version: int,
    files_rewritten: int | None, files_total: int | None,
) -> DataFrame:
    return spark.createDataFrame(
        [(operation, version, files_rewritten, files_total)],
        "operation string, version bigint, files_rewritten bigint, "
        "files_total bigint",
    )


def format_sql(
    spark: SparkSession,
    text: str,
    *,
    tables: dict[str, str],
    branch: str | None = None,
    expected_version: int | None = None,
) -> DataFrame:
    """Execute one statement of the documented DML subset against the
    table-format roots in ``tables`` (identifier → table path).  DML
    returns a one-row receipt DataFrame ``(operation, version,
    files_rewritten, files_total)``; ``DESCRIBE HISTORY`` returns the
    history relation itself; SELECT/WITH returns the query result
    (views are session-scoped and re-registered per call)."""
    if _SELECT.match(text):
        from table_streaming_source_spark.sources.format_batch import (
            register_table_format,
        )

        register_table_format(spark)
        # Delta-style time travel: rewrite every ``t VERSION AS OF n``
        # (t a known root) onto a version-pinned view.  Matching runs
        # over a LENGTH-PRESERVING quote mask so literal content can
        # never be read as a travel clause; the rewrite edits the
        # original text at the masked spans.
        pinned: dict[str, tuple[str, int]] = {}  # view -> (root, ver)
        masked = _mask_quoted_keep_len(text)
        out_parts, last = [], 0
        for m in _VERSION_AS_OF.finditer(masked):
            name, ver = m["t"], int(m["v"])
            if name not in tables:
                continue
            view = f"{name}__v{ver}"
            if view in tables:
                # a caller-mapped root literally named like our pinned
                # view would be silently replaced by the time-travel
                # view of another table — wrong data, so refuse
                raise ValueError(
                    f"format_sql: tables= key {view!r} collides with "
                    f"the version-pinned view for '{name} VERSION AS "
                    f"OF {ver}' — rename the table mapping"
                )
            pinned[view] = (tables[name], ver)
            out_parts.append(text[last:m.start()])
            out_parts.append(view)
            last = m.end()
        out_parts.append(text[last:])
        text = "".join(out_parts)
        created = []
        try:
            regs = {
                name: (root, None) for name, root in tables.items()
            }
            regs.update(pinned)
            # a pre-existing USER temp view with a router name would be
            # destroyed by CREATE OR REPLACE + the finally drop — refuse
            # up front instead of silently eating the user's view
            held = {
                t.name
                for t in spark.catalog.listTables()
                if t.isTemporary and t.name in regs
            }
            if held:
                raise ValueError(
                    f"format_sql: temp view(s) {sorted(held)} already "
                    "exist in this session and collide with tables= "
                    "names — drop or rename them (the router registers "
                    "and drops session views under these names)"
                )
            for name, (root, ver) in regs.items():
                opts = [f"path '{root.replace(chr(39), chr(39) * 2)}'"]
                if branch is not None:
                    opts.append(f"ref '{branch}'")
                pin = ver if ver is not None else expected_version
                if pin is not None:
                    opts.append(f"version '{pin}'")
                spark.sql(
                    f"CREATE OR REPLACE TEMPORARY VIEW {name} "
                    f"USING table_format OPTIONS ({', '.join(opts)})"
                )
                created.append(name)
            # analysis resolves the views into the returned plan, so
            # dropping them immediately is safe for later execution
            return spark.sql(text)
        finally:
            # never leak session-scoped views: a leaked view would
            # later shadow same-named sources in MERGE USING or user
            # spark.table() calls
            for name in created:
                spark.catalog.dropTempView(name)

    m = _CTAS.match(text)
    if m:
        # CREATE TABLE <t> AS SELECT ...: materialize the query into a
        # NEW table-format root (the caller maps the new name to its
        # root in tables=, like every other identifier).  The SELECT
        # half routes through the read path above, so it supports the
        # full surface (WITH, VERSION AS OF, other roots).
        path = _table_path(m["t"], tables)
        log_exists = os.path.exists(_tf_log_dir(path))
        if log_exists:
            try:
                populated = TF.latest_version(path) > 0
            except FileNotFoundError:
                # a log directory with no commit json — a partially
                # created root (crashed create): treat as non-existent
                # and fall through to create_table
                log_exists, populated = False, False
            if populated:
                raise ValueError(
                    f"format_sql: table {m['t']!r} already exists — "
                    "CTAS creates new tables only (INSERT INTO appends)"
                )
        src_tables = {k: v for k, v in tables.items() if k != m["t"]}
        df = format_sql(
            spark, m["sel"], tables=src_tables, branch=branch,
        )
        if not log_exists:
            TF.create_table(path)
        num_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName()
            in ("integer", "long", "short", "byte", "float", "double",
                "date", "timestamp", "decimal")
        ]
        v = TF.commit_append(
            spark, path, df, stat_cols=num_cols or [df.columns[0]],
        )
        total = len(TF._snapshot_file_dicts(path, v))
        return _result(spark, "CREATE TABLE AS SELECT", v, None, total)

    mh = _MERGE_HEAD.match(text)
    if mh:
        # capture the USING source with a depth-counting scan (a
        # parenthesized subquery whose ON/WHEN text contains ')' must
        # parse deterministically, never by regex backtracking)
        rest = text[mh.end():]
        stripped = rest.lstrip()
        if stripped.startswith("("):
            start = len(rest) - len(stripped)
            end = _balanced_paren_end(rest, start)
            src = rest[start:end]
            tail = rest[end:]
        else:
            mi = _SRC_IDENT.match(rest)
            if not mi:
                raise ValueError(
                    "format_sql: MERGE needs a USING source — an "
                    "identifier or a parenthesized subquery"
                )
            src = mi["src"]
            tail = rest[mi.end():]
        m = _MERGE_TAIL.match(tail)
        if not m:
            raise ValueError(
                "format_sql: malformed MERGE tail after the USING "
                "source — expected [AS alias] ON <cond> WHEN ..."
            )
        path = _table_path(mh["t"], tables)
        t_alias = mh["ta"] or mh["t"]
        s_alias = m["sa"]
        if not src.startswith("("):
            s_alias = s_alias or src.split(".")[-1]
        if s_alias is None:
            raise ValueError(
                "format_sql: a parenthesized USING source needs an "
                "alias (USING (...) AS s)"
            )
        on = _ON_EQ.match(m["on"])
        if not on:
            raise ValueError(
                "format_sql: MERGE supports a single equality ON "
                "clause — ON <target>.<key> = <source>.<key>"
            )
        q1, c1, q2, c2 = on.groups()
        sides = {q1.lower(): c1, q2.lower(): c2}
        if set(sides) != {t_alias.lower(), s_alias.lower()} or (
            c1.lower() != c2.lower()
        ):
            raise ValueError(
                "format_sql: ON must equate the SAME column on the "
                f"target ({t_alias}) and source ({s_alias}) aliases"
            )
        key = sides[t_alias.lower()]
        w = m["when"]
        # full-sync clauses first: WHEN NOT MATCHED BY SOURCE THEN
        # DELETE / UPDATE SET — target rows whose key the source lacks
        nmbs_upd = _W_NMBS_UPD.search(w)
        if nmbs_upd is not None:
            w = w[: nmbs_upd.start()] + w[nmbs_upd.end():]
        nmbs_del = _W_NMBS_DEL.search(w)
        if nmbs_del is not None:
            w = w[: nmbs_del.start()] + w[nmbs_del.end():]
        if nmbs_upd is not None and nmbs_del is not None:
            raise ValueError(
                "format_sql: at most one WHEN NOT MATCHED BY SOURCE "
                "clause per MERGE"
            )
        del_cond = _W_DEL_COND.search(w)
        if del_cond is not None:
            w = w[: del_cond.start()] + w[del_cond.end():]
        has_upd = bool(_W_UPD.search(w))
        has_ins = bool(_W_INS.search(w))
        has_del = bool(_W_DEL.search(w))
        if del_cond is not None and not has_upd:
            raise ValueError(
                "format_sql: conditional DELETE needs the fallback "
                "WHEN MATCHED THEN UPDATE SET * clause (the CDC "
                "delete-flag shape)"
            )
        if has_del and (has_upd or has_ins):
            raise ValueError(
                "format_sql: unconditional WHEN MATCHED THEN DELETE "
                "cannot combine with other WHEN clauses — add AND "
                "<cond> (the CDC delete-flag shape) or use "
                "table_format.commit_merge with per-row op tags"
            )
        if not (
            has_upd or has_ins or has_del
            or nmbs_upd is not None or nmbs_del is not None
        ):
            raise ValueError(
                "format_sql: MERGE needs at least one of UPDATE SET */"
                "INSERT */DELETE/NOT MATCHED BY SOURCE in its WHEN "
                "clauses"
            )
        # never silently misroute: a WHEN clause the shape regexes did
        # NOT consume (e.g. the unsupported per-column ``UPDATE SET
        # col = expr`` — the documented subset is the full-row CDC
        # shape ``UPDATE SET *``) must raise, not be dropped — dropped,
        # a matched row would silently keep its target values
        leftover = w
        for rx in (_W_UPD, _W_INS, _W_DEL):
            leftover = rx.sub(" ", leftover)
        if re.search(r"\bWHEN\b", leftover, re.IGNORECASE):
            raise ValueError(
                "format_sql: unsupported MERGE WHEN clause near "
                f"{leftover.strip()[:80]!r} — supported: WHEN MATCHED "
                "[AND <cond>] THEN UPDATE SET * / DELETE, WHEN NOT "
                "MATCHED THEN INSERT *, WHEN NOT MATCHED BY SOURCE "
                "THEN DELETE / UPDATE SET <col>=<expr>"
            )
        upsert = has_upd and has_ins
        source = (
            spark.sql(src[1:-1]) if src.startswith("(")
            else spark.table(src)
        )
        parts: list[DataFrame] = []
        if has_upd or has_ins or has_del or del_cond is not None:
            if del_cond is not None:
                # the CDC delete-flag shape: the condition is evaluated
                # on the SOURCE row (reference source columns by bare
                # name); rows matching it carry op 'D', the rest 'U'
                op_expr = (
                    F.when(F.expr(del_cond["cond"]), F.lit("D"))
                    .otherwise(F.lit("U"))
                )
            else:
                op_expr = F.lit(
                    "D" if has_del else ("U" if has_upd else "I")
                )
            parts.append(source.withColumn(_OP_COL, op_expr))
        if nmbs_del is not None or nmbs_upd is not None:
            # full sync: target rows whose key is absent from the
            # source — resolved on the MOR view (outstanding deletes
            # must not resurrect), key-anti-joined against the source's
            # distinct keys (broadcastable; target floats never move)
            at = (
                TF.resolve_ref(path, branch)
                if branch is not None else None
            )
            target = TF.read_table_mor(spark, path, version=at)
            stale = target.join(
                source.select(key).distinct(), key, "left_anti"
            )
            if nmbs_upd is not None:
                set_map: dict[str, str] = {}
                for item in _split_top_level(nmbs_upd["set"]):
                    col, eq, rhs = item.partition("=")
                    if not eq or not col.strip().replace(
                        "_", "a"
                    ).isalnum():
                        raise ValueError(
                            f"format_sql: malformed SET item {item!r}"
                        )
                    set_map[col.strip()] = rhs.strip()
                unknown = set(set_map) - set(stale.columns)
                if unknown:
                    raise ValueError(
                        "format_sql: NOT MATCHED BY SOURCE UPDATE "
                        f"sets unknown columns {sorted(unknown)}"
                    )
                # exprs evaluate on the TARGET row
                stale = stale.select(*[
                    F.expr(set_map[c]).alias(c) if c in set_map
                    else F.col(c)
                    for c in stale.columns
                ])
            parts.append(
                stale.withColumn(
                    _OP_COL,
                    F.lit("U" if nmbs_upd is not None else "D"),
                )
            )
        changes = parts[0]
        for extra in parts[1:]:
            changes = changes.unionByName(extra)
        v, rewritten, total = TF.commit_merge(
            spark, path, changes, key=key,
            stat_cols=_stat_cols(path), op_col=_OP_COL,
            upsert=upsert, branch=branch,
            expected_version=expected_version,
        )
        return _result(spark, "MERGE", v, rewritten, total)

    m = _UPDATE.match(text)
    if m:
        path = _table_path(m["t"], tables)
        set_exprs: dict[str, str] = {}
        for item in _split_top_level(m["set"]):
            col, eq, rhs = item.partition("=")
            if not eq or not col.strip().replace("_", "a").isalnum():
                raise ValueError(
                    f"format_sql: malformed SET item {item!r}"
                )
            set_exprs[col.strip()] = rhs.strip()
        cols = _stat_cols(path)
        v, rewritten, total = TF.commit_update_where(
            spark, path, set_exprs=set_exprs, where=m["where"],
            stat_cols=cols, prune=_extract_prune(m["where"], cols),
            branch=branch, expected_version=expected_version,
        )
        return _result(spark, "UPDATE", v, rewritten, total)

    m = _DELETE.match(text)
    if m:
        path = _table_path(m["t"], tables)
        # merge-on-read: resolve matching (file, ordinal) pairs, then
        # publish ONE deletion-vector commit — no data file rewrites
        at = (
            TF.resolve_ref(path, branch) if branch is not None else None
        )
        prune = _extract_prune(m["where"], _stat_cols(path))
        if prune is not None:
            # a range that excludes EVERY data file is a valid 0-row
            # DELETE (the stats prove no file can hold a match) — a
            # no-op receipt at the current version, never an error
            kept, _, total = TF.snapshot_files(
                path, version=at, prune=prune
            )
            if not kept and total > 0:
                v = at if at is not None else TF.latest_version(path)
                return _result(spark, "DELETE", v, 0, None)
        pos = TF.positions_where(
            spark, path, m["where"], version=at, prune=prune,
        ).localCheckpoint(eager=True)
        v = TF.commit_delete_positions(
            spark, path, pos, branch=branch,
            expected_version=expected_version,
        )
        return _result(spark, "DELETE", v, 0, None)

    m = _INSERT.match(text)
    if m:
        path = _table_path(m["t"], tables)
        v = TF.commit_append(
            spark, path, spark.sql(m["sel"]),
            stat_cols=_stat_cols(path), branch=branch,
            expected_version=expected_version,
        )
        return _result(spark, "INSERT", v, None, None)

    m = _ALTER_RENAME.match(text)
    if m:
        path = _table_path(m["t"], tables)
        v = TF.commit_rename_column(
            path, {m["old"]: m["new"]}, branch=branch,
            expected_version=expected_version,
        )
        return _result(spark, "ALTER", v, 0, None)

    m = _ALTER_WIDEN.match(text)
    if m:
        path = _table_path(m["t"], tables)
        v = TF.commit_widen_column(
            path, {m["col"]: m["ty"].lower()}, branch=branch,
            expected_version=expected_version,
        )
        return _result(spark, "ALTER", v, 0, None)

    m = _HISTORY.match(text)
    if m:
        return TF.read_history(spark, _table_path(m["t"], tables))

    m = _OPTIMIZE.match(text)
    if m:
        path = _table_path(m["t"], tables)
        v = TF.compact_binpack(
            spark, path, stat_cols=_stat_cols(path), branch=branch,
            expected_version=expected_version,
        )
        return _result(spark, "OPTIMIZE", v, None, None)

    m = _VACUUM.match(text)
    if m:
        path = _table_path(m["t"], tables)
        retain = int(m["n"]) if m["n"] else 2
        removed, kept = TF.vacuum(path, retain_versions=retain)
        return spark.createDataFrame(
            [("VACUUM", removed, kept)],
            "operation string, files_removed bigint, files_kept bigint",
        )

    raise ValueError(
        "format_sql: unrecognized statement — supported: MERGE INTO, "
        "UPDATE, DELETE FROM, INSERT INTO ... SELECT, ALTER TABLE "
        "... RENAME COLUMN, DESCRIBE HISTORY, OPTIMIZE, VACUUM"
    )
