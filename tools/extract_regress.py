#!/usr/bin/env python3
"""Extract a runnable script-port vector file from a regress .out file.

The .out format echoes each statement verbatim, then (for row-returning
statements) a result table:

    select a, b from t;
     a | b
    ---+---
     1 | 2
    (1 row)

Output format (consumed by ScriptPortSpec.loadScript):

    ===STMT          -- execute, ignore any result
    <statement>
    ===SQL           -- execute AND compare to the pinned rows
    <statement>
    ===ROWS
    cell|cell|...
    ===ERR           -- statement the reference itself errors on (skipped)
    <statement>

Skipped at extraction: explain output, -- start_ignore blocks, psql
backslash commands, NOTICE/HINT/WARNING chatter, and any statement
matching a --skip pattern (unsupported constructs; the spec's Scaladoc
documents the categories).
"""
import re
import sys
import argparse

ap = argparse.ArgumentParser()
ap.add_argument("out_file")
ap.add_argument("vectors_file")
ap.add_argument("--skip", action="append", default=[],
                help="regex: statements matching become ===STMT-skipped entirely")
ap.add_argument("--keep-txn", action="store_true",
                help="keep BEGIN..ROLLBACK blocks as statements (the "
                     "engine's Txn scope emulation restores table "
                     "state); SAVEPOINT blocks still drop wholesale")
ap.add_argument("--sql-file", default=None,
                help="companion .sql (default: derived from the .out path); "
                     "source of COPY FROM STDIN inline data")
args = ap.parse_args()

# COPY t FROM STDIN blocks: the .out omits the stdin data (psql does
# not echo it), so pull each block's lines from the companion .sql and
# rewrite the COPY into a literal multi-row INSERT.
sql_path = args.sql_file or args.out_file.replace("/expected/", "/sql/") \
    .rsplit(".", 1)[0] + ".sql"
stdin_blocks = {}  # lowercased table -> list of (data_rows) in file order
try:
    sql_text = open(sql_path, encoding="utf-8", errors="replace").read()
    for m in re.finditer(
            r"(?im)^copy\s+([\w\".]+)(?:\s*\([^)]*\))?\s+from\s+stdin"
            r"([^;\n]*);\n(.*?)^\\\.$", sql_text, re.S | re.M):
        tbl = m.group(1).replace('"', "").lower()
        rows = [r for r in m.group(3).split("\n") if r != ""]
        stdin_blocks.setdefault(tbl, []).append((m.group(2), rows))
except OSError:
    pass

def copy_stdin_to_insert(stmt):
    """COPY t FROM STDIN [opts] -> INSERT INTO t VALUES ... using the
    next queued stdin block for that table (file order)."""
    m = re.match(r"(?is)^copy\s+([\w\".]+)(?:\s*\([^)]*\))?\s+from\s+stdin(.*?);?\s*$",
                 stmt)
    if not m:
        return None
    tbl = m.group(1).replace('"', "").lower()
    q = stdin_blocks.get(tbl)
    if not q:
        return None
    opts, rows = q.pop(0)
    allopts = opts + " " + m.group(2)
    nm = re.search(r"(?i)\bnull\s+(?:as\s+)?'([^']*)'", allopts)
    null_marker = nm.group(1) if nm else "\\N"
    dm = re.search(r"(?i)\bdelimiter\s+(?:as\s+)?'([^']*)'", allopts)
    delim = dm.group(1) if dm else "\t"
    def cell(v):
        if v == null_marker:
            return "NULL"
        return "'" + v.replace("'", "''") + "'"
    if not rows:
        return None
    if re.search(r"(?i)\breject\s+limit\b", allopts):
        # SREH copy: bad rows are rejected per-row, not failed wholesale
        # — emit one tolerated INSERT per row so a malformed/unroutable
        # row drops alone, like the reject limit would drop it
        return [("TRY", "INSERT INTO " + m.group(1) + " VALUES (" +
                 ", ".join(cell(c) for c in r.split(delim)) + ");")
                for r in rows]
    vals = ", ".join(
        "(" + ", ".join(cell(c) for c in r.split(delim)) + ")" for r in rows)
    return [("STMT", "INSERT INTO " + m.group(1) + " VALUES " + vals + ";")]

lines = open(args.out_file, encoding="utf-8", errors="replace").read().split("\n")
skip_res = [re.compile(p, re.I | re.S) for p in args.skip]

i = 0
entries = []  # (kind, stmt, rows)
prev_kept = [True]  # whether the most recent scanned statement was emitted
n = len(lines)

# standard_conforming_strings mode (scan.l): ON (the PG default) lexes
# '...' verbatim; OFF makes backslash an escape INSIDE the literal, so
# '\'' stays open. The suites toggle it mid-script (strings.sql);
# without tracking, the statement scanner desyncs on \' and glues
# WARNING chatter into the statement text.
std_strings = [True]

def is_sep(line):
    # psql's header separator is >= 3 dashes per column; a bare '--'
    # comment line must NOT match (an ERROR line followed by a '--'
    # comment banner would otherwise be sniffed as a result table and
    # swallow statements up to the next (N rows) fence)
    s = line.strip()
    return len(s) >= 3 and set(s) <= set("-+") and "-" in s

while i < n:
    line = lines[i]
    s = line.strip()
    if not s:
        i += 1
        continue
    if re.match(r"^\(\d+ rows?\)$", s):
        i += 1  # stray fence from a zero-column result table
        continue
    if s.startswith("/*"):
        # a block comment between statements (the scanner would glue
        # its body into the next statement) — skip to the close
        while i < n and "*/" not in lines[i]:
            i += 1
        i += 1
        continue
    if s.startswith("--"):
        if "start_ignore" in s:
            # the block's OUTPUT is unverifiable, but its STATEMENTS
            # change state (drop/create setup) — run them with errors
            # tolerated (===TRY)
            block = []
            i += 1
            while i < n and "end_ignore" not in lines[i]:
                block.append(lines[i])
                i += 1
            i += 1
            txt = "\n".join(block)
            # strip result tables / chatter: keep only lines that are
            # part of SQL statements (accumulate to ';' like the main
            # scanner, skipping obvious output)
            stmt_acc = []
            last_try = -1
            for ln in txt.split("\n"):
                t2 = ln.strip()
                if not t2 or t2.startswith("--") or t2.startswith("\\"):
                    continue
                if re.match(r"^(NOTICE|HINT|WARNING|DETAIL|CONTEXT|INFO|"
                            r"ERROR|LINE \d+|\s*\^|\(\d+ rows?\)|[\w ]*\|"
                            r"|[-+ ]+$)", t2):
                    if not stmt_acc:
                        # the reference ERRORED on the ignored statement
                        # — its effect was NONE; drop it so the engine
                        # (which may SUPPORT the form) stays in sync
                        if t2.startswith("ERROR") and last_try >= 0 \
                                and last_try == len(entries) - 1:
                            entries.pop()
                            last_try = -1
                        continue
                stmt_acc.append(ln)
                if t2.endswith(";"):
                    st2 = "\n".join(stmt_acc).strip()
                    stmt_acc = []
                    if re.match(r"(?i)^(drop|create|insert|update|delete|"
                                r"truncate|alter|set|reset|vacuum|analyze|"
                                r"copy|select|begin|commit|rollback)\b", st2) \
                            and not any(r.search(st2) for r in skip_res):
                        entries.append(("TRY", st2, []))
                        last_try = len(entries) - 1
            continue
        i += 1
        continue
    if s.startswith("\\"):  # psql meta-command; its output has no (N rows)
        # \copy t from 'data/f' is a client-side data load: rewrite to
        # the SQL COPY the engine runs (the spec resolves data/ paths
        # to test resources)
        cm = re.match(r"(?i)^\\copy\s+(?:public\.)?([\w\"]+)\s+from\s+"
                      r"'([^']+)'(.*)$", s)
        if cm:
            dm = re.search(r"(?i)delimiter(?:\s+as)?\s+'([^']*)'", cm.group(3))
            opts = " WITH (DELIMITER '%s')" % dm.group(1) if dm else ""
            entries.append(("STMT",
                            "COPY %s FROM '%s'%s;" % (cm.group(1),
                                                      cm.group(2), opts),
                            []))
            i += 1
            continue
        i += 1              # skip it AND its output block (ends at
        # \copy/\set/... emit nothing: skipping to the next blank line
        # would swallow the statements that follow them
        if re.match(r"\\d", s):
            # \d output is MULTI-paragraph (columns, then Indexes:,
            # Check constraints:, Inherits:, ... separated by blank
            # lines, and one `Table "..."` block PER child relation) —
            # skip until a line that starts a real SQL statement or
            # psql command
            stmt_start = re.compile(
                r"(?i)^(select|insert|update|delete|create|alter|drop|"
                r"set|reset|show|begin|commit|rollback|abort|truncate|"
                r"copy|vacuum|analyze|explain|grant|revoke|with|values|"
                r"prepare|execute|deallocate|declare|fetch|close|do|"
                r"comment|lock|--(?![-+])|/\*|\\\\)")
            while i < n and not (lines[i].strip() and
                                 stmt_start.match(lines[i].strip())):
                i += 1
        elif not re.match(r"\\(copy|set|unset|cd|echo|timing|pset|c\b|connect\b)", s):
            while i < n and lines[i].strip():  # the next blank line
                i += 1
        continue
    if re.match(r"^(NOTICE|HINT|WARNING|DETAIL|CONTEXT|INFO|LINE \d+|\s*\^"
                r"|PL/pgSQL function|SQL statement |SQL function )", s):
        i += 1
        # multi-line DETAIL continuations print WITHOUT a prefix
        # ('drop cascades to table x' per dropped object) — they
        # belong to the message, not the statement stream
        while i < n and re.match(r"^drop cascades to ", lines[i].strip()):
            i += 1
        continue
    if re.match(r"^ERROR", s):
        # attach to the previous statement — but ONLY when that
        # statement was actually emitted: an ERROR after a DROPPED
        # statement (an EXPLAIN, or a --skip match) belongs to the
        # dropped one, not to the last kept entry
        if prev_kept[0] and entries and entries[-1][0] in ("STMT", "SQL"):
            k, st, rows = entries[-1]
            entries[-1] = ("ERR", st, [])
        i += 1
        continue
    # accumulate a statement until a line ending with ';' outside
    # single quotes AND outside $tag$ dollar quotes. Per-line '--'
    # comments are stripped (state carried across lines) so an interior
    # comment can't hide the terminator; comments inside dollar-quoted
    # bodies are preserved (they are part of the function source).
    def scan_line(text, in_q, dtag, in_uq=False):
        j = 0
        out = []
        while j < len(text):
            c = text[j]
            if dtag is not None:
                if text.startswith(dtag, j):
                    out.append(dtag)
                    j += len(dtag)
                    dtag = None
                    continue
                out.append(c)
                j += 1
            elif in_q:
                # scan.l: backslash escapes inside a REGULAR literal
                # only when standard_conforming_strings is off; U&
                # literals (xus) never treat backslash lexically
                if c == "\\" and not std_strings[0] and not in_uq \
                        and j + 1 < len(text):
                    out.append(c)
                    out.append(text[j + 1])
                    j += 2
                    continue
                if c == "'":
                    in_q = False
                out.append(c)
                j += 1
            else:
                if c == "'":
                    in_q = True
                    in_uq = text[max(0, j - 2):j].upper() == "U&"
                    out.append(c)
                    j += 1
                elif c == "$":
                    m2 = re.match(r"\$[A-Za-z_0-9]*\$", text[j:])
                    if m2:
                        dtag = m2.group(0)
                        out.append(dtag)
                        j += len(dtag)
                    else:
                        out.append(c)
                        j += 1
                elif text[j:j+2] == "--":
                    break  # trailing comment: cut
                else:
                    out.append(c)
                    j += 1
        return "".join(out), in_q, dtag, in_uq
    eff, carry_q, carry_d, carry_uq = scan_line(line, False, None)
    eff_lines = [eff]
    while not (eff.rstrip().endswith(";") and not carry_q and carry_d is None):
        i += 1
        if i >= n:
            break
        eff, carry_q, carry_d, carry_uq = scan_line(
            lines[i], carry_q, carry_d, carry_uq)
        eff_lines.append(eff)
    i += 1
    stmt = "\n".join(eff_lines).strip()
    sm = re.match(r"(?is)^\s*(?:set\s+standard_conforming_strings"
                  r"\s*(?:to|=)?\s*(on|off|true|false)"
                  r"|(reset)\s+standard_conforming_strings)\s*;?\s*$", stmt)
    if sm:
        std_strings[0] = sm.group(2) is not None or \
            sm.group(1).lower() in ("on", "true")
    # a result table directly follows?  header line, ---+--- separator.
    # The header can't be a statement (no trailing ';') or a comment
    # banner ('--' prefix) — a dash banner after a ';' line would
    # otherwise be taken for a single-column separator and swallow
    # everything to the next (N rows) fence.
    rows = None
    j = i
    # WARNING/HINT chatter can sit between a statement and its result
    # table (escape_string_warning); skip it before the header check
    while j < n and re.match(
            r"^(NOTICE|HINT|WARNING|DETAIL|CONTEXT|INFO|LINE \d+|\s*\^"
            r"|PL/pgSQL function|SQL statement |SQL function )",
            lines[j].strip()):
        j += 1
        # unprefixed DETAIL continuations (one 'drop cascades to ...'
        # line per dropped object)
        while j < n and re.match(r"^drop cascades to ",
                                 lines[j].strip()):
            j += 1
    if j > i:
        i = j
    header_ok = (j < n and lines[j].strip() and
                 not lines[j].rstrip().endswith(";") and
                 not lines[j].strip().startswith("--") and
                 not lines[j].strip().startswith("ERROR"))
    if header_ok and j + 1 < n and is_sep(lines[j + 1]):
        # parse until (N rows)
        k = j + 2
        body = []
        while k < n and not re.match(r"^\(\d+ rows?\)", lines[k].strip()):
            body.append(lines[k])
            k += 1
        if k < n:
            m = re.match(r"^\((\d+) rows?\)", lines[k].strip())
            count = int(m.group(1))
            # multi-line cells would break the count; only accept clean tables
            if len(body) == count:
                ncols = lines[j].count("|") + 1
                if ncols == 1:
                    # a single-column result may CONTAIN pipes (e.g.
                    # string_to_array('1|2|3', …)); escape them with a
                    # sentinel the loader translates back after its
                    # cell split
                    rows = [[r.strip().replace("|", "⎮")] for r in body]
                else:
                    rows = [[c.strip() for c in r.split("|")] for r in body]
                i = k + 1
            else:
                rows = None
                i = k + 1  # still consume the block
                stmt = None  # unparseable result: drop statement too
    if stmt is None:
        continue
    low = stmt.lower()
    if low.startswith("explain"):
        # consume its un-fenced output: explain output IS fenced with (N rows)
        # and was parsed above as rows; just drop
        prev_kept[0] = False
        continue
    if any(r.search(stmt) for r in skip_res):
        prev_kept[0] = False
        continue
    prev_kept[0] = True
    if rows is not None:
        entries.append(("SQL", stmt, rows))
    else:
        ins = copy_stdin_to_insert(stmt)
        if ins:
            for kind, st in ins:
                entries.append((kind, st, []))
        else:
            # psql runs `reset a; reset b; reset c;` on one line as
            # three statements; the engine takes one verb per call
            segs = [x.strip() for x in stmt.split(";") if x.strip()]
            if len(segs) > 1 and "'" not in stmt and all(
                    re.match(r"(?i)^(set|reset|analyze|vacuum)\b", x)
                    for x in segs):
                for x in segs:
                    entries.append(("STMT", x + ";", []))
            else:
                entries.append(("STMT", stmt, []))

# Transaction blocks: the engine commits each statement atomically
# (staged swap) and has no ROLLBACK, so a BEGIN..ROLLBACK/ABORT block
# would leave its effects applied — wrong rows downstream. The correct
# port is to SKIP the whole block. A BEGIN..COMMIT/END block keeps its
# body (each statement commits on its own) and drops only the wrappers.
# SAVEPOINT handling inside a kept block: a [SAVEPOINT s .. ROLLBACK TO
# s] span is a net no-op on table state (everything in it rolled back),
# so the span drops and the rest of the body survives; RELEASE and
# stray ROLLBACK TO are wrappers with no state effect and drop alone.
# NOTE `ROLLBACK TO ...` is NOT a block terminator (xact.c treats it as
# a savepoint rewind, the transaction stays open).
def _is_rollback_to(stmt):
    return re.match(r"(?is)^\s*rollback\s+(?:work\s+|transaction\s+)?to\b",
                    stmt) is not None

def _drop_savepoint_spans(body):
    out = []
    k = 0
    while k < len(body):
        st = body[k][1].strip().rstrip(";")
        low = st.lower()
        if low.startswith("savepoint"):
            parts = low.split()
            name = parts[1] if len(parts) > 1 else ""
            m = k + 1
            found = None
            while m < len(body):
                s2 = body[m][1].strip().rstrip(";").lower()
                if _is_rollback_to(s2) and s2.split()[-1] == name:
                    found = m
                    break
                if s2.startswith("release") and name in s2:
                    break  # released: span effects commit — keep body
                m += 1
            if found is not None:
                k = found + 1  # rolled-back span: net no-op, drop it
            else:
                k += 1  # savepoint marker alone
            continue
        if low.startswith("release") or _is_rollback_to(st):
            k += 1
            continue
        out.append(body[k])
        k += 1
    return out

def strip_txn_blocks(entries):
    out = []
    i = 0
    n = len(entries)
    while i < n:
        kind, stmt, rows = entries[i]
        first = stmt.split(None, 1)[0].rstrip(";").lower() if stmt else ""
        if first in ("begin", "start"):
            j = i + 1
            term = None
            while j < n:
                st_j = entries[j][1]
                w = st_j.split(None, 1)[0].rstrip(";").lower()
                if w in ("rollback", "abort", "commit", "end") \
                        and not _is_rollback_to(st_j):
                    term = w
                    break
                j += 1
            body = _drop_savepoint_spans(entries[i + 1:j])
            if term in ("commit", "end"):
                out.extend(body)
            elif args.keep_txn and term:
                # keep the whole block: the engine's Txn emulation
                # snapshots touched tables at first mutation and
                # restores them at ROLLBACK
                out.append(("STMT", "BEGIN;", []))
                out.extend(body)
                out.append(("STMT", "ROLLBACK;", []))
            # else rollback/abort (or unterminated): block dropped
            i = j + 1 if term else n
        elif first in ("savepoint", "release") or _is_rollback_to(stmt):
            i += 1  # stray savepoint wrapper outside a block: drop
        elif first in ("rollback", "abort", "commit", "end"):
            i += 1  # stray wrapper with no matching BEGIN: drop
        else:
            out.append(entries[i])
            i += 1
    return out

entries = strip_txn_blocks(entries)

with open(args.vectors_file, "w", encoding="utf-8") as f:
    f.write("# generated by tools/extract_regress.py from " +
            args.out_file.split("/root/reference/")[-1] + "\n")
    for p in args.skip:
        f.write("# excluded at extraction (--skip): " + p + "\n")
    for kind, stmt, rows in entries:
        if kind in ("ERR", "TRY"):
            f.write("===" + kind + "\n" + stmt + "\n")
        elif kind == "SQL":
            f.write("===SQL\n" + stmt + "\n===ROWS\n")
            for r in rows:
                f.write("|".join(r) + "\n")
        else:
            f.write("===STMT\n" + stmt + "\n")

counts = {}
for k, _, _ in entries:
    counts[k] = counts.get(k, 0) + 1
print(counts)
