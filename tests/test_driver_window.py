"""Guards on the correctness-driver window contract: the driver
verifies the FIRST 50 entries of queries(), so rotation edits to
_DRIVER_PRIORITY must keep the list exactly 50 well-formed slots and
every never-rowed registration must be inside them.
"""

from __future__ import annotations

import json
import os
import re

from demy_spark import queries as Q

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_list_is_exactly_the_window():
    assert len(Q._DRIVER_PRIORITY) == 50
    assert len(set(Q._DRIVER_PRIORITY)) == 50, "duplicate window slots"
    unknown = [n for n in Q._DRIVER_PRIORITY if n not in Q.REGISTRY]
    assert not unknown, f"window names not in REGISTRY: {unknown}"


def test_ordered_registry_puts_window_first():
    names = list(Q.queries())
    assert names[:50] == [n for n in Q._DRIVER_PRIORITY]
    assert sorted(names) == sorted(Q.REGISTRY)


def test_every_query_is_oracle_backed():
    missing = [n for n, q in Q.REGISTRY.items() if not q.oracle]
    assert not missing, f"rows-only queries: {missing}"


def test_never_rowed_registrations_are_in_window():
    """Any registered query with no row in ANY CORRECTNESS_r*.json
    artifact must sit in the first 50 — a new registration left outside
    the window would close the round without a correctness row."""
    rowed: set[str] = set()
    for f in os.listdir(REPO):
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f):
            rowed.update(json.load(open(os.path.join(REPO, f))))
    never_rowed = [n for n in Q.REGISTRY if n not in rowed]
    window = set(Q._DRIVER_PRIORITY)
    outside = [n for n in never_rowed if n not in window]
    assert not outside, f"never-rowed registrations outside the window: {outside}"


def test_gate_table_masking_is_lexer_accurate():
    """_gate_table / mask_sql_spans must survive the two span-masking
    traps (r8 review): a '--' INSIDE a string literal must not open a
    comment that swallows the FROM clause, and a leading -- comment
    must not hide an existing WITH (which would get a second,
    unparseable WITH prepended)."""
    from demy_spark.queries import _gate_table

    s1 = _gate_table(
        "SELECT replace(text, '--', ' ') AS t, doc_id FROM documents "
        "WHERE lang = 'en'",
        "documents", "doc_ok", "doc_id IS NOT NULL",
    )
    assert "FROM doc_ok" in s1 and s1.count("FROM documents") == 1  # CTE only
    assert "'--'" in s1  # literal restored verbatim
    s2 = _gate_table(
        "-- note with apostrophe's\nWITH a AS (SELECT doc_id FROM documents)\n"
        "SELECT * FROM a",
        "documents", "doc_ok", "doc_id IS NOT NULL",
    )
    # the CTE merged INTO the existing WITH (one WITH keyword, comment
    # preserved above it) — not a second prepended WITH
    assert s2.count("WITH") == 1
    assert s2.lstrip().startswith("-- note") and "doc_ok AS" in s2
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR, lang VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1,'x--y','en'), (NULL,'z','en')")
    assert con.execute(s1).fetchall() == [("x y", 1)]
    assert con.execute(s2).fetchall() == [(1,)]


def test_every_gated_oracle_has_no_stray_table_refs():
    """Every gate_embeddings/gate_doc_ids oracle must reference its
    gated table ONLY inside the hygiene CTE — a stray raw reference
    means the rename silently no-opped (the masking trap class)."""
    import re

    from demy_spark import queries as Q

    for name, q in Q.REGISTRY.items():
        for alias, table in (("emb_ok", "embeddings"), ("doc_ok", "documents")):
            if q.oracle and f"{alias} AS" in q.oracle:
                masked, _ = Q.mask_sql_spans(q.oracle)
                raw = len(re.findall(rf"\b{table}\b", masked))
                assert raw == 1, f"{name}: {raw} raw {table} refs (want CTE only)"


def test_gate_table_handles_with_recursive():
    """WITH RECURSIVE: the hygiene CTE must slot AFTER the RECURSIVE
    token (RECURSIVE must directly follow WITH in both engines;
    ADVICE r8 — latent until a recursive oracle is gated)."""
    import duckdb

    from demy_spark.queries import _gate_table

    sql = (
        "-- walk\nWITH RECURSIVE chain AS (\n"
        "  SELECT doc_id, 1 AS depth FROM documents WHERE doc_id = 1\n"
        "  UNION ALL\n"
        "  SELECT d.doc_id, c.depth + 1 FROM documents d\n"
        "  JOIN chain c ON d.doc_id = c.doc_id + 1 WHERE c.depth < 3)\n"
        "SELECT max(depth) AS md FROM chain"
    )
    gated = _gate_table(sql, "documents", "doc_ok", "doc_id IS NOT NULL")
    assert re.search(r"WITH(\s|--[^\n]*\n)+RECURSIVE doc_ok AS", gated)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT)")
    con.execute("INSERT INTO documents VALUES (1), (2), (3), (NULL)")
    assert con.execute(gated).fetchall() == [(3,)]


def test_q141_oracle_is_lazy_at_import():
    """The q141 oracle reads fixture files — those reads must defer
    past module import so importing demy_spark.queries never depends
    on fixture data being present (ADVICE r9). Checked in a fresh
    subprocess because the in-process registry may already have
    resolved (and cached) the oracle."""
    import subprocess
    import sys

    code = (
        "from demy_spark import queries as Q\n"
        "q = Q.REGISTRY['q141_crawl_site']\n"
        "assert callable(q._oracle), 'oracle resolved at import time'\n"
        "s = q.oracle\n"
        "assert isinstance(s, str) and s\n"
        "assert q._oracle == s, 'resolution must cache'\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    assert r.returncode == 0, r.stderr
