"""Generate tests/data/sx_keys_sf001.csv — the vendored token -> soundex
mapping that lets the DuckDB oracle value-check the soundex blocking-key
family (`er_blocking_keys_soundex`), the same approach as the metaphone map
(tools/gen_dm_oracle_map.py).

The driver's correctness gate runs oracle SQL at sf0.01 only, so the mapping
covers every distinct name token (length > 1) of
/root/testdata/sf0.01/documents; tokens are recomputed natively inside the
oracle SQL — only the token -> soundex hop is vendored, because Spark's
exact soundex variant (American Soundex with the NARA H/W rule and
stop-at-non-letter handling) is not expressible in portable SQL.

Independence: codes come from `phonetic.soundex_py`, which is
differential-tested bit-exact against Spark's JVM `F.soundex`
(tests/test_phonetic.py::test_soundex_matches_spark). The generator also
cross-checks against PostgreSQL fuzzystrmatch `soundex` (an independent
published implementation) when a server socket is available at $PGDM_HOST;
divergences are allowed ONLY in the two documented rule gaps of the PG
variant (no H/W collapse; non-letters skipped instead of terminating) and
anything else aborts generation.

Usage: python tools/gen_sx_oracle_map.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from fia_own_map_spark.functions.phonetic import soundex_py  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "data", "sx_keys_sf001.csv")

TOK_SQL = """
    WITH docs AS (SELECT string_split({name4}, ' ') AS toks
                  FROM read_parquet('{sf}/documents.parquet'))
    SELECT DISTINCT t.tok FROM docs, unnest(docs.toks) AS t(tok)
    WHERE length(t.tok) > 1 ORDER BY t.tok
"""


def _pg_divergence_allowed(tok: str) -> bool:
    """PG fuzzystrmatch differs from the NARA/Spark variant exactly when the
    token contains H/W after the first letter (no H/W collapse rule in PG)
    or any non-letter character (both skip them, but a non-letter FIRST char makes Spark pass the string through while PG soundexes the letter tail).
    """
    return bool(re.search(r"[^A-Za-z]", tok) or re.search(r"[hwHW]", tok[1:]))


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    pg_host = os.environ.get("PGDM_HOST", "/tmp/pgdm")
    import __spark_entry__ as entry

    name4 = entry._DOC_NAME_SQL.format(k=4)
    toks = [r[0] for r in duckdb.sql(TOK_SQL.format(name4=name4, sf=sf)).fetchall() if r[0]]
    rows = [(t, soundex_py(t)) for t in toks]
    rows = [(t, code) for t, code in rows if code]

    psql = None
    for cand in ("/usr/lib/postgresql/15/bin/psql", "/usr/bin/psql"):
        if os.path.exists(cand):
            psql = cand
            break
    if psql and os.path.exists(pg_host):
        vals = ",".join("('" + t.replace("'", "''") + "')" for t, _ in rows)
        sql = f"SELECT n, soundex(n) FROM (VALUES {vals}) t(n);"
        out = subprocess.run(
            [psql, "-h", pg_host, "-U", "postgres", "-d", "postgres",
             "-A", "-t", "-F", "|", "-c", sql],
            capture_output=True, text=True,
        )
        assert out.returncode == 0, out.stderr[:500]
        pg = dict(line.split("|") for line in out.stdout.strip().splitlines())
        diverged = [(t, c, pg.get(t)) for t, c in rows if pg.get(t) != c]
        bad = [d for d in diverged if not _pg_divergence_allowed(d[0])]
        assert not bad, f"PG cross-check failed on {len(bad)}: {bad[:10]}"
        print(
            f"PG cross-check OK on {len(rows)} tokens "
            f"({len(diverged)} documented-rule divergences allowed)"
        )
    else:
        print("WARNING: no PG server — codes NOT cross-checked", file=sys.stderr)

    with open(OUT, "w") as f:
        f.write("tok,code\n")
        for t, code in rows:
            f.write(f"{t},{code}\n")
    print(f"wrote {len(rows)} mappings -> {OUT}")


if __name__ == "__main__":
    main()
