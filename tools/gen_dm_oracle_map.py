"""Generate tests/data/dm_keys_sf001.csv — the vendored fingerprint ->
double-metaphone-primary mapping that lets the DuckDB oracle value-check the
metaphone-keyed flagship (`er_cluster_documents`, `er_blocking_keys`).

The driver's correctness gate runs oracle SQL at sf0.01 only, so the mapping
covers every distinct blocking fingerprint of /root/testdata/sf0.01/documents
(fingerprints are recomputed natively inside the oracle SQL; only the
fingerprint->code hop is vendored, because Double Metaphone is not
expressible in SQL).

Independence: codes come from `fia_own_map_spark.functions.phonetic`
(untruncated primary, what the Spark path uses), and every code's 4-char
truncation is cross-checked against PostgreSQL fuzzystrmatch `dmetaphone`
(an independent published implementation) when a server socket is available
at $PGDM_HOST (see tests/test_phonetic.py::test_pg_differential_corpus for
the standing 2475-name parity corpus). Any mismatch aborts generation.

Usage: python tools/gen_dm_oracle_map.py [sf_dir] [--pg-host /tmp/pgdm]
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from fia_own_map_spark.functions.phonetic import double_metaphone  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "data", "dm_keys_sf001.csv")

# combo/fingerprint SQL shared with __spark_entry__.oracle_sql — importing
# from the entry keeps the two in lockstep.
FP_SQL = """
    WITH docs AS (SELECT doc_id::VARCHAR AS url, string_split({name4}, ' ') AS toks
                  FROM read_parquet('{sf}/documents.parquet')),
    combos AS (
      SELECT url, toks AS c FROM docs
      UNION ALL
      SELECT url, list_concat(toks[1:i-1], toks[i+1:len(toks)]) AS c
      FROM docs, (SELECT unnest([1,2,3,4,5,6]) AS i) ix
      WHERE len(toks) > 2 AND i <= len(toks))
    SELECT DISTINCT upper(array_to_string(list_sort(c), '')) AS fp
    FROM combos WHERE length(array_to_string(c, '')) > 0 ORDER BY fp
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    pg_host = os.environ.get("PGDM_HOST", "/tmp/pgdm")
    import __spark_entry__ as entry

    name4 = entry._DOC_NAME_SQL.format(k=4)
    fps = [
        r[0]
        for r in duckdb.sql(FP_SQL.format(name4=name4, sf=sf)).fetchall()
        if r[0]
    ]
    rows = [(fp, double_metaphone(fp)[0]) for fp in fps]
    rows = [(fp, code) for fp, code in rows if code]

    # cross-check 4-char truncations against PostgreSQL fuzzystrmatch
    psql = "/usr/lib/postgresql/15/bin/psql"
    if os.path.exists(psql) and os.path.exists(pg_host):
        vals = ",".join("('" + fp.replace("'", "''") + "')" for fp, _ in rows)
        sql = f"SELECT n, dmetaphone(n) FROM (VALUES {vals}) t(n);"
        out = subprocess.run(
            [psql, "-h", pg_host, "-U", "postgres", "-d", "postgres",
             "-A", "-t", "-F", "|", "-c", sql],
            capture_output=True, text=True,
        )
        assert out.returncode == 0, out.stderr[:500]
        pg = dict(line.split("|") for line in out.stdout.strip().splitlines())
        bad = [(fp, code, pg.get(fp)) for fp, code in rows if pg.get(fp) != code[:4]]
        assert not bad, f"PG cross-check failed on {len(bad)}: {bad[:10]}"
        print(f"PG cross-check OK on {len(rows)} fingerprints")
    else:
        print("WARNING: no PG server — codes NOT cross-checked", file=sys.stderr)

    with open(OUT, "w") as f:
        f.write("fp,code\n")
        for fp, code in rows:
            f.write(f"{fp},{code}\n")
    print(f"wrote {len(rows)} mappings -> {OUT}")


if __name__ == "__main__":
    main()
