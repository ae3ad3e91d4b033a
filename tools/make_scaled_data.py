"""Synthesize a larger scale factor from the driver's sf0.1 catalog.

Concatenates N disjoint copies of every table with all key domains shifted
per copy (one offset per key family, so every FK relationship — including
the cross-table doc_id = event_id probe — is preserved inside each replica).
The result is N self-contained TPC-H-ish worlds: row counts, join fan-outs
and group cardinalities scale by N with unchanged per-row semantics, which
is exactly what a wall-time-vs-data-size experiment needs. Values are NOT
resampled — this is a perf corpus, not a statistics corpus.

Two columns are perturbed rather than copied verbatim, because real
corpora grow their CONTENT space, not their bucket occupancy:

- ``documents.text``: every word gets a replica tag (replica 0 keeps the
  original), so replicas are textually disjoint — otherwise every doc has
  N exact copies, shingle buckets inflate ×N and candidate-pair counts in
  the n-gram/containment/minhash dedups inflate ×N² (measured ×21-×81 at
  N=10), which models a pathological corpus, not a grown one;
- ``embeddings.label``: shifted per replica like a key (labels are cluster
  ids — new data forms new clusters; IVF cells at scale keep occupancy
  bounded, so the label-bucketed pairwise dedup must see constant bucket
  sizes as the corpus grows).

    python tools/make_scaled_data.py [src_dir] [out_dir] [n_copies] [tables]

Defaults: /root/testdata/sf0.1 → /tmp/dfs_scaled/sf1 × 10, all tables.
``tables`` is an optional comma-list restricting which tables are
replicated ×N — the rest are copied verbatim (1 replica), which keeps the
catalog complete while growing only the families under test (e.g.
``documents,embeddings,events`` for a ~sf10 dedup/ANN/streaming cell
without a 60 M-row lineitem nobody queries there). Idempotent (skips when
the output exists with the expected row count).
"""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: key column → offset family; columns in the same family shift together so
#: cross-table equality joins keep matching inside a replica
KEY_FAMILIES = {
    "region": {"r_regionkey": "region"},
    "nation": {"n_nationkey": "nation", "n_regionkey": "region"},
    "customer": {"c_custkey": "cust", "c_nationkey": "nation"},
    "supplier": {"s_suppkey": "supp", "s_nationkey": "nation"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    # doc_id joins event_id in the corpus (scalar_try_cast), and vec_id is the
    # embedding row id — one shared 'id' family keeps every such probe alive
    "events": {"event_id": "id", "user_id": "user"},
    "documents": {"doc_id": "id"},
    "embeddings": {"vec_id": "id", "label": "label"},
}

#: per-replica column rewrites (i = replica index); replica 0 is verbatim
PERTURB = {
    ("documents", "text"): (
        "array_to_string(list_transform(string_split(text, ' '), "
        "w -> w || 'r{i}'), ' ') AS text"
    ),
}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dfs_scaled/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    scaled_tables = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set(TABLES)
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    # one offset per family = max over every column in the family, +1
    offsets: dict[str, int] = {}
    for t, fams in KEY_FAMILIES.items():
        for col, fam in fams.items():
            mx = con.execute(
                f"SELECT max({col}) FROM read_parquet('{src}/{t}.parquet')"
            ).fetchone()[0]
            offsets[fam] = max(offsets.get(fam, 0), int(mx) + 1)

    for t in TABLES:
        n_t = n if t in scaled_tables else 1
        dst = os.path.join(out, f"{t}.parquet")
        n_src = con.execute(
            f"SELECT count(*) FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
        if os.path.exists(dst):
            n_dst = con.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')"
            ).fetchone()[0]
            if n_dst == n_src * n_t:
                print(f"{t}: up to date ({n_dst} rows)")
                continue
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        fams = KEY_FAMILIES.get(t, {})
        selects = []
        for i in range(n_t):
            exprs = []
            for c in cols:
                if c in fams:
                    exprs.append(f"{c} + {i * offsets[fams[c]]} AS {c}")
                elif i > 0 and (t, c) in PERTURB:
                    exprs.append(PERTURB[(t, c)].format(i=i))
                else:
                    exprs.append(c)
            selects.append(
                f"SELECT {', '.join(exprs)} FROM read_parquet('{src}/{t}.parquet')"
            )
        union = "\nUNION ALL\n".join(selects)
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT parquet, COMPRESSION zstd)")
        print(f"{t}: wrote {n_src * n_t} rows")
    print(f"done → {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
