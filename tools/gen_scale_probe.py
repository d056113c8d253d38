#!/usr/bin/env python
"""Generate the sf1 scale-probe dataset: the driver's sf0.1 testdata
replicated 10x with shifted keys — a 10x-width scale-up (more users,
docs, orders; the SAME 30-day calendar), the shape a real corpus grows
in.  Output: /root/repo/scale_probe/sf1/*.parquet (gitignored data,
never committed).

Replication rules (copy c = 0..9; copy 0 is verbatim):

* every table's keys shift by c * 10^k with 10^k above the key range,
  so FK joins stay aligned WITHIN a copy and never collide across
  copies (customer+orders+lineitem+part+supplier shift together);
* documents: copies 1-9 suffix every token with q<c> (alphanumeric —
  an underscore would SPLIT under the [^a-z0-9]+ tokenizer, making every
  second token the copy digit and collapsing shingle diversity: the
  first generator draft produced 26M within-copy LSH candidates that
  way, a generator pathology, not an operator one) — within-copy
  shingle/near-dup structure is EXACTLY preserved (order untouched, so
  every planted dup family replicates 10x) while cross-copy similarity
  is zero (disjoint vocabularies); naive verbatim replication would
  instead create 10-member exact-dup clusters whose pair joins blow up
  O(c^2) — a pathology of the generator, not of the operators;
* embeddings: copies 1-9 perturb each component by a deterministic
  index+copy-dependent offset, breaking cross-copy cosine ties for the
  same reason (cosine is scale-invariant, so a multiplicative tweak
  would NOT work);
* nation/region: dimensions — one copy, like TPC-H dbgen.

DuckDB does the heavy lifting (no Spark needed to build inputs).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "scale_probe", "sf1")
COPIES = int(os.environ.get("SCALE_PROBE_COPIES", "10"))

# (table, [(key_col, shift_step)]) — step chosen above the key range
KEY_SHIFTS = {
    "events": [("event_id", 10**6), ("user_id", 10**4)],
    "orders": [("o_orderkey", 10**7), ("o_custkey", 10**5)],
    "lineitem": [("l_orderkey", 10**7), ("l_partkey", 10**5), ("l_suppkey", 10**4)],
    "customer": [("c_custkey", 10**5)],
    "supplier": [("s_suppkey", 10**4)],
    "part": [("p_partkey", 10**5)],
}
DIMENSIONS = ("nation", "region")


def replicate_plain(con, table: str) -> None:
    shifts = {k: s for k, s in KEY_SHIFTS[table]}
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
    ).fetchall()]
    arms = []
    for c in range(COPIES):
        sel = ", ".join(
            f"({col} + {c * shifts[col]}) AS {col}" if col in shifts else col
            for col in cols
        )
        arms.append(f"SELECT {sel} FROM src")
    con.execute(f"""
        COPY (
          WITH src AS (SELECT * FROM read_parquet('{SRC}/{table}.parquet'))
          {" UNION ALL ".join(arms)}
        ) TO '{DST}/{table}.parquet' (FORMAT PARQUET)
    """)


def replicate_documents(con) -> None:
    arms = ["SELECT doc_id, text, lang, source, n_chars "
            f"FROM read_parquet('{SRC}/documents.parquet')"]
    for c in range(1, COPIES):
        arms.append(f"""
        SELECT doc_id + {c * 10**5} AS doc_id,
               array_to_string(
                 list_transform(string_split(text, ' '),
                                x -> x || 'q{c}'), ' ') AS text,
               lang, source,
               CAST(length(array_to_string(
                 list_transform(string_split(text, ' '),
                                x -> x || 'q{c}'), ' ')) AS BIGINT) AS n_chars
        FROM read_parquet('{SRC}/documents.parquet')
        """)
    con.execute(f"COPY ({' UNION ALL '.join(arms)}) "
                f"TO '{DST}/documents.parquet' (FORMAT PARQUET)")


def replicate_embeddings(con) -> None:
    arms = [f"SELECT vec_id, embedding, label FROM read_parquet('{SRC}/embeddings.parquet')"]
    for c in range(1, COPIES):
        # deterministic per-copy perturbation DIRECTION (multiplier
        # c+1 ∈ {2..10} is distinct AND nonzero mod 11 for c=1..9 —
        # 2c+3 hit 0 at c=4, collapsing that copy to one constant
        # offset, ADVICE r12) at ~0.6 L2 magnitude on the unit-norm
        # corpus, then renormalized — big enough that cross-copy cosine
        # falls under every near-dup threshold, structure-preserving
        # within a copy (one shared offset field)
        pert = f"(x + CAST(0.024 * (((i * {c + 1}) % 11) - 5) AS FLOAT))"
        arms.append(f"""
        SELECT vec_id + {c * 10**5} AS vec_id,
               CAST(list_transform(_p, y -> CAST(y / sqrt(_n) AS FLOAT)) AS FLOAT[]) AS embedding,
               label
        FROM (
          SELECT vec_id, label, _p, list_dot_product(_p, _p) AS _n
          FROM (
            SELECT vec_id, label,
                   list_transform(embedding, (x, i) -> {pert}) AS _p
            FROM read_parquet('{SRC}/embeddings.parquet')
          )
        )
        """)
    con.execute(f"COPY ({' UNION ALL '.join(arms)}) "
                f"TO '{DST}/embeddings.parquet' (FORMAT PARQUET)")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for t in DIMENSIONS:
        con.execute(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
                    f"TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: dimension, 1 copy")
    for t in KEY_SHIFTS:
        replicate_plain(con, t)
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    replicate_documents(con)
    replicate_embeddings(con)
    for t in ("documents", "embeddings"):
        n = con.execute(f"SELECT COUNT(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    # sanity: cross-copy cosine for the same base vector must be well
    # under every near-dup threshold in the suite
    worst = con.execute(f"""
        WITH e AS (SELECT vec_id, embedding FROM read_parquet('{DST}/embeddings.parquet'))
        SELECT MAX(
          list_dot_product(a.embedding, b.embedding)
          / (sqrt(list_dot_product(a.embedding, a.embedding))
             * sqrt(list_dot_product(b.embedding, b.embedding)))
        )
        FROM e a JOIN e b
          ON (b.vec_id % {10**5}) = (a.vec_id % {10**5}) AND b.vec_id > a.vec_id
    """).fetchone()[0]
    print(f"max cross-copy cosine (same base vector): {worst:.4f}")
    if worst > 0.93:
        sys.exit(f"cross-copy cosine {worst} too high — near-dup probe would "
                 f"measure generator pathology, not operator scaling")


if __name__ == "__main__":
    main()
