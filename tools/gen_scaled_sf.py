"""Scale the driver's sf0.1 tables up by an integer factor (default 10 →
"sf1.0") for local scaling measurements — the closest local proxy for the
100× claim (VERDICT r3 item 6). The driver testdata is read-only, so the
output goes to /tmp.

Construction: R key-shifted copies of every data-scaled table, FK-consistent
(o_custkey shifts with customer, l_partkey/l_suppkey/l_orderkey with their
parents). Fixed dims (region, nation) copy once. Two tables get a per-copy
transform so that SIMILARITY STRUCTURE scales linearly the way a real
bigger corpus would, instead of quadratically:

- documents (round 5: Heaps-consistent salting, VERDICT r4 item 8): copy
  i>0 renames a SUBSET of token types to `c{i}`-prefixed variants instead
  of every token. Renaming is a per-copy bijection on types, so
  within-copy Jaccard — and every within-copy near-dup pair — is
  preserved exactly; which types are renamed controls the two corpus
  statistics being modeled:
    * the COMMON head (most-frequent types covering ≥ COMMON_OCC_FRAC=40%
      of token occurrences — a few hundred types under Zipf) renames in
      EVERY copy, so a typical cross-copy doc pair disagrees on ≥40% of
      token OCCURRENCES and its expected Jaccard falls below
      (1-.4)/(1+.4) ≈ 0.43 < 0.5, the lowest near-dup threshold in the
      engine. This is an occurrence-mass bound, not a per-doc
      distinct-SET bound: a doc dominated by rare types that also missed
      both copies' rare slices can keep cross-copy set-Jaccard ≥ 0.5 —
      measured at sf1.0: 256 truth pairs at sf0.1 grow to 2608 at 10×
      (10.19×; the ~1.9% above-linear tail is exactly these cross-copy
      pairs — tools/SELFCHECK_SF1_r5.txt), versus the 45× R-clique naive
      replication produces at R=10 (real corpora carry some cross-shard
      near-dups too);
    * RARE types (the other 60% of occurrences but ~all of the
      vocabulary) rename with per-copy probability √(i+1)−√i, so the
      expected new types after R copies total V·(√R − 1): vocabulary
      grows ~√R — Heaps' law with β = 0.5 — instead of the old
      all-tokens prefix's unrealistic R×, which overstated the scaling
      ratios of vocabulary-bound queries (x_token_freq measured 4.40× at
      10× data under R× vocabulary).
  Reassembly normalizes inter-token whitespace to single spaces (the
  engine tokenizes on \s+, so token sequences are unchanged).
- embeddings: copy i's vector is circularly rotated by i — within-copy
  cosine geometry is exactly preserved (rotation is orthogonal on the
  index set), cross-copy cosine decorrelates.

Usage: python tools/gen_scaled_sf.py [R] [src_dir] [dst_dir]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

COMMON_OCC_FRAC = 0.4  # occurrence share of the always-salted common head

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1.0"

# data-scaled tables: primary key + FK columns, each shifted by
# i * (max - min + 1 of its OWN domain in the source) so copies never
# collide (0-based id spaces collide under a bare max shift: with ids
# 0..4999, copy3's doc 0 and copy2's doc 4999 would both land on 14997)
KEYED = {
    "customer": {"c_custkey": "customer.c_custkey"},
    "supplier": {"s_suppkey": "supplier.s_suppkey"},
    "part": {"p_partkey": "part.p_partkey"},
    "orders": {
        "o_orderkey": "orders.o_orderkey",
        "o_custkey": "customer.c_custkey",
    },
    "lineitem": {
        "l_orderkey": "orders.o_orderkey",
        "l_partkey": "part.p_partkey",
        "l_suppkey": "supplier.s_suppkey",
    },
    "events": {
        "event_id": "events.event_id",
        "user_id": "events.user_id",
    },
    "documents": {"doc_id": "documents.doc_id"},
    "embeddings": {"vec_id": "embeddings.vec_id"},
}
FIXED = ["region", "nation"]


def main() -> None:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else SRC
    dst = Path(sys.argv[3] if len(sys.argv) > 3 else DST)
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    spans: dict[str, int] = {}
    for spec in KEYED.values():
        for ref in spec.values():
            t, c = ref.split(".")
            if ref not in spans:
                lo, hi = con.execute(
                    f"SELECT min({c}), max({c}) FROM '{src}/{t}.parquet'"
                ).fetchone()
                spans[ref] = hi - lo + 1

    # rotation modulus = the REAL embedding dimension (hardcoding 64
    # reproduced the unrotated-copy bug for any other dim). For R beyond
    # the dimension the rotation alone would wrap copy `dim` back to an
    # unrotated duplicate of copy 0, so copy i composes rotation
    # (i mod dim) with a per-GROUP sign flip (group g = i // dim): a
    # deterministic diagonal ±1 matrix, which is orthogonal, so
    # within-copy cosine geometry is still exactly preserved while
    # cross-group pairs that share a rotation decorrelate (their dot
    # product sums ~dim/2 sign-flipped terms). Group 0 uses the identity
    # pattern, keeping every output for r <= dim bit-identical to the
    # rotation-only scheme that sf1.0/sf3.0 evidence was generated with.
    emb_dim = con.execute(
        f"SELECT len(embedding) FROM '{src}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]

    def flip_signs(g: int) -> list[int]:
        if g == 0:
            return [1] * emb_dim
        # deterministic per-(group, coordinate) hash; coordinate g%dim is
        # flipped unconditionally so no group's pattern can collapse to
        # the identity
        import hashlib

        signs = []
        for j in range(emb_dim):
            h = hashlib.sha256(f"flip{g}_{j}".encode()).digest()[0]
            signs.append(-1 if (h & 1) or j == g % emb_dim else 1)
        return signs

    groups = (r + emb_dim - 1) // emb_dim
    patterns = [tuple(flip_signs(g)) for g in range(groups)]
    if len(set(patterns)) != len(patterns):
        raise SystemExit(
            f"sign-flip patterns collide across groups at R={r}: two "
            "copy groups would be bit-identical transforms"
        )

    # re-scaling an already-scaled output would salt 'foo' to 'c1foo'
    # in a corpus that may already CONTAIN the type 'c1foo' — merging two
    # types and breaking the within-copy renaming bijection the
    # similarity-linearity argument rests on. Refuse loudly.
    n_prefixed = con.execute(
        f"""
        SELECT count(DISTINCT t) FROM (
          SELECT unnest(string_split_regex(lower(text), '\\s+')) AS t
          FROM '{src}/documents.parquet')
        WHERE regexp_matches(t, '^c[1-9][0-9]*\\S')
        """
    ).fetchone()[0]
    if n_prefixed:
        raise SystemExit(
            f"{n_prefixed} source token types already carry the c<i> salt "
            "prefix — re-scaling a scaled output is unsupported (prefix "
            "collisions would merge token types); scale from the original "
            "source instead"
        )


    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied")

    # documents: one-time token statistics for the Heaps-consistent
    # salting (see module docstring). Positions come from
    # generate_subscripts so each doc reassembles in original order.
    con.execute(
        f"""
        CREATE OR REPLACE TEMP TABLE doc_toks AS
        SELECT doc_id, generate_subscripts(l, 1) AS i, unnest(l) AS tok
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS l
              FROM '{src}/documents.parquet')
        """
    )
    con.execute(
        """
        CREATE OR REPLACE TEMP TABLE tok_stats AS
        SELECT term,
               -- EXCLUSIVE prefix share: the head predicate
               -- (cum_before < frac) then INCLUDES the boundary type,
               -- guaranteeing head coverage >= frac. An inclusive
               -- cum <= frac would cover at most frac — and select an
               -- EMPTY head if the single most frequent type alone
               -- exceeds frac (cross-copy docs would then share all
               -- their token mass: the R-clique the salting exists to
               -- prevent).
               (sum(occ) OVER (ORDER BY occ DESC, term
                               ROWS UNBOUNDED PRECEDING) - occ) * 1.0
                 / (SELECT sum(occ) FROM (
                      SELECT count(*) AS occ FROM doc_toks
                      WHERE tok <> '' GROUP BY lower(tok))) AS cum_before
        FROM (SELECT lower(tok) AS term, count(*) AS occ
              FROM doc_toks WHERE tok <> '' GROUP BY 1)
        """
    )

    for t, keys in KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        selects = []
        for i in range(r):
            if t == "documents" and i > 0:
                # copy i's salted type set: the whole common head + a
                # √(i+1)−√i hash-slice of the rare types (per-copy seed,
                # so slices are independent across copies)
                f_i = math.sqrt(i + 1) - math.sqrt(i)
                con.execute(
                    f"""
                    CREATE OR REPLACE TEMP TABLE new_text_{i} AS
                    SELECT d.doc_id,
                           string_agg(
                             CASE WHEN s.term IS NOT NULL
                                  THEN 'c{i}' || d.tok ELSE d.tok END,
                             ' ' ORDER BY d.i) AS text
                    FROM doc_toks d
                    LEFT JOIN (
                      SELECT term FROM tok_stats
                      WHERE cum_before < {COMMON_OCC_FRAC}
                         OR (hash(term || 'salt{i}') % 1000000)
                              < {int(f_i * 1_000_000)}
                    ) s ON lower(d.tok) = s.term
                    GROUP BY d.doc_id
                    """
                )
            exprs = []
            for c in cols:
                if c in keys:
                    exprs.append(f"b.{c} + {i} * {spans[keys[c]]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    # null-text docs never reach doc_toks; pass through
                    exprs.append("coalesce(n.text, b.text) AS text")
                elif t == "embeddings" and c == "embedding" and i > 0:
                    # rotate by the copy index modulo the measured
                    # dimension (an earlier hardcoded i % 8 left copy 8
                    # unrotated — bit-identical to copy 0, 2000 spurious
                    # cross-copy cos=1.0 pairs at R=10), composed with
                    # the copy group's sign-flip pattern (identity for
                    # group 0 — see flip_signs above)
                    k = i % emb_dim
                    rotated = (
                        f"list_concat(b.embedding[{k + 1}:], "
                        f"b.embedding[1:{k}])"
                    )
                    signs = patterns[i // emb_dim]
                    if all(s == 1 for s in signs):
                        exprs.append(f"{rotated} AS embedding")
                    else:
                        sign_lit = "[" + ", ".join(
                            f"{s}::FLOAT" for s in signs
                        ) + "]"
                        exprs.append(
                            f"list_transform(list_zip({rotated}, "
                            f"{sign_lit}), x -> (x[1] * x[2])"
                            f"::FLOAT) AS embedding"
                        )
                else:
                    exprs.append(f"b.{c}")
            join = (
                f" LEFT JOIN new_text_{i} n USING (doc_id)"
                if t == "documents" and i > 0
                else ""
            )
            selects.append(
                f"SELECT {', '.join(exprs)} FROM '{src}/{t}.parquet' b{join}"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{dst}/{t}.parquet' "
            "(FORMAT parquet)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
        if t == "documents":
            v_src, v_dst = (
                con.execute(
                    f"""
                    SELECT (SELECT count(DISTINCT lower(tok)) FROM doc_toks
                            WHERE tok <> ''),
                           (SELECT count(*) FROM (
                              SELECT DISTINCT unnest(
                                list_filter(string_split_regex(lower(text),
                                                               '\\s+'),
                                            x -> x <> ''))
                              FROM '{dst}/documents.parquet'))
                    """
                ).fetchone()
            )
            print(
                f"documents vocab: {v_src} -> {v_dst} "
                f"({v_dst / v_src:.2f}x at R={r}; Heaps target ~{r**0.5:.2f}x)"
            )


if __name__ == "__main__":
    main()
