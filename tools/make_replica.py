#!/usr/bin/env python3
"""Deterministic stride-offset scale replica (VERDICT r12 #8).

Builds an N-times replica of a driver-generated testdata dir for
stress sweeps (e.g. sf0.1 x10 ~= sf1) so scale evidence is
reproducible from a clean checkout. Driver-side tooling only (duckdb,
like tools/check_oracle.py) -- NOT part of the engine.

Construction (round-12 sweep design, now committed):
  - fixed dims (region, nation) stay single-copy;
  - every other table is unioned F times with each replica's keys
    offset by i * (max_key + 1) per key family, so uniqueness and
    referential integrity (orders->customer, lineitem->orders/part/
    supplier, events.user_id) hold exactly;
  - content columns (names, document text, embeddings) replicate
    VERBATIM -- deliberately planting F-deep exact-duplicate families,
    the duplicate-key/skew class the sweep hunts;
  - no randomness anywhere: same inputs -> byte-identical replica.

Optional adversarial hot-key skew (VERDICT r12 #7): --hot-pct P
additionally rewrites the text of every (100/P)-th document (by final
doc_id) to ONE fixed string, so a single content hash covers ~P% of
the corpus -- the worst case for content-hash bucketing
(incrementalDedup, q_span_dedup, q_dedup_exact).

Optional language planting (VERDICT r16 #3): --plant-langs rewrites
each document's text as a PURE FUNCTION OF (text, lang) so the
synthetic corpus carries real language signal for the lang-ID /
confusion / mix / DSIR shelves (the driver corpus draws every lang's
text from one shared vocabulary, so those rows otherwise exercise
plumbing only):
  - lang in {es,de,fr}: the language's 6 marker stopwords (the same
    lists TextOps votes on) are prepended 3x, so the labeled language
    wins the vote; rows whose md5(text) starts with '0' (~1/16)
    instead get the NEXT language's markers (es->de->fr->es) -- a
    KNOWN planted off-diagonal mass the confusion audit must recover;
  - lang = zh: one CJK char is prepended (the non-ASCII route);
  - lang = en: unchanged.
Because the rewrite never reads doc_id or the replica index, F-deep
exact-dup families stay exact (copies share text AND lang), so the
dedup-depth stress properties are preserved. Incompatible with
--hot-pct (the hot text would fan out across langs).

Optional toxicity planting (VERDICT r17 #5): --plant-toxicity rewrites
document text as a pure function of text so the synthetic corpus
carries KNOWN safety-screen positives (the driver corpus draws from a
clean shared vocabulary, so q_safety_screen otherwise exercises
plumbing only -- the --plant-langs lesson applied to safety). Keyed on
the first hex digit of md5(text):
  '0' -> 2x toxicity lexicon terms prepended     (~1/16 of docs)
  '1' -> 2x violence terms                       (~1/16)
  '2' -> 2x adult terms                          (~1/16)
  '3' -> 1x toxicity + 1x violence terms         (~1/16; the 2-category
         escalation route to BLOCKED)
  '4' -> 2x OBFUSCATED toxicity terms (accents, case, tab separator,
         wrapping punctuation, leet digits)      (~1/16; r19 — the
         variants the r18 screen missed)
  '5' -> 1x obfuscated violence + 1x obfuscated adult terms (~1/16;
         the escalation route through obfuscation alone)
Lexicons mirror TextOps' house lists; obfuscations mirror the r19
screen hardening (NormalizeText + leet fold + edge-punct strip). Pure
function of text -> F-deep exact-dup families stay exact. Mutually
exclusive with --hot-pct / --plant-langs.

Usage:
  python3 tools/make_replica.py SRC_DIR DEST_DIR FACTOR [--hot-pct P | --plant-langs | --plant-toxicity]
  python3 tools/make_replica.py /root/testdata/sf0.1 /tmp/sf1 10
  python3 tools/make_replica.py /root/testdata/sf0.1 /tmp/sf1hot 10 --hot-pct 1
  python3 tools/make_replica.py /root/testdata/sf0.01 /tmp/sf001pl 1 --plant-langs
  python3 tools/make_replica.py /root/testdata/sf0.01 /tmp/sf001tox 1 --plant-toxicity
"""
import os
import sys

import duckdb

FIXED = ["region", "nation"]
# per-table select template; {oc}/{os}/{op}/{oo}/{oe}/{ou}/{od}/{ov}
# are the per-replica key offsets (customer/supplier/part/order/
# event/user/doc/vec families)
TEMPLATES = {
    "customer": "SELECT c_custkey + {oc} AS c_custkey, c_name, c_nationkey,"
                " c_acctbal, c_mktsegment FROM src",
    "supplier": "SELECT s_suppkey + {os} AS s_suppkey, s_name, s_nationkey,"
                " s_acctbal FROM src",
    "part": "SELECT p_partkey + {op} AS p_partkey, p_name, p_brand, p_type,"
            " p_size, p_retailprice FROM src",
    "orders": "SELECT o_orderkey + {oo} AS o_orderkey, o_custkey + {oc} AS o_custkey,"
              " o_orderstatus, o_totalprice, o_orderdate, o_orderpriority FROM src",
    "lineitem": "SELECT l_orderkey + {oo} AS l_orderkey, l_partkey + {op} AS l_partkey,"
                " l_suppkey + {os} AS l_suppkey, l_linenumber, l_quantity,"
                " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
                " l_shipdate FROM src",
    "events": "SELECT event_id + {oe} AS event_id, ts, user_id + {ou} AS user_id,"
              " event_type, value, props FROM src",
    "documents": "SELECT doc_id + {od} AS doc_id, text, lang, source, n_chars FROM src",
    "embeddings": "SELECT vec_id + {ov} AS vec_id, embedding, label FROM src",
}
# key family -> (table, column) that defines its stride
STRIDES = {
    "oc": ("customer", "c_custkey"),
    "os": ("supplier", "s_suppkey"),
    "op": ("part", "p_partkey"),
    "oo": ("orders", "o_orderkey"),
    "oe": ("events", "event_id"),
    "ou": ("events", "user_id"),
    "od": ("documents", "doc_id"),
    "ov": ("embeddings", "vec_id"),
}


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src")
    ap.add_argument("dest")
    ap.add_argument("factor", type=int)
    ap.add_argument("--hot-pct", type=float, default=None,
                    help="rewrite every (100/P)-th document to one fixed text")
    ap.add_argument("--plant-langs", action="store_true",
                    help="plant per-language marker stopwords into document"
                         " text (pure function of (text, lang) — dup-preserving)")
    ap.add_argument("--plant-toxicity", action="store_true",
                    help="plant per-category safety-lexicon terms into document"
                         " text keyed on md5(text) (pure function — dup-preserving)")
    a = ap.parse_args()
    src, dest, factor, hot_pct = a.src, a.dest, a.factor, a.hot_pct
    if sum([bool(hot_pct), a.plant_langs, a.plant_toxicity]) > 1:
        ap.error("--hot-pct / --plant-langs / --plant-toxicity are mutually exclusive")
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()

    strides = {}
    for fam, (t, c) in STRIDES.items():
        strides[fam] = con.execute(
            f"SELECT max({c}) + 1 FROM read_parquet('{src}/{t}.parquet')"
        ).fetchone()[0]
    print("strides:", strides)

    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))"
            f" TO '{dest}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: single copy")

    for t, tpl in TEMPLATES.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS"
            f" SELECT * FROM read_parquet('{src}/{t}.parquet')")
        selects = [
            tpl.format(**{f: i * strides[f] for f in strides}) for i in range(factor)
        ]
        union = " UNION ALL ".join(f"({s})" for s in selects)
        out = f"SELECT * FROM ({union})"
        if t == "documents" and hot_pct:
            # one fixed text on every k-th doc: a single content hash
            # covering ~hot_pct% of the corpus (worst case for
            # content-hash bucketing)
            k = max(1, round(100.0 / hot_pct))
            hot_text = con.execute(
                f"SELECT text FROM read_parquet('{src}/{t}.parquet')"
                f" ORDER BY doc_id LIMIT 1").fetchone()[0].replace("'", "''")
            out = (f"SELECT doc_id, CASE WHEN doc_id % {k} = 0 THEN '{hot_text}'"
                   f" ELSE text END AS text, lang, source,"
                   f" CASE WHEN doc_id % {k} = 0 THEN CAST(length('{hot_text}') AS BIGINT)"
                   f" ELSE n_chars END AS n_chars FROM ({union})")
            print(f"documents: hot key on every {k}-th doc (~{hot_pct}%)")
        if t == "documents" and a.plant_langs:
            # marker lexicons mirror TextOps' vote lists; the planted
            # lexicon is the labeled language's, EXCEPT rows whose
            # md5(text) leads with '0' (~1/16), which get the next
            # language's markers — the known off-diagonal plant
            lex = {"es": "el la de que y en", "de": "der die das und ist zu",
                   "fr": "le les des et une est"}
            nxt = {"es": "de", "de": "fr", "fr": "es"}
            def pfx(lang):
                own = (lex[lang] + " ") * 3
                other = (lex[nxt[lang]] + " ") * 3
                return (f"CASE WHEN substr(md5(text), 1, 1) = '0'"
                        f" THEN '{other}' ELSE '{own}' END")
            cases = " ".join(
                f"WHEN lang = '{l}' THEN {pfx(l)} || text" for l in lex)
            new_text = (f"CASE WHEN lang = 'zh' THEN '中 ' || text"
                        f" {cases} ELSE text END")
            out = (f"SELECT doc_id, {new_text} AS text, lang, source,"
                   f" CAST(length({new_text}) AS BIGINT) AS n_chars"
                   f" FROM ({union})")
            print("documents: planted language markers (1/16 off-diagonal)")
        if t == "documents" and a.plant_toxicity:
            # house lexicons mirror TextOps.{ToxLex,VioLex,AdultLex};
            # the plant is a pure function of text (md5 hex routing),
            # so exact-dup families stay exact
            tox = "damn hell crap idiot stupid moron"
            vio = "kill murder attack destroy weapon bomb"
            adu = "nude explicit porn xxx erotic nsfw"
            # r19 obfuscated variants: accent, leet (0->o 1->i 3->e
            # 4->a 5->s 7->t @->a $->s), wrapping punct, case, and one
            # tab separator -- exactly the classes the hardened screen
            # normalizes away (NormalizeText + translate + edge strip)
            tox_ob = "DÄMN h3ll (crap) idiot! 5tup1d m0r0n"
            vio_ob = "k1ll murd3r @ttack d3str0y w3ap0n b0mb"
            adu_ob = "nud3 3xplicit p0rn XXX [erotic] n$fw"
            new_text = (
                f"CASE substr(md5(text), 1, 1)"
                f" WHEN '0' THEN '{tox} {tox} ' || text"
                f" WHEN '1' THEN '{vio} {vio} ' || text"
                f" WHEN '2' THEN '{adu} {adu} ' || text"
                f" WHEN '3' THEN '{tox} {vio} ' || text"
                f" WHEN '4' THEN '{tox_ob}' || chr(9) || '{tox_ob} ' || text"
                f" WHEN '5' THEN '{vio_ob} {adu_ob} ' || text"
                f" ELSE text END")
            out = (f"SELECT doc_id, {new_text} AS text, lang, source,"
                   f" CAST(length({new_text}) AS BIGINT) AS n_chars"
                   f" FROM ({union})")
            print("documents: planted safety-lexicon positives"
                  " (~6/16 of docs incl. obfuscated routes)")
        con.execute(f"COPY ({out}) TO '{dest}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows (x{factor})")


if __name__ == "__main__":
    main()
