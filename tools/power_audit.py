"""Predicate-power audit: does the corpus actually exercise every
tpch_pack arm's DISCRIMINATING path at the gate SF?

The hash gate proves Spark == DuckDB on whatever the data contains —
it can't prove behavior on shapes the data lacks.  degeneracy_audit.py
catches constant OUTPUT columns; this tool catches vacuous INPUT
paths: a filter that never rejects, an EXISTS that never excludes, a
CASE branch that never fires, a tie path with no ties.  Each probe
returns (a, b); a path has power when a > 0 and (b is None or b > 0).

Known-vacuous paths are whitelisted with the crafted-input test that
restores their power (tests/test_crafted_power.py) — the r10 probes
found q13's zero bucket and q15's max-revenue tie vacuous on the real
corpus, plus q2's min-cost tie found earlier the same way.  A NEW
vacuous path (e.g. after the driver regenerates testdata) exits
nonzero: either the new corpus shape is fine and the path belongs in
the whitelist WITH a crafted test, or an arm's calibration broke.

Usage: python tools/power_audit.py [sf_dir]   (default sf0.01)
"""
import sys

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

# path -> crafted test restoring its power
WHITELIST = {
    "q13 zero bucket (customers with no qualifying orders)":
        "test_q13_zero_bucket_preserved",
    "q15 max-revenue tie (suppliers at max)":
        "test_q15_revenue_ties_emit_all_suppliers (count probe: ties==1 "
        "means only the no-tie case is gated; >1 is MORE power, fine)",
    "q2 per-part min-cost tie":
        "test_q2_min_cost_ties_emit_all_winners",
    "full_outer unmatched sides (cust-only, supp-only nations)":
        "test_full_outer_extends_both_sides (supp-only never occurs at "
        "any SF; cust-only occurs at sf0.001 but not the gate)",
    "funnel lang_en stage cuts": "test_curation_funnel_every_stage_cuts "
        "(the corpus is all-English past the quality gate)",
    "funnel exact_dedup stage cuts": "test_curation_funnel_every_stage_cuts "
        "(the corpus has zero exact-duplicate texts)",
    "odm leaf-level remove constructors fire":
        "test_remove_at_leaf_levels (the synthetic tx mixers never put "
        "an explicit remove at ig/item level; the reference's "
        "remove-item-group/remove-item shapes are pinned there)",
    "documents contain non-ASCII text":
        "test_unicode_text_oracle_parity (the corpus is pure ASCII; "
        "multi-byte md5/length/tokenization parity is gate-compared "
        "there over accented Latin, CJK, and astral-plane emoji)",
}

# probes over MATERIALIZED oracle outputs (oracle_sql()[key] run as-is),
# for paths easier to read off the result than to re-derive: each entry
# is (oracle key, probe SQL over table `t`) returning (a, b) with the
# same power rule.
ORACLE_PROBES = {
    "asof backward NULL vs present": (
        "asof_join",
        "SELECT sum(CASE WHEN last_event_epoch IS NULL THEN 1 ELSE 0 END),"
        "       sum(CASE WHEN last_event_epoch IS NULL THEN 0 ELSE 1 END) FROM t"),
    "asof forward NULL vs present": (
        "asof_join",
        "SELECT sum(CASE WHEN next_event_epoch IS NULL THEN 1 ELSE 0 END),"
        "       sum(CASE WHEN next_event_epoch IS NULL THEN 0 ELSE 1 END) FROM t"),
    "asof nearest direction (forward wins, backward wins)": (
        "asof_join",
        """SELECT sum(CASE WHEN nearest_event_epoch = next_event_epoch
                AND (last_event_epoch IS NULL
                     OR nearest_event_epoch <> last_event_epoch) THEN 1 ELSE 0 END),
              sum(CASE WHEN nearest_event_epoch = last_event_epoch
                AND (next_event_epoch IS NULL
                     OR nearest_event_epoch <> next_event_epoch) THEN 1 ELSE 0 END)
        FROM t"""),
    "asof tolerance (excludes an existing backward, keeps one)": (
        "asof_join",
        """SELECT sum(CASE WHEN last_event_epoch IS NOT NULL
                        AND last_event_epoch_within_tol IS NULL THEN 1 ELSE 0 END),
              sum(CASE WHEN last_event_epoch_within_tol IS NOT NULL THEN 1 ELSE 0 END)
        FROM t"""),
    "scd2 versions (closed, open)": (
        "scd2_history",
        "SELECT sum(CASE WHEN valid_to IS NOT NULL THEN 1 ELSE 0 END),"
        "       sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) FROM t"),
    "session windows (singleton, multi-event)": (
        "session_window_agg",
        "SELECT sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END),"
        "       sum(CASE WHEN n_events > 1 THEN 1 ELSE 0 END) FROM t"),
    "funnel quality_gate stage cuts": (
        "curation_funnel",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=0)
                - (SELECT n_docs FROM t WHERE stage_idx=1), NULL"""),
    "funnel lang_en stage cuts": (
        "curation_funnel",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=1)
                - (SELECT n_docs FROM t WHERE stage_idx=2), NULL"""),
    "funnel exact_dedup stage cuts": (
        "curation_funnel",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=2)
                - (SELECT n_docs FROM t WHERE stage_idx=3), NULL"""),
    "funnel near_dup stage cuts": (
        "curation_funnel",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=3)
                - (SELECT n_docs FROM t WHERE stage_idx=4), NULL"""),
    "funnel semantic stage cuts": (
        "curation_funnel",
        """SELECT (SELECT n_docs FROM t WHERE stage_idx=4)
                - (SELECT n_docs FROM t WHERE stage_idx=5), NULL"""),
    "odm constructor mix (distinct names beyond 13)": (
        "odm_commands",
        "SELECT count(DISTINCT name) - 13, NULL FROM t"),
    "odm leaf-level remove constructors fire": (
        "odm_commands",
        """SELECT count(*), NULL FROM t
           WHERE name IN ('odm-import/remove-item-group',
                          'odm-import/remove-item')"""),
    "requeue dead routes (fatal-immediate, budget-exhausted)": (
        "requeue_routing",
        """SELECT sum(CASE WHEN route='dead' AND final_attempts=0 THEN 1 ELSE 0 END),
              sum(CASE WHEN route='dead' AND final_attempts>0 THEN 1 ELSE 0 END)
        FROM t"""),
    "requeue ok routes (first-try, recovered-after-retry)": (
        "requeue_routing",
        """SELECT sum(CASE WHEN route='ok' AND final_attempts=0 THEN 1 ELSE 0 END),
              sum(CASE WHEN route='ok' AND final_attempts>0 THEN 1 ELSE 0 END)
        FROM t"""),
    "sliding windows overlap (events double-counted beyond 1x)": (
        "time_aggs_pack",
        """SELECT (SELECT sum(v1) FROM t WHERE kind='sliding')
                - (SELECT count(*) FROM events), NULL"""),
    "cohort retention beyond day 0": (
        "time_aggs_pack",
        "SELECT count(*), NULL FROM t WHERE kind='cohort' AND k2 > 0"),
}

# corpus probes that need raw tables but mirror a query's internal
# derivation (kept separate from PROBES for documentation: these
# re-derive a query intermediate rather than reading its output)
DERIVED_PROBES = {
    "correlate first-event ties at min t": """
      WITH mins AS (SELECT l_orderkey, min(l_linenumber) AS mn
                    FROM lineitem GROUP BY l_orderkey)
      SELECT count(*), NULL FROM (
        SELECT li.l_orderkey FROM lineitem li JOIN mins
          ON li.l_orderkey = mins.l_orderkey AND li.l_linenumber = mins.mn
        GROUP BY li.l_orderkey HAVING count(*) > 1)""",
    "documents contain non-ASCII text": r"""
      SELECT count(*), NULL FROM documents WHERE text ~ '[^\x00-\x7F]'""",
}

PROBES = {
    "q4 EXISTS split (orders passing, failing)": """
      SELECT sum(CASE WHEN e THEN 1 ELSE 0 END),
             sum(CASE WHEN e THEN 0 ELSE 1 END) FROM (
        SELECT EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey=o_orderkey AND l_shipdate>o_orderdate) AS e
        FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                      AND o_orderdate < TIMESTAMP '1997-01-01')""",
    "q12 CASE branches (high, low)": """
      SELECT sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END),
             sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
      FROM lineitem JOIN orders ON l_orderkey=o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY""",
    "q17 threshold (lines passing, failing)": """
      SELECT sum(CASE WHEN ok THEN 1 ELSE 0 END),
             sum(CASE WHEN ok THEN 0 ELSE 1 END) FROM (
        SELECT CAST(l_quantity AS DECIMAL(18,2))
                 * (SELECT count(*) FROM lineitem l2 WHERE l2.l_partkey=l.l_partkey) * 5
               < (SELECT sum(CAST(l_quantity AS DECIMAL(18,2))) FROM lineitem l2
                  WHERE l2.l_partkey=l.l_partkey) AS ok
        FROM lineitem l JOIN part ON p_partkey=l_partkey WHERE p_brand='Brand#12')""",
    "q18 limit power (pre-limit rows, vs 100)": """
      SELECT count(*), count(*) - 100 FROM (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)""",
    "q21 exclusions (kept, cut by NOT EXISTS)": """
      WITH l1 AS (SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem
                  WHERE l_returnflag='R')
      SELECT sum(CASE WHEN hasother AND NOT otherR THEN 1 ELSE 0 END),
             sum(CASE WHEN hasother AND otherR THEN 1 ELSE 0 END)
      FROM (SELECT
          EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey=l1.l_orderkey
                    AND l2.l_suppkey<>l1.l_suppkey) AS hasother,
          EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey=l1.l_orderkey
                    AND l3.l_suppkey<>l1.l_suppkey AND l3.l_returnflag='R') AS otherR
        FROM l1)""",
    "q21 single-supplier orders (cut by EXISTS)": """
      WITH l1 AS (SELECT DISTINCT l_suppkey, l_orderkey FROM lineitem
                  WHERE l_returnflag='R')
      SELECT sum(CASE WHEN NOT EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey=l1.l_orderkey
                      AND l2.l_suppkey<>l1.l_suppkey) THEN 1 ELSE 0 END), NULL
      FROM l1""",
    "q20 HAVING (groups passing, failing)": """
      WITH g AS (
        SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
          (SELECT sum(CAST(l2.l_quantity AS DECIMAL(18,2))) FROM lineitem l2
           WHERE l2.l_partkey=lineitem.l_partkey
             AND l2.l_shipdate >= TIMESTAMP '1996-01-01'
             AND l2.l_shipdate < TIMESTAMP '1997-01-01') AS tot
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%ring%')
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey, l_partkey)
      SELECT sum(CASE WHEN sq*10 > tot*3 THEN 1 ELSE 0 END),
             sum(CASE WHEN sq*10 > tot*3 THEN 0 ELSE 1 END) FROM g""",
    "q22 dormancy (kept, cut by NOT EXISTS)": """
      WITH sel AS (SELECT * FROM customer WHERE c_nationkey IN (1,3,5,7,9,11,13)),
      a AS (SELECT count(*) AS cnt, sum(CAST(c_acctbal AS DECIMAL(18,2))) AS tot
            FROM sel WHERE c_acctbal > 0)
      SELECT sum(CASE WHEN dormant THEN 1 ELSE 0 END),
             sum(CASE WHEN dormant THEN 0 ELSE 1 END) FROM (
        SELECT NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey=sel.c_custkey
                             AND o.o_orderdate >= TIMESTAMP '1999-01-01') AS dormant
        FROM sel, a WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > tot)""",
    "q13 zero bucket (customers with no qualifying orders)": """
      SELECT (SELECT count(*) FROM (
          SELECT c_custkey, count(o_custkey) AS c_count FROM customer
          LEFT OUTER JOIN orders ON c_custkey=o_custkey
            AND o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c_custkey) WHERE c_count=0),
        (SELECT count(*) FROM orders WHERE o_orderpriority = '4-NOT SPECIFIED')""",
    "q15 max-revenue tie (suppliers at max)": """
      WITH revenue AS (SELECT l_suppkey,
          sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
        FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01'
                        AND l_shipdate < TIMESTAMP '1998-04-01'
        GROUP BY l_suppkey)
      SELECT (SELECT count(*) FROM revenue
              WHERE total_rev = (SELECT max(total_rev) FROM revenue)) - 1, NULL""",
    "q2 per-part min-cost tie": """
      WITH eu AS (SELECT s_suppkey FROM supplier
                  JOIN nation ON s_nationkey=n_nationkey
                  JOIN region ON n_regionkey=r_regionkey WHERE r_name='EUROPE'),
      cat AS (SELECT l_partkey, l_suppkey,
                     min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
              FROM lineitem JOIN eu ON l_suppkey=s_suppkey
              GROUP BY l_partkey, l_suppkey),
      mins AS (SELECT l_partkey, min(cost) AS mc FROM cat GROUP BY l_partkey)
      SELECT (SELECT count(*) FROM (
          SELECT cat.l_partkey FROM cat JOIN mins
            ON cat.l_partkey=mins.l_partkey AND cat.cost=mins.mc
          GROUP BY cat.l_partkey HAVING count(*) > 1)), NULL""",
    "q7 pair directions (1->2, 2->1)": """
      SELECT sum(CASE WHEN n1.n_name='NATION_1' THEN 1 ELSE 0 END),
             sum(CASE WHEN n1.n_name='NATION_2' THEN 1 ELSE 0 END)
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey=l_suppkey AND o_orderkey=l_orderkey AND c_custkey=o_custkey
        AND s_nationkey=n1.n_nationkey AND c_nationkey=n2.n_nationkey
        AND ((n1.n_name='NATION_1' AND n2.n_name='NATION_2')
          OR (n1.n_name='NATION_2' AND n2.n_name='NATION_1'))
        AND l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'""",
    "q8 share branches (nation3 rows, other rows)": """
      SELECT sum(CASE WHEN n2.n_name='NATION_3' THEN 1 ELSE 0 END),
             sum(CASE WHEN n2.n_name='NATION_3' THEN 0 ELSE 1 END)
      FROM part, lineitem, supplier, orders, customer, nation n1, nation n2, region
      WHERE p_partkey=l_partkey AND s_suppkey=l_suppkey AND l_orderkey=o_orderkey
        AND o_custkey=c_custkey AND c_nationkey=n1.n_nationkey
        AND n1.n_regionkey=r_regionkey AND r_name='AMERICA'
        AND s_nationkey=n2.n_nationkey AND p_type='STANDARD'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'""",
    "q14 CASE branches (promo, non-promo)": """
      SELECT sum(CASE WHEN p_type='PROMO' THEN 1 ELSE 0 END),
             sum(CASE WHEN p_type='PROMO' THEN 0 ELSE 1 END)
      FROM lineitem JOIN part ON l_partkey=p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-07-01'""",
    "q19 OR branches 1+2": """
      SELECT sum(CASE WHEN p_brand='Brand#1' AND p_size BETWEEN 1 AND 15
                       AND l_quantity BETWEEN 1 AND 20 THEN 1 ELSE 0 END),
             sum(CASE WHEN p_brand='Brand#2' AND p_size BETWEEN 16 AND 35
                       AND l_quantity BETWEEN 10 AND 35 THEN 1 ELSE 0 END)
      FROM lineitem JOIN part ON l_partkey=p_partkey""",
    "q19 OR branch 3": """
      SELECT sum(CASE WHEN p_type='ECONOMY' AND p_size BETWEEN 36 AND 50
                       AND l_quantity BETWEEN 20 AND 50 THEN 1 ELSE 0 END), NULL
      FROM lineitem JOIN part ON l_partkey=p_partkey""",
    "q11 HAVING (groups passing, failing)": """
      WITH v AS MATERIALIZED (SELECT l_partkey,
          sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS value
        FROM lineitem JOIN supplier ON l_suppkey=s_suppkey
        WHERE s_nationkey IN (4,7,11) GROUP BY l_partkey)
      SELECT sum(CASE WHEN CAST(value AS DECIMAL(33,4))*1500 > total THEN 1 ELSE 0 END),
             sum(CASE WHEN CAST(value AS DECIMAL(33,4))*1500 > total THEN 0 ELSE 1 END)
      FROM v, (SELECT sum(value) AS total FROM v) t""",
    "q9 profit sign mix (negative, positive)": """
      SELECT sum(CASE WHEN amt < 0 THEN 1 ELSE 0 END),
             sum(CASE WHEN amt >= 0 THEN 1 ELSE 0 END) FROM (
        SELECT CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))
               - CAST(p_retailprice AS DECIMAL(8,2)) * 0.6
                 * CAST(l_quantity AS DECIMAL(4,1)) AS amt
        FROM lineitem JOIN part ON l_partkey=p_partkey
        WHERE p_name LIKE '%gear%')""",
    "q16 complaint exclusion (cut, kept)": """
      SELECT (SELECT count(*) FROM supplier WHERE s_suppkey % 13 = 0),
             (SELECT count(*) FROM supplier WHERE s_suppkey % 13 <> 0)""",
    "q6 filter (passing, rejected)": """
      SELECT sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate < TIMESTAMP '1997-01-01'
                       AND l_discount >= 0.05 AND l_discount <= 0.07
                       AND l_quantity < 24 THEN 1 ELSE 0 END),
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                       AND l_shipdate < TIMESTAMP '1997-01-01'
                       AND l_discount >= 0.05 AND l_discount <= 0.07
                       AND l_quantity < 24 THEN 0 ELSE 1 END)
      FROM lineitem""",
    "except_all bag paths (partial cancel, full cancel)": """
      WITH a AS (SELECT o_custkey, count(*) AS ca FROM orders
                 WHERE o_orderstatus <> 'F' GROUP BY 1),
           b AS (SELECT o_custkey, count(*) AS cb FROM orders
                 WHERE o_orderstatus = 'O' GROUP BY 1)
      SELECT sum(CASE WHEN ca - coalesce(cb,0) > 0 AND coalesce(cb,0) > 0
                       AND ca > 1 THEN 1 ELSE 0 END),
             sum(CASE WHEN ca - coalesce(cb,0) <= 0 AND coalesce(cb,0) > 0
                 THEN 1 ELSE 0 END)
      FROM a LEFT JOIN b USING (o_custkey)""",
    "full_outer unmatched sides (cust-only, supp-only nations)": """
      WITH c AS (SELECT DISTINCT c_nationkey AS k FROM customer),
           s AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
      SELECT (SELECT count(*) FROM c WHERE k NOT IN (SELECT k FROM s)),
             (SELECT count(*) FROM s WHERE k NOT IN (SELECT k FROM c))""",
    "range frame peers (same-day same-customer groups)": """
      SELECT (SELECT count(*) FROM (SELECT o_custkey, o_orderdate FROM orders
              GROUP BY 1,2 HAVING count(*)>1)), NULL""",
    "range frame width (multi-row frames, singleton frames)": """
      WITH t AS (SELECT o_custkey, CAST(epoch(o_orderdate) AS BIGINT) AS e
                 FROM orders)
      SELECT sum(CASE WHEN n>1 THEN 1 ELSE 0 END),
             sum(CASE WHEN n=1 THEN 1 ELSE 0 END) FROM (
        SELECT count(*) OVER (PARTITION BY o_custkey ORDER BY e
          RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS n FROM t)""",
    "semi join (customers kept, excluded)": """
      SELECT sum(CASE WHEN e THEN 1 ELSE 0 END),
             sum(CASE WHEN e THEN 0 ELSE 1 END) FROM (
        SELECT EXISTS (SELECT 1 FROM orders WHERE o_custkey=c_custkey
                         AND o_orderstatus='O') AS e FROM customer)""",
    "anti join (orders without lineitems, with)": """
      SELECT sum(CASE WHEN e THEN 0 ELSE 1 END),
             sum(CASE WHEN e THEN 1 ELSE 0 END) FROM (
        SELECT EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey=o_orderkey) AS e FROM orders)""",
    "range frame trims older-than-30d rows": """
      WITH t AS (SELECT
          row_number() OVER (PARTITION BY o_custkey
            ORDER BY CAST(epoch(o_orderdate) AS BIGINT)) AS rn,
          count(*) OVER (PARTITION BY o_custkey
            ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
            RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW) AS nf
        FROM orders)
      SELECT (SELECT count(*) FROM t WHERE rn > nf), NULL""",
}


def main():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    new_vacuous = []

    def judge(name, a, b):
        has_power = (a or 0) > 0 and (b is None or (b or 0) > 0)
        if has_power:
            print(f"{name}: ok {a, b}")
        elif name in WHITELIST:
            print(f"{name}: VACUOUS {a, b} [whitelisted -> {WHITELIST[name]}]")
        else:
            print(f"{name}: VACUOUS {a, b}  <<< NEW")
            new_vacuous.append(name)

    for name, sql in PROBES.items():
        a, b = con.execute(sql).fetchone()
        judge(name, a, b)
    for name, sql in DERIVED_PROBES.items():
        a, b = con.execute(sql).fetchone()
        judge(name, a, b)
    materialized = set()
    for name, (key, sql) in ORACLE_PROBES.items():
        if key not in materialized:
            con.execute(f"CREATE TABLE oracle_{key} AS ({oracles[key]})")
            materialized.add(key)
        a, b = con.execute(sql.replace("FROM t", f"FROM oracle_{key}")).fetchone()
        judge(name, a, b)
    print(f"\n=== new vacuous paths: {len(new_vacuous)}; "
          f"whitelisted: {len(WHITELIST)}")
    sys.exit(1 if new_vacuous else 0)


if __name__ == "__main__":
    main()
