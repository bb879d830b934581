#!/usr/bin/env python3
"""Replay the props-scrub truth table through the DuckDB oracle CASE.

PropsScrubSpec pins graft.queries.Pipeline.propsClass (the Spark side)
against the SAME table — together they pin cross-engine classification
agreement on hostile payload classes the driver fixture (and therefore
the Verify/selfcheck gate) can never contain, because the lean JSON
queries hard-fail on them by contract. Keep this table bit-identical to
PropsScrubSpec.truth. Exits 1 on any mismatch.
"""
import sys

import duckdb

# THE truth table — keep bit-identical to PropsScrubSpec.scala
TRUTH = [
    ('{"k":3}', "ok"),
    ('{"k":-2}', "ok"),
    ('{"k":null}', "ok"),
    ('{"j":4}', "ok"),
    ("{}", "ok"),
    ('{"k":3,"j":4}', "ok"),
    ('{"é":1}', "ok"),
    ('{"a.b":1}', "ok"),
    ('{"k":9223372036854775807}', "ok"),
    ('{"k":-9223372036854775808}', "ok"),
    ('{"k":1,"k":2}', "dupkey"),
    ('{"k":1,"j":2,"k":3}', "dupkey"),
    ('{"k":1,"k":"x"}', "dupkey"),
    ('{"k":"3"}', "untyped"),
    ('{"k":3.7}', "untyped"),
    ('{"k":true}', "untyped"),
    ('{"k":[1,2]}', "untyped"),
    ('{"k":{"x":1}}', "untyped"),
    ('{"k":99999999999999999999}', "untyped"),
    ("{k:3}", "notobject"),
    ("not json", "notobject"),
    ("", "notobject"),
    ("123", "notobject"),
    ("[1]", "notobject"),
    ('"str"', "notobject"),
    ("null", "notobject"),
    (None, "null"),
]

# the classification stages of the events_scrub_props oracle, verbatim
SQL = """
WITH c AS MATERIALIZED (
  SELECT i, props,
    CASE WHEN props IS NULL THEN 'null'
         WHEN NOT json_valid(props) THEN 'notobject'
         WHEN json_type(props) <> 'OBJECT' THEN 'notobject'
         ELSE 'object' END AS c0
  FROM cases),
obj AS MATERIALIZED (
  SELECT i, props FROM c WHERE c0 = 'object'),
objcls AS (
  SELECT i,
    CASE WHEN len(json_keys(props)) <>
           len(list_distinct(json_keys(props))) THEN 'dupkey'
         WHEN len(list_filter(json_keys(props),
        k -> NOT (json_type(props, '$."' || k || '"') = 'BIGINT'
          OR (json_type(props, '$."' || k || '"') = 'UBIGINT'
            AND TRY_CAST(json_extract_string(props, '$."' || k || '"')
              AS BIGINT) IS NOT NULL)))) > 0 THEN 'untyped'
      ELSE 'ok' END AS props_class
  FROM obj)
SELECT i, c0 AS props_class FROM c WHERE c0 <> 'object'
UNION ALL
SELECT i, props_class FROM objcls
ORDER BY i
"""

con = duckdb.connect()
con.execute("CREATE TABLE cases (i BIGINT, props VARCHAR)")
con.executemany("INSERT INTO cases VALUES (?, ?)",
                [(i, p) for i, (p, _) in enumerate(TRUTH)])
got = dict(con.execute(SQL).fetchall())

fails = 0
for i, (props, expected) in enumerate(TRUTH):
    actual = got.get(i)
    status = "PASS" if actual == expected else "FAIL"
    if actual != expected:
        fails += 1
    print(f"{status} {repr(props)[:36]:38s} -> {actual} (want {expected})")
print(f"== {len(TRUTH) - fails} pass, {fails} fail ==")
sys.exit(1 if fails else 0)
