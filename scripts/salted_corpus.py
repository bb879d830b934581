#!/usr/bin/env python3
"""Build adversarial probe corpora for ORACLE-PARITY sweeps (dev tool).

Usage: python3 scripts/salted_corpus.py <out_dir> [nulls|degenerate|unicode|horizon] [ns|us]

Recreates the round-6 adversarial fixtures as parquet a DuckDB oracle can
read. events.ts stays TIMESTAMP(NANOS) — the pre-round-8 driver layout —
DELIBERATELY: the round-8 fixture regen moved the driver tables to
TIMESTAMP(MICROS, naive), and Tables.events dispatches on the scanned
encoding, so these probes keep the nanos-as-long ingest path (incl. the
ns->us truncation contract and its sub-us salts) covered while the
driver fixtures cover the micros path:

  nulls      - null text / embeddings / values / props / ts salted in
  degenerate - identical docs, all-zero embeddings, single-key
               same-instant events
  unicode    - documents mixing CJK / accents / emoji / RTL / combining
               marks with ascii (events/embeddings stay clean)
  horizon    - streaming-boundary events: sessions closing exactly ON
               the ms-floored watermark horizon, sub-ms floor
               discriminators, gap/tie/interval-bound edges

TPC-H tables are copied from sf0.001. Then run:
  sbt "runMain graft.Verify <out_dir> /tmp/vprobe"
  python3 scripts/selfcheck.py /tmp/vprobe <out_dir>
"""
import math
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

out = sys.argv[1]
mode = sys.argv[2] if len(sys.argv) > 2 else "nulls"
# Optional 3rd arg: events.ts physical encoding — "ns" (default; the
# pre-round-8 driver layout, exercises the nanos-as-long ingest path) or
# "us" (the round-8+ driver layout, TIMESTAMP(MICROS, naive) read as NTZ).
# The us variant truncates each salt toward zero to micros — exactly the
# ns->us coercion both engines apply — so the same adversarial classes
# probe the micros code path; sub-us discriminators become exact-us rows
# (their boundary semantics stay pinned by the ns variant).
enc = sys.argv[3] if len(sys.argv) > 3 else "ns"
assert enc in ("ns", "us"), f"encoding must be ns or us, got {enc}"
base = "/root/testdata/sf0.001"

import os
os.makedirs(out, exist_ok=True)

if mode == "nulls":
    doc_rows = []
    for i in range(60):
        if i % 6 == 0:
            text = None
        elif i % 6 == 1:
            text = ""
        elif i % 6 == 2:
            text = "   "
        else:
            text = (f"some document body number {i} with enough words to "
                    "shingle the quick brown fox jumps over the lazy dog")
        doc_rows.append((i, text, None if i % 7 == 0 else "en", "web",
                         len(text) if text else 0))
    emb_rows = [(i,
                 None if i % 8 == 0 else
                 [math.sin(i * 64 + j + 1.0) for j in range(64)],
                 i % 3) for i in range(40)]
    # ts salts: nulls (off-timeline contract), pre-1970 negatives (both
    # engines truncate nanos->micros toward zero — pinned here), and
    # sub-microsecond remainders on positive ts (non-round nanos)
    def _ts(i):
        if i % 13 == 0:
            return None
        if i % 17 == 0:
            return -157766400000000000 + i * 60000000000 - 1500  # ~1965
        return 1704067200000000000 + i * 60000000000 + \
            (123457 if i % 5 == 0 else 0)
    ev_rows = [(i, _ts(i),
                i % 5, ["click", "view"][i % 2],
                None if i % 9 == 0 else float(i % 200),
                None if i % 11 == 0 else '{"k":%d}' % (i % 5))
               for i in range(300)]
elif mode == "unicode":
    samples = [
        "the quick brown fox jumps over the lazy dog",
        "naïve café résumé coöperate señor jalapeño",
        "日本語のテキストと English words mixed together here",
        "русский текст and latin words side by side",
        "مرحبا بالعالم hello world مع الكلمات الإنجليزية",
        "emoji 🎉 in 🚀 the 🌍 middle of words",
        "combining márks and zero​width characters",
        "MiXeD CaSe WİTH turkish dotted İ and ı issues",
        "tabs\tand\nnewlines\r\nand   runs    of spaces",
        "ﬁligature ﬂour ﬀ presentation forms",
        # VT/FF: Java \s includes \x0B, RE2's does not — oracles must
        # spell out Java's class [ \t\n\x0B\f\r] to agree on this row
        "vertical\x0btab and form\x0cfeed whitespace edges",
        # Greek sigma: full-casing lower() would apply the context-
        # sensitive final-sigma rule in Spark only; ASCII case fold
        # makes every Greek char a plain delimiter in both engines
        "ΛΟΓΟΣ greek ΣΙΓΜΑ words και mixed ascii",
        # redaction terms touching unicode letters: Java \b is unicode-
        # aware (no boundary before ş/日), RE2's is ASCII — the engine
        # uses ASCII lookarounds so both redact all four; value_x must
        # stay unredacted (ASCII word char continues the word)
        "customerş and supplier日 and order🎉 and value but value_x",
    ]
    # lang is a GROUP BY / PARTITION BY / ORDER BY key in several
    # queries — salting unicode values pins that UTF-8 binary sort and
    # grouping agree cross-engine on non-ASCII keys too
    langs = ["mix", "日本語", "ελ", "émi", "🌍"]
    doc_rows = [(i, f"{samples[i % len(samples)]} doc number {i} "
                 f"{samples[(i * 3 + 1) % len(samples)]}",
                 langs[i % len(langs)], "web", 50) for i in range(60)]
    emb_rows = [(i, [math.sin(i * 64 + j + 1.0) for j in range(64)], i % 3)
                for i in range(40)]
    ev_rows = [(i, 1704067200000000000 + i * 60000000000, i % 5,
                ["click", "view"][i % 2], float(i % 200),
                '{"k":%d}' % (i % 5)) for i in range(300)]
elif mode == "horizon":
    # Streaming-boundary probe: pins the append-mode emission arithmetic
    # CROSS-ENGINE (the MemoryStream specs pin it engine-side only).
    # Clock user 0 drives max(ts); every clock event carries a +700 us
    # remainder so the watermark's ms floor is exercised, not just ms-
    # aligned data. With gap=30min and delay=10min, a user's final
    # session is emitted iff floor(last_us/1000)+1800000 <
    # floor(max_us/1000)-600000 STRICTLY.
    MIN = 60_000_000_000  # one minute in ns
    US = 1_000            # one microsecond in ns
    MS = 1_000_000        # one millisecond in ns
    T0 = 1704067200000000000
    ev_rows = []
    eid = [0]

    def ev(ts, uid, etype="click", value=1.0):
        ev_rows.append((eid[0], ts, uid, etype,
                        value, '{"k":%d}' % (eid[0] % 5)))
        eid[0] += 1

    # user 0: the clock — 311 one-minute events, max ts = T0+310min+700us.
    # The span is chosen so the ms-floored watermark lands EXACTLY on an
    # hour boundary (wm = floor(tmax)-10min = T0+300min = a tumbling
    # window END): the tumbling emission boundary (<= vs <, us vs ms)
    # is exercised, not just the session timeout boundary.
    for i in range(311):
        ev(T0 + i * MIN + 700 * US, 0, ["click", "view"][i % 2],
           float(i % 200))
    tmax = T0 + 310 * MIN + 700 * US
    # user 1: close lands EXACTLY on the horizon (ms-for-ms) -> strict
    # '<' means NOT emitted; an oracle with '<=' would diverge here
    ev(tmax - 40 * MIN, 1)
    # user 2: one ms strictly past the horizon -> emitted
    ev(tmax - 40 * MIN - MS, 2)
    # user 3: 600 us before user 1 — the ms FLOOR discriminator: floored
    # close == horizon (not emitted) while unfloored us arithmetic would
    # say close < horizon (emitted); an oracle skipping the ms floor
    # diverges here
    ev(tmax - 40 * MIN - 600 * US, 3)
    # user 4: session-gap and throttle-gap boundaries at == gap exactly —
    # the polarity SPLIT this corpus caught: session_window MERGES the
    # touching event (same session) while the throttle DROPS it (keep
    # needs strictly past the gap); plus re-arm semantics
    ev(T0, 4)
    ev(T0 + 30 * MIN, 4)        # == gap: session MERGES; throttle drops
    ev(T0 + 61 * MIN, 4)        # > 30min from last kept: kept, new session
    # user 5: one us inside the gap on both steps -> ONE session of 3;
    # throttle: 2nd dropped (29:59.999999), 3rd kept (> 30min from T0)
    ev(T0 + 100 * MIN, 5)
    ev(T0 + 130 * MIN - US, 5)
    ev(T0 + 160 * MIN - 2 * US, 5)
    # user 6: same-instant ties -> one session n=3; throttle keeps only
    # the lowest event_id (the (ts, event_id) tie-break both walks pin)
    for _ in range(3):
        ev(T0 + 50 * MIN, 6)
    # user 7: interval-join bounds — view at V; click at V (>=, in),
    # V+30min-1us (in), V+30min (strict <, out), V-1us (out)
    V = T0 + 150 * MIN
    ev(V, 7, "view")
    ev(V, 7, "click")
    ev(V + 30 * MIN - US, 7, "click")
    ev(V + 30 * MIN, 7, "click")
    ev(V - US, 7, "click")
    # user 8: an EMITTED all-null-value session (closed by successor):
    # SQL sum over no non-null values is NULL, the walk must agree
    ev(T0, 8, value=None)
    ev(T0 + 5 * MIN, 8, value=None)
    ev(T0 + 40 * MIN, 8, value=7.0)
    doc_rows = [(i, f"horizon probe document number {i} with enough "
                 "plain words to shingle and fingerprint cleanly",
                 "en", "web", 80) for i in range(60)]
    emb_rows = [(i, [math.sin(i * 64 + j + 1.0) for j in range(64)], i % 3)
                for i in range(40)]
else:  # degenerate
    doc_rows = [(i, "the same document body repeated for every single row",
                 "en", "web", 49) for i in range(60)]
    emb_rows = [(i, [0.0] * 64, 0) for i in range(40)]
    ev_rows = [(i, 1704067200000000000, 0, "click", 1.0, '{"k":1}')
               for i in range(300)]

pq.write_table(pa.table({
    "doc_id": pa.array([r[0] for r in doc_rows], pa.int64()),
    "text": pa.array([r[1] for r in doc_rows], pa.string()),
    "lang": pa.array([r[2] for r in doc_rows], pa.string()),
    "source": pa.array([r[3] for r in doc_rows], pa.string()),
    "length": pa.array([r[4] for r in doc_rows], pa.int64()),
}), f"{out}/documents.parquet")

pq.write_table(pa.table({
    "vec_id": pa.array([r[0] for r in emb_rows], pa.int64()),
    "embedding": pa.array([r[1] for r in emb_rows],
                          pa.list_(pa.float32())),
    "label": pa.array([r[2] for r in emb_rows], pa.int64()),
}), f"{out}/embeddings.parquet")

pq.write_table(pa.table({
    "event_id": pa.array([r[0] for r in ev_rows], pa.int64()),
    "ts": (pa.array([r[1] for r in ev_rows], pa.timestamp("ns"))
           if enc == "ns" else
           # trunc toward zero (int // floors, so negate-divide-negate for
           # pre-epoch ns) — the pinned cross-engine ns->us coercion
           pa.array([None if r[1] is None else
                     (r[1] // 1000 if r[1] >= 0 else -((-r[1]) // 1000))
                     for r in ev_rows], pa.timestamp("us"))),
    "user_id": pa.array([r[2] for r in ev_rows], pa.int64()),
    "event_type": pa.array([r[3] for r in ev_rows], pa.string()),
    "value": pa.array([r[4] for r in ev_rows], pa.float64()),
    "props": pa.array([r[5] for r in ev_rows], pa.string()),
}), f"{out}/events.parquet")

for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem"):
    shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")

print(f"[salted_corpus] {mode} corpus at {out}")
