#!/usr/bin/env python3
"""Witness-fixture generator (r15 verdict #5): precompute the engine-specific
hashes (xxhash64, crc32) as PARQUET DATA so the DuckDB oracle can replay the
production hash pipelines as plain joins — the hash value becomes data,
exactly as the reference treats its checksum values
(reference lib/taps/utils.rb:25-31).

INDEPENDENCE: nothing here calls Spark. crc32 comes from zlib (a separate
implementation from java.util.zip), xxhash64 from tools/xxh64.py (a pure-
python implementation of the public XXH64 spec, seed 42 = Spark's default).
A hash-match through the gate therefore verifies the ENGINE's hash
implementations end-to-end against independent ones.

Outputs (committed, regenerate only when the driver regenerates testdata);
all three are CONTENT-keyed so one file serves every fixture SF (the
fixture is not prefix-consistent across SFs):
  fixtures/tok_xxh64.parquet    (tok, xxh, xxh_u, h40, h57) — one row per
      distinct token across sf0.001/0.01/0.1 documents; h40 = pmod(xxh,2^40)
      (minhash), h57 = pmod(xxh,2^57) (fingerprint), xxh_u = unsigned
      (simhash bit votes).
  fixtures/text_crc32.parquet   (text, crc) — zlib.crc32 per distinct
      document text across all SFs; oracles join d.text = w.text.
  fixtures/rowrepr_xxh64.parquet (repr, xxh) — xxhash64 per distinct
      chunk-checksum rowRepr string across all SFs
      (SparkEntry.checksumRowRepr: orderkey|custkey|status|totalprice
      DECIMAL(18,2)|yyyy-MM-dd); oracles reconstruct and join on repr.
"""
import sys, zlib, decimal, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).parent))
from xxh64 import xxh64_signed
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

OUT = pathlib.Path(__file__).parent.parent / "fixtures"
OUT.mkdir(exist_ok=True)
con = duckdb.connect()

# ---- token hashes (union of vocabs so the oracle works at any fixture SF)
toks = set()
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    for (t,) in con.execute(f"""
        SELECT DISTINCT unnest(string_split(lower(text), ' '))
        FROM read_parquet('/root/testdata/{sf}/documents.parquet')""").fetchall():
        if t:
            toks.add(t)
toks = sorted(toks)
rows = []
for t in toks:
    h = xxh64_signed(t.encode("utf-8"))
    hu = h % (1 << 64)
    rows.append((t, h, hu, hu % (1 << 40), hu % (1 << 57)))
pq.write_table(pa.table({
    "tok": pa.array([r[0] for r in rows], pa.string()),
    "xxh": pa.array([r[1] for r in rows], pa.int64()),
    "xxh_u": pa.array([r[2] for r in rows], pa.uint64()),
    "h40": pa.array([r[3] for r in rows], pa.int64()),
    "h57": pa.array([r[4] for r in rows], pa.int64()),
}), OUT / "tok_xxh64.parquet")
print(f"tok_xxh64.parquet: {len(rows)} tokens")

# ---- per-TEXT crc32 (content-keyed: the same doc_id carries DIFFERENT
# text at different SFs, so the witness keys on the text itself and the
# oracle joins d.text = w.text — SF-universal by construction)
texts = set()
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    for (t,) in con.execute(f"""
        SELECT DISTINCT text
        FROM read_parquet('/root/testdata/{sf}/documents.parquet')
        WHERE text IS NOT NULL""").fetchall():
        texts.add(t)
texts = sorted(texts)
pq.write_table(pa.table({
    "text": pa.array(texts, pa.string()),
    "crc": pa.array([zlib.crc32(t.encode("utf-8")) for t in texts], pa.int64()),
}), OUT / "text_crc32.parquet")
print(f"text_crc32.parquet: {len(texts)} distinct texts")

# ---- per-rowRepr xxhash64 for the chunk checksums (content-keyed on the
# serialized row string, same SF-universality argument). rowRepr replays
# SparkEntry.checksumRowRepr byte for byte: Spark's double->DECIMAL(18,2)
# cast is BigDecimal(double).setScale(2, HALF_UP) on the EXACT binary
# expansion -- python's Decimal(float) quantize(HALF_UP) is the same
# arithmetic on the same expansion (validated: identical hash SUM over
# all 15000 sf0.01 orders vs the engine).
TWO_DP = decimal.Decimal("0.01")
reprs = set()
for sf in ("sf0.001", "sf0.01", "sf0.1"):
    for ok, ck, st, tp, dt in con.execute(f"""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               strftime(o_orderdate, '%Y-%m-%d')
        FROM read_parquet('/root/testdata/{sf}/orders.parquet')""").fetchall():
        price = decimal.Decimal(tp).quantize(TWO_DP, rounding=decimal.ROUND_HALF_UP)
        reprs.add(f"{ok}|{ck}|{st}|{price}|{dt}")
reprs = sorted(reprs)
pq.write_table(pa.table({
    "repr": pa.array(reprs, pa.string()),
    "xxh": pa.array([xxh64_signed(r.encode("utf-8")) for r in reprs], pa.int64()),
}), OUT / "rowrepr_xxh64.parquet")
print(f"rowrepr_xxh64.parquet: {len(reprs)} distinct row reprs")
