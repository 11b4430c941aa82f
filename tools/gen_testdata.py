#!/usr/bin/env python3
"""Deterministic synthetic testdata generator (dev tool, builder-side).

Regenerates the TESTDATA.md star schema at an arbitrary scale factor so the
full oracle gate and Bench can be rehearsed at sf1 (10x the driver's bench
scale). The driver's own generator (seed=42) is not shipped; this one was
written from the measured distributions of /root/testdata/sf{0.001,0.01,0.1}
(schemas, key ranges, value domains, dup structure — see SF1.md) and uses its
own fixed seed, so sf1 is a NEW deterministic sample from the same
distributions, not a byte-extension of the driver's stream. That is exactly
what the correctness gate needs: Spark and DuckDB are compared on the SAME
parquet, so the gate is data-agnostic as long as schema/domains match.

Measured contract replicated here (sf0.1 reference):
  region    5        fixed names AFRICA..MIDDLE EAST          (copied)
  nation    25       NATION_i, n_regionkey = i % 5            (copied)
  customer  150000*sf  Customer#%09d, nationkey U[0,25), acctbal U[-1000,10000) 2dp, 5 segments
  supplier  10000*sf   Supplier#%09d, same acctbal domain
  part      200000*sf  name = adj x noun (8x8 pools), Brand#1..25, 6 types, size U[1,50], retail 900+0.1*key
  orders    1500000*sf custkey U[customers), status O/P/F, totalprice U[1000,500000) 2dp,
                       orderdate U[1995-01-01, 2001-08-01] midnight, 5 priorities
  lineitem  6000000*sf orderkey U[orders), partkey U[parts), suppkey U[suppliers),
                       linenumber U[1,7], quantity U{1..50} as double,
                       extendedprice U[900,105000) 2dp (independent of quantity — measured corr 0.001),
                       discount U{0.00..0.10}, tax U{0.00..0.08}, returnflag N/A/R, linestatus O/F,
                       shipdate U[1995-01-01, 2001-12-31) midnight (independent of orderdate —
                       measured datediff spans -2399..+2496)
  events    1000000*sf event_id asc == ts asc over [2024-01-01, 2024-01-31), user U[customers/10),
                       5 types uniform, value ~ Exp(mean 50) 2dp, props = {"k": U[0,100)}
  documents max(500, 50000*sf)  10..100 words from a 31-word pool, ~5%% are near-copies of an
                       earlier doc with 1..3 word edits (measured: 25 pairs @ J>0.3 per 500 docs,
                       J in 0.87..0.99), lang ~ [en .41, zh/es/fr .15, de .14], source = src{id%%20}
  embeddings max(500, 20000*sf) 64-dim float32 unit vectors = normalize(0.56*center[label] + N(0,1))
                       (measured: mean cos-to-own-centroid 0.07, no cos>0.9 pairs), label U[0,10)

Usage: python3 tools/gen_testdata.py <sf> <outdir> [--zipf-docs] [--docs-only]

--zipf-docs replaces the 30-word document pool with a Zipf-Mandelbrot
vocabulary (p(r) ~ 1/(r+2.7)^1.07 over 50k ranks — the classic fit to
natural-language frequency spectra; observed distinct types then follow
Heaps' law in corpus size: measured 31.5k types at sf0.1 / 49.6k at sf1,
top-rank df ~78%% of docs, i.e. "the"-like). Everything else about the
documents contract is preserved: 10..100 words/doc, ~5% near-copies of an
earlier doc with 1..3 word edits, the FIRST edit inserting the literal
"dup" marker (the near-dup family census the split/leak queries key on).
The fixture exists to measure the dedup family's candidate economics on a
REALISTIC token distribution (SF1.md §3 attributed the 40-60x sf1 tail to
the synthetic pool making every token a stopword); the oracle gate itself
is data-agnostic. Zipf documents use their own rng stream (SEED+1) so the
fixture is deterministic regardless of which other tables are generated.

--docs-only writes only documents.parquet (the other 9 tables are shared
with the base dirs via symlinks when assembling a fixture dir).
"""
import json
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815  # fixed; independent of the driver's seed=42 stream


def day_us(lo: str, hi: str, n, rng):
    """Uniform midnight timestamps in [lo, hi] as us-precision int64."""
    lo_d = np.datetime64(lo, "D").astype("int64")
    hi_d = np.datetime64(hi, "D").astype("int64")
    days = rng.integers(lo_d, hi_d + 1, n)
    return days * 86_400_000_000  # days -> microseconds


def write(outdir, name, cols, schema):
    tbl = pa.table(cols, schema=schema)
    pq.write_table(tbl, f"{outdir}/{name}.parquet")
    print(f"  {name}: {tbl.num_rows} rows")


def ts(col):
    return pa.field(col, pa.timestamp("us"))


def gen_documents(n_doc, rng, zipf):
    """Document texts with the measured near-dup census (5% copies, 1..3
    edits, first edit = the "dup" family marker). `zipf` switches the base
    vocabulary from the driver's 30-word pool to a Zipf-Mandelbrot one."""
    if zipf:
        # Heaps'-law vocabulary (r13; was a fixed 50k-rank cap): available
        # ranks grow V = K * n_tokens^0.5, calibrated so the sf1 fixture
        # keeps its measured ~50k types (K = 30 at ~2.75M tokens) — at the
        # fixed cap, per-token df grew ~10x per decade past sf1, which
        # SF1.md had to caveat as an upper bound on prefix-cut candidates
        # (real corpora mint new types instead of re-drawing the same 50k).
        n_tokens_est = n_doc * 54.5  # E[words/doc] for U[10,100)
        n_ranks = max(1000, int(round(30.0 * n_tokens_est ** 0.5)))
        ranks = np.arange(1, n_ranks + 1)
        p = 1.0 / np.power(ranks + 2.7, 1.07)
        p /= p.sum()
        vocab = np.array([f"w{r}" for r in ranks])
        # one vectorized draw for the whole corpus: rng.choice with a
        # probability vector pays O(V) setup per call, so a per-doc loop at
        # 500k docs x 160k ranks is computationally infeasible; a single
        # bulk call is one cumsum + n_tokens binary searches. The buffer
        # refills on overrun (word-count variance, edit draws).
        buf = vocab[rng.choice(len(vocab), int(n_tokens_est + 6 * n_tokens_est ** 0.5) + 4096, p=p)]
        pos = 0

        def draw(n):
            nonlocal buf, pos
            if pos + n > len(buf):
                buf = vocab[rng.choice(len(vocab), max(n, 1_000_000), p=p)]
                pos = 0
            out = buf[pos:pos + n]
            pos += n
            return out
    else:
        base_pool = np.array(["a", "agg", "batch", "big", "column",
                              "customer", "data", "fast", "filter", "group",
                              "hash", "join", "key", "line", "merge",
                              "order", "part", "query", "row", "scan",
                              "slow", "small", "sort", "spark", "stream",
                              "table", "the", "value", "vector", "window"])

        def draw(n):
            return base_pool[rng.integers(0, len(base_pool), n)]

    texts = []
    for i in range(n_doc):
        if i > 0 and rng.random() < 0.05:
            words = texts[rng.integers(0, i)].split()
            edits = rng.integers(1, 4)
            words[rng.integers(0, len(words))] = "dup"
            for _ in range(edits - 1):
                words[rng.integers(0, len(words))] = draw(1)[0]
            texts.append(" ".join(words))
        else:
            texts.append(" ".join(draw(rng.integers(10, 100))))
    return texts


def main():
    sf, outdir = float(sys.argv[1]), sys.argv[2]
    zipf_docs = "--zipf-docs" in sys.argv
    docs_only = "--docs-only" in sys.argv
    import os
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = max(500, int(50_000 * sf))
    n_emb = max(500, int(20_000 * sf))

    if not docs_only:
        # region / nation: fixed dims, identical at every sf
        write(outdir, "region",
              {"r_regionkey": pa.array(range(5), pa.int32()),
               "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]},
              pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
        write(outdir, "nation",
              {"n_nationkey": pa.array(range(25), pa.int32()),
               "n_name": [f"NATION_{i}" for i in range(25)],
               "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())},
              pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                         ("n_regionkey", pa.int32())]))

        segments = ["MACHINERY", "HOUSEHOLD", "BUILDING", "FURNITURE", "AUTOMOBILE"]
        write(outdir, "customer",
              {"c_custkey": pa.array(range(n_cust), pa.int64()),
               "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
               "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
               "c_acctbal": np.round(rng.uniform(-1000, 10000, n_cust), 2),
               "c_mktsegment": pa.array(np.array(segments)[rng.integers(0, 5, n_cust)])},
              pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                         ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                         ("c_mktsegment", pa.string())]))

        write(outdir, "supplier",
              {"s_suppkey": pa.array(range(n_supp), pa.int64()),
               "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
               "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
               "s_acctbal": np.round(rng.uniform(-1000, 10000, n_supp), 2)},
              pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                         ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))

        adjs = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
        nouns = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
        types = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
        ai = rng.integers(0, 8, n_part)
        ni = rng.integers(0, 8, n_part)
        write(outdir, "part",
              {"p_partkey": pa.array(range(n_part), pa.int64()),
               "p_name": [f"{adjs[a]} {nouns[b]}" for a, b in zip(ai, ni)],
               "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
               "p_type": pa.array(np.array(types)[rng.integers(0, 6, n_part)]),
               "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
               "p_retailprice": np.round(900.0 + 0.1 * np.arange(n_part), 2)},
              pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                         ("p_brand", pa.string()), ("p_type", pa.string()),
                         ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

        prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        write(outdir, "orders",
              {"o_orderkey": pa.array(range(n_ord), pa.int64()),
               "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
               "o_orderstatus": pa.array(np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]),
               "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
               "o_orderdate": pa.array(day_us("1995-01-01", "2001-08-01", n_ord, rng),
                                       pa.timestamp("us")),
               "o_orderpriority": pa.array(np.array(prios)[rng.integers(0, 5, n_ord)])},
              pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                         ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                         ts("o_orderdate"), ("o_orderpriority", pa.string())]))

        write(outdir, "lineitem",
              {"l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
               "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
               "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
               "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
               "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
               "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
               "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
               "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
               "l_returnflag": pa.array(np.array(["N", "A", "R"])[rng.integers(0, 3, n_li)]),
               "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
               "l_shipdate": pa.array(day_us("1995-01-01", "2001-12-31", n_li, rng),
                                      pa.timestamp("us"))},
              pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                         ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                         ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                         ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                         ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                         ts("l_shipdate")]))

        ev_types = ["click", "view", "purchase", "signup", "error"]
        t0 = np.datetime64("2024-01-01", "us").astype("int64")
        t1 = np.datetime64("2024-01-31", "us").astype("int64")
        ev_ts = np.sort(rng.integers(t0, t1, n_ev))
        write(outdir, "events",
              {"event_id": pa.array(range(n_ev), pa.int64()),
               "ts": pa.array(ev_ts, pa.timestamp("us")),
               "user_id": pa.array(rng.integers(0, max(1, n_cust // 10), n_ev), pa.int64()),
               "event_type": pa.array(np.array(ev_types)[rng.integers(0, 5, n_ev)]),
               "value": np.round(rng.exponential(50.0, n_ev), 2),
               "props": [json.dumps({"k": int(k)}, separators=(", ", ": "))
                         for k in rng.integers(0, 100, n_ev)]},
              pa.schema([("event_id", pa.int64()), ts("ts"), ("user_id", pa.int64()),
                         ("event_type", pa.string()), ("value", pa.float64()),
                         ("props", pa.string())]))

    # Documents: loop + census in gen_documents (shared with --zipf-docs).
    # The zipf fixture uses its own rng stream (SEED+1) so it is
    # deterministic regardless of which other tables were generated.
    doc_rng = np.random.default_rng(SEED + 1) if zipf_docs else rng
    texts = gen_documents(n_doc, doc_rng, zipf_docs)
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
    write(outdir, "documents",
          {"doc_id": pa.array(range(n_doc), pa.int64()),
           "text": texts,
           "lang": pa.array(langs[doc_rng.choice(5, n_doc, p=lang_p)]),
           "source": [f"src{i % 20}" for i in range(n_doc)],
           "n_chars": pa.array([len(t) for t in texts], pa.int64())},
          pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("lang", pa.string()), ("source", pa.string()),
                     ("n_chars", pa.int64())]))

    if not docs_only:
        centers = rng.standard_normal((10, 64))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        labels = rng.integers(0, 10, n_emb)
        vecs = 0.56 * centers[labels] + rng.standard_normal((n_emb, 64))
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs.astype("float32")
        write(outdir, "embeddings",
              {"vec_id": pa.array(range(n_emb), pa.int64()),
               "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
               "label": pa.array(labels, pa.int32())},
              pa.schema([("vec_id", pa.int64()),
                         ("embedding", pa.list_(pa.float32())),
                         ("label", pa.int32())]))


if __name__ == "__main__":
    main()
