"""Broadcast-vocab BPE tokenizer: merge-table training + Arrow-kernel
encoding (Sennrich et al. 2016 "Neural Machine Translation of Rare
Words with Subword Units"; encode loop per the GPT-2 reference
encoder — merge ALL occurrences of the lowest-rank pair each step).

The repo's other token counts (token_stats, sequence_packing_bpe's
budget arithmetic) speak a BPE-ish PRE-tokenizer regex; this module
is the real thing: a merge table trained on the corpus, broadcast,
and applied deterministically.

Spark-first shape, and why it holds at 100 TB:

1. training input is the WORD-FREQUENCY table, not the corpus — the
   classic BPE trainer trick: one corpus scan with map-side combine
   reduces 10^12 tokens to a vocabulary-sized (word, count) frame;
2. the driver model is bounded BY CONSTRUCTION: the same
   histogram-walk budget recipe as llm/lm._min_count_for_budget picks
   the smallest count threshold whose surviving vocabulary fits
   BPE_TRAIN_MAX_WORDS rows, so the collect can never exceed the
   budget no matter the corpus (pytest-enforced on a corpus where it
   binds);
3. training itself is driver Python over the bounded word-count dict
   (incremental pair-count maintenance + a lazy max-heap — the
   Sennrich trainer), exactly the MLlib-style "collect the model
   state" pattern the k-means/LM families use: iterative algorithms
   coordinate through the driver, never through K chained shuffles;
4. encoding is a NARROW Arrow ``mapInPandas`` pass with the ranked
   merge table a broadcast closure constant and a per-word memo cache
   (words repeat; each distinct word is encoded once per task).

Determinism contract (bit-identity pytest vs a naive recount-replay
trainer and a driver encode replica): merge choice is (max pair
count, then lexicographically smallest pair); both trainer and
encoder merge all occurrences left-to-right in one pass; training
stops early when no pair occurs twice.

Oracle split: merge-table training is iterative and not
SQL-expressible, so `bpe_token_stats` is a rows-only registry row
pytest-bracketed against the replica, while `bpe_pair_counts` — the
training INPUT (the weighted adjacent-pair histogram the first merge
maximizes) — is a full hash-checked DuckDB [Q] anchor.

Reference parity: no tokenizer exists in the reference (unit =
table/column); north-star extension per SURVEY.md §1.2/§7.2.
"""

from __future__ import annotations

import heapq
from collections import Counter, defaultdict

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.session import (SessionCache,
                                               session_key)
from gcp_datalake_utils_spark.sources import load_table

# merge budget: deliberately below this corpus's ~108-merge saturation
# point (31-word synthetic vocab) so the registry row exercises the
# partial-merge regime real corpora live in
BPE_N_MERGES = 24
BPE_TRAIN_MAX_WORDS = 50_000  # hard driver model row budget

_MERGE_CACHE = SessionCache()


def word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, c): whitespace-token frequency table — one corpus scan,
    map-side combined into a vocabulary-sized frame."""
    d = load_table(spark, sf_dir, "documents")
    return (d.select(F.explode(
        F.split(F.trim("text"), r"\s+")).alias("word"))
        .groupBy("word").agg(F.count("*").alias("c")))


def _min_count_for_word_budget(wc: DataFrame, budget: int) -> int:
    """Smallest count threshold T with |{w : c_w >= T}| <= budget —
    the llm/lm.py histogram walk applied to the word table."""
    hist = sorted((r["c"], r["n"]) for r in
                  wc.groupBy("c").agg(F.count("*").alias("n"))
                  .collect())
    tail = sum(n for _, n in hist)
    for c, n in hist:
        if tail <= budget:
            return c
        tail -= n
    return (hist[-1][0] + 1) if hist else 1


def budgeted_word_counts(spark: SparkSession,
                         sf_dir: str) -> dict[str, int]:
    """The driver training model: word->count, <= BPE_TRAIN_MAX_WORDS
    rows by construction."""
    wc = word_counts(spark, sf_dir).localCheckpoint()
    t = _min_count_for_word_budget(wc, BPE_TRAIN_MAX_WORDS)
    rows = wc.where(F.col("c") >= t).collect()
    assert len(rows) <= BPE_TRAIN_MAX_WORDS
    return {r["word"]: r["c"] for r in rows}


def _merge_all(syms: list[str], a: str, b: str) -> list[str]:
    """Merge every (a, b) occurrence left-to-right in one pass — the
    shared trainer/encoder primitive the determinism contract pins."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def train_merges(wc: dict[str, int],
                 n_merges: int = BPE_N_MERGES) -> list[tuple[str, str]]:
    """Sennrich trainer over a word-count dict: incremental pair
    counts + a lazy max-heap; merge = (max count, smallest pair);
    stops when no pair occurs at least twice."""
    words = [(list(w), c) for w, c in sorted(wc.items()) if w]
    counts: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for idx, (syms, c) in enumerate(words):
        for p in zip(syms, syms[1:]):
            counts[p] += c
            where[p].add(idx)
    heap = [(-c, p) for p, c in counts.items()]
    heapq.heapify(heap)

    def push(p):
        c = counts.get(p, 0)
        if c > 0:
            heapq.heappush(heap, (-c, p))

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        nc, pair = heap[0]
        if counts.get(pair, 0) != -nc:  # stale entry
            heapq.heappop(heap)
            push(pair)
            continue
        if -nc < 2:
            break
        heapq.heappop(heap)
        merges.append(pair)
        touched: set = set()
        for idx in list(where.get(pair, ())):
            syms, c = words[idx]
            for p in zip(syms, syms[1:]):
                counts[p] -= c
                where[p].discard(idx)
                touched.add(p)
            syms = _merge_all(syms, *pair)
            words[idx] = (syms, c)
            for p in zip(syms, syms[1:]):
                counts[p] += c
                where[p].add(idx)
                touched.add(p)
        counts.pop(pair, None)
        where.pop(pair, None)
        for p in touched:
            push(p)
    return merges


def trained_merges(spark: SparkSession,
                   sf_dir: str) -> list[tuple[str, str]]:
    key = (session_key(spark), sf_dir, BPE_N_MERGES,
           BPE_TRAIN_MAX_WORDS)
    hit = _MERGE_CACHE.get_or_build(key, lambda: train_merges(
            budgeted_word_counts(spark, sf_dir)))
    return hit


def encode_word(word: str, ranks: dict[tuple[str, str], int],
                cache: dict[str, list[str]]) -> list[str]:
    """GPT-2-style encode: repeatedly merge ALL occurrences of the
    lowest-rank adjacent pair until none applies."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    while len(syms) > 1:
        best = min((ranks[p] for p in zip(syms, syms[1:])
                    if p in ranks), default=None)
        if best is None:
            break
        a, b = next(p for p in zip(syms, syms[1:])
                    if ranks.get(p) == best)
        syms = _merge_all(syms, a, b)
    cache[word] = syms
    return syms


_STATS_SCHEMA = ("doc_id long, n_ws_tokens long, n_bpe_tokens long, "
                 "bpe_per_word double")


def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q, rows-only] (doc_id, n_ws_tokens, n_bpe_tokens,
    bpe_per_word): real merge-table BPE token counts per document.
    Not SQL-expressible (iterative training); pytest-bracketed
    instead: bit-identity vs a driver encode replica, round-trip
    (concat(tokens) == word), and n_ws <= n_bpe <= n_chars."""
    ranks = {p: i for i, p in
             enumerate(trained_merges(spark, sf_dir))}

    def kernel(batches):
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nws, nbpe, ratio = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                ws = ("" if text is None else text).strip().split()
                n_bpe = sum(len(encode_word(w, ranks, cache))
                            for w in ws)
                ids.append(doc_id)
                nws.append(len(ws))
                nbpe.append(n_bpe)
                ratio.append(round(n_bpe / len(ws), 6) if ws else None)
            yield pd.DataFrame({"doc_id": ids, "n_ws_tokens": nws,
                                "n_bpe_tokens": nbpe,
                                "bpe_per_word": ratio})

    return (load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .mapInPandas(kernel, _STATS_SCHEMA))


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] (pair, n): the 50 heaviest adjacent character pairs,
    occurrence-weighted — the exact histogram the first BPE merge
    maximizes (pre-budget; the budget threshold does not bind on the
    test corpora). Computed from the vocabulary-sized word-count
    frame, so the corpus-size explode never happens: pairs fan out of
    ~|V| rows, not ~10^12 tokens. Total (n desc, pair asc) order
    makes the LIMIT deterministic in both engines."""
    wc = word_counts(spark, sf_dir)
    pairs = F.transform(
        F.sequence(F.lit(1), F.length("word") - 1),
        lambda i: F.col("word").substr(i, F.lit(2)))
    return (wc.where(F.length("word") >= 2)
            .select(F.explode(pairs).alias("pair"), "c")
            .groupBy("pair").agg(F.sum("c").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(50))


BPE_PAIR_COUNTS_ORACLE = r"""
WITH w AS (
  SELECT w AS word, count(*) AS c
  FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
        FROM documents)
  GROUP BY w
),
pairs AS (
  SELECT substr(word, CAST(i AS INTEGER), 2) AS pair, c
  FROM w, UNNEST(range(1, len(word))) AS t(i)
  WHERE len(word) >= 2
)
SELECT pair, CAST(sum(c) AS BIGINT) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 50
"""
