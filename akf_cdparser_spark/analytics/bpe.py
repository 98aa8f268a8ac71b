"""Distributed BPE (byte-pair-encoding) vocabulary learning — tokenizer
training as a Spark job, the step a training-data pipeline runs before any
token-budgeted packing (see ``packing.pack_shards``) or decontamination
(q78) can be denominated in REAL tokens.

Algorithm (Sennrich et al. 2016, the word-internal variant without the
end-of-word marker — documented deviation, it keeps the symbol alphabet
equal to the corpus alphabet): start from characters, repeatedly count
adjacent symbol pairs over the WORD VOCABULARY weighted by word frequency,
merge the most frequent pair everywhere, emit (step, left, right,
pair_count).

Scale shape:
* the corpus collapses to its distinct-word vocabulary ONCE (one shuffle
  over (word, count) — words, not documents, are the working set from
  there on; at 100 TB the vocabulary is millions of rows, not billions);
* each merge step is one pair-count aggregation over the vocabulary plus
  one higher-order-function rewrite of the symbol arrays — no shuffle for
  the rewrite, one groupBy for the counts;
* the per-step driver read is ONE ROW (the argmax pair) — the same bounded
  O(steps) driver contract as the dup-cluster convergence checks;
* iteration state is localCheckpoint-truncated per step (the engine's
  standard lineage-cut; swap for persist()/checkpoint on a fault-tolerant
  cluster).

Determinism: integer pair counts (exact in any engine) + total tie-break
(count DESC, left ASC, right ASC) make the merge sequence a pure function
of the corpus — partitioning-invariant and value-hashable, which is what
lets an ITERATIVE algorithm sit behind a pinned oracle
(scripts/gen_pinned_oracles.py q94_rows; the q80 fixed-point-PageRank
precedent).

The greedy leftmost-first merge application is an ``F.aggregate`` fold:
append each symbol, but when the accumulator ends with ``left`` and the
incoming symbol is ``right``, replace the tail with the merged symbol —
exactly the non-overlapping left-to-right replace of reference BPE
("aaa" under (a,a) -> ["aa", "a"]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MERGE_SCHEMA = T.StructType([
    T.StructField("step", T.IntegerType()),
    T.StructField("left", T.StringType()),
    T.StructField("right", T.StringType()),
    T.StructField("pair_count", T.LongType()),
])


def word_vocab(docs: DataFrame) -> DataFrame:
    """(word, cnt) over whitespace-split words — the BPE working set."""
    return (docs
            .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
            .filter(F.length("word") > 0)
            .groupBy("word").agg(F.count("*").alias("cnt")))


def _adjacent_pairs(syms_col: str = "syms") -> "F.Column":
    """All adjacent (left, right) symbol pairs of one word's symbol array
    (empty for single-symbol words)."""
    syms = F.col(syms_col)
    heads = F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0)))
    return F.transform(
        heads,
        lambda x, i: F.struct(x.alias("left"),
                              F.element_at(syms, i + 2).alias("right")))


def _apply_merge(syms_col, left: str, right: str) -> "F.Column":
    """Greedy leftmost-first merge of (left, right) -> left+right inside a
    symbol array, as a single fold (no Python in the hot path)."""
    merged = left + right

    def step(acc, x):
        hit = ((F.size(acc) > 0)
               & (F.element_at(acc, -1) == F.lit(left))
               & (x == F.lit(right)))
        return (F.when(hit,
                       F.concat(F.slice(acc, 1, F.size(acc) - 1),
                                F.array(F.lit(merged))))
                .otherwise(F.concat(acc, F.array(x))))

    return F.aggregate(syms_col,
                       F.array().cast("array<string>"), step)


def _select_batch(rows, max_m: int, top_k: int | None = None,
                  merged_so_far: frozenset[str] = frozenset()):
    """Greedy EXACT batch selection over one round's ranked pair counts
    (``rows``: Row(left, right, pair_count) in (count DESC, left, right)
    order — the sequential tie-break). Returns the longest prefix of the
    sequential merge sequence provably computable from these counts alone:

    * DISJOINTNESS — a candidate sharing any symbol with an already-
      selected pair (or with a merged string the batch creates) STOPS the
      batch: merging a disjoint pair cannot change the counts or the
      adjacencies of the others, so the selected counts stay exact.
      Stopping (not skipping) preserves the sequential ORDER — an
      interacting candidate's count only decreases, but it may still be
      the true next merge.
    * NEW-PAIR BOUND — a merge (l, r) -> M can create pairs only at
      occurrence boundaries ``x·l·r`` / ``l·r·y``, so every created
      pair's count is bounded by the PRE-batch count of some (x, l) or
      (r, y) pair. ``bound`` tracks the max such count over selected
      pairs (floored at the K-th collected count for pairs below the
      collect horizon); a later candidate is only taken while its count
      strictly exceeds the bound, so no created pair could have outranked
      it in strict sequential order.

    * SYMBOL-COLLISION STOP — the new-pair bound counts only CREATED
      occurrences. If a selected merge's string l+r equals a symbol that
      ALREADY EXISTS in the vocabulary, created (x, M) occurrences
      accumulate onto pre-existing (x, l+r) counts, and the combined
      count can exceed the bound (ADVICE r6). Initial symbols are single
      characters, so a merged string (length >= 2) can only collide with
      a PREVIOUSLY MERGED symbol — all of which the driver knows
      (``merged_so_far``). On collision the batch stops right after the
      colliding selection; the first selection is always the true argmax
      and stays exact.

    All guards together make batch_m > 1 bit-identical to sequential
    (tested: test_analytics.py batched-vs-sequential equality)."""
    if not rows:
        return []
    # pairs below the collect horizon count <= the K-th count; when the
    # collect came back short, every pair is visible and the floor is 0
    floor_count = (int(rows[-1].pair_count)
                   if top_k is not None and len(rows) >= top_k else 0)
    selected = [(rows[0].left, rows[0].right, int(rows[0].pair_count))]
    used = {rows[0].left, rows[0].right, rows[0].left + rows[0].right}
    if (rows[0].left + rows[0].right) in merged_so_far:
        return selected

    def created_bound(l, r):
        # No self-exclusion: for l != r the (l, r) pair itself can never
        # match right==l / left==r, and for a self-pair (a, a) it MUST
        # count (a·a·a·a runs create (M, M) pairs bounded by count(a,a)),
        # which correctly stops the batch right after a self-pair.
        b = floor_count
        for row in rows:
            if row.right == l or row.left == r:
                b = max(b, int(row.pair_count))
        return b

    bound = created_bound(rows[0].left, rows[0].right)
    for row in rows[1:]:
        if len(selected) >= max_m:
            break
        l, r, pc = row.left, row.right, int(row.pair_count)
        if l in used or r in used or (l + r) in used or pc <= bound:
            break
        selected.append((l, r, pc))
        used.update((l, r, l + r))
        if (l + r) in merged_so_far:
            break  # symbol collision: later counts are no longer bounded
        bound = max(bound, created_bound(l, r))
    return selected


def learn_bpe(docs: DataFrame, n_merges: int = 12,
              batch_m: int = 1) -> DataFrame:
    """Learn ``n_merges`` BPE merges over ``docs(text)``; returns the merge
    table ``(step, left, right, pair_count)`` in merge order. Stops early
    if no adjacent pair remains (tiny corpora).

    ``batch_m`` applies up to m provably-independent merges per
    count-round (see :func:`_select_batch` — EXACT, not approximate: the
    merge table is bit-identical to ``batch_m=1`` for any corpus). A real
    32k-merge tokenizer at batch_m=1 is 32k sequential Spark jobs — days
    of driver orchestration; batching cuts rounds ~m× wherever the top of
    the pair distribution is symbol-disjoint (natural text usually is).
    Driver traffic stays bounded: one <=4*m-row collect per round."""
    spark = docs.sparkSession
    cur = (word_vocab(docs)
           .select(F.split("word", "").alias("syms"), "cnt")
           .localCheckpoint())
    top_k = max(32, 4 * batch_m)
    merges: list[tuple] = []
    while len(merges) < n_merges:
        rows = (cur.select("cnt", F.explode(_adjacent_pairs()).alias("p"))
                .groupBy(F.col("p.left").alias("left"),
                         F.col("p.right").alias("right"))
                .agg(F.sum("cnt").alias("pair_count"))
                .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
                .limit(top_k).collect())
        batch = _select_batch(rows, min(batch_m, n_merges - len(merges)),
                              top_k=top_k,
                              merged_so_far=frozenset(
                                  m[1] + m[2] for m in merges))
        if not batch:
            break
        nxt = cur
        for l, r, pc in batch:
            merges.append((len(merges), l, r, pc))
            nxt = nxt.select(_apply_merge("syms", l, r).alias("syms"), "cnt")
        nxt = nxt.localCheckpoint()
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return spark.createDataFrame(merges, MERGE_SCHEMA)


def apply_bpe(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenize ``docs(doc_id, text)`` under a learned merge list (in merge
    order): per doc, whitespace words -> characters -> the merge folds ->
    token count + distinct-token count. The merge chain is applied to the
    DISTINCT word vocabulary and joined back, so the fold cost is per
    unique word, not per occurrence. No explicit broadcast hint: a 100-TB
    corpus's distinct-word vocabulary (millions of rows × per-word token
    arrays) can exceed driver/broadcast limits, so the join strategy is
    left to AQE — it broadcasts when the tokenized vocabulary fits and
    shuffle-hash-joins when it doesn't (ADVICE r5)."""
    words = (docs
             .select("doc_id",
                     F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
             .filter(F.length("word") > 0))
    vocab = words.select("word").distinct() \
        .select("word", F.split("word", "").alias("syms"))
    for l, r in merges:
        vocab = vocab.select("word", _apply_merge("syms", l, r).alias("syms"))
    tokized = vocab.select("word", F.col("syms").alias("tokens"))
    return (words.join(tokized, "word")
            .select("doc_id", F.explode("tokens").alias("token"))
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_tokens"),
                 F.countDistinct("token").alias("n_distinct_tokens")))
