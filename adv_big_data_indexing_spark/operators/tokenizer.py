"""BPE tokenizer training over the documents corpus.

The reference pipeline stops at whitespace/keyword analysis (its
Elasticsearch mapping, src/elasticSearch/dataMapping.json); a training-
data engine must also LEARN a subword vocabulary — byte-pair encoding
(Sennrich et al. 2016, the GPT/Llama tokenizer family) — from corpus
statistics. This module trains the first K merges exactly.

Algorithm (classic corpus-level BPE on a word-frequency table):

1. Aggregate the corpus to ``(word, freq)`` — vocabulary-sized, shuffled
   once. All further work is over the vocab table, never the corpus.
2. Represent each word as its character symbols. The symbol sequence is
   carried as ONE string with double-space separators and double-space
   sentinels (``'  a  b  c  '``): a merge of pair (a, b) is then exactly
   ``replace(sym, ' a  b ', ' ab ')`` — left-to-right, non-overlapping
   (both JVM ``String.replace`` and DuckDB ``replace`` scan that way),
   which is precisely greedy BPE merge order, and each match leaves one
   space on each side so back-to-back occurrences (``a b a b``) and
   self-pairs (``a a a`` -> ``aa a``) merge like the textbook algorithm.
3. Per iteration: explode adjacent symbol pairs (with multiplicity,
   weighted by word freq), aggregate counts, take the argmax with the
   deterministic (count DESC, left ASC, right ASC) tie-break, apply the
   merge, repeat.

Scale design: the corpus tokenize + count is one map + one shuffle; the
per-iteration pair count is a map + aggregate over the VOCAB table
(millions of rows at web scale, not the 100 TB corpus), with the argmax
as a TakeOrdered(1). The per-iteration driver action carries one row —
the same driver-loop shape as k-means (clustering.py) and PageRank
(graph.py). State between iterations is the vocab DataFrame with a
chained narrow ``replace`` projection; the base is checkpointed
(consistent_materialize) so
the corpus scan runs exactly once.

Determinism: pure integer counts and binary string comparison — no
hashes, no floats — so the DuckDB oracle (an unrolled CTE triple per
merge) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.contract import query
from adv_big_data_indexing_spark.operators.advanced import (
    consistent_materialize,
)
from adv_big_data_indexing_spark.functions.text import DUCK_TOKENS, tokens
from adv_big_data_indexing_spark.sources.catalog import load_table

#: number of merges to learn. Each merge is one vocab-table aggregate;
#: real trainings run ~30k merges of the identical step.
BPE_MERGES = 10

#: vocab rows at or below which the merge loop folds onto the DRIVER
#: (r14, VERDICT r13 item 3 — the kmeans discipline): the corpus→vocab
#: aggregation stays distributed (the only corpus-sized work), and the
#: per-merge argmax loop then runs over the collected (freq, sym) table
#: in exact integer arithmetic instead of paying a Catalyst plan build +
#: TakeOrdered job per merge (~0.17 s/iteration of pure driver-side
#: floor at any SF — the BASELINE r6 build/exec split). 2M rows ≈
#: ~150 MB on the driver, well under driver memory; a web-scale vocab
#: above the cap routes through the distributed per-iteration loop
#: unchanged (same routing pattern as MAX_EXACT_JACCARD_DOCS). Results
#: are bit-identical on both paths: pure integer counts, and Python's
#: code-point string order equals Spark's UTF8String binary order for
#: the (count DESC, lsym, rsym) tie-break — pinned by
#: tests/test_timeseries_tokenizer.py.
MAX_DRIVER_BPE_VOCAB = 2_000_000


def _pair_counts(words: DataFrame) -> DataFrame:
    """(lsym, rsym, pair_count) over the vocab table's symbol strings.

    The explicit >=2 guard matters: Spark's ``sequence(1, 0)`` infers
    step -1 and yields [1, 0] (the ns_doc_chunking lesson), so a
    single-symbol word would fabricate a bogus pair.
    """
    ls = F.split(F.trim(F.col("sym")), "  ")
    pairs = F.when(
        F.size(ls) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(ls) - 1),
            lambda i: F.struct(
                F.element_at(ls, i).alias("l"), F.element_at(ls, i + 1).alias("r")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
    return (
        words.select("freq", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("lsym"), F.col("p.r").alias("rsym"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _driver_train_merges(vocab: list[tuple[int, str]], n_merges: int) -> list[tuple]:
    """The merge loop of :func:`_train_merges_list` over a collected
    (freq, sym) vocab — exact replica of the distributed/oracle
    semantics in pure integer arithmetic:

    - pair counts are over ``split(trim(sym), '  ')`` (the double-space
      symbol encoding); Python's ``strip(' ')``/``split('  ')`` match
      Spark's ``trim``/regex-literal split on these strings (symbols
      never contain whitespace — ``tokens()`` splits on ``\\s+``);
    - the argmax tie-break (count DESC, lsym ASC, rsym ASC) compares
      strings by code point, which equals Spark's UTF8String binary
      order and DuckDB's binary collation (UTF-8 byte order preserves
      code-point order);
    - a merge is greedy left-to-right non-overlapping — exactly what
      ``replace(sym, ' l  r ', ' lr ')`` does on the sentinel encoding
      (both JVM String.replace and DuckDB replace scan that way).

    Pair counts are maintained INCREMENTALLY (the classic BPE-trainer
    discipline): one full counting pass up front, then per merge only
    the words containing the merged pair are re-counted — identical to
    a full recount because each word's old contributions are subtracted
    exactly before its new ones are added.
    """
    from collections import defaultdict

    words: list[list] = [[freq, sym.strip(" ").split("  ")] for freq, sym in vocab]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (freq, ls) in enumerate(words):
        for i in range(len(ls) - 1):
            p = (ls[i], ls[i + 1])
            pair_counts[p] += freq
            pair_words[p].add(wi)

    out: list[tuple] = []
    for rank in range(1, n_merges + 1):
        if not pair_counts:
            break
        (lsym, rsym), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = lsym + rsym
        out.append((rank, lsym, rsym, merged, cnt))
        best = (lsym, rsym)
        for wi in list(pair_words.get(best, ())):
            freq, ls = words[wi]
            # subtract this word's old pair contributions
            for i in range(len(ls) - 1):
                p = (ls[i], ls[i + 1])
                pair_counts[p] -= freq
                if pair_counts[p] == 0:
                    del pair_counts[p]
                pair_words[p].discard(wi)
            # apply the merge greedily left-to-right, non-overlapping
            nls: list[str] = []
            i, n = 0, len(ls)
            while i < n:
                if i < n - 1 and ls[i] == lsym and ls[i + 1] == rsym:
                    nls.append(merged)
                    i += 2
                else:
                    nls.append(ls[i])
                    i += 1
            words[wi][1] = nls
            # add the new contributions
            for i in range(len(nls) - 1):
                p = (nls[i], nls[i + 1])
                pair_counts[p] += freq
                pair_words[p].add(wi)
    return out


def _train_merges_list(docs: DataFrame, n_merges: int) -> list[tuple]:
    """(rank, lsym, rsym, merged, pair_count) rows of the learned merges."""
    words = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
        .select(
            "freq",
            F.concat(
                F.lit("  "),
                F.array_join(F.expr("regexp_extract_all(w, '(.)', 1)"), "  "),
                F.lit("  "),
            ).alias("sym"),
        )
        .transform(consistent_materialize)
    )
    # r14 (VERDICT r13 item 3): the vocab is checkpointed, so this count
    # reads the materialized blocks — no second corpus pass. At or below
    # the cap the merge loop folds onto the driver (one bounded collect,
    # then pure-Python exact integer BPE); above it, the distributed
    # per-iteration loop below runs unchanged at any vocab size.
    if words.count() <= MAX_DRIVER_BPE_VOCAB:
        vocab = [(r.freq, r.sym) for r in words.select("freq", "sym").collect()]
        return _driver_train_merges(vocab, n_merges)
    out = []
    for rank in range(1, n_merges + 1):
        best = (
            _pair_counts(words)
            .orderBy(F.desc("pair_count"), "lsym", "rsym")
            .first()
        )
        if best is None:
            break
        out.append(
            (rank, best.lsym, best.rsym, best.lsym + best.rsym, best.pair_count)
        )
        words = words.select(
            "freq",
            F.replace(
                F.col("sym"),
                F.lit(f" {best.lsym}  {best.rsym} "),
                F.lit(f" {best.lsym}{best.rsym} "),
            ).alias("sym"),
        )
    return out


def train_bpe_merges(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from ``docs(text)``."""
    return docs.sparkSession.createDataFrame(
        _train_merges_list(docs, n_merges),
        schema="rank int, lsym string, rsym string, merged string, pair_count bigint",
    )


def _bpe_oracle(n_merges: int) -> str:
    toks = DUCK_TOKENS.format(col="text")
    ctes = [
        f"""w0 AS (
      SELECT CAST(count(*) AS BIGINT) AS freq,
             '  ' || array_to_string(regexp_extract_all(w, '.'), '  ') || '  ' AS sym
      FROM (SELECT unnest({toks}) AS w FROM documents)
      WHERE w <> ''
      GROUP BY w
    )"""
    ]
    for i in range(n_merges):
        # DuckDB's generate_series(1, 0) is [] (no step inference), so the
        # single-symbol case needs no CASE guard here.
        ctes.append(
            f"""p{i} AS (
      SELECT pr[1] AS lsym, pr[2] AS rsym, CAST(sum(freq) AS BIGINT) AS pair_count
      FROM (
        SELECT freq,
               unnest(list_transform(generate_series(1, len(ls) - 1),
                                     j -> [ls[j], ls[j + 1]])) AS pr
        FROM (SELECT freq, str_split(trim(sym), '  ') AS ls FROM w{i})
      )
      GROUP BY 1, 2
    )"""
        )
        ctes.append(
            f"""b{i} AS (
      SELECT lsym, rsym, pair_count FROM p{i}
      ORDER BY pair_count DESC, lsym, rsym LIMIT 1
    )"""
        )
        ctes.append(
            f"""w{i + 1} AS (
      SELECT w.freq,
             replace(w.sym, ' ' || b.lsym || '  ' || b.rsym || ' ',
                            ' ' || b.lsym || b.rsym || ' ') AS sym
      FROM w{i} w CROSS JOIN b{i} b
    )"""
        )
    final = "\n      UNION ALL\n      ".join(
        f"SELECT CAST({i + 1} AS INTEGER) AS rank, lsym, rsym, "
        f"lsym || rsym AS merged, pair_count FROM b{i}"
        for i in range(n_merges)
    )
    return "WITH " + ",\n    ".join(ctes) + f"\n    SELECT * FROM (\n      {final}\n    )"


@query(
    "ns_bpe_train_merges",
    oracle=_bpe_oracle(BPE_MERGES),
    bench=True,
    doc="NS BPE tokenizer training (Sennrich et al. 2016): learn the "
    f"first {BPE_MERGES} merges from corpus word frequencies. Pure "
    "integer counts + binary-collation tie-break (count DESC, pair ASC) "
    "make every merge bit-deterministic; the double-space symbol-string "
    "encoding turns 'apply merge' into a single literal replace() on "
    "both engines with exactly greedy left-to-right BPE semantics. "
    "Distributed shape: corpus -> vocab is the only corpus-sized "
    "shuffle; each merge is a vocab-table aggregate + TakeOrdered(1) "
    "(k-means-style driver loop carrying one row per iteration).",
)
def ns_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_bpe_merges(load_table(spark, sf_dir, "documents"))


def _bpe_apply_oracle(n_merges: int = BPE_MERGES) -> str:
    """Training CTE chain + per-document merge application + fertility.

    Every CTE that is referenced more than once (the training prefix is
    walked by both the next training step and the apply chain) is
    MATERIALIZED — without it the CTE tree doubles per step (the
    ns_embed_pca_power lesson: 2^K inlining, file-handle exhaustion).
    """
    toks = DUCK_TOKENS.format(col="text")
    base = _bpe_oracle(n_merges)
    train_ctes = base[len("WITH ") : base.rindex("SELECT * FROM")].rstrip().rstrip(",")
    train_ctes = train_ctes.replace(" AS (", " AS MATERIALIZED (")
    ctes = [train_ctes]
    ctes.append(
        f"""d0 AS MATERIALIZED (
      SELECT doc_id,
             '  ' || array_to_string(regexp_extract_all(w, '.'), '  ') || '  ' AS sym
      FROM (SELECT doc_id, unnest({toks}) AS w FROM documents)
      WHERE w <> ''
    )"""
    )
    for i in range(n_merges):
        ctes.append(
            f"""d{i + 1} AS MATERIALIZED (
      SELECT d.doc_id,
             replace(d.sym, ' ' || b.lsym || '  ' || b.rsym || ' ',
                            ' ' || b.lsym || b.rsym || ' ') AS sym
      FROM d{i} d CROSS JOIN b{i} b
    )"""
        )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(len(str_split(trim(sym), '  '))) AS BIGINT) AS n_subwords,
           CAST(sum(len(str_split(trim(sym), '  '))) AS BIGINT) * 1000000
             // CAST(count(*) AS BIGINT) AS fertility_ppm
    FROM d{n_merges}
    GROUP BY doc_id"""
    )


@query(
    "ns_bpe_apply_fertility",
    oracle=_bpe_apply_oracle(),
    doc="NS tokenizer application + fertility report: apply the "
    f"{BPE_MERGES} learned BPE merges to every document and report "
    "tokens, subwords and fertility (subwords per word, ppm) per doc — "
    "the metric that prices a tokenizer against a corpus (fertility "
    "drives context-window cost). Spark side is expression-only and "
    "ZERO-shuffle after training: per-doc token array -> per-token "
    "symbol strings -> the merge chain as nested transform(replace) "
    "literals -> aggregate() for the subword sum; no explode, no "
    "groupBy — embarrassingly parallel at any corpus size. The oracle "
    "re-derives the same merges (training CTE chain) and applies them "
    "row-wise. Integer fertility: subwords * 1e6 // tokens, both "
    "operands positive so truncating DIV is engine-identical.",
)
def ns_bpe_apply_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    merges = _train_merges_list(docs, BPE_MERGES)

    # the empty-doc guard filters on length(trim(text)) — equivalent to
    # "has >= 1 non-empty token" (tokens() splits the trimmed text on \s+)
    # but cheap enough to live in the scan stage; filtering on
    # size(toks) > 0 would push the whole tokenizer down into the scan
    # and run it twice per row (the token_rows lesson).
    d = docs.filter(F.length(F.trim(F.col("text"))) > 0).select(
        "doc_id",
        F.filter(tokens("text"), lambda w: w != F.lit("")).alias("toks"),
    )
    d = d.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.transform(
            "toks",
            lambda w: F.concat(
                F.lit("  "),
                F.array_join(F.regexp_extract_all(w, F.lit("(.)"), 1), "  "),
                F.lit("  "),
            ),
        ).alias("syms"),
    )
    # NB: a `lambda t, lsym=lsym: ...` default-arg binding breaks here —
    # Spark derives the higher-order function's arity from the Python
    # signature, so defaults read as extra lambda variables. Bind via a
    # closure factory instead.
    def _apply_merge(lsym: str, rsym: str):
        return lambda t: F.replace(
            t, F.lit(f" {lsym}  {rsym} "), F.lit(f" {lsym}{rsym} ")
        )

    for m in merges:
        d = d.withColumn("syms", F.transform("syms", _apply_merge(m[1], m[2])))
    nsub = F.aggregate(
        "syms",
        F.lit(0).cast("bigint"),
        lambda acc, t: acc + F.size(F.split(F.trim(t), "  ")).cast("bigint"),
    )
    d = d.select("doc_id", "n_tokens", nsub.alias("n_subwords"))
    return d.select(
        "doc_id",
        "n_tokens",
        "n_subwords",
        F.expr("CAST(n_subwords * 1000000 DIV n_tokens AS BIGINT)").alias(
            "fertility_ppm"
        ),
    )
