"""Text-analysis operators over the ``documents`` table (north-star set).

Language-ID (marker-word heuristic), quality scoring, token counting
(whitespace + BPE-ish subword estimate), and document fingerprinting.
All pure column expressions — no Python in the hot path — so they run
JVM-side at 100 TB with zero shuffle (per-row ops) or a single
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adv_big_data_indexing_spark.contract import query
from adv_big_data_indexing_spark.operators.advanced import (
    consistent_materialize,
)
from adv_big_data_indexing_spark.functions.exact import DUCK_ILOG2_Q4
from adv_big_data_indexing_spark.functions.text import DUCK_TOKENS, token_rows, tokens
from adv_big_data_indexing_spark.sources.catalog import load_table, spread

# Marker stopword lists for the language-ID heuristic. The synthetic corpus
# is English-ish word salad, so real language separation is not expected —
# the operator contract is deterministic scoring + argmax with a stable
# tie-break, which is what the oracle verifies.
_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "es": ("el", "la", "los", "de"),
    "fr": ("le", "la", "les", "des"),
    "de": ("der", "die", "das", "und"),
    "zh": ("de", "le", "shi", "bu"),
}

_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _marker_hits(toks, words: tuple[str, ...]):
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


@query(
    "ns_text_langid",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {" , ".join(
                 f"len(list_filter({DUCK_TOKENS.format(col='text')}, t -> t IN ({_sql_list(w)}))) AS score_{code}"
                 for code, w in _MARKERS.items()
             )}
      FROM documents
    )
    SELECT doc_id, lang AS actual_lang,
           CAST(score_en AS BIGINT) AS score_en,
           CASE greatest(score_en, score_es, score_fr, score_de, score_zh)
             WHEN score_de THEN 'de' WHEN score_en THEN 'en' WHEN score_es THEN 'es'
             WHEN score_fr THEN 'fr' WHEN score_zh THEN 'zh' END AS pred_lang
    FROM scored
    """,
    doc="NS language-ID: marker-stopword scores per language, argmax with "
    "alphabetical tie-break (CASE order de<en<es<fr<zh on the max).",
)
def ns_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    scores = {code: _marker_hits(toks, w) for code, w in _MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = (
        F.when(scores["de"] == best, "de")
        .when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["fr"] == best, "fr")
        .otherwise("zh")
    )
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        scores["en"].cast("bigint").alias("score_en"),
        pred.alias("pred_lang"),
    )


@query(
    "ns_text_quality",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, {DUCK_TOKENS.format(col="text")} AS toks,
             CAST(length(text) AS BIGINT) AS n_chars_m
      FROM documents
    )
    SELECT doc_id, n_chars_m,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(toks) AS avg_token_len,
           CAST(len(list_filter(toks, x -> x IN ({_sql_list(_STOPWORDS)}))) AS DOUBLE) / len(toks) AS stopword_ratio,
           CAST(length(text) - length(regexp_replace(text, '[.!?,;]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio
    FROM t
    """,
    bench=True,
    doc="NS quality scoring: length, token stats, stopword ratio, punctuation "
    "ratio — integer counts with one exact double division each.",
)
def ns_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    n_tok = F.size(toks)
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_m"),
        n_tok.cast("bigint").alias("n_tokens"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double") / n_tok).alias(
            "avg_token_len"
        ),
        (
            F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS))).cast("double") / n_tok
        ).alias("stopword_ratio"),
        (
            (
                F.length("text")
                - F.length(F.regexp_replace(F.col("text"), r"[.!?,;]", ""))
            ).cast("double")
            / F.length("text")
        ).alias("punct_ratio"),
    )


@query(
    "ns_text_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS.format(col="text")} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(toks, x -> ceil(length(x) / 4.0))) AS BIGINT) AS bpe_estimate
    FROM t
    """,
    doc="NS token counting: whitespace tokens + BPE-ish subword estimate "
    "(ceil(len/4) per token ≈ 4-chars-per-merge-unit).",
)
def ns_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    bpe = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4.0)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        bpe.cast("bigint").alias("bpe_estimate"),
    )


@query(
    "ns_text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
    doc="NS document fingerprint: md5 over casefolded, punctuation-stripped, "
    "whitespace-collapsed text — the normalization layer of exact dedup.",
)
def ns_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " ")
    )
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


@query(
    "ns_text_bigram_freq",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS.format(col="text")} AS toks FROM documents),
    grams AS (
      SELECT unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1])
             ELSE [] END) AS bigram
      FROM t
    )
    SELECT bigram, count(*) AS freq FROM grams GROUP BY bigram
    ORDER BY freq DESC, bigram LIMIT 50
    """,
    doc="NS corpus vocabulary analysis: top-50 word bigrams by frequency — "
    "the n-gram LM / contamination-screening building block. One explode + "
    "one partial-aggregated groupBy + top-k, no shuffle of raw text.",
)
def ns_text_bigram_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toked = d.select(tokens("text").alias("toks"))
    # explode_outer + null filter: plain explode's inferred size>0 filter
    # would push the tokenizer below the repartition into the scan stage.
    grams = toked.select(
        F.explode_outer(
            F.when(
                F.size("toks") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at("toks", i + 1), F.element_at("toks", i + 2)
                    ),
                ),
            ).otherwise(F.array())
        ).alias("bigram")
    ).filter(F.col("bigram").isNotNull())
    return (
        grams.groupBy("bigram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("bigram"))
        .limit(50)
    )


@query(
    "ns_text_token_entropy",
    oracle=None,  # ln() is not IEEE correctly-rounded: JVM Math.log and
    # DuckDB's libm differ by ulps, so exact cross-engine parity is
    # impossible for transcendental aggregates. Near-equality vs a
    # Python reference is asserted in tests/test_udfs.py instead.
    doc="NS token-distribution entropy per document (repetitiveness / "
    "boilerplate signal for corpus quality filtering). Terms fold in a "
    "canonical token order; rows-only because ln() is not portable at "
    "the bit level across math libraries.",
)
def ns_text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        token_rows(d, ["doc_id"])
        .groupBy("doc_id", "w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    n = tf.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("n"))
    agg = (
        tf.join(n, "doc_id")
        .groupBy("doc_id", "n")
        .agg(
            F.count("*").cast("bigint").alias("n_distinct"),
            # sort by token word → canonical fold order across engines
            F.transform(
                F.array_sort(F.collect_list(F.struct("w", "c"))), lambda x: x.c
            ).alias("counts"),
        )
    )
    term = lambda c: (c.cast("double") / F.col("n")) * F.log(c.cast("double") / F.col("n"))  # noqa: E731
    entropy = -F.aggregate(
        F.col("counts"), F.lit(0.0), lambda acc, c: acc + term(c)
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_distinct",
        entropy.alias("entropy_nats"),
    )


@query(
    "ns_text_simpson_diversity",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, w, count(*) AS c FROM (
        SELECT doc_id, unnest({DUCK_TOKENS.format(col="text")}) AS w FROM documents
      ) GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           CAST(sum(c) * sum(c) AS DOUBLE) / CAST(sum(c * c) AS DOUBLE) AS inv_simpson,
           CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS top_token_mass
    FROM tf GROUP BY doc_id
    """,
    doc="NS token-diversity via the inverse Simpson index — the oracle-backed "
    "companion to ns_text_token_entropy: collision mass sum(c^2)/n^2 is pure "
    "integer arithmetic (entropy's ln() is not bit-portable across math "
    "libraries), so the estimate is exact in both engines: every sum is "
    "BIGINT (< 2^53, exact in double) and the final value is one "
    "correctly-rounded double division. Same repetitiveness/boilerplate "
    "signal, one token shuffle + one per-doc reduce, no collect_list state.",
)
def ns_text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        token_rows(d, ["doc_id"])
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c") * F.col("c")).alias("c2"),
        F.max("c").alias("cmax"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        ((F.col("n_tokens") * F.col("n_tokens")).cast("double") / F.col("c2").cast("double"))
        .alias("inv_simpson"),
        (F.col("cmax").cast("double") / F.col("n_tokens").cast("double"))
        .alias("top_token_mass"),
    )


# Per-group top-k pooling lives with the rest of the grouped rank
# machinery (round 7); re-exported here for the per-language consumers.
from adv_big_data_indexing_spark.operators.advanced import (  # noqa: E402
    grouped_topk as _grouped_topk,
)


@query(
    "ns_text_heavy_hitters",
    oracle=f"""
    WITH tf AS (
      SELECT lang, unnest({DUCK_TOKENS.format(col="text")}) AS w
      FROM documents
    ), c AS (
      SELECT lang, w, count(*) AS freq FROM tf GROUP BY 1, 2
    ), r AS (
      SELECT lang, w AS token, freq,
             row_number() OVER (PARTITION BY lang ORDER BY freq DESC, w) AS rnk
      FROM c
    )
    SELECT lang, token, freq, rnk FROM r WHERE rnk <= 10
    """,
    doc="NS per-language heavy hitters: top-10 tokens per stratum "
    "(vocabulary drift / contamination monitoring). Count shuffles on "
    "(lang, token) with map-side partial aggregation; the top-k then "
    "pools per (lang, slice) before the per-language rank (_grouped_topk)"
    " so no task ever holds a language's full vocabulary — with few "
    "languages a plain per-lang window is one task per language. At "
    "100 TB swap the exact count for a count-min sketch only if the "
    "token vocabulary itself outgrows memory.",
)
def ns_text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        token_rows(d, ["lang"])
        .groupBy("lang", "w")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    top = _grouped_topk(counts, "lang", [F.col("freq").desc(), F.col("w")], 10)
    return top.select(
        "lang", F.col("w").alias("token"), "freq", F.col("rnk").cast("bigint").alias("rnk")
    )


def _grams(toks, n: int):
    """Non-distinct word n-grams (list) from a materialized tokens column."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


_DUCK_GRAMS = (
    "CASE WHEN len({toks}) >= {n} THEN "
    "list_transform(generate_series(1, len({toks}) - {n} + 1), i -> {cat}) "
    "ELSE [] END"
)


def _duck_grams(toks: str, n: int) -> str:
    cat = " || ' ' || ".join(f"{toks}[i+{k}]" for k in range(n))
    return _DUCK_GRAMS.format(toks=toks, n=n, cat=cat)


@query(
    "ns_text_repetition",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS.format(col="text")} AS toks FROM documents),
    tri AS (SELECT doc_id, unnest({_duck_grams("toks", 3)}) AS g FROM t),
    tri_stats AS (
      SELECT doc_id, count(*) AS n_tri, count(DISTINCT g) AS n_tri_distinct
      FROM tri GROUP BY 1
    ),
    bg AS (SELECT doc_id, unnest({_duck_grams("toks", 2)}) AS g FROM t),
    bg_counts AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
    bg_stats AS (SELECT doc_id, max(c) AS max_bg, sum(c) AS n_bg FROM bg_counts GROUP BY 1)
    SELECT d.doc_id,
           COALESCE(n_tri, 0) AS n_tri,
           COALESCE(n_tri_distinct, 0) AS n_tri_distinct,
           CASE WHEN COALESCE(n_tri, 0) > 0
                THEN CAST(n_tri - n_tri_distinct AS DOUBLE) / n_tri
                ELSE 0.0 END AS dup_tri_frac,
           CASE WHEN COALESCE(n_bg, 0) > 0
                THEN CAST(max_bg AS DOUBLE) / n_bg
                ELSE 0.0 END AS top_bigram_frac
    FROM documents d
    LEFT JOIN tri_stats USING (doc_id)
    LEFT JOIN bg_stats USING (doc_id)
    """,
    doc="NS repetition quality signals (Gopher/C4-style): duplicate-trigram "
    "fraction and top-bigram fraction per document — the boilerplate / "
    "template-spam filters every pretraining pipeline runs. Integer counts "
    "+ one correctly-rounded division each, so the oracle matches exactly; "
    "two explode+groupBy passes that shuffle only (doc_id, gram) pairs.",
)
def ns_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    t = d.select("doc_id", tokens("text").alias("toks"))
    # explode_outer + null filter: see ns_text_bigram_freq.
    tri = t.select("doc_id", F.explode_outer(_grams(F.col("toks"), 3)).alias("g")).filter(
        F.col("g").isNotNull()
    )
    tri_stats = tri.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_tri"),
        F.countDistinct("g").cast("bigint").alias("n_tri_distinct"),
    )
    bg = t.select("doc_id", F.explode_outer(_grams(F.col("toks"), 2)).alias("g")).filter(
        F.col("g").isNotNull()
    )
    bg_stats = (
        bg.groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("max_bg"), F.sum("c").cast("bigint").alias("n_bg"))
    )
    base = d.select("doc_id").join(tri_stats, "doc_id", "left").join(bg_stats, "doc_id", "left")
    n_tri = F.coalesce(F.col("n_tri"), F.lit(0))
    return base.select(
        "doc_id",
        n_tri.alias("n_tri"),
        F.coalesce(F.col("n_tri_distinct"), F.lit(0)).alias("n_tri_distinct"),
        F.when(
            n_tri > 0,
            (F.col("n_tri") - F.col("n_tri_distinct")).cast("double") / F.col("n_tri"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_tri_frac"),
        F.when(
            F.coalesce(F.col("n_bg"), F.lit(0)) > 0,
            F.col("max_bg").cast("double") / F.col("n_bg"),
        )
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
    )


TOP_TERMS_K = 5


@query(
    "ns_text_top_terms",
    oracle=f"""
    WITH tf AS (
      SELECT lang, unnest({DUCK_TOKENS.format(col="text")}) AS w
      FROM documents
    ),
    counts AS (SELECT lang, w, count(*) AS freq FROM tf GROUP BY 1, 2)
    SELECT lang, w AS term, freq, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT lang, w, freq,
             row_number() OVER (PARTITION BY lang ORDER BY freq DESC, w) AS rnk
      FROM counts
    )
    WHERE rnk <= {TOP_TERMS_K}
    """,
    doc="NS per-language top terms: the vocabulary profile a corpus report "
    "leads with (and the input to stopword-list induction). One shuffle "
    "to (lang, term) counts with map-side combine, then pooled top-k per "
    "language (_grouped_topk: per-slice rank, keep k, re-rank the k*P "
    "pool) — the ranked set is |vocab|/P rows per task, never a whole "
    "language's vocabulary through one partition. Deterministic "
    "tie-break by term.",
)
def ns_text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    counts = (
        token_rows(d, ["lang"])
        .groupBy("lang", "w")
        .agg(F.count("*").alias("freq"))
    )
    top = _grouped_topk(counts, "lang", [F.col("freq").desc(), F.col("w")], TOP_TERMS_K)
    return top.select("lang", F.col("w").alias("term"), "freq", "rnk")


# --- Inverted-index phrase search ------------------------------------------

SEARCH_PHRASE = "big order scan"
_PHRASE_BIGRAMS = [
    " ".join(SEARCH_PHRASE.split()[i : i + 2])
    for i in range(len(SEARCH_PHRASE.split()) - 1)
]


@query(
    "ns_phrase_search",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {DUCK_TOKENS.format(col="text")} AS toks FROM documents
    ),
    post AS (
      SELECT doc_id, unnest(list_distinct({_duck_grams("toks", 2)})) AS g FROM t
    ),
    cand AS (
      SELECT doc_id FROM post
      WHERE g IN ({", ".join(f"'{b}'" for b in _PHRASE_BIGRAMS)})
      GROUP BY doc_id
      HAVING count(DISTINCT g) = {len(_PHRASE_BIGRAMS)}
    )
    SELECT d.doc_id, d.lang FROM documents d JOIN cand USING (doc_id)
    WHERE contains(' ' || d.text || ' ', ' {SEARCH_PHRASE} ')
    """,
    doc="NS inverted-index phrase search: find documents containing the "
    f"exact token phrase '{SEARCH_PHRASE}'. Candidates come from the word-"
    "bigram posting list (docs holding ALL of the phrase's bigrams — an "
    "equi-join-shaped probe), and only candidates pay the exact adjacency "
    "verify (token-boundary substring match). The index-accelerated "
    "analog of the reference's full-index search (SURVEY §2.B prefix/"
    "conjunctive scans): at 100 TB the posting table is a materialized, "
    "bucketed index — the probe touches two posting lists, never the "
    "corpus scan the LIKE-only oracle formulation implies.",
)
def ns_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toked = d.select("doc_id", tokens("text").alias("toks"))
    post = toked.select(
        "doc_id",
        F.explode_outer(F.array_distinct(_grams(F.col("toks"), 2))).alias("g"),
    ).filter(F.col("g").isin(_PHRASE_BIGRAMS))
    cand = (
        post.groupBy("doc_id")
        .agg(F.countDistinct("g").alias("k"))
        .filter(F.col("k") == len(_PHRASE_BIGRAMS))
        .select("doc_id")
    )
    return (
        d.join(cand, "doc_id", "left_semi")
        .filter(
            F.expr(
                f"contains(concat(' ', text, ' '), ' {SEARCH_PHRASE} ')"
            )
        )
        .select("doc_id", "lang")
    )


@query(
    "ns_text_langid_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {" , ".join(
                 f"len(list_filter({DUCK_TOKENS.format(col='text')}, t -> t IN ({_sql_list(w)}))) AS score_{code}"
                 for code, w in _MARKERS.items()
             )}
      FROM documents
    ),
    pred AS (
      SELECT lang AS actual_lang,
             CASE greatest(score_en, score_es, score_fr, score_de, score_zh)
               WHEN score_de THEN 'de' WHEN score_en THEN 'en' WHEN score_es THEN 'es'
               WHEN score_fr THEN 'fr' WHEN score_zh THEN 'zh' END AS pred_lang
      FROM scored
    )
    SELECT actual_lang, pred_lang,
           count(*) AS n_docs,
           (actual_lang = pred_lang) AS is_correct
    FROM pred GROUP BY 1, 2
    """,
    doc="NS language-ID confusion matrix: (actual, predicted) counts for "
    "the marker-stopword classifier — the QA report that tells you the "
    "classifier's per-language accuracy and WHICH languages it confuses "
    "before you trust it to route a corpus. Composes the langid scorer "
    "with one tiny aggregate; at 100 TB the matrix is |langs|² rows "
    "however big the corpus.",
)
def ns_text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = tokens("text")
    scores = {code: _marker_hits(toks, w) for code, w in _MARKERS.items()}
    best = F.greatest(*scores.values())
    pred = (
        F.when(scores["de"] == best, "de")
        .when(scores["en"] == best, "en")
        .when(scores["es"] == best, "es")
        .when(scores["fr"] == best, "fr")
        .otherwise("zh")
    )
    return (
        d.select(F.col("lang").alias("actual_lang"), pred.alias("pred_lang"))
        .groupBy("actual_lang", "pred_lang")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("is_correct", F.col("actual_lang") == F.col("pred_lang"))
    )


@query(
    "ns_text_token_entropy_exact",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, w, count(*) AS c FROM (
        SELECT doc_id, unnest({DUCK_TOKENS.format(col="text")}) AS w FROM documents
      ) GROUP BY 1, 2
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n,
             count(*) AS n_distinct,
             CAST(sum(c * (length(bin(c*c*c*c)) - 1)) AS BIGINT) AS s
      FROM tf GROUP BY doc_id
    )
    SELECT doc_id,
           n AS n_tokens,
           n_distinct,
           CAST(n * (length(bin(n*n*n*n)) - 1) - s AS BIGINT) AS entropy_q4_num,
           CAST(n * (length(bin(n*n*n*n)) - 1) - s AS DOUBLE) / CAST(4 * n AS DOUBLE)
             AS entropy_q4_bits
    FROM agg
    """,
    doc="NS oracle-backed exact twin of ns_text_token_entropy (VERDICT r3 "
    "item 7): Shannon entropy in bits with every log2 quantized to 1/4 "
    "bit via integer arithmetic — floor(4*log2(x)) = length(bin(x^4))-1, "
    "exact in both engines for x < 2^15.75 (tokens-per-doc bound ~55k; "
    "DuckDB errors loudly on int64 overflow past it). "
    "H_q = [n*ilog(n) - sum(c*ilog(c))] / (4n): the numerator is a pure "
    "BIGINT and the final value one correctly-rounded double division, "
    "so the row hashes bit-identically — the portability the ln() form "
    "cannot offer (JVM Math.log vs libm differ by ulps). Bonus over the "
    "rows-only twin: integer sums commute, so no collect_list canonical "
    "fold order is needed — one token shuffle, one per-doc reduce.",
)
def ns_text_token_entropy_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    def ilog4(c):  # floor(4*log2(c)) for bigint c >= 1, exact
        return (F.length(F.bin(c * c * c * c)) - F.lit(1)).cast("bigint")

    d = spread(load_table(spark, sf_dir, "documents"))
    tf = (
        token_rows(d, ["doc_id"])
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c") * ilog4(F.col("c"))).cast("bigint").alias("s"),
    )
    num = F.col("n") * ilog4(F.col("n")) - F.col("s")
    return agg.select(
        F.col("doc_id"),
        F.col("n").alias("n_tokens"),
        F.col("n_distinct"),
        num.cast("bigint").alias("entropy_q4_num"),
        (num.cast("double") / (F.lit(4) * F.col("n")).cast("double")).alias(
            "entropy_q4_bits"
        ),
    )


_DUCK_BIGRAMS_CTE = f"""
  t AS (SELECT doc_id, {DUCK_TOKENS.format(col="text")} AS toks FROM documents),
  occ AS (
    SELECT doc_id, pair[1] AS w1, pair[1] || ' ' || pair[2] AS bigram
    FROM (
      SELECT doc_id,
             unnest(CASE WHEN len(toks) >= 2 THEN
               list_transform(generate_series(1, len(toks) - 1), i -> [toks[i], toks[i+1]])
             ELSE [] END) AS pair
      FROM t
    )
  ),
  doc_bi AS (
    SELECT doc_id, w1, bigram, count(*) AS n_occ FROM occ GROUP BY 1, 2, 3
  ),
  c_bi AS (SELECT bigram, count(*) AS cb FROM occ GROUP BY 1),
  c_first AS (SELECT w1, count(*) AS cf FROM occ GROUP BY 1)
"""


@query(
    "ns_text_bigram_surprisal",
    oracle=f"""
    WITH {_DUCK_BIGRAMS_CTE}
    SELECT d.doc_id,
           CAST(sum(d.n_occ) AS BIGINT) AS n_bigrams,
           CAST(sum(d.n_occ * ({DUCK_ILOG2_Q4.format(col="f.cf")}
                               - {DUCK_ILOG2_Q4.format(col="b.cb")})) AS BIGINT)
             AS surprisal_q4_sum,
           CAST(sum(d.n_occ * ({DUCK_ILOG2_Q4.format(col="f.cf")}
                               - {DUCK_ILOG2_Q4.format(col="b.cb")})) AS DOUBLE)
             / CAST(4 * sum(d.n_occ) AS DOUBLE) AS avg_surprisal_bits
    FROM doc_bi d
    JOIN c_bi b USING (bigram)
    JOIN c_first f USING (w1)
    GROUP BY d.doc_id
    """,
    doc="NS corpus-statistics surprisal per document — the LM-free "
    "fluency/perplexity proxy: each bigram occurrence costs "
    "log2(count(w1·) / count(w1 w2)) bits, averaged per doc; high values "
    "flag unnatural token sequences (OCR noise, shuffled scrapes), low "
    "values flag boilerplate. Every log2 is the overflow-safe quarter-bit "
    "integer form (functions/exact.py:ilog2_q4 — exact cross-engine to "
    "2^63, so corpus-scale counts are safe), making the whole signal "
    "bit-portable with one final double division. Scale shape: one token "
    "explode feeding three map-side-combined aggregates; the per-doc "
    "frame joins the (distinct-bigram) count tables on their natural "
    "keys — partitioned hash joins that never touch raw text, and ilog "
    "runs on the tiny aggregated frames only.",
)
def ns_text_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from adv_big_data_indexing_spark.functions.exact import ilog2_q4  # noqa: PLC0415

    d = spread(load_table(spark, sf_dir, "documents"))
    toked = d.select("doc_id", tokens("text").alias("toks"))
    occ = (
        toked.select(
            "doc_id",
            F.explode_outer(
                F.when(
                    F.size("toks") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("toks") - 2),
                        lambda i: F.struct(
                            F.element_at("toks", i + 1).alias("w1"),
                            F.concat_ws(
                                " ",
                                F.element_at("toks", i + 1),
                                F.element_at("toks", i + 2),
                            ).alias("bigram"),
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("p"),
        )
        .filter(F.col("p").isNotNull())
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bigram").alias("bigram"))
    )
    doc_bi = occ.groupBy("doc_id", "w1", "bigram").agg(F.count("*").alias("n_occ"))
    c_bi = occ.groupBy("bigram").agg(F.count("*").alias("cb"))
    c_first = occ.groupBy("w1").agg(F.count("*").alias("cf"))
    scored = (
        doc_bi.join(c_bi.select("bigram", ilog2_q4(F.col("cb")).alias("qb")), "bigram")
        .join(c_first.select("w1", ilog2_q4(F.col("cf")).alias("qf")), "w1")
        .select("doc_id", "n_occ", (F.col("n_occ") * (F.col("qf") - F.col("qb"))).alias("bits_q4"))
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("n_occ").cast("bigint").alias("n_bigrams"),
        F.sum("bits_q4").cast("bigint").alias("surprisal_q4_sum"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "surprisal_q4_sum",
        (
            F.col("surprisal_q4_sum").cast("double")
            / (F.lit(4) * F.col("n_bigrams")).cast("double")
        ).alias("avg_surprisal_bits"),
    )


#: context-window chunker: window size / stride in whitespace tokens
CHUNK_W = 64
CHUNK_S = 48  # 16-token overlap between consecutive chunks


@query(
    "ns_doc_chunking",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {DUCK_TOKENS.format(col="text")} AS toks FROM documents
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           CAST(i * {CHUNK_S} AS BIGINT) AS chunk_start,
           CAST(len(toks[i * {CHUNK_S} + 1 : i * {CHUNK_S} + {CHUNK_W}]) AS BIGINT)
             AS n_chunk_tokens,
           array_to_string(toks[i * {CHUNK_S} + 1 : i * {CHUNK_S} + {CHUNK_W}], ' ')
             AS chunk_text
    FROM t CROSS JOIN (SELECT unnest(generate_series(0, 1000)) AS i)
    WHERE i * {CHUNK_S} < len(toks)
    """,
    doc="NS context-window chunking: overlapping token windows "
    f"(W={CHUNK_W}, stride={CHUNK_S}) per document — the training-prep / "
    "retrieval-indexing splitter. Embarrassingly parallel: one tokenize + "
    "one in-row transform + one explode, no shuffle at all (the plan is a "
    "single map stage at any corpus size); chunk boundaries depend only "
    "on the document itself, so the operator composes with any "
    "partitioning. The oracle's bounded generate_series mirrors the "
    "transform exactly (documents cap at 1000 chunks ≈ 48k tokens; "
    "longer docs would raise the bound, not the shape).",
)
def ns_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    toked = d.select("doc_id", tokens("text").alias("toks"))
    n = F.size("toks")
    # greatest(n, 1): tokens('') yields [''] so n >= 1 today, but if toks
    # were ever empty the formula would give n_chunks = 0 and
    # sequence(0, -1) emits the DESCENDING [0, -1] — two bogus chunks where
    # the oracle emits none. The explicit clamp makes the zero-token case
    # produce exactly one empty chunk instead of relying on the tokenizer.
    n_chunks = (
        F.floor((F.greatest(n, F.lit(1)) - F.lit(1)) / F.lit(CHUNK_S)) + F.lit(1)
    ).cast("int")
    chunks = toked.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - F.lit(1)),
                lambda i: F.slice(F.col("toks"), i * CHUNK_S + 1, CHUNK_W),
            )
        ).alias("chunk_idx", "chunk"),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * CHUNK_S).cast("bigint").alias("chunk_start"),
        F.size("chunk").cast("bigint").alias("n_chunk_tokens"),
        F.array_join("chunk", " ").alias("chunk_text"),
    )


PMI_MIN_COUNT = 5
PMI_TOP_K = 30


@query(
    "ns_text_collocations_pmi",
    oracle=f"""
    WITH t AS (SELECT {DUCK_TOKENS.format(col="text")} AS toks FROM documents),
    uni AS (
      SELECT w, CAST(count(*) AS BIGINT) AS cw
      FROM (SELECT unnest(toks) AS w FROM t) WHERE w <> '' GROUP BY w
    ),
    bi AS (
      SELECT bigram, CAST(count(*) AS BIGINT) AS cab
      FROM (
        SELECT unnest(CASE WHEN len(toks) >= 2 THEN
                 list_transform(generate_series(1, len(toks) - 1),
                                i -> toks[i] || ' ' || toks[i+1])
               ELSE [] END) AS bigram
        FROM t
      ) GROUP BY bigram
    ),
    n AS (SELECT CAST(sum(cab) AS BIGINT) AS nb FROM bi),
    scored AS (
      SELECT b.bigram, b.cab, ua.cw AS ca, ub.cw AS cb,
             CAST(({DUCK_ILOG2_Q4.format(col="b.cab")})
                + ({DUCK_ILOG2_Q4.format(col="n.nb")})
                - ({DUCK_ILOG2_Q4.format(col="ua.cw")})
                - ({DUCK_ILOG2_Q4.format(col="ub.cw")}) AS BIGINT) AS pmi_q4
      FROM bi b
      JOIN uni ua ON ua.w = str_split(b.bigram, ' ')[1]
      JOIN uni ub ON ub.w = str_split(b.bigram, ' ')[2]
      CROSS JOIN n
      WHERE b.cab >= {PMI_MIN_COUNT}
    )
    SELECT bigram, cab, ca, cb, pmi_q4 FROM scored
    ORDER BY pmi_q4 DESC, bigram LIMIT {PMI_TOP_K}
    """,
    doc="NS collocation mining: top-30 word bigrams by pointwise mutual "
    "information, PMI = log2(c_ab*N / (c_a*c_b)), computed as the SUM of "
    "quarter-bit integer logs q4(c_ab)+q4(N)-q4(c_a)-q4(c_b) — each term "
    "fits int64 at ANY corpus size (no c_ab*N product, which overflows "
    "past N~3e9), quantization error <= ~1 quarter-bit per term, "
    "bit-identical cross-engine. Min-count 5 gate kills noise pairs. "
    "Shape: token/bigram aggregates (partial map-side), two vocab-sized "
    "equi-joins, one 1-row broadcast total, TakeOrdered(30).",
)
def ns_text_collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from adv_big_data_indexing_spark.functions.exact import ilog2_q4  # noqa: PLC0415

    d = spread(load_table(spark, sf_dir, "documents"))
    toked = d.select(tokens("text").alias("toks"))
    uni = (
        toked.select(F.explode_outer("toks").alias("w"))
        .filter(F.col("w").isNotNull() & (F.col("w") != ""))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("cw"))
    )
    bi = (
        toked.select(
            F.explode_outer(
                F.when(
                    F.size("toks") >= 2,
                    F.transform(
                        F.sequence(F.lit(0), F.size("toks") - 2),
                        lambda i: F.struct(
                            F.element_at("toks", i + 1).alias("w1"),
                            F.element_at("toks", i + 2).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
            ).alias("g")
        )
        .filter(F.col("g").isNotNull())
        .groupBy(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .agg(F.count("*").cast("bigint").alias("cab"))
        # checkpoint the (vocab-bigram-sized) counts once: both N (the
        # unfiltered total) and the thresholded table derive from it, so
        # the corpus-sized explode runs exactly one time
        .transform(consistent_materialize)
    )
    n = bi.agg(F.sum("cab").cast("bigint").alias("nb"))
    bi = bi.filter(F.col("cab") >= PMI_MIN_COUNT)
    scored = (
        bi.join(uni.select(F.col("w").alias("w1"), F.col("cw").alias("ca")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cw").alias("cb")), "w2")
        .crossJoin(F.broadcast(n.select("nb")))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            "cab",
            "ca",
            "cb",
            (
                ilog2_q4(F.col("cab"))
                + ilog2_q4(F.col("nb"))
                - ilog2_q4(F.col("ca"))
                - ilog2_q4(F.col("cb"))
            )
            .cast("bigint")
            .alias("pmi_q4"),
        )
    )
    return scored.orderBy(F.col("pmi_q4").desc(), "bigram").limit(PMI_TOP_K)
