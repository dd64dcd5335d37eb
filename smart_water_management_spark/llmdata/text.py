"""Text-analysis operators over the ``documents`` table (BASELINE.json
extension surface: language-ID, quality scoring, token counting, document
fingerprinting). All JVM-side (split/array HOFs/hash builtins) — no Python
UDFs in the hot path, so the same plans scale to a 100 TB corpus with
ordinary hash aggregates.

Documents here are whitespace-tokenized word soup (see TESTDATA.md); the
tokenizer is a simple split, with a regex variant for punctuation-bearing
corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table

STOPWORDS = ["the", "a", "of", "and", "to"]

# Tiny per-language marker lists for the heuristic language-ID scorer.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(c), " ")


def doc_token_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pinned exploded (doc_id, w) token table shared by x27 and x37.

    One definition so both consumers hit the same ``pin_derived`` cache
    slot; pinned because the explode is the dominant stage and each
    consumer probes it from multiple plan branches.
    """
    from ..sources.catalog import fan_out, pin_derived

    d = fan_out(load_table(spark, sf_dir, "documents"), spark)
    return pin_derived(
        spark,
        sf_dir,
        "doc_tokens",
        lambda: d.select("doc_id", F.explode(tokens("text")).alias("w")),
    )


def _membership(vals: list[str]):
    """Single-arg lambda factory for F.filter (a 2-arg lambda would be
    interpreted as (element, index) by Spark's HOF binding)."""
    return lambda w: w.isin(vals)


def quality_expr(tk: Column) -> Column:
    """x02's banded quality score (length band + stopword ratio + lexical
    diversity) as a reusable Column — the single definition consumed by
    x02 and by the quality-aware dedup policy (x32), so the banding
    constants cannot drift between them."""
    n_tokens = F.size(tk)
    stop_ratio = F.size(F.filter(tk, _membership(STOPWORDS))).cast("double") / n_tokens
    ttr = F.size(F.array_distinct(tk)).cast("double") / n_tokens
    return (
        F.when(n_tokens.between(20, 200), 0.5).otherwise(0.2)
        + F.when(stop_ratio.between(0.05, 0.4), 0.3).otherwise(0.1)
        + F.when(ttr > 0.3, 0.2).otherwise(0.05)
    )


def sql_quality_expr(n_tokens: str, n_stop: str, n_distinct: str) -> str:
    """DuckDB twin of ``quality_expr`` over SQL count expressions."""
    return (
        f"(CASE WHEN {n_tokens} BETWEEN 20 AND 200 THEN 0.5e0 ELSE 0.2e0 END\n"
        f"            + CASE WHEN CAST({n_stop} AS DOUBLE) / {n_tokens}"
        f" BETWEEN 0.05 AND 0.4\n"
        f"                   THEN 0.3e0 ELSE 0.1e0 END\n"
        f"            + CASE WHEN CAST({n_distinct} AS DOUBLE) / {n_tokens} > 0.3\n"
        f"                   THEN 0.2e0 ELSE 0.05e0 END)"
    )


def bag_fp_expr(text_col: str = "text") -> Column:
    """x04's order-insensitive bag-of-words fingerprint (shared with x32)."""
    return F.md5(F.concat_ws(" ", F.sort_array(tokens(text_col))))


@register(
    "x01_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(lower(text), ' ')) AS n_tokens,
           len(list_distinct(string_split(lower(text), ' '))) AS n_distinct_tokens,
           length(text) AS n_chars,
           CAST(length(text) AS DOUBLE) / len(string_split(lower(text), ' ')) AS avg_token_len,
           CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
             / len(string_split(lower(text), ' ')) AS ttr
    FROM documents
    """,
    doc="token counting: counts, distinct, type-token ratio — all JVM-side",
)
def x01_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tk = tokens("text")
    return d.select(
        "doc_id",
        F.size(tk).alias("n_tokens"),
        F.size(F.array_distinct(tk)).alias("n_distinct_tokens"),
        F.length("text").alias("n_chars"),
        (F.length("text").cast("double") / F.size(tk)).alias("avg_token_len"),
        (F.size(F.array_distinct(tk)).cast("double") / F.size(tk)).alias("ttr"),
    )


@register(
    "x02_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             len(string_split(lower(text), ' ')) AS n_tokens,
             len(list_filter(string_split(lower(text), ' '),
                 w -> w IN ({", ".join(f"'{w}'" for w in STOPWORDS)}))) AS n_stop,
             len(list_distinct(string_split(lower(text), ' '))) AS n_distinct
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(n_stop AS DOUBLE) / n_tokens AS stopword_ratio,
           CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
           {sql_quality_expr("n_tokens", "n_stop", "n_distinct")} AS quality_score
    FROM t
    """,
    doc="quality scoring: length band + stopword ratio + lexical diversity",
)
def x02_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tk = tokens("text")
    n_tokens = F.size(tk)
    n_stop = F.size(F.filter(tk, lambda w: w.isin(STOPWORDS)))
    n_distinct = F.size(F.array_distinct(tk))
    stop_ratio = n_stop.cast("double") / n_tokens
    ttr = n_distinct.cast("double") / n_tokens
    return d.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        stop_ratio.alias("stopword_ratio"),
        ttr.alias("ttr"),
        quality_expr(tk).alias("quality_score"),
    )


@register(
    "x03_language_id",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang AS actual_lang,
             {", ".join(
                 "len(list_filter(string_split(lower(text), ' '), w -> w IN ("
                 + ", ".join(f"'{m}'" for m in ms)
                 + f"))) AS score_{lg}"
                 for lg, ms in LANG_MARKERS.items()
             )}
      FROM documents
    )
    SELECT doc_id, actual_lang,
           CASE WHEN score_en >= score_fr AND score_en >= score_de THEN 'en'
                WHEN score_fr >= score_de THEN 'fr'
                ELSE 'de' END AS predicted_lang,
           GREATEST(score_en, score_fr, score_de) AS marker_hits
    FROM scores
    """,
    doc="language-ID: stopword-marker overlap heuristic (argmax over languages)",
)
def x03_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tk = tokens("text")
    scores = d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[
            F.size(F.filter(tk, _membership(ms))).alias(f"score_{lg}")
            for lg, ms in LANG_MARKERS.items()
        ],
    )
    predicted = (
        F.when(
            (F.col("score_en") >= F.col("score_fr"))
            & (F.col("score_en") >= F.col("score_de")),
            "en",
        )
        .when(F.col("score_fr") >= F.col("score_de"), "fr")
        .otherwise("de")
    )
    return scores.select(
        "doc_id",
        "actual_lang",
        predicted.alias("predicted_lang"),
        F.greatest("score_en", "score_fr", "score_de").alias("marker_hits"),
    )


@register(
    "x04_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(text) AS exact_fp,
           md5(array_to_string(list_sort(string_split(lower(text), ' ')), ' '))
             AS bag_fp
    FROM documents
    """,
    doc="document fingerprinting: exact md5 + order-insensitive bag-of-words md5",
)
def x04_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("exact_fp"),
        bag_fp_expr().alias("bag_fp"),
    )


@register(
    "x18_tfidf_keywords",
    oracle="""
    WITH N AS (SELECT COUNT(*) AS n FROM documents),
    tf AS (
      SELECT doc_id, t.term, COUNT(*) AS tf
      FROM documents, UNNEST(string_split(lower(text), ' ')) AS t(term)
      GROUP BY doc_id, t.term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    weighted AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * (ln((N.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN N
    )
    SELECT doc_id, term, tfidf FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
      FROM weighted
    ) WHERE rn <= 3
    """,
    doc="TF-IDF keyword extraction as pure DataFrame algebra (SURVEY §4.3.7): "
    "token explode → TF → document-frequency join → smoothed idf → top-3 "
    "terms per doc. Two shuffles total (term agg + window); the DF side is "
    "a small dimension at any corpus size and broadcasts",
)
def x18_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..sources.catalog import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"), spark)
    n_docs = docs.count()  # one cheap action; a literal beats a cross join
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    weighted = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        weighted.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@register(
    "x20_pii_scrub",
    oracle="""
    WITH dirty AS (
      SELECT doc_id,
             text || ' contact user' || doc_id || '@example.com or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                            '<EMAIL>', 'g'),
             '\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean_text,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(text, '\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}'))
             AS n_phones
    FROM dirty
    """,
    doc="PII scrubbing: email/phone redaction via regexp_replace with "
    "per-doc redaction counts — the training-data cleaning stage, pure "
    "JVM regex (no UDF), one scan",
)
def x20_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic PII is injected deterministically (fake email + phone per
    doc) so the scrubber has known targets; both engines inject and scrub
    with identical patterns, proving exact redaction parity."""
    d = load_table(spark, sf_dir, "documents")
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    dirty = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return dirty.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ).alias("clean_text"),
        F.size(F.regexp_extract_all("text", F.lit(email_re), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("text", F.lit(phone_re), F.lit(0))).alias(
            "n_phones"
        ),
    )


# GPT-2-style pretokenizer (simplified, apostrophe branch dropped — the
# corpus has none and SQL quoting differs): letter runs, digit runs,
# punctuation runs, each optionally space-prefixed, then bare spaces.
# Both engines' regex dialects (Java, RE2) agree on this subset —
# leftmost-first alternation, identical character classes.
BPE_PRETOKEN_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+| +"


@register(
    "x26_regex_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{BPE_PRETOKEN_RE}'))
                AS INT) AS n_pretokens,
           CAST(len(string_split(lower(text), ' ')) AS INT) AS n_ws_tokens,
           ROUND(CAST(len(regexp_extract_all(lower(text), '{BPE_PRETOKEN_RE}'))
                      AS DOUBLE)
                 / len(string_split(lower(text), ' ')), 6) AS pretokens_per_word
    FROM documents
    """,
    doc="BPE-ish regex pretokenizer counts vs whitespace tokens (the "
    "pretoken/word ratio approximates tokenizer fertility for data "
    "budgeting) — JVM regex, one scan, no UDF",
)
def x26_regex_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    n_pre = F.size(F.regexp_extract_all(low, F.lit(BPE_PRETOKEN_RE), F.lit(0)))
    n_ws = F.size(F.split(low, " "))
    return d.select(
        "doc_id",
        n_pre.alias("n_pretokens"),
        n_ws.alias("n_ws_tokens"),
        F.round(n_pre.cast("double") / n_ws, 6).alias("pretokens_per_word"),
    )


# The unigram-LM per-token scoring CTE, shared verbatim by the x27 and
# x56 oracles so the two can never drift. Determinism: -ln(cnt/total) is
# rounded to 6 decimals PER TOKEN and cast to DECIMAL(27,6) before the
# per-doc sum, so the aggregation is exact and order-independent; both
# engines' ln agree far below the rounding grain. The final division/exp
# run on identical doubles.
UNIGRAM_SCORED_SQL = """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    scored AS (
      SELECT t.doc_id,
             CAST(ROUND(-LN(CAST(cnt AS DOUBLE) / total), 6)
                  AS DECIMAL(27,6)) AS nl
      FROM tok t JOIN vocab USING (w) CROSS JOIN tot
    )
"""


def unigram_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token negative log-likelihood under the corpus unigram LM —
    (doc_id, nl DECIMAL(27,6)) rows, the shared scoring stage of x27
    (per-doc perplexity) and x56 (perplexity-bucket filtering)."""
    # pinned: the exploded token table is both the vocab-count input and
    # the scoring join's probe side — unpinned, the dominant explode
    # stage executes twice per invocation
    tok = doc_token_table(spark, sf_dir)
    vocab = tok.groupBy("w").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    nl = F.round(
        -F.log(F.col("cnt").cast("double") / F.col("total")), 6
    ).cast("decimal(27,6)")
    return (
        tok.join(vocab, "w")
        .crossJoin(F.broadcast(total))
        .select("doc_id", nl.alias("nl"))
    )


@register(
    "x27_unigram_logppl",
    oracle=UNIGRAM_SCORED_SQL
    + """
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           ROUND(CAST(SUM(nl) AS DOUBLE) / COUNT(*), 6) AS cross_entropy,
           ROUND(EXP(CAST(SUM(nl) AS DOUBLE) / COUNT(*)), 4) AS ppl
    FROM scored GROUP BY doc_id
    """,
    doc="unigram-LM perplexity quality score (CCNet-style): corpus token "
    "counts form the LM, each doc scored by mean negative log-likelihood "
    "of its tokens. Three hash shuffles at any corpus size (vocab count, "
    "token<->vocab join on the token, per-doc reduce) — the classic "
    "word-count shape, never all-pairs; the 1-row total broadcasts",
)
def x27_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Optimization-round A/B note (r11): a (doc_id, w, tf) pre-aggregation
    # before the vocab join — "aggregate before you shuffle" — measured
    # SLOWER (min-of-6 interleaved: 0.90 s → 1.04 s plain, 1.31 s with an
    # explicit doc_id repartition) because the vocab join broadcasts and
    # the final per-doc groupBy's map-side partial aggregation already
    # collapses token rows before the only real exchange; the extra
    # full-width hash-agg pass buys nothing. Kept in the word-count shape.
    scored = unigram_scored(spark, sf_dir)
    ce = F.sum("nl").cast("double") / F.count("*")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.round(ce, 6).alias("cross_entropy"),
        F.round(F.exp(ce), 4).alias("ppl"),
    )


CONTEXT_LEN = 512  # packing target (tokens per training sequence)


@register(
    "x34_packing_yield",
    # Concatenative packing lower bound: ceil(total_tokens / context) bins
    # per source; oversized docs contribute their overflow as dedicated
    # full bins plus a remainder. All-integer arithmetic, so the yield
    # ratio is the only float and it derives from exact counts.
    oracle=f"""
    WITH t AS (
      SELECT source,
             len(string_split(lower(text), ' ')) AS n_tok
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(CEIL(CAST(SUM(n_tok) AS DOUBLE) / {CONTEXT_LEN}) AS BIGINT)
             AS n_sequences,
           ROUND(CAST(SUM(n_tok) AS DOUBLE)
                 / (CEIL(CAST(SUM(n_tok) AS DOUBLE) / {CONTEXT_LEN})
                    * {CONTEXT_LEN}), 6) AS packing_yield
    FROM t GROUP BY source
    """,
    doc=f"sequence-packing yield per source: token totals vs the "
    f"{CONTEXT_LEN}-token training sequences needed under concatenative "
    "packing — the padding-waste estimate that sizes a training run's "
    "data budget. One scan + one tiny aggregate, counts are exact "
    "integers at any corpus size",
)
def x34_packing_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.size(tokens("text"))
    total = F.sum(n_tok)
    n_seq = F.ceil(total.cast("double") / CONTEXT_LEN)
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        total.alias("total_tokens"),
        n_seq.alias("n_sequences"),
        F.round(
            total.cast("double") / (n_seq * CONTEXT_LEN), 6
        ).alias("packing_yield"),
    )


# --- x42: BPE training bootstrap — corpus-global adjacent-pair counts --------

MERGE_TOP_N = 20


@register(
    "x42_bpe_first_merges",
    oracle=f"""
    WITH toks AS (
      SELECT string_split(lower(text), ' ') AS tk FROM documents
    ),
    pairs AS (
      SELECT unnest(list_transform(range(1, len(tk)),
               i -> tk[i] || ' ' || tk[i+1])) AS pair
      FROM toks
    ),
    counted AS (SELECT pair, COUNT(*) AS cnt FROM pairs GROUP BY pair)
    SELECT pair, cnt, rn FROM (
      SELECT pair, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rn
      FROM counted
    ) WHERE rn <= {MERGE_TOP_N}
    """,
    doc=f"BPE-training bootstrap: corpus-global adjacent-token-pair "
    f"frequencies, top {MERGE_TOP_N} with deterministic tie-break — the "
    "merge-candidate scan a distributed tokenizer trainer runs per "
    "iteration. Explode + hash agg (map-combined partials) + "
    "TakeOrderedAndProject: the word-count shape, never all-pairs",
)
def x42_bpe_first_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark).withColumn(
        "tk", tokens("text")
    )
    pair_list = (
        "CASE WHEN size(tk) >= 2 THEN "
        "transform(sequence(1, size(tk) - 1), "
        "i -> concat(element_at(tk, CAST(i AS INT)), ' ', "
        "element_at(tk, CAST(i + 1 AS INT)))) "
        "ELSE array() END"
    )
    counted = (
        d.select(F.explode(F.expr(pair_list)).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("cnt"))
    )
    # top-N via orderBy+limit (TakeOrderedAndProject: per-partition heaps,
    # no global sort) — the rank window then runs over N rows, not the
    # full pair table
    top = counted.orderBy(F.desc("cnt"), F.asc("pair")).limit(MERGE_TOP_N)
    w = W.orderBy(F.desc("cnt"), F.asc("pair"))
    return top.withColumn("rn", F.row_number().over(w))


# --- x43: feature hashing (hashing-trick text vectors) -----------------------

HASH_DIM = 16


@register(
    "x43_feature_hashing",
    # bucket = md5-derived so both engines hash identically; emitted as
    # (doc_id, bucket, tf) rows — the sparse form a downstream assembler
    # densifies — rather than engine-specific array types.
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                % {HASH_DIM} AS BIGINT) AS bucket,
           COUNT(*) AS tf
    FROM tok
    GROUP BY 1, 2
    """,
    doc=f"feature hashing (hashing trick): tokens folded into {HASH_DIM} "
    "md5-derived buckets with term frequencies — the engine-side bridge "
    "from raw text to the fixed-width vectors the similarity operators "
    "consume, with no vocabulary table to build or broadcast. Explode + "
    "one hash agg; dimensionality is a constant, not corpus-dependent",
)
def x43_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = doc_token_table(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % HASH_DIM
    )
    return tok.groupBy("doc_id", bucket.alias("bucket")).agg(
        F.count("*").alias("tf")
    )


# --- x46: count-min sketch heavy hitters ------------------------------------

# Sketch geometry. d×w counters replace the full word-count table: at
# 100 TB the exact vocabulary is billions of rows, while the sketch is a
# constant 4×512 grid that merges with SUM (re-aggregatable across
# partitions, days, and corpus shards — the same property a17 exploits
# for HLL). Overestimation bound: est - true <= e/w * N with prob 1-e^-d.
CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOPK = 10


def _cms_bucket(word, seed: int):
    """Row-``seed``'s bucket for ``word``: md5-derived (the one hash both
    engines share), 6 hex chars = 24 bits so no sign/overflow path."""
    w = F.col(word) if isinstance(word, str) else word
    md = F.md5(F.concat(F.lit(f"{seed}|"), w))
    return (F.conv(F.substring(md, 1, 6), 16, 10).cast("long") % CMS_WIDTH)


def _sql_cms_bucket(word: str, seed: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('{seed}|' || {word}), 1, 6)) AS BIGINT)"
        f" % {CMS_WIDTH}"
    )


def _x46_oracle() -> str:
    """The count-min grid + top-k probe oracle — shared verbatim by the
    batch sketch (x46) and its incrementally-maintained streaming twin
    (t20), the same single-oracle pattern as a24/t14."""
    return f"""
    WITH wc AS (
      SELECT w, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
      ) GROUP BY w
    ), counters AS (
      SELECT s.seed,
             CASE s.seed {" ".join(f"WHEN {d} THEN {_sql_cms_bucket('w', d)}" for d in range(CMS_DEPTH))} END AS bucket,
             CAST(SUM(cnt) AS BIGINT) AS counter
      FROM wc CROSS JOIN (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS seed) s
      GROUP BY 1, 2
    ), top AS (
      SELECT w, cnt FROM wc ORDER BY cnt DESC, w LIMIT {CMS_TOPK}
    )
    SELECT top.w AS word,
           top.cnt AS true_count,
           MIN(c.counter) AS cms_estimate,
           MIN(c.counter) - top.cnt AS overestimate
    FROM top
    CROSS JOIN (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS seed) s
    JOIN counters c
      ON c.seed = s.seed
     AND c.bucket = CASE s.seed {" ".join(f"WHEN {d} THEN {_sql_cms_bucket('top.w', d)}" for d in range(CMS_DEPTH))} END
    GROUP BY 1, 2
    """


@register(
    "x46_countmin_heavy_hitters",
    oracle=_x46_oracle(),
    doc=f"count-min sketch heavy hitters: a {CMS_DEPTH}x{CMS_WIDTH} "
    "md5-bucketed counter grid (built by SUM — re-aggregatable across "
    "corpus shards like a17's HLL sketches) probed for the top-"
    f"{CMS_TOPK} true words; emits true vs estimated counts and the "
    "non-negative CMS overestimate. Word counts are one map-combined "
    "shuffle; the grid and probe set are constant-size at any corpus "
    "scale",
)
def x46_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    wc = (
        doc_token_table(spark, sf_dir)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    seeds = spark.range(CMS_DEPTH).select(F.col("id").cast("int").alias("seed"))
    # counters: D rows per DISTINCT word (never per occurrence — the
    # explode already collapsed through the map-combined count above)
    counters = (
        wc.crossJoin(F.broadcast(seeds))
        .select(
            "seed",
            _cms_seeded_bucket("w").alias("bucket"),
            "cnt",
        )
        .groupBy("seed", "bucket")
        .agg(F.sum("cnt").alias("counter"))
    )
    top = wc.orderBy(F.desc("cnt"), F.asc("w")).limit(CMS_TOPK)
    probes = top.crossJoin(F.broadcast(seeds)).select(
        "w", "cnt", "seed", _cms_seeded_bucket("w").alias("bucket")
    )
    return (
        probes.join(F.broadcast(counters), ["seed", "bucket"])
        .groupBy("w", "cnt")
        .agg(F.min("counter").alias("cms_estimate"))
        .select(
            F.col("w").alias("word"),
            F.col("cnt").alias("true_count"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("cnt")).alias("overestimate"),
        )
    )


def _cms_seeded_bucket(word: str):
    """Bucket under the row's own ``seed`` column (chained whens — the
    Spark twin of the oracle's CASE seed WHEN ...)."""
    expr = F.lit(None).cast("long")
    for d in range(CMS_DEPTH):
        expr = F.when(F.col("seed") == d, _cms_bucket(word, d)).otherwise(expr)
    return expr


# --- x50: bigram next-word model --------------------------------------------

BIGRAM_TOPK = 3


@register(
    "x50_bigram_nextword",
    oracle=f"""
    WITH bg AS (
      SELECT unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
      FROM (SELECT string_split(lower(text), ' ') AS tk FROM documents)
    ), cnt AS (
      SELECT w1, w2, COUNT(*) AS pair_n FROM bg GROUP BY 1, 2
    ), tot AS (
      SELECT w1, CAST(SUM(pair_n) AS BIGINT) AS head_n FROM cnt GROUP BY 1
    )
    SELECT w1, w2, pair_n, head_n,
           ROUND(CAST(pair_n AS DOUBLE) / head_n, 6) AS p_next, rn
    FROM (
      SELECT cnt.w1, w2, pair_n, head_n,
             ROW_NUMBER() OVER (PARTITION BY cnt.w1
                                ORDER BY pair_n DESC, w2) AS rn
      FROM cnt JOIN tot ON cnt.w1 = tot.w1
    ) WHERE rn <= {BIGRAM_TOPK}
    """,
    doc=f"bigram next-word model: adjacent-token pairs via an index "
    "transform over the token array (no self-join — successors come from "
    "the SAME row's array), conditional P(w2|w1) and the top-"
    f"{BIGRAM_TOPK} continuations per head word. The n-gram LM companion "
    "to x27's unigram perplexity; pair counts are one map-combined "
    "shuffle, the per-head window runs over vocabulary-sized data",
)
def x50_bigram_nextword(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark)
    pairs = (
        d.select(tokens("text").alias("tk"))
        .select(
            F.explode(
                F.expr(
                    "transform(slice(tk, 1, size(tk)-1), "
                    "(w, i) -> struct(w AS w1, tk[i+1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    cnt = pairs.groupBy("w1", "w2").agg(F.count("*").alias("pair_n"))
    tot = cnt.groupBy("w1").agg(F.sum("pair_n").alias("head_n"))
    w = W.partitionBy("w1").orderBy(F.desc("pair_n"), F.asc("w2"))
    return (
        cnt.join(tot, "w1")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= BIGRAM_TOPK)
        .select(
            "w1",
            "w2",
            "pair_n",
            "head_n",
            F.round(F.col("pair_n").cast("double") / F.col("head_n"), 6).alias(
                "p_next"
            ),
            "rn",
        )
    )


# --- x51: Zipf rank-frequency fit -------------------------------------------


@register(
    "x51_zipf_fit",
    # Transcendental ln() may differ between engines in the final ulp;
    # the DECIMAL(38,6) moment casts and ROUND(,6) outputs absorb that
    # (x24's pattern) — a 1-ulp input difference only surfaces if a value
    # sits within ~1e-16 of a 6-decimal rounding boundary.
    oracle="""
    WITH wc AS (
      SELECT w, COUNT(*) AS cnt FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
      ) GROUP BY w
    ), xy AS (
      SELECT ln(ROW_NUMBER() OVER (ORDER BY cnt DESC, w)) AS x,
             ln(CAST(cnt AS DOUBLE)) AS y
      FROM wc
    ), m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x*x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y*y AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x*y AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n_vocab,
           ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS zipf_slope,
           ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
             AS log_intercept,
           ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                 / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
    FROM m
    """,
    doc="Zipf rank-frequency fit: OLS of ln(freq) on ln(rank) over the "
    "vocabulary (slope ~ -1 for natural corpora; a collapsed or "
    "templated corpus shows up as a flat or cliff-shaped curve). Word "
    "counts are one map-combined shuffle; the regression runs on "
    "vocabulary-sized data via m06's exact-decimal closed form. The "
    "vocabulary-health companion to x27 (unigram LM) and x45 (drift)",
)
def x51_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dsum

    wc = (
        doc_token_table(spark, sf_dir)
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    # global rank over vocabulary-sized data: single-partition window is
    # deliberate (the corpus-sized explode was already reduced above)
    xy = wc.select(
        F.log(F.row_number().over(W.orderBy(F.desc("cnt"), F.asc("w"))).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    m = xy.agg(
        F.count("*").cast("double").alias("n"),
        dsum("x", 38).alias("sx"),
        dsum("y", 38).alias("sy"),
        dsum(F.col("x") * F.col("x"), 38).alias("sxx"),
        dsum(F.col("y") * F.col("y"), 38).alias("syy"),
        dsum(F.col("x") * F.col("y"), 38).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        n.cast("bigint").alias("n_vocab"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("log_intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r2"),
    )


# --- x55: greedy merge-table application (BPE encode step) -------------------


def apply_merges(toks: list, merges: list) -> list:
    """Reference greedy BPE application: for each merge (a, b) in priority
    order, fuse every non-overlapping adjacent occurrence left-to-right.
    Pure function shared by the Spark UDF and the tests' naive oracle."""
    for a, b in merges:
        out = []
        i = 0
        n = len(toks)
        while i < n:
            if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                out.append(a + " " + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


@register(
    "x55_bpe_apply",
    oracle=None,  # iterative merge application is not SQL-expressible;
    # exactness is asserted in tests against a pure-Python oracle
    doc=f"BPE encode step: the top-{MERGE_TOP_N} merge rules learned by "
    "x42 applied greedily (priority order, left-to-right) to every "
    "document via an Arrow-batched mapInPandas pass — the distributed "
    "tokenizer-application shape. The merge table is a bounded driver "
    "collect (N rules, constant at any corpus size) broadcast to "
    "executors; per-doc work is linear in tokens x rules. Emits "
    "before/after token counts and the realized compression ratio",
)
def x55_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    # bounded: MERGE_TOP_N rows (the learned merge table)
    merge_rows = x42_bpe_first_merges(spark, sf_dir).orderBy("rn").collect()
    merges = [tuple(r["pair"].split(" ", 1)) for r in merge_rows]
    bm = spark.sparkContext.broadcast(merges)

    def encode(batches):
        ms = bm.value
        for pdf in batches:
            before, after = [], []
            for text in pdf["text"]:
                toks = text.lower().split(" ")
                enc = apply_merges(toks, ms)
                before.append(len(toks))
                after.append(len(enc))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_tokens_before": before,
                    "n_tokens_after": after,
                }
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    enc = d.mapInPandas(
        encode, "doc_id long, n_tokens_before int, n_tokens_after int"
    )
    return enc.select(
        "doc_id",
        "n_tokens_before",
        "n_tokens_after",
        F.round(
            F.col("n_tokens_after").cast("double") / F.col("n_tokens_before"), 6
        ).alias("compression"),
    )


# --- x57: Heaps'-law vocabulary-growth fit -----------------------------------


@register(
    "x57_heaps_fit",
    # Same transcendental-determinism posture as x51: per-point ln values
    # are cast to DECIMAL(38,6) inside the moment sums, so the regression
    # inputs are order-independent and ulp-immune on both engines.
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    firsts AS (SELECT w, MIN(doc_id) AS first_doc FROM tok GROUP BY w),
    per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tok,
             COUNT(DISTINCT f.w) AS n_new
      FROM tok t LEFT JOIN firsts f
        ON t.w = f.w AND f.first_doc = t.doc_id
      GROUP BY t.doc_id
    ),
    cum AS (
      SELECT ln(CAST(SUM(n_tok) OVER (ORDER BY doc_id) AS DOUBLE)) AS x,
             ln(CAST(SUM(n_new) OVER (ORDER BY doc_id) AS DOUBLE)) AS y
      FROM per_doc
    ),
    m AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x*x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y*y AS DECIMAL(38,6))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x*y AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM cum
    )
    SELECT CAST(n AS BIGINT) AS n_points,
           ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS heaps_beta,
           ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6)
             AS heaps_logk,
           ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy))
                 / ((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2
    FROM m
    """,
    doc="Heaps'-law vocabulary-growth fit: V(n) ~ K*n^beta over the "
    "document stream in doc_id order — each word charged to its FIRST "
    "document (one min-agg per word, no running distinct state), so the "
    "cumulative vocabulary curve falls out of two prefix sums over "
    "doc-count-sized data. beta well below 1 means vocabulary saturates "
    "(natural text); beta near 1 flags ID-like or templated token soup. "
    "The corpus-growth companion to x51 (Zipf) for corpus-health audits; "
    "the token explode + word min-agg is the word-count shape at any "
    "scale, and the regression reuses m06's exact-decimal closed form",
)
def x57_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dsum

    tok = doc_token_table(spark, sf_dir)
    firsts = (
        tok.groupBy("w")
        .agg(F.min("doc_id").alias("first_doc"))
        .select(F.col("w").alias("fw"), "first_doc")
    )
    per_doc = (
        tok.join(
            firsts,
            (F.col("w") == F.col("fw")) & (F.col("first_doc") == F.col("doc_id")),
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.countDistinct("fw").alias("n_new"),
        )
    )
    # prefix sums over doc-count-sized data: the corpus explode was
    # already reduced, so the single-partition window is deliberate
    # (x51's pattern)
    wc = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_doc.select(
        F.log(F.sum("n_tok").over(wc).cast("double")).alias("x"),
        F.log(F.sum("n_new").over(wc).cast("double")).alias("y"),
    )
    m = cum.agg(
        F.count("*").cast("double").alias("n"),
        dsum("x", 38).alias("sx"),
        dsum("y", 38).alias("sy"),
        dsum(F.col("x") * F.col("x"), 38).alias("sxx"),
        dsum(F.col("y") * F.col("y"), 38).alias("syy"),
        dsum(F.col("x") * F.col("y"), 38).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    r2 = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    ) / (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.select(
        F.col("n").cast("bigint").alias("n_points"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "heaps_logk"
        ),
        F.round(r2, 6).alias("r2"),
    )


# --- x58: tokenizer-vocabulary coverage (OOV audit) --------------------------

VOCAB_N = 200  # fixed vocabulary budget (top-N corpus words)


@register(
    "x58_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w FROM (
        SELECT w, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, w) AS rk
        FROM tok GROUP BY w
      ) WHERE rk <= {VOCAB_N}
    ),
    flagged AS (
      SELECT d.source, t.w, (v.w IS NULL) AS oov
      FROM tok t
      JOIN documents d USING (doc_id)
      LEFT JOIN vocab v ON t.w = v.w
    )
    SELECT source,
           COUNT(*) AS n_tokens,
           CAST(COUNT(CASE WHEN oov THEN 1 END) AS BIGINT) AS n_oov,
           ROUND(CAST(COUNT(CASE WHEN oov THEN 1 END) AS DOUBLE)
                 / COUNT(*), 6) AS oov_rate
    FROM flagged GROUP BY source
    """,
    doc=f"tokenizer-vocabulary coverage: fix the top-{VOCAB_N} corpus "
    "words as the vocabulary and report per-source out-of-vocabulary "
    "token rates — the audit run before freezing a tokenizer, since a "
    "source with a high OOV rate will fragment into byte-fallback "
    "tokens and blow up its effective sequence length. Word-count "
    "shuffle to build the vocab, then a broadcast (vocab is "
    "constant-sized) left join over the token stream — no second "
    "corpus-wide shuffle",
)
def x58_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = doc_token_table(spark, sf_dir)
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("w"))
        .limit(VOCAB_N)
        .select(F.col("w").alias("vw"))
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    flagged = (
        tok.join(src, "doc_id")
        .join(F.broadcast(vocab), F.col("w") == F.col("vw"), "left")
        .select("source", F.col("vw").isNull().alias("oov"))
    )
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_tokens"),
        F.count(F.when(F.col("oov"), 1)).alias("n_oov"),
        F.round(
            F.count(F.when(F.col("oov"), 1)).cast("double") / F.count("*"), 6
        ).alias("oov_rate"),
    )


# --- x62: interpolated bigram-LM perplexity ----------------------------------

BIGRAM_LAMBDA = 0.7  # interpolation weight on the bigram term


@register(
    "x62_bigram_logppl",
    # Same determinism posture as x27: the interpolated probability is
    # computed from exact integer counts on both engines, -ln rounded to
    # 6 decimals PER POSITION and decimal-summed, so the per-doc reduce
    # is order-independent and engine-exact.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
    ),
    uni AS (
      SELECT w, COUNT(*) AS ucnt FROM (
        SELECT unnest(tk) AS w FROM toks
      ) GROUP BY w
    ),
    tot AS (SELECT CAST(SUM(ucnt) AS BIGINT) AS total FROM uni),
    bi_pos AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
             unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
      FROM toks
    ),
    bi AS (SELECT w1, w2, COUNT(*) AS bcnt FROM bi_pos GROUP BY w1, w2),
    scored AS (
      SELECT p.doc_id,
             CAST(ROUND(-LN(
               {BIGRAM_LAMBDA} * (CAST(b.bcnt AS DOUBLE) / u1.ucnt)
               + {1 - BIGRAM_LAMBDA} * (CAST(u2.ucnt AS DOUBLE) / t.total)
             ), 6) AS DECIMAL(27,6)) AS nl
      FROM bi_pos p
      JOIN bi b ON p.w1 = b.w1 AND p.w2 = b.w2
      JOIN uni u1 ON p.w1 = u1.w
      JOIN uni u2 ON p.w2 = u2.w
      CROSS JOIN tot t
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(nl) AS DOUBLE) / COUNT(*), 6) AS cross_entropy,
           ROUND(EXP(CAST(SUM(nl) AS DOUBLE) / COUNT(*)), 4) AS ppl
    FROM scored GROUP BY doc_id
    """,
    doc=f"interpolated bigram-LM perplexity: p = {BIGRAM_LAMBDA}*p(w2|w1) "
    f"+ {round(1-BIGRAM_LAMBDA, 2)}*p(w2) scored per bigram position — "
    "the stronger fluency signal x27's unigram score cannot give "
    "(word-salad docs look fine to a unigram LM). Count tables are "
    "word-count-shaped shuffles; scoring joins hash-partition on the "
    "bigram/word keys; interpolation means no zero-probability "
    "positions, so no smoothing state beyond the two count tables",
)
def x62_bigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import fan_out, pin_derived

    d = fan_out(load_table(spark, sf_dir, "documents"), spark).withColumn(
        "tk", tokens("text")
    )
    pos_expr = (
        "CASE WHEN size(tk) >= 2 THEN "
        "transform(sequence(1, size(tk) - 1), "
        "i -> struct(element_at(tk, CAST(i AS INT)) AS w1, "
        "element_at(tk, CAST(i + 1 AS INT)) AS w2)) "
        "ELSE array() END"
    )
    # pinned: the bigram-position table feeds both the count build and
    # the scoring probe (x27's pattern for the token table)
    bi_pos = pin_derived(
        spark,
        sf_dir,
        "doc_bigram_positions",
        lambda: d.select(
            "doc_id", F.explode(F.expr(pos_expr)).alias("p")
        ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")),
    )
    uni = doc_token_table(spark, sf_dir).groupBy("w").agg(
        F.count("*").alias("ucnt")
    )
    total = uni.agg(F.sum("ucnt").alias("total"))
    bi = bi_pos.groupBy("w1", "w2").agg(F.count("*").alias("bcnt"))
    u1 = uni.select(F.col("w").alias("w1"), F.col("ucnt").alias("u1cnt"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("ucnt").alias("u2cnt"))
    p = (
        F.lit(BIGRAM_LAMBDA) * (F.col("bcnt").cast("double") / F.col("u1cnt"))
        + F.lit(1 - BIGRAM_LAMBDA) * (F.col("u2cnt").cast("double") / F.col("total"))
    )
    scored = (
        bi_pos.join(bi, ["w1", "w2"])
        .join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.round(-F.log(p), 6).cast("decimal(27,6)").alias("nl"),
        )
    )
    ce = F.sum("nl").cast("double") / F.count("*")
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(ce, 6).alias("cross_entropy"),
        F.round(F.exp(ce), 4).alias("ppl"),
    )


# Context-window clipping cap (tokens kept per document). Deliberately
# below the fixture's median length so the clip path is exercised.
CLIP_TOKENS = 48


@register(
    "x76_context_clip",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS tk
      FROM documents
    )
    SELECT doc_id, source,
           len(tk) AS n_tokens,
           LEAST(len(tk), {CLIP_TOKENS}) AS n_kept,
           CAST(CASE WHEN len(tk) > {CLIP_TOKENS} THEN 1 ELSE 0 END AS INT)
             AS clipped,
           CAST(LEAST(len(tk), {CLIP_TOKENS}) AS DOUBLE) / len(tk)
             AS kept_frac,
           md5(array_to_string(tk[1:{CLIP_TOKENS}], ' ')) AS clipped_hash
    FROM tok
    """,
    doc=f"x76 (ext.): max-sequence-length clipping — truncate every "
    f"document to {CLIP_TOKENS} tokens (the tokenizer max_length step of a "
    "training pipeline), reporting kept/total token counts, the clip flag "
    "and the md5 of the clipped text so the rewrite itself is "
    "hash-verified, not just counted. Row-local array slicing: one scan, "
    "ZERO shuffles at any corpus size; kept_frac is an unrounded quotient "
    "of exact ints (48/96 sits on a midpoint — never round it)",
)
def x76_context_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tk = tokens("text")
    n = F.size(tk)
    kept = F.least(n, F.lit(CLIP_TOKENS))
    return d.select(
        "doc_id",
        "source",
        n.alias("n_tokens"),
        kept.alias("n_kept"),
        F.when(n > CLIP_TOKENS, 1).otherwise(0).alias("clipped"),
        (kept.cast("double") / n).alias("kept_frac"),
        F.md5(F.array_join(F.slice(tk, 1, CLIP_TOKENS), " ")).alias(
            "clipped_hash"
        ),
    )


@register(
    "x77_lang_mislabel",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, source, lang AS actual_lang,
             {", ".join(
                 "len(list_filter(string_split(lower(text), ' '), w -> w IN ("
                 + ", ".join(f"'{m}'" for m in ms)
                 + f"))) AS score_{lg}"
                 for lg, ms in LANG_MARKERS.items()
             )}
      FROM documents
    ),
    pred AS (
      SELECT source, actual_lang,
             CASE WHEN score_en >= score_fr AND score_en >= score_de THEN 'en'
                  WHEN score_fr >= score_de THEN 'fr'
                  ELSE 'de' END AS predicted_lang
      FROM scores
    )
    SELECT source, actual_lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN predicted_lang <> actual_lang THEN 1 ELSE 0
                    END) AS BIGINT) AS n_flagged,
           CAST(SUM(CASE WHEN predicted_lang <> actual_lang THEN 1 ELSE 0
                    END) AS DOUBLE) / COUNT(*) AS flag_rate
    FROM pred GROUP BY source, actual_lang
    """,
    doc="x77 (ext.): language-label noise audit — x03's marker heuristic "
    "re-predicts every document's language and each (source, stored-lang) "
    "cell reports how often the prediction disagrees (scraper lang tags "
    "are a notorious noise source; a cell with a high flag rate gets its "
    "docs re-identified before training). Languages OUTSIDE the "
    "heuristic's marker set (es/zh in the fixture) flag at 100% by "
    "construction — the audit also measures the identifier's own "
    "coverage gap. One scan + one small hash agg (cells are "
    "sources x languages, constant at any corpus size); flag_rate is an "
    "unrounded quotient of exact ints",
)
def x77_lang_mislabel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tk = tokens("text")
    scores = d.select(
        "source",
        F.col("lang").alias("actual_lang"),
        *[
            F.size(F.filter(tk, _membership(ms))).alias(f"score_{lg}")
            for lg, ms in LANG_MARKERS.items()
        ],
    )
    predicted = (
        F.when(
            (F.col("score_en") >= F.col("score_fr"))
            & (F.col("score_en") >= F.col("score_de")),
            "en",
        )
        .when(F.col("score_fr") >= F.col("score_de"), "fr")
        .otherwise("de")
    )
    flag = F.when(predicted != F.col("actual_lang"), 1).otherwise(0)
    return (
        scores.withColumn("flag", flag)
        .groupBy("source", "actual_lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("flag").alias("n_flagged"),
            (F.sum("flag").cast("double") / F.count("*")).alias("flag_rate"),
        )
    )


# --- x82: Kneser-Ney smoothed bigram LM ---------------------------------------

KN_DISCOUNT = 0.75  # the standard absolute-discount constant
KN_TOPN = 30  # report the table for the most frequent bigrams


@register(
    "x82_kneser_ney_bigram",
    oracle=f"""
    WITH bg AS (
      SELECT unnest(tk[1:len(tk)-1]) AS w1, unnest(tk[2:len(tk)]) AS w2
      FROM (SELECT string_split(lower(text), ' ') AS tk FROM documents)
    ),
    cnt AS (SELECT w1, w2, COUNT(*) AS c_big FROM bg GROUP BY 1, 2),
    lt AS (SELECT w1, CAST(SUM(c_big) AS BIGINT) AS c_left,
                  COUNT(*) AS n_follow
           FROM cnt GROUP BY w1),
    pc AS (SELECT w2, COUNT(*) AS n_prec FROM cnt GROUP BY w2),
    b AS (SELECT COUNT(*) AS n_bigram_types FROM cnt)
    SELECT w1, w2, c_big, c_left, n_follow, n_prec,
           GREATEST(CAST(c_big AS DOUBLE) - {KN_DISCOUNT}, 0.0)
             / c_left
           + ({KN_DISCOUNT} * n_follow / c_left)
             * (CAST(n_prec AS DOUBLE) / n_bigram_types) AS p_kn
    FROM (
      SELECT cnt.w1, cnt.w2, c_big, c_left, n_follow, n_prec,
             n_bigram_types,
             ROW_NUMBER() OVER (ORDER BY c_big DESC, cnt.w1, cnt.w2) AS rn
      FROM cnt
      JOIN lt ON cnt.w1 = lt.w1
      JOIN pc ON cnt.w2 = pc.w2
      CROSS JOIN b
    ) WHERE rn <= {KN_TOPN}
    """,
    doc=f"x82 (ext.): Kneser-Ney smoothed bigram model — absolute "
    f"discount D={KN_DISCOUNT} with continuation-probability backoff "
    "(p_cont = distinct left-contexts / bigram types), the standard "
    "n-gram LM smoothing (Kneser & Ney 1995; Chen & Goodman 1999) and "
    "the quality-scoring upgrade over x62's fixed interpolation. "
    f"Reports the full component table for the top {KN_TOPN} bigrams. "
    "Exactness: every component is an exact integer count; D=0.75 is "
    "binary-exact; the probability is a fixed IEEE expression over "
    "identical operands in both engines — no rounding anywhere. "
    "Scale shape: bigrams come from the SAME row's token array (no "
    "self-join); counts are map-combined word-count shuffles; the "
    "left/continuation tables are vocabulary-sized; the 1-row bigram-"
    "type total broadcasts. The top-N is a rank over the count table "
    "with deterministic tie-break",
)
def x82_kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark)
    pairs = (
        d.select(tokens("text").alias("tk"))
        .select(
            F.explode(
                F.expr(
                    "transform(slice(tk, 1, size(tk)-1), "
                    "(w, i) -> struct(w AS w1, tk[i+1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    cnt = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c_big"))
    lt = cnt.groupBy("w1").agg(
        F.sum("c_big").alias("c_left"), F.count("*").alias("n_follow")
    )
    pc = cnt.groupBy("w2").agg(F.count("*").alias("n_prec"))
    b = cnt.agg(F.count("*").alias("n_bigram_types"))
    joined = (
        cnt.join(lt, "w1")
        .join(pc, "w2")
        .crossJoin(F.broadcast(b))
        .withColumn(
            "rn",
            F.row_number().over(
                W.orderBy(F.desc("c_big"), F.asc("w1"), F.asc("w2"))
            ),
        )
        .filter(F.col("rn") <= KN_TOPN)
    )
    d_disc = F.lit(KN_DISCOUNT)
    p_kn = (
        F.greatest(F.col("c_big").cast("double") - d_disc, F.lit(0.0))
        / F.col("c_left")
        + (d_disc * F.col("n_follow") / F.col("c_left"))
        * (F.col("n_prec").cast("double") / F.col("n_bigram_types"))
    )
    return joined.select(
        "w1", "w2", "c_big", "c_left", "n_follow", "n_prec",
        p_kn.alias("p_kn"),
    )


# --- x89: BM25 retrieval ------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# Query terms: corpus words ranked 5..7 by document frequency (desc, then
# word) — deterministic, frequent enough to hit many docs, but below the
# near-universal head that matches everything.
BM25_QRANKS = (5, 7)


@register(
    "x89_bm25_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, w, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents) GROUP BY doc_id, w
    ),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ),
    df AS (SELECT w, COUNT(*) AS df FROM tok GROUP BY w),
    qterms AS (
      SELECT w, df FROM (
        SELECT w, df, ROW_NUMBER() OVER (ORDER BY df DESC, w) AS rn FROM df
      ) WHERE rn BETWEEN {BM25_QRANKS[0]} AND {BM25_QRANKS[1]}
    ),
    scored AS (
      SELECT t.doc_id,
             SUM(CAST(ROUND(
               ROUND(LN((s.n_docs - q.df + 0.5) / (q.df + 0.5)), 6)
               * (t.tf * ({BM25_K1} + 1.0))
               / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                                      + {BM25_B} * d.dl / s.avgdl)), 6)
             AS DECIMAL(27,6))) AS score,
             COUNT(*) AS n_terms_hit
      FROM tok t
      JOIN qterms q USING (w)
      JOIN dl d USING (doc_id)
      CROSS JOIN stats s
      GROUP BY t.doc_id
    )
    SELECT doc_id, CAST(score AS DOUBLE) AS score, n_terms_hit, rn AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rn
      FROM scored
    ) WHERE rn <= {BM25_TOPK}
    """,
    doc=f"x89 (ext.): BM25 retrieval (k1={BM25_K1}, b={BM25_B}) — the "
    "lexical-search scorer every retrieval/RAG corpus pipeline ships "
    "next to its dense ANN path (x10/x86), scoring a deterministic "
    "3-term query (df-ranked corpus words) and returning the top-"
    f"{BM25_TOPK} documents with tie-broken ranks. Exactness: tf/df/dl "
    "are exact integers, avgdl is one exact quotient, idf goes through "
    "the x45 decimal-ln device, and each per-term contribution is "
    "rounded once and summed as DECIMAL (order-independent). Scale "
    "shape: word-count shuffles for tf/df, the 3-row query-term table "
    "and the 1-row corpus stats broadcast into the scoring join, and "
    "the top-k is a rank over per-doc scores — no all-pairs, no "
    "per-row UDF",
)
def x89_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark)
    tok = (
        d.select("doc_id", F.explode(tokens("text")).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    dl = tok.groupBy("doc_id").agg(F.sum("tf").cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    df_t = tok.groupBy("w").agg(F.count("*").alias("df"))
    qterms = (
        df_t.withColumn(
            "rn", F.row_number().over(W.orderBy(F.desc("df"), F.asc("w")))
        )
        .filter(F.col("rn").between(*BM25_QRANKS))
        .select("w", "df")
    )
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ),
        6,
    )
    term = F.round(
        idf
        * (F.col("tf") * (BM25_K1 + 1.0))
        / (
            F.col("tf")
            + BM25_K1
            * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        ),
        6,
    ).cast("decimal(27,6)")
    scored = (
        tok.join(F.broadcast(qterms), "w")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(term).alias("score"), F.count("*").alias("n_terms_hit"))
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("score"), F.asc("doc_id"))),
        )
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "doc_id",
            F.col("score").cast("double").alias("score"),
            "n_terms_hit",
            "rank",
        )
    )


# --- x92: deterministic weighted reservoir sample (Efraimidis–Spirakis) ------

RESERVOIR_K = 20


@register(
    "x92_weighted_reservoir",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ROUND(LN((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 8)) AS BIGINT) + 0.5)
                      / 4294967296.0), 6)
               / n_chars AS sel_key
      FROM documents WHERE n_chars > 0
    )
    SELECT CAST(rn AS BIGINT) AS rank, doc_id, n_chars, sel_key FROM (
      SELECT doc_id, n_chars, sel_key,
             ROW_NUMBER() OVER (ORDER BY sel_key DESC, doc_id) AS rn
      FROM keyed
    ) WHERE rn <= {RESERVOIR_K}
    """,
    doc=f"x92 (ext.): Efraimidis–Spirakis weighted reservoir sample — "
    f"top-{RESERVOIR_K} documents by the key ln(u)/w (u an md5-derived "
    "uniform, w = n_chars), the single-pass weighted-sampling-without-"
    "replacement primitive a curation pipeline uses to draw a "
    "char-budget-proportional audit sample (heavier docs "
    "proportionally likelier, every draw reproducible from the doc_id "
    "alone — no RNG state, no driver loop). Complements x53's "
    "systematic PPS (fixed-size strided) with the streaming/mergeable "
    "variant: per-partition top-k merge gives the exact global top-k. "
    "Exactness: u = (h + 0.5) / 2^32 is an exact power-of-two quotient "
    "of an exact integer (bit-identical doubles), ln goes through the "
    "x45 round-6 device, and the division by the exact integer weight "
    "is one IEEE op — both engines order identical doubles with a "
    "doc_id tie-break. Scale shape: embarrassingly parallel scan + "
    "one top-k rank (TakeOrderedAndProject, no full sort), no shuffle "
    "of the corpus",
)
def x92_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    key = F.round(F.log((h + 0.5) / F.lit(4294967296.0)), 6) / F.col("n_chars")
    keyed = d.filter(F.col("n_chars") > 0).select(
        "doc_id", "n_chars", key.alias("sel_key")
    )
    return (
        keyed.withColumn(
            "rank",
            F.row_number().over(W.orderBy(F.desc("sel_key"), F.asc("doc_id"))),
        )
        .filter(F.col("rank") <= RESERVOIR_K)
        .select(
            F.col("rank").cast("bigint").alias("rank"),
            "doc_id",
            "n_chars",
            "sel_key",
        )
    )


# --- x93: word co-occurrence PMI ---------------------------------------------

PMI_TOP_WORDS = 15


@register(
    "x93_word_pmi",
    oracle=f"""
    WITH dw AS (
      SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        FROM documents)
      WHERE w NOT IN ('{"','".join(STOPWORDS)}')
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM dw),
    df AS (SELECT w, COUNT(*) AS df FROM dw GROUP BY w),
    top AS (
      SELECT w, df FROM (
        SELECT w, df, ROW_NUMBER() OVER (ORDER BY df DESC, w) AS rn FROM df
      ) WHERE rn <= {PMI_TOP_WORDS}
    ),
    co AS (
      SELECT a.w AS w1, b.w AS w2, COUNT(*) AS co_df
      FROM (SELECT dw.doc_id, dw.w FROM dw JOIN top USING (w)) a
      JOIN (SELECT dw.doc_id, dw.w FROM dw JOIN top USING (w)) b
        ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY a.w, b.w
    )
    SELECT c.w1, c.w2, ta.df AS df_1, tb.df AS df_2, c.co_df,
           CAST(CAST(ROUND(LN(c.co_df), 6) AS DECIMAL(27,6))
                + CAST(ROUND(LN(n.n_docs), 6) AS DECIMAL(27,6))
                - CAST(ROUND(LN(ta.df), 6) AS DECIMAL(27,6))
                - CAST(ROUND(LN(tb.df), 6) AS DECIMAL(27,6))
             AS DOUBLE) AS pmi
    FROM co c
    JOIN top ta ON ta.w = c.w1
    JOIN top tb ON tb.w = c.w2
    CROSS JOIN n
    """,
    doc=f"x93 (ext.): word co-occurrence PMI over the top-{PMI_TOP_WORDS} "
    "non-stopword vocabulary — pointwise mutual information "
    "ln(N·co/(df1·df2)) from document-level presence counts (the "
    "collocation / topic-structure probe a corpus analysis runs before "
    "choosing phrase-aware tokenization; positive PMI = words travel "
    "together, negative = they repel). Exactness: all counts are exact "
    "integers and the log decomposes into four per-integer ln terms, "
    "each through the x45 round-6 device, combined exactly as "
    "DECIMAL and cast to DOUBLE once. Scale shape: the distinct "
    "(doc, word) projection is one word-count shuffle; the tiny top-"
    "vocabulary table semi-filters both join sides so the pair fanout "
    f"is bounded by {PMI_TOP_WORDS} words per doc; df and corpus-size "
    "scalars broadcast into the final scoring join",
)
def x93_word_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark)
    dw = (
        d.select("doc_id", F.explode(tokens("text")).alias("w"))
        .filter(~F.col("w").isin(STOPWORDS))
        .distinct()
    )
    n = dw.agg(F.countDistinct("doc_id").alias("n_docs"))
    df_t = dw.groupBy("w").agg(F.count("*").alias("df"))
    top = (
        df_t.withColumn(
            "rn", F.row_number().over(W.orderBy(F.desc("df"), F.asc("w")))
        )
        .filter(F.col("rn") <= PMI_TOP_WORDS)
        .select("w", "df")
    )
    filt = dw.join(F.broadcast(top.select("w")), "w")
    a = filt.select("doc_id", F.col("w").alias("w1"))
    b = filt.select("doc_id", F.col("w").alias("w2"))
    co = (
        a.join(b, "doc_id")
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("co_df"))
    )

    def lnd(c):
        return F.round(F.log(c.cast("double")), 6).cast("decimal(27,6)")

    ta = top.select(F.col("w").alias("w1"), F.col("df").alias("df_1"))
    tb = top.select(F.col("w").alias("w2"), F.col("df").alias("df_2"))
    return (
        co.join(F.broadcast(ta), "w1")
        .join(F.broadcast(tb), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "df_1",
            "df_2",
            "co_df",
            (
                lnd(F.col("co_df"))
                + lnd(F.col("n_docs"))
                - lnd(F.col("df_1"))
                - lnd(F.col("df_2"))
            )
            .cast("double")
            .alias("pmi"),
        )
    )


# --- x94: RAKE keyphrase extraction ------------------------------------------

RAKE_MAX_LEN = 4
RAKE_TOPK = 15


@register(
    "x94_rake_keyphrases",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(lower(text), ' ')) AS w,
             generate_subscripts(string_split(lower(text), ' '), 1) AS pos
      FROM documents
    ),
    marked AS (
      SELECT doc_id, pos, w,
             CASE WHEN w IN ('{"','".join(STOPWORDS)}') THEN 1 ELSE 0 END
               AS is_stop,
             SUM(CASE WHEN w IN ('{"','".join(STOPWORDS)}')
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
      FROM tok
    ),
    member AS (
      SELECT doc_id, phrase_id, pos, w FROM marked WHERE is_stop = 0
    ),
    cand AS (
      SELECT doc_id, phrase_id, COUNT(*) AS len
      FROM member GROUP BY doc_id, phrase_id
      HAVING COUNT(*) <= {RAKE_MAX_LEN}
    ),
    cm AS (
      SELECT m.doc_id, m.phrase_id, m.pos, m.w, c.len
      FROM member m JOIN cand c USING (doc_id, phrase_id)
    ),
    wscore AS (
      SELECT w, (SUM(len) * 1000000) // COUNT(*) AS score_u
      FROM cm GROUP BY w
    ),
    pscore AS (
      SELECT cm.doc_id, cm.phrase_id,
             SUM(ws.score_u) AS score_u,
             STRING_AGG(cm.w, ' ' ORDER BY cm.pos) AS phrase
      FROM cm JOIN wscore ws USING (w)
      GROUP BY cm.doc_id, cm.phrase_id
    ),
    agg AS (
      SELECT phrase, MAX(score_u) AS score_u, COUNT(*) AS n_occurrences
      FROM pscore GROUP BY phrase
    )
    SELECT CAST(rn AS BIGINT) AS rank, phrase,
           CAST(score_u AS BIGINT) AS score_u,
           CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM (
      SELECT phrase, score_u, n_occurrences,
             ROW_NUMBER() OVER (ORDER BY score_u DESC, phrase) AS rn
      FROM agg
    ) WHERE rn <= {RAKE_TOPK}
    """,
    doc=f"x94 (ext.): RAKE keyphrase extraction — candidate phrases are "
    "maximal stopword-delimited word runs (length <= "
    f"{RAKE_MAX_LEN}), each word scored degree/frequency over the "
    "candidate set, each phrase scored as the sum of its word scores, "
    f"then the corpus-wide top-{RAKE_TOPK} distinct phrases (the "
    "unsupervised keyword pass a corpus catalog runs next to x18's "
    "TF-IDF keywords — TF-IDF ranks single terms per doc, RAKE "
    "surfaces multi-word phrases corpus-wide). Exactness: the "
    "degree/frequency quotient is computed as an exact integer "
    "MICROSCORE ((degree*1e6) DIV freq) so phrase scores are exact "
    "BIGINT sums — no float appears anywhere in the pipeline. Scale "
    "shape: phrase segmentation is one doc-partitioned prefix-sum "
    "window (sequences co-located); word stats and phrase re-scoring "
    "are word-count-shaped aggs with the small word-score table "
    "joining back on the gram key; ordered phrase text is rebuilt "
    "per (doc, phrase) group from its own bounded members",
)
def x94_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.catalog import fan_out, pin_derived

    def build_members() -> DataFrame:
        d = fan_out(load_table(spark, sf_dir, "documents"), spark)
        tok = d.select(
            "doc_id", F.posexplode(tokens("text")).alias("pos0", "w")
        ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
        is_stop = F.col("w").isin(STOPWORDS).cast("int")
        marked = tok.select(
            "doc_id",
            "pos",
            "w",
            is_stop.alias("is_stop"),
            F.sum(is_stop)
            .over(W.partitionBy("doc_id").orderBy("pos"))
            .alias("phrase_id"),
        )
        return marked.filter(F.col("is_stop") == 0).select(
            "doc_id", "phrase_id", "pos", "w"
        )

    # three consumers probe the segmented member table (length filter,
    # word stats, phrase re-scoring) — pin it so the explode + prefix-sum
    # window runs ONCE instead of once per plan branch
    member = pin_derived(spark, sf_dir, "rake_members", build_members)
    cand = (
        member.groupBy("doc_id", "phrase_id")
        .agg(F.count("*").alias("len"))
        .filter(F.col("len") <= RAKE_MAX_LEN)
    )
    cm = member.join(cand, ["doc_id", "phrase_id"])
    wscore = cm.groupBy("w").agg(
        F.expr("(SUM(len) * 1000000) DIV COUNT(*)").alias("score_u")
    )
    pscore = (
        cm.join(wscore, "w")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.sum("score_u").alias("score_u"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
        )
    )
    agg = pscore.groupBy("phrase").agg(
        F.max("score_u").cast("bigint").alias("score_u"),
        F.count("*").cast("bigint").alias("n_occurrences"),
    )
    return (
        agg.withColumn(
            "rn", F.row_number().over(W.orderBy(F.desc("score_u"), F.asc("phrase")))
        )
        .filter(F.col("rn") <= RAKE_TOPK)
        .select(
            F.col("rn").cast("bigint").alias("rank"),
            "phrase",
            "score_u",
            "n_occurrences",
        )
    )


# --- x96: tokenizer fertility audit ------------------------------------------

# BPE-ish pre-tokenizer: letter runs, digit runs, single non-alnum marks
# (the GPT-2 pre-tokenizer's shape without the unicode categories the
# sandbox regex dialects disagree on). Disjoint alternatives => identical
# matches under Java regex (Spark) and RE2 (DuckDB).
_X96_PAT = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "x96_tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT)
             AS n_words,
           CAST(SUM(len(regexp_extract_all(lower(text), '{_X96_PAT}')))
             AS BIGINT) AS n_subwords,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(len(regexp_extract_all(lower(text), '{_X96_PAT}')))
                      AS DOUBLE)
                 / SUM(len(string_split(lower(text), ' '))), 6) AS fertility,
           ROUND(CAST(SUM(length(text)) AS DOUBLE)
                 / SUM(len(regexp_extract_all(lower(text), '{_X96_PAT}'))), 6)
             AS chars_per_subword
    FROM documents GROUP BY lang
    """,
    doc="x96: tokenizer fertility audit per language — whitespace words "
    "vs BPE-style pre-tokens (letter runs / digit runs / single marks) "
    "vs characters; fertility = subwords per word, the number that "
    "converts a corpus token budget between tokenizers (and the first "
    "thing that blows up a multilingual data mix if unchecked). "
    "Exactness: all counts are integers off one JVM-regex scan; the two "
    "ratios are single IEEE quotients. Scale: one map-combined "
    "aggregate, no explode — counts come from size() of the match "
    "arrays, so nothing row-expands; the regex alternatives are "
    "disjoint classes, so Java and RE2 tokenize identically",
)
def x96_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    lower = F.lower(F.col("text"))
    n_sub = F.size(F.regexp_extract_all(lower, F.lit(_X96_PAT), 0))
    n_w = F.size(F.split(lower, " "))
    agg = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(n_w).cast("bigint").alias("n_words"),
        F.sum(n_sub).cast("bigint").alias("n_subwords"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_subwords",
        "n_chars",
        F.round(
            F.col("n_subwords").cast("double") / F.col("n_words"), 6
        ).alias("fertility"),
        F.round(
            F.col("n_chars").cast("double") / F.col("n_subwords"), 6
        ).alias("chars_per_subword"),
    )


# --- x101: hapax-density quality flag -------------------------------------------

_X101_FLAG_FRAC = 0.5


@register(
    "x101_hapax_density",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    wc AS (SELECT w, COUNT(*) AS n FROM tok GROUP BY w),
    per_doc AS (
      SELECT t.doc_id,
             COUNT(*) AS n_tok,
             COUNT(CASE WHEN wc.n = 1 THEN 1 END) AS n_hapax
      FROM tok t JOIN wc ON wc.w = t.w
      GROUP BY t.doc_id
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(p.n_hapax) AS BIGINT) AS n_hapax_tokens,
           CAST(SUM(p.n_hapax) AS DOUBLE) / SUM(p.n_tok)
             AS corpus_hapax_share,
           CAST(COUNT(CASE WHEN CAST(p.n_hapax AS DOUBLE) / p.n_tok
                                > {_X101_FLAG_FRAC} THEN 1 END) AS BIGINT)
             AS n_flagged_docs
    FROM per_doc p JOIN documents d USING (doc_id)
    GROUP BY d.source
    """,
    doc="x101: hapax-density screen — per document, the fraction of its "
    "tokens that occur EXACTLY ONCE in the whole corpus; docs past "
    f"{_X101_FLAG_FRAC:.0%} are flagged (gibberish, OCR noise and "
    "base64 blobs are hapax-dense; natural text is not), rolled up per "
    "source with the corpus-level hapax share (the Zipf tail mass x51 "
    "fits, x57 grows). Shape: one exploded token table feeds both the "
    "corpus word count and the per-doc reduce — two word-count-shaped "
    "map-combined shuffles joined on the word hash, never all-pairs; "
    "integer counts + unrounded IEEE quotients (no midpoint risk)",
)
def x101_hapax_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = doc_token_table(spark, sf_dir)
    wc = tok.groupBy("w").agg(F.count("*").alias("n"))
    per_doc = (
        tok.join(wc, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.count_if(F.col("n") == 1).alias("n_hapax"),
        )
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    flagged = (
        F.col("n_hapax").cast("double") / F.col("n_tok") > _X101_FLAG_FRAC
    )
    return (
        per_doc.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum("n_hapax").cast("bigint").alias("n_hapax_tokens"),
            (
                F.sum("n_hapax").cast("double") / F.sum("n_tok")
            ).alias("corpus_hapax_share"),
            F.count_if(flagged).cast("bigint").alias("n_flagged_docs"),
        )
    )


# --- x106: tokenizer vocabulary coverage curve -----------------------------------

_X106_KS = [100, 500, 1000, 5000]


@register(
    "x106_vocab_coverage_curve",
    # Corpus coverage of a top-K frequency vocabulary, swept over K —
    # the curve that sizes a tokenizer's vocab before training it
    # (x58 audits ONE fixed vocab; x96 measures fertility after). The
    # candidate set is the top max(K) words by (count DESC, word) —
    # a BOUNDED TakeOrdered, never a global vocab sort — and each
    # coverage@K is a conditional sum over that bounded set.
    oracle=f"""
    WITH wc AS (
      SELECT w, COUNT(*) AS c
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM documents)
      GROUP BY w
    ),
    tot AS (
      SELECT CAST(SUM(c) AS BIGINT) AS total_tokens,
             CAST(COUNT(*) AS BIGINT) AS vocab_size
      FROM wc
    ),
    top AS (
      SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk
      FROM wc ORDER BY c DESC, w LIMIT {max(_X106_KS)}
    )
    SELECT k.k AS vocab_k,
           CAST(SUM(CASE WHEN top.rk <= k.k THEN top.c ELSE 0 END)
                AS BIGINT) AS covered_tokens,
           t.total_tokens, t.vocab_size,
           CAST(SUM(CASE WHEN top.rk <= k.k THEN top.c ELSE 0 END)
                AS DOUBLE) / t.total_tokens AS coverage
    FROM top, tot t,
         (VALUES {", ".join(f"({k})" for k in _X106_KS)}) AS k(k)
    GROUP BY k.k, t.total_tokens, t.vocab_size
    """,
    doc="x106: vocabulary coverage curve — corpus token coverage of a "
    "top-K frequency vocab for K in "
    f"{_X106_KS} (ties broken lexicographically so the vocab is "
    "deterministic). Reads as 'a 5k-word vocab covers X% of corpus "
    "tokens' — the sizing curve run before committing a tokenizer "
    "budget. Scale: ONE word-count shuffle, then TakeOrdered bounds "
    "the candidate set to max(K) rows (per-partition heaps, no "
    "global sort); the K-sweep is conditional sums over that bounded "
    "table. Exactness: integer counts, one IEEE quotient per K",
)
def x106_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    tot = wc.agg(
        F.sum("c").cast("bigint").alias("total_tokens"),
        F.count("*").cast("bigint").alias("vocab_size"),
    )
    top = (
        wc.orderBy(F.desc("c"), F.asc("w"))
        .limit(max(_X106_KS))
        .withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc("c"), F.asc("w")))
        )
    )
    ks = F.explode(F.array(*[F.lit(k) for k in _X106_KS])).alias("vocab_k")
    swept = top.select("rk", "c", ks)
    return (
        swept.groupBy("vocab_k")
        .agg(
            F.sum(F.when(F.col("rk") <= F.col("vocab_k"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("covered_tokens")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "vocab_k",
            "covered_tokens",
            "total_tokens",
            "vocab_size",
            (
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens")
            ).alias("coverage"),
        )
    )


# --- x111: bigram conditional entropy rate per source -----------------------------


@register(
    "x111_bigram_entropy_rate",
    # H(W2 | W1) per source from within-doc adjacent bigram counts:
    # -sum p(w1,w2) * ln(c(w1,w2)/c(w1·)). Every probability is an
    # exact integer quotient; every LN term is ROUND(.,6)->DECIMAL
    # before the order-free sum (x45 device). The unigram entropy H(W)
    # rides along so the redundancy ratio is one subtraction away.
    oracle="""
    WITH tk AS (
      SELECT source, string_split(lower(text), ' ') AS t FROM documents
    ),
    bg AS (
      SELECT source,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS b
      FROM tk WHERE len(t) >= 2
    ),
    bc AS (
      SELECT source, b, COUNT(*) AS c FROM bg GROUP BY source, b
    ),
    w1c AS (
      SELECT source, string_split(b, ' ')[1] AS w1, SUM(c) AS cw
      FROM bc GROUP BY source, string_split(b, ' ')[1]
    ),
    nsrc AS (
      SELECT source, SUM(c) AS nb FROM bc GROUP BY source
    ),
    hterm AS (
      SELECT bc.source,
             ROUND(-(CAST(bc.c AS DOUBLE) / n.nb)
                   * LN(CAST(bc.c AS DOUBLE) / w.cw), 6) AS v
      FROM bc
      JOIN w1c w ON w.source = bc.source
                AND w.w1 = string_split(bc.b, ' ')[1]
      JOIN nsrc n ON n.source = bc.source
    ),
    uterm AS (
      SELECT w.source,
             ROUND(-(CAST(w.cw AS DOUBLE) / n.nb)
                   * LN(CAST(w.cw AS DOUBLE) / n.nb), 6) AS v
      FROM w1c w JOIN nsrc n ON n.source = w.source
    )
    SELECT n.source,
           CAST(n.nb AS BIGINT) AS n_bigrams,
           (SELECT CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE)
            FROM hterm h WHERE h.source = n.source) AS h_cond,
           (SELECT CAST(SUM(CAST(v AS DECIMAL(27,6))) AS DOUBLE)
            FROM uterm u WHERE u.source = n.source) AS h_unigram
    FROM nsrc n
    """,
    doc="x111: bigram conditional entropy rate per source — H(next "
    "word | word) from within-doc adjacent pairs, next to the "
    "first-word marginal entropy H(W). The language-complexity / "
    "templatedness gauge: boilerplate-heavy sources have LOW "
    "conditional entropy (the next word is predictable) long before "
    "x25's repetition counters fire; the H(W)-H(W2|W1) gap is the "
    "per-source redundancy x82's Kneser-Ney model exploits. Scale: "
    "word-count-shaped shuffles only (bigram counts, first-word "
    "rollup, per-source totals), all map-combined, never all-pairs. "
    "Exactness: integer counts, 6-dp-rounded LN terms as decimals",
)
def x111_bigram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tk = d.select("source", tokens("text").alias("t")).filter(
        F.size("t") >= 2
    )
    bg = tk.select(
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat(
                    F.element_at("t", i),
                    F.lit(" "),
                    F.element_at("t", i + 1),
                ),
            )
        ).alias("b"),
    )
    bc = bg.groupBy("source", "b").agg(F.count("*").alias("c"))
    w1 = F.split(F.col("b"), " ")[0]
    w1c = bc.groupBy("source", w1.alias("w1")).agg(
        F.sum("c").alias("cw")
    )
    nsrc = bc.groupBy("source").agg(F.sum("c").alias("nb"))
    hterm = (
        bc.join(
            w1c,
            (bc["source"] == w1c["source"]) & (w1.eqNullSafe(w1c["w1"])),
        )
        .drop(w1c["source"])
        .join(nsrc, "source")
        .select(
            "source",
            F.round(
                -(F.col("c").cast("double") / F.col("nb"))
                * F.log(F.col("c").cast("double") / F.col("cw")),
                6,
            )
            .cast("decimal(27,6)")
            .alias("v"),
        )
    )
    h_cond = hterm.groupBy("source").agg(
        F.sum("v").cast("double").alias("h_cond")
    )
    uterm = w1c.join(nsrc, "source").select(
        "source",
        F.round(
            -(F.col("cw").cast("double") / F.col("nb"))
            * F.log(F.col("cw").cast("double") / F.col("nb")),
            6,
        )
        .cast("decimal(27,6)")
        .alias("v"),
    )
    h_uni = uterm.groupBy("source").agg(
        F.sum("v").cast("double").alias("h_unigram")
    )
    return (
        nsrc.select("source", F.col("nb").cast("bigint").alias("n_bigrams"))
        .join(h_cond, "source")
        .join(h_uni, "source")
    )


# --- x128: quality-signal bundle (C4/RedPajama-style multi-signal pass) -------------

_X128_STOPWORDS = (
    "the", "a", "of", "and", "in", "to", "is", "on", "for", "with",
)
_X128_MIN_WORDS = 20
_X128_MIN_TTR = 0.2
_X128_MIN_STOP = 0.02


@register(
    "x128_quality_signal_bundle",
    # Every signal is integer-derived (word counts, char sums, distinct
    # counts) with at most ONE int/int division per emitted double —
    # correctly rounded identically on both engines, no rounding
    # needed. The top-word count is the only shuffle-bearing signal
    # (word-count shape); everything else folds inside the row.
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source,
             string_split(text, ' ') AS ws
      FROM documents
    ),
    tw AS (
      SELECT doc_id, MAX(c) AS top_c FROM (
        SELECT doc_id, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(ws) AS w FROM base)
        GROUP BY doc_id, w
      ) GROUP BY doc_id
    )
    SELECT b.doc_id, b.source,
           CAST(len(b.ws) AS BIGINT) AS n_words,
           CAST(list_reduce(list_transform(b.ws, w -> len(w)),
                            (x, y) -> x + y) AS BIGINT) AS n_word_chars,
           CAST(list_reduce(list_transform(b.ws, w -> len(w)),
                            (x, y) -> x + y) AS DOUBLE) / len(b.ws)
             AS mean_word_len,
           CAST(len(list_distinct(b.ws)) AS DOUBLE) / len(b.ws) AS ttr,
           CAST(len(list_filter(b.ws,
                 w -> list_contains({list(_X128_STOPWORDS)}, w)))
                AS DOUBLE) / len(b.ws) AS stopword_frac,
           CAST(t.top_c AS DOUBLE) / len(b.ws) AS top_word_frac,
           len(b.ws) >= {_X128_MIN_WORDS}
             AND CAST(len(list_distinct(b.ws)) AS DOUBLE) / len(b.ws)
                 >= {_X128_MIN_TTR}
             AND CAST(len(list_filter(b.ws,
                   w -> list_contains({list(_X128_STOPWORDS)}, w)))
                  AS DOUBLE) / len(b.ws) >= {_X128_MIN_STOP}
             AS keep_flag
    FROM base b JOIN tw t USING (doc_id)
    """,
    doc="x128: quality-signal bundle — the C4/RedPajama-style "
    "multi-signal document profile computed in ONE pass: word count, "
    "mean word length, type-token ratio, stopword fraction, top-word "
    "dominance (repetition proxy), plus the composed keep flag the "
    "curation funnel consumes (complements x21's Gopher rules with "
    "the lexical-diversity axis). Scale: all per-row signals fold "
    "inside the row via array HOFs (zero shuffle); only the top-word "
    "count is a word-count-shaped aggregate with map-side combine. "
    "Exactness: integer counts, one int/int division per double. "
    "Ref parity: the reference's quality gate is a fixed WHERE "
    "clause (src/etl.py filters); this emits the full signal vector",
)
def x128_quality_signal_bundle(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", "source", F.split("text", " ").alias("ws")
    )
    words = base.select("doc_id", F.explode("ws").alias("w"))
    top = (
        words.groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    nw = F.size("ws")
    chars = F.aggregate(
        F.transform(F.col("ws"), F.length),
        F.lit(0),
        lambda a, x: a + x,
    )
    stop = F.size(
        F.filter(
            F.col("ws"),
            lambda w: w.isin(*_X128_STOPWORDS),
        )
    )
    ttr = F.size(F.array_distinct("ws")).cast("double") / nw
    stop_frac = stop.cast("double") / nw
    return (
        base.join(top, "doc_id")
        .select(
            "doc_id",
            "source",
            nw.cast("bigint").alias("n_words"),
            chars.cast("bigint").alias("n_word_chars"),
            (chars.cast("double") / nw).alias("mean_word_len"),
            ttr.alias("ttr"),
            stop_frac.alias("stopword_frac"),
            (F.col("top_c").cast("double") / nw).alias("top_word_frac"),
            (
                (nw >= _X128_MIN_WORDS)
                & (ttr >= _X128_MIN_TTR)
                & (stop_frac >= _X128_MIN_STOP)
            ).alias("keep_flag"),
        )
    )


# --- x137: KV-cache prefix-reuse estimator ------------------------------------------

_X137_KS = [4, 8, 16]  # shared-prefix lengths (tokens) to evaluate


@register(
    "x137_prefix_cache_reuse",
    # Inference-serving analytics: how much KV-cache could prefix
    # sharing reuse? For K in {4,8,16}, group docs by the md5 of their
    # first-K-token prefix (docs shorter than K form their own exact-
    # text group); every group of n sharers saves (n-1)*K cached
    # tokens. One token-array scan serves all K values via in-row
    # transforms; the group math is a word-count-shaped aggregate.
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents
    ),
    pref AS (
      {" UNION ALL ".join(
        f'''SELECT {k} AS k, doc_id,
             md5(array_to_string(tk[1:least({k}, len(tk))], ' ')) AS p,
             least({k}, len(tk)) AS plen
      FROM toks'''
        for k in _X137_KS)}
    ),
    grp AS (
      SELECT k, p, COUNT(*) AS n, MIN(plen) AS plen
      FROM pref GROUP BY k, p
    )
    SELECT CAST(k AS BIGINT) AS prefix_k,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT)
             AS n_docs_sharing,
           CAST(SUM((n - 1) * plen) AS BIGINT) AS tokens_reusable,
           CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE)
             / SUM(n) AS sharing_frac
    FROM grp GROUP BY k
    """,
    doc=f"x137: KV-cache prefix-reuse estimator — for K in {_X137_KS}, "
    "group documents by their first-K-token prefix and report how "
    "many docs share a prefix and how many cached tokens prefix "
    "reuse would save ((n-1)*K per group) — the serving-side "
    "analytics an inference batcher runs before enabling prefix "
    "caching / radix-tree KV sharing (high reuse means sorting "
    "requests by prefix pays; near-zero means it won't). Scale: ONE "
    "token scan fans out all K values in-row; groups are md5-keyed "
    "word-count aggregates, map-side combined. Exactness: md5 "
    "prefixes, integer token savings, one quotient per K",
)
def x137_prefix_cache_reuse(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.lower("text"), " ").alias("tk")
    )
    pref = None
    for k in _X137_KS:
        plen = F.least(F.lit(k), F.size("tk"))
        part = toks.select(
            F.lit(k).alias("k"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("tk"), 1, plen))
            ).alias("p"),
            plen.alias("plen"),
        )
        pref = part if pref is None else pref.unionByName(part)
    grp = pref.groupBy("k", "p").agg(
        F.count("*").alias("n"), F.min("plen").alias("plen")
    )
    return grp.groupBy("k").agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_docs_sharing"),
        F.sum((F.col("n") - 1) * F.col("plen"))
        .cast("bigint")
        .alias("tokens_reusable"),
        (
            F.sum(
                F.when(F.col("n") > 1, F.col("n")).otherwise(0)
            ).cast("double")
            / F.sum("n")
        ).alias("sharing_frac"),
    ).select(
        F.col("k").cast("bigint").alias("prefix_k"),
        "n_groups",
        "n_docs_sharing",
        "tokens_reusable",
        "sharing_frac",
    )


# --- x141: n-gram diversity index (Self-BLEU-lite) ----------------------------------


@register(
    "x141_ngram_diversity",
    # Distinct-n ratios (the "distinct-1/2/3" diversity metrics of Li
    # et al. 2016) per source: distinct n-grams over total n-grams for
    # n = 1, 2, 3, plus the share of the most frequent trigram. A
    # template-heavy (low-diversity) source scores low exactly where
    # Self-BLEU would score high, without any pairwise doc compare.
    oracle="""
    WITH tk AS (
      SELECT source, string_split(lower(text), ' ') AS t FROM documents
    ),
    uni AS (
      SELECT source, unnest(t) AS g FROM tk
    ),
    bi AS (
      SELECT source,
             unnest(list_transform(range(1, len(t)),
                    i -> t[i] || ' ' || t[i + 1])) AS g
      FROM tk WHERE len(t) >= 2
    ),
    tri AS (
      SELECT source,
             unnest(list_transform(range(1, len(t) - 1),
                    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
      FROM tk WHERE len(t) >= 3
    ),
    s1 AS (SELECT source, COUNT(*) AS n1, COUNT(DISTINCT g) AS d1
           FROM uni GROUP BY source),
    s2 AS (SELECT source, COUNT(*) AS n2, COUNT(DISTINCT g) AS d2
           FROM bi GROUP BY source),
    s3 AS (SELECT source, COUNT(*) AS n3, COUNT(DISTINCT g) AS d3
           FROM tri GROUP BY source),
    top3 AS (
      SELECT source, MAX(c) AS topc FROM (
        SELECT source, g, COUNT(*) AS c FROM tri GROUP BY source, g
      ) GROUP BY source
    )
    SELECT s1.source,
           CAST(n1 AS BIGINT) AS total_uni,
           CAST(d1 AS BIGINT) AS distinct_uni,
           ROUND(CAST(d1 AS DOUBLE) / n1, 9) AS distinct1,
           CAST(n2 AS BIGINT) AS total_bi,
           ROUND(CAST(d2 AS DOUBLE) / n2, 9) AS distinct2,
           CAST(n3 AS BIGINT) AS total_tri,
           ROUND(CAST(d3 AS DOUBLE) / n3, 9) AS distinct3,
           ROUND(CAST(topc AS DOUBLE) / n3, 9) AS top_trigram_share
    FROM s1 JOIN s2 USING (source) JOIN s3 USING (source)
            JOIN top3 USING (source)
    """,
    doc="x141: n-gram diversity index per source — distinct-1/2/3 "
    "ratios (Li et al. 2016) and the top-trigram share, the "
    "Self-BLEU-shaped templatedness gauge that needs no pairwise "
    "document comparison: a boilerplate-heavy source repeats the "
    "same n-grams, collapsing distinct-n. Complements x111 (bigram "
    "conditional entropy) with the set-size view and x25 (intra-doc "
    "repetition) with the cross-doc view. Scale: three word-count "
    "shuffles keyed by (source, gram), all map-side combined; "
    "20-row result. Exactness: integer counts; ratios ROUND(,9) "
    "both engines. Ref parity: reference corpus-quality report "
    "(src/enhanced_ingestion.py:340-370)",
)
def x141_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tk = docs.select("source", tokens("text").alias("t"))

    def gram_stats(n: int, total: str, distinct: str):
        if n == 1:
            g = tk.select("source", F.explode("t").alias("g"))
        else:
            joined = F.transform(
                F.slice(
                    F.sequence(F.lit(1), F.size("t") - (n - 1)),
                    1,
                    F.greatest(F.size("t") - (n - 1), F.lit(0)),
                ),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("t", i + k) for k in range(n)]
                ),
            )
            g = (
                tk.filter(F.size("t") >= n)
                .select("source", F.explode(joined).alias("g"))
            )
        return g, g.groupBy("source").agg(
            F.count("*").cast("bigint").alias(total),
            F.countDistinct("g").cast("bigint").alias(distinct),
        )

    _, s1 = gram_stats(1, "total_uni", "distinct_uni")
    _, s2 = gram_stats(2, "total_bi", "distinct_bi")
    tri_g, s3 = gram_stats(3, "total_tri", "distinct_tri")
    top3 = (
        tri_g.groupBy("source", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("source")
        .agg(F.max("c").alias("topc"))
    )
    return (
        s1.join(s2, "source")
        .join(s3, "source")
        .join(top3, "source")
        .select(
            "source",
            "total_uni",
            "distinct_uni",
            F.round(F.col("distinct_uni").cast("double") / F.col("total_uni"), 9).alias("distinct1"),
            "total_bi",
            F.round(F.col("distinct_bi").cast("double") / F.col("total_bi"), 9).alias("distinct2"),
            "total_tri",
            F.round(F.col("distinct_tri").cast("double") / F.col("total_tri"), 9).alias("distinct3"),
            F.round(F.col("topc").cast("double") / F.col("total_tri"), 9).alias("top_trigram_share"),
        )
    )


# --- x143: winnowing (MOSS) fingerprint selection + cross-source overlap --------------

_X143_K = 20  # char-gram length (the guarantee unit: matches >= K+W-1 chars)
_X143_W = 8   # winnowing window: >=1 fingerprint selected per W grams


@register(
    "x143_winnowing_fingerprints",
    # Schleimer/Wilkerson/Aiken winnowing: md5 every K-char gram, then
    # in every window of W consecutive gram positions select the MINIMUM
    # hash — a ~2/(W+1)-density fingerprint set that GUARANTEES any
    # shared substring of length >= K+W-1 yields a shared fingerprint
    # (the property random sampling lacks). Reports per source the
    # selection density and how much of its fingerprint vocabulary
    # also appears in other sources. Hex md5 strings order identically
    # (lowercase ASCII) on both engines; everything else is integer
    # counts with one division per emitted double.
    oracle=f"""
    WITH g AS (
      SELECT doc_id, source, n_chars,
             unnest(range(1, n_chars - {_X143_K} + 2)) AS p
      FROM documents WHERE n_chars >= {_X143_K + _X143_W - 1}
    ),
    h AS (
      SELECT g.doc_id, g.source, g.p,
             md5(substr(d.text, CAST(g.p AS INT), {_X143_K})) AS gh
      FROM g JOIN documents d USING (doc_id)
    ),
    wm AS (
      SELECT doc_id, source, p,
             MIN(gh) OVER (
               PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN {_X143_W - 1} PRECEDING AND CURRENT ROW
             ) AS fp
      FROM h
    ),
    docfp AS (
      SELECT DISTINCT doc_id, source, fp FROM wm WHERE p >= {_X143_W}
    ),
    srcfp AS (SELECT DISTINCT source, fp FROM docfp),
    fpshare AS (SELECT fp, COUNT(*) AS nsrc FROM srcfp GROUP BY fp),
    pos AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars - {_X143_K} + 1) AS BIGINT) AS n_positions
      FROM documents WHERE n_chars >= {_X143_K + _X143_W - 1}
      GROUP BY source
    ),
    sel AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_selected
      FROM docfp GROUP BY source
    ),
    voc AS (
      SELECT s.source,
             CAST(COUNT(*) AS BIGINT) AS n_fp,
             CAST(SUM(CASE WHEN f.nsrc >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_fp_shared
      FROM srcfp s JOIN fpshare f USING (fp) GROUP BY s.source
    )
    SELECT p.source, p.n_docs, p.n_positions, s.n_selected,
           CAST(s.n_selected AS DOUBLE) / p.n_positions AS density,
           v.n_fp, v.n_fp_shared,
           CAST(v.n_fp_shared AS DOUBLE) / v.n_fp AS shared_frac
    FROM pos p JOIN sel s USING (source) JOIN voc v USING (source)
    """,
    doc=f"x143: winnowing fingerprint selection (the MOSS algorithm): "
    f"md5 {_X143_K}-char grams, per-doc window-of-{_X143_W} minima as "
    "the selected fingerprint set — guaranteed to catch any shared "
    "run of >= K+W-1 chars at ~2/(W+1) the storage of full gram "
    "sets. Emits per source the selection density (vs the 2/(W+1) "
    "theory line) and the fraction of its fingerprint vocabulary "
    "shared with other sources. x129 measures contamination with "
    "FULL gram sets; x143 is the sub-linear fingerprint tier you "
    "ship at 100 TB — state is the winnowed set, ~4x smaller here, "
    "with the same detection guarantee for long matches. Window "
    "runs per doc_id (unbounded NDV); the share join is "
    "hash-partitioned on the fingerprint. Exactness: hex-string "
    "minima + integer counts, one division per double. "
    "Ref parity: dedup fingerprint pass (src/enhanced_ingestion.py:"
    "300-320), extended to the winnowed-selection tier",
)
def x143_winnowing_fingerprints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # r11: a fan_out before the gram explode was measured (interleaved
    # min-of-4 A/B) at 4.44 s -> 5.19 s — the md5 gram stream is NOT the
    # binding cost here (the doc_id window + distinct stages already run
    # wide); rejected, kept the plain scan.
    docs = load_table(spark, sf_dir, "documents")
    # r11: eager-checkpoint the fingerprint table — winnow_report
    # references it three times (source-level distinct feeds two aggs,
    # plus the per-source selected count), and unpinned the per-char
    # gram explode + md5 + winnowing window re-executed per reference
    # (guide §1.2 step 1). The table is the winnowed ~1/W selection —
    # bounded, and exactly what a production run would persist as its
    # fingerprint index. t34's streaming twin passes its own
    # incrementally-maintained state tables into the same finalize.
    return winnow_report(
        winnow_doc_fingerprints(docs).localCheckpoint(eager=True),
        winnow_doc_positions(docs),
    )


def winnow_doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Per-doc DISTINCT winnowed fingerprints (doc_id, source, fp) for
    eligible docs. Entirely within-doc (grams + window + distinct), so a
    micro-batch's partials ARE the final rows for its docs — t34's
    streaming state appends them and never revisits a doc."""
    from pyspark.sql import Window as W

    K, Wn = _X143_K, _X143_W
    eligible = docs.filter(F.col("n_chars") >= K + Wn - 1)
    h = eligible.select(
        "doc_id",
        "source",
        F.explode(F.sequence(F.lit(1), F.col("n_chars") - K + 1)).alias("p"),
        "text",
    ).select(
        "doc_id",
        "source",
        "p",
        F.md5(F.expr(f"substring(text, p, {K})")).alias("gh"),
    )
    wm = h.select(
        "doc_id",
        "source",
        "p",
        F.min("gh")
        .over(
            W.partitionBy("doc_id").orderBy("p").rowsBetween(-(Wn - 1), 0)
        )
        .alias("fp"),
    )
    return (
        wm.filter(F.col("p") >= Wn).select("doc_id", "source", "fp").distinct()
    )


def winnow_doc_positions(docs: DataFrame) -> DataFrame:
    """Per-doc gram-position count (doc_id, source, npos) for eligible
    docs — the row-local companion state to winnow_doc_fingerprints."""
    K, Wn = _X143_K, _X143_W
    return docs.filter(F.col("n_chars") >= K + Wn - 1).select(
        "doc_id",
        "source",
        (F.col("n_chars") - K + 1).cast("bigint").alias("npos"),
    )


def winnow_report(docfp: DataFrame, posdocs: DataFrame) -> DataFrame:
    """x143's finalize over the two winnowing state tables — shared with
    t34's streaming monitor so merged state finalizes identically."""
    srcfp = docfp.select("source", "fp").distinct()
    fpshare = srcfp.groupBy("fp").agg(F.count("*").alias("nsrc"))
    pos = posdocs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("npos").cast("bigint").alias("n_positions"),
    )
    sel = docfp.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_selected")
    )
    voc = (
        srcfp.join(fpshare, "fp")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_fp"),
            F.sum(F.when(F.col("nsrc") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_fp_shared"),
        )
    )
    return (
        pos.join(sel, "source")
        .join(voc, "source")
        .select(
            "source",
            "n_docs",
            "n_positions",
            "n_selected",
            (F.col("n_selected").cast("double") / F.col("n_positions")).alias(
                "density"
            ),
            "n_fp",
            "n_fp_shared",
            (F.col("n_fp_shared").cast("double") / F.col("n_fp")).alias(
                "shared_frac"
            ),
        )
    )



# --- x146: cross-source bigram-LM cross-entropy (domain-affinity) matrix ---------------


@register(
    "x146_domain_affinity_matrix",
    # DSIR/DoGE-style data selection signal: score every source's text
    # under every source's Laplace-smoothed bigram LM. H(eval||model)
    # dips on the diagonal and for genuinely similar domains — the
    # matrix importance samplers weight new data with. Determinism is
    # x62's device: probabilities from exact integer counts, -ln
    # ROUNDed to 6 decimals PER BIGRAM TYPE and decimal-summed
    # weighted by the eval count, one double division at the end.
    # Unseen bigrams/contexts take the (0+1)/(0+V) Laplace mass, so
    # every cell is finite without an <unk> vocabulary.
    oracle="""
    WITH toks AS (
      SELECT source, string_split(lower(text), ' ') AS tk FROM documents
    ),
    bi_pos AS (
      SELECT source,
             unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
             unnest(list_transform(range(1, len(tk)), i -> tk[i+1])) AS w2
      FROM toks
    ),
    bi AS (
      SELECT source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
      FROM bi_pos GROUP BY 1, 2, 3
    ),
    uni AS (
      SELECT source, w1, CAST(COUNT(*) AS BIGINT) AS c1
      FROM bi_pos GROUP BY 1, 2
    ),
    voc AS (
      SELECT source, CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM (
        SELECT source, unnest(tk) AS w FROM toks
      ) GROUP BY source
    ),
    srcs AS (SELECT DISTINCT source AS model_source FROM documents),
    scored AS (
      SELECT e.source AS eval_source, s.model_source, e.c AS c_e,
             CAST(ROUND(-LN(
               CAST(COALESCE(m.c, 0) + 1 AS DOUBLE)
               / (COALESCE(u.c1, 0) + v.v)), 6) AS DECIMAL(27,6)) AS nl
      FROM bi e
      CROSS JOIN srcs s
      LEFT JOIN bi m ON m.source = s.model_source
                    AND m.w1 = e.w1 AND m.w2 = e.w2
      LEFT JOIN uni u ON u.source = s.model_source AND u.w1 = e.w1
      JOIN voc v ON v.source = s.model_source
    )
    SELECT eval_source, model_source,
           CAST(SUM(c_e) AS BIGINT) AS n_bigrams,
           ROUND(CAST(SUM(c_e * nl) AS DOUBLE) / SUM(c_e), 6)
             AS cross_entropy
    FROM scored GROUP BY 1, 2
    """,
    doc="x146: cross-source domain-affinity matrix — every source's "
    "bigrams scored under every source's Laplace-smoothed bigram LM "
    "(p = (c+1)/(c1+V) over the model source's vocab), the "
    "token-weighted cross-entropy H(eval||model) per (eval, model) "
    "pair. The DSIR-style importance signal for mixing new data "
    "toward a target domain: low off-diagonal cells mark sources "
    "safe to up-sample. Scale: count tables are word-count shuffles "
    "bounded by per-source vocab^2; scoring joins hash-partition on "
    "(model, bigram); the matrix is sources^2 rows regardless of "
    "corpus size. Exactness: x62's round-then-decimal-sum device "
    "with exact-integer count probabilities. x111 measures each "
    "source's own templatedness; x146 measures BETWEEN-source "
    "transfer. Ref parity: none in reference — LLM-data extension",
)
def x146_domain_affinity_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("source", F.split(F.lower("text"), " ").alias("tk"))
    pos_expr = (
        "CASE WHEN size(tk) >= 2 THEN "
        "transform(sequence(1, size(tk) - 1), "
        "i -> struct(element_at(tk, CAST(i AS INT)) AS w1, "
        "element_at(tk, CAST(i + 1 AS INT)) AS w2)) "
        "ELSE array() END"
    )
    bi_pos = toks.select(
        "source", F.explode(F.expr(pos_expr)).alias("p")
    ).select("source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bi = (
        bi_pos.groupBy("source", "w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    uni = (
        bi_pos.groupBy("source", "w1")
        .agg(F.count("*").cast("bigint").alias("c1"))
    )
    voc = (
        toks.select("source", F.explode("tk").alias("w"))
        .groupBy("source")
        .agg(F.countDistinct("w").cast("bigint").alias("v"))
    )
    srcs = docs.select(
        F.col("source").alias("model_source")
    ).distinct()
    m = bi.select(
        F.col("source").alias("ms_b"),
        F.col("w1").alias("mw1"),
        F.col("w2").alias("mw2"),
        F.col("c").alias("c_m"),
    )
    u = uni.select(
        F.col("source").alias("ms_u"),
        F.col("w1").alias("uw1"),
        F.col("c1").alias("c1_m"),
    )
    v = voc.select(F.col("source").alias("ms_v"), "v")
    p = (F.coalesce("c_m", F.lit(0)) + 1).cast("double") / (
        F.coalesce("c1_m", F.lit(0)) + F.col("v")
    )
    scored = (
        bi.withColumnRenamed("source", "eval_source")
        .crossJoin(F.broadcast(srcs))
        .join(
            m,
            (F.col("ms_b") == F.col("model_source"))
            & (F.col("mw1") == F.col("w1"))
            & (F.col("mw2") == F.col("w2")),
            "left",
        )
        .join(
            u,
            (F.col("ms_u") == F.col("model_source"))
            & (F.col("uw1") == F.col("w1")),
            "left",
        )
        .join(F.broadcast(v), F.col("ms_v") == F.col("model_source"))
        .select(
            "eval_source",
            "model_source",
            F.col("c").alias("c_e"),
            F.round(-F.log(p), 6).cast("decimal(27,6)").alias("nl"),
        )
    )
    return scored.groupBy("eval_source", "model_source").agg(
        F.sum("c_e").cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum(F.col("c_e") * F.col("nl")).cast("double") / F.sum("c_e"), 6
        ).alias("cross_entropy"),
    )


# --- x153: Min-K% Prob memorization/contamination screen -------------------------------


@register(
    "x153_mink_prob_audit",
    # The Min-K% Prob membership-inference signal (Shi et al. 2023,
    # public method): score each document by the mean negative
    # log-likelihood of its k% MOST SURPRISING tokens. Text the model
    # (here: the corpus unigram LM, x27's shared scoring stage) finds
    # unusually predictable even in its worst-case tail is the
    # memorization/benchmark-contamination suspect set — the tail mean
    # separates "seen before" from "fluent but novel" far better than
    # whole-doc perplexity, which x27 already reports. Determinism:
    # per-token nl is round-then-DECIMAL (x27's device); top-k
    # selection by row_number over nl DESC is tie-safe because tied
    # rows carry IDENTICAL nl values — the selected multiset, hence
    # the decimal sum, is unique.
    oracle=UNIGRAM_SCORED_SQL
    + """
    , sized AS (
      SELECT doc_id, nl,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY nl DESC) AS rn,
             COUNT(*) OVER (PARTITION BY doc_id) AS n
      FROM scored
    )
    SELECT doc_id,
           CAST(MAX(n) AS BIGINT) AS n_tokens,
           CAST(GREATEST(1, FLOOR(0.2 * MAX(n))) AS BIGINT) AS k_tokens,
           CAST(SUM(CASE WHEN rn <= GREATEST(1, FLOOR(0.2 * n))
                         THEN nl
                         ELSE CAST(0 AS DECIMAL(27,6)) END)
                AS DOUBLE)
             / GREATEST(1, FLOOR(0.2 * MAX(n))) AS mink_nll
    FROM sized GROUP BY doc_id
    """,
    doc="x153: Min-K% Prob audit — per document, the mean negative "
    "log-likelihood of its 20% most surprising tokens under the corpus "
    "unigram LM (x27's shared scoring stage): the published "
    "membership-inference signal for detecting memorized or "
    "benchmark-contaminated text, where a LOW worst-tail surprise is "
    "the tell that whole-doc perplexity smooths over. Scale: reuses "
    "x27's three word-count shuffles plus ONE per-doc window (ranks "
    "ride the doc_id exchange); no sorts beyond the per-doc frame, no "
    "new shuffle class. Exactness: round-then-decimal token scores, "
    "tie-safe top-k (tied ranks carry identical values); the "
    "mean is a raw IEEE quotient of exact operands, never rounded. "
    "No reference analog — extension "
    "per brief (LLM-data drift & eval family)",
)
def x153_mink_prob_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    scored = unigram_scored(spark, sf_dir)
    wd = W.partitionBy("doc_id")
    sized = scored.select(
        "doc_id",
        "nl",
        F.row_number()
        .over(wd.orderBy(F.desc("nl")))
        .alias("rn"),
        F.count("*").over(wd).alias("n"),
    )
    k = F.greatest(F.lit(1), F.floor(0.2 * F.col("n")))
    k_final = F.greatest(F.lit(1), F.floor(0.2 * F.max("n")))
    return sized.groupBy("doc_id").agg(
        F.max("n").cast("bigint").alias("n_tokens"),
        k_final.cast("bigint").alias("k_tokens"),
        (
            F.sum(
                F.when(F.col("rn") <= k, F.col("nl")).otherwise(
                    F.lit(0).cast("decimal(27,6)")
                )
            ).cast("double")
            / k_final
        ).alias("mink_nll"),
    )


# --- x159: degenerate-loop audit (consecutive periodic token runs) ----------------------


@register(
    "x159_degenerate_loop_audit",
    # THE inference-degeneration signature: "the the the the" (period-1)
    # and "a b a b a b" (period-2) loops. x25 reads the FREQUENCY of the
    # top gram anywhere in the doc; x159 reads CONSECUTIVE periodic
    # structure — position-aware, so a doc that uses one phrase often
    # but never back-to-back stays clean while a stuck sampler is
    # caught. Device: per-doc token windows — r1 = (tok == lag 1),
    # r2 = (tok == lag 2) — then the gaps-and-islands run-length fold
    # (w24's device): a maximal block of k identical tokens yields k-1
    # consecutive r1 rows in one island, so the longest constant run is
    # max island mass + 1; a period-<=2 loop covering k tokens yields
    # k-2 r2 rows, so its span is max mass + 2 (0 when no loop exists).
    # All counters are exact integers; ONE rounded fraction at the end.
    # Scale: one doc_id shuffle, windows linear per doc, then a
    # per-source reduce — never a self-join, never a global sort.
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(lower(text), ' ') AS tk
      FROM documents
    ),
    expl AS (
      SELECT doc_id, unnest(range(0, len(tk))) AS p, unnest(tk) AS t
      FROM toks
    ),
    lagged AS (
      SELECT doc_id, p,
             CASE WHEN t = LAG(t, 1) OVER
                    (PARTITION BY doc_id ORDER BY p)
                  THEN 1 ELSE 0 END AS r1,
             CASE WHEN t = LAG(t, 2) OVER
                    (PARTITION BY doc_id ORDER BY p)
                  THEN 1 ELSE 0 END AS r2
      FROM expl
    ),
    g AS (
      SELECT doc_id, r1, r2,
             SUM(1 - r1) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g1,
             SUM(1 - r2) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g2
      FROM lagged
    ),
    m1 AS (
      SELECT doc_id, MAX(c) AS mx FROM (
        SELECT doc_id, g1, CAST(SUM(r1) AS BIGINT) AS c
        FROM g GROUP BY doc_id, g1
      ) GROUP BY doc_id
    ),
    m2 AS (
      SELECT doc_id, MAX(c) AS mx FROM (
        SELECT doc_id, g2, CAST(SUM(r2) AS BIGINT) AS c
        FROM g GROUP BY doc_id, g2
      ) GROUP BY doc_id
    ),
    per_doc AS (
      SELECT d.doc_id, d.source,
             COALESCE(m1.mx, 0) + 1 AS run1,
             CASE WHEN COALESCE(m2.mx, 0) = 0 THEN 0
                  ELSE m2.mx + 2 END AS span2
      FROM documents d
      LEFT JOIN m1 ON d.doc_id = m1.doc_id
      LEFT JOIN m2 ON d.doc_id = m2.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN run1 >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_const_loopy,
           CAST(MAX(run1) AS BIGINT) AS max_const_run,
           CAST(SUM(CASE WHEN span2 >= 6 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_period2_loopy,
           CAST(MAX(span2) AS BIGINT) AS max_period2_span,
           ROUND(CAST(SUM(CASE WHEN run1 >= 3 OR span2 >= 6
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS loopy_frac
    FROM per_doc GROUP BY source
    """,
    doc="x159: degenerate-loop audit — per-source screening for "
    "CONSECUTIVE periodic token structure, the stuck-sampler "
    "signature ('the the the', 'a b a b a b') that frequency-based "
    "repetition scores (x25) dilute away in long documents. Longest "
    "constant-token run and longest period-<=2 loop span per doc via "
    "per-doc lag windows + the gaps-and-islands run-length fold, "
    "reduced to per-source counts of loopy docs, worst spans, and "
    "the loopy fraction. Exact integer counters, one rounded ratio. "
    "One doc_id shuffle + one source reduce — linear in corpus "
    "tokens at any scale. No reference analog — extension per brief "
    "(LLM-data quality family: x25/x31/x141 read frequency, "
    "diversity, novelty; x159 reads positional degeneration)",
)
def x159_degenerate_loop_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark).select(
        "doc_id", tokens("text").alias("tk")
    )
    e = d.select("doc_id", F.posexplode("tk").alias("p", "t"))
    wo = W.partitionBy("doc_id").orderBy("p")
    lagged = e.select(
        "doc_id", "p",
        F.when(F.col("t") == F.lag("t", 1).over(wo), 1)
        .otherwise(0)
        .alias("r1"),
        F.when(F.col("t") == F.lag("t", 2).over(wo), 1)
        .otherwise(0)
        .alias("r2"),
    )
    wc = wo.rowsBetween(W.unboundedPreceding, W.currentRow)
    g = lagged.select(
        "doc_id", "r1", "r2",
        F.sum(F.lit(1) - F.col("r1")).over(wc).alias("g1"),
        F.sum(F.lit(1) - F.col("r2")).over(wc).alias("g2"),
    )
    m1 = (
        g.groupBy("doc_id", "g1")
        .agg(F.sum("r1").cast("bigint").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mx"))
    )
    m2 = (
        g.groupBy("doc_id", "g2")
        .agg(F.sum("r2").cast("bigint").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("mx"))
    )
    base = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    per_doc = (
        base.join(m1.withColumnRenamed("mx", "mx1"), "doc_id", "left")
        .join(m2.withColumnRenamed("mx", "mx2"), "doc_id", "left")
        .select(
            "source",
            (F.coalesce(F.col("mx1"), F.lit(0)) + 1).alias("run1"),
            F.when(F.coalesce(F.col("mx2"), F.lit(0)) == 0, 0)
            .otherwise(F.col("mx2") + 2)
            .alias("span2"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("run1") >= 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_const_loopy"),
        F.max("run1").cast("bigint").alias("max_const_run"),
        F.sum(F.when(F.col("span2") >= 6, 1).otherwise(0))
        .cast("bigint")
        .alias("n_period2_loopy"),
        F.max("span2").cast("bigint").alias("max_period2_span"),
        F.round(
            F.sum(
                F.when(
                    (F.col("run1") >= 3) | (F.col("span2") >= 6), 1
                ).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("loopy_frac"),
    )


# --- x160: Good-Turing unseen-mass estimate ---------------------------------------------


@register(
    "x160_good_turing_mass",
    # HOW MUCH PROBABILITY BELONGS TO WORDS THE CORPUS HAS NEVER SEEN?
    # Good-Turing: the unseen mass is P0 = N1/N (hapax count over token
    # count), and the smoothed count for once-seen words is
    # r1* = 2 N2/N1 — the quantities that decide whether a source is
    # "closed" enough to train a tokenizer/LM on or still leaking
    # vocabulary. x57 fits Heaps' vocabulary GROWTH, x101 flags
    # hapax-dense DOCS; x160 estimates the source-level UNSEEN MASS —
    # the LM-eval number the other two don't produce. Device: the
    # word-count shape twice (token counts -> frequency-of-frequencies)
    # then a 3-row conditional fold per source; everything integer
    # until two shared rounded ratios. Scale: both aggregates are
    # map-combined hash aggs keyed by (source, word) then (source,
    # freq) — the canonical word-count shuffle, linear at any corpus
    # size.
    oracle="""
    WITH toks AS (
      SELECT source, unnest(string_split(lower(text), ' ')) AS w
      FROM documents
    ),
    wc AS (
      SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY source, w
    ),
    fof AS (
      SELECT source, c, CAST(COUNT(*) AS BIGINT) AS nc
      FROM wc GROUP BY source, c
    ),
    s AS (
      SELECT source,
             CAST(SUM(c * nc) AS BIGINT) AS n_tokens,
             CAST(SUM(nc) AS BIGINT) AS vocab,
             CAST(SUM(CASE WHEN c = 1 THEN nc ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN c = 2 THEN nc ELSE 0 END) AS BIGINT)
               AS n2
      FROM fof GROUP BY source
    )
    SELECT source, n_tokens, vocab, n1 AS n_hapax, n2 AS n_dis,
           ROUND(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
             AS p_unseen,
           CASE WHEN n1 > 0 THEN
             ROUND(2 * CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)
           END AS r1_star
    FROM s
    """,
    doc="x160: Good-Turing unseen-mass estimate per source — hapax "
    "and dis-legomena counts from the frequency-of-frequencies "
    "table, the Good-Turing unseen probability mass P0 = N1/N and "
    "the smoothed once-seen count r1* = 2 N2/N1. The source-level "
    "'is the vocabulary closed yet?' gauge for tokenizer/LM "
    "training; complements x57 (Heaps growth fit) and x101 "
    "(per-doc hapax density) with the LM-eval estimator neither "
    "produces. Two map-combined word-count aggregates + a 3-row "
    "fold, exact integers, two shared rounded ratios. No reference "
    "analog — extension per brief (text-analysis family)",
)
def x160_good_turing_mass(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.catalog import fan_out

    d = fan_out(load_table(spark, sf_dir, "documents"), spark).select(
        "source", F.explode(tokens("text")).alias("w")
    )
    wc = d.groupBy("source", "w").agg(
        F.count("*").cast("bigint").alias("c")
    )
    fof = wc.groupBy("source", "c").agg(
        F.count("*").cast("bigint").alias("nc")
    )
    s = fof.groupBy("source").agg(
        F.sum(F.col("c") * F.col("nc")).cast("bigint").alias("n_tokens"),
        F.sum("nc").cast("bigint").alias("vocab"),
        F.sum(F.when(F.col("c") == 1, F.col("nc")).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("c") == 2, F.col("nc")).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    return s.select(
        "source", "n_tokens", "vocab",
        F.col("n1").alias("n_hapax"),
        F.col("n2").alias("n_dis"),
        F.expr(
            "ROUND(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)"
        ).alias("p_unseen"),
        F.when(
            F.col("n1") > 0,
            F.expr("ROUND(2 * CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)"),
        ).alias("r1_star"),
    )


# --- x162: McNemar filter-disagreement audit --------------------------------------------

# The two deterministic quality rules under comparison (both integer
# predicates on the raw doc): A = length band (x128's Gopher-style
# bounds), B = mean-token-length band (boilerplate/base64 blobs fail
# it; natural prose passes).
_X162_A = "(n_chars >= 200 AND n_chars <= 5000)"
_X162_B = (
    "(CAST(n_chars AS DOUBLE)"
    " / GREATEST(CAST(len(string_split(lower(text), ' ')) AS BIGINT), 1)"
    " <= 8)"
)
_X162_CHI2 = (
    "ROUND(CAST((n10 - n01) * (n10 - n01) AS DOUBLE)"
    " / CAST(n10 + n01 AS DOUBLE), 9)"
)


@register(
    "x162_mcnemar_filter_audit",
    # DO TWO QUALITY FILTERS DISAGREE SYSTEMATICALLY — or just noisily?
    # Swapping filter A for filter B is safe when their disagreements
    # are symmetric; McNemar's test reads ONLY the discordant cells
    # (chi2 = (b-c)^2/(b+c)): a significant statistic means B passes a
    # systematically different subpopulation than A, and the training
    # mix will shift. The paired-design test the a38/a57 contingency
    # family doesn't cover (those compare two VARIABLES; McNemar
    # compares two RATERS on the same items). Per source: the 2x2
    # concordance table, the agreement rate, and the statistic. All
    # counts are exact integers from one scan; Spark's size(split())
    # mirrors DuckDB's len(string_split()) exactly (same tokenizer the
    # x-family pins). NULL when no discordant pairs.
    oracle=f"""
    WITH flags AS (
      SELECT source,
             CASE WHEN {_X162_A} THEN 1 ELSE 0 END AS fa,
             CASE WHEN {_X162_B} THEN 1 ELSE 0 END AS fb
      FROM documents
    ),
    cells AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(fa * fb) AS BIGINT) AS n11,
             CAST(SUM(fa * (1 - fb)) AS BIGINT) AS n10,
             CAST(SUM((1 - fa) * fb) AS BIGINT) AS n01,
             CAST(SUM((1 - fa) * (1 - fb)) AS BIGINT) AS n00
      FROM flags GROUP BY source
    )
    SELECT source, n_docs, n11, n10, n01, n00,
           ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
             AS agree_frac,
           CASE WHEN n10 + n01 > 0 THEN {_X162_CHI2} END
             AS mcnemar_chi2
    FROM cells
    """,
    doc="x162: McNemar filter-disagreement audit — per source, the "
    "paired 2x2 concordance of two deterministic quality filters "
    "(length band vs mean-token-length band) with the McNemar "
    "statistic over the discordant cells: the test that says whether "
    "swapping filters would SHIFT the surviving mix or merely "
    "reshuffle noise. Complements x110/x112 (filter-bias vs length) "
    "and x116 (rule ablation) with the paired-rater significance "
    "test none of them run. One scan, integer cells, two rounded "
    "outputs. No reference analog — extension per brief",
)
def x162_mcnemar_filter_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    flags = d.select(
        "source",
        F.expr(f"CASE WHEN {_X162_A} THEN 1 ELSE 0 END").alias("fa"),
        F.expr(
            "CASE WHEN (CAST(n_chars AS DOUBLE)"
            " / GREATEST(CAST(size(split(lower(text), ' ')) AS BIGINT), 1)"
            " <= 8) THEN 1 ELSE 0 END"
        ).alias("fb"),
    )
    cells = flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("fa") * F.col("fb")).cast("bigint").alias("n11"),
        F.sum(F.col("fa") * (1 - F.col("fb"))).cast("bigint").alias("n10"),
        F.sum((1 - F.col("fa")) * F.col("fb")).cast("bigint").alias("n01"),
        F.sum((1 - F.col("fa")) * (1 - F.col("fb")))
        .cast("bigint")
        .alias("n00"),
    )
    return cells.select(
        "source", "n_docs", "n11", "n10", "n01", "n00",
        F.expr(
            "ROUND(CAST(n11 + n00 AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)"
        ).alias("agree_frac"),
        F.when(
            F.col("n10") + F.col("n01") > 0, F.expr(_X162_CHI2)
        ).alias("mcnemar_chi2"),
    )


# --- x163: Cochran's Q three-filter agreement audit -------------------------------------

# Third deterministic rule alongside x162's A and B: a stopword-share
# band (natural prose carries function words; templates/code/blobs
# don't). Shared SQL predicate built from the pinned STOPWORDS list.
_X163_C = (
    "(len(list_intersect(string_split(lower(text), ' '),"
    " ['the', 'a', 'and', 'le', 'la', 'et', 'der', 'die', 'und'])) > 0)"
)
_X163_Q = (
    "ROUND(CAST(2 * (3 * (CAST(ca AS DOUBLE) * ca"
    " + CAST(cb AS DOUBLE) * cb + CAST(cc AS DOUBLE) * cc)"
    " - CAST(ca + cb + cc AS DOUBLE) * (ca + cb + cc))"
    " AS DOUBLE)"
    " / (3 * CAST(sr AS DOUBLE) - CAST(sr2 AS DOUBLE)), 9)"
)


@register(
    "x163_cochran_q_filter_audit",
    # DO THREE QUALITY FILTERS RANK THE CORPUS THE SAME WAY? Cochran's
    # Q generalizes x162's McNemar to k=3 matched binary raters:
    # Q = k(k-1) * sum_j (C_j - Cbar)^2 / (k * sum_i R_i - sum_i R_i^2)
    # over per-doc pass-rows R_i and per-filter pass-columns C_j — the
    # omnibus "at least one filter passes a systematically different
    # subpopulation" test to run BEFORE pairwise McNemars. For k=3 the
    # numerator folds to 2*(3*(Ca^2+Cb^2+Cc^2) - (Ca+Cb+Cc)^2) and the
    # denominator needs only sum(R) and sum(R^2) — four BIGINT
    # aggregates per source, no per-doc output. Degenerate (all-agree)
    # sources emit NULL via the denominator guard. One scan; the
    # list_intersect stopword probe mirrors Spark's arrays_overlap on
    # the same pinned token list.
    oracle=f"""
    WITH flags AS (
      SELECT source,
             CASE WHEN (n_chars >= 200 AND n_chars <= 5000)
                  THEN 1 ELSE 0 END AS fa,
             CASE WHEN (CAST(n_chars AS DOUBLE)
                        / GREATEST(CAST(len(string_split(lower(text), ' '))
                                        AS BIGINT), 1) <= 8)
                  THEN 1 ELSE 0 END AS fb,
             CASE WHEN {_X163_C} THEN 1 ELSE 0 END AS fc
      FROM documents
    ),
    s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(fa) AS BIGINT) AS ca,
             CAST(SUM(fb) AS BIGINT) AS cb,
             CAST(SUM(fc) AS BIGINT) AS cc,
             CAST(SUM(fa + fb + fc) AS BIGINT) AS sr,
             CAST(SUM((fa + fb + fc) * (fa + fb + fc)) AS BIGINT) AS sr2
      FROM flags GROUP BY source
    )
    SELECT source, n_docs, ca AS pass_len, cb AS pass_tok,
           cc AS pass_stop,
           CASE WHEN 3 * sr - sr2 > 0 THEN {_X163_Q} END AS cochran_q
    FROM s
    """,
    doc="x163: Cochran's Q filter-panel audit — the k=3 omnibus "
    "matched-rater test over three deterministic quality filters "
    "(length band, mean-token-length band, stopword presence) per "
    "source: one significant Q means the filter panel disagrees "
    "systematically somewhere, and x162's pairwise McNemar then "
    "localizes WHERE. Four BIGINT aggregates per source (pass "
    "columns + row-sum moments — the k=3 closed form needs nothing "
    "per-doc), one shared Q string, NULL on all-agree degeneracy. "
    "One scan at any scale. No reference analog — extension per "
    "brief; completes the paired-rater family with x81/x162",
)
def x163_cochran_q_filter_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    stop = F.array(
        *[F.lit(w) for w in
          ["the", "a", "and", "le", "la", "et", "der", "die", "und"]]
    )
    flags = d.select(
        "source",
        F.expr(
            "CASE WHEN (n_chars >= 200 AND n_chars <= 5000)"
            " THEN 1 ELSE 0 END"
        ).alias("fa"),
        F.expr(
            "CASE WHEN (CAST(n_chars AS DOUBLE)"
            " / GREATEST(CAST(size(split(lower(text), ' ')) AS BIGINT), 1)"
            " <= 8) THEN 1 ELSE 0 END"
        ).alias("fb"),
        F.when(
            F.arrays_overlap(F.split(F.lower(F.col("text")), " "), stop),
            1,
        )
        .otherwise(0)
        .alias("fc"),
    )
    s = flags.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("fa").cast("bigint").alias("ca"),
        F.sum("fb").cast("bigint").alias("cb"),
        F.sum("fc").cast("bigint").alias("cc"),
        F.sum(F.col("fa") + F.col("fb") + F.col("fc"))
        .cast("bigint")
        .alias("sr"),
        F.sum(
            (F.col("fa") + F.col("fb") + F.col("fc"))
            * (F.col("fa") + F.col("fb") + F.col("fc"))
        )
        .cast("bigint")
        .alias("sr2"),
    )
    return s.select(
        "source", "n_docs",
        F.col("ca").alias("pass_len"),
        F.col("cb").alias("pass_tok"),
        F.col("cc").alias("pass_stop"),
        F.when(
            F.lit(3) * F.col("sr") - F.col("sr2") > 0, F.expr(_X163_Q)
        ).alias("cochran_q"),
    )
